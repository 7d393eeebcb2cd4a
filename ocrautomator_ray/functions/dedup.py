"""Deduplication operators for training-data pipelines (SURVEY extension
mandated by the driver): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (tested at sf≤0.1, shaped for 100 TB):
- exact dedup: vectorized content hash in map_batches + per-batch partial
  min, then one small groupby — the shuffle moves (hash, min_id) pairs, not
  text;
- MinHash/SimHash: signatures are computed batch-local (numpy, one pass),
  candidates come from a banded groupby (shuffle moves 16-byte band keys),
  verification joins the candidate pairs back to signatures via an in-object-
  store broadcast at test scale — at real scale that broadcast becomes a
  hash-partitioned join on doc_id (both sides large);
- all pair outputs are (doc_a < doc_b) and deduplicated, so results are
  deterministic under any execution order.

MinHash/LSH per Broder '97 / Leskovec-Rajaraman-Ullman MMDS ch.3; SimHash per
Charikar '02.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min

# ---------------------------------------------------------------------------
# shared shingle / signature kernels (seeded, deterministic)
# ---------------------------------------------------------------------------

def _per_key_runs(ds: rd.Dataset, keys: list[str], fn, empty_schema: pa.Schema,
                  num_partitions: int = 16) -> rd.Dataset:
    """Apply fn to each complete key-group, via the streaming hash exchange.

    Equivalent to groupby(keys).map_groups(fn) but ~an order of magnitude
    faster for many small groups: one hash repartition co-locates and sorts
    the keys, then a single vectorized map_batches splits each block into key
    runs (same pattern as the pipeline's reassembly commit). Falls back to
    groupby().map_groups on Ray versions without HASH_SHUFFLE.
    """
    try:
        import ray
        from ray.data.context import ShuffleStrategy

        ctx = ds.context
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        ctx.max_hash_shuffle_aggregators = max(2, total // 4)
        per_part = max(0.5, total / 16) / num_partitions
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = per_part
    except ImportError:
        return ds.groupby(keys).map_groups(
            lambda g: fn(pa.Table.from_pandas(g)), batch_format="pandas"
        )

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return empty_schema.empty_table()
        arrs = [block[k].to_numpy(zero_copy_only=False) for k in keys]
        n = len(arrs[0])
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for a in arrs:
            change[1:] |= a[1:] != a[:-1]
        bounds = np.nonzero(change)[0].tolist() + [n]
        outs = [fn(block.slice(s, e - s)) for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.concat_tables(outs) if outs else empty_schema.empty_table()

    return ds.repartition(num_partitions, keys=keys, sort=True).map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


_MERSENNE = np.uint64((1 << 61) - 1)
_NUM_HASHES = 64
_BANDS = 16
_ROWS_PER_BAND = _NUM_HASHES // _BANDS

_rng = np.random.default_rng(0xC0FFEE)  # module-load deterministic (PCG64)
_A = _rng.integers(1, _MERSENNE, size=_NUM_HASHES, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=_NUM_HASHES, dtype=np.uint64)

_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


_FNV_PRIME_INT = 1099511628211
_FNV_OFFSET_INT = 14695981039346656037
_U64_MASK = (1 << 64) - 1


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """FNV-1a over tokens → uint64 array.

    Pure-int inner loop (identical values to uint64 wrap-around arithmetic,
    ~10× faster than numpy-scalar ops and no overflow warnings).
    """
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = _FNV_OFFSET_INT
        for b in tok.encode():
            h = ((h ^ b) * _FNV_PRIME_INT) & _U64_MASK
        out[i] = h
    return out


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct hashed word k-shingles of a document."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(_hash_tokens(grams)) if grams else np.empty(0, dtype=np.uint64)


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64-permutation MinHash signature ((a*x+b) mod 2^61-1, universal family)."""
    if len(shingles) == 0:
        return np.full(_NUM_HASHES, _MERSENNE, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hv = (_A[:, None] * shingles[None, :] + _B[:, None]) % _MERSENNE
    return hv.min(axis=1)


def band_keys(sig: np.ndarray) -> np.ndarray:
    """Collapse each band of the signature to one uint64 bucket key."""
    bands = sig.reshape(_BANDS, _ROWS_PER_BAND)
    with np.errstate(over="ignore"):
        key = _FNV_OFFSET * np.ones(_BANDS, dtype=np.uint64)
        for r in range(_ROWS_PER_BAND):
            key = (key ^ bands[:, r]) * _FNV_PRIME
    return key


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> np.uint64:
    """Charikar SimHash over word unigrams (count-weighted bit majority)."""
    words = text.lower().split()
    if not words:
        return np.uint64(0)
    hv = _hash_tokens(words)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    counts = bits.astype(np.int64).sum(axis=0)
    maj = (counts * 2 > len(words)).astype(np.uint64)
    return np.uint64((maj << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


# ---------------------------------------------------------------------------
# minhash_lsh_dups — near-duplicate pairs over documents.text
# ---------------------------------------------------------------------------

MINHASH_THRESHOLD = 0.5


def minhash_lsh_dups(sf_dir: str, threshold: float = MINHASH_THRESHOLD) -> rd.Dataset:
    """Candidate pairs via banded MinHash-LSH, verified with true Jaccard.

    Pipeline: signatures per batch → explode to (band_id, band_key, doc_id)
    rows → groupby band bucket → within-bucket pairs → dedup pairs → verify
    true shingle Jaccard ≥ threshold. Output: (doc_a, doc_b, jaccard).
    """
    import ray

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_doc, out_band, out_key = [], [], []
        for did, txt in zip(ids, texts):
            keys = band_keys(minhash_signature(word_shingles(txt or "")))
            out_doc.extend([did] * _BANDS)
            out_band.extend(range(_BANDS))
            out_key.extend(keys.tolist())
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.uint64()),
        })

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def bucket_pairs(run: pa.Table) -> pa.Table:
        ids = np.unique(run["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pair_schema.empty_table()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[ia], pa.int64()),
                         "doc_b": pa.array(ids[ib], pa.int64())})

    from ray.data.aggregate import Count

    band_rows = ds.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True)
    pairs = (
        _per_key_runs(band_rows, ["band_id", "band_key"], bucket_pairs, pair_schema)
        .groupby(["doc_a", "doc_b"], num_partitions=16)  # dedup candidate pairs
        .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
    )

    # Verification: broadcast doc → shingle hashes (test-scale; at 100 TB this
    # becomes a hash-partitioned join of pair rows against the signature table).
    shingle_map = {}
    for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            shingle_map[did] = word_shingles(txt or "")
    ref = ray.put(shingle_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)
        jac = np.array(
            [jaccard(sm[a], sm[b]) for a, b in zip(df["doc_a"], df["doc_b"])]
        )
        keep = jac >= threshold
        return pd.DataFrame({
            "doc_a": df["doc_a"].values[keep],
            "doc_b": df["doc_b"].values[keep],
            "jaccard": jac[keep],
        })

    return pairs.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# simhash_dups — near-duplicate pairs by SimHash hamming distance
# ---------------------------------------------------------------------------

SIMHASH_MAX_HAMMING = 3


def simhash_dups(sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING) -> rd.Dataset:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Blocking: 4 × 16-bit bands — any pair within hamming ≤ 3 shares at least
    one intact band (pigeonhole), so recall vs brute force is exact.
    Output: (doc_a, doc_b, hamming).
    """
    import ray

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sigs = [simhash64(txt or "") for txt in t["text"].to_pylist()]
        out_doc, out_band, out_key, out_sig = [], [], [], []
        for did, s in zip(ids, sigs):
            for band in range(4):
                out_doc.append(did)
                out_band.append(band)
                out_key.append(int((int(s) >> (band * 16)) & 0xFFFF))
                out_sig.append(int(s))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int32()),
            "sig": pa.array(out_sig, pa.uint64()),
        })

    ham_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("hamming", pa.int64())])

    def bucket_pairs(run: pa.Table) -> pa.Table:
        ids_all = run["doc_id"].to_numpy(zero_copy_only=False)
        sigs_all = run["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids_all, kind="stable")
        ids_s, sigs_s = ids_all[order], sigs_all[order]
        first = np.ones(len(ids_s), dtype=bool)
        first[1:] = ids_s[1:] != ids_s[:-1]
        ids, sigs = ids_s[first], sigs_s[first]
        if len(ids) < 2:
            return ham_schema.empty_table()
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sigs[ia] ^ sigs[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):  # popcount via shift loop on the whole vector
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        keep = ham <= max_hamming
        return pa.table({
            "doc_a": pa.array(ids[ia][keep], pa.int64()),
            "doc_b": pa.array(ids[ib][keep], pa.int64()),
            "hamming": pa.array(ham[keep], pa.int64()),
        })

    _ = ray  # broadcast not needed: signatures travel with the band rows

    from ray.data.aggregate import Min as _Min

    band_rows = ds.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True)
    return (
        _per_key_runs(band_rows, ["band_id", "band_key"], bucket_pairs, ham_schema)
        .groupby(["doc_a", "doc_b"], num_partitions=16)  # dedup pairs, keep hamming
        .aggregate(_Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# chargram_jaccard_dups — exact char-set Jaccard similarity join within
# source blocks (SQL-oracled: DuckDB's jaccard() is char-set Jaccard)
# ---------------------------------------------------------------------------

CHARGRAM_THRESHOLD = 0.8


def chargram_jaccard_dups(sf_dir: str, threshold: float = CHARGRAM_THRESHOLD) -> rd.Dataset:
    """Similar-document pairs by exact character-set Jaccard, blocked by the
    `source` column (bounded blocks → per-group pairwise compare is safe).

    Output: (doc_a, doc_b, jac). Matches DuckDB's jaccard() semantics exactly
    (distinct unicode characters of each string).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        charsets = [frozenset(t or "") for t in g["text"]]
        rows_a, rows_b, jacs = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(charsets[i] & charsets[j])
                union = len(charsets[i] | charsets[j])
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    rows_a.append(ids[i]); rows_b.append(ids[j]); jacs.append(jac)
        return pd.DataFrame({
            "doc_a": np.array(rows_a, dtype=np.int64),
            "doc_b": np.array(rows_b, dtype=np.int64),
            "jac": np.array(jacs, dtype=np.float64),
        })

    return ds.groupby("source").map_groups(block_pairs, batch_format="pandas")


SQL_CHARGRAM = f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, jaccard(a.text, b.text) AS jac
FROM documents a
JOIN documents b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE jaccard(a.text, b.text) >= {CHARGRAM_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# embedding_neardup — cosine near-duplicate pairs over the embeddings table
# ---------------------------------------------------------------------------

COSINE_THRESHOLD = 0.4


def embedding_neardup(sf_dir: str, threshold: float = COSINE_THRESHOLD) -> rd.Dataset:
    """Pairs with cosine(embedding_a, embedding_b) ≥ threshold.

    Exact block-matrix search: the normalized matrix is broadcast once
    (ray.put), each batch computes batch × all sims with one float64 matmul.
    At real scale the broadcast side becomes an IVF/LSH-bucketed index and
    batches probe only their buckets. Output: (vec_a, vec_b, cos_sim).
    """
    import ray

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_tbl = ds.to_pandas()
    ids_all = all_tbl["vec_id"].to_numpy(dtype=np.int64)
    E = np.stack(all_tbl["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ref = ray.put((ids_all, En))

    def pairs(t: pa.Table) -> pa.Table:
        ids_a, En_all = ray.get(ref)
        ids_b = t["vec_id"].to_numpy(zero_copy_only=False)
        B = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        sims = Bn @ En_all.T
        bi, ai = np.nonzero((sims >= threshold) & (ids_b[:, None] < ids_a[None, :]))
        return pa.table({
            "vec_a": pa.array(ids_b[bi], pa.int64()),
            "vec_b": pa.array(ids_a[ai], pa.int64()),
            "cos_sim": pa.array(sims[bi, ai], pa.float64()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# minhash_dup_clusters — connected components over the near-dup pair graph
# (hash-to-min label propagation, Rastogi et al., ICDE 2013): each round every
# node broadcasts the minimum id of its neighborhood to all neighbors via a
# groupby — O(log n) rounds, all Dataset ops, no driver-side graph. Near-dup
# components are small cliques, so it converges in 2-3 rounds in practice.
# ---------------------------------------------------------------------------

def minhash_dup_clusters(sf_dir: str, threshold: float = MINHASH_THRESHOLD,
                         max_rounds: int = 12) -> rd.Dataset:
    """(doc_id, cluster_id) for every doc in ≥1 verified near-dup pair;
    cluster_id = min doc_id of its connected component."""
    pairs = minhash_lsh_dups(sf_dir, threshold).select_columns(["doc_a", "doc_b"])

    def seed_adj(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b, a, b]), pa.int64()),
            "v": pa.array(np.concatenate([b, a, a, b]), pa.int64()),
        })

    adj = pairs.map_batches(seed_adj, batch_format="pyarrow", zero_copy_batch=True)

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        # hash-to-min: send the neighborhood minimum to every neighbor AND the
        # whole neighborhood to the minimum node (both halves are required for
        # chains to collapse in O(log n) rounds)
        vs = np.unique(g["v"].to_numpy())
        m = min(int(vs.min()), int(g["u"].iloc[0]))
        mm = np.full(len(vs), m, dtype=np.int64)
        return pd.DataFrame({
            "u": np.concatenate([vs, mm]),
            "v": np.concatenate([mm, vs]),
        })

    from ray.data.aggregate import Count

    def dedup_edges(ds: rd.Dataset) -> rd.Dataset:
        return ds.groupby(["u", "v"], num_partitions=8) \
            .aggregate(Count(alias_name="_c")).drop_columns(["_c"])

    def signature(ds: rd.Dataset) -> int:
        from ray.data.aggregate import Sum

        labels = ds.groupby("u", num_partitions=8).aggregate(Min("v", alias_name="lbl"))
        row = labels.map_batches(
            lambda t: pa.table({"s": [int((t["u"].to_numpy(zero_copy_only=False)
                                            * 1315423911
                                            + t["lbl"].to_numpy(zero_copy_only=False)).sum())]}),
            batch_format="pyarrow",
        ).aggregate(Sum("s", alias_name="s"))
        return int(row["s"])

    prev_sig = None
    for _ in range(max_rounds):
        adj = dedup_edges(
            adj.groupby("u", num_partitions=8).map_groups(propagate, batch_format="pandas")
        ).materialize()  # adjacency shrinks to ~nodes rows; pin per round
        sig = signature(adj)
        if sig == prev_sig:
            break
        prev_sig = sig

    return adj.groupby("u", num_partitions=8).aggregate(Min("v", alias_name="cluster_id")) \
        .map_batches(lambda t: t.rename_columns(["doc_id", "cluster_id"]),
                     batch_format="pyarrow")


QUERIES = {
    "minhash_lsh_dups": minhash_lsh_dups,
    "minhash_dup_clusters": minhash_dup_clusters,
    "simhash_dups": simhash_dups,
    "chargram_jaccard_dups": chargram_jaccard_dups,
    "embedding_neardup": embedding_neardup,
}

SQL = {
    "chargram_jaccard_dups": SQL_CHARGRAM,
}
