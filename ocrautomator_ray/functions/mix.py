"""Corpus-assembly operators — the last mile of a training-data pipeline.

After curation (normalize → filter → dedup) a corpus still has to be
ASSEMBLED: over-represented sources capped, sources mixed at target ratios
(up- and down-sampling), rows weighted by quality, and the whole thing given
a deterministic global shuffle order that a resumed/incremental rebuild
reproduces bit-for-bit. Every operator here is stateless per batch or uses
one small hash exchange; nothing sorts or shuffles the full corpus:

- ``seeded_shuffle``  — deterministic global permutation with DENSE positions
  via ordered hash buckets + driver-side prefix offsets (the pack_sequences
  pattern): no global sort, the exchange moves (doc_id, hash) pairs only.
- ``source_cap``      — keep at most K docs per source, chosen by hash order
  (reproducible, not first-seen order which depends on scan order).
- ``mix_corpus``      — per-source target weights with upsampling: a doc
  appears ``floor(w)`` times plus once more iff its hash falls under
  ``frac(w)`` — the standard epoch-replication trick, deterministic.
- ``weighted_sample`` — Bernoulli keep with probability proportional to a
  quality proxy, driven by the same doc hash (stable across pipelines).
- ``temperature_mix``  — UniMax/alpha-temperature source quotas (∝ √tokens),
  filled in hash order; integer-exact via isqrt.
- ``rp_project``      — sign-random-projection 64→8 dims in EXACT integer
  arithmetic (elements integerized at 1e-6 before the matmul) so the
  distributed result is bit-identical to any serial oracle.
- ``hashed_doc_vectors`` — feature hashing (Weinberger et al., ICML 2009):
  every document embedded into a fixed 16-dim signed token-count
  vector with the corpus FNV-1a hash — the cheap text→vector bridge that
  feeds kmeans_fit / ANN / semantic dedup when no learned embeddings
  exist; all-integer, embarrassingly parallel (no exchange at all).

All randomness is Knuth multiplicative hashing of ids — no RNG state, no
seed files; the SQL oracles mirror the arithmetic exactly (HUGEINT mod 2^32).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.curate import _KNUTH, knuth_bucket, sql_bucket
from ocrautomator_ray.functions.dedup import _ramp
from ocrautomator_ray.functions.exchange import per_key_blocks, pruned_read

SHUFFLE_SEED = 42
SHUFFLE_BUCKETS = 64          # ordered ranges; 2^32 divisible → exact SQL mirror
_BUCKET_WIDTH = (1 << 32) // SHUFFLE_BUCKETS
SOURCE_CAP = 10
RP_IN_DIM = 64
RP_OUT_DIM = 8


def mix_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """((id + seed) * knuth) mod 2^32 as int64 — the one hash driving every
    operator in this module. uint64 wrap-around times-then-mod equals the
    exact product mod 2^32 (2^32 | 2^64), matching the SQL HUGEINT mirror."""
    with np.errstate(over="ignore"):
        h = ((ids.astype(np.uint64) + np.uint64(seed))
             * np.uint64(_KNUTH)) % np.uint64(1 << 32)
    return h.astype(np.int64)


def sql_mix_hash(col: str, seed: int) -> str:
    """SQL mirror of ``mix_hash``."""
    return (f"CAST(CAST({col} + {seed} AS HUGEINT) * {_KNUTH} "
            f"% 4294967296 AS BIGINT)")


# ---------------------------------------------------------------------------
# seeded_shuffle — deterministic global permutation with dense positions
# ---------------------------------------------------------------------------

def seeded_shuffle(sf_dir: str, seed: int = SHUFFLE_SEED) -> rd.Dataset:
    """(doc_id, pos): pos is the doc's 0-based slot in the seed-determined
    global shuffle order (hash asc, doc_id tie-break).

    Dense global ranks WITHOUT a global sort: the hash space is cut into
    ``SHUFFLE_BUCKETS`` ordered ranges, a tiny count-per-bucket aggregate
    (B rows) comes back to the driver for a prefix sum, and one hash
    exchange on bucket lets each block rank its rows locally and add the
    bucket's offset. The exchange moves (doc_id, hash) pairs — never text —
    and the driver state is B integers regardless of corpus size."""
    path = f"{sf_dir}/documents.parquet"

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = mix_hash(ids, seed)
        return pa.table({
            "doc_id": t["doc_id"],
            "h": pa.array(h, pa.int64()),
            "bucket": pa.array(h // _BUCKET_WIDTH, pa.int64()),
        })

    # pass 1: B-row bucket histogram → driver prefix offsets (B ints).
    # Explicit num_partitions: Ray's groupby default is 200 hash-aggregate
    # partitions, a pure fixed cost for a 64-row result.
    counts = (
        pruned_read(path, ["doc_id"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket", num_partitions=8).count()
        .to_pandas()
    )
    offsets = np.zeros(SHUFFLE_BUCKETS + 1, np.int64)
    np.add.at(offsets, counts["bucket"].to_numpy() + 1,
              counts["count()"].to_numpy())
    offsets = np.cumsum(offsets)

    out_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        h = block["h"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, b))
        b_sorted = b[order]
        # local rank within each bucket run + that bucket's global offset
        starts = np.nonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(b_sorted)])
        pos = offsets[b_sorted] + _ramp(run_len)
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    keyed_ds = (
        pruned_read(path, ["doc_id"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    )
    return per_key_blocks(keyed_ds, ["bucket"], rank_block,
                          num_partitions=min(16, SHUFFLE_BUCKETS))


SQL_SEEDED_SHUFFLE = f"""
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY {sql_mix_hash('doc_id', SHUFFLE_SEED)},
                          doc_id) - 1 AS pos
FROM documents
"""


# ---------------------------------------------------------------------------
# source_cap — bound over-represented sources, hash-chosen survivors
# ---------------------------------------------------------------------------

def source_cap(sf_dir: str, cap: int = SOURCE_CAP) -> rd.Dataset:
    """(doc_id, source) keeping at most ``cap`` docs per source, the ones
    with the smallest shuffle hash (deterministic — NOT first-seen, which
    varies with scan order). The same bottom-cap kernel runs twice: as a
    per-batch PRE-PRUNE (lossless — a source's global bottom-cap is a
    subset of its per-batch bottom-caps) so the exchange moves at most
    cap×batches rows per source instead of the corpus, then per source
    group after one hash exchange on source."""
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "source"])
    out_schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def cap_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        src = block["source"].to_numpy(zero_copy_only=False)
        h = mix_hash(ids, SHUFFLE_SEED)
        order = np.lexsort((ids, h, src))
        s_sorted = src[order]
        starts = np.nonzero(np.r_[True, s_sorted[1:] != s_sorted[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(s_sorted)])
        keep = order[_ramp(run_len) < cap]
        keep.sort()
        return block.take(pa.array(keep))

    pruned = ds.map_batches(cap_block, batch_format="pyarrow",
                            zero_copy_batch=True)
    return per_key_blocks(pruned, ["source"], cap_block)


SQL_SOURCE_CAP = f"""
SELECT doc_id, source
FROM documents
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY source
    ORDER BY {sql_mix_hash('doc_id', SHUFFLE_SEED)}, doc_id) <= {SOURCE_CAP}
"""


# ---------------------------------------------------------------------------
# token_budget_mix — fill per-source TOKEN budgets in seeded-shuffle order
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 800  # tokens per source; bites at every test scale


def keyed_token_docs(path: str) -> rd.Dataset:
    """(doc_id, source, h, bucket, n_tok) rows for the budget machinery —
    the text is dropped at the map, so everything downstream moves ints and
    short source tags only."""
    from ocrautomator_ray.functions.dedup import _tokenize_re2

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        _, cnt = _tokenize_re2(t["text"])
        h = mix_hash(ids, SHUFFLE_SEED)
        return pa.table({
            "doc_id": t["doc_id"], "source": t["source"],
            "h": pa.array(h, pa.int64()),
            "bucket": pa.array(h // _BUCKET_WIDTH, pa.int64()),
            "n_tok": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return pruned_read(path, ["doc_id", "source", "text"]).map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True)


def apply_token_budget(keyed_ds: rd.Dataset,
                       budget: int = TOKEN_BUDGET) -> rd.Dataset:
    """Keep each source's docs in (h, doc_id) order while the running token
    total INCLUDING the doc stays ≤ budget. Input/output columns:
    (doc_id, source, h, bucket, n_tok); the caller projects what it needs.
    NOTE: ``keyed_ds`` is executed twice (the sums pass and the budget
    exchange) — keep its lineage cheap or materialize it first."""
    sums = (keyed_ds.select_columns(["source", "bucket", "n_tok"])
            .groupby(["source", "bucket"], num_partitions=8).sum("n_tok")
            .to_pandas())  # ≤ sources × SHUFFLE_BUCKETS rows — bounded
    sources = np.sort(sums["source"].unique())
    mat = np.zeros((max(len(sources), 1), SHUFFLE_BUCKETS + 1), np.int64)
    si = np.searchsorted(sources, sums["source"].to_numpy())
    mat[si, sums["bucket"].to_numpy() + 1] = sums["sum(n_tok)"].to_numpy()
    offsets = np.cumsum(mat, axis=1)  # tokens BEFORE each (source, bucket)

    keyed_schema = pa.schema([
        ("doc_id", pa.int64()), ("source", pa.string()), ("h", pa.int64()),
        ("bucket", pa.int64()), ("n_tok", pa.int64()),
    ])

    def budget_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return keyed_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        src = block["source"].to_numpy(zero_copy_only=False)
        h = block["h"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        ntok = block["n_tok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, b, src))
        src_s, b_s, ntok_s = src[order], b[order], ntok[order]
        new_run = np.r_[True, (src_s[1:] != src_s[:-1]) | (b_s[1:] != b_s[:-1])]
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.r_[starts, len(ntok_s)])
        c = np.cumsum(ntok_s)
        run_excl = np.repeat(c[starts] - ntok_s[starts], run_len)
        within_excl = c - ntok_s - run_excl
        si_row = np.searchsorted(sources, src_s)
        before = offsets[si_row, b_s] + within_excl
        keep = order[before + ntok_s <= budget]
        keep.sort()
        return block.take(pa.array(keep))

    return per_key_blocks(keyed_ds, ["source", "bucket"], budget_block,
                          num_partitions=16)


def token_budget_mix(sf_dir: str, budget: int = TOKEN_BUDGET) -> rd.Dataset:
    """(doc_id, source, n_tokens): docs taken per source in seeded-shuffle
    order until the source's TOKEN budget fills — how a pretraining mix is
    actually specified (tokens, not doc counts; e.g. "30B web, 5B code").
    A doc is kept iff its source's running token total INCLUDING it stays
    ≤ budget, so the cut is deterministic and independent of scan order.

    Two-phase prefix sum (the seeded_shuffle / pack_sequences pattern, per
    source): a (source, hash-bucket) token-sum aggregate — ≤ sources ×
    SHUFFLE_BUCKETS rows — comes back to the driver for exclusive prefix
    offsets, then ONE exchange keyed on (source, bucket) lets each block
    rank its runs locally by (h, doc_id) and add the run's global offset.
    No global sort; the exchange moves (doc_id, source, h, n_tok) rows,
    never text. Driver state is O(sources × buckets): sources here are
    mixture components (corpus tags, dozens), not web domains — a
    per-domain budget would key the same shape on domain-hash buckets
    instead of materializing per-domain offsets."""
    kept = apply_token_budget(keyed_token_docs(f"{sf_dir}/documents.parquet"),
                              budget)
    return kept.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "source": t["source"],
                            "n_tokens": t["n_tok"]}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_TOKEN_BUDGET_MIX = rf"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         {sql_mix_hash('doc_id', SHUFFLE_SEED)} AS h
  FROM documents
)
SELECT doc_id, source, n_tokens
FROM t
QUALIFY SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)
        <= {TOKEN_BUDGET}
"""


# ---------------------------------------------------------------------------
# temperature_mix — UniMax/alpha-temperature source sampling (alpha = 0.5)
# ---------------------------------------------------------------------------
#
# The multilingual-mix move (UniMax, Chung et al. 2023; the mT5 alpha-
# sampling family): sample sources proportionally to n_s^alpha so large
# sources are damped and small ones boosted.  alpha = 1/2 keeps the whole
# computation integer-exact via isqrt: quota_s = B·⌊√tok_s⌋ // Σ⌊√tok⌋ docs,
# filled in seeded-hash order.  Weights come from TOKEN counts (how real
# mixes are specified), via one tiny (source → Σ n_tok) aggregate — O(S)
# driver state; the pick is the source_cap exchange with per-source quotas.

TEMP_BUDGET = 100  # total docs across sources; bites at every test scale


def temperature_mix(sf_dir: str, budget: int = TEMP_BUDGET) -> rd.Dataset:
    """(doc_id, source): at most quota_s docs per source — the ones with the
    smallest shuffle hash — where quota_s ∝ isqrt(source token count).  The
    floor-division quota can undershoot ``budget`` by < S docs (no
    largest-remainder pass: determinism beats exact budget fill here, and
    the SQL mirror stays one QUALIFY)."""
    from ocrautomator_ray.functions.dedup import _tokenize_re2

    path = f"{sf_dir}/documents.parquet"

    def tok_counts(t: pa.Table) -> pa.Table:
        _, cnt = _tokenize_re2(t["text"])
        return pa.table({"source": t["source"],
                         "n_tok": pa.array(cnt.astype(np.int64), pa.int64())})

    sums = (pruned_read(path, ["source", "text"])
            .map_batches(tok_counts, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("source", num_partitions=4).sum("n_tok")
            .to_pandas())  # O(sources) driver state
    import math

    sources = np.sort(sums["source"].to_numpy())
    tok = sums.set_index("source")["sum(n_tok)"].loc[sources].to_numpy()
    w = np.array([math.isqrt(int(x)) for x in tok], np.int64)
    denom = max(int(w.sum()), 1)
    quota = budget * w // denom

    ds = pruned_read(path, ["doc_id", "source"])
    out_schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def pick_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        src = block["source"].to_numpy(zero_copy_only=False)
        h = mix_hash(ids, SHUFFLE_SEED)
        order = np.lexsort((ids, h, src))
        s_sorted = src[order]
        starts = np.nonzero(np.r_[True, s_sorted[1:] != s_sorted[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(s_sorted)])
        cap_row = quota[np.searchsorted(sources, s_sorted)]
        keep = order[_ramp(run_len) < cap_row]
        keep.sort()
        return block.take(pa.array(keep))

    return per_key_blocks(ds, ["source"], pick_block)


SQL_TEMPERATURE_MIX = rf"""
WITH n AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> ''))) AS BIGINT) AS n_tok
  FROM documents GROUP BY source
),
w AS (SELECT source, CAST(FLOOR(SQRT(n_tok)) AS BIGINT) AS w FROM n),
q AS (SELECT source, {TEMP_BUDGET} * w // (SELECT SUM(w) FROM w) AS quota
      FROM w)
SELECT d.doc_id, d.source
FROM documents d JOIN q USING (source)
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY d.source
    ORDER BY {sql_mix_hash('d.doc_id', SHUFFLE_SEED)}, d.doc_id) <= q.quota
"""


# ---------------------------------------------------------------------------
# mix_corpus — per-source ratio mixing with deterministic upsampling
# ---------------------------------------------------------------------------

def _mix_permille(names: np.ndarray) -> np.ndarray:
    """Per-source target weight in permille (500–2600 ≈ 0.5×–2.6×) — a pure
    function of the name so engine and SQL agree without a config table.
    Real pipelines broadcast a weights dict; the replication mechanics are
    what this operator demonstrates."""
    c = np.array([ord(n[3]) if len(n) > 3 else 0 for n in names], np.int64)
    return 500 + 300 * (c % 8)


def mix_corpus(sf_dir: str) -> rd.Dataset:
    """(doc_id, source, epoch): each doc replicated to hit its source's
    target weight — ``w // 1000`` full epochs plus one more iff the doc's
    hash bucket falls under ``w % 1000`` (so a 2.6× source repeats every doc
    twice and 60% of docs a third time; a 0.5× source keeps half its docs).
    Stateless per batch, no shuffle, deterministic: the replica set of a doc
    never changes when the corpus grows."""
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "source"])

    def replicate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        w = _mix_permille(uniq)[inv]
        epochs = w // 1000 + (knuth_bucket(ids) < w % 1000)
        idx = np.repeat(np.arange(len(ids)), epochs)
        return pa.table({
            "doc_id": pa.array(ids[idx], pa.int64()),
            "source": pa.array(src[idx], pa.string()),
            "epoch": pa.array(_ramp(epochs), pa.int64()),
        })

    return ds.map_batches(replicate, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_MIX_CORPUS = f"""
WITH w AS (
  SELECT doc_id, source,
         500 + 300 * (ascii(substr(source, 4, 1)) % 8) AS w
  FROM documents
)
SELECT doc_id, source, CAST(e.epoch AS BIGINT) AS epoch
FROM w, UNNEST(range(w.w // 1000 +
                     CASE WHEN {sql_bucket('doc_id')} < w.w % 1000
                          THEN 1 ELSE 0 END)) AS e(epoch)
"""


# ---------------------------------------------------------------------------
# weighted_sample — quality-proportional Bernoulli keep
# ---------------------------------------------------------------------------

def weighted_sample(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars) kept with probability min(0.999, n_chars/5000) —
    longer (proxy: higher-quality) docs survive more often. The keep
    decision is the doc's hash bucket vs its weight, so reruns and
    downstream pipelines see the same sample."""
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "n_chars"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        permille = np.minimum(999, nc // 5)
        keep = knuth_bucket(ids) < permille
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "n_chars": t["n_chars"].filter(pa.array(keep)),
        })

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


SQL_WEIGHTED_SAMPLE = f"""
SELECT doc_id, n_chars
FROM documents
WHERE {sql_bucket('doc_id')} < LEAST(999, n_chars // 5)
"""


# ---------------------------------------------------------------------------
# rp_project — sign random projection in exact integer arithmetic
# ---------------------------------------------------------------------------

def _rp_signs(in_dim: int = RP_IN_DIM, out_dim: int = RP_OUT_DIM) -> np.ndarray:
    """±1 matrix [in_dim, out_dim] from the sketch module's 64-bit avalanche
    mixer over the flat cell index — one Knuth multiply is NOT enough here
    (consecutive indices stay bit-correlated; measured column correlations
    ~0.9), while the murmur-final mixer decorrelates them. The SQL oracle
    inlines the resulting sign constants, so the mixer needs no SQL mirror."""
    from ocrautomator_ray.functions.sketch import _hash_u64

    cell = np.arange(in_dim * out_dim, dtype=np.int64)
    h = _hash_u64(cell).reshape(in_dim, out_dim)
    return np.where((h >> np.uint64(32)) & np.uint64(1) == 0, 1,
                    -1).astype(np.int64)


def rp_project(sf_dir: str, out_dim: int = RP_OUT_DIM) -> rd.Dataset:
    """(vec_id, proj_0..proj_{k-1}): embeddings projected 64→k dims with a
    deterministic ±1 matrix (Achlioptas-style database-friendly random
    projection). Elements are integerized at 1e-6 BEFORE the matmul so the
    whole computation is int64 — bit-identical on any partitioning, no
    float-summation-order hazard between engine and oracle. Output feeds
    LSH bucketing / cheap ANN prefilters at 8× less vector traffic."""
    signs = _rp_signs(RP_IN_DIM, out_dim)
    cols = [f"proj_{j}" for j in range(out_dim)]

    def project(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(-1, RP_IN_DIM)
        mat_int = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        proj = mat_int @ signs
        out = {"vec_id": t["vec_id"]}
        for j, c in enumerate(cols):
            out[c] = pa.array(proj[:, j], pa.int64())
        return pa.table(out)

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def _sql_rp_project() -> str:
    signs = _rp_signs()
    terms = []
    for j in range(RP_OUT_DIM):
        sign_list = ", ".join(str(s) for s in signs[:, j])
        terms.append(
            f"CAST(list_sum(list_transform(range(1, {RP_IN_DIM + 1}), i -> "
            f"CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) "
            f"AS BIGINT) * ([{sign_list}])[i])) AS BIGINT) AS proj_{j}")
    return "SELECT vec_id, " + ", ".join(terms) + " FROM embeddings"


SQL_RP_PROJECT = _sql_rp_project()


# ---------------------------------------------------------------------------
# hashed_doc_vectors — feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

HASH_DIM = 16
_HASH_SIGN_SHIFT = 32  # sign bit well above the bucket bits (h % HASH_DIM)


def hashed_doc_vectors(sf_dir: str, dim: int = HASH_DIM) -> rd.Dataset:
    """(doc_id, n_tokens, v_0..v_{dim-1}): each document's signed
    hashed-token-count vector — v_j = Σ over token occurrences w with
    fnv1a(w) % dim == j of sign(w), sign(w) = ±1 from hash bit 32
    (Weinberger et al., ICML 2009 feature hashing; the sign bit unbiases
    E[v·v'] like rp_project's Achlioptas signs).  Entirely per-batch FINAL —
    each doc's text lives in one row, so the operator is a pure vectorized
    map: tokenize, one vectorized FNV pass, one scatter-add per batch.
    Output feeds kmeans_fit / brute-force cosine / LSH exactly like a
    learned embedding column, at zero training cost."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings, _tokenize_re2

    cols = [f"v_{j}" for j in range(dim)]

    def featurize(t: pa.Table) -> pa.Table:
        flat, cnt = _tokenize_re2(t["text"])
        n = t.num_rows
        out = np.zeros((n, dim), np.int64)
        if len(flat):
            h = _fnv1a_strings(flat)
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where(
                (h >> np.uint64(_HASH_SIGN_SHIFT)) & np.uint64(1) == 1,
                -1, 1).astype(np.int64)
            doc_idx = np.repeat(np.arange(n), cnt)
            np.add.at(out, (doc_idx, bucket), sign)
        res = {"doc_id": t["doc_id"],
               "n_tokens": pa.array(cnt.astype(np.int64), pa.int64())}
        for j, c in enumerate(cols):
            res[c] = pa.array(out[:, j], pa.int64())
        return pa.table(res)

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    return ds.map_batches(featurize, batch_format="pyarrow",
                          zero_copy_batch=True)


def _sql_hashed_doc_vectors() -> str:
    from ocrautomator_ray.functions.dedup import _sql_fnv1a

    # hash each DISTINCT token once (hw is vocabulary-sized), then pivot the
    # signed sums into the wide integer columns the engine emits
    vcols = ",\n       ".join(
        f"CAST(COALESCE(SUM(CASE WHEN b = {j} THEN k * sgn ELSE 0 END), 0) "
        f"AS BIGINT) AS v_{j}" for j in range(HASH_DIM))
    sel = ", ".join(f"COALESCE(s.v_{j}, 0) AS v_{j}"
                    for j in range(HASH_DIM))
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
td AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
hw AS (
  SELECT w, {_sql_fnv1a('w')} AS h FROM (SELECT DISTINCT w FROM td)
),
hb AS (
  SELECT w, CAST(h % {HASH_DIM} AS BIGINT) AS b,
         CASE WHEN (h // {1 << _HASH_SIGN_SHIFT}) % 2 = 1
              THEN -1 ELSE 1 END AS sgn
  FROM hw
),
s AS (
  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
       {vcols}
  FROM td JOIN hb USING (w) GROUP BY doc_id
)
SELECT d.doc_id AS doc_id, CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       {sel}
FROM documents d LEFT JOIN s USING (doc_id)
"""


SQL_HASHED_DOC_VECTORS = _sql_hashed_doc_vectors()


# ---------------------------------------------------------------------------
# sample_k — deterministic exact-k uniform sample (hash ranking)
# ---------------------------------------------------------------------------

SAMPLE_K = 100


def sample_k(sf_dir: str, k: int = SAMPLE_K) -> rd.Dataset:
    """(doc_id, source) of exactly k docs — the ones with the smallest
    shuffle hash. A fixed-size eval subset that is uniform (hash ranks are
    exchangeable), reproducible, and STABLE under corpus growth in the
    bottom-k sense (a doc leaves the sample only when a smaller-hash doc
    arrives). Per-batch top-k partials (lossless prune: the global bottom-k
    is a subset of batch bottom-ks), so the final sort ranks k×batches
    rows, never the corpus."""
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = mix_hash(ids, SHUFFLE_SEED)
        if len(ids) > k:
            keep = np.lexsort((ids, h))[:k]
            keep.sort()
            t, h = t.take(pa.array(keep)), h[keep]
        return t.append_column("h", pa.array(h, pa.int64()))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["h", "doc_id"])
        .limit(k)
        .drop_columns(["h"])
    )


SQL_SAMPLE_K = f"""
SELECT doc_id, source
FROM documents
ORDER BY {sql_mix_hash('doc_id', SHUFFLE_SEED)}, doc_id
LIMIT {SAMPLE_K}
"""


QUERIES = {
    "seeded_shuffle": seeded_shuffle,
    "token_budget_mix": token_budget_mix,
    "temperature_mix": temperature_mix,
    "sample_k": sample_k,
    "source_cap": source_cap,
    "mix_corpus": mix_corpus,
    "weighted_sample": weighted_sample,
    "rp_project": rp_project,
    "hashed_doc_vectors": hashed_doc_vectors,
}

SQL = {
    "seeded_shuffle": SQL_SEEDED_SHUFFLE,
    "token_budget_mix": SQL_TOKEN_BUDGET_MIX,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "sample_k": SQL_SAMPLE_K,
    "source_cap": SQL_SOURCE_CAP,
    "mix_corpus": SQL_MIX_CORPUS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "rp_project": SQL_RP_PROJECT,
    "hashed_doc_vectors": SQL_HASHED_DOC_VECTORS,
}


# ---------------------------------------------------------------------------
# idf_hashed_vectors — the TF-IDF upgrade of hashed_doc_vectors: each token
# occurrence contributes sign(w) · idf(w) instead of sign(w), where
# idf(w) = n_docs · 1e6 // df(w) is the exact integer rational (no libm
# log — monotone in the true idf, which is all a downstream cosine needs).
# Rare informative tokens dominate the vector; stopword mass shrinks.
#
# Unlike hashed_doc_vectors (pure per-batch map), idf needs corpus document
# frequencies — and broadcasting a web-scale vocabulary is off the table.
# So the operator distributes BY TOKEN: per-batch (w, doc_id, bucket,
# signed-count) combiners → ONE token-keyed exchange where each block holds
# a token's every row and attaches idf in place (the tfidf_top_terms
# in-block-DF shape) → ONE doc-keyed exchange scatter-adds contributions
# into the wide integer vectors. Nothing vocabulary-sized ever sits on the
# driver or in a closure.
# ---------------------------------------------------------------------------

def idf_hashed_vectors(sf_dir: str, dim: int = HASH_DIM) -> rd.Dataset:
    """(doc_id, v_0..v_{dim-1}): signed idf-weighted hashed token vectors
    (docs with no tokens emit no row, matching the oracle's inner group)."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings, _tokenize_re2
    from ocrautomator_ray.functions.exchange import (
        auto_partitions,
        per_key_blocks,
    )

    path = f"{sf_dir}/documents.parquet"
    n_docs = int(pruned_read(path, ["doc_id"]).count())
    cols = [f"v_{j}" for j in range(dim)]
    row_schema = pa.schema([
        ("w", pa.string()), ("doc_id", pa.int64()),
        ("bucket", pa.int64()), ("sk", pa.int64()),
    ])
    contrib_schema = pa.schema([
        ("doc_id", pa.int64()), ("bucket", pa.int64()), ("c", pa.int64()),
    ])

    def token_rows(t: pa.Table) -> pa.Table:
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return row_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, cnt)
        w = flat.to_numpy(zero_copy_only=False)
        h = _fnv1a_strings(flat)
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where(
            (h >> np.uint64(_HASH_SIGN_SHIFT)) & np.uint64(1) == 1,
            -1, 1).astype(np.int64)
        # fold each (doc, token)'s occurrences into one signed count
        order = np.lexsort((doc, w))
        w, doc, bucket, sign = w[order], doc[order], bucket[order], sign[order]
        new = np.r_[True, (w[1:] != w[:-1]) | (doc[1:] != doc[:-1])]
        starts = np.flatnonzero(new)
        run = np.diff(np.r_[starts, len(w)])
        return pa.table({
            "w": pa.array(w[starts], pa.string()),
            "doc_id": pa.array(doc[starts], pa.int64()),
            "bucket": pa.array(bucket[starts], pa.int64()),
            "sk": pa.array(sign[starts] * run, pa.int64()),
        })

    def attach_idf(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return contrib_schema.empty_table()
        w = block["w"].to_numpy(zero_copy_only=False)
        sk = block["sk"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="mergesort")
        w_s = w[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        run = np.diff(np.r_[starts, len(w_s)])
        df = np.empty(len(w), np.int64)           # (doc,w) rows are distinct
        df[order] = np.repeat(run, run)           # → df = rows per token
        idf = n_docs * 1_000_000 // df
        return pa.table({
            "doc_id": block["doc_id"],
            "bucket": block["bucket"],
            "c": pa.array(sk * idf, pa.int64()),
        })

    def fold_vectors(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("doc_id", pa.int64())]
                             + [(c, pa.int64()) for c in cols]).empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        c = block["c"].to_numpy(zero_copy_only=False)
        uids, inv = np.unique(ids, return_inverse=True)
        out = np.zeros((len(uids), dim), np.int64)
        np.add.at(out, (inv, b), c)
        res = {"doc_id": pa.array(uids, pa.int64())}
        for j, col in enumerate(cols):
            res[col] = pa.array(out[:, j], pa.int64())
        return pa.table(res)

    nparts = auto_partitions(path)
    rows = pruned_read(path, ["doc_id", "text"]).map_batches(
        token_rows, batch_format="pyarrow", zero_copy_batch=True)
    contribs = per_key_blocks(rows, ["w"], attach_idf,
                              num_partitions=nparts)
    return per_key_blocks(contribs, ["doc_id"], fold_vectors,
                          num_partitions=nparts)


def _sql_idf_hashed_vectors() -> str:
    from ocrautomator_ray.functions.dedup import _sql_fnv1a

    vcols = ",\n       ".join(
        f"CAST(COALESCE(SUM(CASE WHEN b = {j} THEN c ELSE 0 END), 0) "
        f"AS BIGINT) AS v_{j}" for j in range(HASH_DIM))
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
td AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
dfreq AS (SELECT w, COUNT(*) AS df FROM td GROUP BY w),
nd AS (SELECT COUNT(*) AS n FROM documents),
hw AS (
  SELECT w, {_sql_fnv1a('w')} AS h FROM (SELECT DISTINCT w FROM td)
),
hb AS (
  SELECT w, CAST(h % {HASH_DIM} AS BIGINT) AS b,
         CASE WHEN (h // {1 << _HASH_SIGN_SHIFT}) % 2 = 1
              THEN -1 ELSE 1 END AS sgn
  FROM hw
),
contrib AS (
  SELECT td.doc_id, hb.b,
         td.k * hb.sgn * (nd.n * 1000000 // dfreq.df) AS c
  FROM td JOIN hb USING (w) JOIN dfreq USING (w), nd
)
SELECT doc_id,
       {vcols}
FROM contrib GROUP BY doc_id
"""


SQL_IDF_HASHED_VECTORS = _sql_idf_hashed_vectors()

QUERIES["idf_hashed_vectors"] = idf_hashed_vectors
SQL["idf_hashed_vectors"] = SQL_IDF_HASHED_VECTORS
