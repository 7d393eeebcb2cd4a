"""Watch-driven incremental corpus maintenance, composed end-to-end
(VERDICT r4 #8): the loop a rolling corpus actually runs as crawl shards
land, with every stage an already-verified building block —

    arrivals (watch fragment manifest, epoch per fragment)
      → near-dup screen vs the COMMITTED corpus (persisted LSH signature
        index for the committed side + earlier arrivals; only the new
        fragment is shingled — snapshot.incremental_neardup's machinery)
      → survivors appended to the persisted BM25 inverted index
        (corpus.bm25_index_append — additive epoch sub-sinks, EXACT)
      → the final answer is a BM25 top-k probe over base ∪ epochs.

The SQL oracle is the BATCH RECOMPUTE over the full documents table: the
global incremental-neardup drop rule (a new doc drops iff a verified
near-dup partner is committed or an earlier-id new doc) selects the kept
set, and SQL_BM25's scoring runs over exactly that set.  A hash-exact
match proves the epoch-by-epoch incremental path equals recomputing the
whole corpus from scratch.

Epoch equivalence argument (why per-epoch screening = the global rule):
arrival fragments are split by ascending doc_id, so when fragment f is
screened against base ∪ earlier fragments, every drop the global rule
assigns to f's docs is derivable from pairs touching f (its partners are
committed or lower-id new docs, all present), and every pair the screen
verifies beyond earlier epochs touches f (enforced by the pair_keep
range predicate) — drops land exactly in f.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.curate import INCR_NEW_MOD
from ocrautomator_ray.functions.dedup import (
    MINHASH_THRESHOLD,
    _batch_shingles,
    _minhash_ctes,
    _shingle_blob_col,
    sig_rows,
    verified_pair_stage,
)
from ocrautomator_ray.functions.exchange import auto_partitions, pruned_read
from ocrautomator_ray.functions.snapshot import (
    _BK_COLS,
    _drop_counts,
    _melt_band_rows,
    neardup_index_build,
)


def _write_inputs(sf_dir: str, root: str) -> tuple[str, list[str]]:
    """Deterministic base corpus + two arrival fragments under ``root``:
    committed docs (doc_id % INCR_NEW_MOD != 0) become base/documents.parquet;
    new docs, ascending doc_id, split at the median into arrivals/frag-*.
    Returns (base_dir, fragment paths in arrival order)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    new = ids % INCR_NEW_MOD == 0
    base_dir = os.path.join(root, "base")
    arrivals = os.path.join(root, "arrivals")
    os.makedirs(base_dir), os.makedirs(arrivals)
    pq.write_table(t.filter(pa.array(~new)), f"{base_dir}/documents.parquet")
    new_t = t.filter(pa.array(new))
    half = new_t.num_rows // 2
    frags = []
    for i, sl in enumerate((new_t.slice(0, half), new_t.slice(half))):
        p = os.path.join(arrivals, f"frag-{i:03d}.parquet")
        pq.write_table(sl, p)
        frags.append(p)
    return base_dir, frags


def _frag_shingle_ds(path: str) -> rd.Dataset:
    """(doc_id, shingles blob) for every doc of an arrival fragment."""
    def sh(t: pa.Table) -> pa.Table:
        flat, cnt = _batch_shingles(t["text"])
        return pa.table({"doc_id": t["doc_id"],
                         "shingles": _shingle_blob_col(flat, cnt)})

    return pruned_read(path, ["doc_id", "text"]).map_batches(
        sh, batch_format="pyarrow", zero_copy_batch=True)


def _screen_fragment(frag_path: str, earlier: list[str], nd_index_dir: str,
                     threshold: float) -> set[int]:
    """doc_ids of ``frag_path`` dropped as near-dups of the committed corpus
    (persisted signature index) or earlier arrivals (or earlier-id docs of
    the same fragment). Only the fragments are shingled at query time."""
    import pyarrow.parquet as pq

    meta = pq.read_table(frag_path, columns=["doc_id"])
    fids = meta["doc_id"].to_numpy(zero_copy_only=False)
    f_lo, f_hi = int(fids.min()), int(fids.max())

    idx = pruned_read(os.path.join(nd_index_dir, "data"),
                      ["doc_id", "shingles", *_BK_COLS], heavy=True)
    committed_sh = idx.map_batches(
        lambda t: t.select(["doc_id", "shingles"]),
        batch_format="pyarrow", zero_copy_batch=True)
    committed_bands = idx.map_batches(_melt_band_rows, batch_format="pyarrow",
                                      zero_copy_batch=True)
    for p in earlier:
        e_sh = _frag_shingle_ds(p)
        committed_sh = committed_sh.union(e_sh)
        committed_bands = committed_bands.union(
            e_sh.map_batches(sig_rows, batch_format="pyarrow",
                             zero_copy_batch=True))
    new_sh = _frag_shingle_ds(frag_path)
    new_bands = new_sh.map_batches(sig_rows, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def touches_fragment(lo: np.ndarray, hi: np.ndarray,
                         f_lo=f_lo, f_hi=f_hi) -> np.ndarray:
        # candidate pruning: only pairs with an end in THIS fragment are
        # verified — base×base, base×earlier and earlier×earlier pairs were
        # handled (or pruned) in previous epochs
        m = INCR_NEW_MOD
        lo_in = (lo % m == 0) & (lo >= f_lo) & (lo <= f_hi)
        hi_in = (hi % m == 0) & (hi >= f_lo) & (hi <= f_hi)
        return lo_in | hi_in

    n_parts = auto_partitions(frag_path, os.path.join(nd_index_dir, "data"),
                              bytes_per_partition=8 << 20)
    pairs = verified_pair_stage(committed_sh.union(new_sh),
                                committed_bands.union(new_bands),
                                n_parts, threshold,
                                pair_keep=touches_fragment)
    drops = _drop_counts(pairs).to_pandas()
    return set(int(d) for d in drops["doc_id"])


def run_watch_incremental(sf_dir: str, out_root: str,
                          threshold: float = MINHASH_THRESHOLD) -> dict:
    """Run the full loop under ``out_root``; returns paths + per-epoch
    stats. Epoch discovery goes through the watch fragment manifest, so a
    rerun over the same out_root skips committed epochs (O(manifests))."""
    import pyarrow.parquet as pq

    from ocrautomator_ray.functions.corpus import bm25_index_append, bm25_index_build
    from ocrautomator_ray.pipelines.watch import (
        _frag_entry,
        _frag_path,
        _load_manifest,
        _store_manifest,
        list_fragments,
    )

    base_dir, _ = (
        (os.path.join(out_root, "base"), None)
        if os.path.isdir(os.path.join(out_root, "base"))
        else _write_inputs(sf_dir, out_root))
    arrivals_dir = os.path.join(out_root, "arrivals")
    bm25_idx = os.path.join(out_root, "bm25_index")
    nd_idx = os.path.join(out_root, "lsh_index")
    neardup_index_build(base_dir, index_dir=nd_idx)
    bm25_index_build(base_dir, index_dir=bm25_idx)

    watch_dir = os.path.join(out_root, "watch")
    os.makedirs(watch_dir, exist_ok=True)
    manifest = _load_manifest(watch_dir)
    # work list = every recorded epoch (committed AND pending — a pending
    # epoch is a killed run's unfinished work and must be COMPLETED, not
    # skipped) plus one new pending epoch per newly arrived fragment
    work = [(ep["epoch"], _frag_path(ep["fragments"][0]), ep["status"])
            for ep in manifest["epochs"]]
    known = {p for _, p, _ in work}
    for path in list_fragments(arrivals_dir):
        if path in known:
            continue
        epoch = len(manifest["epochs"])
        manifest["epochs"].append({"epoch": epoch,
                                   "fragments": [_frag_entry(path)],
                                   "status": "pending"})
        _store_manifest(watch_dir, manifest)
        work.append((epoch, path, "pending"))
    epochs = []
    for epoch, path, status in work:
        if status == "committed":
            continue
        earlier = [p for e2, p, _ in work if e2 < epoch]
        dropped = _screen_fragment(path, earlier, nd_idx, threshold)
        t = pq.read_table(path)
        if dropped:
            keep = ~np.isin(t["doc_id"].to_numpy(zero_copy_only=False),
                            np.fromiter(dropped, np.int64, len(dropped)))
            t = t.filter(pa.array(keep))
        surv = os.path.join(out_root, f"survivors-{epoch:03d}.parquet")
        if not os.path.exists(surv):
            # keep the file's fingerprint stable across reruns: the append
            # epoch is keyed on (name, size, mtime), so a pending-epoch
            # retry must reuse the identical bytes, not rewrite them —
            # otherwise the retried append would land a SECOND epoch dir
            # with the same postings
            tmp = f"{surv}.tmp.{os.getpid()}"
            pq.write_table(t, tmp)
            os.replace(tmp, surv)
        bm25_index_append(surv, bm25_idx)
        manifest = _load_manifest(watch_dir)
        manifest["epochs"][epoch]["status"] = "committed"
        _store_manifest(watch_dir, manifest)
        epochs.append({"epoch": epoch, "fragment": path,
                       "dropped": len(dropped), "kept": t.num_rows})

    return {"base_dir": base_dir, "bm25_index": bm25_idx,
            "epochs": epochs}


def query_watch_index(sf_dir: str, bm25_idx: str,
                      k: int | None = None) -> rd.Dataset:
    """BM25 top-k probe over base ∪ appended epochs: query terms from the
    ORIGINAL corpus' doc 0, stats from the index's additive (n, t), reads
    only the query terms' hash buckets — corpus.bm25_index_topk pointed at
    the watch-maintained index."""
    import ray

    import pyarrow.compute as pc

    from ocrautomator_ray.functions.corpus import (
        BM25_BUCKETS,
        BM25_TOP_K,
        _bm25_query_terms,
        _bm25_rank,
        _read_bm25_stats,
        bm25_bucket_fragments,
    )
    from ocrautomator_ray.functions.dedup import _fnv1a_strings

    k = k or BM25_TOP_K
    N, T = _read_bm25_stats(bm25_idx)
    q = _bm25_query_terms(f"{sf_dir}/documents.parquet")
    buckets = sorted({int(b) for b in _fnv1a_strings(q) % BM25_BUCKETS})
    frags = bm25_bucket_fragments(bm25_idx, buckets)
    q_ref = ray.put(q)

    def keep_query_terms(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=ray.get(q_ref)))

    tf = rd.read_parquet(
        frags, columns=["doc_id", "term", "tf", "dl"]).map_batches(
        keep_query_terms, batch_format="pyarrow", zero_copy_batch=True)
    return _bm25_rank(tf, N, T, k,
                      auto_partitions(*frags, bytes_per_partition=8 << 20))


def run_watch_incremental_flagship(sf_dir: str,
                                   scratch_root: str = "/tmp/ocrautomator_ray",
                                   fresh: bool = True) -> rd.Dataset:
    """queries() surface: rebuild the whole composition from scratch and
    return the final top-k table (doc_id, score_u, rank)."""
    import hashlib
    import shutil

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_root = os.path.join(scratch_root, f"watchinc-{tag}")
    if fresh and os.path.exists(out_root):
        shutil.rmtree(out_root)
    os.makedirs(out_root, exist_ok=True)
    res = run_watch_incremental(sf_dir, out_root)
    return query_watch_index(sf_dir, res["bm25_index"])


def _watch_incremental_sql() -> str:
    """Batch recompute of the whole composition in ONE statement: the
    global incremental-neardup drop rule picks the kept set, SQL_BM25's
    scoring runs over exactly that set (query terms still from the raw
    corpus' doc 0, matching the engine's probe)."""
    from ocrautomator_ray.functions.corpus import (
        BM25_B,
        BM25_K1,
        BM25_TOP_K,
    )

    m = INCR_NEW_MOD
    return rf"""
WITH {_minhash_ctes()},
p AS (
    SELECT doc_a, doc_b FROM ver
    WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {MINHASH_THRESHOLD}
),
dropped AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_b AS doc_id FROM p WHERE doc_b % {m} = 0
        UNION ALL
        SELECT doc_a FROM p WHERE doc_a % {m} = 0 AND doc_b % {m} <> 0
    )
),
kept AS (
    SELECT d.doc_id, d.text FROM documents d
    LEFT JOIN dropped x USING (doc_id)
    WHERE x.doc_id IS NULL
),
ktoks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM kept
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM ktoks GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n FROM kept),
tot AS (SELECT COUNT(*) AS t FROM ktoks),
q AS (
  SELECT DISTINCT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '')) AS term
  FROM documents WHERE doc_id = 0
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM ktoks JOIN q USING (term) GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           ((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5) / (df + 0.5))
           * ((tf * ({BM25_K1} + 1.0)) /
              (tf + {BM25_K1} * ((1.0 - {BM25_B})
                 + {BM25_B} * (dl.dl * CAST((SELECT n FROM stats) AS DOUBLE))
                   / CAST((SELECT t FROM tot) AS DOUBLE))))
           * 1000000 + 0.5) AS BIGINT) AS c_u
  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  WHERE tf.doc_id <> 0
)
SELECT doc_id, score_u, rank FROM (
  SELECT doc_id, CAST(SUM(c_u) AS BIGINT) AS score_u,
         row_number() OVER (ORDER BY SUM(c_u) DESC, doc_id) AS rank
  FROM contrib GROUP BY doc_id
) WHERE rank <= {BM25_TOP_K}
"""


SQL_WATCH_INCREMENTAL = _watch_incremental_sql()
