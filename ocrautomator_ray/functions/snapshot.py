"""Cross-snapshot corpus-evolution operators: the maintenance jobs a rolling
100-TB corpus runs every time a new crawl shard lands.

* ``incremental_neardup`` — the NEAR-dup half of cross-snapshot dedup
  (curate.incremental_dedup is the exact-text half): which documents of the
  new shard must be dropped because a verified MinHash near-duplicate
  already exists in the committed corpus (or in an earlier-id new doc).
  Reuses the whole banded-LSH + distributed-verify machinery of
  dedup.minhash_lsh_dups, with one incremental twist: a ``pair_keep``
  predicate prunes committed×committed candidate pairs BEFORE the two
  verify exchanges — the committed corpus is never re-deduped against
  itself, so verify shuffle volume scales with the new shard, not the
  corpus.
* ``incremental_neardup_indexed`` — the same operator answered from a
  PERSISTED committed-side signature index (``neardup_index_build``, the
  ivf_index_build pattern applied to LSH): query-time shingling touches
  only the new shard, the committed side is a column-pruned parquet read
  of pre-computed (shingle blob, band keys).  Same SQL oracle — the index
  changes where signatures come from, never what they are.
* ``corpus_drift`` — per-source unigram-distribution drift between the two
  snapshots: normalized L1 distance Σ_w |p_new(w) − p_old(w)| expressed in
  exact integer arithmetic, drift_u = Σ_w |c_new·T_old − c_old·T_new| ×
  1e6 // (T_new·T_old) ∈ [0, 2e6].  The monitoring table a crawl pipeline
  alarms on ("src3's vocabulary moved 40% this snapshot — scraper broke?").

The "new shard" is tagged deterministically by doc_id % INCR_NEW_MOD == 0 —
the same convention as curate.incremental_dedup; a real pipeline passes two
table paths and tags at the read.

Distribution shapes:

  incremental_neardup: minhash_lsh_dups' three exchanges (band bucket →
  shingle attach → pair verify) with early committed×committed pruning,
  then ONE doc-keyed exchange counts each dropped new doc's partners.
  Output is (doc_id, n_partners), doc-id sorted within blocks.

  corpus_drift: a per-source token-total side aggregate (O(sources) driver
  rows, broadcast in the closure) + per-batch (source, token, side-count)
  combiners → ONE (source, token)-keyed exchange where each block holds a
  (source, token)'s full corpus counts and emits per-source |Δ| partial
  sums → a final source-keyed reduce of O(sources × partitions) rows.  The
  exchange moves (source, token, 2 ints) rows — the DSIR/token-exchange
  shape that is probe-linear at 100×.  int64 bounds: each |Δ| term ≤
  max(c_new·T_old, c_old·T_new) and the per-source total ≤ 2·T_new·T_old;
  the final ×1e6 quotient is taken in Python ints on O(sources) rows, so
  the only bound that matters is T_new·T_old < 2^63 — beyond ~3e9 tokens
  per source per side, drop DRIFT_SCALE to 1e3 (SQL side is HUGEINT
  throughout, same pipeline).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.curate import INCR_NEW_MOD
from ocrautomator_ray.functions.dedup import (
    _BANDS,
    MINHASH_THRESHOLD,
    _batch_band_keys,
    _batch_shingles,
    _batch_signatures,
    _minhash_ctes,
    _shingle_blob_col,
    _tokenize_re2,
    minhash_lsh_dups,
    sig_rows,
    verified_pair_stage,
)
from ocrautomator_ray.functions.exchange import (
    auto_partitions,
    per_key_blocks,
    pruned_read,
)

# ---------------------------------------------------------------------------
# incremental_neardup
# ---------------------------------------------------------------------------

_DROP_SCHEMA = pa.schema([("doc_id", pa.int64())])
_NEARDUP_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_partners", pa.int64()),
])


def _new_touching(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """pair_keep predicate: at least one end is a new-shard doc."""
    return (lo % INCR_NEW_MOD == 0) | (hi % INCR_NEW_MOD == 0)


def _drop_counts(pairs: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_partners) from verified pairs via the drop rule — the
    shared tail of both incremental_neardup variants."""
    def drop_rows(t: pa.Table) -> pa.Table:
        """Per verified pair (a < b): b is dropped via partner a whenever b
        is new (a is committed or an earlier new doc either way); a is
        dropped via partner b only when a is new and b is committed."""
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        b_new = b % INCR_NEW_MOD == 0
        a_new_b_old = (a % INCR_NEW_MOD == 0) & (b % INCR_NEW_MOD != 0)
        return pa.table({"doc_id": pa.array(
            np.concatenate([b[b_new], a[a_new_b_old]]), pa.int64())})

    def count_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _NEARDUP_OUT_SCHEMA.empty_table()
        ids = np.sort(block["doc_id"].to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        n = np.diff(np.r_[starts, len(ids)])
        return pa.table({"doc_id": pa.array(ids[starts], pa.int64()),
                         "n_partners": pa.array(n.astype(np.int64),
                                                pa.int64())})

    drops = pairs.map_batches(drop_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    return per_key_blocks(drops, ["doc_id"], count_block, num_partitions=8)


def incremental_neardup(sf_dir: str,
                        threshold: float = MINHASH_THRESHOLD) -> rd.Dataset:
    """(doc_id, n_partners) for NEW-shard docs that must be DROPPED: a new
    doc d is dropped iff some verified near-dup partner e (jaccard ≥
    threshold) exists with e committed, or e new with e.doc_id < d.doc_id
    (the keep-first arbitration within the shard).  n_partners counts d's
    distinct dropping partners.  Committed docs are never dropped and
    committed×committed pairs are never verified — the incremental win."""
    return _drop_counts(
        minhash_lsh_dups(sf_dir, threshold, pair_keep=_new_touching))


def _incremental_neardup_sql() -> str:
    m = INCR_NEW_MOD
    return f"""
WITH {_minhash_ctes()},
p AS (
    SELECT doc_a, doc_b FROM ver
    WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {MINHASH_THRESHOLD}
),
drops AS (
    SELECT doc_b AS doc_id FROM p WHERE doc_b % {m} = 0
    UNION ALL
    SELECT doc_a FROM p WHERE doc_a % {m} = 0 AND doc_b % {m} <> 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners
FROM drops GROUP BY doc_id
"""


SQL_INCREMENTAL_NEARDUP = _incremental_neardup_sql()


# ---------------------------------------------------------------------------
# Persisted LSH signature index — incremental_neardup with O(new shard)
# query-time compute.  The plain operator re-shingles the COMMITTED corpus on
# every shard arrival; at 10^12 docs that per-snapshot recompute dwarfs the
# new shard.  The index persists the committed side's (shingle blob, 16 band
# keys) ONCE through the generic resumable sink (the ivf_index_build pattern
# applied to LSH): a killed build resumes with O(P) manifest reads, a
# committed build is a no-op, and every later shard pays only its own
# shingling — the committed side is a column-pruned parquet read.
# ---------------------------------------------------------------------------

_NEARDUP_INDEX_ROOT = os.path.join("/tmp", "ocrauto_lsh_index")
_BK_COLS = [f"bk_{j}" for j in range(_BANDS)]


def neardup_index_dir(sf_dir: str) -> str:
    """Deterministic per-input index location — the shared
    exchange.index_fingerprint_dir rule; a changed input never reuses a
    stale index."""
    from ocrautomator_ray.functions.exchange import index_fingerprint_dir

    return index_fingerprint_dir(_NEARDUP_INDEX_ROOT,
                                 f"{sf_dir}/documents.parquet")


def _evict_stale_neardup_indexes(index_dir: str) -> None:
    from ocrautomator_ray.functions.exchange import evict_stale_index_dirs

    evict_stale_index_dirs(index_dir, _NEARDUP_INDEX_ROOT)


def _committed_sig_table(t: pa.Table) -> pa.Table:
    """Committed-side rows → (doc_id, shingles blob, bk_0..bk_15)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(ids % INCR_NEW_MOD != 0))
    flat, cnt = _batch_shingles(t["text"])
    keys = _batch_band_keys(_batch_signatures(flat, cnt))
    cols = {"doc_id": t["doc_id"], "shingles": _shingle_blob_col(flat, cnt)}
    for j, c in enumerate(_BK_COLS):
        cols[c] = pa.array(keys[:, j], pa.uint64())
    return pa.table(cols)


def neardup_index_build(sf_dir: str, index_dir: str | None = None,
                        num_partitions: int = 8) -> dict:
    """Build (or resume) the persisted signature index of the COMMITTED
    corpus slice: one streaming shingle+signature pass written via the
    resumable sink.  Returns the sink summary plus ``index_dir``."""
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    index_dir = index_dir or neardup_index_dir(sf_dir)
    _evict_stale_neardup_indexes(index_dir)
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    summary = resumable_write(
        ds.map_batches(_committed_sig_table, batch_format="pyarrow",
                       zero_copy_batch=True),
        index_dir, num_partitions=num_partitions, key="doc_id",
        input_desc=f"{sf_dir}/documents.parquet [committed slice]")
    summary["index_dir"] = index_dir
    return summary


def _melt_band_rows(t: pa.Table) -> pa.Table:
    """(doc_id, bk_0..bk_15) → the (doc_id, band_id, band_key) melt the
    band-bucket exchange consumes — pure reshape, no hashing."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    n = len(ids)
    keys = np.empty((n, _BANDS), np.uint64)
    for j, c in enumerate(_BK_COLS):
        keys[:, j] = t[c].to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, _BANDS), pa.int64()),
        "band_id": pa.array(np.tile(np.arange(_BANDS, dtype=np.int32), n),
                            pa.int32()),
        "band_key": pa.array(keys.reshape(-1), pa.uint64()),
    })


def incremental_neardup_indexed(sf_dir: str,
                                threshold: float = MINHASH_THRESHOLD,
                                index_dir: str | None = None) -> rd.Dataset:
    """``incremental_neardup`` answered from the PERSISTED committed-side
    signature index: identical output (same SQL oracle), but query-time
    shingling touches only the new shard — the committed side is a pruned
    parquet read of (doc_id, shingles, band keys).  Builds the index first
    when absent (a committed build resumes to a no-op)."""
    index_dir = index_dir or neardup_index_dir(sf_dir)
    neardup_index_build(sf_dir, index_dir)

    path = f"{sf_dir}/documents.parquet"
    n_parts = auto_partitions(path, bytes_per_partition=8 << 20)

    idx = pruned_read(os.path.join(index_dir, "data"),
                      ["doc_id", "shingles", *_BK_COLS], heavy=True)
    idx_sh = idx.map_batches(
        lambda t: t.select(["doc_id", "shingles"]),
        batch_format="pyarrow", zero_copy_batch=True)
    idx_bands = idx.map_batches(_melt_band_rows, batch_format="pyarrow",
                                zero_copy_batch=True)

    def new_sig_table(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % INCR_NEW_MOD == 0))
        flat, cnt = _batch_shingles(t["text"])
        return pa.table({"doc_id": t["doc_id"],
                         "shingles": _shingle_blob_col(flat, cnt)})

    new_sh = pruned_read(path, ["doc_id", "text"]).map_batches(
        new_sig_table, batch_format="pyarrow", zero_copy_batch=True)
    new_bands = new_sh.map_batches(sig_rows, batch_format="pyarrow",
                                   zero_copy_batch=True)

    pairs = verified_pair_stage(
        idx_sh.union(new_sh), idx_bands.union(new_bands), n_parts,
        threshold, pair_keep=_new_touching)
    return _drop_counts(pairs)


# ---------------------------------------------------------------------------
# corpus_drift
# ---------------------------------------------------------------------------

DRIFT_SCALE = 1_000_000

_TOK_SCHEMA = pa.schema([
    ("source", pa.string()), ("w", pa.string()),
    ("c_old", pa.int64()), ("c_new", pa.int64()),
])
_PARTIAL_SCHEMA = pa.schema([
    ("source", pa.string()), ("s_abs", pa.int64()),
])
_DRIFT_OUT_SCHEMA = pa.schema([
    ("source", pa.string()), ("t_old", pa.int64()), ("t_new", pa.int64()),
    ("drift_u", pa.int64()),
])


def _side_counts(t: pa.Table) -> pa.Table:
    """Per-batch (source, w, c_old, c_new) partial counts."""
    flat, cnt = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _TOK_SCHEMA.empty_table()
    src = t["source"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    is_new = (ids % INCR_NEW_MOD == 0).astype(np.int64)
    g = pa.TableGroupBy(pa.table({
        "source": pa.array(np.repeat(src, cnt), pa.string()),
        "w": flat,
        "new": pa.array(np.repeat(is_new, cnt), pa.int64()),
    }), ["source", "w"]).aggregate([("new", "sum"), ([], "count_all")])
    c_new = g["new_sum"].to_numpy(zero_copy_only=False)
    tot = g["count_all"].to_numpy(zero_copy_only=False)
    return pa.table({"source": g["source"], "w": g["w"],
                     "c_old": pa.array(tot - c_new, pa.int64()),
                     "c_new": pa.array(c_new, pa.int64())})


def corpus_drift(sf_dir: str) -> rd.Dataset:
    """(source, t_old, t_new, drift_u): normalized unigram L1 distance ×1e6
    between the committed and new snapshot slices, per source (2e6 =
    disjoint vocabularies, 0 = identical distributions; -1 when a source
    has no tokens on one side and the distance is undefined)."""
    path = f"{sf_dir}/documents.parquet"
    rows = pruned_read(path, ["doc_id", "source", "text"]).map_batches(
        _side_counts, batch_format="pyarrow", zero_copy_batch=True)

    # side aggregate: per-source token totals (O(sources) driver rows)
    def total_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("source", pa.string()),
                              ("t_old", pa.int64()),
                              ("t_new", pa.int64())]).empty_table()
        g = pa.TableGroupBy(block, ["source"]).aggregate(
            [("c_old", "sum"), ("c_new", "sum")])
        return pa.table({"source": g["source"],
                         "t_old": g["c_old_sum"].cast(pa.int64()),
                         "t_new": g["c_new_sum"].cast(pa.int64())})

    totals = per_key_blocks(rows, ["source"], total_block,
                            num_partitions=4).to_pandas()
    t_old = dict(zip(totals["source"], totals["t_old"].astype(int)))
    t_new = dict(zip(totals["source"], totals["t_new"].astype(int)))
    srcs = np.sort(totals["source"].to_numpy())
    t_old_v = np.array([t_old[s] for s in srcs], np.int64)
    t_new_v = np.array([t_new[s] for s in srcs], np.int64)

    def abs_block(block: pa.Table) -> pa.Table:
        """All counts of a (source, token) are co-located: reduce the
        partials, take |c_new·T_old − c_old·T_new| per run, emit per-source
        partial sums."""
        if block.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        src = block["source"].to_numpy(zero_copy_only=False)
        w = block["w"].to_numpy(zero_copy_only=False)
        c_old = block["c_old"].to_numpy(zero_copy_only=False)
        c_new = block["c_new"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, src))
        src, w, c_old, c_new = src[order], w[order], c_old[order], c_new[order]
        new_run = np.r_[True, (src[1:] != src[:-1]) | (w[1:] != w[:-1])]
        starts = np.flatnonzero(new_run)
        ro = np.add.reduceat(c_old, starts)
        rn = np.add.reduceat(c_new, starts)
        si = np.searchsorted(srcs, src[starts])
        term = np.abs(rn * t_old_v[si] - ro * t_new_v[si])
        g = pa.TableGroupBy(pa.table({
            "source": pa.array(src[starts], pa.string()),
            "s_abs": pa.array(term, pa.int64()),
        }), ["source"]).aggregate([("s_abs", "sum")])
        return pa.table({"source": g["source"],
                         "s_abs": g["s_abs_sum"].cast(pa.int64())})

    partials = per_key_blocks(rows, ["source", "w"], abs_block,
                              num_partitions=auto_partitions(path))

    def final_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _DRIFT_OUT_SCHEMA.empty_table()
        g = pa.TableGroupBy(block, ["source"]).aggregate([("s_abs", "sum")])
        out_src, out_to, out_tn, out_d = [], [], [], []
        for s, sa in zip(g["source"].to_pylist(),
                         g["s_abs_sum"].to_pylist()):
            to, tn = t_old[s], t_new[s]  # Python ints: no 1e6× overflow
            out_src.append(s)
            out_to.append(to)
            out_tn.append(tn)
            out_d.append(-1 if to * tn == 0
                         else int(sa) * DRIFT_SCALE // (to * tn))
        return pa.table({"source": pa.array(out_src, pa.string()),
                         "t_old": pa.array(out_to, pa.int64()),
                         "t_new": pa.array(out_tn, pa.int64()),
                         "drift_u": pa.array(out_d, pa.int64())})

    return per_key_blocks(partials, ["source"], final_block,
                          num_partitions=4)


SQL_CORPUS_DRIFT = rf"""
WITH toks AS (
  SELECT source,
         CASE WHEN doc_id % {INCR_NEW_MOD} = 0 THEN 1 ELSE 0 END AS is_new,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
c AS (
  SELECT source, w, CAST(SUM(is_new) AS BIGINT) AS c_new,
         CAST(SUM(1 - is_new) AS BIGINT) AS c_old
  FROM toks GROUP BY source, w
),
t AS (
  SELECT source, CAST(SUM(c_new) AS BIGINT) AS t_new,
         CAST(SUM(c_old) AS BIGINT) AS t_old
  FROM c GROUP BY source
)
SELECT c.source AS source, t.t_old, t.t_new,
       CAST(CASE WHEN t.t_old * t.t_new = 0 THEN -1
            ELSE CAST(SUM(ABS(c_new * t.t_old - c_old * t.t_new)) AS HUGEINT)
                 * {DRIFT_SCALE}
                 // (CAST(t.t_old AS HUGEINT) * t.t_new)
            END AS BIGINT) AS drift_u
FROM c JOIN t ON c.source = t.source
GROUP BY c.source, t.t_old, t.t_new
"""


QUERIES = {"incremental_neardup": incremental_neardup,
           "incremental_neardup_indexed": incremental_neardup_indexed,
           "corpus_drift": corpus_drift}
SQL = {"incremental_neardup": SQL_INCREMENTAL_NEARDUP,
       # identical semantics — the index only changes WHERE the committed
       # side's signatures come from, so the same oracle pins both paths
       "incremental_neardup_indexed": SQL_INCREMENTAL_NEARDUP,
       "corpus_drift": SQL_CORPUS_DRIFT}


# --------------------------------------------------------------------------
# snapshot_changelog — doc-level diff between two snapshots: which documents
# were added, removed, changed, or untouched by the new crawl. The audit
# table an ops team reads before promoting a snapshot (and the input to
# incremental re-processing: only 'added'/'changed' rows re-enter the
# pipeline). Snapshots are tagged deterministically from doc_id (old =
# id % 3 != 0, new = id % 3 != 1, new text mutated when id % 7 == 0 by
# dropping the leading token) — a real pipeline passes two table paths and
# tags at the read, exactly like incremental_neardup's INCR_NEW_MOD note.
#
# Distribution shape: two pruned reads tag the sides, ONE doc-keyed
# exchange co-locates each doc's (≤2) rows, and the block kernel resolves
# the status vectorized per run. Content equality here compares the
# co-located strings exactly (the SQL-mirrorable choice); at corpus scale
# the exchange would carry a 128-bit content hash instead of text — same
# pipeline, smaller rows.
# --------------------------------------------------------------------------

_CHANGELOG_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("status", pa.string()),
])
_DROP_FIRST_TOKEN = r"^\S+\s*"


def snapshot_changelog(sf_dir: str) -> rd.Dataset:
    """(doc_id, status ∈ {added, removed, changed, unchanged}) between the
    old (id % 3 != 0) and new (id % 3 != 1, leading token dropped when
    id % 7 == 0) snapshot slices."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/documents.parquet"

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = (ids % 3 != 0) if side == 0 else (ids % 3 != 1)
            t = t.filter(pa.array(keep))
            ids = ids[keep]
            text = t["text"]
            if side == 1 and t.num_rows:
                mut = pc.replace_substring_regex(
                    text, pattern=_DROP_FIRST_TOKEN, replacement="",
                    max_replacements=1)
                text = pc.if_else(pa.array(ids % 7 == 0), mut, text)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": text,
                "side": pa.array(np.full(len(ids), side, np.int64),
                                 pa.int64()),
            })
        return fn

    old = pruned_read(path, ["doc_id", "text"]).map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True)
    new = pruned_read(path, ["doc_id", "text"]).map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True)

    def resolve(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _CHANGELOG_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        side = block["side"].to_numpy(zero_copy_only=False)
        text = block["text"].to_pandas().to_numpy()
        order = np.lexsort((side, ids))
        ids, side, text = ids[order], side[order], text[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        run_len = np.diff(np.r_[starts, len(ids)])
        out_ids = ids[starts]
        status = np.empty(len(starts), object)
        single = run_len == 1
        status[single & (side[starts] == 0)] = "removed"
        status[single & (side[starts] == 1)] = "added"
        both = ~single
        eq = text[starts[both]] == text[starts[both] + 1]
        status[both] = np.where(eq, "unchanged", "changed")
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "status": pa.array(status.tolist(), pa.string()),
        })

    return per_key_blocks(old.union(new), ["doc_id"], resolve,
                          num_partitions=8)


SQL_SNAPSHOT_CHANGELOG = r"""
WITH old AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 3 != 0
),
neu AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN regexp_replace(text, '^\S+\s*', '')
                ELSE text END AS text
    FROM documents WHERE doc_id % 3 != 1
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text = n.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id
"""


QUERIES["snapshot_changelog"] = snapshot_changelog
SQL["snapshot_changelog"] = SQL_SNAPSHOT_CHANGELOG


# --------------------------------------------------------------------------
# novelty_stats — cross-snapshot novelty score: of each NEW-shard doc's
# token 8-gram occurrences, how many belong to a gram NEVER seen in the
# committed corpus. The quality signal a crawl-ingest mix uses to pick
# genuinely-new material over re-crawls (the cross-slice complement of
# lm.dup_ngram_stats, whose gram machinery this reuses verbatim).
#
# Shape: per-batch (doc_id, gram, k) combiners over BOTH slices — the side
# is derivable from doc_id % INCR_NEW_MOD, so no tag column moves — ONE
# gram-keyed exchange where a block sees each gram's every row and flags
# new-doc rows whose gram has no committed-side row, then one doc-keyed
# aggregate of the (k, novel_k) partials.
# --------------------------------------------------------------------------

_NOVELTY_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_grams", pa.int64()),
    ("n_novel", pa.int64()),
])


def novelty_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_grams, n_novel) for new-shard docs with ≥1 gram."""
    from ocrautomator_ray.functions.lm import _gram_rows

    path = f"{sf_dir}/documents.parquet"
    part_schema = pa.schema([
        ("doc_id", pa.int64()), ("k", pa.int64()), ("novel_k", pa.int64()),
    ])

    def per_gram(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        gram = block["gram"].to_numpy(zero_copy_only=False)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        k = block["k"].to_numpy(zero_copy_only=False)
        order = np.argsort(gram, kind="mergesort")
        gram_s, ids_s, k_s = gram[order], ids[order], k[order]
        starts = np.flatnonzero(np.r_[True, gram_s[1:] != gram_s[:-1]])
        run_len = np.diff(np.r_[starts, len(k_s)])
        committed = ids_s % INCR_NEW_MOD != 0
        seen = np.repeat(
            np.add.reduceat(committed.astype(np.int64), starts) > 0, run_len)
        is_new = ~committed
        return pa.table({
            "doc_id": pa.array(ids_s[is_new], pa.int64()),
            "k": pa.array(k_s[is_new], pa.int64()),
            "novel_k": pa.array(
                np.where(seen[is_new], 0, k_s[is_new]), pa.int64()),
        })

    def per_doc(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _NOVELTY_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        k = block["k"].to_numpy(zero_copy_only=False)
        nk = block["novel_k"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")
        ids, k, nk = ids[order], k[order], nk[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        return pa.table({
            "doc_id": pa.array(ids[starts], pa.int64()),
            "n_grams": pa.array(np.add.reduceat(k, starts), pa.int64()),
            "n_novel": pa.array(np.add.reduceat(nk, starts), pa.int64()),
        })

    grams = pruned_read(path, ["doc_id", "text"]).map_batches(
        _gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    flagged = per_key_blocks(grams, ["gram"], per_gram,
                             num_partitions=auto_partitions(path))
    return per_key_blocks(flagged, ["doc_id"], per_doc, num_partitions=8)


def _sql_novelty() -> str:
    from ocrautomator_ray.functions.lm import NGRAM_N

    return rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(tl[p + 1 : p + {NGRAM_N}], ' ') AS gram
  FROM d, LATERAL (SELECT unnest(range(0, greatest(len(tl) - {NGRAM_N - 1},
                                                   0))) AS p) u
),
gd AS (SELECT doc_id, gram, COUNT(*) AS k FROM grams GROUP BY doc_id, gram),
committed_grams AS (
  SELECT DISTINCT gram FROM gd WHERE doc_id % {INCR_NEW_MOD} != 0
)
SELECT gd.doc_id, CAST(SUM(gd.k) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN c.gram IS NULL THEN gd.k ELSE 0 END) AS BIGINT)
           AS n_novel
FROM gd LEFT JOIN committed_grams c USING (gram)
WHERE gd.doc_id % {INCR_NEW_MOD} = 0
GROUP BY gd.doc_id
"""


SQL_NOVELTY_STATS = _sql_novelty()

QUERIES["novelty_stats"] = novelty_stats
SQL["novelty_stats"] = SQL_NOVELTY_STATS
