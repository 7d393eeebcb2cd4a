"""End-to-end corpus-curation pipeline (the training-data counterpart of the
extraction flagship):

    read documents → normalize (lowercase, whitespace-collapse, strip)
                   → quality stats (word count, duplicate-word fraction)
                   → filter (length + repetition thresholds)
                   → exact dedup on normalized text (keep lowest doc_id;
                     the exchange is keyed on an 8-byte text hash, text
                     travels only as row payload)
                   → deterministic train/val/test split
                   → resumable partitioned-parquet sink

Fully SQL-expressible, so the WHOLE pipeline is hash-checked against a
DuckDB oracle end-to-end (``curate_pipeline`` in __ray_entry__), and fully
resumable through the generic sink's per-partition manifests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.curate import (
    _distinct_per_doc,
    knuth_bucket,
    split_of,
    sql_split,
)
from ocrautomator_ray.functions.dedup import _fnv1a_strings, _split_tokens

CURATE_MIN_WORDS = 5
CURATE_MAX_DUP_WORD_U = 300_000  # drop docs with >30% repeated words

# 1-row pad for UDF outputs feeding a keyed exchange (see
# exchange.sentinel_pad); the NULL doc_id marks it — dedup_block and the
# resumable sink both drop null-key rows
CURATED_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("norm_text", pa.string()),
    ("n_words", pa.int64()), ("dup_word_frac_u", pa.int64()),
    ("split", pa.string()),
])

_SENTINEL_ROW = pa.table({
    "doc_id": pa.array([None], pa.int64()),
    "norm_text": pa.array([""], pa.string()),
    "n_words": pa.array([0], pa.int64()),
    "dup_word_frac_u": pa.array([0], pa.int64()),
    "nt_hash": pa.array([0], pa.uint64()),
})


def build_curated(sf_dir: str, source: rd.Dataset | None = None) -> rd.Dataset:
    """The lazy transform chain, sink-agnostic. Output columns:
    (doc_id, norm_text, n_words, dup_word_frac_u, split). ``source``
    overrides the read with an upstream (doc_id, text) Dataset — e.g. the
    full-corpus pipeline feeds the near-dup-removal survivors in here."""
    import pyarrow.compute as pc

    from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks

    ds = source if source is not None else rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def normalize_and_score(t: pa.Table) -> pa.Table:
        s = pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")),
            pattern=r"\s+", replacement=" ")
        s = pc.replace_substring_regex(s, pattern=r"^ | $", replacement="")
        # single-space split (empties dropped) — exactly the SQL oracle's
        # string_split(norm_text, ' '); normalization already collapsed all
        # RE2 whitespace, so this is the only split that stays in lockstep
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        words, counts = _split_tokens(pc.split_pattern(s, pattern=" "), len(s))
        distinct = _distinct_per_doc(_fnv1a_strings(words), counts)
        with np.errstate(invalid="ignore"):
            dup = np.where(counts > 0,
                           1.0 - distinct / np.maximum(counts, 1), 0.0)
        dup_u = np.floor(dup * 1_000_000 + 0.5).astype(np.int64)
        keep = (counts >= CURATE_MIN_WORDS) & (dup_u <= CURATE_MAX_DUP_WORD_U)
        kmask = pa.array(keep)
        out = pa.table({
            "doc_id": t["doc_id"].filter(kmask),
            "norm_text": s.filter(kmask),
            "n_words": pa.array(counts[keep], pa.int64()),
            "dup_word_frac_u": pa.array(dup_u[keep], pa.int64()),
        })
        # 8-byte exchange key for the dedup stage (text rides as payload)
        out = out.append_column(
            "nt_hash", pa.array(_fnv1a_strings(out["norm_text"]), pa.uint64()))
        from ocrautomator_ray.functions.exchange import sentinel_pad

        # a fully-filtered block must not enter the exchange empty; the
        # null doc_id marks the sentinel (dropped downstream; the sink
        # treats null-key rows as sentinels too)
        return sentinel_pad(out, _SENTINEL_ROW)

    def dedup_block(block: pa.Table) -> pa.Table:
        # block holds every row of each of its nt_hash keys; keep the lowest
        # doc_id per distinct norm_text (compare the text itself inside the
        # hash group, so a hash collision cannot merge two documents)
        from ocrautomator_ray.functions.exchange import sentinel_pad

        if block.num_rows > 0:  # drop incoming empty-block sentinels
            block = block.drop_null()
        if block.num_rows == 0:  # and pad our own output (feeds the sink's
            return _SENTINEL_ROW  # part_id exchange next)
        h = block["nt_hash"].to_numpy(zero_copy_only=False)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        txt = block["norm_text"].to_numpy(zero_copy_only=False)
        from ocrautomator_ray.functions.curate import first_per_hash_group

        return block.take(pa.array(first_per_hash_group(h, txt, ids)))

    def add_split(t: pa.Table) -> pa.Table:
        # fill_null: sentinel rows get a split computed and stay sentinels
        # (null doc_id); the sink drops them
        ids = pc.fill_null(t["doc_id"], 0).to_numpy(zero_copy_only=False)
        bucket = knuth_bucket(ids)
        return t.drop_columns(["nt_hash"]).append_column(
            "split", pa.array(split_of(bucket), pa.string()))

    scored = ds.map_batches(normalize_and_score, batch_format="pyarrow",
                            zero_copy_batch=True)
    deduped = per_key_blocks(
        scored, ["nt_hash"], dedup_block,
        num_partitions=auto_partitions(f"{sf_dir}/documents.parquet"))
    return deduped.map_batches(add_split, batch_format="pyarrow",
                               zero_copy_batch=True)


def curate_sql_ctes(src: str = "documents") -> str:
    """The curation chain as composable CTEs over a (doc_id, text) relation
    ``src`` — the full-corpus pipeline splices these after its own
    near-dup-removal CTEs."""
    return f"""n AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                        '^ | $', '', 'g') AS norm_text
  FROM {src}
),
s AS (
  SELECT doc_id, norm_text,
         CASE WHEN norm_text = '' THEN 0
              ELSE len(string_split(norm_text, ' ')) END AS n_words,
         CASE WHEN norm_text = '' THEN 0
              ELSE CAST(FLOOR((1 - CAST(len(list_distinct(string_split(norm_text, ' ')))
                                        AS DOUBLE)
                                   / len(string_split(norm_text, ' ')))
                              * 1000000 + 0.5) AS BIGINT) END AS dup_word_frac_u
  FROM n
),
f AS (
  SELECT * FROM s
  WHERE n_words >= {CURATE_MIN_WORDS}
    AND dup_word_frac_u <= {CURATE_MAX_DUP_WORD_U}
),
d AS (
  SELECT norm_text, MIN(doc_id) AS doc_id FROM f GROUP BY norm_text
)"""


CURATE_SQL_FINAL = f"""
SELECT f.doc_id, f.norm_text, CAST(f.n_words AS BIGINT) AS n_words,
       f.dup_word_frac_u,
       {sql_split('f.doc_id')} AS split
FROM f JOIN d ON f.doc_id = d.doc_id AND f.norm_text = d.norm_text
"""

SQL_CURATE = f"WITH {curate_sql_ctes()}\n{CURATE_SQL_FINAL}"


def run_curation(sf_dir: str, out_dir: str, num_partitions: int = 16,
                 resume: bool = True, progress: bool = False,
                 partition_by: str | None = None) -> dict:
    """Execute the curation pipeline into the resumable sink.

    ``partition_by`` (e.g. ``"split"``) lays the output out hive-style so a
    training job can read one value directory (train/val/test) directly."""
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    def _run():
        return resumable_write(build_curated(sf_dir), out_dir,
                               num_partitions=num_partitions, key="doc_id",
                               input_desc=f"{sf_dir}/documents.parquet",
                               resume=resume, partition_by=partition_by)

    if not progress:
        return _run()
    from ocrautomator_ray.state.manifest import completed_parts
    from ocrautomator_ray.state.progress import ProgressReporter

    skip = completed_parts(out_dir, num_partitions) if resume else set()
    with ProgressReporter(out_dir, num_partitions, skip_parts=skip):
        return _run()


def run_curate_flagship(sf_dir: str, scratch_root: str = "/tmp/ocrautomator_ray",
                        fresh: bool = True) -> rd.Dataset:
    """queries() surface: run the curation pipeline through the sink and
    return the committed table (manifest-driven read)."""
    import hashlib
    import os
    import shutil

    from ocrautomator_ray.pipelines.extract import read_output

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(scratch_root, f"curate-{tag}")
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    run_curation(sf_dir, out_dir)
    return read_output(out_dir, empty_schema=CURATED_SCHEMA)
