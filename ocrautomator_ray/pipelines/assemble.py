"""End-to-end corpus-assembly pipeline (the stage AFTER curation):

    read documents → cap over-represented sources (hash-chosen survivors)
                   → mix sources to target weights (epoch replication)
                   → deterministic dense global shuffle order
                   → resumable partitioned-parquet sink

Output rows: (pos, doc_id, epoch, source, text) — a ready-to-stream training
corpus where ``pos`` is the replica's 0-based slot in the seed-determined
global order. Fully SQL-expressible, so the WHOLE chain is hash-checked
against a DuckDB oracle end-to-end (``assemble_pipeline`` in __ray_entry__).

Scale shape: the dense positions come from the two-pass bucket-offset
pattern (functions/mix.seeded_shuffle) — pass 1 runs the cap+mix chain over
the ID COLUMNS ONLY (text never read) to histogram the shuffle-hash buckets,
the driver holds B integers, and pass 2 re-runs the chain with payload and
ranks inside one bucket-keyed exchange. Text is read once, shuffled once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.curate import knuth_bucket, sql_bucket
from ocrautomator_ray.functions.dedup import _ramp
from ocrautomator_ray.functions.exchange import per_key_blocks, pruned_read
from ocrautomator_ray.functions.mix import (
    SHUFFLE_BUCKETS,
    SHUFFLE_SEED,
    SOURCE_CAP,
    _BUCKET_WIDTH,
    _mix_permille,
    mix_hash,
    sql_mix_hash,
)

_EPOCH_STRIDE = 4  # max epochs per doc is 3 (w ≤ 2600 permille) — 4 is safe

ASSEMBLED_SCHEMA = pa.schema([
    ("pos", pa.int64()), ("doc_id", pa.int64()), ("epoch", pa.int64()),
    ("source", pa.string()), ("text", pa.string()),
])


def _capped_mixed(sf_dir: str, with_text: bool) -> rd.Dataset:
    """cap → mix → replica shuffle keys, optionally carrying the text
    payload. Deterministic: both invocations (count pass and rank pass)
    produce the same replica set and keys."""
    cols = ["doc_id", "source"] + (["text"] if with_text else [])
    ds = pruned_read(f"{sf_dir}/documents.parquet", cols)

    def cap_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        src = block["source"].to_numpy(zero_copy_only=False)
        h = mix_hash(ids, SHUFFLE_SEED)
        order = np.lexsort((ids, h, src))
        s_sorted = src[order]
        starts = np.nonzero(np.r_[True, s_sorted[1:] != s_sorted[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(s_sorted)])
        keep = order[_ramp(run_len) < SOURCE_CAP]
        keep.sort()
        return block.take(pa.array(keep))

    def replicate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        w = _mix_permille(uniq)[inv]
        epochs = w // 1000 + (knuth_bucket(ids) < w % 1000)
        idx = np.repeat(np.arange(len(ids)), epochs)
        ep = _ramp(epochs)
        rk = ids[idx] * _EPOCH_STRIDE + ep
        h = mix_hash(rk, SHUFFLE_SEED)
        out = {
            "doc_id": pa.array(ids[idx], pa.int64()),
            "epoch": pa.array(ep, pa.int64()),
            "source": t["source"].take(pa.array(idx)),
            "h": pa.array(h, pa.int64()),
            "bucket": pa.array(h // _BUCKET_WIDTH, pa.int64()),
        }
        if "text" in t.column_names:
            out["text"] = t["text"].take(pa.array(idx))
        return pa.table(out)

    capped = per_key_blocks(ds, ["source"], cap_block)
    return capped.map_batches(replicate, batch_format="pyarrow",
                              zero_copy_batch=True)


def build_assembled(sf_dir: str) -> rd.Dataset:
    """The lazy transform chain, sink-agnostic. Output: ASSEMBLED_SCHEMA."""
    return _build_assembled(sf_dir)[0]


def _build_assembled(sf_dir: str) -> tuple[rd.Dataset, int]:
    """(dataset, total replica count) — the total bounds the dense ``pos``
    column, which lets the sink range-partition into ordered shards."""
    # pass 1: bucket histogram over ids only (text pruned at the read)
    counts = (
        _capped_mixed(sf_dir, with_text=False)
        .groupby("bucket", num_partitions=8).count()
        .to_pandas()
    )
    offsets = np.zeros(SHUFFLE_BUCKETS + 1, np.int64)
    np.add.at(offsets, counts["bucket"].to_numpy() + 1,
              counts["count()"].to_numpy())
    offsets = np.cumsum(offsets)

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return ASSEMBLED_SCHEMA.empty_table()
        h = block["h"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        rk = (block["doc_id"].to_numpy(zero_copy_only=False) * _EPOCH_STRIDE
              + block["epoch"].to_numpy(zero_copy_only=False))
        order = np.lexsort((rk, h, b))
        b_sorted = b[order]
        starts = np.nonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(b_sorted)])
        pos = offsets[b_sorted] + _ramp(run_len)
        out = block.take(pa.array(order)).drop_columns(["h", "bucket"])
        return out.add_column(0, "pos", pa.array(pos, pa.int64()))

    out = per_key_blocks(_capped_mixed(sf_dir, with_text=True), ["bucket"],
                         rank_block,
                         num_partitions=min(16, SHUFFLE_BUCKETS))
    return out, int(offsets[-1])


SQL_ASSEMBLE = f"""
WITH capped AS (
  SELECT doc_id, source, text
  FROM documents
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY {sql_mix_hash('doc_id', SHUFFLE_SEED)}, doc_id) <= {SOURCE_CAP}
), w AS (
  SELECT *, 500 + 300 * (ascii(substr(source, 4, 1)) % 8) AS w FROM capped
), rep AS (
  SELECT doc_id, source, text, CAST(e.epoch AS BIGINT) AS epoch
  FROM w, UNNEST(range(w.w // 1000 +
                       CASE WHEN {sql_bucket('doc_id')} < w.w % 1000
                            THEN 1 ELSE 0 END)) AS e(epoch)
)
SELECT ROW_NUMBER() OVER (
           ORDER BY {sql_mix_hash(f'(doc_id * {_EPOCH_STRIDE} + epoch)',
                                  SHUFFLE_SEED)},
                    doc_id * {_EPOCH_STRIDE} + epoch) - 1 AS pos,
       doc_id, epoch, source, text
FROM rep
"""


def run_assembly(sf_dir: str, out_dir: str, num_partitions: int = 16,
                 resume: bool = True) -> dict:
    """Execute the assembly pipeline into the resumable sink. The sink
    RANGE-partitions on the dense position (``part-i`` holds the i-th
    contiguous pos range, rows sorted within), so the committed layout is a
    globally ordered corpus a sequential training reader streams in file
    order."""
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    ds, total = _build_assembled(sf_dir)
    return resumable_write(ds, out_dir,
                           num_partitions=num_partitions, key="pos",
                           input_desc=f"{sf_dir}/documents.parquet",
                           resume=resume, range_bound=max(total, 1),
                           sort_within="pos")


def run_assemble_flagship(sf_dir: str,
                          scratch_root: str = "/tmp/ocrautomator_ray",
                          fresh: bool = True) -> rd.Dataset:
    """queries() surface: run the pipeline through the sink and return the
    committed table (manifest-driven read)."""
    import hashlib
    import os
    import shutil

    from ocrautomator_ray.pipelines.extract import read_output

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(scratch_root, f"assemble-{tag}")
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    run_assembly(sf_dir, out_dir)
    return read_output(out_dir, empty_schema=ASSEMBLED_SCHEMA)
