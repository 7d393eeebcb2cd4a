"""Value-ranked corpus export — the consumer path of data valuation:

    data_value_rank (quality × centrality, functions/graph.py)
        → dense global rank by value (best doc = pos 0)
        → resumable range-partitioned ordered sink

Output rows: (pos, doc_id, alpha_permille, pr_micros, data_value) committed
so ``part-i`` holds the i-th contiguous pos range with rows sorted within —
a budgeted training reader takes the most-valuable prefix by streaming
files in order and stopping at its token budget. Fully SQL-expressible, so
the WHOLE chain is hash-checked end-to-end (``value_rank_pipeline``).

Scale shape: the valuation table (4 ints per doc) is materialized once —
the same bounded intermediate perplexity_buckets pins — then dense ranks
come from the two-pass bucket-offset pattern with BIT-LENGTH buckets:
data_value spans orders of magnitude, so log₂ ranges spread load where
fixed-width ranges would pile everything into one bucket. bucket =
64 − bit_length(value) is monotone non-increasing in value, hence global
order = (bucket asc, value desc, doc_id asc); the driver holds ≤64 bucket
offsets and one bucket-keyed exchange ranks locally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.dedup import _ramp
from ocrautomator_ray.functions.exchange import per_key_blocks
from ocrautomator_ray.functions.graph import SQL_DATA_VALUE_RANK, data_value_rank

VALUE_RANKED_SCHEMA = pa.schema([
    ("pos", pa.int64()), ("doc_id", pa.int64()),
    ("alpha_permille", pa.int64()), ("pr_micros", pa.int64()),
    ("data_value", pa.int64()),
])


def _build_value_ranked(sf_dir: str) -> tuple[rd.Dataset, int]:
    dv = data_value_rank(sf_dir).materialize()

    def keyed(t: pa.Table) -> pa.Table:
        v = t["data_value"].to_numpy(zero_copy_only=False)
        # 64 − bit_length(v): exact via frexp exponent (v < 2^53 here —
        # alpha_permille ≤ 1e3, pr_micros ≪ 2^43), monotone with v DESC
        bucket = 64 - np.frexp(np.maximum(v, 1).astype(np.float64))[1]
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    keyed_ds = dv.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True)
    counts = (keyed_ds.groupby("bucket", num_partitions=8).count()
              .to_pandas())
    offsets = np.zeros(66, np.int64)
    np.add.at(offsets, counts["bucket"].to_numpy() + 1,
              counts["count()"].to_numpy())
    offsets = np.cumsum(offsets)
    total = int(offsets[-1])

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return VALUE_RANKED_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        v = block["data_value"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v, b))
        b_sorted = b[order]
        starts = np.flatnonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])
        run_len = np.diff(np.r_[starts, len(b_sorted)])
        pos = offsets[b_sorted] + _ramp(run_len)
        out = block.take(pa.array(order))
        return pa.table({
            "pos": pa.array(pos, pa.int64()),
            "doc_id": out["doc_id"],
            "alpha_permille": out["alpha_permille"],
            "pr_micros": out["pr_micros"],
            "data_value": out["data_value"],
        })

    ranked = per_key_blocks(keyed_ds, ["bucket"], rank_block,
                            num_partitions=16)
    return ranked, total


def run_value_rank(sf_dir: str, out_dir: str, num_partitions: int = 16,
                   resume: bool = True) -> dict:
    """Execute the valuation-export pipeline into the resumable sink
    (range-partitioned + sorted on ``pos`` — globally ordered output)."""
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    ds, total = _build_value_ranked(sf_dir)
    return resumable_write(ds, out_dir,
                           num_partitions=num_partitions, key="pos",
                           input_desc=f"{sf_dir}/documents.parquet",
                           resume=resume, range_bound=max(total, 1),
                           sort_within="pos")


def run_value_rank_flagship(sf_dir: str,
                            scratch_root: str = "/tmp/ocrautomator_ray",
                            fresh: bool = True) -> rd.Dataset:
    """queries() surface: run through the sink, return the committed table."""
    import hashlib
    import os
    import shutil

    from ocrautomator_ray.pipelines.extract import read_output

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(scratch_root, f"valuerank-{tag}")
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    run_value_rank(sf_dir, out_dir)
    return read_output(out_dir, empty_schema=VALUE_RANKED_SCHEMA)


SQL_VALUE_RANK = f"""
WITH dv AS ({SQL_DATA_VALUE_RANK})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY data_value DESC, doc_id) - 1
            AS BIGINT) AS pos,
       doc_id, alpha_permille, pr_micros, data_value
FROM dv
"""
