"""Shared helpers for pipeline-vs-oracle span-sequence comparison."""

from __future__ import annotations

import pyarrow as pa

from ocrautomator_ray import oracle
from ocrautomator_ray.pipelines.extract import (
    PipelineConfig,
    read_output,
    run_extraction,
)


def spans_from_output(out_dir: str) -> dict[str, list[tuple]]:
    got: dict[str, list[tuple]] = {}
    for row in read_output(out_dir).take_all():
        got[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
    return got


def run_and_compare(table: pa.Table, out_dir: str, **cfg_kwargs) -> dict:
    """Run the pipeline on `table`, assert span-sequence equality vs oracle."""
    import ray.data as rd

    cfg_kwargs.setdefault("num_partitions", 4)
    cfg_kwargs.setdefault("work_factor", 0)
    res = run_extraction(rd.from_arrow(table), PipelineConfig(out_dir=out_dir, **cfg_kwargs))
    got = spans_from_output(out_dir)
    exp = oracle.oracle_table(table).spans_by_doc
    assert set(got) == set(exp), (
        f"doc set mismatch: missing={set(exp) - set(got)} extra={set(got) - set(exp)}"
    )
    bad = [d for d in exp if got[d] != exp[d]]
    assert not bad, f"span mismatch for {bad[:3]}: exp={exp[bad[0]][:3]} got={got[bad[0]][:3]}"
    return res
