"""Reassembly + per-partition commit (SURVEY.md §2.4 J3, §2.6 O1, §4).

The fan-in after the extraction pool: extracted unit rows, hash-partitioned
by ``part_id = siphash(doc_id) % P``, are grouped per partition; inside the
group everything is vectorized Arrow/numpy — sort by
``(doc_id, dup_key, in_offset, page_no, sub_no)``, arbitrate duplicate
doc_ids (min dup_key wins, identical copies collapse), renumber output
offsets per document, rebuild the ``spans`` list column — then the partition
commits atomically: data file first (tmp + rename, idempotently named
``part-{pid}.parquet``), manifest second. A retried task overwrites with
byte-identical content, so commits are exactly-once in effect.

Grouping by part_id (not doc_id) makes the reassembly group the *commit unit*:
one shuffle serves ordering, dedup, and checkpoint lineage at once. All order
comes from data columns, never from execution order (preserve_order stays
off).
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocrautomator_ray.schema import DOC_SCHEMA, SPAN_TYPE
from ocrautomator_ray.state.manifest import (
    data_dir,
    part_data_path,
    write_part_manifest,
)

SUMMARY_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("docs", pa.int64()),
        ("out_spans", pa.int64()),
        ("pages_ocrd", pa.int64()),
        ("exif_tags_written", pa.int64()),
        ("errors", pa.int64()),
        ("dup_rows_dropped", pa.int64()),
        ("retries", pa.int64()),
        ("output_path", pa.string()),
    ]
)

_SORT_KEYS = [
    ("doc_id", "ascending"),
    ("dup_key", "ascending"),
    ("in_offset", "ascending"),
    ("page_no", "ascending"),
    ("sub_no", "ascending"),
]


def reassemble_group(group: pa.Table) -> tuple[pa.Table, dict[str, int]]:
    """One partition's extracted rows → (DOC_SCHEMA table, counters)."""
    g = group.combine_chunks().take(pc.sort_indices(group, sort_keys=_SORT_KEYS))
    n = g.num_rows

    enc = g["doc_id"].combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    ndocs = len(enc.dictionary)
    # sorted by doc_id ⇒ codes are non-decreasing; first row index per doc:
    doc_start = np.searchsorted(codes, np.arange(ndocs), side="left")

    dup = g["dup_key"].to_numpy(zero_copy_only=False)
    keep = dup == dup[doc_start][codes]  # min dup_key per doc wins
    io = g["in_offset"].to_numpy(zero_copy_only=False)
    pn = g["page_no"].to_numpy(zero_copy_only=False)
    sn = g["sub_no"].to_numpy(zero_copy_only=False)
    same_as_prev = np.zeros(n, dtype=bool)
    if n > 1:  # identical duplicate rows (identical input copies) collapse
        same_as_prev[1:] = (
            (codes[1:] == codes[:-1]) & (dup[1:] == dup[:-1])
            & (io[1:] == io[:-1]) & (pn[1:] == pn[:-1]) & (sn[1:] == sn[:-1])
        )
    keep &= ~same_as_prev
    dup_rows_dropped = int(n - keep.sum())

    g2 = g.filter(pa.array(keep))
    codes2 = codes[keep]
    kind = g2["kind"].to_numpy(zero_copy_only=False)
    ref = g2["media_ref"]
    is_text = kind == "text"
    is_exif = kind == "exif"
    span_mask = is_text | is_exif
    errors = int((kind == "error").sum())
    pages_ocrd = int(
        (is_text & (pc.not_equal(ref, "").to_numpy(zero_copy_only=False))).sum()
    )

    span_codes = codes2[span_mask]
    counts = np.bincount(span_codes, minlength=ndocs)
    list_offsets = np.zeros(ndocs + 1, dtype=np.int32)
    np.cumsum(counts, out=list_offsets[1:])
    within = (np.arange(len(span_codes)) - np.repeat(list_offsets[:-1], counts)).astype(np.int32)

    mask_arr = pa.array(span_mask)

    def _flat(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        if isinstance(col, pa.Array):
            return col
        return pa.concat_arrays(col.chunks) if col.num_chunks else pa.array([], type=col.type)

    struct = pa.StructArray.from_arrays(
        [
            _flat(g2["kind"].filter(mask_arr)),
            _flat(g2["text"].filter(mask_arr)),
            _flat(g2["media_ref"].filter(mask_arr)),
            pa.array(within, type=pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    spans_col = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct)
    docs_table = pa.Table.from_arrays([enc.dictionary, spans_col], schema=DOC_SCHEMA)

    counters = {
        "docs": ndocs,
        "out_spans": int(span_mask.sum()),
        "pages_ocrd": pages_ocrd,
        "exif_tags_written": int(is_exif.sum()),
        "errors": errors,
        "dup_rows_dropped": dup_rows_dropped,
    }
    return docs_table, counters


def _task_retries() -> int:
    try:
        import ray

        ctx = ray.get_runtime_context()
        get = getattr(ctx, "get_task_attempt_number", None)
        return int(get()) if get else 0
    except Exception:
        return 0


def make_commit_blocks(
    out_dir: str, num_partitions: int, input_desc: str,
    fault_hook: Callable[[int], None] | None = None,
) -> Callable[[pa.Table], pa.Table]:
    """Block-level commit for the hash-exchange path.

    Input blocks come from ``repartition(keys=["part_id"])``: each block
    holds one or more *complete* partitions (the aggregator emits a
    partition only after seeing all of its rows); the wrapper sorts the
    block by part_id itself — the aggregator-side sort is off because it
    crashes on schemaless shards from empty upstream blocks in Ray 2.49. The
    wrapper splits the block into runs and commits each. run_extraction
    asserts no part_id was committed twice in a run — the loud failure mode
    if a partition ever spanned blocks (e.g. finalization splitting at
    target_max_block_size); size partitions below the block limit.
    """
    commit = make_reassemble_commit(out_dir, num_partitions, input_desc, fault_hook)

    def commit_blocks(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return SUMMARY_SCHEMA.empty_table()
        pids = block["part_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(pids, kind="stable")  # exchange no longer sorts
        block, pids = block.take(pa.array(order)), pids[order]
        bounds = [0] + (np.nonzero(np.diff(pids))[0] + 1).tolist() + [len(pids)]
        outs = [
            commit(block.slice(a, b - a)) for a, b in zip(bounds[:-1], bounds[1:])
        ]
        return pa.concat_tables(outs)

    return commit_blocks


def make_reassemble_commit(
    out_dir: str, num_partitions: int, input_desc: str,
    fault_hook: Callable[[int], None] | None = None,
) -> Callable[[pa.Table], pa.Table]:
    """fault_hook (tests only): called with the part_id before any output is
    written — may crash the worker / raise to exercise task retry, abort, and
    resume paths. The atomic tmp+rename commit order guarantees a killed task
    leaves no partial partition behind."""

    def reassemble_commit(group: pa.Table) -> pa.Table:
        pid = int(group["part_id"][0].as_py())
        if fault_hook is not None:
            fault_hook(pid)
        docs_table, counters = reassemble_group(group)
        counters["retries"] = _task_retries()

        # A3: per-worker breakdown (the reference's per-thread display)
        workers = {}
        if "worker_id" in group.column_names:
            wg = pa.TableGroupBy(group.select(["worker_id", "elapsed_us"]),
                                 "worker_id").aggregate(
                [("worker_id", "count"), ("elapsed_us", "mean")]
            )
            for w, cnt, el in zip(wg["worker_id"].to_pylist(),
                                  wg["worker_id_count"].to_pylist(),
                                  wg["elapsed_us_mean"].to_pylist()):
                workers[w] = {"rows": int(cnt), "mean_elapsed_us": int(el or 0)}

        os.makedirs(data_dir(out_dir), exist_ok=True)
        final = part_data_path(out_dir, pid)
        tmp = f"{final}.tmp.{os.getpid()}"
        pq.write_table(docs_table, tmp)
        os.replace(tmp, final)

        write_part_manifest(
            out_dir,
            pid,
            {
                "part_id": pid,
                "status": "committed",
                "counters": counters,
                "workers": workers,
                "lineage": {
                    "partitioner": "siphash(doc_id) % num_partitions",
                    "num_partitions": num_partitions,
                    "part_id": pid,
                    "input": input_desc,
                    "output_fragment": os.path.relpath(final, out_dir),
                },
            },
        )
        return pa.Table.from_pydict(
            {
                "part_id": [pid],
                "docs": [counters["docs"]],
                "out_spans": [counters["out_spans"]],
                "pages_ocrd": [counters["pages_ocrd"]],
                "exif_tags_written": [counters["exif_tags_written"]],
                "errors": [counters["errors"]],
                "dup_rows_dropped": [counters["dup_rows_dropped"]],
                "retries": [counters["retries"]],
                "output_path": [final],
            },
            schema=SUMMARY_SCHEMA,
        )

    return reassemble_commit
