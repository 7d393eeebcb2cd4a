"""Generic resumable partitioned-parquet sink.

The extraction pipeline's commit discipline (hash-partition on a key, one
atomic data file + manifest per partition, manifest-driven reads, O(P)
resume pruning) generalized to ANY table-shaped Dataset, so every pipeline
in the engine — curation, dedup exports, query materializations — gets the
brief's "resumable output" property without reimplementing it:

- the partitioner is the same pure function as extraction's
  (``siphash(key) % P``), so a row's destination never changes across runs;
- a partition commits atomically: data tmp+rename, THEN its manifest —
  a killed task leaves no visible partial state;
- ``read_output`` reads exactly the fragments named in committed manifests;
- a rerun prunes completed partitions with O(P) manifest reads before any
  data is touched, and refuses an out_dir written under a different P.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ocrautomator_ray.state.manifest import (
    check_run_compatible,
    completed_parts,
    data_dir,
    demote_part,
    load_manifests,
    merge_counters,
    part_data_path,
    partition_ids,
    write_part_manifest,
    write_run_manifest,
)

_SUMMARY_SCHEMA = pa.schema([("part_id", pa.int32()), ("rows", pa.int64()),
                             ("output_path", pa.string())])


def _make_commit(out_dir: str, num_partitions: int, input_desc: str,
                 drop_cols: tuple[str, ...],
                 partition_by: str | None = None,
                 sort_within: str | None = None):
    def _write_fragment(data: pa.Table, final: str) -> None:
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.tmp.{os.getpid()}"
        pq.write_table(data, tmp)
        os.replace(tmp, final)

    def commit_one(part: pa.Table) -> pa.Table:
        pid = int(part["part_id"][0].as_py())
        data = part.drop_columns(list(drop_cols))
        if sort_within is not None:
            data = data.sort_by(sort_within)
        os.makedirs(data_dir(out_dir), exist_ok=True)
        base = part_data_path(out_dir, pid)
        if partition_by is None:
            _write_fragment(data, base)
            frags = [os.path.relpath(base, out_dir)]
        else:
            # hive-style layout: one fragment per column value, under
            # data/<col>=<val>/part-NNNNN.parquet — selective readers scan a
            # single value directory; the COMMIT unit (and thus resume) is
            # still the hash partition, whose manifest lists every fragment.
            # Single pass: dictionary-encode, sort by code, slice runs
            # (no O(values × rows) re-filtering); values are %-escaped per
            # hive convention so '/', '=' or '..' can't corrupt the layout;
            # nulls go to the hive default-partition directory.
            from urllib.parse import quote

            import numpy as np
            import pyarrow.compute as pc

            enc = pc.dictionary_encode(data[partition_by])
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            vals = enc.dictionary.to_pylist()
            codes = np.where(np.isnan(codes.astype(np.float64)), len(vals),
                             codes).astype(np.int64) \
                if codes.dtype.kind == "f" else codes.astype(np.int64)
            order = np.argsort(codes, kind="stable")
            sorted_data = data.take(pa.array(order))
            codes = codes[order]
            bounds = np.concatenate((
                [0], np.flatnonzero(np.diff(codes)) + 1, [len(codes)]))
            frags = []
            for a, b in zip(bounds[:-1], bounds[1:]):
                c = int(codes[a])
                name = (quote(str(vals[c]), safe="") if c < len(vals)
                        else "__HIVE_DEFAULT_PARTITION__")
                final = os.path.join(data_dir(out_dir),
                                     f"{partition_by}={name}",
                                     os.path.basename(base))
                _write_fragment(sorted_data.slice(a, b - a), final)
                frags.append(os.path.relpath(final, out_dir))
        write_part_manifest(out_dir, pid, {
            "part_id": pid,
            "status": "committed",
            "counters": {"rows": data.num_rows},
            "lineage": {
                "partitioner": "siphash(key) % num_partitions",
                "num_partitions": num_partitions,
                "part_id": pid,
                "input": input_desc,
                "output_fragments": frags,
            },
        })
        return pa.Table.from_pydict(
            {"part_id": [pid], "rows": [data.num_rows],
             "output_path": [os.path.join(out_dir, frags[0])]},
            schema=_SUMMARY_SCHEMA)

    def commit_blocks(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _SUMMARY_SCHEMA.empty_table()
        pids = block["part_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(pids, kind="stable")  # exchange no longer sorts
        block, pids = block.take(pa.array(order)), pids[order]
        bounds = [0] + (np.nonzero(np.diff(pids))[0] + 1).tolist() + [len(pids)]
        outs = [commit_one(block.slice(a, b - a))
                for a, b in zip(bounds[:-1], bounds[1:])
                if pids[a] >= 0]  # skip empty-block sentinels
        return pa.concat_tables(outs) if outs else _SUMMARY_SCHEMA.empty_table()

    return commit_blocks


def resumable_write(ds: rd.Dataset, out_dir: str, num_partitions: int = 16,
                    key: str = "doc_id", input_desc: str = "",
                    resume: bool = True,
                    exchange_partitions: int | None = None,
                    partition_by: str | None = None,
                    range_bound: int | None = None,
                    sort_within: str | None = None) -> dict:
    """Write ``ds`` as ``out_dir/data/part-NNNNN.parquet`` + manifests.

    With ``partition_by=<col>`` the layout becomes hive-style
    ``data/<col>=<val>/part-NNNNN.parquet`` (one fragment per value per hash
    partition): selective consumers read one value directory; full reads and
    O(P) resume are unchanged because the commit unit stays the hash
    partition. Values are %-escaped (hive convention) and nulls land in
    ``<col>=__HIVE_DEFAULT_PARTITION__``; pick a LOW-cardinality column
    (splits, languages) — the layout writes one fragment per value per hash
    partition, so a near-unique column produces P×V tiny files. Caveat: a
    DIRECTORY read of one value trades the manifest-driven guarantee for
    layout convenience — it can see orphaned fragments if the same out_dir
    was re-used with different input rows (manifest-driven ``read_output``
    never does). Reusing an out_dir with a different ``partition_by`` is
    refused (run-manifest check), like a different ``num_partitions``.

    With ``range_bound=N`` the partitioner becomes RANGE instead of hash:
    ``part_id = key·P // N`` for an integer key in [0, N) — part files are
    contiguous ordered shards (what a sequential training reader wants),
    while commit atomicity and O(P) resume are unchanged. Pair it with
    ``sort_within=<col>`` to also order rows inside each fragment, making
    the whole output globally sorted by file order.

    Returns the merged summary (partitions committed, row counters). The
    exchange guarantees a partition arrives as one contiguous run in one
    block (Ray 2.49 hash-shuffle finalize emits one block per partition);
    the duplicate-part_id guard backs out and raises loudly if that ever
    stops holding, leaving a resumable out_dir.
    """
    from ocrautomator_ray.functions.exchange import tune_exchange

    check_run_compatible(out_dir, num_partitions, partition_by=partition_by)
    partitioner = (f"range({key}) * num_partitions // {range_bound}"
                   if range_bound else f"siphash({key}) % num_partitions")
    write_run_manifest(out_dir, {"num_partitions": num_partitions,
                                 "partitioner": partitioner,
                                 "partition_by": partition_by,
                                 "input": input_desc})
    done = completed_parts(out_dir, num_partitions) if resume else set()

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # sink contract: null-key rows are sentinels (upstream stages pad
        # otherwise-empty blocks with them — see exchange.sentinel_pad);
        # they ride the exchange as part_id=-1 and are never committed
        arr = t[key]
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)

        def _pids(a) -> np.ndarray:
            if range_bound:
                k = a.to_numpy(zero_copy_only=False).astype(np.int64)
                return np.clip(k * num_partitions // range_bound, 0,
                               num_partitions - 1).astype(np.int32)
            return partition_ids(a, num_partitions).astype(np.int32)

        if valid.all():
            pids = _pids(arr)
        else:
            pids = np.full(t.num_rows, -1, np.int32)
            if valid.any():
                pids[valid] = _pids(arr.filter(pa.array(valid)))
        if done:
            keep = ~np.isin(pids, list(done))
            t, pids = t.filter(pa.array(keep)), pids[keep]
        out = t.append_column("part_id", pa.array(pids, pa.int32()))
        if out.num_rows == 0:
            # resume pruning emptied this block; pad with a part_id=-1
            # sentinel (skipped by the commit) so the empty block can't
            # poison the exchange
            cols = {f.name: pa.nulls(1, f.type) for f in t.schema}
            cols["part_id"] = pa.array([-1], pa.int32())
            return pa.table(cols)
        return out

    if len(done) == num_partitions:  # fully-resumed run: nothing to recompute
        return _summary(out_dir, 0)
    tagged = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    n_ex = exchange_partitions or min(16, num_partitions)
    tune_exchange(tagged, n_ex)
    summary = (
        tagged.repartition(n_ex, keys=["part_id"])
        .map_batches(_make_commit(out_dir, num_partitions, input_desc,
                                  drop_cols=("part_id",),
                                  partition_by=partition_by,
                                  sort_within=sort_within),
                     batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .to_pandas()
    )
    if summary["part_id"].duplicated().any():
        affected = sorted(
            summary.loc[summary["part_id"].duplicated(keep=False), "part_id"]
            .unique().tolist())
        for pid in affected:
            demote_part(out_dir, int(pid))
        raise RuntimeError(
            "partition committed more than once in a single run — a partition "
            "spanned exchange blocks; demoted its manifests so resume "
            f"recomputes them: {affected}")
    return _summary(out_dir, int(summary.shape[0]))


def _summary(out_dir: str, partitions_this_run: int) -> dict:
    manifests = load_manifests(out_dir)
    return {
        "out_dir": out_dir,
        "partitions_committed_total": len(manifests),
        "partitions_this_run": partitions_this_run,
        "counters": merge_counters(manifests),
    }
