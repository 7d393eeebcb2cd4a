"""The flagship extraction pipeline (SURVEY.md §3.1).

    read_docs → [resume_filter] → map_batches(explode)            # stateless tasks
              → [repartition]                                     # skew spread
              → map_batches(ExtractActor, concurrency=…)          # stateful pool
              → groupby("part_id").map_groups(reassemble+commit)  # fan-in shuffle
              → per-partition parquet + manifest

Never calls ``ray.init``/``ray.shutdown`` — the session belongs to the caller
(driver / bench.py / test fixture).

Scale notes (the 100 TB story):
- the only all-to-all exchange is the reassembly ``groupby("part_id")``; the
  explode→extract hop is narrow page rows and pipelines under backpressure;
- ``num_partitions`` sizes the commit/checkpoint unit — pick P so a partition
  ≈ 1-2 GB of output (tested here at small P, same code path);
- resume pruning is O(P) manifest reads on the driver, broadcast by closure;
- actor pool: ``concurrency × num_cpus_per_actor`` CPUs, one warm decoder per
  actor (reference thread model); batch granularity = pages, so a 1000-page
  document spreads across the pool instead of pinning one worker.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data as rd

from ocrautomator_ray.stages.explode import make_explode, make_resume_filter
from ocrautomator_ray.stages.extract import ExtractActor
from ocrautomator_ray.stages.reassemble import make_commit_blocks, make_reassemble_commit
from ocrautomator_ray.state.manifest import (
    check_run_compatible,
    completed_parts,
    demote_part,
    load_manifests,
    merge_counters,
    write_run_manifest,
)


@dataclass
class PipelineConfig:
    out_dir: str
    num_partitions: int = 16
    resume: bool = True
    # explode: stateless tasks over doc rows. The fractional num_cpus is
    # deliberate: it makes explode's resource request incompatible with the
    # actor pool's so Ray Data does NOT fuse the two operators — fused, the
    # OCR work unit becomes the whole input doc-block (one fat document pins
    # one actor), which is exactly the skew the page-level explode exists to
    # prevent. Unfused, page rows stream into the pool and are re-bundled at
    # ocr_batch_size granularity across block boundaries. (Measured on the
    # bench profile: fused 36s vs unfused 22.7s at num_cpus=8.)
    explode_batch_size: int = 256
    explode_num_cpus: float = 0.5
    # explode output chunk rows == extraction task granularity (explode yields
    # one block per chunk; the actor pool schedules one task per block)
    unit_chunk_rows: int = 512
    # extraction actor pool (the reference's N warm OCR threads). Min 1 so a
    # tiny input (fewer blocks than actors) doesn't strand idle actors; the
    # pool autoscaler grows toward max with queue depth.
    concurrency: tuple[int, int] | int = (1, 8)
    num_cpus_per_actor: float = 1.0
    ocr_batch_size: int = 128
    work_factor: int = 8
    psm_override: int | None = None  # T2: run-level --psm, forces all pages
    # optional skew-spreading repartition between explode and the pool
    ocr_repartition: int | None = None
    input_desc: str = "in-memory"
    # Reassembly exchange. "hash": streaming hash-repartition on part_id
    # (Ray's HASH_SHUFFLE aggregators — overlaps with extraction, measured
    # ~4-7x faster than the sort-based groupby on the bench profile).
    # "groupby": the portable sort-based groupby(part_id).map_groups fallback.
    exchange: str = "hash"
    # hash-exchange sizing: partitions per exchange (not the commit P),
    # aggregator actor cap and per-partition CPU reservation — bounded so the
    # aggregators never deadlock against the extraction actor pool.
    exchange_partitions: int | None = None
    hash_aggregators: int = 8
    hash_aggregator_cpus: float = 0.25
    # A2: live progress/ETA line on stderr (manifest-tail poller; zero
    # data-plane overhead). Off by default — bench/tests want clean streams.
    progress: bool = False
    extra: dict = field(default_factory=dict)


def build_pipeline(ds: rd.Dataset, cfg: PipelineConfig) -> rd.Dataset:
    """Lazy Dataset plan: input docs → per-partition commit summaries."""
    if cfg.resume:
        done = completed_parts(cfg.out_dir, cfg.num_partitions)
        if done:
            ds = ds.map_batches(
                make_resume_filter(done, cfg.num_partitions),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
    units = ds.map_batches(
        make_explode(cfg.num_partitions, cfg.unit_chunk_rows),
        batch_format="pyarrow",
        batch_size=cfg.explode_batch_size,
        num_cpus=cfg.explode_num_cpus,  # breaks operator fusion; see config
        zero_copy_batch=True,
    )
    if cfg.ocr_repartition:
        units = units.repartition(cfg.ocr_repartition)
    extracted = units.map_batches(
        ExtractActor,
        fn_constructor_kwargs={"work_factor": cfg.work_factor,
                               "psm_override": cfg.psm_override},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.concurrency,
        num_cpus=cfg.num_cpus_per_actor,
        zero_copy_batch=True,
    )
    if _hash_exchange_available() and cfg.exchange == "hash":
        exchanged = extracted.repartition(
            cfg.exchange_partitions or min(16, cfg.num_partitions),
            keys=["part_id"],
            # no aggregator-side sort: commit_blocks self-sorts (Ray 2.49's
            # finalize sort crashes on schemaless shards from empty blocks)
        )
        return exchanged.map_batches(
            make_commit_blocks(cfg.out_dir, cfg.num_partitions, cfg.input_desc,
                               cfg.extra.get("fault_hook")),
            batch_format="pyarrow",
            batch_size=None,  # batch == block == complete partition runs
            zero_copy_batch=True,
        )
    return extracted.groupby("part_id").map_groups(
        make_reassemble_commit(cfg.out_dir, cfg.num_partitions, cfg.input_desc,
                               cfg.extra.get("fault_hook")),
        batch_format="pyarrow",
    )


def _hash_exchange_available() -> bool:
    try:
        from ray.data.context import ShuffleStrategy  # noqa: F401

        return True
    except ImportError:
        return False


def _apply_shuffle_config(ds: rd.Dataset, cfg: PipelineConfig) -> None:
    """Configure the DATASET-scoped DataContext for the hash exchange.

    A Dataset snapshots the global DataContext at creation, so the strategy
    must be set on ``ds.context`` (propagates to the whole downstream plan).
    repartition(keys=...) requires shuffle_strategy=HASH_SHUFFLE; the
    aggregator cap + fractional CPU reservation keep the shuffle actors from
    deadlocking against the extraction actor pool on a full node.
    """
    if not (_hash_exchange_available() and cfg.exchange == "hash"):
        return
    from ray.data.context import ShuffleStrategy

    from ocrautomator_ray.functions.exchange import silence_empty_partition_warning

    silence_empty_partition_warning()

    ctx = getattr(ds, "context", None)
    if ctx is None:
        return
    # Budget the aggregator actors to the cluster so they can never deadlock
    # the rest of the pipeline: at most ~1/16 of cluster CPUs, min 0.5 CPU.
    import ray

    total_cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    n_parts = cfg.exchange_partitions or min(16, cfg.num_partitions)
    n_agg = max(2, min(cfg.hash_aggregators, total_cpus // 4))
    cpu_budget = max(0.5, total_cpus / 16)  # total CPUs all aggregators may hold
    # the override is per exchange PARTITION; an aggregator holding k
    # partitions reserves k * override CPUs
    per_partition = min(cfg.hash_aggregator_cpus, cpu_budget / n_parts)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = n_agg
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_partition


def _summary_dict(out_dir: str, partitions_this_run: int) -> dict:
    manifests = load_manifests(out_dir)
    return {
        "out_dir": out_dir,
        "partitions_committed_total": len(manifests),
        "partitions_this_run": partitions_this_run,
        "counters": merge_counters(manifests),
    }


def run_extraction(ds: rd.Dataset, cfg: PipelineConfig) -> dict:
    """Execute the pipeline; return merged job counters (A1 partial+final)."""
    # Refuse an out_dir produced under a different partitioning (stale
    # part-NNNNN manifests/fragments would silently mix into the output),
    # then record this run's partitioning for the next run's check.
    check_run_compatible(cfg.out_dir, cfg.num_partitions)
    write_run_manifest(cfg.out_dir, {
        "num_partitions": cfg.num_partitions,
        "partitioner": "siphash(doc_id) % num_partitions",
        "input": cfg.input_desc,
    })
    _apply_shuffle_config(ds, cfg)
    # Empty input (or input emptied by pruning, below) must not reach the
    # exchange: an all-empty stream finalizes as a schemaless block there.
    # limit(1) probes are streaming short-circuits — they read one row, not
    # the dataset.
    if ds.limit(1).count() == 0:
        return _summary_dict(cfg.out_dir, 0)
    if cfg.resume:
        done = completed_parts(cfg.out_dir, cfg.num_partitions)
        if done:
            # If pruning leaves nothing (fully-resumed run), short-circuit:
            # an all-empty input would reach the exchange as a schemaless
            # block and fail, and there is no work to do anyway. limit(1)
            # keeps the probe a streaming short-circuit, not a full pass.
            from ocrautomator_ray.stages.explode import make_resume_filter

            probe = ds.map_batches(
                make_resume_filter(done, cfg.num_partitions),
                batch_format="pyarrow", zero_copy_batch=True,
            ).limit(1)
            if probe.count() == 0:
                return _summary_dict(cfg.out_dir, 0)
    if cfg.progress:
        from ocrautomator_ray.state.progress import ProgressReporter

        skip = completed_parts(cfg.out_dir, cfg.num_partitions) if cfg.resume else set()
        with ProgressReporter(cfg.out_dir, cfg.num_partitions, skip_parts=skip):
            summary = build_pipeline(ds, cfg).to_pandas()
    else:
        summary = build_pipeline(ds, cfg).to_pandas()  # P rows — small by design
    if summary["part_id"].duplicated().any():
        dupes = summary[summary["part_id"].duplicated(keep=False)]
        affected = sorted(dupes["part_id"].unique().tolist())
        # Back out the partial commits BEFORE raising: each fragment of the
        # split partition committed a manifest pointing at partial data, and
        # a resume would trust it and skip the partition forever. Demoting
        # the manifests makes the failure recoverable (resume recomputes).
        for pid in affected:
            demote_part(cfg.out_dir, int(pid))
        raise RuntimeError(
            "partition committed more than once in a single run — a partition "
            "spanned exchange blocks (size partitions below the block limit); "
            f"demoted part manifests so resume recomputes them: {affected}"
        )
    return _summary_dict(cfg.out_dir, int(summary.shape[0]))


def read_output(out_dir: str, empty_schema=None) -> rd.Dataset:
    """Read back the committed document table.

    Reads exactly the fragments named in committed manifests (the lineage),
    NOT the data directory: a task killed mid-write can leave a partial
    ``*.tmp.*`` file behind, and a directory read would ingest it as a
    fragment. Manifest-driven reads are the other half of the atomic-commit
    contract.
    """
    import os

    paths = [
        os.path.join(out_dir, frag)
        for m in load_manifests(out_dir).values()
        if m.get("status") == "committed"
        # singular: extraction commits; plural: the generic sink (which may
        # write several hive-partitioned fragments per hash partition)
        for frag in m["lineage"].get(
            "output_fragments", [m["lineage"].get("output_fragment")])
        if frag
    ]
    if not paths:
        # a legitimate outcome (e.g. every input row filtered before the
        # sink) — but the schema is gone with the data, so callers that know
        # their output shape pass empty_schema to keep downstream column
        # selection working on the empty result
        if empty_schema is not None:
            return rd.from_arrow(empty_schema.empty_table())
        raise FileNotFoundError(
            f"no committed partitions in {out_dir!r}; pass empty_schema= to "
            "read an empty-but-typed result")
    return rd.read_parquet(sorted(paths))


def flatten_spans(ds: rd.Dataset) -> rd.Dataset:
    """DOC_SCHEMA dataset → one row per span (doc_id, kind, text, media_ref,
    offset), fully vectorized (list_flatten + list_parent_indices)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def flat(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        parent = pc.list_parent_indices(spans)
        vals = pc.list_flatten(spans)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(parent),
                "kind": vals.field("kind"),
                "text": vals.field("text"),
                "media_ref": vals.field("media_ref"),
                "offset": vals.field("offset"),
            }
        )

    return ds.map_batches(flat, batch_format="pyarrow", zero_copy_batch=True)


def run_flagship(sf_dir: str, scratch_root: str = "/tmp/ocrautomator_ray",
                 fresh: bool = True, **cfg_kwargs) -> rd.Dataset:
    """The flagship pipeline over a doc table derived from the driver's
    documents.parquet: synthesize DOC_SCHEMA rows deterministically, run the
    full extraction pipeline, return the flattened span table."""
    import hashlib
    import os
    import shutil

    from ocrautomator_ray.synth import read_driver_docs

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(scratch_root, f"flagship-{tag}")
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    cfg_kwargs.setdefault("num_partitions", 16)
    cfg_kwargs.setdefault("work_factor", 2)
    cfg = PipelineConfig(out_dir=out_dir, input_desc=f"{sf_dir}/documents.parquet",
                         **cfg_kwargs)
    # streaming input synthesis: the graded path never materializes the doc
    # table on the driver (map_batches over the pruned parquet read)
    run_extraction(read_driver_docs(sf_dir), cfg)
    return flatten_spans(read_output(out_dir))
