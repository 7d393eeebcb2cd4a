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
from ocrautomator_ray.stages.reassemble import make_reassemble_commit
from ocrautomator_ray.state.manifest import completed_parts, load_manifests, merge_counters


@dataclass
class PipelineConfig:
    out_dir: str
    num_partitions: int = 16
    resume: bool = True
    # explode: stateless tasks over doc rows
    explode_batch_size: int = 256
    # extraction actor pool (the reference's N warm OCR threads)
    concurrency: tuple[int, int] | int = (2, 8)
    num_cpus_per_actor: float = 1.0
    ocr_batch_size: int = 128
    work_factor: int = 8
    # optional skew-spreading repartition between explode and the pool
    ocr_repartition: int | None = None
    input_desc: str = "in-memory"
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
        make_explode(cfg.num_partitions),
        batch_format="pyarrow",
        batch_size=cfg.explode_batch_size,
        zero_copy_batch=True,
    )
    if cfg.ocr_repartition:
        units = units.repartition(cfg.ocr_repartition)
    extracted = units.map_batches(
        ExtractActor,
        fn_constructor_kwargs={"work_factor": cfg.work_factor},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.concurrency,
        num_cpus=cfg.num_cpus_per_actor,
        zero_copy_batch=True,
    )
    return extracted.groupby("part_id").map_groups(
        make_reassemble_commit(cfg.out_dir, cfg.num_partitions, cfg.input_desc),
        batch_format="pyarrow",
    )


def run_extraction(ds: rd.Dataset, cfg: PipelineConfig) -> dict:
    """Execute the pipeline; return merged job counters (A1 partial+final)."""
    summary = build_pipeline(ds, cfg).to_pandas()  # P rows — small by design
    manifests = load_manifests(cfg.out_dir)
    return {
        "out_dir": cfg.out_dir,
        "partitions_committed_total": len(manifests),
        "partitions_this_run": int(summary.shape[0]),
        "counters": merge_counters(manifests),
    }


def read_output(out_dir: str) -> rd.Dataset:
    """Read back the committed document table (DOC_SCHEMA parquet fragments)."""
    from ocrautomator_ray.state.manifest import data_dir

    return rd.read_parquet(data_dir(out_dir))


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

    from ocrautomator_ray.synth import docs_from_documents_parquet

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(scratch_root, f"flagship-{tag}")
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    docs = docs_from_documents_parquet(sf_dir)
    cfg_kwargs.setdefault("num_partitions", 16)
    cfg_kwargs.setdefault("work_factor", 2)
    cfg = PipelineConfig(out_dir=out_dir, input_desc=f"{sf_dir}/documents.parquet",
                         **cfg_kwargs)
    run_extraction(rd.from_arrow(docs), cfg)
    return flatten_spans(read_output(out_dir))
