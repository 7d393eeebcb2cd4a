"""CLI entry point (SURVEY.md §2.10 U2, §3.2): the engine's analogue of the
reference's `OcrAutomator` binary, and the entrypoint for `ray job submit`.

Usage (local)::

    python -m ocrautomator_ray.run --input /data/docs --out /data/extracted \
        --partitions 256 --concurrency 30 --work-factor 768

Usage (cluster — the north_rule launch path)::

    ray job submit --working-dir . -- python -m ocrautomator_ray.run \
        --input lance://bucket/docs.lance --out s3://bucket/extracted ...

This module owns a Ray session ONLY when none exists (guarded init) — the
library itself never calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ocrautomator_ray.run",
        description="Ray-Data-native interleaved-document extraction pipeline",
    )
    p.add_argument("--pipeline",
                   choices=["extract", "curate", "assemble", "full-corpus",
                            "training-mix", "value-rank",
                            "embedding-curation", "watch-incremental"],
                   default="extract",
                   help="extract: the OCR/span flagship; curate: normalize + "
                        "quality-filter + dedup + split over documents.parquet; "
                        "assemble: source-cap + ratio-mix + deterministic "
                        "shuffle into a position-ordered corpus")
    p.add_argument("--input", required=True,
                   help="input doc table (parquet path/dir, or .lance when "
                        "available); for --pipeline curate, the directory "
                        "holding documents.parquet")
    p.add_argument("--out", required=True, help="output directory (data/ + manifest/)")
    p.add_argument("--partitions", type=int, default=64,
                   help="hash partitions = checkpoint/commit units")
    p.add_argument("--concurrency", type=int, default=None,
                   help="extraction actor pool size (default: num_cpus - 2)")
    p.add_argument("--batch-size", type=int, default=64,
                   help="pages per extraction batch")
    p.add_argument("--work-factor", type=int, default=8,
                   help="synthetic OCR compute per page (hash rounds)")
    p.add_argument("--psm", type=int, default=None,
                   help="force one page-segmentation mode for every page "
                        "(overrides per-ref psm, like the reference's --psm)")
    p.add_argument("--repartition", type=int, default=None,
                   help="optional repartition between explode and the pool")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing checkpoint manifests")
    p.add_argument("--watch", action="store_true",
                   help="incremental mode: poll --input for new fragment "
                        "files and extract each batch into a new epoch "
                        "(extract pipeline only)")
    p.add_argument("--watch-rounds", type=int, default=None,
                   help="number of watch rounds to run (default: forever)")
    p.add_argument("--poll-interval", type=float, default=5.0,
                   help="seconds between input scans when idle in --watch")
    p.add_argument("--partition-by", default=None,
                   help="curate pipeline: hive-partition the output by this "
                        "column (e.g. split → data/split=train/...)")
    p.add_argument("--quiet", action="store_true",
                   help="suppress the live progress/ETA line on stderr")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="num_cpus for a locally-owned ray session (ignored on a cluster)")
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_arg_parser().parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    try:
        if args.pipeline == "curate":
            from ocrautomator_ray.pipelines.curate import run_curation

            return run_curation(args.input, args.out,
                                num_partitions=args.partitions,
                                resume=not args.no_resume,
                                progress=not args.quiet,
                                partition_by=args.partition_by)

        if args.pipeline == "assemble":
            from ocrautomator_ray.pipelines.assemble import run_assembly

            return run_assembly(args.input, args.out,
                                num_partitions=args.partitions,
                                resume=not args.no_resume)

        if args.pipeline == "full-corpus":
            from ocrautomator_ray.pipelines.full_corpus import run_full_corpus

            return run_full_corpus(args.input, args.out,
                                   num_partitions=args.partitions,
                                   resume=not args.no_resume,
                                   partition_by=args.partition_by)

        if args.pipeline == "training-mix":
            from ocrautomator_ray.pipelines.training_mix import run_training_mix

            return run_training_mix(args.input, args.out,
                                    num_partitions=args.partitions,
                                    resume=not args.no_resume)

        if args.pipeline == "embedding-curation":
            from ocrautomator_ray.pipelines.embedding_curation import (
                run_embedding_curation,
            )

            return run_embedding_curation(args.input, args.out,
                                          num_partitions=args.partitions,
                                          resume=not args.no_resume)

        if args.pipeline == "value-rank":
            from ocrautomator_ray.pipelines.value_rank import run_value_rank

            return run_value_rank(args.input, args.out,
                                  num_partitions=args.partitions,
                                  resume=not args.no_resume)

        if args.pipeline == "watch-incremental":
            from ocrautomator_ray.pipelines.watch_incremental import (
                run_watch_incremental,
            )

            return run_watch_incremental(args.input, args.out)

        from ocrautomator_ray.pipelines.extract import PipelineConfig, run_extraction
        from ocrautomator_ray.sources.io import read_docs

        concurrency = args.concurrency
        if concurrency is None:
            total = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(2, total - 2)

        if args.watch:
            from ocrautomator_ray.pipelines.watch import run_watch

            return run_watch(
                args.input, args.out,
                rounds=args.watch_rounds,
                poll_interval=args.poll_interval,
                num_partitions=args.partitions,
                resume=not args.no_resume,
                ocr_batch_size=args.batch_size,
                concurrency=concurrency,
                work_factor=args.work_factor,
                psm_override=args.psm,
                ocr_repartition=args.repartition,
                progress=not args.quiet,
            )
        cfg = PipelineConfig(
            out_dir=args.out,
            num_partitions=args.partitions,
            resume=not args.no_resume,
            ocr_batch_size=args.batch_size,
            concurrency=concurrency,
            work_factor=args.work_factor,
            psm_override=args.psm,
            ocr_repartition=args.repartition,
            input_desc=args.input,
            progress=not args.quiet,  # A2: live files/s / pages/s / ETA line
        )
        summary = run_extraction(read_docs(args.input), cfg)
        return summary
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1:]), indent=1))
