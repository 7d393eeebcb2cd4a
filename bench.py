#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6 / M7).

Default mode: runs the headline extraction pipeline plus a set of operator
benchmarks over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` mode: runs the same benchmark twice in fresh processes at
num_cpus=8 and num_cpus=32 on byte-identical input and reports both
throughputs plus scaling efficiency — the sandbox stand-in for the N-node vs
4N-node ``ray job submit`` criterion (BASELINE.json:14; no real multi-node
cluster exists here).

The headline input is the deterministic FIXTURES.md `bench` profile sized
from the sf documents table (12 docs per documents-row), cached as parquet
under /tmp so both scaling runs read identical bytes. The synthetic decoder's
``work_factor`` is calibrated so per-page decode ≈ 4 ms — the same order as
real OCR inference, keeping actor-pool economics honest.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WORK_FACTOR = int(os.environ.get("BENCH_WORK_FACTOR", "1536"))  # ~8 ms/page
DOCS_PER_ROW = int(os.environ.get("BENCH_DOCS_PER_ROW", "12"))
SCRATCH = "/tmp/ocrautomator_bench"


def _bench_input(sf_dir: str) -> str:
    """Deterministic bench doc table, cached on disk (shared by both scaling
    runs so input bytes are identical)."""
    import duckdb

    n_rows = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    n_docs = n_rows * DOCS_PER_ROW
    path = os.path.join(SCRATCH, f"bench-{n_docs}-seed42")
    if not os.path.exists(path):
        # A DIRECTORY of shard files, like any real at-scale input: the read
        # parallelizes across fragments instead of one monolithic read task.
        import pyarrow.parquet as pq

        from ocrautomator_ray.synth import gen_table

        os.makedirs(SCRATCH, exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        table = gen_table("bench", seed=42, rows=n_docs)
        shard = 2048
        for i, start in enumerate(range(0, table.num_rows, shard)):
            pq.write_table(table.slice(start, shard),
                           os.path.join(tmp, f"shard-{i:04d}.parquet"),
                           row_group_size=1024)
        os.replace(tmp, path)
    return path


def run_benchmarks() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from ocrautomator_ray.pipelines.extract import PipelineConfig, run_extraction
    from ocrautomator_ray.functions import (
        ann, corpus, curate, dedup, filters, lm, mix, relational,
        relational2, relational3, relational4, text,
    )

    bench_path = _bench_input(SF_DIR)
    # warm OS page cache (untimed) so we measure compute + shuffle, not disk
    rd.read_parquet(bench_path).count()

    # warm the worker pool (untimed): a mini pipeline run spawns + imports the
    # Ray worker processes once, so the timed run measures steady-state
    # throughput rather than interpreter start-up — the cluster analogue is a
    # long-lived job processing far more than 60s of data
    warm_dir = os.path.join(SCRATCH, f"warm-{NUM_CPUS}-{os.getpid()}")
    run_extraction(
        rd.read_parquet(bench_path, override_num_blocks=64).limit(2000),
        PipelineConfig(out_dir=warm_dir, num_partitions=8, resume=False,
                       concurrency=max(2, (NUM_CPUS * 3) // 4), work_factor=1,
                       input_desc="warmup"),
    )
    shutil.rmtree(warm_dir, ignore_errors=True)

    queries: dict[str, float] = {}
    stats: dict[str, float] = {}
    # --scaling legs set this: the scaling-efficiency criterion measures the
    # HEADLINE extraction job at two parallelism levels; re-timing the whole
    # operator suite per leg adds ~an hour of wall for numbers the metric
    # never reads
    headline_only = os.environ.get("BENCH_HEADLINE_ONLY") == "1"

    # ---- headline: full extraction pipeline over the bench doc table ----
    out_dir = os.path.join(SCRATCH, f"out-{NUM_CPUS}-{os.getpid()}")
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = PipelineConfig(
        out_dir=out_dir,
        num_partitions=64,
        resume=False,
        explode_batch_size=256,
        ocr_batch_size=64,
        # fixed pool (no autoscale ramp), sized to ~3/4 of the node so the
        # feeders (read, explode) and the exchange aggregators keep CPUs
        concurrency=max(2, (NUM_CPUS * 3) // 4),
        num_cpus_per_actor=1.0,
        work_factor=WORK_FACTOR,
        input_desc=bench_path,
    )
    t0 = time.perf_counter()
    res = run_extraction(
        rd.read_parquet(bench_path, override_num_blocks=12 * NUM_CPUS), cfg
    )
    headline = time.perf_counter() - t0
    queries["extract_bench"] = round(headline, 3)
    c = res["counters"]
    stats["docs"] = c.get("docs", 0)
    stats["pages_ocrd"] = c.get("pages_ocrd", 0)
    stats["docs_per_sec"] = round(stats["docs"] / headline, 1)
    stats["pages_per_sec"] = round(stats["pages_ocrd"] / headline, 1)
    shutil.rmtree(out_dir, ignore_errors=True)

    if headline_only:
        ray.shutdown()
        return {
            "metric": "extraction pipeline wall time (bench profile, "
                      f"work_factor={WORK_FACTOR})",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            **stats,
        }

    # ---- operator benchmarks over the driver tables ----
    def timed(name, fn, consume="to_pandas"):
        t0 = time.perf_counter()
        ds = fn(SF_DIR)
        if consume == "count":
            ds.count()
        else:
            ds.to_pandas()
        queries[name] = round(time.perf_counter() - t0, 3)

    timed("q1_pricing_summary", relational.q1_pricing_summary)
    timed("filter_project", relational.filter_project, consume="count")
    timed("dedup_first_docs", relational.dedup_first_docs, consume="count")
    timed("hourly_user_activity", relational.hourly_user_activity, consume="count")
    timed("sessionize_events", relational2.sessionize_events, consume="count")
    timed("top_events_per_user", relational2.top_events_per_user, consume="count")
    timed("token_stats", text.token_stats, consume="count")
    timed("doc_fingerprint", text.doc_fingerprint, consume="count")
    timed("minhash_lsh_dups", dedup.minhash_lsh_dups, consume="count")
    timed("neardup_jaccard_hist", dedup.neardup_jaccard_hist, consume="count")
    timed("containment_pairs", dedup.containment_pairs, consume="count")
    timed("embedding_neardup", dedup.embedding_neardup, consume="count")
    timed("decontaminate", curate.decontaminate, consume="count")
    timed("ann_topk", ann.ann_topk)
    timed("followers_within_window", relational3.followers_within_window,
          consume="count")
    timed("tfidf_top_terms", corpus.tfidf_top_terms, consume="count")
    timed("doc_chunks", corpus.doc_chunks, consume="count")
    timed("pack_sequences", corpus.pack_sequences, consume="count")
    timed("customer_value_ntile", relational4.customer_value_ntile,
          consume="count")
    timed("orders_of_big_buyers", relational4.orders_of_big_buyers,
          consume="count")
    timed("revenue_by_region", relational4.revenue_by_region)
    timed("seeded_shuffle", mix.seeded_shuffle, consume="count")
    timed("token_budget_mix", mix.token_budget_mix, consume="count")
    timed("mix_corpus", mix.mix_corpus, consume="count")
    timed("rp_project", mix.rp_project, consume="count")
    timed("simhash_dups", dedup.simhash_dups, consume="count")
    timed("bpe_pair_counts", corpus.bpe_pair_counts, consume="count")
    timed("bpe_train_merges", corpus.bpe_train_merges)  # returns pa.Table
    timed("bm25_doc0_topk", corpus.bm25_doc0_topk, consume="count")
    timed("ivf_index_topk", ann.ivf_index_topk)
    timed("semantic_dedup", ann.semantic_dedup, consume="count")
    timed("bigram_lm_score", lm.bigram_lm_score, consume="count")
    timed("dup_ngram_stats", lm.dup_ngram_stats, consume="count")
    timed("dup_ngram_removed_docs", lm.dup_ngram_removed_docs, consume="count")
    timed("oov_stats", lm.oov_stats, consume="count")
    timed("dsir_importance", lm.dsir_importance, consume="count")
    timed("perplexity_buckets", lm.perplexity_buckets, consume="count")
    timed("source_overlap_matrix", lm.source_overlap_matrix, consume="count")
    timed("temperature_mix", mix.temperature_mix, consume="count")
    timed("label_dispersion", ann.label_dispersion, consume="count")
    timed("knn_graph", ann.knn_graph, consume="count")
    timed("event_transitions", relational3.event_transitions, consume="count")

    from ocrautomator_ray.functions import graph as gr
    from ocrautomator_ray.functions import moments

    timed("knn_pagerank", gr.knn_pagerank, consume="count")
    timed("knn_components", gr.knn_components, consume="count")
    timed("data_value_rank", gr.data_value_rank, consume="count")
    timed("embedding_covariance", moments.embedding_covariance,
          consume="count")
    timed("gopher_rules", filters.gopher_rules, consume="count")
    timed("winsorize_values", filters.winsorize_values, consume="count")
    timed("value_mad_by_type", filters.value_mad_by_type, consume="count")
    timed("source_report", text.source_report, consume="count")

    from ocrautomator_ray.functions import kmeans as km

    timed("kmeans_fit", km.kmeans_fit, consume="count")
    timed("cluster_sample", km.cluster_sample, consume="count")
    timed("pq_codes", km.pq_codes, consume="count")
    timed("pq_ann_topk", km.pq_ann_topk, consume="count")

    from ocrautomator_ray.functions import classifier as clf
    from ocrautomator_ray.functions import pca
    from ocrautomator_ray.functions import sketch as sk

    timed("pca_project", pca.pca_project, consume="count")
    timed("perceptron_lang", clf.perceptron_lang, consume="count")
    timed("cmsketch_token_counts", sk.cmsketch_token_counts, consume="count")
    timed("quantile_normalize", filters.quantile_normalize, consume="count")
    timed("markov_stationary", gr.markov_stationary, consume="count")
    timed("token_cooc_lift", lm.token_cooc_lift, consume="count")
    timed("idf_hashed_vectors", mix.idf_hashed_vectors, consume="count")

    from ocrautomator_ray.functions import topics as tp

    timed("doc_topics", tp.doc_topics, consume="count")
    timed("topic_keywords", tp.topic_keywords, consume="count")

    from ocrautomator_ray.functions import snapshot as snap

    timed("incremental_neardup", snap.incremental_neardup, consume="count")
    # prebuild so the indexed row times the warm O(new shard) query path —
    # the build itself is the one-off amortized cost the index exists to save
    snap.neardup_index_build(SF_DIR)
    timed("incremental_neardup_indexed", snap.incremental_neardup_indexed,
          consume="count")
    timed("contamination_fraction", curate.contamination_fraction,
          consume="count")
    timed("dedup_best_docs", curate.dedup_best_docs, consume="count")
    timed("char_diversity", text.char_diversity, consume="count")
    corpus.bm25_index_build(SF_DIR)  # same warm-path convention as above
    timed("bm25_index_topk", corpus.bm25_index_topk, consume="count")
    timed("corpus_drift", snap.corpus_drift, consume="count")
    timed("snapshot_changelog", snap.snapshot_changelog, consume="count")

    from ocrautomator_ray.pipelines.curate import run_curate_flagship
    from ocrautomator_ray.pipelines.extract import run_flagship

    from ocrautomator_ray.pipelines.full_corpus import run_full_corpus_flagship

    timed("extract_flagship_sfdocs", lambda sf: run_flagship(sf), consume="count")
    timed("curate_pipeline", lambda sf: run_curate_flagship(sf), consume="count")
    timed("full_corpus_pipeline", lambda sf: run_full_corpus_flagship(sf),
          consume="count")
    from ocrautomator_ray.pipelines.training_mix import run_training_mix_flagship
    timed("training_mix_pipeline", lambda sf: run_training_mix_flagship(sf),
          consume="count")
    from ocrautomator_ray.pipelines.value_rank import run_value_rank_flagship
    timed("value_rank_pipeline", lambda sf: run_value_rank_flagship(sf),
          consume="count")
    from ocrautomator_ray.pipelines.embedding_curation import (
        run_embedding_curation_flagship,
    )
    timed("embedding_curation_pipeline",
          lambda sf: run_embedding_curation_flagship(sf), consume="count")
    from ocrautomator_ray.pipelines.watch_incremental import (
        run_watch_incremental_flagship,
    )
    timed("watch_incremental_pipeline",
          lambda sf: run_watch_incremental_flagship(sf), consume="count")
    from ocrautomator_ray.functions.streaming import (
        incremental_hourly_activity,
        incremental_sessionize,
    )
    timed("incremental_sessionize", incremental_sessionize, consume="count")
    timed("incremental_hourly_activity", incremental_hourly_activity,
          consume="count")

    ray.shutdown()

    return {
        "metric": "extraction pipeline wall time (bench profile, "
                  f"work_factor={WORK_FACTOR})",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **stats,
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (8 vs 32 CPUs).

    Each leg runs BENCH_SCALING_REPS times (default 2) and the per-leg
    minimum wall is used: this machine carries ambient background load
    (observed 15-min loadavg ≈ 7 while "idle"), and min-of-N is the standard
    noise-robust estimator for wall-clock benchmarks.
    """
    reps = int(os.environ.get("BENCH_SCALING_REPS", "2"))
    results = {}
    for n in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                   BENCH_HEADLINE_ONLY="1")
        runs = []
        for _ in range(reps):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            runs.append(json.loads(out.strip().splitlines()[-1]))
        results[n] = min(runs, key=lambda r: r["value"])
    t8, t32 = results[8]["value"], results[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "throughput scaling efficiency, num_cpus 8 -> 32 "
                  "(sandbox stand-in for N vs 4N nodes)",
        "sec_8": t8,
        "sec_32": t32,
        "pages_per_sec_8": results[8].get("pages_per_sec"),
        "pages_per_sec_32": results[32].get("pages_per_sec"),
        "docs_per_sec_8": results[8].get("docs_per_sec"),
        "docs_per_sec_32": results[32].get("docs_per_sec"),
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        payload = run_scaling()
    else:
        # keep stdout to exactly one JSON line: anything the libraries print
        # goes to stderr
        real_stdout = sys.stdout
        with contextlib.redirect_stdout(sys.stderr):
            payload = run_benchmarks()
        sys.stdout = real_stdout
    print(json.dumps(payload))
