"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Nothing here (or in the library) calls ``ray.init``/``ray.shutdown`` — the
caller owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ocrautomator_ray.functions import ann as _ann
from ocrautomator_ray.functions import classifier as _classifier
from ocrautomator_ray.functions import corpus as _corpus
from ocrautomator_ray.functions import curate as _curate
from ocrautomator_ray.functions import dedup as _dedup
from ocrautomator_ray.functions import filters as _filters
from ocrautomator_ray.functions import graph as _graph
from ocrautomator_ray.functions import kmeans as _kmeans
from ocrautomator_ray.functions import lm as _lm
from ocrautomator_ray.functions import media as _media
from ocrautomator_ray.functions import mix as _mix
from ocrautomator_ray.functions import moments as _moments
from ocrautomator_ray.functions import pca as _pca
from ocrautomator_ray.functions import relational as _relational
from ocrautomator_ray.functions import relational2 as _relational2
from ocrautomator_ray.functions import relational3 as _relational3
from ocrautomator_ray.functions import relational4 as _relational4
from ocrautomator_ray.functions import sketch as _sketch
from ocrautomator_ray.functions import snapshot as _snapshot
from ocrautomator_ray.functions import streaming as _streaming
from ocrautomator_ray.functions import text as _text
from ocrautomator_ray.functions import topics as _topics
from ocrautomator_ray.pipelines.assemble import SQL_ASSEMBLE, run_assemble_flagship
from ocrautomator_ray.pipelines.curate import SQL_CURATE, run_curate_flagship
from ocrautomator_ray.pipelines.embedding_curation import (
    SQL_EMBEDDING_CURATION,
    run_embedding_curation_flagship,
)
from ocrautomator_ray.pipelines.extract import run_flagship
from ocrautomator_ray.pipelines.full_corpus import (
    SQL_FULL_CORPUS,
    run_full_corpus_flagship,
)
from ocrautomator_ray.pipelines.training_mix import (
    SQL_TRAINING_MIX,
    run_training_mix_flagship,
)
from ocrautomator_ray.pipelines.value_rank import (
    SQL_VALUE_RANK,
    run_value_rank_flagship,
)
from ocrautomator_ray.pipelines.watch_incremental import (
    SQL_WATCH_INCREMENTAL,
    run_watch_incremental_flagship,
)


def entry() -> Any:
    """Flagship extraction pipeline over /root/testdata/sf0.001.

    Synthesizes the interleaved DOC_SCHEMA table from documents.parquet,
    runs read → explode → ExtractActor pool → reassemble/commit, and returns
    the flattened span table (doc_id, kind, text, media_ref, offset).
    """
    return run_flagship("/root/testdata/sf0.001")


def _flagship_query(sf_dir: str) -> Any:
    return run_flagship(sf_dir)


# The driver samples the FIRST 50 queries() entries for its per-round
# attestation; ROUND5_WINDOW pins that prefix explicitly (tests/
# test_extensibility.py asserts list(queries())[:len(ROUND5_WINDOW)] equals
# this list, so the window is code, not comment arithmetic — ADVICE r4 #4).
# Round-5 composition, per VERDICT r4 task 2: every operator that has NEVER
# had a driver-green CORRECTNESS row (the late round-4 additions: k-means /
# PQ / PCA / perceptron / CM-sketch / graph / topics / value-rank families
# and the final-stretch audits), plus every entry whose implementation
# CHANGED this round (adaptive propagation checkpointing behind
# full_corpus_pipeline / minhash_dup_clusters / knn_components, the fused
# one-exchange PageRank behind knn_pagerank / data_value_rank /
# value_rank_pipeline, and the round-5 additions appended as they land).
# Everything outside the window holds a driver-green row from rounds 1-4
# and is unchanged; standing attestation = that row + the full
# tools/check_correctness.py sweep recorded in COVERAGE.md.
ROUND5_WINDOW: list[str] = [
    # never driver-attested (added late in round 4)
    "kmeans_fit", "cluster_sample", "pq_codes", "pq_ann_topk",
    "pca_project", "perceptron_lang", "cmsketch_token_counts",
    "embedding_covariance", "quantile_normalize",
    "mutual_knn_pairs", "markov_stationary",
    "doc_topics", "topic_keywords", "incremental_doc_topics",
    "embedding_curation_pipeline",
    "minhash_cluster_sizes", "hard_negatives", "dsir_resample",
    "neardup_source_matrix", "lang_confusion", "split_balance",
    # changed in round 5 (adaptive checkpointing / fused PageRank /
    # trainer round-checkpoints / index commit-marker + eviction rules /
    # char_diversity bound)
    "full_corpus_pipeline", "minhash_dup_clusters", "knn_components",
    "knn_pagerank", "data_value_rank", "value_rank_pipeline",
    "bpe_train_merges", "bpe_apply_stats", "char_diversity",
    "bm25_index_topk", "incremental_neardup_indexed",
    # changed in round 5 by the Arrow ports (pandas batch formats removed)
    # and the shared exact/sketch quantile engine. The ports also touched
    # event_transitions, user_behavior_vectors, ccnet_filter,
    # approx_quantiles_value, percentile_filter_docs and the ann finalizers
    # behind semantic_dedup/pq_ann_topk/hard_negatives (already above) —
    # those don't fit the 50-entry window; their attestation this round is
    # the full tools/check_correctness.py sweep + pytest (COVERAGE.md).
    "sessionize_events", "asof_last_order", "quantiles_qty_by_flag",
    "sliding_window_activity", "user_event_sequences",
    "cumulative_user_value", "rolling_value_sum", "event_gaps",
    "user_event_pivot", "customer_value_ntile",
    "type_token_ratio",
    "lang_id", "ann_topk", "winsorize_values", "value_mad_by_type",
    # new in round 5: the watch-driven incremental composition (arrivals →
    # near-dup vs committed index → BM25 epoch appends) oracled by the
    # one-statement batch recompute, and the two streaming window
    # operators with carried per-key state oracled by their batch windows
    # (top_events_per_user, first_event_per_user and revenue_by_nation
    # yielded their slots to keep the prefix at 50; they join the
    # sweep-attested group)
    "watch_incremental_pipeline", "incremental_sessionize",
    "incremental_hourly_activity",
]


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}
    q.update(_relational.QUERIES)
    q.update(_relational2.QUERIES)
    q.update(_relational3.QUERIES)
    q.update(_relational4.QUERIES)
    q.update(_filters.QUERIES)
    q.update(_media.QUERIES)
    q.update(_dedup.QUERIES)
    q.update(_ann.QUERIES)
    q.update(_curate.QUERIES)
    q.update(_mix.QUERIES)
    q.update(_text.QUERIES)
    q.update(_corpus.QUERIES)
    q.update(_sketch.QUERIES)
    q.update(_lm.QUERIES)
    q.update(_snapshot.QUERIES)
    q.update(_streaming.QUERIES)
    q.update(_kmeans.QUERIES)
    q.update(_moments.QUERIES)
    q.update(_pca.QUERIES)
    q.update(_classifier.QUERIES)
    q.update(_topics.QUERIES)
    q.update(_graph.QUERIES)
    q["extract_pipeline"] = _flagship_query
    q["curate_pipeline"] = run_curate_flagship
    q["assemble_pipeline"] = run_assemble_flagship
    q["full_corpus_pipeline"] = run_full_corpus_flagship
    q["training_mix_pipeline"] = run_training_mix_flagship
    q["value_rank_pipeline"] = run_value_rank_flagship
    q["embedding_curation_pipeline"] = run_embedding_curation_flagship
    q["watch_incremental_pipeline"] = run_watch_incremental_flagship
    # order: the pinned attestation window first, everything else after in
    # registration order (dict.update leaves already-present keys in place)
    out = {k: q[k] for k in ROUND5_WINDOW}
    out.update(q)
    return out


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}
    sql.update(_relational.SQL)
    sql.update(_relational2.SQL)
    sql.update(_relational3.SQL)
    sql.update(_relational4.SQL)
    sql.update(_filters.SQL)
    sql.update(_corpus.SQL)
    sql.update(_sketch.SQL)
    sql.update(_text.SQL)
    sql.update(_dedup.SQL)
    sql.update(_ann.SQL)
    sql.update(_curate.SQL)
    sql.update(_media.SQL)
    sql.update(_kmeans.SQL)
    sql.update(_moments.SQL)
    sql.update(_pca.SQL)
    sql.update(_classifier.SQL)
    sql.update(_topics.SQL)
    sql.update(_graph.SQL)
    sql.update(_lm.SQL)
    sql.update(_mix.SQL)
    sql.update(_snapshot.SQL)
    sql.update(_streaming.SQL)
    sql["curate_pipeline"] = SQL_CURATE
    sql["assemble_pipeline"] = SQL_ASSEMBLE
    sql["full_corpus_pipeline"] = SQL_FULL_CORPUS
    sql["training_mix_pipeline"] = SQL_TRAINING_MIX
    sql["value_rank_pipeline"] = SQL_VALUE_RANK
    sql["embedding_curation_pipeline"] = SQL_EMBEDDING_CURATION
    sql["watch_incremental_pipeline"] = SQL_WATCH_INCREMENTAL
    # Rows-only (non-SQL-expressible): lsh_ann_topk, ivf_ann_topk,
    # ivf_index_topk, approx_distinct_users_per_type, extract_pipeline —
    # each has a pytest oracle instead (tests/): ivf_index_topk is pinned
    # rows-identical to ivf_ann_topk and its read provably opens only the
    # probed centroid directories.
    return sql
