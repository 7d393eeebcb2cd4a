"""Driver-contract conformance: every queries() entry runs; every oracle_sql()
entry matches DuckDB exactly (column names, row count, values) — mimicking the
driver's order-insensitive compare at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


SQL_ORACLED = ["q1_pricing_summary", "filter_project", "first_event_per_user",
               "dedup_first_docs", "customers_without_orders", "revenue_by_nation",
               "top_orders", "event_type_counts", "hourly_user_activity",
               "token_stats", "quality_score", "chargram_jaccard_dups", "ann_topk",
               "embedding_neardup",
               "union_orders_halves", "revenue_by_priority", "sessionize_events",
               "top_events_per_user", "distinct_users_per_type", "asof_last_order", "quantiles_qty_by_flag",
               "decontaminate", "hash_split", "repetition_stats",
               "stratified_sample", "sliding_window_activity",
               "top_ngrams", "normalize_text", "curate_pipeline",
               "dedup_spans",
               "followers_within_window", "cumulative_user_value",
               "props_value_stats", "stopword_filter", "type_token_ratio",
               "percentile_filter_docs", "pii_scrub",
               "tfidf_top_terms", "user_event_sequences", "event_gaps",
               "user_event_pivot", "revenue_rollup", "label_centroids",
               "rolling_value_sum", "customer_order_counts",
               "repeat_customers", "churned_customers", "customer_value_ntile",
               "customer_era_revenue", "conversion_funnel",
               "qty_price_corr_by_flag", "orders_of_big_buyers", "doc_chunks",
               "approx_quantiles_value", "pack_sequences", "lang_id",
               "doc_fingerprint", "minhash_lsh_dups", "minhash_dup_clusters",
               "simhash_dups", "approx_top_tokens", "neardup_removed_docs",
               "revenue_by_region", "event_value_zscore",
               "seeded_shuffle", "source_cap", "mix_corpus", "weighted_sample",
               "rp_project", "sample_k", "incremental_dedup",
               "retention_cohorts", "embedding_outliers", "corpus_freq_score",
               "table_profile", "assemble_pipeline", "decontaminated_docs",
               "fingerprint_dups", "media_frame_counts",
               "bpe_pair_counts", "bm25_doc0_topk", "leakage_safe_split",
               "full_corpus_pipeline", "embedding_quantize",
               "media_decode_stats", "media_features", "semantic_dedup",
               "bigram_lm_score", "dup_ngram_stats", "dsir_importance",
               "dup_ngram_removed_docs", "oov_stats", "token_budget_mix",
               "training_mix_pipeline", "perplexity_buckets",
               "source_overlap_matrix", "temperature_mix",
               "label_dispersion", "source_report", "event_transitions",
               "embedding_covariance", "knn_pagerank", "mutual_knn_pairs",
               "knn_components", "data_value_rank", "cluster_sample",
               "length_histogram", "value_rank_pipeline",
               "contamination_fraction", "dedup_best_docs",
               "bm25_index_topk", "char_diversity",
               "minhash_cluster_sizes", "hard_negatives", "dsir_resample",
               "neardup_source_matrix", "lang_confusion", "split_balance"]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SQL_ORACLED)
def test_sql_oracled_query(name, ddb, contract):
    queries, sql = contract
    assert name in queries and name in sql
    got = _norm(_to_pandas(queries[name](SF)))
    exp = _norm(ddb.sql(sql[name]).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert got.shape == exp.shape
    for c in got.columns:
        # the driver hashes raw values, so int64-vs-float64 is a real mismatch
        assert got[c].dtype == exp[c].dtype, (c, got[c].dtype, exp[c].dtype)
        if got[c].dtype.kind == "f":
            assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c
        else:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


ROWS_ONLY = ["lsh_ann_topk", "ivf_ann_topk", "ivf_index_topk",
             "approx_distinct_users_per_type"]


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run(contract):
    queries, sql = contract
    for name in ROWS_ONLY:
        assert name in queries and name not in sql
        df = _to_pandas(queries[name](SF))
        assert df.shape[0] >= 0 and df.shape[1] >= 2, name


@pytest.mark.usefixtures("ray_session")
def test_every_query_has_sql_or_is_listed(contract):
    queries, sql = contract
    unac = set(queries) - set(sql) - set(ROWS_ONLY) - {"extract_pipeline"}
    assert not unac, f"queries without oracle or rows-only listing: {unac}"
