"""Corpus-level term statistics: TF-IDF top terms per document.

The corpus-relative signal (document frequency) makes this a genuinely
distributed computation — unlike the per-document ops in functions/text.py,
no single batch can score a term without the global DF table. The layout:

1. TF: one vectorized pandas pass per batch. Each document's text lives in
   exactly one input row, so a per-batch explode + group count yields FINAL
   (doc_id, term, tf) rows — no cross-batch combine needed.
2. DF: partial per-batch term counts over the tf rows, then one small
   ``groupby(term)`` finalize — the classic partial+final shape; the shuffle
   moves (term, count) partials, never token rows.
3. tf ⋈ df on ``term`` via ``Dataset.join`` — hash-partitions BOTH sides (the
   vocabulary can be huge at corpus scale; no broadcast).
4. Per-doc ranking: one hash exchange on ``doc_id``, vectorized sort + rank.

Ranking uses the raw rational tf/df as an IEEE double (ORDER BY tf/df DESC,
term): with N fixed per corpus, tf·N/df and tf/df induce the same order, both
engines compute the identical double division, and equal scores tie-break on
the term string — deterministic and oracle-exact without any ``log`` call
(libm rounding differences would make true log-idf hash-unstable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks
from ocrautomator_ray.functions.filters import WORD_RE

TFIDF_TOP_K = 3


def tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    path = f"{sf_dir}/documents.parquet"
    docs = rd.read_parquet(path, columns=["doc_id", "text"])

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(WORD_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), lens),
            "term": np.concatenate(
                [np.asarray(x, dtype=object) for x in toks]
            ) if lens.sum() else np.array([], dtype=object),
        })
        out = flat.groupby(["doc_id", "term"], as_index=False).size()
        return out.rename(columns={"size": "tf"}).astype({"tf": np.int64})

    tf = docs.map_batches(tf_rows, batch_format="pandas")

    def df_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["term"]), "term").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["term", "df"])

    df_tbl = (
        tf.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )

    joined = tf.join(df_tbl, join_type="inner", num_partitions=8, on=("term",))

    def rank_block(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int64),
                "df": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
            })
        score = block["tf"].to_numpy(dtype=np.float64) \
            / block["df"].to_numpy(dtype=np.float64)
        g = block.assign(_score=score).sort_values(
            ["doc_id", "_score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        rank = g.groupby("doc_id").cumcount().to_numpy() + 1
        keep = rank <= TFIDF_TOP_K
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy()[keep],
            "term": g["term"].to_numpy()[keep],
            "tf": g["tf"].to_numpy()[keep],
            "df": g["df"].to_numpy()[keep],
            "rank": rank[keep].astype(np.int64),
        })

    return per_key_blocks(joined, ["doc_id"], rank_block,
                          batch_format="pandas",
                          num_partitions=auto_partitions(path))


SQL_TFIDF = f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '{WORD_RE}')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
df AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
s AS (
    SELECT doc_id, tf.term AS term, tf, df,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY CAST(tf AS DOUBLE)/CAST(df AS DOUBLE) DESC, tf.term
           ) AS rank
    FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, rank FROM s WHERE rank <= {TFIDF_TOP_K}
"""


QUERIES = {"tfidf_top_terms": tfidf_top_terms}
SQL = {"tfidf_top_terms": SQL_TFIDF}
