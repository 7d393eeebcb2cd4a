"""Embedding-curation pipeline — the composed "clean diverse coreset" path
an embedding-table curation job runs end to end:

    embedding_outliers   (drop the per-label farthest-from-centroid tail)
  + semantic_dedup       (drop SemDeDup cosine near-duplicates)
        → large×large LEFT ANTI join against the union of both drop lists
        → cluster_cap_stage (k-means-balanced cap over the SURVIVORS,
          centroids from the full-table distributed Lloyd loop)

Output rows: (vec_id, cluster) — the budgeted, mode-balanced, outlier- and
duplicate-free subset an embedding-training run samples from. Every stage
is a verified graded operator; the composition is hash-checked as ONE SQL
statement (``embedding_curation_pipeline``).

Scale shape: the drop lists are corpus-fraction-sized (never broadcast —
the anti-join hash-partitions them against the table, the
neardup_removed_docs discipline), the Lloyd training is the bounded
k×dim-exchange loop, and the final cap exchange moves at most
cap × batches rows. Centroids are trained on the FULL table — deterministic
and mirrorable; a production run could refit on survivors at the cost of a
second Lloyd loop, same machinery.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.ann import (
    OUTLIER_K,
    SEMDEDUP_THRESHOLD,
    embedding_outliers,
    semantic_dedup,
)
from ocrautomator_ray.functions.exchange import (
    auto_partitions,
    pruned_read,
    tune_exchange,
)
from ocrautomator_ray.functions.kmeans import (
    CLUSTER_CAP,
    KM_ITERS,
    KM_K,
    _fit_centroids,
    _kmeans_ctes,
    cluster_cap_stage,
)
from ocrautomator_ray.functions.mix import SHUFFLE_SEED, sql_mix_hash


def run_embedding_curation_flagship(sf_dir: str) -> rd.Dataset:
    """queries() surface: (vec_id, cluster) for the curated coreset."""
    import pyarrow.compute as pc

    drop_sem = semantic_dedup(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["kept"], 0))
                   .select(["vec_id"]).rename_columns(["drop_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    drop_out = embedding_outliers(sf_dir).map_batches(
        lambda t: t.select(["vec_id"]).rename_columns(["drop_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    emb_path = f"{sf_dir}/embeddings.parquet"
    C, _ = _fit_centroids(sf_dir, KM_K, KM_ITERS)

    # assign clusters BEFORE the anti-join: Arrow's hash join cannot carry a
    # list column as payload, and the assigned table is all-scalar anyway —
    # the embedding column never enters the exchange
    import numpy as np

    from ocrautomator_ray.functions.kmeans import _micros

    assigned_schema = pa.schema([("vec_id", pa.int64()),
                                 ("cluster", pa.int64())])

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return assigned_schema.empty_table()
        M = _micros(t)
        d = ((M * M).sum(axis=1, keepdims=True) - 2 * (M @ C.T)
             + (C * C).sum(axis=1))
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cluster": pa.array(np.argmin(d, axis=1).astype(np.int64),
                                pa.int64()),
        })

    assigned = pruned_read(emb_path, ["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
    tune_exchange(assigned)
    survivors = assigned.join(drop_sem.union(drop_out),
                              join_type="left_anti",
                              num_partitions=auto_partitions(emb_path),
                              on=("vec_id",), right_on=("drop_id",))
    # cluster_cap_stage sees the cluster column → pre-prune + cap exchange
    return cluster_cap_stage(survivors, C, CLUSTER_CAP)


CURATED_SCHEMA = pa.schema([("vec_id", pa.int64()),
                            ("cluster", pa.int64())])


def run_embedding_curation(sf_dir: str, out_dir: str,
                           num_partitions: int = 16,
                           resume: bool = True) -> dict:
    """Product path: run the curation chain into the resumable sink,
    partitioned on vec_id — a killed run resumes O(P)."""
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    ds = run_embedding_curation_flagship(sf_dir)
    return resumable_write(ds, out_dir, num_partitions=num_partitions,
                           key="vec_id",
                           input_desc=f"{sf_dir}/embeddings.parquet",
                           resume=resume)


def _sql_embedding_curation(k: int = KM_K, iters: int = KM_ITERS,
                            cap: int = CLUSTER_CAP) -> str:
    h = sql_mix_hash("vec_id", SHUFFLE_SEED)
    # the kmeans chain opens its own WITH; splice it in as trailing CTEs
    km = _kmeans_ctes(k, iters).strip()
    assert km.startswith("WITH ")
    km = km[len("WITH "):]
    return f"""
WITH se AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
              AS BIGINT) AS v
  FROM embeddings
),
scent AS (
  SELECT label, dim,
         CAST(FLOOR((2.0*SUM(v) + COUNT(*)) / (2*COUNT(*))) AS BIGINT) AS c
  FROM se GROUP BY label, dim
),
sd AS (
  SELECT se.vec_id, se.label,
         CAST(SUM((se.v - scent.c)*(se.v - scent.c)) AS BIGINT) AS dist2
  FROM se JOIN scent ON se.label = scent.label AND se.dim = scent.dim
  GROUP BY se.vec_id, se.label
),
sem_dropped AS (
  SELECT DISTINCT a.vec_id
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
   AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[]))
       >= {SEMDEDUP_THRESHOLD}
  JOIN sd da ON da.vec_id = a.vec_id
  JOIN sd db ON db.vec_id = b.vec_id
  WHERE db.dist2 > da.dist2 OR (db.dist2 = da.dist2 AND b.vec_id < a.vec_id)
),
out_dropped AS (
  SELECT vec_id FROM sd
  QUALIFY ROW_NUMBER() OVER (PARTITION BY label
                             ORDER BY dist2 DESC, vec_id) <= {OUTLIER_K}
),
surv AS (
  SELECT vec_id FROM embeddings
  WHERE vec_id NOT IN (SELECT vec_id FROM sem_dropped)
    AND vec_id NOT IN (SELECT vec_id FROM out_dropped)
),
{km},
af AS (
    SELECT vec_id, c FROM (
        SELECT e.vec_id, c.c, SUM((e.v - c.v) * (e.v - c.v)) AS d
        FROM emb e JOIN cent{iters} c USING (dim)
        GROUP BY e.vec_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
)
SELECT af.vec_id, af.c AS cluster
FROM af JOIN surv USING (vec_id)
QUALIFY ROW_NUMBER() OVER (PARTITION BY af.c ORDER BY {h}, af.vec_id)
        <= {cap}
"""


SQL_EMBEDDING_CURATION = _sql_embedding_curation()
