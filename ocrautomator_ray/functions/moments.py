"""Cross-dimension moment matrix over the embedding column (PCA prep).

``label_dispersion`` (functions/ann.py) gives per-(label, dim) second
moments; this module adds the CROSS-dim Gram/covariance numerators the
whitening / PCA step of an embedding-curation pipeline needs: for every
dim pair (i ≤ j), exact integer n, Σvᵢ, Σvⱼ and Σvᵢvⱼ over the whole
table. The consumer forms covariance as (n·Σvᵢvⱼ − Σvᵢ·Σvⱼ) — kept as raw
moments here because that numerator can exceed int64 while each moment
cannot (see bound below), and raw moments stay mergeable across shards.

Shape: ONE streaming pass; each block computes its MᵀM int64 matmul and
column sums and emits d(d+1)/2 partial rows (2,080 at d = 64) — never
vectors; one tiny (di, dj)-keyed exchange reduces the partials. Driver
state is zero; the result is O(d²) regardless of corpus size.

Overflow bound: |micros| ≲ 1e6 ⇒ each product ≲ 1e12, so the global Σ
stays inside int64 up to ~9e6 table rows — 2 orders above every tested
scale. At 10^12-doc scale the partial widens to a two-int64 (hi, lo) pair
reduced by the same exchange; the SQL mirror already sums in HUGEINT.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ocrautomator_ray.functions.exchange import pruned_read, tune_exchange
from ocrautomator_ray.functions.kmeans import _micros

_OUT_SCHEMA = pa.schema([
    ("di", pa.int64()), ("dj", pa.int64()), ("n", pa.int64()),
    ("sum_i", pa.int64()), ("sum_j", pa.int64()), ("sum_prod", pa.int64()),
])


def embedding_covariance(sf_dir: str) -> rd.Dataset:
    """(di, dj, n, sum_i, sum_j, sum_prod) for 1-based dim pairs di ≤ dj:
    the exact micro-int moment matrix of the embedding column."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        M = _micros(t)                       # (n, d) int64
        d = M.shape[1]
        iu, ju = np.triu_indices(d)
        P = M.T @ M                          # (d, d) int64 Gram partial
        s = M.sum(axis=0)                    # (d,) int64 column sums
        n = np.int64(t.num_rows)
        return pa.table({
            "di": pa.array(iu + 1, pa.int64()),
            "dj": pa.array(ju + 1, pa.int64()),
            "n": pa.array(np.full(len(iu), n), pa.int64()),
            "sum_i": pa.array(s[iu], pa.int64()),
            "sum_j": pa.array(s[ju], pa.int64()),
            "sum_prod": pa.array(P[iu, ju], pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["embedding"])
    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    tune_exchange(out)
    return (out.groupby(["di", "dj"], num_partitions=8)
               .aggregate(Sum("n", alias_name="n"),
                          Sum("sum_i", alias_name="sum_i"),
                          Sum("sum_j", alias_name="sum_j"),
                          Sum("sum_prod", alias_name="sum_prod")))


SQL_EMBEDDING_COVARIANCE = """
WITH emb AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
                AS BIGINT) AS v
    FROM embeddings
)
SELECT CAST(a.dim AS BIGINT) AS di, CAST(b.dim AS BIGINT) AS dj,
       COUNT(*) AS n,
       CAST(SUM(a.v) AS BIGINT) AS sum_i,
       CAST(SUM(b.v) AS BIGINT) AS sum_j,
       CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS BIGINT) AS sum_prod
FROM emb a JOIN emb b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim
"""


QUERIES = {
    "embedding_covariance": embedding_covariance,
}

SQL = {
    "embedding_covariance": SQL_EMBEDDING_COVARIANCE,
}
