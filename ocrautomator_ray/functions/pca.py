"""Top-principal-component projection by integer fixed-point power iteration.

``embedding_covariance`` (functions/moments.py) produces the exact O(d²)
moment matrix; this module CONSUMES it: the dominant eigenvector of the
covariance numerator matrix is extracted driver-side by power iteration in
exact integer arithmetic, then one streaming pass scores every vector by its
centered projection onto that component — the first step of PCA whitening /
spectral outlier screening over an embedding-curation corpus.

Shape at scale: TWO distributed passes total — the covariance exchange
(d(d+1)/2 partial rows per block, one tiny (di, dj)-keyed reduce) and an
embarrassingly-parallel projection map (no exchange at all). The power
iteration itself touches only the d×d matrix (64×64 here): O(d²·iters)
driver arithmetic on Python ints, independent of corpus size — the same
bounded-driver-state discipline as kmeans' O(k·dim) fold.

Exactness: every step is integer and therefore bit-identical on any
partitioning and any engine —

- covariance numerators A[i][j] = n·Σvᵢvⱼ − Σvᵢ·Σvⱼ can exceed int64, so
  the driver holds them as Python ints (the SQL mirror sums in HUGEINT);
- A is pre-shrunk by g = max|A| // SCALE + 1 (truncating division toward
  zero on both engines — see ``_tdiv``) so the per-round mat-vec stays
  inside 64·SCALE² ≈ 6.4e13;
- each round rescales by the max-abs component instead of the Euclidean
  norm: v ← tdiv(w·SCALE, max|w|) — no square root, no floats;
- the projection centers on the floor-division per-dim mean μ = ⌊S/n⌋,
  bounding every per-row term by 2·SCALE² regardless of n.

Power iteration converges to the dominant eigendirection because the
covariance matrix is PSD (no sign flipping); 4 rounds from the all-ones
start give a stable fixed-point direction that both engines reproduce
digit-for-digit, which is all the equality gate needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read
from ocrautomator_ray.functions.kmeans import _micros
from ocrautomator_ray.functions.moments import embedding_covariance

PCA_ITERS = 4
PCA_SCALE = 1_000_000


def _tdiv(x: int, y: int) -> int:
    """sign(x)·(|x| // y) — division truncated toward zero, y > 0. Python's
    ``//`` floors while DuckDB's ``//`` truncates; routing both through the
    positive case makes them agree for every sign."""
    q = abs(x) // y
    return -q if x < 0 else q


def _power_component(sf_dir: str,
                     iters: int = PCA_ITERS) -> tuple[np.ndarray, np.ndarray]:
    """(component v, per-dim floor-mean μ), both int64 micro vectors, from
    one distributed covariance exchange + exact-integer driver iteration."""
    rows = embedding_covariance(sf_dir).to_pandas()
    d = int(rows["dj"].max())
    A: list[list[int]] = [[0] * d for _ in range(d)]
    S = [0] * d
    n = 1
    for di, dj, nn, si, sj, sp in rows[
            ["di", "dj", "n", "sum_i", "sum_j", "sum_prod"]].itertuples(
            index=False):
        a = int(nn) * int(sp) - int(si) * int(sj)   # Python int: no overflow
        A[di - 1][dj - 1] = a
        A[dj - 1][di - 1] = a
        if di == dj:
            S[di - 1] = int(si)
            n = int(nn)
    g = max((abs(x) for r in A for x in r), default=0) // PCA_SCALE + 1
    A = [[_tdiv(x, g) for x in r] for r in A]
    v = [PCA_SCALE] * d
    for _ in range(iters):
        w = [sum(A[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(max(abs(x) for x in w), 1)
        v = [_tdiv(x * PCA_SCALE, mx) for x in w]
    mu = [s // n for s in S]   # exact floor division on non-wrapping ints
    return np.array(v, np.int64), np.array(mu, np.int64)


def pca_project(sf_dir: str, iters: int = PCA_ITERS) -> rd.Dataset:
    """(vec_id, pc_score): each vector's centered projection onto the
    dominant covariance eigendirection, pc_score = Σⱼ (vⱼ − μⱼ)·cⱼ in exact
    micro-int arithmetic (|term| ≤ 2·SCALE², Σ ≤ d·2·SCALE² ≈ 1.3e14 —
    int64-safe at ANY corpus size because centering removed the n factor)."""
    comp, mu = _power_component(sf_dir, iters)
    out_schema = pa.schema([("vec_id", pa.int64()), ("pc_score", pa.int64())])

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        M = _micros(t)
        score = (M - mu) @ comp
        return pa.table({"vec_id": t["vec_id"].cast(pa.int64()),
                         "pc_score": pa.array(score, pa.int64())})

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def _sql_pca_project(iters: int = PCA_ITERS) -> str:
    """Unrolled power-iteration mirror: full covariance matrix in HUGEINT,
    truncating divisions via the sign-split CASE, floor-division mean."""
    s = PCA_SCALE
    parts = [f"""
WITH emb AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
                AS BIGINT) AS v
    FROM embeddings
),
cov AS (
    SELECT a.dim AS di, b.dim AS dj,
           CAST(COUNT(*) AS HUGEINT) * SUM(CAST(a.v AS HUGEINT) * b.v)
             - CAST(SUM(a.v) AS HUGEINT) * SUM(b.v) AS a
    FROM emb a JOIN emb b USING (vec_id)
    GROUP BY a.dim, b.dim
),
gdiv AS (SELECT MAX(ABS(a)) // {s} + 1 AS g FROM cov),
a0 AS (
    SELECT di, dj,
           CASE WHEN a < 0 THEN -((-a) // g) ELSE a // g END AS a
    FROM cov, gdiv
),
v0 AS (SELECT DISTINCT dim, CAST({s} AS HUGEINT) AS v FROM emb)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
w{i} AS (
    SELECT a.di AS dim, SUM(a.a * v.v) AS w
    FROM a0 a JOIN v{i - 1} v ON a.dj = v.dim GROUP BY a.di
),
m{i} AS (SELECT GREATEST(MAX(ABS(w)), 1) AS m FROM w{i}),
v{i} AS (
    SELECT dim, CASE WHEN w < 0 THEN -((-w) * {s} // m)
                     ELSE w * {s} // m END AS v
    FROM w{i}, m{i}
)""")
    parts.append(f""",
mu AS (
    SELECT dim, CASE WHEN SUM(v) < 0
                     THEN -((-SUM(v) + COUNT(*) - 1) // COUNT(*))
                     ELSE SUM(v) // COUNT(*) END AS mu
    FROM emb GROUP BY dim
)
SELECT e.vec_id,
       CAST(SUM((e.v - mu.mu) * c.v) AS BIGINT) AS pc_score
FROM emb e JOIN mu USING (dim) JOIN v{iters} c ON c.dim = e.dim
GROUP BY e.vec_id
""")
    return "".join(parts)


SQL_PCA_PROJECT = _sql_pca_project()


QUERIES = {
    "pca_project": pca_project,
}

SQL = {
    "pca_project": SQL_PCA_PROJECT,
}
