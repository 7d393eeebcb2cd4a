"""Distributed k-means (Lloyd's algorithm) over the embedding column.

The engine's other centroid consumers (`ivf_index_build`, `label_centroids`)
either train on a bounded driver-side sample or aggregate around GIVEN
labels. This module is the missing third piece: training cluster centroids
on the FULL table with the iteration itself distributed — the canonical
"iterative algorithm on Ray Data" shape, and the scale path when a sampled
trainer isn't representative (billions of vectors, rare modes).

Per Lloyd round, over a streaming pass of the embeddings table:

- every block assigns its rows to the nearest centroid by EXACT integer
  arithmetic (embeddings integerized to micros, argmin of int64 dist², ties
  to the smaller cluster id — bit-identical on any partitioning),
- the block emits (cluster, dim) partial sums — k × dim rows per block,
  never embedding rows,
- ONE hash exchange reduces the partials; the driver folds the k × dim
  result into the next centroid matrix via int64 floor division.

Driver state is O(k · dim) per round (the centroid matrix — a few KB),
broadcast back into the next pass's closure. Seeding is the `sample_k`
pattern: the k vectors with the smallest Knuth shuffle hash (exchangeable ⇒
uniform), ordered by (hash, vec_id) so centroid ids are reproducible. Empty
clusters keep their previous centroid and report n = 0.

The SQL oracle unrolls the same `KM_ITERS` rounds as chained CTEs — the
assignment is a dim-join + QUALIFY argmin, the update a GROUP BY with
FLOOR(SUM/COUNT) (exact here: |Σmicros| < 2^53 and quotient gaps ≫ 1 ulp,
while DuckDB's `//` truncates toward zero and would disagree with numpy's
floor division on negative sums).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.ann import _embed_matrix
from ocrautomator_ray.functions.exchange import pruned_read, tune_exchange
from ocrautomator_ray.functions.mix import SHUFFLE_SEED, mix_hash, sql_mix_hash

KM_K = 8
KM_ITERS = 3


def _micros(t: pa.Table) -> np.ndarray:
    """(n, dim) int64 micro-embeddings — same integerization as
    label_centroids, so distributed sums are order-independent. |v| ≲ 1 in
    the tables ⇒ |micros| ≲ 1e6 ⇒ dist² ≤ 64·(2e6)² ≈ 2.6e14 and
    |Σmicros| ≤ n·1e6 — both far inside int64 (and Σ inside double's 2^53,
    which the SQL mirror's FLOOR(SUM/COUNT) relies on)."""
    return np.floor(_embed_matrix(t) * 1e6 + 0.5).astype(np.int64)


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """(k, dim) int64 seed centroids: the k vec_ids with the smallest
    shuffle hash, ordered by (hash, vec_id) — rank = cluster id. Per-batch
    bottom-k prune is lossless (the global bottom-k is a subset of batch
    bottom-ks), so the driver sorts k × blocks rows, never the table."""
    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("h", pa.array([], pa.int64()))
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix_hash(ids, SHUFFLE_SEED)
        if len(ids) > k:
            keep = np.lexsort((ids, h))[:k]
            keep.sort()
            t, h = t.take(pa.array(keep)), h[keep]
        return t.append_column("h", pa.array(h, pa.int64()))

    df = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .sort(key=["h", "vec_id"]).limit(k).to_pandas())
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return np.floor(E * 1e6 + 0.5).astype(np.int64)


_KM_MODEL_ROOT = "/tmp/ocrauto_kmeans_model"


def _model_path(sf_dir: str, name: str) -> str:
    """Persisted-model location for this embeddings table — the shared
    index_fingerprint_dir rule (a changed input never reuses a stale
    model; older fingerprints of the same source are evicted)."""
    import os

    from ocrautomator_ray.functions.exchange import (
        evict_stale_index_dirs,
        index_fingerprint_dir,
    )

    d = index_fingerprint_dir(_KM_MODEL_ROOT,
                              f"{sf_dir}/embeddings.parquet")
    evict_stale_index_dirs(d, _KM_MODEL_ROOT)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def _fit_centroids(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS,
                   checkpoint_dir: str | None = None,
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Run the distributed Lloyd loop; returns the final (k, dim) int64
    micro-centroid matrix and the per-cluster sizes under the last
    assignment. Shared by kmeans_fit (which tabulates it) and the
    assignment consumers (cluster_sample, embedding_curation).

    The trained model PERSISTS beside the other index families
    (fingerprinted to the input): every consumer after the first reuses it
    with zero Lloyd passes — train once, assign many — exactly the
    ivf_index_build centroid discipline.

    ``checkpoint_dir`` makes the ITERATION restartable (state/rounds.py):
    every round commits the (k, dim) centroid matrix atomically — each
    round is a full table pass, the expensive thing a driver death loses —
    and a resumed driver continues from the last committed round."""
    import os

    from ray.data.aggregate import Sum

    from ocrautomator_ray.state.rounds import RoundState, input_fingerprint

    persist = os.environ.get("OCRA_KMEANS_PERSIST", "1") != "0"
    model = _model_path(sf_dir, f"centroids-k{k}-i{iters}.npz")
    if persist and os.path.exists(model):
        with np.load(model) as z:
            return z["C"], z["ns"]

    C = _init_centroids(sf_dir, k)
    dim = C.shape[1]
    ns = np.zeros(k, dtype=np.int64)
    start_round = 0
    rs = None
    if checkpoint_dir is not None:
        rs = RoundState(checkpoint_dir, input_fingerprint(
            f"{sf_dir}/embeddings.parquet", k=k, iters=iters))
        start_round, state = rs.resume()
        if state is not None:
            C, ns = state["C"], state["ns"]
    partial_schema = pa.schema([
        ("cluster", pa.int64()), ("dim", pa.int64()),
        ("sum_micros", pa.int64()), ("n", pa.int64()),
    ])
    clusters = np.repeat(np.arange(k, dtype=np.int64), dim)
    dims = np.tile(np.arange(1, dim + 1, dtype=np.int64), k)

    for rnd in range(start_round, iters):
        def assign_partial(t: pa.Table, C=C) -> pa.Table:
            if t.num_rows == 0:
                return partial_schema.empty_table()
            M = _micros(t)
            # dist² = |m|² − 2m·cᵀ + |c|², all int64 (margins in _micros)
            d = ((M * M).sum(axis=1, keepdims=True) - 2 * (M @ C.T)
                 + (C * C).sum(axis=1))
            a = np.argmin(d, axis=1)  # first occurrence = smaller cluster id
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, M)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(clusters, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "sum_micros": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(counts, dim), pa.int64()),
            })

        ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["embedding"])
        out = ds.map_batches(assign_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        tune_exchange(out)
        agg = (out.groupby(["cluster", "dim"], num_partitions=8)
                  .aggregate(Sum("sum_micros", alias_name="sum_micros"),
                             Sum("n", alias_name="n"))
                  .to_pandas().sort_values(["cluster", "dim"]))
        sums = agg["sum_micros"].to_numpy(dtype=np.int64).reshape(k, dim)
        ns = agg["n"].to_numpy(dtype=np.int64).reshape(k, dim)[:, 0]
        nz = ns > 0
        C = C.copy()
        C[nz] = sums[nz] // ns[nz, None]  # floor division, mirrored in SQL
        if rs is not None:
            rs.commit(rnd, C=C, ns=ns)

    if persist:
        tmp = f"{model}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, C=C, ns=ns)
        os.replace(tmp, model)
    return C, ns


def kmeans_fit(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS,
               checkpoint_dir: str | None = None) -> rd.Dataset:
    """(cluster, dim, centroid_micros, n) after ``iters`` Lloyd rounds.

    ``dim`` is 1-based (generate_subscripts parity), ``centroid_micros`` the
    final micro-int centroid value, ``n`` the cluster's size under the LAST
    assignment (repeated per dim; 0 for an empty cluster, whose centroid
    stays at its previous value). k × dim output rows.
    """
    C, ns = _fit_centroids(sf_dir, k, iters, checkpoint_dir=checkpoint_dir)
    k, dim = C.shape
    clusters = np.repeat(np.arange(k, dtype=np.int64), dim)
    dims = np.tile(np.arange(1, dim + 1, dtype=np.int64), k)
    return rd.from_arrow(pa.table({
        "cluster": pa.array(clusters, pa.int64()),
        "dim": pa.array(dims, pa.int64()),
        "centroid_micros": pa.array(C.reshape(-1), pa.int64()),
        "n": pa.array(np.repeat(ns, dim), pa.int64()),
    }))


def _kmeans_ctes(k: int = KM_K, iters: int = KM_ITERS) -> str:
    """The shared unrolled-Lloyd CTE chain (emb/seeds/cent0, then
    a{{i}}/u{{i}}/cent{{i}} per round) with no final SELECT — consumed by
    both the kmeans_fit mirror and the assignment consumers."""
    h = sql_mix_hash("vec_id", SHUFFLE_SEED)
    parts = [f"""
WITH emb AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
                AS BIGINT) AS v
    FROM embeddings
),
seeds AS (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY {h}, vec_id) - 1 AS c
    FROM (SELECT vec_id FROM embeddings ORDER BY {h}, vec_id LIMIT {k})
),
cent0 AS (
    SELECT s.c, e.dim, e.v FROM seeds s JOIN emb e USING (vec_id)
)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i} AS (
    SELECT vec_id, c FROM (
        SELECT e.vec_id, c.c, SUM((e.v - c.v) * (e.v - c.v)) AS d
        FROM emb e JOIN cent{i - 1} c USING (dim)
        GROUP BY e.vec_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
),
u{i} AS (
    -- FLOOR(double division), NOT //: DuckDB's // truncates toward zero,
    -- numpy's floor division floors — they disagree on negative sums
    SELECT a.c, e.dim,
           CAST(FLOOR(CAST(SUM(e.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v,
           COUNT(*) AS n
    FROM a{i} a JOIN emb e USING (vec_id)
    GROUP BY a.c, e.dim
),
cent{i} AS (
    SELECT p.c, p.dim, COALESCE(u.v, p.v) AS v
    FROM cent{i - 1} p LEFT JOIN u{i} u ON u.c = p.c AND u.dim = p.dim
)""")
    return "".join(parts)


def _sql_kmeans(k: int = KM_K, iters: int = KM_ITERS) -> str:
    """Unrolled Lloyd rounds as chained CTEs, mirroring kmeans_fit exactly."""
    return _kmeans_ctes(k, iters) + f"""
SELECT p.c AS cluster, CAST(p.dim AS BIGINT) AS dim,
       COALESCE(u.v, p.v) AS centroid_micros,
       COALESCE(u.n, 0) AS n
FROM cent{iters - 1} p
LEFT JOIN u{iters} u ON u.c = p.c AND u.dim = p.dim
"""


SQL_KMEANS_FIT = _sql_kmeans()


# ---------------------------------------------------------------------------
# cluster_sample — kmeans-balanced deterministic sampling (diverse coreset):
# train centroids with the SAME distributed Lloyd loop, then one streaming
# pass assigns every vector to its final centroid and keeps at most ``cap``
# per cluster, chosen by shuffle hash (the source_cap kernel keyed on the
# learned cluster instead of a given column). Sampling a fixed budget per
# LEARNED mode keeps rare modes represented where uniform sampling would
# drown them — the standard embedding-diversity selection step.
# ---------------------------------------------------------------------------

CLUSTER_CAP = 25


def cluster_cap_stage(ds: rd.Dataset, C: np.ndarray,
                      cap: int = CLUSTER_CAP) -> rd.Dataset:
    """(vec_id, cluster) keeping the ``cap`` smallest-hash vectors of each
    ``C``-assigned cluster over ANY (vec_id, embedding) dataset. Per-batch
    bottom-cap pre-prune is lossless (a cluster's global bottom-cap is a
    subset of its per-batch bottom-caps), so the one cluster-keyed exchange
    moves at most cap × batches rows. Shared by cluster_sample and the
    embedding-curation pipeline (which feeds it the curated survivors)."""
    from ocrautomator_ray.functions.exchange import per_key_blocks

    out_schema = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64())])

    def assign_and_cap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        if "cluster" in t.column_names:      # post-exchange: cap only
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            a = t["cluster"].to_numpy(zero_copy_only=False)
        else:                                # pre-exchange: assign + cap
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            M = _micros(t)
            d = ((M * M).sum(axis=1, keepdims=True) - 2 * (M @ C.T)
                 + (C * C).sum(axis=1))
            a = np.argmin(d, axis=1).astype(np.int64)
        h = mix_hash(ids, SHUFFLE_SEED)
        order = np.lexsort((ids, h, a))
        a_sorted = a[order]
        starts = np.flatnonzero(np.r_[True, a_sorted[1:] != a_sorted[:-1]])
        run_len = np.diff(np.r_[starts, len(a_sorted)])
        pos = np.arange(len(a_sorted)) - np.repeat(starts, run_len)
        keep = order[pos < cap]
        keep.sort()
        return pa.table({
            "vec_id": pa.array(ids[keep], pa.int64()),
            "cluster": pa.array(a[keep], pa.int64()),
        })

    pruned = ds.map_batches(assign_and_cap, batch_format="pyarrow",
                            zero_copy_batch=True)
    return per_key_blocks(pruned, ["cluster"], assign_and_cap,
                          num_partitions=8)


def cluster_sample(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS,
                   cap: int = CLUSTER_CAP) -> rd.Dataset:
    """cluster_cap_stage over the full embeddings table with centroids
    trained by the distributed Lloyd loop."""
    C, _ = _fit_centroids(sf_dir, k, iters)
    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return cluster_cap_stage(ds, C, cap)


def _sql_cluster_sample(k: int = KM_K, iters: int = KM_ITERS,
                        cap: int = CLUSTER_CAP) -> str:
    h = sql_mix_hash("vec_id", SHUFFLE_SEED)
    return _kmeans_ctes(k, iters) + f""",
af AS (
    SELECT vec_id, c FROM (
        SELECT e.vec_id, c.c, SUM((e.v - c.v) * (e.v - c.v)) AS d
        FROM emb e JOIN cent{iters} c USING (dim)
        GROUP BY e.vec_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
)
SELECT vec_id, c AS cluster FROM af
QUALIFY ROW_NUMBER() OVER (PARTITION BY c ORDER BY {h}, vec_id) <= {cap}
"""


SQL_CLUSTER_SAMPLE = _sql_cluster_sample()


QUERIES = {
    "kmeans_fit": kmeans_fit,
    "cluster_sample": cluster_sample,
}

SQL = {
    "kmeans_fit": SQL_KMEANS_FIT,
    "cluster_sample": SQL_CLUSTER_SAMPLE,
}


# ---------------------------------------------------------------------------
# pq_codes — product quantization (Jégou et al., TPAMI 2011): split the
# embedding into PQ_M contiguous subspaces, train PQ_K sub-centroids per
# subspace with the SAME distributed Lloyd loop, and emit each vector's
# per-subspace code + exact reconstruction error. The codebook compresses a
# 64-dim float vector to PQ_M small codes — the memory tier between int8
# quantization (embedding_quantize) and the raw table, and the codebook
# ANN search (IVF-PQ) builds on exactly this assignment pass.
#
# Distribution shape: the kmeans discipline, fused across subspaces — per
# round ONE streaming pass assigns every row's PQ_M subvectors and emits
# (sub, cluster, dim) partial sums (M·K·dsub = 256 rows per block, never
# vectors); one hash exchange reduces them; the driver folds O(M·K·dsub)
# codebook state. Training is 2 rounds from the shared smallest-hash seed
# vectors, sliced per subspace, so the SQL mirror reuses the seeds CTE.
# Empty sub-clusters carry their previous sub-centroid, ties go to the
# smaller code — bit-identical on any partitioning.
# ---------------------------------------------------------------------------

PQ_M = 8
PQ_K = 16
PQ_ITERS = 2


def _fit_pq(sf_dir: str, m: int = PQ_M, k: int = PQ_K,
            iters: int = PQ_ITERS,
            checkpoint_dir: str | None = None) -> np.ndarray:
    """(m, k, dsub) int64 micro sub-centroid codebook.

    Persists beside the k-means model (same fingerprint rule): PQ encode /
    search consumers after the first reuse the codebook with zero Lloyd
    passes.

    ``checkpoint_dir``: per-round codebook checkpoints (state/rounds.py) —
    a killed driver resumes the fused-subspace Lloyd from its last
    committed round instead of round 0."""
    import os

    from ray.data.aggregate import Sum

    from ocrautomator_ray.state.rounds import RoundState, input_fingerprint

    persist = os.environ.get("OCRA_KMEANS_PERSIST", "1") != "0"
    model = _model_path(sf_dir, f"pq-m{m}-k{k}-i{iters}.npz")
    if persist and os.path.exists(model):
        with np.load(model) as z:
            return z["C"]

    seeds = _init_centroids(sf_dir, k)          # (k, d) int64 micros
    d = seeds.shape[1]
    dsub = d // m
    C = np.ascontiguousarray(
        seeds.reshape(k, m, dsub).transpose(1, 0, 2))   # (m, k, dsub)
    start_round = 0
    rs = None
    if checkpoint_dir is not None:
        rs = RoundState(checkpoint_dir, input_fingerprint(
            f"{sf_dir}/embeddings.parquet", m=m, k=k, iters=iters))
        start_round, state = rs.resume()
        if state is not None:
            C = state["C"]
    partial_schema = pa.schema([
        ("sub", pa.int64()), ("cluster", pa.int64()), ("dim", pa.int64()),
        ("sum_micros", pa.int64()), ("n", pa.int64()),
    ])
    subs = np.repeat(np.arange(m, dtype=np.int64), k * dsub)
    clusters = np.tile(np.repeat(np.arange(k, dtype=np.int64), dsub), m)
    dims = np.tile(np.arange(1, dsub + 1, dtype=np.int64), m * k)

    for rnd in range(start_round, iters):
        def assign_partial(t: pa.Table, C=C) -> pa.Table:
            if t.num_rows == 0:
                return partial_schema.empty_table()
            X = _micros(t).reshape(t.num_rows, m, dsub)
            sums = np.zeros((m, k, dsub), dtype=np.int64)
            counts = np.zeros((m, k), dtype=np.int64)
            for s in range(m):
                Xs, Cs = X[:, s, :], C[s]
                d2 = ((Xs * Xs).sum(axis=1, keepdims=True) - 2 * (Xs @ Cs.T)
                      + (Cs * Cs).sum(axis=1))
                a = np.argmin(d2, axis=1)       # first hit = smaller code
                np.add.at(sums[s], a, Xs)
                counts[s] = np.bincount(a, minlength=k)
            return pa.table({
                "sub": pa.array(subs, pa.int64()),
                "cluster": pa.array(clusters, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "sum_micros": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(counts.reshape(-1), dsub), pa.int64()),
            })

        ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["embedding"])
        out = ds.map_batches(assign_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        tune_exchange(out)
        agg = (out.groupby(["sub", "cluster", "dim"], num_partitions=8)
                  .aggregate(Sum("sum_micros", alias_name="sum_micros"),
                             Sum("n", alias_name="n"))
                  .to_pandas().sort_values(["sub", "cluster", "dim"]))
        sums = agg["sum_micros"].to_numpy(dtype=np.int64).reshape(m, k, dsub)
        ns = agg["n"].to_numpy(dtype=np.int64).reshape(m, k, dsub)[:, :, 0]
        C = C.copy()
        nz = ns > 0
        C[nz] = sums[nz] // ns[nz, None]        # floor division, as in SQL
        if rs is not None:
            rs.commit(rnd, C=C)
    if persist:
        tmp = f"{model}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, C=C)
        os.replace(tmp, model)
    return C


def pq_codes(sf_dir: str, m: int = PQ_M, k: int = PQ_K,
             iters: int = PQ_ITERS,
             checkpoint_dir: str | None = None) -> rd.Dataset:
    """(vec_id, sub, code, err2): each vector's nearest sub-centroid per
    subspace and the exact micro-int squared reconstruction error there —
    m rows per vector."""
    C = _fit_pq(sf_dir, m, k, iters, checkpoint_dir=checkpoint_dir)
    dsub = C.shape[2]
    out_schema = pa.schema([
        ("vec_id", pa.int64()), ("sub", pa.int64()),
        ("code", pa.int64()), ("err2", pa.int64()),
    ])

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t.num_rows
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = _micros(t).reshape(n, m, dsub)
        codes = np.empty((n, m), np.int64)
        errs = np.empty((n, m), np.int64)
        for s in range(m):
            Xs, Cs = X[:, s, :], C[s]
            d2 = ((Xs * Xs).sum(axis=1, keepdims=True) - 2 * (Xs @ Cs.T)
                  + (Cs * Cs).sum(axis=1))
            codes[:, s] = np.argmin(d2, axis=1)
            errs[:, s] = d2[np.arange(n), codes[:, s]]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, m), pa.int64()),
            "sub": pa.array(np.tile(np.arange(m, dtype=np.int64), n),
                            pa.int64()),
            "code": pa.array(codes.reshape(-1), pa.int64()),
            "err2": pa.array(errs.reshape(-1), pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def _pq_ctes(m: int = PQ_M, k: int = PQ_K,
             iters: int = PQ_ITERS, d: int = 64) -> str:
    """The shared per-subspace unrolled Lloyd CTE chain (emb/seeds, then
    cent/a/u per subspace and round, ending at each af_{s} final-assignment
    CTE) with no final SELECT — consumed by the pq_codes mirror and the
    ADC search mirror."""
    h = sql_mix_hash("vec_id", SHUFFLE_SEED)
    dsub = d // m
    parts = [f"""
WITH emb AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
                AS BIGINT) AS v
    FROM embeddings
),
seeds AS (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY {h}, vec_id) - 1 AS c
    FROM (SELECT vec_id FROM embeddings ORDER BY {h}, vec_id LIMIT {k})
)"""]
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        rng = f"dim BETWEEN {lo} AND {hi}"
        parts.append(f""",
cent0_{s} AS (
    SELECT sd.c, e.dim, e.v FROM seeds sd JOIN emb e USING (vec_id)
    WHERE e.{rng}
)""")
        for i in range(1, iters + 1):
            parts.append(f""",
a{i}_{s} AS (
    SELECT vec_id, c FROM (
        SELECT e.vec_id, c.c, SUM((e.v - c.v) * (e.v - c.v)) AS d
        FROM emb e JOIN cent{i - 1}_{s} c USING (dim)
        WHERE e.{rng}
        GROUP BY e.vec_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
),
u{i}_{s} AS (
    SELECT a.c, e.dim,
           CAST(FLOOR(CAST(SUM(e.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
    FROM a{i}_{s} a JOIN emb e USING (vec_id)
    WHERE e.{rng}
    GROUP BY a.c, e.dim
),
cent{i}_{s} AS (
    SELECT p.c, p.dim, COALESCE(u.v, p.v) AS v
    FROM cent{i - 1}_{s} p LEFT JOIN u{i}_{s} u
      ON u.c = p.c AND u.dim = p.dim
)""")
        parts.append(f""",
af_{s} AS (
    SELECT vec_id, c, d FROM (
        SELECT e.vec_id, c.c, SUM((e.v - c.v) * (e.v - c.v)) AS d
        FROM emb e JOIN cent{iters}_{s} c USING (dim)
        WHERE e.{rng}
        GROUP BY e.vec_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
)""")
    return "".join(parts)


def _sql_pq_codes(m: int = PQ_M, k: int = PQ_K,
                  iters: int = PQ_ITERS, d: int = 64) -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s} AS sub, c AS code, CAST(d AS BIGINT) AS err2 "
        f"FROM af_{s}" for s in range(m))
    return _pq_ctes(m, k, iters, d) + "\n" + sel + "\n"


SQL_PQ_CODES = _sql_pq_codes()


QUERIES["pq_codes"] = pq_codes
SQL["pq_codes"] = SQL_PQ_CODES


# ---------------------------------------------------------------------------
# pq_ann_topk — asymmetric-distance (ADC) approximate nearest neighbors over
# the PQ codebook: the query vector stays exact, every database vector is
# replaced by its per-subspace sub-centroid, and the approximate distance is
# a table lookup sum adist² = Σ_s dist²(q_s, C_s[code_s(x)]). This is the
# search half of IVF-PQ — and unlike the float LSH/IVF paths it is
# all-integer, so it carries a full SQL value oracle, not a recall bound.
#
# Distribution shape: codebook + M×K lookup table built once (bounded driver
# state, broadcast in the closure); ONE streaming pass assigns codes and
# looks up adist², pruned per batch to a lossless bottom-k by
# (adist², vec_id); one tiny qid-keyed exchange ranks the k × blocks
# survivors. The scan never moves embeddings — at corpus scale the
# assignment pass reads the persisted codes instead (pq_codes' output
# through the resumable sink), same arithmetic.
# ---------------------------------------------------------------------------

PQ_ANN_K = 10
PQ_QUERY_VEC = 0


def pq_ann_topk(sf_dir: str, k_top: int = PQ_ANN_K,
                m: int = PQ_M, k: int = PQ_K,
                iters: int = PQ_ITERS) -> rd.Dataset:
    """(qid, vec_id, adist2, rank): the PQ-ADC approximate top-k for the
    query vector PQ_QUERY_VEC, ranked by (adist2, vec_id), self excluded."""
    import pyarrow.parquet as pqt

    C = _fit_pq(sf_dir, m, k, iters)
    dsub = C.shape[2]
    qt = pqt.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "=", PQ_QUERY_VEC)])
    q = np.floor(np.asarray(qt["embedding"][0].as_py(), dtype=np.float64)
                 * 1e6 + 0.5).astype(np.int64).reshape(m, dsub)
    lut = ((C - q[:, None, :]) ** 2).sum(axis=2)      # (m, k) int64
    out_schema = pa.schema([
        ("qid", pa.int64()), ("vec_id", pa.int64()), ("adist2", pa.int64()),
    ])

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t.num_rows
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = _micros(t).reshape(n, m, dsub)
        adist = np.zeros(n, np.int64)
        for s in range(m):
            Xs, Cs = X[:, s, :], C[s]
            d2 = ((Xs * Xs).sum(axis=1, keepdims=True) - 2 * (Xs @ Cs.T)
                  + (Cs * Cs).sum(axis=1))
            adist += lut[s][np.argmin(d2, axis=1)]
        keep = ids != PQ_QUERY_VEC
        ids, adist = ids[keep], adist[keep]
        if len(ids) > k_top:                  # lossless batch-local prune
            sel = np.lexsort((ids, adist))[:k_top]
            ids, adist = ids[sel], adist[sel]
        return pa.table({
            "qid": pa.array(np.full(len(ids), PQ_QUERY_VEC, np.int64),
                            pa.int64()),
            "vec_id": pa.array(ids, pa.int64()),
            "adist2": pa.array(adist, pa.int64()),
        })

    def final(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = g.take(pc.sort_indices(g, sort_keys=[
            ("adist2", "ascending"), ("vec_id", "ascending")])).slice(0, k_top)
        return pa.table({
            "qid": s["qid"], "vec_id": s["vec_id"], "adist2": s["adist2"],
            "rank": pa.array(np.arange(1, s.num_rows + 1, dtype=np.int64),
                             pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return (ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
              .groupby("qid", num_partitions=1)
              .map_groups(final, batch_format="pyarrow"))


def _sql_pq_ann(k_top: int = PQ_ANN_K, m: int = PQ_M, k: int = PQ_K,
                iters: int = PQ_ITERS, d: int = 64) -> str:
    dsub = d // m
    luts = ",\n".join(f"""
lut_{s} AS (
    SELECT c.c, SUM((q.v - c.v) * (q.v - c.v)) AS d
    FROM cent{iters}_{s} c
    JOIN emb q ON q.dim = c.dim AND q.vec_id = {PQ_QUERY_VEC}
    WHERE q.dim BETWEEN {s * dsub + 1} AND {(s + 1) * dsub}
    GROUP BY c.c
)""" for s in range(m))
    pairs = "\nUNION ALL\n".join(
        f"SELECT a.vec_id, l.d FROM af_{s} a JOIN lut_{s} l ON a.c = l.c"
        for s in range(m))
    return _pq_ctes(m, k, iters, d) + f""",
{luts},
adist AS (
    SELECT vec_id, SUM(d) AS adist2 FROM ({pairs}) GROUP BY vec_id
)
SELECT CAST({PQ_QUERY_VEC} AS BIGINT) AS qid, vec_id,
       CAST(adist2 AS BIGINT) AS adist2,
       CAST(ROW_NUMBER() OVER (ORDER BY adist2, vec_id) AS BIGINT) AS rank
FROM adist WHERE vec_id != {PQ_QUERY_VEC}
ORDER BY adist2, vec_id LIMIT {k_top}
"""


SQL_PQ_ANN_TOPK = _sql_pq_ann()


QUERIES["pq_ann_topk"] = pq_ann_topk
SQL["pq_ann_topk"] = SQL_PQ_ANN_TOPK
