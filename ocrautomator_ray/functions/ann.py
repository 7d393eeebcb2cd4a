"""Similarity search over the embeddings table: brute-force cosine top-k
(baseline) and an LSH-bucketed approximate variant (the scale path).

Brute force: the query matrix is broadcast once (ray.put); every batch does
one float64 matmul against it and emits batch-local top-k candidate rows
(partial top-k — the combiner), then a small groupby(query) selects the global
top-k. The shuffle moves only num_queries × k rows per batch, never the
embedding table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

ANN_NUM_QUERIES = 10
ANN_K = 5


def _load_queries(sf_dir: str, num_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=(pc.field("vec_id") < num_queries),
    )
    t = ds.to_pandas().sort_values("vec_id")
    qids = t["vec_id"].to_numpy(dtype=np.int64)
    Q = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    return qids, Q / np.linalg.norm(Q, axis=1, keepdims=True)


def ann_topk(sf_dir: str, num_queries: int = ANN_NUM_QUERIES, k: int = ANN_K) -> rd.Dataset:
    """Exact cosine top-k neighbors for the first `num_queries` vec_ids.

    Output: (qid, vec_id, rank) with rank 1..k ordered by (cos desc, vec_id).
    Self-matches excluded. Ties broken by vec_id so the set is deterministic.
    """
    import ray

    qids, Qn = _load_queries(sf_dir, num_queries)
    ref = ray.put((qids, Qn))

    def partial_topk(t: pa.Table) -> pa.Table:
        q_ids, Q = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = Q @ En.T  # (num_queries, batch)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            s = sims[qi]
            mask = ids != qid
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
                # batch-local top-k with (−sim, vec_id) tie-break
                order = np.lexsort((cand_ids, -cand_s))[:k]
            else:
                order = np.lexsort((cand_ids, -cand_s))
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(cand_s[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({
            "qid": g["qid"].values,
            "vec_id": g["vec_id"].values,
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(final_topk, batch_format="pandas")
    )


SQL_ANN_TOPK = f"""
WITH q AS (
    SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
),
s AS (
    SELECT q.qid, e.vec_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.qid
)
SELECT qid, vec_id, rank FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
    FROM s
) WHERE rank <= {ANN_K}
"""


# ---------------------------------------------------------------------------
# lsh_ann_topk — approximate variant: sign-LSH bucketed probe (the scale path)
# ---------------------------------------------------------------------------

LSH_PLANES = 6  # 2^6 buckets; multi-probe out to hamming-2 neighbors


def lsh_ann_topk(sf_dir: str, num_queries: int = ANN_NUM_QUERIES, k: int = ANN_K) -> rd.Dataset:
    """Approximate top-k: random-hyperplane LSH buckets, multi-probe search.

    Each embedding row gets a bucket id = sign bits of R·v (R seeded, shared).
    A query probes its own bucket plus all hamming-1 buckets. Recall < 1 by
    design; pytest pins recall ≥ 0.6 vs the exact baseline at test scale.
    Output: (qid, vec_id, rank) among probed candidates.
    """
    import ray

    qids, Qn = _load_queries(sf_dir, num_queries)
    dim = Qn.shape[1]
    R = np.random.default_rng(0x5EED).standard_normal((LSH_PLANES, dim))
    q_buckets = (Qn @ R.T > 0) @ (1 << np.arange(LSH_PLANES))
    probe_sets = []
    for b in q_buckets:
        probes = {int(b)}
        for p in range(LSH_PLANES):          # hamming-1 …
            probes.add(int(b) ^ (1 << p))
            for p2 in range(p + 1, LSH_PLANES):  # … and hamming-2 probes
                probes.add(int(b) ^ (1 << p) ^ (1 << p2))
        probe_sets.append(probes)
    ref = ray.put((qids, Qn, R, probe_sets))

    def partial_topk(t: pa.Table) -> pa.Table:
        q_ids, Q, R_, probes = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        buckets = (En @ R_.T > 0) @ (1 << np.arange(LSH_PLANES))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            mask = np.fromiter((int(b) in probes[qi] for b in buckets),
                               dtype=bool, count=len(buckets))
            mask &= ids != qid
            if not mask.any():
                continue
            cand_ids, cand_E = ids[mask], En[mask]
            s = Q[qi] @ cand_E.T
            order = np.lexsort((cand_ids, -s))[:k]
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({
            "qid": g["qid"].values,
            "vec_id": g["vec_id"].values,
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(final_topk, batch_format="pandas")
    )


QUERIES = {
    "ann_topk": ann_topk,
    "lsh_ann_topk": lsh_ann_topk,
}

SQL = {
    "ann_topk": SQL_ANN_TOPK,
}
