"""Graph centrality over the document-similarity graph: integer PageRank
on the exact within-label k-NN graph (functions/ann.py::knn_graph).

Why it belongs in a training-data engine: PageRank over a similarity graph
is the standard "representativeness" signal for graph-based data valuation
— high-rank vectors sit in dense, well-connected neighborhoods (keep),
low-rank ones are peripheral (candidates for down-weighting) — and it is
the canonical ITERATIVE graph algorithm on Ray Data, complementing the
engine's other iterative trainers (kmeans_fit, bpe_train_merges).

Per iteration (Brin & Page 1998, damping 0.85), everything in EXACT
integer fixed-point (micros, ×1e6) so distributed sums are
order-independent and the SQL mirror hash-matches:

    contrib(u→v) = (r_t(u) · 85) // (outdeg(u) · 100)     (floor, ints > 0)
    r_{t+1}(v)   = 150_000 + Σ_{u→v} contrib(u)

Distributed shape: the edge list and node/out-degree table are built once
from the knn_graph exchange and MATERIALIZED (edge rows are 2 ints ×
n·k — the bounded iteration state every distributed PageRank carries);
each round is then two hash exchanges — (1) ranks meet their out-edges on
``node`` and emit per-edge contributions keyed by destination, (2)
contributions + one base row per node reduce to the next rank vector.
Ranks are re-materialized per round so round t+1 consumes t's blocks
instead of replaying the lazy chain from round 0. Driver state is O(1);
no driver-side collection anywhere.

This variant does not renormalize dangling mass: the k-NN graph has no
dangling nodes (every non-singleton-label vector emits ≥1 edge, and nodes
⊆ sources by construction), which the SQL mirror reproduces exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.ann import SQL_KNN_GRAPH, knn_graph
from ocrautomator_ray.functions.exchange import per_key_blocks

PR_ITERS = 3
PR_SCALE = 1_000_000          # rank fixed-point: 1.0 == 1e6 micros
PR_DAMP_NUM = 85              # damping 0.85 as an exact rational
PR_DAMP_DEN = 100
PR_TELEPORT = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # 150000

_UNION_SCHEMA = pa.schema([
    ("node", pa.int64()), ("dst", pa.int64()),
    ("r", pa.int64()), ("outdeg", pa.int64()), ("is_rank", pa.int64()),
])
_CONTRIB_SCHEMA = pa.schema([
    ("node", pa.int64()), ("c", pa.int64()), ("outdeg", pa.int64()),
])
_RANK_SCHEMA = pa.schema([
    ("node", pa.int64()), ("r", pa.int64()), ("outdeg", pa.int64()),
])


def _contrib_block(t: pa.Table) -> pa.Table:
    """One partition of the (edges ∪ ranks) union: every edge row finds its
    source's rank row (same ``node`` hash key ⇒ same block) and emits
    (dst, contribution). Rank lookup is one searchsorted, no Python loop."""
    if t.num_rows == 0:
        return _CONTRIB_SCHEMA.empty_table()
    node = t["node"].to_numpy(zero_copy_only=False)
    is_rank = t["is_rank"].to_numpy(zero_copy_only=False).astype(bool)
    rn = node[is_rank]
    order = np.argsort(rn, kind="stable")
    rn = rn[order]
    rv = t["r"].to_numpy(zero_copy_only=False)[is_rank][order]
    rd_ = t["outdeg"].to_numpy(zero_copy_only=False)[is_rank][order]
    en = node[~is_rank]
    if len(en) == 0:
        return _CONTRIB_SCHEMA.empty_table()
    dst = t["dst"].to_numpy(zero_copy_only=False)[~is_rank]
    idx = np.searchsorted(rn, en)
    c = (rv[idx] * PR_DAMP_NUM) // (rd_[idx] * PR_DAMP_DEN)
    return pa.table({
        "node": pa.array(dst, pa.int64()),
        "c": pa.array(c, pa.int64()),
        "outdeg": pa.array(np.zeros(len(dst), np.int64), pa.int64()),
    })


def _update_block(t: pa.Table) -> pa.Table:
    """Contributions + one base row per node → next rank vector. The base
    row contributes c = 0 and carries the node's out-degree (max over the
    group recovers it; contribution rows carry 0)."""
    if t.num_rows == 0:
        return _RANK_SCHEMA.empty_table()
    node = t["node"].to_numpy(zero_copy_only=False)
    c = t["c"].to_numpy(zero_copy_only=False)
    deg = t["outdeg"].to_numpy(zero_copy_only=False)
    order = np.argsort(node, kind="stable")
    node, c, deg = node[order], c[order], deg[order]
    starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
    sums = np.add.reduceat(c, starts)
    degs = np.maximum.reduceat(deg, starts)
    return pa.table({
        "node": pa.array(node[starts], pa.int64()),
        "r": pa.array(PR_TELEPORT + sums, pa.int64()),
        "outdeg": pa.array(degs, pa.int64()),
    })


def knn_pagerank(sf_dir: str, iters: int = PR_ITERS) -> rd.Dataset:
    """(vec_id, pr_micros): PageRank of each vector in the within-label
    k-NN graph after ``iters`` damped power iterations, in exact micros."""
    edges = knn_graph(sf_dir).map_batches(
        lambda t: pa.table({
            "node": t["vec_id"].cast(pa.int64()),
            "dst": t["nbr_id"].cast(pa.int64()),
            "r": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "outdeg": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "is_rank": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def degree_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _RANK_SCHEMA.empty_table()
        node = np.sort(t["node"].to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        deg = np.diff(np.r_[starts, len(node)])
        return pa.table({
            "node": pa.array(node[starts], pa.int64()),
            "r": pa.array(np.full(len(starts), PR_SCALE), pa.int64()),
            "outdeg": pa.array(deg, pa.int64()),
        })

    # nodes = distinct sources with out-degree; doubles as r_0 (rank = 1.0)
    ranks = per_key_blocks(edges, ["node"], degree_block,
                           num_partitions=8).materialize()
    base = ranks.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "c": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "outdeg": t["outdeg"],
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    for _ in range(iters):
        tagged = ranks.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "dst": pa.array(np.full(t.num_rows, -1, np.int64)),
                "r": t["r"],
                "outdeg": t["outdeg"],
                "is_rank": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        contribs = per_key_blocks(edges.union(tagged), ["node"],
                                  _contrib_block, num_partitions=8)
        ranks = per_key_blocks(contribs.union(base), ["node"],
                               _update_block, num_partitions=8).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"vec_id": t["node"], "pr_micros": t["r"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _sql_pagerank(iters: int = PR_ITERS) -> str:
    """Unrolled damped power iterations over the knn_graph CTE — the same
    floor-division contribution formula, teleport constant and no-dangling
    assumption as the engine."""
    parts = [f"""
WITH knn AS ({SQL_KNN_GRAPH}),
edges AS (SELECT vec_id AS src, nbr_id AS dst FROM knn),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
c{i} AS (
    SELECT e.dst AS node,
           SUM((r.r * {PR_DAMP_NUM}) // (g.outdeg * {PR_DAMP_DEN})) AS s
    FROM edges e
    JOIN r{i - 1} r ON r.node = e.src
    JOIN deg g ON g.node = e.src
    GROUP BY e.dst
),
r{i} AS (
    SELECT d.node, CAST({PR_TELEPORT} + COALESCE(c.s, 0) AS BIGINT) AS r
    FROM deg d LEFT JOIN c{i} c USING (node)
)""")
    parts.append(f"""
SELECT node AS vec_id, r AS pr_micros FROM r{iters}
""")
    return "".join(parts)


SQL_KNN_PAGERANK = _sql_pagerank()


QUERIES = {
    "knn_pagerank": knn_pagerank,
}

SQL = {
    "knn_pagerank": SQL_KNN_PAGERANK,
}
