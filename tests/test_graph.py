"""Serial oracle for the distributed integer PageRank
(functions/graph.py::knn_pagerank). The SQL mirror in __ray_entry__ is the
primary gate; this pins the iteration semantics against an independent
single-process run over the same edge list, plus determinism and the
teleport lower bound SQL equality can't isolate."""

import numpy as np
import pytest

from ocrautomator_ray.functions import graph as G
from ocrautomator_ray.functions.ann import knn_graph

SF = "/root/testdata/sf0.001"


def _serial_pagerank(src, dst, iters):
    """Single-process mirror of knn_pagerank: integer fixed-point damped
    power iteration with floor-division contributions."""
    nodes = np.unique(src)
    idx = {int(n): i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes), dtype=np.int64)
    for s in src:
        deg[idx[int(s)]] += 1
    r = np.full(len(nodes), G.PR_SCALE, dtype=np.int64)
    for _ in range(iters):
        nxt = np.full(len(nodes), G.PR_TELEPORT, dtype=np.int64)
        for s, d in zip(src, dst):
            si = idx[int(s)]
            nxt[idx[int(d)]] += (r[si] * G.PR_DAMP_NUM) // (
                deg[si] * G.PR_DAMP_DEN)
        r = nxt
    return dict(zip(nodes.tolist(), r.tolist()))


@pytest.fixture(scope="module")
def edges():
    df = knn_graph(SF).to_pandas()
    return (df["vec_id"].to_numpy(dtype=np.int64),
            df["nbr_id"].to_numpy(dtype=np.int64))


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_serial(edges):
    src, dst = edges
    exp = _serial_pagerank(src, dst, G.PR_ITERS)
    df = G.knn_pagerank(SF).to_pandas()
    got = dict(zip(df["vec_id"].tolist(), df["pr_micros"].tolist()))
    assert got == exp
    # node set = every vector with out-edges; rank never below teleport
    assert set(got) == set(np.unique(src).tolist())
    assert min(got.values()) >= G.PR_TELEPORT


@pytest.mark.usefixtures("ray_session")
def test_pagerank_deterministic():
    a = G.knn_pagerank(SF).to_pandas().sort_values("vec_id")
    b = G.knn_pagerank(SF).to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(a["pr_micros"].to_numpy(),
                                  b["pr_micros"].to_numpy())
