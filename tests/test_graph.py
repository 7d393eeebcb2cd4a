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
def test_mutual_pairs_are_reciprocal_edges(edges):
    src, dst = edges
    directed = set(zip(src.tolist(), dst.tolist()))
    exp = {(min(a, b), max(a, b)) for a, b in directed
           if (b, a) in directed}
    df = G.mutual_knn_pairs(SF).to_pandas()
    got = set(zip(df["vec_a"].tolist(), df["vec_b"].tolist()))
    assert got == exp
    assert (df["vec_a"] < df["vec_b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_components_match_union_find():
    pairs = G.mutual_knn_pairs(SF).to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        parent[find(int(a))] = find(int(b))
    roots = {n: find(n) for n in parent}
    mins: dict[int, int] = {}
    for n, r in roots.items():
        mins[r] = min(mins.get(r, n), n)
    exp = {n: mins[r] for n, r in roots.items()}
    df = G.knn_components(SF).to_pandas()
    got = dict(zip(df["vec_id"].tolist(), df["cluster_id"].tolist()))
    assert got == exp


@pytest.mark.usefixtures("ray_session")
def test_components_checkpoint_roundtrip(tmp_path):
    """knn_components with a checkpoint dir matches the uncheckpointed run,
    commits one meta marker per executed round, and a rerun over the same
    input resumes from the committed rounds instead of restarting."""
    import glob
    import os

    base = G.knn_components(SF).to_pandas().sort_values("vec_id")
    ckpt = str(tmp_path / "prop")
    a = G.knn_components(SF, checkpoint_dir=ckpt).to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(a.to_numpy(), base.to_numpy())
    metas = sorted(glob.glob(os.path.join(ckpt, "round-*.json")))
    assert metas, "no committed propagation rounds"
    mtimes = [os.path.getmtime(m) for m in metas]
    b = G.knn_components(SF, checkpoint_dir=ckpt).to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(b.to_numpy(), base.to_numpy())
    # converged marker present ⇒ the rerun re-executed NO rounds
    assert [os.path.getmtime(m) for m in metas] == mtimes
    assert sorted(glob.glob(os.path.join(ckpt, "round-*.json"))) == metas


@pytest.mark.usefixtures("ray_session")
def test_value_rank_pipeline_ordered_and_resumable(tmp_path):
    """The committed export is a dense 0..n-1 pos sequence ordered by
    (data_value DESC, doc_id), and an immediate rerun is a full-resume noop
    that reproduces the identical table."""
    from ocrautomator_ray.pipelines.extract import read_output
    from ocrautomator_ray.pipelines.value_rank import run_value_rank

    out = str(tmp_path / "vr")
    res1 = run_value_rank(SF, out, num_partitions=4)
    df = read_output(out).to_pandas().sort_values("pos").reset_index(drop=True)
    assert df["pos"].tolist() == list(range(len(df)))
    v = df["data_value"].to_numpy()
    assert (v[:-1] >= v[1:]).all()
    ties = v[:-1] == v[1:]
    assert (df["doc_id"].to_numpy()[:-1][ties]
            < df["doc_id"].to_numpy()[1:][ties]).all()
    res2 = run_value_rank(SF, out, num_partitions=4)
    assert res2["partitions_this_run"] == 0, res2
    df2 = read_output(out).to_pandas().sort_values("pos").reset_index(drop=True)
    assert df.equals(df2)
    assert res1["partitions_committed_total"] == res2["partitions_committed_total"]


@pytest.mark.usefixtures("ray_session")
def test_pagerank_deterministic():
    a = G.knn_pagerank(SF).to_pandas().sort_values("vec_id")
    b = G.knn_pagerank(SF).to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(a["pr_micros"].to_numpy(),
                                  b["pr_micros"].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_markov_stationary_conserves_mass_and_converges():
    # floor division leaks at most one micro per edge per round; the total
    # mass must stay within that bound of T x MS_SCALE, and two runs agree
    df = G.markov_stationary(SF).to_pandas()
    df2 = G.markov_stationary(SF).to_pandas()
    assert df.sort_values("event_type").equals(df2.sort_values("event_type"))
    from ocrautomator_ray.functions.relational3 import event_transitions
    tr = event_transitions(SF).to_pandas()
    T = len(set(tr["from_type"]) | set(tr["to_type"]))
    total = int(df["stat_micros"].sum())
    leak_bound = len(tr) * G.MS_ITERS
    assert T * G.MS_SCALE - leak_bound <= total <= T * G.MS_SCALE
    assert (df["stat_micros"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_markov_stationary_matches_float_chain():
    # the fixed-point iterate tracks the float power iteration to ~1e-4
    from ocrautomator_ray.functions.relational3 import event_transitions
    tr = event_transitions(SF).to_pandas()
    types = sorted(set(tr["from_type"]) | set(tr["to_type"]))
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((len(types), len(types)))
    for f, t, n in tr[["from_type", "to_type", "n"]].itertuples(index=False):
        P[idx[f], idx[t]] = n
    P /= P.sum(axis=1, keepdims=True)
    x = np.full(len(types), 1.0)
    for _ in range(G.MS_ITERS):
        x = x @ P
    got = G.markov_stationary(SF).to_pandas().set_index("event_type")
    got = got.loc[types, "stat_micros"].to_numpy() / G.MS_SCALE
    np.testing.assert_allclose(got, x, atol=1e-3)
