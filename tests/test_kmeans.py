"""Pure-numpy serial oracle for the distributed k-means
(functions/kmeans.py). The SQL oracle in __ray_entry__ is the primary gate;
this pins the semantics against an independent single-process Lloyd run
(exact integer arithmetic end-to-end) plus the properties SQL equality
can't express: determinism across runs and the empty-cluster carry rule."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions import kmeans as KM
from ocrautomator_ray.functions.mix import SHUFFLE_SEED, mix_hash

SF = "/root/testdata/sf0.001"


def _serial_lloyd(vec_ids, E, k, iters):
    """Single-process mirror of kmeans_fit: micro-int Lloyd with hash-rank
    seeding, argmin ties to the smaller cluster, floor-div updates,
    empty clusters carrying their previous centroid."""
    M = np.floor(E.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    h = mix_hash(vec_ids.astype(np.int64), SHUFFLE_SEED)
    C = M[np.lexsort((vec_ids, h))[:k]].copy()
    ns = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        d = ((M * M).sum(axis=1, keepdims=True) - 2 * (M @ C.T)
             + (C * C).sum(axis=1))
        a = np.argmin(d, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, a, M)
        ns = np.bincount(a, minlength=k).astype(np.int64)
        nz = ns > 0
        C = C.copy()
        C[nz] = sums[nz] // ns[nz, None]
    return C, ns


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    E = np.stack(t["embedding"].to_pandas().to_numpy())
    return ids, E


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_serial_lloyd(emb):
    ids, E = emb
    df = KM.kmeans_fit(SF).to_pandas().sort_values(
        ["cluster", "dim"]).reset_index(drop=True)
    k, dim = KM.KM_K, E.shape[1]
    assert len(df) == k * dim
    C, ns = _serial_lloyd(ids, E, k, KM.KM_ITERS)
    got_C = df["centroid_micros"].to_numpy(dtype=np.int64).reshape(k, dim)
    got_n = df["n"].to_numpy(dtype=np.int64).reshape(k, dim)
    assert (got_n == ns[:, None]).all()  # n repeated per dim
    np.testing.assert_array_equal(got_C, C)
    assert int(ns.sum()) == len(ids)  # last assignment covers every vector


@pytest.mark.usefixtures("ray_session")
def test_cluster_sample_matches_serial(emb):
    ids, E = emb
    C, _ = _serial_lloyd(ids, E, KM.KM_K, KM.KM_ITERS)
    M = np.floor(E.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    d = ((M * M).sum(axis=1, keepdims=True) - 2 * (M @ C.T)
         + (C * C).sum(axis=1))
    a = np.argmin(d, axis=1)
    h = mix_hash(ids.astype(np.int64), SHUFFLE_SEED)
    exp = set()
    for c in range(KM.KM_K):
        m = a == c
        order = np.lexsort((ids[m], h[m]))[:KM.CLUSTER_CAP]
        exp |= {(int(i), c) for i in ids[m][order]}
    df = KM.cluster_sample(SF).to_pandas()
    got = set(zip(df["vec_id"].astype(int), df["cluster"].astype(int)))
    assert got == exp
    # the cap binds: no cluster exceeds it
    assert df.groupby("cluster").size().max() <= KM.CLUSTER_CAP


@pytest.mark.usefixtures("ray_session")
def test_kmeans_deterministic_across_runs():
    a = KM.kmeans_fit(SF).to_pandas().sort_values(["cluster", "dim"])
    b = KM.kmeans_fit(SF).to_pandas().sort_values(["cluster", "dim"])
    assert (a.to_numpy() == b.to_numpy()).all()


def test_ties_go_to_smaller_cluster_and_empty_keeps_centroid():
    # Make the two seed rows (lowest hash ranks) IDENTICAL: every point then
    # ties between the two seed centroids, the argmin tie rule sends all of
    # them to the smaller cluster id, and cluster 1 is empty from round 1 on
    # — pinning both the tie-break and the carry-previous-centroid rule the
    # SQL oracle mirrors with ORDER BY d, c and COALESCE.
    ids = np.arange(6, dtype=np.int64)
    h = mix_hash(ids, SHUFFLE_SEED)
    order = np.lexsort((ids, h))[:2]
    E = np.full((6, 2), 0.25, dtype=np.float64)
    E[order[0]] = [0.5, -0.5]
    E[order[1]] = [0.5, -0.5]
    M = np.floor(E * 1e6 + 0.5).astype(np.int64)
    seed_micro = np.floor(np.array([0.5, -0.5]) * 1e6 + 0.5).astype(np.int64)

    C1, ns1 = _serial_lloyd(ids, E, 2, 1)
    assert ns1.tolist() == [6, 0]  # ties all went to the smaller id
    np.testing.assert_array_equal(C1[1], seed_micro)  # carried, not updated
    np.testing.assert_array_equal(C1[0], M.sum(axis=0) // 6)

    # round 2: the CARRIED centroid re-captures its two identical points —
    # the carry rule is live behavior, not dead state
    C2, ns2 = _serial_lloyd(ids, E, 2, 2)
    assert ns2.tolist() == [4, 2]
    np.testing.assert_array_equal(C2[1], seed_micro)
    np.testing.assert_array_equal(
        C2[0], M[~np.isin(ids, ids[order])].sum(axis=0) // 4)


# --------------------------- product quantization ---------------------------

def _serial_pq(sf_dir, m, k, iters):
    """Single-process mirror of _fit_pq + the code assignment."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    M = np.floor(np.stack(t["embedding"].to_pylist()).astype(np.float64)
                 * 1e6 + 0.5).astype(np.int64)
    h = mix_hash(ids, SHUFFLE_SEED)
    order = np.lexsort((ids, h))[:k]
    d = M.shape[1]
    dsub = d // m
    C = np.ascontiguousarray(
        M[order].reshape(k, m, dsub).transpose(1, 0, 2))
    X = M.reshape(len(ids), m, dsub)
    for _ in range(iters):
        newC = C.copy()
        for s in range(m):
            Xs, Cs = X[:, s, :], C[s]
            d2 = ((Xs * Xs).sum(axis=1, keepdims=True) - 2 * (Xs @ Cs.T)
                  + (Cs * Cs).sum(axis=1))
            a = np.argmin(d2, axis=1)
            for c in range(k):
                sel = a == c
                if sel.any():
                    newC[s][c] = Xs[sel].sum(axis=0) // sel.sum()
        C = newC
    codes = np.empty((len(ids), m), np.int64)
    errs = np.empty((len(ids), m), np.int64)
    for s in range(m):
        Xs, Cs = X[:, s, :], C[s]
        d2 = ((Xs * Xs).sum(axis=1, keepdims=True) - 2 * (Xs @ Cs.T)
              + (Cs * Cs).sum(axis=1))
        codes[:, s] = np.argmin(d2, axis=1)
        errs[:, s] = d2[np.arange(len(ids)), codes[:, s]]
    return ids, codes, errs


@pytest.mark.usefixtures("ray_session")
def test_pq_codes_match_serial():
    ids, codes, errs = _serial_pq(SF, KM.PQ_M, KM.PQ_K, KM.PQ_ITERS)
    df = KM.pq_codes(SF).to_pandas().sort_values(["vec_id", "sub"])
    exp_codes = dict(zip(zip(np.repeat(ids, KM.PQ_M).tolist(),
                             list(range(KM.PQ_M)) * len(ids)),
                         codes.reshape(-1).tolist()))
    got = {(v, s): c for v, s, c in
           zip(df["vec_id"], df["sub"], df["code"])}
    assert got == exp_codes
    got_err = {(v, s): e for v, s, e in
               zip(df["vec_id"], df["sub"], df["err2"])}
    exp_err = dict(zip(zip(np.repeat(ids, KM.PQ_M).tolist(),
                           list(range(KM.PQ_M)) * len(ids)),
                       errs.reshape(-1).tolist()))
    assert got_err == exp_err


@pytest.mark.usefixtures("ray_session")
def test_pq_training_reduces_reconstruction_error():
    # the trained codebook must reconstruct no worse than the raw seed
    # codebook it started from — Lloyd error is monotone non-increasing
    _, _, err_trained = _serial_pq(SF, KM.PQ_M, KM.PQ_K, KM.PQ_ITERS)
    _, _, err_seed = _serial_pq(SF, KM.PQ_M, KM.PQ_K, 0)
    assert err_trained.sum() <= err_seed.sum()
    assert err_trained.sum() < err_seed.sum()  # and strictly better here


@pytest.mark.usefixtures("ray_session")
def test_pq_ann_recall_against_exact():
    # ADC is approximate; with K=4 codes per subspace it must still place a
    # decent fraction of the true top-10 (exact L2) in its top-10 — and be
    # far better than random (10/500)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    M = np.floor(np.stack(t["embedding"].to_pylist()).astype(np.float64)
                 * 1e6 + 0.5).astype(np.int64)
    q = M[ids == KM.PQ_QUERY_VEC][0]
    d2 = ((M - q) ** 2).sum(axis=1)
    mask = ids != KM.PQ_QUERY_VEC
    order = np.lexsort((ids[mask], d2[mask]))[:KM.PQ_ANN_K]
    exact = set(ids[mask][order].tolist())
    got = set(KM.pq_ann_topk(SF).to_pandas()["vec_id"].tolist())
    assert len(got) == KM.PQ_ANN_K
    assert len(got & exact) >= 2   # near-random 64-dim data is PQ-hostile;
    # 20%+ recall still beats the 2% random baseline by an order of magnitude


@pytest.mark.usefixtures("ray_session")
def test_pq_ann_adist_matches_codebook_lookup():
    # adist2 of every reported neighbor equals the LUT sum over its codes
    C = KM._fit_pq(SF)
    codes = KM.pq_codes(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    M = np.floor(np.stack(t["embedding"].to_pylist()).astype(np.float64)
                 * 1e6 + 0.5).astype(np.int64)
    q = M[ids == KM.PQ_QUERY_VEC][0].reshape(KM.PQ_M, -1)
    lut = ((C - q[:, None, :]) ** 2).sum(axis=2)
    code_map = {(v, s): c for v, s, c in
                zip(codes["vec_id"], codes["sub"], codes["code"])}
    df = KM.pq_ann_topk(SF).to_pandas()
    for v, a in zip(df["vec_id"], df["adist2"]):
        exp = sum(lut[s][code_map[(v, s)]] for s in range(KM.PQ_M))
        assert a == exp


@pytest.mark.usefixtures("ray_session")
def test_persisted_model_zero_retrain():
    """The trained k-means model and PQ codebook persist beside the other
    index families: a second consumer must reuse the model file unchanged
    (zero Lloyd passes) and produce identical output — the ivf centroid
    discipline."""
    import os
    import shutil

    from ocrautomator_ray.functions import kmeans as km

    shutil.rmtree(km._KM_MODEL_ROOT, ignore_errors=True)
    a = km.kmeans_fit(SF).to_pandas()
    model = km._model_path(SF, f"centroids-k{km.KM_K}-i{km.KM_ITERS}.npz")
    assert os.path.exists(model)
    mtime = os.stat(model).st_mtime_ns
    b = km.kmeans_fit(SF).to_pandas()          # must reuse, not retrain
    assert os.stat(model).st_mtime_ns == mtime
    assert a.equals(b)

    p1 = km.pq_codes(SF).to_pandas().sort_values(
        ["vec_id", "sub"]).reset_index(drop=True)
    pq_model = km._model_path(
        SF, f"pq-m{km.PQ_M}-k{km.PQ_K}-i{km.PQ_ITERS}.npz")
    assert os.path.exists(pq_model)
    pq_mtime = os.stat(pq_model).st_mtime_ns
    p2 = km.pq_codes(SF).to_pandas().sort_values(
        ["vec_id", "sub"]).reset_index(drop=True)
    assert os.stat(pq_model).st_mtime_ns == pq_mtime
    assert p1.equals(p2)
