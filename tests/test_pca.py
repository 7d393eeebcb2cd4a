"""Serial oracle for the integer power-iteration PCA projection
(functions/pca.py::pca_project). The SQL mirror in __ray_entry__ is the
primary gate; this pins the fixed-point iteration against an independent
single-process big-int recompute, checks the component actually tracks the
dominant eigendirection, and exercises determinism."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions import pca as P

SF = "/root/testdata/sf0.001"


def _serial_scores(sf_dir: str, iters: int) -> dict[int, int]:
    """Single-process mirror: micros → exact covariance numerators →
    truncating-division power iteration → centered projection."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    M = np.floor(np.stack(t["embedding"].to_pylist()).astype(np.float64)
                 * 1e6 + 0.5).astype(np.int64)
    ids = t["vec_id"].to_numpy()
    n, d = M.shape
    S = [int(x) for x in M.sum(axis=0)]
    G = M.T.astype(object) @ M.astype(object)      # exact big-int Gram
    A = [[n * int(G[i][j]) - S[i] * S[j] for j in range(d)]
         for i in range(d)]
    g = max(abs(x) for r in A for x in r) // P.PCA_SCALE + 1
    A = [[P._tdiv(x, g) for x in r] for r in A]
    v = [P.PCA_SCALE] * d
    for _ in range(iters):
        w = [sum(A[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(max(abs(x) for x in w), 1)
        v = [P._tdiv(x * P.PCA_SCALE, mx) for x in w]
    mu = np.array([s // n for s in S], dtype=np.int64)
    scores = (M - mu) @ np.array(v, dtype=np.int64)
    return dict(zip(ids.tolist(), scores.tolist()))


@pytest.mark.usefixtures("ray_session")
def test_pca_project_matches_serial():
    exp = _serial_scores(SF, P.PCA_ITERS)
    df = P.pca_project(SF).to_pandas()
    got = dict(zip(df["vec_id"].tolist(), df["pc_score"].tolist()))
    assert got == exp


@pytest.mark.usefixtures("ray_session")
def test_component_concentrates_variance():
    # The synthetic embeddings are near-isotropic (top eigenvalues within
    # ~7%), so the DIRECTION converges slowly — but the Rayleigh quotient
    # (captured variance) is the quantity PCA screening consumes, and it
    # converges fast: after 4 rounds the component captures well over the
    # isotropic-average share of the spectrum and most of the top value.
    comp, _ = P._power_component(SF, P.PCA_ITERS)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    M = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    C = np.cov(M, rowvar=False, bias=True)
    vals = np.linalg.eigvalsh(C)
    c = comp.astype(np.float64)
    c /= np.linalg.norm(c)
    rayleigh = c @ C @ c
    assert rayleigh > 0.8 * vals[-1]          # most of the top eigenvalue
    assert rayleigh > 1.5 * vals.mean()       # ≫ a random direction's share


@pytest.mark.usefixtures("ray_session")
def test_pca_project_deterministic():
    a = P.pca_project(SF).to_pandas().sort_values("vec_id")
    b = P.pca_project(SF).to_pandas().sort_values("vec_id")
    assert (a["pc_score"].to_numpy() == b["pc_score"].to_numpy()).all()
