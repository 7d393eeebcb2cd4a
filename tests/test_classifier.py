"""Serial oracle for the distributed batch perceptron
(functions/classifier.py::perceptron_lang). The SQL mirror in __ray_entry__
is the primary gate; this pins the training loop against an independent
single-process recompute over the same features, plus determinism and a
does-it-actually-learn sanity check SQL equality can't express."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions import classifier as C

SF = "/root/testdata/sf0.001"


def _serial_train(sf_dir: str, rounds: int):
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    X, y = C._featurize(t)
    w = np.zeros(C.PCT_DIM, dtype=np.int64)
    errors = 0
    for _ in range(rounds):
        mis = y * (X @ w) <= 0
        errors = int(mis.sum())
        w = w + (X[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
    return w, errors, X, y


@pytest.mark.usefixtures("ray_session")
def test_perceptron_matches_serial():
    w_exp, err_exp, _, _ = _serial_train(SF, C.PCT_ROUNDS)
    df = C.perceptron_lang(SF).to_pandas().sort_values("dim")
    assert (df["weight"].to_numpy() == w_exp).all()
    assert (df["errors"] == err_exp).all()


def test_perceptron_learns_separable_labels():
    # The sf tables share one vocabulary across languages, so lang carries
    # no lexical signal there (the SQL equality gate still pins the
    # mechanics). This crafted table IS separable — 'en' docs say alpha,
    # the rest say beta — and the same update rule must drive training
    # accuracy to 1.0 within a few rounds.
    import pyarrow as pa

    n = 40
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["alpha alpha data" if i % 2 else "beta beta data"
                          for i in range(n)]),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
    })
    X, y = C._featurize(t)
    w = np.zeros(C.PCT_DIM, dtype=np.int64)
    for _ in range(C.PCT_ROUNDS):
        mis = y * (X @ w) <= 0
        w = w + (X[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
    assert float((np.sign(X @ w) == y).mean()) == 1.0


@pytest.mark.usefixtures("ray_session")
def test_perceptron_deterministic():
    a = C.perceptron_lang(SF).to_pandas().sort_values("dim")
    b = C.perceptron_lang(SF).to_pandas().sort_values("dim")
    assert (a["weight"].to_numpy() == b["weight"].to_numpy()).all()
    assert (a["errors"].to_numpy() == b["errors"].to_numpy()).all()
