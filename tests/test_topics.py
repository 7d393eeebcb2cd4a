"""Serial oracle for the text→topic clustering
(functions/topics.py::doc_topics). The SQL mirror in __ray_entry__ is the
primary gate; this pins the whole chain (log₂-idf features + Lloyd rounds +
assignment) against an independent single-process recompute, plus
determinism and the bounded-feature invariant the at-scale arithmetic
relies on."""

import re

import numpy as np
import pandas as pd
import pytest

from ocrautomator_ray.functions import topics as T
from ocrautomator_ray.functions.dedup import _fnv1a_strings
from ocrautomator_ray.functions.mix import (
    _HASH_SIGN_SHIFT,
    HASH_DIM,
    SHUFFLE_SEED,
    mix_hash,
)

SF = "/root/testdata/sf0.001"


def _serial_topics(sf_dir: str, k: int, iters: int) -> dict[int, int]:
    import pyarrow as pa

    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    n_docs = len(d)
    docs = {int(i): [w for w in re.split(r"\s+", t.lower()) if w]
            for i, t in zip(d["doc_id"], d["text"])}
    df: dict[str, int] = {}
    for toks in docs.values():
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    feats: dict[int, np.ndarray] = {}
    for i, toks in docs.items():
        if not toks:
            continue
        v = np.zeros(HASH_DIM, np.int64)
        for w in toks:
            h = int(_fnv1a_strings(pa.array([w]))[0])
            sgn = -1 if (h >> _HASH_SIGN_SHIFT) & 1 else 1
            v[h % HASH_DIM] += sgn * (n_docs // df[w]).bit_length()
        feats[i] = v
    ids = np.array(sorted(feats), np.int64)
    X = np.stack([feats[i] for i in ids])
    h = mix_hash(ids, SHUFFLE_SEED)
    C = X[np.lexsort((ids, h))[:k]].copy()
    for _ in range(iters):
        dist = ((X * X).sum(1, keepdims=True) - 2 * (X @ C.T)
                + (C * C).sum(1))
        a = dist.argmin(1)
        newC = C.copy()
        for c in range(k):
            sel = a == c
            if sel.any():
                newC[c] = X[sel].sum(0) // sel.sum()
        C = newC
    dist = ((X * X).sum(1, keepdims=True) - 2 * (X @ C.T) + (C * C).sum(1))
    return dict(zip(ids.tolist(), dist.argmin(1).tolist()))


@pytest.mark.usefixtures("ray_session")
def test_doc_topics_match_serial():
    exp = _serial_topics(SF, T.TOPIC_K, T.TOPIC_ITERS)
    got = T.doc_topics(SF).to_pandas()
    assert dict(zip(got["doc_id"], got["topic"])) == exp


@pytest.mark.usefixtures("ray_session")
def test_topic_features_bounded():
    # the at-scale contract: |feature| ≤ 64 · doc token count, so Lloyd
    # dist² can never overflow int64 regardless of corpus size
    feats = T._topic_features(SF).to_pandas()
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    ntok = {int(i): len([w for w in re.split(r"\s+", t.lower()) if w])
            for i, t in zip(d["doc_id"], d["text"])}
    V = feats[[f"v_{j}" for j in range(HASH_DIM)]].to_numpy()
    bound = np.array([64 * ntok[int(i)] for i in feats["doc_id"]])
    assert (np.abs(V).max(axis=1) <= bound).all()


@pytest.mark.usefixtures("ray_session")
def test_doc_topics_deterministic_and_multi_modal():
    a = T.doc_topics(SF).to_pandas().sort_values("doc_id")
    b = T.doc_topics(SF).to_pandas().sort_values("doc_id")
    assert (a["topic"].to_numpy() == b["topic"].to_numpy()).all()
    assert a["topic"].nunique() > 1


@pytest.mark.usefixtures("ray_session")
def test_topic_keywords_match_serial():
    # recompute (topic, token) totals from the serial topic assignment and
    # the raw texts; top-5 per topic by (n DESC, token ASC)
    exp_topics = _serial_topics(SF, T.TOPIC_K, T.TOPIC_ITERS)
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    totals: dict[tuple[int, str], int] = {}
    for i, t in zip(d["doc_id"], d["text"]):
        if int(i) not in exp_topics:
            continue
        topic = exp_topics[int(i)]
        for w in re.split(r"\s+", t.lower()):
            if w:
                totals[(topic, w)] = totals.get((topic, w), 0) + 1
    exp = {}
    for topic in set(exp_topics.values()):
        rows = sorted(((w, n) for (tp, w), n in totals.items()
                       if tp == topic), key=lambda x: (-x[1], x[0]))
        for r, (w, n) in enumerate(rows[:T.TOPIC_TOP_N], 1):
            exp[(topic, w)] = (n, r)
    got = T.topic_keywords(SF).to_pandas()
    assert len(got) == len(exp)
    for topic, token, n, rank in got.itertuples(index=False):
        assert exp[(topic, token)] == (n, rank)


@pytest.mark.usefixtures("ray_session")
def test_incremental_topics_warm_model_is_read_only(monkeypatch):
    from ocrautomator_ray.functions.curate import INCR_NEW_MOD

    T.topic_index_build(SF)                      # warm (or reuse) the model

    def boom(*a, **k):
        raise AssertionError("warm incremental query re-trained the model")

    monkeypatch.setattr(T, "_fit_topics", boom)
    df = T.incremental_doc_topics(SF).to_pandas()
    assert len(df) > 0
    assert (df["doc_id"] % INCR_NEW_MOD == 0).all()   # new shard only
    assert df["doc_id"].is_unique
    assert df["topic"].between(0, T.TOPIC_K - 1).all()


@pytest.mark.usefixtures("ray_session")
def test_incremental_topics_deterministic():
    a = T.incremental_doc_topics(SF).to_pandas().sort_values("doc_id")
    b = T.incremental_doc_topics(SF).to_pandas().sort_values("doc_id")
    assert (a["topic"].to_numpy() == b["topic"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_full_table_topic_model_zero_retrain():
    """The FULL-TABLE topic centroids persist like the k-means model: a
    repeat consumer (topic_keywords composes doc_topics) must reuse the
    model file unchanged and produce identical assignments."""
    import os
    import shutil

    from ocrautomator_ray.functions import topics as tp

    shutil.rmtree(tp._TOPIC_MODEL_ROOT, ignore_errors=True)
    a = tp.doc_topics(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    d = [f for f in os.listdir(tp._TOPIC_MODEL_ROOT)]
    assert len(d) == 1
    model = os.path.join(tp._TOPIC_MODEL_ROOT, d[0],
                         f"centroids-k{tp.TOPIC_K}-i{tp.TOPIC_ITERS}.npz")
    assert os.path.exists(model)
    mtime = os.stat(model).st_mtime_ns
    b = tp.doc_topics(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert os.stat(model).st_mtime_ns == mtime
    assert a.equals(b)
