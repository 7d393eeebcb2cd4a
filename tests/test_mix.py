"""Brute-force oracles for the corpus-assembly operators (functions/mix.py)
at sf0.001. The SQL oracles in __ray_entry__ are the primary gate; these pin
the semantics with independent pure-numpy logic and the properties that SQL
equality can't express (permutation-ness, determinism across runs)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions import mix as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_meta():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source", "n_chars"])
    return (t["doc_id"].to_numpy(zero_copy_only=False),
            t["source"].to_numpy(zero_copy_only=False),
            t["n_chars"].to_numpy(zero_copy_only=False))


@pytest.mark.usefixtures("ray_session")
def test_seeded_shuffle_is_dense_permutation(doc_meta):
    ids, _, _ = doc_meta
    df = M.seeded_shuffle(SF).to_pandas()
    assert len(df) == len(ids)
    assert sorted(df["doc_id"]) == sorted(ids)
    # dense 0..n-1, no gaps, no dupes
    assert sorted(df["pos"]) == list(range(len(ids)))
    # order is exactly (hash, doc_id) ascending
    h = M.mix_hash(df["doc_id"].to_numpy(), M.SHUFFLE_SEED)
    order = np.lexsort((df["doc_id"].to_numpy(), h))
    expect_pos = np.empty(len(ids), np.int64)
    expect_pos[order] = np.arange(len(ids))
    assert (df["pos"].to_numpy() == expect_pos).all()


@pytest.mark.usefixtures("ray_session")
def test_seeded_shuffle_deterministic_and_seed_sensitive():
    a = M.seeded_shuffle(SF).to_pandas().sort_values("doc_id")
    b = M.seeded_shuffle(SF).to_pandas().sort_values("doc_id")
    assert (a["pos"].to_numpy() == b["pos"].to_numpy()).all()
    c = M.seeded_shuffle(SF, seed=7).to_pandas().sort_values("doc_id")
    assert (a["pos"].to_numpy() != c["pos"].to_numpy()).any()


@pytest.mark.usefixtures("ray_session")
def test_source_cap_bound_and_selection(doc_meta):
    ids, src, _ = doc_meta
    df = M.source_cap(SF, cap=3).to_pandas()
    per_src = df.groupby("source").size()
    assert (per_src <= 3).all()
    # survivors are exactly the 3 lowest (hash, doc_id) of each source
    h = M.mix_hash(ids, M.SHUFFLE_SEED)
    kept = set()
    for s in np.unique(src):
        m = src == s
        order = np.lexsort((ids[m], h[m]))
        kept.update(ids[m][order][:3].tolist())
    assert set(df["doc_id"]) == kept


@pytest.mark.usefixtures("ray_session")
def test_mix_corpus_replication(doc_meta):
    ids, src, _ = doc_meta
    df = M.mix_corpus(SF).to_pandas()
    from ocrautomator_ray.functions.curate import knuth_bucket
    w = M._mix_permille(src)
    expect = w // 1000 + (knuth_bucket(ids) < w % 1000)
    got = df.groupby("doc_id").size().reindex(ids, fill_value=0).to_numpy()
    assert (got == expect).all()
    # epochs are 0..k-1 per doc
    g = df.groupby("doc_id")["epoch"]
    assert (g.min().to_numpy() == 0).all()
    assert (g.max().to_numpy() == g.size().to_numpy() - 1).all()


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_rule(doc_meta):
    ids, _, nc = doc_meta
    from ocrautomator_ray.functions.curate import knuth_bucket
    df = M.weighted_sample(SF).to_pandas()
    expect = ids[knuth_bucket(ids) < np.minimum(999, nc // 5)]
    assert set(df["doc_id"]) == set(expect.tolist())


@pytest.mark.usefixtures("ray_session")
def test_rp_project_exact_integer_matmul():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    emb = np.array(t["embedding"].to_pylist(), np.float64)
    mat_int = np.floor(emb * 1e6 + 0.5).astype(np.int64)
    expect = mat_int @ M._rp_signs()
    df = M.rp_project(SF).to_pandas().sort_values("vec_id")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    assert (df["vec_id"].to_numpy() == np.sort(ids)).all()
    order = np.argsort(ids)
    for j in range(M.RP_OUT_DIM):
        assert (df[f"proj_{j}"].to_numpy() == expect[order, j]).all()


def test_rp_signs_are_balanced():
    s = M._rp_signs()
    # a degenerate sign matrix (e.g. parity artifact) would be all-equal per
    # column or have perfectly correlated columns; require rough balance
    frac_pos = (s > 0).mean(axis=0)
    assert ((frac_pos > 0.25) & (frac_pos < 0.75)).all()
    corr = np.corrcoef(s.T)
    off = corr[~np.eye(M.RP_OUT_DIM, dtype=bool)]
    assert (np.abs(off) < 0.6).all()


@pytest.mark.usefixtures("ray_session")
def test_embedding_outliers_brute_force():
    """Independent numpy oracle for the per-label farthest-from-centroid op
    (lives in functions/ann.py; tested here with the other assembly ops)."""
    from ocrautomator_ray.functions.ann import embedding_outliers, OUTLIER_K

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "label", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = np.array(t["embedding"].to_pylist(), np.float64)
    micros = np.floor(emb * 1e6 + 0.5).astype(np.int64)
    expect = set()
    for l in np.unique(lab):
        m = lab == l
        s = micros[m].sum(axis=0)
        n = int(m.sum())
        c = np.floor_divide(2 * s + n, 2 * n)
        d2 = ((micros[m] - c) ** 2).sum(axis=1)
        order = np.lexsort((ids[m], -d2))[:OUTLIER_K]
        for i in order:
            expect.add((int(l), int(ids[m][i]), int(d2[i])))
    df = embedding_outliers(SF).to_pandas()
    got = {(r.label, r.vec_id, r.dist2) for r in df.itertuples()}
    assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_idf_hashed_vectors_match_brute_force():
    """Per-token Python recompute of the idf-weighted hashed vectors."""
    import re

    import pandas as pd
    import pyarrow as pa

    from ocrautomator_ray.functions.dedup import _fnv1a_strings
    from ocrautomator_ray.functions.mix import (
        _HASH_SIGN_SHIFT,
        HASH_DIM,
        idf_hashed_vectors,
    )

    sf = "/root/testdata/sf0.001"
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = {int(i): [w for w in re.split(r"\s+", t.lower()) if w]
            for i, t in zip(d["doc_id"], d["text"])}
    n_docs = len(docs)
    df: dict[str, int] = {}
    for toks in docs.values():
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    exp: dict[int, list[int]] = {}
    for i, toks in docs.items():
        if not toks:
            continue
        v = [0] * HASH_DIM
        for w in toks:
            h = int(_fnv1a_strings(pa.array([w]))[0])
            sgn = -1 if (h >> _HASH_SIGN_SHIFT) & 1 else 1
            v[h % HASH_DIM] += sgn * (n_docs * 1_000_000 // df[w])
        exp[i] = v
    got = idf_hashed_vectors(sf).to_pandas().set_index("doc_id")
    assert set(got.index) == set(exp)
    for i, v in exp.items():
        assert got.loc[i].tolist() == v
