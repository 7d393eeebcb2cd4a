"""Brute-force oracles for the non-SQL dedup/similarity ops at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions import dedup as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@pytest.fixture(scope="module")
def embeddings():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, E / np.linalg.norm(E, axis=1, keepdims=True)


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_precision_and_high_jaccard_recall(docs):
    got = D.minhash_lsh_dups(SF).to_pandas()
    shingles = {d: D.word_shingles(t) for d, t in docs.items()}
    # precision: every reported pair really has jaccard >= threshold
    for a, b, j in got.itertuples(index=False):
        true_j = D.jaccard(shingles[a], shingles[b])
        assert true_j == j and true_j >= D.MINHASH_THRESHOLD
    # recall on strong dups: every pair with true jaccard >= 0.9 must be found
    ids = sorted(docs)
    strong = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if D.jaccard(shingles[a], shingles[b]) >= 0.9:
                strong.add((a, b))
    found = set(zip(got["doc_a"], got["doc_b"]))
    missing = strong - found
    assert not missing, f"missed strong near-dups: {sorted(missing)[:5]}"


@pytest.mark.usefixtures("ray_session")
def test_simhash_exact_recall(docs):
    got = D.simhash_dups(SF).to_pandas()
    sigs = {d: int(D.simhash64(t)) for d, t in docs.items()}
    ids = sorted(docs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= D.SIMHASH_MAX_HAMMING:
                expected.add((a, b))
    found = set(zip(got["doc_a"], got["doc_b"]))
    # 4×16-bit banding guarantees exact recall for hamming <= 3 (pigeonhole)
    assert found == expected
    for a, b, h in got.itertuples(index=False):
        assert bin(sigs[a] ^ sigs[b]).count("1") == h


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_exact(embeddings):
    ids, En = embeddings
    got = D.embedding_neardup(SF).to_pandas()
    S = En @ En.T
    ia, ib = np.nonzero(np.triu(S >= D.COSINE_THRESHOLD, k=1))
    expected = set(zip(ids[ia].tolist(), ids[ib].tolist()))
    found = set(zip(got["vec_a"], got["vec_b"]))
    assert found == expected
    # no pair sits razor-close to the threshold (guards float-order effects)
    offdiag = S[np.triu_indices_from(S, k=1)]
    margin = np.abs(offdiag - D.COSINE_THRESHOLD).min()
    assert margin > 1e-9


@pytest.mark.usefixtures("ray_session")
def test_minhash_dup_clusters_match_union_find(docs):
    got = D.minhash_dup_clusters(SF).to_pandas()
    pairs = D.minhash_lsh_dups(SF).to_pandas()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    result = dict(zip(got["doc_id"], got["cluster_id"]))
    assert result == expected


@pytest.mark.usefixtures("ray_session")
def test_lsh_ann_recall_vs_exact():
    from ocrautomator_ray.functions import ann as A

    exact = A.ann_topk(SF).to_pandas()
    approx = A.lsh_ann_topk(SF).to_pandas()
    exact_sets = exact.groupby("qid")["vec_id"].apply(set)
    approx_sets = approx.groupby("qid")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    # random 64-dim data is the adversarial case for LSH — the neighbors sit
    # at cos≈0.3-0.45; hamming-2 multi-probe buys usable-but-imperfect recall
    assert np.mean(recalls) >= 0.4, recalls


@pytest.mark.usefixtures("ray_session")
def test_ivf_ann_recall_vs_exact_and_deterministic():
    from ocrautomator_ray.functions import ann as A

    exact = A.ann_topk(SF).to_pandas()
    approx = A.ivf_ann_topk(SF).to_pandas()
    exact_sets = exact.groupby("qid")["vec_id"].apply(set)
    approx_sets = approx.groupby("qid")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    # probing 4/16 centroids must beat the 25%-of-table random-scan floor
    assert np.mean(recalls) >= 0.5, recalls
    # deterministic: fixed sample + first-k init + fixed iterations
    again = A.ivf_ann_topk(SF).to_pandas()
    pd.testing.assert_frame_equal(
        approx.sort_values(["qid", "rank"]).reset_index(drop=True),
        again.sort_values(["qid", "rank"]).reset_index(drop=True),
    )


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_persisted_probe_matches_and_prunes():
    """The persisted-index query path must (a) return exactly the rows of the
    per-batch-assignment path, (b) open only the probed centroid value
    directories, and (c) make a rebuild a resume no-op."""
    import os
    import shutil

    from ocrautomator_ray.functions import ann as A

    idx = A.ivf_index_dir(SF)
    shutil.rmtree(idx, ignore_errors=True)
    via_index = A.ivf_index_topk(SF).to_pandas()
    baseline = A.ivf_ann_topk(SF).to_pandas()
    pd.testing.assert_frame_equal(
        via_index.sort_values(["qid", "rank"]).reset_index(drop=True),
        baseline.sort_values(["qid", "rank"]).reset_index(drop=True),
    )
    # pruning: the read's directory list is exactly the probe union, and the
    # index holds every centroid that received vectors
    qids, Qn = A._load_queries(SF, A.ANN_NUM_QUERIES)
    C = A._train_centroids(SF)
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :A.IVF_PROBE]
    probed = A.ivf_probe_dirs(idx, probe)
    all_dirs = [d for d in os.listdir(os.path.join(idx, "data"))
                if d.startswith("centroid=")]
    assert len(probed) == len({int(c) for c in probe.reshape(-1)}
                              & {int(d.split("=")[1]) for d in all_dirs})
    assert len(probed) <= len(all_dirs)
    if len({int(c) for c in probe.reshape(-1)}) < A.IVF_CENTROIDS:
        assert len(probed) < A.IVF_CENTROIDS  # proper pruning when union is proper
    # resume: a second build over the committed index recomputes nothing
    summary = A.ivf_index_build(SF)
    assert summary["partitions_this_run"] == 0


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_probe_runs_zero_kmeans(monkeypatch):
    """A committed index must answer probes READ-ONLY: centroids load from
    the persisted centroids.parquet, so no k-means iteration (and no re-read
    of the training sample) ever runs on the query path."""
    import os

    from ocrautomator_ray.functions import ann as A

    A.ivf_index_build(SF)  # ensure committed (idempotent)
    assert os.path.exists(A._centroids_path(A.ivf_index_dir(SF)))
    baseline = A.ivf_ann_topk(SF).to_pandas()

    def boom(*a, **k):
        raise AssertionError("k-means ran on the probe path")

    monkeypatch.setattr(A, "_train_centroids", boom)
    via_index = A.ivf_index_topk(SF).to_pandas()
    pd.testing.assert_frame_equal(
        via_index.sort_values(["qid", "rank"]).reset_index(drop=True),
        baseline.sort_values(["qid", "rank"]).reset_index(drop=True),
    )


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_evicts_stale_fingerprints(tmp_path):
    """Rebuilding after the source changes must not accrete a duplicate
    embeddings copy per fingerprint under /tmp (disk-pressure guard)."""
    import os
    import shutil

    from ocrautomator_ray.functions import ann as A

    idx = A.ivf_index_dir(SF)
    root, tag = os.path.split(idx)
    stale = os.path.join(root, tag.rsplit("-", 2)[0] + "-999-888")
    os.makedirs(stale, exist_ok=True)
    # an unrelated basename must survive eviction
    other = os.path.join(root, "otherbase-1-2")
    os.makedirs(other, exist_ok=True)
    A.ivf_index_build(SF)
    assert not os.path.exists(stale)
    assert os.path.exists(other)
    shutil.rmtree(other, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_per_key_runs_oversized_partition_stays_whole():
    """_per_key_runs relies on Ray 2.49's hash-shuffle finalize emitting ONE
    block per partition (splitting at target_max_block_size is an
    unimplemented TODO in hash_shuffle.py). Build a partition far above the
    block-size target: if a future Ray starts splitting, the hot key's run
    fragments into several fn calls and this fails loudly."""
    import pyarrow as pa
    import ray.data as rd

    from ocrautomator_ray.functions.dedup import _per_key_runs

    n_hot = 50_000
    t = pa.table({
        "k": pa.array(["hot"] * n_hot + [f"cold{i}" for i in range(100)]),
        "payload": pa.array(["x" * 100] * (n_hot + 100)),
    })
    ds = rd.from_arrow(t)
    ds.context.target_max_block_size = 1 << 20  # 1 MB << the hot partition

    out_schema = pa.schema([("k", pa.string()), ("n", pa.int64())])

    def count_run(run: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array([run["k"][0].as_py()]),
                         "n": pa.array([run.num_rows], pa.int64())})

    got = _per_key_runs(ds, ["k"], count_run, out_schema,
                        num_partitions=4).to_pandas()
    assert len(got) == 101, "a key run was split across blocks"
    assert int(got.set_index("k")["n"]["hot"]) == n_hot


def test_winnow_fingerprint_properties():
    from ocrautomator_ray.functions.text import _winnow_one

    a = _winnow_one(b"the quick brown fox jumps over the lazy dog")
    b = _winnow_one(b"the quick brown fox jumps over the lazy dog")
    assert np.array_equal(a, b) and len(a) > 0
    # containment: fingerprints of a substring mostly survive in the superstring
    sup = _winnow_one(b"PREFIX the quick brown fox jumps over the lazy dog SUFFIX")
    overlap = np.intersect1d(a, sup).size / len(a)
    assert overlap >= 0.5
    assert len(_winnow_one(b"short")) == 0  # below k-gram length


def test_lang_id_on_real_sentences():
    from ocrautomator_ray.functions.text import LangIdActor

    actor = LangIdActor()
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            "the cat is on the mat and it is not happy",
            "der Hund ist nicht da und ich bin ein Mensch mit Zeit",
            "el perro no es un gato y la casa es para los dos",
            "le chien est pour le chat et je ne suis pas une personne",
            "我 是 一 个 人 在 中 国 的 大 学",
        ],
    })
    out = actor(t)
    assert out["pred_lang"].to_pylist() == ["en", "de", "es", "fr", "zh"]


@pytest.mark.usefixtures("ray_session")
def test_hll_within_tolerance_of_exact():
    import duckdb

    from ocrautomator_ray.functions.sketch import approx_distinct_users_per_type

    got = approx_distinct_users_per_type(SF).to_pandas()
    exact = duckdb.sql(
        f"select event_type, count(distinct user_id) n "
        f"from read_parquet('{SF}/events.parquet') group by event_type"
    ).df()
    m = got.merge(exact, on="event_type")
    assert len(m) == len(exact)
    rel_err = ((m["approx_users"] - m["n"]).abs() / m["n"]).max()
    assert rel_err <= 0.05, rel_err


@pytest.mark.usefixtures("ray_session")
def test_duplicate_doc_ids_produce_no_self_pairs(tmp_path):
    """Duplicate doc_id rows co-locate in every band bucket; the pair stage
    must drop the degenerate (a, a) pair instead of emitting it (simhash) or
    tripping the verify stage's co-location check (minhash)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["the quick brown fox jumps over the lazy dog again and again",
             "a completely different document about ships and harbors"]
    t = pa.table({
        "doc_id": pa.array([7, 7, 8, 9], pa.int64()),
        "text": pa.array([texts[0], texts[0], texts[0], texts[1]]),
        "source": pa.array(["s", "s", "s", "s"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    sh = D.simhash_dups(str(tmp_path)).to_pandas()
    assert set(zip(sh["doc_a"], sh["doc_b"])) == {(7, 8)}
    mh = D.minhash_lsh_dups(str(tmp_path)).to_pandas()
    assert set(zip(mh["doc_a"], mh["doc_b"])) == {(7, 8)}


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_append_folds_new_fragment(tmp_path):
    """ivf_index_append must (a) assign ONLY the new fragment against the
    PERSISTED centroids (no retraining — centroids.parquet untouched),
    (b) leave base ∪ epochs holding every vector exactly once with the
    stored assignment equal to the argmax against those centroids, (c) make
    ivf_index_topk EXACT over the probed cells of the grown index (the IVF
    approximation is entirely which cells are probed), and (d) be
    idempotent — re-appending the same fragment resumes to a no-op."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data as rd

    from ocrautomator_ray.functions import ann as A

    t = pq_.read_table(f"{SF}/embeddings.parquet")
    ids_all = t["vec_id"].to_numpy(zero_copy_only=False)
    even = (ids_all % 2) == 0
    sfdir = tmp_path / "sf"
    os.makedirs(sfdir)
    pq_.write_table(t.filter(pa.array(even)), f"{sfdir}/embeddings.parquet")
    appendix = tmp_path / "appendix.parquet"
    pq_.write_table(t.filter(pa.array(~even)), str(appendix))

    idx = A.ivf_index_dir(str(sfdir))
    shutil.rmtree(idx, ignore_errors=True)
    A.ivf_index_build(str(sfdir))
    cent_mtime = os.stat(A._centroids_path(idx)).st_mtime_ns
    C = A._read_centroids(idx)

    s1 = A.ivf_index_append(str(appendix), idx)
    assert s1["partitions_this_run"] > 0
    assert os.stat(A._centroids_path(idx)).st_mtime_ns == cent_mtime

    # completeness + assignment correctness over base ∪ epoch fragments
    frags = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(idx) for f in files
        if f.endswith(".parquet") and "centroid=" in root)
    got = rd.read_parquet(frags).to_pandas()
    assert sorted(got["vec_id"]) == sorted(ids_all)
    E = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    expect_cent = np.argmax(En @ C.T, axis=1)
    by_id = dict(zip(ids_all, expect_cent))
    assert all(int(c) == int(by_id[v])
               for v, c in zip(got["vec_id"], got["centroid"]))

    # query path: exact top-k within the probed cells of the GROWN index
    qids, Qn = A._load_queries(str(sfdir), A.ANN_NUM_QUERIES)
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :A.IVF_PROBE]
    res = A.ivf_index_topk(str(sfdir)).to_pandas()
    for qi, qid in enumerate(qids):
        mask = np.isin(expect_cent, probe[qi]) & (ids_all != qid)
        sims = Qn[qi] @ En[mask].T
        cand = ids_all[mask]
        order = np.lexsort((cand, -sims))[:A.ANN_K]
        mine = res[res["qid"] == qid].sort_values("rank")
        assert mine["vec_id"].tolist() == cand[order].tolist()

    # idempotence: same fragment again is a resume no-op
    s2 = A.ivf_index_append(str(appendix), idx)
    assert s2["partitions_this_run"] == 0
    shutil.rmtree(idx, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_brute_force():
    """knn_graph vs a serial per-label recompute: exact micro-int dist²,
    (dist2, nbr_id) ranking, singleton labels absent, k capped at n-1."""
    from ocrautomator_ray.functions.ann import KNN_K, knn_graph

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    lab = t["label"].to_numpy().astype(np.int64)
    M = np.floor(np.array(t["embedding"].to_pylist(), np.float64) * 1e6
                 + 0.5).astype(np.int64)
    expect = []
    for lv in np.unique(lab):
        m = lab == lv
        X, I = M[m], ids[m]
        if len(I) < 2:
            continue
        for i in range(len(I)):
            d2 = ((X - X[i]) ** 2).sum(axis=1)
            cand = sorted((int(d2[j]), int(I[j]))
                          for j in range(len(I)) if j != i)
            for r, (d, nid) in enumerate(cand[:KNN_K], 1):
                expect.append((int(I[i]), int(lv), r, nid, d))
    exp = (pd.DataFrame(expect, columns=["vec_id", "label", "nbr_rank",
                                         "nbr_id", "dist2"])
           .sort_values(["vec_id", "nbr_rank"]).reset_index(drop=True))
    got = (knn_graph(sf).to_pandas()
           .sort_values(["vec_id", "nbr_rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_boundary_ties(tmp_path):
    """Duplicate vectors force dist² ties across the top-k boundary: the
    kernel must widen the candidate set and break ties by smaller nbr_id."""
    import pyarrow as pa

    from ocrautomator_ray.functions.ann import knn_graph

    # one label, 8 identical vectors + 2 distant ones: every identical
    # vector's 5-NN is a pure tie among 7 partners -> ids 0..4ish win
    emb = [[1.0] * 4 + [0.0] * 60] * 8 + [[5.0] * 4 + [0.0] * 60] * 2
    t = pa.table({
        "vec_id": pa.array(list(range(10)), pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
        "label": pa.array([1] * 10, pa.int32()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    import pyarrow.parquet as pq2
    pq2.write_table(t, d / "embeddings.parquet")
    got = (knn_graph(str(d), k=5).to_pandas()
           .sort_values(["vec_id", "nbr_rank"]).reset_index(drop=True))
    assert len(got) == 10 * 5
    # vec 7 (identical group, ids 0..7): neighbors = smallest ids != 7
    n7 = got[got["vec_id"] == 7]
    assert n7["nbr_id"].tolist() == [0, 1, 2, 3, 4]
    assert (n7["dist2"] == 0).all()
    # vec 0: ties with 1..7 at dist 0 -> picks 1..5
    n0 = got[got["vec_id"] == 0]
    assert n0["nbr_id"].tolist() == [1, 2, 3, 4, 5]
    # distant pair: nearest is its twin at dist 0, then the cluster
    n8 = got[got["vec_id"] == 8]
    assert n8["nbr_id"].tolist()[0] == 9 and n8["dist2"].tolist()[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_containment_pairs_invariants():
    from ocrautomator_ray.functions.dedup import (
        CONTAIN_DEN,
        CONTAIN_NUM,
        containment_pairs,
        minhash_lsh_dups,
    )

    sf = "/root/testdata/sf0.001"
    df = containment_pairs(sf).to_pandas()
    assert len(df) > 0
    assert (df["inter"] <= df["smin"]).all()
    assert (df["smin"] <= df["smax"]).all()
    assert (df["cont_permille"] == df["inter"] * 1000 // df["smin"]).all()
    assert (df["inter"] * CONTAIN_DEN >= CONTAIN_NUM * df["smin"]).all()
    # (inter, smin, smax) is consistent with the (inter, uni) emit mode:
    # smin + smax == inter + uni for the same candidate pair
    cnt = minhash_lsh_dups(sf, threshold=0.0, emit_counts=True).to_pandas()
    cnt = cnt.set_index(["doc_a", "doc_b"])
    for a, b, inter, smin, smax, _ in df.itertuples(index=False):
        row = cnt.loc[(a, b)]
        assert row["inter"] == inter
        assert smin + smax == inter + row["uni"]


@pytest.mark.usefixtures("ray_session")
def test_dedup_rate_by_source_set_logic():
    import pandas as pd

    from ocrautomator_ray.functions.dedup import (
        dedup_rate_by_source,
        minhash_dup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    cl = minhash_dup_clusters(sf).to_pandas()
    drops = set(cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"])
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])
    got = dedup_rate_by_source(sf).to_pandas().set_index("source")
    assert set(got.index) == set(docs["source"])
    assert int(got["n_docs"].sum()) == len(docs)
    assert int(got["n_dups"].sum()) == len(drops)
    for src, g in docs.groupby("source"):
        n = len(g)
        d = sum(1 for i in g["doc_id"] if int(i) in drops)
        assert got.loc[src, "n_docs"] == n
        assert got.loc[src, "n_dups"] == d
        assert got.loc[src, "dup_permille"] == d * 1000 // n


def test_block_invariant_version_gate():
    """VERDICT r4 #6: the one-block-per-partition invariant is pinned to
    verified Ray minors — an unverified version must fail at IMPORT (the
    gate), not mid-job via the duplicate-commit guard."""
    import pytest as _pytest

    from ocrautomator_ray.functions.exchange import (
        _check_block_invariant_version,
    )

    _check_block_invariant_version()  # the running version is verified
    _check_block_invariant_version("2.49.2")
    with _pytest.raises(RuntimeError, match="one-block-per-partition"):
        _check_block_invariant_version("2.50.0")
    with _pytest.raises(RuntimeError, match="one-block-per-partition"):
        _check_block_invariant_version("3.0.0")
    # prefix must match a version component, not a substring
    with _pytest.raises(RuntimeError):
        _check_block_invariant_version("2.490.0")
