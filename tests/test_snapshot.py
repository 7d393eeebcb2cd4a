"""Pytest oracles for the cross-snapshot operators (functions/snapshot.py)
and the feature-hashing vectors (mix.hashed_doc_vectors) at sf0.001. The SQL
oracles in __ray_entry__ are the primary gate; these pin the semantics with
independent logic: the near-dup drop rule against the FULL (unpruned)
minhash pair set, the drift formula against a pure-pandas mirror, and the
hashing trick against a per-token Python recompute."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions import mix as M
from ocrautomator_ray.functions import snapshot as S
from ocrautomator_ray.functions.curate import INCR_NEW_MOD
from ocrautomator_ray.functions.dedup import (
    _hash_tokens,
    minhash_lsh_dups,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_incremental_neardup_matches_full_pair_set_drop_rule():
    """The early committed×committed pruning must not lose any new-touching
    pair: applying the drop rule to the FULL verified pair set must equal the
    operator's output exactly."""
    full = minhash_lsh_dups(SF).to_pandas()
    a = full["doc_a"].to_numpy()
    b = full["doc_b"].to_numpy()
    drops = np.concatenate([
        b[b % INCR_NEW_MOD == 0],
        a[(a % INCR_NEW_MOD == 0) & (b % INCR_NEW_MOD != 0)],
    ])
    expect = (pd.Series(drops).value_counts().rename_axis("doc_id")
              .reset_index(name="n_partners")
              .sort_values("doc_id").reset_index(drop=True))
    got = (S.incremental_neardup(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    assert got["n_partners"].tolist() == expect["n_partners"].tolist()
    # every dropped doc is from the new shard
    assert (got["doc_id"] % INCR_NEW_MOD == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_corpus_drift_brute_force():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source", "text"]).to_pandas()
    rows = []
    for src, g in t.groupby("source"):
        c_old: dict[str, int] = {}
        c_new: dict[str, int] = {}
        for did, txt in zip(g["doc_id"], g["text"]):
            side = c_new if did % INCR_NEW_MOD == 0 else c_old
            for w in txt.lower().split():
                side[w] = side.get(w, 0) + 1
        t_old, t_new = sum(c_old.values()), sum(c_new.values())
        s_abs = sum(abs(c_new.get(w, 0) * t_old - c_old.get(w, 0) * t_new)
                    for w in set(c_old) | set(c_new))
        drift = -1 if t_old * t_new == 0 \
            else s_abs * S.DRIFT_SCALE // (t_old * t_new)
        rows.append((src, t_old, t_new, drift))
    expect = (pd.DataFrame(rows,
                           columns=["source", "t_old", "t_new", "drift_u"])
              .sort_values("source").reset_index(drop=True))
    got = (S.corpus_drift(SF).to_pandas()
           .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"t_old": int, "t_new": int, "drift_u": int}), expect)
    # drift is a normalized L1 distance: within [0, 2e6] when defined
    d = got["drift_u"].to_numpy()
    assert ((d >= 0) & (d <= 2 * S.DRIFT_SCALE) | (d == -1)).all()


@pytest.mark.usefixtures("ray_session")
def test_hashed_doc_vectors_brute_force():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    got = (M.hashed_doc_vectors(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(t)
    sample = t.sort_values("doc_id").head(50)
    for _, row in sample.iterrows():
        toks = row["text"].lower().split()
        v = np.zeros(M.HASH_DIM, np.int64)
        if toks:
            h = _hash_tokens(toks)
            bucket = (h % np.uint64(M.HASH_DIM)).astype(np.int64)
            sign = np.where((h >> np.uint64(M._HASH_SIGN_SHIFT))
                            & np.uint64(1) == 1, -1, 1)
            np.add.at(v, bucket, sign)
        g = got[got["doc_id"] == row["doc_id"]].iloc[0]
        assert g["n_tokens"] == len(toks)
        assert [g[f"v_{j}"] for j in range(M.HASH_DIM)] == v.tolist()
    # parity invariant: sum(v) ≡ n_tokens (mod 2) — every token adds ±1
    vs = got[[f"v_{j}" for j in range(M.HASH_DIM)]].to_numpy()
    assert ((vs.sum(axis=1) - got["n_tokens"].to_numpy()) % 2 == 0).all()
    assert (np.abs(vs).sum(axis=1) <= got["n_tokens"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_incremental_neardup_indexed_matches_plain(tmp_path):
    """The persisted-signature-index variant must be row-identical to the
    recompute-everything operator, the index must hold ONLY committed-side
    docs (the new shard is never persisted), and a re-build over a committed
    index must be a pure no-op (no data file rewritten)."""
    import os

    idx = str(tmp_path / "lsh_index")
    plain = (S.incremental_neardup(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    got = (S.incremental_neardup_indexed(SF, index_dir=idx).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, plain)

    data_dir = os.path.join(idx, "data")
    ids = pq.read_table(data_dir, columns=["doc_id"])["doc_id"].to_numpy()
    assert len(ids) > 0 and (ids % INCR_NEW_MOD != 0).all()
    bk = pq.read_table(data_dir, columns=["bk_0"])
    assert bk.num_rows == len(ids)

    def snap():
        out = {}
        for root, _, files in os.walk(data_dir):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = snap()
    summary = S.neardup_index_build(SF, index_dir=idx)
    assert summary["partitions_this_run"] == 0
    assert snap() == before
    got2 = (S.incremental_neardup_indexed(SF, index_dir=idx).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, plain)


@pytest.mark.usefixtures("ray_session")
def test_pair_keep_none_default_unchanged():
    """pair_keep=None (every existing caller) must equal an always-true
    predicate — pins that the hook's default path is a no-op."""
    base = (minhash_lsh_dups(SF).to_pandas()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    hooked = (minhash_lsh_dups(SF, pair_keep=lambda a, b: np.ones(len(a),
                                                                 bool))
              .to_pandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(base, hooked)


@pytest.mark.usefixtures("ray_session")
def test_neardup_index_partial_build_resumes(tmp_path):
    """Crash-window drill for the signature index: a build that died after
    committing some partitions (data written, manifests missing for the
    rest) must resume by recomputing ONLY the missing partitions, and the
    resumed index must answer the query identically."""
    import os

    idx = str(tmp_path / "lsh")
    full = S.neardup_index_build(SF, index_dir=idx)
    total = full["partitions_committed_total"]
    assert total >= 4
    baseline = (S.incremental_neardup_indexed(SF, index_dir=idx)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # simulate the crash window: two partitions' manifests vanish (data
    # files may or may not exist — remove one of each kind)
    os.remove(os.path.join(idx, "manifest", "part-00000.json"))
    os.remove(os.path.join(idx, "manifest", "part-00001.json"))
    os.remove(os.path.join(idx, "data", "part-00001.parquet"))
    resumed = S.neardup_index_build(SF, index_dir=idx)
    assert resumed["partitions_this_run"] == 2
    assert resumed["partitions_committed_total"] == total
    after = (S.incremental_neardup_indexed(SF, index_dir=idx)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(after, baseline)


@pytest.mark.usefixtures("ray_session")
def test_snapshot_changelog_statuses():
    """Set-logic recompute: every status class matches the id arithmetic,
    and 'changed' appears exactly where the mutation bites."""
    import pandas as pd

    SF = "/root/testdata/sf0.001"
    from ocrautomator_ray.functions.snapshot import snapshot_changelog

    df = snapshot_changelog(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy()
    assert set(df["doc_id"]) == set(ids.tolist())      # full id universe
    by = dict(zip(df["doc_id"], df["status"]))
    text = dict(zip(docs["doc_id"], docs["text"]))
    for i in ids.tolist():
        if i % 3 == 0:
            exp = "added"
        elif i % 3 == 1:
            exp = "removed"
        elif i % 7 == 0 and text[i] != "":
            exp = "changed"          # leading token dropped in the new side
        else:
            exp = "unchanged"
        assert by[i] == exp, (i, by[i], exp)
    assert (df["status"] == "changed").any()


@pytest.mark.usefixtures("ray_session")
def test_novelty_stats_set_logic():
    """Brute-force recompute: novel = new-doc gram occurrences whose gram
    appears in no committed doc."""
    import re

    import pandas as pd

    from ocrautomator_ray.functions.curate import INCR_NEW_MOD
    from ocrautomator_ray.functions.lm import NGRAM_N
    from ocrautomator_ray.functions.snapshot import novelty_stats

    SF = "/root/testdata/sf0.001"
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    grams = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = [w for w in re.split(r"\s+", t.lower()) if w]
        grams[int(i)] = [" ".join(toks[p:p + NGRAM_N])
                         for p in range(max(len(toks) - NGRAM_N + 1, 0))]
    committed = set()
    for i, gs in grams.items():
        if i % INCR_NEW_MOD != 0:
            committed.update(gs)
    got = novelty_stats(SF).to_pandas().set_index("doc_id")
    exp_ids = {i for i, gs in grams.items()
               if i % INCR_NEW_MOD == 0 and gs}
    assert set(got.index) == exp_ids
    for i in exp_ids:
        gs = grams[i]
        novel = sum(1 for g in gs if g not in committed)
        assert got.loc[i, "n_grams"] == len(gs)
        assert got.loc[i, "n_novel"] == novel
