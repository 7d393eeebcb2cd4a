"""Independent property pins for the round-4 additions — stronger than the
SQL-oracle conformance in test_queries.py because the expectations here are
derived from first principles (brute force / closed form), not from a mirror
of the same arithmetic.

* perplexity_buckets: the tiles partition the scored docs into NTILE-sized
  groups AND the tile sequence is monotone in (score DESC, doc_id) order.
* source_overlap_matrix: equals a pure-Python brute force over token 8-gram
  sets (no SQL, no shared code with the engine path).
* temperature_mix: per-source row counts equal the closed-form isqrt quotas.
"""

import math
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"

_TOKEN = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN.split(text.lower()) if t]


@pytest.mark.usefixtures("ray_session")
def test_perplexity_buckets_are_ntile_partition():
    from ocrautomator_ray.functions.lm import PPL_TILES, perplexity_buckets

    df = perplexity_buckets(SF).to_pandas()
    n = len(df)
    q, rem = divmod(n, PPL_TILES)
    sizes = df["bucket"].value_counts().sort_index()
    assert list(sizes.index) == list(range(1, PPL_TILES + 1))
    expected = [q + 1 if i < rem else q for i in range(PPL_TILES)]
    assert list(sizes.to_numpy()) == expected
    # tile labels must be monotone along the (score DESC, doc_id) order
    df = df.sort_values(["lm_score_u", "doc_id"],
                        ascending=[False, True], kind="mergesort")
    b = df["bucket"].to_numpy()
    assert (np.diff(b) >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_source_overlap_matrix_matches_bruteforce():
    from ocrautomator_ray.functions.lm import NGRAM_N, source_overlap_matrix

    t = pq.read_table(DOCS, columns=["source", "text"]).to_pandas()
    grams: dict[str, set] = {}
    for src, text in zip(t["source"], t["text"]):
        toks = _tokens(text)
        s = grams.setdefault(src, set())
        for i in range(max(len(toks) - NGRAM_N + 1, 0)):
            s.add(" ".join(toks[i:i + NGRAM_N]))
    expected = {}
    srcs = sorted(grams)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            k = len(grams[a] & grams[b])
            if k:
                expected[(a, b)] = k

    df = source_overlap_matrix(SF).to_pandas()
    got = {(r.source_a, r.source_b): r.n_shared_grams
           for r in df.itertuples()}
    assert (df["source_a"] < df["source_b"]).all()
    assert got == expected


@pytest.mark.usefixtures("ray_session")
def test_temperature_mix_quotas_closed_form():
    from ocrautomator_ray.functions.mix import TEMP_BUDGET, temperature_mix

    t = pq.read_table(DOCS, columns=["source", "text"]).to_pandas()
    tok = t.assign(n=[len(_tokens(x)) for x in t["text"]]) \
           .groupby("source")["n"].sum().sort_index()
    w = np.array([math.isqrt(int(x)) for x in tok.to_numpy()], np.int64)
    quota = TEMP_BUDGET * w // max(int(w.sum()), 1)
    n_docs = t.groupby("source").size().loc[tok.index].to_numpy()
    expected = pd.Series(np.minimum(quota, n_docs), index=tok.index)

    df = temperature_mix(SF).to_pandas()
    got = df.groupby("source").size().reindex(tok.index, fill_value=0)
    assert (got.to_numpy() == expected.to_numpy()).all()
    assert len(df) <= TEMP_BUDGET


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_merges_serial_reference():
    """The distributed R-round loop vs a serial pure-Python BPE trainer on
    the same corpus: identical merge table (pair choice, tie-breaks, counts),
    and the chosen pair's count strictly covers every later round."""
    import pyarrow.parquet as pq

    from ocrautomator_ray.functions.corpus import (
        BPE_ROUNDS, bpe_train_merges,
    )

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    import re
    docs = [[w for w in re.split(r"\s+", t.lower()) if w] for t in texts]

    def merge_doc(toks, a, b):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + " " + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    expect = []
    cur = docs
    for r in range(1, BPE_ROUNDS + 1):
        counts = {}
        for d in cur:
            for x, y in zip(d, d[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expect.append((r, a, b, c))
        cur = [merge_doc(d, a, b) for d in cur]

    got = bpe_train_merges(sf).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == expect


@pytest.mark.usefixtures("ray_session")
def test_bpe_apply_stats_invariants():
    """Every merge can only shrink a doc's token count; the corpus-wide
    shrink equals the sum of the chosen merges' occurrence counts is NOT
    guaranteed (later merges change earlier pair occurrences), but the
    per-doc counts must match a serial reapply of the trained merges."""
    from ocrautomator_ray.functions.corpus import (
        bpe_apply_stats, bpe_train_merges,
    )

    sf = "/root/testdata/sf0.001"
    got = (bpe_apply_stats(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["n_tokens_merged"] <= got["n_tokens"]).all()
    assert (got["n_tokens_merged"] >= 0).all()
    merges = bpe_train_merges(sf).to_pandas()
    # serial reapply on a sample of docs
    import pyarrow.parquet as pq
    import re
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas().head(50)
    for _, row in t.iterrows():
        toks = [w for w in re.split(r"\s+", row["text"].lower()) if w]
        for _, m in merges.iterrows():
            out, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == m["tok_a"]
                        and toks[i + 1] == m["tok_b"]):
                    out.append(toks[i] + " " + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        g = got[got["doc_id"] == row["doc_id"]].iloc[0]
        assert g["n_tokens_merged"] == len(toks)


@pytest.mark.usefixtures("ray_session")
def test_token_cooc_lift_matches_brute_force():
    """token_cooc_lift equals a pure-Python presence-set recompute."""
    from ocrautomator_ray.functions import lm as L

    SF = "/root/testdata/sf0.001"
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    docs = [set(re.split(r"\s+", t.lower())) - {""} for t in d["text"]]
    # token totals (occurrences, not presence) pick the vocabulary
    occ: dict[str, int] = {}
    for t in d["text"]:
        for w in re.split(r"\s+", t.lower()):
            if w:
                occ[w] = occ.get(w, 0) + 1
    vocab = sorted(sorted(occ), key=lambda w: (-occ[w], w))[:L.PMI_V]
    vs = set(vocab)
    df_cnt = {w: sum(1 for s in docs if w in s) for w in vocab}
    n_docs = len(docs)
    exp = {}
    for s in docs:
        present = sorted(s & vs)
        for i, a in enumerate(present):
            for b in present[i + 1:]:
                exp[(a, b)] = exp.get((a, b), 0) + 1
    got = L.token_cooc_lift(SF).to_pandas()
    assert len(got) == len(exp)
    for a, b, n_ab, n_a, n_b, lift in got.itertuples(index=False):
        assert exp[(a, b)] == n_ab
        assert (n_a, n_b) == (df_cnt[a], df_cnt[b])
        assert lift == n_ab * n_docs * 1_000_000 // (n_a * n_b)


@pytest.mark.usefixtures("ray_session")
def test_ccnet_filter_is_the_set_intersection():
    """ccnet_filter == (en docs) ∩ (bucket ≤ 2 docs), derived from the two
    component operators independently."""
    from ocrautomator_ray.functions import lm as L
    from ocrautomator_ray.functions.text import lang_id

    SF = "/root/testdata/sf0.001"
    ppl = L.perplexity_buckets(SF).to_pandas()
    en = set(lang_id(SF).to_pandas().query("pred_lang == 'en'")["doc_id"])
    exp = set(ppl.loc[ppl["bucket"] <= L.CCNET_KEEP_BUCKETS, "doc_id"]) & en
    got = L.ccnet_filter(SF).to_pandas()
    assert set(got["doc_id"]) == exp
    assert (got["bucket"] <= L.CCNET_KEEP_BUCKETS).all()
