"""Brute-force oracles for the curation operators at sf0.001 (the SQL
oracles in __ray_entry__ are the primary gate; these pin the semantics with
independent pure-Python logic)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions import curate as C

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _grams(text: str, k: int) -> set[str]:
    w = text.lower().split()
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_matches_set_logic(docs):
    got = C.decontaminate(SF).to_pandas().set_index("doc_id")["shared_grams"]
    eval_grams = set()
    for d, t in docs.items():
        if d % C.EVAL_MODULUS == 0:
            eval_grams |= _grams(t, C.DECONTAM_K)
    expected = {}
    for d, t in docs.items():
        if d % C.EVAL_MODULUS != 0:
            n = len(_grams(t, C.DECONTAM_K) & eval_grams)
            if n:
                expected[d] = n
    assert dict(got) == expected
    assert expected, "fixture has no contamination — test is vacuous"


@pytest.mark.usefixtures("ray_session")
def test_hash_split_deterministic_and_proportional(docs):
    df = C.hash_split(SF).to_pandas()
    assert len(df) == len(docs)
    # deterministic: recompute the multiplicative hash independently
    ids = df["doc_id"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        bucket = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)
                  % np.uint64(1000)).astype(np.int64)
    assert (df["bucket"].to_numpy() == bucket).all()
    frac_train = (df["split"] == "train").mean()
    assert 0.9 < frac_train <= 1.0  # 98% nominal, small-sample slack


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_match_python(docs):
    df = C.repetition_stats(SF).to_pandas().set_index("doc_id")
    for d, t in list(docs.items())[:50]:
        lines = t.split("\n")
        words = t.lower().split()
        row = df.loc[d]
        assert row["n_lines"] == len(lines)
        assert row["n_words"] == len(words)
        dl = 1.0 - len(set(lines)) / len(lines)
        assert row["dup_line_frac_u"] == int(np.floor(dl * 1_000_000 + 0.5))
        if words:
            dw = 1.0 - len(set(words)) / len(words)
            assert row["dup_word_frac_u"] == int(np.floor(dw * 1_000_000 + 0.5))
        else:
            assert row["dup_word_frac_u"] == 0


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_rates_and_determinism(docs):
    import pyarrow.parquet as pq

    df = C.stratified_sample(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"]) \
        .to_pandas()
    # every kept row satisfies the keep rule; every satisfying row is kept
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        bucket = (ids * np.uint64(2654435761)) % np.uint64(1 << 32) % np.uint64(1000)
    permille = t["source"].map(C._stratum_permille).to_numpy().astype(np.uint64)
    expected = set(t["doc_id"].to_numpy()[bucket < permille])
    assert set(df["doc_id"]) == expected
    # rerun → identical selection
    again = C.stratified_sample(SF).to_pandas()
    assert set(again["doc_id"]) == expected


@pytest.mark.usefixtures("ray_session")
def test_unicode_whitespace_matches_sql_oracle(tmp_path):
    """Engine tokenization must follow the SQL oracles' RE2 '\\s+' (ASCII
    whitespace) — NBSP/ideographic-space documents previously diverged
    between Arrow's Unicode splitter and DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["foo bar baz foo bar",     # NBSP inside tokens
             "left　right left　right",  # ideographic space
             "plain ascii words only plain",
             "tab\tand\nnewline mix tab"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")

    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    for name in ["repetition_stats", "top_ngrams", "curate_pipeline"]:
        got = qs[name](str(tmp_path)).to_pandas()
        exp = con.execute(osql[name]).df()
        got = got[sorted(got.columns)].sort_values(sorted(got.columns)) \
            .reset_index(drop=True)
        exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)) \
            .reset_index(drop=True)
        assert got.shape == exp.shape, (name, got.shape, exp.shape)
        for c in got.columns:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), (name, c)


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_set_logic(docs):
    got = set(C.incremental_dedup(SF).to_pandas()["doc_id"])
    existing_texts = {t for d, t in docs.items() if d % C.INCR_NEW_MOD != 0}
    expect = set()
    first_new: dict[str, int] = {}
    for d in sorted(docs):
        if d % C.INCR_NEW_MOD == 0:
            first_new.setdefault(docs[d], d)
    for t, d in first_new.items():
        if t not in existing_texts:
            expect.add(d)
    assert got == expect
    assert expect, "fixture must exercise the survivor path"


@pytest.mark.usefixtures("ray_session")
def test_corpus_freq_score_brute_force(docs):
    """Pure-Python oracle: mean corpus frequency of token occurrences."""
    from collections import Counter

    from ocrautomator_ray.functions.corpus import corpus_freq_score

    toks = {d: [w for w in t.lower().split() if w] for d, t in docs.items()}
    c = Counter(w for ws in toks.values() for w in ws)
    T = sum(c.values())
    df = corpus_freq_score(SF).to_pandas().set_index("doc_id")
    for d, ws in toks.items():
        if not ws:
            assert d not in df.index
            continue
        s = sum(c[w] for w in ws)
        assert df.loc[d, "n_tokens"] == len(ws)
        assert df.loc[d, "freq_score_u"] == s * 10**9 // (len(ws) * T)


@pytest.mark.usefixtures("ray_session")
def test_contamination_fraction_set_logic(docs):
    """Pure-Python oracle: per-train-doc distinct-gram totals, eval-shared
    counts, exact integer fraction, and the 70% PaLM flag."""
    got = C.contamination_fraction(SF).to_pandas().set_index("doc_id")
    eval_grams = set()
    for d, t in docs.items():
        if d % C.EVAL_MODULUS == 0:
            eval_grams |= _grams(t, C.DECONTAM_K)
    seen = 0
    for d, t in docs.items():
        g = _grams(t, C.DECONTAM_K)
        if d % C.EVAL_MODULUS == 0 or not g:
            assert d not in got.index
            continue
        seen += 1
        shared = len(g & eval_grams)
        frac = shared * 1_000_000 // len(g)
        assert got.loc[d, "n_grams"] == len(g)
        assert got.loc[d, "shared_grams"] == shared
        assert got.loc[d, "contam_frac_u"] == frac
        assert got.loc[d, "contaminated"] == int(frac >= C.CONTAM_THRESH_U)
    assert seen == len(got)


@pytest.mark.usefixtures("ray_session")
def test_dedup_best_docs_arbitration(tmp_path):
    """Crafted cross-source duplicate groups: the kept copy must be the
    max-priority source (tie -> min doc_id), with the exact copy count —
    the driver corpus has no exact dups, so arbitration is pinned here."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_

    # priorities: _stratum_permille('srcX') = 50 + 90*(ord(X) % 7)
    # src1 -> 50+90*(49%7)=50, src3 -> 50+90*(51%7)=230, src5 -> 410
    rows = [
        (10, "dup text one", "src1"),   # group A: src3 wins (higher pr)
        (11, "dup text one", "src3"),
        (12, "dup text one", "src1"),
        (20, "dup text two", "src5"),   # group B: tie on src5 -> min id 20
        (21, "dup text two", "src5"),
        (30, "unique text", "src1"),    # singleton passes through
    ]
    sfdir = tmp_path / "sf"
    os.makedirs(sfdir)
    pq_.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }), f"{sfdir}/documents.parquet")
    got = (C.dedup_best_docs(str(sfdir)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [11, 20, 30]
    assert got["source"].tolist() == ["src3", "src5", "src1"]
    assert got["n_copies"].tolist() == [3, 2, 1]


@pytest.mark.usefixtures("ray_session")
def test_bm25_index_matches_recompute_and_prunes():
    """The persisted inverted index must answer byte-identically to the
    recompute path, open ONLY the query terms' bucket dirs (proper subset
    of the written buckets), and no-op on a committed rebuild."""
    import os
    import shutil

    from ocrautomator_ray.functions import corpus as CO
    from ocrautomator_ray.functions.dedup import _fnv1a_strings

    idx = CO.bm25_index_dir(SF)
    shutil.rmtree(idx, ignore_errors=True)
    base = CO.bm25_doc0_topk(SF).to_pandas().reset_index(drop=True)
    via_index = CO.bm25_index_topk(SF).to_pandas().reset_index(drop=True)
    assert base.sort_values("rank").reset_index(drop=True).equals(
        via_index.sort_values("rank").reset_index(drop=True))

    q = CO._bm25_query_terms(f"{SF}/documents.parquet")
    buckets = sorted({int(b) for b in _fnv1a_strings(q) % CO.BM25_BUCKETS})
    opened = set(CO.bm25_bucket_fragments(idx, buckets))
    every = set(CO.bm25_bucket_fragments(idx, list(range(CO.BM25_BUCKETS))))
    assert opened and opened < every, (len(opened), len(every))

    s = CO.bm25_index_build(SF)
    assert s["partitions_this_run"] == 0
    shutil.rmtree(idx, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_bm25_index_append_equals_full_rebuild(tmp_path):
    """BM25 appends are EXACT (unlike IVF's frozen-centroid tradeoff):
    postings are doc-local and N/T are sums, so a query over base ∪ epochs
    must equal the recompute answer over the full corpus bit-for-bit; the
    append must also be idempotent and leave the base sink untouched."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from ocrautomator_ray.functions import corpus as CO

    t = pq_.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    first = ids < int(np.median(ids))          # doc0 stays in the base half
    half = tmp_path / "half"
    full = tmp_path / "full"
    os.makedirs(half), os.makedirs(full)
    pq_.write_table(t.filter(pa.array(first)), f"{half}/documents.parquet")
    pq_.write_table(t, f"{full}/documents.parquet")
    appendix = tmp_path / "appendix.parquet"
    pq_.write_table(t.filter(pa.array(~first)), str(appendix))

    idx = CO.bm25_index_dir(str(half))
    shutil.rmtree(idx, ignore_errors=True)
    CO.bm25_index_build(str(half))
    base_stats = CO._read_bm25_stats(idx)

    s1 = CO.bm25_index_append(str(appendix), idx)
    assert s1["partitions_this_run"] > 0
    # stats now cover base + epoch = the full corpus
    assert CO._read_bm25_stats(idx) == CO._bm25_side_stats(
        f"{full}/documents.parquet")
    assert CO._read_bm25_stats(idx) != base_stats

    got = (CO.bm25_index_topk(str(half)).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    want = (CO.bm25_doc0_topk(str(full)).to_pandas()
            .sort_values("rank").reset_index(drop=True))
    assert got.equals(want)

    s2 = CO.bm25_index_append(str(appendix), idx)
    assert s2["partitions_this_run"] == 0
    shutil.rmtree(idx, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_bm25_incomplete_epoch_is_invisible(tmp_path):
    """ADVICE r4: the epoch's stats file is its COMMIT MARKER, written only
    after every postings partition commits. An epoch missing it (a killed
    append) must be invisible to BOTH readers — stats and fragments — so
    queries keep answering from the pre-append index, and the retried
    append must complete the epoch and make it visible atomically."""
    import os
    import shutil

    import pyarrow.parquet as pq_

    from ocrautomator_ray.functions import corpus as CO

    t = pq_.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    half = tmp_path / "half"
    os.makedirs(half)
    n = t.num_rows
    pq_.write_table(t.slice(0, n // 2), f"{half}/documents.parquet")
    appendix = tmp_path / "appendix.parquet"
    pq_.write_table(t.slice(n // 2), str(appendix))

    idx = CO.bm25_index_dir(str(half))
    shutil.rmtree(idx, ignore_errors=True)
    CO.bm25_index_build(str(half))
    base_stats = CO._read_bm25_stats(idx)
    all_buckets = list(range(CO.BM25_BUCKETS))
    base_frags = set(CO.bm25_bucket_fragments(idx, all_buckets))

    # complete the append, then DELETE the marker to simulate the kill
    # window between the last postings commit and the stats write
    s = CO.bm25_index_append(str(appendix), idx)
    epoch = s["epoch_dir"]
    os.remove(CO._bm25_stats_path(epoch))
    assert CO._read_bm25_stats(idx) == base_stats
    assert set(CO.bm25_bucket_fragments(idx, all_buckets)) == base_frags

    # the retried append resumes (no partitions re-run) and recommits the
    # marker; both readers now include the epoch
    s2 = CO.bm25_index_append(str(appendix), idx)
    assert s2["partitions_this_run"] == 0
    assert os.path.exists(CO._bm25_stats_path(epoch))
    assert CO._read_bm25_stats(idx) != base_stats
    assert set(CO.bm25_bucket_fragments(idx, all_buckets)) > base_frags
    shutil.rmtree(idx, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_char_diversity_crafted(tmp_path):
    """Hand-computable docs incl. a non-ASCII codepoint: simpson_u must be
    the exact integer collision index and empty docs must be excluded."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from ocrautomator_ray.functions.text import SIMPSON_SCALE, char_diversity

    rows = [(0, "aaaa"),       # 1 run of 4: 16*1e6 // 16 = 1e6
            (1, "abab"),       # 2+2: (4+4)*1e6 // 16 = 500000
            (2, "abcd"),       # 4 singletons: 4*1e6 // 16 = 250000
            (3, "naïve"),      # 5 distinct codepoints: 5*1e6 // 25
            (4, "")]           # excluded
    sfdir = tmp_path / "sf"
    os.makedirs(sfdir)
    pq_.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), f"{sfdir}/documents.parquet")
    got = (char_diversity(str(sfdir)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2, 3]
    assert got["n_chars"].tolist() == [4, 4, 4, 5]
    assert got["distinct_chars"].tolist() == [1, 2, 4, 5]
    assert got["simpson_u"].tolist() == [
        SIMPSON_SCALE, SIMPSON_SCALE // 2, SIMPSON_SCALE // 4,
        5 * SIMPSON_SCALE // 25]
