"""Property-based tests (hypothesis) for the round-2 pure kernels — no Ray
session needed: NTILE bucket assignment vs DuckDB, the Misra-Gries compress
sandwich invariant, winnowing vs its SQL mirror on arbitrary ASCII text, the
FNV SQL fold vs the Python reference, and chunk-offset arithmetic."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 200))
def test_ntile_matches_duckdb_for_any_group_size(n):
    from ocrautomator_ray.functions.relational4 import NTILE_N, _ntile

    got = _ntile(np.arange(n), np.full(n, n))
    exp = [r[0] for r in duckdb.sql(
        f"SELECT NTILE({NTILE_N}) OVER (ORDER BY i) FROM range({n}) t(i)"
    ).fetchall()]
    assert list(got) == exp


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(1, 10_000), min_size=0, max_size=80))
def test_mg_compress_sandwich_invariant(counts):
    """After compression: ≤k counters, every kept estimate underestimates its
    true count by at most the reported err, and only counts > err survive."""
    from ocrautomator_ray.functions.sketch import _mg_compress

    k = 7
    toks = np.array([f"t{i}" for i in range(len(counts))], dtype=object)
    cnt = np.array(counts, dtype=np.int64)
    kt, kc, err = _mg_compress(toks, cnt, k)
    assert len(kt) <= k
    true = dict(zip(toks, cnt))
    for t, c in zip(kt, kc):
        assert c >= 1
        assert c <= true[t] <= c + err
    # MG guarantee: anything fully forgotten had true count ≤ err
    for t in set(toks) - set(kt):
        assert true[t] <= err


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=120))
def test_winnowing_sql_mirror_on_arbitrary_ascii(text):
    """The doc_fingerprint SQL oracle is an exact mirror for ANY printable
    ASCII input, not just the driver corpus."""
    from ocrautomator_ray.functions.text import SQL_DOC_FINGERPRINT, _winnow_one

    fps = _winnow_one(text.encode())
    n_fp = len(fps)
    fp_xor = int(np.bitwise_xor.reduce(fps).view(np.int64)) if n_fp else 0

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    row = con.sql(SQL_DOC_FINGERPRINT).fetchall()[0]
    assert (row[1], row[2]) == (n_fp, fp_xor), text


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=60))
def test_sql_fnv_fold_matches_python(data):
    from ocrautomator_ray.functions.dedup import (
        _FNV_OFFSET_INT,
        _FNV_PRIME_INT,
        _U64_MASK,
        _sql_fnv1a,
    )

    # printable-safe transport: feed the bytes as ascii codepoints via a
    # one-char-per-byte latin1 string (ascii() in DuckDB = codepoint)
    try:
        s = data.decode("latin1")
        if any(ord(c) > 126 or ord(c) < 32 for c in s):
            return  # substr/ascii transport is only exact for printable ASCII
    except UnicodeDecodeError:
        return
    h = _FNV_OFFSET_INT
    for b in data:
        h = ((h ^ b) * _FNV_PRIME_INT) & _U64_MASK
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_sql_fnv1a('s')} FROM (SELECT ? AS s)", [s]
    ).fetchall()[0][0]
    assert int(got) == h


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="ab", min_size=1, max_size=3),
                         min_size=1, max_size=12),
                min_size=1, max_size=6))
def test_chunk_offsets_reconstruct(token_lists):
    """doc_chunks' offset arithmetic re-joins to the exact input text for any
    token layout, and every chunk holds 1..CHUNK_TOKENS tokens."""
    import pyarrow.compute as pc

    from ocrautomator_ray.functions.corpus import CHUNK_TOKENS
    from ocrautomator_ray.functions import corpus

    texts = [" ".join(toks) for toks in token_lists]
    _ = corpus  # the kernel under test is the same offset arithmetic
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    toks = pc.split_pattern(t["text"], " ").combine_chunks()
    flat = toks.values
    off = toks.offsets.to_numpy().astype(np.int64)
    ntok = np.diff(off)
    nchunks = -(-ntok // CHUNK_TOKENS)
    total = int(nchunks.sum())
    starts = np.repeat(np.cumsum(nchunks) - nchunks, nchunks)
    chunk_no = np.arange(total, dtype=np.int64) - starts
    c_start = np.repeat(off[:-1], nchunks) + chunk_no * CHUNK_TOKENS
    offsets = np.append(c_start, off[-1]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    chunks = pc.binary_join(lists, " ").to_pylist()
    # reconstruct each doc from its chunks
    docs = np.repeat(np.arange(len(texts)), nchunks)
    for i, text in enumerate(texts):
        mine = [c for c, d in zip(chunks, docs) if d == i]
        assert " ".join(mine) == text


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=200),
       st.integers(0, 10_000))
def test_mix_hash_matches_sql_mirror(ids, seed):
    """mix_hash's uint64 wrap-around arithmetic equals the HUGEINT SQL
    mirror for arbitrary ids and seeds."""
    from ocrautomator_ray.functions.mix import mix_hash, sql_mix_hash

    got = mix_hash(np.array(ids, dtype=np.int64), seed)
    expr = sql_mix_hash("i", seed)
    exp = [r[0] for r in duckdb.sql(
        f"SELECT {expr} FROM (SELECT unnest({list(ids)}) AS i)").fetchall()]
    assert list(got) == exp


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-5, 5), min_size=1, max_size=100),
       st.lists(st.integers(1, 50), min_size=1, max_size=100))
def test_centroid_floor_div_matches_sql(sums, ns):
    """(2s+n) floor-div 2n == FLOOR((2.0*s+n)/(2*n)) — the exact-int rounded
    centroid used by embedding_outliers, incl. negative sums."""
    k = min(len(sums), len(ns))
    s = np.array(sums[:k], np.int64) * 1_000_000
    n = np.array(ns[:k], np.int64)
    got = np.floor_divide(2 * s + n, 2 * n)
    for i in range(k):
        exp = duckdb.sql(
            f"SELECT CAST(FLOOR((2.0*{int(s[i])} + {int(n[i])}) / "
            f"(2*{int(n[i])})) AS BIGINT)").fetchone()[0]
        assert got[i] == exp


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=300, unique=True))
def test_shuffle_bucket_offsets_rank_is_permutation(ids):
    """The bucket + driver-prefix-offset ranking (seeded_shuffle's core)
    yields exactly ROW_NUMBER() - 1 over (hash, id) for any id set."""
    from ocrautomator_ray.functions.mix import (
        SHUFFLE_BUCKETS, SHUFFLE_SEED, _BUCKET_WIDTH, mix_hash,
    )

    a = np.array(ids, np.int64)
    h = mix_hash(a, SHUFFLE_SEED)
    b = h // _BUCKET_WIDTH
    offsets = np.zeros(SHUFFLE_BUCKETS + 1, np.int64)
    np.add.at(offsets, b + 1, 1)
    offsets = np.cumsum(offsets)
    # emulate per-bucket local ranking (any partitioning of rows by bucket
    # gives the same result; here one block holds all buckets)
    order = np.lexsort((a, h, b))
    bs = b[order]
    starts = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
    local = np.arange(len(bs)) - np.repeat(starts, np.diff(np.r_[starts, len(bs)]))
    pos = offsets[bs] + local
    # reference: global rank by (hash, id)
    ref_order = np.lexsort((a, h))
    ref_pos = np.empty(len(a), np.int64)
    ref_pos[ref_order] = np.arange(len(a))
    got = np.empty(len(a), np.int64)
    got[order] = pos
    assert (got == ref_pos).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.sampled_from("abcd")),
                min_size=1, max_size=60))
def test_incremental_dedup_verdict_on_any_grouping(rows):
    """The first-row verdict (order by v = existing ? -1 : id inside each
    (hash, text) group) equals the set-logic spec for any id/text multiset."""
    from ocrautomator_ray.functions.curate import (
        INCR_NEW_MOD,
        first_per_hash_group,
    )

    ids = np.array([i for i, _ in rows], np.int64)
    txt = np.array([t for _, t in rows], dtype=object)
    # weak 2-bucket "hash" ON PURPOSE: forces collision runs through the
    # text-compare path
    h = np.array([ord(t[0]) % 2 for _, t in rows], np.int64)
    v = np.where(ids % INCR_NEW_MOD == 0, ids, -1)
    first = first_per_hash_group(h, txt, v)
    got = set(ids[first[v[first] >= 0]].tolist())
    # spec
    existing = {t for i, t in rows if i % INCR_NEW_MOD != 0}
    firsts = {}
    for i, t in sorted(rows):
        if i % INCR_NEW_MOD == 0:
            firsts.setdefault(t, i)
    expect = {i for t, i in firsts.items() if t not in existing}
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 40)),
                min_size=0, max_size=120))
def test_fingerprint_pair_kernel_matches_brute_force(rows):
    """The size-stacked pair generation over (fp, doc) rows equals the
    brute-force pair set with the hot-fingerprint cap applied."""
    import itertools

    import pyarrow as pa

    from ocrautomator_ray.functions.text import FP_PAIR_CAP

    # dedupe (fp, doc) occurrences as the real op's distinct fingerprints do
    uniq = sorted(set(rows))
    fp = np.array([f for f, _ in uniq], np.int64)
    ids = np.array([d for _, d in uniq], np.int64)
    # reproduce pairs_block's kernel inline (it is a closure)
    order = np.lexsort((ids, fp))
    fps, idss = fp[order], ids[order]
    starts = np.nonzero(np.r_[True, fps[1:] != fps[:-1]])[0] if len(fps) else np.empty(0, np.int64)
    run_len = np.diff(np.r_[starts, len(fps)]) if len(fps) else np.empty(0, np.int64)
    got = set()
    for ln in range(2, FP_PAIR_CAP + 1):
        sel = starts[run_len == ln]
        if sel.size == 0:
            continue
        g = idss[sel[:, None] + np.arange(ln)[None, :]]
        ia, ib = np.triu_indices(ln, k=1)
        for a, b in zip(g[:, ia].ravel(), g[:, ib].ravel()):
            got.add((min(a, b), max(a, b)))
    # brute force
    expect = set()
    by_fp = {}
    for f, d in uniq:
        by_fp.setdefault(f, []).append(d)
    for f, ds_ in by_fp.items():
        if 2 <= len(ds_) <= FP_PAIR_CAP:
            for a, b in itertools.combinations(ds_, 2):
                expect.add((min(a, b), max(a, b)))
    assert got == expect


def test_bucket_pair_chunking_is_lossless_on_hot_buckets():
    """_bucket_pair_indices chunks its C(s,2) emission (~_PAIR_CHUNK pairs
    per yield) to bound memory on degenerate corpora; the union of chunks
    must equal the full pair set exactly — the lossless claim the MinHash
    verify depends on. Exercised well above the chunk threshold by shrinking
    the chunk size, and across the mixed small/hot bucket layout."""
    import numpy as np

    from ocrautomator_ray.functions import dedup as D

    rng = np.random.default_rng(7)
    # one hot bucket (s=200 → 19,900 pairs), several small ones, singletons
    bid = np.concatenate([np.zeros(200, np.int64),
                          np.ones(5, np.int64),
                          np.full(3, 2, np.int64),
                          np.array([3], np.int64)])
    key = np.zeros(len(bid), np.int64)
    perm = rng.permutation(len(bid))
    bid = bid[perm]
    old_chunk = D._PAIR_CHUNK
    D._PAIR_CHUNK = 256  # force both the group-axis and triu-row chunk paths
    try:
        got = set()
        for ia, ib in D._bucket_pair_indices(bid, key):
            assert len(ia) == len(ib)
            assert len(ia) <= 2 * 256 + 200  # bounded per yield (row granularity)
            for a, b in zip(ia.tolist(), ib.tolist()):
                assert a != b
                got.add((min(a, b), max(a, b)))
    finally:
        D._PAIR_CHUNK = old_chunk
    want = set()
    for b in np.unique(bid):
        rows = np.nonzero(bid == b)[0]
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                want.add((min(rows[i], rows[j]), max(rows[i], rows[j])))
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b"]), max_size=20),
                min_size=1, max_size=8))
def test_dup_ngram_removal_matches_brute_force(token_lists):
    """The three-stage removal chain (window explode → duplicated-window
    flagging → coverage-diff rebuild) run single-block equals a brute-force
    reference for any token layout: every token covered by a corpus-
    duplicated 8-gram is deleted, everything else survives in order."""
    from collections import Counter

    from ocrautomator_ray.functions.lm import (
        NGRAM_N,
        _dup_window_block,
        _remove_covered_block,
        _window_rows,
    )

    texts = [" ".join(toks) for toks in token_lists]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    dup = _dup_window_block(_window_rows(t))
    tag = pa.table({"doc_id": t["doc_id"],
                    "pos": pa.array([-1] * len(texts), pa.int64()),
                    "text": t["text"]})
    got = _remove_covered_block(
        pa.concat_tables([tag, dup])).to_pandas().set_index("doc_id")

    grams = Counter()
    for toks in token_lists:
        for p in range(max(len(toks) - NGRAM_N + 1, 0)):
            grams[tuple(toks[p:p + NGRAM_N])] += 1
    for i, toks in enumerate(token_lists):
        covered = set()
        for p in range(max(len(toks) - NGRAM_N + 1, 0)):
            if grams[tuple(toks[p:p + NGRAM_N])] > 1:
                covered.update(range(p, p + NGRAM_N))
        kept = [w for j, w in enumerate(toks) if j not in covered]
        row = got.loc[i]
        assert row["n_tokens"] == len(toks)
        assert row["n_removed"] == len(toks) - len(kept)
        assert row["clean_text"] == " ".join(kept)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=30),
                min_size=1, max_size=8),
       st.integers(1, 6))
def test_oov_vocab_and_stats_match_brute_force(token_lists, k):
    """corpus_top_vocab's block-local top-K candidate rule and the
    searchsorted membership probe equal a brute-force reference for any
    token layout and vocab size — including ties at the rank-K boundary
    (count DESC, token ASC, the SQL ORDER BY)."""
    from collections import Counter

    import ocrautomator_ray.functions.lm as lm

    texts = [" ".join(toks) for toks in token_lists]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    # single-block path: the candidate rule must already be exact
    cand = lm._vocab_top_block(lm._vocab_rows(t)).to_pandas()
    counts = Counter(w for toks in token_lists for w in toks)
    want = sorted(counts, key=lambda w: (-counts[w], w))[:lm.VOCAB_K]
    got = cand.sort_values(["k", "w"], ascending=[False, True])["w"].tolist()
    assert got == want
    vocab = np.sort(np.array(want[:k], dtype=object))
    for i, toks in enumerate(token_lists):
        if not toks:
            continue
        n_oov = sum(1 for w in toks if w not in set(want[:k]))
        idx = np.searchsorted(vocab, np.array(toks, dtype=object)).clip(
            max=len(vocab) - 1)
        assert int((vocab[idx] != np.array(toks, dtype=object)).sum()) == n_oov
