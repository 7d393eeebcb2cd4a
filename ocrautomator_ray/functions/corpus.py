"""Corpus-level term statistics: TF-IDF top terms per document.

The corpus-relative signal (document frequency) makes this a genuinely
distributed computation — unlike the per-document ops in functions/text.py,
no single batch can score a term without the global DF table. The layout:

1. TF: one vectorized Arrow pass per batch. Each document's text lives in
   exactly one input row, so a per-batch explode + group count yields FINAL
   (doc_id, term, tf) rows — no cross-batch combine needed.
2. DF attach: ONE hash exchange on ``term`` co-locates every (doc, term) row
   of a term, so the block computes df (= the term's row count, since rows
   are doc-distinct) and attaches it in place — no separate DF aggregation,
   no join, and the tf lineage executes exactly once. (A first cut used
   ``Dataset.join(tf, df_table)``: Ray re-ran the tokenize lineage for each
   consumer and added a 200-partition aggregate + join — ~2× the work for
   the same answer.) Skew note: a universal stopword's rows all land in one
   partition; at extreme corpus sizes heavy terms would need a salted
   two-phase count with the heavy-hitter df table broadcast back.
3. Per-doc ranking: a second hash exchange on ``doc_id``, vectorized
   sort + rank, top-k emitted.

Ranking uses the raw rational tf/df as an IEEE double (ORDER BY tf/df DESC,
term): with N fixed per corpus, tf·N/df and tf/df induce the same order, both
engines compute the identical double division, and equal scores tie-break on
the term string — deterministic and oracle-exact without any ``log`` call
(libm rounding differences would make true log-idf hash-unstable).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ocrautomator_ray.functions.dedup import _tokenize_re2
from ocrautomator_ray.functions.exchange import (auto_partitions,
                                                    per_key_blocks,
                                                    pruned_read,
                                                    stripped_read)
from ocrautomator_ray.functions.filters import WORD_RE

TFIDF_TOP_K = 3


def tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    path = f"{sf_dir}/documents.parquet"
    docs = pruned_read(path, ["doc_id", "text"])

    def tf_rows(t: pa.Table) -> pa.Table:
        # '\S+' extraction == split on '\s+' minus empty strings — all-C++
        # kernels, no per-doc Python lists
        toks = pc.split_pattern_regex(t["text"], pattern=r"\s+")
        terms = pc.list_flatten(toks)
        flat = pa.table({
            "doc_id": pc.take(t["doc_id"], pc.list_parent_indices(toks)),
            "term": terms,
        }).filter(pc.not_equal(terms, ""))
        g = pa.TableGroupBy(flat, ["doc_id", "term"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["doc_id", "term", "tf"])

    tf = docs.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)

    def attach_df(block: pa.Table) -> pa.Table:
        # rows are (doc, term)-distinct, so the term's row count IS its df;
        # one np.unique over the term column replaces the former pandas
        # transform("size") (the Arrow→pandas block conversion was the cost)
        if block.num_rows == 0:
            return block.append_column("df", pa.array([], pa.int64()))
        term = block["term"].to_numpy(zero_copy_only=False)
        _, inv, cnts = np.unique(term, return_inverse=True, return_counts=True)
        return block.append_column(
            "df", pa.array(cnts[inv].astype(np.int64), pa.int64()))

    joined = per_key_blocks(tf, ["term"], attach_df,
                            num_partitions=auto_partitions(path))

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.append_column("rank", pa.array([], pa.int64()))
        # same IEEE double both engines: CAST(tf AS DOUBLE)/CAST(df AS DOUBLE)
        score = pc.divide(pc.cast(block["tf"], pa.float64()),
                          pc.cast(block["df"], pa.float64()))
        idx = pc.sort_indices(
            block.append_column("_score", score),
            sort_keys=[("doc_id", "ascending"), ("_score", "descending"),
                       ("term", "ascending")])
        g = block.take(idx)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(ids)])
        rank = (np.arange(len(ids), dtype=np.int64)
                - np.repeat(starts, run_len) + 1)
        keep = rank <= TFIDF_TOP_K
        return g.filter(pa.array(keep)).append_column(
            "rank", pa.array(rank[keep], pa.int64()))

    return per_key_blocks(joined, ["doc_id"], rank_block,
                          num_partitions=auto_partitions(path))


SQL_TFIDF = f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '{WORD_RE}')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
df AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
s AS (
    SELECT doc_id, tf.term AS term, tf, df,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY CAST(tf AS DOUBLE)/CAST(df AS DOUBLE) DESC, tf.term
           ) AS rank
    FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, rank FROM s WHERE rank <= {TFIDF_TOP_K}
"""


# --------------------------------------------------------------------------
# doc_chunks — fixed-size token-window chunking (the LLM sequence-packing
# explode): each document splits into consecutive CHUNK_TOKENS-token chunks.
# Fully vectorized: one split kernel, chunk boundaries computed by numpy
# offset arithmetic over the FLAT token buffer, and the chunk strings
# re-joined with a single Arrow binary_join over a re-offsetted ListArray —
# no per-document Python loop and no copy of the token values. Embarrassingly
# parallel (no shuffle at all); output rows ≈ tokens/CHUNK_TOKENS.
# --------------------------------------------------------------------------

CHUNK_TOKENS = 32


def doc_chunks(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_no": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "n_chunk_tokens": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        # split on the single literal space, matching SQL string_split —
        # consecutive spaces would produce empty tokens identically on both
        # engines (the corpus is single-spaced)
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy().astype(np.int64)
        ntok = np.diff(off)
        nchunks = -(-ntok // CHUNK_TOKENS)          # ceil; ≥1 (split ≥1 token)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)

        total = int(nchunks.sum())
        starts = np.repeat(np.cumsum(nchunks) - nchunks, nchunks)
        chunk_no = np.arange(total, dtype=np.int64) - starts
        c_start = np.repeat(off[:-1], nchunks) + chunk_no * CHUNK_TOKENS
        c_end = np.minimum(c_start + CHUNK_TOKENS, np.repeat(off[1:], nchunks))
        # chunks tile each doc contiguously and docs are contiguous in the
        # flat buffer, so c_start plus the final end is a valid offsets array
        offsets = np.append(c_start, off[-1]).astype(np.int32)
        chunk_lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                               flat)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, nchunks), pa.int64()),
            "chunk_no": pa.array(chunk_no, pa.int64()),
            "chunk_text": pc.binary_join(chunk_lists, " "),
            "n_chunk_tokens": pa.array(c_end - c_start, pa.int64()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOC_CHUNKS = f"""
SELECT doc_id, chunk_no,
       array_to_string(toks[chunk_no*{CHUNK_TOKENS}+1 :
                            chunk_no*{CHUNK_TOKENS}+{CHUNK_TOKENS}], ' ')
           AS chunk_text,
       least(len(toks) - chunk_no*{CHUNK_TOKENS}, {CHUNK_TOKENS})
           AS n_chunk_tokens
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     LATERAL (SELECT unnest(range(0,
         CAST(ceil(len(toks)/{CHUNK_TOKENS}.0) AS BIGINT))) AS chunk_no) u
"""


# --------------------------------------------------------------------------
# pack_sequences — LLM sequence packing: assign each document (in doc_id
# order) to the training sequence its running token budget lands in
# (seq_id = exclusive-prefix-sum(n_tokens) // SEQ_LEN). This is the one
# window shape nothing else in the engine needed: a GLOBAL ordered prefix
# sum with no partition key. Distributed as the classic two-phase scan:
#
#   1. per-doc token counts, bucketed by doc_id // PACK_BUCKET;
#   2. per-bucket sums (a tiny groupby — one row per bucket) pulled to the
#      driver and turned into exclusive bucket offsets (driver holds
#      #docs / PACK_BUCKET rows, NOT docs — pick PACK_BUCKET so that stays
#      millions at worst; offsets broadcast once via ray.put);
#   3. one hash exchange on bucket, then a vectorized in-block cumsum plus
#      the bucket's offset.
#
# Every float-free step is exact int64, so the SQL window oracle
# (SUM() OVER (ORDER BY doc_id)) matches hash-exactly.
# --------------------------------------------------------------------------

SEQ_LEN = 512
PACK_BUCKET = 64


def pack_sequences(sf_dir: str) -> rd.Dataset:
    import ray

    from ocrautomator_ray.functions.text import TOKEN_RE

    path = f"{sf_dir}/documents.parquet"

    def counts(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64())
        bucket = pc.divide(t["doc_id"], PACK_BUCKET)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n,
                         "bucket": pc.cast(bucket, pa.int64())})

    # materialize the REDUCED table (three int64 columns, one row per doc —
    # never the text) so the two phases don't tokenize the corpus twice; at
    # 100 TB this is ~24 B/doc in the object store, spillable
    cnt = pruned_read(path, ["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # bucket sums: per-batch partials merged on the driver — the partial set
    # is ≤ blocks × buckets-per-block rows, so no shuffle is needed at all
    def bucket_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["bucket", "n_tokens"]),
                            "bucket").aggregate([("n_tokens", "sum")])
        return g.rename_columns(["bucket", "s"])

    rows = cnt.map_batches(bucket_partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    bk = np.array([r["bucket"] for r in rows], dtype=np.int64)
    sm = np.array([r["s"] for r in rows], dtype=np.int64)
    order = np.argsort(bk, kind="stable")
    bk, sm = bk[order], sm[order]
    buckets, starts = np.unique(bk, return_index=True)
    sums = np.add.reduceat(sm, starts)
    offsets = np.cumsum(sums) - sums          # exclusive prefix per bucket
    off_ref = ray.put((buckets, offsets))

    assign_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                               ("seq_id", pa.int64())])

    def assign(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return assign_schema.empty_table()
        bks, offs = ray.get(off_ref)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")
        ids = ids[order]
        n = block["n_tokens"].to_numpy(zero_copy_only=False)[order]
        bucket = block["bucket"].to_numpy(zero_copy_only=False)[order]
        ex_cum = np.cumsum(n) - n
        # doc_id order implies bucket order, so the first row of each bucket
        # marks where the in-block cumsum must restart from the bucket offset
        first = np.concatenate(([True], bucket[1:] != bucket[:-1]))
        run_len = np.diff(np.append(np.flatnonzero(first), len(bucket)))
        in_bucket = ex_cum - np.repeat(ex_cum[first], run_len)
        prefix = offs[np.searchsorted(bks, bucket)] + in_bucket
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "seq_id": pa.array(prefix // SEQ_LEN, pa.int64()),
        })

    return per_key_blocks(cnt, ["bucket"], assign,
                          num_partitions=auto_partitions(path))


def _pack_sql() -> str:
    from ocrautomator_ray.functions.text import TOKEN_RE

    return f"""
SELECT doc_id, n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens) // {SEQ_LEN} AS BIGINT) AS seq_id
FROM (
    SELECT doc_id, len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens
    FROM documents
)
"""


SQL_PACK_SEQUENCES = _pack_sql()


# --------------------------------------------------------------------------
# corpus_freq_score — CCNet-style frequency quality proxy, exact-int
# --------------------------------------------------------------------------

def corpus_freq_score(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, freq_score_u): mean corpus frequency of the doc's
    token occurrences, ×1e9 and floored — a language-model-free stand-in for
    CCNet's perplexity filter (docs of rare gibberish score low, docs of
    common words score high; both tails are filter candidates).

    score = floor( (Σ_i c(w_i)) · 1e9 / (n · T) ) where c(w) is the corpus
    count of token w, n the doc's token count, T the corpus total — all
    integers, so the distributed result is bit-exact vs the SQL oracle.
    Shapes: per-batch (token, doc) multiplicity combiner → ONE token-keyed
    exchange computes c per group and emits (doc_id, k·c, k) partials → a
    doc-keyed groupby sums them; T comes from a one-column side pass that
    reduces to one int per batch. int64 bound: Σc·1e9 < 2^63 holds through
    sf10-scale corpora (Σc ≤ n·max_c ≈ 3e9); a 100-TB run would precompute
    c/T at fixed precision instead (documented trade, same pipeline shape).
    Skew note: a stop-word's (token, doc) rows all land in one exchange
    partition (the group pass itself is vectorized reduceat, so CPU is
    fine, but the partition is corpus-wide). The standard scale fix —
    broadcast the top-K vocabulary's counts (ray.put, a few MB) and
    exchange only the tail — drops in between tok_rows and per_token
    without changing any semantics."""
    from ocrautomator_ray.functions.exchange import per_key_blocks

    path = f"{sf_dir}/documents.parquet"

    def tok_rows(t: pa.Table) -> pa.Table:
        flat, cnt = _tokenize_re2(t["text"])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(ids, cnt)
        g = pa.TableGroupBy(pa.table({"w": flat,
                                      "doc_id": pa.array(doc_of, pa.int64())}),
                            ["w", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"w": g["w"], "doc_id": g["doc_id"],
                         "k": g["count_all"].cast(pa.int64())})

    contrib_schema = pa.schema([("doc_id", pa.int64()), ("contrib", pa.int64()),
                                ("k", pa.int64())])

    def per_token(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return contrib_schema.empty_table()
        w = block["w"].to_numpy(zero_copy_only=False)
        k = block["k"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="mergesort")
        w, k = w[order], k[order]
        starts = np.nonzero(np.r_[True, w[1:] != w[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(w)])
        c = np.add.reduceat(k, starts)          # corpus count per token run
        c_of = np.repeat(c, run_len)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)[order]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "contrib": pa.array(k * c_of, pa.int64()),
                         "k": pa.array(k, pa.int64())})

    # side pass: T (one int per batch → driver scalar)
    def batch_total(t: pa.Table) -> pa.Table:
        _, cnt = _tokenize_re2(t["text"])
        return pa.table({"t": pa.array([int(cnt.sum())], pa.int64())})

    T = int(pruned_read(path, ["text"])
            .map_batches(batch_total, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sum("t"))

    rows = pruned_read(path, ["doc_id", "text"]).map_batches(
        tok_rows, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                            ("freq_score_u", pa.int64())])

    def doc_score(block: pa.Table) -> pa.Table:
        # per-doc sum of (contrib, k) partials + the final integer score in
        # one vectorized reduceat pass — Ray's HashAggregate cost ~10 s of
        # per-shard update machinery here at 50k docs / 800k partial rows
        if block.num_rows == 0:
            return out_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        contrib = block["contrib"].to_numpy(zero_copy_only=False)
        kk = block["k"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")
        ids, contrib, kk = ids[order], contrib[order], kk[order]
        starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
        s = np.add.reduceat(contrib, starts)
        n = np.add.reduceat(kk, starts)
        return pa.table({
            "doc_id": pa.array(ids[starts], pa.int64()),
            "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
            "freq_score_u": pa.array(s * 1_000_000_000 // (n * T), pa.int64()),
        })

    return per_key_blocks(per_key_blocks(rows, ["w"], per_token), ["doc_id"],
                          doc_score, num_partitions=8)


SQL_CORPUS_FREQ_SCORE = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
c AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
tot AS (SELECT COUNT(*) AS T FROM toks)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(CAST(SUM(c.c) AS HUGEINT) * 1000000000
            // (COUNT(*) * (SELECT T FROM tot)) AS BIGINT) AS freq_score_u
FROM toks t JOIN c USING (w)
GROUP BY t.doc_id
"""


# --------------------------------------------------------------------------
# bpe_pair_counts — the merge-selection pass of one BPE training iteration:
# global counts of ADJACENT token pairs, top-K by count. The canonical
# tokenizer-training primitive (Sennrich et al., ACL 2016) and a pure
# combiner-shaped distributed count: per-batch pair multiplicities (each
# doc's token sequence lives in one row, so pairs never cross batches) →
# ONE pair-keyed exchange sums each pair completely in one block and keeps
# its block-local top-K (lossless: the global top-K is a subset of the
# per-block top-Ks since each pair is whole in exactly one block) →
# a single-partition finalize ranks ≤ P·K rows.
# --------------------------------------------------------------------------

BPE_TOP_K = 20


def bpe_pair_counts(sf_dir: str, k: int = BPE_TOP_K) -> rd.Dataset:
    path = f"{sf_dir}/documents.parquet"
    docs = pruned_read(path, ["doc_id", "text"])

    pair_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                             ("cnt", pa.int64())])

    def pair_rows(t: pa.Table) -> pa.Table:
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return pair_schema.empty_table()
        # adjacency mask: position i pairs with i+1 unless i is a doc's last
        offs = np.zeros(len(cnt) + 1, np.int64)
        np.cumsum(cnt, out=offs[1:])
        last = offs[1:][cnt > 0] - 1
        is_a = np.ones(len(flat), bool)
        is_a[last] = False
        idx = np.nonzero(is_a)[0]
        if len(idx) == 0:
            return pair_schema.empty_table()
        g = pa.TableGroupBy(pa.table({
            "tok_a": flat.take(pa.array(idx)),
            "tok_b": flat.take(pa.array(idx + 1)),
        }), ["tok_a", "tok_b"]).aggregate([([], "count_all")])
        return pa.table({"tok_a": g["tok_a"], "tok_b": g["tok_b"],
                         "cnt": g["count_all"].cast(pa.int64())})

    _BPE_SORT = [("cnt", "descending"), ("tok_a", "ascending"),
                 ("tok_b", "ascending")]

    def topk_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pair_schema.empty_table()
        g = pa.TableGroupBy(block, ["tok_a", "tok_b"]).aggregate(
            [("cnt", "sum")]).rename_columns(["tok_a", "tok_b", "cnt"])
        idx = pc.sort_indices(g, sort_keys=_BPE_SORT)
        return g.take(idx.slice(0, k))

    def finalize(block: pa.Table) -> pa.Table:
        idx = pc.sort_indices(block, sort_keys=_BPE_SORT)
        g = block.take(idx.slice(0, k))
        return g.append_column("rank", pa.array(
            np.arange(1, g.num_rows + 1, dtype=np.int64), pa.int64()))

    pairs = docs.map_batches(pair_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
    local = per_key_blocks(pairs, ["tok_a", "tok_b"], topk_block,
                           num_partitions=auto_partitions(path))
    return local.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                            batch_size=None,
                                            zero_copy_batch=True)


SQL_BPE_PAIRS = rf"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(tl, 1) AS pos, unnest(tl) AS tok
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS tl
    FROM documents
  )
),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS cnt
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
)
SELECT tok_a, tok_b, cnt, rank FROM (
  SELECT tok_a, tok_b, cnt,
         row_number() OVER (ORDER BY cnt DESC, tok_a, tok_b) AS rank
  FROM pairs
) WHERE rank <= {BPE_TOP_K}
"""


# --------------------------------------------------------------------------
# bm25_doc0_topk — "more-like-this" BM25 retrieval: the K documents most
# similar to document 0 under Okapi BM25 (k1=1.2, b=0.75), the classic
# sparse-retrieval scorer (Robertson & Zaragoza, FnTIR 2009) used for
# curation-time corpus search and hard-negative mining. Exact-int hash
# stability: each (doc, term) CONTRIBUTION is integerized at 1e-6 from an
# identically-parenthesized double expression in both engines, then summed
# as int64 — order-invariant, unlike a float SUM. Distribution: N/T are two
# tiny side aggregates, the query's term set (one doc's tokens) is
# broadcast, tf rows are prefiltered to query terms per batch (the stream
# shrinks immediately), df attaches in one term-keyed exchange, and scores
# finalize per doc in one doc-keyed exchange with block-local top-K.
# --------------------------------------------------------------------------

BM25_TOP_K = 10
BM25_K1 = 1.2
BM25_B = 0.75


_BM25_TF_SCHEMA = pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                             ("tf", pa.int64()), ("dl", pa.int64())])


def _bm25_side_stats(path: str) -> tuple[int, int]:
    """(N docs, T total tokens): two tiny integer side aggregates combined
    per batch — one row per batch reaches the driver."""

    def batch_stats(t: pa.Table) -> pa.Table:
        _, cnt = _tokenize_re2(t["text"])
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "t": pa.array([int(cnt.sum())], pa.int64())})

    stats = pruned_read(path, ["text"]).map_batches(
        batch_stats, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return int(stats["n"].sum()), int(stats["t"].sum())


def _bm25_query_terms(path: str) -> pa.Array:
    """Document 0's distinct tokens, sorted (tiny pruned filtered read)."""
    q = stripped_read(path, columns=["doc_id", "text"],
                      filter=(pc.field("doc_id") == 0)).to_pandas()
    q_flat, _ = _tokenize_re2(pa.array(q["text"].tolist(), pa.string()))
    return pa.array(sorted(set(q_flat.to_pylist())), pa.string())


def _bm25_rank(tf: rd.Dataset, N: int, T: int, k: int,
               n_parts: int) -> rd.Dataset:
    """Score and rank a (doc_id, term, tf, dl) stream — shared VERBATIM by
    the recompute path (``bm25_doc0_topk``) and the persisted-index path
    (``bm25_index_topk``) so both produce byte-identical rows: df attaches
    in one term-keyed exchange (rows are doc-distinct, so df = the term's
    block-local row count), each (doc, term) contribution integerizes at
    1e-6 from an identically-parenthesized double expression, and doc
    scores finalize in one doc-keyed exchange with block-local top-K."""
    contrib_schema = pa.schema([("doc_id", pa.int64()), ("c_u", pa.int64())])

    def attach_df_score(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return contrib_schema.empty_table()
        # df = the term's row count in the block (rows are doc-distinct);
        # np.unique replaces the former pandas transform("size")
        term = block["term"].to_numpy(zero_copy_only=False)
        _, inv, cnts = np.unique(term, return_inverse=True, return_counts=True)
        df = cnts[inv].astype(np.float64)
        tf = block["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = block["dl"].to_numpy(zero_copy_only=False)
        # parenthesization mirrors SQL_BM25 exactly (IEEE-identical doubles)
        idf = (np.float64(N) - df + 0.5) / (df + 0.5)
        part = (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * ((1.0 - BM25_B)
                            + BM25_B * (dl * np.float64(N)) / np.float64(T)))
        c_u = np.floor(idf * part * 1_000_000 + 0.5).astype(np.int64)
        keep = block["doc_id"].to_numpy(zero_copy_only=False) != 0
        return pa.table({
            "doc_id": pa.array(
                block["doc_id"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "c_u": pa.array(c_u[keep], pa.int64()),
        })

    topk_schema = pa.schema([("doc_id", pa.int64()), ("score_u", pa.int64())])

    def topk_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return topk_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        c = block["c_u"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")
        ids, c = ids[order], c[order]
        starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
        uids = ids[starts]
        score = np.add.reduceat(c, starts).astype(np.int64)
        sel = np.lexsort((uids, -score))[:k]
        return pa.table({"doc_id": pa.array(uids[sel], pa.int64()),
                         "score_u": pa.array(score[sel], pa.int64())})

    def finalize(block: pa.Table) -> pa.Table:
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        score = block["score_u"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((ids, -score))[:k]
        return pa.table({
            "doc_id": pa.array(ids[sel], pa.int64()),
            "score_u": pa.array(score[sel], pa.int64()),
            "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64),
                             pa.int64()),
        })

    contrib = per_key_blocks(tf, ["term"], attach_df_score,
                             num_partitions=n_parts)
    local = per_key_blocks(contrib, ["doc_id"], topk_block,
                           num_partitions=n_parts)
    return local.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                            batch_size=None,
                                            zero_copy_batch=True)


def bm25_doc0_topk(sf_dir: str, k: int = BM25_TOP_K) -> rd.Dataset:
    import ray

    path = f"{sf_dir}/documents.parquet"
    q_ref = ray.put(_bm25_query_terms(path))
    N, T = _bm25_side_stats(path)

    def tf_rows(t: pa.Table) -> pa.Table:
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return _BM25_TF_SCHEMA.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(ids, cnt)
        dl_of = np.repeat(cnt, cnt)
        keep = pc.is_in(flat, value_set=ray.get(q_ref))
        keepn = keep.to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(pa.table({
            "doc_id": pa.array(doc_of[keepn], pa.int64()),
            "term": flat.filter(keep),
            "dl": pa.array(dl_of[keepn], pa.int64()),
        }), ["doc_id", "term", "dl"]).aggregate([([], "count_all")])
        return pa.table({"doc_id": g["doc_id"], "term": g["term"],
                         "tf": g["count_all"].cast(pa.int64()),
                         "dl": g["dl"]})

    docs = pruned_read(path, ["doc_id", "text"])
    tf = docs.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
    # tf rows expand ~8x the compressed text bytes (term strings per doc) —
    # size the exchanges like the other gram-expanding ops
    return _bm25_rank(tf, N, T, k,
                      auto_partitions(path, bytes_per_partition=8 << 20))


SQL_BM25 = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n FROM documents),
tot AS (SELECT COUNT(*) AS t FROM toks),
q AS (SELECT DISTINCT term FROM toks WHERE doc_id = 0),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM toks JOIN q USING (term) GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           ((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5) / (df + 0.5))
           * ((tf * ({BM25_K1} + 1.0)) /
              (tf + {BM25_K1} * ((1.0 - {BM25_B})
                 + {BM25_B} * (dl.dl * CAST((SELECT n FROM stats) AS DOUBLE))
                   / CAST((SELECT t FROM tot) AS DOUBLE))))
           * 1000000 + 0.5) AS BIGINT) AS c_u
  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  WHERE tf.doc_id <> 0
)
SELECT doc_id, score_u, rank FROM (
  SELECT doc_id, CAST(SUM(c_u) AS BIGINT) AS score_u,
         row_number() OVER (ORDER BY SUM(c_u) DESC, doc_id) AS rank
  FROM contrib GROUP BY doc_id
) WHERE rank <= {BM25_TOP_K}
"""


# --------------------------------------------------------------------------
# bm25_index_build / bm25_index_topk — the persisted-INVERTED-INDEX
# completion of the BM25 story, the text-side mirror of the IVF index
# (ann.py): postings (doc_id, term, tf, dl) are written ONCE through the
# generic resumable sink, hive-partitioned by term-hash bucket, and queries
# then PRUNE AT THE READ — only the buckets holding the query's terms are
# ever opened — instead of re-tokenizing the corpus per query. At 10^12
# docs the build is one streaming tokenize pass + partitioned write, a
# killed build resumes with O(P) manifest reads, and each query's IO is
# |query-term buckets|/BM25_BUCKETS of the postings. Global stats (N, T)
# persist beside the data (stats.parquet) so a committed index answers with
# zero corpus passes. Because every term's postings are COMPLETE inside its
# bucket, the in-block df and every downstream double are byte-identical to
# the recompute path — bm25_index_topk shares bm25_doc0_topk's SQL oracle.
# --------------------------------------------------------------------------

BM25_BUCKETS = 64
_BM25_INDEX_ROOT = os.path.join("/tmp", "ocrauto_bm25_index")
_POSTING_SCHEMA = pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                             ("tf", pa.int64()), ("dl", pa.int64()),
                             ("bucket", pa.int32())])


def _posting_rows(t: pa.Table) -> pa.Table:
    """Per-batch FULL (doc_id, term, tf, dl, bucket) postings: each doc's
    text lives in one row, so the per-batch group count is final; bucket is
    the term's FNV hash mod BM25_BUCKETS (shared by build and append so an
    epoch's postings land in the same value dirs as the base's)."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings

    flat, cnt = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _POSTING_SCHEMA.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    g = pa.TableGroupBy(pa.table({
        "doc_id": pa.array(np.repeat(ids, cnt), pa.int64()),
        "term": flat,
        "dl": pa.array(np.repeat(cnt, cnt), pa.int64()),
    }), ["doc_id", "term", "dl"]).aggregate([([], "count_all")])
    bucket = (_fnv1a_strings(g["term"]) % BM25_BUCKETS).astype(np.int32)
    return pa.table({"doc_id": g["doc_id"], "term": g["term"],
                     "tf": g["count_all"].cast(pa.int64()),
                     "dl": g["dl"],
                     "bucket": pa.array(bucket, pa.int32())})


def bm25_index_dir(sf_dir: str) -> str:
    """Deterministic per-input index location under /tmp, fingerprinted by
    (dir basename, full-path hash, size, mtime_ns) via the shared
    exchange.index_fingerprint_dir rule, so a changed input never reuses a
    stale index and same-named dirs of DIFFERENT corpora never share an
    eviction key."""
    from ocrautomator_ray.functions.exchange import index_fingerprint_dir

    return index_fingerprint_dir(_BM25_INDEX_ROOT,
                                 f"{sf_dir}/documents.parquet")


def _evict_stale_bm25(index_dir: str) -> None:
    from ocrautomator_ray.functions.exchange import evict_stale_index_dirs

    evict_stale_index_dirs(index_dir, _BM25_INDEX_ROOT)


def _bm25_stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.parquet")


def _write_bm25_stats(index_dir: str, N: int, T: int) -> None:
    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    path = _bm25_stats_path(index_dir)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.table({"n": pa.array([N], pa.int64()),
                             "t": pa.array([T], pa.int64())}), tmp)
    os.replace(tmp, path)


def _read_bm25_stats(index_dir: str) -> tuple[int, int]:
    """Base stats plus every appended epoch's additive delta — the stats a
    fresh rebuild over base ∪ epochs would compute."""
    import pyarrow.parquet as pq

    t = pq.read_table(_bm25_stats_path(index_dir))
    N, T = int(t["n"][0].as_py()), int(t["t"][0].as_py())
    epochs = os.path.join(index_dir, "epochs")
    if os.path.isdir(epochs):
        for e in sorted(os.listdir(epochs)):
            p = _bm25_stats_path(os.path.join(epochs, e))
            if os.path.exists(p):
                et = pq.read_table(p)
                N += int(et["n"][0].as_py())
                T += int(et["t"][0].as_py())
    return N, T


def bm25_index_build(sf_dir: str, index_dir: str | None = None,
                     num_partitions: int = 8) -> dict:
    """Build (or resume) the persisted inverted index: one distributed
    tokenize pass emits FULL (doc_id, term, tf, dl) postings (each doc's
    text lives in one row, so per-batch group counts are final), written
    via the resumable sink with ``partition_by="bucket"`` — layout
    ``data/bucket=<b>/part-NNNNN.parquet``. Returns the sink summary plus
    ``index_dir``."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    path = f"{sf_dir}/documents.parquet"
    index_dir = index_dir or bm25_index_dir(sf_dir)
    _evict_stale_bm25(index_dir)
    if os.path.exists(_bm25_stats_path(index_dir)):
        N, T = _read_bm25_stats(index_dir)
    else:
        N, T = _bm25_side_stats(path)
        _write_bm25_stats(index_dir, N, T)

    ds = pruned_read(path, ["doc_id", "text"])
    summary = resumable_write(
        ds.map_batches(_posting_rows, batch_format="pyarrow",
                       zero_copy_batch=True),
        index_dir, num_partitions=num_partitions, key="doc_id",
        input_desc=path, partition_by="bucket")
    summary["index_dir"] = index_dir
    return summary


def bm25_bucket_fragments(index_dir: str, buckets: list[int]) -> list[str]:
    """Parquet fragments under exactly the requested bucket value dirs —
    of the base index AND every appended epoch sub-sink, so queries see
    appended documents with no code change."""
    roots = [os.path.join(index_dir, "data")]
    epochs = os.path.join(index_dir, "epochs")
    if os.path.isdir(epochs):
        # an epoch without its stats marker is incomplete (killed append) —
        # skip it so reads match _read_bm25_stats' view exactly
        roots += [os.path.join(epochs, e, "data")
                  for e in sorted(os.listdir(epochs))
                  if os.path.exists(_bm25_stats_path(
                      os.path.join(epochs, e)))]
    dirs = [os.path.join(r, f"bucket={b}") for r in roots for b in buckets]
    return sorted(
        os.path.join(d, f)
        for d in dirs if os.path.isdir(d)
        for f in os.listdir(d) if f.endswith(".parquet"))


def bm25_index_append(new_path: str, index_dir: str,
                      num_partitions: int = 4) -> dict:
    """Fold a NEW documents fragment into a committed inverted index
    without rebuilding — the watch-mode path, mirroring ivf_index_append:
    tokenize ONLY the fragment and commit its postings as an epoch sub-sink
    (``epochs/<basename>-<size>-<mtime_ns>/`` with its own manifests and
    the same hive ``bucket=<b>`` layout), plus the epoch's additive (n, t)
    stats delta. Unlike IVF appends (which freeze centroids), BM25 appends
    are EXACT: postings are per-doc-local and N/T are sums, so queries over
    base ∪ epochs equal a fresh full rebuild bit-for-bit (pytest-pinned).
    Append cost is O(fragment); idempotent by fragment fingerprint; a
    killed append resumes with O(P) manifest reads like any sink."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    st = os.stat(new_path)
    tag = f"{os.path.basename(new_path)}-{st.st_size}-{st.st_mtime_ns}"
    epoch_dir = os.path.join(index_dir, "epochs", tag)
    # The epoch's stats file is its COMMIT MARKER: postings first (resumable,
    # partition-granular), stats only after every partition committed. A
    # killed append therefore leaves an epoch that readers
    # (_read_bm25_stats, bm25_bucket_fragments) skip entirely — queries keep
    # answering from the pre-append index — and the rerun resumes the
    # postings then commits the marker, instead of the old order where full
    # epoch N/T could pair with a committed SUBSET of epoch postings and
    # silently score against neither index state.
    ds = pruned_read(new_path, ["doc_id", "text"])
    summary = resumable_write(
        ds.map_batches(_posting_rows, batch_format="pyarrow",
                       zero_copy_batch=True),
        epoch_dir, num_partitions=num_partitions, key="doc_id",
        input_desc=new_path, partition_by="bucket")
    if not os.path.exists(_bm25_stats_path(epoch_dir)):
        n, t = _bm25_side_stats(new_path)
        _write_bm25_stats(epoch_dir, n, t)
    summary["epoch_dir"] = epoch_dir
    return summary


def bm25_index_topk(sf_dir: str, k: int = BM25_TOP_K) -> rd.Dataset:
    """Pruned-probe BM25 query over the persisted inverted index:
    rows-identical to ``bm25_doc0_topk`` (same tf/dl/N/T, same in-block df,
    same IEEE parenthesization) but the read opens ONLY the term-hash
    bucket directories the query's terms live in, and no tokenize pass
    runs. pytest pins the row equality, the pruning (opened dirs ⊊ all
    bucket dirs), and that a committed index rebuild is a no-op."""
    import ray

    from ocrautomator_ray.functions.dedup import _fnv1a_strings

    path = f"{sf_dir}/documents.parquet"
    bm25_index_build(sf_dir)  # no-op when committed (O(P) manifest reads)
    index_dir = bm25_index_dir(sf_dir)
    N, T = _read_bm25_stats(index_dir)
    q = _bm25_query_terms(path)
    buckets = sorted({int(b) for b in _fnv1a_strings(q) % BM25_BUCKETS})
    frags = bm25_bucket_fragments(index_dir, buckets)
    q_ref = ray.put(q)

    def keep_query_terms(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=ray.get(q_ref)))

    tf = rd.read_parquet(
        frags, columns=["doc_id", "term", "tf", "dl"]).map_batches(
        keep_query_terms, batch_format="pyarrow", zero_copy_batch=True)
    # size the exchange on the POSTINGS actually read, not the raw corpus;
    # they decompress/expand heavily (term strings), so 8 MB per partition
    return _bm25_rank(tf, N, T, k,
                      auto_partitions(*frags, bytes_per_partition=8 << 20))


# --------------------------------------------------------------------------
# bpe_train_merges — ITERATIVE merge training (Sennrich et al., ACL 2016):
# R rounds of (global top adjacent pair → merge it corpus-wide), i.e. the
# full training loop whose single selection pass is bpe_pair_counts.  The
# kmeans_fit iteration shape: driver state is O(R) (the merge table), each
# round is ONE streaming pass — per-batch pair combiners → one pair-keyed
# exchange with block-local top-1 → a 1-row final reduce — and the merge
# list is re-applied per batch from the raw read (R total passes; a 100-TB
# run would checkpoint the merged token stream through the resumable sink
# every few rounds instead of re-deriving, same note as cluster propagation).
#
# Token streams are carried as ONE delimited string per doc —
# '\x1f' + tok + '\x1f' per token, concatenated — so applying a merge
# (a, b) → "a b" is a plain non-overlapping leftmost string replace of
# '\x1fa\x1f\x1fb\x1f' with '\x1fa b\x1f': identical semantics in pyarrow
# replace_substring, Python str.replace, and DuckDB replace(), which is
# what lets an R-round unrolled SQL CTE chain mirror the whole loop
# hash-exactly.  Tokens come from _tokenize_re2 (lowercase, \s+ split) so
# they can never contain ' ' or the '\x1f' delimiter (guarded loudly).
# --------------------------------------------------------------------------

BPE_ROUNDS = 4
_SEP = "\x1f"


def _delimited_tokens(t: pa.Table) -> pa.Table:
    """(doc_id, s): each doc's token stream as one '\\x1f'-wrapped string."""
    texts = t["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pc.any(pc.match_substring(pc.fill_null(texts, ""), _SEP)).as_py():
        raise ValueError("document text contains the \\x1f token delimiter; "
                         "bpe_train_merges needs a corpus-free sentinel")
    flat, cnt = _tokenize_re2(texts)
    toks = flat.to_numpy(zero_copy_only=False).astype(object)
    bounds = np.zeros(len(cnt) + 1, np.int64)
    np.cumsum(cnt, out=bounds[1:])
    joined = np.array(
        [_SEP + (_SEP + _SEP).join(toks[bounds[i]:bounds[i + 1]]) + _SEP
         if cnt[i] else "" for i in range(len(cnt))], object)
    return pa.table({"doc_id": t["doc_id"],
                     "s": pa.array(joined, pa.string())})


def _apply_merges(s: pa.Array, merges: list[tuple[str, str]]) -> pa.Array:
    for a, b in merges:
        s = pc.replace_substring(
            s, pattern=f"{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}",
            replacement=f"{_SEP}{a} {b}{_SEP}")
    return s


_BPE_PAIR_SCHEMA = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                              ("cnt", pa.int64())])
_BPE_SORT1 = [("cnt", "descending"), ("tok_a", "ascending"),
              ("tok_b", "ascending")]


def bpe_train_merges(sf_dir: str, rounds: int = BPE_ROUNDS,
                     checkpoint_dir: str | None = None) -> pa.Table:
    """(merge_round, tok_a, tok_b, cnt): the merge chosen each round with
    its pre-merge global count — ties broken (cnt DESC, tok_a, tok_b).
    Returns the small driver-side merge table (O(rounds) rows).

    ``checkpoint_dir``: per-round merge-table checkpoints (state/rounds.py)
    — each round is a full tokenize+pair-count pass over the corpus, so a
    killed driver resumes from the last committed merge instead of
    re-training every earlier round."""
    from ocrautomator_ray.state.rounds import RoundState, input_fingerprint

    path = f"{sf_dir}/documents.parquet"
    merges: list[tuple[str, str]] = []
    out_rows: list[tuple[int, str, str, int]] = []
    start = 1
    rs = None
    if checkpoint_dir is not None:
        rs = RoundState(checkpoint_dir,
                        input_fingerprint(path, rounds=rounds))
        nxt, state = rs.resume()
        if state is not None:
            merges = list(zip(state["tok_a"].tolist(),
                              state["tok_b"].tolist()))
            out_rows = list(zip(state["merge_round"].tolist(),
                                state["tok_a"].tolist(),
                                state["tok_b"].tolist(),
                                state["cnt"].tolist()))
            start = nxt + 1  # round files are 0-based, merge rounds 1-based

    for r in range(start, rounds + 1):
        applied = list(merges)

        def pair_rows(t: pa.Table, _m=applied) -> pa.Table:
            d = _delimited_tokens(t)
            s = _apply_merges(d["s"].combine_chunks()
                              if isinstance(d["s"], pa.ChunkedArray)
                              else d["s"], _m)
            trimmed = pc.utf8_trim(s, _SEP)
            parts = pc.split_pattern(trimmed, pattern=_SEP + _SEP)
            flat = pc.list_flatten(parts)
            n_tok = pc.list_value_length(parts).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # a doc with no tokens splits '' -> [''] — mask those out
            empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
            n_tok[empty] = 0
            if len(flat) == 0:
                return _BPE_PAIR_SCHEMA.empty_table()
            bounds = np.zeros(len(n_tok) + 1, np.int64)
            np.cumsum(n_tok, out=bounds[1:])
            is_a = np.ones(int(bounds[-1]), bool)
            if len(is_a) == 0:
                return _BPE_PAIR_SCHEMA.empty_table()
            is_a[bounds[1:][n_tok > 0] - 1] = False
            idx = np.nonzero(is_a)[0]
            if len(idx) == 0:
                return _BPE_PAIR_SCHEMA.empty_table()
            g = pa.TableGroupBy(pa.table({
                "tok_a": flat.take(pa.array(idx)),
                "tok_b": flat.take(pa.array(idx + 1)),
            }), ["tok_a", "tok_b"]).aggregate([([], "count_all")])
            return pa.table({"tok_a": g["tok_a"], "tok_b": g["tok_b"],
                             "cnt": g["count_all"].cast(pa.int64())})

        def top1_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return _BPE_PAIR_SCHEMA.empty_table()
            g = pa.TableGroupBy(block, ["tok_a", "tok_b"]).aggregate(
                [("cnt", "sum")]).rename_columns(["tok_a", "tok_b", "cnt"])
            return g.take(pc.sort_indices(g, sort_keys=_BPE_SORT1).slice(0, 1))

        docs = pruned_read(path, ["doc_id", "text"])
        cand = per_key_blocks(
            docs.map_batches(pair_rows, batch_format="pyarrow",
                             zero_copy_batch=True),
            ["tok_a", "tok_b"], top1_block,
            num_partitions=auto_partitions(path))
        best = (cand.repartition(1)
                .map_batches(top1_block, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
                .to_pandas())
        if best.empty:
            break  # corpus exhausted of adjacent pairs
        a, b, c = (str(best["tok_a"][0]), str(best["tok_b"][0]),
                   int(best["cnt"][0]))
        merges.append((a, b))
        out_rows.append((r, a, b, c))
        if rs is not None:
            rs.commit(r - 1,
                      merge_round=np.array([x[0] for x in out_rows],
                                           np.int64),
                      tok_a=np.array([x[1] for x in out_rows], dtype=str),
                      tok_b=np.array([x[2] for x in out_rows], dtype=str),
                      cnt=np.array([x[3] for x in out_rows], np.int64))

    return pa.table({
        "merge_round": pa.array([x[0] for x in out_rows], pa.int64()),
        "tok_a": pa.array([x[1] for x in out_rows], pa.string()),
        "tok_b": pa.array([x[2] for x in out_rows], pa.string()),
        "cnt": pa.array([x[3] for x in out_rows], pa.int64()),
    })


def bpe_apply_stats(sf_dir: str, rounds: int = BPE_ROUNDS) -> rd.Dataset:
    """(doc_id, n_tokens, n_tokens_merged): per-doc token counts before and
    after applying the ``rounds`` trained merges — the tokenizer-compression
    audit (corpus-wide Σ n_tokens_merged / Σ n_tokens is the compression the
    merge table buys).  Trains via ``bpe_train_merges`` (R exchange rounds),
    then ONE embarrassingly-parallel apply pass; the merge list is O(R)
    driver state broadcast in the closure."""
    mt = bpe_train_merges(sf_dir, rounds)
    merges = list(zip(mt["tok_a"].to_pylist(), mt["tok_b"].to_pylist()))

    def stats(t: pa.Table) -> pa.Table:
        d = _delimited_tokens(t)
        s = (d["s"].combine_chunks()
             if isinstance(d["s"], pa.ChunkedArray) else d["s"])
        def n_tokens(col: pa.Array) -> np.ndarray:
            trimmed = pc.utf8_trim(col, _SEP)
            n = pc.list_value_length(
                pc.split_pattern(trimmed, pattern=_SEP + _SEP)
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            n[pc.equal(trimmed, "").to_numpy(zero_copy_only=False)] = 0
            return n
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tokens(s), pa.int64()),
            "n_tokens_merged": pa.array(
                n_tokens(_apply_merges(s, merges)), pa.int64()),
        })

    return pruned_read(f"{sf_dir}/documents.parquet",
                       ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True)


def _bpe_ctes(rounds: int = BPE_ROUNDS) -> str:
    """The unrolled R-round CTE chain shared by SQL_BPE_TRAIN and
    SQL_BPE_APPLY: round r's docs CTE is replace() of round r-1's with its
    best pair, each best CTE is ORDER BY cnt DESC, pair LIMIT 1 —
    byte-identical replace + collation semantics to the engine."""
    f = "chr(31)"
    ctes = [f"""d0 AS (
  SELECT doc_id,
         CASE WHEN len(tl) = 0 THEN ''
              ELSE {f} || array_to_string(tl, {f} || {f}) || {f} END AS s
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS tl
    FROM documents
  )
)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""t{r} AS (
  SELECT doc_id, string_split(trim(s, {f}), {f} || {f}) AS tl
  FROM d{r - 1} WHERE s <> ''
),
p{r} AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, generate_subscripts(tl, 1) AS pos, unnest(tl) AS tok
        FROM t{r}) a
  JOIN (SELECT doc_id, generate_subscripts(tl, 1) AS pos, unnest(tl) AS tok
        FROM t{r}) b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
best{r} AS (
  SELECT tok_a, tok_b, cnt FROM p{r}
  ORDER BY cnt DESC, tok_a, tok_b LIMIT 1
),
d{r} AS (
  SELECT d.doc_id,
         replace(d.s, {f} || m.tok_a || {f} || {f} || m.tok_b || {f},
                 {f} || m.tok_a || ' ' || m.tok_b || {f}) AS s
  FROM d{r - 1} d CROSS JOIN best{r} m
)""")
    return ",\n".join(ctes)


def _bpe_train_sql(rounds: int = BPE_ROUNDS) -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, tok_a, tok_b, cnt "
        f"FROM best{r}" for r in range(1, rounds + 1))
    return "WITH " + _bpe_ctes(rounds) + "\n" + selects


SQL_BPE_TRAIN = _bpe_train_sql()


def _bpe_apply_sql(rounds: int = BPE_ROUNDS) -> str:
    """Same unrolled chain as SQL_BPE_TRAIN, finishing with per-doc token
    counts of d0 vs d<rounds> instead of the merge table."""
    f = "chr(31)"
    ctes = _bpe_ctes(rounds)

    def count_expr(rel: str) -> str:
        return (f"CASE WHEN {rel}.s = '' THEN 0 ELSE "
                f"len(string_split(trim({rel}.s, {f}), {f} || {f})) END")

    return f"""WITH {ctes}
SELECT d0.doc_id,
       CAST({count_expr('d0')} AS BIGINT) AS n_tokens,
       CAST({count_expr(f'd{rounds}')} AS BIGINT) AS n_tokens_merged
FROM d0 JOIN d{rounds} ON d0.doc_id = d{rounds}.doc_id
"""


SQL_BPE_APPLY = _bpe_apply_sql()


QUERIES = {"tfidf_top_terms": tfidf_top_terms, "doc_chunks": doc_chunks,
           "pack_sequences": pack_sequences,
           "corpus_freq_score": corpus_freq_score,
           "bpe_pair_counts": bpe_pair_counts,
           "bpe_train_merges": bpe_train_merges,
           "bpe_apply_stats": bpe_apply_stats,
           "bm25_doc0_topk": bm25_doc0_topk,
           "bm25_index_topk": bm25_index_topk}
SQL = {"tfidf_top_terms": SQL_TFIDF, "doc_chunks": SQL_DOC_CHUNKS,
       "pack_sequences": SQL_PACK_SEQUENCES,
       "corpus_freq_score": SQL_CORPUS_FREQ_SCORE,
       "bpe_pair_counts": SQL_BPE_PAIRS,
       "bpe_train_merges": SQL_BPE_TRAIN,
       "bpe_apply_stats": SQL_BPE_APPLY,
       "bm25_doc0_topk": SQL_BM25,
       # the index changes where tf rows come from, never what they are —
       # the persisted-index query shares the recompute path's oracle
       "bm25_index_topk": SQL_BM25}
