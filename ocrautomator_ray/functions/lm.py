"""Language-model-shaped corpus scoring: bigram-LM quality scores and
duplicate-n-gram statistics.

Operators a training-data pipeline runs corpus-wide, all genuinely
distributed (each needs a global model table no single batch can see):

* ``bigram_lm_score`` — the CCNet-style perplexity filter (Wenzek et al.,
  LREC 2020) re-expressed with an add-one-smoothed bigram model trained on
  the corpus itself.  Per document it reports the mean smoothed bigram
  probability, integerized at 1e-9 so the distributed result is bit-exact
  vs the SQL oracle (the same reasoning as corpus_freq_score: a true
  log-perplexity would hash-unstably depend on libm rounding; the
  arithmetic-mean probability induces the same low-quality tails with
  int-only math).  score_u = floor( Σ_i k_i·floor((c(a_i,b_i)+1)·1e9 /
  (c(a_i)+V)) / m ) where c(a,b) is the corpus bigram count, c(a) the
  count of token a as a left context (= Σ_b c(a,b)), V the corpus distinct
  token count and m the document's bigram count.
* ``dup_ngram_stats`` — the detection half of exact substring dedup
  (Lee et al., ACL 2022 "Deduplicating Training Data Makes Language Models
  Better"): per document, how many of its token 8-grams also occur
  elsewhere in the corpus (or again in the same document).  Documents with
  a high duplicated-gram share are boilerplate/template candidates.
* ``dup_ngram_removed_docs`` — the removal half of the same paper: rebuild
  every document with the tokens covered by any duplicated 8-gram deleted
  (see the section comment below for the three-stage shape).
* ``dsir_importance`` — DSIR-style data-selection importance weights (see
  its section comment).
* ``perplexity_buckets`` — CCNet's head/middle/tail tertile labels over the
  bigram-LM score (see its section comment).
* ``source_overlap_matrix`` — cross-source distinct-8-gram contamination
  matrix (see its section comment).

Distribution shapes (both all-integer end to end):

  bigram_lm_score:  per-batch bigram combiner (adjacent-pair trick shared
  with bpe_pair_counts) → ONE exchange keyed on the LEFT token computes
  c(a,b) and c(a) together (all of a context's rows land in one block, so
  two reduceat passes over one lexsorted buffer finish the model locally)
  → doc-keyed exchange sums the per-bigram integer contributions.  V comes
  from a distinct-token side exchange (one int per partition to the
  driver).  Skew: a stop-word context's rows land in one partition — the
  group pass is vectorized, and the standard top-K-vocabulary broadcast
  drops in ahead of the exchange if a corpus ever needs it (same note as
  corpus_freq_score).

  dup_ngram_stats:  per-batch gram combiner (sliding windows gathered from
  the flat token buffer — one fancy-indexed take + one binary_join, no
  per-doc Python) → ONE gram-keyed exchange computes each gram's corpus
  count and flags the duplicated rows → doc-keyed sum.  The gram exchange
  moves (gram, doc, k) rows — the same asymptotics as the decontaminate
  gram exchange that is probe-proven flat at 100×.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ocrautomator_ray.functions.dedup import _ramp, _tokenize_re2
from ocrautomator_ray.functions.exchange import (
    auto_partitions,
    per_key_blocks,
    pruned_read,
)

LM_SCALE = 1_000_000_000
NGRAM_N = 8

_BIGRAM_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("a", pa.string()), ("b", pa.string()),
    ("k", pa.int64()),
])
_CONTRIB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("contrib", pa.int64()), ("k", pa.int64()),
])
_LM_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
    ("lm_score_u", pa.int64()),
])


def _bigram_rows(t: pa.Table) -> pa.Table:
    """Per-batch (doc_id, a, b, k) bigram multiplicities.  Each document's
    text lives in exactly one input row, so pairs never cross batches and
    the per-batch group-count is a FINAL count for its (doc, a, b) key."""
    flat, cnt = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _BIGRAM_SCHEMA.empty_table()
    offs = np.zeros(len(cnt) + 1, np.int64)
    np.cumsum(cnt, out=offs[1:])
    last = offs[1:][cnt > 0] - 1
    is_a = np.ones(len(flat), bool)
    is_a[last] = False
    idx = np.nonzero(is_a)[0]
    if len(idx) == 0:
        return _BIGRAM_SCHEMA.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    doc_of = np.repeat(ids, cnt)
    g = pa.TableGroupBy(pa.table({
        "doc_id": pa.array(doc_of[idx], pa.int64()),
        "a": flat.take(pa.array(idx)),
        "b": flat.take(pa.array(idx + 1)),
    }), ["doc_id", "a", "b"]).aggregate([([], "count_all")])
    return pa.table({"doc_id": g["doc_id"], "a": g["a"], "b": g["b"],
                     "k": g["count_all"].cast(pa.int64())})


def _context_block(block: pa.Table, v: int) -> pa.Table:
    """All rows of a left-context token are in this block (the exchange
    invariant), so c(a,b) and c(a) are exact here: factorize both token
    columns to ints, one lexsort, two reduceat passes.  unit overflow
    bound: (c(a,b)+1)·1e9 < 2^63 holds while any single bigram stays under
    ~9.2e9 corpus occurrences — beyond that a 100-TB run would drop the
    scale to 1e6, same pipeline."""
    if block.num_rows == 0:
        return _CONTRIB_SCHEMA.empty_table()
    a = block["a"].to_numpy(zero_copy_only=False)
    b = block["b"].to_numpy(zero_copy_only=False)
    k = block["k"].to_numpy(zero_copy_only=False)
    ids = block["doc_id"].to_numpy(zero_copy_only=False)
    _, ia = np.unique(a, return_inverse=True)
    _, ib = np.unique(b, return_inverse=True)
    order = np.lexsort((ib, ia))
    ia, ib, k, ids = ia[order], ib[order], k[order], ids[order]
    new_ab = np.r_[True, (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])]
    ab_starts = np.flatnonzero(new_ab)
    ab_len = np.diff(np.r_[ab_starts, len(k)])
    cab_row = np.repeat(np.add.reduceat(k, ab_starts), ab_len)
    a_starts = np.flatnonzero(np.r_[True, ia[1:] != ia[:-1]])
    a_len = np.diff(np.r_[a_starts, len(k)])
    ca_row = np.repeat(np.add.reduceat(k, a_starts), a_len)
    unit = (cab_row + 1) * LM_SCALE // (ca_row + v)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "contrib": pa.array(k * unit, pa.int64()),
                     "k": pa.array(k, pa.int64())})


def _doc_mean_block(block: pa.Table) -> pa.Table:
    if block.num_rows == 0:
        return _LM_OUT_SCHEMA.empty_table()
    ids = block["doc_id"].to_numpy(zero_copy_only=False)
    contrib = block["contrib"].to_numpy(zero_copy_only=False)
    kk = block["k"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="mergesort")
    ids, contrib, kk = ids[order], contrib[order], kk[order]
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    s = np.add.reduceat(contrib, starts)
    m = np.add.reduceat(kk, starts)
    return pa.table({"doc_id": pa.array(ids[starts], pa.int64()),
                     "n_bigrams": pa.array(m.astype(np.int64), pa.int64()),
                     "lm_score_u": pa.array(s // m, pa.int64())})


def corpus_vocab_size(path: str) -> int:
    """Global distinct-token count: per-batch distinct → token-keyed
    exchange (each token is counted in exactly one block) → the driver sums
    one int per partition."""
    def batch_distinct(t: pa.Table) -> pa.Table:
        flat, _ = _tokenize_re2(t["text"])
        return pa.table({"w": pc.unique(flat)})

    def block_vcount(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64())})
        n = len(pc.unique(block["w"]))
        return pa.table({"v": pa.array([n], pa.int64())})

    toks = pruned_read(path, ["text"]).map_batches(
        batch_distinct, batch_format="pyarrow", zero_copy_batch=True)
    counts = per_key_blocks(toks, ["w"], block_vcount,
                            num_partitions=auto_partitions(path))
    return int(counts.sum("v"))


def bigram_lm_score(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bigrams, lm_score_u): mean add-one-smoothed bigram
    probability ×1e9, floored — low scores flag improbable token sequences
    (gibberish / OCR noise), the docs a perplexity filter drops."""
    path = f"{sf_dir}/documents.parquet"
    v = corpus_vocab_size(path)

    bigrams = pruned_read(path, ["doc_id", "text"]).map_batches(
        _bigram_rows, batch_format="pyarrow", zero_copy_batch=True)
    contrib = per_key_blocks(bigrams, ["a"],
                             lambda block: _context_block(block, v),
                             num_partitions=auto_partitions(path))
    return per_key_blocks(contrib, ["doc_id"], _doc_mean_block,
                          num_partitions=8)


SQL_BIGRAM_LM = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
toks AS (
  SELECT doc_id, generate_subscripts(tl, 1) AS pos, unnest(tl) AS tok FROM d
),
big AS (
  SELECT a.doc_id, a.tok AS a, b.tok AS b, COUNT(*) AS k
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2, 3
),
cab AS (SELECT a, b, CAST(SUM(k) AS BIGINT) AS cab FROM big GROUP BY a, b),
ca  AS (SELECT a, CAST(SUM(k) AS BIGINT) AS ca FROM big GROUP BY a),
v   AS (SELECT COUNT(DISTINCT tok) AS v FROM toks)
SELECT big.doc_id AS doc_id,
       CAST(SUM(k) AS BIGINT) AS n_bigrams,
       CAST(CAST(SUM(k * ((cab + 1) * {LM_SCALE}
                          // (ca + (SELECT v FROM v)))) AS HUGEINT)
            // SUM(k) AS BIGINT) AS lm_score_u
FROM big JOIN cab USING (a, b) JOIN ca USING (a)
GROUP BY big.doc_id
"""


# --------------------------------------------------------------------------
# dup_ngram_stats — duplicated token-8-gram occurrences per document
# --------------------------------------------------------------------------

_GRAM_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("gram", pa.string()), ("k", pa.int64()),
])
_GRAM_PART_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("k", pa.int64()), ("dup_k", pa.int64()),
])
_GRAM_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_grams", pa.int64()),
    ("n_dup_grams", pa.int64()),
])


def _gram_rows(t: pa.Table) -> pa.Table:
    """Per-batch (doc_id, gram, k): sliding 8-token windows gathered from
    the flat token buffer with one fancy-indexed take, joined back to
    strings with one binary_join — no per-document Python loop."""
    flat, cnt = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _GRAM_SCHEMA.empty_table()
    nwin = np.maximum(cnt - (NGRAM_N - 1), 0)
    total = int(nwin.sum())
    if total == 0:
        return _GRAM_SCHEMA.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    offs = np.zeros(len(cnt) + 1, np.int64)
    np.cumsum(cnt, out=offs[1:])
    win_doc = np.repeat(np.arange(len(cnt)), nwin)
    win_no = (np.arange(total, dtype=np.int64)
              - np.repeat(np.cumsum(nwin) - nwin, nwin))
    win_start = win_no + np.repeat(offs[:-1], nwin)
    gather = (win_start[:, None]
              + np.arange(NGRAM_N, dtype=np.int64)[None, :]).ravel()
    gathered = flat.take(pa.array(gather))
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(total + 1, dtype=np.int32) * NGRAM_N, pa.int32()),
        gathered)
    grams = pc.binary_join(lists, " ")
    g = pa.TableGroupBy(pa.table({
        "doc_id": pa.array(ids[win_doc], pa.int64()),
        "gram": grams,
    }), ["doc_id", "gram"]).aggregate([([], "count_all")])
    return pa.table({"doc_id": g["doc_id"], "gram": g["gram"],
                     "k": g["count_all"].cast(pa.int64())})


def _per_gram_block(block: pa.Table) -> pa.Table:
    """All rows of a gram co-located → its corpus count is the block-local
    sum; a row is 'duplicated' when its gram occurs >1 time corpus-wide
    (in another document or again in the same one)."""
    if block.num_rows == 0:
        return _GRAM_PART_SCHEMA.empty_table()
    gram = block["gram"].to_numpy(zero_copy_only=False)
    k = block["k"].to_numpy(zero_copy_only=False)
    order = np.argsort(gram, kind="mergesort")
    gram_s, k_s = gram[order], k[order]
    starts = np.flatnonzero(np.r_[True, gram_s[1:] != gram_s[:-1]])
    run_len = np.diff(np.r_[starts, len(k_s)])
    cg_row = np.repeat(np.add.reduceat(k_s, starts), run_len)
    ids = block["doc_id"].to_numpy(zero_copy_only=False)[order]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "k": pa.array(k_s, pa.int64()),
        "dup_k": pa.array(np.where(cg_row > 1, k_s, 0), pa.int64()),
    })


def _doc_gram_block(block: pa.Table) -> pa.Table:
    if block.num_rows == 0:
        return _GRAM_OUT_SCHEMA.empty_table()
    ids = block["doc_id"].to_numpy(zero_copy_only=False)
    k = block["k"].to_numpy(zero_copy_only=False)
    dup = block["dup_k"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="mergesort")
    ids, k, dup = ids[order], k[order], dup[order]
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    return pa.table({
        "doc_id": pa.array(ids[starts], pa.int64()),
        "n_grams": pa.array(np.add.reduceat(k, starts).astype(np.int64),
                            pa.int64()),
        "n_dup_grams": pa.array(np.add.reduceat(dup, starts).astype(np.int64),
                                pa.int64()),
    })


def dup_ngram_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_grams, n_dup_grams): of the document's token 8-grams,
    how many occurrences belong to a gram seen more than once corpus-wide.
    Documents with fewer than 8 tokens emit no rows (no gram exists) —
    matching the SQL oracle's inner grouping."""
    path = f"{sf_dir}/documents.parquet"
    grams = pruned_read(path, ["doc_id", "text"]).map_batches(
        _gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    flagged = per_key_blocks(grams, ["gram"], _per_gram_block,
                             num_partitions=auto_partitions(path))
    return per_key_blocks(flagged, ["doc_id"], _doc_gram_block,
                          num_partitions=8)


SQL_DUP_NGRAMS = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(tl[p + 1 : p + {NGRAM_N}], ' ') AS gram
  FROM d, LATERAL (SELECT unnest(range(0, greatest(len(tl) - {NGRAM_N - 1},
                                                   0))) AS p) u
),
gd AS (SELECT doc_id, gram, COUNT(*) AS k FROM grams GROUP BY doc_id, gram),
cg AS (SELECT gram, CAST(SUM(k) AS BIGINT) AS cg FROM gd GROUP BY gram)
SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN cg > 1 THEN k ELSE 0 END) AS BIGINT) AS n_dup_grams
FROM gd JOIN cg USING (gram)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# dup_ngram_removed_docs — the REMOVAL half of exact substring dedup
# (Lee et al., ACL 2022): rebuild every document with the tokens covered by
# any duplicated 8-gram deleted.  dup_ngram_stats detects; this edits.
#
# Distribution shape (three streaming stages, no driver state):
#   1. per-batch window explode → (gram, doc_id, pos) rows, one per sliding
#      window (the positions are what the removal needs; the stats operator
#      could pre-group, this one cannot),
#   2. ONE gram-keyed exchange: a gram's corpus count is its block-local run
#      length; emit (doc_id, pos) for windows of grams seen >1× corpus-wide,
#   3. ONE doc-keyed exchange over the UNION of those duplicated-window rows
#      and the original (doc_id, text) rows (pos = -1 tags the text side;
#      dedup.py:553 uses the same union-into-exchange shape): per block,
#      coverage is a +1/−1 difference array over the doc's token range
#      (+1 at pos, −1 at pos+8) prefix-summed once — tokens with coverage 0
#      survive and one binary_join rebuilds the text.  All vectorized; the
#      only per-row data moved twice is the 8-token gram string, the same
#      asymptotics as the decontaminate gram exchange (probe-flat at 100×).
# --------------------------------------------------------------------------

_WIN_SCHEMA = pa.schema([
    ("gram", pa.string()), ("doc_id", pa.int64()), ("pos", pa.int64()),
])
_COVER_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("pos", pa.int64()), ("text", pa.string()),
])
_REMOVE_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
    ("n_removed", pa.int64()), ("clean_text", pa.string()),
])


def _window_rows(t: pa.Table) -> pa.Table:
    """Per-batch (gram, doc_id, pos): every sliding 8-token window with its
    0-based start position — same gather as _gram_rows minus the group-by
    (removal needs each occurrence's position, not multiplicities)."""
    flat, cnt = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _WIN_SCHEMA.empty_table()
    nwin = np.maximum(cnt - (NGRAM_N - 1), 0)
    total = int(nwin.sum())
    if total == 0:
        return _WIN_SCHEMA.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    offs = np.zeros(len(cnt) + 1, np.int64)
    np.cumsum(cnt, out=offs[1:])
    win_doc = np.repeat(np.arange(len(cnt)), nwin)
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(np.cumsum(nwin) - nwin, nwin))
    win_start = pos + np.repeat(offs[:-1], nwin)
    gather = (win_start[:, None]
              + np.arange(NGRAM_N, dtype=np.int64)[None, :]).ravel()
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(total + 1, dtype=np.int32) * NGRAM_N, pa.int32()),
        flat.take(pa.array(gather)))
    return pa.table({"gram": pc.binary_join(lists, " "),
                     "doc_id": pa.array(ids[win_doc], pa.int64()),
                     "pos": pa.array(pos, pa.int64())})


def _dup_window_block(block: pa.Table) -> pa.Table:
    """All occurrences of a gram are co-located (exchange invariant), so its
    corpus count is the block-local run length; forward only the duplicated
    windows, tagged for the doc-keyed union exchange (text = null)."""
    if block.num_rows == 0:
        return _COVER_SCHEMA.empty_table()
    gram = block["gram"].to_numpy(zero_copy_only=False)
    order = np.argsort(gram, kind="mergesort")
    gram_s = gram[order]
    starts = np.flatnonzero(np.r_[True, gram_s[1:] != gram_s[:-1]])
    run_len = np.diff(np.r_[starts, len(gram_s)])
    dup = np.repeat(run_len > 1, run_len)
    keep = order[dup]
    return pa.table({
        "doc_id": block["doc_id"].take(pa.array(keep)),
        "pos": block["pos"].take(pa.array(keep)),
        "text": pa.nulls(len(keep), pa.string()),
    })


def _remove_covered_block(block: pa.Table) -> pa.Table:
    """Block holds BOTH row kinds for each of its doc_ids: the original text
    row (pos = -1) and the duplicated-window rows.  Coverage per token =
    prefix sum of a ±1 difference array (+1 at each dup window's start, −1
    past its end); tokens at coverage 0 survive, one binary_join per block
    rebuilds every doc's text."""
    if block.num_rows == 0:
        return _REMOVE_OUT_SCHEMA.empty_table()
    pos = block["pos"].to_numpy(zero_copy_only=False)
    text_side = pos == -1
    docs = block.filter(pa.array(text_side))
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="mergesort")
    ids = ids[order]
    flat, cnt = _tokenize_re2(docs["text"].take(pa.array(order)))
    offs = np.zeros(len(cnt) + 1, np.int64)
    np.cumsum(cnt, out=offs[1:])
    total = int(offs[-1])
    diff = np.zeros(total + 1, np.int64)
    dup_ids = block["doc_id"].to_numpy(zero_copy_only=False)[~text_side]
    dup_pos = pos[~text_side]
    if len(dup_ids):
        di = np.searchsorted(ids, dup_ids)
        start = offs[di] + dup_pos
        np.add.at(diff, start, 1)
        np.add.at(diff, start + NGRAM_N, -1)
    kept = np.cumsum(diff[:-1]) == 0
    kept_cum = np.zeros(total + 1, np.int64)
    np.cumsum(kept, out=kept_cum[1:])
    loffs = kept_cum[offs]
    lst = pa.ListArray.from_arrays(
        pa.array(loffs, pa.int64()).cast(pa.int32()),
        flat.take(pa.array(np.flatnonzero(kept))))
    n_kept = np.diff(loffs)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(cnt.astype(np.int64), pa.int64()),
        "n_removed": pa.array((cnt - n_kept).astype(np.int64), pa.int64()),
        "clean_text": pc.binary_join(lst, " "),
    })


def dup_ngram_removed_docs(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_removed, clean_text): every document rebuilt
    with the tokens covered by any corpus-duplicated 8-gram deleted.  Docs
    shorter than 8 tokens have no windows and pass through unchanged; a doc
    that is wall-to-wall boilerplate comes back as the empty string."""
    path = f"{sf_dir}/documents.parquet"
    n_parts = auto_partitions(path)
    wins = pruned_read(path, ["doc_id", "text"]).map_batches(
        _window_rows, batch_format="pyarrow", zero_copy_batch=True)
    dup_wins = per_key_blocks(wins, ["gram"], _dup_window_block,
                              num_partitions=n_parts)

    def tag_text(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "pos": pa.array(np.full(t.num_rows, -1, np.int64),
                                         pa.int64()),
                         "text": t["text"]})

    texts = pruned_read(path, ["doc_id", "text"]).map_batches(
        tag_text, batch_format="pyarrow", zero_copy_batch=True)
    return per_key_blocks(texts.union(dup_wins), ["doc_id"],
                          _remove_covered_block, num_partitions=n_parts)


SQL_DUP_NGRAM_REMOVED = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
grams AS (
  SELECT doc_id, p, array_to_string(tl[p + 1 : p + {NGRAM_N}], ' ') AS gram
  FROM d, LATERAL (SELECT unnest(range(0, greatest(len(tl) - {NGRAM_N - 1},
                                                   0))) AS p) u
),
cg AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
toks AS (
  SELECT doc_id, generate_subscripts(tl, 1) AS pos, unnest(tl) AS tok FROM d
),
cov AS (
  SELECT DISTINCT g.doc_id, t.pos
  FROM grams g JOIN cg USING (gram)
  JOIN toks t ON t.doc_id = g.doc_id
             AND t.pos BETWEEN g.p + 1 AND g.p + {NGRAM_N}
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
  WHERE c.pos IS NULL
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(len(d.tl) AS BIGINT) AS n_tokens,
       CAST(len(d.tl) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(agg.clean_text, '') AS clean_text
FROM d LEFT JOIN agg USING (doc_id)
"""


# --------------------------------------------------------------------------
# dsir_importance — data-selection importance weights (DSIR, Xie et al.,
# NeurIPS 2023): weight every raw-corpus document by how much its unigram
# distribution looks like a TARGET slice (here lang='en' — the "I have a
# small high-quality set, upsample raw data that resembles it" move).  DSIR
# proper uses hashed-n-gram log-likelihood ratios; this keeps the same
# estimator shape with an arithmetic-mean smoothed count ratio so the score
# is all-integer (no libm, hash-exact vs SQL; same trade documented on
# bigram_lm_score / corpus_freq_score).  importance_u =
# floor( Σ_w k_w · floor((c_tgt(w)+1)·1e6 / (c_raw(w)+1)) / n ) — the
# constant normalizer T_raw/T_tgt drops out of the RANKING, which is what a
# resampler consumes.  Distribution: per-batch (token, doc, k, tgt)
# combiner → ONE token-keyed exchange computes c_raw and c_tgt together
# (two reduceat passes over one sorted buffer) → doc-keyed integer mean.
# A weighted/top-k resample over the output composes with the existing
# weighted_sample / sample_k operators.
# --------------------------------------------------------------------------

DSIR_SCALE = 1_000_000
DSIR_TARGET_LANG = "en"

_DSIR_TOK_SCHEMA = pa.schema([
    ("w", pa.string()), ("doc_id", pa.int64()), ("k", pa.int64()),
    ("tgt", pa.int64()),
])
_DSIR_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
    ("importance_u", pa.int64()),
])


def _dsir_tok_rows(t: pa.Table) -> pa.Table:
    flat, cnt = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _DSIR_TOK_SCHEMA.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    tgt = pc.equal(t["lang"], DSIR_TARGET_LANG).to_numpy(zero_copy_only=False)
    g = pa.TableGroupBy(pa.table({
        "w": flat,
        "doc_id": pa.array(np.repeat(ids, cnt), pa.int64()),
        "tgt": pa.array(np.repeat(tgt.astype(np.int64), cnt), pa.int64()),
    }), ["w", "doc_id", "tgt"]).aggregate([([], "count_all")])
    return pa.table({"w": g["w"], "doc_id": g["doc_id"],
                     "k": g["count_all"].cast(pa.int64()), "tgt": g["tgt"]})


def _dsir_token_block(block: pa.Table) -> pa.Table:
    """All rows of a token co-located: c_raw = Σk, c_tgt = Σk·tgt per run."""
    if block.num_rows == 0:
        return _CONTRIB_SCHEMA.empty_table()
    w = block["w"].to_numpy(zero_copy_only=False)
    k = block["k"].to_numpy(zero_copy_only=False)
    tgt = block["tgt"].to_numpy(zero_copy_only=False)
    order = np.argsort(w, kind="mergesort")
    w, k, tgt = w[order], k[order], tgt[order]
    starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
    run_len = np.diff(np.r_[starts, len(k)])
    c_raw = np.repeat(np.add.reduceat(k, starts), run_len)
    c_tgt = np.repeat(np.add.reduceat(k * tgt, starts), run_len)
    unit = (c_tgt + 1) * DSIR_SCALE // (c_raw + 1)
    ids = block["doc_id"].to_numpy(zero_copy_only=False)[order]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "contrib": pa.array(k * unit, pa.int64()),
                     "k": pa.array(k, pa.int64())})


def _dsir_doc_block(block: pa.Table) -> pa.Table:
    if block.num_rows == 0:
        return _DSIR_OUT_SCHEMA.empty_table()
    t = _doc_mean_block(block)
    return t.rename_columns(["doc_id", "n_tokens", "importance_u"])


def dsir_importance(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, importance_u): mean smoothed target/raw unigram
    count ratio ×1e6 — high = the document's vocabulary resembles the
    target slice; feed into weighted_sample for DSIR-style resampling."""
    path = f"{sf_dir}/documents.parquet"
    rows = pruned_read(path, ["doc_id", "text", "lang"]).map_batches(
        _dsir_tok_rows, batch_format="pyarrow", zero_copy_batch=True)
    contrib = per_key_blocks(rows, ["w"], _dsir_token_block,
                             num_partitions=auto_partitions(path))
    return per_key_blocks(contrib, ["doc_id"], _dsir_doc_block,
                          num_partitions=8)


SQL_DSIR = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w,
         CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END AS tgt
  FROM documents
),
td AS (SELECT w, doc_id, tgt, COUNT(*) AS k FROM toks GROUP BY 1, 2, 3),
c AS (
  SELECT w, CAST(SUM(k) AS BIGINT) AS c_raw,
         CAST(SUM(k * tgt) AS BIGINT) AS c_tgt
  FROM td GROUP BY w
)
SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
       CAST(CAST(SUM(k * ((c_tgt + 1) * {DSIR_SCALE} // (c_raw + 1)))
                 AS HUGEINT) // SUM(k) AS BIGINT) AS importance_u
FROM td JOIN c USING (w)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# dsir_resample — the RESAMPLE half of DSIR (Xie et al., NeurIPS 2023):
# draw a fixed-size training subset where a document's selection chance
# grows with its importance weight. DSIR proper uses Gumbel top-k; this is
# the deterministic integer analog of Efraimidis-Spirakis weighted
# reservoir sampling (priority = u^(1/w), keep the k best): priority_u =
# knuth_hash32(doc_id) · 1e6 // (importance_u + 1) — the hash supplies the
# exchangeable randomness, a large weight divides the priority down, the k
# SMALLEST priorities win (ties → doc_id). No RNG, no float pow, rerunnable
# bit-for-bit. Distribution: the dsir_importance chain (2 exchanges), then
# a stateless priority map with a LOSSLESS per-batch bottom-k prune (the
# global bottom-k is a subset of batch bottom-ks — the sample_k pattern),
# so the final sort ranks k × batches rows, never the corpus.
# --------------------------------------------------------------------------

DSIR_SAMPLE_K = 100
_KNUTH32 = 2654435761  # matches curate.knuth_bucket / sql_bucket


def dsir_resample(sf_dir: str, k: int = DSIR_SAMPLE_K) -> rd.Dataset:
    """(doc_id, importance_u, priority_u): the k docs selected by
    deterministic weighted-without-replacement sampling over the DSIR
    importance weights."""
    imp = dsir_importance(sf_dir)

    def prio(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        w = t["importance_u"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * np.uint64(_KNUTH32)) \
                % np.uint64(1 << 32)
        # h ≤ 2^32-1 → h·1e6 < 2^52, exact in int64
        p = (h.astype(np.int64) * 1_000_000) // (w + 1)
        out = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "importance_u": pa.array(w, pa.int64()),
            "priority_u": pa.array(p, pa.int64()),
        })
        if out.num_rows > k:  # lossless bottom-k prune per batch
            keep = np.lexsort((ids, p))[:k]
            keep.sort()
            out = out.take(pa.array(keep))
        return out

    return (
        imp.map_batches(prio, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["priority_u", "doc_id"])
        .limit(k)
    )


SQL_DSIR_RESAMPLE = f"""
WITH imp AS ({SQL_DSIR})
SELECT doc_id, importance_u,
       CAST(CAST(doc_id AS HUGEINT) * {_KNUTH32} % 4294967296 * 1000000
            // (importance_u + 1) AS BIGINT) AS priority_u
FROM imp
ORDER BY priority_u, doc_id
LIMIT {DSIR_SAMPLE_K}
"""


# --------------------------------------------------------------------------
# oov_stats — vocabulary-coverage / out-of-vocabulary rate per document
# against the corpus top-K vocabulary (the tokenizer-coverage question every
# training run asks before committing a vocab: which documents would shatter
# into byte fallbacks?).
#
# Distribution shape: (1) per-batch (token, k) partial counts → ONE
# token-keyed exchange where each block holds its tokens' FULL corpus counts
# and emits only its local top-K candidates (the global top-K is a subset of
# the union of block top-Ks, since a token's rows never straddle blocks) —
# driver state is K×partitions rows, O(buckets) like the shuffle histogram;
# (2) the K-token vocab is ray.put ONCE and read zero-copy by every map task
# (never re-shipped per batch); (3) per-batch FINAL doc stats — each doc's
# text lives in one row, so no second exchange exists at all.  Tie-break at
# the rank-K boundary is (count DESC, token ASC), byte-identical to the SQL
# ORDER BY.
# --------------------------------------------------------------------------

VOCAB_K = 512

_VOCAB_SCHEMA = pa.schema([("w", pa.string()), ("k", pa.int64())])
_OOV_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("n_oov", pa.int64()),
])


def _vocab_rows(t: pa.Table) -> pa.Table:
    flat, _ = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _VOCAB_SCHEMA.empty_table()
    g = pa.TableGroupBy(pa.table({"w": flat}), ["w"]).aggregate(
        [([], "count_all")])
    return pa.table({"w": g["w"], "k": g["count_all"].cast(pa.int64())})


def _vocab_top_block(block: pa.Table) -> pa.Table:
    """All partials of a token are co-located → its corpus count is exact
    here; emit the block-local top-K by (count DESC, token ASC)."""
    if block.num_rows == 0:
        return _VOCAB_SCHEMA.empty_table()
    w = block["w"].to_numpy(zero_copy_only=False)
    k = block["k"].to_numpy(zero_copy_only=False)
    order = np.argsort(w, kind="mergesort")
    w, k = w[order], k[order]
    starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
    c = np.add.reduceat(k, starts)
    uw = w[starts]
    top = np.lexsort((uw, -c))[:VOCAB_K]
    return pa.table({"w": pa.array(uw[top], pa.string()),
                     "k": pa.array(c[top].astype(np.int64), pa.int64())})


def corpus_top_vocab(path: str, k: int = VOCAB_K) -> np.ndarray:
    """The corpus's top-``k`` tokens by total count (ties broken token-ASC),
    returned SORTED for searchsorted membership probes."""
    rows = pruned_read(path, ["text"]).map_batches(
        _vocab_rows, batch_format="pyarrow", zero_copy_batch=True)
    cand = per_key_blocks(rows, ["w"], _vocab_top_block,
                          num_partitions=auto_partitions(path))
    pdf = cand.to_pandas()  # ≤ K × partitions rows — bounded driver state
    pdf = pdf.sort_values(["k", "w"], ascending=[False, True],
                          kind="mergesort").head(k)
    return np.sort(pdf["w"].to_numpy())


def oov_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_oov): occurrences of tokens outside the corpus
    top-{VOCAB_K} vocabulary, per document (docs with no tokens emit no row,
    matching the oracle's inner grouping)."""
    import ray

    path = f"{sf_dir}/documents.parquet"
    vref = ray.put(corpus_top_vocab(path))

    def doc_stats(t: pa.Table) -> pa.Table:
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return _OOV_SCHEMA.empty_table()
        vocab = ray.get(vref)  # zero-copy object-store read, never re-shipped
        w = flat.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vocab, w).clip(max=max(len(vocab) - 1, 0))
        oov = (vocab[idx] != w) if len(vocab) else np.ones(len(w), bool)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        offs = np.zeros(len(cnt) + 1, np.int64)
        np.cumsum(cnt, out=offs[1:])
        nz = cnt > 0
        n_oov = np.add.reduceat(oov, offs[:-1][nz])
        return pa.table({
            "doc_id": pa.array(ids[nz], pa.int64()),
            "n_tokens": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            "n_oov": pa.array(n_oov.astype(np.int64), pa.int64()),
        })

    return pruned_read(path, ["doc_id", "text"]).map_batches(
        doc_stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_OOV = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
c AS (SELECT w, COUNT(*) AS c_w FROM toks GROUP BY w),
vocab AS (SELECT w FROM c ORDER BY c_w DESC, w ASC LIMIT {VOCAB_K})
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM toks LEFT JOIN vocab USING (w)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# perplexity_buckets — CCNet-style head/middle/tail tertiles over the
# bigram-LM score (Wenzek et al., LREC 2020 keep the head+middle of the
# perplexity distribution and drop/downweight the tail; the bucket label is
# what that policy consumes).
#
# Distribution shape: the scores table (docs-sized, three int64 columns) is
# materialized once so its three-exchange lineage doesn't run twice, then the
# dense-rank two-phase pattern (seeded_shuffle / pack_sequences): a
# 64-bucket histogram over the DESC-score key comes back to the driver
# (O(buckets) ints), ONE exchange keyed on the score bucket ranks each run
# locally and adds the bucket's prefix offset, and the NTILE boundary is pure
# integer arithmetic on (rank, total) — no global sort at any size.  The
# materialization is object-store blocks (spillable), ~24 bytes/doc; a
# 10^12-doc run would checkpoint the scores through the resumable sink
# instead (the run_training_mix picked-mix discipline) and read them back for
# both passes, which also makes the whole operator restartable.
# --------------------------------------------------------------------------

PPL_TILES = 3
PPL_BUCKETS = 64
_PPL_WIDTH = LM_SCALE // PPL_BUCKETS
_PPL_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("lm_score_u", pa.int64()),
    ("bucket", pa.int64()),
])


def perplexity_buckets(sf_dir: str) -> rd.Dataset:
    """(doc_id, lm_score_u, bucket): bucket = NTILE({PPL_TILES}) over
    (lm_score_u DESC, doc_id) — 1 = head (most fluent), 3 = tail (the docs a
    CCNet-style filter drops).  Docs with <2 tokens have no bigrams, hence
    no score and no row (same inner grouping as bigram_lm_score)."""
    scores = bigram_lm_score(sf_dir).materialize()

    def keyed(t: pa.Table) -> pa.Table:
        s = t["lm_score_u"].to_numpy(zero_copy_only=False)
        key = LM_SCALE - s  # ascending key == score descending
        return pa.table({
            "doc_id": t["doc_id"], "lm_score_u": t["lm_score_u"],
            "key": pa.array(key, pa.int64()),
            "bucket_k": pa.array(np.minimum(key // _PPL_WIDTH,
                                            PPL_BUCKETS - 1), pa.int64()),
        })

    counts = (scores.map_batches(keyed, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .groupby("bucket_k", num_partitions=8).count().to_pandas())
    offsets = np.zeros(PPL_BUCKETS + 1, np.int64)
    np.add.at(offsets, counts["bucket_k"].to_numpy() + 1,
              counts["count()"].to_numpy())
    offsets = np.cumsum(offsets)
    n = int(offsets[-1])
    q, rem = divmod(n, PPL_TILES)

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _PPL_OUT_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        key = block["key"].to_numpy(zero_copy_only=False)
        b = block["bucket_k"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key, b))
        b_sorted = b[order]
        starts = np.flatnonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])
        run_len = np.diff(np.r_[starts, len(b_sorted)])
        r = offsets[b_sorted] + _ramp(run_len)  # global 0-based rank
        # NTILE: the first `rem` tiles hold q+1 rows, the rest q — exactly
        # DuckDB's semantics, all-integer.
        head = rem * (q + 1)
        tile = np.where(r < head, r // max(q + 1, 1),
                        rem + (r - head) // max(q, 1)) + 1
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "lm_score_u": block["lm_score_u"].take(pa.array(order)),
            "bucket": pa.array(tile, pa.int64()),
        })

    keyed_ds = scores.map_batches(keyed, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return per_key_blocks(keyed_ds, ["bucket_k"], rank_block,
                          num_partitions=min(16, PPL_BUCKETS))


SQL_PPL_BUCKETS = f"""
WITH scores AS ({SQL_BIGRAM_LM})
SELECT doc_id, lm_score_u,
       CAST(NTILE({PPL_TILES}) OVER (ORDER BY lm_score_u DESC, doc_id)
            AS BIGINT) AS bucket
FROM scores
"""


# --------------------------------------------------------------------------
# source_overlap_matrix — cross-source n-gram contamination matrix: for every
# source pair, how many DISTINCT token 8-grams they share.  The question a
# corpus audit asks before mixing ("is src3 just a scrape of src7?") and the
# cross-split cousin of decontaminate.
#
# Distribution shape: per-batch distinct (gram, source) rows → ONE gram-keyed
# exchange; the exchange invariant co-locates all of a gram's rows, so each
# block folds its grams' source sets into uint64 BITMASKS (sources here are
# mixture components, dozens — asserted ≤ 64; a per-DOMAIN matrix at web
# scale would hash domains into ≤64 buckets the same way, or chunk the mask),
# dedups the masks, and one (U×S)ᵀ·(U×S) integer matmul yields the block's
# full pair-count matrix.  Each block then emits ≤ S² rows; the final
# aggregate sums S²-sized partials — driver/output state is O(S²) regardless
# of corpus size, and the gram exchange is the decontaminate shape
# (probe-flat at 100×).
# --------------------------------------------------------------------------

_SRC_GRAM_SCHEMA = pa.schema([("gram", pa.string()), ("source", pa.string())])
_OVERLAP_SCHEMA = pa.schema([
    ("source_a", pa.string()), ("source_b", pa.string()),
    ("n", pa.int64()),
])


def _source_gram_rows(t: pa.Table) -> pa.Table:
    """Per-batch DISTINCT (gram, source): the _gram_rows gather followed by a
    two-key distinct — multiplicities are irrelevant to set overlap, so the
    exchange moves each batch's (gram, source) at most once."""
    flat, cnt = _tokenize_re2(t["text"])
    if len(flat) == 0:
        return _SRC_GRAM_SCHEMA.empty_table()
    nwin = np.maximum(cnt - (NGRAM_N - 1), 0)
    total = int(nwin.sum())
    if total == 0:
        return _SRC_GRAM_SCHEMA.empty_table()
    offs = np.zeros(len(cnt) + 1, np.int64)
    np.cumsum(cnt, out=offs[1:])
    win_doc = np.repeat(np.arange(len(cnt)), nwin)
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(np.cumsum(nwin) - nwin, nwin))
    win_start = pos + np.repeat(offs[:-1], nwin)
    gather = (win_start[:, None]
              + np.arange(NGRAM_N, dtype=np.int64)[None, :]).ravel()
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(total + 1, dtype=np.int32) * NGRAM_N, pa.int32()),
        flat.take(pa.array(gather)))
    src = t["source"].to_numpy(zero_copy_only=False)
    g = pa.TableGroupBy(pa.table({
        "gram": pc.binary_join(lists, " "),
        "source": pa.array(src[win_doc], pa.string()),
    }), ["gram", "source"]).aggregate([])
    return g


def corpus_sources(path: str) -> np.ndarray:
    """Sorted distinct sources — O(S) driver state from one tiny aggregate."""
    ds = pruned_read(path, ["source"]).groupby(
        "source", num_partitions=4).count().to_pandas()
    return np.sort(ds["source"].to_numpy())


def source_overlap_matrix(sf_dir: str) -> rd.Dataset:
    """(source_a, source_b, n_shared_grams) for source_a < source_b, counting
    DISTINCT token 8-grams present in both sources; pairs sharing nothing
    emit no row (the SQL inner join's shape)."""
    path = f"{sf_dir}/documents.parquet"
    sources = corpus_sources(path)
    ns = len(sources)
    if ns > 64:  # pragma: no cover - the documented scale path
        raise NotImplementedError(
            "source bitmask is uint64; hash sources into <=64 buckets or "
            "chunk the mask for wider mixtures")

    def pair_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _OVERLAP_SCHEMA.empty_table()
        gram = block["gram"].to_numpy(zero_copy_only=False)
        src = block["source"].to_numpy(zero_copy_only=False)
        _, gid = np.unique(gram, return_inverse=True)
        si = np.searchsorted(sources, src)
        masks = np.zeros(gid.max() + 1, np.uint64)
        np.bitwise_or.at(masks, gid, np.uint64(1) << si.astype(np.uint64))
        um, uc = np.unique(masks, return_counts=True)
        bits = ((um[:, None] >> np.arange(ns, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        pairmat = (bits * uc[:, None]).T @ bits  # [i,j] = grams with both
        ii, jj = np.triu_indices(ns, k=1)
        n = pairmat[ii, jj]
        nz = n > 0
        return pa.table({
            "source_a": pa.array(sources[ii[nz]], pa.string()),
            "source_b": pa.array(sources[jj[nz]], pa.string()),
            "n": pa.array(n[nz], pa.int64()),
        })

    rows = pruned_read(path, ["source", "text"]).map_batches(
        _source_gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    partials = per_key_blocks(rows, ["gram"], pair_block,
                              num_partitions=auto_partitions(path))

    def final_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("source_a", pa.string()),
                              ("source_b", pa.string()),
                              ("n_shared_grams", pa.int64())]).empty_table()
        g = pa.TableGroupBy(block, ["source_a", "source_b"]).aggregate(
            [("n", "sum")])
        return pa.table({"source_a": g["source_a"],
                         "source_b": g["source_b"],
                         "n_shared_grams": g["n_sum"].cast(pa.int64())})

    return per_key_blocks(partials, ["source_a", "source_b"], final_block,
                          num_partitions=4)


SQL_SOURCE_OVERLAP = rf"""
WITH d AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
grams AS (
  SELECT DISTINCT source,
         array_to_string(tl[p + 1 : p + {NGRAM_N}], ' ') AS gram
  FROM d, LATERAL (SELECT unnest(range(0, greatest(len(tl) - {NGRAM_N - 1},
                                                   0))) AS p) u
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM grams a JOIN grams b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""


QUERIES = {"bigram_lm_score": bigram_lm_score,
           "perplexity_buckets": perplexity_buckets,
           "dup_ngram_stats": dup_ngram_stats,
           "dup_ngram_removed_docs": dup_ngram_removed_docs,
           "oov_stats": oov_stats,
           "dsir_importance": dsir_importance,
    "dsir_resample": dsir_resample,
           "source_overlap_matrix": source_overlap_matrix}
SQL = {"bigram_lm_score": SQL_BIGRAM_LM,
       "perplexity_buckets": SQL_PPL_BUCKETS,
       "dup_ngram_stats": SQL_DUP_NGRAMS,
       "dup_ngram_removed_docs": SQL_DUP_NGRAM_REMOVED,
       "oov_stats": SQL_OOV,
       "dsir_importance": SQL_DSIR,
    "dsir_resample": SQL_DSIR_RESAMPLE,
       "source_overlap_matrix": SQL_SOURCE_OVERLAP}


# --------------------------------------------------------------------------
# token_cooc_lift — document-level co-occurrence counts + lift over the
# corpus top-V vocabulary: the PMI / collocation-detection prep table
# (word-embedding objectives and phrase miners both start from exactly
# these counts). Lift is kept as the exact rational
# n_ab·n_docs·1e6 // (n_a·n_b) — integer, no libm log, > 1e6 means
# positively associated.
#
# Distribution shape: vocabulary = corpus_top_vocab's bounded exchange
# (block-local top-V candidates, O(V × partitions) driver state, broadcast
# once with ray.put); then ONE streaming pass folds each block into a 0/1
# doc×V presence matrix and emits its V×V upper-triangle BᵀB partial plus a
# doc-count sentinel — O(V²) rows per block, never token pairs; one tiny
# (i, j)-keyed exchange reduces them and the driver folds the V²-bounded
# result into the output table. The source_overlap_matrix shape, keyed on
# vocabulary instead of sources.
# --------------------------------------------------------------------------

PMI_V = 32

_COOC_SCHEMA = pa.schema([
    ("i", pa.int64()), ("j", pa.int64()), ("n", pa.int64()),
])


def token_cooc_lift(sf_dir: str, v: int = PMI_V) -> rd.Dataset:
    """(tok_a, tok_b, n_ab, n_a, n_b, lift_micros) for every top-V token
    pair co-occurring in ≥1 document (tok_a < tok_b)."""
    import ray
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    vocab = corpus_top_vocab(path, v)
    V = len(vocab)
    vref = ray.put(vocab)

    def cooc_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COOC_SCHEMA.empty_table()
        flat, cnt = _tokenize_re2(t["text"])
        voc = ray.get(vref)
        n = t.num_rows
        B = np.zeros((n, V), np.int64)
        if len(flat):
            w = flat.to_numpy(zero_copy_only=False)
            idx = np.searchsorted(voc, w).clip(max=max(V - 1, 0))
            hit = voc[idx] == w if V else np.zeros(len(w), bool)
            doc_idx = np.repeat(np.arange(n), cnt)
            B[doc_idx[hit], idx[hit]] = 1
        P = B.T @ B                      # V×V presence co-occurrence
        iu, ju = np.triu_indices(V)
        vals = P[iu, ju]
        nz = vals > 0
        return pa.table({
            "i": pa.array(np.r_[iu[nz], -1], pa.int64()),
            "j": pa.array(np.r_[ju[nz], -1], pa.int64()),
            "n": pa.array(np.r_[vals[nz], n], pa.int64()),  # sentinel: docs
        })

    agg = (pruned_read(path, ["text"])
           .map_batches(cooc_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(["i", "j"], num_partitions=4)
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())                 # ≤ V²/2 + 1 rows — bounded
    n_docs = int(agg.loc[(agg["i"] == -1), "n"].iloc[0])
    pairs = agg[agg["i"] >= 0]
    diag = {int(i): int(nn) for i, j, nn in
            pairs[["i", "j", "n"]].itertuples(index=False) if i == j}
    out = {"tok_a": [], "tok_b": [], "n_ab": [], "n_a": [], "n_b": [],
           "lift_micros": []}
    for i, j, n_ab in pairs[["i", "j", "n"]].itertuples(index=False):
        if i == j:
            continue
        n_a, n_b = diag[int(i)], diag[int(j)]
        out["tok_a"].append(vocab[int(i)])
        out["tok_b"].append(vocab[int(j)])
        out["n_ab"].append(int(n_ab))
        out["n_a"].append(n_a)
        out["n_b"].append(n_b)
        out["lift_micros"].append(int(n_ab) * n_docs * 1_000_000
                                  // (n_a * n_b))
    return rd.from_arrow(pa.table({
        "tok_a": pa.array(out["tok_a"], pa.string()),
        "tok_b": pa.array(out["tok_b"], pa.string()),
        "n_ab": pa.array(out["n_ab"], pa.int64()),
        "n_a": pa.array(out["n_a"], pa.int64()),
        "n_b": pa.array(out["n_b"], pa.int64()),
        "lift_micros": pa.array(out["lift_micros"], pa.int64()),
    }))


SQL_TOKEN_COOC = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
c AS (SELECT w, COUNT(*) AS c_w FROM toks GROUP BY w),
vocab AS (SELECT w FROM c ORDER BY c_w DESC, w ASC LIMIT {PMI_V}),
pres AS (SELECT DISTINCT doc_id, w FROM toks JOIN vocab USING (w)),
df AS (SELECT w, COUNT(*) AS n FROM pres GROUP BY w),
nd AS (SELECT COUNT(*) AS n FROM documents),
co AS (
  SELECT a.w AS tok_a, b.w AS tok_b, COUNT(*) AS n_ab
  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
)
SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(da.n AS BIGINT) AS n_a, CAST(db.n AS BIGINT) AS n_b,
       CAST(CAST(n_ab AS HUGEINT) * nd.n * 1000000
            // (CAST(da.n AS HUGEINT) * db.n) AS BIGINT) AS lift_micros
FROM co JOIN df da ON da.w = co.tok_a JOIN df db ON db.w = co.tok_b, nd
"""


QUERIES["token_cooc_lift"] = token_cooc_lift
SQL["token_cooc_lift"] = SQL_TOKEN_COOC


# --------------------------------------------------------------------------
# ccnet_filter — the composed CCNet keep-set (Wenzek et al., LREC 2020):
# documents that are (a) identified as the target language and (b) in the
# head/middle of the corpus perplexity distribution. The canonical
# two-signal curation screen, composed from two verified operators —
# perplexity_buckets (bigram-LM + distributed NTILE) and lang_id (warm
# stopword-profile actor pool) — joined on ONE doc-keyed scalar exchange
# (Dataset.join; both sides are (doc_id, small ints/strings), text never
# moves).
# --------------------------------------------------------------------------

CCNET_KEEP_BUCKETS = 2        # head + middle of the PPL_TILES tertiles
CCNET_LANG = "en"


def ccnet_filter(sf_dir: str) -> rd.Dataset:
    """(doc_id, lm_score_u, bucket): the docs a CCNet-style screen keeps —
    pred_lang == 'en' and perplexity bucket ≤ 2."""
    import pyarrow.compute as pc

    from ocrautomator_ray.functions.exchange import auto_partitions
    from ocrautomator_ray.functions.text import lang_id

    buckets = perplexity_buckets(sf_dir).map_batches(
        lambda t: t.filter(pc.less_equal(t["bucket"], CCNET_KEEP_BUCKETS)),
        batch_format="pyarrow", zero_copy_batch=True)
    langs = lang_id(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["pred_lang"],
                                    CCNET_LANG)).select(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return buckets.join(
        langs, join_type="inner",
        num_partitions=auto_partitions(f"{sf_dir}/documents.parquet"),
        on=("doc_id",))


def _sql_ccnet_filter() -> str:
    from ocrautomator_ray.functions.text import SQL_LANG_ID

    return f"""
WITH ppl AS ({SQL_PPL_BUCKETS}),
lang AS ({SQL_LANG_ID})
SELECT p.doc_id, p.lm_score_u, p.bucket
FROM ppl p JOIN lang l USING (doc_id)
WHERE p.bucket <= {CCNET_KEEP_BUCKETS} AND l.pred_lang = '{CCNET_LANG}'
"""


SQL_CCNET_FILTER = _sql_ccnet_filter()

QUERIES["ccnet_filter"] = ccnet_filter
SQL["ccnet_filter"] = SQL_CCNET_FILTER
