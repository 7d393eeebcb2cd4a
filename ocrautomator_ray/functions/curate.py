"""Training-data curation operators (SURVEY.md §2 extension set).

Operations every large-scale LLM data pipeline needs, each Ray-Data-first
and SQL-oracled (see also ``top_ngrams`` and ``stratified_sample`` below):

- ``decontaminate``: flag training documents sharing any word k-gram with an
  eval/benchmark subset — the train-test decontamination pass (Brown et al.,
  GPT-3 appendix C; Dodge et al. 2021). Implemented as a gram-hash
  partitioned exchange (NOT a broadcast): both sides emit (gram_hash,
  doc_id) rows, one hash repartition co-locates equal grams, membership is a
  sorted np.isin per partition, and a final groupby sums per-doc hits. Scales
  to eval sets far beyond driver RAM; a genuinely-small benchmark could use
  the ann-style broadcast instead, but the exchange is the 100-TB-safe
  default.
- ``hash_split``: deterministic train/val/test assignment by multiplicative
  hashing (Knuth) of doc_id — reproducible split at any scale, no shuffle,
  no state; pure map.
- ``repetition_stats``: per-document repetition quality signals in the
  Gopher style (Rae et al. 2021, Table A1): duplicate-line fraction and
  duplicate-word fraction. Pure vectorized map over Arrow batches; fractions
  are integerized at 1e-6 so the SQL oracle hash-matches.

Distinct-count kernels use 64-bit FNV hashes of lines/words/grams; a hash
collision could undercount a distinct set by 1 (probability ~n²/2^64 —
negligible at any batch size used here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.dedup import (
    _fnv1a_strings,
    _ramp,
    _split_tokens,
    _tokenize_re2,
)
from ocrautomator_ray.functions.exchange import pruned_read, tune_exchange

# ---------------------------------------------------------------------------
# decontaminate — train docs sharing any word k-gram with the eval subset
# ---------------------------------------------------------------------------

DECONTAM_K = 3  # word k-gram size (the synthetic corpus' docs are short —
# real pipelines use 8-13-gram windows; the machinery is k-agnostic)
EVAL_MODULUS = 100  # doc_id % EVAL_MODULUS == 0 → eval/benchmark subset


def _batch_kgrams(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat distinct gram hashes, per-doc counts) of word k-grams.

    Docs with fewer than k words produce no grams (matches the SQL oracle's
    ``generate_series(1, len(w)-k+1)``, empty for short docs — unlike the
    MinHash shingler, which folds short docs into one joined gram).
    """
    import pyarrow.compute as pc

    flat, counts = _tokenize_re2(texts)
    n = len(counts)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(0, np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    reg = np.nonzero(counts >= k)[0]
    if reg.size == 0:
        return np.empty(0, np.uint64), np.zeros(n, np.int64)
    gc = counts[reg] - k + 1
    gstart = np.repeat(offs[reg], gc) + _ramp(gc)
    cols = [flat.take(pa.array(gstart + j)) for j in range(k)]
    grams = pc.binary_join_element_wise(*cols, " ")
    gh = _fnv1a_strings(grams)
    gd = np.repeat(reg, gc)
    order = np.lexsort((gh, gd))
    gh, gd = gh[order], gd[order]
    keep = np.ones(len(gh), dtype=bool)
    keep[1:] = (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])
    return gh[keep], np.bincount(gd[keep], minlength=n).astype(np.int64)


def decontaminate(sf_dir: str, k: int = DECONTAM_K,
                  eval_modulus: int = EVAL_MODULUS,
                  num_partitions: int | None = None) -> rd.Dataset:
    """(doc_id, shared_grams) for every TRAIN doc (doc_id % eval_modulus != 0)
    sharing ≥1 distinct word k-gram with the eval subset (doc_id % m == 0)."""
    from ocrautomator_ray.functions.exchange import auto_partitions

    if num_partitions is None:
        # gram rows ≈ 8× the text bytes; size the exchange accordingly
        num_partitions = auto_partitions(f"{sf_dir}/documents.parquet",
                                         bytes_per_partition=8 << 20)
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    tune_exchange(ds, num_partitions)

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        gh, cnt = _batch_kgrams(t["text"], k)
        doc = np.repeat(ids, cnt)
        is_eval = doc % eval_modulus == 0
        from ocrautomator_ray.functions.exchange import sentinel_pad

        # eval rows carry -1 (membership only); -2 pads an empty block so it
        # can't poison the exchange (dropped in match_block)
        return sentinel_pad(pa.table({
            "gh": pa.array(gh, pa.uint64()),
            "doc_id": pa.array(np.where(is_eval, -1, doc), pa.int64()),
        }), pa.table({"gh": pa.array([0], pa.uint64()),
                      "doc_id": pa.array([-2], pa.int64())}))

    grams = ds.map_batches(gram_rows, batch_format="pyarrow",
                           zero_copy_batch=True)

    partial_schema = pa.schema([("doc_id", pa.int64()), ("n", pa.int64())])

    def match_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        gh = block["gh"].to_numpy(zero_copy_only=False)
        doc = block["doc_id"].to_numpy(zero_copy_only=False)
        keep = doc != -2  # empty-block sentinels
        gh, doc = gh[keep], doc[keep]
        ev = doc < 0
        hit = np.isin(gh[~ev], np.unique(gh[ev]))
        d, c = np.unique(doc[~ev][hit], return_counts=True)
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum

    partials = (
        grams.repartition(num_partitions, keys=["gh"])
        .map_batches(match_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )
    # (doc_id, gram) rows are globally distinct (grams deduped per doc, one
    # doc per row upstream), so summing partition partials == count(distinct)
    return partials.groupby("doc_id", num_partitions=num_partitions).aggregate(
        Sum("n", alias_name="shared_grams"))


SQL_DECONTAMINATE = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[i.i : i.i + {DECONTAM_K - 1}], ' ') AS g
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {DECONTAM_K - 1})) AS i) i
),
eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MODULUS} = 0
)
SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS shared_grams
FROM grams
WHERE doc_id % {EVAL_MODULUS} <> 0 AND g IN (SELECT g FROM eval_grams)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# contamination_fraction — the FRACTIONAL contamination rule (the PaLM /
# GPT-3 appendix convention: a train doc is "contaminated" when a high
# fraction of its n-grams appears in the eval set, not when any single gram
# does). decontaminate answers "which docs share ≥1 gram"; this grades HOW
# MUCH of each doc overlaps — the number real pipelines threshold and audit.
# Distribution: the same gram-keyed exchange as decontaminate produces
# per-doc shared partials; per-doc TOTAL distinct-gram counts are FINAL per
# batch (each doc's text lives in one row), ride the same doc-keyed groupby
# as a second summed column, and the fraction finalizes as one exact integer
# division — 2 exchanges total, text never moves. All-integer: frac_u =
# shared·1e6 // total, flag = frac_u ≥ CONTAM_THRESH_U (70%, the PaLM bar).
# ---------------------------------------------------------------------------

CONTAM_THRESH_U = 700_000  # 70% of a doc's distinct grams seen in eval


def contamination_fraction(sf_dir: str, k: int = DECONTAM_K,
                           eval_modulus: int = EVAL_MODULUS,
                           num_partitions: int | None = None) -> rd.Dataset:
    """(doc_id, n_grams, shared_grams, contam_frac_u, contaminated) for
    every TRAIN doc with ≥1 word k-gram: what share of its distinct grams
    also occurs in the eval subset (doc_id % m == 0)."""
    from ray.data.aggregate import Sum

    from ocrautomator_ray.functions.exchange import (auto_partitions,
                                                     sentinel_pad)

    if num_partitions is None:
        num_partitions = auto_partitions(f"{sf_dir}/documents.parquet",
                                         bytes_per_partition=8 << 20)
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    tune_exchange(ds, num_partitions)

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        gh, cnt = _batch_kgrams(t["text"], k)
        doc = np.repeat(ids, cnt)
        is_eval = doc % eval_modulus == 0
        return sentinel_pad(pa.table({
            "gh": pa.array(gh, pa.uint64()),
            "doc_id": pa.array(np.where(is_eval, -1, doc), pa.int64()),
        }), pa.table({"gh": pa.array([0], pa.uint64()),
                      "doc_id": pa.array([-2], pa.int64())}))

    partial_schema = pa.schema([("doc_id", pa.int64()), ("n", pa.int64()),
                                ("tot", pa.int64())])

    def match_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        gh = block["gh"].to_numpy(zero_copy_only=False)
        doc = block["doc_id"].to_numpy(zero_copy_only=False)
        keep = doc != -2
        gh, doc = gh[keep], doc[keep]
        ev = doc < 0
        hit = np.isin(gh[~ev], np.unique(gh[ev]))
        d, c = np.unique(doc[~ev][hit], return_counts=True)
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64()),
                         "tot": pa.array(np.zeros(len(d), np.int64))})

    def total_rows(t: pa.Table) -> pa.Table:
        # per-doc distinct-gram totals: FINAL per batch (doc in one row)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        _, cnt = _batch_kgrams(t["text"], k)
        train = (ids % eval_modulus != 0) & (cnt > 0)
        return pa.table({
            "doc_id": pa.array(ids[train], pa.int64()),
            "n": pa.array(np.zeros(int(train.sum()), np.int64)),
            "tot": pa.array(cnt[train], pa.int64()),
        })

    grams = ds.map_batches(gram_rows, batch_format="pyarrow",
                           zero_copy_batch=True)
    shared = (
        grams.repartition(num_partitions, keys=["gh"])
        .map_batches(match_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )
    totals = ds.map_batches(total_rows, batch_format="pyarrow",
                            zero_copy_batch=True)
    summed = totals.union(shared).groupby(
        "doc_id", num_partitions=num_partitions).aggregate(
        Sum("n", alias_name="shared_grams"),
        Sum("tot", alias_name="n_grams"))

    def finalize(t: pa.Table) -> pa.Table:
        shared_n = t["shared_grams"].to_numpy(zero_copy_only=False)
        tot = t["n_grams"].to_numpy(zero_copy_only=False)
        frac = shared_n * 1_000_000 // tot
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": t["n_grams"],
            "shared_grams": t["shared_grams"],
            "contam_frac_u": pa.array(frac, pa.int64()),
            "contaminated": pa.array(
                (frac >= CONTAM_THRESH_U).astype(np.int64), pa.int64()),
        })

    return summed.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


SQL_CONTAMINATION_FRACTION = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[i.i : i.i + {DECONTAM_K - 1}], ' ') AS g
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {DECONTAM_K - 1})) AS i) i
),
eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MODULUS} = 0
),
tr AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(*) FILTER (WHERE g IN (SELECT g FROM eval_grams))
              AS BIGINT) AS shared_grams
  FROM grams WHERE doc_id % {EVAL_MODULUS} <> 0 GROUP BY doc_id
)
SELECT doc_id, n_grams, shared_grams,
       shared_grams * 1000000 // n_grams AS contam_frac_u,
       CAST(CASE WHEN shared_grams * 1000000 // n_grams
                      >= {CONTAM_THRESH_U} THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM tr
"""


# ---------------------------------------------------------------------------
# hash_split — deterministic train/val/test assignment
# ---------------------------------------------------------------------------

_KNUTH = 2654435761  # 2^32 * golden-ratio conjugate (Knuth multiplicative)
SPLIT_TRAIN_PERMILLE = 980
SPLIT_VAL_PERMILLE = 990


def knuth_bucket(ids: np.ndarray) -> np.ndarray:
    """knuth_hash(id) mod 1000 — THE canonical split/sample bucket. uint64
    wrap-around times-then-mod-2^32 equals exact product mod 2^32 (since
    2^32 divides 2^64), matching the SQL mirror's HUGEINT arithmetic."""
    with np.errstate(over="ignore"):
        h = (ids.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(1 << 32)
    return (h % np.uint64(1000)).astype(np.int64)


def split_of(bucket: np.ndarray) -> np.ndarray:
    """bucket → 'train'/'val'/'test' at 98/1/1."""
    return np.where(bucket < SPLIT_TRAIN_PERMILLE, "train",
                    np.where(bucket < SPLIT_VAL_PERMILLE, "val", "test"))


def sql_bucket(col: str) -> str:
    """SQL mirror of ``knuth_bucket`` over a BIGINT column expression."""
    return f"CAST(CAST({col} AS HUGEINT) * {_KNUTH} % 4294967296 % 1000 AS BIGINT)"


def sql_split(col: str) -> str:
    """SQL mirror of ``split_of(knuth_bucket(col))``."""
    return (f"CASE WHEN {sql_bucket(col)} < {SPLIT_TRAIN_PERMILLE} THEN 'train' "
            f"WHEN {sql_bucket(col)} < {SPLIT_VAL_PERMILLE} THEN 'val' "
            f"ELSE 'test' END")


def hash_split(sf_dir: str) -> rd.Dataset:
    """(doc_id, bucket, split): bucket = knuth_hash(doc_id) mod 1000 and
    split = train/val/test at 98/1/1 — deterministic, stateless,
    shuffle-free."""
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        bucket = knuth_bucket(t["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": t["doc_id"],
            "bucket": pa.array(bucket, pa.int64()),
            "split": pa.array(split_of(bucket), pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


SQL_HASH_SPLIT = f"""
SELECT doc_id,
       {sql_bucket('doc_id')} AS bucket,
       {sql_split('doc_id')} AS split
FROM documents
"""


def split_balance(sf_dir: str) -> rd.Dataset:
    """(split, source, n_docs, n_tokens): the split QA table — per
    train/val/test × source, how many documents and tokens landed there.
    The audit every pipeline runs after hash_split (is val non-empty per
    source? did a hot source capture the test set?). Stateless per-batch
    (split, source) partials — docs counted, tokens RE2-counted without
    tokenizing — reduce in a 3×sources-bounded groupby; text never moves."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocrautomator_ray.functions.text import TOKEN_RE

    ds = pruned_read(f"{sf_dir}/documents.parquet",
                     ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        bucket = knuth_bucket(t["doc_id"].to_numpy(zero_copy_only=False))
        toks = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE),
                       pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(pa.table({
            "split": pa.array(split_of(bucket), pa.string()),
            "source": t["source"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "tok": pa.array(toks, pa.int64()),
        }), ["split", "source"]).aggregate([("n", "sum"), ("tok", "sum")])
        return g.rename_columns(["split", "source", "n", "tok"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(["split", "source"], num_partitions=2).aggregate(
        Sum("n", alias_name="n_docs"), Sum("tok", alias_name="n_tokens"))


SQL_SPLIT_BALANCE = f"""
SELECT {sql_split('doc_id')} AS split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS BIGINT)
           AS n_tokens
FROM documents
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# repetition_stats — Gopher-style per-document repetition signals
# ---------------------------------------------------------------------------

def _distinct_per_doc(hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Number of distinct hash values inside each doc's slice."""
    n = len(counts)
    if hashes.size == 0:
        return np.zeros(n, np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((hashes, doc))
    h, d = hashes[order], doc[order]
    first = np.ones(len(h), dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return np.bincount(d[first], minlength=n).astype(np.int64)


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_lines, n_words, dup_line_frac_u, dup_word_frac_u): the
    fraction of lines / lowercased words that are repeats of an earlier one,
    integerized at 1e-6. High values flag boilerplate/spam for filtering."""
    import pyarrow.compute as pc

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks()
                            if isinstance(t["text"], pa.ChunkedArray)
                            else t["text"], "")
        lines = pc.split_pattern(text, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        line_counts = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        line_h = _fnv1a_strings(lines.flatten())
        line_distinct = _distinct_per_doc(line_h, line_counts)

        words, word_counts = _tokenize_re2(text)
        word_distinct = _distinct_per_doc(_fnv1a_strings(words), word_counts)

        dup_line = 1.0 - line_distinct / line_counts  # ≥1 line always (split of "")
        with np.errstate(invalid="ignore"):
            dup_word = np.where(word_counts > 0,
                                1.0 - word_distinct / np.maximum(word_counts, 1),
                                0.0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_lines": pa.array(line_counts, pa.int64()),
            "n_words": pa.array(word_counts, pa.int64()),
            "dup_line_frac_u": pa.array(
                np.floor(dup_line * 1_000_000 + 0.5).astype(np.int64)),
            "dup_word_frac_u": pa.array(
                np.floor(dup_word * 1_000_000 + 0.5).astype(np.int64)),
        })

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_REPETITION_STATS = """
WITH t AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(FLOOR((1 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines))
                  * 1000000 + 0.5) AS BIGINT) AS dup_line_frac_u,
       CAST(CASE WHEN len(w) = 0 THEN 0
                 ELSE FLOOR((1 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
                            * 1000000 + 0.5)
            END AS BIGINT) AS dup_word_frac_u
FROM t
"""


# ---------------------------------------------------------------------------
# stratified_sample — per-stratum deterministic downsampling
# ---------------------------------------------------------------------------

def _stratum_permille(name: str) -> int:
    """Per-source sampling rate in permille — a pure function of the stratum
    name so engine and SQL agree without a shared config table. Real
    pipelines would broadcast a rates dict instead; the selection mechanics
    (stratum → rate, hash(doc_id) < rate) are identical."""
    c = ord(name[3]) if len(name) > 3 else 0
    return 50 + 90 * (c % 7)


def stratified_sample(sf_dir: str) -> rd.Dataset:
    """(doc_id, source) rows surviving per-source downsampling: a doc is kept
    iff knuth_hash(doc_id) mod 1000 < its source's permille rate. Stateless,
    shuffle-free, reproducible — rerunning selects the same rows, and the
    same doc keeps/drops consistently across pipelines (the property that
    matters for incremental corpus rebuilds)."""
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "source"])

    def pick(t: pa.Table) -> pa.Table:
        srcs = t["source"].to_numpy(zero_copy_only=False)
        bucket = knuth_bucket(t["doc_id"].to_numpy(zero_copy_only=False))
        uniq, inv = np.unique(srcs, return_inverse=True)
        permille = np.array([_stratum_permille(u) for u in uniq],
                            np.int64)[inv]
        keep = bucket < permille
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "source": t["source"].filter(pa.array(keep)),
        })

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, source
FROM documents
WHERE {sql_bucket('doc_id')} < 50 + 90 * (ascii(substr(source, 4, 1)) % 7)
"""


# ---------------------------------------------------------------------------
# dedup_best_docs — exact dedup keeping the BEST copy, not the first: when
# identical text arrives from several sources (mirrors, re-crawls), real
# pipelines keep the copy from the most trusted source rather than the
# smallest id. Identical texts have identical text-derived quality, so the
# arbitration signal must be metadata — here the per-source priority is the
# same closed-form permille used by stratified_sample (engine and SQL agree
# without a shared config table). Keep rule per text group: max source
# priority, then min doc_id; n_copies audits the group size. Distribution:
# per-batch lossless prune (best row + count per batch-local text group) →
# ONE text-keyed exchange (the same GROUP BY text shuffle as
# dedup_first_docs — text moves once, pre-pruned) → in-block argmax.
# ---------------------------------------------------------------------------

_BEST_SCHEMA = pa.schema([("text", pa.string()), ("doc_id", pa.int64()),
                          ("source", pa.string()), ("pr", pa.int64()),
                          ("c", pa.int64())])
_BEST_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                              ("source", pa.string()),
                              ("n_copies", pa.int64())])


def _best_rows(text: np.ndarray, ids: np.ndarray, srcs: np.ndarray,
               pr: np.ndarray, c: np.ndarray) -> pa.Table:
    """Group by text; keep (max pr, then min doc_id) per group; sum c."""
    order = np.lexsort((ids, -pr, text))
    text_s = text[order]
    starts = np.flatnonzero(np.r_[True, text_s[1:] != text_s[:-1]])
    best = order[starts]
    csum = np.add.reduceat(c[order], starts)
    return pa.table({
        "text": pa.array(text[best], pa.string()),
        "doc_id": pa.array(ids[best], pa.int64()),
        "source": pa.array(srcs[best], pa.string()),
        "pr": pa.array(pr[best], pa.int64()),
        "c": pa.array(csum.astype(np.int64), pa.int64()),
    })


def dedup_best_docs(sf_dir: str) -> rd.Dataset:
    """(doc_id, source, n_copies): one row per distinct text — the kept
    copy (highest source priority, tie → min doc_id) and how many exact
    copies existed corpus-wide."""
    from ocrautomator_ray.functions.exchange import (auto_partitions,
                                                     per_key_blocks)

    path = f"{sf_dir}/documents.parquet"
    ds = pruned_read(path, ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _BEST_SCHEMA.empty_table()
        srcs = t["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(srcs, return_inverse=True)
        pr = np.array([_stratum_permille(u) for u in uniq], np.int64)[inv]
        return _best_rows(t["text"].to_numpy(zero_copy_only=False),
                          t["doc_id"].to_numpy(zero_copy_only=False),
                          srcs, pr, np.ones(t.num_rows, np.int64))

    def best_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _BEST_OUT_SCHEMA.empty_table()
        t = _best_rows(block["text"].to_numpy(zero_copy_only=False),
                       block["doc_id"].to_numpy(zero_copy_only=False),
                       block["source"].to_numpy(zero_copy_only=False),
                       block["pr"].to_numpy(zero_copy_only=False),
                       block["c"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "n_copies": t["c"]})

    pruned = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    return per_key_blocks(pruned, ["text"], best_block,
                          num_partitions=auto_partitions(path))


SQL_DEDUP_BEST = """
SELECT doc_id, source, n_copies FROM (
  SELECT doc_id, source,
         CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS n_copies,
         row_number() OVER (
           PARTITION BY text
           ORDER BY 50 + 90 * (ascii(substr(source, 4, 1)) % 7) DESC,
                    doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# top_ngrams — corpus-level heavy hitters (most frequent word n-grams)
# ---------------------------------------------------------------------------

TOP_NGRAM_N = 2
TOP_NGRAM_K = 100


def top_ngrams(sf_dir: str, n: int = TOP_NGRAM_N,
               k: int = TOP_NGRAM_K) -> rd.Dataset:
    """(gram, n_occurrences) for the corpus' k most frequent word n-grams
    (count desc, gram asc tie-break) — the heavy-hitter scan behind
    boilerplate discovery and repetition audits.

    The combiner pattern end-to-end: each batch counts its own grams (one
    Arrow group-by, so the shuffle moves distinct-grams-per-batch rows, not
    one row per occurrence), a hash groupby sums partials, and only the
    final k rows reach the driver via sort + limit."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocrautomator_ray.functions.exchange import auto_partitions, tune_exchange

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["text"])
    n_parts = auto_partitions(f"{sf_dir}/documents.parquet")
    tune_exchange(ds, n_parts)

    def partial_counts(t: pa.Table) -> pa.Table:
        flat, counts = _tokenize_re2(t["text"])
        nd = len(counts)
        if nd == 0 or len(flat) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        offs = np.zeros(nd + 1, np.int64)
        np.cumsum(counts, out=offs[1:])
        reg = np.nonzero(counts >= n)[0]
        if reg.size == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        gc = counts[reg] - n + 1
        gstart = np.repeat(offs[reg], gc) + _ramp(gc)
        cols = [flat.take(pa.array(gstart + j)) for j in range(n)]
        grams = pc.binary_join_element_wise(*cols, " ")
        g = pa.TableGroupBy(pa.table({"gram": grams}), "gram") \
            .aggregate([("gram", "count")])
        return pa.table({"gram": g["gram"],
                         "n": g["gram_count"].cast(pa.int64())})

    def local_topk(t: pa.Table) -> pa.Table:
        # lossless prune: the groupby put each gram's TOTAL in exactly one
        # partition, so the global top-k is a subset of per-partition top-ks —
        # the final sort then ranks k×partitions rows, not every distinct gram
        if t.num_rows <= k:
            return t
        n_col = t["n"].to_numpy(zero_copy_only=False)
        g_col = t["gram"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((g_col, -n_col))[:k]
        return t.take(pa.array(np.sort(idx)))

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("gram", num_partitions=n_parts)
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(local_topk, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .sort(key=["n", "gram"], descending=[True, False])
        .limit(k)
    )


SQL_TOP_NGRAMS = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT array_to_string(w[i.i : i.i + {TOP_NGRAM_N - 1}], ' ') AS gram
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {TOP_NGRAM_N - 1})) AS i) i
)
SELECT gram, CAST(count(*) AS BIGINT) AS n
FROM grams GROUP BY gram
ORDER BY n DESC, gram LIMIT {TOP_NGRAM_K}
"""


def first_per_hash_group(h: np.ndarray, txt: np.ndarray,
                         *tiebreak: np.ndarray) -> np.ndarray:
    """Indices of the first row of each distinct (hash, text) group, "first"
    by the tiebreak columns (e.g. doc_id, span_idx).

    Sorts by NUMERIC keys only (hash + tiebreaks) — O(n log n) integer
    comparisons — then sub-sorts the rare equal-hash runs by the text column
    so a 64-bit collision can never merge two distinct texts. String
    comparisons are confined to duplicate/collision runs (O(duplicates)),
    never the whole block.
    """
    order = np.lexsort(tuple(reversed(tiebreak)) + (h,))
    if order.size == 0:
        return order
    hs = h[order]
    run_starts = np.nonzero(np.concatenate(
        ([True], hs[1:] != hs[:-1])))[0]
    run_ends = np.concatenate((run_starts[1:], [order.size]))
    for a, b in zip(run_starts, run_ends):
        if b - a > 1:
            sub = order[a:b]
            order[a:b] = sub[np.argsort(txt[sub], kind="stable")]
    ot = txt[order]
    first = np.ones(order.size, dtype=bool)
    first[1:] = (hs[1:] != hs[:-1])
    eq_h = ~first[1:]
    if eq_h.any():  # compare text only at equal-hash adjacencies
        first[1:][eq_h] = ot[1:][eq_h] != ot[:-1][eq_h]
    return order[first]


# ---------------------------------------------------------------------------
# dedup_spans — corpus-wide exact span dedup with document reconstruction
# ---------------------------------------------------------------------------

SPAN_WORDS = 8  # non-overlapping span width, in words


def dedup_spans(sf_dir: str) -> rd.Dataset:
    """(doc_id, clean_text, n_spans_kept): split every document into
    non-overlapping SPAN_WORDS-word spans, keep exactly ONE occurrence of
    each distinct span corpus-wide (the lexicographically first
    (doc_id, span_idx)), and rebuild each document from its surviving spans
    — exact-substring span deduplication in the spirit of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), at span
    rather than suffix-array granularity.

    Two hash exchanges: (1) spans co-located by span hash (span text rides
    as payload; the winner per distinct span is picked inside the block),
    (2) survivors co-located by doc_id and joined back into text with one
    vectorized ``binary_join``. Empty upstream blocks (whitespace-only
    batches) are tolerated by the engine-wide sort=False exchange policy
    (see exchange.per_key_blocks) — no sentinel padding needed here. Span construction itself is 8 masked
    gathers + one null-skipping element-wise join — no per-doc Python loop.
    """
    import pyarrow.compute as pc

    from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    n_parts = auto_partitions(f"{sf_dir}/documents.parquet",
                              bytes_per_partition=16 << 20)


    def explode_spans(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        words = pc.split_pattern(pc.fill_null(text, ""), pattern=" ")
        flat, counts = _split_tokens(words, len(text))
        n_spans = -(-counts // SPAN_WORDS)  # ceil
        offs = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=offs[1:])
        span_ramp = _ramp(n_spans)
        span_start = np.repeat(offs[:-1], n_spans) + span_ramp * SPAN_WORDS
        span_doc = np.repeat(np.arange(len(counts), dtype=np.int64), n_spans)
        span_end = np.minimum(np.repeat(offs[1:], n_spans),
                              span_start + SPAN_WORDS)
        cols = []
        for j in range(SPAN_WORDS):
            idx = span_start + j
            valid = idx < span_end
            took = flat.take(pa.array(np.where(valid, idx, 0)))
            cols.append(pc.if_else(pa.array(valid), took,
                                   pa.scalar(None, pa.string())))
        spans = pc.binary_join_element_wise(
            *cols, " ", null_handling="skip")
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "sh": pa.array(_fnv1a_strings(spans), pa.uint64()),
            "doc_id": pa.array(ids[span_doc], pa.int64()),
            "span_idx": pa.array(span_ramp, pa.int64()),
            "span": spans,
        })

    def keep_first(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("span_idx", pa.int64()),
                              ("span", pa.string())]).empty_table()
        sh = block["sh"].to_numpy(zero_copy_only=False)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        sidx = block["span_idx"].to_numpy(zero_copy_only=False)
        txt = block["span"].to_numpy(zero_copy_only=False)
        keep = first_per_hash_group(sh, txt, ids, sidx)
        return block.take(pa.array(keep)).drop_columns(["sh"])

    def reassemble(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("clean_text", pa.string()),
                              ("n_spans_kept", pa.int64())]).empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        sidx = block["span_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sidx, ids))
        spans = block["span"].combine_chunks() if isinstance(block["span"], pa.ChunkedArray) else block["span"]
        spans = spans.take(pa.array(order))
        ids = ids[order]
        uniq, per_doc = np.unique(ids, return_counts=True)
        loffs = np.zeros(len(uniq) + 1, np.int32)
        np.cumsum(per_doc, out=loffs[1:])
        lst = pa.ListArray.from_arrays(pa.array(loffs, pa.int32()), spans)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "clean_text": pc.binary_join(lst, " "),
            "n_spans_kept": pa.array(per_doc.astype(np.int64), pa.int64()),
        })

    rows = ds.map_batches(explode_spans, batch_format="pyarrow",
                          zero_copy_batch=True)
    kept = per_key_blocks(rows, ["sh"], keep_first, num_partitions=n_parts)
    return per_key_blocks(kept, ["doc_id"], reassemble,
                          num_partitions=n_parts)


SQL_DEDUP_SPANS = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
spans AS (
  SELECT doc_id, i.i AS span_idx,
         array_to_string(w[(i.i) * {SPAN_WORDS} + 1 :
                           (i.i + 1) * {SPAN_WORDS}], ' ') AS span
  FROM words,
       LATERAL (SELECT unnest(generate_series(
           0, CAST(CEIL(len(w) / {SPAN_WORDS}.0) AS BIGINT) - 1)) AS i) i
),
winner_doc AS (
  SELECT span, MIN(doc_id) AS doc_id FROM spans GROUP BY span
),
winner AS (
  SELECT s.span, s.doc_id, MIN(s.span_idx) AS span_idx
  FROM spans s JOIN winner_doc w ON s.span = w.span AND s.doc_id = w.doc_id
  GROUP BY s.span, s.doc_id
)
SELECT s.doc_id,
       string_agg(s.span, ' ' ORDER BY s.span_idx) AS clean_text,
       CAST(count(*) AS BIGINT) AS n_spans_kept
FROM spans s
JOIN winner k ON s.span = k.span AND s.doc_id = k.doc_id
             AND s.span_idx = k.span_idx
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# incremental_dedup — dedup a new shard against an already-committed corpus
# ---------------------------------------------------------------------------

INCR_NEW_MOD = 3  # doc_id % 3 == 0 plays the "new crawl shard"


def incremental_dedup(sf_dir: str) -> rd.Dataset:
    """doc_ids of NEW docs that survive dedup against the EXISTING corpus:
    a new doc is kept iff no existing doc has identical text AND it is the
    min-id among new docs with that text.

    The cross-snapshot shape every rolling 100-TB corpus needs: never
    re-dedup the committed side against itself, just co-locate new and
    existing rows with ONE text-hash exchange and decide per group. The
    group verdict is a single first-row probe — rows are ordered by
    ``v = existing ? -1 : doc_id`` inside each (hash, text) group, so the
    group's first row is an existing doc (drop all) or the min-id new doc
    (the survivor). Collision-safe via first_per_hash_group (string
    comparisons only inside equal-hash runs). Here both sides come from one
    table split deterministically by doc_id; a real pipeline passes two
    paths and tags rows at the read."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        h = _fnv1a_strings(t["text"].combine_chunks()).view(np.int64)
        return pa.table({"doc_id": t["doc_id"], "text": t["text"],
                         "h": pa.array(h, pa.int64())})

    out_schema = pa.schema([("doc_id", pa.int64())])

    def resolve(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        txt = block["text"].to_numpy(zero_copy_only=False)
        h = block["h"].to_numpy(zero_copy_only=False)
        v = np.where(ids % INCR_NEW_MOD == 0, ids, -1)
        first = first_per_hash_group(h, txt, v)
        keep = np.sort(ids[first[v[first] >= 0]])
        return pa.table({"doc_id": pa.array(keep, pa.int64())})

    from ocrautomator_ray.functions.exchange import per_key_blocks

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return per_key_blocks(tagged, ["h"], resolve)


SQL_INCREMENTAL_DEDUP = f"""
SELECT d.doc_id
FROM documents d
WHERE d.doc_id % {INCR_NEW_MOD} = 0
  AND NOT EXISTS (SELECT 1 FROM documents e
                  WHERE e.doc_id % {INCR_NEW_MOD} != 0 AND e.text = d.text)
  AND d.doc_id = (SELECT MIN(n.doc_id) FROM documents n
                  WHERE n.doc_id % {INCR_NEW_MOD} = 0 AND n.text = d.text)
"""


def decontaminated_docs(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars) of TRAIN docs with ZERO eval k-gram overlap — the
    actual deliverable of decontamination (``decontaminate`` reports the
    contaminated side with overlap counts; this is the cleaned corpus).
    large×large ``left_anti`` join against the contaminated id set — no
    driver materialization, so it holds when contamination is widespread."""
    contaminated = decontaminate(sf_dir).map_batches(
        lambda t: t.select(["doc_id"]).rename_columns(["drop_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from ocrautomator_ray.functions.exchange import auto_partitions

    docs = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "n_chars"])

    def train_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % EVAL_MODULUS != 0))

    docs = docs.map_batches(train_only, batch_format="pyarrow",
                            zero_copy_batch=True)
    tune_exchange(docs)
    return docs.join(contaminated, join_type="left_anti",
                     num_partitions=auto_partitions(
                         f"{sf_dir}/documents.parquet"),
                     on=("doc_id",), right_on=("drop_id",))


SQL_DECONTAMINATED_DOCS = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[i.i : i.i + {DECONTAM_K - 1}], ' ') AS g
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {DECONTAM_K - 1})) AS i) i
),
eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MODULUS} = 0
),
contaminated AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % {EVAL_MODULUS} <> 0 AND g IN (SELECT g FROM eval_grams)
)
SELECT doc_id, n_chars
FROM documents
WHERE doc_id % {EVAL_MODULUS} <> 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


# ---------------------------------------------------------------------------
# leakage_safe_split — hash_split keyed on the near-dup cluster representative
# ---------------------------------------------------------------------------

def leakage_safe_split(sf_dir: str) -> rd.Dataset:
    """(doc_id, rep, bucket, split): the train/val/test assignment of
    ``hash_split``, but hashed on the document's verified near-dup CLUSTER
    representative (min doc_id of its MinHash component) instead of the doc
    itself — so two near-duplicate documents can never straddle train and
    test, the contamination leak a per-doc hash split permits (the reason
    production splits key on canonical ids / cluster reps).

    Shape: the cluster table is tiny relative to the corpus (only docs in
    ≥1 verified pair) but NOT driver-bounded, so it attaches via a
    hash-partitioned left-outer ``Dataset.join``, never a broadcast; the
    split itself stays a pure stateless map."""
    import pyarrow.compute as pc

    from ocrautomator_ray.functions.dedup import minhash_dup_clusters
    from ocrautomator_ray.functions.exchange import auto_partitions

    path = f"{sf_dir}/documents.parquet"
    docs = pruned_read(path, ["doc_id"])
    clusters = minhash_dup_clusters(sf_dir).map_batches(
        lambda t: t.rename_columns(["c_doc_id", "cluster_id"]),
        batch_format="pyarrow")
    n_parts = auto_partitions(path)
    tune_exchange(docs, n_parts)
    joined = docs.join(clusters, join_type="left_outer",
                       num_partitions=n_parts,
                       on=("doc_id",), right_on=("c_doc_id",))

    def assign(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(t["cluster_id"], t["doc_id"]).cast(pa.int64())
        b = knuth_bucket(rep.to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "rep": rep,
            "bucket": pa.array(b, pa.int64()),
            "split": pa.array(split_of(b), pa.string()),
        })

    return joined.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)


def _leakage_safe_split_sql() -> str:
    from ocrautomator_ray.functions.dedup import MINHASH_THRESHOLD, _minhash_ctes

    rep = "COALESCE(c.cluster_id, d.doc_id)"
    return f"""
WITH RECURSIVE {_minhash_ctes()},
dup AS MATERIALIZED (
    -- MATERIALIZED: dup hangs off the expensive minhash-verify chain and is
    -- referenced from a recursive closure; without the hint DuckDB re-inlines
    -- (and re-evaluates) the whole chain per reference, which is minutes of
    -- oracle wall at 50k docs for an identical result
    SELECT doc_a, doc_b FROM ver
    WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {MINHASH_THRESHOLD}
),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM dup
    UNION
    SELECT doc_b, doc_a FROM dup
),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u)
SELECT d.doc_id, {rep} AS rep,
       {sql_bucket(rep)} AS bucket,
       {sql_split(rep)} AS split
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


SQL_LEAKAGE_SAFE_SPLIT = _leakage_safe_split_sql()


QUERIES = {
    "decontaminate": decontaminate,
    "contamination_fraction": contamination_fraction,
    "dedup_best_docs": dedup_best_docs,
    "decontaminated_docs": decontaminated_docs,
    "incremental_dedup": incremental_dedup,
    "hash_split": hash_split,
    "split_balance": split_balance,
    "leakage_safe_split": leakage_safe_split,
    "repetition_stats": repetition_stats,
    "stratified_sample": stratified_sample,
    "top_ngrams": top_ngrams,
    "dedup_spans": dedup_spans,
}

SQL = {
    "decontaminate": SQL_DECONTAMINATE,
    "contamination_fraction": SQL_CONTAMINATION_FRACTION,
    "dedup_best_docs": SQL_DEDUP_BEST,
    "decontaminated_docs": SQL_DECONTAMINATED_DOCS,
    "incremental_dedup": SQL_INCREMENTAL_DEDUP,
    "leakage_safe_split": SQL_LEAKAGE_SAFE_SPLIT,
    "hash_split": SQL_HASH_SPLIT,
    "split_balance": SQL_SPLIT_BALANCE,
    "repetition_stats": SQL_REPETITION_STATS,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "top_ngrams": SQL_TOP_NGRAMS,
    "dedup_spans": SQL_DEDUP_SPANS,
}
