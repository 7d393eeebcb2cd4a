"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All stages are ``map_batches`` over Arrow with vectorized kernels
(``pyarrow.compute`` regex counters; numpy rolling hashes). ``token_stats``
and ``quality_score`` carry exact DuckDB SQL oracles (both engines run RE2,
and ratios are single IEEE divisions, so values match bit-for-bit);
``lang_id`` and ``doc_fingerprint`` are heuristic/stateful and get rows-only
driver checks plus their own pytest oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read

TOKEN_RE = r"[A-Za-z0-9_]+"


def token_stats(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64()
                ),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_TOKEN_STATS = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
       length(text) AS n_chars
FROM documents
"""


def quality_score(sf_dir: str) -> rd.Dataset:
    """Shallow quality features: char-class counts + alpha ratio.

    The ratio is one double division of two exact ints — bit-identical in
    numpy and DuckDB — so it is safe under the driver's value-hash compare.
    """
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        alpha = pc.cast(pc.count_substring_regex(t["text"], "[a-z]"), pa.int64())
        digit = pc.cast(pc.count_substring_regex(t["text"], "[0-9]"), pa.int64())
        space = pc.cast(pc.count_substring_regex(t["text"], " "), pa.int64())
        ratio = pc.divide(pc.cast(alpha, pa.float64()), pc.cast(n, pa.float64()))
        return pa.table(
            {"doc_id": t["doc_id"], "n_chars2": n, "alpha_cnt": alpha,
             "digit_cnt": digit, "space_cnt": space, "alpha_ratio": ratio}
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


SQL_QUALITY_SCORE = """
SELECT doc_id,
       length(text) AS n_chars2,
       length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_cnt,
       length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_cnt,
       length(text) - length(replace(text, ' ', '')) AS space_cnt,
       CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE) AS alpha_ratio
FROM documents
"""


# --------------------------------------------------------------------------
# char_diversity — character-level Gini-Simpson collision index, the
# gibberish / keyboard-mash / repeated-char screen: simpson = Σ c_i² / n²
# is the probability two random character draws collide (1/alphabet-size
# for uniform text, →1 for "aaaa…"). Chosen over Shannon entropy because it
# needs NO libm log — all-integer, hash-exact vs SQL (the same trade
# documented on bigram_lm_score / corpus_freq_score). Embarrassingly
# parallel (no exchange); per-batch decode is the chargram trick from
# dedup.py — ONE utf-8 decode + ONE utf-32 encode for the whole batch, a
# (doc, code) lexsort, run lengths via reduceat-style first-in-run masks.
# Exactness bound: n²·1e6 < 2^63 holds to ~3.0e6 chars per document; a
# longer doc would drop the scale to 1e3, same pipeline.
# --------------------------------------------------------------------------

SIMPSON_SCALE = 1_000_000


def char_diversity(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars, distinct_chars, simpson_u): per-doc character
    collision index, integerized at 1e-6 — simpson_u = Σc²·1e6 // n²."""
    import numpy as np

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_chars", pa.int64()),
        ("distinct_chars", pa.int64()), ("simpson_u", pa.int64()),
    ])

    def stats(t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks() \
            if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        texts = pc.fill_null(texts, "")
        n = len(texts)
        if n == 0:
            return out_schema.empty_table()
        off_dt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
        bufs = texts.buffers()
        offs = np.frombuffer(bufs[1], off_dt)[
            texts.offset: texts.offset + n + 1].astype(np.int64)
        raw = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
            else np.empty(0, np.uint8)
        full = raw[offs[0]: offs[-1]].tobytes().decode("utf-8")
        codes = np.frombuffer(full.encode("utf-32-le"), np.uint32)
        lens = pc.utf8_length(texts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # enforce the exactness bound loudly instead of wrapping silently:
        # s2·1e6 ≤ n²·1e6 must stay < 2^63, i.e. n ≤ ~3.0e6 chars/doc —
        # beyond it the engine would diverge from the exact SQL oracle
        if int(lens.max()) > 3_000_000:
            raise ValueError(
                "char_diversity exactness bound exceeded: a document has "
                f"{int(lens.max())} chars > 3,000,000, so simpson_u would "
                "overflow int64; lower SIMPSON_SCALE to 1_000 (engine and "
                "SQL mirror together) for corpora with oversized documents")
        doc = np.repeat(np.arange(n), lens)
        order = np.lexsort((codes, doc))
        d_s, c_s = doc[order], codes[order]
        first = np.zeros(len(order), bool)
        if len(order):
            first[0] = True
            first[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(first)
        run_len = np.diff(np.r_[starts, len(order)])
        # Σc² per doc: run_len ≤ 3e6 → run_len² < 2^53 exact as the float64
        # bincount weights, and the per-doc sum ≤ n² ≤ 9e12 stays exact too
        s2 = np.bincount(d_s[starts], weights=(run_len.astype(np.float64)
                                               ** 2), minlength=n)
        s2 = s2.astype(np.int64)
        distinct = np.bincount(d_s[starts], minlength=n).astype(np.int64)
        keep = lens > 0
        simpson = s2[keep] * SIMPSON_SCALE // (lens[keep] * lens[keep])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_chars": pa.array(lens[keep], pa.int64()),
            "distinct_chars": pa.array(distinct[keep], pa.int64()),
            "simpson_u": pa.array(simpson, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_CHAR_DIVERSITY = f"""
WITH cs AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE length(text) > 0
),
cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM cs GROUP BY doc_id, ch),
agg AS (
  SELECT doc_id, SUM(c * c) AS s2, SUM(c) AS n, COUNT(*) AS d
  FROM cnt GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_chars,
       CAST(d AS BIGINT) AS distinct_chars,
       CAST(s2 * {SIMPSON_SCALE} // (n * n) AS BIGINT) AS simpson_u
FROM agg
"""


# --------------------------------------------------------------------------
# lang_id — stopword-profile n-gram heuristic (stateful actor: profiles
# compiled once per actor). Rows-only driver check; accuracy pinned in pytest
# on hand-written sentences (the driver corpus's lang labels are synthetic).
# --------------------------------------------------------------------------

LANG_PROFILES: dict[str, frozenset[str]] = {
    "de": frozenset("der die das und ist nicht ich ein zu mit für auf sie es von".split()),
    "en": frozenset("the and is not i a to with for on it of in that was".split()),
    "es": frozenset("el la los las y es no un una para con por que de en".split()),
    "fr": frozenset("le la les et est pas je un une pour avec sur que de ne".split()),
    "zh": frozenset("的 是 不 我 一 在 有 人 了 中 大 为 上 个 国".split()),
}


class LangIdActor:
    """Stateful language-ID stage: profiles + tokenizer compiled in
    __init__. Tokenization stays Python ``re`` (the oracle's
    ``[^\\W\\d_]+`` Unicode semantics); SCORING is vectorized — one
    np.isin over the batch's flat token array per language, reduced
    per doc with bincount — no per-row membership loops."""

    def __init__(self) -> None:
        import re

        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.langs = sorted(LANG_PROFILES)  # deterministic tie-break order
        self.profiles = [np.array(sorted(LANG_PROFILES[lang]), dtype=object)
                         for lang in self.langs]
        self.lang_arr = np.array(self.langs + ["und"], dtype=object)

    def _predict(self, texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(pred_lang, stop_hit_ratio) numpy arrays for a batch."""
        low = pc.utf8_lower(pc.fill_null(texts, "")).to_pylist()
        toks = [self.word_re.findall(s) for s in low]
        cnt = np.array([len(w) for w in toks], np.int64)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        doc = np.repeat(np.arange(len(toks), dtype=np.int64), cnt)
        hits = np.zeros((len(self.langs), len(toks)), np.int64)
        for i, prof in enumerate(self.profiles):
            if len(flat):
                hits[i] = np.bincount(doc, weights=np.isin(flat, prof),
                                      minlength=len(toks)).astype(np.int64)
        best = np.argmax(hits, axis=0)          # first max wins
        top = hits[best, np.arange(len(toks))]
        pred = self.lang_arr[np.where(top > 0, best, len(self.langs))]
        return pred, top / np.maximum(1, cnt)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        pred, ratio = self._predict(texts)
        return pa.table({
            "doc_id": t["doc_id"],
            "pred_lang": pa.array(pred, pa.string()),
            "stop_hit_ratio": pa.array(ratio, pa.float64()),
        })


def lang_id(sf_dir: str) -> rd.Dataset:
    import ray

    # size the warm-profile actor pool to the cluster (was a fixed 2, which
    # capped this CPU-bound stage at 2 cores regardless of machine size)
    pool = max(2, (int(ray.cluster_resources().get("CPU", 4))
                   if ray.is_initialized() else 4) // 2)
    return pruned_read(f"{sf_dir}/documents.parquet",
                       ["doc_id", "text"]).map_batches(
        LangIdActor, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(2, pool))


# --------------------------------------------------------------------------
# doc_fingerprint — winnowing fingerprints (Schleimer/Wilkerson/Aiken,
# SIGMOD 2003): k-gram rolling hashes, per-window minima, dedup. Aggregates
# (count + xor) are order-independent so results are deterministic under any
# distribution. Rows-only driver check + pytest oracle.
# --------------------------------------------------------------------------

FP_K = 8     # k-gram length (chars)
FP_W = 4     # winnowing window


def _winnow_one(data: bytes) -> np.ndarray:
    if len(data) < FP_K:
        return np.empty(0, dtype=np.uint64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - FP_K + 1
    # polynomial rolling hash over k-gram windows, fully vectorized
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(1099511628211)
    for j in range(FP_K):
        h = h * base + arr[j : j + n]
    if n < FP_W:
        mins = np.array([h.min()], dtype=np.uint64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(h, FP_W)
        mins = win.min(axis=1)
    return np.unique(mins)


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_fp = np.empty(len(texts), dtype=np.int64)
        fp_xor = np.empty(len(texts), dtype=np.uint64)
        for i, s in enumerate(texts):
            fps = _winnow_one((s or "").encode())
            n_fp[i] = len(fps)
            fp_xor[i] = np.bitwise_xor.reduce(fps) if len(fps) else np.uint64(0)
        return pa.table(
            {"doc_id": t["doc_id"], "n_fingerprints": pa.array(n_fp),
             "fp_xor": pa.array(fp_xor.view(np.int64))}
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(sf_dir: str) -> rd.Dataset:
    """(doc_id, norm_text, n_chars): lowercase, collapse all whitespace runs
    to single spaces, strip the ends — the canonicalization pass upstream of
    exact dedup / fingerprinting (T5 normalization as a standalone operator).
    Pure RE2 kernels per batch; n_chars counts unicode codepoints."""
    import pyarrow.compute as pc

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")),
            pattern=r"\s+", replacement=" ")
        s = pc.replace_substring_regex(s, pattern=r"^ | $", replacement="")
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": s,
            "n_chars": pc.cast(pc.utf8_length(s), pa.int64()),
        })

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


SQL_NORMALIZE_TEXT = """
SELECT doc_id,
       regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                      '^ | $', '', 'g') AS norm_text,
       CAST(len(regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                               '^ | $', '', 'g')) AS BIGINT) AS n_chars
FROM documents
"""


# doc_fingerprint SQL oracle — the winnowing pipeline is pure modular
# integer arithmetic, so DuckDB can mirror it exactly: the k-gram polynomial
# hash is Σ byte_j · BASE^(K-1-j) (mod 2^64), evaluated with HUGEINT
# products and inlined power constants; window minima via a ROWS frame;
# distinct minima aggregated with COUNT + bit_xor (the HUGEINT value is
# re-twos-complemented to BIGINT to match numpy's uint64→int64 view).
def _fp_sql() -> str:
    base, m = 1099511628211, 1 << 64
    powers = [pow(base, FP_K - 1 - j, m) for j in range(FP_K)]
    poly = " + ".join(
        f"CAST(ascii(substr(text, i+{j}, 1)) AS HUGEINT) * {p}"
        for j, p in enumerate(powers)
    )
    half, full = 1 << 63, 1 << 64
    return f"""
WITH pos AS (
    SELECT doc_id, text,
           unnest(range(1, len(text) - {FP_K} + 2)) AS i
    FROM documents WHERE len(text) >= {FP_K}
),
g AS (
    SELECT doc_id, i, ({poly}) % {m} AS h FROM pos
),
m AS (
    SELECT doc_id, i AS w,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW
                        AND {FP_W - 1} FOLLOWING) AS hmin,
           COUNT(*) OVER (PARTITION BY doc_id) AS n
    FROM g
),
u AS (
    SELECT DISTINCT doc_id, hmin FROM m WHERE w + {FP_W - 1} <= n
    UNION ALL
    SELECT doc_id, MIN(h) AS hmin FROM g GROUP BY doc_id
    HAVING COUNT(*) < {FP_W}
),
f AS (
    SELECT doc_id, COUNT(*) AS n_fingerprints,
           bit_xor(CAST(CASE WHEN hmin >= {half} THEN hmin - {full}
                             ELSE hmin END AS BIGINT)) AS fp_xor
    FROM u GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_fingerprints, 0) AS n_fingerprints,
       COALESCE(fp_xor, 0) AS fp_xor
FROM documents d LEFT JOIN f USING (doc_id)
"""


SQL_DOC_FINGERPRINT = _fp_sql()


# lang_id SQL oracle — exact on THIS corpus: the driver's documents table is
# pure [a-z ] (probed), where RE2's ASCII `[^\W\d_]+` and Python's Unicode
# variant tokenize identically; hit counts are list_filter IN-counts, the
# argmax tie-break mirrors np.argmax over the sorted language order, and the
# ratio is one IEEE division of two exact ints. On non-ASCII corpora the
# heuristic itself still works but the oracle would need RE2/Unicode parity.
def _lang_id_sql() -> str:
    langs = sorted(LANG_PROFILES)
    hit_cols = ",\n           ".join(
        "len(list_filter(toks, t -> t IN ({}))) AS h_{}".format(
            ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[lang])), lang
        )
        for lang in langs
    )
    best = "greatest({})".format(", ".join(f"h_{lang}" for lang in langs))
    first_max = "\n            ".join(
        f"WHEN h_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    return f"""
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[^\\W\\d_]+') AS toks
    FROM documents
),
h AS (
    SELECT doc_id, toks,
           {hit_cols}
    FROM t
)
SELECT doc_id,
       CASE WHEN {best} = 0 THEN 'und'
            {first_max}
       END AS pred_lang,
       CAST({best} AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE)
           AS stop_hit_ratio
FROM h
"""


SQL_LANG_ID = _lang_id_sql()


def lang_confusion(sf_dir: str) -> rd.Dataset:
    """(lang, pred_lang, n_docs): the labeled-vs-predicted language
    confusion matrix — the model-evaluation table behind every classifier
    screen (which languages bleed into which, how much lands in 'und').
    The warm-profile actor pool predicts per batch with the LABEL carried
    through, per-batch (lang, pred) partial counts reduce in a
    langs²-bounded groupby — text never reaches the shuffle."""
    import ray
    from ray.data.aggregate import Sum

    pool = max(2, (int(ray.cluster_resources().get("CPU", 4))
                   if ray.is_initialized() else 4) // 2)

    class _ConfusionActor(LangIdActor):
        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t["text"]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            pred, _ = self._predict(texts)
            lang = t["lang"].to_numpy(zero_copy_only=False)
            pairs, counts = np.unique(
                np.char.add(np.char.add(lang.astype(str), "\x1f"),
                            pred.astype(str)), return_counts=True)
            split = np.char.partition(pairs, "\x1f")
            return pa.table({
                "lang": pa.array(split[:, 0], pa.string()),
                "pred_lang": pa.array(split[:, 2], pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            })

    preds = pruned_read(f"{sf_dir}/documents.parquet",
                        ["doc_id", "text", "lang"]).map_batches(
        _ConfusionActor, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(2, pool))
    return preds.groupby(["lang", "pred_lang"], num_partitions=2).aggregate(
        Sum("n", alias_name="n_docs"))


SQL_LANG_CONFUSION = f"""
SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ({SQL_LANG_ID}) p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY d.lang, p.pred_lang
"""


# --------------------------------------------------------------------------
# fingerprint_dups — MOSS-style overlap detection: doc pairs sharing
# winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 §5: drop
# overly-common fingerprints before pairing — they are the k-gram stopwords)
# --------------------------------------------------------------------------

FP_PAIR_CAP = 16     # ignore fingerprints present in more docs than this
FP_MIN_SHARED = 2    # report pairs sharing at least this many fingerprints


def fingerprint_dups(sf_dir: str) -> rd.Dataset:
    """(doc_a, doc_b, shared_fps): document pairs sharing ≥ FP_MIN_SHARED
    distinct winnowing fingerprints, fingerprints in > FP_PAIR_CAP docs
    excluded (boilerplate guard — also the skew guard: a group's pair count
    is capped at C(FP_PAIR_CAP, 2), so one hot fingerprint can't pin a
    worker). One fingerprint-keyed exchange emits pairs per group; a pair
    groupby counts the shared fingerprints."""
    from ray.data.aggregate import Count

    from ocrautomator_ray.functions.exchange import (
        auto_partitions,
        per_key_blocks,
    )

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def fp_rows(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_fp, out_id = [], []
        for i, s in enumerate(texts):
            fps = _winnow_one((s or "").encode())
            out_fp.append(fps.view(np.int64))
            out_id.append(np.full(len(fps), ids[i], np.int64))
        return pa.table({
            "fp": pa.array(np.concatenate(out_fp) if out_fp else
                           np.empty(0, np.int64), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_id) if out_id else
                               np.empty(0, np.int64), pa.int64()),
        })

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def pairs_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pair_schema.empty_table()
        fp = block["fp"].to_numpy(zero_copy_only=False)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        starts = np.nonzero(np.r_[True, fp[1:] != fp[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(fp)])
        # vectorize by run size: most runs are singletons (unique
        # fingerprints) — a Python loop over all runs dominates; instead
        # stack the eligible runs of each size into one triu gather
        out_a, out_b = [], []
        for ln in range(2, FP_PAIR_CAP + 1):
            sel = starts[run_len == ln]
            if sel.size == 0:
                continue
            g = ids[sel[:, None] + np.arange(ln)[None, :]]  # (runs, ln)
            ia, ib = np.triu_indices(ln, k=1)
            out_a.append(g[:, ia].ravel())
            out_b.append(g[:, ib].ravel())
        if not out_a:
            return pair_schema.empty_table()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table({"doc_a": pa.array(np.minimum(a, b), pa.int64()),
                         "doc_b": pa.array(np.maximum(a, b), pa.int64())})

    n_parts = auto_partitions(f"{sf_dir}/documents.parquet",
                              bytes_per_partition=8 << 20)
    rows = ds.map_batches(fp_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    pairs = per_key_blocks(rows, ["fp"], pairs_block,
                           num_partitions=n_parts)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.greater_equal(t["count()"], FP_MIN_SHARED)
        t = t.filter(m)
        return pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                         "shared_fps": t["count()"].cast(pa.int64())})

    return (
        pairs.groupby(["doc_a", "doc_b"], num_partitions=8).count()
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    )


def _fp_dups_sql() -> str:
    # reuse the doc_fingerprint CTE chain up to the distinct (doc, hmin) set
    base = _fp_sql()
    prefix = base[: base.index("f AS (")]
    return f"""{prefix}fps AS (
    SELECT DISTINCT doc_id, hmin FROM u
),
ok AS (
    SELECT hmin FROM fps GROUP BY hmin
    HAVING COUNT(*) BETWEEN 2 AND {FP_PAIR_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM fps a
JOIN fps b ON a.hmin = b.hmin AND a.doc_id < b.doc_id
WHERE a.hmin IN (SELECT hmin FROM ok)
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {FP_MIN_SHARED}
"""


SQL_FINGERPRINT_DUPS = _fp_dups_sql()


# --------------------------------------------------------------------------
# source_report — the per-source corpus report card (the audit table a mix
# decision is made from: volume, token mass, character quality, language
# spread per source).  Classic partial+final: each batch pre-aggregates to
# (source, lang) partials — S×L rows, tiny — so the ONE source-keyed
# exchange moves partials, never text; all-integer output, hash-exact.
# --------------------------------------------------------------------------

_REPORT_PART_SCHEMA = pa.schema([
    ("source", pa.string()), ("lang", pa.string()),
    ("n_docs", pa.int64()), ("n_tokens", pa.int64()),
    ("n_chars", pa.int64()), ("alpha_cnt", pa.int64()),
])
_REPORT_SCHEMA = pa.schema([
    ("source", pa.string()), ("n_docs", pa.int64()),
    ("n_tokens", pa.int64()), ("n_chars", pa.int64()),
    ("alpha_cnt", pa.int64()), ("n_langs", pa.int64()),
    ("n_en_docs", pa.int64()),
])


def source_report(sf_dir: str) -> rd.Dataset:
    """(source, n_docs, n_tokens, n_chars, alpha_cnt, n_langs, n_en_docs):
    one row per source — corpus volume, token mass, alpha-character count
    (the quality_score numerator summed), distinct languages, and English
    share — everything the temperature_mix / token_budget_mix budget
    decisions read, in one exchange."""
    from ocrautomator_ray.functions.dedup import _tokenize_re2
    from ocrautomator_ray.functions.exchange import per_key_blocks

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _REPORT_PART_SCHEMA.empty_table()
        _, cnt = _tokenize_re2(t["text"])
        g = pa.TableGroupBy(pa.table({
            "source": t["source"], "lang": t["lang"],
            "n_tok": pa.array(cnt.astype(np.int64), pa.int64()),
            "n_ch": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "alpha": pc.cast(pc.count_substring_regex(t["text"], "[a-z]"),
                             pa.int64()),
        }), ["source", "lang"]).aggregate([
            ([], "count_all"), ("n_tok", "sum"), ("n_ch", "sum"),
            ("alpha", "sum")])
        return pa.table({
            "source": g["source"], "lang": g["lang"],
            "n_docs": g["count_all"].cast(pa.int64()),
            "n_tokens": g["n_tok_sum"].cast(pa.int64()),
            "n_chars": g["n_ch_sum"].cast(pa.int64()),
            "alpha_cnt": g["alpha_sum"].cast(pa.int64()),
        })

    def final_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _REPORT_SCHEMA.empty_table()
        src = block["source"].to_numpy(zero_copy_only=False)
        lang = block["lang"].to_numpy(zero_copy_only=False)
        nd = block["n_docs"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lang, src))
        src, lang, nd = src[order], lang[order], nd[order]
        cols = {c: block[c].to_numpy(zero_copy_only=False)[order]
                for c in ("n_tokens", "n_chars", "alpha_cnt")}
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        new_lang = np.r_[True, (src[1:] != src[:-1]) | (lang[1:] != lang[:-1])]
        out = {"source": pa.array(src[starts], pa.string()),
               "n_docs": pa.array(np.add.reduceat(nd, starts), pa.int64())}
        for c in ("n_tokens", "n_chars", "alpha_cnt"):
            out[c] = pa.array(np.add.reduceat(cols[c], starts), pa.int64())
        out["n_langs"] = pa.array(
            np.add.reduceat(new_lang.astype(np.int64), starts), pa.int64())
        out["n_en_docs"] = pa.array(
            np.add.reduceat(np.where(lang == "en", nd, 0), starts), pa.int64())
        return pa.table(out)

    rows = pruned_read(f"{sf_dir}/documents.parquet",
                       ["source", "lang", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return per_key_blocks(rows, ["source"], final_block, num_partitions=4)


SQL_SOURCE_REPORT = r"""
WITH per AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         SUM(len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> ''))) AS n_tokens,
         SUM(length(text)) AS n_chars,
         SUM(length(regexp_replace(text, '[^a-z]', '', 'g'))) AS alpha_cnt
  FROM documents GROUP BY source, lang
)
SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(alpha_cnt) AS BIGINT) AS alpha_cnt,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(CASE WHEN lang = 'en' THEN n_docs ELSE 0 END) AS BIGINT)
           AS n_en_docs
FROM per GROUP BY source
"""


# --------------------------------------------------------------------------
# length_histogram — per-source doc-length distribution in power-of-two
# buckets (the length-mix audit behind chunk-size / packing decisions).
# Bucket = bit_length(n_chars), computed EXACTLY on both engines: numpy via
# frexp's exponent (exact for ints < 2^53), DuckDB via length(bin(n)) — no
# float log2 whose last-ulp rounding could misbucket a boundary value.
# Per-batch (source, bucket) bincount partials, one tiny exchange.
# --------------------------------------------------------------------------

def length_histogram(sf_dir: str) -> rd.Dataset:
    """(source, bucket, n_docs): docs per power-of-two length bucket per
    source; bucket b holds lengths in [2^(b-1), 2^b)."""
    from ray.data.aggregate import Sum

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["source", "n_chars"])
    part_schema = pa.schema([("source", pa.string()), ("bucket", pa.int64()),
                             ("n_docs", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        n = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.frexp(np.maximum(n, 1).astype(np.float64))[1]
        src = t["source"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(src, sort=True)
        width = int(bucket.max()) + 1
        counts = np.bincount(codes * width + bucket,
                             minlength=len(uniq) * width)
        nz = np.flatnonzero(counts)
        return pa.table({
            "source": pa.array(uniq[nz // width], pa.string()),
            "bucket": pa.array((nz % width).astype(np.int64), pa.int64()),
            "n_docs": pa.array(counts[nz], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["source", "bucket"], num_partitions=4)
              .aggregate(Sum("n_docs", alias_name="n_docs")))


SQL_LENGTH_HISTOGRAM = """
SELECT source,
       CAST(length(bin(GREATEST(n_chars, 1))) AS BIGINT) AS bucket,
       COUNT(*) AS n_docs
FROM documents GROUP BY source, bucket
"""


QUERIES = {
    "token_stats": token_stats,
    "length_histogram": length_histogram,
    "fingerprint_dups": fingerprint_dups,
    "quality_score": quality_score,
    "char_diversity": char_diversity,
    "lang_id": lang_id,
    "lang_confusion": lang_confusion,
    "doc_fingerprint": doc_fingerprint,
    "normalize_text": normalize_text,
    "source_report": source_report,
}

SQL = {
    "token_stats": SQL_TOKEN_STATS,
    "length_histogram": SQL_LENGTH_HISTOGRAM,
    "fingerprint_dups": SQL_FINGERPRINT_DUPS,
    "quality_score": SQL_QUALITY_SCORE,
    "char_diversity": SQL_CHAR_DIVERSITY,
    "lang_id": SQL_LANG_ID,
    "lang_confusion": SQL_LANG_CONFUSION,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "source_report": SQL_SOURCE_REPORT,
}
