"""Corpus quality filters for training-data curation, all SQL-oracled:

- ``stopword_filter``: Gopher-style stopword screen (Rae et al. 2021 keep a
  doc only if it contains ≥2 of a small stopword list) — documents whose text
  shows function-word structure. Defined BY a single RE2 alternation with
  ``\\b`` token boundaries so the engine (pyarrow ``count_substring_regex``)
  and the DuckDB oracle (``regexp_extract_all``) run the identical automaton.
- ``type_token_ratio``: lexical-diversity signal (distinct words / words),
  the repetition screen complementary to functions/curate.py's
  ``repetition_stats`` — a low TTR flags machine-generated or looping text.
- ``percentile_filter_docs``: filter against a CORPUS-relative threshold
  (n_chars ≥ discrete p90). Two stages: an exact distributed quantile via
  value-counting (the shuffle moves (value, count) partials, never rows —
  same design as ``quantiles_qty_by_flag``), then a predicate-pushdown read
  with the resolved threshold. The driver-side step touches only the
  aggregated (distinct-value, count) table — bounded by the value domain,
  not the row count.
- ``pii_scrub``: email/phone redaction with RE2 patterns (count + replace per
  batch). The synthetic corpus contains no PII, so the driver query checks
  zero-hit pass-through parity; actual redaction behavior is pinned in
  tests/test_filters.py on crafted strings against the same DuckDB oracle
  expressions.

All ratios are one double division of two exact int64s — bit-identical in
numpy and DuckDB — and every count is int64, so the driver's value-hash
compare is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read, stripped_read
from ray.data.aggregate import Sum

WORD_RE = r"\S+"

# Longest-first so the RE2 alternation's match choice is unambiguous on both
# engines (both are RE2, so any order agrees — this is belt and braces).
STOPWORDS = sorted(
    ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for",
     "on", "with", "as"],
    key=len, reverse=True,
)
STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
MIN_STOP_HITS = 2


def stopword_filter(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def screen(t: pa.Table) -> pa.Table:
        n_words = pc.cast(pc.count_substring_regex(t["text"], WORD_RE),
                          pa.int64())
        hits = pc.cast(pc.count_substring_regex(t["text"], STOP_RE),
                       pa.int64())
        out = pa.table({
            "doc_id": t["doc_id"], "n_words": n_words, "stop_hits": hits,
            "stop_ratio": pc.divide(pc.cast(hits, pa.float64()),
                                    pc.cast(n_words, pa.float64())),
        })
        return out.filter(pc.greater_equal(out["stop_hits"], MIN_STOP_HITS))

    return ds.map_batches(screen, batch_format="pyarrow", zero_copy_batch=True)


SQL_STOPWORD_FILTER = f"""
SELECT doc_id, n_words, stop_hits,
       CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio
FROM (
    SELECT doc_id,
           len(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
           len(regexp_extract_all(text, '{STOP_RE}')) AS stop_hits
    FROM documents
)
WHERE stop_hits >= {MIN_STOP_HITS}
"""


def type_token_ratio(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    ttr_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_words", pa.int64()),
        ("n_distinct", pa.int64()), ("ttr", pa.float64()),
    ])

    def ttr(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return ttr_schema.empty_table()
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        # split on \s+ and drop the empty boundary pieces ≡ findall(\S+)
        parts = pc.split_pattern_regex(texts, pattern=r"\s+")
        flat = pc.list_flatten(parts)
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        lens = np.bincount(idx[nonempty],
                           minlength=len(texts)).astype(np.int64)
        # distinct words/doc: distinct (doc, word) pairs, then rows per doc
        pairs = pa.TableGroupBy(pa.table({
            "i": pa.array(idx[nonempty], pa.int64()),
            "w": flat.filter(pa.array(nonempty)),
        }), ["i", "w"]).aggregate([([], "count_all")])
        per_doc = pa.TableGroupBy(pairs.select(["i"]), "i").aggregate(
            [([], "count_all")])
        nd = np.zeros(len(texts), np.int64)
        nd[per_doc["i"].to_numpy(zero_copy_only=False)] = \
            per_doc["count_all"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = nd.astype(np.float64) / lens.astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(lens, pa.int64()),
            "n_distinct": pa.array(nd, pa.int64()),
            "ttr": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(ttr, batch_format="pyarrow", zero_copy_batch=True)


SQL_TYPE_TOKEN_RATIO = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
       len(list_distinct(regexp_extract_all(text, '{WORD_RE}'))) AS n_distinct,
       CAST(len(list_distinct(regexp_extract_all(text, '{WORD_RE}'))) AS DOUBLE)
           / CAST(len(regexp_extract_all(text, '{WORD_RE}')) AS DOUBLE) AS ttr
FROM documents
"""


# --------------------------------------------------------------------------
# percentile_filter_docs — corpus-relative threshold filter.
# Discrete-quantile rule pinned to DuckDB quantile_disc (the value at 1-based
# rank ceil(n*q), integer math) — the same rule quantiles_qty_by_flag pins.
# --------------------------------------------------------------------------

PCTL_NUM, PCTL_DEN = 9, 10  # p90


def _disc_threshold(vals: np.ndarray, counts: np.ndarray,
                    num: int, den: int) -> int:
    """quantile_disc over a (values, counts) domain — the selection rule
    grouped_disc_quantiles' exact path applies, pinned vs DuckDB in
    tests/test_filters.py."""
    from ocrautomator_ray.functions.relational2 import disc_quantile

    order = np.argsort(vals)
    vals, counts = vals[order], counts[order]
    return int(disc_quantile(vals, np.cumsum(counts), num, den))


# --------------------------------------------------------------------------
# grouped_disc_quantiles — the shared selection-exact / histogram-sketch
# quantile engine behind percentile_filter_docs, winsorize_values and
# value_mad_by_type (VERDICT r4 #7). Exact path: one (group, value) count
# exchange, per-group disc_quantile selection — hash-identical to DuckDB's
# quantile_disc, but the value DOMAIN must fit a block (grouped) or the
# driver (global). When the domain's distinct count exceeds the cap (a
# continuous double column at corpus scale), the same count exchange
# instead feeds approx_quantiles_value's mergeable-histogram shape: one
# (group, bin) exchange bounded at groups × nbins rows, each estimate a bin
# lower edge within (hi − lo)/nbins of the exact answer, and no node ever
# materializes the value domain.
# --------------------------------------------------------------------------

QUANTILE_DOMAIN_CAP = 2_000_000
QUANTILE_SKETCH_NBINS = 8192


def grouped_disc_quantiles(base: rd.Dataset, group_col: str | None,
                           value_col: str, qs: list[tuple[int, int]],
                           domain_cap: int | None = None,
                           nbins: int = QUANTILE_SKETCH_NBINS,
                           ) -> tuple[pd.DataFrame, str]:
    """((group?, n, q0..q{len(qs)-1}) DataFrame, path): per-group discrete
    quantiles of ``value_col`` for each (num, den) in ``qs``; ``path`` is
    "exact" or "sketch". Global quantiles: pass ``group_col=None`` (one
    output row)."""
    import os

    from ocrautomator_ray.functions.exchange import per_key_blocks
    from ocrautomator_ray.functions.relational2 import disc_quantile

    cap = domain_cap if domain_cap is not None else int(os.environ.get(
        "OCRA_QUANTILE_DOMAIN_CAP", str(QUANTILE_DOMAIN_CAP)))
    gcols = [group_col] if group_col else []
    key_cols = gcols + [value_col]

    vc_fields = ([(group_col, pa.string())] if group_col else []) \
        + [(value_col, pa.float64()), ("n", pa.int64())]
    vc_schema = pa.schema(vc_fields)

    def vcount(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return vc_schema.empty_table()
        g = pa.TableGroupBy(t.select(key_cols), key_cols).aggregate(
            [([], "count_all")])
        cols = {c: g[c] for c in gcols}
        cols[value_col] = g[value_col].cast(pa.float64())
        cols["n"] = g["count_all"].cast(pa.int64())
        return pa.table(cols)

    counts = (base.map_batches(vcount, batch_format="pyarrow",
                               zero_copy_batch=True)
              .groupby(key_cols, num_partitions=4)
              .aggregate(Sum("n", alias_name="n")))
    counts = counts.materialize()
    qnames = [f"q{i}" for i in range(len(qs))]

    if counts.count() <= cap:
        # ---- exact selection path (discrete/bounded domains) ----
        def solve(et, v, n):
            order = np.lexsort((v, et)) if len(gcols) else np.argsort(v)
            v, n = v[order], n[order]
            if len(gcols):
                et = et[order]
                starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
            else:
                starts = np.array([0]) if len(v) else np.empty(0, np.int64)
            ends = np.r_[starts[1:], len(v)]
            rows: dict[str, list] = {c: [] for c in gcols}
            rows["n"] = []
            for qn in qnames:
                rows[qn] = []
            for s, e in zip(starts, ends):
                cum = np.cumsum(n[s:e])
                if gcols:
                    rows[group_col].append(et[s])
                rows["n"].append(int(cum[-1]))
                for qn, (num, den) in zip(qnames, qs):
                    rows[qn].append(float(disc_quantile(v[s:e], cum,
                                                        num, den)))
            return pd.DataFrame(rows)

        if gcols:
            out_schema = pa.schema(
                [(group_col, pa.string()), ("n", pa.int64())]
                + [(qn, pa.float64()) for qn in qnames])

            def block_fn(block: pa.Table) -> pa.Table:
                if block.num_rows == 0:
                    return out_schema.empty_table()
                g = pa.TableGroupBy(block, key_cols).aggregate([("n", "sum")])
                df = solve(
                    g[group_col].to_numpy(zero_copy_only=False),
                    g[value_col].to_numpy(zero_copy_only=False),
                    g["n_sum"].to_numpy(zero_copy_only=False))
                return pa.Table.from_pandas(df, schema=out_schema,
                                            preserve_index=False)

            df = per_key_blocks(counts, gcols, block_fn,
                                num_partitions=4).to_pandas()
        else:
            rows = counts.take_all()   # ≤ cap rows by the guard above
            df = solve(None,
                       np.array([r[value_col] for r in rows], np.float64),
                       np.array([r["n"] for r in rows], np.int64))
        return df, "exact"

    # ---- histogram-sketch path (continuous/unbounded domains) ----
    from ray.data.aggregate import Max, Min

    if gcols:
        stats = (counts.groupby(group_col)
                 .aggregate(Min(value_col, alias_name="lo"),
                            Max(value_col, alias_name="hi"),
                            Sum("n", alias_name="n"))
                 .to_pandas())                  # O(groups)
    else:
        agg = counts.aggregate(Min(value_col, alias_name="lo"),
                               Max(value_col, alias_name="hi"),
                               Sum("n", alias_name="n"))
        stats = pd.DataFrame([agg])
    if gcols:
        g_sorted = np.sort(stats[group_col].to_numpy())
        g_order = np.argsort(stats[group_col].to_numpy())
        lo_v = stats["lo"].to_numpy()[g_order]
        hi_v = stats["hi"].to_numpy()[g_order]
    else:
        lo_v = stats["lo"].to_numpy()
        hi_v = stats["hi"].to_numpy()

    bin_fields = ([(group_col, pa.string())] if group_col else []) \
        + [("bin", pa.int64()), ("n", pa.int64())]
    bin_schema = pa.schema(bin_fields)

    def to_bins(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return bin_schema.empty_table()
        v = t[value_col].to_numpy(zero_copy_only=False)
        if gcols:
            i = np.searchsorted(g_sorted, t[group_col].to_numpy(
                zero_copy_only=False))
            lo, hi = lo_v[i], hi_v[i]
        else:
            lo, hi = lo_v[0], hi_v[0]
        width = np.maximum(hi - lo, np.finfo(np.float64).tiny)
        b = np.minimum((np.maximum(v - lo, 0.0) / width
                        * nbins).astype(np.int64), nbins - 1)
        cols = {c: t[c] for c in gcols}
        cols["bin"] = pa.array(b, pa.int64())
        cols["n"] = t["n"]
        return pa.table(cols)

    hist = (counts.map_batches(to_bins, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(gcols + ["bin"], num_partitions=4)
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())                       # ≤ groups × nbins rows
    rows: dict[str, list] = {c: [] for c in gcols}
    rows["n"] = []
    for qn in qnames:
        rows[qn] = []
    if gcols:
        hist = hist.sort_values([group_col, "bin"])
        groups = [(k, g) for k, g in hist.groupby(group_col, sort=True)]
    else:
        groups = [(None, hist.sort_values("bin"))]
    for k, g in groups:
        bins = g["bin"].to_numpy()
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        if gcols:
            j = int(np.searchsorted(g_sorted, k))
            lo, hi = lo_v[j], hi_v[j]
            rows[group_col].append(k)
        else:
            lo, hi = lo_v[0], hi_v[0]
        rows["n"].append(n)
        for qn, (num, den) in zip(qnames, qs):
            rank = max(-(-(n * num) // den), 1)
            b = int(bins[np.searchsorted(cum, rank)])
            rows[qn].append(lo + b * (hi - lo) / nbins)
    return pd.DataFrame(rows), "sketch"


def percentile_filter_docs(sf_dir: str) -> rd.Dataset:
    path = f"{sf_dir}/documents.parquet"
    ds = pruned_read(path, ["n_chars"])
    # exact selection for this discrete int domain; a continuous
    # high-cardinality column would flip grouped_disc_quantiles to its
    # histogram-sketch path instead of take_all-ing the value domain
    df, _ = grouped_disc_quantiles(ds, None, "n_chars",
                                   [(PCTL_NUM, PCTL_DEN)])
    thr = df["q0"].iloc[0]
    return stripped_read(
        path, columns=["doc_id", "n_chars"],
        filter=pc.field("n_chars") >= thr,  # predicate pushdown at the read
    )


SQL_PERCENTILE_FILTER = f"""
SELECT doc_id, n_chars
FROM documents
WHERE n_chars >= (SELECT quantile_disc(n_chars, {PCTL_NUM / PCTL_DEN})
                  FROM documents)
"""


# --------------------------------------------------------------------------
# pii_scrub — RE2 redaction: count then replace, emails first so a phone-like
# digit run inside an address can't double-fire.
# --------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\-() ]{7,}\d"


def pii_scrub(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    return ds.map_batches(scrub_block, batch_format="pyarrow",
                          zero_copy_batch=True)


def scrub_block(t: pa.Table) -> pa.Table:
    """Redaction kernel, shared by the query and the pytest oracle."""
    n_emails = pc.cast(pc.count_substring_regex(t["text"], EMAIL_RE),
                       pa.int64())
    t1 = pc.replace_substring_regex(t["text"], pattern=EMAIL_RE,
                                    replacement="<EMAIL>")
    n_phones = pc.cast(pc.count_substring_regex(t1, PHONE_RE), pa.int64())
    clean = pc.replace_substring_regex(t1, pattern=PHONE_RE,
                                       replacement="<PHONE>")
    return pa.table({
        "doc_id": t["doc_id"], "clean_text": clean,
        "n_emails": n_emails, "n_phones": n_phones,
    })


SQL_PII_SCRUB = f"""
SELECT doc_id,
       regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       n_emails,
       len(regexp_extract_all(t1, '{PHONE_RE}')) AS n_phones
FROM (
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
    FROM documents
)
"""


# ---------------------------------------------------------------------------
# gopher_rules — the Gopher quality-rule ensemble (Rae et al. 2021, App. A)
# as ONE vectorized screen: every rule is exact-integer arithmetic (ratio
# thresholds become cross-multiplications), every text statistic is a single
# RE2 count shared verbatim with the DuckDB oracle, so the per-doc flags and
# the composite verdict hash-compare exactly. One map_batches, no exchange:
# the screen is embarrassingly parallel and CPU-bound on the regex scans.
# ---------------------------------------------------------------------------

WS_RE = r"\s"
HASHSYM_RE = r"#"
ELLIPSIS_RE = r"\.\.\."
BULLET_LINE_RE = r"(?m)^[-•*]"
ELLIPSIS_END_RE = r"(?m)\.\.\.$"
ALPHA_WORD_RE = r"[^\s]*[A-Za-z][^\s]*"

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3          # mean word length bounds (chars)
GOPHER_MAX_MWL = 10
# ratio thresholds as (numerator multiplier, denominator multiplier):
#   symbols/words < 0.1        → 10*symbols < words
#   bullet lines/lines < 0.9   → 10*bullets < 9*lines
#   ellipsis-end lines < 0.3   → 10*ell_end < 3*lines
#   alpha words/words ≥ 0.8    → 10*alpha ≥ 8*words


def gopher_rules(sf_dir: str) -> rd.Dataset:
    """Per-doc Gopher rule counts, per-rule 0/1 flags, and the composite
    ``pass_gopher`` verdict. Emits EVERY doc (screening = filter on the
    flag downstream) so the table doubles as a rule-tuning audit."""
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def screen(t: pa.Table) -> pa.Table:
        txt = t["text"]

        def rx(pattern: str) -> np.ndarray:
            return pc.cast(pc.count_substring_regex(txt, pattern),
                           pa.int64()).to_numpy(zero_copy_only=False)

        n_words = rx(WORD_RE)
        n_ws = rx(WS_RE)
        n_chars = pc.cast(pc.utf8_length(txt),
                          pa.int64()).to_numpy(zero_copy_only=False)
        word_chars = n_chars - n_ws  # Σ len(word) — words are \S+ runs
        n_sym = rx(HASHSYM_RE) + rx(ELLIPSIS_RE)
        n_lines = rx("\n") + 1
        n_bullet = rx(BULLET_LINE_RE)
        n_ellend = rx(ELLIPSIS_END_RE)
        n_alpha = rx(ALPHA_WORD_RE)
        stop_hits = rx(STOP_RE)

        ok_words = ((n_words >= GOPHER_MIN_WORDS)
                    & (n_words <= GOPHER_MAX_WORDS))
        ok_mwl = ((GOPHER_MIN_MWL * n_words <= word_chars)
                  & (word_chars <= GOPHER_MAX_MWL * n_words))
        ok_symbol = 10 * n_sym < n_words
        ok_bullet = 10 * n_bullet < 9 * n_lines
        ok_ellipsis = 10 * n_ellend < 3 * n_lines
        ok_alpha = 10 * n_alpha >= 8 * n_words
        ok_stop = stop_hits >= MIN_STOP_HITS
        ok_all = (ok_words & ok_mwl & ok_symbol & ok_bullet & ok_ellipsis
                  & ok_alpha & ok_stop)

        def i64(a: np.ndarray) -> pa.Array:
            return pa.array(a.astype(np.int64), pa.int64())

        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": i64(n_words), "word_chars": i64(word_chars),
            "n_sym": i64(n_sym), "n_lines": i64(n_lines),
            "n_bullet": i64(n_bullet), "n_ellend": i64(n_ellend),
            "n_alpha": i64(n_alpha), "stop_hits": i64(stop_hits),
            "ok_words": i64(ok_words), "ok_mwl": i64(ok_mwl),
            "ok_symbol": i64(ok_symbol), "ok_bullet": i64(ok_bullet),
            "ok_ellipsis": i64(ok_ellipsis), "ok_alpha": i64(ok_alpha),
            "ok_stop": i64(ok_stop), "pass_gopher": i64(ok_all),
        })

    return ds.map_batches(screen, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_GOPHER_RULES = f"""
WITH c AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
           length(text) - len(regexp_extract_all(text, '\\s'))
               AS word_chars,
           len(regexp_extract_all(text, '#'))
             + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
           len(regexp_extract_all(text, chr(10))) + 1 AS n_lines,
           len(regexp_extract_all(text, '(?m)^[-•*]')) AS n_bullet,
           len(regexp_extract_all(text, '(?m)\\.\\.\\.$')) AS n_ellend,
           len(regexp_extract_all(text, '{ALPHA_WORD_RE}')) AS n_alpha,
           len(regexp_extract_all(text, '{STOP_RE}')) AS stop_hits
    FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(word_chars AS BIGINT) AS word_chars,
       CAST(n_sym AS BIGINT) AS n_sym,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_bullet AS BIGINT) AS n_bullet,
       CAST(n_ellend AS BIGINT) AS n_ellend,
       CAST(n_alpha AS BIGINT) AS n_alpha,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
            AS BIGINT) AS ok_words,
       CAST({GOPHER_MIN_MWL} * n_words <= word_chars
            AND word_chars <= {GOPHER_MAX_MWL} * n_words AS BIGINT) AS ok_mwl,
       CAST(10 * n_sym < n_words AS BIGINT) AS ok_symbol,
       CAST(10 * n_bullet < 9 * n_lines AS BIGINT) AS ok_bullet,
       CAST(10 * n_ellend < 3 * n_lines AS BIGINT) AS ok_ellipsis,
       CAST(10 * n_alpha >= 8 * n_words AS BIGINT) AS ok_alpha,
       CAST(stop_hits >= {MIN_STOP_HITS} AS BIGINT) AS ok_stop,
       CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
            AND {GOPHER_MIN_MWL} * n_words <= word_chars
            AND word_chars <= {GOPHER_MAX_MWL} * n_words
            AND 10 * n_sym < n_words
            AND 10 * n_bullet < 9 * n_lines
            AND 10 * n_ellend < 3 * n_lines
            AND 10 * n_alpha >= 8 * n_words
            AND stop_hits >= {MIN_STOP_HITS} AS BIGINT) AS pass_gopher
FROM c
"""


# ---------------------------------------------------------------------------
# winsorize_values — group-relative outlier clamping: events.value clamped
# to its event_type's exact discrete [p01, p99].  The metric-cleaning step
# before any per-type mean/σ is trusted (a fat-finger value would otherwise
# poison downstream z-scores).  Shape: per-batch (type, value) count
# combiners → ONE type-keyed exchange where each type's complete value
# histogram picks its two quantiles via the pinned quantile_disc rule
# (relational2.disc_quantile — same rule every discrete-quantile consumer
# shares) → O(types) thresholds broadcast in the clamp closure.  The
# exchange moves (type, value, count) rows — bounded by the DISTINCT-value
# domain, which for continuous doubles approaches the row count; at 100-TB
# scale swap the exact histogram for sketch.approx_quantiles_value's
# mergeable t-digest-style buckets (documented approximate path) or
# pre-round values to fixed precision.
# ---------------------------------------------------------------------------

WINSOR_LO = (1, 100)    # p01 as an integer rational — no float rank
WINSOR_HI = (99, 100)   # p99


def winsorize_values(sf_dir: str) -> rd.Dataset:
    """(event_id, event_type, value, value_w): value_w is value clamped to
    the event_type's [quantile_disc(.01), quantile_disc(.99)].  Clamping is
    pure selection (no arithmetic), so floats hash-compare exactly."""
    path = f"{sf_dir}/events.parquet"
    base = pruned_read(path, ["event_id", "event_type", "value"])

    # per-type [p01, p99] through the shared exact/sketch quantile engine;
    # O(types) driver rows either way
    thr, _ = grouped_disc_quantiles(base, "event_type", "value",
                                    [WINSOR_LO, WINSOR_HI])
    t_sorted = np.sort(thr["event_type"].to_numpy())
    t_order = np.argsort(thr["event_type"].to_numpy())
    lo_v = thr["q0"].to_numpy()[t_order]
    hi_v = thr["q1"].to_numpy()[t_order]

    def clamp(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(t_sorted, et)
        w = np.minimum(np.maximum(v, lo_v[i]), hi_v[i])
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "value": t["value"],
                         "value_w": pa.array(w, pa.float64())})

    return base.map_batches(clamp, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_WINSORIZE = f"""
WITH q AS (
  SELECT event_type,
         quantile_disc(value, {WINSOR_LO[0]}/{WINSOR_LO[1]}.0) AS lo,
         quantile_disc(value, {WINSOR_HI[0]}/{WINSOR_HI[1]}.0) AS hi
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type AS event_type, value,
       LEAST(GREATEST(value, lo), hi) AS value_w
FROM events e JOIN q ON e.event_type = q.event_type
"""


QUERIES = {
    "stopword_filter": stopword_filter,
    "winsorize_values": winsorize_values,
    "type_token_ratio": type_token_ratio,
    "percentile_filter_docs": percentile_filter_docs,
    "pii_scrub": pii_scrub,
    "gopher_rules": gopher_rules,
}

SQL = {
    "stopword_filter": SQL_STOPWORD_FILTER,
    "winsorize_values": SQL_WINSORIZE,
    "type_token_ratio": SQL_TYPE_TOKEN_RATIO,
    "percentile_filter_docs": SQL_PERCENTILE_FILTER,
    "pii_scrub": SQL_PII_SCRUB,
    "gopher_rules": SQL_GOPHER_RULES,
}


# ---------------------------------------------------------------------------
# quantile_normalize — per-source percent-rank normalization of doc length.
# Per-source score distributions differ (one scraper yields long pages,
# another short snippets), so a single global threshold over-filters some
# sources; the standard fix is to replace each doc's raw score with its
# rank WITHIN its source, making scores comparable before a global cut.
#
# Distribution shape: the dense-rank two-phase pattern (seeded_shuffle /
# perplexity_buckets), keyed per source — phase 1 is one (source, bucket)
# COUNT exchange (bucket = n_chars // width, capped), the driver folds
# O(sources x buckets) prefix offsets + per-source totals; phase 2 is ONE
# (source, bucket)-keyed exchange whose blocks rank locally by
# (n_chars, doc_id) and emit pr_micros = rank_0 * 1e6 // (n_src - 1) —
# all-integer, bit-identical to the SQL ROW_NUMBER mirror, no global sort,
# and the text column never moves.
# ---------------------------------------------------------------------------

QN_BUCKET_WIDTH = 64
QN_BUCKETS = 64

_QN_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("source", pa.string()),
    ("n_chars", pa.int64()), ("pr_micros", pa.int64()),
])


def quantile_normalize(sf_dir: str) -> rd.Dataset:
    """(doc_id, source, n_chars, pr_micros): each doc's integer-exact
    percent-rank of n_chars within its source (rank over (n_chars, doc_id),
    scaled by 1e6; single-doc sources score 0)."""
    from ocrautomator_ray.functions.dedup import _ramp
    from ocrautomator_ray.functions.exchange import per_key_blocks

    def keyed(t: pa.Table) -> pa.Table:
        n = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(n // QN_BUCKET_WIDTH, QN_BUCKETS - 1)
        return pa.table({
            "doc_id": t["doc_id"], "source": t["source"],
            "n_chars": pa.array(n, pa.int64()),
            "bucket_k": pa.array(b, pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/documents.parquet",
                     ["doc_id", "source", "n_chars"])
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True)
    counts = (keyed_ds.groupby(["source", "bucket_k"], num_partitions=8)
              .count().to_pandas().sort_values(["source", "bucket_k"]))
    offsets: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for src, bk, c in counts[["source", "bucket_k", "count()"]].itertuples(
            index=False):
        offsets[(src, int(bk))] = totals.get(src, 0)
        totals[src] = totals.get(src, 0) + int(c)

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _QN_OUT_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        src = block["source"].to_pandas().to_numpy()
        n = block["n_chars"].to_numpy(zero_copy_only=False)
        b = block["bucket_k"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, n, b, src))
        srcs, bs = src[order], b[order]
        new_run = np.r_[True, (srcs[1:] != srcs[:-1]) | (bs[1:] != bs[:-1])]
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.r_[starts, len(bs)])
        base = np.array([offsets[(srcs[s], int(bs[s]))] for s in starts],
                        np.int64)                       # one lookup per RUN
        denom = np.array([max(totals[srcs[s]] - 1, 1) for s in starts],
                         np.int64)
        rank0 = np.repeat(base, run_len) + _ramp(run_len)
        pr = rank0 * 1_000_000 // np.repeat(denom, run_len)
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "source": pa.array(srcs),
            "n_chars": pa.array(n[order], pa.int64()),
            "pr_micros": pa.array(pr, pa.int64()),
        })

    return per_key_blocks(keyed_ds, ["source", "bucket_k"], rank_block,
                          num_partitions=16)


SQL_QUANTILE_NORMALIZE = """
SELECT doc_id, source, n_chars,
       (ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1)
         * 1000000
         // GREATEST(COUNT(*) OVER (PARTITION BY source) - 1, 1) AS pr_micros
FROM documents
"""


QUERIES["quantile_normalize"] = quantile_normalize
SQL["quantile_normalize"] = SQL_QUANTILE_NORMALIZE


# ---------------------------------------------------------------------------
# value_mad_by_type — robust per-group location/scale: median and MAD
# (median absolute deviation) of event values per event_type. The robust
# counterpart of event_value_zscore's mean/std — the screen of choice when
# heavy-tailed junk would drag a mean-based threshold.
#
# Two value-counting quantile exchanges (the winsorize machinery, q = 1/2):
# phase A reduces (type, value) counts to per-type exact medians (O(types)
# broadcast), phase B re-streams the table deriving |value − median| — an
# IEEE-exact op mirrored identically in SQL (the zscore precedent) — and
# reduces (type, dev) counts to the per-type MAD. Both quantiles are pure
# SELECTION (disc_quantile), so the doubles hash-compare exactly.
# ---------------------------------------------------------------------------

def value_mad_by_type(sf_dir: str) -> rd.Dataset:
    """(event_type, n, med, mad): per-type exact discrete median of value
    and of |value − med| (both through the shared exact/sketch quantile
    engine; a continuous domain flips to the histogram path)."""
    path = f"{sf_dir}/events.parquet"
    base = pruned_read(path, ["event_type", "value"])

    def _per_type_median(ds) -> "object":
        df, _ = grouped_disc_quantiles(ds, "event_type", "value", [(1, 2)])
        return df.rename(columns={"q0": "q"})

    med = _per_type_median(base)              # O(types) rows
    t_sorted = np.sort(med["event_type"].to_numpy())
    t_order = np.argsort(med["event_type"].to_numpy())
    med_v = med["q"].to_numpy()[t_order]
    n_v = med["n"].to_numpy()[t_order]

    def deviations(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(t_sorted, et)
        return pa.table({"event_type": t["event_type"],
                         "value": pa.array(np.abs(v - med_v[i]),
                                           pa.float64())})

    dev = base.map_batches(deviations, batch_format="pyarrow",
                           zero_copy_batch=True)
    mad = _per_type_median(dev)
    m_order = np.argsort(mad["event_type"].to_numpy())
    mad_v = mad["q"].to_numpy()[m_order]
    return rd.from_arrow(pa.table({
        "event_type": pa.array(t_sorted, pa.string()),
        "n": pa.array(n_v, pa.int64()),
        "med": pa.array(med_v, pa.float64()),
        "mad": pa.array(mad_v, pa.float64()),
    }))


SQL_VALUE_MAD = """
WITH med AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(value, 0.5) AS med
    FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, ABS(e.value - m.med) AS d
    FROM events e JOIN med m USING (event_type)
),
madt AS (
    SELECT event_type, quantile_disc(d, 0.5) AS mad
    FROM dev GROUP BY event_type
)
SELECT m.event_type, m.n, m.med, madt.mad
FROM med m JOIN madt USING (event_type)
"""


QUERIES["value_mad_by_type"] = value_mad_by_type
SQL["value_mad_by_type"] = SQL_VALUE_MAD
