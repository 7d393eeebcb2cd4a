"""Mergeable sketches: HyperLogLog approximate distinct count.

The canonical at-scale aggregation shape (SURVEY guide §Aggregation): emit one
serialized sketch per key per batch inside map_batches, merge the (tiny)
sketches in a second-stage groupby — the shuffle moves 4 KB registers, never
rows. HLL per Flajolet et al. 2007 with the standard bias/small-range
corrections. Deterministic (FNV-hashed), so results are stable across runs;
accuracy (±~1.6% at p=12) is pinned by a pytest tolerance check against the
exact count — no SQL oracle (approximate by design).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read

HLL_P = 12                      # 2^12 registers → σ ≈ 1.04/√4096 ≈ 1.6%
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)

_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def _hash_u64(vals: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of an int64/uint64 array (vectorized FNV-ish)."""
    h = vals.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (h ^ _FNV_OFFSET) * _FNV_PRIME
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


def hll_sketch(vals: np.ndarray) -> np.ndarray:
    """uint8[HLL_M] register array for a batch of values."""
    h = _hash_u64(vals)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of `rest` + 1 (bounded by 64 - p + 1); a value
    # stops counting at its first 1 bit (active mask)
    lz = np.zeros(len(rest), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    active = np.ones(len(rest), dtype=bool)
    for _ in range(64 - HLL_P + 1):
        active &= (cur & mask) == 0
        if not active.any():
            break
        lz[active] += 1
        with np.errstate(over="ignore"):
            cur = cur << np.uint64(1)
    rank = lz + 1
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Flajolet estimator with small-range (linear counting) correction."""
    est = _ALPHA * HLL_M * HLL_M / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)
    return int(round(est))


def approx_distinct_users_per_type(sf_dir: str) -> rd.Dataset:
    """Approximate COUNT(DISTINCT user_id) per event_type via mergeable HLL
    sketches. Output: (event_type, approx_users). Rows-only driver check;
    the pytest oracle bounds the error vs the exact count."""
    ds = pruned_read(f"{sf_dir}/events.parquet", ["event_type", "user_id"])

    part_schema = pa.schema([("event_type", pa.string()),
                             ("sketch", pa.binary())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(et, kind="stable")
        et, uid = et[order], uid[order]
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        bounds = np.r_[starts, len(et)]
        types, sketches = [], []
        for i in range(len(starts)):  # bounded by distinct event types
            types.append(et[starts[i]])
            sketches.append(
                hll_sketch(uid[bounds[i]: bounds[i + 1]]).tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "sketch": pa.array(sketches, pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        merged = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["sketch"].to_pylist():  # one buffer per upstream batch
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pa.table({
            "event_type": pa.array([g["event_type"][0].as_py()], pa.string()),
            "approx_users": pa.array([hll_estimate(merged)], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type", num_partitions=4)
        .map_groups(merge, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# approx_top_tokens — Misra-Gries heavy hitters (Misra & Gries 1982) over the
# corpus token stream. The sketch granularity is the DOCUMENT, not the batch:
# each doc's exact token counts compress to MG_K counters (subtract the
# (k+1)-th largest count — a multiset VALUE, so tie order can't matter —
# and drop ≤0), recording the subtracted tau as the doc's error
# contribution; a groupby sums the per-doc counters (order-free), and a
# final single-block compress re-caps the union. Per-doc granularity makes
# the result independent of batch partitioning — fully deterministic —
# which is what lets an approximate sketch carry an exact SQL oracle.
# Estimates are LOWER bounds: est ≤ true ≤ est + err_ub (pytest-pinned).
# The shuffle moves ≤ MG_K rows per doc, never tokens.
# --------------------------------------------------------------------------

MG_K = 16          # counters per sketch (vocab here ~40 → real compression)
MG_TOP = 10        # reported heavy hitters

_ERR_TOKEN = "\x00__mg_err__"


def _mg_compress(tokens: np.ndarray, counts: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Keep at most ``k`` counters; returns (tokens, counts, err_added)."""
    if len(tokens) <= k:
        return tokens, counts, 0
    order = np.argsort(-counts, kind="stable")
    tau = int(counts[order[k]])          # (k+1)-th largest
    reduced = counts - tau
    keep = reduced > 0
    return tokens[keep], reduced[keep], tau


def approx_top_tokens(sf_dir: str) -> rd.Dataset:
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t["text"], pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        ndoc = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docidx = np.repeat(np.arange(len(ndoc)), ndoc)
        ne = pc.not_equal(flat, "")
        tt = pa.table({
            "d": pa.array(docidx, pa.int64()),
            "w": flat,
        }).filter(ne)
        g = pa.TableGroupBy(tt, ["d", "w"]).aggregate([([], "count_all")])
        d = g["d"].to_numpy(zero_copy_only=False)
        c = g["c_count"] if "c_count" in g.column_names else g.column(2)
        c = c.to_numpy(zero_copy_only=False).astype(np.int64)
        # per-doc MG: tau = (k+1)-th largest count VALUE of the doc (0 when
        # the doc has ≤ k distinct tokens), kept = counts - tau where > 0 —
        # entirely Arrow/numpy, no per-token Python objects
        order = np.lexsort((-c, d))
        d, c = d[order], c[order]
        first = np.concatenate(([True], d[1:] != d[:-1])) if len(d) else \
            np.zeros(0, dtype=bool)
        run_starts = np.flatnonzero(first)
        run_len = np.diff(np.append(run_starts, len(d)))
        rn = np.arange(len(d)) - np.repeat(run_starts, run_len)
        taus = np.zeros(len(ndoc), dtype=np.int64)
        tau_rows = rn == MG_K
        taus[d[tau_rows]] = c[tau_rows]
        kept = c - taus[d]
        m = kept > 0
        tokens = g.column(1).take(pa.array(order[m]))
        return pa.table({
            "token": pa.concat_arrays(
                [tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray)
                 else tokens, pa.array([_ERR_TOKEN], pa.string())]),
            "cnt": pa.array(np.append(kept[m], taus.sum()), pa.int64()),
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token", num_partitions=4)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        tok = np.asarray(t["token"].to_pylist(), dtype=object)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_err = tok == _ERR_TOKEN
        err = int(cnt[is_err].sum())
        tok, cnt = tok[~is_err], cnt[~is_err]
        tok, cnt, tau = _mg_compress(tok, cnt, MG_K)
        err += tau
        # deterministic report order: estimate desc, then token
        order = np.lexsort((tok.astype(str), -cnt))[:MG_TOP]
        return pa.table({
            "token": pa.array(list(tok[order]), pa.string()),
            "est_count": pa.array(cnt[order], pa.int64()),
            "err_ub": pa.array(np.full(len(order), err), pa.int64()),
        })

    return merged.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


# Exact SQL mirror of the deterministic per-doc MG sketch: tau is a multiset
# value (the (k+1)-th largest count), so row_number tie order can't change
# it; the merge is an order-free sum; the final compress and the
# (est DESC, token) top-k are identical in both engines (binary ASCII
# collation). An approximate operator with a hash-exact oracle.
SQL_APPROX_TOP_TOKENS = f"""
WITH tok AS (
    SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS w
    FROM documents
),
tc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
rk AS (SELECT doc_id, w, c,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC) AS rn
       FROM tc),
tau AS (SELECT doc_id,
               COALESCE(MAX(CASE WHEN rn = {MG_K + 1} THEN c END), 0) AS tau
        FROM rk GROUP BY doc_id),
kept AS (SELECT rk.doc_id, w, c - tau AS c2
         FROM rk JOIN tau USING (doc_id) WHERE c - tau > 0),
merged AS (SELECT w, CAST(SUM(c2) AS BIGINT) AS c FROM kept GROUP BY w),
err1 AS (SELECT CAST(COALESCE(SUM(tau), 0) AS BIGINT) AS e FROM tau),
mrk AS (SELECT w, c, row_number() OVER (ORDER BY c DESC) AS rn FROM merged),
tau2 AS (SELECT COALESCE(MAX(CASE WHEN rn = {MG_K + 1} THEN c END), 0) AS t2
         FROM mrk)
SELECT w AS token, CAST(c - t2 AS BIGINT) AS est_count,
       CAST(e + t2 AS BIGINT) AS err_ub
FROM mrk, tau2, err1
WHERE c - t2 > 0
ORDER BY est_count DESC, token
LIMIT {MG_TOP}
"""


# --------------------------------------------------------------------------
# approx_quantiles_value — mergeable fixed-bin histogram quantiles (p50/p95/
# p99 of the event value per event_type). Two passes: an O(1) global min/max,
# then exact per-(type, bin) counts — the shuffle moves ≤ NBINS rows per type
# per batch. The estimate (lower edge of the bin holding the k-th value) is
# exact integer arithmetic end to end, so unlike a randomized KLL sketch it
# is deterministic AND SQL-expressible: the DuckDB oracle mirrors the same
# binning, giving a hash-exact check of an approximate operator. Error bound:
# |est − true quantile| ≤ (hi−lo+1)/NBINS, pinned in pytest.
# --------------------------------------------------------------------------

QUANT_NBINS = 2048
QUANT_PS = (0.5, 0.95, 0.99)


def approx_quantiles_value(sf_dir: str) -> rd.Dataset:
    import pyarrow.compute as pc

    from ray.data.aggregate import Max as RMax
    from ray.data.aggregate import Min as RMin
    from ray.data.aggregate import Sum as RSum

    from ocrautomator_ray.functions.exchange import per_key_blocks

    path = f"{sf_dir}/events.parquet"

    def to_micros(t: pa.Table) -> pa.Table:
        from ocrautomator_ray.functions.relational import _cents

        return pa.table({"event_type": t["event_type"],
                         "vm": _cents(t["value"], 1_000_000)})

    base = pruned_read(path, ["event_type", "value"]).map_batches(
        to_micros, batch_format="pyarrow", zero_copy_batch=True
    )
    bounds = base.aggregate(RMin("vm"), RMax("vm"))
    lo, hi = int(bounds["min(vm)"]), int(bounds["max(vm)"])
    width_dom = hi - lo + 1

    def hist_partial(t: pa.Table) -> pa.Table:
        vm = t["vm"].to_numpy(zero_copy_only=False)
        b = (vm - lo) * QUANT_NBINS // width_dom
        tt = pa.table({"event_type": t["event_type"],
                       "bin": pa.array(b, pa.int64())})
        g = pa.TableGroupBy(tt, ["event_type", "bin"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["event_type", "bin", "cnt"])

    hist = (
        base.map_batches(hist_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby(["event_type", "bin"], num_partitions=32)
        .aggregate(RSum("cnt", alias_name="cnt"))
    )

    fin_schema = pa.schema(
        [("event_type", pa.string())]
        + [(f"p{int(p*100)}_est_micros", pa.int64()) for p in QUANT_PS])

    def finish(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if block.num_rows == 0:
            return fin_schema.empty_table()
        s = block.take(pc.sort_indices(block, sort_keys=[
            ("event_type", "ascending"), ("bin", "ascending")]))
        et = s["event_type"].to_numpy(zero_copy_only=False)
        bins_all = s["bin"].to_numpy(zero_copy_only=False)
        cnt = s["cnt"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        bounds = np.r_[starts, len(et)]
        cols: dict[str, list] = {"event_type": []}
        for p in QUANT_PS:
            cols[f"p{int(p*100)}_est_micros"] = []
        for i in range(len(starts)):  # bounded by distinct event types
            bins = bins_all[bounds[i]: bounds[i + 1]]
            cum = np.cumsum(cnt[bounds[i]: bounds[i + 1]])
            n = int(cum[-1])
            cols["event_type"].append(et[starts[i]])
            for p in QUANT_PS:
                kth = int(np.ceil(p * n))
                b = int(bins[np.searchsorted(cum, max(kth, 1))])
                cols[f"p{int(p*100)}_est_micros"].append(
                    lo + b * width_dom // QUANT_NBINS)
        return pa.table({
            "event_type": pa.array(cols["event_type"], pa.string()),
            **{f"p{int(p*100)}_est_micros": pa.array(
                cols[f"p{int(p*100)}_est_micros"], pa.int64())
               for p in QUANT_PS},
        })

    return per_key_blocks(hist, ["event_type"], finish, num_partitions=4)


SQL_APPROX_QUANTILES = f"""
WITH v AS (
    SELECT event_type, CAST(FLOOR(value*1000000 + 0.5) AS BIGINT) AS vm
    FROM events
),
b AS (SELECT min(vm) AS lo, max(vm) AS hi FROM v),
h AS (
    SELECT event_type, (vm - lo) * {QUANT_NBINS} // (hi - lo + 1) AS bin,
           COUNT(*) AS cnt
    FROM v, b GROUP BY event_type, bin
),
c AS (
    SELECT event_type, bin,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
           SUM(cnt) OVER (PARTITION BY event_type) AS n
    FROM h
),
q AS (
    SELECT event_type,
           min(CASE WHEN cum >= greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
                    THEN bin END) AS b50,
           min(CASE WHEN cum >= greatest(CAST(ceil(0.95 * n) AS BIGINT), 1)
                    THEN bin END) AS b95,
           min(CASE WHEN cum >= greatest(CAST(ceil(0.99 * n) AS BIGINT), 1)
                    THEN bin END) AS b99
    FROM c GROUP BY event_type
)
SELECT event_type,
       lo + b50 * (hi - lo + 1) // {QUANT_NBINS} AS p50_est_micros,
       lo + b95 * (hi - lo + 1) // {QUANT_NBINS} AS p95_est_micros,
       lo + b99 * (hi - lo + 1) // {QUANT_NBINS} AS p99_est_micros
FROM q, b
"""


# ---------------------------------------------------------------------------
# table_profile — single-pass per-column statistics ("describe")
# ---------------------------------------------------------------------------

# canonical scalar per type so engine and SQL render identically: ints
# verbatim, floats as cents (FLOOR(x*100+0.5)), timestamps as epoch micros,
# strings lexicographic (binary collation both engines)
_PROFILE_COLS = [  # (name, kind)
    ("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"),
    ("o_totalprice", "cents"), ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def table_profile(sf_dir: str) -> rd.Dataset:
    """(column, n_rows, n_nulls, min_repr, max_repr) for every orders
    column — the one-pass dataset profile every ingestion job runs first.

    Partial+final over heterogeneous types: each batch emits ONE typed row
    per column (numeric/timestamp extrema in an int64 pair, string extrema
    in a string pair), a 6-group groupby merges them, and a final map
    renders the canonical representation. Shuffle volume: columns × batches
    rows, independent of table size."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    ds = pruned_read(f"{sf_dir}/orders.parquet",
                     [c for c, _ in _PROFILE_COLS])

    def partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nulls": [], "min_i": [], "max_i": [],
                "min_s": [], "max_s": []}
        for name, kind in _PROFILE_COLS:
            col = t[name]
            n = len(col)
            nulls = col.null_count
            mi = ma = None
            ms = xs = None
            if n > nulls:
                if kind == "cents":
                    iv = pc.cast(pc.floor(pc.add(pc.multiply(
                        col, 100.0), 0.5)), pa.int64())
                    mm = pc.min_max(iv)
                    mi, ma = mm["min"].as_py(), mm["max"].as_py()
                elif kind == "ts":
                    mm = pc.min_max(col.cast(pa.int64()))
                    mi, ma = mm["min"].as_py(), mm["max"].as_py()
                elif kind == "int":
                    mm = pc.min_max(col)
                    mi, ma = mm["min"].as_py(), mm["max"].as_py()
                else:
                    mm = pc.min_max(col)
                    ms, xs = mm["min"].as_py(), mm["max"].as_py()
            rows["column"].append(name)
            rows["n"].append(n)
            rows["nulls"].append(nulls)
            rows["min_i"].append(mi)
            rows["max_i"].append(ma)
            rows["min_s"].append(ms)
            rows["max_s"].append(xs)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "min_i": pa.array(rows["min_i"], pa.int64()),
            "max_i": pa.array(rows["max_i"], pa.int64()),
            "min_s": pa.array(rows["min_s"], pa.string()),
            "max_s": pa.array(rows["max_s"], pa.string()),
        })

    kinds = dict(_PROFILE_COLS)

    def render(t: pa.Table) -> pa.Table:
        cols = t["column"].to_pylist()
        mi, ma = t["min_i"].to_pylist(), t["max_i"].to_pylist()
        ms, xs = t["min_s"].to_pylist(), t["max_s"].to_pylist()
        min_r = [ms[i] if kinds[c] == "str" else
                 (None if mi[i] is None else str(mi[i]))
                 for i, c in enumerate(cols)]
        max_r = [xs[i] if kinds[c] == "str" else
                 (None if ma[i] is None else str(ma[i]))
                 for i, c in enumerate(cols)]
        return pa.table({
            "column": t["column"],
            "n_rows": t["n"],
            "n_nulls": t["nulls"],
            "min_repr": pa.array(min_r, pa.string()),
            "max_repr": pa.array(max_r, pa.string()),
        })

    from ocrautomator_ray.functions.exchange import tune_exchange

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    tune_exchange(out, 4)
    return (
        out.groupby("column", num_partitions=4)
        .aggregate(Sum("n", alias_name="n"), Sum("nulls", alias_name="nulls"),
                   Min("min_i", alias_name="min_i"),
                   Max("max_i", alias_name="max_i"),
                   Min("min_s", alias_name="min_s"),
                   Max("max_s", alias_name="max_s"))
        .map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    )


def _profile_sql() -> str:
    parts = []
    for name, kind in _PROFILE_COLS:
        if kind == "cents":
            expr = f"CAST(FLOOR({name}*100 + 0.5) AS BIGINT)"
        elif kind == "ts":
            expr = f"CAST(epoch_us({name}) AS BIGINT)"
        else:
            expr = name
        parts.append(
            f"SELECT '{name}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls, "
            f"CAST(MIN({expr}) AS VARCHAR) AS min_repr, "
            f"CAST(MAX({expr}) AS VARCHAR) AS max_repr FROM orders")
    return "\nUNION ALL\n".join(parts)


SQL_TABLE_PROFILE = _profile_sql()


QUERIES = {
    "approx_distinct_users_per_type": approx_distinct_users_per_type,
    "approx_top_tokens": approx_top_tokens,
    "approx_quantiles_value": approx_quantiles_value,
    "table_profile": table_profile,
}

SQL: dict[str, str] = {
    "approx_quantiles_value": SQL_APPROX_QUANTILES,
    "approx_top_tokens": SQL_APPROX_TOP_TOKENS,
    "table_profile": SQL_TABLE_PROFILE,
}


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the third mergeable
# sketch family, with an error-audit query: estimated vs exact token counts.
#
# The sketch is built the honest streaming way — every block folds its raw
# token occurrences into a CM_DEPTH × CM_WIDTH counter matrix partial
# (D·W = 256 rows per block, never tokens), ONE (row, bucket)-keyed exchange
# merges them — so the counter table is mergeable across shards exactly like
# the HLL registers. The audit half runs the exact token-count exchange the
# corpus operators already use and reports est vs exact per token; est ≥
# exact always (counters only over-count on collisions), which the pytest
# pins alongside the SQL equality. Width is set at 64 so the synthetic
# corpus' ~40-token vocabulary actually collides — the estimate is exercised,
# not vacuously exact.
#
# Hashing is deterministic and SQL-mirrorable end to end: FNV-1a of the
# token bytes, then the Knuth multiplicative mix with a per-row seed, mod
# width — uint64 wraparound equals the HUGEINT product mod 2^32 because
# 2^32 | 2^64.
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 64
CM_SEED_BASE = 97
CM_SEED_STEP = 1000003


def _cm_buckets(h: np.ndarray) -> np.ndarray:
    """(CM_DEPTH, n) int64 bucket ids for uint64 token hashes."""
    from ocrautomator_ray.functions.curate import _KNUTH

    out = np.empty((CM_DEPTH, len(h)), np.int64)
    with np.errstate(over="ignore"):
        for r in range(CM_DEPTH):
            seed = np.uint64(CM_SEED_BASE + CM_SEED_STEP * r)
            m = ((h + seed) * np.uint64(_KNUTH)) % np.uint64(1 << 32)
            out[r] = (m % np.uint64(CM_WIDTH)).astype(np.int64)
    return out


def _cm_counters(sf_dir: str) -> np.ndarray:
    """(CM_DEPTH, CM_WIDTH) int64 merged counter matrix from one streaming
    pass over the documents table."""
    from ray.data.aggregate import Sum

    from ocrautomator_ray.functions.dedup import _fnv1a_strings, _tokenize_re2
    from ocrautomator_ray.functions.exchange import pruned_read, tune_exchange

    partial_schema = pa.schema([
        ("r", pa.int64()), ("b", pa.int64()), ("cnt", pa.int64()),
    ])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return partial_schema.empty_table()
        flat, _ = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return partial_schema.empty_table()
        h = _fnv1a_strings(flat)
        buckets = _cm_buckets(h)
        rows = np.repeat(np.arange(CM_DEPTH, dtype=np.int64), buckets.shape[1])
        flat_idx = rows * CM_WIDTH + buckets.reshape(-1)
        cnt = np.bincount(flat_idx, minlength=CM_DEPTH * CM_WIDTH)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "r": pa.array(nz // CM_WIDTH, pa.int64()),
            "b": pa.array(nz % CM_WIDTH, pa.int64()),
            "cnt": pa.array(cnt[nz].astype(np.int64), pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["text"])
    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    tune_exchange(out)
    agg = (out.groupby(["r", "b"], num_partitions=4)
              .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())
    C = np.zeros((CM_DEPTH, CM_WIDTH), np.int64)
    C[agg["r"].to_numpy(), agg["b"].to_numpy()] = agg["cnt"].to_numpy()
    return C


def cmsketch_token_counts(sf_dir: str) -> rd.Dataset:
    """(token, est_count, exact_count): the count-min estimate next to the
    exact corpus count for every distinct token — the sketch-error audit.

    The audit half is ONE token-keyed exchange whose blocks fold their
    co-located per-batch (token, count) combiners into exact totals AND
    look up the broadcast counter matrix in the same pass (mangled scaled
    corpora have millions of distinct tokens, so the exchange is sized by
    auto_partitions and the estimate is fused into the fold rather than
    run as a second vocabulary-wide stage)."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings, _tokenize_re2
    from ocrautomator_ray.functions.exchange import (
        auto_partitions,
        per_key_blocks,
        pruned_read,
    )

    path = f"{sf_dir}/documents.parquet"
    C = _cm_counters(sf_dir)
    tok_schema = pa.schema([("token", pa.string()),
                            ("exact_count", pa.int64())])
    out_schema = pa.schema([("token", pa.string()),
                            ("est_count", pa.int64()),
                            ("exact_count", pa.int64())])

    def tok_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tok_schema.empty_table()
        flat, _ = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return tok_schema.empty_table()
        import pyarrow.compute as pc

        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "exact_count": vc.field("counts").cast(pa.int64())})

    def finalize(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        w = block["token"].to_numpy(zero_copy_only=False)
        k = block["exact_count"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="mergesort")
        w, k = w[order], k[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        exact = np.add.reduceat(k, starts).astype(np.int64)
        uw = pa.array(w[starts], pa.string())
        h = _fnv1a_strings(uw)
        buckets = _cm_buckets(h)
        est = C[np.arange(CM_DEPTH)[:, None], buckets].min(axis=0)
        return pa.table({"token": uw,
                         "est_count": pa.array(est, pa.int64()),
                         "exact_count": pa.array(exact, pa.int64())})

    rows = pruned_read(path, ["text"]).map_batches(
        tok_partial, batch_format="pyarrow", zero_copy_batch=True)
    return per_key_blocks(rows, ["token"], finalize,
                          num_partitions=auto_partitions(path))


def _sql_cmsketch() -> str:
    from ocrautomator_ray.functions.curate import _KNUTH
    from ocrautomator_ray.functions.dedup import _sql_fnv1a

    def bucket(r: int) -> str:
        seed = CM_SEED_BASE + CM_SEED_STEP * r
        return (f"CAST(CAST((h + {seed}) % 18446744073709551616 AS HUGEINT)"
                f" * {_KNUTH} % 4294967296 % {CM_WIDTH} AS BIGINT)")

    rows = " UNION ALL ".join(
        f"SELECT w, {r} AS r, {bucket(r)} AS b FROM hw" for r in range(CM_DEPTH))
    return rf"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
tc AS (SELECT w, COUNT(*) AS exact_count FROM toks GROUP BY w),
hw AS (SELECT w, {_sql_fnv1a('w')} AS h FROM tc),
hb AS ({rows}),
ctr AS (
  SELECT hb.r, hb.b, SUM(tc.exact_count) AS cnt
  FROM hb JOIN tc USING (w) GROUP BY hb.r, hb.b
)
SELECT tc.w AS token, CAST(MIN(ctr.cnt) AS BIGINT) AS est_count,
       CAST(tc.exact_count AS BIGINT) AS exact_count
FROM tc JOIN hb USING (w) JOIN ctr ON ctr.r = hb.r AND ctr.b = hb.b
GROUP BY tc.w, tc.exact_count
"""


SQL_CMSKETCH = _sql_cmsketch()

QUERIES["cmsketch_token_counts"] = cmsketch_token_counts
SQL["cmsketch_token_counts"] = SQL_CMSKETCH
