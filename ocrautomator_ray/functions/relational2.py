"""Second batch of relational operators: set ops, large-side joins, windowed
analytics, per-group top-k, distinct counts — all SQL-oracled.

Same determinism conventions as functions/relational.py (integerized money,
matching column names, tie-broken top-k, partial pre-aggregation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read, stripped_read
from ray.data.aggregate import Sum

# --------------------------------------------------------------------------
# union_orders_halves — D2 union: two disjoint reads unioned, then aggregated
# --------------------------------------------------------------------------

_SPLIT_DATE = "1998-01-01"


def union_orders_halves(sf_dir: str) -> rd.Dataset:
    # o_orderdate is projected only because the pushed-down filter must bind
    # against the read schema (see stripped_read); partial()'s select drops it.
    lo = stripped_read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
        filter=(pc.field("o_orderdate") < pa.scalar(pd.Timestamp(_SPLIT_DATE))),
    )
    hi = stripped_read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pa.scalar(pd.Timestamp(_SPLIT_DATE))),
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64()
        )
        t = t.append_column("total_cents", cents)
        g = pa.TableGroupBy(t.select(["o_orderstatus", "total_cents"]),
                            "o_orderstatus").aggregate(
            [("total_cents", "sum"), ("total_cents", "count")]
        )
        return g.rename_columns(["o_orderstatus", "total_cents", "n"])

    return (
        lo.union(hi)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderstatus", num_partitions=4)
        .aggregate(Sum("total_cents", alias_name="total_cents"),
                   Sum("n", alias_name="n"))
    )


SQL_UNION = f"""
SELECT o_orderstatus,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       COUNT(*) AS n
FROM (
    SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{_SPLIT_DATE}'
    UNION ALL
    SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{_SPLIT_DATE}'
)
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# revenue_by_priority — LARGE × LARGE hash join (lineitem ⋈ orders), the
# J2 "both sides large" path: Dataset.join hash-partitions both inputs on the
# key (no broadcast), then partial-aggregates the joined stream.
# --------------------------------------------------------------------------

def revenue_by_priority(sf_dir: str) -> rd.Dataset:
    line = stripped_read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = pruned_read(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_orderpriority"])
    joined = line.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        cents4 = pc.cast(pc.floor(pc.add(pc.multiply(rev, 10_000.0), 0.5)), pa.int64())
        t = t.append_column("revenue_cents4", cents4)
        g = pa.TableGroupBy(t.select(["o_orderpriority", "revenue_cents4"]),
                            "o_orderpriority").aggregate(
            [("revenue_cents4", "sum"), ("revenue_cents4", "count")]
        )
        return g.rename_columns(["o_orderpriority", "revenue_cents4", "n_items"])

    return (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority", num_partitions=4)
        .aggregate(Sum("revenue_cents4", alias_name="revenue_cents4"),
                   Sum("n_items", alias_name="n_items"))
    )


SQL_JOIN_PRIORITY = """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents4,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# sessionize_events — session windows (30-min inactivity gap) per user
# (streaming-shaped op, SURVEY.md §2.9: partition by key, order by ts within
# the group, windowing logic in pandas inside map_groups)
# --------------------------------------------------------------------------

SESSION_GAP_MIN = 30


def sessionize_events(sf_dir: str) -> rd.Dataset:
    from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks

    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "ts", "event_id"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("session_id", pa.int64()),
        ("n_events", pa.int64()),
        ("session_start", pa.timestamp("us")),
        ("session_end", pa.timestamp("us")),
    ])
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def sessions_block(block: pa.Table) -> pa.Table:
        # all rows of each user are in this block (hash exchange); one
        # vectorized pass sessionizes every user at once: session starts
        # are user boundaries OR >gap deltas, sessions are then runs
        if block.num_rows == 0:
            return out_schema.empty_table()
        s = block.take(pc.sort_indices(block, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        ts = s["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tsi = ts.astype(np.int64)
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_s = new_user | np.r_[False, (tsi[1:] - tsi[:-1]) > gap_us]
        # per-user session id = global running start count rebased per user
        cs = np.cumsum(new_s)
        ustarts = np.flatnonzero(new_user)
        urun = np.diff(np.r_[ustarts, len(u)])
        sid = cs - np.repeat(cs[ustarts] - 1, urun)
        sstarts = np.flatnonzero(new_s)
        srun = np.diff(np.r_[sstarts, len(u)])
        ends = np.r_[sstarts[1:], len(u)] - 1
        return pa.table({
            "user_id": pa.array(u[sstarts], pa.int64()),
            "session_id": pa.array(sid[sstarts], pa.int64()),
            "n_events": pa.array(srun, pa.int64()),
            "session_start": pa.array(ts[sstarts], pa.timestamp("us")),
            "session_end": pa.array(ts[ends], pa.timestamp("us")),
        })

    return per_key_blocks(ds, ["user_id"], sessions_block,
                          num_partitions=auto_partitions(ev_path))


SQL_SESSIONIZE = f"""
WITH d AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts, event_id,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
    FROM d
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# top_events_per_user — per-group top-k (k=2 by value desc, event_id asc)
# --------------------------------------------------------------------------

TOPK_PER_USER = 2


def top_events_per_user(sf_dir: str) -> rd.Dataset:
    from ocrautomator_ray.functions.exchange import (auto_partitions,
                                                     per_key_blocks)

    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "event_id", "value"])

    _keys = [("user_id", "ascending"), ("value", "descending"),
             ("event_id", "ascending")]

    def _ranked(block: pa.Table) -> tuple[pa.Table, np.ndarray]:
        s = block.take(pc.sort_indices(block, sort_keys=_keys))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return s, np.empty(0, np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run = np.diff(np.r_[starts, len(u)])
        rank = np.arange(len(u), dtype=np.int64) \
            - np.repeat(starts, run) + 1
        return s, rank

    def partial(t: pa.Table) -> pa.Table:
        # batch-local top-k per user — shrinks the shuffle to k rows/user/batch
        s, rank = _ranked(t)
        return s.take(pa.array(np.flatnonzero(rank <= TOPK_PER_USER)
                               if len(rank) else np.empty(0, np.int64),
                               pa.int64()))

    def topk_block(block: pa.Table) -> pa.Table:
        # every surviving row of each user is in this block; rank vectorized
        s, rank = _ranked(block)
        keep = np.flatnonzero(rank <= TOPK_PER_USER) \
            if len(rank) else np.empty(0, np.int64)
        g = s.take(pa.array(keep, pa.int64()))
        return pa.table({
            "user_id": g["user_id"], "event_id": g["event_id"],
            "rank": pa.array(rank[keep], pa.int64()),
        })

    return per_key_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], topk_block,
        num_partitions=auto_partitions(ev_path))


SQL_TOPK_PER_USER = f"""
SELECT user_id, event_id, rank FROM (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id) AS rank
    FROM events
) WHERE rank <= {TOPK_PER_USER}
"""


# --------------------------------------------------------------------------
# distinct_users_per_type — exact COUNT(DISTINCT ...) via two-level groupby:
# dedup pairs (hash-partitioned) first, then count per key
# --------------------------------------------------------------------------

def distinct_users_per_type(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/events.parquet", ["event_type", "user_id"])

    def partial_pairs(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["event_type", "user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "user_id", "cnt"]).select(
            ["event_type", "user_id"]
        )

    pairs = (
        ds.map_batches(partial_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"], num_partitions=8)
        .aggregate(Sum("user_id", alias_name="_drop"))  # one row per distinct pair
        .drop_columns(["_drop"])
    )

    def partial_count(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "event_type").aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "n_users"])

    return (
        pairs.map_batches(partial_count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type", num_partitions=4)
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


SQL_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# asof_last_order — as-of join (events ⟕ latest order at or before the event,
# keyed on user). Ray Data has no as-of join primitive; the composition is
# the documented custom-operator pattern: tag + union both sides, hash-group
# by the key, pd.merge_asof inside the group. Partitioning assumption: all
# rows of one key fit one group (true for per-user event/order histories).
# Output restricted to matched events so NULL semantics stay out of the hash.
# --------------------------------------------------------------------------

def asof_last_order(sf_dir: str) -> rd.Dataset:
    events = pruned_read(f"{sf_dir}/events.parquet", ["event_id", "user_id", "ts"])
    orders = pruned_read(f"{sf_dir}/orders.parquet", ["o_custkey", "o_orderdate"])

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["user_id"], "ts": t["ts"], "event_id": t["event_id"],
            "side": pa.array(["e"] * t.num_rows, pa.string()),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["o_custkey"].cast(pa.int64()), "ts": t["o_orderdate"],
            "event_id": pa.array([-1] * t.num_rows, pa.int64()),
            "side": pa.array(["o"] * t.num_rows, pa.string()),
        })

    both = events.map_batches(tag_events, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("last_order_date", pa.timestamp("us")),
    ])

    def asof_block(block: pa.Table) -> pa.Table:
        # every row of each key is in this block (hash exchange). One
        # vectorized pass: sort (key, ts, orders-before-events-at-equal-ts),
        # forward-fill the latest order ROW INDEX (maximum.accumulate) —
        # each event row then carries max(o_orderdate <= ts), the
        # backward-inclusive as-of; an index before the key's first row
        # means "no order yet" and the event is dropped.
        if block.num_rows == 0:
            return out_schema.empty_table()
        ev_flag = pc.cast(pc.equal(block["side"], "e"), pa.int8())
        aug = block.append_column("_ev", ev_flag)
        s = aug.take(pc.sort_indices(aug, sort_keys=[
            ("key", "ascending"), ("ts", "ascending"), ("_ev", "ascending")]))
        key = s["key"].to_numpy(zero_copy_only=False)
        ts = s["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        is_event = s["_ev"].to_numpy(zero_copy_only=False).astype(bool)
        n = len(key)
        idx = np.arange(n, dtype=np.int64)
        last_o = np.maximum.accumulate(np.where(is_event, -1, idx))
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        run = np.diff(np.r_[starts, n])
        key_start = np.repeat(starts, run)
        keep = is_event & (last_o >= key_start)
        return pa.table({
            "event_id": pa.array(
                s["event_id"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "user_id": pa.array(key[keep], pa.int64()),
            "last_order_date": pa.array(ts[last_o[keep]],
                                        pa.timestamp("us")),
        })

    from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks

    return per_key_blocks(
        both, ["key"], asof_block,
        num_partitions=auto_partitions(f"{sf_dir}/events.parquet",
                                       f"{sf_dir}/orders.parquet"))


SQL_ASOF = """
SELECT event_id, user_id, last_order_date FROM (
    SELECT e.event_id, e.user_id,
           (SELECT max(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_order_date
    FROM events e
) WHERE last_order_date IS NOT NULL
"""


# --------------------------------------------------------------------------
# quantiles_qty_by_flag — exact distributed quantiles via value counting:
# the shuffle moves (key, value, count) partials (flags × ~50 distinct
# quantities), never rows; the per-key quantile is a cumulative-rank scan.
# Discrete-quantile rule pinned to DuckDB's quantile_disc: the value at
# 1-based rank ceil(n*q), computed with integer math (no float rank).
# --------------------------------------------------------------------------

def disc_quantile(vals: np.ndarray, cum: np.ndarray, num: int, den: int):
    """The engine's pinned DuckDB ``quantile_disc`` rule, shared by every
    discrete-quantile consumer: the value at 1-based rank ceil(n·q), with the
    rank computed in integer math (no float rank). ``vals`` ascending,
    ``cum`` its inclusive cumulative counts."""
    n = int(cum[-1])
    rank = -(-(n * num) // den)
    return vals[np.searchsorted(cum, rank)]


def quantiles_qty_by_flag(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/lineitem.parquet", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["l_returnflag", "l_quantity"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["l_returnflag", "l_quantity", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_quantity"], num_partitions=4)
        .aggregate(Sum("n", alias_name="n"))
    )

    out_schema = pa.schema([
        ("l_returnflag", pa.string()), ("median_qty", pa.float64()),
        ("p90_qty", pa.float64()), ("n", pa.int64()),
    ])

    def quantiles_block(block: pa.Table) -> pa.Table:
        # (flag, value, count) rows for EVERY flag of this block's hash
        # partition; the per-flag loop is bounded by distinct flags (3)
        if block.num_rows == 0:
            return out_schema.empty_table()
        s = block.take(pc.sort_indices(block, sort_keys=[
            ("l_returnflag", "ascending"), ("l_quantity", "ascending")]))
        flags = s["l_returnflag"].to_numpy(zero_copy_only=False)
        vals = s["l_quantity"].to_numpy(zero_copy_only=False)
        cnt = s["n"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, flags[1:] != flags[:-1]])
        bounds = np.r_[starts, len(flags)]
        out = {"l_returnflag": [], "median_qty": [], "p90_qty": [], "n": []}
        for i in range(len(starts)):
            v = vals[bounds[i]: bounds[i + 1]]
            cum = np.cumsum(cnt[bounds[i]: bounds[i + 1]])
            out["l_returnflag"].append(flags[starts[i]])
            out["median_qty"].append(float(disc_quantile(v, cum, 1, 2)))
            out["p90_qty"].append(float(disc_quantile(v, cum, 9, 10)))
            out["n"].append(int(cum[-1]))
        return pa.table({
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "median_qty": pa.array(out["median_qty"], pa.float64()),
            "p90_qty": pa.array(out["p90_qty"], pa.float64()),
            "n": pa.array(out["n"], pa.int64()),
        })

    from ocrautomator_ray.functions.exchange import per_key_blocks

    return per_key_blocks(counts, ["l_returnflag"], quantiles_block,
                          num_partitions=4)


SQL_QUANTILES = """
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.5) AS median_qty,
       quantile_disc(l_quantity, 0.9) AS p90_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# sliding_window_activity — overlapping (sliding) windowed aggregate
# --------------------------------------------------------------------------

WINDOW_S = 3600   # window length: 1 hour
SLIDE_S = 900     # slide: 15 min → each event belongs to 4 windows


def sliding_window_activity(sf_dir: str) -> rd.Dataset:
    """(window_start_s, n_events, n_users) for 1-hour windows sliding every
    15 minutes — the overlapping-window aggregate Ray Data has no primitive
    for. Each event row expands to its WINDOW_S/SLIDE_S covering windows
    inside map_batches (a ×4 fan-out of two int columns, not the payload),
    then ONE hash exchange on window_start co-locates each window and a
    vectorized block pass computes count + distinct users per window run.
    All arithmetic is int64 floor-division, exact for any epoch sign."""
    from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks

    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "ts"])
    n_win = WINDOW_S // SLIDE_S

    def expand(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = ts_us // (SLIDE_S * 1_000_000)  # int64 floor division
        users = t["user_id"].to_numpy(zero_copy_only=False)
        j = np.arange(n_win, dtype=np.int64)
        ws = ((base[:, None] - j[None, :]) * SLIDE_S).reshape(-1)
        return pa.table({
            "window_start_s": pa.array(ws, pa.int64()),
            "user_id": pa.array(np.repeat(users, n_win), pa.int64()),
        })

    win_schema = pa.schema([
        ("window_start_s", pa.int64()), ("n_events", pa.int64()),
        ("n_users", pa.int64()),
    ])

    def window_stats(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return win_schema.empty_table()
        ws = block["window_start_s"].to_numpy(zero_copy_only=False)
        us = block["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((us, ws))
        ws, us = ws[order], us[order]
        new_w = np.r_[True, ws[1:] != ws[:-1]]
        starts = np.flatnonzero(new_w)
        n_events = np.diff(np.r_[starts, len(ws)])
        # distinct users per window = count of first-in-(window,user) rows
        new_pair = new_w | np.r_[True, us[1:] != us[:-1]]
        n_users = np.add.reduceat(new_pair.astype(np.int64), starts)
        return pa.table({
            "window_start_s": pa.array(ws[starts], pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
            "n_users": pa.array(n_users, pa.int64()),
        })

    rows = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    return per_key_blocks(rows, ["window_start_s"], window_stats,
                          num_partitions=auto_partitions(ev_path))


SQL_SLIDING_WINDOW = f"""
WITH j AS (SELECT unnest(generate_series(0, {WINDOW_S // SLIDE_S - 1})) AS j),
x AS (
    -- FLOOR, not //: DuckDB's // truncates toward zero while the engine's
    -- int64 division floors, and they disagree for pre-1970 timestamps
    SELECT (CAST(FLOOR(epoch_us(ts) / {SLIDE_S * 1_000_000}.0) AS BIGINT)
                - j.j) * {SLIDE_S} AS window_start_s,
           user_id
    FROM events, j
)
SELECT window_start_s, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM x GROUP BY window_start_s
"""


QUERIES = {
    "union_orders_halves": union_orders_halves,
    "asof_last_order": asof_last_order,
    "quantiles_qty_by_flag": quantiles_qty_by_flag,
    "revenue_by_priority": revenue_by_priority,
    "sessionize_events": sessionize_events,
    "top_events_per_user": top_events_per_user,
    "distinct_users_per_type": distinct_users_per_type,
    "sliding_window_activity": sliding_window_activity,
}

SQL = {
    "union_orders_halves": SQL_UNION,
    "asof_last_order": SQL_ASOF,
    "quantiles_qty_by_flag": SQL_QUANTILES,
    "revenue_by_priority": SQL_JOIN_PRIORITY,
    "sessionize_events": SQL_SESSIONIZE,
    "top_events_per_user": SQL_TOPK_PER_USER,
    "distinct_users_per_type": SQL_DISTINCT_USERS,
    "sliding_window_activity": SQL_SLIDING_WINDOW,
}
