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

    def sessions_block(block: pd.DataFrame) -> pd.DataFrame:
        # all rows of each user are in this block (hash exchange); one
        # vectorized pass sessionizes every user at once
        if block.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "session_id": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
            })
        g = block.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        new_s = (new_user | gap)
        sid = new_s.groupby(g["user_id"].values).cumsum().astype(np.int64)
        out = (
            g.assign(session_id=sid)
            .groupby(["user_id", "session_id"], as_index=False)
            .agg(n_events=("event_id", "count"),
                 session_start=("ts", "min"), session_end=("ts", "max"))
        )
        return out

    return per_key_blocks(ds, ["user_id"], sessions_block,
                          batch_format="pandas",
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
    from ocrautomator_ray.functions.exchange import (arrow_clean,
                                                     auto_partitions,
                                                     per_key_blocks)

    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "event_id", "value"])

    def partial(df: pd.DataFrame):
        # batch-local top-k per user — shrinks the shuffle to k rows/user/batch
        return arrow_clean(
            df.sort_values(["value", "event_id"], ascending=[False, True])
            .groupby("user_id", as_index=False)
            .head(TOPK_PER_USER)
        )

    def topk_block(block: pd.DataFrame) -> pd.DataFrame:
        # every surviving row of each user is in this block; rank vectorized
        g = block.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True])
        rank = g.groupby("user_id").cumcount().to_numpy() + 1
        keep = rank <= TOPK_PER_USER
        return pd.DataFrame({
            "user_id": g["user_id"].values[keep],
            "event_id": g["event_id"].values[keep],
            "rank": rank[keep].astype(np.int64),
        })

    return per_key_blocks(ds.map_batches(partial, batch_format="pandas"),
                          ["user_id"], topk_block, batch_format="pandas",
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

    def asof_block(block: pd.DataFrame) -> pd.DataFrame:
        # every row of each key is in this block (hash exchange). One
        # vectorized pass: sort (key, ts, orders-before-events-at-equal-ts),
        # forward-fill the latest order date within each key — each event row
        # then carries max(o_orderdate <= ts), the backward-inclusive as-of.
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "user_id": pd.Series([], dtype=np.int64),
            "last_order_date": pd.Series([], dtype="datetime64[us]"),
        })
        if block.empty:
            return empty
        is_event = (block["side"] == "e").to_numpy()
        g = block.assign(_ev=is_event.astype(np.int8)) \
            .sort_values(["key", "ts", "_ev"], kind="stable")
        order_ts = g["ts"].where(g["_ev"].eq(0))
        last_order = order_ts.groupby(g["key"].values).ffill()
        ev = g["_ev"].eq(1) & last_order.notna()
        if not ev.any():
            return empty
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[ev.to_numpy()].astype(np.int64),
            "user_id": g["key"].to_numpy()[ev.to_numpy()].astype(np.int64),
            "last_order_date": last_order.to_numpy()[ev.to_numpy()],
        })

    from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks

    return per_key_blocks(
        both, ["key"], asof_block, batch_format="pandas",
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

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("l_quantity")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        vals = g["l_quantity"].to_numpy()

        def disc(num: int, den: int) -> float:
            return float(disc_quantile(vals, cum, num, den))

        return pd.DataFrame({
            "l_returnflag": [g["l_returnflag"].iloc[0]],
            "median_qty": [disc(1, 2)],
            "p90_qty": [disc(9, 10)],
            "n": np.array([n], dtype=np.int64),
        })

    return counts.groupby("l_returnflag", num_partitions=4).map_groups(quantiles, batch_format="pandas")


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

    def window_stats(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({
                "window_start_s": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
            })
        g = block.groupby("window_start_s")["user_id"]
        out = g.agg(n_events="count", n_users="nunique").reset_index()
        return out.astype({"window_start_s": np.int64, "n_events": np.int64,
                           "n_users": np.int64})

    rows = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    return per_key_blocks(rows, ["window_start_s"], window_stats,
                          batch_format="pandas",
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
