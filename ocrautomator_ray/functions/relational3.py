"""Third batch of relational operators: interval (range) self-join, running
cumulative window, semi-structured JSON extraction — all SQL-oracled.

Same determinism conventions as functions/relational.py: money/value doubles
are integerized per row (``FLOOR(x*scale + 0.5) AS BIGINT``) BEFORE any sum so
distributed partial sums are bit-exact regardless of combine order; aggregate
column names match the oracle SQL aliases exactly.

``followers_within_window`` is the range-join custom operator Ray Data has no
primitive for (SURVEY.md §2 J2 extension): an equi-key on ``user_id`` plus an
interval predicate on ``ts``. The composition is ONE hash exchange on the
equi-key (``per_key_blocks``), then a fully vectorized per-block interval
count via rank-combined ``np.searchsorted`` — no per-key Python loop and no
key×key pair expansion, so a hot user costs O(n log n) in its block, not
O(n²). Partitioning assumption (documented per the custom-operator contract):
all rows of one ``user_id`` fit one exchange block — the same per-user-history
bound the as-of join relies on; billion-event users would need a secondary
time-bucket split of the window arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from ocrautomator_ray.functions.exchange import (auto_partitions,
                                                    per_key_blocks,
                                                    pruned_read,
                                                    stripped_read)

# --------------------------------------------------------------------------
# followers_within_window — interval self-join: for each 'click' event, count
# and value-sum the same user's OTHER events in [ts, ts + 6h). Anchors with
# zero followers are dropped (inner-join semantics, keeps NULLs out of the
# driver hash).
# --------------------------------------------------------------------------

ANCHOR_TYPE = "click"
FOLLOW_WINDOW_US = 6 * 3600 * 1_000_000  # 6 hours


def followers_within_window(sf_dir: str) -> rd.Dataset:
    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["event_id", "user_id", "ts", "value", "event_type"])

    def window_block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "n_follow": pa.array([], pa.int64()),
            "sum_value_micros": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        vint = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        is_anchor = pc.equal(t["event_type"], ANCHOR_TYPE).to_numpy(
            zero_copy_only=False
        )

        order = np.lexsort((eid, ts, user))
        user, ts, eid, vint, is_anchor = (
            user[order], ts[order], eid[order], vint[order], is_anchor[order]
        )

        # Rank-combined key: (user_rank, ts_rank) folded into one int64 so a
        # single searchsorted resolves the per-user interval bounds for every
        # anchor at once. Ranks (not raw values) keep the fold overflow-free:
        # both factors are bounded by the block's row count.
        uniq_users = np.unique(user)
        uniq_ts = np.unique(ts)
        shift = np.int64(len(uniq_ts) + 1)
        urank = np.searchsorted(uniq_users, user)
        combined = urank * shift + np.searchsorted(uniq_ts, ts)

        a_urank = urank[is_anchor]
        a_ts = ts[is_anchor]
        lo = np.searchsorted(
            combined, a_urank * shift + np.searchsorted(uniq_ts, a_ts, "left")
        )
        hi = np.searchsorted(
            combined,
            a_urank * shift
            + np.searchsorted(uniq_ts, a_ts + FOLLOW_WINDOW_US, "left"),
        )

        csum = np.concatenate(([0], np.cumsum(vint)))
        n_follow = (hi - lo) - 1  # own row always lies in [ts, ts+W)
        sums = (csum[hi] - csum[lo]) - vint[is_anchor]
        keep = n_follow > 0
        return pa.table({
            "event_id": pa.array(eid[is_anchor][keep], pa.int64()),
            "n_follow": pa.array(n_follow[keep], pa.int64()),
            "sum_value_micros": pa.array(sums[keep], pa.int64()),
        })

    return per_key_blocks(ds, ["user_id"], window_block,
                          num_partitions=auto_partitions(ev_path))


SQL_FOLLOWERS = f"""
SELECT a.event_id,
       COUNT(*) AS n_follow,
       CAST(SUM(CAST(FLOOR(b.value*1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_micros
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND b.ts >= a.ts
 AND b.ts < a.ts + INTERVAL 6 HOUR
 AND b.event_id <> a.event_id
WHERE a.event_type = '{ANCHOR_TYPE}'
GROUP BY a.event_id
"""


# --------------------------------------------------------------------------
# cumulative_user_value — running total per user ordered by (ts, event_id):
# the classic SUM(...) OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
# PRECEDING) window. One hash exchange, then a vectorized grouped cumsum.
# --------------------------------------------------------------------------

def cumulative_user_value(sf_dir: str) -> rd.Dataset:
    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["event_id", "user_id", "ts", "value"])

    cum_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("cum_value_micros", pa.int64()),
    ])

    def cum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return cum_schema.empty_table()
        s = block.take(pc.sort_indices(block, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        vint = np.floor(s["value"].to_numpy(zero_copy_only=False) * 1e6
                        + 0.5).astype(np.int64)
        # grouped cumsum = global cumsum rebased at each user's first row
        cs = np.cumsum(vint)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run = np.diff(np.r_[starts, len(u)])
        base = np.repeat(cs[starts] - vint[starts], run)
        return pa.table({
            "event_id": s["event_id"],
            "user_id": s["user_id"],
            "cum_value_micros": pa.array(cs - base, pa.int64()),
        })

    return per_key_blocks(ds, ["user_id"], cum_block,
                          num_partitions=auto_partitions(ev_path))


SQL_CUMULATIVE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_micros
FROM events
"""


# --------------------------------------------------------------------------
# props_value_stats — semi-structured extraction: pull the integer field "k"
# out of the JSON ``props`` column (RE2 extract per batch — both engines run
# the identical regex, and the field is machine-generated flat JSON, so the
# regex is exact), then a partial+final aggregate per event_type.
# --------------------------------------------------------------------------

_PROPS_K_RE = r'"k":\s*(?P<k>-?\d+)'


def props_value_stats(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/events.parquet", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.struct_field(pc.extract_regex(t["props"], _PROPS_K_RE), "k"),
            pa.int64(),
        )
        tt = pa.table({"event_type": t["event_type"], "k": k})
        g = pa.TableGroupBy(tt, "event_type").aggregate(
            [("k", "sum"), ("k", "min"), ("k", "max"), ([], "count_all")]
        )
        return g.rename_columns(["event_type", "sum_k", "min_k", "max_k", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type", num_partitions=4)
        .aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
            Sum("n", alias_name="n"),
        )
    )


SQL_PROPS_STATS = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# user_event_sequences — ordered behavior-sequence extraction: per user, the
# comma-joined event-type string in (ts, event_id) order. The string-agg /
# collect_list(ORDER BY ...) shape used to build session-sequence training
# data. One hash exchange; join is a per-user pandas agg inside the block.
# --------------------------------------------------------------------------

def user_event_sequences(sf_dir: str) -> rd.Dataset:
    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "ts", "event_id",
                                           "event_type"])

    seq_schema = pa.schema([
        ("user_id", pa.int64()), ("n_events", pa.int64()),
        ("seq", pa.string()),
    ])

    def seq_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return seq_schema.empty_table()
        s = block.take(pc.sort_indices(block, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        offsets = pa.array(np.r_[starts, len(u)], pa.int32())
        types = s["event_type"].combine_chunks() \
            if isinstance(s["event_type"], pa.ChunkedArray) \
            else s["event_type"]
        # per-user ordered join, fully in Arrow: list-wrap the sorted types
        # at user boundaries, then binary_join
        seqs = pc.binary_join(pa.ListArray.from_arrays(offsets, types), ",")
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "n_events": pa.array(np.diff(np.r_[starts, len(u)]), pa.int64()),
            "seq": seqs,
        })

    return per_key_blocks(ds, ["user_id"], seq_block,
                          num_partitions=auto_partitions(ev_path))


SQL_EVENT_SEQUENCES = """
SELECT user_id, COUNT(*) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# event_gaps — lag window: microseconds since the user's previous event
# (first event per user dropped: inner semantics keep NULLs out of the hash).
# --------------------------------------------------------------------------

def event_gaps(sf_dir: str) -> rd.Dataset:
    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["event_id", "user_id", "ts"])

    gaps_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("gap_us", pa.int64()),
    ])

    def gaps_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return gaps_schema.empty_table()
        s = block.take(pc.sort_indices(block, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        ts_us = s["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = np.r_[False, u[1:] == u[:-1]]
        gap = np.diff(ts_us)
        return pa.table({
            "event_id": pa.array(
                s["event_id"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "user_id": pa.array(u[keep], pa.int64()),
            "gap_us": pa.array(gap[keep[1:]], pa.int64()),
        })

    return per_key_blocks(ds, ["user_id"], gaps_block,
                          num_partitions=auto_partitions(ev_path))


SQL_EVENT_GAPS = """
SELECT event_id, user_id, gap_us FROM (
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
) WHERE gap_us IS NOT NULL
"""


# --------------------------------------------------------------------------
# user_event_pivot — wide-format pivot: one row per user, one count column
# per (fixed, enumerable) event type. Partial crosstab per batch, then a
# columnwise Sum finalize — the shuffle moves one row per user per batch.
# --------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_event_pivot(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/events.parquet", ["user_id", "event_type"])

    types_sorted = np.array(sorted(EVENT_TYPES))
    pivot_schema = pa.schema([("user_id", pa.int64())]
                             + [(f"n_{c}", pa.int64()) for c in EVENT_TYPES])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pivot_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u = u[order]
        tcode = np.searchsorted(types_sorted, et[order])
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run = np.diff(np.r_[starts, len(u)])
        row = np.repeat(np.arange(len(starts)), run)
        counts = np.zeros((len(starts), len(types_sorted)), np.int64)
        np.add.at(counts, (row, tcode), 1)
        cols = {"user_id": pa.array(u[starts], pa.int64())}
        for c in EVENT_TYPES:
            j = int(np.searchsorted(types_sorted, c))
            cols[f"n_{c}"] = pa.array(counts[:, j], pa.int64())
        return pa.table(cols)

    aggs = [Sum(f"n_{c}", alias_name=f"n_{c}") for c in EVENT_TYPES]
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*aggs)
    )


SQL_EVENT_PIVOT = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click')    AS n_click,
       COUNT(*) FILTER (event_type = 'error')    AS n_error,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# revenue_rollup — GROUPING SETS ((status, priority), (status), ()) computed
# by re-aggregating the (small) finest-level result: the raw table is read
# and shuffled exactly ONCE; the coarser levels reduce the already-aggregated
# partials. 'ALL' stands in for the rolled-up dimension (no NULLs in the
# driver hash).
# --------------------------------------------------------------------------

def revenue_rollup(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/orders.parquet", ["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        )
        tt = pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "total_cents": cents,
        })
        g = pa.TableGroupBy(tt, ["o_orderstatus", "o_orderpriority"]).aggregate(
            [("total_cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["o_orderstatus", "o_orderpriority", "total_cents", "n"]
        )

    base = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderstatus", "o_orderpriority"], num_partitions=4)
        .aggregate(Sum("total_cents", alias_name="total_cents"),
                   Sum("n", alias_name="n"))
    )

    def roll_priority(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["o_orderstatus", "total_cents", "n"]), "o_orderstatus"
        ).aggregate([("total_cents", "sum"), ("n", "sum")])
        g = g.rename_columns(["o_orderstatus", "total_cents", "n"])
        return g.add_column(
            1, "o_orderpriority", pa.array(["ALL"] * g.num_rows, pa.string())
        )

    def roll_all(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": pa.array(["ALL"], pa.string()),
            "o_orderpriority": pa.array(["ALL"], pa.string()),
            "total_cents": pa.array(
                [pc.sum(t["total_cents"]).as_py() or 0], pa.int64()),
            "n": pa.array([pc.sum(t["n"]).as_py() or 0], pa.int64()),
        })

    # base is dimension-cardinality-sized; repartition(1) makes each coarser
    # level a single exact pass over the full partial set.
    small = base.repartition(1)
    lvl1 = small.map_batches(roll_priority, batch_format="pyarrow",
                             batch_size=None)
    lvl0 = small.map_batches(roll_all, batch_format="pyarrow", batch_size=None)
    return base.union(lvl1, lvl0)


SQL_ROLLUP = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# --------------------------------------------------------------------------
# rolling_value_sum — bounded window frame: per event, the integerized value
# summed over the user's last ROLL_N events (ROWS BETWEEN n-1 PRECEDING AND
# CURRENT ROW). Grouped cumsum minus its shift-by-n — exact int math, no
# float rolling kernel.
# --------------------------------------------------------------------------

ROLL_N = 3


def rolling_value_sum(sf_dir: str) -> rd.Dataset:
    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["event_id", "user_id", "ts",
                                           "value"])

    roll_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("roll_value_micros", pa.int64()),
    ])

    def roll_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return roll_schema.empty_table()
        s = block.take(pc.sort_indices(block, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        vint = np.floor(s["value"].to_numpy(zero_copy_only=False) * 1e6
                        + 0.5).astype(np.int64)
        # all-int64 end to end — a NaN round-trip through float64 would
        # quietly lose exactness past 2^53
        n = len(u)
        cs = np.cumsum(vint)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run = np.diff(np.r_[starts, n])
        group_base = np.repeat(cs[starts] - vint[starts], run)
        cum = cs - group_base                       # grouped running sum
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, run)
        lag = np.zeros(n, np.int64)
        far = pos >= ROLL_N                         # ROWS n-1 PRECEDING frame
        lag[far] = cum[np.flatnonzero(far) - ROLL_N]
        return pa.table({
            "event_id": s["event_id"],
            "user_id": s["user_id"],
            "roll_value_micros": pa.array(cum - lag, pa.int64()),
        })

    return per_key_blocks(ds, ["user_id"], roll_block,
                          num_partitions=auto_partitions(ev_path))


SQL_ROLLING = f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {ROLL_N - 1} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS roll_value_micros
FROM events
"""


# --------------------------------------------------------------------------
# customer_order_counts — LEFT OUTER join coverage: every customer with its
# order count, zero included. The fact side pre-aggregates to one row per
# customer key BEFORE the join (partial+final), so the outer join matches
# dimension rows against counts, never raw orders.
# --------------------------------------------------------------------------

def customer_order_counts(sf_dir: str) -> rd.Dataset:
    from ocrautomator_ray.functions.exchange import tune_exchange

    cust_path = f"{sf_dir}/customer.parquet"
    orders_path = f"{sf_dir}/orders.parquet"
    from ocrautomator_ray.functions.exchange import read_blocks

    cust = stripped_read(cust_path, columns=["c_custkey"],
                         override_num_blocks=read_blocks(cust_path))
    orders = stripped_read(orders_path, columns=["o_custkey"],
                           override_num_blocks=read_blocks(orders_path))

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "o_custkey").aggregate([([], "count_all")])
        return g.rename_columns(["o_custkey", "n_orders"])

    def final_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        g = pa.TableGroupBy(t, "o_custkey").aggregate([("n_orders", "sum")])
        return g.rename_columns(["o_custkey", "n_orders"])

    n_parts = auto_partitions(cust_path, orders_path)
    tune_exchange(orders, n_parts)
    # the join executes under the LEFT side's context — tune cust too, or
    # agg's repartition lineage runs under the untuned SORT strategy
    tune_exchange(cust, n_parts)
    # hash exchange + Arrow block sum instead of groupby().aggregate() —
    # Ray's HashAggregate costs ~0.5 s of update machinery per shard task
    agg = per_key_blocks(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], final_sum, num_partitions=n_parts)
    joined = cust.join(agg, join_type="left_outer",
                       num_partitions=n_parts,
                       on=("c_custkey",), right_on=("o_custkey",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"].cast(pa.int64()),
            "n_orders": pc.fill_null(t["n_orders"], 0).cast(pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       COUNT(o_custkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


# --------------------------------------------------------------------------
# event_transitions — Markov transition-count matrix over consecutive event
# types per user (sequence-model prep / funnel diagnostics). One hash
# exchange on user_id; each block lexsorts its users' histories, takes
# adjacent same-user pairs, and reduces them to at most T² partial rows
# (T = distinct event types) before the final tiny groupby — the second
# exchange moves type-pair counts, never events.
# --------------------------------------------------------------------------

def event_transitions(sf_dir: str) -> rd.Dataset:
    """(from_type, to_type, n): how often ``to_type`` immediately follows
    ``from_type`` within one user's (ts, event_id)-ordered history."""
    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "ts", "event_id", "event_type"])
    out_schema = pa.schema([("from_type", pa.string()),
                            ("to_type", pa.string()), ("n", pa.int64())])

    def pairs_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        g = block.take(pc.sort_indices(block, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        et = g["event_type"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        keep = uid[1:] == uid[:-1]
        if not keep.any():
            return out_schema.empty_table()
        # factorize once, count pairs as a T×T bincount — no pair strings
        types, codes = np.unique(et, return_inverse=True)
        t = len(types)
        pair = codes[:-1][keep] * t + codes[1:][keep]
        counts = np.bincount(pair, minlength=t * t)
        nz = np.nonzero(counts)[0]
        return pa.table({
            "from_type": pa.array(types[nz // t], pa.string()),
            "to_type": pa.array(types[nz % t], pa.string()),
            "n": pa.array(counts[nz], pa.int64()),
        })

    partials = per_key_blocks(ds, ["user_id"], pairs_block,
                              num_partitions=auto_partitions(ev_path))
    return (partials.groupby(["from_type", "to_type"], num_partitions=4)
                    .aggregate(Sum("n", alias_name="n")))


SQL_EVENT_TRANSITIONS = """
SELECT from_type, to_type, COUNT(*) AS n FROM (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
) WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


QUERIES = {
    "followers_within_window": followers_within_window,
    "event_transitions": event_transitions,
    "cumulative_user_value": cumulative_user_value,
    "props_value_stats": props_value_stats,
    "user_event_sequences": user_event_sequences,
    "event_gaps": event_gaps,
    "user_event_pivot": user_event_pivot,
    "revenue_rollup": revenue_rollup,
    "rolling_value_sum": rolling_value_sum,
    "customer_order_counts": customer_order_counts,
}

SQL = {
    "followers_within_window": SQL_FOLLOWERS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "cumulative_user_value": SQL_CUMULATIVE,
    "props_value_stats": SQL_PROPS_STATS,
    "user_event_sequences": SQL_EVENT_SEQUENCES,
    "event_gaps": SQL_EVENT_GAPS,
    "user_event_pivot": SQL_EVENT_PIVOT,
    "revenue_rollup": SQL_ROLLUP,
    "rolling_value_sum": SQL_ROLLING,
    "customer_order_counts": SQL_CUSTOMER_ORDER_COUNTS,
}


# ---------------------------------------------------------------------------
# latest_event_state — CDC upsert compaction: the newest event per
# (user_id, event_type) key, i.e. the materialized "current state" table a
# changelog stream compacts to. The keep-LAST mirror of dedup_first_docs'
# keep-first, with the standard two-level shape: each batch pre-prunes to
# its own newest row per key (lossless — the global newest is one of the
# per-batch newest), so the one key-keyed exchange moves at most
# keys × batches rows, never the event stream.
# ---------------------------------------------------------------------------

_LATEST_SCHEMA_COLS = ["user_id", "event_type", "ts", "event_id", "value"]


def latest_event_state(sf_dir: str) -> rd.Dataset:
    """(user_id, event_type, ts, event_id, value) of each key's newest
    event — newest by (ts, event_id) so ties are deterministic."""
    path = f"{sf_dir}/events.parquet"
    ds = pruned_read(path, _LATEST_SCHEMA_COLS)

    def keep_latest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        # ascending (uid, et, ts, eid): a key's LAST run element is newest
        order = np.lexsort((eid, ts, et, uid))
        uid_s, et_s = uid[order], et[order]
        last = np.r_[(uid_s[1:] != uid_s[:-1]) | (et_s[1:] != et_s[:-1]),
                     True]
        keep = np.sort(order[last])
        return t.take(pa.array(keep))

    pruned = ds.map_batches(keep_latest, batch_format="pyarrow",
                            zero_copy_batch=True)
    return per_key_blocks(pruned, ["user_id", "event_type"], keep_latest,
                          num_partitions=auto_partitions(path))


SQL_LATEST_EVENT_STATE = """
SELECT user_id, event_type, ts, event_id, value FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


QUERIES["latest_event_state"] = latest_event_state
SQL["latest_event_state"] = SQL_LATEST_EVENT_STATE


# ---------------------------------------------------------------------------
# user_behavior_vectors — feature engineering on the event stream: each
# user's signed hashed counts of ADJACENT event-type bigrams (the hashing
# trick applied to behavior sequences; event_transitions aggregates the
# same pairs corpus-wide, this keeps them per user as a fixed-width integer
# vector ready for kmeans_fit / cosine / LSH). ONE user-keyed exchange —
# blocks hold whole users, so the vector is FINAL in-block; nothing but
# (user_id, 8 ints) leaves the exchange.
# ---------------------------------------------------------------------------

BEHAVIOR_DIM = 8
_BEHAVIOR_COLS = [f"b_{j}" for j in range(BEHAVIOR_DIM)]
_BEHAVIOR_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("n_bigrams", pa.int64())]
    + [(c, pa.int64()) for c in _BEHAVIOR_COLS])


def user_behavior_vectors(sf_dir: str) -> rd.Dataset:
    """(user_id, n_bigrams, b_0..b_7): signed hashed counts of the user's
    adjacent event-type bigrams in (ts, event_id) order (users with <2
    events emit no row, matching the oracle's inner grouping)."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings
    from ocrautomator_ray.functions.mix import _HASH_SIGN_SHIFT

    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "ts", "event_id", "event_type"])

    def vec_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _BEHAVIOR_SCHEMA.empty_table()
        g = block.take(pc.sort_indices(block, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        keep = uid[1:] == uid[:-1]
        if not keep.any():
            return _BEHAVIOR_SCHEMA.empty_table()
        pair_uid = uid[:-1][keep].astype(np.int64)
        grams = pa.array(np.char.add(np.char.add(
            et[:-1][keep].astype(str), " "), et[1:][keep].astype(str)))
        h = _fnv1a_strings(grams)
        bucket = (h % np.uint64(BEHAVIOR_DIM)).astype(np.int64)
        sign = np.where(
            (h >> np.uint64(_HASH_SIGN_SHIFT)) & np.uint64(1) == 1,
            -1, 1).astype(np.int64)
        uids, inv = np.unique(pair_uid, return_inverse=True)
        out = np.zeros((len(uids), BEHAVIOR_DIM), np.int64)
        np.add.at(out, (inv, bucket), sign)
        res = {"user_id": pa.array(uids, pa.int64()),
               "n_bigrams": pa.array(
                   np.bincount(inv).astype(np.int64), pa.int64())}
        for j, c in enumerate(_BEHAVIOR_COLS):
            res[c] = pa.array(out[:, j], pa.int64())
        return pa.table(res)

    return per_key_blocks(ds, ["user_id"], vec_block,
                          num_partitions=auto_partitions(ev_path))


def _sql_behavior_vectors() -> str:
    from ocrautomator_ray.functions.dedup import _sql_fnv1a
    from ocrautomator_ray.functions.mix import _HASH_SIGN_SHIFT

    vcols = ",\n       ".join(
        f"CAST(COALESCE(SUM(CASE WHEN b = {j} THEN sgn ELSE 0 END), 0) "
        f"AS BIGINT) AS b_{j}" for j in range(BEHAVIOR_DIM))
    return f"""
WITH pairs AS (
    SELECT user_id, event_type || ' ' || nxt AS gram FROM (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events)
    WHERE nxt IS NOT NULL
),
hg AS (
    SELECT gram, {_sql_fnv1a('gram')} AS h
    FROM (SELECT DISTINCT gram FROM pairs)
),
hb AS (
    SELECT gram, CAST(h % {BEHAVIOR_DIM} AS BIGINT) AS b,
           CASE WHEN (h // {1 << _HASH_SIGN_SHIFT}) % 2 = 1
                THEN -1 ELSE 1 END AS sgn
    FROM hg
)
SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       {vcols}
FROM pairs p JOIN hb USING (gram)
GROUP BY p.user_id
"""


SQL_USER_BEHAVIOR = _sql_behavior_vectors()


QUERIES["user_behavior_vectors"] = user_behavior_vectors
SQL["user_behavior_vectors"] = SQL_USER_BEHAVIOR


# ---------------------------------------------------------------------------
# daily_active_users — DAU + trailing-7-day WAU: the sliding DISTINCT-count
# analytics shape (sliding_window_activity slides sums; distinct users
# cannot pre-aggregate the same way). Three bounded stages:
#   1. per-batch DISTINCT (user, day) partials → one (user, day)-keyed
#      exchange dedups globally (the D2+ INTERSECT discipline: the shuffle
#      moves keys, never events),
#   2. DAU = per-day counts of the distinct pairs (tiny aggregate),
#   3. WAU: each distinct pair fans out to the ≤7 OBSERVED window-end days
#      it supports (the in-map window fan-out of sliding_window_activity,
#      filtered against the broadcast O(days) day set), a second
#      (user, wday)-keyed dedup exchange, and a per-day count.
# ---------------------------------------------------------------------------

_DAU_SCHEMA = pa.schema([
    ("day", pa.int64()), ("dau", pa.int64()), ("wau", pa.int64()),
])
WAU_WINDOW = 7


def daily_active_users(sf_dir: str) -> rd.Dataset:
    """(day, dau, wau): distinct users active that day, and in the trailing
    {WAU_WINDOW}-day window ending that day — for every observed day; day
    is int64 days-since-epoch (the retention_cohorts convention)."""
    from ray.data.aggregate import Sum

    ev_path = f"{sf_dir}/events.parquet"
    base = pruned_read(ev_path, ["user_id", "ts"])
    pair_schema = pa.schema([("user_id", pa.int64()), ("day", pa.int32())])

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[D]").astype(np.int32))
        pairs = np.unique(np.stack([uid, day.astype(np.int64)], 1), axis=0)
        return pa.table({"user_id": pa.array(pairs[:, 0], pa.int64()),
                         "day": pa.array(pairs[:, 1].astype(np.int32),
                                         pa.int32())})

    def dedup_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pair_schema.empty_table()
        uid = block["user_id"].to_numpy(zero_copy_only=False)
        day = block["day"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([uid, day.astype(np.int64)], 1), axis=0)
        return pa.table({"user_id": pa.array(pairs[:, 0], pa.int64()),
                         "day": pa.array(pairs[:, 1].astype(np.int32),
                                         pa.int32())})

    pairs = per_key_blocks(
        base.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["user_id", "day"], dedup_block,
        num_partitions=auto_partitions(ev_path)).materialize()

    days = np.sort(np.unique(
        pairs.select_columns(["day"]).to_pandas()["day"].to_numpy()
    ).astype(np.int64))                         # O(observed days) driver set

    cnt_schema = pa.schema([("day", pa.int32()), ("n", pa.int64())])

    def day_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        day = t["day"].to_numpy(zero_copy_only=False)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int32()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    dau = (pairs.map_batches(day_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("day", num_partitions=2)
           .aggregate(Sum("n", alias_name="dau")).to_pandas())

    def fan_out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        wd = (day[:, None] + np.arange(WAU_WINDOW)[None, :]).ravel()
        wu = np.repeat(uid, WAU_WINDOW)
        pos = np.searchsorted(days, wd)
        safe = np.minimum(pos, len(days) - 1)
        keep = days[safe] == wd                 # observed days only
        return pa.table({"user_id": pa.array(wu[keep], pa.int64()),
                         "day": pa.array(wd[keep].astype(np.int32),
                                         pa.int32())})

    wpairs = per_key_blocks(
        pairs.map_batches(fan_out, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["user_id", "day"], dedup_block,
        num_partitions=auto_partitions(ev_path))
    wau = (wpairs.map_batches(day_counts, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("day", num_partitions=2)
           .aggregate(Sum("n", alias_name="wau")).to_pandas())

    dau = dau.set_index("day")["dau"]
    wau = wau.set_index("day")["wau"]
    return rd.from_arrow(pa.table({
        "day": pa.array(days, pa.int64()),
        "dau": pa.array([int(dau[d]) for d in days], pa.int64()),
        "wau": pa.array([int(wau[d]) for d in days], pa.int64()),
    }))


SQL_DAILY_ACTIVE_USERS = f"""
WITH pairs AS (
    -- int64 days-since-epoch (FLOOR before the cast: epoch() is a DOUBLE
    -- with fractional seconds and CAST rounds half-away)
    SELECT DISTINCT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
    FROM events
),
days AS (SELECT DISTINCT day FROM pairs)
SELECT d.day, 
       (SELECT COUNT(*) FROM pairs p WHERE p.day = d.day) AS dau,
       (SELECT COUNT(DISTINCT p.user_id) FROM pairs p
         WHERE p.day BETWEEN d.day - {WAU_WINDOW - 1} AND d.day) AS wau
FROM days d
"""


QUERIES["daily_active_users"] = daily_active_users
SQL["daily_active_users"] = SQL_DAILY_ACTIVE_USERS
