"""Generic relational operators over the driver's parquet tables
(SURVEY.md §2.5-§2.7, §5.5) — each with a DuckDB-equivalent SQL oracle.

Conventions that make the driver's value-hash comparison deterministic:

- money/double aggregates are integerized **before** summation
  (``FLOOR(x*scale + 0.5)`` → int64) so the sum is exact regardless of
  distributed summation order — float sums are order-dependent, integer sums
  are not;
- every computed column is named identically in the Ray plan and the SQL
  (``AS`` aliases match aggregate ``alias_name``);
- top-k queries carry a total tie-break key so the selected *set* is
  deterministic;
- aggregations pre-reduce inside ``map_batches`` (partial/combiner) before
  the ``groupby`` so the all-to-all shuffle moves one row per key per batch,
  not the raw table — the pattern that matters at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read, stripped_read
from ray.data.aggregate import Count, Min, Sum


def _cents(x, scale: int = 100):
    """Order-independent integerization: floor(x*scale + 0.5) as int64.

    Same expression is used verbatim in the SQL oracles; floor(x+0.5) rounds
    half-up in both numpy and DuckDB (np.round/duckdb ROUND differ on ties).
    """
    return pc.cast(pc.floor(pc.add(pc.multiply(x, float(scale)), 0.5)), pa.int64())


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1-shaped grouped aggregate with partial pre-agg
# --------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    ds = stripped_read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pa.scalar(pd.Timestamp("1998-09-02"))),
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("qty_int", _cents(t["l_quantity"], 1))
        t = t.append_column("sum_base_cents", _cents(t["l_extendedprice"]))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        t = t.append_column("sum_disc_cents4", _cents(disc, 10_000))
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_int", "sum"), ("sum_base_cents", "sum"),
             ("sum_disc_cents4", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
             "sum_disc_cents4", "count_order"]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=4)
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents4", alias_name="sum_disc_cents4"),
            Sum("count_order", alias_name="count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents4,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# filter_project — predicate pushdown + column pruning at the read
# --------------------------------------------------------------------------

def filter_project(sf_dir: str) -> rd.Dataset:
    return stripped_read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                 "l_shipdate", "l_discount"],
        filter=(
            (pc.field("l_shipdate") > pa.scalar(pd.Timestamp("1997-01-01")))
            & (pc.field("l_discount") > pa.scalar(0.05))
        ),
    ).select_columns(["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"])


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate > TIMESTAMP '1997-01-01' AND l_discount > 0.05
"""


# --------------------------------------------------------------------------
# first_event_per_user — grouped ordering (O1-shape): per-key first by (ts, id)
# --------------------------------------------------------------------------

def first_event_per_user(sf_dir: str) -> rd.Dataset:
    from ocrautomator_ray.functions.exchange import (auto_partitions,
                                                     per_key_blocks)

    ev_path = f"{sf_dir}/events.parquet"
    ds = pruned_read(ev_path, ["user_id", "ts", "event_id", "event_type"])

    _keys = [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]

    def _first_per_user(t: pa.Table) -> pa.Table:
        s = t.take(pc.sort_indices(t, sort_keys=_keys))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        first = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
            if len(u) else np.empty(0, np.int64)
        return s.take(pa.array(first, pa.int64()))

    def partial(t: pa.Table) -> pa.Table:
        # per-batch pre-reduce: keep each user's first row; shrinks the
        # shuffle
        return _first_per_user(t)

    def first_rows(block: pa.Table) -> pa.Table:
        # block holds every surviving row of each of its users (hash exchange)
        g = _first_per_user(block)
        return pa.table({"user_id": g["user_id"], "first_ts": g["ts"],
                         "first_type": g["event_type"]})

    return per_key_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], first_rows,
        num_partitions=auto_partitions(ev_path))


SQL_FIRST_EVENT = """
SELECT user_id,
       first(ts ORDER BY ts, event_id) AS first_ts,
       first(event_type ORDER BY ts, event_id) AS first_type
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# dedup_first_docs — exact dedup, keep min doc_id per identical text (D1)
# --------------------------------------------------------------------------

def dedup_first_docs(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "text").aggregate([("doc_id", "min")])
        return g.rename_columns(["text", "doc_id"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


SQL_DEDUP_FIRST = "SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text"


# --------------------------------------------------------------------------
# customers_without_orders — broadcast anti-join (J1-shape)
# --------------------------------------------------------------------------

def customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Customers with no orders in/after 1998-07 (anti-join vs a filtered set —
    the driver data's FK coverage is dense, so the unfiltered variant is
    degenerate/empty)."""
    import ray

    custkeys = stripped_read(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pa.scalar(pd.Timestamp("1998-07-01"))),
    ).unique("o_custkey")
    # Broadcast the key set once (ray.put); tasks read it zero-copy locally.
    keys_ref = ray.put(np.asarray(sorted(custkeys), dtype=np.int64))

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = ~np.isin(t["c_custkey"].to_numpy(zero_copy_only=False), keys)
        return t.filter(pa.array(mask))

    return (
        pruned_read(f"{sf_dir}/customer.parquet", ["c_custkey", "c_name"])
        .map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01'
)
"""


# --------------------------------------------------------------------------
# revenue_by_nation — broadcast dimension join + partial agg (J2-shape)
# --------------------------------------------------------------------------

def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    import ray

    cust = pruned_read(f"{sf_dir}/customer.parquet",
                       ["c_custkey", "c_nationkey"]).to_pandas()
    nation = pruned_read(f"{sf_dir}/nation.parquet",
                         ["n_nationkey", "n_name"]).to_pandas()
    cust2nation = cust.merge(nation, left_on="c_nationkey",
                             right_on="n_nationkey")
    # broadcast as a sorted (keys, names) pair: searchsorted lookup inside
    # the batch fn, no per-row dict probes
    order = np.argsort(cust2nation["c_custkey"].to_numpy())
    lookup_ref = ray.put((
        cust2nation["c_custkey"].to_numpy()[order],
        cust2nation["n_name"].to_numpy()[order]))

    def partial(t: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        n_name = names[np.searchsorted(keys, ck)]
        cents = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "n_name": pa.array(n_name, pa.string()),
            "revenue_cents": pa.array(cents, pa.int64()),
        }), "n_name").aggregate([("revenue_cents", "sum"), ([], "count_all")])
        return pa.table({"n_name": g["n_name"],
                         "revenue_cents": g["revenue_cents_sum"],
                         "num_orders": g["count_all"].cast(pa.int64())})

    return (
        pruned_read(f"{sf_dir}/orders.parquet",
                    ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name", num_partitions=4)
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("num_orders", alias_name="num_orders"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS num_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# top_orders — global sort + limit with total tie-break
# --------------------------------------------------------------------------

def top_orders(sf_dir: str) -> rd.Dataset:
    return (
        pruned_read(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(20)
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# --------------------------------------------------------------------------
# event_type_counts — grouped count + integerized double sum
# --------------------------------------------------------------------------

def event_type_counts(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/events.parquet", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("sum_value_u", _cents(t["value"], 1_000_000))
        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("sum_value_u", "sum"), ("value", "count")]
        )
        return g.rename_columns(["event_type", "sum_value_u", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type", num_partitions=4)
        .aggregate(Sum("sum_value_u", alias_name="sum_value_u"),
                   Sum("n", alias_name="n"))
    )


SQL_EVENT_TYPE_COUNTS = """
SELECT event_type,
       CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_u,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# hourly_user_activity — tumbling-window aggregate (streaming-shaped, §2.9)
# --------------------------------------------------------------------------

def hourly_user_activity(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/events.parquet", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        # Floor division (SQL FLOOR semantics), not pc.divide's truncation —
        # they differ for pre-1970 (negative-epoch) timestamps: adjust the
        # truncated quotient down by 1 wherever a negative value had a remainder.
        d = 3_600_000_000  # µs per hour
        q = pc.divide(us, d)
        inexact_neg = pc.and_(pc.less(us, 0), pc.not_equal(pc.multiply(q, d), us))
        bucket = pc.subtract(q, pc.cast(inexact_neg, pa.int64()))
        t = t.append_column("hour_bucket", bucket).drop_columns(["ts"])
        g = pa.TableGroupBy(t, ["user_id", "hour_bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "hour_bucket", "n_events"])

    from ocrautomator_ray.functions.exchange import auto_partitions, per_key_blocks

    out_schema = pa.schema([("user_id", pa.int64()), ("hour_bucket", pa.int64()),
                            ("n_events", pa.int64())])

    def final_sum(block: pa.Table) -> pa.Table:
        # vectorized per-key sum over the whole exchange block — Ray's
        # HashAggregate pays fixed update machinery per shard task that
        # dominated at 1M events (7.5 s → per_key_blocks matches
        # sessionize_events' 2 s on the same input)
        if block.num_rows == 0:
            return out_schema.empty_table()
        u = block["user_id"].to_numpy(zero_copy_only=False)
        h = block["hour_bucket"].to_numpy(zero_copy_only=False)
        n = block["n_events"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, u))
        u, h, n = u[order], h[order], n[order]
        starts = np.nonzero(np.r_[True, (u[1:] != u[:-1]) | (h[1:] != h[:-1])])[0]
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "hour_bucket": pa.array(h[starts], pa.int64()),
            "n_events": pa.array(np.add.reduceat(n, starts).astype(np.int64),
                                 pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return per_key_blocks(partials, ["user_id", "hour_bucket"], final_sum,
                          num_partitions=auto_partitions(
                              f"{sf_dir}/events.parquet"))


SQL_HOURLY_ACTIVITY = """
SELECT user_id,
       CAST(FLOOR(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
       COUNT(*) AS n_events
FROM events GROUP BY user_id, hour_bucket
"""

_ = Count  # imported for parity with docs; partial+Sum supersedes direct Count


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "filter_project": filter_project,
    "first_event_per_user": first_event_per_user,
    "dedup_first_docs": dedup_first_docs,
    "customers_without_orders": customers_without_orders,
    "revenue_by_nation": revenue_by_nation,
    "top_orders": top_orders,
    "event_type_counts": event_type_counts,
    "hourly_user_activity": hourly_user_activity,
}

SQL = {
    "q1_pricing_summary": SQL_Q1,
    "filter_project": SQL_FILTER_PROJECT,
    "first_event_per_user": SQL_FIRST_EVENT,
    "dedup_first_docs": SQL_DEDUP_FIRST,
    "customers_without_orders": SQL_ANTI_JOIN,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "top_orders": SQL_TOP_ORDERS,
    "event_type_counts": SQL_EVENT_TYPE_COUNTS,
    "hourly_user_activity": SQL_HOURLY_ACTIVITY,
}
