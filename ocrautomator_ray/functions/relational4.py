"""Fourth batch of relational operators: distributed set operations
(INTERSECT / EXCEPT), window ranks (NTILE + percent-rank), a FULL OUTER
join, a funnel (conversion) aggregate, Pearson correlation from exact
integer partials, and a bloom-prefiltered semi-join — all SQL-oracled.

Determinism conventions as in functions/relational.py: every float that
reaches the driver hash is either an exact int64 (money integerized per row
BEFORE summing) or the result of an identical-order IEEE double expression
mirrored in the oracle SQL (corr, percent-rank), so distributed combine
order can never change a value.

Scale notes per operator:
- set ops: per-batch distinct partials shrink the shuffle to one row per
  (key, side-flag) per batch; the groupby moves keys, never order rows.
- full outer: both sides pre-aggregate to one row per key before the join.
- bloom semi-join: the small side is OR-folded into a 128 KiB bit array via
  a single-partition tree merge (driver holds one mask, never the keys),
  broadcast once with ray.put; the exact left_semi join then only shuffles
  the bloom survivors — the standard join-pruning shape when the dimension
  side is too big for an exact broadcast set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from ocrautomator_ray.functions.exchange import (
    pruned_read,
    auto_partitions,
    per_key_blocks,
    read_blocks,
    stripped_read,
    tune_exchange,
)
from ocrautomator_ray.functions.relational import _cents

# --------------------------------------------------------------------------
# repeat_customers / churned_customers — distributed INTERSECT / EXCEPT over
# the distinct customer-key sets of two order years. One shared shape: tag
# each side as a flag column, per-batch distinct partial (max of flags),
# final groupby max, filter by the set-op predicate. The shuffle carries one
# row per (custkey, batch) — never the raw orders.
# --------------------------------------------------------------------------

_YEAR_A, _YEAR_B = 1995, 1996


def _year_flag_sets(sf_dir: str) -> rd.Dataset:
    path = f"{sf_dir}/orders.parquet"
    ds = pruned_read(path, ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        in_a = pc.cast(pc.equal(y, _YEAR_A), pa.int64())
        in_b = pc.cast(pc.equal(y, _YEAR_B), pa.int64())
        tt = pa.table({"o_custkey": t["o_custkey"], "f_a": in_a, "f_b": in_b})
        g = pa.TableGroupBy(tt, "o_custkey").aggregate(
            [("f_a", "max"), ("f_b", "max")]
        )
        return g.rename_columns(["o_custkey", "f_a", "f_b"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Max("f_a", alias_name="f_a"), Max("f_b", alias_name="f_b"))
    )


def repeat_customers(sf_dir: str) -> rd.Dataset:
    """INTERSECT: customers ordering in both 1995 and 1996."""

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["f_a"], 1), pc.equal(t["f_b"], 1))
        return t.filter(m).select(["o_custkey"])

    return _year_flag_sets(sf_dir).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def churned_customers(sf_dir: str) -> rd.Dataset:
    """EXCEPT: customers ordering in 1995 but not in 1996."""

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["f_a"], 1), pc.equal(t["f_b"], 0))
        return t.filter(m).select(["o_custkey"])

    return _year_flag_sets(sf_dir).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_REPEAT_CUSTOMERS = f"""
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {_YEAR_A}
INTERSECT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {_YEAR_B}
"""

SQL_CHURNED_CUSTOMERS = f"""
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {_YEAR_A}
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {_YEAR_B}
"""


# --------------------------------------------------------------------------
# customer_value_ntile — NTILE(4) + percent-rank of each customer's orders by
# value. One hash exchange on o_custkey, then vectorized in-block ranking
# (same per-key-history partitioning assumption as the as-of join). The
# percent-rank double is the identical-order expression on both engines:
# (rn-1)/(n-1) then *1e6, floored — bit-stable.
# --------------------------------------------------------------------------

NTILE_N = 4


def _ntile(rn0: np.ndarray, n: np.ndarray) -> np.ndarray:
    """SQL NTILE over 0-based in-group row numbers ``rn0`` with group sizes
    ``n`` (both per-row arrays): the first n % k buckets get one extra row."""
    q, r = n // NTILE_N, n % NTILE_N
    boundary = r * (q + 1)
    small = rn0 < boundary
    # q == 0 only when n < NTILE_N, where every row satisfies rn0 < boundary
    qsafe = np.maximum(q, 1)
    return np.where(
        small, rn0 // (q + 1) + 1, r + (rn0 - boundary) // qsafe + 1
    ).astype(np.int64)


def customer_value_ntile(sf_dir: str) -> rd.Dataset:
    path = f"{sf_dir}/orders.parquet"
    ds = pruned_read(path, ["o_orderkey", "o_custkey",
                                        "o_totalprice"])

    rank_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("tile", pa.int64()), ("pr_micros", pa.int64()),
    ])

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return rank_schema.empty_table()
        g = block.take(pc.sort_indices(block, sort_keys=[
            ("o_custkey", "ascending"), ("o_totalprice", "descending"),
            ("o_orderkey", "ascending")]))
        ck = g["o_custkey"].to_numpy(zero_copy_only=False)
        n = len(ck)
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        run = np.diff(np.r_[starts, n])
        sizes = np.repeat(run, run)
        rn0 = np.arange(n, dtype=np.int64) - np.repeat(starts, run)
        pr = np.floor(
            rn0.astype(np.float64) / np.maximum(sizes - 1, 1) * 1e6 + 0.5
        ).astype(np.int64)
        pr[sizes == 1] = 0
        return pa.table({
            "o_orderkey": g["o_orderkey"],
            "o_custkey": g["o_custkey"],
            "tile": pa.array(_ntile(rn0, sizes), pa.int64()),
            "pr_micros": pa.array(pr, pa.int64()),
        })

    return per_key_blocks(ds, ["o_custkey"], rank_block,
                          num_partitions=auto_partitions(path))


SQL_NTILE = f"""
SELECT o_orderkey, o_custkey, tile,
       CASE WHEN cnt = 1 THEN 0
            ELSE CAST(FLOOR(CAST(rn - 1 AS DOUBLE) / (cnt - 1) * 1000000
                            + 0.5) AS BIGINT)
       END AS pr_micros
FROM (
    SELECT o_orderkey, o_custkey,
           NTILE({NTILE_N}) OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey)
               AS tile,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
    FROM orders
)
"""


# --------------------------------------------------------------------------
# customer_era_revenue — FULL OUTER join of two per-customer revenue
# aggregates (early era 1995-1997 vs late era 1998-2001). Each side reduces
# to one row per key BEFORE the join, so the full-outer exchange moves
# aggregates, never order rows; missing sides zero-fill.
# --------------------------------------------------------------------------

_ERA_SPLIT = 1998


def _era_revenue(ds: rd.Dataset, late: bool, out_col: str,
                 num_partitions: int = 16) -> rd.Dataset:
    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        mask = pc.greater_equal(y, _ERA_SPLIT) if late else pc.less(
            y, _ERA_SPLIT)
        t = t.filter(mask)
        tt = pa.table({"o_custkey": t["o_custkey"],
                       out_col: _cents(t["o_totalprice"])})
        g = pa.TableGroupBy(tt, "o_custkey").aggregate([(out_col, "sum")])
        return g.rename_columns(["o_custkey", out_col])

    def final_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        g = pa.TableGroupBy(t, "o_custkey").aggregate([(out_col, "sum")])
        return g.rename_columns(["o_custkey", out_col])

    # per_key_blocks + an Arrow block sum instead of groupby().aggregate():
    # Ray's HashAggregate spends ~0.5 s of update machinery per shard task
    # on this shape; the plain hash exchange + one C++ group-sum per block
    # does the same reduction in milliseconds
    return per_key_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], final_sum, num_partitions=num_partitions)


def customer_era_revenue(sf_dir: str) -> rd.Dataset:
    path = f"{sf_dir}/orders.parquet"
    n_parts = auto_partitions(path)
    ds = stripped_read(path, columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"],
                       override_num_blocks=read_blocks(path))
    tune_exchange(ds, n_parts)
    early = _era_revenue(ds, late=False, out_col="early_cents",
                         num_partitions=n_parts)
    late = _era_revenue(ds, late=True, out_col="late_cents",
                        num_partitions=n_parts).rename_columns(
        {"o_custkey": "rk"}
    )
    joined = early.join(late, join_type="full_outer",
                        num_partitions=n_parts,
                        on=("o_custkey",), right_on=("rk",))

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer join emits the coalesced key under the left name
        key = (pc.coalesce(t["o_custkey"], t["rk"])
               if "rk" in t.column_names else t["o_custkey"])
        return pa.table({
            "o_custkey": pc.cast(key, pa.int64()),
            "early_cents": pc.fill_null(t["early_cents"], 0).cast(pa.int64()),
            "late_cents": pc.fill_null(t["late_cents"], 0).cast(pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


SQL_ERA_REVENUE = f"""
SELECT COALESCE(e.o_custkey, l.o_custkey) AS o_custkey,
       COALESCE(e.early_cents, 0) AS early_cents,
       COALESCE(l.late_cents, 0) AS late_cents
FROM (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
               AS early_cents
    FROM orders WHERE year(o_orderdate) < {_ERA_SPLIT} GROUP BY o_custkey
) e
FULL JOIN (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
               AS late_cents
    FROM orders WHERE year(o_orderdate) >= {_ERA_SPLIT} GROUP BY o_custkey
) l ON e.o_custkey = l.o_custkey
"""


# --------------------------------------------------------------------------
# conversion_funnel — per-user signup→purchase conversion: users whose last
# purchase is at/after their first signup, with both timestamps. Conditional
# min/max partials per batch (null when the user has no such event in the
# batch); Ray's null-ignoring Min/Max finalize them.
# --------------------------------------------------------------------------

def conversion_funnel(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/events.parquet", ["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        s_us = pc.if_else(pc.equal(t["event_type"], "signup"), us, None)
        p_us = pc.if_else(pc.equal(t["event_type"], "purchase"), us, None)
        tt = pa.table({"user_id": t["user_id"], "s_us": s_us, "p_us": p_us})
        g = pa.TableGroupBy(tt, "user_id").aggregate(
            [("s_us", "min"), ("p_us", "max")]
        )
        return g.rename_columns(["user_id", "s_us", "p_us"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("s_us", alias_name="s_us"),
                   Max("p_us", alias_name="p_us"))
    )

    def finish(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t["s_us"]), pc.is_valid(t["p_us"])),
            pc.greater_equal(t["p_us"], t["s_us"]),
        )
        t = t.filter(pc.fill_null(m, False))
        return pa.table({
            "user_id": t["user_id"],
            "first_signup_us": t["s_us"].cast(pa.int64()),
            "last_purchase_us": t["p_us"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_FUNNEL = """
SELECT user_id, s AS first_signup_us, p AS last_purchase_us FROM (
    SELECT user_id,
           epoch_us(min(ts) FILTER (event_type = 'signup')) AS s,
           epoch_us(max(ts) FILTER (event_type = 'purchase')) AS p
    FROM events GROUP BY user_id
) WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s
"""


# --------------------------------------------------------------------------
# qty_price_corr_by_flag — distributed Pearson correlation of quantity vs
# price per return flag, from exact int64 partial sums (n, Σq, Σp, Σq², Σp²,
# Σqp; price integerized to whole dollars so Σp² stays in int64 up to ~sf10 —
# beyond that, scale the unit down). The finalize ratio is one mirrored IEEE
# double expression, so the micros value is bit-stable.
# --------------------------------------------------------------------------

def qty_price_corr_by_flag(sf_dir: str) -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/lineitem.parquet", ["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        p = pc.cast(pc.floor(pc.add(t["l_extendedprice"], 0.5)), pa.int64())
        tt = pa.table({
            "l_returnflag": t["l_returnflag"],
            "sq": q, "sp": p,
            "sqq": pc.multiply(q, q), "spp": pc.multiply(p, p),
            "sqp": pc.multiply(q, p),
        })
        g = pa.TableGroupBy(tt, "l_returnflag").aggregate(
            [("sq", "sum"), ("sp", "sum"), ("sqq", "sum"), ("spp", "sum"),
             ("sqp", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "sq", "sp", "sqq", "spp", "sqp", "n"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag", num_partitions=4)
        .aggregate(Sum("sq", alias_name="sq"), Sum("sp", alias_name="sp"),
                   Sum("sqq", alias_name="sqq"), Sum("spp", alias_name="spp"),
                   Sum("sqp", alias_name="sqp"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sq = t["sq"].to_numpy(zero_copy_only=False).astype(np.float64)
        sp = t["sp"].to_numpy(zero_copy_only=False).astype(np.float64)
        sqq = t["sqq"].to_numpy(zero_copy_only=False).astype(np.float64)
        spp = t["spp"].to_numpy(zero_copy_only=False).astype(np.float64)
        sqp = t["sqp"].to_numpy(zero_copy_only=False).astype(np.float64)
        num = n * sqp - sq * sp
        den = np.sqrt(n * sqq - sq * sq) * np.sqrt(n * spp - sp * sp)
        keep = den > 0
        corr = np.floor(num[keep] / den[keep] * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "l_returnflag": t["l_returnflag"].filter(pa.array(keep)),
            "n": t["n"].filter(pa.array(keep)).cast(pa.int64()),
            "corr_micros": pa.array(corr, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_CORR = """
SELECT l_returnflag, n,
       CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
                   - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
                  / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                            - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) AS corr_micros
FROM (
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
           CAST(SUM(q*q) AS BIGINT) AS sqq, CAST(SUM(p*p) AS BIGINT) AS spp,
           CAST(SUM(q*p) AS BIGINT) AS sqp
    FROM (
        SELECT l_returnflag,
               CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
               CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS p
        FROM lineitem
    ) GROUP BY l_returnflag
)
WHERE sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
           - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
      * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
             - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) > 0
"""


# --------------------------------------------------------------------------
# orders_of_big_buyers — bloom-prefiltered semi-join: orders of customers
# with acctbal above a threshold. The scale pattern for a dimension side too
# large to broadcast exactly: (1) fold the dimension keys into a fixed-size
# bloom bit array with a single-partition tree merge (the driver only ever
# holds one 128 KiB mask), (2) broadcast the bits once, prefilter the fact
# side per batch (false positives only), (3) an exact left_semi hash join on
# the survivors removes false positives. The join's shuffle volume is the
# bloom-survivor set, not the fact table.
# --------------------------------------------------------------------------

BLOOM_BITS_LOG2 = 20          # 2^20 bits = 128 KiB
_BLOOM_M = 1 << BLOOM_BITS_LOG2
_BLOOM_SEEDS = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
                np.uint64(0x165667B19E3779F9), np.uint64(0x27D4EB2F165667C5))
BIG_BUYER_BAL = 5000.0


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(len(keys) × k) bit positions via k seeded multiplicative mixes."""
    k = keys.astype(np.uint64)
    cols = []
    with np.errstate(over="ignore"):
        for seed in _BLOOM_SEEDS:
            h = (k ^ seed) * np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
            cols.append((h % np.uint64(_BLOOM_M)).astype(np.int64))
    return np.stack(cols, axis=1)


def _build_bloom(keys_ds: rd.Dataset, key_col: str) -> "ray.ObjectRef":
    """Fold a key dataset into one packed bloom mask (bytes row), merged via
    repartition(1) so the driver never materializes the keys."""

    def partial_mask(t: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_M // 8, dtype=np.uint8)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if len(keys):
            pos = _bloom_positions(keys).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"mask": pa.array([bits.tobytes()], pa.binary())})

    def or_merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(_BLOOM_M // 8, dtype=np.uint8)
        for m in t["mask"]:
            acc |= np.frombuffer(m.as_py(), dtype=np.uint8)
        return pa.table({"mask": pa.array([acc.tobytes()], pa.binary())})

    merged = (
        keys_ds.map_batches(partial_mask, batch_format="pyarrow",
                            zero_copy_batch=True)
        .repartition(1)
        .map_batches(or_merge, batch_format="pyarrow", batch_size=None)
        .take(1)
    )
    return ray.put(np.frombuffer(merged[0]["mask"], dtype=np.uint8))


def orders_of_big_buyers(sf_dir: str) -> rd.Dataset:
    cust_path = f"{sf_dir}/customer.parquet"
    orders_path = f"{sf_dir}/orders.parquet"
    buyers = pruned_read(cust_path, ["c_custkey", "c_acctbal"]).filter(expr=f"c_acctbal > {BIG_BUYER_BAL}").select_columns(["c_custkey"])

    bloom_ref = _build_bloom(buyers, "c_custkey")

    def prefilter(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(keys)
        hit = np.ones(len(keys), dtype=bool)
        for j in range(pos.shape[1]):
            p = pos[:, j]
            hit &= (bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1 > 0
        t = t.filter(pa.array(hit))  # drop rejects BEFORE the money math
        return pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "total_cents": _cents(t["o_totalprice"]),
        })

    orders = stripped_read(
        orders_path, columns=["o_orderkey", "o_custkey", "o_totalprice"],
        override_num_blocks=read_blocks(orders_path),
    ).map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    tune_exchange(orders)
    return orders.join(buyers, join_type="left_semi",
                       num_partitions=auto_partitions(orders_path),
                       on=("o_custkey",), right_on=("c_custkey",))


SQL_BIG_BUYERS = f"""
SELECT o_orderkey, o_custkey,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_acctbal > {BIG_BUYER_BAL})
"""


# --------------------------------------------------------------------------
# revenue_by_region — star join: fact orders ⋈ customer (large×large hash
# join on custkey, with the fact side pre-aggregated to one row per
# customer) → nation → region (two genuinely small dims, broadcast once via
# ray.put and resolved with a numpy lookup inside the batch). The canonical
# warehouse topology: exactly ONE all-to-all for the big sides, zero
# shuffles for the small ones.
# --------------------------------------------------------------------------

def revenue_by_region(sf_dir: str) -> rd.Dataset:
    cust_path = f"{sf_dir}/customer.parquet"
    orders_path = f"{sf_dir}/orders.parquet"

    # broadcast nationkey → region name (25 × tiny)
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    nk = nation["n_nationkey"].to_numpy()
    nr = nation["n_regionkey"].to_numpy()
    rk = region["r_regionkey"].to_numpy()
    rn = np.asarray(region["r_name"].to_pylist(), dtype=object)
    order = np.argsort(rk)
    rk, rn = rk[order], rn[order]
    n2r = np.empty(nk.max() + 1, dtype=object)
    n2r[nk] = rn[np.searchsorted(rk, nr)]
    lookup_ref = ray.put(n2r)

    orders = stripped_read(orders_path,
                           columns=["o_custkey", "o_totalprice"],
                           override_num_blocks=read_blocks(orders_path))

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"o_custkey": t["o_custkey"],
                       "rev_cents": _cents(t["o_totalprice"])})
        g = pa.TableGroupBy(tt, "o_custkey").aggregate([("rev_cents", "sum")])
        return g.rename_columns(["o_custkey", "rev_cents"])

    def final_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "rev_cents": pa.array([], pa.int64())})
        g = pa.TableGroupBy(t, "o_custkey").aggregate([("rev_cents", "sum")])
        return g.rename_columns(["o_custkey", "rev_cents"])

    n_parts = auto_partitions(cust_path, orders_path)
    tune_exchange(orders, n_parts)
    # hash exchange + Arrow block sum (see _era_revenue on why not
    # groupby().aggregate() here)
    per_cust = per_key_blocks(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], final_sum, num_partitions=n_parts)
    cust = stripped_read(cust_path, columns=["c_custkey", "c_nationkey"],
                         override_num_blocks=read_blocks(cust_path))
    joined = per_cust.join(cust, join_type="inner",
                           num_partitions=n_parts,
                           on=("o_custkey",), right_on=("c_custkey",))

    def to_region(t: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        names = lut[t["c_nationkey"].to_numpy(zero_copy_only=False)]
        tt = pa.table({"r_name": pa.array(list(names), pa.string()),
                       "revenue_cents": t["rev_cents"]})
        g = pa.TableGroupBy(tt, "r_name").aggregate([("revenue_cents", "sum")])
        return g.rename_columns(["r_name", "revenue_cents"])

    return (
        joined.map_batches(to_region, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("r_name", num_partitions=4)
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


SQL_REVENUE_BY_REGION = """
SELECT r_name,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# event_value_zscore — group-wise normalization (the feature-engineering
# two-pass): exact int64 per-type sums (value in centis so Σv² stays in
# int64 past sf10), the 5-row stats table broadcast via ray.put, then a
# per-row vectorized finalize. z = (v·n − Σv)/√(n·Σv² − (Σv)²) evaluated in
# the same IEEE order as the SQL oracle, so micros are bit-stable.
# --------------------------------------------------------------------------

def event_value_zscore(sf_dir: str) -> rd.Dataset:
    path = f"{sf_dir}/events.parquet"

    def drop_null_values(t: pa.Table) -> pa.Table:
        # null values are excluded from BOTH the stats and the output
        # (mirrored by the oracle's WHERE value IS NOT NULL) — a NaN
        # round-trip through the int finalize would otherwise emit
        # platform-dependent garbage
        return t.filter(pc.is_valid(t["value"]))

    ds = pruned_read(path, ["event_id", "event_type", "value"]).map_batches(drop_null_values, batch_format="pyarrow",
                  zero_copy_batch=True)

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t["value"])
        tt = pa.table({"event_type": t["event_type"], "s": v,
                       "sq": pc.multiply(v, v)})
        g = pa.TableGroupBy(tt, "event_type").aggregate(
            [("s", "sum"), ("sq", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["event_type", "s", "sq", "n"])

    stats_rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type", num_partitions=4)
        .aggregate(Sum("s", alias_name="s"), Sum("sq", alias_name="sq"),
                   Sum("n", alias_name="n"))
        .take_all()
    )
    stats = {r["event_type"]: (float(r["n"]), float(r["s"]), float(r["sq"]))
             for r in stats_rows}
    stats_ref = ray.put(stats)

    def finish(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # dictionary-encode the (few) types once per batch, then np.take —
        # no per-row Python
        enc = pc.dictionary_encode(t["event_type"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        stats_mat = np.array([st[e] for e in enc.dictionary.to_pylist()],
                             dtype=np.float64).reshape(-1, 3)
        n = stats_mat[codes, 0]
        s = stats_mat[codes, 1]
        sq = stats_mat[codes, 2]
        den = np.sqrt(n * sq - s * s)
        keep = den > 0
        z = np.floor((v[keep] * n[keep] - s[keep]) / den[keep] * 1e6 + 0.5)
        return pa.table({
            "event_id": t["event_id"].filter(pa.array(keep)),
            "event_type": t["event_type"].filter(pa.array(keep)),
            "z_micros": pa.array(z.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


SQL_ZSCORE = """
SELECT event_id, event_type,
       CAST(FLOOR((CAST(v AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s AS DOUBLE))
                  / sqrt(CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS z_micros
FROM (
    SELECT event_id, event_type,
           CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v,
           CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
               OVER (PARTITION BY event_type) AS BIGINT) AS s,
           CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)
                    * CAST(FLOOR(value*100 + 0.5) AS BIGINT))
               OVER (PARTITION BY event_type) AS BIGINT) AS sq,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events WHERE value IS NOT NULL
)
WHERE sqrt(CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) > 0
"""


# ---------------------------------------------------------------------------
# retention_cohorts — cohort week × activity week distinct-user matrix
# ---------------------------------------------------------------------------

def _monday_day(ts_us: np.ndarray) -> np.ndarray:
    """Days-since-epoch of the Monday of each timestamp's week (int64) —
    mirrors DuckDB ``date_trunc('week', ts)``. 1970-01-01 was a Thursday, so
    Monday-based day-of-week = (day + 3) % 7. Event data is post-1970; the
    SQL mirror uses the same positive-only floor arithmetic."""
    day = ts_us // 86_400_000_000
    return day - (day + 3) % 7


def retention_cohorts(sf_dir: str) -> rd.Dataset:
    """(cohort_week, activity_week, n_users): users bucketed by the Monday
    day-number of their FIRST event's week, counted distinct per week they
    were active in. The classic retention triangle.

    One user-keyed exchange does all per-user work (first week + distinct
    active weeks, vectorized over every user in the block at once); the
    per-block partial count then shrinks the final exchange to one row per
    (cohort, week) pair per block — users and events never shuffle twice."""
    ds = pruned_read(f"{sf_dir}/events.parquet", ["user_id", "ts"])

    def to_weeks(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "wk": pa.array(_monday_day(ts), pa.int64()),
        })

    out_schema = pa.schema([("cohort_week", pa.int64()),
                            ("activity_week", pa.int64()),
                            ("n", pa.int64())])

    def cohort_pairs(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        u = block["user_id"].to_numpy(zero_copy_only=False)
        w = block["wk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        # distinct (user, wk) pairs; first pair of each user run = min week
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]
        user_start = np.ones(len(u), bool)
        user_start[1:] = u[1:] != u[:-1]
        cohort = w[user_start][np.cumsum(user_start) - 1]  # broadcast per run
        # partial count per (cohort, activity) pair within the block
        g = pa.TableGroupBy(pa.table({
            "cohort_week": pa.array(cohort, pa.int64()),
            "activity_week": pa.array(w, pa.int64()),
        }), ["cohort_week", "activity_week"]).aggregate([([], "count_all")])
        return pa.table({"cohort_week": g["cohort_week"],
                         "activity_week": g["activity_week"],
                         "n": g["count_all"].cast(pa.int64())})

    pairs = per_key_blocks(ds.map_batches(to_weeks, batch_format="pyarrow",
                                          zero_copy_batch=True),
                           ["user_id"], cohort_pairs)
    return (
        pairs.groupby(["cohort_week", "activity_week"], num_partitions=8)
        .aggregate(Sum("n", alias_name="n_users"))
    )


SQL_RETENTION_COHORTS = """
WITH wk AS (
  SELECT user_id,
         CAST(epoch(ts) // 86400 - ((epoch(ts) // 86400) + 3) % 7 AS BIGINT)
           AS wk
  FROM events
), firstw AS (
  SELECT user_id, MIN(wk) AS cohort_week FROM wk GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, wk AS activity_week FROM wk
)
SELECT f.cohort_week, a.activity_week, CAST(COUNT(*) AS BIGINT) AS n_users
FROM firstw f JOIN act a USING (user_id)
GROUP BY f.cohort_week, a.activity_week
"""


QUERIES = {
    "repeat_customers": repeat_customers,
    "churned_customers": churned_customers,
    "customer_value_ntile": customer_value_ntile,
    "customer_era_revenue": customer_era_revenue,
    "conversion_funnel": conversion_funnel,
    "qty_price_corr_by_flag": qty_price_corr_by_flag,
    "orders_of_big_buyers": orders_of_big_buyers,
    "revenue_by_region": revenue_by_region,
    "event_value_zscore": event_value_zscore,
    "retention_cohorts": retention_cohorts,
}

SQL = {
    "revenue_by_region": SQL_REVENUE_BY_REGION,
    "event_value_zscore": SQL_ZSCORE,
    "repeat_customers": SQL_REPEAT_CUSTOMERS,
    "churned_customers": SQL_CHURNED_CUSTOMERS,
    "customer_value_ntile": SQL_NTILE,
    "customer_era_revenue": SQL_ERA_REVENUE,
    "conversion_funnel": SQL_FUNNEL,
    "qty_price_corr_by_flag": SQL_CORR,
    "orders_of_big_buyers": SQL_BIG_BUYERS,
    "retention_cohorts": SQL_RETENTION_COHORTS,
}
