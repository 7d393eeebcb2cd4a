"""Semantic oracles for the fourth relational batch + new sketches — checks
that go beyond the SQL-equivalence test in test_queries.py: the NTILE bucket
formula, the Misra-Gries sandwich bound, the histogram-quantile error bound,
and bloom-prefilter exactness (no false positives survive the semi-join)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pdf(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_ntile_formula_matches_sql_semantics():
    from ocrautomator_ray.functions.relational4 import NTILE_N, _ntile

    con = duckdb.connect()
    for n in [1, 2, 3, 4, 5, 7, 8, 9, 16, 17]:
        rn0 = np.arange(n)
        got = _ntile(rn0, np.full(n, n))
        exp = [r[0] for r in con.sql(
            f"SELECT NTILE({NTILE_N}) OVER (ORDER BY i) FROM range({n}) t(i)"
        ).fetchall()]
        assert list(got) == exp, n


@pytest.mark.usefixtures("ray_session")
def test_set_ops_disjoint_and_consistent():
    from ocrautomator_ray.functions.relational4 import (
        churned_customers,
        repeat_customers,
    )

    rep = set(_pdf(repeat_customers(SF))["o_custkey"])
    chu = set(_pdf(churned_customers(SF))["o_custkey"])
    assert rep and chu
    assert not (rep & chu)  # INTERSECT and EXCEPT partition the 1995 set
    con = duckdb.connect()
    y95 = {r[0] for r in con.sql(
        f"SELECT DISTINCT o_custkey FROM '{SF}/orders.parquet' "
        "WHERE year(o_orderdate)=1995").fetchall()}
    assert rep | chu == y95


@pytest.mark.usefixtures("ray_session")
def test_misra_gries_sandwich_bound():
    from ocrautomator_ray.functions.sketch import approx_top_tokens

    got = _pdf(approx_top_tokens(SF))
    con = duckdb.connect()
    true = dict(con.sql(f"""
        SELECT tok, COUNT(*) FROM (
            SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM '{SF}/documents.parquet') WHERE tok <> ''
        GROUP BY tok""").fetchall())
    assert len(got) > 0
    for _, row in got.iterrows():
        t = true[row["token"]]
        assert row["est_count"] <= t <= row["est_count"] + row["err_ub"], (
            row["token"], row["est_count"], row["err_ub"], t)


@pytest.mark.usefixtures("ray_session")
def test_histogram_quantile_error_bound():
    from ocrautomator_ray.functions.sketch import QUANT_NBINS, QUANT_PS
    from ocrautomator_ray.functions.sketch import approx_quantiles_value

    got = _pdf(approx_quantiles_value(SF)).set_index("event_type")
    con = duckdb.connect()
    lo, hi = con.sql(f"""
        SELECT min(CAST(FLOOR(value*1000000+0.5) AS BIGINT)),
               max(CAST(FLOOR(value*1000000+0.5) AS BIGINT))
        FROM '{SF}/events.parquet'""").fetchall()[0]
    width = (hi - lo + 1) / QUANT_NBINS
    for p in QUANT_PS:
        exact = dict(con.sql(f"""
            SELECT event_type,
                   quantile_disc(CAST(FLOOR(value*1000000+0.5) AS BIGINT), {p})
            FROM '{SF}/events.parquet' GROUP BY event_type""").fetchall())
        col = f"p{int(p * 100)}_est_micros"
        for etype, est in got[col].items():
            assert abs(est - exact[etype]) <= width + 1, (etype, p, est,
                                                          exact[etype])


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_is_exact():
    from ocrautomator_ray.functions.relational4 import (
        BIG_BUYER_BAL,
        orders_of_big_buyers,
    )

    got = _pdf(orders_of_big_buyers(SF))
    con = duckdb.connect()
    keys = {r[0] for r in con.sql(
        f"SELECT c_custkey FROM '{SF}/customer.parquet' "
        f"WHERE c_acctbal > {BIG_BUYER_BAL}").fetchall()}
    assert set(got["o_custkey"]) <= keys          # no false positive survives
    n_exp = con.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet' WHERE o_custkey IN "
        f"(SELECT c_custkey FROM '{SF}/customer.parquet' "
        f"WHERE c_acctbal > {BIG_BUYER_BAL})").fetchall()[0][0]
    assert len(got) == n_exp                      # and none is lost


@pytest.mark.usefixtures("ray_session")
def test_doc_chunks_reconstruct_documents():
    from ocrautomator_ray.functions.corpus import doc_chunks

    got = _pdf(doc_chunks(SF)).sort_values(["doc_id", "chunk_no"])
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rebuilt = got.groupby("doc_id")["chunk_text"].agg(" ".join)
    for _, row in docs.iterrows():
        assert rebuilt[row["doc_id"]] == row["text"]
    assert (got["n_chunk_tokens"] >= 1).all()
    assert (got["n_chunk_tokens"] <= 32).all()


@pytest.mark.usefixtures("ray_session")
def test_corr_matches_numpy():
    from ocrautomator_ray.functions.relational4 import qty_price_corr_by_flag

    got = _pdf(qty_price_corr_by_flag(SF)).set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    li["q"] = np.floor(li["l_quantity"] + 0.5)
    li["p"] = np.floor(li["l_extendedprice"] + 0.5)
    for flag, g in li.groupby("l_returnflag"):
        ref = np.corrcoef(g["q"], g["p"])[0, 1]
        assert abs(got.loc[flag, "corr_micros"] / 1e6 - ref) < 1e-4, flag
        assert got.loc[flag, "n"] == len(g)


@pytest.mark.usefixtures("ray_session")
def test_retention_cohorts_brute_force():
    import pyarrow.parquet as pq
    from ocrautomator_ray.functions.relational4 import retention_cohorts, _monday_day

    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"])
    u = t["user_id"].to_numpy(zero_copy_only=False)
    wk = _monday_day(t["ts"].cast("int64").to_numpy(zero_copy_only=False))
    first = {}
    pairs = set()
    for uu, ww in zip(u, wk):
        first[uu] = min(first.get(uu, ww), ww)
        pairs.add((uu, ww))
    expect = {}
    for uu, ww in pairs:
        k = (first[uu], ww)
        expect[k] = expect.get(k, 0) + 1
    df = retention_cohorts(SF).to_pandas()
    got = {(r.cohort_week, r.activity_week): r.n_users for r in df.itertuples()}
    assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_retention_cohorts_multi_cohort(tmp_path):
    """sf0.001 events all share one first-week; pin the cross-cohort math on
    a crafted table: user 1 starts week 0, users 2+3 start week 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ocrautomator_ray.functions.relational4 import retention_cohorts

    day = 86_400_000_000
    rows = [  # (user, day offset from Monday 1970-01-05)
        (1, 0), (1, 1), (1, 14), (2, 14), (2, 21), (3, 15), (3, 15),
    ]
    base = 4 * day  # 1970-01-05, a Monday
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([base + d * day for _, d in rows],
                       pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    df = retention_cohorts(str(tmp_path)).to_pandas()
    got = {(r.cohort_week, r.activity_week): r.n_users for r in df.itertuples()}
    m = 4  # day-number of that Monday
    assert got == {(m, m): 1, (m, m + 14): 1,
                   (m + 14, m + 14): 2, (m + 14, m + 21): 1}


@pytest.mark.usefixtures("ray_session")
def test_latest_event_state_matches_pandas():
    import pandas as pd

    from ocrautomator_ray.functions.relational3 import latest_event_state

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")
    exp = (ev.sort_values(["ts", "event_id"])
             .groupby(["user_id", "event_type"]).tail(1))
    got = latest_event_state(sf).to_pandas()
    assert len(got) == len(exp)
    key = ["user_id", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert (g["event_id"].to_numpy()
            == e["event_id"].to_numpy()).all()
    # compaction invariant: one row per live key, and every key is live
    assert g.set_index(key).index.is_unique
    assert set(map(tuple, g[key].to_numpy())) == \
        set(map(tuple, ev[key].drop_duplicates().to_numpy()))


@pytest.mark.usefixtures("ray_session")
def test_user_behavior_vectors_match_serial():
    import pandas as pd
    import pyarrow as pa

    from ocrautomator_ray.functions.dedup import _fnv1a_strings
    from ocrautomator_ray.functions.mix import _HASH_SIGN_SHIFT
    from ocrautomator_ray.functions.relational3 import (
        BEHAVIOR_DIM,
        user_behavior_vectors,
    )

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="stable")
    exp = {}
    for uid, g in ev.groupby("user_id"):
        et = g["event_type"].tolist()
        if len(et) < 2:
            continue
        v = [0] * BEHAVIOR_DIM
        for a, b in zip(et, et[1:]):
            h = int(_fnv1a_strings(pa.array([f"{a} {b}"]))[0])
            sgn = -1 if (h >> _HASH_SIGN_SHIFT) & 1 else 1
            v[h % BEHAVIOR_DIM] += sgn
        exp[int(uid)] = (len(et) - 1, v)
    got = user_behavior_vectors(sf).to_pandas().set_index("user_id")
    assert set(got.index) == set(exp)
    for uid, (n, v) in exp.items():
        row = got.loc[uid]
        assert row["n_bigrams"] == n
        assert [row[f"b_{j}"] for j in range(BEHAVIOR_DIM)] == v


@pytest.mark.usefixtures("ray_session")
def test_daily_active_users_matches_pandas():
    import numpy as np
    import pandas as pd

    from ocrautomator_ray.functions.relational3 import (
        WAU_WINDOW,
        daily_active_users,
    )

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    day = ev["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    pairs = set(zip(ev["user_id"].tolist(), day.tolist()))
    days = sorted({d for _, d in pairs})
    got = daily_active_users(sf).to_pandas().set_index("day")
    assert list(got.index) == days
    for d in days:
        dau = sum(1 for _, dd in pairs if dd == d)
        wau = len({u for u, dd in pairs if d - WAU_WINDOW + 1 <= dd <= d})
        assert got.loc[d, "dau"] == dau
        assert got.loc[d, "wau"] == wau
    # window invariant: wau ≥ dau everywhere
    assert (got["wau"] >= got["dau"]).all()
