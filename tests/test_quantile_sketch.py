"""grouped_disc_quantiles — the shared exact/sketch quantile engine
(VERDICT r4 #7): discrete domains take the selection-exact path that
hash-matches quantile_disc; a continuous high-cardinality double column
flips to the mergeable-histogram path, whose driver state is bounded at
groups × nbins rows (never the value domain) and whose estimates stay
within one bin width of the exact answer."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocrautomator_ray.functions.filters import (
    QUANTILE_SKETCH_NBINS,
    grouped_disc_quantiles,
)

QS = [(1, 2), (99, 100)]


def _exact_disc(sorted_vals: np.ndarray, num: int, den: int) -> float:
    rank = -(-(len(sorted_vals) * num) // den)
    return float(sorted_vals[rank - 1])


def _continuous_table(n: int = 60_000) -> tuple[np.ndarray, np.ndarray, pa.Table]:
    rng = np.random.RandomState(7)
    types = np.array(["alpha", "beta", "gamma"], dtype=object)[
        rng.randint(0, 3, n)]
    vals = rng.lognormal(0.0, 2.0, n)  # continuous — ~all values distinct
    return types, vals, pa.table({
        "event_type": pa.array(types.astype(str), pa.string()),
        "value": pa.array(vals, pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_sketch_path_bounds_error_on_continuous_domain(tmp_path):
    types, vals, t = _continuous_table()
    p = str(tmp_path / "ev.parquet")
    pq.write_table(t, p)
    ds = rd.read_parquet(p)

    df, path = grouped_disc_quantiles(ds, "event_type", "value", QS,
                                      domain_cap=1000)
    assert path == "sketch", "a ~60k-distinct domain must take the sketch"
    assert set(df["event_type"]) == {"alpha", "beta", "gamma"}
    for _, row in df.iterrows():
        sel = np.sort(vals[types == row["event_type"]])
        assert int(row["n"]) == len(sel)
        tol = (sel[-1] - sel[0]) / QUANTILE_SKETCH_NBINS
        for qn, (num, den) in zip(("q0", "q1"), QS):
            exact = _exact_disc(sel, num, den)
            assert abs(row[qn] - exact) <= tol * (1 + 1e-9), (
                f"{row['event_type']} {qn}: est {row[qn]} vs exact {exact}, "
                f"tol {tol}")


@pytest.mark.usefixtures("ray_session")
def test_exact_path_matches_selection_and_global_mode(tmp_path):
    types, vals, t = _continuous_table(8_000)
    p = str(tmp_path / "ev.parquet")
    pq.write_table(t, p)
    ds = rd.read_parquet(p)

    # grouped exact: the selected value IS a data value, bit-for-bit
    df, path = grouped_disc_quantiles(ds, "event_type", "value", QS,
                                      domain_cap=10**9)
    assert path == "exact"
    for _, row in df.iterrows():
        sel = np.sort(vals[types == row["event_type"]])
        for qn, (num, den) in zip(("q0", "q1"), QS):
            assert row[qn] == _exact_disc(sel, num, den)

    # global mode (group_col=None), both paths
    g_exact, pe = grouped_disc_quantiles(ds, None, "value", [(1, 2)],
                                         domain_cap=10**9)
    assert pe == "exact" and len(g_exact) == 1
    assert g_exact["q0"].iloc[0] == _exact_disc(np.sort(vals), 1, 2)
    g_sk, ps = grouped_disc_quantiles(ds, None, "value", [(1, 2)],
                                      domain_cap=100)
    assert ps == "sketch"
    tol = (vals.max() - vals.min()) / QUANTILE_SKETCH_NBINS
    assert abs(g_sk["q0"].iloc[0]
               - _exact_disc(np.sort(vals), 1, 2)) <= tol * (1 + 1e-9)
