"""Serial oracle for the per-source percent-rank normalization
(functions/filters.py::quantile_normalize). The SQL mirror is the primary
gate; this pins the two-phase rank against a pandas recompute plus the
range/uniformity properties a rank transform must satisfy."""

import numpy as np
import pandas as pd
import pytest

from ocrautomator_ray.functions import filters as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ranked():
    return F.quantile_normalize(SF).to_pandas().sort_values("doc_id")


@pytest.mark.usefixtures("ray_session")
def test_matches_pandas_rank(ranked):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "source", "n_chars"])
    d = d.sort_values(["source", "n_chars", "doc_id"])
    d["rank0"] = d.groupby("source").cumcount()
    n = d.groupby("source")["doc_id"].transform("size")
    d["pr"] = d["rank0"] * 1_000_000 // np.maximum(n - 1, 1)
    exp = dict(zip(d["doc_id"], d["pr"]))
    got = dict(zip(ranked["doc_id"], ranked["pr_micros"]))
    assert got == exp


@pytest.mark.usefixtures("ray_session")
def test_rank_range_and_extremes(ranked):
    assert ranked["pr_micros"].min() == 0
    # every multi-doc source tops out at exactly 1e6
    top = ranked.groupby("source")["pr_micros"].max()
    sizes = ranked.groupby("source")["doc_id"].size()
    assert (top[sizes > 1] == 1_000_000).all()
    # within a source, pr is monotone in (n_chars, doc_id)
    g = ranked.sort_values(["source", "n_chars", "doc_id"])
    assert (g.groupby("source")["pr_micros"].diff().dropna() > 0).all()
