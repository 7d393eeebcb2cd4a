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
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=True):
            regs = hll_sketch(g["user_id"].to_numpy())
            rows.append({"event_type": etype, "sketch": regs.tobytes()})
        return pd.DataFrame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["sketch"]:
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "approx_users": np.array([hll_estimate(merged)], dtype=np.int64),
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )


QUERIES = {
    "approx_distinct_users_per_type": approx_distinct_users_per_type,
}

SQL: dict[str, str] = {}
