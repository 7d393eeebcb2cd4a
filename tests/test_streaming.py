"""incremental_sessionize — streaming session windows with carried
per-user open-session state must equal the batch window exactly, for any
epoch count, including sessions that straddle epoch boundaries."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions.relational2 import sessionize_events
from ocrautomator_ray.functions.streaming import incremental_sessionize

SF = "/root/testdata/sf0.001"


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_epochs", [1, 2, 5])
def test_matches_batch_for_any_epoch_count(n_epochs):
    inc = _canon(incremental_sessionize(SF, n_epochs=n_epochs))
    batch = _canon(sessionize_events(SF))
    pd.testing.assert_frame_equal(inc, batch)


@pytest.mark.usefixtures("ray_session")
def test_boundary_straddle_and_state_classes(tmp_path):
    """Crafted stream covering every state transition: a session EXTENDED
    across the epoch boundary, a carried session CLOSED by a later gap, a
    QUIET user (no later events), a FRESH user (later events only), and an
    equal-ts run straddling the boundary."""
    m = 60_000_000  # one minute in us
    base = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)
    rows = [
        # u1: events at t0, t0+10m | boundary | t0+35m (gap 25m < 30m →
        # SAME session extends across the boundary), then +90m → new one
        (1, 1, 0), (2, 1, 10), (3, 1, 35), (4, 1, 125),
        # u2: events at t0 | boundary | t0+200m (gap > 30m → carried session
        # CLOSES, a new one opens)
        (5, 2, 0), (6, 2, 200),
        # u3: QUIET — single early session, no later events
        (7, 3, 5), (8, 3, 6),
        # u4: FRESH — appears only after the boundary
        (9, 4, 150), (10, 4, 160),
        # u5: equal-ts run straddling the boundary (ids break the tie)
        (11, 5, 60), (12, 5, 60),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(
            np.array([base + r[2] * m for r in rows], "datetime64[us]"),
            pa.timestamp("us")),
    })
    os.makedirs(tmp_path / "d", exist_ok=True)
    pq.write_table(t, str(tmp_path / "d" / "events.parquet"))
    sf = str(tmp_path / "d")

    batch = _canon(sessionize_events(sf))
    for n in (2, 3, 4):
        inc = _canon(incremental_sessionize(sf, n_epochs=n))
        pd.testing.assert_frame_equal(inc, batch)

    # sanity on the crafted semantics themselves
    u1 = batch[batch.user_id == 1]
    assert len(u1) == 2 and int(u1.n_events.max()) == 3  # extended session
    u2 = batch[batch.user_id == 2]
    assert len(u2) == 2  # closed + reopened
    u5 = batch[batch.user_id == 5]
    assert len(u5) == 1 and int(u5.n_events.iloc[0]) == 2  # equal-ts run


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_epochs", [1, 2, 5])
def test_hourly_matches_batch_for_any_epoch_count(n_epochs):
    from ocrautomator_ray.functions.relational import hourly_user_activity
    from ocrautomator_ray.functions.streaming import (
        incremental_hourly_activity,
    )

    inc = _canon(incremental_hourly_activity(SF, n_epochs=n_epochs))
    batch = _canon(hourly_user_activity(SF))
    pd.testing.assert_frame_equal(inc, batch)


@pytest.mark.usefixtures("ray_session")
def test_hourly_watermark_boundary_bucket(tmp_path):
    """A bucket straddling the epoch boundary must stay OPEN (carried
    partials) until the watermark passes it, then finalize with BOTH
    epochs' counts — never emit twice."""
    h = 3_600_000_000
    base = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)
    # u1: three events inside ONE hour, positioned so a median split puts
    # 1 event in epoch 0 and 2 in epoch 1
    rows = [(1, 1, 10), (2, 1, 30), (3, 1, 50),
            (4, 2, 0), (5, 2, 200)]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([base + r[2] * 60_000_000 for r in rows],
                                "datetime64[us]"), pa.timestamp("us")),
    })
    os.makedirs(tmp_path / "d", exist_ok=True)
    pq.write_table(t, str(tmp_path / "d" / "events.parquet"))
    sf = str(tmp_path / "d")

    from ocrautomator_ray.functions.relational import hourly_user_activity
    from ocrautomator_ray.functions.streaming import (
        incremental_hourly_activity,
    )

    batch = _canon(hourly_user_activity(sf))
    for n in (2, 3):
        inc = _canon(incremental_hourly_activity(sf, n_epochs=n))
        pd.testing.assert_frame_equal(inc, batch)
    u1 = batch[batch.user_id == 1]
    assert len(u1) == 1 and int(u1.n_events.iloc[0]) == 3  # one merged bucket
