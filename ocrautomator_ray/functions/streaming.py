"""Stateful STREAMING window operators: the micro-batch/epoch execution of
the engine's window semantics (SURVEY §2.9), with carried per-key state —
the missing incremental shape next to the incremental index families
(bm25/ivf/lsh/topic appends) and the watch-driven corpus loop.

``incremental_sessionize`` processes the event stream in TIME-ORDERED
epochs (a deterministic tercile split of the events table stands in for
arriving micro-batches) and must produce EXACTLY the batch
``sessionize_events`` table — same SQL oracle. The algorithm is the
standard streaming-session-window design (Apache Beam / Flink session
gaps):

- per epoch, ONE user-keyed exchange co-locates the user's carried state
  row (their OPEN trailing session: id so far, start, last ts, count)
  with the epoch's new events;
- the block function seeds the grouped sessionization with that state:
  a new event within SESSION_GAP_MIN of the open session's last ts
  EXTENDS it, otherwise closes it and opens session id+1;
- every session except the user's trailing one is FINAL the moment the
  epoch ends (only the trailing session can ever be extended by later
  events, because epochs are time-ordered) — finalized rows stream out,
  the new trailing state (O(users) rows) carries to the next epoch;
- after the last epoch the remaining open sessions are emitted.

Correctness under epoch boundaries: session membership depends only on
per-user (ts, event_id)-ordered gaps; epochs split on a strict ts
boundary, so the carried last-ts is exactly the lag the batch window
computes across the boundary. Equal-ts runs can straddle a boundary
without harm — their gaps are zero either way, and session aggregates
(count, min/max ts) are order-free within the session.

At 10^12 events the shape is: E epochs × (one user-keyed exchange over
state ∪ epoch events); state is O(active users) rows of 6 scalars —
the thing a real stream processor snapshots — and a production wiring
would persist it per epoch through the resumable sink exactly like
``_commit_round_data`` (the composition here keeps the three epochs in
one lazy chain; each epoch's state is node-distributed, never collected
to the driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ocrautomator_ray.functions.exchange import (
    auto_partitions,
    per_key_blocks,
    pruned_read,
)
from ocrautomator_ray.functions.relational2 import SESSION_GAP_MIN, SQL_SESSIONIZE

_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000
N_EPOCHS = 3

# union row schema flowing through each epoch's exchange:
# kind 0 = event (ts, event_id valid)
# kind 1 = carried state (sid = open session id, start/end/n of it)
# finalized output rows leave through a separate filter on kind 2
_WORK_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("kind", pa.int64()),
    ("ts", pa.timestamp("us")), ("event_id", pa.int64()),
    ("sid", pa.int64()), ("start", pa.timestamp("us")),
    ("end", pa.timestamp("us")), ("n", pa.int64()),
])
_OUT_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("session_id", pa.int64()),
    ("n_events", pa.int64()),
    ("session_start", pa.timestamp("us")), ("session_end", pa.timestamp("us")),
])


def _epoch_step(last: bool):
    """Block fn for one epoch's user-keyed exchange: seed each user's
    grouped sessionization with their carried state, emit finalized
    sessions (kind 2) + the new trailing state (kind 1). ``last`` emits
    the trailing sessions as finalized too."""

    def step(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _WORK_SCHEMA.empty_table()
        kind = t["kind"].to_numpy(zero_copy_only=False)
        ev = t.filter(pa.array(kind == 0))
        st = t.filter(pa.array(kind == 1))
        # prior finalized rows pass through untouched
        done = t.filter(pa.array(kind == 2))

        s = ev.take(pc.sort_indices(ev, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        u = s["user_id"].to_numpy(zero_copy_only=False)
        ts = s["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tsi = ts.astype(np.int64)
        n = len(u)

        # carried state aligned to each event's user (users without state
        # start fresh: sid base 0, no open session)
        su = st["user_id"].to_numpy(zero_copy_only=False)
        sorder = np.argsort(su, kind="stable")
        su_s = su[sorder]
        s_sid = st["sid"].to_numpy(zero_copy_only=False)[sorder]
        s_start = st["start"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")[sorder]
        s_end = st["end"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")[sorder]
        s_endi = s_end.astype(np.int64)
        s_n = st["n"].to_numpy(zero_copy_only=False)[sorder]

        new_user = np.r_[True, u[1:] != u[:-1]] if n else np.empty(0, bool)
        ustarts = np.flatnonzero(new_user)
        urun = np.diff(np.r_[ustarts, n])
        if len(su_s):
            pos = np.minimum(np.searchsorted(su_s, u[ustarts]),
                             len(su_s) - 1)
            has_state = su_s[pos] == u[ustarts]
        else:
            pos = np.zeros(len(ustarts), np.int64)
            has_state = np.zeros(len(ustarts), bool)

        # previous ts per event: within-epoch lag, seeded at each user's
        # first event by the carried open session's end (or -inf fresh)
        prev = np.empty(n, np.int64)
        prev[1:] = tsi[:-1]
        seed_prev = np.where(has_state, s_endi[pos] if len(su_s) else 0,
                             np.int64(-(1 << 62)))
        prev[ustarts] = seed_prev
        new_s = (tsi - prev) > _GAP_US

        # per-user session index among the epoch's NEW sessions (0 when the
        # event extends the carried session)
        cs = np.cumsum(new_s)
        base = np.repeat(cs[ustarts] - new_s[ustarts], urun)
        k = cs - base                      # 0 = still the carried session
        sid_base = np.where(has_state, s_sid[pos] if len(su_s) else 0, 0)
        ext_ok = np.repeat(has_state, urun)  # k=0 valid only with state
        # fresh users' first event always opens session 1
        k = np.where(ext_ok | (k > 0), k, 1)
        sid = np.repeat(sid_base, urun) + k

        # reduce to (user, sid) sessions: events sorted, so sessions are
        # runs of equal (user, sid)
        run_start = np.r_[True, (u[1:] != u[:-1]) | (sid[1:] != sid[:-1])] \
            if n else np.empty(0, bool)
        rstarts = np.flatnonzero(run_start)
        rlen = np.diff(np.r_[rstarts, n]) if len(rstarts) \
            else np.empty(0, np.int64)
        rends = (np.r_[rstarts[1:], n] - 1) if len(rstarts) \
            else np.empty(0, np.int64)
        r_user = u[rstarts]
        r_sid = sid[rstarts]
        r_start = ts[rstarts]
        r_end = ts[rends]
        r_n = rlen.astype(np.int64)
        # merge the carried session into its k=0 run (extends: start/count)
        first_run = np.r_[True, r_user[1:] != r_user[:-1]] \
            if len(r_user) else np.empty(0, bool)
        if len(su_s):
            fpos = np.minimum(np.searchsorted(su_s, r_user), len(su_s) - 1)
            extends = first_run & (su_s[fpos] == r_user) \
                & (r_sid == s_sid[fpos])
        else:
            fpos = np.zeros(len(r_user), np.int64)
            extends = np.zeros(len(r_user), bool)
        if extends.any():
            r_start = np.where(extends, s_start[fpos], r_start)
            r_n = np.where(extends, r_n + s_n[fpos], r_n)

        # carried sessions not extended this epoch split two ways:
        # - user had NO events → still open, stays carried (quiet)
        # - user HAD events but a gap closed the session → it is FINAL now
        #   (this epoch's events are all later; they opened new sessions)
        if len(su_s):
            merged = np.zeros(len(su_s), bool)
            merged[fpos[extends]] = True
            active = np.isin(su_s, r_user[np.r_[True, r_user[1:]
                                               != r_user[:-1]]]
                             if len(r_user) else np.empty(0, su_s.dtype))
            quiet = ~merged & ~active
            closed = ~merged & active
        else:
            quiet = np.zeros(0, bool)
            closed = np.zeros(0, bool)

        # trailing session per user = the last run — carried as state
        # unless this is the final epoch
        last_run = np.r_[r_user[1:] != r_user[:-1], True] \
            if len(r_user) else np.empty(0, bool)
        final_m = ~last_run if not last else np.ones(len(r_user), bool)
        carry_m = last_run if not last else np.zeros(len(r_user), bool)

        def rows(users, kinds, tss, eids, sids, starts, ends, ns):
            return pa.table({
                "user_id": pa.array(users, pa.int64()),
                "kind": pa.array(kinds, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
                "event_id": pa.array(eids, pa.int64()),
                "sid": pa.array(sids, pa.int64()),
                "start": pa.array(starts, pa.timestamp("us")),
                "end": pa.array(ends, pa.timestamp("us")),
                "n": pa.array(ns, pa.int64()),
            })

        zero_ts = np.zeros(0, "datetime64[us]")
        parts = [done] if done.num_rows else []

        def emit(mask, kind_val):
            m = int(mask.sum())
            if not m:
                return
            parts.append(rows(
                r_user[mask], np.full(m, kind_val, np.int64),
                np.zeros(m, "datetime64[us]"), np.zeros(m, np.int64),
                r_sid[mask], r_start[mask], r_end[mask], r_n[mask]))

        emit(final_m, 2)
        emit(carry_m, 1)

        def emit_state(mask, kind_val):
            m = int(mask.sum())
            if not m:
                return
            parts.append(rows(
                su_s[mask], np.full(m, kind_val, np.int64),
                np.zeros(m, "datetime64[us]"), np.zeros(m, np.int64),
                s_sid[mask], s_start[mask], s_end[mask], s_n[mask]))

        emit_state(quiet, 1 if not last else 2)
        emit_state(closed, 2)
        if not parts:
            return _WORK_SCHEMA.empty_table()
        out = pa.concat_tables([p.select(_WORK_SCHEMA.names) for p in parts])
        return out.cast(_WORK_SCHEMA)

    return step


def incremental_sessionize(sf_dir: str,
                           n_epochs: int = N_EPOCHS) -> rd.Dataset:
    """(user_id, session_id, n_events, session_start, session_end) —
    identical to the batch ``sessionize_events`` (same SQL oracle), but
    computed over ``n_epochs`` time-ordered micro-batches with carried
    per-user open-session state, exercising the streaming execution of the
    session-window semantics."""
    ev_path = f"{sf_dir}/events.parquet"
    n_parts = auto_partitions(ev_path)

    import pyarrow.parquet as pq

    # strict-ts epoch boundaries from the parquet footer stats would need a
    # scan anyway; one pruned ts read gives exact quantile boundaries
    ts_all = pq.read_table(ev_path, columns=["ts"])["ts"] \
        .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    qs = np.quantile(ts_all, [i / n_epochs for i in range(1, n_epochs)])
    bounds = [np.int64(q) for q in qs]

    base = pruned_read(ev_path, ["user_id", "ts", "event_id"])

    def epoch_events(i: int):
        lo = bounds[i - 1] if i > 0 else None
        hi = bounds[i] if i < n_epochs - 1 else None

        def pick(t: pa.Table) -> pa.Table:
            tsi = t["ts"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            m = np.ones(len(tsi), bool)
            if lo is not None:
                m &= tsi >= lo
            if hi is not None:
                m &= tsi < hi
            s = t.filter(pa.array(m))
            z = np.zeros(s.num_rows, np.int64)
            zt = np.zeros(s.num_rows, "datetime64[us]")
            return pa.table({
                "user_id": s["user_id"].cast(pa.int64()),
                "kind": pa.array(z, pa.int64()),
                "ts": s["ts"].cast(pa.timestamp("us")),
                "event_id": s["event_id"].cast(pa.int64()),
                "sid": pa.array(z, pa.int64()),
                "start": pa.array(zt, pa.timestamp("us")),
                "end": pa.array(zt, pa.timestamp("us")),
                "n": pa.array(z, pa.int64()),
            })

        return base.map_batches(pick, batch_format="pyarrow",
                                zero_copy_batch=True)

    work = epoch_events(0)
    for i in range(n_epochs):
        work = per_key_blocks(work, ["user_id"],
                              _epoch_step(last=i == n_epochs - 1),
                              num_partitions=n_parts)
        if i < n_epochs - 1:
            work = work.materialize().union(epoch_events(i + 1))

    def project(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["kind"], 2))
        return pa.table({
            "user_id": s["user_id"], "session_id": s["sid"],
            "n_events": s["n"], "session_start": s["start"],
            "session_end": s["end"],
        })

    return work.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_INCREMENTAL_SESSIONIZE = SQL_SESSIONIZE

QUERIES = {"incremental_sessionize": incremental_sessionize}
SQL = {"incremental_sessionize": SQL_INCREMENTAL_SESSIONIZE}


# ---------------------------------------------------------------------------
# incremental_hourly_activity — tumbling windows with WATERMARK finalization,
# the second §2.9 streaming shape next to session windows: hourly (user,
# bucket) counts accumulate as epochs arrive; when an epoch closes, every
# bucket strictly below the epoch boundary's hour is FINAL (time-ordered
# epochs mean no later event can land in it) and streams out, while the
# boundary hour's partials carry as state. Counts are additive, so the
# carried state is O(active users) partial rows — the tumbling analog of the
# session operator's open-session state. Output must equal the batch
# hourly_user_activity bit-for-bit (same SQL oracle).
# ---------------------------------------------------------------------------

_HOURLY_WORK_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("hour_bucket", pa.int64()),
    ("n_events", pa.int64()), ("kind", pa.int64()),
])
_HOURLY_OUT_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("hour_bucket", pa.int64()),
    ("n_events", pa.int64()),
])
_HOUR_US = 3_600_000_000


def _ts_epoch_bounds(ev_path: str, n_epochs: int) -> list:
    """Strict epoch boundaries (µs int64) at the ts quantiles."""
    import pyarrow.parquet as pq

    ts_all = pq.read_table(ev_path, columns=["ts"])["ts"] \
        .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    qs = np.quantile(ts_all, [i / n_epochs for i in range(1, n_epochs)])
    return [np.int64(q) for q in qs]


def _hourly_step(watermark_hour):
    """Sum partials per (user, hour); finalize (kind 2) every bucket
    strictly below the watermark hour, carry (kind 1) the rest.
    ``watermark_hour=None`` finalizes everything (last epoch)."""

    def step(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HOURLY_WORK_SCHEMA.empty_table()
        kind = t["kind"].to_numpy(zero_copy_only=False)
        live = t.filter(pa.array(kind != 2))
        done = t.filter(pa.array(kind == 2))
        parts = [done] if done.num_rows else []
        if live.num_rows:
            u = live["user_id"].to_numpy(zero_copy_only=False)
            h = live["hour_bucket"].to_numpy(zero_copy_only=False)
            n = live["n_events"].to_numpy(zero_copy_only=False)
            order = np.lexsort((h, u))
            u, h, n = u[order], h[order], n[order]
            first = np.r_[True, (u[1:] != u[:-1]) | (h[1:] != h[:-1])]
            starts = np.flatnonzero(first)
            sums = np.add.reduceat(n, starts)
            uu, hh = u[starts], h[starts]
            final = np.ones(len(uu), bool) if watermark_hour is None \
                else hh < watermark_hour
            parts.append(pa.table({
                "user_id": pa.array(uu, pa.int64()),
                "hour_bucket": pa.array(hh, pa.int64()),
                "n_events": pa.array(sums, pa.int64()),
                "kind": pa.array(np.where(final, 2, 1).astype(np.int64),
                                 pa.int64()),
            }))
        if not parts:
            return _HOURLY_WORK_SCHEMA.empty_table()
        return pa.concat_tables(
            [p.select(_HOURLY_WORK_SCHEMA.names) for p in parts]
        ).cast(_HOURLY_WORK_SCHEMA)

    return step


def incremental_hourly_activity(sf_dir: str,
                                n_epochs: int = N_EPOCHS) -> rd.Dataset:
    """(user_id, hour_bucket, n_events) — identical to the batch
    hourly_user_activity (same SQL oracle), computed over time-ordered
    micro-batches with watermark-finalized buckets and carried partials."""
    ev_path = f"{sf_dir}/events.parquet"
    n_parts = auto_partitions(ev_path)
    bounds = _ts_epoch_bounds(ev_path, n_epochs)
    base = pruned_read(ev_path, ["user_id", "ts"])

    def epoch_partials(i: int):
        lo = bounds[i - 1] if i > 0 else None
        hi = bounds[i] if i < n_epochs - 1 else None

        def pick(t: pa.Table) -> pa.Table:
            tsi = t["ts"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            m = np.ones(len(tsi), bool)
            if lo is not None:
                m &= tsi >= lo
            if hi is not None:
                m &= tsi < hi
            u = t["user_id"].to_numpy(zero_copy_only=False)[m].astype(
                np.int64)
            h = tsi[m] // _HOUR_US          # int64 floor division
            order = np.lexsort((h, u))
            u, h = u[order], h[order]
            first = np.r_[True, (u[1:] != u[:-1]) | (h[1:] != h[:-1])] \
                if len(u) else np.empty(0, bool)
            starts = np.flatnonzero(first)
            cnt = np.diff(np.r_[starts, len(u)]) if len(starts) \
                else np.empty(0, np.int64)
            return pa.table({
                "user_id": pa.array(u[starts], pa.int64()),
                "hour_bucket": pa.array(h[starts], pa.int64()),
                "n_events": pa.array(cnt.astype(np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(starts), np.int64),
                                 pa.int64()),
            })

        return base.map_batches(pick, batch_format="pyarrow",
                                zero_copy_batch=True)

    work = epoch_partials(0)
    for i in range(n_epochs):
        wm = (int(bounds[i]) // _HOUR_US) if i < n_epochs - 1 else None
        work = per_key_blocks(work, ["user_id"], _hourly_step(wm),
                              num_partitions=n_parts)
        if i < n_epochs - 1:
            work = work.materialize().union(epoch_partials(i + 1))

    def project(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["kind"], 2))
        return pa.table({"user_id": s["user_id"],
                         "hour_bucket": s["hour_bucket"],
                         "n_events": s["n_events"]})

    return work.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True)


def _sql_hourly() -> str:
    from ocrautomator_ray.functions.relational import SQL_HOURLY_ACTIVITY

    return SQL_HOURLY_ACTIVITY


SQL_INCREMENTAL_HOURLY = _sql_hourly()

QUERIES["incremental_hourly_activity"] = incremental_hourly_activity
SQL["incremental_hourly_activity"] = SQL_INCREMENTAL_HOURLY
