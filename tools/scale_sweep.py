"""Scale-correctness + spill sweep for the shuffle-heavy operator family
(VERDICT round-2 task #1): run the engine queries and their DuckDB oracles at
a scaled-up sf dir (see make_scaled_sf.py), hash-compare exactly like the
driver, time each side, and report Ray object-store spill counters.

Usage:  python tools/scale_sweep.py [--engine-only] [sf_dir] [query ...]
        (default dir /tmp/sfbig; default queries = the shuffle-heavy family)

``--engine-only`` skips the DuckDB oracle comparison — for scale probes
where the oracle itself is the bottleneck (the minhash-mirror family costs
minutes of single-node SQL per query at ≥50k docs); correctness at those
sizes is pinned by the full hash-compare at the 10× dir.

Owns its Ray session (script entrypoint, like bench.py).
"""

from __future__ import annotations

import json
import sys
import time


sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_correctness import TABLES, _canon, _hash  # noqa: E402

DEFAULT_QUERIES = [
    "minhash_lsh_dups", "minhash_dup_clusters", "neardup_removed_docs",
    "simhash_dups", "embedding_neardup", "decontaminate", "seeded_shuffle",
    "pack_sequences", "assemble_pipeline", "full_corpus_pipeline",
]


def spilled_mb() -> float:
    """Object-store spill bytes CURRENTLY on disk for this Ray session, in
    MB — the bytes sitting in the session's spilled-objects directory (the
    gRPC-backed memory_summary API needs the grpc package, absent here).
    Ray deletes spilled files once their objects are freed, so a single
    post-hoc call can miss transient spill; use ``SpillWatermark`` around a
    query to capture the high-water mark instead."""
    import glob
    import os

    import ray

    try:
        session = ray._private.worker._global_node.get_session_dir_path()
    except Exception:
        return 0.0
    total = 0
    for pat in ("ray_spilled_objects", "spill"):
        for p in glob.glob(os.path.join(session, f"**/*{pat}*/**"),
                           recursive=True):
            if os.path.isfile(p):
                try:
                    total += os.path.getsize(p)
                except OSError:  # file freed between glob and stat
                    pass
    return round(total / 1e6, 1)


class SpillWatermark:
    """Samples ``spilled_mb`` on a background thread while a query runs and
    keeps the maximum, so spill that appears and is freed mid-run still
    registers (a post-hoc scan reports 0.0 for it — false 'zero spill')."""

    def __init__(self, interval_s: float = 0.25) -> None:
        import threading

        self._interval = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.max_mb = 0.0

    def __enter__(self) -> "SpillWatermark":
        import threading

        def sample() -> None:
            while not self._stop.is_set():
                self.max_mb = max(self.max_mb, spilled_mb())
                self._stop.wait(self._interval)

        self.max_mb = spilled_mb()
        self._thread = threading.Thread(target=sample, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self.max_mb = max(self.max_mb, spilled_mb())


def main() -> int:
    import os

    import pandas as pd
    import ray

    args = [a for a in sys.argv[1:] if a != "--engine-only"]
    engine_only = "--engine-only" in sys.argv[1:]
    sf = args[0] if args else "/tmp/sfbig"
    names = args[1:] or DEFAULT_QUERIES
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()

    def oracle(sql: str) -> pd.DataFrame:
        # Run every oracle in a Ray-free SUBPROCESS (tools/_oracle_exec.py):
        # merely importing ray swaps the process allocator, under which
        # DuckDB 1.0's spill path dies with "bad allocation" on the heavy
        # media oracles at the scaled dirs even though the same SQL
        # succeeds in a clean process (same fix as check_correctness.py).
        import subprocess
        import tempfile
        exec_py = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "_oracle_exec.py")
        with tempfile.TemporaryDirectory(prefix="oracle_") as td:
            sql_file = os.path.join(td, "q.sql")
            out = os.path.join(td, "out.parquet")
            with open(sql_file, "w") as f:
                f.write(sql)
            subprocess.run([sys.executable, exec_py, sf, sql_file, out],
                           check=True)
            return pd.read_parquet(out)

    results, bad = {}, []
    for name in names:
        t0 = time.time()
        with SpillWatermark() as wm:
            res = qs[name](sf)
            df = (res.to_pandas() if hasattr(res, "to_pandas")
                  else pd.DataFrame(res))
        engine_s = round(time.time() - t0, 2)
        row = {"engine_sec": engine_s, "rows": len(df),
               "spilled_mb_peak": wm.max_mb}
        if name in osql and not engine_only:
            t0 = time.time()
            odf = oracle(osql[name])
            row["oracle_sec"] = round(time.time() - t0, 2)
            df, odf = _canon(df), _canon(odf)
            ok = (len(df) == len(odf)
                  and list(df.columns) == list(odf.columns)
                  and _hash(df) == _hash(odf))
            row["match"] = ok
            if not ok:
                bad.append(name)
        else:
            row["match"] = "rows_only"
        results[name] = row
        print(f"{name:28s} {json.dumps(row)}", flush=True)
    summary = {"sf_dir": sf, "num_cpus": cpus, "results": results,
               "peak_spilled_mb": max(
                   [r["spilled_mb_peak"] for r in results.values()] or [0.0]),
               "fails": bad}
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
