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

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_correctness import TABLES, _canon, _hash  # noqa: E402

DEFAULT_QUERIES = [
    "minhash_lsh_dups", "minhash_dup_clusters", "neardup_removed_docs",
    "simhash_dups", "embedding_neardup", "decontaminate", "seeded_shuffle",
    "pack_sequences", "assemble_pipeline", "full_corpus_pipeline",
]


def spilled_mb() -> float:
    """Cumulative object-store spill for this Ray session, in MB — measured
    as the bytes sitting in the session's spilled-objects directory (the
    gRPC-backed memory_summary API needs the grpc package, absent here)."""
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
                total += os.path.getsize(p)
    return round(total / 1e6, 1)


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
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    results, bad = {}, []
    for name in names:
        t0 = time.time()
        res = qs[name](sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        engine_s = round(time.time() - t0, 2)
        spill = spilled_mb()
        row = {"engine_sec": engine_s, "rows": len(df),
               "spilled_mb_cum": spill}
        if name in osql and not engine_only:
            t0 = time.time()
            odf = con.execute(osql[name]).df()
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
               "total_spilled_mb": spilled_mb(), "fails": bad}
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
