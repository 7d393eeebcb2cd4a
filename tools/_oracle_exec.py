"""Run one DuckDB oracle query in a clean subprocess.

Usage: python tools/_oracle_exec.py <sf_dir> <sql_file> <out_parquet>

Why a subprocess: merely ``import ray`` swaps the process allocator (the
bundled _raylet.so brings its own malloc), and under that allocator DuckDB
1.0's buffer-eviction path dies with "Failed to allocate block ... (bad
allocation)" at a few-GB RSS on the spill-heavy media oracles — the same
SQL succeeds in a Ray-free process. So the sweep harnesses execute every
oracle here, in a process that never imports ray, and read the result back
as parquet (dtype-faithful for DuckDB's int64/float64/str/timestamp
outputs).
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    sf, sql_file, out = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(sql_file) as f:
        sql = f.read()
    con = duckdb.connect()
    # Capped + a spill dir that MUST pre-exist (DuckDB 1.0 does not create
    # temp_directory, and a failed eviction also surfaces as "bad
    # allocation"). Default cap = 70% of MemAvailable: a cap well below the
    # quadratic minhash-mirror oracles' working set is WORSE than none —
    # at the 10× dir a 48 GB cap spilled 68 GB to disk in 30 min without
    # finishing, while the same query fits in RAM on this box. The
    # subprocess is the only DuckDB running and the engine's Ray session is
    # idle between oracles, so most of the box is genuinely available.
    # Override with ORACLE_MEM for tighter boxes.
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    cap = os.environ.get("ORACLE_MEM")
    if not cap:
        with open("/proc/meminfo") as f:
            kb = {l.split(":")[0]: int(l.split()[1]) for l in f
                  if l.startswith(("MemAvailable", "MemTotal",
                                   "CommitLimit"))}
        avail_gb = kb.get("MemAvailable", kb["MemTotal"]) // (1 << 20)
        cap_gb = int(avail_gb * 0.7)
        # This box enforces CommitLimit (63 GB) well below MemTotal
        # (125 GB): a cap above it dies with 'bad allocation' /
        # 'failed to map segment' instead of spilling — deterministic
        # overcommit, not flakiness. Leave ~8 GB of commit headroom for
        # the harness's Ray session and this interpreter.
        if "CommitLimit" in kb:
            cap_gb = min(cap_gb, max(8, kb["CommitLimit"] // (1 << 20) - 8))
        cap = f"{max(8, cap_gb)}GB"
    con.execute(f"SET memory_limit='{cap}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    df = con.execute(sql).df()
    df.to_parquet(out, index=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
