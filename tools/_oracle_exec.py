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
    # allocation"). 32 GB default: the subprocess is the only DuckDB on the
    # box and Ray's 10×-dir sweeps leave the object store nearly idle, while
    # a 16 GB cap turns the quadratic minhash-mirror oracles spill-bound
    # (~3× the round-3 wall). Override with ORACLE_MEM for tighter boxes.
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '32GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    df = con.execute(sql).df()
    df.to_parquet(out, index=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
