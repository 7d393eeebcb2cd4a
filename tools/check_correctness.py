"""Driver-mimic correctness check: run every ``queries()`` entry at an sf dir
and compare against ``oracle_sql()`` through DuckDB the way the driver does —
columns sorted by name, rows sorted, values hashed. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(sorted(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            col = col.round(6)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()


def _oracle_subprocess(sf: str, sql: str) -> pd.DataFrame:
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


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    def oracle(sql: str) -> pd.DataFrame:
        # Run every oracle in a Ray-free SUBPROCESS (tools/_oracle_exec.py):
        # merely importing ray swaps the process allocator, under which
        # DuckDB 1.0's spill path dies with "bad allocation" on the heavy
        # media oracles at the scaled dirs even though the same SQL
        # succeeds in a clean process. A fresh process per query also
        # releases all buffer-pool state between the 100+ sweep queries.
        return _oracle_subprocess(sf, sql)

    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        res = fn(sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        if name not in osql:
            print(f"{name:32s} rows={len(df):7d}  (no oracle)")
            continue
        odf = oracle(osql[name])
        df, odf = _canon(df), _canon(odf)
        rows = len(df) == len(odf)
        schema = list(df.columns) == list(odf.columns)
        # NO dtype coercion: the driver hashes raw values, so an int64 engine
        # column vs a float64 oracle column (DuckDB HUGEINT sums) must FAIL
        # here too, not be masked by an astype.
        hm = rows and schema and _hash(df) == _hash(odf)
        status = "OK" if (rows and schema and hm) else "FAIL"
        print(f"{name:32s} rows={len(df):7d}/{len(odf):<7d} schema={schema} "
              f"hash={hm}  {status}")
        if status == "FAIL":
            bad.append(name)
            if not schema:
                print("   engine cols:", list(df.columns))
                print("   oracle cols:", list(odf.columns))
            elif rows:
                for c in df.columns:
                    a = df[c].to_numpy()
                    b = odf[c].to_numpy()
                    try:
                        eq = (pd.Series(a) == pd.Series(b)).all()
                    except Exception:
                        eq = False
                    if not eq:
                        print(f"   first col diff: {c}: {a[:3]} vs {b[:3]} "
                              f"dtypes {df[c].dtype}/{odf[c].dtype}")
                        break
    print("FAILS:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
