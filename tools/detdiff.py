#!/usr/bin/env python3
"""Determinism audit: EXCEPT ALL both ways between two Verify out-dirs.

Usage: python3 tools/detdiff.py /tmp/cert_v1 /tmp/cert_v2
Prints per-query row diffs; exits non-zero if any query differs.
Developer tooling only — not part of the shipped library.
"""
import sys, glob, os
import duckdb

def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(os.path.basename(p) for p in glob.glob(f"{a}/q_*"))
    bad = 0
    for name in names:
        fa, fb = f"{a}/{name}/*.parquet", f"{b}/{name}/*.parquet"
        if not glob.glob(f"{b}/{name}/") :
            print(f"MISS  {name} absent in {b}")
            bad += 1
            continue
        try:
            d1 = con.sql(
                f"SELECT count(*) FROM (SELECT * FROM read_parquet('{fa}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{fb}'))").fetchone()[0]
            d2 = con.sql(
                f"SELECT count(*) FROM (SELECT * FROM read_parquet('{fb}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{fa}'))").fetchone()[0]
        except Exception as e:
            print(f"ERR   {name}: {e}")
            bad += 1
            continue
        if d1 or d2:
            print(f"DIFF  {name}: {d1} / {d2} rows")
            bad += 1
    print(f"{len(names) - bad}/{len(names)} value-identical")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
