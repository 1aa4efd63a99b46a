#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each SparkEntry query result (parquet written by graft.Verify),
runs the corresponding oracle SQL in DuckDB over the same testdata, and
compares: row count, schema (column names sorted), and values.
This is developer tooling only — not part of the shipped library.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    import time, os
    t0 = time.time()
    progress = os.environ.get("CHECK_PROGRESS")
    for name in sorted(oracle):
        if progress:
            print(f"[{time.time() - t0:7.1f}s] {name}", file=sys.stderr, flush=True)
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        a, b = canon(got), canon(exp)
        probs = []
        if len(a) != len(b):
            probs.append(f"rows {len(a)} != {len(b)}")
        if list(a.columns) != list(b.columns):
            probs.append(f"cols {list(a.columns)} != {list(b.columns)}")
        elif len(a) == len(b):
            if not a.equals(b):
                bad = [c for c in a.columns
                       if not a[c].equals(b[c])]
                for c in bad:
                    neq = (a[c].astype(str) != b[c].astype(str))
                    n = int(neq.sum())
                    i = neq.idxmax()
                    probs.append(f"col {c}: {n} diffs (dtype {a[c].dtype} vs {b[c].dtype}); first at row {i}: {a[c][i]!r} vs {b[c][i]!r}")
            if [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
                dt = [(c, str(x), str(y)) for c, x, y in
                      zip(a.columns, a.dtypes, b.dtypes) if str(x) != str(y)]
                probs.append(f"dtypes {dt}")
        results[name] = "OK" if not probs else "; ".join(probs)
    # rows-only keys (no oracle): report row counts
    for d in sorted(glob.glob(f"{outdir}/q_*")):
        name = d.split("/")[-1]
        if name in oracle:
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            results[name] = f"rows-only: {n} rows"
        except Exception as e:
            results[name] = f"rows-only READ ERROR: {e}"
    w = max(len(k) for k in results)
    nok = 0
    for k in sorted(results):
        status = results[k]
        mark = "PASS" if status == "OK" else ("....." if status.startswith("rows-only") else "FAIL")
        if mark == "FAIL":
            nok += 1
        print(f"{mark}  {k:<{w}}  {status}")
    print(f"\n{nok} failing oracle checks / {len(oracle)} oracles / {len(results)} queries")
    sys.exit(1 if nok else 0)

if __name__ == "__main__":
    main()
