#!/usr/bin/env python3
"""Slow-gate oracle-independence check (r9 ADVICE).

For every key in oracle_sql_slow.json (the retired brute-force O(n^2)
oracle formulations preserved by graft.SlowOracles), runs BOTH the live
oracle SQL and the retired brute-force SQL in DuckDB over the same
testdata and EXCEPT-ALLs them both ways. Catches drift between the
inverted-index/SymSpell rewrites (which structurally mirror the engine)
and the original independent brute force.

Usage: python3 tools/oracle_ab.py [sfDir] [verifyOutDir]

verifyOutDir must contain oracle_sql.json + oracle_sql_slow.json (a
SPARK_GRAFT_ONLY=__none__ run of graft.Verify dumps both in seconds
without executing any query). sf0.001/sf0.01 complete in seconds; the
brute side at sf0.1 is the patient run (minutes+) — that slowness is
why this is a gate, not the live oracle.

Developer tooling only — not part of the shipped library.
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    live = json.load(open(f"{outdir}/oracle_sql.json"))
    slow = json.load(open(f"{outdir}/oracle_sql_slow.json"))
    bad = 0
    for name in sorted(slow):
        if name not in live:
            print(f"MISS  {name}: in slow map but has no live oracle")
            bad += 1
            continue
        t0 = time.time()
        try:
            con.sql(f"CREATE OR REPLACE VIEW __live AS ({live[name]})")
            con.sql(f"CREATE OR REPLACE VIEW __slow AS ({slow[name]})")
            n_live = con.sql("SELECT count(*) FROM __live").fetchone()[0]
            n_slow = con.sql("SELECT count(*) FROM __slow").fetchone()[0]
            d1 = con.sql("SELECT count(*) FROM (SELECT * FROM __live EXCEPT ALL SELECT * FROM __slow)").fetchone()[0]
            d2 = con.sql("SELECT count(*) FROM (SELECT * FROM __slow EXCEPT ALL SELECT * FROM __live)").fetchone()[0]
        except Exception as e:
            print(f"ERR   {name}: {e}")
            bad += 1
            continue
        dt = time.time() - t0
        if d1 == 0 and d2 == 0 and n_live == n_slow:
            print(f"OK    {name}  rows={n_live}  ({dt:.1f}s)")
        else:
            print(f"DIFF  {name}  live={n_live} slow={n_slow} "
                  f"live-only={d1} slow-only={d2}  ({dt:.1f}s)")
            bad += 1
    print(f"{'FAIL' if bad else 'PASS'}: {len(slow) - bad}/{len(slow)} equivalent at {sfdir}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
