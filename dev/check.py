#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only, not part
of the shipped library): runs each oracle SQL in DuckDB against the same
parquet tables and compares with the parquet dumped by graft.Verify.

Usage: python3 dev/check.py [sfDir] [verifyOut]
(run `sbt "runMain graft.Verify <sfDir> <verifyOut>"` first)
"""
import sys, json, glob, os
import duckdb

# NOTE: run Verify into a FRESH outDir (rm -rf first) — a failed query
# leaves the previous run's parquet behind and silently compares stale.

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    d = f"{out}/{name}"
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{files[0]}'").df()
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); fails += 1; continue
    dt = {c: (str(got[c].dtype), str(want[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(want[c].dtype)}
    if dt:
        print(f"FAIL {name}: dtype mismatch {dt}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    w = want.sort_values(list(want.columns)).reset_index(drop=True)
    try:
        ok = g.equals(w)
        if not ok:  # retry with tostring compare to dodge dtype diffs
            ok = g.astype(str).equals(w.astype(str))
    except Exception:
        ok = False
    if ok:
        print(f"ok   {name}: {len(got)} rows")
    else:
        print(f"FAIL {name}: value mismatch")
        diff = (g.astype(str) != w.astype(str))
        bad = diff.any(axis=1)
        print("  spark:", g[bad].head(3).to_dict("records"))
        print("  duck :", w[bad].head(3).to_dict("records"))
        fails += 1
for name in sorted(os.listdir(out)):
    if os.path.isdir(f"{out}/{name}") and name not in oracle:
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}/*.parquet'").fetchone()[0]
        print(f"rows-only {name}: {n} rows")
print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
