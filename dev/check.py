#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only, not part
of the shipped library): runs each oracle SQL in DuckDB against the same
parquet tables and compares with the parquet dumped by graft.Verify.

DRIVER SCALES (r15-proven, see SURVEY §6): the driver's CORRECTNESS
gate runs at **sf0.01** (its row counts match the sf0.01 shapes
exactly) and its BENCH at sf0.1 — so any driver-red adjudication
mimics the gate at sf0.01 FIRST, then widens to sf0.1.

Usage: python3 dev/check.py [sfDir] [verifyOut]
(run `sbt "runMain graft.Verify <sfDir> <verifyOut>"` first)
"""
import sys, json, glob, os, tempfile
import duckdb

STRICT = "--strict" in sys.argv
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]


def strict_type_diff(spark_parquet, oracle_sql, con, scratch):
    """Compare PARQUET-LEVEL logical types (via arrow schemas), not
    pandas dtypes: pandas renders both DECIMAL(38,0) and BIGINT as
    object/int64-ish frames, so a presentation-type divergence (the
    e21 driver-hash red) slips through the lax compare. Strict mode
    dumps the oracle result to parquet through DuckDB and diffs the
    two files' arrow types per column name."""
    import pyarrow.parquet as pq
    want_path = os.path.join(scratch, "want.parquet")
    con.execute(f"COPY ({oracle_sql}) TO '{want_path}' (FORMAT PARQUET)")
    def norm(t):
        s = str(t)
        return {"large_string": "string"}.get(s, s)
    gs = {f.name: norm(f.type) for f in pq.read_schema(spark_parquet)}
    ws = {f.name: norm(f.type) for f in pq.read_schema(want_path)}
    return {c: (gs.get(c), ws.get(c))
            for c in sorted(set(gs) | set(ws)) if gs.get(c) != ws.get(c)}


def strict_selftest():
    """Planted twin: DECIMAL(38,0) vs BIGINT must be red in strict mode."""
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        a = os.path.join(d, "a.parquet")
        con.execute(f"COPY (SELECT CAST(42 AS DECIMAL(38,0)) AS x) TO '{a}' (FORMAT PARQUET)")
        diff = strict_type_diff(a, "SELECT CAST(42 AS BIGINT) AS x", con, d)
        assert diff == {"x": ("decimal128(38, 0)", "int64")}, diff
        same = strict_type_diff(a, "SELECT CAST(42 AS DECIMAL(38,0)) AS x", con, d)
        assert same == {}, same
    print("strict selftest: planted decimal-vs-bigint twin is red, identical twin green")


if "--selftest" in sys.argv:
    strict_selftest()
    sys.exit(0)

# NOTE: run Verify into a FRESH outDir (rm -rf first) — a failed query
# leaves the previous run's parquet behind and silently compares stale.

sf = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
out = ARGS[1] if len(ARGS) > 1 else "/tmp/verify_out"
scratch = tempfile.mkdtemp(prefix="check_strict_")

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
    if STRICT:
        tdiff = strict_type_diff(files[0], oracle[name], con, scratch)
        if tdiff:
            print(f"FAIL {name}: parquet logical-type mismatch {tdiff}")
            fails += 1
            continue
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
