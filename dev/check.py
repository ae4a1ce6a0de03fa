#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the engine): run graft.Verify at a given SF, then run each oracle SQL in
DuckDB over the same parquet tables and compare values exactly.

Usage: python3 dev/check.py [sfdir] [--skip-verify] [names...]
"""
import sys, os, json, subprocess, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    args = [a for a in sys.argv[1:]]
    sf = args[0] if args and not a_flag(args[0]) else "/root/testdata/sf0.001"
    args = [a for a in args if a != sf]
    skip = "--skip-verify" in args
    names = [a for a in args if not a_flag(a)]
    out = "/tmp/verify_out"

    if not skip:
        r = subprocess.run(["sbt", "-batch", f"runMain graft.Verify {sf} {out}"],
                           cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-3000:])
        if r.returncode != 0:
            sys.stdout.write(r.stderr[-3000:])
            sys.exit(1)

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if names and name not in names:
            continue
        if not os.path.isdir(f"{out}/{name}"):
            print(f"FAIL {name}: no spark output written"); n_fail += 1; continue
        try:
            sdf = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            s_cols, s_rows = [d[0] for d in sdf.description], sdf.fetchall()
            odf = con.execute(sql)
            o_cols, o_rows = [d[0] for d in odf.description], odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1; continue
        # driver sorts columns by name; emulate, then sort rows
        s_idx = [s_cols.index(c) for c in sorted(s_cols)]
        o_idx = [o_cols.index(c) for c in sorted(o_cols)]
        key = lambda r: tuple((v is None, str(type(v)), str(v)) for v in r)
        s_sorted = sorted([tuple(r[i] for i in s_idx) for r in s_rows], key=key)
        o_sorted = sorted([tuple(r[i] for i in o_idx) for r in o_rows], key=key)
        if len(s_sorted) != len(o_sorted):
            print(f"FAIL {name}: rows spark={len(s_sorted)} oracle={len(o_sorted)}")
            n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
            if not rows_eq(a, b):
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            # Decimal-typed outputs are a DRIVER-HASHER hazard even when
            # this value comparison passes: both sides flow through DuckDB
            # here, so a Spark-parquet-vs-DuckDB decimal REPRESENTATION gap
            # is invisible locally (the r16 events_funnel_keys/stream_funnel
            # red rows). Flag them as failures so decimal never reaches a
            # gate output again — cast to VARCHAR/BIGINT instead.
            import decimal
            # scan EVERY row: a nullable decimal column (the funnel-key
            # shape) is NULL in the first-sorted depth-1 rows, so a
            # first-row check misses exactly the class that motivated
            # this guard
            dec_cols = sorted({sorted(s_cols)[j]
                               for rows in (s_sorted, o_sorted)
                               for r in rows
                               for j, v in enumerate(r)
                               if isinstance(v, decimal.Decimal)})
            if dec_cols:
                print(f"FAIL {name}: DECIMAL gate-output hazard in cols "
                      f"{dec_cols} — values match locally but the driver "
                      f"hasher canonicalizes Spark vs DuckDB decimals "
                      f"differently; cast to VARCHAR or BIGINT on both sides")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_sorted)} rows)")
                n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

def a_flag(a):
    return a.startswith("--")

def rows_eq(a, b):
    # Mirror the driver's hash semantics: values are hashed typed, so a
    # Decimal on one side vs a float on the other is a MISMATCH even when
    # numerically equal. No lenient str() fallback (it masked the round-1/2
    # DecimalType failures).
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None and y is None:
            continue
        if (x is None) != (y is None):
            return False
        if type(x) is not type(y):
            # int vs float vs Decimal vs str are all distinct to the hasher
            return False
        if isinstance(x, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if x != y:
                return False
        elif x != y:
            return False
    return True

if __name__ == "__main__":
    main()
