#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle gate.

Runs each oracle SQL from Verify's oracle_sql.json against DuckDB views over
the same parquet tables, loads the Spark-side parquet result, normalizes
(sort columns by name, sort rows), and compares values exactly.

Usage: python3 tools/check_oracle.py [sfdir] [verify_outdir]
"""
import duckdb, glob, json, os, sys
import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(sf + "/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(out + "/oracle_sql.json"))


def norm(df):
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


n_pass = n_fail = 0
for name in sorted(oracle):
    try:
        spark_df = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {e}")
        n_fail += 1
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
        n_fail += 1
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        n_fail += 1
        continue
    bad = []
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(float), bv.astype(float)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}: row{i} {av[i]!r} != {bv[i]!r} (maxdiff {np.nanmax(np.abs(av-bv))})")
        else:
            eq = (a[c].astype(str) == b[c].astype(str)) | (a[c].isna() & b[c].isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                bad.append(f"{c}: row{i} {a[c].iloc[i]!r} != {b[c].iloc[i]!r}")
        # dtype advisory
        if str(a[c].dtype) != str(b[c].dtype):
            bad.append(f"{c}: DTYPE spark={a[c].dtype} duck={b[c].dtype}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:4]))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1

missing = [n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n)) and n not in oracle]
if missing:
    print("no-oracle (rows-only):", ", ".join(sorted(missing)))
print(f"== {n_pass} pass, {n_fail} fail ==")
sys.exit(1 if n_fail else 0)
