#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the engine's parquet dump, sort columns by
name + rows, and diff."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify-out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    try:
        got = pq.read_table(glob.glob(f"{out_dir}/{name}/*.parquet")[0]).to_pandas()
    except Exception as e:
        print(f"FAIL {name}: engine output missing: {e}")
        fails += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails += 1
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fails += 1
        continue
    # normalize dtypes for compare
    exp = exp.astype(str)
    got = got.astype(str)
    if not exp.equals(got):
        diff = (exp != got).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} differing rows; first:")
        idx = diff[diff].index[:3]
        for i in idx:
            print("  engine:", got.loc[i].to_dict())
            print("  oracle:", exp.loc[i].to_dict())
        fails += 1
    else:
        print(f"OK   {name} ({len(exp)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
