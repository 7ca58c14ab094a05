#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each <sfDir>/*.parquet as a DuckDB view named after the table,
runs every oracle_sql.json query, and compares against the Spark result
parquet (rows sorted by all columns, column order normalized by name) —
exact match on values, which is what a hash compare implies.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
    # normalize: column order by name, row order by all columns
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
        fail += 1
        continue
    want = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(want) != len(got):
        print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
        fail += 1
        continue
    ok = True
    for c in want.columns:
        w, g = want[c], got[c]
        if w.dtype.kind == "f" or g.dtype.kind == "f":
            same = np.allclose(w.astype(float), g.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = same
        else:
            exact = w.astype(str).equals(g.astype(str))
        if not exact:
            diff = (w.astype(str) != g.astype(str))
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: col {c} differs, e.g. rows {list(idx)}: want={list(w[idx])} got={list(g[idx])}")
            ok = False
            break
    if ok:
        print(f"PASS {name} ({len(want)} rows)")
    else:
        fail += 1
print(f"\n{len(oracle) - fail}/{len(oracle)} pass")
sys.exit(1 if fail else 0)
