#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables, load the Spark result parquet,
sort columns by name, and compare values (exact on sorted rows).

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_r2
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spath = f"{outdir}/{name}"
    if not os.path.isdir(spath):
        print(f"{name}: MISSING spark output"); fail += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {str(e)[:200]}"); fail += 1; continue
    sdf = pd.read_parquet(spath)
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        print(f"{name}: SCHEMA {list(sdf.columns)} vs {list(odf.columns)}"); fail += 1; continue
    if len(sdf) != len(odf):
        print(f"{name}: ROWS {len(sdf)} vs {len(odf)}"); fail += 1; continue
    # The driver's hash is dtype-sensitive: a DuckDB HUGEINT arriving as
    # float64 where Spark emits int64 hash-mismatches even on identical
    # values (ate t37 in r10 and o13/t44 in r11). Mirror that here —
    # compare pandas dtype KINDS (int vs float vs bool vs object vs
    # datetime) per column and fail on any divergence.
    kinds = [(c, sdf[c].dtype.kind, odf[c].dtype.kind) for c in sdf.columns]
    dbad = [(c, s, o) for c, s, o in kinds
            if s != o and {s, o} != {"i", "u"} and not (
                {s, o} <= {"O", "U", "S"})]
    if dbad:
        print(f"{name}: DTYPE {[(c, s + ' vs ' + o) for c, s, o in dbad]}")
        fail += 1; continue
    # exact compare on row-order as returned AND on sorted rows
    ss = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
    oo = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(ss, oo, check_dtype=False, check_exact=True)
    except AssertionError as e:
        print(f"{name}: VALUE MISMATCH {str(e)[:300]}"); fail += 1; continue
    inorder = True
    try:
        pd.testing.assert_frame_equal(
            sdf.reset_index(drop=True), odf.reset_index(drop=True),
            check_dtype=False, check_exact=True)
    except AssertionError:
        inorder = False
    print(f"{name}: OK rows={len(sdf)}" + ("" if inorder else " (row order differs)"))
    ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
