#!/usr/bin/env python3
"""Oracle-SQL dtype lint — kills the HUGEINT bug class for good.

DuckDB silently widens SUM(BIGINT) to HUGEINT (and exact division to
DECIMAL); pandas then materializes those columns as float64/object while
the Spark side emits int64, so the driver's dtype-sensitive hash gate
fails even when every value matches. This bit t37 (round 10) and
o13/t44 (round 11). The lint DESCRIBEs every oracle SQL against the
real testdata views and fails on any HUGEINT / UHUGEINT / DECIMAL
output column, so the bug class can't reach the gate again.

Usage: python3 tools/oracle_lint.py <oracle_sql.json> <sf_dir>
Exit 0 = clean; 1 = at least one offending column (listed on stdout).
"""
import sys, os, json, glob
import duckdb

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

oracle_path, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(oracle_path))
bad = err = 0
for name, sql in sorted(oracle.items()):
    try:
        desc = con.sql(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        print(f"{name}: DESCRIBE ERROR {str(e)[:200]}")
        err += 1
        continue
    offending = [(c, t) for c, t, *_ in desc
                 if any(b in t.upper() for b in BANNED)]
    if offending:
        bad += 1
        for c, t in offending:
            print(f"{name}: column '{c}' is {t} — cast it (HUGEINT/DECIMAL "
                  f"crosses the pandas hash boundary as float64/object; "
                  f"Spark emits int64)")
print(f"{len(oracle)} oracles linted, {bad} with banned dtypes, {err} errors")
sys.exit(1 if (bad or err) else 0)
