#!/usr/bin/env python3
"""Time the DuckDB oracle battery — the judge's baseline side.

Runs every oracle SQL from a Verify dump's oracle_sql.json against the
given sf dir (32 threads, results materialized to a pandas frame, same
as the judge's method) and prints per-query seconds + total.

Usage: python3 tools/oracle_bench.py /root/testdata/sf0.1 /tmp/verify_out [spark_bench.json]
With a third arg (a graft.Bench JSON line), prints the spark/duckdb
ratio per query, worst first.
"""
import sys, os, json, glob, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.sql("SET threads TO 32")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
times = {}
total = 0.0
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.sql(sql).df()
        dt = time.time() - t0
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:120]}")
        continue
    times[name] = dt
    total += dt

if len(sys.argv) > 3:
    spark = json.load(open(sys.argv[3]))["queries"]
    rows = [(n, times[n], spark.get(n)) for n in times if spark.get(n)]
    rows.sort(key=lambda r: -(r[2] / r[1]))
    print(f"{'query':34s} {'duck':>7s} {'spark':>7s} {'ratio':>6s}")
    for n, d, s in rows:
        print(f"{n:34s} {d:7.2f} {s:7.2f} {s/d:6.1f}")
    st = sum(r[2] for r in rows)
    print(f"\nduckdb total {total:.1f}s; spark (same queries) {st:.1f}s; "
          f"ratio {st/total:.2f}")
else:
    for n, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{n}: {dt:.2f}")
    print(f"TOTAL {total:.1f}")
