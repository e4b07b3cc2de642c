#!/usr/bin/env python3
"""Dev-only: time the DuckDB oracle SQL per query at a given SF.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [threads]
Prints one JSON line {query: seconds} plus a total — the DuckDB side of the
"within 2x of BASELINE" gate.
"""
import sys, json, time
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
con = duckdb.connect()
con.execute(f"SET threads TO {threads}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
times, failures = {}, {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        failures[name] = str(e)[:120]
        times[name] = -1
total = sum(v for v in times.values() if v > 0)
print(json.dumps({"total": round(total, 2), "queries": times,
                  "failures": failures, "sf": sf_dir, "threads": threads}))
