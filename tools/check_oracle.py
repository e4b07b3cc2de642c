#!/usr/bin/env python3
"""Dev-only driver mimic: compare Verify output parquet vs DuckDB oracle.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle_sql.json
entry, and compares against the Spark-written parquet with columns sorted by
name (the driver's documented normalization). Reports row/column/value
mismatches per query.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if name not in oracle:
        skips.append(name)
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {str(e)[:200]}"))
        continue
    sdf = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    if sc != oc:
        fails.append((name, f"columns differ: spark={sc} oracle={oc}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"rowcount differ: spark={len(sdf)} oracle={len(odf)}"))
        continue
    sdf, odf = sdf[sc], odf[sc]
    bad = None
    for c in sc:
        a, b = sdf[c], odf[c]
        try:
            import pandas as pd
            if not a.reset_index(drop=True).astype(str).equals(
                   b.reset_index(drop=True).astype(str)):
                idx = (a.reset_index(drop=True).astype(str) !=
                       b.reset_index(drop=True).astype(str))
                i = idx[idx].index[0]
                bad = f"col {c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} (dtypes {a.dtype}/{b.dtype})"
                break
        except Exception as e:
            bad = f"col {c} compare error: {e}"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

print(f"PASS {len(passes)} / FAIL {len(fails)} / rows-only {len(skips)}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
for n in skips:
    print(f"ROWS-ONLY {n}")
