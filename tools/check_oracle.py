#!/usr/bin/env python3
"""Dev-only driver mimic: compare Verify output parquet vs DuckDB oracle.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle_sql.json
entry, and compares against the Spark-written parquet with columns sorted by
name (the driver's documented normalization).

Hardened to the driver's semantics (round-1 lesson): the Spark side is read
with pyarrow directly — NOT through DuckDB, which would coerce both sides
into one type system and mask representation differences. Values compare by
their canonical string rendering with NO float64 pre-conversion, so a
DECIMAL column rendering `253942.00` against a float `253942.0` fails here
exactly like it fails the driver's hash. A value-type mismatch (Decimal vs
float) in any row is reported even when the numbers are equal.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def canon(v):
    """Canonical cell rendering: str(), which preserves Decimal scale
    (Decimal('1.00') -> '1.00') vs float ('1.0') — the distinction the
    driver's hash is sensitive to."""
    if v is None:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays/lists: not NA-checkable, fall through
    return str(v)


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if name not in oracle:
        skips.append(name)
        continue
    try:
        # arrow, not fetchdf(): fetchdf coerces DATE->Timestamp and
        # DECIMAL->object inconsistently; arrow preserves date32/decimal128
        # so the type-class check below sees what the driver sees.
        odf = con.execute(oracle[name]).fetch_arrow_table().to_pandas()
    except Exception as e:
        fails.append((name, f"oracle error: {str(e)[:200]}"))
        continue
    parts = sorted(glob.glob(f"{d}/*.parquet"))
    if not parts:
        fails.append((name, "no spark parquet output"))
        continue
    sdf = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
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
        a = sdf[c].reset_index(drop=True)
        b = odf[c].reset_index(drop=True)
        try:
            # value-type class check on the first non-null row: Decimal vs
            # float vs int mismatches fail even when values are equal
            for va, vb in zip(a, b):
                if va is None or vb is None:
                    continue
                ta, tb = type(va).__name__, type(vb).__name__
                norm = {"float32": "float", "float64": "float", "float": "float",
                        "int8": "int", "int16": "int", "int32": "int",
                        "int64": "int", "int": "int"}
                if norm.get(ta, ta) != norm.get(tb, tb):
                    bad = (f"col {c}: value-type mismatch spark={ta} "
                           f"oracle={tb} (e.g. {va!r} vs {vb!r})")
                break
            if bad:
                break
            ca, cb = a.map(canon), b.map(canon)
            if not ca.equals(cb):
                idx = ca != cb
                i = idx[idx].index[0]
                bad = (f"col {c} row {i}: spark={canon(a.iloc[i])!r} "
                       f"oracle={canon(b.iloc[i])!r} (dtypes {a.dtype}/{b.dtype})")
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
sys.exit(1 if fails else 0)
