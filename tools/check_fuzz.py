#!/usr/bin/env python3
"""Differential-testing driver, DuckDB side (VERDICT r10 #1).

Usage: check_fuzz.py <sfDir> <fuzzJsonl> [--show N]

Replays every query from graft.Fuzz's JSONL output in DuckDB over the same
parquet tables and compares the order-insensitive canonical digest
(cell canon -> per-row md5 -> sorted row-md5s + "|" + count -> md5; must
match graft.Fuzz exactly). Exit 1 on any divergence; prints the SQL and
both engines' evidence for triage.
"""
import sys, json, hashlib, datetime
from decimal import Decimal

import duckdb

sf_dir, path = sys.argv[1], sys.argv[2]
show = int(sys.argv[sys.argv.index("--show") + 1]) if "--show" in sys.argv else 5

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
# Fuzz-only extension views (grammar v2) — DuckDB twins of
# graft.Fuzz.registerFuzzViews. Dialect-specific projections, semantically
# pinned: props.k as BIGINT, embedding length (len vs size — no shared
# name), float32 elements exactified float→double→*1e6→FLOOR (IEEE-exact
# in both engines).
con.execute(
    f"CREATE VIEW events_x AS SELECT event_id, ts, user_id, event_type, "
    f"value, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k "
    f"FROM '{sf_dir}/events.parquet'")
_es = ", ".join(
    f"CAST(FLOOR(CAST(list_extract(embedding, {i}) AS DOUBLE) * 1000000 "
    f"+ 0.5) AS BIGINT) AS e{i}" for i in range(1, 5))
con.execute(
    f"CREATE VIEW emb_x AS SELECT vec_id, label, len(embedding) AS dim, "
    f"{_es} FROM '{sf_dir}/embeddings.parquet'")

SEP = "\x1f"


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.datetime):
        return v.date().isoformat()  # DATE comes back as datetime sometimes
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        # HUGEINT sums arrive as int; a Decimal here means a fractional
        # type escaped the generator's integer-exact domain — loud error
        raise TypeError(f"decimal cell escaped the fuzz domain: {v!r}")
    if isinstance(v, float):
        raise TypeError(f"float cell escaped the fuzz domain: {v!r}")
    return str(v)


def digest(rows):
    hs = sorted(
        hashlib.md5(SEP.join(cell(c) for c in r).encode()).hexdigest()
        for r in rows)
    return (hashlib.md5(("\n".join(hs) + "|" + str(len(rows))).encode())
            .hexdigest(), hs[:3])


def known_dialect(rec, rows):
    """Documented upstream-Spark deviations from the DuckDB/standard
    behavior — classified, counted, and NOT failed.

    1. Grouping sets over EMPTY input: the SQL standard's () grouping set
       behaves like an ungrouped aggregate (one grand-total row); DuckDB
       and PostgreSQL emit it, Spark 4.1 emits zero rows (the Expand-based
       plan groups by grouping_id, so an empty input yields no groups).
       Tight signature: Spark returned 0 rows, DuckDB exactly one row whose
       every cell is NULL (group keys, SUM/MIN/MAX of nothing) or 0
       (COUNT of nothing), and the query used ROLLUP/CUBE/GROUPING SETS.
       Pinned as expected behavior in FuzzSpec.
    """
    if (rec["rows"] == 0 and len(rows) == 1
            and any(k in rec["sql"] for k in ("ROLLUP(", "CUBE(",
                                              "GROUPING SETS"))
            and all(c is None or c == 0 for c in rows[0])):
        return "empty-input-grouping-sets"
    return None


n = passed = 0
fails, errors, spark_errs, dialect = [], [], [], []
for line in open(path):
    rec = json.loads(line)
    n += 1
    if "err" in rec:
        spark_errs.append(rec)
        continue
    try:
        rows = con.execute(rec["sql"]).fetchall()
    except Exception as e:
        errors.append((rec, f"duckdb error: {str(e)[:300]}"))
        continue
    try:
        d, sample = digest(rows)
    except TypeError as e:
        errors.append((rec, str(e)))
        continue
    if d == rec["digest"]:
        passed += 1
    else:
        kd = known_dialect(rec, rows)
        if kd:
            dialect.append((rec, kd))
        else:
            fails.append((rec, len(rows), sample))

print(f"FUZZ {n} queries: PASS {passed} / DIVERGE {len(fails)} / "
      f"KNOWN-DIALECT {len(dialect)} / "
      f"DUCK-ERR {len(errors)} / SPARK-ERR {len(spark_errs)}")
for rec, kd in dialect[:show]:
    print(f"KNOWN-DIALECT seed={rec['seed']}: {kd}")
for rec, dn, sample in fails[:show]:
    print(f"\n== DIVERGENCE seed={rec['seed']} "
          f"spark_rows={rec['rows']} duck_rows={dn}")
    print(f"   spark_sample={rec.get('sample','')}")
    print(f"   duck_sample={','.join(sample)}")
    print(f"   SQL: {rec['sql']}")
for rec, msg in errors[:show]:
    print(f"\n== ERROR seed={rec['seed']}: {msg}\n   SQL: {rec['sql']}")
for rec in spark_errs[:show]:
    print(f"\n== SPARK-ERR seed={rec['seed']}: {rec['err']}\n   SQL: {rec['sql']}")
sys.exit(1 if (fails or errors or spark_errs) else 0)
