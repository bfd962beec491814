#!/usr/bin/env python3
"""Oracle-portability gate: bind every oracle SQL in DuckDB (no execution
beyond planning) and fail if any RESULT column has a type whose arrow/
pandas rendering can diverge from the Spark parquet dump even when the
values are identical — the r3 hash-failure class (HUGEINT int128 vs
int64). Optionally cross-checks oracle column names against the Spark
query's columns (the driver sorts columns by name before hashing, so a
name-set mismatch is an automatic failure).

Usage: check_oracle_types.py SFDIR ORACLE_JSON [SPARK_COLS_JSON]
  ORACLE_JSON     {"query_name": "SELECT ..."} (Verify's oracle_sql.json)
  SPARK_COLS_JSON {"query_name": ["col1", "col2", ...]} (optional)
"""
import sys, os, json
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
spark_cols = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else {}

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(oracle_path))

# Types whose python/pandas canonicalization differs from the int64/
# float64/str/date types the Spark parquet side produces.
BANNED = ("HUGEINT", "DECIMAL", "INTERVAL", "TIME ZONE", "UTINYINT",
          "USMALLINT", "UINTEGER", "UBIGINT")

fail = 0
for name in sorted(oracles):
    try:
        rel = con.sql(oracles[name])
        cols, types = list(rel.columns), [str(t).upper() for t in rel.types]
    except Exception as e:
        print(f"BIND-ERR {name}: {str(e)[:200]}")
        fail += 1
        continue
    bad = [f"{c}:{t}" for c, t in zip(cols, types) if any(b in t for b in BANNED)]
    if bad:
        print(f"TYPE     {name}: {', '.join(bad)}")
        fail += 1
        continue
    if len(set(cols)) != len(cols):
        print(f"DUPCOL   {name}: {cols}")
        fail += 1
        continue
    if name in spark_cols and sorted(spark_cols[name]) != sorted(cols):
        print(f"COLS     {name}: spark={sorted(spark_cols[name])} oracle={sorted(cols)}")
        fail += 1
        continue
    print(f"OK       {name}")

extra = [n for n in spark_cols if n not in oracles]
for n in extra:
    print(f"NO-ORACLE {n} (rows-only check — every operator should have an oracle)")
    fail += 1
sys.exit(1 if fail else 0)
