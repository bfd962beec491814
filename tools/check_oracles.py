#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query, compare the
Spark parquet dump under OUTDIR/<name> with the DuckDB oracle from
oracle_sql.json run against the SFDIR parquet tables. Columns sorted by
name; rows compared as sorted multisets of stringified values."""
import sys, os, json, glob
import duckdb

args = [a for a in sys.argv[1:] if a != "--allow-subset"]
allow_subset = "--allow-subset" in sys.argv[1:]
sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
outdir = args[1] if len(args) > 1 else "/tmp/verify_out"

# A Verify subset run drops a marker: its oracle_sql.json covers only the
# subset, so stale parquet from an earlier full run into the same dir
# would silently grade only the subset. Refuse unless told it's intended.
marker = f"{outdir}/_subset_run.json"
if os.path.exists(marker) and not allow_subset:
    names = json.load(open(marker))
    print(f"SUBSET-RUN {outdir} holds a Verify SUBSET run ({len(names)} queries: "
          f"{', '.join(names[:6])}{'...' if len(names) > 6 else ''}); this is NOT a "
          "full gate pass. Re-run without the marker file, or pass --allow-subset.")
    sys.exit(2)

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def rows_of(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rel.fetchall():
        out.append(tuple(canon(row[i]) for i in order))
    return sorted(cols), sorted(out)

fail = 0
for name in sorted(oracles):
    res_dir = f"{outdir}/{name}"
    if not glob.glob(f"{res_dir}/*.parquet"):
        print(f"MISSING  {name}"); fail += 1; continue
    got_cols, got = rows_of(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'"))
    try:
        exp_cols, exp = rows_of(con.sql(oracles[name]))
    except Exception as e:
        print(f"ORACLE-ERR {name}: {str(e)[:200]}"); fail += 1; continue
    if got_cols != exp_cols:
        print(f"COLS     {name}: spark={got_cols} oracle={exp_cols}"); fail += 1; continue
    if got != exp:
        print(f"ROWS     {name}: spark={len(got)} oracle={len(exp)}")
        sg, se = set(got), set(exp)
        for r in list(sg - se)[:3]: print("  spark-only:", r)
        for r in list(se - sg)[:3]: print("  oracle-only:", r)
        fail += 1; continue
    print(f"OK       {name} ({len(got)} rows)")

missing_oracle = [n for n in os.listdir(outdir)
                  if os.path.isdir(f"{outdir}/{n}") and n not in oracles]
for n in missing_oracle:
    print(f"ROWSONLY {n} (no oracle)")
sys.exit(1 if fail else 0)
