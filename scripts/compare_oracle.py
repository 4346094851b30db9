#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare row/schema/hash with the
Spark parquet dumps produced by graft.Verify.

Usage: python3 scripts/compare_oracle.py /root/testdata/sf0.01 /tmp/verify
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value rendering
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows

fails = []
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    sdf = pq.read_table(files[0]).to_pandas()
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    if sc != oc:
        fails.append((name, f"schema mismatch: spark={sc} oracle={oc}")); continue
    srows, orows = canon(sdf), canon(odf)
    if len(srows) != len(orows):
        fails.append((name, f"rowcount {len(srows)} vs {len(orows)}")); continue
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        fails.append((name, f"value mismatch, first diffs: {diffs}")); continue
    print(f"OK   {name} rows={len(srows)}")

# rows-only queries (no oracle)
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        files = glob.glob(f"{p}/*.parquet")
        n = pq.read_table(files[0]).num_rows if files else 0
        print(f"ROWS {d} rows={n}" + ("  <-- EMPTY" if n == 0 else ""))

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(fails)} failures / {len(oracle)} oracle queries")
