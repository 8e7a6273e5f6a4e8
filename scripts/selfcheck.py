#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

For each query in oracle_sql.json: run the SQL in DuckDB over the sf
parquet tables, load the Spark parquet output, sort columns by name,
sort rows, and compare cell-by-cell (floats to 1e-9 rel tol).
"""
import json, sys, glob, math
import duckdb, pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    except Exception:
        pass

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails, okc, skip = [], 0, 0
for name in sorted(glob.glob(f"{OUT}/*/")):
    qname = name.rstrip("/").split("/")[-1]
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{name}/*.parquet")],
                         ignore_index=True) if glob.glob(f"{name}/*.parquet") else pd.DataFrame()
    if qname not in oracle:
        skip += 1
        print(f"  [rows-only] {qname}: {len(spark_df)} rows " +
              ("OK" if len(spark_df) > 0 else "EMPTY!"))
        if len(spark_df) == 0:
            fails.append((qname, "rows-only check returned 0 rows"))
        continue
    try:
        ora_df = con.execute(oracle[qname]).df()
    except Exception as e:
        fails.append((qname, f"oracle SQL error: {e}")); continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = ora_df.reindex(sorted(ora_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        fails.append((qname, f"columns differ: {list(a.columns)} vs {list(b.columns)}")); continue
    if len(a) != len(b):
        fails.append((qname, f"row counts differ: {len(a)} vs {len(b)}")); continue
    # normalize types then sort rows for order-free compare
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    a, b = norm(a), norm(b)
    bad = None
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            av = pd.to_numeric(av, errors='coerce'); bv = pd.to_numeric(bv, errors='coerce')
            m = ~((av - bv).abs() <= 1e-9 * (1 + bv.abs())) & ~(av.isna() & bv.isna())
        else:
            m = (av.astype(str) != bv.astype(str))
        if m.any():
            i = m.idxmax(); bad = f"col {c} row {i}: spark={a[c][i]!r} oracle={b[c][i]!r}"; break
    if bad: fails.append((qname, bad))
    else:
        okc += 1
        print(f"  [MATCH]     {qname}: {len(a)} rows")

print(f"\n{okc} oracle-matched, {skip} rows-only, {len(fails)} FAILED")
for q, why in fails: print(f"  FAIL {q}: {why}")
sys.exit(1 if fails else 0)
