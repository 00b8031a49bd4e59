#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (graft.Verify output), runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and compares: row count, column names (sorted), and per-value equality after
sorting rows by all columns. Exit 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None and not (isinstance(v, float) and np.isnan(v)) else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last").reset_index(drop=True)
    return df

def compare(name, spark_df, oracle_df):
    errs = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        errs.append(f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return errs
    if len(spark_df) != len(oracle_df):
        errs.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = canon(spark_df), canon(oracle_df)
    n = min(len(a), len(b))
    for c in a.columns:
        av, bv = a[c].iloc[:n], b[c].iloc[:n]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            neq = ~((av.astype(object) == bv.astype(object)) | (av.isna() & bv.isna()))
        if neq.any():
            i = int(np.argmax(neq.values))
            errs.append(f"col {c}: {int(neq.sum())} diffs, first at row {i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}")
    return errs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fail = 0
    names = [os.path.basename(d) for d in sorted(glob.glob(f"{out_dir}/*")) if os.path.isdir(d)]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet"); fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
            if len(spark_df) == 0: print(f"WARN {name}: 0 rows")
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
        errs = compare(name, spark_df, oracle_df)
        if errs:
            print(f"FAIL {name}:"); [print(f"   {e}") for e in errs]; fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows, {len(spark_df.columns)} cols)")
    missing = set(oracle) - set(names)
    for m in missing:
        print(f"FAIL {m}: oracle present but no query output"); fail += 1
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
