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
    # --json PATH: also write a driver-shaped correctness JSON
    # ({name: {rows_match, schema_match, hash_match, ...}}) so
    # tools/update_coverage.py can derive COVERAGE.md's Oracle column
    # from a LOCAL gate run between driver rounds. hash_match locally =
    # value equality AND per-column dtype equality (the driver's hash
    # is type-sensitive: round 3's only red row was a DuckDB HUGEINT vs
    # Spark BIGINT divergence with identical values).
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: oracle_check.py [--json REPORT.json] <sfDir> <verifyOutDir>")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    report = {}
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fail = 0
    names = [os.path.basename(d) for d in sorted(glob.glob(f"{out_dir}/*")) if os.path.isdir(d)]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        # every pre-compare failure must still land in the report —
        # an omitted key would leave a stale COVERAGE.md cell green
        if not files:
            print(f"FAIL {name}: no spark output parquet"); fail += 1
            report[name] = {"rows_match": False, "schema_match": False, "hash_match": False}
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
            if len(spark_df) == 0: print(f"WARN {name}: 0 rows")
            # distinct verdict (not a bare omission): lets
            # update_coverage.py flag the COVERAGE.md cell instead of
            # silently preserving a stale green mark if a query's
            # oracle is ever removed
            report[name] = {"oracle_present": False, "spark_rows": len(spark_df)}
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1
            report[name] = {"rows_match": False, "schema_match": False, "hash_match": False}
            continue
        errs = compare(name, spark_df, oracle_df)
        schema_match = sorted(spark_df.columns) == sorted(oracle_df.columns)
        dtype_errs = []
        if schema_match:
            # only NUMERIC-kind mismatches are flagged (int64 vs float64,
            # int64 vs object-wrapped HUGEINT); date/string columns read
            # back under different-but-equivalent pandas dtypes from
            # pyarrow vs duckdb and are covered by the value compare
            num = set("iuf")
            for c in sorted(spark_df.columns):
                sk, ok_ = spark_df[c].dtype.kind, oracle_df[c].dtype.kind
                if (sk in num or ok_ in num) and sk != ok_:
                    dtype_errs.append(
                        f"col {c}: dtype kind spark={spark_df[c].dtype} oracle={oracle_df[c].dtype}")
        if dtype_errs and not errs:
            # values match but types don't — the driver's hash would
            # still diverge (round-3 x9 lesson), so fail it here too
            errs = dtype_errs
        report[name] = {
            "rows_match": len(spark_df) == len(oracle_df),
            "schema_match": schema_match,
            "hash_match": not errs,
            "spark_rows": len(spark_df),
            "oracle_rows": len(oracle_df),
        }
        if errs:
            print(f"FAIL {name}:"); [print(f"   {e}") for e in errs]; fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows, {len(spark_df.columns)} cols)")
    missing = set(oracle) - set(names)
    for m in missing:
        print(f"FAIL {m}: oracle present but no query output"); fail += 1
        report[m] = {"rows_match": False, "schema_match": False, "hash_match": False}
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
