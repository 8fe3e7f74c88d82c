#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
same parquet fixtures, loads the Spark result parquet written by
graft.Verify, and compares: columns sorted by name, rows sorted by all
columns, exact value equality (with a small report of near-miss float
deltas to catch rounding hazards early).

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import json
import math
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(out_dir, name):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if x is None and y is None:
                continue
            try:
                if pd.isna(x) and pd.isna(y):
                    continue
            except (TypeError, ValueError):
                pass
            if isinstance(x, float) or isinstance(y, float):
                if x != y:
                    if isinstance(x, float) and isinstance(y, float) and \
                            math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                        return f"FLOAT-NEAR col={c} row={i}: {x!r} vs {y!r}"
                    return f"VALUE col={c} row={i}: {x!r} vs {y!r}"
            elif x != y:
                return f"VALUE col={c} row={i}: {x!r} vs {y!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_ok = n_fail = n_rows_only = 0
    result_dirs = [d for d in sorted(os.listdir(out_dir))
                   if os.path.isdir(os.path.join(out_dir, d))]
    for name in result_dirs:
        spark_df = load_spark_result(out_dir, name)
        if spark_df is None:
            print(f"  {name}: NO SPARK OUTPUT"); n_fail += 1
            continue
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_df)} rows)")
            n_rows_only += 1
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_fail += 1
            continue
        diff = compare(name, spark_df, duck_df)
        if diff:
            print(f"  {name}: MISMATCH {diff} ({len(spark_df)} rows)"); n_fail += 1
        else:
            print(f"  {name}: OK ({len(spark_df)} rows)"); n_ok += 1
    missing = set(oracles) - set(result_dirs)
    for name in sorted(missing):
        print(f"  {name}: ORACLE BUT NO RESULT DIR"); n_fail += 1
    print(f"== {n_ok} ok, {n_rows_only} rows-only, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
