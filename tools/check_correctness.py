#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
same parquet fixtures, loads the Spark result parquet written by
graft.Verify, and compares at the DRIVER'S bar:

- columns sorted by name, rows sorted by all columns;
- dtype KIND must match after normalization (int vs float vs bool vs
  object vs datetime) — catches DuckDB HUGEINT sum() landing as
  float64 where Spark writes int64;
- floats compare BIT-EXACT (struct.pack '<d') — catches -0.0 vs 0.0
  and any sub-ulp drift the driver's value hash would see. A near-miss
  (|delta| < 1e-9) is reported distinctly to flag rounding hazards.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import json
import math
import struct
import sys
import glob
import os

import duckdb
import numpy as np
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


def dtype_kind(dt):
    """Canonical kind for the driver's type-sensitive compare: integer
    widths collapse (the hash covers python ints identically), but int
    vs float vs bool vs datetime vs object are distinct, and float
    width matters (float32 bytes != float64 bytes)."""
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime"
    k = np.dtype(dt).kind if s != "object" else "O"
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return f"float{np.dtype(dt).itemsize * 8}"
    if k == "b":
        return "bool"
    return "object"


def bits(x):
    return struct.pack("<d", float(x))


def values_differ(x, y):
    """Bit-exact scalar compare mirroring a byte-level value hash.
    Returns None (equal), 'near' (float delta < 1e-9 — a rounding
    hazard), or 'diff'."""
    if x is None and y is None:
        return None
    try:
        if pd.isna(x) and pd.isna(y):
            # both missing (NaN/NaT/None): the driver hashes one
            # canonical null marker, so NaN payload bits don't matter
            return None
    except (TypeError, ValueError):
        pass
    fx = isinstance(x, (float, np.floating))
    fy = isinstance(y, (float, np.floating))
    if fx or fy:
        if not (fx and fy):
            return "diff"  # float vs non-float (int-typed cell)
        if bits(x) == bits(y):
            return None
        if math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
            return "near"
        return "diff"
    if isinstance(x, (list, np.ndarray)) or isinstance(y, (list, np.ndarray)):
        xl = list(x) if x is not None else None
        yl = list(y) if y is not None else None
        if (xl is None) != (yl is None) or len(xl) != len(yl):
            return "diff"
        worst = None
        for xi, yi in zip(xl, yl):
            r = values_differ(xi, yi)
            if r == "diff":
                return "diff"
            if r == "near":
                worst = "near"
        return worst
    if isinstance(x, (int, np.integer)) and isinstance(y, (int, np.integer)):
        return None if int(x) == int(y) else "diff"
    return None if x == y else "diff"


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        ka, kb = dtype_kind(a[c].dtype), dtype_kind(b[c].dtype)
        if ka != kb:
            return f"DTYPE col={c}: spark={a[c].dtype}({ka}) duck={b[c].dtype}({kb})"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            r = values_differ(av[i], bv[i])
            if r == "near":
                return f"FLOAT-NEAR col={c} row={i}: {av[i]!r} vs {bv[i]!r}"
            if r == "diff":
                x, y = av[i], bv[i]
                extra = ""
                if isinstance(x, (float, np.floating)) and \
                        isinstance(y, (float, np.floating)):
                    extra = f" bits {bits(x).hex()} vs {bits(y).hex()}"
                return f"VALUE col={c} row={i}: {x!r} vs {y!r}{extra}"
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
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    for name in result_dirs:
        if only and name not in only:
            continue
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
    if not only:
        missing = set(oracles) - set(result_dirs)
        for name in sorted(missing):
            print(f"  {name}: ORACLE BUT NO RESULT DIR"); n_fail += 1
    print(f"== {n_ok} ok, {n_rows_only} rows-only, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
