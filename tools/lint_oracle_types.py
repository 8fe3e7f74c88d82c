#!/usr/bin/env python3
"""Oracle output-type linter (VERDICT r6 ask #5).

DuckDB's integer sum() returns HUGEINT and decimal arithmetic returns
DECIMAL; both land as float64 in the driver's fetch where Spark writes
int64/float64 — a typed-hash mismatch even when every value is equal.
This linter DESCRIBEs every oracle query against the fixture views and
flags any output column whose declared type is in the hazard set, so
the cast discipline (`CAST(sum(x) AS BIGINT)`) is enforced statically
instead of one red driver row at a time.

Usage: python3 tools/lint_oracle_types.py <sfDir> <oracle_sql.json>
Exit 1 if any hazard column found.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types that do not round-trip to the driver compare as themselves.
HAZARDS = ("HUGEINT", "UHUGEINT", "INT128", "DECIMAL", "UBIGINT",
           "UINTEGER", "USMALLINT", "UTINYINT", "FLOAT")


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(oracle_path) as f:
        oracles = json.load(f)
    n_flag = n_err = 0
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"  {name}: DESCRIBE ERROR: {e}")
            n_err += 1
            continue
        bad = [(c, t) for c, t, *_ in desc
               if any(t.upper().startswith(h) for h in HAZARDS)]
        for c, t in bad:
            print(f"  {name}: column `{c}` is {t} — cast it "
                  f"(e.g. CAST(... AS BIGINT/DOUBLE))")
            n_flag += 1
    print(f"== {len(oracles)} oracles, {n_flag} hazard columns, "
          f"{n_err} describe errors")
    sys.exit(1 if (n_flag or n_err) else 0)


if __name__ == "__main__":
    main()
