#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (not shipped
library code): reads the Verify.scala output dir, runs each oracle SQL in
DuckDB over the same sf parquet tables, and value-compares.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = norm(con.sql(f"SELECT * FROM '{files[0]}'").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1;  continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1;  continue
        # Dtype-KIND parity: duckdb's .df() renders HUGEINT (any
        # un-CAST SUM/`//` chain) as float64 while Spark writes
        # int64 — numerically equal, so check_dtype=False hides it,
        # but a repr/dtype-sensitive hash (the driver's) flips red.
        # q204 was red for two whole rounds on exactly this. Compare
        # the numpy kind (i/u vs f vs O/b/M) per column and fail
        # loudly here instead.
        kinds = [(c, got[c].dtype.kind, want[c].dtype.kind)
                 for c in got.columns
                 if got[c].dtype.kind != want[c].dtype.kind
                 and {got[c].dtype.kind, want[c].dtype.kind} - {"i", "u"}]
        if kinds:
            print(f"FAIL {name}: dtype-kind mismatch (spark vs oracle) "
                  f"{kinds} — CAST the oracle's final columns")
            n_fail += 1;  continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)");  n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}");  n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
