#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
Verify-dumped parquet result, run the matching oracle SQL in DuckDB on
the same sf directory, and compare (columns sorted by name, rows sorted
by all columns, exact for non-floats / tiny-epsilon report for floats).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, want)
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


def compare(got, want):
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row counts differ: {len(got)} vs {len(want)}"
    # Strict dtype-kind check: the driver's hash compares raw values, so
    # Spark int64 vs oracle float64 (e.g. DuckDB HUGEINT sum() -> pandas
    # float64) is a hash mismatch even when values are numerically equal.
    for c in got.columns:
        ka, kb = got[c].dtype.kind, want[c].dtype.kind
        if ka != kb and {ka, kb} <= {"i", "u", "f"}:
            return False, (f"col {c}: dtype kind mismatch {got[c].dtype} vs "
                           f"{want[c].dtype} (driver hash would differ; "
                           f"CAST the oracle column)")
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if fx != fy and not (math.isnan(fx) and math.isnan(fy)):
                    if abs(fx - fy) > 1e-12 * max(1.0, abs(fx), abs(fy)):
                        return False, (f"col {c} row {i}: {x!r} != {y!r}")
                    else:
                        return False, (f"col {c} row {i}: NEAR-MISS "
                                       f"{x!r} vs {y!r} (float eps)")
            else:
                if str(x) != str(y):
                    return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, ""


if __name__ == "__main__":
    main()
