#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet directory written by graft.Verify, runs the
matching oracle SQL (oracle_sql.json) in DuckDB against the sf_dir parquet
tables, and compares: column names (sorted), row counts, and values after
sorting rows. Exit code 1 if any query mismatches.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            import datetime
            nonnull = s.dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], datetime.date):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                # arrays / decimals / bytes → canonical string
                df[c] = s.map(lambda v: repr(v) if not isinstance(v, str) else v)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for d in sorted(out_dir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        try:
            spark_df = pd.read_parquet(d)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                results[name] = f"OK rows={len(a)}"
            except AssertionError as e:
                diff = str(e).split("\n")[0][:200]
                results[name] = f"VALUE-MISMATCH {diff}"

    failed = 0
    for name, res in sorted(results.items()):
        status = "PASS" if res.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failed += 1
        print(f"[{status}] {name}: {res}")
    print(f"\n{len(results) - failed}/{len(results)} pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
