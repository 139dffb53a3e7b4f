#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet directory written by graft.Verify, runs the
matching oracle SQL (oracle_sql.json) in DuckDB against the sf_dir parquet
tables, and compares: column names (sorted), row counts, and values after
sorting rows. Exit code 1 if any query mismatches.
"""
import json
import re
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# --- TYPE-STRICT gate (round-1 lesson: the driver hashes TYPED output).
# DuckDB widens sum(BIGINT)->HUGEINT, floor/ceil(DOUBLE)->DOUBLE-but-
# decimal-for-literals, sign->TINYINT; with check_dtype=False those
# sailed through locally while the driver failed them. Map both engines'
# types to one canonical vocabulary and require exact equality; anything
# unmapped (HUGEINT, DECIMAL, ...) keeps its own name and thus never
# equals a Spark type.

# Integer WIDTHS are equivalent (the driver hashes values, so int32
# rank == BIGINT rank — r1 evidence: rel_window_funcs passed with int32
# vs BIGINT) — but int-vs-float/decimal/hugeint is a hash difference.
_DUCK_CANON = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
    "BIGINT": "int", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float32", "DOUBLE": "float64",
    "VARCHAR": "string", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp", "BLOB": "binary",
}


def duck_canon(t: str) -> str:
    t = str(t).strip()
    m = re.fullmatch(r"(.+)\[\]", t)
    if m:
        return f"list<{duck_canon(m.group(1))}>"
    return _DUCK_CANON.get(t.upper(), t.upper())


def arrow_canon(t) -> str:
    import pyarrow as pa
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_canon(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    # pyarrow spells float32/float64 as "float"/"double"
    return {"float": "float32", "double": "float64"}.get(str(t), str(t))


def spark_types(parquet_dir: Path) -> dict:
    schema = pq.read_schema(next(parquet_dir.glob("*.parquet")))
    return {f.name: arrow_canon(f.type) for f in schema}


def oracle_types(con, sql: str) -> dict:
    rel = con.sql(sql)
    return dict(zip(rel.columns, (duck_canon(t) for t in rel.types)))


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
        st, ot = spark_types(d), oracle_types(con, oracles[name])
        type_diffs = {c: (st.get(c), ot.get(c))
                      for c in sorted(set(st) | set(ot))
                      if st.get(c) != ot.get(c)}
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif type_diffs:
            results[name] = f"TYPE-MISMATCH {type_diffs}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                # dtype equality is enforced above on the engine-level
                # types; the pandas frames legitimately differ (DuckDB
                # HUGEINT->float64 etc. never reaches here).
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
