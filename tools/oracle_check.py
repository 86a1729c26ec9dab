"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the given SF, then
compare row count, column names, and order-insensitive value content.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from scalecast_spark import get_session

    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {str(e)[:200]}"))
            print(f"  {name:30s} SPARK-ERROR")
            continue
        if name not in oracles:
            print(f"  {name:30s} rows-only ({len(sdf)} rows)")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {str(e)[:200]}"))
            print(f"  {name:30s} ORACLE-ERROR")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"schema: {list(a.columns)} vs {list(b.columns)}"))
            print(f"  {name:30s} SCHEMA-MISMATCH")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows: {len(a)} vs {len(b)}"))
            print(f"  {name:30s} ROWS {len(a)} vs {len(b)}")
            continue
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, atol=2e-6, rtol=1e-6
            )
            print(f"  {name:30s} OK ({len(a)} rows)")
        except AssertionError as e:
            failures.append((name, str(e).split("\n")[-2][:200]))
            print(f"  {name:30s} VALUE-MISMATCH")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print("all checked queries match")


if __name__ == "__main__":
    main()
