"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
matching SQL on DuckDB over the same parquet tables; compares row count,
column names, and order-insensitive values (rows sorted by all columns,
columns sorted by name). Reports per-query PASS/FAIL with a diff sample.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\\N"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return str(list(v))
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(cell)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from ocr_platform_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(s)} vs {len(o)}")
            continue
        if not s.equals(o):
            failures.append(name)
            neq = (s != o).any(axis=1)
            print(f"FAIL  {name}: value mismatch in {int(neq.sum())}/{len(s)} rows")
            print("  spark:", s[neq].head(3).to_dict("records"))
            print("  duck :", o[neq].head(3).to_dict("records"))
            continue
        print(f"PASS  {name}: {len(s)} rows")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries consistent with oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
