"""Cross-engine verification: run a Spark DataFrame and an equivalent
DuckDB SQL statement over the same parquet tables and compare results
order-insensitively (rows sorted by all columns, columns sorted by name —
the driver-contract comparison shape, see /root/repo/__spark_entry__.py).

This is an engine feature, not just test scaffolding: the same discipline
the reference applies with golden expected values
(``ocr_backend/tests/test_data_conversion.py``) generalized to whole query
results against an independent SQL engine.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd

ORACLE_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical string form: columns sorted by name, rows sorted by all
    columns, cells stringified (None/NaN → ``\\N``, floats via repr so any
    bit difference is visible)."""
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


@dataclass
class CompareResult:
    ok: bool
    detail: str
    n_rows: int = 0


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    s, o = normalize_frame(spark_pdf), normalize_frame(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return CompareResult(False, f"columns {list(s.columns)} vs {list(o.columns)}")
    if len(s) != len(o):
        return CompareResult(False, f"row count {len(s)} vs {len(o)}")
    if not s.equals(o):
        neq = (s != o).any(axis=1)
        sample = {
            "spark": s[neq].head(2).to_dict("records"),
            "oracle": o[neq].head(2).to_dict("records"),
        }
        return CompareResult(False, f"{int(neq.sum())}/{len(s)} rows differ: {sample}")
    return CompareResult(True, "match", len(s))


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with the driver's table views pre-registered."""
    import duckdb

    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_query(spark, con, fn, sql: str, sf_dir: str) -> CompareResult:
    return compare_frames(fn(spark, sf_dir).toPandas(), con.execute(sql).fetchdf())
