"""Driver-contract parity: every oracle-bearing query in the catalog
produces identical results on Spark and DuckDB (sf0.001; the driver reruns
the same comparison at sf0.01). Rows-only entries are executed for
well-formedness (they must build a valid plan and return a DataFrame)."""

from __future__ import annotations

import pytest

from ocr_platform_spark.oracle import check_query, duckdb_connection
from ocr_platform_spark.queries import CATALOG

SF_DIR = "/root/testdata/sf0.001"

_ORACLE_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in CATALOG.items() if not s.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(spark, con, name):
    spec = CATALOG[name]
    res = check_query(spark, con, spec.fn, spec.oracle, SF_DIR)
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = CATALOG[name].fn(spark, SF_DIR)
    assert df.count() >= 0
