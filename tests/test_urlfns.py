"""URL canonicalization: semantics + dialect-mirror integrity."""

from __future__ import annotations

import duckdb
import pytest

from ocr_platform_spark.functions.urlfns import canonical_sql, canonical_url

CASES = [
    ("HTTPS://Site.ORG:443/Path/Page/?utm_source=x&q=1#frag",
     "https://site.org/Path/Page?q=1"),
    ("http://a.org:80/", "http://a.org/"),
    ("http://a.org:8080/p", "http://a.org:8080/p"),  # non-default port kept
    ("https://a.org/p/", "https://a.org/p"),
    ("https://a.org/", "https://a.org/"),  # root slash kept
    ("https://a.org/p?gclid=g&q=2&fbclid=f", "https://a.org/p?q=2"),
    ("https://a.org/p?utm_campaign=c", "https://a.org/p"),
    ("https://a.org/Case/KEPT?Q=UPPER", "https://a.org/Case/KEPT?Q=UPPER"),
    ("relative/no-scheme", "relative/no-scheme"),
]


def test_canonical_url_semantics(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "u string")
    got = [r["c"] for r in df.select(canonical_url("u").alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_duckdb_mirror_matches(spark):
    """The dialect-translated SQL chain produces identical canon forms."""
    con = duckdb.connect()
    duck = [
        con.execute(
            f"SELECT {canonical_sql('u')} AS c FROM (SELECT '{raw}' AS u)"
        ).fetchone()[0]
        for raw, _ in CASES
    ]
    df = spark.createDataFrame([(r,) for r, _ in CASES], "u string")
    spark_side = [r["c"] for r in df.select(canonical_url("u").alias("c")).collect()]
    assert duck == spark_side
