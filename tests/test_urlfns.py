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


def test_url_softblock_score_accumulates_fragments(spark):
    from ocr_platform_spark.functions.urlfns import url_softblock_score

    df = spark.createDataFrame(
        [
            (1, "https://a.org/free-bets/today"),      # free(10)+bet(30) = 40
            (2, "https://a.org/casino-royale"),        # 50
            (3, "https://a.org/free-library"),         # 10
            (4, "https://a.org/news"),                 # 0
            (5, "https://a.org/bet/bet/bet"),          # containment counts once: 30
        ],
        "id long, url string",
    )
    got = {
        r["id"]: r["s"]
        for r in df.select("id", url_softblock_score("url").alias("s")).collect()
    }
    assert got == {1: 40, 2: 50, 3: 10, 4: 0, 5: 30}


def test_softblock_sql_matches_column_expression(spark):
    import duckdb

    from ocr_platform_spark.functions.urlfns import (
        softblock_score_sql,
        url_softblock_score,
    )

    urls = [
        "https://x.org/adult-stories", "https://x.org/win-big-now",
        "https://x.org/webcam-chat", "https://x.org/poker-tips",
        "https://x.org/essay", "https://x.org/freebet",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    spark_scores = [
        r["s"] for r in df.select(url_softblock_score("url").alias("s"))
        .orderBy("url").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    duck_scores = [
        r[0] for r in con.sql(
            f"SELECT {softblock_score_sql('url')} FROM u ORDER BY url"
        ).fetchall()
    ]
    assert spark_scores == duck_scores
