"""Bucketed tables: the write-once-shuffle-never join layout. The plan
assertion is the point — a bucketed fact⋈fact join must contain NO shuffle
exchange on either side (the regression this guards turns a co-located
join back into a terabyte network shuffle at production scale)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_platform_spark.operators.bucketing import bucketed_join, write_bucketed


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    facts = spark.range(0, 5000).select(
        F.col("id").alias("url_id"), (F.col("id") % 97).alias("payload")
    )
    corr = spark.range(0, 5000, 7).select(
        F.col("id").alias("url_id"), F.lit("fix").alias("corrected")
    )
    write_bucketed(facts, "b_facts", "url_id", n_buckets=8, path=str(tmp_path / "bf"))
    write_bucketed(corr, "b_corr", "url_id", n_buckets=8, path=str(tmp_path / "bc"))
    yield "b_facts", "b_corr"
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_corr")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    left, right = bucketed_pair
    # force the non-broadcast path: this is the fact-fact shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, left, right, "url_id")
        plan = _formatted(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        # values correct: every corr row matches exactly one fact row
        assert j.count() == spark.table(right).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_shuffles_as_control(spark, bucketed_pair, tmp_path):
    """Control: the same join over plain parquet DOES shuffle — proving the
    bucketed plan's exchange-freedom comes from the layout, not the data."""
    left, _ = bucketed_pair
    plain = str(tmp_path / "plain")
    spark.table(left).write.mode("overwrite").parquet(plain)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.read.parquet(plain).join(spark.table(left), "url_id")
        assert "Exchange" in _formatted(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_avoids_shuffle(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the clustering."""
    left, _ = bucketed_pair
    agg = spark.table(left).groupBy("url_id").agg(F.sum("payload").alias("s"))
    assert "Exchange" not in _formatted(agg)
