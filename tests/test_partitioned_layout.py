"""Time-partitioned table layout: the Iceberg ``days(warc_ts)`` partition
transform emulated as a parquet ``partitionBy`` day column, with partition
pruning verified in the physical plan (SURVEY §2.11: ``warc_ts`` enables
time-partitioned layout; the scan must touch only matching day dirs)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_day_partitioned_write_and_pruning(spark, tmp_path):
    from ocr_platform_spark.operators.corpus_spark import documents_df

    out = str(tmp_path / "by-day")
    docs = documents_df(spark, 400).withColumn("day", F.to_date("warc_ts"))
    docs.write.partitionBy("day").parquet(out)

    back = spark.read.parquet(out)
    days = [r["day"] for r in back.select("day").distinct().collect()]
    assert len(days) > 5  # corpus spreads over a ~30-day window

    one_day = sorted(days)[2]
    q = back.where(F.col("day") == F.lit(one_day)).select("url")
    plan = _formatted(q)
    # partition filter handled at planning time, not as a data filter
    assert "PartitionFilters" in plan
    assert f"isnotnull(day" in plan or "day#" in plan
    n_expected = docs.where(F.to_date("warc_ts") == F.lit(one_day)).count()
    assert q.count() == n_expected


def test_pruned_scan_reads_single_partition(spark, tmp_path):
    from ocr_platform_spark.operators.corpus_spark import documents_df

    out = str(tmp_path / "by-lang")
    documents_df(spark, 300).write.partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    q = back.where(F.col("lang") == "de")
    plan = _formatted(q)
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "lang" in pf_line
    # pushed data filters must NOT contain the partition column
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert all("lang" not in l for l in pushed)
    assert q.count() == back.where(F.col("lang") == "de").count()
