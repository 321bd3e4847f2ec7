"""Structured Streaming: incremental extraction drains a parquet directory
into the snapshot table; watermarked window agg matches its batch oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_platform_spark.operators.corpus_spark import documents_df
from ocr_platform_spark.operators.resume import SnapshotTable
from ocr_platform_spark.streaming.incremental import stream_extraction, windowed_event_counts


def test_stream_extraction_available_now(spark, tmp_path):
    input_dir = str(tmp_path / "incoming")
    table_path = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")

    documents_df(spark, 60).write.parquet(input_dir)
    q = stream_extraction(spark, input_dir, table_path, ckpt, available_now=True)
    q.awaitTermination(120)

    table = SnapshotTable(table_path)
    data = table.read_data(spark)
    assert data.count() == 60
    assert data.select("url").distinct().count() == 60
    assert len(table.committed_runs()) >= 1

    # late arrivals: second batch drains incrementally (new files only)
    documents_df(spark, 80).where(F.xxhash64("url") % 4 == 1).write.mode("append").parquet(input_dir)
    q2 = stream_extraction(spark, input_dir, table_path, ckpt, available_now=True)
    q2.awaitTermination(120)
    # every url present at least once; the checkpoint prevents re-reading old files
    assert SnapshotTable(table_path).read_data(spark).select("url").distinct().count() >= 60


def test_windowed_event_counts_matches_batch_oracle(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_counts(events, "1 hour")
    oracle = (
        events.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    assert got.exceptAll(oracle).count() == 0
    assert oracle.exceptAll(got).count() == 0
