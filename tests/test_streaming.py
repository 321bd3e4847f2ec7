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
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    table = SnapshotTable(table_path)
    data = table.read_data(spark)
    assert data.count() == 60
    assert data.select("url").distinct().count() == 60
    assert len(table.committed_runs()) >= 1

    # late arrivals: second batch drains incrementally (new files only)
    documents_df(spark, 80).where(F.xxhash64("url") % 4 == 1).write.mode("append").parquet(input_dir)
    q2 = stream_extraction(spark, input_dir, table_path, ckpt, available_now=True)
    try:
        q2.awaitTermination(120)
    finally:
        q2.stop()
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


def test_watermark_progression_and_in_watermark_aggregation(spark, tmp_path):
    """True streaming run over two micro-batches: the event-time watermark
    advances from batch 0's max event time, and every in-watermark event is
    aggregated exactly. (Spark's watermark is a best-effort bound: events
    *beyond* it are not guaranteed to be dropped — only no-drop within the
    watermark is guaranteed — so this test pins the guaranteed half.)"""
    import datetime as dt

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    base = dt.datetime(2025, 3, 1, 10, 0, 0)
    in_dir = tmp_path / "win-in"
    in_dir.mkdir()

    # batch 1: events at 10:00-12:30 → watermark advances to 12:30-2h = 10:30
    b1 = [
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),
        (3, base + dt.timedelta(hours=2, minutes=30), 1, "click", 1.0, "{}"),
    ]
    # batch 2: one too-late event (9:15, before watermark) + one ok (11:15)
    b2 = [
        (4, base - dt.timedelta(minutes=45), 1, "click", 1.0, "{}"),
        (5, base + dt.timedelta(hours=1, minutes=15), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(in_dir / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(in_dir / "f2"))
    # file-source batch order follows modification time — pin it explicitly
    import os, time as _time

    now = _time.time()
    for root, _d, files in os.walk(in_dir / "f1"):
        for fn in files:
            os.utime(os.path.join(root, fn), (now - 60, now - 60))
    for root, _d, files in os.walk(in_dir / "f2"):
        for fn in files:
            os.utime(os.path.join(root, fn), (now, now))

    from ocr_platform_spark.streaming.incremental import windowed_event_counts

    stream = (
        spark.readStream.schema(spark.createDataFrame(b1, schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir) + "/*")
    )
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    rows = []

    def sink(batch_df, _):
        rows.extend(batch_df.collect())

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "win-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    # watermark advanced to max(batch-0 event time) - 2h = 10:30
    marks = [p["eventTime"].get("watermark") for p in q.recentProgress]
    assert any(m and m.startswith("2025-03-01T10:30") for m in marks)

    by_window = {}
    for r in rows:  # update mode: later emissions override
        by_window[r["window_start"]] = r["n_events"]
    # in-watermark events aggregate exactly
    assert by_window.get(base) == 2                              # 10:00, 10:30
    assert by_window.get(base + dt.timedelta(hours=1)) == 1      # 11:15
    assert by_window.get(base + dt.timedelta(hours=2)) == 1      # 12:30
