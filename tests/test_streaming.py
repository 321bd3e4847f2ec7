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


def test_stream_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """Exactly-once across query restarts: batch 1 commits, the query
    stops, new files arrive, a NEW query on the same checkpoint processes
    only the new files — no re-extraction, no duplicate rows."""
    from ocr_platform_spark.operators.corpus_spark import documents_df
    from ocr_platform_spark.operators.resume import SnapshotTable
    from ocr_platform_spark.streaming.incremental import stream_extraction

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    table_path = str(tmp_path / "tbl")

    all_docs = documents_df(spark, 60).cache()
    a = all_docs.where("xxhash64(url) % 2 = 0")
    b = all_docs.where("xxhash64(url) % 2 != 0")
    a.coalesce(1).write.parquet(str(in_dir / "batch-a"))

    q = stream_extraction(spark, str(in_dir) + "/*", table_path, ckpt)
    q.awaitTermination(120)
    table = SnapshotTable(table_path)
    n_a = table.read_data(spark).count()
    assert n_a == a.count()
    runs_after_first = set(table.committed_runs())

    b.coalesce(1).write.parquet(str(in_dir / "batch-b"))
    q2 = stream_extraction(spark, str(in_dir) + "/*", table_path, ckpt)
    q2.awaitTermination(120)

    final = table.read_data(spark)
    assert final.count() == 60
    assert final.select("url").distinct().count() == 60  # no dupes
    # first-run snapshots untouched; restart added new epochs only
    assert runs_after_first.issubset(set(table.committed_runs()))
    all_docs.unpersist()


def test_sessionizer_on_rocksdb_state_store(spark, tmp_path):
    """Large-cardinality state story: the stateful sessionizer must run
    (and produce identical closed sessions) on the RocksDB state store
    provider — the conf a 10^8-user stream needs so state spills off-heap
    to local disk instead of living in executor memory."""
    import datetime as dt

    from ocr_platform_spark.streaming.sessions import sessionize_stream_event_time

    base = dt.datetime(2025, 1, 1, 8, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=m), u, "click", 1.0, "{}")
        for i, (u, m) in enumerate(
            [(1, 0), (1, 5), (1, 60), (2, 0), (2, 100), (3, 0), (3, 200)]
        )
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    in_dir = tmp_path / "ev"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(in_dir))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out_rows = []
    try:
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(in_dir))
        q = (
            sessionize_stream_event_time(stream, watermark="10 minutes")
            .writeStream.foreachBatch(lambda df, _e: out_rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt-rdb"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    closed = sorted((r["user_id"], r["n_events"]) for r in out_rows)
    # same gap semantics as the default provider: user 1's 2-event session
    # closes on the 60' event; watermark (200'-10') closes the idle tails
    # of users 1 (60') and 2 (100'); user 3's 200' tail stays open.
    assert (1, 2) in closed and len(closed) >= 3


def test_stream_sessions_exactly_once_restart(spark, tmp_path):
    """The composed streaming story (readStream → event-time sessionizer →
    snapshot sink): closed sessions land in the snapshot table exactly once
    across a checkpoint restart — the second query run skips already-
    processed files, a replayed/no-op run commits nothing new."""
    import datetime as dt

    from ocr_platform_spark.operators.resume import SnapshotTable
    from ocr_platform_spark.streaming.incremental import stream_sessions_to_snapshot

    base = dt.datetime(2025, 5, 1, 8, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def ev(eid, user, minutes):
        return (eid, base + dt.timedelta(minutes=minutes), user, "click", 1.0, "{}")

    in_dir = tmp_path / "sess-in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "sess-ckpt")
    tbl = str(tmp_path / "sess-tbl")

    # file 1: user 1 session A (3 events), user 2 session A (1 event)
    spark.createDataFrame(
        [ev(1, 1, 0), ev(2, 1, 5), ev(3, 1, 10), ev(4, 2, 0)], schema
    ).coalesce(1).write.parquet(str(in_dir / "f1"))

    q = stream_sessions_to_snapshot(
        spark, str(in_dir) + "/*", tbl, ckpt, watermark="10 minutes"
    )
    q.awaitTermination(120)
    table = SnapshotTable(tbl)
    first = table.read_data(spark)
    n_first = 0 if first is None else first.count()
    assert n_first == 0  # nothing closed yet (all sessions still open)

    # file 2 arrives much later in event time: the gap closes both sessions
    spark.createDataFrame([ev(5, 1, 300), ev(6, 2, 300)], schema).coalesce(
        1
    ).write.parquet(str(in_dir / "f2"))

    q2 = stream_sessions_to_snapshot(
        spark, str(in_dir) + "/*", tbl, ckpt, watermark="10 minutes"
    )
    q2.awaitTermination(120)
    data = table.read_data(spark)
    got = sorted((r["user_id"], r["n_events"]) for r in data.collect())
    assert got == [(1, 3), (2, 1)]
    runs_after_two = set(table.committed_runs())

    # restart with NO new files: exactly-once means nothing new commits
    q3 = stream_sessions_to_snapshot(
        spark, str(in_dir) + "/*", tbl, ckpt, watermark="10 minutes"
    )
    q3.awaitTermination(120)
    data2 = table.read_data(spark)
    assert sorted((r["user_id"], r["n_events"]) for r in data2.collect()) == got
    assert set(table.committed_runs()) == runs_after_two

    # lineage covers exactly the committed sessions
    lin = table.read_lineage(spark)
    assert lin.agg(F.sum("input_count")).first()[0] == 2


def test_stream_dedup_ingest_drops_in_watermark_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark ahead of the kernel: duplicate urls
    arriving within the watermark are extracted once; state stays bounded
    by event time (the 10^12-URL-safe streaming dedup shape)."""
    from ocr_platform_spark.streaming.incremental import stream_dedup_ingest

    input_dir = str(tmp_path / "incoming")
    table_path = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")

    base = documents_df(spark, 40)
    base.write.parquet(input_dir)
    # refetches: same urls again (same event time — inside any watermark)
    base.limit(25).write.mode("append").parquet(input_dir)

    q = stream_dedup_ingest(spark, input_dir, table_path, ckpt, available_now=True)
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    data = SnapshotTable(table_path).read_data(spark)
    urls = [r["url"] for r in data.select("url").collect()]
    assert len(urls) == len(set(urls)), "duplicate url extracted twice"
    assert len(set(urls)) == 40  # every distinct url made it exactly once
