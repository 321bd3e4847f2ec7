"""Sessionization: batch windows vs the stateful streaming operator agree
on closed sessions; streaming state machine emits exactly the gap-closed
sessions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ocr_platform_spark.streaming.sessions import sessionize_batch, sessionize_stream

_BASE = dt.datetime(2025, 1, 1, 8, 0, 0)


def _events(spec):
    """spec: list of (user_id, minutes_offset)."""
    return [
        (i, _BASE + dt.timedelta(minutes=m), u, "click", 1.0, "{}")
        for i, (u, m) in enumerate(spec)
    ]


_SPEC = [
    (1, 0), (1, 5), (1, 10),        # user 1 session A (3 events)
    (1, 60), (1, 65),               # user 1 session B (2) — 50-min gap
    (1, 200),                       # user 1 session C (1, open)
    (2, 0),                         # user 2 session A (1)
    (2, 100), (2, 101),             # user 2 session B (2, open)
]
_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_sessionize_batch_semantics(spark):
    df = spark.createDataFrame(_events(_SPEC), _SCHEMA)
    out = sessionize_batch(df).collect()
    got = [(r["user_id"], r["session_no"], r["n_events"]) for r in out]
    assert got == [(1, 1, 3), (1, 2, 2), (1, 3, 1), (2, 1, 1), (2, 2, 2)]


def test_sessionize_stream_closes_gapped_sessions(spark, tmp_path):
    in_dir = tmp_path / "events-in"
    in_dir.mkdir()
    df = spark.createDataFrame(_events(_SPEC), _SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(in_dir))

    stream = spark.readStream.schema(df.schema).parquet(str(in_dir))
    sessions = sessionize_stream(stream)
    out_rows = []

    def sink(batch_df, _epoch):
        out_rows.extend(batch_df.collect())

    q = (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps scheduling no-data batches after the two
    # file batches drain, so the query outlives availableNow — wait for the
    # data batches, then stop explicitly.
    import time as _time

    deadline = _time.time() + 90
    while _time.time() < deadline and len(out_rows) < 3:
        _time.sleep(1)
    q.stop()

    closed = sorted((r["user_id"], r["n_events"]) for r in out_rows)
    # open tail sessions (1×C, 2×B) remain in state — only gap-closed emit
    assert closed == [(1, 2), (1, 3), (2, 1)]
    starts = {
        (r["user_id"], r["n_events"]): r["session_start"] for r in out_rows
    }
    assert starts[(1, 3)] == _BASE
    assert starts[(1, 2)] == _BASE + dt.timedelta(minutes=60)


def test_batch_streaming_agreement_on_closed_sessions(spark, sf001_events=None):
    """On the driver's events table: every streaming-closed session must
    equal a batch session (prefix property)."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    batch = sessionize_batch(events)
    assert batch.where(F.col("n_events") <= 0).count() == 0
    total = batch.agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_session_window_native_matches_batch_off_boundary(spark):
    """Away from exact-gap boundaries the native session_window formulation
    and the lag/cumsum formulation must agree completely (the _SPEC gaps
    are all != 30 min exactly)."""
    from ocr_platform_spark.streaming.sessions import sessionize_session_window

    df = spark.createDataFrame(_events(_SPEC), _SCHEMA)
    a = [tuple(r) for r in sessionize_batch(df).collect()]
    b = [tuple(r) for r in sessionize_session_window(df).collect()]
    assert a == b


def test_session_window_boundary_semantics(spark):
    """An event exactly gap later merges in BOTH formulations (session
    window end last+gap is merge-inclusive); one second beyond splits."""
    from ocr_platform_spark.streaming.sessions import sessionize_session_window

    df = spark.createDataFrame(_events([(1, 0), (1, 30)]), _SCHEMA)
    assert [r["n_events"] for r in sessionize_batch(df).collect()] == [2]
    assert [r["n_events"] for r in sessionize_session_window(df).collect()] == [2]
    df2 = spark.createDataFrame(
        [(0, _BASE, 1, "click", 1.0, "{}"),
         (1, _BASE + dt.timedelta(minutes=30, seconds=1), 1, "click", 1.0, "{}")],
        _SCHEMA,
    )
    assert [r["n_events"] for r in sessionize_session_window(df2).collect()] == [1, 1]


def test_sessionize_stream_event_time_closes_by_watermark(spark, tmp_path):
    """EventTimeTimeout: sessions close when the watermark (max event time
    - delay) passes last+gap — deterministic under replay. Feed two files
    so the second batch's watermark closes user 1's first session."""
    import time as _time

    from ocr_platform_spark.streaming.sessions import sessionize_stream_event_time

    in_dir = tmp_path / "ev-in"
    in_dir.mkdir()
    df = spark.createDataFrame(_events(_SPEC), _SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(in_dir))

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(in_dir))
    sessions = sessionize_stream_event_time(stream, watermark="10 minutes")
    out_rows = []

    def sink(batch_df, _epoch):
        out_rows.extend(batch_df.collect())

    q = (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt-et"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        q.stop()
    except Exception:
        pass
    closed = sorted((r["user_id"], r["n_events"]) for r in out_rows)
    # gap-closed sessions emit, PLUS user 2's idle tail (last event 101'):
    # final watermark = 200' - 10' = 190' > 101' + 30' → event-time timeout
    # closes it deterministically. User 1's tail (200') stays open
    # (190' < 230') — exactly the replay-deterministic semantics the
    # processing-time variant cannot give.
    assert closed == [(1, 2), (1, 3), (2, 1), (2, 2)]


def test_session_window_runs_as_stream(spark, tmp_path):
    """The native session_window formulation runs UNCHANGED on a
    watermarked stream (the docstring's claim): append mode emits a
    session once the watermark passes its close."""
    from pyspark.sql import functions as F

    in_dir = tmp_path / "sw-in"
    df = spark.createDataFrame(_events(_SPEC), _SCHEMA)
    df.coalesce(1).write.parquet(str(in_dir))
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(in_dir))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out_rows = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: out_rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "sw-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    closed = sorted((r["user_id"], r["n_events"]) for r in out_rows)
    # watermark 200'-10'=190' closes user1 sessions A(3),B(2) and user2 A(1),
    # B(2, last event 101'+30'<190'); user1 C (200') stays open in state
    assert closed == [(1, 2), (1, 3), (2, 1), (2, 2)]
