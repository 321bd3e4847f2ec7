"""Incremental extraction + event-time aggregation (SURVEY.md §2.11).

The reference's ``auto_process=true`` (extract immediately per arriving
document, ``ocr_backend/app/api/document_routes.py:213,237-260``) becomes a
Structured Streaming job over the input directory: same kernel, same sink,
micro-batch driven. ``Trigger.AvailableNow`` drains the backlog and stops —
the cron/incremental mode; a processing-time trigger makes it continuous.

Exactly-once: each micro-batch goes through ``foreachBatch`` into the
snapshot table with run_id = ``stream-<query_id>-<epoch>``; replays of an
epoch overwrite the same snapshot directory before the commit marker lands,
so duplicates cannot become visible (idempotent sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_platform_spark.operators.extract import (
    extract_documents,
    lineage_from_extracted,
)
from ocr_platform_spark.operators.resume import SnapshotTable
from ocr_platform_spark.schemas import DOCUMENTS_SCHEMA


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream(parquet dir) → kernel → snapshot sink. Returns the query."""
    table = SnapshotTable(table_path)
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        run_id = f"stream-{epoch_id:08d}"
        if table.is_committed(run_id):
            return  # replayed epoch — already visible, nothing to do
        extracted = extract_documents(batch_df)
        table.stage_data(extracted, run_id)
        written = table.read_staged(spark, run_id)
        if written.take(1):
            table.commit(lineage_from_extracted(written, run_id), run_id)
        else:
            table.discard_staged(run_id)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    key: str = "url",
    ts_col: str = "warc_ts",
    watermark: str = "24 hours",
    available_now: bool = True,
):
    """Streaming URL dedup ahead of extraction — the crawl-ingest shape
    where the same page arrives repeatedly (refetches, mirror shards):
    readStream → ``withWatermark`` → ``dropDuplicatesWithinWatermark(key)``
    → extraction → snapshot sink.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    event-time watermark passes the key's last occurrence — bounded state,
    unlike a plain streaming ``dropDuplicates`` whose state grows with the
    keyspace forever (the 10^12-URL failure mode). Duplicates farther
    apart than the watermark are the Bloom/anti-join resume path's job
    (operators/bloom.py, operators/resume.py) — the two layers compose:
    in-flight dedup here, historical dedup there. Exactly-once via the
    same idempotent epoch-keyed snapshot sink as :func:`stream_extraction`.
    """
    table = SnapshotTable(table_path)
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(input_dir)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([key])
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        run_id = f"dedupstream-{epoch_id:08d}"
        if table.is_committed(run_id):
            return
        extracted = extract_documents(batch_df)
        table.stage_data(extracted, run_id)
        written = table.read_staged(spark, run_id)
        if written.take(1):
            table.commit(lineage_from_extracted(written, run_id), run_id)
        else:
            table.discard_staged(run_id)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    late rows beyond the watermark are dropped, state is bounded. Works on
    both a streaming and a batch DataFrame (same plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_sessions_to_snapshot(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    available_now: bool = True,
    max_files_per_trigger: int = 4,
):
    """The composed streaming story end-to-end: readStream(event files) →
    event-time stateful sessionizer (applyInPandasWithState, watermark-
    closed sessions) → snapshot-table sink.

    Exactly-once across restarts by layering the two recovery mechanisms:
    the streaming checkpoint replays an interrupted epoch with the SAME
    epoch_id, and the snapshot sink is idempotent per epoch — a replayed
    epoch either finds its commit marker (skip) or overwrites its own
    staged directory before the marker lands. Closed sessions therefore
    become visible exactly once, no dupes, no holes
    (tests/test_streaming.py::test_stream_sessions_exactly_once_restart).

    Lineage per epoch: one row (partition_id = epoch, session count,
    n/a bytes) so the snapshot stays self-describing like batch runs."""
    from ocr_platform_spark.streaming.sessions import sessionize_stream_event_time

    table = SnapshotTable(table_path)
    stream = (
        spark.readStream.schema(_EVENTS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    sessions = sessionize_stream_event_time(
        stream, gap_minutes=gap_minutes, watermark=watermark
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        run_id = f"sessions-{epoch_id:08d}"
        if table.is_committed(run_id):
            return  # replayed epoch — already visible
        table.stage_data(batch_df, run_id)
        written = table.read_staged(spark, run_id)
        if written.take(1):
            lineage = written.agg(F.count("*").alias("input_count")).select(
                F.lit(epoch_id).cast("int").alias("partition_id"),
                "input_count",
                F.lit(0).cast("long").alias("input_bytes"),
                F.lit("sessionizer-v1").alias("extractor_version"),
                F.lit(0).cast("long").alias("elapsed_ms"),
                F.lit(run_id).alias("run_id"),
            )
            table.commit(lineage, run_id)
        else:
            table.discard_staged(run_id)

    writer = sessions.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
