"""WET segment sink/source — Common-Crawl extracted-text archives
(SURVEY.md S1/S6 siblings of sources/warc.py).

A WET file is a WARC/1.0 file whose records are ``WARC-Type: conversion``:
the PLAIN TEXT extracted from each crawled page, keyed by
``WARC-Target-URI`` — the interchange format every public web-corpus
pipeline (C4, RefinedWeb, FineWeb) reads as input and the natural export of
this engine's extraction stage. The record grammar is shared with
sources/warc.py (``build_warc_record`` / ``split_warc_records``); this
module adds the text payload convention and, unlike the driver-side WARC
fixture writer, a DISTRIBUTED sink.

Reference scope note: the OCR reference exports per-document downloads
(``ocr_backend/app/api/document_routes.py:80-200``); the corpus-scale
equivalent is a sharded archive sink whose manifest audits the write.

Spark-first shapes:

  sink:   df.repartition(n_shards, key).sortWithinPartitions(url)
            -> mapInPandas(partition writer)          # one WET file per task
            -> manifest rows (shard path, n_records, n_bytes)
          Executors write their own shard — the corpus never moves to the
          driver; the single shuffle is the shard repartition, and the
          manifest (shard-count-sized) is the only thing that returns.
          Determinism: shard membership is hash(url), in-shard order is
          sortWithinPartitions(url), gzip mtime=0 — the same input writes
          byte-identical shards at any parallelism.

  source: spark.read.format("binaryFile") -> mapInPandas(record splitter)
          (the sources/warc.py read shape; one segment file == one task).
"""

from __future__ import annotations

import gzip
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_platform_spark.sources.warc import build_warc_record, split_warc_records

_WET_DDL = "url string, wet_ts timestamp, text string"
_MANIFEST_DDL = "shard string, n_records bigint, n_bytes bigint"


def _atomic_write(path: str, data: bytes) -> None:
    """Write ``data`` to ``path`` via a same-directory temp file +
    ``os.replace`` so a shard is either absent or complete — a retried /
    speculative task attempt or a cache-evicted recomputation re-running
    the writer can no longer leave a half-rewritten file visible while a
    previously returned index points into it (content is a pure function
    of the data, so whichever attempt wins the rename produces identical
    bytes). The temp name carries the pid: concurrent attempts on one host
    must not share it."""
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def build_wet_segment(rows: list[tuple[str, object, str]], compress: bool = True) -> bytes:
    """A WET segment from (url, ts, text) rows: per-record gzip members
    (fetch-by-offset layout), ``conversion`` record type, UTF-8 payload."""
    out = bytearray()
    for url, ts, text in rows:
        rec = build_warc_record(url, ts, (text or "").encode("utf-8"), "conversion")
        out += gzip.compress(rec, mtime=0) if compress else rec
    return bytes(out)


def write_wet_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    url_col: str = "url",
    ts_col: str = "wet_ts",
    text_col: str = "text",
) -> DataFrame:
    """Distributed WET sink: one ``shard-NNNNN.warc.wet.gz`` per shard,
    written BY THE EXECUTORS; returns the manifest (shard, n_records,
    n_bytes) as a DataFrame — shard-count-sized, the only data that leaves
    the workers.

    Shard membership is ``pmod(xxhash64(url), n_shards)`` and in-shard
    order is url — both pure functions of the data, so re-running at any
    parallelism (or on any engine) produces byte-identical files; the
    manifest doubles as the write audit (sources/shards.py pattern)."""
    os.makedirs(out_dir, exist_ok=True)
    keyed = (
        df.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("wet_ts"),
            F.col(text_col).alias("text"),
        )
        .withColumn("_shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int"))
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "url")
    )

    def writer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.sources.wet import build_wet_segment  # executor import

        # buffer per shard id: a task owns whole shards (repartition on
        # _shard), and batch boundaries must not split a shard's file
        per_shard: dict[int, list[tuple[str, object, str]]] = {}
        for pdf in batches:
            for url, ts, text, sh in zip(
                pdf["url"], pdf["wet_ts"], pdf["text"], pdf["_shard"]
            ):
                per_shard.setdefault(int(sh), []).append((url, ts, text))
        rows = []
        for sh, recs in sorted(per_shard.items()):
            seg = build_wet_segment(recs)
            path = os.path.join(out_dir, f"shard-{sh:05d}.warc.wet.gz")
            _atomic_write(path, seg)
            rows.append((path, len(recs), len(seg)))
        yield pd.DataFrame(rows, columns=["shard", "n_records", "n_bytes"])

    manifest = keyed.mapInPandas(writer, _MANIFEST_DDL)
    # the mapInPandas is lazy — materialize through a count so callers hold
    # a completed write; the manifest itself is shard-count-sized
    manifest = manifest.cache()
    manifest.count()
    return manifest


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET directory → (url, wet_ts, text). binaryFile scan (one row per
    segment; pathGlobFilter prunes before bytes move) → Arrow-batched
    record splitter — the sources/warc.py read shape with a text payload."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(path)
        .select("content")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.sources.warc import split_warc_records  # executor import

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, ts, payload in split_warc_records(bytes(content)):
                    rows.append((url, ts, payload.decode("utf-8", errors="replace")))
            yield pd.DataFrame(rows, columns=["url", "wet_ts", "text"])

    return files.mapInPandas(kernel, _WET_DDL)


_INDEX_DDL = (
    "url string, wet_ts timestamp, shard int, path string, "
    "rec_offset bigint, rec_len bigint"
)


def write_wet_shards_indexed(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    url_col: str = "url",
    ts_col: str = "wet_ts",
    text_col: str = "text",
) -> DataFrame:
    """:func:`write_wet_shards` that ALSO returns the per-record capture
    index (url, ts, shard, path, rec_offset, rec_len) — the raw material
    of a CDX: each gzip member's byte offset and length within its shard
    file, recorded AS WRITTEN, so a replay service can
    ``seek(rec_offset); read(rec_len)`` and decompress one record without
    touching the rest of the shard. Files are byte-identical to the
    unindexed sink (same member stream, same in-shard url order); the
    index is record-count-sized and stays a DataFrame — nothing collects.

    Shards land via temp-file + ``os.replace`` (``_atomic_write``), so a
    retried or speculative attempt swaps in a complete, byte-identical
    file rather than rewriting in place under a live index — recorded
    offsets stay valid no matter which attempt's rename wins.
    """
    os.makedirs(out_dir, exist_ok=True)
    keyed = (
        df.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("wet_ts"),
            F.col(text_col).alias("text"),
        )
        .withColumn("_shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int"))
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "url")
    )

    def writer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.sources.warc import build_warc_record  # executor

        per_shard: dict[int, list[tuple[str, object, str]]] = {}
        for pdf in batches:
            for url, ts, text, sh in zip(
                pdf["url"], pdf["wet_ts"], pdf["text"], pdf["_shard"]
            ):
                per_shard.setdefault(int(sh), []).append((url, ts, text))
        rows = []
        for sh, recs in sorted(per_shard.items()):
            path = os.path.join(out_dir, f"shard-{sh:05d}.warc.wet.gz")
            off = 0
            members = []
            for url, ts, text in recs:
                member = gzip.compress(
                    build_warc_record(
                        url, ts, (text or "").encode("utf-8"), "conversion"
                    ),
                    mtime=0,
                )
                members.append(member)
                rows.append((url, ts, sh, path, off, len(member)))
                off += len(member)
            _atomic_write(path, b"".join(members))
        yield pd.DataFrame(
            rows,
            columns=["url", "wet_ts", "shard", "path", "rec_offset", "rec_len"],
        )

    index = keyed.mapInPandas(writer, _INDEX_DDL).cache()
    index.count()  # materialize: callers hold a completed write
    return index
