"""WET sink/source: round-trip fidelity, distributed shard determinism
(parallelism invariance of the written bytes), and manifest audit."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ocr_platform_spark.sources.wet import (
    build_wet_segment,
    read_wet,
    write_wet_shards,
)
from ocr_platform_spark.sources.warc import split_warc_records


def _rows(n):
    # adversarial payloads: multi-byte unicode, embedded CRLF CRLF (the
    # record separator), empty text — Content-Length framing must carry all
    texts = {
        0: "plain text",
        1: "umlauts äöü and 中文 and emoji \U0001f600",
        2: "embedded\r\n\r\nseparator stays payload",
        3: "",
        4: "trailing newline\n",
    }
    return [
        (f"https://site-{i % 3:02d}.example/p/{i}", datetime(2024, 1, 1, 0, 0, i % 60),
         texts.get(i % 5, f"doc {i} body text"))
        for i in range(n)
    ]


def test_segment_round_trip_bytes():
    rows = _rows(7)
    seg = build_wet_segment(rows)
    back = list(split_warc_records(seg))
    assert [(u, t, p.decode("utf-8")) for u, t, p in back] == rows
    # byte-stable: same rows -> same bytes (gzip mtime pinned)
    assert build_wet_segment(rows) == seg


def test_write_read_round_trip_and_manifest(spark, tmp_path):
    rows = _rows(40)
    df = spark.createDataFrame(rows, "url string, wet_ts timestamp, text string")
    out = str(tmp_path / "wet")
    manifest = write_wet_shards(df, out, n_shards=4)
    m = {r["shard"]: (r["n_records"], r["n_bytes"]) for r in manifest.collect()}
    assert sum(n for n, _b in m.values()) == 40
    back = read_wet(spark, out).orderBy("url").collect()
    expect = sorted(rows)
    assert [(r["url"], r["wet_ts"], r["text"]) for r in back] == expect


def test_shard_bytes_invariant_to_input_partitioning(spark, tmp_path):
    rows = _rows(60)
    df = spark.createDataFrame(rows, "url string, wet_ts timestamp, text string")
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    write_wet_shards(df.repartition(13), out_a, n_shards=3)
    write_wet_shards(df.coalesce(1), out_b, n_shards=3)
    for i in range(3):
        pa = tmp_path / "a" / f"shard-{i:05d}.warc.wet.gz"
        pb = tmp_path / "b" / f"shard-{i:05d}.warc.wet.gz"
        assert pa.read_bytes() == pb.read_bytes()


def test_reader_prunes_non_wet_files(spark, tmp_path):
    rows = _rows(5)
    df = spark.createDataFrame(rows, "url string, wet_ts timestamp, text string")
    out = str(tmp_path / "wet")
    write_wet_shards(df, out, n_shards=1)
    (tmp_path / "wet" / "notes.txt").write_text("not a segment")
    assert read_wet(spark, out).count() == 5


def test_indexed_sink_offsets_are_byte_true(spark, tmp_path):
    """write_wet_shards_indexed: every recorded (offset, length) seeks to a
    gzip member that decompresses to a record naming exactly that url; the
    files are byte-identical to the unindexed sink's."""
    import gzip
    import os

    from pyspark.sql import functions as F

    from ocr_platform_spark.sources.wet import (
        write_wet_shards,
        write_wet_shards_indexed,
    )

    rows = [
        (f"https://h{i % 3}.example.org/p/{i}",
         f"2024-01-0{i % 9 + 1}T00:00:0{i % 10}", f"text body number {i} é")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, ts string, text string").select(
        "url", F.to_timestamp("ts").alias("wet_ts"), "text"
    )
    d1 = str(tmp_path / "indexed")
    d2 = str(tmp_path / "plain")
    idx = write_wet_shards_indexed(df, d1, n_shards=3).collect()
    write_wet_shards(df, d2, n_shards=3)
    for fn in sorted(os.listdir(d2)):
        with open(os.path.join(d1, fn), "rb") as a, open(os.path.join(d2, fn), "rb") as b:
            assert a.read() == b.read(), fn
    assert len(idx) == 30
    by_path: dict[str, int] = {}
    for r in idx:
        with open(r["path"], "rb") as f:
            f.seek(r["rec_offset"])
            member = f.read(r["rec_len"])
        rec = gzip.decompress(member).decode("utf-8")
        assert f"WARC-Target-URI: {r['url']}" in rec
        by_path[r["path"]] = by_path.get(r["path"], 0) + r["rec_len"]
    for path, total in by_path.items():
        assert os.path.getsize(path) == total  # offsets tile the file exactly
