"""Export sink formats + binary-dir ingest (S1/S6)."""

from __future__ import annotations

import pytest

from ocr_platform_spark.sources.export import export_results, ingest_binary_dir


def test_export_formats_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    for fmt in ("csv", "json", "parquet"):
        out = str(tmp_path / fmt)
        export_results(df, out, fmt)
        back = spark.read.format(fmt)
        if fmt == "csv":
            back = back.option("header", "true").option("inferSchema", "true")
        got = back.load(out)
        assert got.count() == 2
        assert sorted(r["v"] for r in got.collect()) == ["a", "b"]


def test_export_rejects_unknown_format(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        export_results(df, str(tmp_path / "y"), "avro-ish")


def test_ingest_binary_dir_with_cap(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "small.bin").write_bytes(b"x" * 100)
    (d / "big.bin").write_bytes(b"y" * 10_000)
    (d / "skip.txt").write_bytes(b"z")
    all_bins = ingest_binary_dir(spark, str(d), glob="*.bin")
    assert all_bins.count() == 2
    capped = ingest_binary_dir(spark, str(d), glob="*.bin", max_bytes=1000)
    rows = capped.collect()
    assert len(rows) == 1 and rows[0]["length"] == 100
