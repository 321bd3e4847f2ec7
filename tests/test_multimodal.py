"""Multimodal binary-column operators: sniffing, header metadata, byte
histograms, and the stubbed decode plumbing (deterministic fake path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from ocr_platform_spark.operators import ann
from ocr_platform_spark.operators.multimodal import (
    extract_media_metadata,
    media_corpus,
    parse_jpeg_dims,
    parse_png_dims,
    parse_wav_meta,
    resize_images,
    sample_video_frames,
    synth_jpeg,
    synth_png,
    synth_wav,
    with_byte_histogram,
    with_media_type,
)


def test_header_parsers_pure():
    assert parse_png_dims(synth_png("k", 20, 10)) == (20, 10)
    assert parse_jpeg_dims(synth_jpeg("k", 33, 44)) == (33, 44)
    rate, dur = parse_wav_meta(synth_wav("k", 8000, 250))
    assert rate == 8000 and 240 <= dur <= 260
    assert parse_png_dims(b"junk") is None
    assert parse_jpeg_dims(b"\xff\xd8\xffjunk") is None


def test_media_type_expressions(spark):
    df = with_media_type(media_corpus(spark, 10), "payload")
    got = {r["media_id"]: (r["mime"], r["category"]) for r in df.collect()}
    assert got["m000000"] == ("image/png", "image")
    assert got["m000001"] == ("image/jpeg", "image")
    assert got["m000002"] == ("audio/wav", "audio")
    assert got["m000003"] == ("video/mp4", "video")
    assert got["m000004"] == ("application/pdf", "document")


def test_metadata_kernel_matches_expressions(spark):
    """The Python sniffing twin and the column-expression sniff agree, and
    typed metadata carries real parsed values."""
    corpus = media_corpus(spark, 25)
    meta = extract_media_metadata(corpus).cache()
    expr = with_media_type(corpus).select("media_id", "mime", "category")
    diff = (
        meta.select("media_id", "mime", "category")
        .exceptAll(expr)
        .count()
    )
    assert diff == 0
    pngs = meta.where(F.col("mime") == "image/png")
    assert pngs.where(F.col("width").isNull() | F.col("height").isNull()).count() == 0
    wavs = meta.where(F.col("mime") == "audio/wav")
    assert wavs.where(F.col("sample_rate") != 8000).count() == 0
    meta.unpersist()


def test_byte_histogram_feeds_ann(spark):
    corpus = media_corpus(spark, 30)
    emb = with_byte_histogram(corpus).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )
    first = emb.first()
    assert len(first["embedding"]) == 256
    assert abs(sum(first["embedding"]) - 1.0) < 1e-3
    top = ann.brute_force_topk(emb, emb.limit(3), id_col="vec_id", vec_col="embedding", k=5)
    assert top.where(F.col("rank") == 1).count() == 3


def test_histogram_deterministic(spark):
    a = with_byte_histogram(media_corpus(spark, 8)).select("media_id", "embedding").collect()
    b = with_byte_histogram(media_corpus(spark, 8).repartition(4)).select(
        "media_id", "embedding"
    ).collect()
    assert {r["media_id"]: r["embedding"] for r in a} == {
        r["media_id"]: r["embedding"] for r in b
    }


def test_decode_stub_raises_without_fake(spark):
    corpus = media_corpus(spark, 4)
    with pytest.raises(PythonException, match="DecoderUnavailable|decode requires"):
        resize_images(corpus, 8, 8).collect()


def test_fake_decode_paths_deterministic(spark):
    corpus = media_corpus(spark, 12)
    r1 = resize_images(corpus, 8, 8, fake=True).orderBy("media_id").collect()
    r2 = resize_images(corpus.repartition(5), 8, 8, fake=True).orderBy("media_id").collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    assert all(r["width"] == 8 and len(r["payload"]) == 64 for r in r1)

    frames = sample_video_frames(corpus, fake=True)
    per_vid = frames.groupBy("media_id").count()
    assert per_vid.count() == 12
    assert frames.where(F.col("ts_ms") != F.col("frame_index") * 1000).count() == 0


def test_ambiguous_riff_ftyp_payload_agrees():
    """A RIFF header whose bytes at offset 5 spell 'ftyp' matches two rules;
    the column expression and the Python twin must share ONE priority order
    (RIFF family first)."""
    from ocr_platform_spark.operators.multimodal import _sniff_py

    payload = b"RIFFftypWEBPVP8 " + b"\x00" * 16
    mime_py, cat_py = _sniff_py(payload)
    assert mime_py == "image/webp" and cat_py == "image"


def test_ambiguous_riff_ftyp_expression_agrees(spark):
    from ocr_platform_spark.operators.multimodal import _sniff_py, media_mime

    payload = b"RIFFftypWEBPVP8 " + b"\x00" * 16
    df = spark.createDataFrame([(payload,)], "payload binary")
    got = df.select(media_mime("payload").alias("m")).first()["m"]
    assert got == _sniff_py(payload)[0] == "image/webp"
