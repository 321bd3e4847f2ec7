"""Deflate-ratio quality signal (functions/compressfns.py): kernel pinned
against direct zlib in the same interpreter; verdict math all-integer."""

import zlib

from ocr_platform_spark.functions.compressfns import (
    compression_signal,
    compression_verdict,
)


def test_signal_matches_direct_zlib(spark):
    texts = [
        (1, "spam " * 200),                      # highly compressible
        (2, "The quick brown fox jumps over the lazy dog. " * 3),
        (3, "k9#mQ2@xZ!pL8$vN4&wB7*rT5^yU1(oI3)"),  # near-random
        (4, ""),
        (5, None),
        (6, "héllo wörld ünïcode"),              # multi-byte utf-8
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bytes"], r["z_bytes"])
        for r in compression_signal(df, "doc_id", "text").collect()
    }
    for doc_id, t in texts:
        raw = (t or "").encode("utf-8")
        assert got[doc_id] == (len(raw), len(zlib.compress(raw, 6)))


def test_verdict_bands(spark):
    sig = spark.createDataFrame(
        [(1, 1000, 100), (2, 1000, 500), (3, 1000, 950), (4, 0, 8)],
        "id long, n_bytes long, z_bytes long",
    )
    got = {r["id"]: r for r in compression_verdict(sig).collect()}
    assert got[1]["ratio_x1000"] == 100 and got[1]["too_repetitive"]
    assert got[2]["ratio_x1000"] == 500 and got[2]["compression_keep"]
    assert got[3]["ratio_x1000"] == 950 and got[3]["too_random"]
    # empty doc: ratio 0 -> repetitive bucket, never a crash
    assert got[4]["ratio_x1000"] == 0 and got[4]["too_repetitive"]
    for r in got.values():
        assert (
            int(r["too_repetitive"]) + int(r["too_random"]) + int(r["compression_keep"])
            == 1
        )
