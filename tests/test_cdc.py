"""Content-defined chunking: boundary properties + Spark kernel contract."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.operators.cdc import (
    cdc_boundaries,
    cdc_boundaries_fast,
    cdc_chunk_table,
    cdc_dedup_stats,
    gear_table,
)


def _rand_bytes(n, seed=7):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def test_gear_table_is_fixed():
    t = gear_table()
    assert len(t) == 256 and len(set(t)) == 256
    assert t == gear_table()  # no hidden RNG state


def test_boundaries_cover_exactly_with_bounds():
    data = _rand_bytes(5000)
    spans = cdc_boundaries(data, avg_bits=6, min_size=16, max_size=256)
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for (a, b), (c, _) in zip(spans, spans[1:]):
        assert b == c  # contiguous, no gaps/overlaps
    lens = [b - a for a, b in spans]
    assert all(16 <= n <= 256 for n in lens[:-1])  # tail may be short
    assert lens[-1] <= 256


def test_boundaries_edge_cases():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"xy", min_size=16) == [(0, 2)]  # sub-min tail
    # constant bytes: gear hash never hits the mask by luck alone -> max_size
    spans = cdc_boundaries(b"\x00" * 1000, avg_bits=20, min_size=16, max_size=64)
    assert {b - a for a, b in spans[:-1]} == {64}
    with pytest.raises(ValueError):
        cdc_boundaries(b"x", min_size=0)


def test_boundaries_resynchronize_after_edit():
    data = _rand_bytes(5000)
    edited = data[:10] + b"\x42" + data[10:]
    h1 = {hashlib.md5(data[a:b]).hexdigest() for a, b in cdc_boundaries(data)}
    h2 = {hashlib.md5(edited[a:b]).hexdigest() for a, b in cdc_boundaries(edited)}
    assert len(h1 & h2) / len(h1) > 0.9  # one edit invalidates ~one chunk


def test_chunk_table_matches_reference_and_is_partition_invariant(spark):
    payloads = [(i, _rand_bytes(800 + 37 * i, seed=i)) for i in range(12)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    for parts in (1, 5):
        rows = sorted(
            (r["id"], r["idx"], r["start"], r["length"], r["chunk_hash"])
            for r in cdc_chunk_table(
                df.repartition(parts), "doc_id", "payload"
            ).collect()
        )
        expect = sorted(
            (pid, idx, a, b - a, hashlib.md5(data[a:b]).hexdigest())
            for pid, data in payloads
            for idx, (a, b) in enumerate(cdc_boundaries(data))
        )
        assert rows == expect


def test_dedup_stats_counts_cross_document_chunks_only(spark):
    shared = _rand_bytes(600, seed=1)
    a_only = _rand_bytes(600, seed=2)
    b_only = _rand_bytes(600, seed=3)
    df = spark.createDataFrame(
        [(1, shared + a_only), (2, shared + b_only), (3, _rand_bytes(600, seed=4))],
        "doc_id long, payload binary",
    )
    chunks = cdc_chunk_table(df, "doc_id", "payload")
    stats = {r["id"]: r for r in cdc_dedup_stats(chunks).collect()}
    assert stats[1]["dup_bytes"] > 0 and stats[2]["dup_bytes"] > 0
    assert stats[3]["n_dup_chunks"] == 0 and stats[3]["dup_bytes"] == 0
    # bytes accounting is exact
    for did, payload in ((1, shared + a_only), (3, _rand_bytes(600, seed=4))):
        assert stats[did]["n_bytes"] == len(payload)
    # a chunk repeated twice WITHIN one doc but in no other doc is not a dup
    intra = spark.createDataFrame(
        [(10, shared + shared), (11, b_only)], "doc_id long, payload binary"
    )
    istats = {
        r["id"]: r for r in cdc_dedup_stats(cdc_chunk_table(intra, "doc_id", "payload")).collect()
    }
    assert istats[10]["n_dup_chunks"] == 0


def test_delta_transfer_is_edit_local(spark):
    """A small prefix edit re-transfers only the chunks the edit touches."""
    base = _rand_bytes(4000, seed=9)
    edited = b"v2: " + base
    df_prev = spark.createDataFrame([(1, base), (2, base)], "doc_id long, payload binary")
    df_curr = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, payload binary"
    )
    prev = cdc_chunk_table(df_prev, "doc_id", "payload")
    curr = cdc_chunk_table(df_curr, "doc_id", "payload")
    seen = prev.select("id", "chunk_hash").distinct().withColumn("_seen", F.lit(True))
    rows = {
        r["id"]: r
        for r in curr.join(seen, ["id", "chunk_hash"], "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("_seen").isNull(), 1)).alias("n_new"),
        )
        .collect()
    }
    assert rows[1]["n_new"] == 0            # untouched doc transfers nothing
    assert 0 < rows[2]["n_new"] <= 3        # edit re-transfers ~1 chunk, not the doc
    assert rows[2]["n"] > 10                # and the doc has many chunks


def test_fast_boundaries_bit_identical_to_scalar():
    from ocr_platform_spark.operators.cdc import cdc_boundaries_fast

    rng = random.Random(13)
    for n in [0, 1, 2, 15, 16, 17, 63, 64, 255, 256, 257, 1000, 5000]:
        data = _rand_bytes(n, seed=n)
        assert cdc_boundaries(data) == cdc_boundaries_fast(data), n
    # structured payloads and non-default parameters (incl. uint16 width
    # and the min_size < avg_bits scalar fallback)
    for pat in [b"\x00" * 2000, b"ab" * 1500, bytes(range(256)) * 8]:
        assert cdc_boundaries(pat) == cdc_boundaries_fast(pat)
    for params in [(8, 32, 512), (6, 6, 256), (10, 64, 1024), (8, 4, 64)]:
        for _ in range(25):
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(4000)))
            assert cdc_boundaries(data, *params) == cdc_boundaries_fast(data, *params), params


def test_storage_params_offset_shift_dedup():
    """At the storage operating point (avg_bits=12 -> ~4-5 KB chunks,
    uint16 mask path) a shared blob embedded at DIFFERENT offsets in two
    payloads still shares most interior chunk hashes — the property that
    makes host dictionaries work; and mean chunk size sits in the
    expected band."""
    rng = random.Random(7)
    blob = bytes(rng.randrange(256) for _ in range(24576))
    head_a = bytes(rng.randrange(256) for _ in range(1311))
    head_b = bytes(rng.randrange(256) for _ in range(4979))
    tail = bytes(rng.randrange(256) for _ in range(8192))
    pa = head_a + blob + tail
    pb = head_b + blob + tail
    ha = {
        hashlib.md5(pa[s:e]).hexdigest()
        for s, e in cdc_boundaries_fast(pa, avg_bits=12, min_size=1024, max_size=16384)
    }
    hb = {
        hashlib.md5(pb[s:e]).hexdigest()
        for s, e in cdc_boundaries_fast(pb, avg_bits=12, min_size=1024, max_size=16384)
    }
    spans = cdc_boundaries_fast(pa, avg_bits=12, min_size=1024, max_size=16384)
    mean = len(pa) / len(spans)
    assert 1024 <= mean <= 16384
    shared_bytes = 0
    for s, e in spans:
        if hashlib.md5(pa[s:e]).hexdigest() in hb:
            shared_bytes += e - s
    # the blob is ~72% of payload a; after one-chunk resync loss on each
    # side of the shifted region most of it must still dedup
    assert shared_bytes >= len(blob) // 2


def test_host_dictionary_stats_accounting(spark):
    """cdc_host_dictionary_stats: hand-checkable chunk table — shared
    chunks are counted once in the dictionary, repeats are savings, and
    hosts with no sharing report zero."""
    from ocr_platform_spark.operators.cdc import cdc_host_dictionary_stats

    rows = [
        # host A: chunk x shared by docs 1 and 2 (100 bytes), doc 1 also
        # repeats x internally -> 3 occurrences, dict keeps one copy
        (1, "A", "x", 100), (1, "A", "x", 100), (2, "A", "x", 100),
        (1, "A", "u", 40), (2, "A", "v", 60),
        # host B: no cross-doc sharing ("w" repeats only within doc 3)
        (3, "B", "w", 50), (3, "B", "w", 50), (4, "B", "z", 70),
    ]
    df = spark.createDataFrame(rows, "id long, host string, chunk_hash string, length int")
    out = {r["host"]: r.asDict() for r in cdc_host_dictionary_stats(df, "host").collect()}
    assert out["A"]["total_bytes"] == 400
    assert out["A"]["dict_bytes"] == 100
    assert out["A"]["saved_bytes"] == 200  # (3-1) * 100
    assert out["A"]["saved_pm"] == 500
    assert out["B"]["dict_bytes"] == 0 and out["B"]["saved_bytes"] == 0
