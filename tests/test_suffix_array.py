"""Suffix-array ExactSubstr marking (operators/suffix_array.py):
differential equality with the char-gram exact operator, short-doc and
sentinel semantics, shard isolation, parallelism invariance."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from ocr_platform_spark.operators import dedup
from ocr_platform_spark.operators.suffix_array import (
    mark_shard,
    sa_repeated_spans,
)


def _ref_marked(ids, texts, k):
    """Reference marking: gram → set of docs, position marked iff its gram
    (whole text for short docs) occurs in ≥2 distinct docs."""
    grams: dict[str, set] = {}
    for i, t in zip(ids, texts):
        if t is None:
            continue
        if len(t) < k:
            grams.setdefault(t, set()).add(i)
        else:
            for p in range(len(t) - k + 1):
                grams.setdefault(t[p : p + k], set()).add(i)
    marked = set()
    for i, t in zip(ids, texts):
        if t is None:
            continue
        if len(t) < k:
            if len(grams[t]) >= 2:
                marked.add((i, 0))
        else:
            for p in range(len(t) - k + 1):
                if len(grams[t[p : p + k]]) >= 2:
                    marked.add((i, p))
    return marked


def test_mark_shard_randomized_against_reference():
    rng = random.Random(7)
    for trial in range(25):
        k = rng.choice([3, 4, 5, 8])
        n = rng.randint(2, 12)
        ids = list(range(n))
        texts = []
        for _ in range(n):
            ln = rng.randint(0, 40)
            texts.append("".join(rng.choice("abc") for _ in range(ln)))
        if trial % 5 == 0:
            texts[0] = None  # null docs contribute nothing
        got_ids, got_pos = mark_shard(ids, texts, k)
        assert set(zip(got_ids, got_pos)) == _ref_marked(ids, texts, k)


def test_sentinels_block_cross_doc_phantom_repeats():
    # concatenation without separators would see "ABCDEFGH" twice
    k = 8
    ids = [1, 2, 3]
    texts = ["xxxxABCD", "EFGHyyyy", "zzABCDEFGHzz"]
    got = set(zip(*mark_shard(ids, texts, k))) if mark_shard(ids, texts, k)[0] else set()
    assert got == _ref_marked(ids, texts, k) == set()


def test_short_doc_semantics():
    k = 30
    ids = [1, 2, 3, 4]
    texts = ["tiny", "tiny", "other", ""]
    got = set(zip(*mark_shard(ids, texts, k)))
    assert got == {(1, 0), (2, 0)}


def test_differential_vs_char_gram_exact_operator(spark):
    from tests.conftest import SF_DIR

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
        .withColumn("shard", F.lit(0))
    )
    sa = sa_repeated_spans(docs, "doc_id", "text", "shard", k=30)
    posts = dedup.char_gram_postings(docs, "doc_id", "text", k=30)
    exact = dedup.repeated_spans(posts, k=30, min_df=2)
    got = sorted(map(tuple, sa.collect()))
    want = sorted(map(tuple, exact.collect()))
    assert got == want and len(got) > 0


def test_shard_isolation_and_partitioning_invariance(spark):
    rows = [
        (1, "A" * 40, 0),
        (2, "A" * 40, 1),  # same text, different shard: must NOT match
        (3, "B" * 40, 0),
        (4, "B" * 40, 0),  # same shard: matches
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, shard int")
    out1 = sorted(map(tuple, sa_repeated_spans(df.repartition(1), "doc_id", "text", "shard").collect()))
    out7 = sorted(map(tuple, sa_repeated_spans(df.repartition(7), "doc_id", "text", "shard").collect()))
    assert out1 == out7
    assert out1 == [(3, 0, 40), (4, 0, 40)]
