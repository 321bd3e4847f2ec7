"""Bloom-prefiltered resume (operators/bloom.py): output must be byte-equal
to the plain left-anti join in every regime — sane sizing, undersized
bitmap (forced false positives), empty seen set — and the filter must have
no false negatives by construction."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_platform_spark.operators.bloom import bloom_resume, bloom_words, with_bloom_flag


def _docs(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), F.pmod("id", F.lit(37)), F.lit("/p"), "id").alias(
            "url"
        ),
        F.col("id").alias("payload"),
    )


def _exact(docs, seen):
    return docs.join(seen.select("url").distinct(), "url", "left_anti")


def _rows(df):
    return sorted((r["url"], r["payload"]) for r in df.collect())


def test_output_equals_exact_anti_join(spark):
    docs = _docs(spark)
    seen = docs.where(F.col("payload") % 3 == 0).select("url")
    got = bloom_resume(docs, seen, "url", n_bits=1 << 13, n_hashes=4)
    assert _rows(got) == _rows(_exact(docs, seen))


def test_undersized_bitmap_still_exact(spark):
    # 64 bits for ~130 keys: nearly every probe is a false positive — the
    # prefilter saves nothing but the OUTPUT contract must hold unchanged
    docs = _docs(spark)
    seen = docs.where(F.col("payload") % 3 == 0).select("url")
    got = bloom_resume(docs, seen, "url", n_bits=64, n_hashes=4)
    assert _rows(got) == _rows(_exact(docs, seen))


def test_empty_seen_set_passes_everything(spark):
    docs = _docs(spark, n=50)
    seen = docs.where(F.lit(False)).select("url")
    got = bloom_resume(docs, seen, "url", n_bits=1 << 10)
    assert _rows(got) == _rows(docs)


def test_no_false_negatives_and_real_pruning(spark):
    docs = _docs(spark)
    seen = docs.where(F.col("payload") % 3 == 0).select("url")
    flags = with_bloom_flag(
        docs, "url", bloom_words(seen, "url", 1 << 13, 4), 1 << 13, 4
    )
    truth = flags.withColumn("seen", F.col("payload") % 3 == 0)
    # a seen key flagged definitely-new would be a correctness bug
    assert truth.where(~F.col("maybe_seen") & F.col("seen")).count() == 0
    # with ~60 bits/key the filter must actually reject most new keys
    n_new = truth.where(~F.col("seen")).count()
    n_pruned = truth.where(~F.col("maybe_seen")).count()
    assert n_pruned >= int(0.9 * n_new), (n_pruned, n_new)
