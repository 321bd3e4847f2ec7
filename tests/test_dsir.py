"""DSIR importance resampling (operators/dsir.py): the weighting math is
differentially checked in pure python FROM the engine's own feature table
(bucket hashing is xxhash64 — opaque — but everything after it must be
exact integers), plus selection determinism and partitioning invariance."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from ocr_platform_spark.operators.dsir import (
    bucket_distribution,
    dsir_select,
    dsir_weights,
    hashed_gram_counts,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox naps", "en"),
    (2, "le renard brun rapide saute", "fr"),
    (3, "der schnelle braune fuchs springt", "de"),
    (4, "the lazy dog naps again and again", "en"),
    (5, "renard brun brun brun", "fr"),
]


def _setup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    feats = hashed_gram_counts(docs, "doc_id", "text", n_buckets=64, n=2)
    return docs, feats


def test_weights_match_python_recompute(spark):
    docs, feats = _setup(spark)
    rows = [(r["id"], r["bucket"], r["cnt"]) for r in feats.collect()]
    en_ids = {0, 1, 4}
    c_t: Counter = Counter()
    c_r: Counter = Counter()
    for i, b, c in rows:
        c_r[b] += c
        if i in en_ids:
            c_t[b] += c
    exp_w: dict[int, int] = {}
    exp_n: dict[int, int] = {}
    for i, b, c in rows:
        bt = c_t[b].bit_length() if b in c_t else 0
        br = c_r[b].bit_length() if b in c_r else 0
        exp_w[i] = exp_w.get(i, 0) + c * (bt - br)
        exp_n[i] = exp_n.get(i, 0) + c
    target = bucket_distribution(
        feats, docs.where(F.col("lang") == "en").select("doc_id")
    )
    raw = bucket_distribution(feats)
    got = {
        r["id"]: (r["n_grams"], r["w_bits"])
        for r in dsir_weights(feats, target, raw).collect()
    }
    assert got == {i: (exp_n[i], exp_w[i]) for i in exp_n}
    # target docs must rank above off-target docs per gram
    rate = {i: got[i][1] / got[i][0] for i in got}
    assert min(rate[i] for i in en_ids) > max(rate[i] for i in (2, 3, 5))


def test_selection_deterministic_and_partition_invariant(spark):
    docs, feats = _setup(spark)
    target = bucket_distribution(
        feats, docs.where(F.col("lang") == "en").select("doc_id")
    )
    raw = bucket_distribution(feats)
    a = dsir_select(dsir_weights(feats, target, raw), 3).collect()
    feats13 = feats.repartition(13)
    b = dsir_select(dsir_weights(feats13, target, raw), 3).collect()
    assert [r["id"] for r in a] == [r["id"] for r in b]
    assert {r["id"] for r in a} <= {0, 1, 4}


def test_distribution_tables_are_broadcast(spark):
    docs, feats = _setup(spark)
    target = bucket_distribution(
        feats, docs.where(F.col("lang") == "en").select("doc_id")
    )
    raw = bucket_distribution(feats)
    plan = dsir_weights(feats, target, raw)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
