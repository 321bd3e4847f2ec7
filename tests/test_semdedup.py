"""SemDedup (operators/semdedup.py): keep-outlier rule on constructed
clusters — exactly one survivor per ε-ball, chains collapse to the most
outlying member, cross-cluster pairs are never compared."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ocr_platform_spark.operators.semdedup import (
    assign_with_centroid_sim,
    semantic_duplicates,
)

# two well-separated centroids
CENTS = np.array([[1.0] + [0.0] * 7, [0.0, 1.0] + [0.0] * 6])


def _emb(spark):
    def v(*parts):
        out = [0.0] * 8
        for i, val in parts:
            out[i] = float(val)
        return out

    rows = [
        # cluster 0: 10/11 nearly identical (ball), 12 far inside the ball's
        # radius from neither -> survivor on its own
        (10, v((0, 1.0), (2, 0.05))),
        (11, v((0, 1.0), (2, 0.06))),          # ~0.9999 cos with 10
        (12, v((0, 0.8), (3, 0.6))),            # distinct direction
        # cluster 1: a chain 20~21~22 (adjacent sims high)
        (20, v((1, 1.0))),
        (21, v((1, 1.0), (4, 0.03))),
        (22, v((1, 1.0), (4, 0.06))),
        # cluster 1 vs cluster 0: 30 is similar in raw cosine to nothing
        (30, v((1, 0.7), (5, 0.71))),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_keep_outlier_rule(spark):
    emb = _emb(spark)
    assign = assign_with_centroid_sim(emb, CENTS)
    got = {
        r["vec_id"]: r.asDict()
        for r in semantic_duplicates(emb, assign, threshold_q6=995000).collect()
    }
    # ball {10, 11}: the one with LOWER centroid sim survives
    cs10, cs11 = got[10]["cent_sim"], got[11]["cent_sim"]
    survivor = 10 if (cs10, 10) < (cs11, 11) else 11
    dropped = 11 if survivor == 10 else 10
    assert not got[survivor]["is_dup"] and got[dropped]["is_dup"]
    # chain {20, 21, 22}: exactly one survivor — the minimum (cent_sim, id)
    chain = [(got[i]["cent_sim"], i) for i in (20, 21, 22)]
    keep = min(chain)[1]
    for i in (20, 21, 22):
        assert got[i]["is_dup"] == (i != keep), (i, got[i])
    # isolated items never flagged
    assert not got[12]["is_dup"] and not got[30]["is_dup"]
    assert got[12]["n_dup_neighbors"] == 0


def test_partitioning_invariance(spark):
    emb = _emb(spark)
    assign = assign_with_centroid_sim(emb, CENTS)
    a = semantic_duplicates(emb, assign, threshold_q6=995000).collect()
    b = semantic_duplicates(
        emb.repartition(5), assign.repartition(3), threshold_q6=995000
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kernel_matches_expression_pair_scan(spark):
    """The applyInPandas Gram-matrix pair scan and the pure column-
    expression scan are the same function: the kernel only PREFILTERS (at
    threshold−2 q6 margin, with exact integer dot/norms — float64 matmul
    is exact below 2^53 here) and the authoritative double-round gate
    runs in the identical Spark expression on both paths. Pinned
    row-for-row on derived embeddings including zero-norm (empty-text)
    vectors and exact-duplicate texts (cosine exactly 1.0)."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators import ann
    from ocr_platform_spark.operators.embed import hashed_ngram_embedding
    from ocr_platform_spark.operators.semdedup import (
        assign_with_centroid_sim,
        semantic_duplicates,
    )

    rows = [(i, f"document {i % 7} body text with shared boilerplate") for i in range(40)]
    rows += [(100, ""), (101, "")]  # zero-norm vectors: gate must skip
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_ngram_embedding(df, "doc_id", "text", as_float=True).select(
        F.col("id").alias("vec_id"), "embedding"
    ).persist()
    a = assign_with_centroid_sim(emb, ann.train_ivf(emb, n_lists=4)).persist()
    for thr in (900000, 999999, 1000000):
        k = sorted(map(tuple, semantic_duplicates(emb, a, threshold_q6=thr, kernel=True).collect()))
        e = sorted(map(tuple, semantic_duplicates(emb, a, threshold_q6=thr, kernel=False).collect()))
        assert k == e
