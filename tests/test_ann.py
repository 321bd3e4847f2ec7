"""Similarity search: brute-force exactness vs numpy; LSH recall sanity."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ocr_platform_spark.operators import ann


def _table(spark, n=60, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    mat = rng.standard_normal((n, dim))
    rows = [(i, mat[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), mat


def test_cosine_matches_numpy(spark):
    df, mat = _table(spark, n=20)
    out = ann.brute_force_topk(df, df.where(F.col("vec_id") == 0), k=5).collect()
    q = mat[0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    sims[0] = -np.inf  # self excluded
    expect = np.argsort(-sims)[:5].tolist()
    got = [r["item_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == expect
    for r in out:
        assert abs(r["cosine"] - sims[r["item_id"]]) < 1e-5


def test_lsh_recall_reasonable(spark):
    df, mat = _table(spark, n=120, dim=16)
    queries = df.where(F.col("vec_id") < 8)
    exact = ann.brute_force_topk(df, queries, k=5)
    approx = ann.lsh_topk(df, queries, k=5, n_planes=4, n_tables=6)
    e = {(r["query_id"], r["item_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["item_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall}"  # 6 tables of 4 planes on random data


def test_lsh_buckets_deterministic(spark):
    df, _ = _table(spark, n=30)
    a = ann.with_lsh_bucket(df).select("vec_id", "buckets").collect()
    b = ann.with_lsh_bucket(df).select("vec_id", "buckets").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
