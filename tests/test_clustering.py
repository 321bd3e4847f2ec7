"""Clustering-as-curation-dimension (operators/clustering.py): per-cluster
profile arithmetic (plurality tie-break, exact integer sums) and the
cluster-balanced md5 cap (determinism, cap enforcement, WindowGroupLimit
plan shape)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_platform_spark.operators.clustering import (
    cluster_balanced_sample,
    cluster_profile,
)


def _frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", 100),
            (2, "en", 50),
            (3, "de", 30),
            (4, "de", 70),
            (5, "fr", 10),
            (6, "en", 20),
        ],
        "doc_id long, lang string, n_chars long",
    )
    assign = spark.createDataFrame(
        [
            (1, 0, 900000),
            (2, 0, -100),  # negative cent_sim must survive the sum exactly
            (3, 0, 500000),
            (4, 1, 800000),
            (5, 1, 700000),
            (6, 1, 600000),
        ],
        "id long, cluster int, cent_sim long",
    )
    return docs, assign


def test_cluster_profile_sums_and_plurality(spark):
    docs, assign = _frames(spark)
    rows = {r["cluster"]: r for r in cluster_profile(docs, assign).collect()}
    c0, c1 = rows[0], rows[1]
    assert c0["n_docs"] == 3 and c0["total_chars"] == 180
    assert c0["n_langs"] == 2
    assert c0["cent_sim_sum"] == 900000 - 100 + 500000
    # 2 en vs 1 de -> en wins on count
    assert c0["top_lang"] == "en" and c0["top_lang_docs"] == 2
    # cluster 1: de=1, fr=1, en=1 — three-way count tie, smallest lang wins
    assert c1["top_lang"] == "de" and c1["top_lang_docs"] == 1


def test_cluster_balanced_sample_cap_and_determinism(spark):
    assign = spark.createDataFrame(
        [(i, i % 3, 0) for i in range(60)], "id long, cluster int, cent_sim long"
    )
    out = cluster_balanced_sample(assign, cap=5)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster"], []).append(r["draw_rank"])
    assert set(per) == {0, 1, 2}
    for ranks in per.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]
    # the md5 draw is a pure function of the id — rerun is byte-equal
    again = sorted((r["id"], r["cluster"], r["draw_rank"]) for r in out.collect())
    assert again == sorted((r["id"], r["cluster"], r["draw_rank"]) for r in rows)


def test_cluster_balanced_sample_plan_is_group_limit(spark):
    assign = spark.createDataFrame(
        [(i, i % 3, 0) for i in range(60)], "id long, cluster int, cent_sim long"
    )
    plan = cluster_balanced_sample(assign, cap=5)._jdf.queryExecution().executedPlan().toString()
    # the rank<=cap filter must push into a WindowGroupLimit so no cluster
    # is ever fully sorted/materialized
    assert "WindowGroupLimit" in plan
