"""Margin-based bitext mining (operators/bitext.py): the margin must keep
a true-translation pair (one Y far closer than the neighborhood) and
reject a topical cluster (all Y equally close — raw cosine high, margin
≈ 1). Plus determinism under repartitioning."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_platform_spark.operators.bitext import margin_mine_pairs


def _vec(*parts):
    v = [0.0] * 8
    for i, val in parts:
        v[i] = float(val)
    return v


def _frames(spark):
    # x0: true translation is y100 (same direction + tiny noise); its other
    #     neighbors are weak.
    # x1: topical cluster — four ys (y201..y204) all at the SAME similarity;
    #     best cosine is high but margin ~1 -> must be rejected.
    xs = spark.createDataFrame(
        [
            (0, _vec((0, 1.0))),
            (1, _vec((1, 1.0))),
        ],
        "vec_id long, embedding array<float>",
    )
    ys = spark.createDataFrame(
        [
            (100, _vec((0, 0.98), (2, 0.2))),   # near-duplicate of x0
            (101, _vec((0, 0.3), (3, 0.95))),   # weak neighbor of x0
            (102, _vec((0, 0.25), (4, 0.97))),  # weak neighbor of x0
            (201, _vec((1, 0.7), (2, 0.71))),   # topical ring around x1
            (202, _vec((1, 0.7), (3, 0.71))),
            (203, _vec((1, 0.7), (4, 0.71))),
            (204, _vec((1, 0.7), (5, 0.71))),
        ],
        "vec_id long, embedding array<float>",
    )
    return xs, ys


def test_margin_keeps_translation_rejects_topical_ring(spark):
    # with only two xs, y-side neighborhoods are diluted by zero cosines
    # (kNN over a 2-item X), so the ring sits at margin 1.5 and the true
    # translation at ~2.34 — the gate at 2.0 separates them
    xs, ys = _frames(spark)
    got = margin_mine_pairs(xs, ys, k=3, threshold_x100=200).collect()
    assert [(r["x_id"], r["y_id"]) for r in got] == [(0, 100)]
    assert got[0]["margin"] > 2.0


def test_threshold_one_admits_ring_best(spark):
    xs, ys = _frames(spark)
    got = {
        r["x_id"]: (r["y_id"], r["margin"])
        for r in margin_mine_pairs(xs, ys, k=3, threshold_x100=0).collect()
    }
    # with the gate off, every x reports its best-margin y; the ring's
    # margin is strictly below the true translation's
    assert got[0][0] == 100 and got[0][1] > 2.0
    assert 201 <= got[1][0] <= 204 and got[1][1] < got[0][1] - 0.5


def test_partitioning_invariance(spark):
    xs, ys = _frames(spark)
    a = margin_mine_pairs(xs, ys, k=3, threshold_x100=0).collect()
    b = margin_mine_pairs(xs.repartition(5), ys.repartition(7), k=3,
                          threshold_x100=0).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_url_matched_pairs_pairing_and_collapse(spark):
    from ocr_platform_spark.operators.bitext import url_matched_pairs

    docs = spark.createDataFrame(
        [
            # key a.com/p.html: en mirror-dup (7 and 3 -> keep 3), fr + de pair
            (7, "en", "https://a.com/en/p.html"),
            (3, "en", "https://a.com/en/p.html"),
            (4, "fr", "https://a.com/fr/p.html"),
            (5, "de", "https://a.com/de/p.html"),
            # key b.com/q: only fr -> no pair (no en pivot)
            (6, "fr", "https://b.com/fr/q"),
            # marker must be exactly two lowercase letters right after host
            (8, "en", "https://c.com/eng/p.html"),
            (9, "en", "https://c.com/EN/p.html"),
            (10, "en", "https://c.com/p.html"),
        ],
        "doc_id long, lang string, url string",
    )
    rows = url_matched_pairs(docs).collect()
    assert [(r["key"], r["doc_pivot"], r["doc_xx"], r["lang_xx"]) for r in rows] == [
        ("a.com/p.html", 3, 5, "de"),
        ("a.com/p.html", 3, 4, "fr"),
    ]
    assert rows[0]["url_pivot"] == "https://a.com/en/p.html"
    assert rows[0]["url_xx"] == "https://a.com/de/p.html"


def test_url_matched_pairs_pivot_parameter(spark):
    from ocr_platform_spark.operators.bitext import url_matched_pairs

    docs = spark.createDataFrame(
        [
            (1, "fr", "https://a.com/fr/p"),
            (2, "en", "https://a.com/en/p"),
            (3, "zh", "https://a.com/zh/p"),
        ],
        "doc_id long, lang string, url string",
    )
    rows = url_matched_pairs(docs, pivot_lang="fr").collect()
    assert sorted((r["doc_xx"], r["lang_xx"]) for r in rows) == [(2, "en"), (3, "zh")]
