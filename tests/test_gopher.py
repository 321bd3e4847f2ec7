"""Gopher rule stats (functions/textfns.gopher_stats): hand-computed edge
fixtures — the catalog oracle covers the corpus-wide recompute, this pins
the per-rule semantics on adversarial shapes."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_platform_spark.functions.textfns import gopher_stats

FIXTURES = [
    # (text, expected dict)
    (
        "the cat sat on the mat",
        dict(n_words=6, n_word_chars=17, n_hash=0, n_ellipsis=0, n_lines=1,
             n_bullet_lines=0, n_ellipsis_lines=0, n_alpha_words=6, n_stopwords=1),
    ),
    (
        "",
        dict(n_words=0, n_word_chars=0, n_hash=0, n_ellipsis=0, n_lines=1,
             n_bullet_lines=0, n_ellipsis_lines=0, n_alpha_words=0, n_stopwords=0),
    ),
    (
        None,
        dict(n_words=0, n_word_chars=0, n_hash=0, n_ellipsis=0, n_lines=1,
             n_bullet_lines=0, n_ellipsis_lines=0, n_alpha_words=0, n_stopwords=0),
    ),
    (
        "- item one\n  * item two\nplain line ...\n#tag #tag....",
        # words: -, item, one, *, item, two, plain, line, ..., #tag, #tag....
        # alpha: item one item two plain line tag tag -> 8
        dict(n_words=11, n_word_chars=40, n_hash=2, n_ellipsis=2, n_lines=4,
             n_bullet_lines=2, n_ellipsis_lines=2, n_alpha_words=8, n_stopwords=0),
    ),
    (
        "12 34 56",
        dict(n_words=3, n_word_chars=6, n_hash=0, n_ellipsis=0, n_lines=1,
             n_bullet_lines=0, n_ellipsis_lines=0, n_alpha_words=0, n_stopwords=0),
    ),
    (
        "To be OR not to BE that is the question WITH gusto",
        # normalized lowercase: stopwords present: to, be, that, the, with -> 5
        dict(n_words=12, n_word_chars=39, n_hash=0, n_ellipsis=0, n_lines=1,
             n_bullet_lines=0, n_ellipsis_lines=0, n_alpha_words=12, n_stopwords=5),
    ),
]


def test_gopher_stats_fixtures(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(FIXTURES)], "i int, text string"
    )
    got = {
        r["i"]: r.asDict()
        for r in df.select("i", gopher_stats("text").alias("g"))
        .select("i", "g.*")
        .collect()
    }
    for i, (_t, exp) in enumerate(FIXTURES):
        row = {k: v for k, v in got[i].items() if k != "i"}
        assert row == exp, (i, _t, row, exp)


def test_gopher_keep_requires_fifty_words(spark):
    from ocr_platform_spark.queries import CATALOG

    # a 60-word clean English paragraph passes; a 6-word one fails on count
    good = ("the quick brown fox jumps over the lazy dog and then the dog "
            "naps with great joy in the warm sun of a long summer afternoon "
            "while the fox walks away to find more mischief in the quiet "
            "green field behind the old red barn near the river bend that "
            "have been there for years")
    df = spark.createDataFrame([(0, good), (1, "the cat sat with a hat")],
                               "doc_id long, text string")
    s = df.select("doc_id", gopher_stats("text").alias("g")).select("doc_id", "g.*")
    keep_expr = (
        F.col("n_words").between(50, 100000)
        & (3 * F.col("n_words") <= F.col("n_word_chars"))
        & (F.col("n_word_chars") <= 10 * F.col("n_words"))
        & (10 * F.col("n_hash") <= F.col("n_words"))
        & (10 * F.col("n_ellipsis") <= F.col("n_words"))
        & (10 * F.col("n_bullet_lines") < 9 * F.col("n_lines"))
        & (10 * F.col("n_ellipsis_lines") < 3 * F.col("n_lines"))
        & (5 * F.col("n_alpha_words") >= 4 * F.col("n_words"))
        & (F.col("n_stopwords") >= 2)
    )
    got = {r["doc_id"]: r["k"] for r in s.select("doc_id", keep_expr.alias("k")).collect()}
    assert got == {0: True, 1: False}
