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


def _py_gopher(t):
    """Pure-python mirror of gopher_stats (Java \\s = ASCII whitespace;
    trim/ltrim/rtrim are space-only after collapse; split keeps trailing
    empties)."""
    import re

    raw = t or ""
    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", raw.lower()).strip(" ")
    words = norm.split(" ")
    empty = norm == ""
    n_words = 0 if empty else len(words)
    n_word_chars = 0 if empty else len(norm) - (len(words) - 1)
    n_hash = raw.count("#")
    n_ellipsis = (len(raw) - len(raw.replace("...", ""))) // 3
    lines = raw.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for l in lines if l.lstrip(" ").startswith(("-", "*")))
    n_ell_lines = sum(1 for l in lines if l.rstrip(" ").endswith("..."))
    n_alpha = sum(1 for w in words if re.search("[a-z]", w))
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    n_stops = sum(1 for s in stops if s in words)
    return dict(
        n_words=n_words, n_word_chars=n_word_chars, n_hash=n_hash,
        n_ellipsis=n_ellipsis, n_lines=n_lines, n_bullet_lines=n_bullet,
        n_ellipsis_lines=n_ell_lines, n_alpha_words=n_alpha,
        n_stopwords=n_stops,
    )


def test_hypothesis_gopher_stats_match_python_mirror(spark):
    from hypothesis import given, settings, strategies as st

    text = st.text(
        alphabet="ab D-*#._\n\t " + "theofandwith", min_size=0, max_size=120
    )
    collected: list[str] = []

    @given(text)
    @settings(max_examples=40, deadline=None)
    def gather(t):
        collected.append(t)

    gather()
    collected += [
        "...", "......", "#", " - x\n* y\n", "the the the", "\n\n\n",
        " .", "a" * 50, "-", "*...", "  *  lead", "x ...\ny ...",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(collected)], "i int, text string"
    )
    got = {
        r["i"]: {k: v for k, v in r.asDict().items() if k != "i"}
        for r in df.select("i", gopher_stats("text").alias("g"))
        .select("i", "g.*")
        .collect()
    }
    for i, t in enumerate(collected):
        assert got[i] == _py_gopher(t), (repr(t), got[i], _py_gopher(t))
