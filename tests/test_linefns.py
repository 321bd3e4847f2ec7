"""C4 line-rule semantics; the catalog query `doc_c4_line_filter` carries
the byte-exact cross-engine oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.functions.linefns import (
    c4_clean_text,
    kept_lines,
    page_keep,
)


def _run(spark, text, min_words=5, min_lines=3):
    df = spark.createDataFrame([(text,)], "t string")
    staged = df.select("t", kept_lines("t", min_words).alias("kept"))
    return staged.select(
        c4_clean_text(F.col("kept")).alias("clean"),
        F.size("kept").alias("n_kept"),
        page_keep("t", F.col("kept"), min_lines).alias("keep"),
    ).first()


def test_line_rules(spark):
    text = "\n".join(
        [
            "This sentence has enough words to survive the filter.",
            "too short.",  # < 5 words
            "this line has five words but no terminal punctuation",
            "Please enable JavaScript to continue reading here.",  # policy term
            "We use cookie banners to annoy every single visitor.",  # policy term
            "  A padded line with leading spaces also survives trimming.  ",
            "",
        ]
    )
    r = _run(spark, text)
    assert r.n_kept == 2
    assert r.clean.split("\n") == [
        "This sentence has enough words to survive the filter.",
        "A padded line with leading spaces also surv" "ives trimming.",
    ]
    assert not r.keep  # only 2 surviving lines < min_lines=3


def test_page_drop_terms(spark):
    base = "\n".join(
        [
            "First sentence is long enough to pass every line gate.",
            "Second sentence is long enough to pass every line gate.",
            "Third sentence is long enough to pass every line gate.",
        ]
    )
    assert _run(spark, base).keep
    assert not _run(spark, base + "\nconst x = { a: 1 };").keep  # curly brace
    assert not _run(spark, base + "\nLorem Ipsum filler text here.").keep


def test_quote_terminal_and_min_words_param(spark):
    r = _run(spark, 'He said "this counts as terminal."\nshort one.', min_words=3, min_lines=1)
    assert r.n_kept == 1 and r.keep
