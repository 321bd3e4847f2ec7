"""RAKE keyphrases: hand-computed example + cross-dialect segmentation."""

from __future__ import annotations

import duckdb

from ocr_platform_spark.operators.keyphrases import (
    candidate_phrases,
    rake_keyphrases,
    rake_oracle_sql,
)


def test_rake_hand_computed_example(spark):
    # candidates: [deep learning models][deep learning][great][deep models]
    # deep: freq 3, deg 7 -> 2333; learning: 2/5 -> 2500; models: 2/5 -> 2500
    # great: 1/1 -> 1000
    text = "deep learning models. the deep learning is great for deep models"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["rank"]: (r["phrase"], r["score_x1000"])
        for r in rake_keyphrases(df, "doc_id", "text", top_k=3).collect()
    }
    assert rows[1] == ("deep learning models", 7333)
    # 4833 tie broken lexicographically
    assert rows[2] == ("deep learning", 4833)
    assert rows[3] == ("deep models", 4833)


def test_rake_segmentation_handles_adjacent_stopwords(spark):
    df = spark.createDataFrame(
        [(1, "the of and quick brown, fox at by the")], "doc_id long, text string"
    )
    got = df.select(candidate_phrases("text").alias("p")).first()["p"]
    assert got == ["quick brown", "fox"]


def test_rake_sql_twin_matches_spark(spark):
    texts = [
        (1, "alpha beta gamma. the alpha beta is strong for alpha gamma"),
        (2, "one two; three and four at five (six)"),
        (3, "the the the"),          # all stopwords -> no candidates
        (4, "word"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got_spark = sorted(
        tuple(r)
        for r in rake_keyphrases(df, "doc_id", "text", top_k=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    got_duck = sorted(
        (r[0], r[1], r[2], r[3])
        for r in con.sql(rake_oracle_sql("documents", "doc_id", "text")).fetchall()
    )
    assert got_spark == got_duck
