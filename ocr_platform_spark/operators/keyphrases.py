"""RAKE keyphrase extraction (Rose et al. 2010), Spark-first.

Candidate phrases are the maximal word runs between stopwords and
punctuation; each word scores degree/frequency over the document's own
candidates (degree = summed length of the phrases it appears in — words
that keep company with long phrases score high), and a phrase scores the
sum of its member words. Everything is integer arithmetic after a ×1000
scale, and the full chain — punctuation split, stopword segmentation,
per-word stats, phrase scoring, per-doc top-k — replays in plain SQL:
``rake_oracle_sql`` derives its stopword alternation from the SAME
``STOPWORDS`` tuple as the Column expressions, so the two engines cannot
drift on the segmentation rule.

Scale shape: segmentation and word explode are map-side; the word-stats
aggregate and the phrase-score regroup both key by (doc, ·) — doc-local,
so partitions scale with documents, never with the corpus vocabulary;
the top-k window partitions by doc over a handful of candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "in", "a", "is", "that", "with",
    "for", "on", "as", "are", "was", "at", "by", "an", "be",
)

_PUNCT = r"[.,;:!?()]"


def _stop_re() -> str:
    return r"\b(" + "|".join(STOPWORDS) + r")\b"


def candidate_phrases(col: Column | str) -> Column:
    """array<string> of RAKE candidate phrases: lowercase, punctuation and
    stopwords become separators, runs of remaining words survive with
    single-space normalization."""
    c = F.col(col) if isinstance(col, str) else col
    merged = F.regexp_replace(
        F.regexp_replace(F.lower(c), _PUNCT, "|"), _stop_re(), "|"
    )
    return F.filter(
        F.transform(
            F.split(merged, r"\|", -1),
            lambda p: F.trim(F.regexp_replace(p, r"\s+", " ")),
        ),
        lambda p: p != F.lit(""),
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 3,
    max_words: int = 3,
) -> DataFrame:
    """(id, rank, phrase, score_x1000) — top-k RAKE keyphrases per doc.
    Phrases longer than ``max_words`` are discarded (RAKE's guard against
    run-on candidates in stopword-poor text)."""
    cand = df.select(
        F.col(id_col).alias("id"),
        F.explode(candidate_phrases(text_col)).alias("phrase"),
    ).withColumn("wlen", F.size(F.split("phrase", " ", -1)))
    cand = cand.where(F.col("wlen") <= max_words)
    words = cand.select(
        "id", "phrase", "wlen", F.explode(F.split("phrase", " ", -1)).alias("word")
    )
    stats = words.groupBy("id", "word").agg(
        F.count("*").alias("freq"), F.sum("wlen").alias("deg")
    )
    word_score = stats.select(
        "id", "word", F.expr("(deg * 1000) div freq").alias("w_score")
    )
    phrase_scores = (
        words.select("id", "phrase", "word").distinct()
        .join(word_score, ["id", "word"])
        .groupBy("id", "phrase")
        .agg(F.sum("w_score").cast("long").alias("score_x1000"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("score_x1000"), F.asc("phrase"))
    return (
        phrase_scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("id").alias(id_col),
            F.col("rank").cast("int").alias("rank"),
            "phrase",
            "score_x1000",
        )
    )


def rake_oracle_sql(table_expr: str, id_expr: str, text_expr: str,
                    top_k: int = 3, max_words: int = 3) -> str:
    """The same chain in DuckDB SQL, derived from the same STOPWORDS."""
    stop = _stop_re().replace("\\b", "\\b")
    return f"""
    WITH cand0 AS (
      SELECT {id_expr} AS id,
             unnest(string_split(
               regexp_replace(
                 regexp_replace(lower({text_expr}), '{_PUNCT}', '|', 'g'),
                 '{stop}', '|', 'g'),
               '|')) AS rawp
      FROM {table_expr}
    ),
    cand AS (
      SELECT id, trim(regexp_replace(rawp, '\\s+', ' ', 'g')) AS phrase
      FROM cand0
      WHERE trim(regexp_replace(rawp, '\\s+', ' ', 'g')) <> ''
    ),
    sized AS (
      SELECT id, phrase, len(string_split(phrase, ' ')) AS wlen
      FROM cand WHERE len(string_split(phrase, ' ')) <= {max_words}
    ),
    words AS (
      SELECT id, phrase, wlen, unnest(string_split(phrase, ' ')) AS word
      FROM sized
    ),
    stats AS (
      SELECT id, word, COUNT(*) AS freq, SUM(wlen) AS deg
      FROM words GROUP BY id, word
    ),
    ws AS (SELECT id, word, (deg * 1000) // freq AS w_score FROM stats),
    pw AS (SELECT DISTINCT id, phrase, word FROM words),
    ps AS (
      SELECT pw.id, pw.phrase, CAST(SUM(ws.w_score) AS BIGINT) AS score_x1000
      FROM pw JOIN ws ON pw.id = ws.id AND pw.word = ws.word
      GROUP BY pw.id, pw.phrase
    ),
    r AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY id ORDER BY score_x1000 DESC, phrase) AS INT) AS rank
      FROM ps
    )
    SELECT id AS doc_id, rank, phrase, score_x1000
    FROM r WHERE rank <= {top_k} ORDER BY doc_id, rank
    """
