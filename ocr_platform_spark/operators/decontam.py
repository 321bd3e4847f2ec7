"""Benchmark decontamination: flag training documents that share any exact
word n-gram with an evaluation/benchmark set (the GPT-3/Llama-style 13-gram
overlap rule; n is a parameter since the right value depends on tokenizer
and corpus register).

This is the curation stage the OCR reference has no analogue for — it exists
because a *training-data* engine must prove its corpus does not leak the
eval set. Everything here is exact string matching, so an independent SQL
engine reproduces the full computation (gram construction, set membership,
per-doc tallies) from the raw table bytes — the catalog query `doc_decontam`
carries a staging-free oracle.

Scale shape (the part that matters at 10^12 docs):

- the eval side is benchmark-sized (thousands of documents), so its distinct
  n-gram set is a **broadcast** — the corpus is never shuffled to meet it;
- the corpus side builds grams as pure column expressions (split/transform/
  slice — whole-stage codegen, no explode of the full corpus survives the
  plan: the explode feeds straight into the broadcast hash join, so only
  *matching* grams become post-join rows);
- per-doc totals come from `size(array_distinct(...))` on the gram array —
  no shuffle at all;
- the hit tally aggregates only the matched rows (tiny) and joins back to
  the per-doc frame; AQE broadcasts it at runtime. Net: zero corpus-sized
  shuffles.

At 100 TB the gram *strings* would be hashed to int64 before the join
(`xxhash64`) to shrink the broadcast and the comparison; the catalog query
keeps raw strings so DuckDB matches byte-for-byte — the join key is the
only difference, the plan is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_platform_spark.functions.textfns import bind_once


def decontam_tokens(col: Column | str) -> Column:
    """lower + split on single spaces + drop empties — deliberately the
    simplest normalization that both Spark and DuckDB express identically
    (``list_filter(string_split(lower(text), ' '), x -> x <> '')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), " "), lambda x: x != F.lit(""))


def word_ngrams_strict(tokens: Column, n: int) -> Column:
    """All n-grams of exactly ``n`` tokens (space-joined); texts shorter
    than ``n`` tokens yield an EMPTY array — unlike `textfns.word_shingles`,
    which degrades short texts to a single catch-all shingle. Strictness
    matters here: a 3-word doc must not be flagged for matching a 3-word
    *prefix* of an eval gram.

    The token expression is λ-bound (``bind_once``): referenced directly
    inside the per-gram lambda it would be re-evaluated once PER GRAM after
    CollapseProject inlines it — measured 8× the runtime of this operator's
    catalog query at sf0.1."""

    def grams_of(ts: Column) -> Column:
        return F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(ts, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tokens, grams_of)


def eval_ngram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """(g) — the distinct n-gram universe of the eval/benchmark set."""
    return (
        eval_df.select(
            F.explode(word_ngrams_strict(decontam_tokens(text_col), n)).alias("g")
        )
        .distinct()
    )


def mark_contaminated(
    corpus: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """(id, n_grams, n_hits, contaminated) for every corpus document.

    ``n_grams`` counts the doc's DISTINCT n-grams; ``n_hits`` how many of
    those appear anywhere in the eval set; ``contaminated`` is the
    ``n_hits >= min_hits`` gate a curation funnel filters on. Documents too
    short to form a single n-gram come back with ``n_grams = 0`` and clean.
    """
    per_doc = corpus.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams_strict(decontam_tokens(text_col), n)).alias(
            "_grams"
        ),
    )
    hits = (
        per_doc.select("id", F.explode("_grams").alias("g"))
        .join(F.broadcast(eval_grams), "g")
        .groupBy("id")
        # grams are array_distinct-ed per doc above, so a plain count is
        # already distinct — countDistinct would add a second hash pass
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        per_doc.select("id", F.size("_grams").alias("n_grams"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
