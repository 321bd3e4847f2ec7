"""End-to-end training-corpus curation — the composed pipeline a web-scale
dataset build runs over the documents table (prompt-mandated training-data
ops as ONE plan): quality gate → language gate → exact dedup → MinHash
near-dup drop, with a per-stage funnel report.

Every stage is an operator that already exists and is independently
oracle-verified (functions/textfns.py quality/lang, operators/dedup.py
exact + MinHash); this plan is their composition plus the bookkeeping a
curation run needs — which stage dropped how many documents.

Scale shape: stages 1-2 are pure column expressions fused into one scan;
stage 3 is one hash-partitioned window on the md5 fingerprint; stage 4 is
the banded-LSH near-dup pipeline (never all-pairs) followed by a left-anti
join on the drop set. The funnel counts are separate tiny jobs over the
(cached-or-recomputed) kept sets — at 10^12 rows you would lift them from
the same pass via observation metrics, which Spark exposes as
``df.observe``; the per-stage DataFrames returned here make either choice
available to the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.functions import textfns as TX
from ocr_platform_spark.operators import dedup


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.5,
    max_top_bigram_frac: float | None = None,
) -> dict[str, DataFrame]:
    """Run the curation funnel; returns the per-stage kept DataFrames plus
    the near-dup drop set:

    ``{"input", "quality", "lang", ["repetition",] "exact",
    "dropped_near", "curated"}``

    ``max_top_bigram_frac`` enables the optional repetition gate (Gopher
    family): drop documents whose most frequent word-bigram exceeds that
    share of all bigrams — loops and generated spam that the length/
    stopword quality score misses.

    Near-dup policy: from each verified pair (id_a < id_b, Jaccard ≥
    threshold) the LARGER id is dropped — the greedy min-id-survivor rule,
    matching ``drop_exact_duplicates``'s representative choice."""
    feats = docs.select(
        "*",
        TX.quality_score(text_col).alias("_quality"),
        TX.lang_id(text_col).alias("_lang"),
    )
    s_quality = feats.where(F.col("_quality") >= min_quality)
    s_lang = s_quality.where(F.col("_lang").isin(list(langs)))
    pre_exact = s_lang
    rep_stage: DataFrame | None = None
    if max_top_bigram_frac is not None:
        grams = s_lang.select(
            F.col(id_col), F.explode(TX.word_shingles(text_col, 2)).alias("_g")
        )
        offenders = (
            grams.groupBy(id_col, "_g")
            .agg(F.count("*").alias("_c"))
            .groupBy(id_col)
            .agg((F.max("_c").cast("double") / F.sum("_c")).alias("_frac"))
            .where(F.col("_frac") > max_top_bigram_frac)
            .select(id_col)
        )
        rep_stage = s_lang.join(offenders, id_col, "left_anti")
        pre_exact = rep_stage
    s_exact = dedup.drop_exact_duplicates(
        pre_exact.drop("_quality", "_lang"), id_col, text_col
    )
    pairs = dedup.minhash_near_duplicates(
        s_exact, id_col, text_col, threshold=near_dup_threshold
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    curated = s_exact.join(dropped, id_col, "left_anti")
    out = {
        "input": docs,
        "quality": s_quality,
        "lang": s_lang,
        "exact": s_exact,
        "dropped_near": dropped,
        "curated": curated,
    }
    if rep_stage is not None:
        out["repetition"] = rep_stage
    return out


def curate_observed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en",),
):
    """Single-pass funnel instrumentation: the quality/lang gates carry
    ``df.observe`` metrics, so ONE action over the returned DataFrame
    yields the gate counts as a side channel — no per-stage recount jobs.
    This is the 10^12-row shape (an extra COUNT per stage would rescan the
    corpus once per gate).

    Returns ``(gated_df, observations)`` where ``observations`` is a dict
    of :class:`pyspark.sql.Observation`; read ``obs[name].get`` AFTER an
    action has consumed ``gated_df``. The dedup stages keep their own jobs
    (they shuffle anyway, and their outputs — not just counts — are
    needed)."""
    from pyspark.sql import Observation

    obs = {
        "input": Observation("input"),
        "quality": Observation("quality"),
        "lang": Observation("lang"),
    }
    feats = docs.observe(obs["input"], F.count(F.lit(1)).alias("n")).select(
        "*",
        TX.quality_score(text_col).alias("_quality"),
        TX.lang_id(text_col).alias("_lang"),
    )
    s_quality = feats.where(F.col("_quality") >= min_quality).observe(
        obs["quality"], F.count(F.lit(1)).alias("n")
    )
    s_lang = (
        s_quality.where(F.col("_lang").isin(list(langs)))
        .observe(obs["lang"], F.count(F.lit(1)).alias("n"))
        .drop("_quality", "_lang")
    )
    return s_lang, obs


def curation_funnel(stages: dict[str, DataFrame]) -> DataFrame:
    """(stage_no, stage, n_docs) report over :func:`curate_corpus` output."""
    order = [
        (0, "input", "input"),
        (1, "quality", "quality"),
        (2, "lang", "lang"),
        (3, "repetition", "repetition"),
        (4, "exact_dedup", "exact"),
        (5, "near_dup_drop", "curated"),
    ]
    out = None
    for no, label, key in order:
        if key not in stages:
            continue
        row = stages[key].agg(F.count("*").alias("n_docs")).select(
            F.lit(no).alias("stage_no"), F.lit(label).alias("stage"), "n_docs"
        )
        out = row if out is None else out.unionByName(row)
    return out
