"""Margin-based bitext mining — cross-lingual parallel-pair extraction.

The standard recipe for mining translation pairs out of a multilingual web
crawl (Artetxe & Schwenk, "Margin-based Parallel Corpus Mining with
Multilingual Sentence Embeddings", ACL 2019; the CCMatrix/CCAligned
pipeline): score a candidate pair (x, y) not by raw cosine — which is
miscalibrated across embedding-space neighborhoods — but by the RATIO
margin

    margin(x, y) = cos(x, y) / ( mean_{z∈NNk(x,Y)} cos(x, z)/2
                               + mean_{z∈NNk(y,X)} cos(y, z)/2 )

and keep each x's best y when the margin clears a threshold (>1 means "y
is closer to x than x's average neighborhood", the hallmark of a true
translation rather than a topical neighbor).

Exact-arithmetic rendition: cosines come from :func:`ann.quantized_topk`
(integer dot/norm, one deterministic double division rounded to 6 dp), are
re-scaled to exact BIGINTs (×10^6), and every sum/threshold below is
integer math — the margin gate is the cross-multiplication
``100 * 2k * c(x,y) ≥ threshold_x100 * (S_x + S_y)``, so both engines
agree bit-for-bit. The reported ``margin`` column is a single division of
those exact integers, rounded to 6 dp.

Scale shape: each direction's kNN is whatever ANN path fits the corpus
(the exact quantized crossJoin here, the LSH/IVF ladder at 10^9 vectors —
the margin math only consumes (query, item, cosine) triples); the
neighborhood sums are per-id aggregates of k rows; the final join is
candidate-sized. Nothing is all-pairs beyond the kNN stage itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_platform_spark.operators.ann import quantized_topk


def _c6(col: str) -> F.Column:
    """Exact integer rescale of a 6-dp-rounded cosine: ×10^6 BIGINT."""
    return F.round(F.col(col) * 1000000).cast("long")


def margin_mine_pairs(
    xs: DataFrame,
    ys: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    threshold_x100: int = 105,
) -> DataFrame:
    """(x_id, y_id, c_xy, s_x, s_y, margin) — each x's best-margin y among
    x's k nearest Y-neighbors, kept when the ratio margin ≥
    threshold_x100/100 (gated all-integer). ``s_x``/``s_y`` are the exact
    ×10^6 neighborhood cosine sums (x over Y, y over X); both include the
    candidate itself when ranked, faithful to the paper's NNk definition.
    Pairs whose denominator is not positive are dropped (a negative mean
    neighborhood cosine makes the ratio meaningless)."""
    xy = quantized_topk(ys, xs, id_col=id_col, vec_col=vec_col, k=k).select(
        F.col("query_id").alias("x_id"),
        F.col("item_id").alias("y_id"),
        _c6("cosine").alias("c"),
    )
    yx = quantized_topk(xs, ys, id_col=id_col, vec_col=vec_col, k=k).select(
        F.col("query_id").alias("y_id"),
        F.col("item_id").alias("x_id"),
        _c6("cosine").alias("c"),
    )
    # Normalization is the PAPER's: divide by the constant 2k, so a side
    # with fewer than k candidates has its missing neighbors contribute
    # zero cosine — the neighborhood mean is deliberately diluted (the
    # pinned small-corpus tests rely on it, and at mining scale
    # |candidates| >> k always). A count-aware mean (divide by actual
    # neighbors) is the other defensible choice; it would raise sparse
    # sides' denominators and admit fewer pairs.
    s_x = xy.groupBy("x_id").agg(F.sum("c").alias("s_x"))
    s_y = yx.groupBy("y_id").agg(F.sum("c").alias("s_y"))
    den = F.col("s_x") + F.col("s_y")
    pairs = (
        xy.withColumnRenamed("c", "c_xy")
        .join(F.broadcast(s_x), "x_id")
        .join(F.broadcast(s_y), "y_id")
        .where(den > 0)
        .where(F.lit(100) * F.lit(2 * k) * F.col("c_xy") >= F.lit(threshold_x100) * den)
        .withColumn(
            "margin",
            F.round((F.lit(2 * k) * F.col("c_xy")).cast("double") / den, 6),
        )
    )
    w = Window.partitionBy("x_id").orderBy(F.desc("margin"), "y_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("x_id", "y_id", "c_xy", "s_x", "s_y", "margin")
        .orderBy("x_id")
    )


# --- URL-matched candidate pairing (the recall stage before margin mining) —

# one language-marker shape: a two-letter path segment right after the host
# ("https://host/en/rest"). Kept deliberately RE2∩`re`-safe so the DuckDB
# oracle can apply the identical pattern (see URL_LANG_PATTERN users).
URL_LANG_PATTERN = r"^https?://([^/]+)/([a-z]{2})/(.*)$"


def url_matched_pairs(docs: DataFrame, pivot_lang: str = "en") -> DataFrame:
    """ParaCrawl/WMT-style URL-matching bitext candidates: two pages are a
    candidate translation pair when their URLs are IDENTICAL after removing
    the language marker ("/en/" vs "/fr/" folders on the same site) — the
    high-precision recall stage run before embedding-based margin mining
    (:func:`margin_mine_pairs` then scores the candidates).

    ``docs`` needs (doc_id, lang, url). Per (stripped key, lang) the
    smallest doc_id represents the page (mirror-duplicate collapse);
    output is one row per (pivot-language page × other-language page)
    sharing a key:

        (key, doc_pivot, url_pivot, doc_xx, url_xx, lang_xx)

    Everything is regexp_extract + one equi-join on the stripped key —
    pure relational, no kernel. Scale shape: the join key is
    (host, path), so co-located with any url-hash bucketing; each side is
    the corpus filtered by language, and per-key groups are mirror-sized
    (a handful of languages), never corpus-sized."""
    parsed = docs.select(
        "doc_id",
        "lang",
        "url",
        F.regexp_extract("url", URL_LANG_PATTERN, 2).alias("url_lang"),
        F.concat(
            F.regexp_extract("url", URL_LANG_PATTERN, 1),
            F.lit("/"),
            F.regexp_extract("url", URL_LANG_PATTERN, 3),
        ).alias("key"),
    ).where(F.col("url_lang") != "")
    reps = parsed.groupBy("key", "url_lang").agg(
        F.min("doc_id").alias("doc_id"), F.min_by("url", "doc_id").alias("url")
    )
    piv = reps.where(F.col("url_lang") == pivot_lang).select(
        "key", F.col("doc_id").alias("doc_pivot"), F.col("url").alias("url_pivot")
    )
    oth = reps.where(F.col("url_lang") != pivot_lang).select(
        "key",
        F.col("doc_id").alias("doc_xx"),
        F.col("url").alias("url_xx"),
        F.col("url_lang").alias("lang_xx"),
    )
    return piv.join(oth, "key").orderBy("key", "lang_xx")
