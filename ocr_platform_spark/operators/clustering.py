"""Embedding-space domain discovery — k-means clustering as a curation
dimension.

Web corpora carry no trustworthy topic metadata: `source`/`lang` columns
describe WHERE a page came from, not WHAT it is. Cluster-based curation
(SemDedup's coarse stage, Abbas et al. 2023; cluster-balanced mixtures in
the DoReMi / UniMax spirit where the "domain" axis is *discovered* rather
than declared) k-means-clusters the embedding space and then treats the
cluster id exactly like a language or source tag: profile it, weight it,
cap it.

This module reuses the engine's existing exact-arithmetic machinery end to
end — the deterministic Lloyd quantizer (:func:`ann.train_ivf`, bounded
driver sample), the staged numpy assignment
(:func:`semdedup.assign_with_centroid_sim`), the Hamilton-seat temperature
weights (:func:`sampling.temperature_weights`) and the md5-draw per-group
cap (:func:`sampling.cap_per_group`) — so every downstream number is
integer-exact and the DuckDB oracle replays the whole tail from the staged
assignment plus raw parquet.

Scale shape at 10^9 docs: the k-means sample is driver-bounded
(~100·n_clusters rows); assignment is one map-side Arrow matmul pass; the
profile is a single hash aggregate on cluster id; the balanced sample is a
per-cluster rank cap (WindowGroupLimit under the `rk <= cap` filter — no
full sort of any cluster materializes). Nothing all-pairs, nothing
corpus-sized on the driver.

Reference scope note: the OCR reference has no embedding space (documents
are single extractions, ``ocr_backend/app/services/document_service.py``);
this family serves the engine's own web-corpus north star, where mixture
decisions need a topic axis that metadata does not provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.operators.sampling import cap_per_group


def cluster_profile(
    docs: DataFrame,
    assign: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-cluster corpus profile: size, text mass, language spread, the
    plurality language, and the centroid-similarity mass — the table a
    curation run reads to decide which discovered domains to up/down-weight.

    All-integer outputs: ``cent_sim_sum`` is the exact sum of the staged
    ×10^6 centroid similarities (a mean would need integer division, whose
    negative-operand rounding differs between engines — Spark ``div``
    truncates, DuckDB ``//`` floors — so the profile ships the sum and
    count and lets consumers divide); the plurality language breaks count
    ties on the language value itself, so the winner is a strict total
    order in both engines.

    One shuffle on cluster id for the profile aggregate plus one
    dimension-sized (cluster, lang) aggregate for the plurality pick.
    """
    a = assign.select(F.col("id").alias(id_col), "cluster", "cent_sim")
    j = docs.select(id_col, lang_col, chars_col).join(a, id_col)

    base = j.groupBy("cluster").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(chars_col).cast("long")).alias("total_chars"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.sum("cent_sim").alias("cent_sim_sum"),
    )
    # plurality language: max count, ties broken by smaller lang string.
    # max_by over the (count, reversed-tiebreak) pair would need an order
    # inversion on a string; a rank over the dimension-sized (cluster,
    # lang) table is clearer and equally cheap.
    from pyspark.sql import Window

    per_lang = j.groupBy("cluster", lang_col).agg(F.count("*").alias("_n"))
    w = Window.partitionBy("cluster").orderBy(F.desc("_n"), F.col(lang_col))
    top = (
        per_lang.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "cluster",
            F.col(lang_col).alias("top_lang"),
            F.col("_n").alias("top_lang_docs"),
        )
    )
    return base.join(top, "cluster")


def cluster_balanced_sample(
    assign: DataFrame,
    cap: int,
    salt: str = "cb",
) -> DataFrame:
    """At most ``cap`` docs per discovered cluster, drawn by md5 order —
    the ClusterClip-style flattening that stops a template-farm cluster
    (one boilerplate shape, millions of pages) from dominating the mix the
    way a mega-host would without :func:`sampling.cap_per_group`.

    Returns (id, cluster, draw_rank) for the kept rows. The rank filter
    compiles to WindowGroupLimit, so no cluster is ever fully sorted."""
    kept = cap_per_group(
        assign.select("id", "cluster"), "cluster", "id", cap, salt=salt
    )
    return kept.select("id", "cluster", F.col("_rank").alias("draw_rank"))
