"""SemDedup — semantic deduplication by cluster-then-compare.

SemDedup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", 2023) removes SEMANTIC duplicates —
paraphrases, re-renderings, templated rewrites — that exact and MinHash
dedup cannot see: k-means-cluster the embedding space, compare pairs only
WITHIN a cluster, and inside every ε-ball keep the single item LEAST
similar to its cluster centroid (the paper's keep-outliers rule; dropping
toward the centroid preserves diversity).

Exact-arithmetic rendition: the coarse clustering reuses the IVF quantizer
(:func:`ann.train_ivf` — bounded driver sample, deterministic Lloyd); the
per-item (cluster, centroid-similarity) assignment is a numpy kernel whose
output is STAGED, and everything after that boundary is exact integers —
pairwise quantized cosines (×10^6 BIGINT), the ε threshold, and the
keep-rule's strict total order ``(cent_sim, id)`` — so the DuckDB oracle
recomputes every within-cluster pair, every verdict, from the staged
assignment plus raw parquet.

Scale shape at 10^9 vectors: one map-side assignment pass, one shuffle on
cluster id, pairwise only within clusters (the paper's own cost model —
cluster count grows with the corpus, keeping cluster sizes bounded);
nothing is all-pairs across clusters and nothing collects to the driver
beyond the k-means sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.operators.ann import (
    _normalize_rows,
    _quantize,
    _quantized_cosine,
)


def assign_with_centroid_sim(
    items: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, cent_sim) — nearest centroid and the ×10^6-rescaled
    cosine to it, one numpy matmul per Arrow batch. ``cent_sim`` is the
    keep-rule's sort key; it is deterministic float64 math rounded to an
    integer, and it crosses the oracle boundary as staged data (the
    centroids are a trained model, not SQL)."""
    cents = centroids

    @F.pandas_udf("struct<cluster: int, cent_sim: long>")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        mat = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        sims = mat @ cents.T
        cl = np.argmax(sims, axis=1)
        cs = np.rint(1e6 * sims[np.arange(len(cl)), cl]).astype(np.int64)
        return pd.DataFrame({"cluster": cl.astype("int32"), "cent_sim": cs})

    return items.select(
        F.col(id_col).alias("id"), _assign(F.col(vec_col)).alias("a")
    ).select("id", "a.cluster", "a.cent_sim")


def semantic_duplicates(
    items: DataFrame,
    assign: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_q6: int = 950000,
    scale: int = 1000,
    kernel: bool = True,
) -> DataFrame:
    """(vec_id, cluster, cent_sim, n_dup_neighbors, is_dup) — the SemDedup
    verdict per item: ``n_dup_neighbors`` counts same-cluster items with
    quantized cosine ≥ threshold; ``is_dup`` marks items that lose the
    keep-rule to at least one such neighbor (strictly smaller
    ``(cent_sim, id)`` — keep the outlier; ties by id). Exactly one member
    of every duplicate pair survives, and a chain collapses to its single
    most-outlying member.

    ``kernel=True`` (default) computes the within-cluster pair scan as ONE
    ``applyInPandas`` matmul per cluster: Gram matrix in float64 BLAS —
    EXACT integer arithmetic here, since quantized entries and their
    64-term products stay far below 2^53 — prefiltered at a safe margin of
    2 q6 units below the threshold. The AUTHORITATIVE gate still runs in
    the Spark expression layer over the kernel's exact integer
    ``(dot, na, nb)`` columns — the same double-round chain the DuckDB
    oracle replays — so the kernel can only add candidate rows the gate
    then rejects, never change a verdict (rounding moves a score < 1 q6
    unit; the margin is 2). ``kernel=False`` keeps the pure column-
    expression pair scan — same output, pinned by the pytest differential —
    whose per-pair interpreted ``zip_with``/``aggregate`` costs ~10× at
    sf0.1 (measured 38.6 s → 4 s on 1.8M pairs)."""
    m = (
        items.select(
            F.col(id_col).alias("id"), _quantize(F.col(vec_col), scale).alias("v")
        )
        .join(assign, "id")
    )
    if kernel:
        margin = max(threshold_q6 - 2, 0)

        def _pairs_of(pdf: pd.DataFrame) -> pd.DataFrame:
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            ids = pdf["id"].to_numpy()
            cs = pdf["cent_sim"].to_numpy()
            norms2 = (V * V).sum(axis=1)  # exact: integer-valued float64
            ok = norms2 > 0
            dots = V @ V.T  # exact integer values < 2^53
            with np.errstate(divide="ignore", invalid="ignore"):
                denom = np.sqrt(norms2)[:, None] * np.sqrt(norms2)[None, :]
                c6 = np.where(denom > 0, dots / denom * 1e6, 0.0)
            xi, yi = np.nonzero(
                (c6 >= margin) & ok[:, None] & ok[None, :]
                & (ids[:, None] != ids[None, :])
            )
            return pd.DataFrame(
                {
                    "x_id": ids[xi],
                    "x_cs": cs[xi],
                    "y_id": ids[yi],
                    "y_cs": cs[yi],
                    "dot": dots[xi, yi].astype(np.int64),
                    "na": norms2[xi].astype(np.int64),
                    "nb": norms2[yi].astype(np.int64),
                }
            )

        # schema follows the caller's id type (urls in the composed job,
        # longs in the catalog queries)
        id_t = m.schema["id"].dataType.simpleString()
        cs_t = m.schema["cent_sim"].dataType.simpleString()
        cand = m.groupBy("cluster").applyInPandas(
            _pairs_of,
            f"x_id {id_t}, x_cs {cs_t}, y_id {id_t}, y_cs {cs_t},"
            " dot long, na long, nb long",
        )
        cos = F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
                6,
            ),
        ).otherwise(F.lit(0.0))
        pairs = cand.select(
            "x_id",
            "x_cs",
            "y_id",
            "y_cs",
            F.round(cos * 1000000).cast("long").alias("c"),
        ).where(F.col("c") >= threshold_q6)
    else:
        x = m.select(
            F.col("id").alias("x_id"),
            F.col("cluster"),
            F.col("cent_sim").alias("x_cs"),
            F.col("v").alias("x_v"),
        )
        y = m.select(
            F.col("id").alias("y_id"),
            F.col("cluster"),
            F.col("cent_sim").alias("y_cs"),
            F.col("v").alias("y_v"),
        )
        cos_q6 = F.round(_quantized_cosine("x_v", "y_v") * 1000000).cast("long")
        pairs = (
            x.join(y, "cluster")
            .where(F.col("x_id") != F.col("y_id"))
            .select("x_id", "x_cs", "y_id", "y_cs", cos_q6.alias("c"))
            .where(F.col("c") >= threshold_q6)
        )
    better = (F.col("y_cs") < F.col("x_cs")) | (
        (F.col("y_cs") == F.col("x_cs")) & (F.col("y_id") < F.col("x_id"))
    )
    stats = pairs.groupBy("x_id").agg(
        F.count("*").cast("int").alias("n_dup_neighbors"),
        F.max(better).alias("has_better"),
    )
    return (
        assign.join(stats, assign["id"] == stats["x_id"], "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            "cent_sim",
            F.coalesce("n_dup_neighbors", F.lit(0)).cast("int").alias(
                "n_dup_neighbors"
            ),
            F.coalesce("has_better", F.lit(False)).alias("is_dup"),
        )
        .orderBy(id_col)
    )
