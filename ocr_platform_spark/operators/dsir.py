"""DSIR-style data selection via importance resampling.

DSIR (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023) selects pretraining documents whose hashed
n-gram feature distribution looks like a TARGET domain rather than the raw
crawl: fit bucket probabilities p (target) and q (raw) over hashed n-gram
counts, weight every raw document by ``log p(doc) - log q(doc)``, and
resample proportionally to the weights. It is the standard
domain-targeting step of a web-scale corpus build (alongside the CCNet LM
gate, which this module's scoring deliberately mirrors —
operators/lmscore.py).

Exact-arithmetic rendition (same discipline as the LM gate):

- features are hashed word n-grams: ``bucket = pmod(xxhash64(gram), B)``
  — the bag-of-hashed-ngrams of the paper, map-side column expressions;
- ``log p[b] - log q[b]`` is replaced by the BIT-LENGTH surrogate
  ``bits(c_target[b]) - bits(c_raw[b])`` (``floor(log2 c) + 1``; 0 for
  absent buckets) — pure integers, bit-identical in any engine, preserving
  the ranking property (buckets overrepresented in the target score
  positive, raw-only buckets negative);
- the paper's Gumbel-noise resampling is replaced by the deterministic
  top-k over ``(weight desc, id)`` — the catalog needs replayable output;
  production can swap in seeded noise without touching the plumbing.

Scale shape at 10^12 documents: the gram stream never leaves the map side
until one (doc, bucket) partial-aggregated shuffle; both distribution
tables are B rows (B = 2^12 here, 10^4-10^5 in the paper) and broadcast
into the weight join; selection is a distributed TakeOrdered. Nothing is
all-pairs and nothing big collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.functions.textfns import word_shingles


def hashed_gram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    n: int = 2,
) -> DataFrame:
    """(id, bucket, cnt) — per-document hashed n-gram bucket counts, the
    DSIR feature vector in sparse form. One explode + one map-side
    combinable aggregate."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    )
    return (
        grams.select(
            "id",
            F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def bucket_distribution(features: DataFrame, ids: DataFrame | None = None) -> DataFrame:
    """(bucket, c) — global bucket counts over a feature table, optionally
    restricted to a slice (``ids``: one-column DataFrame of ids to keep,
    broadcast into a semi join). B rows out — vocabulary-sized."""
    f = features
    if ids is not None:
        f = f.join(F.broadcast(ids.toDF("id")), "id", "left_semi")
    return f.groupBy("bucket").agg(F.sum("cnt").alias("c"))


def dsir_weights(
    features: DataFrame, target: DataFrame, raw: DataFrame
) -> DataFrame:
    """(id, n_grams, w_bits) — the integer importance weight of every doc:
    ``w_bits = Σ_b cnt[b] * (bits(c_target[b]) - bits(c_raw[b]))`` with
    ``bits(absent) = 0``. Both distribution tables are broadcast (B rows).
    """
    t = F.broadcast(target.select("bucket", F.col("c").alias("c_t")))
    r = F.broadcast(raw.select("bucket", F.col("c").alias("c_r")))
    j = features.join(t, "bucket", "left").join(r, "bucket", "left")
    bits = lambda c: F.coalesce(F.length(F.bin(c)), F.lit(0))  # noqa: E731
    return j.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum(F.col("cnt") * (bits(F.col("c_t")) - bits(F.col("c_r"))))
        .cast("long")
        .alias("w_bits"),
    )


def dsir_select(weights: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k resample: highest ``w_bits`` per gram first
    (ties → lowest id). ``orderBy + limit`` compiles to a distributed
    TakeOrderedAndProject. The per-gram normalization makes the weight a
    rate, not a length bonus — DSIR's z-normalization analogue, exact as
    (w_bits, n_grams) integer cross-multiplication."""
    w = weights.select(
        "id",
        "n_grams",
        "w_bits",
        (F.col("w_bits").cast("double") / F.col("n_grams")).alias("bits_per_gram"),
    )
    # total order: per-gram rate via integer cross-multiply, then id.
    # (a.w_bits / a.n_grams > b.w_bits / b.n_grams) == (a.w_bits * b.n_grams
    # > b.w_bits * a.n_grams) — but a SQL ORDER BY needs a key, so we order
    # by the deterministic double (single IEEE division, identical in both
    # engines), tie-broken by exact integers.
    return w.orderBy(
        F.desc("bits_per_gram"), F.desc("w_bits"), "id"
    ).limit(k)
