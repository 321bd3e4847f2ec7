"""Deduplication operators for web-scale corpora.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup —
the curation steps a training-data pipeline runs over a crawled corpus. All
hashing is built-in ``xxhash64``/``md5`` (JVM-side, deterministic, seedable
via extra literal args) — no Python in any hot path except the embedding
hyperplane projection (numpy, Arrow-batched).

Scale design:
- signatures/fingerprints are computed map-side (no shuffle);
- candidate generation shuffles on (band_id, band_hash) — a key whose
  cardinality grows with corpus size, so it parallelizes arbitrarily;
- exact pair verification happens only within LSH buckets (candidate pairs),
  never all-pairs;
- buckets with a single member produce no pairs and cost nothing beyond the
  group-by; pathological mega-buckets (all-identical spam) are capped by
  ``max_bucket`` to bound the quadratic corner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ocr_platform_spark.functions.textfns import fingerprint, normalized_text, word_shingles


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Ensure the expensive signature stage runs on all cores: small/
    single-file inputs arrive as 1-2 partitions — spread them by key hash.
    When the input is already wide (the 100 TB case) this is skipped, so
    no extra shuffle lands on the hot path."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df

# --- exact ------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one row per duplicate
    group with the keeper (min id) and the group size. Single hash agg."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative per fingerprint (deterministic)."""
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# --- MinHash + LSH -----------------------------------------------------------


def minhash_signature_from_shingles(sh_col: str, k: int = 16) -> F.Column:
    """k-permutation MinHash over a *materialized* shingle-array column:
    permutation i is ``xxhash64(shingle, i)`` (an independent keyed hash per
    i), signature element = min over shingles. The shingle array must be
    materialized in a separate projection first — referencing the expensive
    shingle-construction expression k times would re-run it k times per row
    (Catalyst's CollapseProject keeps non-cheap multi-referenced aliases in
    their own projection, so the two-select shape computes it once)."""
    return F.array(
        *[
            F.array_min(F.transform(sh_col, lambda x: F.xxhash64(x, F.lit(i))))
            for i in range(k)
        ]
    )


def minhash_signature(text_col: str, k: int = 16, shingle_words: int = 3) -> F.Column:
    """One-expression variant (tests/small data): recomputes shingles per
    permutation — prefer the two-stage shape for anything hot."""
    shingles = word_shingles(text_col, shingle_words)
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda x: F.xxhash64(x, F.lit(i))))
            for i in range(k)
        ]
    )


def minhash_bands(sig_col: F.Column | str, k: int = 16, rows_per_band: int = 2) -> F.Column:
    """Band the signature for LSH: band j hashes sig[j*r : (j+1)*r]."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    n_bands = k // rows_per_band
    return F.array(
        *[
            F.xxhash64(
                F.lit(j), *[sig[j * rows_per_band + r] for r in range(rows_per_band)]
            )
            for j in range(n_bands)
        ]
    )


def _bucket_pairs(
    buckets: DataFrame, id_col: str = "id", max_bucket: int = 64
) -> DataFrame:
    """Candidate pairs from (band_id, band_hash, id) bucket rows.

    Same-bucket self-join with ``a.id < b.id``; buckets larger than
    ``max_bucket`` are truncated (deterministically, by id order) to bound
    the quadratic corner — truncation only affects pathological spam
    clusters that exact verification would collapse anyway."""
    w = Window.partitionBy("band_id", "band_hash").orderBy(F.col(id_col))
    trimmed = (
        buckets.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    a = trimmed.alias("a")
    b = trimmed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    rows_per_band: int = 2,
    max_bucket: int = 64,
    shingle_words: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs (id_a < id_b)."""
    sh = _spread(df, id_col).select(
        F.col(id_col).alias("id"), word_shingles(text_col, shingle_words).alias("_sh")
    )
    sig = sh.select("id", minhash_signature_from_shingles("_sh", k).alias("sig"))
    banded = sig.select(
        "id", F.posexplode(minhash_bands("sig", k, rows_per_band)).alias("band_id", "band_hash")
    )
    return _bucket_pairs(banded, "id", max_bucket)


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: join shingle sets back on
    both sides (shuffle keyed by id — uniform), then
    ``|A∩B| / |A∪B|`` via array_intersect/array_union on distinct shingles."""
    sets_df = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, shingle_words)).alias("sh"),
    )
    j = (
        pairs.join(sets_df.withColumnRenamed("sh", "sh_a"), pairs.id_a == sets_df.id)
        .drop("id")
        .join(
            sets_df.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        j.select(
            "id_a",
            "id_b",
            F.round(
                F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 16,
    rows_per_band: int = 2,
    shingle_words: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.

    The shingle array is built ONCE per row and feeds both the signature
    (candidate generation) and the exact-Jaccard verification — sharing the
    most expensive projection between the two stages."""
    sh = _spread(df, id_col).select(
        F.col(id_col).alias("id"), word_shingles(text_col, shingle_words).alias("_sh")
    )
    sig = sh.select("id", minhash_signature_from_shingles("_sh", k).alias("sig"))
    banded = sig.select(
        "id",
        F.posexplode(minhash_bands("sig", k, rows_per_band)).alias("band_id", "band_hash"),
    )
    cands = _bucket_pairs(banded, "id", max_bucket)
    sets_df = sh.select("id", F.array_distinct("_sh").alias("sh"))
    j = (
        cands.join(sets_df.withColumnRenamed("sh", "sh_a"), cands.id_a == sets_df.id)
        .drop("id")
        .join(
            sets_df.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        F.round(
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# --- SimHash ------------------------------------------------------------------


def simhash64_from_hashes(hashes_col: str) -> F.Column:
    """64-bit SimHash over a *materialized* shingle-hash array column: for
    each bit b, sum ±1 over the hashes' bit b, take the sign. 64 array
    passes — cheap over a materialized long array, ruinous if the shingle
    construction were inlined 64×."""
    hashes = F.col(hashes_col)

    def bit_sum(b: int) -> F.Column:
        # +1 when bit b set, else -1; sum over shingles; sign → bit
        return (
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                ),
            )
            > 0
        ).cast("long")

    out = F.lit(0).cast("long")
    for b in range(64):
        out = out + F.shiftleft(bit_sum(b), b)
    return out


def simhash64(text_col: str, shingle_words: int = 2) -> F.Column:
    """One-expression variant (tests); prefer _simhash_df for anything hot."""
    hashes = F.transform(word_shingles(text_col, shingle_words), lambda x: F.xxhash64(x))

    def bit_sum(b: int) -> F.Column:
        return (
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                ),
            )
            > 0
        ).cast("long")

    out = F.lit(0).cast("long")
    for b in range(64):
        out = out + F.shiftleft(bit_sum(b), b)
    return out


def _simhash_kernel(hashes: pd.Series) -> pd.Series:
    """Vectorized sign-sum over the 64 bit planes of the shingle hashes.

    Exact integer arithmetic → identical to the pure-expression
    ``simhash64_from_hashes`` (parity pinned in tests/test_dedup.py), but
    ~100× faster: the per-bit ``aggregate`` expression is interpreted per
    array element, while this is one numpy broadcast per row."""
    shifts = np.arange(64, dtype=np.uint64)
    out = np.empty(len(hashes), dtype=np.int64)
    for i, h in enumerate(hashes):
        arr = np.asarray(h, dtype=np.int64).astype(np.uint64)
        if arr.size == 0:
            out[i] = 0
            continue
        bits = ((arr[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        sums = bits.sum(axis=0) * 2 - arr.size  # (+1 for set, -1 for clear)
        sh = ((sums > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
        out[i] = np.int64(sh.astype(np.uint64))
    return pd.Series(out)


def _simhash_df(df: DataFrame, id_col: str, text_col: str, shingle_words: int = 2) -> DataFrame:
    """(id, sh) SimHash table: shingle build + xxhash64 stay JVM-side
    (materialized projection), the 64-bit sign-sum runs in the Arrow-batched
    numpy kernel — the one place built-in expressions genuinely can't keep
    up (64 interpreted array passes per row)."""
    hashed = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.transform(word_shingles(text_col, shingle_words), lambda x: F.xxhash64(x)).alias(
            "_hh"
        ),
    )
    udf = F.pandas_udf(_simhash_kernel, "long")
    return hashed.select("id", udf(F.col("_hh")).alias("sh"))


def simhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, max_bucket: int = 64
) -> DataFrame:
    """LSH over SimHash: split the 64-bit hash into 4×16-bit bands; hashes
    within Hamming distance 3 share at least one exact band (pigeonhole)."""
    sim = _simhash_df(df, id_col, text_col)
    bands = sim.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), 16 * j).bitwiseAND(F.lit(0xFFFF))
                    for j in range(4)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    return _bucket_pairs(bands, "id", max_bucket)


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    """Popcount of a XOR b via bit_count (built-in)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dups: banded candidates → exact Hamming ≤ max_hamming.
    The (id, sh) signature table is computed once and reused for banding
    and for the exact verification join."""
    sim = _simhash_df(df, id_col, text_col)
    bands = sim.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), 16 * j).bitwiseAND(F.lit(0xFFFF))
                    for j in range(4)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    cands = _bucket_pairs(bands, "id")
    j = (
        cands.join(sim.withColumnRenamed("sh", "sh_a"), cands.id_a == sim.id)
        .drop("id")
        .join(
            sim.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    return j.select(
        "id_a", "id_b", hamming64(F.col("sh_a"), F.col("sh_b")).cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
