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

from pyspark.sql import DataFrame, Window, functions as F

from ocr_platform_spark.functions.textfns import fingerprint, normalized_text, word_shingles

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


def minhash_signature(text_col: str, k: int = 16, shingle_words: int = 3) -> F.Column:
    """k-permutation MinHash over word shingles: permutation i is
    ``xxhash64(shingle, i)`` (an independent keyed hash per i), signature
    element = min over shingles. Pure column expressions."""
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
) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs (id_a < id_b)."""
    sig = df.select(
        F.col(id_col).alias("id"), minhash_signature(text_col, k).alias("sig")
    )
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
    sets_df = df.select(
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
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold."""
    cands = minhash_candidate_pairs(df, id_col, text_col, k, rows_per_band)
    return jaccard_pairs(df, cands, id_col, text_col, threshold=threshold)


# --- SimHash ------------------------------------------------------------------


def simhash64(text_col: str, shingle_words: int = 2) -> F.Column:
    """64-bit SimHash over word shingles, pure column expressions: for each
    bit b, sum ±1 over shingle hashes' bit b, take the sign. Uses
    ``aggregate`` over the shingle-hash array per bit group (4 groups of 16
    bits to keep expression depth sane)."""
    hashes = F.transform(word_shingles(text_col, shingle_words), lambda x: F.xxhash64(x))

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


def simhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, max_bucket: int = 64
) -> DataFrame:
    """LSH over SimHash: split the 64-bit hash into 4×16-bit bands; hashes
    within Hamming distance 3 share at least one exact band (pigeonhole)."""
    sim = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sh"))
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
    """SimHash near-dups: banded candidates → exact Hamming ≤ max_hamming."""
    sim = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sh"))
    cands = simhash_candidate_pairs(df, id_col, text_col)
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
