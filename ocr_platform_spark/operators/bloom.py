"""Bloom-filter seen-set prefilter — the 10^12-URL resume accelerator.

The exact resume primitive (``operators/resume.pending_documents``) is a
left-anti join of the incoming crawl against every committed key. At
10^12 seen URLs that join reshuffles the whole input every run even when
almost everything is new. The classic fix is a Bloom filter of the seen
set: keys the filter rejects are DEFINITELY new (Bloom filters have no
false negatives) and skip the join entirely; only the "maybe seen" sliver
(true dupes + the fpp share of false positives) pays the exact anti-join.
The composition's OUTPUT is therefore exactly the plain anti-join's — an
approximate structure with an exact contract, which is what makes the
catalog entry fully oracle-checkable.

Everything stays JVM-side and deterministic:

- **build**: k = ``n_hashes`` positions per key via ``xxhash64(key, seed+i)
  mod n_bits``; the bitmap is materialized as a ``(word_idx, word)`` table
  of 64-bit words through one ``bit_or`` hash aggregate — a distributed
  bitmap build, never a driver-side loop;
- **probe**: explode each probe key into its k (word_idx, mask) pairs,
  LEFT-join the word table (broadcast while it fits — n_bits/64 rows;
  AQE picks shuffle-hash beyond that), and ``bool_and`` the bit tests per
  key. A missing word row is an all-zero word → miss → definitely new.

Sizing: n_bits ≈ 9.6 · n_keys gives ~1% fpp with k=7; the word table is
n_bits/64 rows ≈ 150k rows per 10^9 bits (1.2 GB of bitmap per 10^9 keys
at 1% — at that scale raise fpp or shard the filter by key range; the
probe join is unchanged either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SEED = 7


def bloom_words(
    keys: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int = 4,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """(word_idx, word) — the Bloom bitmap as 64-bit words, built in one
    explode + one ``bit_or`` aggregate over the seen keys."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(n_bits))
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def with_bloom_flag(
    df: DataFrame,
    key_col: str,
    words: DataFrame,
    n_bits: int,
    n_hashes: int = 4,
    seed: int = DEFAULT_SEED,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col``: true iff every one of the key's k Bloom bits is
    set (the key is possibly in the seen set), false iff at least one bit
    is clear (the key is DEFINITELY new)."""
    probes = df.select(
        F.col(key_col).alias("_bk"),
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(n_bits))
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos"),
    ).select(
        "_bk",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("mask"),
    )
    # hint broadcast only while the bitmap actually fits an executor
    # (~8 bytes/word + row overhead; 64 MB of bits = 5e8 bits). Beyond
    # that the hint would force a driver collect of the whole bitmap —
    # let AQE pick shuffle-hash instead, as the module doc promises.
    words_side = F.broadcast(words) if n_bits <= 512 * 1024 * 1024 else words
    hits = (
        probes.join(words_side, "word_idx", "left")
        .select(
            "_bk",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).alias(
                "_hit"
            ),
        )
        .groupBy("_bk")
        .agg(F.bool_and("_hit").alias(out_col))
    )
    return df.join(
        hits.withColumnRenamed("_bk", key_col), key_col, "left"
    ).fillna({out_col: False})


def bloom_resume(
    docs: DataFrame,
    seen: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int = 4,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Rows of ``docs`` whose key is NOT in ``seen`` — byte-equal to the
    plain left-anti join, with the Bloom prefilter pruning the join input:
    definitely-new rows bypass the anti-join, only the maybe-seen sliver
    (dupes + false positives) joins the seen keys."""
    flagged = with_bloom_flag(docs, key_col, bloom_words(seen, key_col, n_bits, n_hashes, seed), n_bits, n_hashes, seed)
    new = flagged.where(~F.col("maybe_seen"))
    maybe = flagged.where(F.col("maybe_seen")).join(
        seen.select(key_col).distinct(), key_col, "left_anti"
    )
    return new.unionByName(maybe).drop("maybe_seen")
