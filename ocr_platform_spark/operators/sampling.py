"""Deterministic sampling, split assignment, and per-group downsampling —
the corpus-shaping stages between curation and training.

Everything keys off an md5-derived bucket rather than ``rand()``: the
assignment of a document is a pure function of its key (+ optional salt), so
it is identical across runs, across cluster sizes, across engines (the
catalog oracles recompute it in DuckDB via ``CAST('0x'||substr(md5(k),1,6)
AS BIGINT)``), and stable under corpus growth — a re-crawled document lands
in the same split forever, which is what makes eval sets trustworthy.

Scale shape:

- `hash_bucket` / `assign_split` / `deterministic_sample` are pure column
  expressions — map-side, whole-stage codegen, zero shuffle. A 100 TB
  corpus is split/sampled in the same scan that reads it (the filter pushes
  into the scan's output, and column pruning keeps only the key).
- `cap_per_group` is the top-K-per-group shape: one shuffle on the group
  key, rank within partition. Groups are host-sized (≤ millions of rows),
  never corpus-sized; AQE's skew-join split handles hot hosts, and the cap
  itself is why this stage EXISTS — after it, no host dominates downstream
  stages. Callers who only need the survivors should filter ``rank <= k``
  before any wide column rejoins so the sort carries (key, rank) only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 6 hex chars = 24 bits: exact in every engine's integer arithmetic and
# plenty of resolution for per-mille splits.
_HEX_CHARS = 6


def hash_bucket(col: Column | str, n_buckets: int, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` from md5 of the key
    (cast to string) plus an optional salt. Changing the salt produces an
    independent assignment — the knob for drawing multiple disjoint
    samples from one corpus."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, _HEX_CHARS),
        16,
        10,
    ).cast("long")
    return h % n_buckets


def oracle_bucket_sql(key_sql: str, n_buckets: int, salt: str = "") -> str:
    """The DuckDB expression computing the SAME bucket — kept next to the
    Spark implementation so the two dialects can never drift apart."""
    salted = f"CAST({key_sql} AS VARCHAR) || '{salt}'" if salt else f"CAST({key_sql} AS VARCHAR)"
    return (
        f"CAST(('0x' || substr(md5({salted}), 1, {_HEX_CHARS})) AS BIGINT) % {n_buckets}"
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]] | None = None,
    n_buckets: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Adds ``bucket`` and ``split`` columns. ``splits`` is an ordered list
    of (name, fraction); fractions must sum to 1. Default 80/10/10
    train/val/test."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = hash_bucket(key_col, n_buckets, salt)
    expr = None
    upper = 0.0
    for name, frac in splits[:-1]:
        upper += frac
        cond = b < int(round(upper * n_buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("bucket", b).withColumn("split", expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, n_buckets: int = 1000, salt: str = ""
) -> DataFrame:
    """Keep a reproducible ``fraction`` of rows by key hash — same rows
    every run, any cluster size, and a pure narrow filter (unlike
    ``df.sample``, whose output depends on partitioning)."""
    return df.where(hash_bucket(key_col, n_buckets, salt) < int(round(fraction * n_buckets)))


def group_rank(
    df: DataFrame, group_col: str, key_col: str, salt: str = ""
) -> DataFrame:
    """Adds ``_rank``: the row's 1-based position within its group under
    md5(key) order — a deterministic pseudo-random draw order. Ties on the
    md5 (only possible for equal keys) break on the key itself."""
    kc = F.col(key_col).cast("string")
    order = F.md5(F.concat(kc, F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(order, kc)
    return df.withColumn("_rank", F.row_number().over(w))


def cap_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: str = ""
) -> DataFrame:
    """At most ``k`` rows per group, chosen by md5(key) order (an unbiased
    per-group subsample rather than "first k by insertion order") — the
    host-level downsampling stage that stops a crawl's mega-hosts from
    dominating the training mix. Keeps ``_rank``; callers drop it."""
    return group_rank(df, group_col, key_col, salt).where(F.col("_rank") <= k)
