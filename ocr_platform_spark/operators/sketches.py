"""Count-min sketch — additive frequency counters for heavy-hitter
detection without a per-key shuffle.

At 10^12 rows, `groupBy(key).count()` shuffles the full key space; a
count-min sketch (Cormode & Muthukrishnan 2005) replaces it with a fixed
``depth × width`` integer counter grid that is ADDITIVE: every partition
builds its grid map-side, grids merge by element-wise sum (one reduce of
``depth·width`` longs, independent of corpus size or key cardinality),
and any key's frequency is over-estimated by ``min_r grid[r][h_r(key)]``
— never under-estimated, with error ≤ 2N/width at probability 1−2^−depth.
The engine's HLL face (`host_cardinality`) answers "how many distinct";
this answers "how frequent is each" at the same O(1) state cost.

Spark shape: the per-row bucket explode is map-side (``depth`` rows per
input row, integer hash arithmetic, no Python); the grid aggregate is one
``groupBy(r, b)`` whose key space IS the grid — partial aggregation makes
the shuffle ``depth·width`` rows per map task, the sketch's whole point.
Estimates join candidate keys (a dimension-sized table) against the grid
and take the min across depth rows.

Cross-engine contract: bucket assignment uses xxhash64 (no DuckDB
equivalent), so catalog oracles split at a staged (key, n, r, b) boundary
— both engines rebuild the grid and every estimate from those bytes; the
row-path grid (built from raw rows, never materializing per-key counts)
is pinned equal to the staged-path grid by pytest, and additivity across
partitionings is property-tested.

Reference scope note: the reference has no sketches; this serves the
engine's own web-corpus north star (crawl-frequency monitoring over
hosts/domains where the key space is too large to shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cms_bucket(key: F.Column | str, row: int, width: int) -> F.Column:
    """Bucket of ``key`` in sketch row ``row``: ``xxhash64(key, row) mod
    width``, non-negative (pmod)."""
    return F.pmod(F.xxhash64(F.col(key) if isinstance(key, str) else key, F.lit(row)), F.lit(width)).cast("int")


def cms_bucket_map(keys: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """(key, r, b) for every key × sketch row — the hash-side table a
    staged oracle carries across the engine boundary."""
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("r"), cms_bucket(key_col, r, width).alias("b"))
            for r in range(depth)
        ]
    )
    return keys.select(F.col(key_col).alias("key"), F.explode(rows).alias("x")).select(
        "key", F.col("x.r").alias("r"), F.col("x.b").alias("b")
    )


def cms_grid(df: DataFrame, key_col: str, depth: int = 4, width: int = 64) -> DataFrame:
    """The sketch grid from raw rows: (r, b, c) with ``c = Σ 1`` over rows
    hashing to (r, b). Never materializes per-key counts — the scale path.
    Missing (r, b) cells are zero by omission (consumers COALESCE)."""
    return (
        cms_bucket_map(df, key_col, depth, width)
        .groupBy("r", "b")
        .agg(F.count("*").alias("c"))
    )


def cms_estimates(
    grid: DataFrame, keys: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """(key, cms_est) for each candidate key: min over the sketch rows of
    the key's cell — the classic count-min read, an over-estimate of the
    key's true frequency. ``keys`` must be distinct and dimension-sized."""
    bm = cms_bucket_map(keys, key_col, depth, width)
    return (
        bm.join(grid, ["r", "b"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
    )
