"""Z-order (Morton-curve) data layout — multi-column clustering for scan
pruning at rest.

A 100 TB fact table is usually range-laid-out on ONE column (time), so a
predicate on any second column (user, host) still reads every file.
Interleaving the bits of two quantized dimensions into a Morton z-value
and laying files out along that curve gives every file a tight bounding
box in BOTH dimensions: parquet min/max row-group stats then prune reads
for predicates on either column (Delta/Iceberg ``ZORDER BY``; the
measured-pruning test in tests/test_layout.py reads the parquet footers
and compares bounding-box volumes against a time-sorted layout).

Everything is exact integer column arithmetic (quantize → interleave →
shift), so the whole layout decision is cross-engine reproducible and the
catalog oracle (``events_zorder_layout``) hash-checks z-values, file
assignment, and per-file bounding boxes in DuckDB.

Scale shape: z-value is map-side; the only movement is the write's
``repartitionByRange`` on the z-value (one range shuffle, the same cost a
time-sorted layout already pays), with ``sortWithinPartitions`` feeding
parquet row groups in curve order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize(col: Column | str, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column from ``[lo, hi]`` to ``[0, 2^bits)`` by exact
    integer arithmetic (values clamped to the range first): the cell index
    of a uniform grid over the domain. ``(lo, hi)`` come from table stats
    or a domain contract — they are part of the layout's definition and
    must be recorded with it (changing them re-lays-out the table)."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if (int(hi) - int(lo) + 1) * (1 << bits) >= 1 << 53:
        # the exact-division trick needs the scaled offset inside the
        # double-exact integer range; epoch-seconds × 16 bits is ~2e14,
        # comfortably inside — a violation means bits is too wide for the
        # domain, which should fail loudly, not round silently
        raise ValueError(f"(hi-lo+1)·2^bits must stay below 2^53 ({lo}..{hi}, {bits} bits)")
    c = F.col(col) if isinstance(col, str) else col
    clamped = F.greatest(F.lit(int(lo)), F.least(F.lit(int(hi)), c.cast("long")))
    num = (clamped - F.lit(int(lo))) * F.lit(1 << bits)
    width = F.lit(int(hi) - int(lo) + 1)
    # exact integer division on nonnegative longs: (a - a%b)/b is an
    # integer-valued double quotient of exact doubles (< 2^53), identical
    # to the oracle's `//`
    return ((num - F.pmod(num, width)) / width).cast("long")


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton z-value of two ``bits``-wide integer columns: bit i of x
    lands at 2i, bit i of y at 2i+1. Pure shift/and/or expression tree
    (2·bits terms) — whole-stage codegen folds it into the scan."""
    z: Column | None = None
    for i in range(bits):
        xe = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ye = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        t = xe.bitwiseOR(ye)
        z = t if z is None else z.bitwiseOR(t)
    assert z is not None
    return z


def zorder_sql(x_sql: str, y_sql: str, bits: int) -> str:
    """DuckDB expression computing the same Morton z-value — kept beside
    the Spark implementation so the dialects cannot drift."""
    # every term fully parenthesized: DuckDB's &/<<)/| precedence differs
    # from C and an unparenthesized join mis-groups across terms
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_sql}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_sql}) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    x_col: str,
    x_range: tuple[int, int],
    y_col: str,
    y_range: tuple[int, int],
    bits: int = 8,
    file_bits: int = 4,
) -> DataFrame:
    """Adds ``zval`` (the Morton value of the two quantized dimensions)
    and ``file_id`` (``zval`` with the low ``2·bits − file_bits`` bits
    dropped — fixed z-RANGE sharding, a pure projection both engines
    compute identically; ``2^file_bits`` files). Callers write with::

        layout.repartitionByRange(n_files, "file_id", "zval")
              .sortWithinPartitions("zval")
              .write.partitionBy("file_id")...

    so each parquet file covers one z-range and its row groups follow the
    curve — min/max stats stay tight on BOTH source columns."""
    if file_bits > 2 * bits:
        raise ValueError(f"file_bits {file_bits} > z width {2 * bits}")
    qx = quantize(x_col, *x_range, bits)
    qy = quantize(y_col, *y_range, bits)
    z = interleave_bits(qx, qy, bits)
    return df.withColumn("zval", z).withColumn(
        "file_id", F.shiftright(F.col("zval"), 2 * bits - file_bits).cast("int")
    )
