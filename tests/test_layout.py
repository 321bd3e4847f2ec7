"""Z-order layout: exactness of the integer pipeline against a pure-python
mirror, and the MEASURED pruning benefit — real parquet footers, row-group
min/max stats, predicate-overlap counts vs a single-column-sorted layout."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ocr_platform_spark.operators.layout import (
    interleave_bits,
    quantize,
    zorder_layout,
)


def _py_z(qx: int, qy: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((qx >> i) & 1) << (2 * i)
        z |= ((qy >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_mirror(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(300)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", interleave_bits(F.col("x"), F.col("y"), 8).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_z(r["x"], r["y"], 8)


def test_quantize_range_and_clamp(spark):
    df = spark.createDataFrame([(v,) for v in (-5, 0, 13, 99, 250)], "v long")
    got = [r["q"] for r in df.select(quantize("v", 0, 99, 4).alias("q")).orderBy("v").collect()]
    # clamped below -> cell 0; max value -> top cell 15; above -> clamped to 15
    assert got[0] == 0 and got[1] == 0
    assert got[3] == 15 and got[4] == 15
    assert 0 <= got[2] < 16
    import pytest

    with pytest.raises(ValueError):
        quantize("v", 10, 10, 4)


def test_zorder_layout_files_partition_the_curve(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(10_000), rng.randrange(500)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "t long, u long")
    lay = zorder_layout(df, "t", (0, 9999), "u", (0, 499), bits=8, file_bits=4)
    got = lay.collect()
    assert {r["file_id"] for r in got} <= set(range(16))
    for r in got:
        assert r["file_id"] == r["zval"] >> 12
    # deterministic under repartition
    got2 = zorder_layout(
        df.repartition(7), "t", (0, 9999), "u", (0, 499), bits=8, file_bits=4
    ).collect()
    assert sorted((r["t"], r["u"], r["zval"]) for r in got) == sorted(
        (r["t"], r["u"], r["zval"]) for r in got2
    )


def test_measured_pruning_vs_time_sorted_layout(spark, tmp_path):
    """Write the same rows (a) sorted by time only and (b) z-ordered, with
    identical row-group sizes; read the parquet footers and count row
    groups whose [min,max] user-range intersects a narrow user predicate.
    The z-layout must prune the large majority of row groups where the
    time-sorted layout prunes none (user is uncorrelated with time)."""
    import pyarrow.parquet as pq

    rng = random.Random(3)
    n = 20_000
    rows = [(i, rng.randrange(1_000)) for i in range(n)]  # t increasing, u random
    df = spark.createDataFrame(rows, "t long, u long")

    rg_rows = 1_000  # parquet row-group size in rows, same for both layouts
    time_path = str(tmp_path / "by_time")
    (
        df.repartition(1)
        .sortWithinPartitions("t")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(time_path)
    )
    z_path = str(tmp_path / "by_z")
    lay = zorder_layout(df, "t", (0, n - 1), "u", (0, 999), bits=8, file_bits=2)
    (
        lay.repartitionByRange(4, "file_id", "zval")
        .sortWithinPartitions("zval")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(z_path)
    )

    def u_ranges(path: str) -> list[tuple[int, int]]:
        import glob

        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    if col.path_in_schema == "u":
                        st = col.statistics
                        out.append((st.min, st.max))
        return out

    t_ranges = u_ranges(time_path)
    z_ranges = u_ranges(z_path)
    assert len(t_ranges) >= 4 and len(z_ranges) >= 4

    # predicate: u in [100, 150) — 5% of the user domain
    def hit_frac(ranges: list[tuple[int, int]]) -> float:
        hits = sum(1 for lo, hi in ranges if not (hi < 100 or lo >= 150))
        return hits / len(ranges)

    t_frac, z_frac = hit_frac(t_ranges), hit_frac(z_ranges)
    # time-sorted: u stats are full-range in every group -> ~no pruning
    assert t_frac > 0.9
    # z-order: most groups' u-bounding boxes miss the band entirely
    assert z_frac < 0.5
    assert z_frac < t_frac / 2
