"""Count-min sketch (operators/sketches.py): grid additivity across
partitionings, row-path ≡ exact-count-path grid equality, the never-
underestimate guarantee, and collision saturation at width=1."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_platform_spark.operators.sketches import (
    cms_bucket_map,
    cms_estimates,
    cms_grid,
)

DEPTH, WIDTH = 4, 8


def _rows(spark, parts=4):
    # zipf-ish: key k appears (20 - k) times, keys 0..19 (=210 rows)
    data = [(f"host-{k:02d}",) for k in range(20) for _ in range(20 - k)]
    return spark.createDataFrame(data, "host string").repartition(parts)


def test_grid_partitioning_invariant(spark):
    a = cms_grid(_rows(spark, 1), "host", DEPTH, WIDTH).collect()
    b = cms_grid(_rows(spark, 7), "host", DEPTH, WIDTH).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_row_path_equals_exact_count_path(spark):
    rows = _rows(spark)
    grid_rows = cms_grid(rows, "host", DEPTH, WIDTH)
    exact = rows.groupBy("host").agg(F.count("*").alias("n"))
    bm = cms_bucket_map(exact, "host", DEPTH, WIDTH)
    grid_exact = (
        bm.join(exact, bm.key == exact.host)
        .groupBy("r", "b")
        .agg(F.sum("n").alias("c"))
    )
    assert sorted(map(tuple, grid_rows.collect())) == sorted(
        map(tuple, grid_exact.collect())
    )


def test_estimates_never_underestimate(spark):
    rows = _rows(spark)
    grid = cms_grid(rows, "host", DEPTH, WIDTH)
    exact = rows.groupBy("host").agg(F.count("*").alias("n"))
    est = cms_estimates(grid, exact.select("host"), "host", DEPTH, WIDTH)
    j = est.join(exact, est.key == exact.host).select("key", "cms_est", "n")
    got = j.collect()
    assert len(got) == 20
    assert all(r["cms_est"] >= r["n"] for r in got)
    # width 8 over 20 keys MUST collide somewhere
    assert any(r["cms_est"] > r["n"] for r in got)


def test_width_one_saturates_to_total(spark):
    rows = _rows(spark)
    grid = cms_grid(rows, "host", DEPTH, width=1)
    keys = rows.select("host").distinct()
    est = cms_estimates(grid, keys, "host", DEPTH, width=1)
    total = rows.count()
    assert all(r["cms_est"] == total for r in est.collect())


def test_absent_key_reads_zero_or_collision(spark):
    rows = _rows(spark)
    grid = cms_grid(rows, "host", DEPTH, WIDTH)
    ghost = spark.createDataFrame([("never-seen.example",)], "host string")
    est = cms_estimates(grid, ghost, "host", DEPTH, WIDTH).collect()
    assert len(est) == 1 and est[0]["cms_est"] >= 0
