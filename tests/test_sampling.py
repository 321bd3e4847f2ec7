"""Deterministic sampling / split / per-group cap semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.operators.sampling import (
    assign_split,
    cap_per_group,
    deterministic_sample,
    group_rank,
    hash_bucket,
)


def _ids(spark, n=500):
    return spark.range(n).withColumnRenamed("id", "k")


def test_assign_split_partitioning_invariant_and_fractions(spark):
    d1 = assign_split(_ids(spark).repartition(13), "k").select("k", "split")
    d2 = assign_split(_ids(spark).coalesce(1), "k").select("k", "split")
    assert d1.exceptAll(d2).count() == 0 and d2.exceptAll(d1).count() == 0
    frac = {r["split"]: r["n"] for r in d1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # md5 buckets are uniform: 500 keys land near 400/50/50
    assert 340 <= frac["train"] <= 460
    assert 20 <= frac["val"] <= 80 and 20 <= frac["test"] <= 80


def test_assign_split_rejects_bad_fractions(spark):
    with pytest.raises(ValueError):
        assign_split(_ids(spark), "k", splits=[("a", 0.5), ("b", 0.4)])


def test_assign_split_is_narrow(spark):
    plan = (
        assign_split(_ids(spark), "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure column exprs: split in the scan stage


def test_deterministic_sample_stable_and_disjoint_by_salt(spark):
    a = {r["k"] for r in deterministic_sample(_ids(spark), "k", 0.3).collect()}
    b = {r["k"] for r in deterministic_sample(_ids(spark), "k", 0.3).collect()}
    assert a == b  # same rows every run
    assert 100 <= len(a) <= 200
    s = {r["k"] for r in deterministic_sample(_ids(spark), "k", 0.3, salt="v2").collect()}
    assert s != a  # independent draw under a different salt


def test_sample_nests_by_fraction(spark):
    small = {r["k"] for r in deterministic_sample(_ids(spark), "k", 0.1).collect()}
    big = {r["k"] for r in deterministic_sample(_ids(spark), "k", 0.5).collect()}
    assert small <= big  # bucket-threshold sampling nests: 10% subset of 50%


def test_cap_per_group(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(20)] + [("c", 0)],
        "g string, k long",
    )
    out = cap_per_group(df, "g", "k", 5)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 5, "c": 1}
    # the draw is by md5(k) order, not insertion order
    kept_a = sorted(r["k"] for r in out.where("g = 'a'").collect())
    assert kept_a != [0, 1, 2, 3, 4]
    # and deterministic
    again = sorted(r["k"] for r in cap_per_group(df, "g", "k", 5).where("g='a'").collect())
    assert kept_a == again


def test_group_rank_dense_and_unique(spark):
    df = spark.createDataFrame([("a", i) for i in range(10)], "g string, k long")
    ranks = sorted(r["_rank"] for r in group_rank(df, "g", "k").collect())
    assert ranks == list(range(1, 11))


def test_hash_bucket_range(spark):
    rows = _ids(spark).select(hash_bucket("k", 17).alias("b")).collect()
    assert all(0 <= r["b"] < 17 for r in rows)


def test_mixture_sample(spark):
    from ocr_platform_spark.operators.sampling import hash_bucket, mixture_sample

    import pyspark.sql.functions as F

    rows = [(f"d{i:04d}", "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "xx"), 10)
            for i in range(400)]
    df = spark.createDataFrame(rows, "k string, g string, t long")

    # en avail=2000, de avail=1000, xx unweighted -> dropped
    out = mixture_sample(df, "g", "k", "t", {"en": 600, "de": 400}, 1500)
    got = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert "xx" not in got
    # thresholds: en (1500*600*1000)//(1000*2000)=450, de (1500*400*1000)//(1000*1000)=600
    en_thr, de_thr = 450, 600
    recomputed = df.withColumn("_b", hash_bucket("k", 1000))
    exp = {
        "en": recomputed.where((F.col("g") == "en") & (F.col("_b") < en_thr)).count(),
        "de": recomputed.where((F.col("g") == "de") & (F.col("_b") < de_thr)).count(),
    }
    assert got == exp

    # oversupplied budget -> take-all cap
    all_kept = mixture_sample(df.where("g <> 'xx'"), "g", "k", "t",
                              {"en": 600, "de": 400}, 10**9)
    assert all_kept.count() == 300

    # deterministic: same rows on re-run
    a = sorted(r["k"] for r in out.select("k").collect())
    b = sorted(r["k"] for r in mixture_sample(
        df, "g", "k", "t", {"en": 600, "de": 400}, 1500).select("k").collect())
    assert a == b

    import pytest
    with pytest.raises(ValueError):
        mixture_sample(df, "g", "k", "t", {"en": 700, "de": 400}, 100)


def test_epoch_plan_branches_and_flat_window_equivalence(spark):
    """Two-level prefix-sum selection == a flat single-window replay, on a
    mixture that exercises multi-epoch upsampling (g 'up' needs 2 full
    epochs + partial), whole-epoch + partial, and partial-only groups; an
    unweighted group drops out."""
    from pyspark.sql import Window

    from ocr_platform_spark.operators.sampling import epoch_plan, hash_bucket

    rows = []
    for i in range(60):
        rows.append((f"a{i:03d}", "up", 10))       # avail 600
    for i in range(80):
        rows.append((f"b{i:03d}", "mid", 10))      # avail 800
    for i in range(100):
        rows.append((f"c{i:03d}", "down", 10))     # avail 1000
    for i in range(10):
        rows.append((f"x{i:03d}", "xx", 10))       # unweighted
    df = spark.createDataFrame(rows, "k string, g string, t long")

    weights = {"up": 500, "mid": 300, "down": 200}
    total = 3000  # req: up 1500 (2 full + 300 rem), mid 900 (1 full + 100), down 600 (0 full + 600)
    out = epoch_plan(df, "g", "k", "t", weights, total, n_buckets=8, salt="s").cache()

    assert out.where(F.col("g") == "xx").count() == 0
    per_g = {
        r["g"]: (r["mn"], r["mx"], r["planned"])
        for r in out.groupBy("g")
        .agg(
            F.min("n_epochs").alias("mn"),
            F.max("n_epochs").alias("mx"),
            F.sum("planned_tokens").alias("planned"),
        )
        .collect()
    }
    # epoch structure: up = 2 or 3 epochs, mid = 1 or 2, down = 0/1 -> only 1s survive
    assert per_g["up"][0] == 2 and per_g["up"][1] == 3
    assert per_g["mid"][0] == 1 and per_g["mid"][1] == 2
    assert per_g["down"][0] == 1 and per_g["down"][1] == 1
    # planned totals cover the requirement, overshooting by < one doc (10)
    for g, req in (("up", 1500), ("mid", 900), ("down", 600)):
        assert req <= per_g[g][2] < req + 10 + 1

    # flat-window replay (the oracle's formulation) must agree row-for-row
    b = hash_bucket("k", 8, "s")
    h = F.md5(F.concat(F.col("k").cast("string"), F.lit("s")))
    w = (
        Window.partitionBy("g")
        .orderBy(b, h, F.col("k").cast("string"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    need = {"up": (2, 300), "mid": (1, 100), "down": (0, 600)}
    flat = (
        df.where(F.col("g").isin(*need))
        .withColumn("cumpre", F.coalesce(F.sum("t").over(w), F.lit(0)))
        .collect()
    )
    exp = {}
    for r in flat:
        full, rem = need[r["g"]]
        n = full + (1 if r["cumpre"] < rem else 0)
        if n > 0:
            exp[r["k"]] = n
    got = {r["k"]: r["n_epochs"] for r in out.collect()}
    assert got == exp

    # partitioning invariance
    out2 = epoch_plan(
        df.repartition(13), "g", "k", "t", weights, total, n_buckets=8, salt="s"
    )
    assert {(r["k"], r["n_epochs"]) for r in out2.collect()} == set(got.items())


def test_epoch_plan_rem_zero_and_weight_validation(spark):
    """rem == 0 (budget an exact multiple of availability) must yield pure
    whole-epoch plans with no partial docs; bad weights raise."""
    from ocr_platform_spark.operators.sampling import epoch_plan

    df = spark.createDataFrame(
        [(f"k{i}", "g", 5) for i in range(10)], "k string, g string, t long"
    )
    out = epoch_plan(df, "g", "k", "t", {"g": 1000}, 100, n_buckets=4).collect()
    assert len(out) == 10 and all(r["n_epochs"] == 2 for r in out)

    with pytest.raises(ValueError):
        epoch_plan(df, "g", "k", "t", {"g": 900}, 100)


def test_temperature_weights_flattening_and_python_mirror(spark):
    """sqrt temperature flattens the head (low-resource share rises vs
    proportional), weights sum to exactly 1000, and the whole chain matches
    a pure-python mirror (sqrt is correctly rounded in every IEEE engine)."""
    import math

    from ocr_platform_spark.operators.sampling import (
        collect_weights,
        temperature_weights,
    )

    rows = [("big", 90_000), ("mid", 9_000), ("small", 1_000)]
    df = spark.createDataFrame(
        [(g, t) for g, t in rows], "g string, n long"
    )
    for iters in (0, 1, 2):
        out = temperature_weights(df, "g", "n", sqrt_iters=iters)
        got = collect_weights(out, "g")
        # pure-python mirror of the exact arithmetic
        r = {}
        for g, t in rows:
            x = float(t)
            for _ in range(iters):
                x = math.sqrt(x)
            r[g] = math.floor(x * 1_000_000.0)
        R = sum(r.values())
        quota = {g: (1000 * v) // R for g, v in r.items()}
        rem = {g: (1000 * v) % R for g, v in r.items()}
        seats = 1000 - sum(quota.values())
        for g in sorted(rem, key=lambda g: (-rem[g], g))[:seats]:
            quota[g] += 1
        exp = {g: w for g, w in quota.items() if w > 0}
        assert got == exp, f"iters={iters}"
        assert sum(got.values()) == 1000
    # flattening: share of 'small' strictly rises with temperature
    w0 = collect_weights(temperature_weights(df, "g", "n", sqrt_iters=0), "g")
    w1 = collect_weights(temperature_weights(df, "g", "n", sqrt_iters=1), "g")
    w2 = collect_weights(temperature_weights(df, "g", "n", sqrt_iters=2), "g")
    assert w0.get("small", 0) < w1["small"] < w2["small"]
    assert w0["big"] > w1["big"] > w2["big"]

    with pytest.raises(ValueError):
        temperature_weights(df, "g", "n", sqrt_iters=-1)


def test_temperature_weights_into_epoch_plan(spark):
    """The composed UniMax recipe: measured availability -> temperature
    weights -> epoch plan. Planned totals hit each group's derived target
    within one document."""
    from ocr_platform_spark.operators.sampling import (
        collect_weights,
        epoch_plan,
        temperature_weights,
    )

    rows = []
    for i in range(50):
        rows.append((f"a{i:02d}", "big", 20))
    for i in range(10):
        rows.append((f"b{i:02d}", "small", 10))
    df = spark.createDataFrame(rows, "k string, g string, t long")
    w = collect_weights(temperature_weights(df, "g", "t", sqrt_iters=1), "g")
    assert sum(w.values()) == 1000
    total = 2000
    out = epoch_plan(df, "g", "k", "t", w, total, n_buckets=4)
    planned = {
        r["g"]: r["p"]
        for r in out.groupBy("g").agg(F.sum("planned_tokens").alias("p")).collect()
    }
    for g, avail, max_doc in (("big", 1000, 20), ("small", 100, 10)):
        req = (total * w[g]) // 1000
        assert req <= planned[g] <= req + max_doc


def test_training_order(spark):
    """Every (key, epoch) replica appears exactly once, positions are dense
    1..n per shard, the layout is a pure function of the plan (partitioning
    invariance), and epoch replicas of one doc scatter across shards."""
    from ocr_platform_spark.operators.sampling import training_order

    plan = spark.createDataFrame(
        [(f"d{i:03d}", 1 + i % 3) for i in range(90)], "k string, n_epochs int"
    )
    out = training_order(plan, "k", 4, salt="s").cache()
    rows = out.collect()
    assert len(rows) == sum(1 + i % 3 for i in range(90))
    assert len({(r["k"], r["epoch"]) for r in rows}) == len(rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {s}"
    # replicas of multi-epoch docs land in >1 shard somewhere
    multi = [r for r in rows if r["k"] == "d002"]
    assert len(multi) == 3
    assert len({r["shard"] for r in multi}) > 1

    out2 = training_order(plan.repartition(7), "k", 4, salt="s")
    assert {(r["k"], r["epoch"], r["shard"], r["pos"]) for r in out2.collect()} == {
        (r["k"], r["epoch"], r["shard"], r["pos"]) for r in rows
    }


def test_epoch_plan_max_epochs_cap(spark):
    """max_epochs caps whole epochs (full+partial <= cap); the partial
    epoch still fills; uncapped groups are unchanged."""
    from ocr_platform_spark.operators.sampling import epoch_plan

    rows = [(f"a{i}", "tiny", 10) for i in range(5)]  # avail 50
    rows += [(f"b{i}", "big", 10) for i in range(50)]  # avail 500
    df = spark.createDataFrame(rows, "k string, g string, t long")
    # tiny gets 500 of 1000 tokens -> req 500 = 10 full epochs of 50
    weights = {"tiny": 500, "big": 500}
    out = epoch_plan(df, "g", "k", "t", weights, 1000, n_buckets=4,
                     max_epochs=3).collect()
    per_g = {}
    for r in out:
        per_g.setdefault(r["g"], []).append(r["n_epochs"])
    assert max(per_g["tiny"]) <= 3
    # capped: delivers at most cap*avail tokens, less than its 500 target
    assert sum(10 * n for n in per_g["tiny"]) <= 3 * 50
    # big needs 500 of 500 avail -> exactly 1 epoch, cap of 3 irrelevant
    assert set(per_g["big"]) == {1}

    import pytest

    with pytest.raises(ValueError):
        epoch_plan(df, "g", "k", "t", weights, 1000, max_epochs=0)
