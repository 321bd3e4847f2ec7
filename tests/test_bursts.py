"""Two-state burst segmentation (operators/bursts.py)."""

from __future__ import annotations

import random

from ocr_platform_spark.operators.bursts import burst_segments, burst_segments_py


def _optimal_cost_bruteforce(ks, r0, r1, gamma):
    """Cheapest cost over ALL 2^n labelings (n small)."""
    n = len(ks)
    best = None
    for m in range(1 << n):
        states = [(m >> i) & 1 for i in range(n)]
        cost = gamma if states[0] == 1 else 0
        for t, (k, s) in enumerate(zip(ks, states)):
            cost += abs(k - (r1 if s else r0))
            if t and states[t] != states[t - 1]:
                cost += gamma
        if best is None or cost < best:
            best = cost
    return best


def _cost_of(ks, states, r0, r1, gamma):
    cost = gamma if states[0] == 1 else 0
    for t, (k, s) in enumerate(zip(ks, states)):
        cost += abs(k - (r1 if s else r0))
        if t and states[t] != states[t - 1]:
            cost += gamma
    return cost


def test_reference_is_globally_optimal():
    rng = random.Random(9)
    for _ in range(60):
        n = rng.randrange(1, 11)
        ks = [rng.randrange(0, 9) for _ in range(n)]
        r0, gamma = 2, rng.randrange(1, 4)
        r1 = 5
        st = burst_segments_py(ks, r0, r1, gamma)
        assert _cost_of(ks, st, r0, r1, gamma) == _optimal_cost_bruteforce(
            ks, r0, r1, gamma
        ), (ks, st, gamma)


def test_sustained_run_bursts_single_spike_does_not():
    ks = [2, 2, 9, 2, 2, 9, 9, 9, 9, 2, 2]
    st = burst_segments_py(ks, r0=2, r1=9, gamma=8)
    assert st[2] == 0  # lone spike: 2*gamma not worth |9-9| savings alone
    assert st[5:9] == [1, 1, 1, 1]  # the sustained run flips


def test_spark_fold_matches_reference(spark):
    rng = random.Random(11)
    rows, expect = [], {}
    for key in range(8):
        n = rng.randrange(1, 60)
        ks = [rng.randrange(0, 12) for _ in range(n)]
        r0 = sum(ks) // n
        r1 = 2 * r0 + 1
        gamma = max(r0, 1)
        st = burst_segments_py(ks, r0, r1, gamma)
        for t, (k, s_) in enumerate(zip(ks, st), start=1):
            rows.append((f"k{key}", t, k, gamma, r0, r1))
            expect[(f"k{key}", t)] = (k, s_ == 1)
    df = spark.createDataFrame(rows, "key string, t int, k int, gamma int, r0 int, r1 int")
    got = {
        (r["key"], r["t"]): (r["k"], r["in_burst"])
        for r in burst_segments(df).collect()
    }
    assert got == expect


def test_spark_fold_long_series_stays_fast(spark):
    # the backtrack lambda must reference the forward DP through a λ-bound
    # variable: inlined, the fold re-evaluates per step (O(n^3)) and this
    # 720-step series takes minutes instead of seconds
    import time

    rng = random.Random(5)
    rows = [("k", t, rng.randrange(0, 6), 2, 2, 5) for t in range(1, 721)]
    df = spark.createDataFrame(rows, "key string, t int, k int, gamma int, r0 int, r1 int")
    t0 = time.perf_counter()
    assert burst_segments(df).count() == 720
    assert time.perf_counter() - t0 < 60
