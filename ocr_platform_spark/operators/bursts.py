"""Two-state burst detection over an event stream (Kleinberg-style).

``burst_segments`` labels each (key, hour) as base/burst by the OPTIMAL
two-state segmentation — minimize Σ |k_t − r_state| + γ·(#transitions) —
the integer-cost cousin of Kleinberg 2002's infinite-automaton burst
model (state rates r0 = mean, r1 = 2·mean+1; absolute deviation replaces
−log P so every cost is an exact integer, cross-engine). Unlike the
greedy/hysteresis detectors production dashboards use, this is the
globally optimal labeling, which needs forward dynamic programming WITH
provenance and a backward trace — a different order-dependent-state
class from the engine's prefix-sum and greedy-fold operators (packing,
sessions, BPE): the answer at hour t depends on BOTH directions of the
sequence.

Spark shape: hourly counts are one hash aggregate; each key's dense hour
series folds ROW-LOCALLY — the forward DP is one ``F.aggregate`` over the
collected series carrying (cost0, cost1, provenance[]) and the backtrack
a second fold over the reversed provenance — no Python, no UDF, no
per-key shuffle beyond the collect_list. Series length is hours-per-key
(bounded by the time window, never corpus-sized); keys parallelize
arbitrarily. The DuckDB oracle replays the identical recurrence as a
forward recursive CTE plus a backward recursive CTE over raw parquet —
staging-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def burst_segments_py(
    ks: list[int], r0: int, r1: int, gamma: int
) -> list[int]:
    """Pure-python reference: optimal state per step (0=base, 1=burst).

    d[s][t] = |k_t − r_s| + min(d[s][t−1], d[1−s][t−1] + γ), starting in
    base state for free and in burst for γ; ties prefer staying /
    state 0 (deterministic total order). Backtrack from the cheaper final
    state."""
    n = len(ks)
    if n == 0:
        return []
    c0 = abs(ks[0] - r0)
    c1 = gamma + abs(ks[0] - r1)
    steps: list[tuple[int, int]] = [(-1, -1)]
    for t in range(1, n):
        f0 = 0 if c0 <= c1 + gamma else 1
        f1 = 1 if c1 <= c0 + gamma else 0
        n0 = abs(ks[t] - r0) + (c0 if f0 == 0 else c1 + gamma)
        n1 = abs(ks[t] - r1) + (c1 if f1 == 1 else c0 + gamma)
        steps.append((f0, f1))
        c0, c1 = n0, n1
    cur = 0 if c0 <= c1 else 1
    states = [cur]
    for t in range(n - 1, 0, -1):
        cur = steps[t][0] if cur == 0 else steps[t][1]
        states.append(cur)
    states.reverse()
    return states


def burst_segments(
    counts: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    k_col: str = "k",
    gamma_col: str = "gamma",
    r0_col: str = "r0",
    r1_col: str = "r1",
) -> DataFrame:
    """(key, t, k, in_burst) from a dense per-key series table carrying
    integer columns (t index 1..n contiguous, count k, per-key params
    r0/r1/gamma). Forward DP + backtrack as two row-local expression
    folds over the collected series — see module docstring."""
    series = (
        counts.groupBy(key_col, r0_col, r1_col, gamma_col)
        .agg(F.sort_array(F.collect_list(F.struct(t_col, k_col))).alias("ser"))
        .select(
            key_col,
            F.col(gamma_col).alias("_g"),
            F.col(r0_col).alias("_r0"),
            F.col(r1_col).alias("_r1"),
            F.col("ser"),
        )
    )
    # forward: acc = struct(c0, c1, steps array<struct<f0,f1>>); the first
    # element initializes (steps entry (-1,-1) keeps indexes aligned)
    fwd = F.aggregate(
        "ser",
        F.struct(
            F.lit(-1).cast("long").alias("c0"),
            F.lit(-1).cast("long").alias("c1"),
            F.expr("array()").cast("array<struct<f0:int,f1:int>>").alias("steps"),
        ),
        lambda acc, x: F.when(
            acc["c0"] < 0,
            F.struct(
                F.abs(x[k_col] - F.col("_r0")).cast("long").alias("c0"),
                (F.col("_g") + F.abs(x[k_col] - F.col("_r1"))).cast("long").alias("c1"),
                F.array(
                    F.struct(
                        F.lit(-1).cast("int").alias("f0"), F.lit(-1).cast("int").alias("f1")
                    )
                ).alias("steps"),
            ),
        ).otherwise(
            F.struct(
                (
                    F.abs(x[k_col] - F.col("_r0"))
                    + F.least(acc["c0"], acc["c1"] + F.col("_g"))
                )
                .cast("long")
                .alias("c0"),
                (
                    F.abs(x[k_col] - F.col("_r1"))
                    + F.least(acc["c1"], acc["c0"] + F.col("_g"))
                )
                .cast("long")
                .alias("c1"),
                F.concat(
                    acc["steps"],
                    F.array(
                        F.struct(
                            F.when(acc["c0"] <= acc["c1"] + F.col("_g"), F.lit(0))
                            .otherwise(F.lit(1))
                            .cast("int")
                            .alias("f0"),
                            F.when(acc["c1"] <= acc["c0"] + F.col("_g"), F.lit(1))
                            .otherwise(F.lit(0))
                            .cast("int")
                            .alias("f1"),
                        )
                    ),
                ).alias("steps"),
            )
        ),
    )
    # backtrack: fold t = n..2 over provenance, prepending each state.
    # The forward-DP result MUST be λ-bound (bind_once): referenced
    # directly from the backtrack lambda, CollapseProject would inline the
    # whole forward fold and re-evaluate it once per backtrack STEP —
    # O(n³) per key (observed: minutes instead of seconds on a 720-hour
    # series). A lambda variable is bound once per row.
    from ocr_platform_spark.functions.textfns import bind_once

    def _backtrack(dp: F.Column) -> F.Column:
        n = F.size(dp["steps"])
        final_state = F.when(dp["c0"] <= dp["c1"], F.lit(0)).otherwise(F.lit(1))
        return F.aggregate(
            F.when(n >= 2, F.sequence(n, F.lit(2), F.lit(-1))).otherwise(
                F.expr("array()").cast("array<int>")
            ),
            F.array(final_state.cast("int")),
            lambda acc, t: F.concat(
                F.array(
                    F.when(acc[0] == 0, dp["steps"][t - 1]["f0"])
                    .otherwise(dp["steps"][t - 1]["f1"])
                    .cast("int")
                ),
                acc,
            ),
        )

    states = series.select(key_col, "ser", bind_once(fwd, _backtrack).alias("states"))
    return states.select(
        key_col,
        F.explode(F.arrays_zip("ser", "states")).alias("z"),
    ).select(
        key_col,
        F.col("z")["ser"][t_col].alias(t_col),
        F.col("z")["ser"][k_col].alias(k_col),
        (F.col("z")["states"] == 1).alias("in_burst"),
    )
