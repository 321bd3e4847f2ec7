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


def epoch_plan(
    df: DataFrame,
    group_col: str,
    key_col: str,
    tokens_col: str,
    weights_per_mille: dict[str, int],
    total_tokens: int,
    n_buckets: int = 16,
    salt: str = "",
    max_epochs: int | None = None,
) -> DataFrame:
    """Token-budget epoch planner — the step that turns a curated corpus
    plus a target mixture into the actual TRAINING PLAN, including
    UPSAMPLING: when a group's target share exceeds its available tokens
    (the Wikipedia-×3 case in published LLM data recipes), the planner
    assigns whole repeat epochs plus a deterministic partial epoch, where
    :func:`mixture_sample` can only cap at take-all.

    Per group g: required ``req = (total_tokens · w_g) div 1000``; with
    available ``A_g = Σ tokens``, every doc gets ``full = req div A_g``
    whole epochs, and the partial epoch ``rem = req mod A_g`` is filled by
    docs in deterministic md5 draw order until their running token sum
    covers ``rem`` (the boundary doc is included — plans overshoot by at
    most one document, never undershoot). All-integer arithmetic; the draw
    order is (md5 bucket, md5(key), key), so the plan is a pure function
    of the data — identical across runs, cluster sizes, and engines.

    Scale shape — the running sum is the interesting part. A naive window
    ``PARTITION BY group ORDER BY hash`` sorts each group in ONE task: a
    corpus-sized group serializes. Instead, a two-level prefix sum:

    1. rows get an md5 bucket (map-side); a (group, bucket) token rollup —
       one distributed aggregate to a groups×buckets table (tiny);
    2. bucket-level prefix sums via a window over THAT table;
    3. broadcast back: a bucket wholly below ``rem`` is all-in, wholly
       above is all-out, and only the single boundary bucket per group
       runs an intra-bucket window — partitioned by (group, bucket), so
       the sort is 1/n_buckets of the group and parallel across groups.

    Sizing: only the single boundary bucket per group sorts its rows in
    one task, so pick ``n_buckets ≳ group_rows / rows_per_task`` for the
    largest group (the default 16 suits dimension-scale groups; a
    10^10-row language needs thousands). ``max_epochs`` caps the whole
    epochs per document (published recipes cap repeat exposure; an
    uncapped tiny group with a large weight would otherwise plan
    unboundedly many replicas) — the partial epoch still fills, so a
    capped group can deliver fewer tokens than its target, exactly like
    :func:`mixture_sample`'s take-all cap.

    The catalog oracle replays the selection as one flat window over the
    same total order (equivalent by prefix-sum associativity) and checks
    every per-doc epoch count."""
    total_w = sum(weights_per_mille.values())
    if total_w != 1000:
        raise ValueError(f"weights must sum to 1000 per mille, got {total_w}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, int(w)) for g, w in weights_per_mille.items()],
        f"{group_col} string, _w long",
    )
    kc = F.col(key_col).cast("string")
    d = df.withColumn("_b", hash_bucket(key_col, n_buckets, salt)).withColumn(
        "_tok", F.col(tokens_col).cast("long")
    )
    need = (
        d.groupBy(group_col)
        .agg(F.sum("_tok").alias("_avail"))
        .join(wdf, group_col)
        .where(F.col("_avail") > 0)
        .select(
            group_col,
            F.expr(f"(CAST({int(total_tokens)} AS BIGINT) * _w) div 1000").alias(
                "_req"
            ),
            "_avail",
        )
        .select(
            group_col,
            F.expr("_req div _avail").alias("_full"),
            F.expr("_req % _avail").alias("_rem"),
        )
    )
    if max_epochs is not None:
        if max_epochs < 1:
            raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
        # cap whole epochs at max_epochs - 1 so full + partial <= cap;
        # a capped group keeps its partial epoch (rem unchanged)
        need = need.withColumn(
            "_full", F.least(F.col("_full"), F.lit(int(max_epochs) - 1))
        )
    roll = d.groupBy(group_col, "_b").agg(F.sum("_tok").alias("_bsum"))
    wb = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    buckets = roll.withColumn(
        "_bpre", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
    ).join(need, group_col)
    rows = d.join(F.broadcast(buckets), [group_col, "_b"])
    boundary = (F.col("_bpre") < F.col("_rem")) & (
        F.col("_rem") < F.col("_bpre") + F.col("_bsum")
    )
    wi = (
        Window.partitionBy(group_col, "_b")
        .orderBy(F.md5(F.concat(kc, F.lit(salt))), kc)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    on_boundary = rows.where(boundary).withColumn(
        "_inpart",
        (F.col("_bpre") + F.coalesce(F.sum("_tok").over(wi), F.lit(0)))
        < F.col("_rem"),
    )
    off_boundary = rows.where(~boundary).withColumn(
        "_inpart", F.col("_bpre") + F.col("_bsum") <= F.col("_rem")
    )
    planned = off_boundary.unionByName(on_boundary).withColumn(
        "n_epochs", (F.col("_full") + F.col("_inpart").cast("long")).cast("int")
    )
    return (
        planned.where(F.col("n_epochs") > 0)
        .withColumn(
            "planned_tokens", (F.col("_tok") * F.col("n_epochs")).cast("long")
        )
        .drop("_b", "_tok", "_bsum", "_bpre", "_full", "_rem", "_inpart")
    )


def temperature_weights(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    sqrt_iters: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-based mixture weights (the UniMax / multilingual-LM
    recipe: sample group g proportional to ``share_g^(1/T)``, flattening
    the head so low-resource groups are not drowned) — emitted as exact
    per-mille integers that feed :func:`mixture_sample` / :func:`epoch_plan`.

    Cross-engine exactness is the design constraint: ``pow`` is NOT
    required to be correctly rounded by IEEE 754 and differs between
    libms, so arbitrary temperatures cannot be hash-stable across engines.
    ``sqrt`` IS correctly rounded everywhere, so temperatures are
    restricted to repeated square roots: ``sqrt_iters=1`` → T=2,
    ``2`` → T=4, ``0`` → T=1 (proportional). Each group's raw weight is
    ``floor(scale · sqrt^·iters(A_g))`` — one correctly-rounded sqrt
    chain, one exact multiply, one floor — after which EVERYTHING is
    integer arithmetic: per-mille weights by the largest-remainder
    (Hamilton) method, quota ``(1000·r_g) div R``, leftover seats to the
    largest ``(1000·r_g) mod R`` (ties broken by group value), so the
    weights sum to exactly 1000 in every engine.

    Scale shape: one distributed aggregate to a dimension-sized (group,
    avail) table; the remainder windows run over that tiny table. Returns
    (group, avail_tokens, weight_per_mille) with weight > 0 rows only
    (a group can get 0 seats when its raw weight is < 1/1000 of total)."""
    if sqrt_iters < 0:
        raise ValueError(f"sqrt_iters must be >= 0, got {sqrt_iters}")
    avail = df.groupBy(group_col).agg(
        F.sum(F.col(tokens_col).cast("long")).alias("avail_tokens")
    ).where(F.col("avail_tokens") > 0)
    if sqrt_iters == 0:
        # proportional: use the token counts directly. Hamilton seats are
        # invariant under exact common scaling (floor(1000·c·a / (c·R)) ==
        # floor(1000·a / R), remainders scale by c preserving order), and
        # avail·scale would overflow int64 at 10^15-token corpora where
        # avail alone cannot.
        r = F.col("avail_tokens")
    else:
        raw = F.col("avail_tokens").cast("double")
        for _ in range(sqrt_iters):
            raw = F.sqrt(raw)
        # sqrt(10^15) ≈ 3.2e7, ×10^6 ≈ 3.2e13 — exact in doubles and int64
        r = F.floor(raw * F.lit(float(scale))).cast("long")
    # NB: Spark column resolution is case-insensitive — the total's name
    # must not collide with "_r" up to case.
    g = avail.withColumn("_r", r)
    tot = Window.partitionBy()
    g = g.withColumn("_rsum", F.sum("_r").over(tot)).withColumn(
        "_quota", F.expr("(1000 * _r) div _rsum")
    ).withColumn("_rem", F.expr("(1000 * _r) % _rsum"))
    w_seats = Window.partitionBy().orderBy(
        F.desc("_rem"), F.col(group_col).cast("string")
    )
    g = g.withColumn(
        "_extra",
        (F.row_number().over(w_seats) <= F.lit(1000) - F.sum("_quota").over(tot))
        .cast("long"),
    )
    return (
        g.select(
            group_col,
            "avail_tokens",
            (F.col("_quota") + F.col("_extra")).cast("int").alias("weight_per_mille"),
        )
        .where(F.col("weight_per_mille") > 0)
    )


def collect_weights(weights: DataFrame, group_col: str) -> dict[str, int]:
    """Driver-side dict of a (group, weight_per_mille) table — the
    dimension-sized handoff into :func:`mixture_sample` / :func:`epoch_plan`
    (groups are languages/sources: tens of rows, an intentional collect)."""
    return {
        r[group_col]: int(r["weight_per_mille"])
        for r in weights.select(group_col, "weight_per_mille").collect()
    }


def training_order(
    plan: DataFrame,
    key_col: str,
    n_shards: int,
    epochs_col: str = "n_epochs",
    salt: str = "",
) -> DataFrame:
    """Materialize an epoch plan (:func:`epoch_plan` output) into the
    actual training feed order: one row per (document, epoch replica),
    assigned to a shard and given a position within it — the layout a
    trainer consumes (readers stream shards sequentially and interleave
    across shards, so a global total order is never needed and never
    materialized).

    The replica key is ``key‖'#'‖epoch``, so replicas of an upsampled
    document scatter independently across shards and positions (epoch 2 of
    a doc is nowhere near epoch 1 — the property repeat-epoch training
    needs). Shard = md5 bucket of the replica key; position = rank by
    (md5, key, epoch) within the shard. Pure function of the plan: stable
    across runs, cluster sizes, and engines.

    Scale shape: the explode is map-side (``sequence`` over an int column);
    the only shuffle is the per-shard window, and shards are corpus/n_shards
    sized by construction — pick n_shards so a shard's (key, epoch) pairs
    sort in one task (the rows carry no payload; text joins back by key at
    read time, which is how shard manifests stay tiny)."""
    kc = F.col(key_col).cast("string")
    # guard n_epochs > 0 here, not just in epoch_plan: Spark's
    # sequence(1, 0) DESCENDS to [1, 0], so an unfiltered plan row would
    # fabricate two phantom replicas (including an "epoch 0")
    rep = plan.where(F.col(epochs_col) > 0).select(
        key_col,
        F.explode(F.sequence(F.lit(1), F.col(epochs_col))).alias("epoch"),
    )
    rk = F.concat(kc, F.lit("#"), F.col("epoch").cast("string"))
    h = F.md5(F.concat(rk, F.lit(salt)))
    shard = (
        F.conv(F.substring(h, 1, _HEX_CHARS), 16, 10).cast("long") % n_shards
    )
    w = Window.partitionBy("shard").orderBy("_h", kc, "epoch")
    return (
        rep.withColumn("shard", shard.cast("int"))
        .withColumn("_h", h)
        .withColumn("pos", F.row_number().over(w))
        .drop("_h")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    tokens_col: str,
    weights_per_mille: dict[str, int],
    total_tokens: int,
    n_buckets: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Data-mixing stage (Pile/Dolma shape): sample each group (language,
    source, domain tier) at the rate that makes the sampled corpus
    approach the target token mixture.

    ``weights_per_mille`` maps group value → target share in ‰ (must sum
    to 1000); ``total_tokens`` is the desired corpus size. Each group's
    keep threshold is ``min(n_buckets, (total_tokens * w * n_buckets) div
    (1000 * available_tokens))`` — ALL-INTEGER arithmetic (no float
    rounding to drift between engines; the catalog oracle replays it in
    DuckDB) — then rows keep iff their md5 bucket clears it. An
    undersupplied group caps at take-all (delivering less than its target
    share, the standard mixing behavior); a group absent from the weights
    is dropped (weight 0).

    Scale shape: one map-side aggregate produces the per-group availability
    (groups are dimension-sized — languages, sources), the thresholds
    broadcast-join back, and the sample itself is the same pure narrow
    bucket filter as :func:`deterministic_sample` — the corpus is read
    once, nothing wide shuffles."""
    total_w = sum(weights_per_mille.values())
    if total_w != 1000:
        raise ValueError(f"weights must sum to 1000 per mille, got {total_w}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, int(w)) for g, w in weights_per_mille.items()],
        f"{group_col} string, _w long",
    )
    avail = df.groupBy(group_col).agg(
        F.sum(F.col(tokens_col).cast("long")).alias("_avail")
    )
    # two-step division keeps every intermediate inside int64 at corpus
    # scale: the one-step (T·w·buckets) div (1000·avail) would overflow
    # past T ≈ 9.2e12 at the 1000-bucket default (100 TB of text is
    # ~2e13 tokens). Step one is the whole-token requirement req =
    # (T·w) div 1000 (safe to T ≈ 9.2e15); step two scales by buckets
    # (req·buckets ≤ T·buckets, safe to T ≈ 9.2e15 at 1000 buckets).
    # The catalog oracle mirrors the same two-step expression.
    thr = avail.join(wdf, group_col).select(
        group_col,
        F.least(
            F.lit(n_buckets).cast("long"),
            F.expr(
                f"(((CAST({int(total_tokens)} AS BIGINT) * _w) div 1000)"
                f" * {int(n_buckets)}) div _avail"
            ),
        ).alias("_thr"),
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .where(hash_bucket(key_col, n_buckets, salt) < F.col("_thr"))
        .drop("_thr")
    )
