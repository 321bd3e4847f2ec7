"""Similarity search over an embedding column (``array<float>``).

Two paths (SURVEY-mandated training-data-pipeline ops):

- **Brute-force cosine top-k** — the correctness baseline. The query set is
  small by assumption (a dimension): broadcast it, score every (query, item)
  pair with built-in ``zip_with``/``aggregate`` (JVM-side fold — a
  deterministic left-to-right sum, reproducible across engines), then
  window top-k per query. No shuffle on the corpus side except the final
  per-query top-k (tiny).

- **Hyperplane-LSH bucketed ANN** — the scale path: sign-random-projection
  buckets computed in a vectorized numpy kernel (one matmul per Arrow
  batch), exact cosine only within matching buckets. Multi-probe via
  several independent tables. Recall/cost is tunable (n_planes, n_tables).

Embedding-cosine near-duplicate detection reuses the LSH buckets with a
self-join, mirroring the text-side MinHash pipeline (dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def cosine_sim(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two float arrays, built-ins only: deterministic
    sequential fold (``aggregate``), identical operation order everywhere."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query ids must not collide
    with nothing — self-matches are excluded by id inequality)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    it = items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("i_vec"))
    scored = (
        it.crossJoin(F.broadcast(q))
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id",
            "item_id",
            F.round(cosine_sim(F.col("q_vec"), F.col("i_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("item_id")  # deterministic tie-break
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def quantized_topk(
    items: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Brute-force cosine top-k on quantized vectors: each component is
    rounded to ``round(x * scale)`` as a BIGINT, so dot products and norms
    are *exact integers* — identical in any engine, any summation order.
    The one floating-point step (``dot / (sqrt(nq) * sqrt(ni))``) is a fixed
    op sequence on exact inputs → bit-identical across engines (the
    cross-engine-verifiable face of ``brute_force_topk``)."""

    def qz(c: F.Column) -> F.Column:
        return F.transform(c, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))

    q = queries.select(F.col(id_col).alias("query_id"), qz(F.col(vec_col)).alias("q_v"))
    it = items.select(F.col(id_col).alias("item_id"), qz(F.col(vec_col)).alias("i_v"))
    zero = F.lit(0).cast("long")
    dot = F.aggregate(
        F.zip_with("q_v", "i_v", lambda x, y: x * y), zero, lambda acc, v: acc + v
    )
    nq = F.aggregate("q_v", zero, lambda acc, v: acc + v * v)
    ni = F.aggregate("i_v", zero, lambda acc, v: acc + v * v)
    cosine = F.when(
        (nq > 0) & (ni > 0),
        F.round(dot.cast("double") / (F.sqrt(nq.cast("double")) * F.sqrt(ni.cast("double"))), 6),
    ).otherwise(F.lit(0.0))
    scored = (
        it.crossJoin(F.broadcast(q))
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id", cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def _quantize(c: F.Column, scale: int) -> F.Column:
    return F.transform(c, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def _quantized_cosine(a: str, b: str) -> F.Column:
    """Exact-integer quantized cosine between two ``array<long>`` columns —
    the cross-engine-deterministic scoring step shared by every verified
    ANN tail."""
    zero = F.lit(0).cast("long")
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, v: acc + v)
    na = F.aggregate(a, zero, lambda acc, v: acc + v * v)
    nb = F.aggregate(b, zero, lambda acc, v: acc + v * v)
    return F.when(
        (na > 0) & (nb > 0),
        F.round(dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))), 6),
    ).otherwise(F.lit(0.0))


def positive_rank_metrics(
    items: DataFrame,
    positives: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """(query_id, pos_id, rank, hit_at_1, hit_at_k, rr_x1e6) — the
    retrieval-eval readout (MRR@k / hit@1 / hit@k) for labeled
    (query, positive) pairs under exact brute-force cosine, the metric
    every index variant (LSH/IVF/PQ) is judged against.

    The positive's FULL rank is computed by count-comparison — rank =
    1 + #{items ordered before the positive under (cosine DESC, item_id)}
    — never by a global row_number window, so nothing materializes a
    total order over the corpus: the eval queries broadcast against the
    item set, and one per-query count aggregate produces the metric.
    ``rr_x1e6`` is the reciprocal rank in integer parts-per-million
    (``1_000_000 div rank``, 0 past ``k``) so MRR sums hash identically
    cross-engine. Quantized scoring keeps comparisons exact (see
    :func:`quantized_topk`)."""
    q = items.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("q_v")
    ).join(positives.select("query_id", "pos_id"), "query_id")
    it = items.select(
        F.col(id_col).alias("item_id"), _quantize(F.col(vec_col), scale).alias("i_v")
    )
    scored = (
        it.crossJoin(F.broadcast(q))
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id", "pos_id", "item_id", _quantized_cosine("q_v", "i_v").alias("cosine")
        )
    )
    pos_cos = scored.where(F.col("item_id") == F.col("pos_id")).select(
        "query_id", F.col("cosine").alias("pos_cosine")
    )
    j = scored.join(F.broadcast(pos_cos), "query_id")
    before = (F.col("cosine") > F.col("pos_cosine")) | (
        (F.col("cosine") == F.col("pos_cosine")) & (F.col("item_id") < F.col("pos_id"))
    )
    ranked = j.groupBy("query_id", "pos_id").agg(
        (F.lit(1) + F.count(F.when(before, 1))).cast("int").alias("rank")
    )
    rr = F.when(
        F.col("rank") <= k, F.expr("CAST(1000000 div rank AS BIGINT)")
    ).otherwise(F.lit(0).cast("long"))
    return ranked.select(
        "query_id",
        "pos_id",
        "rank",
        (F.col("rank") == 1).alias("hit_at_1"),
        (F.col("rank") <= k).alias(f"hit_at_{k}"),
        rr.alias("rr_x1e6"),
    )


def quantized_rank_candidates(
    cands: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Score a precomputed (query_id, item_id) candidate set with the exact
    quantized cosine and keep the per-query top-k — the verification tail of
    the LSH/IVF paths, reproducible in any SQL engine over the same
    candidate table (the approximate part of ANN is *candidate generation*;
    the scoring/top-k tail is exact and therefore oracle-checkable)."""
    qz = vectors.select(
        F.col(id_col).alias("_vid"), _quantize(F.col(vec_col), scale).alias("_v")
    )
    j = (
        cands.join(
            qz.withColumnRenamed("_vid", "query_id").withColumnRenamed("_v", "q_v"),
            "query_id",
        )
        .join(
            qz.withColumnRenamed("_vid", "item_id").withColumnRenamed("_v", "i_v"),
            "item_id",
        )
        .select("query_id", "item_id", _quantized_cosine("q_v", "i_v").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def quantized_verify_pairs(
    pairs: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    scale: int = 1000,
) -> DataFrame:
    """Exact quantized-cosine verification of (id_a, id_b) candidate pairs:
    keep pairs at ``cosine >= threshold`` (the near-dup tail, cross-engine
    exact)."""
    qz = vectors.select(
        F.col(id_col).alias("_vid"), _quantize(F.col(vec_col), scale).alias("_v")
    )
    j = (
        pairs.join(
            qz.withColumnRenamed("_vid", "id_a").withColumnRenamed("_v", "v_a"), "id_a"
        )
        .join(qz.withColumnRenamed("_vid", "id_b").withColumnRenamed("_v", "v_b"), "id_b")
        .select("id_a", "id_b", _quantized_cosine("v_a", "v_b").alias("cosine"))
    )
    return j.where(F.col("cosine") >= threshold)


def hard_negatives(
    items: DataFrame,
    positives: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    scale: int = 1000,
) -> DataFrame:
    """Denoised hard-negative mining for retrieval/contrastive training
    data (the DPR / RocketQA recipe): for each (query, positive) pair, the
    top-k most-similar corpus items that are NOT the positive and score
    strictly BELOW the positive — candidates outscoring the labeled
    positive are presumed unlabeled true matches (false negatives) and
    must not be trained against as negatives.

    ``positives`` is ``(query_id, pos_id)``; queries live in the same
    embedding table. Scores are the exact quantized cosine, so ranks,
    scores and the denoising gate (a strict ``<`` between two identically
    derived doubles) reproduce bit-for-bit in any engine.

    ALL of a query's labeled positives are excluded from its negative
    pool (anti-join on the full positives table), not just the current
    pair's — a query with several labeled positives must never mine one
    of its own positives as a negative for another pair, or weak labeled
    positives passing the strict-< gate become label noise.

    Scale shape: the query side is training-pair-sized (a dimension) —
    it broadcasts, and the corpus is scanned once. At 10^9 items swap the
    crossJoin for any candidate generator in this module (LSH/IVF/PQ) and
    keep this exact scoring + denoise tail unchanged."""
    pos = positives.select("query_id", "pos_id")
    qz = items.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("q_v")
    ).join(pos.select("query_id").distinct(), "query_id", "left_semi")
    it = items.select(
        F.col(id_col).alias("item_id"), _quantize(F.col(vec_col), scale).alias("i_v")
    )
    scored = (
        it.crossJoin(F.broadcast(qz))
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id", _quantized_cosine("q_v", "i_v").alias("cosine"))
    )
    pos_scores = scored.join(
        F.broadcast(pos),
        (scored.query_id == pos.query_id) & (scored.item_id == pos.pos_id),
    ).select(scored.query_id, "pos_id", F.col("cosine").alias("pos_cosine"))
    # anti-join against ALL the query's labeled positives (not only the
    # current pair's pos_id): cross-listed positives are label noise, not
    # hard negatives, regardless of which pair is being mined
    all_pos = pos.select("query_id", F.col("pos_id").alias("item_id"))
    negs = (
        scored.join(F.broadcast(all_pos), ["query_id", "item_id"], "left_anti")
        .join(F.broadcast(pos_scores), "query_id")
        .where(F.col("cosine") < F.col("pos_cosine"))
    )
    # top-k is PER (query, positive) PAIR — a query with several labeled
    # positives mines k negatives against each one (each pair has its own
    # denoising threshold), matching the contrastive-batch construction.
    w = Window.partitionBy("query_id", "pos_id").orderBy(
        F.desc("cosine"), F.col("item_id")
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "pos_id",
            F.col("item_id").alias("neg_id"),
            "cosine",
            "pos_cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (seeded; same on every worker)."""
    return np.random.RandomState(seed).standard_normal((dim, n_planes)).astype(np.float64)


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    dim: int | None = None,
    out_col: str = "buckets",
    multiprobe: int = 0,
) -> DataFrame:
    """Append an ``array<bigint>`` of per-table sign-projection bucket ids.

    One numpy matmul per Arrow batch (vectorized pandas UDF) — the only
    Python hop, amortized over whole batches.

    ``multiprobe > 0`` adds, per table, the buckets reached by flipping the
    ``multiprobe`` sign bits whose projections are closest to zero (the
    classic multi-probe LSH trick): recall rises steeply at the cost of
    ``multiprobe`` extra candidate buckets per row, with no extra tables."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0

    planes = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    powers = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def _bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        per_row: list[list[int]] = [[] for _ in range(len(mat))]
        for t, pl in enumerate(planes):
            proj = mat @ pl  # (batch, n_planes)
            bits = proj > 0
            ids = bits.astype(np.int64) @ powers + (t << 32)  # disjoint per table
            for r, v in enumerate(ids):
                per_row[r].append(int(v))
            if multiprobe > 0:
                # flip the sign bits with the smallest |projection|
                order = np.argsort(np.abs(proj), axis=1)[:, :multiprobe]
                for r in range(len(mat)):
                    base = ids[r]
                    for b in order[r]:
                        per_row[r].append(int(base ^ int(powers[b])))
        return pd.Series(per_row)

    return df.withColumn(out_col, _bucket(F.col(vec_col)))


def lsh_candidates(
    items: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    multiprobe: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Distinct (query_id, item_id) bucket-colliding candidate pairs — the
    approximate half of :func:`lsh_topk`, exposed so the exact scoring tail
    can run over a staged copy (oracle-verifiable)."""
    it = with_lsh_bucket(
        items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("i_vec")),
        "i_vec", n_planes, n_tables, seed, dim=dim,
    ).select("item_id", F.explode("buckets").alias("bucket"))
    q = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", n_planes, n_tables, seed, dim=dim, multiprobe=multiprobe,
    ).select("query_id", F.explode("buckets").alias("bucket"))
    return (
        it.join(F.broadcast(q), "bucket")
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
        .distinct()
    )


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    multiprobe: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine only for bucket-colliding pairs.
    ``multiprobe`` probes extra near-boundary buckets on the QUERY side
    only (items stay single-bucket → index size unchanged)."""
    it = with_lsh_bucket(
        items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("i_vec")),
        "i_vec", n_planes, n_tables, seed, dim=dim,
    ).select("item_id", "i_vec", F.explode("buckets").alias("bucket"))
    q = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", n_planes, n_tables, seed, dim=dim, multiprobe=multiprobe,
    ).select("query_id", "q_vec", F.explode("buckets").alias("bucket"))
    scored = (
        it.join(F.broadcast(q), "bucket")
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id",
            "item_id",
            F.round(cosine_sim(F.col("q_vec"), F.col("i_vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "item_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    max_bucket: int = 128,
    dim: int | None = None,
) -> DataFrame:
    """Distinct self-join candidate pairs (id_a < id_b) from the near-dup
    LSH buckets — generation half of :func:`embedding_near_duplicates`."""
    b = with_lsh_bucket(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec", n_planes, n_tables, seed, dim=dim,
    ).select("id", F.explode("buckets").alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("id")
    b = b.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= max_bucket).drop("_rn")
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(c, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    max_bucket: int = 128,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold):
    LSH self-join candidates → exact cosine verify."""
    b = with_lsh_bucket(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec", n_planes, n_tables, seed, dim=dim,
    ).select("id", "vec", F.explode("buckets").alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("id")
    b = b.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= max_bucket).drop("_rn")
    a = b.alias("a")
    c = b.alias("b")
    pairs = (
        a.join(c, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine_sim(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )


# --- IVF (inverted-file) ANN: coarse quantizer + probed partitions ----------


def _kmeans_centroids(
    sample: np.ndarray, n_lists: int, seed: int = 42, iters: int = 8
) -> np.ndarray:
    """Deterministic Lloyd iterations on a driver-side sample (the coarse
    quantizer is a tiny model — IVF trains on a sample by design)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cents = sample[np.sort(idx)].astype(np.float64).copy()
    for _ in range(iters):
        d = sample @ cents.T  # cosine-ish assignment on normalized vectors
        assign = np.argmax(d, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cents[c] = m / norm
    return cents


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    n_probe: int = 1,
    out_col: str = "ivf_list",
) -> DataFrame:
    """Append the ids of the ``n_probe`` nearest coarse centroids (one
    numpy matmul per Arrow batch)."""

    def kernel(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        sims = mat @ centroids.T  # (batch, n_lists)
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.tolist() for row in top])

    udf = F.pandas_udf(kernel, "array<int>")
    return df.withColumn(out_col, udf(F.col(vec_col)))


def train_ivf(
    items: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    max_sample: int | None = None,
    seed: int = 42,
) -> np.ndarray:
    """Train the coarse quantizer on a BOUNDED sample of item vectors.

    k-means quality needs only ~100× n_lists points, so the driver collect
    is capped at ``max_sample`` (default ``100 * n_lists``) no matter how
    large the item table is — at 10^9 vectors this still pulls only ~1600
    rows. The sample is a deterministic pseudo-random pick: order by a
    seeded xxhash64 of the vector and take the first ``max_sample`` (Spark
    executes limit-after-sort as a per-partition top-N merge — one
    distributed pass, bounded memory everywhere)."""
    if max_sample is None:
        max_sample = 100 * n_lists
    rows = (
        items.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<double>"), F.lit(seed)))
        .limit(max_sample)
        .collect()
    )
    sample = _normalize_rows(np.array([r[0] for r in rows], dtype=np.float64))
    return _kmeans_centroids(sample, n_lists, seed)


def ivf_candidates(
    items: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Distinct (query_id, item_id) pairs from probed IVF lists — generation
    half of :func:`ivf_topk`, exposed for the staged-oracle scoring tail."""
    it = ivf_assign(
        items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("i_vec")),
        centroids, "i_vec", n_probe=1,
    ).select("item_id", F.explode("ivf_list").alias("list_id"))
    q = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        centroids, "q_vec", n_probe=n_probe,
    ).select("query_id", F.explode("ivf_list").alias("list_id"))
    return (
        it.join(F.broadcast(q), "list_id")
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
        .distinct()
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF search: items live in their single nearest list; queries probe
    their ``n_probe`` nearest lists; exact cosine only within probed lists.
    The item side shuffles once on list id — the inverted-file layout."""
    it = ivf_assign(
        items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("i_vec")),
        centroids, "i_vec", n_probe=1,
    ).select("item_id", "i_vec", F.explode("ivf_list").alias("list_id"))
    q = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        centroids, "q_vec", n_probe=n_probe,
    ).select("query_id", "q_vec", F.explode("ivf_list").alias("list_id"))
    scored = (
        it.join(F.broadcast(q), "list_id")
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id",
            "item_id",
            F.round(cosine_sim(F.col("q_vec"), F.col("i_vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "item_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


# --- Product quantization (PQ) — the 10^9-vector regime -----------------------


def train_pq(
    items: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    max_sample: int | None = None,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace PQ codebooks: split the (normalized) vector into ``m``
    contiguous subvectors and k-means each subspace independently. Returns
    ``(m, k_codes, dim/m)``. Same bounded-sample discipline as
    :func:`train_ivf` — the driver never pulls more than ``max_sample``
    rows (default ``100 * k_codes``) no matter the table size; at 10^9
    vectors the index memory is m bytes/vector instead of 4·dim."""
    if max_sample is None:
        max_sample = 100 * k_codes
    rows = (
        items.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<double>"), F.lit(seed)))
        .limit(max_sample)
        .collect()
    )
    sample = _normalize_rows(np.array([r[0] for r in rows], dtype=np.float64))
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [
            _kmeans_centroids(sample[:, j * dsub : (j + 1) * dsub], k_codes, seed + j)
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """(id, codes array<int>) — nearest codeword per subspace over the
    NORMALIZED vector (one numpy distance matrix per subspace per Arrow
    batch). 4·dim bytes/vector become m small ints."""
    m, _k, dsub = codebooks.shape
    cb = codebooks  # closure-shipped; small (m*k*dsub floats)

    @F.pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        out = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]  # (n, dsub)
            # squared distance to each codeword: argmin over k
            d = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = d.argmin(axis=1)
        return pd.Series([row.tolist() for row in out])

    return df.select(
        F.col(id_col).alias("id"), _encode(F.col(vec_col)).alias(out_col)
    )


def pq_query_luts(
    queries: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Exploded integer ADC lookup tables: one row per
    (query_id, m_idx, code) with ``w = round(scale * <q_sub, codeword>)``.
    Integer weights make the ADC score an exact integer SUM — reproducible
    bit-for-bit by any engine over the staged (codes, luts) tables."""
    m, k_codes, dsub = codebooks.shape
    cb = codebooks

    @F.pandas_udf("array<int>")
    def _lut(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        out = []
        for row in mat:
            w = np.empty(m * k_codes, dtype=np.int64)
            for j in range(m):
                w[j * k_codes : (j + 1) * k_codes] = np.rint(
                    scale * (cb[j] @ row[j * dsub : (j + 1) * dsub])
                ).astype(np.int64)
            out.append(w.tolist())
        return pd.Series(out)

    flat = queries.select(
        F.col(id_col).alias("query_id"), _lut(F.col(vec_col)).alias("w")
    )
    return flat.select(
        "query_id", F.posexplode("w").alias("pos", "w")
    ).select(
        "query_id",
        (F.col("pos") / k_codes).cast("int").alias("m_idx"),
        F.pmod("pos", F.lit(k_codes)).cast("int").alias("code"),
        F.col("w").cast("long").alias("w"),
    )


def pq_adc_topk(
    codes: DataFrame,
    luts: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k from staged (id, codes) items and exploded
    query LUTs: score(q, item) = Σ_m lut[q][m][codes[item][m]] — an integer
    SUM (order-independent, cross-engine exact), then per-query top-k. The
    join is (item term rows) ⋈ broadcast(luts): no raw vectors move."""
    terms = codes.select(
        F.col("id").alias("item_id"), F.posexplode("codes").alias("m_idx", "code")
    )
    scored = (
        terms.join(F.broadcast(luts), ["m_idx", "code"])
        .where(F.col("item_id") != F.col("query_id"))
        .groupBy("query_id", "item_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "score", F.col("rank").cast("int").alias("rank"))
    )


# --- IVF-PQ composition — coarse quantizer + residual codes -------------------


def _kmeans_l2(
    sample: np.ndarray, k: int, seed: int = 42, iters: int = 8
) -> np.ndarray:
    """Plain (un-normalized) Lloyd iterations — residual codebooks live in
    the residual space, where unit-norm codewords (``_kmeans_centroids``'s
    cosine variant) would be a bad fit: residual norms are ≪ 1."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
    cents = sample[np.sort(idx)].astype(np.float64).copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def train_ivfpq(
    items: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 8,
    m: int = 8,
    k_codes: int = 16,
    max_sample: int | None = None,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, residual codebooks) — the 10^9-vector index recipe
    (IVF-PQ à la Jégou et al. "Product Quantization for Nearest Neighbor
    Search"): a coarse quantizer routes each vector to one inverted list;
    PQ codebooks encode the RESIDUAL (vector − its centroid), which is far
    tighter than encoding raw vectors. One bounded driver sample (same
    discipline as :func:`train_ivf` — never more than ``max_sample`` rows
    regardless of table size) trains both stages."""
    if max_sample is None:
        max_sample = 100 * max(n_lists, k_codes)
    rows = (
        items.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<double>"), F.lit(seed)))
        .limit(max_sample)
        .collect()
    )
    sample = _normalize_rows(np.array([r[0] for r in rows], dtype=np.float64))
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cents = _kmeans_centroids(sample, n_lists, seed)
    resid = sample - cents[np.argmax(sample @ cents.T, axis=1)]
    codebooks = np.stack(
        [
            _kmeans_l2(resid[:, j * dsub : (j + 1) * dsub], k_codes, seed + j)
            for j in range(m)
        ]
    )
    return cents, codebooks


def ivfpq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, codes array<int>) — nearest coarse list + residual PQ
    codes, one numpy pass per Arrow batch. The index row is an int plus m
    small ints per vector; raw vectors never leave this map stage."""
    m, _k, dsub = codebooks.shape
    cents, cb = centroids, codebooks

    @F.pandas_udf("struct<list_id: int, codes: array<int>>")
    def _enc(vecs: pd.Series) -> pd.DataFrame:
        mat = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        lists = np.argmax(mat @ cents.T, axis=1)
        resid = mat - cents[lists]
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = resid[:, j * dsub : (j + 1) * dsub]
            d = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1)
        return pd.DataFrame(
            {"list_id": lists.astype("int32"), "codes": [r.tolist() for r in codes]}
        )

    return df.select(
        F.col(id_col).alias("id"), _enc(F.col(vec_col)).alias("e")
    ).select("id", "e.list_id", "e.codes")


def ivfpq_query_tables(
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    scale: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """(luts, biases) for integer ADC over the IVF-PQ index.

    score(q, item) ≈ ⟨q, c_list + r̂⟩ = ⟨q, c_list⟩ + Σ_j ⟨q_j, cb_j[code_j]⟩
    — the residual term is exactly the raw-PQ LUT (:func:`pq_query_luts`,
    reused verbatim); the coarse term is one integer bias per (query,
    probed list). Both are integers at the same ``scale``, so the combined
    score is an exact integer SUM any engine reproduces bit-for-bit."""
    luts = pq_query_luts(queries, codebooks, id_col, vec_col, scale)
    cents = centroids

    @F.pandas_udf("array<struct<list_id: int, bias: long>>")
    def _probe(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        sims = mat @ cents.T
        out = []
        for row in sims:
            top = np.argsort(-row)[:n_probe]
            out.append(
                [
                    {"list_id": int(t), "bias": int(np.rint(scale * row[t]))}
                    for t in top
                ]
            )
        return pd.Series(out)

    biases = queries.select(
        F.col(id_col).alias("query_id"), F.explode(_probe(F.col(vec_col))).alias("p")
    ).select("query_id", "p.list_id", "p.bias")
    return luts, biases


def ivfpq_adc_topk(
    codes: DataFrame,
    luts: DataFrame,
    biases: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Integer ADC top-k over probed lists only: the bias join restricts
    candidates to each query's probed inverted lists (codes ⋈ broadcast
    biases on list_id — the IVF pruning), then the residual term sums the
    broadcast LUT weights per (query, item). No raw vectors move; the only
    shuffle is the per-(query, item) aggregate over candidate term rows."""
    cand = (
        codes.join(F.broadcast(biases), "list_id")
        .where(F.col("id") != F.col("query_id"))
        .select(F.col("id").alias("item_id"), "query_id", "bias", "codes")
    )
    terms = cand.select(
        "query_id", "item_id", "bias", F.posexplode("codes").alias("m_idx", "code")
    )
    scored = (
        terms.join(F.broadcast(luts), ["query_id", "m_idx", "code"])
        .groupBy("query_id", "item_id", "bias")
        .agg(F.sum("w").alias("resid"))
        .select(
            "query_id",
            "item_id",
            (F.col("bias") + F.col("resid")).cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "score", F.col("rank").cast("int").alias("rank"))
    )


def ivfpq_model_tables(spark, centroids: np.ndarray, codebooks: np.ndarray):
    """(cents_df, cb_df) — the trained IVF-PQ model as RELATIONAL tables:
    ``(list_id, cvec array<double>)`` and ``(m_idx, code, sub
    array<double>)``. n_lists + m·k_codes rows total (model-sized, always
    broadcastable). Staging these lets ANY engine reconstruct
    x̂ = c_list + concat_j cb_j[code_j] from the codes alone — the
    index-only refine path of :func:`ivfpq_refined_topk`."""
    spark_ = spark
    cents_df = spark_.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(centroids)],
        "list_id int, cvec array<double>",
    )
    cb_df = spark_.createDataFrame(
        [
            (int(j), int(c), [float(x) for x in codebooks[j][c]])
            for j in range(codebooks.shape[0])
            for c in range(codebooks.shape[1])
        ],
        "m_idx int, code int, sub array<double>",
    )
    return cents_df, cb_df


def ivfpq_reconstruct(
    codes: DataFrame, cents_df: DataFrame, cb_df: DataFrame, scale: int = 1000
) -> DataFrame:
    """(id, xq array<long>) — quantized RECONSTRUCTED vectors, pure
    relational ops: explode the m codes, broadcast-join the codebook
    subvectors, ordered flatten, add the coarse centroid, quantize.

    This is the refine stage a 10^9-vector deployment actually runs: the
    raw embeddings (4·dim bytes/vector) are too big to join against a
    shortlist cheaply, but x̂ is derivable from the m-byte codes plus the
    broadcast model — no second pass over the corpus. Binary64 addition is
    correctly rounded in every engine, so the reconstruction (and its
    quantization) is bit-identical cross-engine from the same staged
    model tables."""
    sub = codes.select(
        "id", "list_id", F.posexplode("codes").alias("m_idx", "code")
    ).join(F.broadcast(cb_df), ["m_idx", "code"])
    resid = sub.groupBy("id", "list_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m_idx", "sub"))),
                lambda s: s.sub,
            )
        ).alias("resid")
    )
    return resid.join(F.broadcast(cents_df), "list_id").select(
        "id",
        _quantize(
            F.zip_with("cvec", "resid", lambda a, b: a + b), scale
        ).alias("xq"),
    )


def ivfpq_refined_topk(
    shortlist: DataFrame,
    codes: DataFrame,
    cents_df: DataFrame,
    cb_df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Re-rank an ADC shortlist by exact quantized cosine against
    reconstructed vectors (:func:`ivfpq_reconstruct`) — the index-only
    sibling of :func:`quantized_rank_candidates`, which needs the raw
    vectors. Only the shortlist rows are reconstructed-and-scored; the
    query side (dimension-sized) broadcasts."""
    recon = ivfpq_reconstruct(
        codes.join(shortlist.select(F.col("item_id").alias("id")).distinct(), "id", "left_semi"),
        cents_df,
        cb_df,
        scale,
    )
    qz = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("q_v")
    )
    j = (
        shortlist.join(F.broadcast(qz), "query_id")
        .join(recon.withColumnRenamed("id", "item_id"), "item_id")
        .select("query_id", "item_id", _quantized_cosine("q_v", "xq").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank")
        )
    )


DEFAULT_LSH_LADDER: tuple[tuple[int, int], ...] = (
    (1, 0),
    (2, 0),
    (2, 2),
    (4, 2),
    (4, 4),
    (8, 4),
)


def tune_lsh(
    items: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    recall_target: float = 0.9,
    ladder: tuple[tuple[int, int], ...] = DEFAULT_LSH_LADDER,
    n_planes: int = 8,
    seed: int = 13,
) -> dict:
    """Pick the cheapest ``(n_tables, multiprobe)`` on ``ladder`` whose
    measured recall@k against the exact ground truth reaches
    ``recall_target`` — the tuning job a deployment runs ONCE on a query
    sample before shipping the approximate path (same one-off-job family
    as ``train_ivf``).

    ``queries`` should be a bounded sample (the recall estimate needs tens
    of queries, not the corpus). The exact top-k is computed once; each
    ladder rung costs one LSH candidate+rank job plus one tiny join-agg.
    Returns ``{"n_tables", "multiprobe", "recall", "achieved", "trail"}``
    where ``trail`` records every rung measured (nothing hidden — if no
    rung reaches the target, the best one is returned with ``achieved:
    False``)."""
    exact = (
        quantized_topk(items, queries, id_col=id_col, vec_col=vec_col, k=k)
        .select("query_id", "item_id")
        .localCheckpoint(eager=True)  # ground truth computed once, reused per rung
    )
    n_exact = exact.count()
    trail: list[dict] = []
    best: dict | None = None
    for n_tables, multiprobe in ladder:
        approx = quantized_rank_candidates(
            lsh_candidates(
                items,
                queries,
                id_col=id_col,
                vec_col=vec_col,
                n_planes=n_planes,
                n_tables=n_tables,
                seed=seed,
                multiprobe=multiprobe,
                dim=dim,
            ),
            items,
            k=k,
        ).select("query_id", "item_id")
        n_hit = exact.join(approx, ["query_id", "item_id"], "left_semi").count()
        recall = (n_hit / n_exact) if n_exact else 1.0
        rung = {
            "n_tables": n_tables,
            "multiprobe": multiprobe,
            "recall": round(recall, 4),
        }
        trail.append(rung)
        if best is None or rung["recall"] > best["recall"]:
            best = rung
        if recall >= recall_target:
            return {**rung, "achieved": True, "trail": trail}
    assert best is not None
    return {**best, "achieved": False, "trail": trail}
