"""Similarity search: brute-force exactness vs numpy; LSH recall sanity."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ocr_platform_spark.operators import ann


def _table(spark, n=60, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    mat = rng.standard_normal((n, dim))
    rows = [(i, mat[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), mat


def test_cosine_matches_numpy(spark):
    df, mat = _table(spark, n=20)
    out = ann.brute_force_topk(df, df.where(F.col("vec_id") == 0), k=5).collect()
    q = mat[0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    sims[0] = -np.inf  # self excluded
    expect = np.argsort(-sims)[:5].tolist()
    got = [r["item_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == expect
    for r in out:
        assert abs(r["cosine"] - sims[r["item_id"]]) < 1e-5


def test_lsh_recall_reasonable(spark):
    df, mat = _table(spark, n=120, dim=16)
    queries = df.where(F.col("vec_id") < 8)
    exact = ann.brute_force_topk(df, queries, k=5)
    approx = ann.lsh_topk(df, queries, k=5, n_planes=4, n_tables=6)
    e = {(r["query_id"], r["item_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["item_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall}"  # 6 tables of 4 planes on random data


def test_lsh_buckets_deterministic(spark):
    df, _ = _table(spark, n=30)
    a = ann.with_lsh_bucket(df).select("vec_id", "buckets").collect()
    b = ann.with_lsh_bucket(df).select("vec_id", "buckets").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_multiprobe_improves_recall(spark):
    """Query-side multi-probe raises recall vs single-probe LSH at the same
    table count, and stays deterministic."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.ann import brute_force_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 12)
    truth = brute_force_topk(emb, queries, k=5)
    t = {(r["query_id"], r["item_id"]) for r in truth.collect()}

    def recall(multiprobe):
        got = lsh_topk(emb, queries, k=5, n_planes=4, n_tables=2, multiprobe=multiprobe)
        g = {(r["query_id"], r["item_id"]) for r in got.collect()}
        return len(g & t) / len(t)

    r0, r3 = recall(0), recall(3)
    assert r3 >= r0
    assert r3 > 0.3
    # determinism
    again = lsh_topk(emb, queries, k=5, n_planes=4, n_tables=2, multiprobe=3)
    assert {tuple(r) for r in again.collect()} == {
        tuple(r)
        for r in lsh_topk(emb, queries, k=5, n_planes=4, n_tables=2, multiprobe=3).collect()
    }
    emb.unpersist()


def test_ivf_topk_recall_and_determinism(spark):
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.ann import brute_force_topk, ivf_topk, train_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 10)
    cents = train_ivf(emb, n_lists=8)
    assert cents.shape[1] == 64

    truth = {(r["query_id"], r["item_id"]) for r in brute_force_topk(emb, queries, k=5).collect()}
    got = ivf_topk(emb, queries, cents, k=5, n_probe=4)
    g = {(r["query_id"], r["item_id"]) for r in got.collect()}
    recall = len(g & truth) / len(truth)
    assert recall > 0.5  # half the lists probed → decent recall

    # full probe == brute force exactly
    full = ivf_topk(emb, queries, cents, k=5, n_probe=8)
    assert {(r["query_id"], r["item_id"]) for r in full.collect()} == truth

    # deterministic
    again = ivf_topk(emb, queries, cents, k=5, n_probe=4)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in got.collect()}
    emb.unpersist()


def test_train_ivf_driver_sample_is_bounded(spark):
    """The quantizer trains on a bounded deterministic sample — never a full
    collect — so a naive caller at 10^9 vectors cannot OOM the driver."""
    df, _ = _table(spark, n=500, dim=8)
    c1 = ann.train_ivf(df, n_lists=4, max_sample=50)
    c2 = ann.train_ivf(df, n_lists=4, max_sample=50)
    assert c1.shape == (4, 8)
    assert np.allclose(c1, c2)
    # default cap: 100 * n_lists, independent of table size
    c3 = ann.train_ivf(df, n_lists=2)
    assert c3.shape == (2, 8)


def test_pq_encode_and_adc_shortlist(spark):
    """PQ codebooks train on a bounded sample; encode emits m codes per
    vector; the ADC shortlist + exact re-rank recovers a reasonable share
    of the brute-force top-k (near-random vectors are PQ's worst case, so
    the bar is recall of the shortlist union, not rank-exactness)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 8)

    cb = ann.train_pq(emb, m=8, k_codes=16)
    assert cb.shape == (8, 16, 8)  # dim 64 / m 8
    cb2 = ann.train_pq(emb, m=8, k_codes=16)
    assert np.allclose(cb, cb2)  # deterministic training

    codes = ann.pq_encode(emb, cb)
    row = codes.limit(1).collect()[0]
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])

    luts = ann.pq_query_luts(queries, cb)
    # one LUT row per (query, subspace, code)
    assert luts.count() == 8 * 8 * 16

    truth = {
        (r["query_id"], r["item_id"])
        for r in ann.brute_force_topk(emb, queries, k=5).collect()
    }
    short = ann.pq_adc_topk(codes, luts, k=50)
    s = {(r["query_id"], r["item_id"]) for r in short.collect()}
    recall = len(s & truth) / len(truth)
    assert recall >= 0.4, f"shortlist-50 recall {recall}"

    # deterministic end to end
    again = {(r["query_id"], r["item_id"]) for r in ann.pq_adc_topk(codes, luts, k=50).collect()}
    assert again == s
    emb.unpersist()


def test_pq_train_rejects_indivisible_dim(spark):
    df, _ = _table(spark, n=40, dim=10)
    import pytest

    with pytest.raises(ValueError):
        ann.train_pq(df, m=4, k_codes=4)


def test_tune_lsh_hits_target_and_records_trail(spark):
    from ocr_platform_spark.operators.ann import tune_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where("vec_id < 6")
    res = tune_lsh(emb, qs, dim=64, k=5, recall_target=0.6)
    assert res["trail"], "every measured rung is recorded"
    assert res["recall"] == max(r["recall"] for r in res["trail"]) or res["achieved"]
    if res["achieved"]:
        assert res["recall"] >= 0.6
        # the tuner stops at the FIRST rung reaching the target
        assert res["trail"][-1]["recall"] >= 0.6
        for r in res["trail"][:-1]:
            assert r["recall"] < 0.6
    # deterministic: re-running returns the identical choice and trail
    res2 = tune_lsh(emb, qs, dim=64, k=5, recall_target=0.6)
    assert res == res2


def test_tune_lsh_impossible_target_returns_best(spark):
    from ocr_platform_spark.operators.ann import tune_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where("vec_id < 4")
    res = tune_lsh(
        emb, qs, dim=64, k=5, recall_target=1.01, ladder=((1, 0), (2, 2))
    )
    assert not res["achieved"] and len(res["trail"]) == 2
    assert res["recall"] == max(r["recall"] for r in res["trail"])


def test_ivfpq_encode_probe_and_adc(spark):
    """IVF-PQ composition: residual codebooks train deterministically on
    the bounded sample; every item lands in exactly one list with m codes;
    probed-list pruning restricts candidates; the integer ADC shortlist +
    exact re-rank beats raw PQ's worst-case bar on the same vectors (the
    residual encoding is tighter than raw-vector PQ by construction)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 8)

    cents, cb = ann.train_ivfpq(emb, n_lists=8, m=8, k_codes=16)
    assert cents.shape[0] == 8 and cb.shape == (8, 16, 8)
    cents2, cb2 = ann.train_ivfpq(emb, n_lists=8, m=8, k_codes=16)
    assert np.allclose(cents, cents2) and np.allclose(cb, cb2)

    codes = ann.ivfpq_encode(emb, cents, cb).cache()
    row = codes.limit(1).collect()[0]
    assert 0 <= row["list_id"] < 8 and len(row["codes"]) == 8
    assert codes.count() == emb.count()  # one list per item

    luts, biases = ann.ivfpq_query_tables(queries, cents, cb, n_probe=4)
    assert biases.count() == 8 * 4          # n_probe biases per query
    assert luts.count() == 8 * 8 * 16       # (query, m, code) grid

    short = ann.ivfpq_adc_topk(codes, luts, biases, k=50).cache()
    # IVF pruning: every candidate's list is one the query probed
    probed = {(r["query_id"], r["list_id"]) for r in biases.collect()}
    cand_lists = (
        short.join(codes.select(F.col("id").alias("item_id"), "list_id"), "item_id")
        .select("query_id", "list_id")
        .collect()
    )
    assert all((r["query_id"], r["list_id"]) in probed for r in cand_lists)

    truth = {
        (r["query_id"], r["item_id"])
        for r in ann.brute_force_topk(emb, queries, k=5).collect()
    }
    s = {(r["query_id"], r["item_id"]) for r in short.collect()}
    recall = len(s & truth) / len(truth)
    assert recall >= 0.4, f"ivfpq shortlist-50 recall {recall}"

    again = {
        (r["query_id"], r["item_id"])
        for r in ann.ivfpq_adc_topk(codes, luts, biases, k=50).collect()
    }
    assert again == s
    codes.unpersist()
    emb.unpersist()


def test_ivfpq_reconstruct_matches_numpy_bitexact(spark):
    """The relational reconstruction (explode codes → codebook join →
    ordered flatten → centroid add → quantize) reproduces the numpy
    reconstruction x̂ = c_list + cb[codes] EXACTLY — same binary64 adds,
    same round-half-up quantization — so the oracle can replay it."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    cents, cb = ann.train_ivfpq(emb, n_lists=8, m=8, k_codes=16)
    codes = ann.ivfpq_encode(emb, cents, cb).cache()
    cents_df, cb_df = ann.ivfpq_model_tables(spark, cents, cb)

    got = {
        r["id"]: r["xq"]
        for r in ann.ivfpq_reconstruct(codes, cents_df, cb_df).collect()
    }
    dsub = cb.shape[2]
    for r in codes.collect():
        xhat = cents[r["list_id"]].copy()
        for j, c in enumerate(r["codes"]):
            xhat[j * dsub : (j + 1) * dsub] += cb[j][c]
        want = [int(np.floor(v * 1000 + 0.5)) for v in xhat]
        assert got[r["id"]] == want, r["id"]


def test_ivfpq_refined_topk_matches_raw_vector_rerank_shape(spark):
    """Index-only refine returns a full top-k per query with ranks 1..k and
    scores within quantization distance of the raw-vector re-rank."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 4)
    cents, cb = ann.train_ivfpq(emb, n_lists=8, m=8, k_codes=16)
    codes = ann.ivfpq_encode(emb, cents, cb).cache()
    cents_df, cb_df = ann.ivfpq_model_tables(spark, cents, cb)
    luts, biases = ann.ivfpq_query_tables(queries, cents, cb, n_probe=4)
    short = ann.ivfpq_adc_topk(codes, luts, biases, k=30).select(
        "query_id", "item_id"
    )
    ref = ann.ivfpq_refined_topk(short, codes, cents_df, cb_df, queries, k=5)
    rows = ref.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_hard_negatives_denoise_gate_and_exclusions(spark):
    """Candidates outscoring the positive (false negatives) are dropped,
    as are the query itself and the positive; survivors rank by cosine
    with deterministic ties."""

    def vec(i, mag):
        v = [0.0] * 4
        v[i] = mag
        return v

    # query 0 along axis 0; positive 100 at cos≈1; 200 ALSO at cos≈1 but
    # listed as a negative candidate (false negative — must be gated out
    # only if it outscores the positive; equal rounded score is kept out
    # too because the gate is strict <).
    emb = spark.createDataFrame(
        [
            (0, vec(0, 1.0)),
            (100, vec(0, 0.9)),          # positive, cosine 1.0
            (200, [0.9, 0.01, 0.0, 0.0]),  # slightly off-axis, just below 1.0
            (201, [0.7, 0.7, 0.0, 0.0]),   # cos ≈ 0.707
            (202, vec(1, 1.0)),            # orthogonal, cos 0
            (203, [1.0, 0.02, 0.0, 0.0]),  # cos > positive? no: pos is 1.0
        ],
        "vec_id long, embedding array<float>",
    )
    from ocr_platform_spark.operators.ann import hard_negatives

    pos = spark.createDataFrame([(0, 100)], "query_id long, pos_id long")
    rows = hard_negatives(emb, pos, k=10).collect()
    ids = [r["neg_id"] for r in rows]
    assert 0 not in ids and 100 not in ids
    # all survivors scored strictly below the positive
    assert all(r["cosine"] < r["pos_cosine"] for r in rows)
    # ranks are 1..n ordered by cosine desc
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0]["cosine"] >= rows[-1]["cosine"]


def test_hard_negatives_false_negative_excluded(spark):
    """A candidate strictly outscoring the positive never appears."""

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (100, [0.8, 0.6]),   # positive, cosine 0.8
            (200, [1.0, 0.1]),   # cosine ≈ 0.995 > positive → excluded
            (201, [0.5, 0.9]),   # cosine ≈ 0.486 < positive → kept
        ],
        "vec_id long, embedding array<float>",
    )
    from ocr_platform_spark.operators.ann import hard_negatives

    pos = spark.createDataFrame([(0, 100)], "query_id long, pos_id long")
    rows = hard_negatives(emb, pos, k=10).collect()
    assert [r["neg_id"] for r in rows] == [201]


def test_hard_negatives_per_positive_partitions(spark):
    """A query with two labeled positives mines a separate top-k against
    each one — each pair carries its own denoising threshold."""

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (100, [0.9, 0.436]),  # strong positive, cosine ≈ 0.90
            (101, [0.3, 0.954]),  # weak positive, cosine ≈ 0.30
            (200, [0.8, 0.6]),    # cosine 0.8: below pos 100, above pos 101
            (201, [0.1, 0.995]),  # cosine ≈ 0.10: below both
        ],
        "vec_id long, embedding array<float>",
    )
    from ocr_platform_spark.operators.ann import hard_negatives

    pos = spark.createDataFrame(
        [(0, 100), (0, 101)], "query_id long, pos_id long"
    )
    rows = hard_negatives(emb, pos, k=5).collect()
    by_pos = {}
    for r in rows:
        by_pos.setdefault(r["pos_id"], []).append(r["neg_id"])
    # vs the strong positive: 200 and 201 score below it; the OTHER
    # labeled positive 101 is NEVER mined as a negative (all of the
    # query's positives are anti-joined out — DPR/RocketQA denoising,
    # else weak positives become label-noise negatives); vs the weak
    # positive only 201 survives the strict-< gate
    assert sorted(by_pos[100]) == [200, 201]
    assert by_pos[101] == [201]
    # ranks restart per pair
    assert sorted(r["rank"] for r in rows if r["pos_id"] == 100) == [1, 2]


def test_positive_rank_metrics_exact_ranks(spark):
    from ocr_platform_spark.operators.ann import positive_rank_metrics

    # query 0 at origin-ish; items at decreasing cosine to it
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.01]),   # nearest to 0
        (2, [1.0, 0.5]),    # second
        (3, [0.0, 1.0]),    # orthogonal
    ]
    items = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pos = spark.createDataFrame([(0, 2)], "query_id long, pos_id long")
    r = positive_rank_metrics(items, pos, k=2).collect()[0]
    assert (r["query_id"], r["pos_id"], r["rank"]) == (0, 2, 2)
    assert r["hit_at_1"] is False and r["hit_at_2"] is True
    assert r["rr_x1e6"] == 500000
    # positive past k -> rr 0
    pos3 = spark.createDataFrame([(0, 3)], "query_id long, pos_id long")
    r3 = positive_rank_metrics(items, pos3, k=2).collect()[0]
    assert r3["rank"] == 3 and r3["rr_x1e6"] == 0 and r3["hit_at_2"] is False


def test_positive_rank_metrics_tie_breaks_by_item_id(spark):
    from ocr_platform_spark.operators.ann import positive_rank_metrics

    # items 1 and 2 identical -> same cosine to the query; lower id wins
    rows = [(0, [1.0, 0.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])]
    items = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pos = spark.createDataFrame([(0, 2)], "query_id long, pos_id long")
    assert positive_rank_metrics(items, pos).collect()[0]["rank"] == 2
    pos1 = spark.createDataFrame([(0, 1)], "query_id long, pos_id long")
    assert positive_rank_metrics(items, pos1).collect()[0]["rank"] == 1
