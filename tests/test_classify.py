"""Trained NB classifier: map-side twin parity, held-out accuracy, and
exact-integer determinism (operators/classify.py).

The sf documents table carries NO label signal by construction (every lang
samples the same global token distribution — measured 22% held-out
accuracy, chance is 20%), so learnability is tested on a deterministic
labeled corpus with OVERLAPPING class vocabularies (neighbor classes share
half their tokens), the same shape the doc_topic_classifier catalog query
synthesizes and stages."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_platform_spark.operators.classify import (
    classify_documents,
    classify_map_side,
    confusion_matrix,
    train_class_token_weights,
)

_VOCAB = [
    "ablation", "basalt", "cobalt", "delta", "ember", "fjord",
    "garnet", "harbor", "isotope", "jasper", "kelvin", "lumen",
    "meridian", "nickel", "obsidian", "pylon", "quartz", "rivet",
    "sextant", "tungsten", "umbra", "vertex", "wharf", "xenon",
]


def _corpus(spark, n=300):
    vocab = F.array(*[F.lit(t) for t in _VOCAB])
    labels = F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma"))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(labels, (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("label"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.element_at(
                    vocab,
                    (
                        F.pmod("id", F.lit(3)) * 6
                        + F.pmod(F.xxhash64(F.col("id"), j), F.lit(12))
                        + 1
                    ).cast("int"),
                ),
            ),
        ).alias("text"),
    )


def test_held_out_accuracy_on_overlapping_vocabularies(spark):
    d = _corpus(spark).cache()
    train = d.where(F.col("doc_id") % 5 != 0)
    test = d.where(F.col("doc_id") % 5 == 0)
    w = train_class_token_weights(train, "label", "doc_id", "text").cache()
    assert {r["label"] for r in w.select("label").distinct().collect()} == {
        "alpha", "beta", "gamma"
    }
    assert w.where(F.col("w") <= 0).count() == 0

    pred = classify_documents(test, w, "doc_id", "text")
    cm = confusion_matrix(pred, test, "doc_id", "label").collect()
    n_right = sum(r["n_docs"] for r in cm if r["actual"] == r["predicted"])
    n_all = sum(r["n_docs"] for r in cm)
    assert n_all == test.count()  # every held-out doc got a verdict
    assert n_right / n_all >= 0.95, cm
    d.unpersist()
    w.unpersist()


def test_map_side_twin_matches_relational(spark):
    d = _corpus(spark, n=150)
    train = d.where(F.col("doc_id") % 5 != 0)
    test = d.where(F.col("doc_id") % 5 == 0)
    w = train_class_token_weights(train, "label", "doc_id", "text")
    rel = {
        (r["doc_id"], r["predicted"], r["score"])
        for r in classify_documents(test, w, "doc_id", "text").collect()
    }
    ms = {
        (r["doc_id"], r["predicted"], r["score"])
        for r in classify_map_side(test, w, "doc_id", "text").collect()
    }
    assert rel == ms and len(rel) > 0


def test_tie_break_and_oov_handling(spark):
    rows = [
        (1, "alpha beta", "A"),
        (2, "alpha beta", "A"),
        (3, "alpha beta", "B"),
        (4, "alpha beta", "B"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string, lab string")
    w = train_class_token_weights(train, "lab", "doc_id", "text", min_count=1)
    probe = spark.createDataFrame(
        [(10, "alpha"), (11, "zzz qqq")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["predicted"] for r in classify_documents(probe, w, "doc_id", "text").collect()}
    # equal scores for A and B -> lexicographically smallest class wins
    assert got == {10: "A"}  # doc 11 is all-OOV: no verdict row
    ms = {r["doc_id"]: r["predicted"] for r in classify_map_side(probe, w, "doc_id", "text").collect()}
    assert ms == got

    # NULL text emits no verdict in EITHER twin — even when '' is a
    # trained vocabulary token (empty training doc below), a NULL doc
    # must not inherit its weights via the '' coercion
    train2 = spark.createDataFrame(
        [(1, "", "A"), (2, "", "A"), (3, "alpha", "B"), (4, "alpha", "B")],
        "doc_id long, text string, lab string",
    )
    w2 = train_class_token_weights(train2, "lab", "doc_id", "text", min_count=1)
    probe2 = spark.createDataFrame(
        [(20, None), (21, ""), (22, "alpha")], "doc_id long, text string"
    )
    rel2 = {r["doc_id"]: r["predicted"] for r in classify_documents(probe2, w2, "doc_id", "text").collect()}
    ms2 = {r["doc_id"]: r["predicted"] for r in classify_map_side(probe2, w2, "doc_id", "text").collect()}
    assert rel2 == ms2
    assert 20 not in rel2 and rel2[21] == "A" and rel2[22] == "B"


def _freq_corpus(spark, n=300):
    """Every class emits every token (presence ~uninformative per token);
    classes differ only in FREQUENCY: 3/4 of draws come from the class's
    favored 8-token slice, 1/4 uniform over all 24."""
    vocab = F.array(*[F.lit(t) for t in _VOCAB])
    labels = F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma"))
    h = lambda j: F.xxhash64(F.col("id"), j)  # noqa: E731
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(labels, (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("label"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda j: F.element_at(
                    vocab,
                    F.when(
                        F.pmod(h(j), F.lit(4)) != 0,
                        F.pmod("id", F.lit(3)) * 8
                        + F.pmod(F.abs(h(j)), F.lit(8))
                        + 1,
                    )
                    .otherwise(F.pmod(F.abs(h(j)), F.lit(24)) + 1)
                    .cast("int"),
                ),
            ),
        ).alias("text"),
    )


def test_multinomial_mode_learns_frequency_signal(spark):
    d = _freq_corpus(spark).cache()
    train = d.where(F.col("doc_id") % 5 != 0)
    test = d.where(F.col("doc_id") % 5 == 0)
    w = train_class_token_weights(
        train, "label", "doc_id", "text", mode="multinomial"
    )
    pred = classify_documents(test, w, "doc_id", "text", per_occurrence=True)
    cm = confusion_matrix(pred, test, "doc_id", "label").collect()
    n_right = sum(r["n_docs"] for r in cm if r["actual"] == r["predicted"])
    n_all = sum(r["n_docs"] for r in cm)
    assert n_all > 0 and n_right / n_all >= 0.9, cm
    # map-side twin parity in per-occurrence mode
    rel = {
        (r["doc_id"], r["predicted"], r["score"])
        for r in classify_documents(test, w, "doc_id", "text", per_occurrence=True).collect()
    }
    ms = {
        (r["doc_id"], r["predicted"], r["score"])
        for r in classify_map_side(test, w, "doc_id", "text", per_occurrence=True).collect()
    }
    assert rel == ms
    d.unpersist()


def _binary_corpus(spark, n=300):
    """Two classes drawing from overlapping 15-token slices (6 shared)."""
    vocab = F.array(*[F.lit(t) for t in _VOCAB])
    labels = F.array(F.lit("quality"), F.lit("spam"))
    cls = F.pmod("id", F.lit(2))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(labels, (cls + 1).cast("int")).alias("label"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.element_at(
                    vocab,
                    (cls * 9 + F.pmod(F.xxhash64(F.col("id"), j), F.lit(15)) + 1)
                    .cast("int"),
                ),
            ),
        ).alias("text"),
    )


def test_threshold_sweep_monotone_and_argmax_consistent(spark):
    """The sweep's kept-set shrinks as the threshold rises; threshold 0
    reproduces exactly the argmax classifier's 'quality' verdicts (margin
    >= 0 ≡ score tie breaking to the lexicographically smaller label)."""
    from ocr_platform_spark.operators.classify import (
        class_margin_scores,
        threshold_sweep,
    )

    d = _binary_corpus(spark).cache()
    train = d.where(F.col("doc_id") % 5 != 0)
    test = d.where(F.col("doc_id") % 5 == 0)
    w = train_class_token_weights(train, "label", "doc_id", "text").cache()
    margins = class_margin_scores(
        test, w, "doc_id", "text", pos_label="quality", neg_label="spam"
    ).cache()

    rows = {
        r["threshold"]: r
        for r in threshold_sweep(
            margins, d, "doc_id", "label", pos_label="quality",
            thresholds=(-100, -2, 0, 2, 100),
        ).collect()
    }
    assert set(rows) == {-100, -2, 0, 2, 100}
    n_scored = rows[0]["n_scored"]
    assert n_scored == margins.count() > 0
    # monotone: higher cut keeps fewer, recalls less
    ts = sorted(rows)
    for lo, hi in zip(ts, ts[1:]):
        assert rows[lo]["n_kept"] >= rows[hi]["n_kept"]
        assert rows[lo]["n_pos_kept"] >= rows[hi]["n_pos_kept"]
    # a cut below every margin keeps everything (keep_rate 1.0, recall 1.0)
    assert rows[-100]["n_kept"] == n_scored
    assert rows[-100]["keep_rate"] == 1.0 and rows[-100]["recall"] == 1.0
    # a cut above every margin keeps nothing; ratio columns go NULL/0
    assert rows[100]["n_kept"] == 0 and rows[100]["precision"] is None
    assert rows[100]["recall"] == 0.0

    # threshold-0 kept set == argmax 'quality' predictions, doc for doc
    kept0 = {
        r["doc_id"]
        for r in margins.where(F.col("margin") >= 0).select("doc_id").collect()
    }
    argmax_quality = {
        r["doc_id"]
        for r in classify_documents(test, w, "doc_id", "text")
        .where(F.col("predicted") == "quality")
        .select("doc_id")
        .collect()
    }
    assert kept0 == argmax_quality
    d.unpersist(); w.unpersist(); margins.unpersist()
