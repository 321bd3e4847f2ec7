"""Trained document classifier — the fastText-classifier slot of a
web-corpus pipeline (CCNet/Dolma-style model-based filtering: a supervised
model trained on labeled text routes documents, most commonly language
identification; the heuristic ``functions/textfns.lang_id`` is the
zero-training fallback, this module is the trained path).

Model: multinomial-flavoured Naive Bayes over DISTINCT-token presence with
an exact-integer weight surrogate — ``w(class, token) = bit length of the
number of training docs of that class containing the token`` (the same
``floor(log2 c)+1`` integer-log family as the CCNet LM gate in
operators/lmscore.py). Scoring is ``score(doc, class) = Σ w`` over the
doc's distinct known tokens, argmax with a lexicographic class tie-break —
every quantity an integer, so training AND inference replay bit-for-bit in
any SQL engine from the raw parquet (the catalog oracle retrains from
scratch; no staging needed). Class-frequency acts as the prior implicitly:
bigger classes accumulate larger counts, hence larger bit-length weights.

Scale shape at 10^12 docs: training is one explode + one hash aggregate
(map-side combinable); the pruned weight table is the Zipf head of the
vocabulary × classes; inference either joins the token stream against it
(relational twin — AQE picks broadcast vs shuffle-hash) or broadcasts it
into one Arrow pass per partition (:func:`classify_map_side`, the
deployment shape — the corpus never reshuffles). Nothing is all-pairs and
nothing collects beyond the pruned model.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ocr_platform_spark.functions.textfns import normalized_text


def doc_distinct_tokens(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(id[, keep_cols...], token) — one row per DISTINCT whitespace token
    of the normalized text (presence, not frequency: Bernoulli-NB style,
    which is robust to the repeated-token spam these corpora carry)."""
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep_cols],
        F.explode(
            F.array_distinct(F.split(normalized_text(text_col), " "))
        ).alias("token"),
    )


def doc_tokens(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Multinomial twin of :func:`doc_distinct_tokens`: one row per token
    OCCURRENCE — for corpora whose class signal lives in token
    frequencies, not presence (every class sharing one vocabulary)."""
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep_cols],
        F.explode(F.split(normalized_text(text_col), " ")).alias("token"),
    )


def train_class_token_weights(
    train: DataFrame,
    label_col: str,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    mode: str = "presence",
) -> DataFrame:
    """(label, token, w) — the model: per-class token counts, pruned below
    ``min_count`` (rare tokens carry noise and bloat the table — the
    fastText ``minCount`` knob), weight = integer bit length of the count
    (``length(bin(c))``, exact in Spark and DuckDB alike).

    ``mode="presence"`` counts distinct documents containing the token
    (Bernoulli-style — robust to repeated-token spam); ``"multinomial"``
    counts occurrences AND normalizes by class size — weight = bit length
    of ``(c << 14) div class_total`` (a scaled integer P(token|class)) —
    which is the right model when every class shares one vocabulary and
    the signal is frequency shape. Scoring (:func:`classify_documents` /
    :func:`classify_map_side`) works on either model's output; pair the
    multinomial model with :func:`doc_tokens`-shaped scoring by passing
    ``per_occurrence=True``."""
    if mode == "presence":
        toks = doc_distinct_tokens(train, id_col, text_col, keep_cols=(label_col,))
        return (
            toks.groupBy(F.col(label_col).alias("label"), "token")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") >= min_count)
            .select("label", "token", F.length(F.bin("c")).cast("int").alias("w"))
        )
    if mode != "multinomial":
        raise ValueError(f"unknown mode {mode!r}")
    toks = doc_tokens(train, id_col, text_col, keep_cols=(label_col,))
    counts = toks.groupBy(F.col(label_col).alias("label"), "token").agg(
        F.count("*").alias("c")
    )
    totals = counts.groupBy("label").agg(F.sum("c").alias("class_total"))
    return (
        counts.where(F.col("c") >= min_count)
        .join(F.broadcast(totals), "label")
        .select(
            "label",
            "token",
            F.length(F.bin(F.expr("(c * 16384) div class_total")))
            .cast("int")
            .alias("w"),
        )
    )


def classify_documents(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    per_occurrence: bool = False,
) -> DataFrame:
    """(id, predicted, score) — argmax_class Σ w over the doc's distinct
    known tokens (or every occurrence with ``per_occurrence=True``, the
    multinomial pairing); ties break to the lexicographically smallest
    class. Documents whose every token is out-of-vocabulary for every
    class emit no row (no evidence, no verdict — the caller's coverage
    join decides their fate)."""
    tokfn = doc_tokens if per_occurrence else doc_distinct_tokens
    toks = tokfn(docs, id_col, text_col)
    scored = (
        toks.join(weights, "token")
        .groupBy("id", "label")
        .agg(F.sum("w").cast("long").alias("score"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.col("label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("label").alias("predicted"),
            "score",
        )
    )


def classify_map_side(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    per_occurrence: bool = False,
) -> DataFrame:
    """Map-side twin of :func:`classify_documents`: the pruned model is
    collected and broadcast, every document scored in one Arrow-batched
    pass — no token explode, no model shuffle, no per-doc regroup (the
    deployment shape whenever the pruned model fits an executor). The
    Python tokenizer mirrors ``normalized_text`` exactly (Java ``\\s``
    ASCII whitespace class); outputs are pinned row-for-row equal to the
    relational twin in tests/test_classify.py."""
    import re as _re

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    spark = docs.sparkSession
    table: dict[str, list[tuple[str, int]]] = {}
    for r in weights.collect():
        table.setdefault(r["token"], []).append((r["label"], int(r["w"])))
    bc = spark.sparkContext.broadcast(table)
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    schema = StructType(
        [
            StructField("predicted", StringType()),
            StructField("score", LongType()),
        ]
    )

    @pandas_udf(schema)
    def _clf(texts: pd.Series) -> pd.DataFrame:
        tbl = bc.value
        preds: list[str | None] = []
        scores: list[int | None] = []
        for t in texts:
            # .strip(" ") not .strip(): bare strip is unicode-aware and
            # would remove e.g. U+00A0 where the relational twin's JVM
            # trim (ASCII space) does not — breaking row-for-row parity
            stream = ws.sub(" ", (t or "").lower()).strip(" ").split(" ")
            toks = stream if per_occurrence else set(stream)
            acc: dict[str, int] = {}
            for tok in toks:
                for label, w in tbl.get(tok, ()):
                    acc[label] = acc.get(label, 0) + w
            if not acc:
                preds.append(None)
                scores.append(None)
                continue
            # argmax, ties to the smallest label — same ORDER BY as the
            # relational twin (score DESC, label ASC)
            best = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
            preds.append(best[0])
            scores.append(best[1])
        return pd.DataFrame({"predicted": preds, "score": scores})

    # NULL text emits no row relationally (explode of a null token array);
    # filter here too rather than coercing to '' — '' can be a trained
    # vocabulary token, which would give NULL docs a phantom verdict
    out = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), _clf(F.col(text_col)).alias("r")
    ).select(id_col, "r.predicted", "r.score")
    return out.where(F.col("predicted").isNotNull())


def confusion_matrix(
    predictions: DataFrame,
    truth: DataFrame,
    id_col: str,
    label_col: str,
) -> DataFrame:
    """(actual, predicted, n_docs) — the held-out evaluation rollup."""
    return (
        predictions.join(
            truth.select(F.col(id_col), F.col(label_col).alias("actual")), id_col
        )
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


def class_margin_scores(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    pos_label: str,
    neg_label: str,
    per_occurrence: bool = False,
) -> DataFrame:
    """(id, pos_score, neg_score, margin) — per-document integer evidence
    of a BINARY model: the positive class's summed token weights, the
    negative class's, and their difference. This is the quality-classifier
    deployment shape (keep a document iff ``margin >= threshold``) — the
    argmax of :func:`classify_documents` is the special case threshold=0
    with ties to the lexicographically smaller label. Documents whose every
    token is out-of-vocabulary for BOTH classes emit no row (no evidence,
    no verdict). All-integer, so a second engine reproduces every margin
    exactly."""
    tokfn = doc_tokens if per_occurrence else doc_distinct_tokens
    toks = tokfn(docs, id_col, text_col)
    return (
        toks.join(weights, "token")
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("label") == pos_label, F.col("w")).otherwise(0))
            .cast("long")
            .alias("pos_score"),
            F.sum(F.when(F.col("label") == neg_label, F.col("w")).otherwise(0))
            .cast("long")
            .alias("neg_score"),
        )
        .select(
            F.col("id").alias(id_col),
            "pos_score",
            "neg_score",
            (F.col("pos_score") - F.col("neg_score")).alias("margin"),
        )
    )


def threshold_sweep(
    margins: DataFrame,
    truth: DataFrame,
    id_col: str,
    label_col: str,
    pos_label: str,
    thresholds: tuple[int, ...] = (-6, -4, -2, 0, 2, 4, 6),
) -> DataFrame:
    """(threshold, n_kept, n_pos_kept, n_pos_total, n_scored, precision,
    recall, keep_rate) — the calibration table a user reads BEFORE picking
    a quality-classifier threshold (the FineWeb-Edu / DCLM recipe: sweep
    the cutoff on labeled held-out data, pick by target precision or
    keep-rate). One labeled-doc × threshold expansion (the threshold
    dimension is a literal VALUES table — tiny, broadcast), exact integer
    counts per cell, ratios as correctly-rounded doubles at the very end;
    a second engine replays the whole sweep from the staged margins.
    Thresholds with an empty kept set still report (left join from the
    config table)."""
    spark = margins.sparkSession
    j = margins.join(
        truth.select(F.col(id_col), F.col(label_col).alias("actual")), id_col
    )
    cfg = spark.createDataFrame([(t,) for t in thresholds], "threshold int")
    kept = (
        j.crossJoin(F.broadcast(cfg))
        .where(F.col("margin") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(F.when(F.col("actual") == pos_label, 1).otherwise(0))
            .cast("long")
            .alias("n_pos_kept"),
        )
    )
    totals = j.agg(
        F.count("*").alias("n_scored"),
        F.sum(F.when(F.col("actual") == pos_label, 1).otherwise(0))
        .cast("long")
        .alias("n_pos_total"),
    )
    return (
        cfg.crossJoin(F.broadcast(totals))
        .join(F.broadcast(kept), "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_pos_kept", F.lit(0)).cast("long").alias("n_pos_kept"),
            "n_pos_total",
            "n_scored",
            F.when(
                F.coalesce("n_kept", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_pos_kept", F.lit(0)).cast("double")
                    / F.col("n_kept"),
                    4,
                ),
            ).alias("precision"),
            F.when(
                F.col("n_pos_total") > 0,
                F.round(
                    F.coalesce("n_pos_kept", F.lit(0)).cast("double")
                    / F.col("n_pos_total"),
                    4,
                ),
            ).alias("recall"),
            F.when(
                F.col("n_scored") > 0,
                F.round(
                    F.coalesce("n_kept", F.lit(0)).cast("double")
                    / F.col("n_scored"),
                    4,
                ),
            ).alias("keep_rate"),
        )
    )
