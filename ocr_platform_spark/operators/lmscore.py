"""CCNet-style n-gram LM quality scoring.

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", LREC 2020) buckets crawl documents into head/middle/
tail by the perplexity of a language model trained on a clean reference
corpus — the single most used model-based quality gate in web-scale corpus
construction. This module is the exact-arithmetic Spark rendition of that
gate:

- the "LM" is a bigram count table built from a designated reference slice
  of the corpus (in production: the curated corpus of the previous crawl, a
  wiki dump, ...), pruned at ``min_count`` like a real KenLM vocabulary;
- the per-document score replaces ``sum(log P(w_i|w_{i-1}))`` with the sum
  of the reference counts' BIT LENGTHS (``length(bin(count))`` =
  ``floor(log2 c) + 1``) — a pure-integer log surrogate that is
  bit-identical in any engine (no float log, no order-dependent double
  sums), preserving the ranking property that matters: documents made of
  frequent reference n-grams score high, rare/foreign/garbled text scores
  low and carries a high OOV rate.

Scale shape at 10^12 documents: the exploded gram stream is map-side; the
reference count table is vocabulary-sized (pruning at ``min_count`` keeps it
the Zipf head) and joins the gram stream on the gram key — broadcast when it
fits, shuffle-hash otherwise, with AQE handling the stop-gram skew; the
per-doc rollup is one map-side-combinable aggregate on doc id. Nothing
collects to the driver and nothing is all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.functions.textfns import word_shingles


def doc_bigrams(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """(id, bigram) — one row per word n-gram, duplicates kept (scoring
    weights repeated grams like a real LM does)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("bigram"),
    )


def reference_bigram_counts(
    ref: DataFrame, id_col: str, text_col: str, min_count: int = 2, n: int = 2
) -> DataFrame:
    """(bigram, c) — the "language model": gram counts over the reference
    slice, pruned below ``min_count`` (rare grams carry no signal and bloat
    the table; this is KenLM's pruning knob)."""
    return (
        doc_bigrams(ref, id_col, text_col, n)
        .groupBy("bigram")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
    )


def lm_score(
    docs: DataFrame,
    counts: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    keep_bits_num: int = 3,
    keep_bits_den: int = 1,
    max_oov_pct: int = 10,
) -> DataFrame:
    """Per-document LM quality report over the reference ``counts``:

    - ``n_bigrams``: grams in the doc (≥1 even for one-word docs);
    - ``n_oov``: grams absent from the pruned reference table;
    - ``bits_total``: Σ bit-length of the reference count of each known
      gram — the integer log-probability surrogate (monotone in Π c_i);
    - ``bits_per_gram``: bits_total / n_bigrams, one exact int division
      per row (deterministic double);
    - ``lm_keep``: the head-bucket gate, evaluated ALL-INTEGER:
      ``bits_total * keep_bits_den ≥ n_bigrams * keep_bits_num`` (mean
      bits/gram ≥ num/den) and ``n_oov * 100 ≤ n_bigrams * max_oov_pct``.
    """
    g = doc_bigrams(docs, id_col, text_col, n)
    scored = (
        g.join(counts, "bigram", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count(F.when(F.col("c").isNull(), 1)).alias("n_oov"),
            F.coalesce(
                F.sum(F.when(F.col("c").isNotNull(), F.length(F.bin("c")))), F.lit(0)
            )
            .cast("long")
            .alias("bits_total"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "n_oov",
        "bits_total",
        (F.col("bits_total").cast("double") / F.col("n_bigrams")).alias("bits_per_gram"),
        (
            (F.col("bits_total") * keep_bits_den >= F.col("n_bigrams") * keep_bits_num)
            & (F.col("n_oov") * 100 <= F.col("n_bigrams") * max_oov_pct)
        ).alias("lm_keep"),
    )


def lm_score_map_side(
    docs: DataFrame,
    counts: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    keep_bits_num: int = 3,
    keep_bits_den: int = 1,
    max_oov_pct: int = 10,
    max_vocab_rows: int = 2_000_000,
) -> DataFrame:
    """Map-side twin of :func:`lm_score`: the pruned count table is
    COLLECTED and BROADCAST to the workers, and each document is scored in
    one Arrow-batched pass — no bigram explode, no count-table shuffle, no
    per-doc regroup. This is the CCNet deployment shape (the model ships
    to the workers; the corpus never reshuffles) and the right plan
    whenever the pruned vocabulary fits an executor (the Zipf head after
    ``min_count`` pruning; at 10^12-doc scale keep the relational twin for
    unprunable tail vocabularies).

    Output and semantics are IDENTICAL to :func:`lm_score` — the Python
    tokenizer mirrors ``word_shingles`` exactly (Java-\\s whitespace class,
    single-space split, <n-word docs yield one shingle) and the pytest
    differential pins the two plans row-for-row.

    The driver-side collect is GUARDED, not trusted: a bounded
    ``limit(max_vocab_rows + 1)`` probe (never a full count over an
    unpruned table) checks the vocabulary actually fits before
    collecting; above the bound the call transparently falls back to the
    relational :func:`lm_score` twin, whose output is row-identical."""
    import re as _re

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )
    from pyspark.sql.functions import pandas_udf

    spark = docs.sparkSession
    # vocabulary-sized collect (the pruned Zipf head) — but verify the
    # caller's min_count actually pruned before trusting it: probe with a
    # bounded limit (reads at most max_vocab_rows+1 rows, never the full
    # table) and fall back to the shuffle-side twin if the bound is blown
    probe = counts.limit(max_vocab_rows + 1).collect()
    if len(probe) > max_vocab_rows:
        return lm_score(
            docs,
            counts,
            id_col,
            text_col,
            n=n,
            keep_bits_num=keep_bits_num,
            keep_bits_den=keep_bits_den,
            max_oov_pct=max_oov_pct,
        )
    table = {r["bigram"]: int(r["c"]) for r in probe}
    bc = spark.sparkContext.broadcast(table)
    # Java \s (ASCII whitespace), NOT Python's unicode-aware \s — the
    # normalizer must match functions/textfns.normalized_text exactly
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    out_type = StructType(
        [
            StructField("n_bigrams", LongType()),
            StructField("n_oov", LongType()),
            StructField("bits_total", LongType()),
        ]
    )

    def _score(texts):
        t = bc.value
        rows = []
        for txt in texts:
            norm = ws.sub(" ", (txt or "").lower()).strip(" ")
            words = norm.split(" ")
            n_gr = max(len(words) - (n - 1), 1)
            n_oov = 0
            bits = 0
            for i in range(n_gr):
                g = " ".join(words[i : i + n])
                c = t.get(g)
                if c is None:
                    n_oov += 1
                else:
                    bits += c.bit_length()
            rows.append((n_gr, n_oov, bits))
        return pd.DataFrame(rows, columns=["n_bigrams", "n_oov", "bits_total"])

    # real annotation objects (not PEP-563 strings — `from __future__
    # import annotations` is module-wide and breaks pandas_udf's
    # Series→DataFrame type-hint inference)
    _score.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    score = pandas_udf(out_type)(_score)

    # NULL text scores like '' (one OOV shingle, lm_keep False) in BOTH
    # twins — the relational lm_score coalesces the shingle array, so a
    # NULL doc is present with (1, 1, 0); parity is pinned on exactly
    # this case (doc 105) in tests/test_lmscore.py
    scored = docs.select(
        F.col(id_col).alias("id"), score(F.col(text_col)).alias("_s")
    ).select("id", "_s.n_bigrams", "_s.n_oov", "_s.bits_total")
    return scored.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "n_oov",
        "bits_total",
        (F.col("bits_total").cast("double") / F.col("n_bigrams")).alias("bits_per_gram"),
        (
            (F.col("bits_total") * keep_bits_den >= F.col("n_bigrams") * keep_bits_num)
            & (F.col("n_oov") * 100 <= F.col("n_bigrams") * max_oov_pct)
        ).alias("lm_keep"),
    )
