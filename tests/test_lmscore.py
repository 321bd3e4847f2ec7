"""CCNet-style LM quality gate (operators/lmscore.py): integer bit-length
scoring semantics on a handcrafted corpus."""

from ocr_platform_spark.operators.lmscore import (
    doc_bigrams,
    lm_score,
    reference_bigram_counts,
)


def test_reference_counts_pruned(spark):
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog ran")],
        "doc_id long, text string",
    )
    counts = {
        r["bigram"]: r["c"]
        for r in reference_bigram_counts(ref, "doc_id", "text", min_count=2).collect()
    }
    # "the cat" appears in docs 1 and 2; every other bigram once -> pruned
    assert counts == {"the cat": 2}


def test_lm_score_bits_and_keep(spark):
    ref = spark.createDataFrame(
        # "the cat" x4 (bits=3), "cat sat" x2 (bits=2)
        [(i, "the cat sat") for i in range(2)] + [(i + 2, "the cat") for i in range(2)],
        "doc_id long, text string",
    )
    counts = reference_bigram_counts(ref, "doc_id", "text", min_count=2)
    docs = spark.createDataFrame(
        [
            (100, "the cat sat"),      # grams: the cat(4->3b), cat sat(2->2b)
            (101, "zx qy"),            # one OOV gram
            (102, "the cat the cat"),  # the cat x2, cat the (oov)
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in lm_score(
            docs, counts, "doc_id", "text", keep_bits_num=2, max_oov_pct=40
        ).collect()
    }
    r0 = got[100]
    assert (r0["n_bigrams"], r0["n_oov"], r0["bits_total"]) == (2, 0, 5)
    assert r0["bits_per_gram"] == 2.5 and r0["lm_keep"]
    r1 = got[101]
    assert (r1["n_bigrams"], r1["n_oov"], r1["bits_total"]) == (1, 1, 0)
    assert not r1["lm_keep"]  # all-OOV fails both gates
    r2 = got[102]
    # grams: "the cat","cat the","the cat" -> 2 known (3 bits each), 1 oov
    assert (r2["n_bigrams"], r2["n_oov"], r2["bits_total"]) == (3, 1, 6)
    assert r2["lm_keep"]  # 6 >= 3*2 and 1*100 <= 3*40


def test_single_word_doc_yields_one_gram(spark):
    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    rows = doc_bigrams(docs, "doc_id", "text").collect()
    assert [(r["id"], r["bigram"]) for r in rows] == [(1, "hello")]


def test_map_side_scorer_matches_relational(spark):
    """lm_score_map_side (broadcast vocabulary, Arrow-batched, zero
    shuffles) must reproduce lm_score row-for-row — including whitespace
    normalization, short docs, empty/null text, and OOV accounting."""
    from ocr_platform_spark.operators.lmscore import lm_score_map_side

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (i % 3 + 1)) for i in range(6)]
        + [(10, "dogs bark loudly at night"), (11, "dogs bark loudly at night")],
        "doc_id long, text string",
    )
    counts = reference_bigram_counts(ref, "doc_id", "text", min_count=2)
    docs = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),
            (101, "dogs  bark\tloudly\nat night"),   # messy whitespace
            (102, "completely out of vocabulary text"),
            (103, "single"),
            (104, ""),
            (105, None),
            (106, "THE CAT SAT"),                     # case folding
        ],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, lm_score(docs, counts, "doc_id", "text").collect()))
    b = sorted(map(tuple, lm_score_map_side(docs, counts, "doc_id", "text").collect()))
    assert a == b


def test_map_side_scorer_vocab_guard_falls_back(spark):
    """When the pruned vocabulary exceeds max_vocab_rows, lm_score_map_side
    must NOT collect it — it falls back to the relational twin and still
    returns row-identical results (and no BatchEvalPython/broadcast dict
    path is taken, which we can't observe directly, so we pin the output
    and the fact that the guard path produces the relational plan shape:
    a join on the bigram key appears in the explained plan)."""
    from ocr_platform_spark.operators.lmscore import lm_score, lm_score_map_side

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (i % 3 + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    from ocr_platform_spark.operators.lmscore import reference_bigram_counts

    counts = reference_bigram_counts(ref, "doc_id", "text", min_count=2)
    docs = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "out of vocab")],
        "doc_id long, text string",
    )
    guarded = lm_score_map_side(docs, counts, "doc_id", "text", max_vocab_rows=1)
    # fallback plan is the relational twin: the count table joins on the
    # gram key instead of being collected into a Python dict
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "bigram" in plan
    a = sorted(map(tuple, lm_score(docs, counts, "doc_id", "text").collect()))
    b = sorted(map(tuple, guarded.collect()))
    assert a == b
