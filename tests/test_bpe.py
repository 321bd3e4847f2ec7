"""BPE vocabulary induction (operators/bpe.py): differential against a
pure-python classic-BPE reference (merge order, tie-breaks, greedy
left-to-right application, overlapping runs), plus edge cases."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from ocr_platform_spark.operators.bpe import (
    init_symbols,
    select_merge_batch,
    train_bpe_merges,
    train_bpe_merges_batched,
    word_counts,
)


def _py_bpe(words: dict[str, int], k: int):
    """Classic BPE reference: pair counts over the word-frequency table,
    argmax with lexicographic tie-break, greedy left-to-right merge."""
    syms = {tuple(w): n for w, n in words.items()}
    merges = []
    for rank in range(k):
        counts: dict[tuple[str, str], int] = {}
        for s, n in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, f"{l} {r}", cnt))
        new: dict[tuple[str, ...], int] = {}
        for s, n in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        syms = new
    return merges, syms


def _check(spark, words: dict[str, int], k: int):
    ref_merges, ref_syms = _py_bpe(words, k)
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    got_merges, got_syms = train_bpe_merges(wdf, k)
    assert got_merges == ref_merges
    gm: Counter = Counter()
    for r in got_syms.collect():
        gm[tuple(r["sym"].split(" "))] += r["n"]
    rm: Counter = Counter()
    for s, n in ref_syms.items():
        rm[s] += n
    assert gm == rm


def test_matches_reference_including_ties_and_overlaps(spark):
    _check(
        spark,
        {"banana": 5, "bandana": 3, "ananas": 2, "aaaa": 4, "abab": 6, "x": 1},
        8,
    )


def test_single_char_words_survive_and_early_stop(spark):
    # only single-char words -> zero pairs -> training stops with no merges
    wdf = spark.createDataFrame([("a", 3), ("b", 2)], "word string, n long")
    merges, syms = train_bpe_merges(wdf, 4)
    assert merges == []
    assert {r["sym"] for r in syms.collect()} == {"a", "b"}


def test_partitioning_invariance(spark):
    words = {"hello": 7, "help": 5, "hull": 3, "loop": 2, "pool": 2}
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    a, _ = train_bpe_merges(wdf, 6)
    b, _ = train_bpe_merges(wdf.repartition(13), 6)
    assert a == b and len(a) == 6


def test_word_counts_normalizes_and_prunes(spark):
    docs = spark.createDataFrame(
        [(1, "Foo  foo BAR"), (2, "foo éclair")], "doc_id long, text string"
    )
    got = {r["word"]: r["n"] for r in word_counts(docs, "text", min_count=2).collect()}
    assert got == {"foo": 3}  # lowercased, collapsed, pruned, ascii-only
    syms = {r["sym"] for r in init_symbols(
        word_counts(docs, "text", min_count=2)
    ).collect()}
    assert syms == {"f o o"}


def test_learned_token_counts_vs_reference(spark):
    """Token pricing under the trained vocabulary matches the python
    reference segmentation end-to-end (known words priced at trained
    token count; OOV at char count)."""
    docs = spark.createDataFrame(
        [(1, "banana banana abab x"), (2, "bandana zz")], "doc_id long, text string"
    )
    words = {"banana": 2, "abab": 1, "x": 1, "bandana": 1, "zz": 1}
    ref_merges, ref_syms = _py_bpe(words, 4)
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    _m, syms = train_bpe_merges(wdf, 4)
    seg = {r["sym"].replace(" ", ""): len(r["sym"].split(" ")) for r in syms.collect()}
    ref_seg = {"".join(s): len(s) for s in ref_syms}
    assert seg == ref_seg
    # doc 1: banana*2 + abab + x; doc 2: bandana + zz — all in-vocab here
    n1 = 2 * seg["banana"] + seg["abab"] + seg["x"]
    n2 = seg["bandana"] + seg["zz"]
    import pyspark.sql.functions as F
    w = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
    wdf2 = spark.createDataFrame([(k, v) for k, v in seg.items()], "word string, n_tok int")
    got = {
        r["doc_id"]: r["n"]
        for r in w.join(wdf2, "word", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("n_tok", F.length("word"))).alias("n"))
        .collect()
    }
    assert got == {1: n1, 2: n2}


def _py_bpe_batched(words: dict[str, int], n_rounds: int, batch: int, topk: int):
    """Pure-python reference for the batched trainer: per round rank pairs
    by (cnt desc, 'l r' string), keep the greedy trio-disjoint top-``batch``
    within the top-``topk`` window, apply all kept pairs in one greedy
    left-to-right pass."""
    syms = {tuple(w): n for w, n in words.items()}
    merges = []
    for _ in range(n_rounds):
        counts: Counter = Counter()
        for s, n in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += n
        ranked = sorted(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )[:topk]
        sel = select_merge_batch(
            [(f"{l} {r}", c) for (l, r), c in ranked], batch
        )
        if not sel:
            break
        pairset = {tuple(p.split(" ", 1)) for p, _ in sel}
        for p, c in sel:
            merges.append((len(merges), p, c))
        new: dict[tuple[str, ...], int] = {}
        for s, n in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) in pairset:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        syms = new
    return merges, syms


def _check_batched(spark, words: dict[str, int], n_rounds: int, batch: int, topk=64):
    ref_merges, ref_syms = _py_bpe_batched(words, n_rounds, batch, topk)
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    got_merges, got_syms = train_bpe_merges_batched(wdf, n_rounds, batch, topk)
    assert got_merges == ref_merges
    gm: Counter = Counter()
    for r in got_syms.collect():
        gm[tuple(r["sym"].split(" "))] += r["n"]
    rm: Counter = Counter()
    for s, n in ref_syms.items():
        rm[s] += n
    assert gm == rm


def test_batched_matches_reference_on_adversarial_overlaps(spark):
    _check_batched(
        spark,
        {"banana": 5, "bandana": 3, "ananas": 2, "aaaa": 4, "abab": 6, "x": 1},
        3,
        4,
    )


def test_batched_with_batch_one_equals_sequential(spark):
    """batch=1 degenerates to classic sequential BPE: every round recounts
    and applies exactly the rank-1 pair."""
    words = {"hello": 7, "help": 5, "hull": 3, "loop": 2, "pool": 2}
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    seq, _ = train_bpe_merges(wdf, 6)
    bat, _ = train_bpe_merges_batched(wdf, n_rounds=6, batch=1, topk=64)
    assert bat == seq


def test_delta_trainer_equals_recount_trainer(spark):
    """The incremental-count trainer must be bit-identical to the full
    recount: same merges (including tie-breaks and weights) and the same
    final segmentation, on a vocabulary with overlapping runs ('aaaa',
    'abab'), pairs whose counts drop to zero mid-training, and ties."""
    words = {"banana": 5, "bandana": 3, "ananas": 2, "aaaa": 4, "abab": 6, "x": 1}
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    from ocr_platform_spark.operators.bpe import train_bpe_merges_delta

    seq, seq_syms = train_bpe_merges(wdf, 8)
    dlt, dlt_syms = train_bpe_merges_delta(wdf, 8)
    assert dlt == seq and len(seq) == 8
    a = Counter((r["sym"], r["n"]) for r in seq_syms.collect())
    b = Counter((r["sym"], r["n"]) for r in dlt_syms.collect())
    assert a == b


def test_delta_trainer_early_stop_and_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    from ocr_platform_spark.operators.bpe import train_bpe_merges_delta

    # early stop: single-char words -> no pairs -> no merges
    wdf = spark.createDataFrame([("a", 3), ("b", 2)], "word string, n long")
    merges, syms = train_bpe_merges_delta(wdf, 4)
    assert merges == [] and {r["sym"] for r in syms.collect()} == {"a", "b"}

    word = st.text(alphabet="abc", min_size=1, max_size=8)
    words_strategy = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=10)
    collected: list[dict] = []

    @given(words_strategy)
    @settings(max_examples=6, deadline=None)
    def gather(words):
        collected.append(words)

    gather()
    for words in collected:
        ref_merges, _ = _py_bpe(dict(words), 5)
        wdf = spark.createDataFrame(list(words.items()), "word string, n long")
        got, _ = train_bpe_merges_delta(wdf, 5)
        assert got == ref_merges


def test_batched_delta_equals_batched_recount(spark):
    """delta=True (incremental pair counts) must reproduce the recount
    batched trainer bit-for-bit: batch disjointness keeps the per-batch
    delta exact, so merges and final segmentations agree."""
    words = {"banana": 5, "bandana": 3, "ananas": 2, "aaaa": 4, "abab": 6, "x": 1}
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    rec, rec_syms = train_bpe_merges_batched(wdf, n_rounds=3, batch=4, topk=64)
    dlt, dlt_syms = train_bpe_merges_batched(
        wdf, n_rounds=3, batch=4, topk=64, delta=True
    )
    assert dlt == rec and len(rec) >= 3
    a = Counter((r["sym"], r["n"]) for r in rec_syms.collect())
    b = Counter((r["sym"], r["n"]) for r in dlt_syms.collect())
    assert a == b


def test_batched_trio_rule_skips_interacting_pairs():
    # 'h e' shares a symbol with 'e l'; 'lo' (cat of 'l o') collides with
    # a later literal pair ('lo', 'w') — both must be skipped in-batch.
    ranked = [("h e", 9), ("e l", 8), ("l o", 7), ("lo w", 6), ("x y", 5)]
    assert select_merge_batch(ranked, 4) == [("h e", 9), ("l o", 7), ("x y", 5)]


def test_batched_partitioning_invariance(spark):
    words = {"banana": 5, "bandana": 3, "ananas": 2, "abab": 6}
    wdf = spark.createDataFrame(list(words.items()), "word string, n long")
    a, _ = train_bpe_merges_batched(wdf, 3, 3)
    b, _ = train_bpe_merges_batched(wdf.repartition(13), 3, 3)
    assert a == b and len(a) >= 3


def test_hypothesis_batched_vocabularies_match_reference(spark):
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=8)
    words_strategy = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=10)

    collected: list[dict] = []

    @given(words_strategy)
    @settings(max_examples=8, deadline=None)
    def gather(words):
        collected.append(words)

    gather()
    for words in collected:
        _check_batched(spark, dict(words), 3, 3)


def test_hypothesis_random_vocabularies_match_reference(spark):
    """Property fuzz: on random word multisets (heavy repeats, runs like
    'aaaa', near-anagrams) the distributed trainer's merge list and final
    segmentations equal the classic reference — the run-parity fold must
    hold on every adversarial overlap pattern."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=8)
    words_strategy = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=10)

    collected: list[dict] = []

    @given(words_strategy)
    @settings(max_examples=12, deadline=None)
    def gather(words):
        collected.append(words)

    gather()
    # one Spark round-trip per example is too slow; batch-check the gathered
    # examples (each still a full train + segmentation comparison)
    for words in collected:
        _check(spark, dict(words), 5)


def test_encode_with_segmentation_roundtrip(spark):
    """Encoding consistency: concatenating the tokens behind each doc's id
    sequence reproduces the normalized text (spaces dropped), n_tokens
    matches the priced count, and an OOV word falls back to characters."""
    import pyspark.sql.functions as F

    from ocr_platform_spark.operators.bpe import (
        encode_with_segmentation,
        train_bpe_merges,
        word_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low lower lowest"),
            (2, "low lowest zz"),     # zz is pruned (min_count=2) -> chars
            (3, "   "),               # empty after normalize -> no row
        ],
        "doc_id long, text string",
    )
    words = word_counts(docs, "text", min_count=2)
    _m, syms = train_bpe_merges(words, n_merges=6)
    seg = syms.select(
        F.regexp_replace("sym", " ", "").alias("word"),
        F.split("sym", " ").alias("toks"),
    ).cache()
    out = {r["doc_id"]: r for r in encode_with_segmentation(docs, seg, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    # rebuild the id -> token map exactly as the operator defines it
    seg_rows = {r["word"]: r["toks"] for r in seg.collect()}
    def expand(text):
        toks = []
        for w in text.lower().split():
            toks.extend(seg_rows.get(w, list(w)))
        return toks
    vocab = sorted({t for d in (1, 2) for t in expand({1: "low low lower lowest", 2: "low lowest zz"}[d])})
    ids = {t: i + 1 for i, t in enumerate(vocab)}
    for d, text in ((1, "low low lower lowest"), (2, "low lowest zz")):
        toks = expand(text)
        assert out[d]["n_tokens"] == len(toks)
        assert out[d]["ids"] == " ".join(str(ids[t]) for t in toks)
        assert "".join(toks) == text.lower().replace(" ", "")
    seg.unpersist()
