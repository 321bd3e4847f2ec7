"""Distributed BPE vocabulary induction — training the tokenizer ON the
corpus (Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units"): the step a dataset build runs between curation and token
counting, so the token budget is measured in the vocabulary the model will
actually train with.

Classic BPE trains on the word-frequency table, not the raw text — the
corpus collapses to (word, n) once (one hash aggregate over the token
stream; vocabulary-sized forever after), and every merge round runs over
that small table:

1. count adjacent symbol pairs, weighted by word frequency;
2. pick the most frequent pair (ties → lexicographically smallest — a
   total order, so training is deterministic);
3. merge every greedy LEFT-TO-RIGHT non-overlapping occurrence.

Step 3 is the subtle one: greedy left-to-right merging equals "keep the
match positions of even offset within each run of consecutive matches"
(a merge at i consumes i+1, so within a run the kept positions alternate
from the run start; positions are computed on the PRE-merge array). The
Spark side implements that as a row-local fold over the match positions
(``F.aggregate`` — keep i unless it is adjacent to the last kept); the
DuckDB oracle replays the identical semantics relationally
(gaps-and-islands over match positions inside a recursive CTE) — the two
formulations are equivalent by the run-parity argument above, and the
catalog query hash-checks the full merge table they learn.

Every quantity is an exact integer or a string, so training replays
bit-for-bit in any engine from the staged word counts. Scale shape: the
corpus is touched once (the word count aggregate); each round is one
explode + hash aggregate + a driver-side 1-row argmax over the
vocabulary-sized symbol table, re-materialized per round (localCheckpoint)
to keep lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.functions.textfns import normalized_text


def word_counts(
    docs: DataFrame,
    text_col: str,
    min_count: int = 2,
    ascii_only: bool = True,
) -> DataFrame:
    """(word, n) — the BPE training table. ``ascii_only`` keeps words in
    the printable-ASCII range: Java regex works on UTF-16 code units while
    DuckDB's RE2 works on codepoints, so per-character splits diverge on
    astral-plane text; ASCII is where the two engines provably agree (and
    where this synthetic corpus lives)."""
    w = docs.select(
        F.explode(F.split(normalized_text(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    if ascii_only:
        w = w.where(F.col("word").rlike(r"^[\x21-\x7e]+$"))
    return (
        w.groupBy("word").agg(F.count("*").alias("n")).where(F.col("n") >= min_count)
    )


def init_symbols(words: DataFrame) -> DataFrame:
    """(sym, n): the word spelled as space-separated characters. The
    symbol string uniquely identifies its word throughout training
    (removing spaces always recovers the word), so ``sym`` stays a valid
    grouping key across rounds."""
    return words.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("sym"), "n"
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent-symbol pair frequencies, word-count weighted,
    overlaps counted (classic BPE statistics)."""
    arr = F.split("sym", " ")
    pairs = syms.select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - 2),
                lambda i: F.concat(
                    F.element_at(arr, i + 1), F.lit(" "), F.element_at(arr, i + 2)
                ),
            )
        ).alias("pair"),
    ).where(F.size(arr) >= 2)
    return pairs.groupBy("pair").agg(F.sum("n").alias("cnt"))


def _apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) in every symbol string:
    match positions on the pre-merge array, fold keeping each position not
    adjacent to the previously kept one (run-parity), rebuild."""
    arr = F.split("sym", " ")
    lft, rgt = F.lit(left), F.lit(right)
    p = F.filter(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda i: (F.element_at(arr, i + 1) == lft)
        & (F.element_at(arr, i + 2) == rgt),
    )
    kept = F.aggregate(
        p,
        F.array().cast("array<int>"),
        lambda acc, i: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == i - 1), acc
        ).otherwise(F.concat(acc, F.array(i.cast("int")))),
    )
    out = F.array_join(
        F.transform(
            F.filter(
                F.sequence(F.lit(0), F.size(arr) - 1),
                lambda j: ~F.array_contains(kept, (j - 1).cast("int")),
            ),
            lambda j: F.when(
                F.array_contains(kept, j.cast("int")),
                F.concat(F.element_at(arr, j + 1), F.element_at(arr, j + 2)),
            ).otherwise(F.element_at(arr, j + 1)),
        ),
        " ",
    )
    short = F.size(arr) < 2
    return syms.select(F.when(short, F.col("sym")).otherwise(out).alias("sym"), "n")


def select_merge_batch(
    ranked: list[tuple[str, int]], batch: int
) -> list[tuple[str, int]]:
    """Greedy batch selection over pairs already in (cnt desc, pair) rank
    order: walk the ranking, keep a pair ``l r`` iff none of
    ``{l, r, l+r}`` was touched by an earlier kept pair's own trio, stop
    at ``batch`` kept.

    The trio rule makes the batch ORDER-FREE to apply: for two kept pairs
    (a,b) and (c,d), merging ``a b`` → ``ab`` can destroy a ``c d``
    occurrence only by overlapping it (needs b=c or d=a — excluded by
    symbol disjointness) and can create one only if the new symbol ``ab``
    equals c or d (excluded because l+r is in the trio). So every kept
    pair sees the same occurrence set before and after its batch-mates,
    and one fused pass applies them all.
    """
    sel: list[tuple[str, int]] = []
    touched: set[str] = set()
    for pair, cnt in ranked:
        if len(sel) >= batch:
            break
        left, right = pair.split(" ", 1)
        trio = {left, right, left + right}
        if touched & trio:
            continue
        sel.append((pair, int(cnt)))
        touched |= trio
    return sel


def _apply_merge_batch(syms: DataFrame, pairs: list[str]) -> DataFrame:
    """One fused greedy left-to-right pass applying a whole disjoint batch
    (each ``pairs`` entry is ``"left right"``). Because batch-mates share
    no symbols, match positions of DIFFERENT pairs are never adjacent
    (adjacency at i, i+1 would force arr[i+1] into both pairs), so every
    run of consecutive match positions belongs to a single pair and the
    same run-parity fold as the single-pair merge applies verbatim."""
    arr = F.split("sym", " ")
    batch = F.array(*[F.lit(p) for p in pairs])
    p = F.filter(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda i: F.array_contains(
            batch,
            F.concat(F.element_at(arr, i + 1), F.lit(" "), F.element_at(arr, i + 2)),
        ),
    )
    kept = F.aggregate(
        p,
        F.array().cast("array<int>"),
        lambda acc, i: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == i - 1), acc
        ).otherwise(F.concat(acc, F.array(i.cast("int")))),
    )
    out = F.array_join(
        F.transform(
            F.filter(
                F.sequence(F.lit(0), F.size(arr) - 1),
                lambda j: ~F.array_contains(kept, (j - 1).cast("int")),
            ),
            lambda j: F.when(
                F.array_contains(kept, j.cast("int")),
                F.concat(F.element_at(arr, j + 1), F.element_at(arr, j + 2)),
            ).otherwise(F.element_at(arr, j + 1)),
        ),
        " ",
    )
    short = F.size(arr) < 2
    return syms.select(F.when(short, F.col("sym")).otherwise(out).alias("sym"), "n")


def _fold_pair_deltas(
    pc: DataFrame, changed: DataFrame, new_changed: DataFrame
) -> DataFrame:
    """Fold the (new − old) adjacent-pair deltas of the merge-hit rows into
    the maintained (pair, cnt) table: full-outer join, drop counts ≤ 0. The
    delta is the exact multiset difference, so the folded table equals a
    full recount (see train_bpe_merges_delta's induction argument)."""
    delta = (
        _pair_counts(changed)
        .select("pair", (-F.col("cnt")).alias("d"))
        .unionByName(_pair_counts(new_changed).select("pair", F.col("cnt").alias("d")))
        .groupBy("pair")
        .agg(F.sum("d").alias("d"))
    )
    return (
        pc.join(delta, "pair", "full_outer")
        .select(
            "pair",
            (F.coalesce("cnt", F.lit(0)) + F.coalesce("d", F.lit(0))).alias("cnt"),
        )
        .where(F.col("cnt") > 0)
    )


def train_bpe_merges_batched(
    words: DataFrame,
    n_rounds: int = 3,
    batch: int = 4,
    topk: int = 64,
    delta: bool = False,
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Batched BPE: per round, count pairs ONCE, keep the top ``batch``
    pairwise-non-interacting pairs from the (cnt desc, pair)-ranked top
    ``topk``, and apply them in one fused merge pass.

    This is the production shape for large vocabularies (SentencePiece
    and fastBPE batch the same way): a 50k-merge vocab costs 50k/batch
    cluster rounds instead of 50k. It is deliberately NOT bit-equivalent
    to sequential BPE — after the rank-1 merge, sequential recounts and
    may prefer a pair the batch has already committed past — but it IS
    fully deterministic (rank order + the trio rule), so the whole
    training replays exactly in any engine; the catalog oracle retrains
    it in DuckDB (list_reduce replays the greedy selection, the same
    gaps-and-islands CTE replays the fused merge).

    ``topk`` bounds the per-round driver collect; the oracle ranks with
    the same cutoff, so both engines select from the identical candidate
    window.

    ``delta=True`` switches the per-round pair statistics to the
    incremental-count update (see :func:`train_bpe_merges_delta`): the
    top-``topk`` ranking reads a maintained (pair, cnt) table, only the
    rows containing a selected pair are re-merged, and their (new − old)
    deltas fold back into the table. Batch disjointness makes the delta
    exact for the whole batch at once (batch-mates' occurrences never
    interact — the same argument that makes the fused merge pass valid),
    so the merge output is bit-identical either way; the catalog oracle
    covers both. This is the full production combination: batched rounds
    bound the number of cluster jobs, delta counts bound the work per job.
    """
    syms = init_symbols(words).localCheckpoint(eager=True)
    pc = _pair_counts(syms).localCheckpoint(eager=True) if delta else None
    merges: list[tuple[int, str, int]] = []
    for _ in range(n_rounds):
        stats = pc if delta else _pair_counts(syms)
        ranked = stats.orderBy(F.desc("cnt"), "pair").limit(topk).collect()
        sel = select_merge_batch([(r["pair"], int(r["cnt"])) for r in ranked], batch)
        if not sel:
            break
        for pair, cnt in sel:
            merges.append((len(merges), pair, cnt))
        pairs = [p for p, _ in sel]
        if delta:
            hit = None
            padded = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
            for p in pairs:
                h = padded.contains(f" {p} ")
                hit = h if hit is None else (hit | h)
            changed = syms.where(hit)
            unchanged = syms.where(~hit)
            new_changed = _apply_merge_batch(changed, pairs)
            pc = _fold_pair_deltas(pc, changed, new_changed).localCheckpoint(
                eager=True
            )
            syms = unchanged.unionByName(new_changed).localCheckpoint(eager=True)
        else:
            syms = _apply_merge_batch(syms, pairs).localCheckpoint(eager=True)
    return merges, syms


def train_bpe_merges_delta(
    words: DataFrame, n_merges: int = 8
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Sequential BPE with INCREMENTAL pair counts — bit-identical merges to
    ``train_bpe_merges``, but the per-round full recount (explode every word,
    hash-aggregate the whole stream) is replaced by a delta update: only the
    words that actually CONTAIN the merged pair can change their adjacent-pair
    multiset, so the round

    1. argmaxes over the maintained (pair, cnt) table — never re-touching the
       word table at all;
    2. splits the symbol table on a literal substring test (`` l r `` inside
       the space-joined symbol string ⇔ the pair occurs adjacently — symbols
       never contain spaces);
    3. merges ONLY the hit rows and emits their old pairs at −n and new pairs
       at +n;
    4. folds the deltas into the count table (full-outer join, drop ≤0).

    Correctness by induction: the corpus pair multiset is the n-weighted sum
    over words; a merge changes only hit words; the delta is exactly
    (new − old) on those words, so the maintained table equals the full
    recount after every round, hence the same (cnt desc, pair) argmax and the
    same merge sequence — which is why the catalog entry reuses the
    sequential retrain oracle verbatim. This is the fastBPE/SentencePiece
    count-update optimization in distributed form: per-round work is
    O(|hit words| + |pair table|) instead of O(|vocabulary| · word length),
    and late rounds (rare pairs, few hit words) become nearly free. Pinned
    equal to the recount trainer in tests/test_bpe.py."""
    syms = init_symbols(words).localCheckpoint(eager=True)
    pc = _pair_counts(syms).localCheckpoint(eager=True)
    merges: list[tuple[int, str, int]] = []
    for k in range(n_merges):
        best = pc.orderBy(F.desc("cnt"), "pair").limit(1).collect()
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ", 1)
        merges.append((k, pair, cnt))
        hit = F.concat(F.lit(" "), F.col("sym"), F.lit(" ")).contains(
            f" {left} {right} "
        )
        changed = syms.where(hit)
        unchanged = syms.where(~hit)
        new_changed = _apply_merge(changed, left, right)
        pc = _fold_pair_deltas(pc, changed, new_changed).localCheckpoint(eager=True)
        syms = unchanged.unionByName(new_changed).localCheckpoint(eager=True)
    return merges, syms


def train_bpe_merges(
    words: DataFrame, n_merges: int = 8
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, n) table.

    Returns ``(merges, final_symbols)`` where merges is
    ``[(rank, "left right", weight), ...]`` in training order (rank from
    0; stops early if no pair remains) and final_symbols is the trained
    (sym, n) segmentation. Each round: one pair-count aggregate, a 1-row
    driver argmax, one column-expression merge pass, re-materialized."""
    syms = init_symbols(words).localCheckpoint(eager=True)
    merges: list[tuple[int, str, int]] = []
    for k in range(n_merges):
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ", 1)
        merges.append((k, pair, cnt))
        syms = _apply_merge(syms, left, right).localCheckpoint(eager=True)
    return merges, syms


def encode_with_segmentation(
    docs: DataFrame, seg: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, ids) — ENCODE every document as its trained-BPE
    token-id sequence, completing the tokenizer story (train → price →
    encode): ``seg`` is the trained word→segmentation table
    ``(word, toks array<string>)`` derived from the final symbol state of
    :func:`train_bpe_merges`; out-of-vocabulary words (pruned below
    ``min_count`` at train time) expand to their characters — the same
    worst-case-BPE fallback as token pricing. Token ids are dense ranks
    over the corpus's own emitted-token vocabulary ordered by token string
    (a total order both engines agree on for the corpus's ascii-lowercase
    tokens), and ``ids`` is the space-joined id sequence in document
    order — scalar columns, so the catalog oracle hash-compares the full
    encoding. Documents whose normalized text is empty emit no row.

    Scale shape: the word stream joins the BROADCAST segmentation; the
    vocabulary rank is a single-partition window over the DISTINCT token
    table (vocabulary-sized — the documented bound, never the corpus);
    the per-document regroup is the only corpus-wide shuffle, and the
    in-document order is restored by a row-local array_sort, not a
    window."""
    from pyspark.sql import Window

    w = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(normalized_text(text_col), " "), lambda x: x != F.lit("")
            )
        ).alias("wpos", "word"),
    )
    exp = w.join(F.broadcast(seg), "word", "left").select(
        "id",
        "wpos",
        F.coalesce(
            "toks",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ),
        ).alias("toks"),
    )
    tok = exp.select("id", "wpos", F.posexplode("toks").alias("tpos", "token"))
    vocab = (
        tok.select("token")
        .distinct()
        .select(
            "token",
            F.row_number().over(Window.orderBy("token")).cast("int").alias("tok_id"),
        )
    )
    return (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "tpos", "tok_id"))),
                    lambda x: x["tok_id"].cast("string"),
                ),
            ).alias("ids"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "ids")
    )
