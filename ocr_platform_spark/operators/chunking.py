"""Paragraph-boundary chunking under a token budget — the segmentation
pass an embedding / retrieval / context-window pipeline runs between
extraction and encoding: long documents are re-cut into roughly
budget-sized pieces WITHOUT splitting mid-paragraph, each chunk carrying
its provenance (owning doc, first paragraph index, token total).

Reference scope note: the OCR reference has no chunker (its documents are
single-page extractions, `ocr_backend/app/services/document_service.py`);
this operator serves the engine's own web-corpus north star, where
multi-thousand-token pages must be cut for encoders with fixed windows.

Chunk-assignment semantics are CUMULATIVE-OFFSET BUCKETING, not greedy
fill: paragraph p joins the chunk numbered ``tokens_before_p div budget``.
One window cumsum per document decides every boundary — deterministic,
order-stable, and exactly replayable in plain SQL (the catalog oracle
does), unlike greedy fill whose boundaries need a sequential scan. An
oversized paragraph is never split; it joins whatever chunk its cumulative
offset falls in (possibly alongside preceding small paragraphs, so a chunk
can exceed the budget), and only the ids of the tail buckets it spans stay
unused — chunk ids within a doc are increasing but not necessarily
contiguous.

Scale shape: the paragraph explode is map-side; the cumsum window and the
chunk regroup both partition by document (doc-sized partitions, bounded);
the only corpus-wide shuffle is the final (doc, chunk) aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ocr_platform_spark.operators.dedup import paragraph_postings


def ws_token_count(col: str | Column) -> Column:
    """Whitespace token count of a string column — ``len(filter(split,
    nonempty))``, the same contract as DuckDB's
    ``len(list_filter(string_split_regex(s, '\\s+'), x -> x <> ''))``
    (leading/trailing whitespace yields empty fragments on both engines;
    the filter drops them on both)."""
    return F.size(F.filter(F.split(col, r"\s+", -1), lambda x: x != ""))


def chunk_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 64,
) -> DataFrame:
    """(id, chunk_id, text, n_paras, n_tokens, start_idx) — every document
    re-cut at paragraph boundaries into token-budgeted chunks.

    Paragraphs split on blank lines (``\\n{2,}``, empty fragments dropped —
    the :func:`~ocr_platform_spark.operators.dedup.paragraph_postings`
    contract shared with paragraph dedup); chunk text re-joins its
    paragraphs with one blank line in original order."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    paras = paragraph_postings(df, id_col, text_col).drop("h")
    toks = paras.withColumn("tok", ws_token_count(F.col("para")).cast("long"))
    w = (
        Window.partitionBy("id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # integer div on the integer cumsum — no float step to drift
    chunked = (
        toks.withColumn(
            "cum_before", F.coalesce(F.sum("tok").over(w), F.lit(0).cast("long"))
        )
        .withColumn(
            "chunk_id", F.expr(f"cum_before div {int(budget_tokens)}").cast("int")
        )
        .drop("cum_before")
    )
    return (
        chunked.groupBy("id", "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "para"))),
                    lambda s: s.para,
                ),
                "\n\n",
            ).alias("text"),
            F.count("*").alias("n_paras"),
            F.sum("tok").alias("n_tokens"),
            F.min("idx").alias("start_idx"),
        )
        .withColumnRenamed("id", id_col)
    )


def sliding_token_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_id, start_tok, end_tok, n_tokens, body) — OVERLAPPING
    fixed-size token windows (the RAG/embedding-model convention, vs
    :func:`chunk_paragraphs`' disjoint paragraph buckets): window ``i``
    covers whitespace tokens ``[i*stride, i*stride+size)`` with
    ``stride = size - overlap``, so each boundary sentence appears in two
    consecutive windows and no retrieval query can fall into a chunk gap.
    A doc of ``T`` tokens emits ``1`` window when ``T <= size`` else
    ``ceil((T-size)/stride) + 1`` — the last window is clamped to ``T``
    (a trailing partial is emitted, never dropped). Pure integer math so
    a SQL oracle replays every boundary exactly.

    Scale shape: entirely map-side — token split, window count, and the
    per-doc explode never shuffle; downstream consumers (embedding UDF,
    index build) inherit the input partitioning.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    words = F.filter(
        F.split(F.col(text_col), r"\s+", -1), lambda x: x != F.lit("")
    )
    base = df.select(
        F.col(id_col).alias("id"), words.alias("_words")
    ).withColumn("_t", F.size("_words"))
    n = F.when(F.col("_t") <= size, F.lit(1)).otherwise(
        F.expr(f"(_t - {size} + {stride - 1}) div {stride}") + 1
    )
    start = (F.col("chunk_id") * stride).cast("long")
    end = F.least(F.col("chunk_id").cast("long") * stride + size, F.col("_t").cast("long"))
    return (
        base.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n - 1)))
        .select(
            F.col("id").alias(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            start.alias("start_tok"),
            end.alias("end_tok"),
            (end - start).alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_words"), start.cast("int") + 1, (end - start).cast("int")),
                " ",
            ).alias("body"),
        )
    )
