"""Sequence packing — the last training-prep step before tokenized text
becomes fixed-length model inputs: assign whole documents, in
deterministic order, to sequences holding at most ``budget`` weight units
(tokens/chars), greedy first-fit-in-order.

The greedy recurrence is ORDER-DEPENDENT state, not an associative prefix
sum — `(seq, fill) → next doc → (seq', fill')` — so a global serial pack
does not distribute. Real pipelines don't pack globally either: they pack
WITHIN each output shard/file, independently. That is the shape here:

- documents land in md5-bucket shards (operators/sampling.hash_bucket —
  deterministic, engine-independent);
- within a shard, documents are processed in id order by an Arrow-batched
  per-shard kernel (``applyInPandas`` over the shard key — one shuffle,
  shard-sized state, embarrassingly parallel across shards);
- the recurrence itself is pure integer arithmetic, so the catalog oracle
  (queries.py ``corpus_pack_sequences``) replays it bit-for-bit in DuckDB
  as a recursive CTE stepping one rank per iteration — every shard
  advances in parallel per CTE step, the same trick as the PageRank and
  connected-components oracles.

Oversized documents (weight > budget) occupy a sequence alone (the
standard "don't split, don't drop here" policy — the caller decides
whether to truncate or discard them upstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.operators.sampling import hash_bucket

def _out_ddl(id_type: str) -> str:
    # the id column keeps its source type (ids are strings in the dedup
    # family, longs in the TPC-H tables — a hardcoded `long` would crash
    # Arrow conversion on string keys)
    return f"doc_id {id_type}, shard_id long, seq_id long, fill_after long"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """(doc_id, shard_id, seq_id, fill_after) — greedy first-fit-in-order
    packing of each md5 shard's documents into sequences of ≤ ``budget``
    total weight. ``seq_id`` is 1-based per shard; ``fill_after`` is the
    sequence's running total after this document (the cross-engine-checked
    recurrence state)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(id_col, n_shards, salt).alias("shard_id"),
        F.col(weight_col).cast("long").alias("w"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, fills = [], []
        seq, fill = 1, 0
        for w in pdf["w"]:
            w = int(w)
            if fill > 0 and fill + w > budget:
                seq += 1
                fill = 0
            fill += w
            seqs.append(seq)
            fills.append(fill)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "shard_id": pdf["shard_id"],
                "seq_id": pd.Series(seqs, dtype="int64"),
                "fill_after": pd.Series(fills, dtype="int64"),
            }
        )

    id_type = dict(df.dtypes)[id_col]
    return base.groupBy("shard_id").applyInPandas(pack, _out_ddl(id_type))


def sequence_rollup(packed: DataFrame) -> DataFrame:
    """(shard_id, seq_id, n_docs, seq_weight) — one row per packed
    sequence; ``seq_weight`` equals the max fill_after of the sequence."""
    return packed.groupBy("shard_id", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.max("fill_after").alias("seq_weight"),
    )


def pack_blocks_encoded(
    enc: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    bucket_span: int = 1024,
    sep_id: int | None = None,
) -> DataFrame:
    """(block_id, n_tokens, ids) — GPT-style FIXED-BLOCK packing of an
    encoded corpus: concatenate every document's token-id sequence in
    ``id_col`` order into one global stream and split it into consecutive
    blocks of exactly ``seq_len`` tokens (documents SPLIT across block
    boundaries; only the final block may be short). ``sep_id`` appends a
    document-separator token (the EOS id) after EVERY document before
    packing — the published concatenation recipe, so a model can learn
    where one document ends inside a block; the final block then ends in
    the separator. The complement of
    :func:`pack_sequences`' whole-document bins — this is the "concatenate
    and chunk to context length" recipe most published LLM data pipelines
    feed pretraining with.

    ``enc`` is (id, n_tokens, ids) from ``bpe.encode_with_segmentation``.
    Each document's global offset is an ORDERED prefix sum computed at two
    levels with no global window: documents map to order-preserving range
    buckets (``id div bucket_span``), bucket token totals roll up to a
    bucket-count-sized table whose window is trivial, and the intra-bucket
    prefix runs partitioned BY BUCKET (sort bounded by bucket population —
    size ``bucket_span`` for dense ids; pick ``bucket_span`` ≈ rows per
    task). Tokens then shuffle once, keyed by block id; in-block order is
    restored by a row-local array_sort. The catalog oracle replays the
    offsets as one flat window over the same total order (equivalent by
    prefix-sum associativity) and hash-compares every block's id
    sequence."""
    from pyspark.sql import Window

    d = enc.select(F.col(id_col).alias("id"), "n_tokens", "ids")
    if sep_id is not None:
        d = d.select(
            "id",
            (F.col("n_tokens") + 1).alias("n_tokens"),
            F.concat_ws(" ", "ids", F.lit(str(sep_id))).alias("ids"),
        )
    d = d.withColumn(
        # floor, not cast-truncation: hash-derived ids can be negative, and
        # truncation toward zero would fold ids around 0 into one bucket
        # out of order
        "_b",
        F.floor(F.col("id") / F.lit(bucket_span)).cast("long"),
    )
    buckets = d.groupBy("_b").agg(F.sum("n_tokens").alias("_bt"))
    bw = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = buckets.select(
        "_b", F.coalesce(F.sum("_bt").over(bw), F.lit(0)).alias("_boff")
    )
    iw = (
        Window.partitionBy("_b")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        d.join(F.broadcast(boff), "_b")
        .withColumn("_ioff", F.coalesce(F.sum("n_tokens").over(iw), F.lit(0)))
        .withColumn("_off", (F.col("_boff") + F.col("_ioff")).cast("long"))
    )
    tok = off.select(
        "_off", F.posexplode(F.split("ids", " ")).alias("_j", "_tok")
    ).select(
        (F.col("_off") + F.col("_j")).alias("_gpos"),
        "_tok",
    )
    return (
        tok.withColumn("block_id", (F.col("_gpos") / F.lit(seq_len)).cast("long"))
        .groupBy("block_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_gpos", "_tok"))),
                    lambda x: x["_tok"],
                ),
            ).alias("ids"),
        )
    )
