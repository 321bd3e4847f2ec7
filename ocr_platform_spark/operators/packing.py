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
