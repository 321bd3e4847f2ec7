"""Sharded training-corpus sink: fixed shard count, deterministic
document→shard assignment, per-shard manifest.

Training loaders (WebDataset/tfrecord-style) consume a corpus as a fixed
set of shard files plus a manifest saying what's in each — not as "whatever
part-files the last job happened to emit". This sink produces that layout
on parquet:

- ``shard_id = md5-bucket(key, n_shards[, salt])`` (operators/sampling.py)
  — a pure function of the document key, so the same document lands in the
  same shard across runs, cluster sizes, and engines (the catalog oracle
  recomputes the assignment in DuckDB and must reproduce the manifest
  exactly);
- one ``repartition(n_shards, shard_id)`` moves each document to its
  shard's writer task, ``partitionBy("shard_id")`` lays shards out as
  self-describing directories; optional ``sortWithinPartitions`` gives
  byte-deterministic shard contents;
- the manifest is computed from the WRITTEN files (not the input plan), so
  it doubles as a write audit: every row exactly once, in the right shard.

Scale shape at 10^12 docs: the single shuffle is on the uniform md5 bucket
(no skew by construction — hot hosts spread over all shards), shard count
is the operator's parallelism knob, and the manifest aggregate is map-side
combinable over the written parquet's footer-pruned columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.operators.sampling import hash_bucket


def shard_assign(
    df: DataFrame, key_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Adds the deterministic ``shard_id`` column."""
    return df.withColumn("shard_id", hash_bucket(key_col, n_shards, salt))


def write_sharded(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "",
    sort_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``path/shard_id=K/*.parquet`` (K in [0, n_shards))
    and return the manifest DataFrame computed from the written files:

    ``(shard_id, n_docs, total_chars?, min_key, max_key)`` — total_chars
    only when a ``n_chars`` column exists. The manifest is also persisted
    at ``path/_manifest`` so a later job can plan against it without
    listing data files."""
    out = shard_assign(df, key_col, n_shards, salt).repartition(
        n_shards, F.col("shard_id")
    )
    if sort_col is not None:
        out = out.sortWithinPartitions(sort_col)
    out.write.mode("overwrite").partitionBy("shard_id").parquet(path)

    spark = df.sparkSession
    # explicit schema: an empty corpus writes a directory with no data
    # files, where schema inference would fail — the audit must still
    # return an (empty) manifest rather than crash the composed job
    written = spark.read.schema(out.schema).parquet(path)
    aggs = [
        F.count("*").alias("n_docs"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if "n_chars" in written.columns:
        aggs.insert(1, F.sum("n_chars").alias("total_chars"))
    manifest = (
        written.groupBy(F.col("shard_id").cast("long").alias("shard_id"))
        .agg(*aggs)
        .orderBy("shard_id")
    )
    mpath = os.path.join(path, "_manifest")
    manifest.repartition(1).write.mode("overwrite").parquet(mpath)
    # return a READER of the persisted manifest, not the lazy aggregate:
    # the audit scan over every written shard would otherwise re-execute
    # on each caller action
    return spark.read.parquet(mpath).orderBy("shard_id")
