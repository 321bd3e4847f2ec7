"""Sharded corpus sink (sources/shards.py): layout, determinism, audit."""

import os

from pyspark.sql import functions as F

from ocr_platform_spark.operators.sampling import hash_bucket
from ocr_platform_spark.sources.shards import shard_assign, write_sharded


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 37 + 5).alias("n_chars"),
    )


def test_write_sharded_layout_and_manifest(spark, tmp_path):
    path = str(tmp_path / "shards")
    d = _docs(spark)
    manifest = write_sharded(d, path, "doc_id", 8).collect()

    # every shard dir exists as a partition directory, plus _manifest
    dirs = sorted(x for x in os.listdir(path) if x.startswith("shard_id="))
    assert len(dirs) == len(manifest) and len(manifest) <= 8
    assert os.path.isdir(os.path.join(path, "_manifest"))

    # manifest == independent recount of the written files
    written = spark.read.parquet(path)
    assert written.count() == 200
    recount = {
        r["shard_id"]: r["n"]
        for r in written.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert {r["shard_id"]: r["n_docs"] for r in manifest} == recount

    # assignment is the md5 bucket, row for row
    expected = {
        r["doc_id"]: r["b"]
        for r in _docs(spark).select("doc_id", hash_bucket("doc_id", 8).alias("b")).collect()
    }
    got = {r["doc_id"]: r["shard_id"] for r in written.collect()}
    assert got == expected

    # persisted manifest matches the returned one
    persisted = spark.read.parquet(os.path.join(path, "_manifest"))
    assert sorted(map(tuple, persisted.collect())) == sorted(map(tuple, manifest))


def test_write_sharded_salt_changes_assignment(spark, tmp_path):
    d = _docs(spark, 100)
    a = {r["doc_id"]: r["shard_id"] for r in shard_assign(d, "doc_id", 8).collect()}
    b = {
        r["doc_id"]: r["shard_id"]
        for r in shard_assign(d, "doc_id", 8, salt="v2").collect()
    }
    assert a != b and set(a) == set(b)


def test_write_sharded_sorted_shards_deterministic(spark, tmp_path):
    path = str(tmp_path / "sorted")
    d = _docs(spark, 150)
    write_sharded(d, path, "doc_id", 4, sort_col="doc_id")
    # within each written file, rows are in key order
    written = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()
    )
    rows = written.select("f", "doc_id").collect()
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["doc_id"])
    # collect() preserves within-file row order per input split
    for ids in by_file.values():
        assert ids == sorted(ids)
