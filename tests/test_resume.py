"""Snapshot sink + anti-join resume: idempotence, crash-invisibility,
reprocess semantics (north rule)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from ocr_platform_spark.operators.corpus_spark import documents_df
from ocr_platform_spark.operators.resume import SnapshotTable, ensure_exists_new_rows, pending_documents
from ocr_platform_spark.plans.pipeline import run_extraction_job


def test_extraction_job_and_resume(spark, tmp_path):
    table_path = str(tmp_path / "extracted")
    docs_all = documents_df(spark, 200)

    # first run: only the first half "arrives"
    first = docs_all.where(F.xxhash64("url") % 2 == 0).cache()
    m1 = run_extraction_job(spark, first, table_path, run_id="r1", num_partitions=4)
    assert m1["committed"] and m1["rows"] == first.count()

    table = SnapshotTable(table_path)
    assert table.committed_runs() == ["r1"]

    # resume: pending = full input minus committed
    pend = pending_documents(docs_all, table)
    assert pend.count() == 200 - first.count()

    # second run over the full input extracts only the remainder
    m2 = run_extraction_job(spark, docs_all, table_path, run_id="r2", num_partitions=4)
    assert m2["rows"] == 200 - first.count()

    # table now complete, no dupes, no holes
    data = table.read_data(spark)
    assert data.count() == 200
    assert data.select("url").distinct().count() == 200

    # third run: nothing pending → no-op, nothing committed
    m3 = run_extraction_job(spark, docs_all, table_path, run_id="r3")
    assert m3["rows"] == 0 and not m3["committed"]
    assert table.committed_runs() == ["r1", "r2"]

    # lineage union covers both runs, counts match
    lin = table.read_lineage(spark)
    per_run = {r["run_id"]: r["n"] for r in
               lin.groupBy("run_id").agg(F.sum("input_count").alias("n")).collect()}
    assert per_run == {"r1": m1["rows"], "r2": m2["rows"]}
    first.unpersist()


def test_uncommitted_snapshot_invisible(spark, tmp_path):
    table_path = str(tmp_path / "t2")
    table = SnapshotTable(table_path)
    docs = documents_df(spark, 20)
    m = run_extraction_job(spark, docs, table_path, run_id="ok", num_partitions=2)
    assert m["committed"]

    # simulate a crashed run: data written but no _COMMITTED marker
    crashed = os.path.join(table_path, "snapshots", "crashed", "data")
    docs.limit(5).selectExpr(
        "url", "'html' as payload_kind", "'x' as text",
        "cast(null as array<struct<field:string,start:int,end:int,value:string>>) as spans",
        "cast(null as string) as error",
    ).write.parquet(crashed)

    assert table.committed_runs() == ["ok"]
    assert table.read_data(spark).count() == 20  # crashed rows not visible
    assert pending_documents(documents_df(spark, 25), table).count() == 5


def test_ensure_exists(spark):
    incoming = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    existing = spark.createDataFrame([("b",)], "k string")
    new = ensure_exists_new_rows(incoming, existing, ["k"])
    assert sorted(r["k"] for r in new.collect()) == ["a", "c"]


def test_extraction_job_size_tier_probe(spark, tmp_path):
    """The payload-size probe engages the size-tiered partitioner exactly
    when the corpus is long-tailed, and the long-tailed corpus still
    extracts byte-identically (the padding is extractor-skipped)."""
    uniform = documents_df(spark, 250, golden=True).cache()
    m1 = run_extraction_job(
        spark, uniform.drop("expected_kind", "expected_text", "expected_error"),
        str(tmp_path / "uni"), run_id="u1", num_partitions=4,
    )
    assert m1["partitioner"] == "uniform"

    big = documents_df(
        spark, 250, golden=True, big_frac=0.06, big_bytes=400_000
    ).cache()
    m2 = run_extraction_job(
        spark, big.drop("expected_kind", "expected_text", "expected_error"),
        str(tmp_path / "tiered"), run_id="t1", num_partitions=4,
    )
    assert m2["partitioner"] == "size_tiered"
    assert m2["rows"] == 250

    # explicit override beats the probe
    m3 = run_extraction_job(
        spark, uniform.drop("expected_kind", "expected_text", "expected_error"),
        str(tmp_path / "forced"), run_id="f1", num_partitions=4, tiered=True,
    )
    assert m3["partitioner"] == "size_tiered"

    # golden byte-identity on the long-tailed corpus
    data = SnapshotTable(str(tmp_path / "tiered")).read_data(spark)
    j = data.join(big.select("url", "expected_text", "expected_error"), "url")
    bad = j.where(
        ~F.col("text").eqNullSafe(F.col("expected_text"))
        | ~F.col("error").eqNullSafe(F.col("expected_error"))
    ).count()
    assert bad == 0
    uniform.unpersist()
    big.unpersist()
