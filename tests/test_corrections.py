"""Correction overlay (J5 MERGE-on-read) + reprocess tombstones (§2.11)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from ocr_platform_spark.operators.corrections import (
    CORRECTIONS_DDL,
    CorrectionStore,
    apply_corrections,
    latest_corrections,
)
from ocr_platform_spark.operators.corpus_spark import documents_df
from ocr_platform_spark.operators.resume import SnapshotTable, pending_documents
from ocr_platform_spark.plans.pipeline import run_extraction_job


def _eav(spark):
    rows = [
        # scalar rows (null row_index/column_name)
        ("u1", "TITLE", None, None, "pred-title", None),
        ("u1", "DATE", None, None, "2024-01-01", "2024-01-02"),  # prior actual
        ("u2", "TITLE", None, None, "other-title", None),
        # table cells
        ("u1", "ITEMS", 0, "QTY", "3", None),
        ("u1", "ITEMS", 1, "QTY", "5", None),
    ]
    return spark.createDataFrame(
        rows,
        "url string, field_name string, row_index int, column_name string, "
        "predicted_value string, actual_value string",
    )


def _corr(spark, rows):
    return spark.createDataFrame(rows, CORRECTIONS_DDL)


def test_apply_corrections_scalar_and_cell(spark):
    corr = _corr(
        spark,
        [
            ("u1", "TITLE", None, None, "fixed-title", datetime(2024, 5, 1)),
            ("u1", "ITEMS", 1, "QTY", "6", datetime(2024, 5, 1)),
        ],
    )
    out = apply_corrections(_eav(spark), corr)
    got = {
        (r["url"], r["field_name"], r["row_index"], r["column_name"]): (
            r["actual_value"],
            r["predicted_value"],
        )
        for r in out.collect()
    }
    assert got[("u1", "TITLE", None, None)] == ("fixed-title", "pred-title")
    # untouched rows pass through; prior actual_value survives
    assert got[("u1", "DATE", None, None)] == ("2024-01-02", "2024-01-01")
    assert got[("u2", "TITLE", None, None)] == (None, "other-title")
    # cell-level: only the addressed row_index changes
    assert got[("u1", "ITEMS", 0, "QTY")] == (None, "3")
    assert got[("u1", "ITEMS", 1, "QTY")] == ("6", "5")
    # no row duplication or loss
    assert out.count() == 5


def test_latest_correction_wins(spark):
    corr = _corr(
        spark,
        [
            ("u1", "TITLE", None, None, "first", datetime(2024, 1, 1)),
            ("u1", "TITLE", None, None, "second", datetime(2024, 2, 1)),
            ("u1", "TITLE", None, None, "third", datetime(2024, 3, 1)),
        ],
    )
    latest = latest_corrections(corr).collect()
    assert len(latest) == 1 and latest[0]["corrected_value"] == "third"
    out = apply_corrections(_eav(spark), corr)
    row = out.where("url='u1' and field_name='TITLE'").first()
    assert row["actual_value"] == "third"


def test_correction_for_absent_key_ignored(spark):
    corr = _corr(spark, [("zzz", "NOPE", None, None, "x", datetime(2024, 1, 1))])
    out = apply_corrections(_eav(spark), corr)
    assert out.count() == 5
    assert out.where(F.col("actual_value") == "x").count() == 0


def test_correction_store_idempotent(spark, tmp_path):
    store = CorrectionStore(str(tmp_path / "corr"))
    c1 = _corr(spark, [("u1", "TITLE", None, None, "v1", datetime(2024, 1, 1))])
    store.submit(c1, "batch-1")
    store.submit(c1, "batch-1")  # replay: no double-apply
    assert store.overlay(spark).count() == 1
    # second batch overrides (later timestamp)
    c2 = _corr(spark, [("u1", "TITLE", None, None, "v2", datetime(2024, 2, 1))])
    store.submit(c2, "batch-2")
    out = store.corrected(_eav(spark))
    assert out.where("url='u1' and field_name='TITLE'").first()["actual_value"] == "v2"


def test_invalidate_reprocess_round_trip(spark, tmp_path):
    """The reference's clear-and-reprocess (document_routes.py:448-484):
    invalidate a url set → it becomes pending again → the next run rewrites
    it → no dupes, no holes, and rows from runs after the tombstone stay."""
    table_path = str(tmp_path / "ext")
    docs = documents_df(spark, 60).cache()
    run_extraction_job(spark, docs, table_path, run_id="r1", num_partitions=2)
    table = SnapshotTable(table_path)
    assert table.read_data(spark).count() == 60

    victims = docs.select("url").where(F.xxhash64("url") % 5 == 0).cache()
    n_victims = victims.count()
    assert n_victims > 0
    table.invalidate(victims, key="url", tag="redo-1")

    # invalidated rows are gone; the rest are intact
    vis = table.read_data(spark)
    assert vis.count() == 60 - n_victims
    assert vis.join(victims, "url", "left_semi").count() == 0

    # pending sees exactly the invalidated urls
    pend = pending_documents(docs, table)
    assert pend.count() == n_victims

    # reprocess run rewrites them into a NEW snapshot (not hidden by the
    # old tombstone) — table complete again, one row per url
    m2 = run_extraction_job(spark, docs, table_path, run_id="r2", num_partitions=2)
    assert m2["rows"] == n_victims
    final = table.read_data(spark)
    assert final.count() == 60
    assert final.select("url").distinct().count() == 60

    # idempotent tombstone replay changes nothing
    table.invalidate(victims, key="url", tag="redo-1")
    assert table.read_data(spark).count() == 60
    docs.unpersist()
    victims.unpersist()
