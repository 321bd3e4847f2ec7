"""Snapshot sink + anti-join resume (north rule; SURVEY.md §2.11, §4.2.3).

The reference tracks per-document lifecycle state by mutating a status enum
(PENDING→PROCESSING→PROCESSED|FAILED, ``ocr_backend/app/utils/enums.py:3-7``,
transitions ``ocr_routes.py:502-709``) inside SQLite transactions. In a
distributed engine, mutable per-row status is an anti-pattern; the rebuild
derives state from *committed snapshots*:

- every run appends data + lineage under ``snapshots/<run_id>/`` and then
  atomically publishes a ``_COMMITTED`` manifest (write-temp + rename — the
  local-FS stand-in for an Iceberg snapshot commit; the Iceberg jars are not
  in this image, so the table layout emulates the snapshot protocol);
- readers see only committed snapshots;
- resume = ``input LEFT ANTI JOIN committed urls`` (the reference's
  "reprocess/pending" semantics, ``document_routes.py:448-484``, J8);
- a failed run leaves an uncommitted directory that readers never see —
  re-running is idempotent.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

_MANIFEST = "_COMMITTED"


class SnapshotTable:
    """Parquet-backed table with snapshot-commit semantics."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.snap_root = os.path.join(path, "snapshots")

    # -- staged two-phase write (fused kernel→write; no payload caching) ---
    def _snap_dir(self, run_id: str) -> str:
        return os.path.join(self.snap_root, run_id)

    def is_committed(self, run_id: str) -> bool:
        return os.path.exists(os.path.join(self._snap_dir(run_id), _MANIFEST))

    def stage_data(self, data: DataFrame, run_id: str) -> None:
        """Phase 1: stream the data into the snapshot's (uncommitted) data
        directory — invisible to readers until ``commit``. Overwrites any
        leftovers of a crashed attempt with the same run_id."""
        data.write.mode("overwrite").parquet(os.path.join(self._snap_dir(run_id), "data"))

    def read_staged(self, spark: SparkSession, run_id: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._snap_dir(run_id), "data"))

    def discard_staged(self, run_id: str) -> None:
        import shutil

        shutil.rmtree(self._snap_dir(run_id), ignore_errors=True)

    def commit(self, lineage: DataFrame, run_id: str) -> dict:
        """Phase 2: write lineage, then atomically publish the manifest."""
        snap_dir = self._snap_dir(run_id)
        marker = os.path.join(snap_dir, _MANIFEST)
        if os.path.exists(marker):
            with open(marker) as f:
                return json.load(f)
        lineage.write.mode("overwrite").parquet(os.path.join(snap_dir, "lineage"))
        manifest = {
            "run_id": run_id,
            "committed_at_unix": int(time.time()),
            "data": "data",
            "lineage": "lineage",
        }
        tmp = os.path.join(snap_dir, f".{_MANIFEST}.tmp")
        os.makedirs(snap_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, marker)  # the commit point
        return manifest

    # -- one-shot write side -----------------------------------------------
    def append(self, data: DataFrame, lineage: DataFrame, run_id: str) -> dict:
        """Write one run's data + lineage, then publish atomically.

        Idempotent on run_id: if this run_id is already committed the call is
        a no-op returning the existing manifest — a replayed micro-batch (or
        a retried driver) can never overwrite or duplicate committed data.
        Uncommitted leftovers from a crashed attempt ARE overwritten."""
        snap_dir = os.path.join(self.snap_root, run_id)
        marker = os.path.join(snap_dir, _MANIFEST)
        if os.path.exists(marker):
            with open(marker) as f:
                return json.load(f)
        data_dir = os.path.join(snap_dir, "data")
        lineage_dir = os.path.join(snap_dir, "lineage")
        data.write.mode("overwrite").parquet(data_dir)
        lineage.write.mode("overwrite").parquet(lineage_dir)
        manifest = {
            "run_id": run_id,
            "committed_at_unix": int(time.time()),
            "data": "data",
            "lineage": "lineage",
        }
        tmp = os.path.join(snap_dir, f".{_MANIFEST}.tmp")
        os.makedirs(snap_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(snap_dir, _MANIFEST))  # the commit point
        return manifest

    # -- read side -----------------------------------------------------------
    def committed_runs(self) -> list[str]:
        if not os.path.isdir(self.snap_root):
            return []
        return sorted(
            d
            for d in os.listdir(self.snap_root)
            if os.path.exists(os.path.join(self.snap_root, d, _MANIFEST))
        )

    def _read_union(self, spark: SparkSession, sub: str) -> DataFrame | None:
        dirs = [
            os.path.join(self.snap_root, r, sub)
            for r in self.committed_runs()
        ]
        dirs = [d for d in dirs if os.path.isdir(d)]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def read_data(self, spark: SparkSession) -> DataFrame | None:
        return self._read_union(spark, "data")

    def read_lineage(self, spark: SparkSession) -> DataFrame | None:
        return self._read_union(spark, "lineage")

    def processed_keys(self, spark: SparkSession, key: str = "url") -> DataFrame | None:
        data = self.read_data(spark)
        return None if data is None else data.select(key).distinct()


def pending_documents(docs: DataFrame, table: SnapshotTable, key: str = "url") -> DataFrame:
    """The resume primitive: input minus already-committed keys (left-anti,
    J8 — the same join shape as the reference's ensure-exists checks,
    ``tally_routes.py:217-464``)."""
    done = table.processed_keys(docs.sparkSession, key)
    if done is None:
        return docs
    return docs.join(done, key, "left_anti")


def ensure_exists_new_rows(
    incoming: DataFrame, existing: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Generic create-if-not-exists: rows of ``incoming`` whose key is absent
    from ``existing`` (reference J8/U4 pattern: stock-item/ledger/unit
    ensure-inserts, api-key backfill)."""
    return incoming.join(existing.select(*key_cols).distinct(), key_cols, "left_anti")
