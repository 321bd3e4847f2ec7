"""The flagship extraction job (SURVEY.md §3.1 rebuilt set-oriented).

Reference lifecycle (one document per blocking HTTP request,
``ocr_backend/app/api/ocr_routes.py:485-738``):
  load → status=PROCESSING → extract (remote LLM) → convert → map SELECTs →
  persist EAV rows → status=PROCESSED.

Rebuild (one Spark job, any number of documents):
  read documents → LEFT ANTI committed urls (resume) → size-tiered
  url-hash repartition (skew) → mapInArrow extraction kernel → snapshot
  append (data + per-partition lineage, atomic commit).

Plan shape at 100 TB: the only wide payload movement is the single
repartition before the kernel (unavoidable: balanced task budgets); the
anti-join ships only urls; lineage is a map-side-combined aggregate; the
write is partition-parallel with one driver-side commit point.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ocr_platform_spark.operators.extract import (
    extract_documents,
    extracted_clean,
    lineage_from_extracted,
)
from ocr_platform_spark.operators.partitioning import repartition_for_extraction
from ocr_platform_spark.operators.resume import SnapshotTable, pending_documents


def run_extraction_job(
    spark: SparkSession,
    docs: DataFrame,
    table_path: str,
    run_id: str | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Extract all not-yet-committed documents into the snapshot table.

    Returns run metrics. Idempotent: re-running after success is a no-op;
    re-running after a crash picks up exactly the uncommitted remainder.
    """
    run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"
    table = SnapshotTable(table_path)
    t0 = time.monotonic()

    pending = pending_documents(docs, table, "url")
    balanced = repartition_for_extraction(pending, num_partitions)
    extracted = extract_documents(balanced)

    # One pass over payloads: cache the kernel output (urls+text+counters,
    # ~10-100× smaller than input), derive data + lineage from it.
    extracted.persist()
    try:
        lineage = lineage_from_extracted(extracted, run_id)
        n_rows = extracted.count()
        if n_rows == 0:
            return {
                "run_id": run_id,
                "rows": 0,
                "elapsed_sec": time.monotonic() - t0,
                "committed": False,
            }
        table.append(extracted_clean(extracted), lineage, run_id)
    finally:
        extracted.unpersist()
    return {
        "run_id": run_id,
        "rows": n_rows,
        "elapsed_sec": time.monotonic() - t0,
        "committed": True,
    }
