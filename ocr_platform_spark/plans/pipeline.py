"""The flagship extraction job (SURVEY.md §3.1 rebuilt set-oriented).

Reference lifecycle (one document per blocking HTTP request,
``ocr_backend/app/api/ocr_routes.py:485-738``):
  load → status=PROCESSING → extract (remote LLM) → convert → map SELECTs →
  persist EAV rows → status=PROCESSED.

Rebuild (one Spark job, any number of documents):
  read documents → LEFT ANTI committed urls (resume) → size-tiered
  url-hash repartition (skew) → mapInArrow extraction kernel **fused with
  the parquet write** (single pass over payloads, no caching) → lineage
  derived from the written columnar data (reads only the three small
  carrier columns) → atomic snapshot commit.

Why fused: caching the extracted rows (text + span structs) deserialized
in the JVM costs more than the kernel itself (measured ~3× at 120k docs)
and would be impossible at 10^12 docs. The committed parquet IS the cache;
lineage/count come from a column-pruned scan of it (<2% of the write).

Plan shape at 100 TB: the only wide payload movement is the single
optional repartition before the kernel (balanced task budgets under skew);
the anti-join ships only urls; the lineage aggregate reads three int64
columns from the just-written snapshot; the write is partition-parallel
with one driver-side commit point.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ocr_platform_spark.operators.extract import (
    extract_documents,
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
    balance: bool = True,
) -> dict:
    """Extract all not-yet-committed documents into the snapshot table.

    Returns run metrics. Idempotent: re-running after success is a no-op;
    re-running after a crash picks up exactly the uncommitted remainder.

    ``balance=False`` skips the size-tier repartition — correct when the
    input's own partitioning is already uniform (e.g. a freshly bucketed
    Iceberg table); keep it on for raw crawl layouts with mixed payload
    sizes or host-clustered files.
    """
    run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"
    table = SnapshotTable(table_path)
    t0 = time.monotonic()

    if table.is_committed(run_id):
        return {"run_id": run_id, "rows": -1, "elapsed_sec": 0.0, "committed": True}

    pending = pending_documents(docs, table, "url")
    staged = (
        repartition_for_extraction(pending, num_partitions) if balance else pending
    )
    extracted = extract_documents(staged)

    # Single pass: kernel output streams straight into the snapshot's data
    # files (no persist of payload-sized rows).
    table.stage_data(extracted, run_id)

    # Lineage + row count from the written snapshot: column-pruned scan of
    # (partition_id, input_bytes, cum_elapsed_ms) only.
    written = table.read_staged(spark, run_id)
    lineage = lineage_from_extracted(written, run_id)
    n_rows = written.count()
    if n_rows == 0:
        table.discard_staged(run_id)
        return {
            "run_id": run_id,
            "rows": 0,
            "elapsed_sec": time.monotonic() - t0,
            "committed": False,
        }
    table.commit(lineage, run_id)
    return {
        "run_id": run_id,
        "rows": n_rows,
        "elapsed_sec": time.monotonic() - t0,
        "committed": True,
    }
