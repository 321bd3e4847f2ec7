"""Export sink + raw-file ingest (SURVEY.md S1/S6).

The reference's export job writes per-document files in PDF/CSV/EXCEL/JSON
(``ocr_backend/app/api/export_routes.py:23-48``, formats enum
``app/utils/enums.py:26-30``) and ingests uploaded binaries one HTTP
request at a time (``document_routes.py:202-279``). Engine equivalents:

- ``export_results``: set-oriented ``df.write`` in csv/json/parquet.
  PDF/EXCEL are presentation formats outside an analytics engine — they
  raise explicitly (documented non-goal, SURVEY §7.5) rather than being
  silently mis-mapped.
- ``ingest_binary_dir``: ``binaryFile`` scan of a directory → (path,
  modificationTime, length, content) — the S1 bulk-ingest face; pair with
  sources/warc.py for crawl archives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SUPPORTED_FORMATS = {"csv", "json", "parquet"}
_REFERENCE_ONLY_FORMATS = {"pdf", "excel"}


def export_results(
    df: DataFrame, path: str, fmt: str = "csv", mode: str = "overwrite"
) -> None:
    fmt = fmt.lower()
    if fmt in _REFERENCE_ONLY_FORMATS:
        raise NotImplementedError(
            f"export format '{fmt}' is a presentation format handled outside "
            f"the engine (reference parity note: enums.py:26-30); "
            f"supported here: {sorted(SUPPORTED_FORMATS)}"
        )
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unknown export format '{fmt}'")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def ingest_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None, max_bytes: int | None = None
) -> DataFrame:
    """Bulk binary ingest. ``max_bytes`` mirrors the reference's 16 MB
    upload cap (``app/config.py:23``) as a pushed-down length predicate."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df
