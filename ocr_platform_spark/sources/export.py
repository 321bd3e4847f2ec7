"""Export sink + raw-file ingest (SURVEY.md S1/S6).

The reference's export job writes per-document files in PDF/CSV/EXCEL/JSON
(``ocr_backend/app/api/export_routes.py:23-48``, formats enum
``app/utils/enums.py:26-30``) and ingests uploaded binaries one HTTP
request at a time (``document_routes.py:202-279``). Engine equivalents:

- ``export_results``: set-oriented ``df.write`` in csv/json/parquet;
  pdf/excel route through the deterministic presentation renderers
  (kernels/render.py) and land as a *document archive* — a parquet table
  of (url, filename, content binary), the scalable shape for billions of
  per-document files (a filesystem of tiny files is the anti-pattern;
  serving layers read the archive).
- ``render_exports``: the distributed render step itself — EAV result rows
  grouped per document, one rendered payload per url, Arrow-batched.
- ``ingest_binary_dir``: ``binaryFile`` scan of a directory → (path,
  modificationTime, length, content) — the S1 bulk-ingest face; pair with
  sources/warc.py for crawl archives.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

SUPPORTED_FORMATS = {"csv", "json", "parquet", "pdf", "excel"}
_RENDERED_FORMATS = {"pdf", "excel"}

_EXT = {"pdf": "pdf", "excel": "xlsx"}


def render_exports(df: DataFrame, fmt: str = "pdf") -> DataFrame:
    """(url, field_name, value) result rows → (url, filename, content).

    One rendered document per url: rows are gathered per url with
    ``sort_array(collect_list(struct(...)))`` (deterministic order, A9/O1),
    then a vectorized pandas UDF renders each document's field list with
    the pure render kernel — PDF as ``field: value`` lines, XLSX as a
    (field_name, value) sheet. No driver involvement; output order and
    bytes are independent of parallelism."""
    fmt = fmt.lower()
    if fmt not in _RENDERED_FORMATS:
        raise ValueError(f"render_exports supports {sorted(_RENDERED_FORMATS)}")

    @F.pandas_udf("binary")
    def _render(entries: pd.Series) -> pd.Series:
        from ocr_platform_spark.kernels.render import render_pdf, render_xlsx

        out = []
        for rows in entries:
            pairs = [(r["field_name"], r["value"]) for r in rows]
            if fmt == "pdf":
                out.append(
                    render_pdf([f"{k}: {'' if v is None else v}" for k, v in pairs])
                )
            else:
                out.append(
                    render_xlsx(["field_name", "value"], [[k, v] for k, v in pairs])
                )
        return pd.Series(out)

    grouped = df.groupBy("url").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("field_name"), F.col("value")))
        ).alias("_entries")
    )
    return grouped.select(
        "url",
        F.concat(
            F.lit("export-"),
            F.substring(F.sha2(F.col("url"), 256), 1, 16),
            F.lit(f".{_EXT[fmt]}"),
        ).alias("filename"),
        _render(F.col("_entries")).alias("content"),
    )


def export_results(
    df: DataFrame, path: str, fmt: str = "csv", mode: str = "overwrite"
) -> None:
    """Export a result set. csv/json/parquet map to native ``df.write``;
    pdf/excel render per-document payloads (``render_exports`` — expects
    (url, field_name, value) columns) into a parquet document archive."""
    fmt = fmt.lower()
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unknown export format '{fmt}'")
    if fmt in _RENDERED_FORMATS:
        render_exports(df, fmt).write.mode(mode).parquet(path)
        return
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
