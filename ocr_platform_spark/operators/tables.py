"""HTML table extraction → the reference's multi-column TABLE shape.

The reference's TABLE fields carry sub-template columns with per-column
data types (``ocr_backend/app/models/sub_template_field.py:5-15``) and
store one EAV row per (line item, sub-field)
(``ocr_line_item_value.py:4-14``). This operator produces exactly that
shape from real ``<table>`` markup:

  documents → mapInArrow(table kernel) → one row per (url, table)
            → posexplode rows → (url, table_index, row_index)
            → explode cells   → (…, column_name, value)
            → broadcast sub-field dim → convert_by_type per column

``column_name`` comes from the table's header row (th cells) when present,
else positional ``col_N`` — the schema-driven/inferred duality the
reference handles via sub_template_fields.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ocr_platform_spark.functions.conversions import convert_by_type

_TABLES_DDL = (
    "url string, table_index int, headers array<string>, rows array<array<string>>"
)

_TABLES_ARROW = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("table_index", pa.int32(), nullable=False),
        pa.field("headers", pa.list_(pa.string()), nullable=False),
        pa.field("rows", pa.list_(pa.list_(pa.string())), nullable=False),
    ]
)


def extract_tables(docs: DataFrame) -> DataFrame:
    """documents(url, html, ...) → one row per extracted <table>."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ocr_platform_spark.kernels.html_extract import extract_html_tables

        for batch in batches:
            urls = batch.column("url").to_pylist()
            payloads = batch.column("html").to_pylist()
            out_url: list[str] = []
            out_idx: list[int] = []
            out_headers: list[list[str]] = []
            out_rows: list[list[list[str]]] = []
            for url, data in zip(urls, payloads):
                if data is None or data[:5] == b"%PDF-":
                    continue
                tables, err = extract_html_tables(data)
                if err is not None:
                    continue
                for i, t in enumerate(tables):
                    out_url.append(url)
                    out_idx.append(i)
                    out_headers.append(t["headers"])
                    out_rows.append(t["rows"])
            yield pa.RecordBatch.from_pydict(
                {
                    "url": out_url,
                    "table_index": out_idx,
                    "headers": out_headers,
                    "rows": out_rows,
                },
                schema=_TABLES_ARROW,
            )

    return docs.select("url", "html").mapInArrow(kernel, _TABLES_DDL)


def table_cells_eav(tables: DataFrame) -> DataFrame:
    """(url, table_index, row_index, column_name, value) — one row per cell
    (the ocr_line_item_values layout). Header-named columns when the table
    has a header row, positional ``col_N`` otherwise."""
    rows = tables.select(
        "url",
        "table_index",
        "headers",
        F.posexplode("rows").alias("row_index", "cells"),
    )
    cells = rows.select(
        "url",
        "table_index",
        "row_index",
        "headers",
        F.posexplode("cells").alias("col_index", "value"),
    )
    col_name = F.coalesce(
        F.try_element_at("headers", F.col("col_index") + 1),
        F.concat(F.lit("col_"), F.col("col_index").cast("string")),
    )
    return cells.select(
        "url",
        F.col("table_index").cast("int"),
        F.col("row_index").cast("int"),
        col_name.alias("column_name"),
        "value",
    )


def convert_table_cells(cells: DataFrame, sub_fields: DataFrame) -> DataFrame:
    """Typed conversion per column: join the (column_name, data_type)
    sub-field dimension (broadcast) and apply the schema-driven dispatch;
    unknown columns pass through as text. Error-as-data per cell."""
    joined = cells.join(F.broadcast(sub_fields), "column_name", "left")
    conv = convert_by_type(F.col("value"), F.coalesce(F.col("data_type"), F.lit("text")))
    return joined.select(
        "url",
        "table_index",
        "row_index",
        "column_name",
        F.col("value").alias("original_value"),
        conv.getField("value").alias("value"),
        conv.getField("error").alias("conversion_error"),
    )
