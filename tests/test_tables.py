"""HTML <table> extraction → multi-column EAV cells → typed conversion
(the reference's TABLE/sub-field shape, ocr_line_item_values layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.kernels.html_extract import extract_html_tables
from ocr_platform_spark.operators.tables import (
    convert_table_cells,
    extract_tables,
    table_cells_eav,
)


def _invoice_page(n_items: int, url_key: int) -> bytes:
    rows = "".join(
        f"<tr><td>Item {url_key}-{i}</td><td>{i + 1}</td><td>$1,2{i}4.5{i}</td>"
        f"<td>2024-01-{i + 10:02d}</td></tr>"
        for i in range(n_items)
    )
    return (
        "<html><body><h1>Invoice</h1>"
        "<table><tr><th>ITEM_DESCRIPTION</th><th>QUANTITY</th>"
        "<th>UNIT_PRICE</th><th>DELIVERY_DATE</th></tr>"
        f"{rows}</table></body></html>"
    ).encode()


def _docs(spark, n=6):
    rows = [
        (f"https://t.example.org/{k}", None, _invoice_page(2 + k % 3, k), None, "en")
        for k in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_kernel_headers_and_grid():
    tables, err = extract_html_tables(_invoice_page(2, 0))
    assert err is None and len(tables) == 1
    t = tables[0]
    assert t["headers"] == ["ITEM_DESCRIPTION", "QUANTITY", "UNIT_PRICE", "DELIVERY_DATE"]
    assert t["rows"][0] == ["Item 0-0", "1", "$1,204.50", "2024-01-10"]
    assert len(t["rows"]) == 2


def test_cells_eav_shape(spark):
    cells = table_cells_eav(extract_tables(_docs(spark))).cache()
    one = cells.where(
        (F.col("url") == "https://t.example.org/0") & (F.col("row_index") == 1)
    )
    got = {r["column_name"]: r["value"] for r in one.collect()}
    assert got == {
        "ITEM_DESCRIPTION": "Item 0-1",
        "QUANTITY": "2",
        "UNIT_PRICE": "$1,214.51",
        "DELIVERY_DATE": "2024-01-11",
    }
    # headerless fallback names
    headerless = spark.createDataFrame(
        [("u", None, b"<table><tr><td>a</td><td>b</td></tr></table>", None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    hc = table_cells_eav(extract_tables(headerless))
    assert sorted(r["column_name"] for r in hc.collect()) == ["col_0", "col_1"]
    cells.unpersist()


def test_typed_cell_conversion(spark):
    sub_fields = spark.createDataFrame(
        [
            ("ITEM_DESCRIPTION", "string"),
            ("QUANTITY", "integer"),
            ("UNIT_PRICE", "currency"),
            ("DELIVERY_DATE", "date"),
        ],
        "column_name string, data_type string",
    )
    cells = table_cells_eav(extract_tables(_docs(spark)))
    conv = convert_table_cells(cells, sub_fields).cache()
    assert conv.where(F.col("conversion_error").isNotNull()).count() == 0
    row = {
        r["column_name"]: r["value"]
        for r in conv.where(
            (F.col("url") == "https://t.example.org/1") & (F.col("row_index") == 0)
        ).collect()
    }
    assert row["QUANTITY"] == "1"
    assert row["UNIT_PRICE"] == "1204.50"      # symbol/comma stripped, Decimal string
    assert row["DELIVERY_DATE"] == "10/01/2024"  # reference DD/MM/YYYY rendering
    conv.unpersist()


def test_tables_deterministic_across_partitions(spark):
    a = table_cells_eav(extract_tables(_docs(spark, 12))).collect()
    b = table_cells_eav(extract_tables(_docs(spark, 12).repartition(5))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_nested_table_keeps_parent_row_open():
    """A <td> containing a nested <table> must not split the parent row:
    per-table row/cell state is suspended at inner-table start and restored
    at its end (row_index stability for table_cells_eav on layout-table
    pages)."""
    html = (
        b"<table><tr><td>A</td>"
        b"<td><table><tr><td>X</td><td>Y</td></tr></table></td>"
        b"<td>B</td></tr>"
        b"<tr><td>C</td><td>D</td><td>E</td></tr></table>"
    )
    tables, err = extract_html_tables(html)
    assert err is None
    inner = [t for t in tables if t["rows"] == [["X", "Y"]]]
    assert len(inner) == 1
    outer = [t for t in tables if t["rows"] != [["X", "Y"]]]
    assert len(outer) == 1
    rows = outer[0]["rows"]
    assert len(rows) == 2
    assert rows[0][0] == "A" and rows[0][-1] == "B"
    assert rows[1] == ["C", "D", "E"]
