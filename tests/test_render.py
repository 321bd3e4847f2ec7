"""Presentation renderers (S6 pdf/excel): determinism, round-trips, and the
distributed export archive."""

from __future__ import annotations

from ocr_platform_spark.kernels.pdf_extract import extract_pdf
from ocr_platform_spark.kernels.render import parse_xlsx_sheet, render_pdf, render_xlsx


def test_pdf_round_trips_through_own_extractor():
    lines = ["INVOICE_NUMBER: INV-001", "TOTAL: 1,200.50", "with (parens) \\ and ", ""]
    data = render_pdf(lines)
    assert data.startswith(b"%PDF-") and data.endswith(b"%%EOF\n")
    text, spans, err = extract_pdf(data)
    assert err is None
    # extractor strips each line and drops blanks; content otherwise exact
    assert text == "\n".join(l.strip() for l in lines if l.strip())
    assert [s[3] for s in spans] == [l.strip() for l in lines if l.strip()]


def test_pdf_multipage_and_determinism():
    lines = [f"row {i}" for i in range(120)]  # > one page at 48 lines/page
    d1, d2 = render_pdf(lines), render_pdf(lines)
    assert d1 == d2  # byte-stable
    assert d1.count(b"/Type /Page ") == 3
    text, _, err = extract_pdf(d1)
    assert err is None and text == "\n".join(lines)


def test_xlsx_round_trip_and_determinism():
    header = ["field_name", "value"]
    rows = [["TITLE", "a <b> & c"], ["QTY", None], ["NOTE", "line"]]
    d1, d2 = render_xlsx(header, rows), render_xlsx(header, rows)
    assert d1 == d2 and d1[:2] == b"PK"
    grid = parse_xlsx_sheet(d1)
    assert grid[0] == header
    assert grid[1] == ["TITLE", "a <b> & c"]
    assert grid[2] == ["QTY"]  # None cell omitted
    # entity-like literal text must survive the round trip (no
    # double-unescape: '&lt;x&gt;' is the CELL TEXT, not markup)
    ent = render_xlsx(["v"], [["&lt;x&gt; &amp; y"]])
    assert parse_xlsx_sheet(ent)[1] == ["&lt;x&gt; &amp; y"]


def test_export_archive_distributed(spark, tmp_path):
    from ocr_platform_spark.sources.export import export_results

    rows = [
        (f"https://x.org/{i}", f, f"v{i}-{f}")
        for i in range(12)
        for f in ("TITLE", "DATE")
    ]
    df = spark.createDataFrame(rows, "url string, field_name string, value string")
    out = str(tmp_path / "arch")
    export_results(df, out, fmt="pdf")
    arch = spark.read.parquet(out)
    assert arch.count() == 12
    got = arch.where("url = 'https://x.org/3'").first()
    assert got["filename"].endswith(".pdf")
    text, _, err = extract_pdf(bytes(got["content"]))
    assert err is None
    assert text == "DATE: v3-DATE\nTITLE: v3-TITLE"  # sort_array field order

    out2 = str(tmp_path / "arch2")
    export_results(df, out2, fmt="excel")
    got2 = spark.read.parquet(out2).where("url = 'https://x.org/3'").first()
    from ocr_platform_spark.kernels.render import parse_xlsx_sheet

    grid = parse_xlsx_sheet(bytes(got2["content"]))
    assert grid == [
        ["field_name", "value"],
        ["DATE", "v3-DATE"],
        ["TITLE", "v3-TITLE"],
    ]


def test_pdf_roundtrip_property():
    """Property: for any printable lines, render->extract preserves the
    stripped non-blank lines exactly (hypothesis fuzz over text content
    incl. parens, backslashes, unicode)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=60
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(line, max_size=12))
    def check(lines):
        text, _, err = extract_pdf(render_pdf(lines))
        assert err is None
        expected = [l.strip() for l in lines if l.strip()]
        assert text == "\n".join(expected)

    check()
