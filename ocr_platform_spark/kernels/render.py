"""Deterministic presentation renderers — the export formats (SURVEY.md S6).

The reference's export job materializes result sets as PDF / EXCEL / CSV /
JSON files (``ocr_backend/app/api/export_routes.py:23-48``, format enum
``app/utils/enums.py:26-30``). CSV/JSON/parquet are native ``df.write``
formats (sources/export.py); PDF and XLSX need renderers. No presentation
library is installed here, so these are minimal from-scratch writers over
stdlib only — and, like every kernel in this engine, pure functions of
their input bytes: byte-identical output at any parallelism (no
timestamps, no randomness, fixed object ordering).

``render_pdf`` emits exactly the PDF subset the engine's own reader
(kernels/pdf_extract.py) parses — uncompressed content stream, direct
``/Length``, ``Td/TD`` line moves + ``Tj`` show-text — so exports
round-trip: ``extract_pdf(render_pdf(lines)) == "\\n".join(lines)``
(pinned in tests/test_render.py).

``render_xlsx`` emits a minimal OOXML workbook (one sheet, inline
strings) as a STORED zip with a fixed 1980 DOS timestamp — byte-stable
and openable by spreadsheet tools / openpyxl.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

# --- PDF --------------------------------------------------------------------

_PAGE_W, _PAGE_H = 612, 792  # US Letter, the conventional default
_MARGIN, _LEADING, _FONT_SIZE = 72, 14, 12


def _pdf_escape(s: str) -> bytes:
    out = s.encode("utf-8")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def render_pdf(lines: list[str]) -> bytes:
    """One-page-per-~48-lines PDF with Helvetica text, one ``Tj`` per line.

    Uncompressed content streams with a direct ``/Length`` — the exact
    subset kernels/pdf_extract.py decodes, making export→extract a byte
    round-trip on the text."""
    per_page = (_PAGE_H - 2 * _MARGIN) // _LEADING
    pages = [lines[i : i + per_page] for i in range(0, len(lines), per_page)] or [[]]

    objects: list[bytes] = []  # 1-indexed body of each object

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_no = 1 + 1 + 2 * len(pages) + 1  # catalog, pages, (page+stream)*n, font
    page_nos: list[int] = []
    add(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    pages_no = add(b"placeholder")  # obj 2, patched below
    for chunk in pages:
        ops = [b"BT", b"/F1 %d Tf" % _FONT_SIZE, b"%d %d Td" % (_MARGIN, _PAGE_H - _MARGIN)]
        for i, line in enumerate(chunk):
            if i:
                ops.append(b"0 -%d TD" % _LEADING)
            ops.append(b"(" + _pdf_escape(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        content_no = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        page_nos.append(
            add(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
                b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
                % (_PAGE_W, _PAGE_H, content_no, font_no)
            )
        )
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # font
    kids = b" ".join(b"%d 0 R" % n for n in page_nos)
    objects[pages_no - 1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        kids,
        len(page_nos),
    )

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n%s\nendobj\n" % (i, body))
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objects) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return out.getvalue()


# --- XLSX -------------------------------------------------------------------

_XLSX_CONTENT_TYPES = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_XLSX_RELS = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WORKBOOK = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_XLSX_WORKBOOK_RELS = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def render_xlsx(header: list[str], rows: list[list[str | None]]) -> bytes:
    """Minimal one-sheet OOXML workbook, every cell an inline string (no
    shared-string table — simplest valid form). Byte-stable: STORED zip
    entries with the fixed DOS epoch timestamp."""
    body = ['<sheetData>']
    for r, row in enumerate([header] + list(rows), start=1):
        cells = []
        for c, v in enumerate(row):
            if v is None:
                continue
            cells.append(
                f'<c r="{_col_ref(c)}{r}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'
            )
        body.append(f'<row r="{r}">' + "".join(cells) + "</row>")
    body.append("</sheetData>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(body)
        + "</worksheet>"
    ).encode("utf-8")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in [
            ("[Content_Types].xml", _XLSX_CONTENT_TYPES),
            ("_rels/.rels", _XLSX_RELS),
            ("xl/workbook.xml", _XLSX_WORKBOOK),
            ("xl/_rels/workbook.xml.rels", _XLSX_WORKBOOK_RELS),
            ("xl/worksheets/sheet1.xml", sheet),
        ]:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(info, data)
    return buf.getvalue()


def parse_xlsx_sheet(data: bytes) -> list[list[str]]:
    """Read back the inline-string grid (test/verification helper)."""
    import re as _re

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml = z.read("xl/worksheets/sheet1.xml").decode("utf-8")
    rows = []
    for row_xml in _re.findall(r"<row [^>]*>(.*?)</row>", xml, _re.S):
        rows.append(
            [
                # &amp; LAST — decoding it first would double-unescape
                # literal cell text like '&lt;x&gt;' into '<x>'
                _re.sub(r"&amp;", "&", _re.sub(r"&gt;", ">", _re.sub(r"&lt;", "<", t)))
                for t in _re.findall(r"<t>(.*?)</t>", row_xml, _re.S)
            ]
        )
    return rows
