"""Deterministic text extraction for simple (uncompressed) PDF payloads.

pdfminer-style layout analysis is out of reach in this environment (pdfminer
is not installed), so this is a minimal, honest content-stream text parser:
it handles uncompressed content streams and the text-showing operators
``Tj`` / ``'`` / ``TJ``, emitting one output line per text-positioning move.
Compressed (``/Filter``-ed) streams are reported as an error-as-data row,
never an exception — matching the reference's carry-the-error semantics
(``ocr_backend/app/utils/data_conversion.py:261-302``).

Maps the reference's per-payload-category branching
(``ocr_backend/app/utils/gemini_ocr.py:50-91``: MIME sniff →
image/video/audio/document strategy) onto the ``%PDF-`` magic-byte branch.

Like the HTML kernel this is a pure function of the payload bytes —
byte-identical output at any parallelism.
"""

from __future__ import annotations

import re

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# PDF literal string: parenthesized with backslash escapes (no nesting support
# needed for the operator subset we target).
_TEXT_OP_RE = re.compile(
    rb"(\((?:[^()\\]|\\.)*\)\s*(?:Tj|'))"  # (string) Tj   or   (string) '
    rb"|(\[(?:[^\]\\]|\\.)*\]\s*TJ)"       # [ (s1) -250 (s2) ] TJ
    rb"|(T\*|TD|Td)"                        # line moves → newline
)
_STRING_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(literal: bytes) -> bytes:
    """Decode a PDF literal string body (without the outer parens)."""
    out = bytearray()
    i = 0
    n = len(literal)
    while i < n:
        c = literal[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = literal[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ooo (1-3 digits)
                j = i + 1
                while j < min(i + 4, n) and literal[j : j + 1].isdigit():
                    j += 1
                out.append(int(literal[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: swallow
            continue
        out += c
        i += 1
    return bytes(out)


def extract_pdf(data: bytes) -> tuple[str, list[tuple[str, int, int, str]], str | None]:
    """Extract text + line spans from PDF bytes; returns (text, spans, error)."""
    try:
        streams = _STREAM_RE.findall(data)
        if not streams:
            return "", [], "pdf-no-content-stream"
        # Detect compressed streams: a /Filter entry anywhere in the object
        # dictionaries means we can't honestly decode — error as data.
        if b"/Filter" in data:
            return "", [], "pdf-unsupported-filter"
        lines: list[str] = []
        current: list[str] = []

        def flush() -> None:
            if current:
                text = "".join(current).strip()
                if text:
                    lines.append(text)
                current.clear()

        for stream in streams:
            for m in _TEXT_OP_RE.finditer(stream):
                tj, tj_array, move = m.group(1), m.group(2), m.group(3)
                if move is not None:
                    flush()
                elif tj is not None:
                    body = _STRING_RE.search(tj).group(0)[1:-1]
                    current.append(_unescape(body).decode("utf-8", errors="replace"))
                elif tj_array is not None:
                    for s in _STRING_RE.findall(tj_array):
                        current.append(_unescape(s[1:-1]).decode("utf-8", errors="replace"))
            flush()
        text = "\n".join(lines)
        spans: list[tuple[str, int, int, str]] = []
        pos = 0
        for i, ln in enumerate(lines):
            if i:
                pos += 1  # "\n"
            spans.append(("line", pos, pos + len(ln), ln))
            pos += len(ln)
        return text, spans, None
    except Exception as exc:
        return "", [], f"pdf-parse-error: {type(exc).__name__}: {exc}"
