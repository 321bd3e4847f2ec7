"""Deterministic text extraction for simple PDF payloads.

pdfminer-style layout analysis is out of reach in this environment (pdfminer
is not installed), so this is a minimal, honest content-stream text parser:
it handles uncompressed and stdlib-decodable filter chains (**FlateDecode**
— the dominant real-world filter — plus ASCIIHexDecode and ASCII85Decode,
in any declared order) and the text-showing operators ``Tj`` / ``'`` /
``\"`` / ``TJ`` (literal and <hex> strings, kerning-aware word spacing),
emitting one output line per text-positioning move. Non-content streams
(XRef/ObjStm/Metadata/Image) are skipped. Filters with no stdlib decoder
(DCT, LZW, JBIG2, …) and corrupt data are reported as an error-as-data
row, never an exception — matching the reference's carry-the-error
semantics (``ocr_backend/app/utils/data_conversion.py:261-302``).

Maps the reference's per-payload-category branching
(``ocr_backend/app/utils/gemini_ocr.py:50-91``: MIME sniff →
image/video/audio/document strategy) onto the ``%PDF-`` magic-byte branch.

Like the HTML kernel this is a pure function of the payload bytes —
byte-identical output at any parallelism.
"""

from __future__ import annotations

import re
import zlib

# (?<!end): the keyword 'endstream' contains 'stream' — without the
# lookbehind every stream terminator would start a bogus phantom stream
# spanning to the NEXT terminator, duplicating content in any multi-stream
# (i.e. multi-page) PDF. Single-stream files masked this.
_STREAM_KW = re.compile(rb"(?<!end)stream\r?\n")
_DICT_TOKEN = re.compile(rb"<<|>>")
# Direct /Length only: an indirect reference '/Length 5 0 R' (the dominant
# shape in real PDFs) must NOT match, or the stream would be sliced to the
# object number — the negative lookahead rejects 'N G R' and falls back to
# the endstream-delimited heuristic below.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_FILTER_RE = re.compile(rb"/Filter\s*(?:/(\w+)|\[\s*((?:/\w+\s*)*)\])")
# PDF literal string: parenthesized with backslash escapes (no nesting support
# needed for the operator subset we target).
_TEXT_OP_RE = re.compile(
    rb"((?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(?:Tj|'|\"))"  # literal or hex show
    rb"|(\[(?:[^\]\\]|\\.|<[0-9A-Fa-f\s]*>)*\]\s*TJ)"              # TJ arrays, both kinds
    rb"|(T\*|TD|Td)"                                                # line moves → newline
)
_STRING_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>")
# TJ array elements in order: literal/hex strings and positioning numbers.
_TJ_ITEM_RE = re.compile(
    rb"(\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)|(-?\d+(?:\.\d+)?)"
)


def _string_bytes(token: bytes) -> bytes:
    """Decode a PDF string token — ``(literal)`` with escapes or ``<hex>``
    pairs (odd final digit zero-padded per spec). Hex strings are shown as
    their byte values; without per-font encoding tables (CID maps need the
    font program) this is the honest single-byte-encoding reading."""
    if token[:1] == b"(":
        return _unescape(token[1:-1])
    hx = b"".join(token[1:-1].split())
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except ValueError:  # pragma: no cover - regex admits hex digits only
        return b""
#: TJ offsets are thousandths of an em of NEGATIVE displacement; a shift
#: this large renders as visible whitespace (a word space glyph is ~250;
#: kerning pairs are tens). pdfminer-style layout analysis derives this
#: from glyph positions — this fixed threshold is the streaming-parser
#: equivalent, pinned by tests/test_kernels.py.
TJ_WORD_SPACE_THRESHOLD = -180.0

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


def _object_dict(data: bytes, stream_kw_start: int) -> bytes:
    """The ``<< ... >>`` dictionary immediately preceding a stream keyword
    (balanced against nested dicts); empty bytes when absent."""
    end = data.rfind(b">>", 0, stream_kw_start)
    if end < 0:
        return b""
    depth = 1
    # walk token-wise backwards until the matching '<<'
    tokens = [(m.start(), m.group()) for m in _DICT_TOKEN.finditer(data, 0, end)]
    for pos, tok in reversed(tokens):
        if tok == b">>":
            depth += 1
        else:
            depth -= 1
            if depth == 0:
                return data[pos : end + 2]
    return b""


#: Stream object types that are NOT page content: cross-reference streams,
#: object streams, XML metadata, embedded files, and image XObjects — all
#: carry binary/opaque payloads that can contain accidental ``(..) Tj``
#: byte patterns, which would inject garbage into the extracted text.
_NON_CONTENT_RE = re.compile(
    rb"/Type\s*/(?:XRef|ObjStm|Metadata|EmbeddedFile)|/Subtype\s*/Image"
)


def _decoded_streams(data: bytes):
    """Yield (stream_bytes | None, error | None) per content stream."""
    for m in _STREAM_KW.finditer(data):
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        obj = _object_dict(data, m.start())
        if _NON_CONTENT_RE.search(obj):
            continue  # xref/object-stream/metadata/image: never page text
        lm = _LENGTH_RE.search(obj)
        if lm is not None and start + int(lm.group(1)) <= end:
            # /Length is authoritative (PDF spec) — EOL bytes beyond it are
            # the separator, EOL bytes inside it are real (deflate) data
            raw = data[start : start + int(lm.group(1))]
        else:
            raw = data[start:end]
            # heuristic: strip exactly ONE end-of-line before 'endstream'
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        fm = _FILTER_RE.search(obj)
        if fm is None:
            yield raw, None
            continue
        names = [fm.group(1)] if fm.group(1) else re.findall(rb"/(\w+)", fm.group(2) or b"")
        yield _apply_filters(raw, names)


def _apply_filters(raw: bytes, names: list[bytes]):
    """Apply a PDF filter chain in declaration order. Stdlib-decodable
    filters are decoded for real (FlateDecode/zlib, ASCIIHexDecode,
    ASCII85Decode — including the [ASCII85Decode FlateDecode] chain common
    in text tooling); anything else stays an honest error-as-data row."""
    for name in names:
        if name == b"FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                return None, "pdf-flate-error"
        elif name == b"ASCIIHexDecode":
            body = raw.split(b">")[0]
            hx = b"".join(body.split())
            if len(hx) % 2:
                hx += b"0"
            try:
                raw = bytes.fromhex(hx.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                return None, "pdf-asciihex-error"
        elif name == b"ASCII85Decode":
            import base64

            body = raw.split(b"~>")[0]
            try:
                raw = base64.a85decode(b"".join(body.split()), adobe=False)
            except ValueError:
                return None, "pdf-ascii85-error"
        else:
            return None, "pdf-unsupported-filter"
    return raw, None


def extract_pdf(data: bytes) -> tuple[str, list[tuple[str, int, int, str]], str | None]:
    """Extract text + line spans from PDF bytes; returns (text, spans, error)."""
    try:
        lines: list[str] = []
        current: list[str] = []
        first_error: str | None = None
        saw_stream = False

        def flush() -> None:
            if current:
                text = "".join(current).strip()
                if text:
                    lines.append(text)
                current.clear()

        for stream, err in _decoded_streams(data):
            saw_stream = True
            if err is not None:
                if first_error is None:
                    first_error = err
                continue
            for m in _TEXT_OP_RE.finditer(stream):
                tj, tj_array, move = m.group(1), m.group(2), m.group(3)
                if move is not None:
                    flush()
                elif tj is not None:
                    # ' and " are move-to-next-line-then-show (T* + Tj)
                    if tj.rstrip().endswith((b"'", b'"')):
                        flush()
                    tok = _STRING_RE.search(tj).group(0)
                    current.append(_string_bytes(tok).decode("utf-8", errors="replace"))
                elif tj_array is not None:
                    # kerning-aware: a displacement beyond the word-space
                    # threshold between two strings renders as whitespace
                    pending_space = False
                    for mi in _TJ_ITEM_RE.finditer(tj_array):
                        s, num = mi.group(1), mi.group(2)
                        if s is not None:
                            if pending_space:
                                current.append(" ")
                                pending_space = False
                            current.append(
                                _string_bytes(s).decode("utf-8", errors="replace")
                            )
                        elif float(num) <= TJ_WORD_SPACE_THRESHOLD:
                            pending_space = True
            flush()
        if not saw_stream:
            return "", [], "pdf-no-content-stream"
        if not lines and first_error is not None:
            return "", [], first_error
        text = "\n".join(lines)
        spans: list[tuple[str, int, int, str]] = []
        pos = 0
        for i, ln in enumerate(lines):
            if i:
                pos += 1  # "\n"
            spans.append(("line", pos, pos + len(ln), ln))
            pos += len(ln)
        return text, spans, first_error
    except Exception as exc:
        return "", [], f"pdf-parse-error: {type(exc).__name__}: {exc}"
