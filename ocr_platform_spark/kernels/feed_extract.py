"""Deterministic RSS/Atom feed text extraction.

Common-Crawl-style captures include syndication feeds alongside pages; the
reference's extension→MIME map routes ``.xml`` payloads to its document
branch (``ocr_backend/app/utils/gemini_ocr.py:10-48``), so the rebuild
gives feeds their own extraction branch next to HTML and PDF. Same
contract as the other kernels: a *pure function of the payload bytes* —
same bytes in → same text out on any executor at any parallelism — with
errors carried as data, never raised.

Extraction rule (fixture-pinned; changing it changes golden output):

- the first ``<title>`` appearing BEFORE the first item/entry is the feed
  title block;
- each ``<item>`` (RSS) / ``<entry>`` (Atom) contributes its ``<title>``
  block then its ``<description>`` / ``<summary>`` / ``<content>`` block,
  in document order;
- every block is cleaned by: CDATA unwrap → tag strip → entity unescape →
  whitespace collapse. Tags are stripped BEFORE entities are unescaped
  (single pass — escaped markup like ``&lt;b&gt;`` survives as text; the
  reverse order would double-interpret it, the bug class render.py's
  xlsx reader documents);
- empty blocks are skipped; blocks join with a blank line.

Feeds are machine-generated XML, so a regex item scanner (items never
nest) is deterministic and tolerant of the malformed tails real feeds
have; a full XML parser would reject exactly the documents a crawl most
needs to salvage.
"""

from __future__ import annotations

import re
from html import unescape

from ocr_platform_spark.kernels.html_extract import decode_html

_ITEM_RE = re.compile(r"<(item|entry)(?:\s[^>]*)?>(.*?)</\1\s*>", re.I | re.S)
_TITLE_RE = re.compile(r"<title(?:\s[^>]*)?>(.*?)</title\s*>", re.I | re.S)
_BODY_RES = tuple(
    re.compile(rf"<{t}(?:\s[^>]*)?>(.*?)</{t}\s*>", re.I | re.S)
    for t in ("description", "summary", "content")
)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Detection: a feed root tag within the sniff window (XHTML also starts
# with ``<?xml`` — the root tag, not the declaration, is the signal).
_FEED_ROOT_RE = re.compile(rb"<(rss|feed)[\s>]", re.I)
SNIFF_BYTES = 512


def looks_like_feed(data: bytes) -> bool:
    """True iff an ``<rss``/``<feed`` root tag appears in the first
    ``SNIFF_BYTES`` bytes (cheap, runs inside the dispatch sniffer)."""
    return _FEED_ROOT_RE.search(data[:SNIFF_BYTES]) is not None


def clean_block(raw: str) -> str:
    """CDATA unwrap → tag strip → entity unescape → whitespace collapse."""
    s = _CDATA_RE.sub(r"\1", raw)
    s = _TAG_RE.sub(" ", s)
    s = unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_feed(
    data: bytes,
) -> tuple[str, list[tuple[str, int, int, str]], str | None]:
    """(text, spans, error) for an RSS/Atom payload.

    ``spans`` are ``(field, start, end, value)`` character offsets into
    ``text``, with field ∈ {feed-title, title, body}. An item-less feed
    yields its title alone; a block-less feed yields ("", [], None) —
    empty is data, not an error (gemini_ocr.py:235-248 keeps nulls)."""
    raw = decode_html(data)
    blocks: list[tuple[str, str]] = []
    first_item = _ITEM_RE.search(raw)
    head = raw[: first_item.start()] if first_item else raw
    mt = _TITLE_RE.search(head)
    if mt:
        t = clean_block(mt.group(1))
        if t:
            blocks.append(("feed-title", t))
    for m in _ITEM_RE.finditer(raw):
        body = m.group(2)
        it = _TITLE_RE.search(body)
        if it:
            t = clean_block(it.group(1))
            if t:
                blocks.append(("title", t))
        for rx in _BODY_RES:
            ib = rx.search(body)
            if ib:
                b = clean_block(ib.group(1))
                if b:
                    blocks.append(("body", b))
                break
    parts: list[str] = []
    spans: list[tuple[str, int, int, str]] = []
    pos = 0
    for field, val in blocks:
        if parts:
            pos += 2  # the joining blank line
        spans.append((field, pos, pos + len(val), val))
        pos += len(val)
        parts.append(val)
    return "\n\n".join(parts), spans, None
