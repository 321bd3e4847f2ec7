"""Deterministic sitemap (sitemaps.org XML) extraction.

Common-Crawl-style captures carry ``sitemap.xml`` payloads alongside pages
and feeds; they are the crawl's richest frontier source — every ``<loc>``
is a publisher-declared URL, with optional freshness metadata
(``<lastmod>``, ``<changefreq>``, ``<priority>``). The reference's
extension→MIME map routes ``.xml`` to its document branch
(``ocr_backend/app/utils/gemini_ocr.py:10-48``); the rebuild gives
sitemaps their own branch next to HTML/PDF/feed. Same kernel contract:
pure function of the payload bytes, errors as data, never raises.

Extraction rule (fixture-pinned; changing it changes golden output):

- each ``<url>`` element (``<urlset>`` documents) or ``<sitemap>`` element
  (``<sitemapindex>`` documents) contributes its ``<loc>`` value — CDATA
  unwrapped, entity-unescaped, whitespace-trimmed — as one line of text,
  in document order; entries without a ``<loc>`` are skipped;
- ``text`` is the newline-joined loc list (a sitemap's *content* is its
  URL list — the per-url byte-identity invariant applies to it like any
  other payload);
- spans: one ``('loc', start, end, value)`` per line, plus one span per
  present metadata field (``lastmod``/``changefreq``/``priority``) whose
  offsets are the OWNING loc line's offsets and whose value is the
  metadata value — the span list is the typed view that carries what the
  flat text cannot.
"""

from __future__ import annotations

import re
from html import unescape

from ocr_platform_spark.kernels.html_extract import decode_html

_ENTRY_RE = re.compile(r"<(url|sitemap)(?:\s[^>]*)?>(.*?)</\1\s*>", re.I | re.S)
_FIELD_RES = {
    f: re.compile(rf"<{f}(?:\s[^>]*)?>(.*?)</{f}\s*>", re.I | re.S)
    for f in ("loc", "lastmod", "changefreq", "priority")
}
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)

# Root tag in the sniff window (same rationale as feeds: XHTML also opens
# with <?xml — the root tag is the signal, not the declaration).
_SITEMAP_ROOT_RE = re.compile(rb"<(urlset|sitemapindex)[\s>]", re.I)
SNIFF_BYTES = 512


def looks_like_sitemap(data: bytes) -> bool:
    """True iff a ``<urlset``/``<sitemapindex`` root tag appears in the
    first ``SNIFF_BYTES`` bytes (cheap, runs inside the dispatch sniffer)."""
    return _SITEMAP_ROOT_RE.search(data[:SNIFF_BYTES]) is not None


def _clean(raw: str) -> str:
    return unescape(_CDATA_RE.sub(r"\1", raw)).strip()


def sitemap_entries(data: bytes) -> list[dict]:
    """One dict per sitemap entry, document order:
    ``{loc, lastmod, changefreq, priority, is_index}`` (absent fields
    None; ``is_index`` True for ``<sitemap>`` child-sitemap entries).
    Entries with an empty/missing ``<loc>`` are dropped."""
    raw = decode_html(data)
    out: list[dict] = []
    for m in _ENTRY_RE.finditer(raw):
        body = m.group(2)
        fields: dict[str, str | None] = {}
        for name, rx in _FIELD_RES.items():
            fm = rx.search(body)
            fields[name] = _clean(fm.group(1)) if fm else None
        if not fields["loc"]:
            continue
        fields["is_index"] = m.group(1).lower() == "sitemap"
        out.append(fields)
    return out


def extract_sitemap(
    data: bytes,
) -> tuple[str, list[tuple[str, int, int, str]], str | None]:
    """(text, spans, error) for a sitemap payload — see module docstring
    for the rule. An entry-less sitemap yields ("", [], None): empty is
    data, not an error."""
    parts: list[str] = []
    spans: list[tuple[str, int, int, str]] = []
    pos = 0
    for e in sitemap_entries(data):
        loc = e["loc"]
        if parts:
            pos += 1  # the joining newline
        start, end = pos, pos + len(loc)
        spans.append(("loc", start, end, loc))
        for f in ("lastmod", "changefreq", "priority"):
            if e[f]:
                spans.append((f, start, end, e[f]))
        pos = end
        parts.append(loc)
    return "\n".join(parts), spans, None
