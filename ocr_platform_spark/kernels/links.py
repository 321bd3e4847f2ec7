"""Outlink extraction — the crawl-graph kernel.

A training-data pipeline over web text needs the link structure as well as
the content (dedup by URL normalization, host-level quality signals,
PageRank-family scores all start from the edge list). The reference has no
crawl face (single uploaded documents), so this kernel extends the engine
the same way the dedup/ANN operators do: a deterministic, pure function of
the payload bytes, run via ``mapInArrow`` over whole partitions.

Scope: ``<a href>`` targets, resolved against the source URL — absolute
http(s) kept as-is, protocol-relative and root/relative paths resolved,
fragments dropped, javascript:/mailto:/data: ignored. No DOM needed: one
regex pass over the anchor tags (attribute-aware, quote-safe — the content
tokenizer deliberately drops attributes, so this is its own scan).
"""

from __future__ import annotations

import re

from ocr_platform_spark.kernels.feed_extract import looks_like_feed
from ocr_platform_spark.kernels.html_extract import decode_html
from ocr_platform_spark.kernels.sitemap_extract import (
    looks_like_sitemap,
    sitemap_entries,
)

# Pre-href attribute run: complete attributes only (name, optional =value,
# quoted values may contain '>'), each followed by whitespace — so
# ``data-href=...`` can't trigger a match (no word-boundary leak) and a
# quoted '>' in an earlier attribute (``title="x > y"``) doesn't end the
# scan before href is seen.
_ANCHOR_RE = re.compile(
    r"<a\s(?:(?:[^<>\s\"'=]|\"[^\"]*\"|'[^']*'|=)+\s)*?"
    r"href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))",
    re.I | re.S,
)
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_HOST_RE = re.compile(r"^(https?)://([^/?#]+)", re.I)


def _split_src(src_url: str) -> tuple[str, str, str]:
    """(scheme, host, dir_path) of the source url; tolerant defaults."""
    m = _HOST_RE.match(src_url)
    if not m:
        return "https", "", "/"
    scheme, host = m.group(1).lower(), m.group(2)
    rest = src_url[m.end() :]
    path = rest.split("?", 1)[0].split("#", 1)[0]
    if not path.startswith("/"):
        path = "/"
    d = path.rsplit("/", 1)[0] + "/"
    return scheme, host, d


def resolve_href(src_url: str, href: str) -> str | None:
    """One resolved absolute URL or None (non-navigational/unsupported)."""
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    href = href.split("#", 1)[0]  # fragments dropped on EVERY branch
    scheme, host, d = _split_src(src_url)
    if href.startswith("//"):
        return f"{scheme}:{href}"
    m = _SCHEME_RE.match(href)
    if m:
        low = href.lower()
        if low.startswith(("http://", "https://")):
            return href
        return None  # javascript:, mailto:, data:, tel:, ...
    if not host:
        return None
    if href.startswith("/"):
        return f"{scheme}://{host}{href}"
    return f"{scheme}://{host}{d}{href}"


# Feed link elements: RSS carries the target as element text
# (``<link>https://…</link>``), Atom as an href attribute
# (``<link href="…" rel="alternate"/>``). One scan handles both: an href
# attribute wins; otherwise a non-self-closing element contributes its
# text. Attribute values are assumed quote-clean ('>' inside a quoted
# feed attribute is vanishingly rare machine-generated XML).
_LINK_OPEN_RE = re.compile(r"<link(\s[^>]*)?>", re.I | re.S)
# quoted forms only: XML requires quoted attribute values, and an
# unquoted branch cannot distinguish a URL's trailing '/' from the
# self-close '/>' (an earlier variant truncated unquoted hrefs at the
# first '/', losing the edge entirely)
_HREF_ATTR_RE = re.compile(
    r"(?:^|\s)href\s*=\s*(?:\"([^\"]*)\"|'([^']*)')", re.I
)
_LINK_CLOSE_RE = re.compile(r"</link\s*>", re.I)


def _feed_hrefs(raw: str) -> list[str]:
    out: list[str] = []
    for m in _LINK_OPEN_RE.finditer(raw):
        attrs = m.group(1) or ""
        ha = _HREF_ATTR_RE.search(attrs)
        if ha:
            out.append(ha.group(1) or ha.group(2) or "")
            continue
        if attrs.rstrip().endswith("/"):
            continue  # self-closing without href
        c = _LINK_CLOSE_RE.search(raw, m.end())
        if c:
            out.append(raw[m.end() : c.start()].strip())
    return out


def _raw_hrefs(src_url: str, data: bytes) -> tuple[str, list[str]]:
    """(decoded_payload, unresolved hrefs in document order) — sitemaps
    contribute their ``<loc>`` entries, feeds scan ``<link>`` elements,
    pages scan ``<a href>`` anchors (sniff order mirrors the dispatch)."""
    raw = decode_html(data)
    if looks_like_sitemap(data):
        return raw, [e["loc"] for e in sitemap_entries(data)]
    if looks_like_feed(data):
        return raw, _feed_hrefs(raw)
    return raw, [
        m.group(1) or m.group(2) or m.group(3) or ""
        for m in _ANCHOR_RE.finditer(raw)
    ]


def extract_links(src_url: str, data: bytes) -> list[str]:
    """All resolved outlink URLs of a page OR feed, document order,
    duplicates kept (the caller decides whether multiplicity matters).
    Feed payloads contribute their ``<link>`` targets — the crawl-frontier
    edges syndication XML exists to provide."""
    if not data:
        return []
    _, hrefs = _raw_hrefs(src_url, data)
    out: list[str] = []
    for href in hrefs:
        resolved = resolve_href(src_url, href)
        if resolved is not None:
            out.append(resolved)
    return out


_A_CLOSE_RE = re.compile(r"</a\s*>", re.I)
_TAG_STRIP_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_MAX_ANCHOR_CHARS = 200


def _tag_end(raw: str, i: int) -> int:
    """Index of the '>' closing the tag whose attributes start at ``i``,
    quote-aware (a '>' inside a quoted attribute value does not close the
    tag); ``len(raw)`` if unterminated."""
    n = len(raw)
    inq: str | None = None
    while i < n:
        c = raw[i]
        if inq is not None:
            if c == inq:
                inq = None
        elif c in "\"'":
            inq = c
        elif c == ">":
            return i
        i += 1
    return n


def extract_links_with_anchors(src_url: str, data: bytes) -> list[tuple[str, str]]:
    """(resolved_url, anchor_text) per outlink, document order.

    Anchor text = the content between the ``<a ...>`` tag's quote-aware
    closing '>' and the first following ``</a>``, inner tags stripped,
    whitespace collapsed, truncated to {max} chars. A missing ``</a>``
    (truncated page) yields an empty anchor rather than swallowing the
    rest of the document. Feed and sitemap payloads yield the same edge
    set as :func:`extract_links` with empty anchor text (feed ``<link>``
    and sitemap ``<loc>`` elements carry no anchor).""".format(
        max=_MAX_ANCHOR_CHARS
    )
    if not data:
        return []
    raw = decode_html(data)
    if looks_like_sitemap(data):
        return [
            (r, "")
            for r in (
                resolve_href(src_url, e["loc"]) for e in sitemap_entries(data)
            )
            if r is not None
        ]
    if looks_like_feed(data):
        return [
            (r, "")
            for r in (resolve_href(src_url, h) for h in _feed_hrefs(raw))
            if r is not None
        ]
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_RE.finditer(raw):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        resolved = resolve_href(src_url, href)
        if resolved is None:
            continue
        gt = _tag_end(raw, m.end())
        close = _A_CLOSE_RE.search(raw, gt + 1)
        inner = raw[gt + 1 : close.start()] if close else ""
        anchor = _WS_RE.sub(" ", _TAG_STRIP_RE.sub(" ", inner)).strip()
        out.append((resolved, anchor[:_MAX_ANCHOR_CHARS]))
    return out
