"""Payload-kind sniffing + extraction dispatch.

Re-expresses the reference's MIME/type detection and category branching
(``ocr_backend/app/utils/gemini_ocr.py:50-91``, extension→MIME map ``:10-48``)
as magic-byte sniffing over the inline ``html BINARY`` column — the rebuild
carries payloads in the table, not on a filesystem (SURVEY.md §1.4).
"""

from __future__ import annotations

from ocr_platform_spark.kernels.feed_extract import extract_feed, looks_like_feed
from ocr_platform_spark.kernels.html_extract import extract_html
from ocr_platform_spark.kernels.pdf_extract import extract_pdf
from ocr_platform_spark.kernels.sitemap_extract import (
    extract_sitemap,
    looks_like_sitemap,
)

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_FEED = "feed"
KIND_SITEMAP = "sitemap"
KIND_EMPTY = "empty"


def sniff_payload_kind(data: bytes | None) -> str:
    """Classify payload bytes. ``%PDF-`` magic → pdf; a
    ``<urlset``/``<sitemapindex`` root tag in the sniff window → sitemap;
    an ``<rss``/``<feed`` root tag → feed (root tags, not an ``<?xml``
    declaration, are the signal — XHTML starts with ``<?xml`` too); else
    html (the catch-all document branch, mirroring gemini_ocr.py:83-91's
    default category)."""
    if not data:
        return KIND_EMPTY
    if data[:5] == b"%PDF-":
        return KIND_PDF
    if looks_like_sitemap(data):
        return KIND_SITEMAP
    if looks_like_feed(data):
        return KIND_FEED
    return KIND_HTML


def extract_payload(
    data: bytes | None,
) -> tuple[str, str, list[tuple[str, int, int, str]], str | None]:
    """Dispatch on payload kind; returns (kind, text, spans, error).

    Never raises: every failure mode becomes an ``error`` string
    (error-as-data, cf. ``data_conversion.py:261-302``).
    """
    kind = sniff_payload_kind(data)
    if kind == KIND_EMPTY:
        return kind, "", [], None
    if kind == KIND_PDF:
        text, spans, err = extract_pdf(data)
    elif kind == KIND_SITEMAP:
        text, spans, err = extract_sitemap(data)
    elif kind == KIND_FEED:
        text, spans, err = extract_feed(data)
    else:
        text, spans, err = extract_html(data)
    return kind, text, spans, err
