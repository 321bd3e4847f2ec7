"""Page-metadata extraction — the <head> face of the extraction tier.

The main-content kernel (html_extract.py) deliberately drops ``<head>``:
titles, meta descriptions, canonical links, Open Graph tags, robots
directives and hreflang alternates are not *content*. But a web-corpus
pipeline needs exactly those fields — canonical URLs feed URL-level dedup
before any content hash, ``og:locale``/``lang`` attributes are priors for
language ID, robots ``noindex`` pages must be droppable at curation time,
and titles/descriptions are the display layer of any search face (the
reference's document list endpoints surface name/metadata per document,
``ocr_backend/app/api/document_routes.py`` — this kernel is that metadata
face for web pages).

Dialect-parity contract
-----------------------
Every field is defined by a small regular expression chosen to evaluate
IDENTICALLY under Python ``re`` and RE2 (DuckDB's ``regexp_extract``):
no lookaround, no backreferences, ASCII-only classes, ``(?is)`` flags
only. The catalog oracle re-runs the same patterns in DuckDB over the
staged decoded payload, so the parse itself is verified cross-engine —
not just a rollup of it. Conventions shared by both engines:

- double-quoted attribute values only (the overwhelmingly dominant form;
  single-quoted/unquoted attributes are out of contract and read as
  absent in both engines);
- both attribute orders are tried (``name=.. content=..`` and
  ``content=.. name=..``) and coalesced;
- an empty matched value is treated as ABSENT (DuckDB's
  ``regexp_extract`` returns '' for no-match, so '' → NULL is the only
  convention that round-trips; an empty ``content=""`` carries no
  information anyway);
- first match wins (``re.search`` ≡ ``regexp_extract``).
"""

from __future__ import annotations

import re

from ocr_platform_spark.kernels.html_extract import decode_html

# ---------------------------------------------------------------------------
# field patterns — keep in lockstep with sql_exprs() below
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"(?is)<title[^>]*>([^<]*)")
_LANG_RE = re.compile(r'(?is)<html[^>]*?[ \t\n]lang="([^"]*)"')

# meta/link attribute pairs, both orders, double-quoted values
_DESC_NC = re.compile(r'(?is)<meta[ \t\n][^>]*?name="description"[^>]*?content="([^"]*)"')
_DESC_CN = re.compile(r'(?is)<meta[ \t\n][^>]*?content="([^"]*)"[^>]*?name="description"')
_ROBOTS_NC = re.compile(r'(?is)<meta[ \t\n][^>]*?name="robots"[^>]*?content="([^"]*)"')
_ROBOTS_CN = re.compile(r'(?is)<meta[ \t\n][^>]*?content="([^"]*)"[^>]*?name="robots"')
_CANON_RH = re.compile(r'(?is)<link[ \t\n][^>]*?rel="canonical"[^>]*?href="([^"]*)"')
_CANON_HR = re.compile(r'(?is)<link[ \t\n][^>]*?href="([^"]*)"[^>]*?rel="canonical"')
_OGT_PC = re.compile(r'(?is)<meta[ \t\n][^>]*?property="og:title"[^>]*?content="([^"]*)"')
_OGT_CP = re.compile(r'(?is)<meta[ \t\n][^>]*?content="([^"]*)"[^>]*?property="og:title"')
_OGL_PC = re.compile(r'(?is)<meta[ \t\n][^>]*?property="og:locale"[^>]*?content="([^"]*)"')
_OGL_CP = re.compile(r'(?is)<meta[ \t\n][^>]*?content="([^"]*)"[^>]*?property="og:locale"')
_HREFLANG_RE = re.compile(r'(?i)hreflang="')
# full alternate pairs: hreflang-before-href attribute order only (the
# dominant authored form and the only one the corpus emits; the reversed
# order reads as absent on every engine — same single-order restriction
# as the contract's double-quoted-values rule). Both capture groups live
# in one pattern so group-1 and group-2 extract_all lists are positionally
# aligned by construction on every engine.
_ALT_HH = re.compile(
    r'(?is)<link[ \t\n][^>]*?hreflang="([^"]*)"[^>]*?href="([^"]*)"'
)

FIELDS = (
    "title",
    "description",
    "canonical",
    "lang",
    "og_title",
    "og_locale",
    "robots",
)


def _first(raw: str, *patterns: re.Pattern) -> str | None:
    """First non-empty group-1 match across ``patterns`` ('' ≡ absent —
    the DuckDB round-trip convention documented above)."""
    for p in patterns:
        m = p.search(raw)
        if m is not None and m.group(1):
            return m.group(1)
    return None


def page_metadata(data: bytes | None) -> dict:
    """(raw, title, description, canonical, lang, og_title, og_locale,
    robots, n_hreflang) for one payload. ``raw`` is the charset-decoded
    document (decode_html — the same decode the content kernel uses), kept
    so the oracle can replay every pattern over identical characters.
    Non-HTML payloads (PDF magic) yield raw='' and all-absent fields —
    metadata is an HTML concept."""
    if not data or data[:5] == b"%PDF-":
        return {
            "raw": "",
            **{f: None for f in FIELDS},
            "n_hreflang": 0,
        }
    raw = decode_html(data)
    return {
        "raw": raw,
        "title": _first(raw, _TITLE_RE),
        "description": _first(raw, _DESC_NC, _DESC_CN),
        "canonical": _first(raw, _CANON_RH, _CANON_HR),
        "lang": _first(raw, _LANG_RE),
        "og_title": _first(raw, _OGT_PC, _OGT_CP),
        "og_locale": _first(raw, _OGL_PC, _OGL_CP),
        "robots": _first(raw, _ROBOTS_NC, _ROBOTS_CN),
        "n_hreflang": len(_HREFLANG_RE.findall(raw)),
    }


def hreflang_alternates(raw: str) -> list[tuple[str, str]]:
    """(hreflang, href) pairs in document order — the declared-alternate
    face of the <head>: each pair names a translation of this page at
    another URL. Empty lang or href reads as absent (dropped), matching
    the ''≡absent convention. Python half of the parity contract;
    :func:`alternates_sql_exprs` is the DuckDB half and the catalog query
    runs the same pattern JVM-side via ``F.regexp_extract_all`` — one
    pattern string, three engines."""
    return [(lg, hf) for lg, hf in _ALT_HH.findall(raw) if lg and hf]


def alternates_sql_exprs(raw_col: str = "raw") -> tuple[str, str]:
    """DuckDB expressions for the positionally-aligned (hreflang list,
    href list) of :func:`hreflang_alternates` — unnest both in one SELECT
    (DuckDB zips parallel unnests) to recover the pairs."""
    pat = _ALT_HH.pattern
    return (
        f"regexp_extract_all({raw_col}, '{pat}', 1)",
        f"regexp_extract_all({raw_col}, '{pat}', 2)",
    )


def sql_exprs(raw_col: str = "raw") -> dict[str, str]:
    """The DuckDB twin of every field, as SQL expressions over the staged
    decoded payload column — the oracle builds its SELECT from this dict so
    kernel and oracle can never drift apart silently (one pattern string,
    two engines). RE2 escaping: patterns contain no characters needing
    SQL-level escaping beyond doubling single quotes (there are none)."""

    def _co(*pats: re.Pattern) -> str:
        parts = [
            f"NULLIF(regexp_extract({raw_col}, '{p.pattern}', 1), '')" for p in pats
        ]
        return "COALESCE(" + ", ".join(parts) + ")" if len(parts) > 1 else parts[0]

    return {
        "title": _co(_TITLE_RE),
        "description": _co(_DESC_NC, _DESC_CN),
        "canonical": _co(_CANON_RH, _CANON_HR),
        "lang": _co(_LANG_RE),
        "og_title": _co(_OGT_PC, _OGT_CP),
        "og_locale": _co(_OGL_PC, _OGL_CP),
        "robots": _co(_ROBOTS_NC, _ROBOTS_CN),
        "n_hreflang": (
            f"CAST(len(regexp_extract_all({raw_col}, '{_HREFLANG_RE.pattern}')) AS INT)"
        ),
    }
