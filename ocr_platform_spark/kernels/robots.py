"""Robots meta-directive parsing: the page-level opt-out a polite corpus
build honors (``<meta name="robots" content="noindex, nofollow">``).

Scope: the HTML meta tag only — the page-level signal present in the
payload itself. (robots.txt and X-Robots-Tag headers live outside the
(url, html) table this engine ingests; a crawl frontier applies those
before the page ever lands here.)

Parsing contract (mirrors how indexers read it):

- ``name="robots"`` matched case-insensitively; attribute order free;
  quote-aware (a '>' inside a quoted attribute doesn't end the tag);
- directives split on commas, trimmed, case-folded: ``noindex`` and
  ``nofollow`` set their flags, ``none`` sets both (the defined alias);
- multiple robots metas OR together (most restrictive wins) — that is
  what "don't index if any copy of the tag says so" means;
- bot-specific metas (``name="googlebot"`` etc.) are ignored: this engine
  is not a specific crawler, so only the generic token applies.
"""

from __future__ import annotations

import re

from ocr_platform_spark.kernels.html_extract import decode_html

# complete-attribute scan like links._ANCHOR_RE: quoted values may hold '>'.
# The inner attribute run is POSSESSIVE (++, Python 3.11): the optional \s?
# separator lets the backtracking form re-segment one char run across
# outer iterations — exponential on an unterminated `<meta ` + plain text
# (~33 s at 28 chars). Possessive keeps outputs identical (give-backs can
# only land on chars the run excludes, never on the '/>' terminator) and
# makes failure linear; pinned by
# test_robots.py::test_meta_regex_pathological_inputs_linear.
_META_RE = re.compile(
    r"<meta\s(?:(?:[^<>\s\"'=]|\"[^\"]*\"|'[^']*'|=)++\s?)*?/?>",
    re.I | re.S,
)
_NAME_RE = re.compile(r"""\bname\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.I)
_CONTENT_RE = re.compile(
    r"""\bcontent\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.I
)


def parse_robots_meta(data: bytes) -> tuple[bool, bool]:
    """(noindex, nofollow) for a page's payload bytes."""
    if not data:
        return False, False
    raw = decode_html(data)
    noindex = nofollow = False
    for m in _META_RE.finditer(raw):
        tag = m.group(0)
        nm = _NAME_RE.search(tag)
        if nm is None:
            continue
        name = (nm.group(1) or nm.group(2) or nm.group(3) or "").strip().lower()
        if name != "robots":
            continue
        cm = _CONTENT_RE.search(tag)
        if cm is None:
            continue
        content = (cm.group(1) or cm.group(2) or cm.group(3) or "").lower()
        directives = {d.strip() for d in content.split(",")}
        if "none" in directives:
            noindex = nofollow = True
        if "noindex" in directives:
            noindex = True
        if "nofollow" in directives:
            nofollow = True
    return noindex, nofollow
