"""Structured-data (JSON-LD) extraction — the schema.org face of the
extraction tier.

Common-Crawl pipelines mine ``<script type="application/ld+json">`` blocks
for typed records (products, articles, breadcrumbs, organizations): the
one part of a page that is MACHINE-authored data rather than prose, and
the backbone of web-scale knowledge-graph and e-commerce corpora. The
main-content kernel (html_extract.py) rightly drops every ``<script>``;
this kernel is the complementary face that reads exactly those blocks.

Reference scope note: the OCR reference extracts typed field/table records
from documents (``ocr_backend/app/services/processing_service.py``); this
kernel is that typed-record face for web pages, where the typing comes
from schema.org annotations instead of an extraction template.

Dialect-parity contract (same discipline as kernels/page_meta.py):

- block discovery is ONE compiled regular expression, evaluated
  identically under Python ``re`` and RE2/DuckDB (no lookaround, no
  backreferences, ``(?is)`` + non-greedy only), double-quoted ``type``
  attribute (the dominant form; others read as absent on both engines);
- JSON semantics are strict RFC 8259 with root-object requirement:
  ``is_valid`` means "parses AND the root is an object". CPython ``json``
  and DuckDB's JSON extension agree on every RFC-conforming document; the
  known grammar divergence — DuckDB's yyjson tolerates trailing commas,
  CPython does not (pinned in tests/test_structdata.py; NaN/Infinity,
  the usual suspect, is accepted by BOTH) — is out of contract: the
  corpus generator never emits trailing commas, and a page that did
  would be a non-conforming block anyway;
- ``schema_type`` is the root's ``@type``: the string itself, or the
  first element of an array ``@type`` when that element is a string,
  else absent;
- ``n_keys`` counts root-object keys (both engines report the same count
  for RFC-conforming objects; duplicate keys are out of contract).
"""

from __future__ import annotations

import json
import re

from ocr_platform_spark.kernels.html_extract import decode_html

_LD_RE = re.compile(
    r'(?is)<script[ \t\n][^>]*?type="application/ld\+json"[^>]*>(.*?)</script>'
)

FIELDS = ("is_valid", "schema_type", "n_keys")


def ld_blocks(data: bytes | None) -> list[str]:
    """All JSON-LD block bodies of one payload, document order. Non-HTML
    payloads (PDF magic, empty) yield none — structured data is an HTML
    concept here."""
    if not data or data[:5] == b"%PDF-":
        return []
    return _LD_RE.findall(decode_html(data))


def parse_block(block: str) -> dict:
    """(is_valid, schema_type, n_keys) for one block body — the Python half
    of the contract above; :func:`sql_block_exprs` is the DuckDB half."""
    try:
        obj = json.loads(block)
    except ValueError:
        obj = None
    if not isinstance(obj, dict):
        return {"is_valid": False, "schema_type": None, "n_keys": None}
    t = obj.get("@type")
    if isinstance(t, list):
        t = t[0] if t and isinstance(t[0], str) else None
    elif not isinstance(t, str):
        t = None
    return {"is_valid": True, "schema_type": t, "n_keys": len(obj)}


def structured_data(data: bytes | None) -> list[dict]:
    """Per-block records for one payload: (block_idx, block, is_valid,
    schema_type, n_keys). ``block`` (the raw body) rides along so staged
    output carries the exact characters the oracle re-parses."""
    out = []
    for i, b in enumerate(ld_blocks(data)):
        rec = parse_block(b)
        rec["block_idx"] = i
        rec["block"] = b
        out.append(rec)
    return out


def blocks_sql_expr(raw_col: str = "raw") -> str:
    """DuckDB expression extracting all block bodies (list<varchar>) from
    the staged decoded payload — the same compiled pattern as the kernel,
    one source of truth."""
    return f"regexp_extract_all({raw_col}, '{_LD_RE.pattern}', 1)"


def sql_block_exprs(j_col: str = "j") -> dict[str, str]:
    """The DuckDB twin of :func:`parse_block` over ``j_col`` — a column that
    must be ``CASE WHEN TRY_CAST(b AS JSON) IS NOT NULL AND
    json_type(TRY_CAST(b AS JSON)) = 'OBJECT' THEN TRY_CAST(b AS JSON)
    END`` (NULL ≡ invalid; TRY_CAST because DuckDB's json() throws on
    malformed input even under a CASE guard)."""
    return {
        "is_valid": f"{j_col} IS NOT NULL",
        "schema_type": f"""CASE json_type({j_col}, '$."@type"')
      WHEN 'VARCHAR' THEN json_extract_string({j_col}, '$."@type"')
      WHEN 'ARRAY' THEN CASE WHEN json_type({j_col}, '$."@type"[0]') = 'VARCHAR'
                             THEN json_extract_string({j_col}, '$."@type"[0]') END
    END""",
        "n_keys": (
            f"CASE WHEN {j_col} IS NOT NULL"
            f" THEN CAST(len(json_keys({j_col})) AS INT) END"
        ),
    }
