"""Ingestion-side filename/path hygiene (SURVEY §2 F18).

The reference sanitizes upload filenames with werkzeug's
``secure_filename`` and rejects resolved paths escaping the configured
base directory (``ocr_backend/app/api/document_routes.py:218`` for the
sanitize, ``:87-99`` for the containment check). Rebuilt here as pure
column expressions so a bulk-ingest manifest of 10^9 file entries is
cleaned JVM-side in the scan stage — no Python in the loop.

Documented delta vs werkzeug: werkzeug NFKD-normalizes unicode before the
ascii-ignore step, so ``é`` transliterates to ``e``; Spark SQL has no
NFKD builtin, so non-ASCII characters are DROPPED instead (``café.pdf`` →
``caf.pdf`` not ``cafe.pdf``). Every other rule — separator → space,
whitespace runs → ``_``, charset allowlist ``[A-Za-z0-9_.-]``, leading/
trailing ``._`` strip — matches werkzeug behavior exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def secure_filename_col(col: Column | str) -> Column:
    """werkzeug-style filename sanitizer as a column expression.

    Steps (werkzeug order): path separators (both kinds) → spaces;
    non-ASCII dropped (delta: no NFKD transliteration, see module doc);
    whitespace runs joined with ``_``; everything outside
    ``[A-Za-z0-9_.-]`` removed; leading/trailing ``.`` and ``_``
    stripped. Empty input comes back as an empty string, matching
    werkzeug (callers must reject empties)."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_replace(c, r"[/\\]", " ")
    x = F.regexp_replace(x, r"[^\x00-\x7F]", "")
    x = F.regexp_replace(F.trim(x), r"\s+", "_")
    x = F.regexp_replace(x, r"[^A-Za-z0-9_.\-]", "")
    return F.regexp_replace(x, r"^[._]+|[._]+$", "")


def has_traversal(col: Column | str) -> Column:
    """True when the path contains a ``..`` segment — the escape vector
    the reference's resolve-then-compare check exists to stop. Checked
    BEFORE any normalization (a hostile manifest row is rejected, not
    repaired)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"(^|/)\.\.(/|$)")


def path_within_base(col: Column | str, base: str) -> Column:
    """The reference's containment rule as a predicate: a path is servable
    iff it has no ``..`` segment AND (it is relative, or it starts with
    ``base`` at a segment boundary). ``base`` must be absolute without a
    trailing slash."""
    c = F.col(col) if isinstance(col, str) else col
    is_abs = c.startswith("/")
    in_base = c.startswith(base + "/") | (c == F.lit(base))
    return ~has_traversal(c) & (~is_abs | in_base)
