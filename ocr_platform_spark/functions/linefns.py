"""C4-style line-level corpus filtering — pure column expressions.

The line-rule family from the C4 dataset construction (Raffel et al. 2020,
§2.2 "Colossal Clean Crawled Corpus"): keep only lines that end in terminal
punctuation and have enough words, drop policy/boilerplate lines
("javascript"-style enable-banners, cookie notices), and drop whole pages
containing ``lorem ipsum`` or a curly brace (code). Everything is
array-expression work over ``split(text, '\\n')`` — JVM-side, no Python —
and every rule is mirrored 1:1 in DuckDB list lambdas by the catalog
oracle, so the surviving bytes are verified exactly.

The reference engine has no corpus filtering (it extracts and stores);
this module is part of the engine's own training-data surface, composable
with the curation funnel's quality/lang/dedup gates.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Substrings whose presence drops a LINE (lowercased containment).
LINE_DROP_TERMS: list[str] = ["javascript", "cookie"]
# Substrings whose presence drops the whole PAGE.
PAGE_DROP_TERMS: list[str] = ["lorem ipsum", "{"]

TERMINAL_PUNCT_RE = "[.!?\"']$"

DEFAULT_MIN_WORDS = 5
DEFAULT_MIN_LINES = 3


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def trimmed_lines(col: Column | str) -> Column:
    """``array<string>`` of trimmed lines. (The lambda must be explicitly
    unary: ``transform`` feeds (element, index) to two-arg callables, which
    would turn ``F.trim`` into the two-parameter trim-charset form.)"""
    return F.transform(F.split(_c(col), "\n"), lambda x: F.trim(x))


def line_keep(line: Column, min_words: int = DEFAULT_MIN_WORDS) -> Column:
    """The C4 line predicate over an already-trimmed line."""
    keep = (
        (line != "")
        & line.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(line, r"\s+")) >= min_words)
    )
    low = F.lower(line)
    for term in LINE_DROP_TERMS:
        keep = keep & ~low.contains(term)
    return keep


def kept_lines(col: Column | str, min_words: int = DEFAULT_MIN_WORDS) -> Column:
    return F.filter(trimmed_lines(col), lambda ln: line_keep(ln, min_words))


def page_keep(
    col: Column | str,
    kept: Column,
    min_lines: int = DEFAULT_MIN_LINES,
) -> Column:
    """Page-level gate: no page-drop term anywhere in the ORIGINAL text,
    and at least ``min_lines`` surviving lines. ``kept`` is the
    ``kept_lines`` array (passed in so callers evaluate it once)."""
    low = F.lower(_c(col))
    keep = F.size(kept) >= min_lines
    for term in PAGE_DROP_TERMS:
        keep = keep & ~low.contains(term)
    return keep


def c4_clean_text(kept: Column) -> Column:
    """Surviving lines re-joined with newlines (the cleaned page body)."""
    return F.array_join(kept, "\n")
