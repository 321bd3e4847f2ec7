"""Mojibake detection and repair — the encoding-hygiene gate of a web
corpus build (ftfy / CCNet's "fix unicode" stage).

The dominant real-crawl corruption is UTF-8 bytes decoded as
windows-1252: every non-ASCII character turns into a 2-3 character
marker sequence ("é" → "Ã©", "’" → "â€™"). This module keeps ONE curated
character table and derives everything from it at import time using the
public codec tables themselves (``ch.encode('utf-8').decode('cp1252')``)
— no hand-typed marker strings that could drift:

- ``corrupt_mojibake``  — the injection used by tests/queries to create
  deterministic mojibake from clean text (good → bad, per character);
- ``mojibake_count``    — occurrence count of any marker sequence, pure
  length/replace arithmetic (no regex, so no cross-dialect regex risk);
- ``repair_mojibake``   — longest-marker-first replace chain (bad → good);
- ``*_sql``             — the DuckDB twin of each, generated from the SAME
  table (the dialect-parity pattern of kernels/page_meta.sql_exprs: one
  source of truth, two engines, drift impossible).

Scope is the curated-table subset of ftfy: single-pass windows-1252
mojibake of the most common Latin-1 Supplement / General Punctuation /
currency characters. Double-encoded text (two cp1252 round trips) repairs
one layer per application; detection still fires on it because the outer
layer's markers are present. Like the reference's conversion helpers
(``ocr_backend/app/utils/data_conversion.py``), malformed input degrades
to identity, never to an exception.

Scale shape: every function is a column expression (JVM-side, whole-stage
codegen) — no UDF, no shuffle; the table is ~30 fixed pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Characters the repair table covers: the high-frequency accented Latin,
#: curly-quote/dash punctuation, and currency/symbol characters of real
#: web text. Each must survive a utf-8 encode → cp1252 decode round trip
#: (characters whose UTF-8 bytes hit one of cp1252's five undefined slots
#: are skipped at derivation time).
_TABLE_CHARS = "éèêëáàâäãåçíìîïóòôöõúùûüñýÿ’‘“”–—…€£©®°±«»"


def _derive_pairs() -> list[tuple[str, str]]:
    pairs: list[tuple[str, str]] = []
    for ch in _TABLE_CHARS:
        try:
            bad = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:  # cp1252 hole (0x81 0x8D 0x8F 0x90 0x9D)
            continue
        pairs.append((bad, ch))
    # longest marker first: a 3-char marker ("â€™") must be repaired before
    # any 2-char marker that happens to share its prefix; ties broken by
    # the marker string for a deterministic chain order.
    return sorted(pairs, key=lambda p: (-len(p[0]), p[0]))


#: (bad_marker, good_char), longest marker first — the REPAIR chain order.
#: Derived, never edited.
MOJIBAKE_PAIRS: list[tuple[str, str]] = _derive_pairs()


def _corrupt_order(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Topological chain order for the good → bad direction.

    Markers are made of cp1252 decodes of continuation bytes, and several
    of those characters ('©' in marker('é') = 'Ã©', '€' in marker('’') =
    'â€™', '“' in marker('–')) are themselves table characters — a chain
    that corrupts 'é' first and '©' later would re-corrupt the freshly
    written marker ('Ã©' → 'ÃÂ©'). Order so a character's rule runs
    before every rule whose marker contains that character (Kahn's
    algorithm, lexicographic tie-break — deterministic). The table is
    cycle-free by construction: a marker never contains the marker's own
    source character class (accented letters are ≥ U+00C0, continuation
    decodes are ≤ U+00BF or U+20xx punctuation whose own markers contain
    only non-table chars), and the derivation asserts it."""
    needs_first: dict[str, set[str]] = {good: set() for _, good in pairs}
    goods = set(needs_first)
    for bad, good in pairs:
        for ch in bad:
            if ch in goods and ch != good:
                needs_first[good].add(ch)
    ordered: list[str] = []
    placed: set[str] = set()
    remaining = dict(needs_first)
    while remaining:
        ready = sorted(g for g, deps in remaining.items() if deps <= placed)
        assert ready, f"mojibake table has a dependency cycle: {remaining}"
        ordered.extend(ready)
        placed.update(ready)
        for g in ready:
            del remaining[g]
    by_good = {good: bad for bad, good in pairs}
    return [(by_good[g], g) for g in ordered]


#: corrupt-direction chain order (see _corrupt_order).
MOJIBAKE_CORRUPT_PAIRS: list[tuple[str, str]] = _corrupt_order(MOJIBAKE_PAIRS)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def corrupt_mojibake(col: Column | str) -> Column:
    """good → bad over the whole table (deterministic mojibake injector),
    in the cascade-free topological order (MOJIBAKE_CORRUPT_PAIRS)."""
    c = _c(col)
    for bad, good in MOJIBAKE_CORRUPT_PAIRS:
        c = F.replace(c, F.lit(good), F.lit(bad))
    return c


def repair_mojibake(col: Column | str) -> Column:
    """bad → good, longest marker first."""
    c = _c(col)
    for bad, good in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


def mojibake_count(col: Column | str) -> Column:
    """Total marker occurrences: Σ (len(s) − len(replace(s, bad, ''))) / len(bad).

    Pure string arithmetic — byte-identical across engines by construction
    (each difference is an exact multiple of the marker length, so the
    double division is integral and the long cast is exact)."""
    c = _c(col)
    total = None
    for bad, _ in MOJIBAKE_PAIRS:
        term = (
            (F.length(c) - F.length(F.replace(c, F.lit(bad), F.lit(""))))
            / F.lit(len(bad))
        ).cast("long")
        total = term if total is None else total + term
    return total


# -- DuckDB twins (generated from MOJIBAKE_PAIRS — one table, two engines) --


def _sq(s: str) -> str:
    """SQL single-quoted literal (the table contains no quotes, but double
    them anyway so a table edit can't silently break the oracle)."""
    return "'" + s.replace("'", "''") + "'"


def corrupt_mojibake_sql(col: str) -> str:
    expr = col
    for bad, good in MOJIBAKE_CORRUPT_PAIRS:
        expr = f"replace({expr}, {_sq(good)}, {_sq(bad)})"
    return expr


def repair_mojibake_sql(col: str) -> str:
    expr = col
    for bad, good in MOJIBAKE_PAIRS:
        expr = f"replace({expr}, {_sq(bad)}, {_sq(good)})"
    return expr


def mojibake_count_sql(col: str) -> str:
    terms = [
        f"(length({col}) - length(replace({col}, {_sq(bad)}, ''))) // {len(bad)}"
        for bad, _ in MOJIBAKE_PAIRS
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
