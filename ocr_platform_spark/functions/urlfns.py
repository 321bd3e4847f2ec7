"""URL canonicalization — the dedup key a crawl pipeline needs BEFORE
content dedup (the same page is crawled as http/https, with tracking
params, fragments, default ports, trailing slashes…).

Pure column expressions (regexp chain + case fold of the scheme://host
head), mirrored 1:1 in the DuckDB oracle (queries.py ``url_canonical_dups``)
— note Spark's ``regexp_replace`` is global by default while DuckDB needs
the ``'g'`` flag; the oracle SQL carries the flags explicitly.

Canonical form:
- fragment dropped;
- scheme and host lowercased (path/query case preserved — it is
  significant on most servers);
- default ports stripped (http:80, https:443);
- tracking parameters removed (utm_*, gclid, fbclid, msclkid), with the
  separators re-normalized and empty query dropped;
- trailing slash stripped from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: (pattern, replacement) chain applied AFTER the scheme://host case fold —
#: order matters and is part of the contract (the oracle applies the same).
#: Patterns are restricted to the RE2 ∩ Java-regex common subset (no
#: lookaround) so the DuckDB oracle can run the very same chain; only the
#: replacement syntax differs per dialect ($1 vs \\1 — translated by
#: ``canonical_sql``).
CANONICAL_STEPS: list[tuple[str, str]] = [
    (r"#.*$", ""),                                          # fragment
    (r"^(https?://[^/?#]*):80([/?#]|$)", r"$1$2"),          # default http port
    (r"^(https?://[^/?#]*):443([/?#]|$)", r"$1$2"),         # default https port
    (r"([?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid)=[^&#]*", r"$1"),
    (r"&&+", "&"),                                           # separator cleanup
    (r"\?&", "?"),
    (r"[?&]$", ""),
    (r"^((?:https?://[^/?#]*)?/[^?#]*[^/?#])/(\?|$)", r"$1$2"),  # path trailing slash, non-root
]

_HEAD_PAT = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def canonical_sql(expr: str) -> str:
    """The DuckDB face of :func:`canonical_url`: the same case fold and the
    same step chain, with replacements translated to RE2's ``\\N`` syntax
    and the global flag made explicit (Spark replaces globally by
    default)."""
    head = f"regexp_extract({expr}, '{_HEAD_PAT}')"
    out = f"lower({head}) || substr({expr}, length({head}) + 1)"
    for pat, rep in CANONICAL_STEPS:
        duck_rep = rep.replace("$", "\\")
        out = f"regexp_replace({out}, '{pat}', '{duck_rep}', 'g')"
    return out


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_url(col: Column | str) -> Column:
    u = _c(col)
    head = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    folded = F.concat(F.lower(head), u.substr(F.length(head) + 1, F.length(u)))
    out = folded
    for pat, rep in CANONICAL_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


# --- soft URL blocklist scoring ---------------------------------------------
# RefinedWeb-style URL filtering: beyond the exact domain blocklist, score a
# url by the weighted flagged FRAGMENTS it contains (substring match over the
# whole url string) and block above a threshold — a soft rule that catches
# bad pages on unlisted hosts while letting a single incidental fragment
# through. Weights are small integers so scores hash identically
# cross-engine; the fragment list is tiny and unrolls into the row
# expression (pure codegen, no join, no shuffle).

SOFTBLOCK_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("casino", 50),
    ("adult", 45),
    ("poker", 40),
    ("webcam", 35),
    ("bet", 30),
    ("win-big", 25),
    ("free", 10),
)


def url_softblock_score(
    col: Column | str,
    weights: tuple[tuple[str, int], ...] = SOFTBLOCK_WEIGHTS,
) -> Column:
    """Sum of weights of flagged fragments contained in the url. A url
    hitting several fragments accumulates ('free-bets' scores free+bet);
    the same fragment twice counts once (containment, not occurrence
    count)."""
    c = _c(col)
    score = F.lit(0)
    for frag, w in weights:
        score = score + F.when(c.contains(frag), F.lit(w)).otherwise(F.lit(0))
    return score


def softblock_score_sql(expr: str, weights: tuple[tuple[str, int], ...] = SOFTBLOCK_WEIGHTS) -> str:
    """The same unrolled weighted-containment sum in ANSI SQL — derived
    from the SAME weight table so engines cannot drift."""
    terms = " + ".join(
        f"CASE WHEN contains({expr}, '{frag}') THEN {w} ELSE 0 END"
        for frag, w in weights
    )
    return f"({terms})"
