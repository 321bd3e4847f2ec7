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


# --- crawl-trap detection ----------------------------------------------------
# Heritrix-style pathological-URL rules: crawler traps (calendar spaces,
# self-similar tag paths, session-parameter explosions) generate unbounded
# URL spaces under one host. All four rules are pure string/array
# expressions over the url — map-side, codegen, no shuffle — so the
# frontier can gate BEFORE enqueueing. SQL twins live in
# trap_flags_sql(); cross-dialect equality is pinned in tests.

_PATH_RE = r"^[a-z]+://[^/?#]+(/[^?#]*)?"


def _path_segments(col: Column | str) -> Column:
    path = F.regexp_extract(_c(col), _PATH_RE, 1)
    return F.filter(F.split(path, "/", -1), lambda x: x != F.lit(""))


def trap_segment_repeat(col: Column | str, min_repeats: int = 3) -> Column:
    """True when any single path segment occurs >= min_repeats times
    (/tag/tag/tag/... self-similar loops)."""
    segs = _path_segments(col)
    return F.exists(
        F.array_distinct(segs),
        lambda x: F.size(F.filter(segs, lambda s: s == x)) >= F.lit(min_repeats),
    )


def trap_too_deep(col: Column | str, max_depth: int = 8) -> Column:
    """True when the path has >= max_depth segments."""
    return F.size(_path_segments(col)) >= max_depth


def trap_param_heavy(col: Column | str, max_params: int = 6) -> Column:
    """True when the query string carries >= max_params parameters."""
    q = F.regexp_extract(_c(col), r"\?([^#]*)", 1)
    return F.size(F.filter(F.split(q, "&", -1), lambda x: x != F.lit(""))) >= max_params


def trap_calendar_like(col: Column | str) -> Column:
    """True on year/month path pairs ((19|20)dd/d{1,2}) — infinite
    calendar spaces."""
    path = F.regexp_extract(_c(col), _PATH_RE, 1)
    return path.rlike(r"/(19|20)[0-9]{2}/[0-9]{1,2}(/|$)")


def trap_flags_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of the four trap rules, keyed like the Column fns.
    Kept adjacent to the Spark expressions; equality on adversarial urls
    is pinned in tests/test_urlfns.py."""
    path = f"regexp_extract({expr}, '^[a-z]+://[^/?#]+(/[^?#]*)?', 1)"
    segs = f"list_filter(str_split({path}, '/'), x -> x <> '')"
    q = f"regexp_extract({expr}, '\\?([^#]*)', 1)"
    return {
        "seg_repeat": (
            f"len(list_filter(list_distinct({segs}), "
            f"x -> len(list_filter({segs}, s -> s = x)) >= 3)) > 0"
        ),
        "too_deep": f"len({segs}) >= 8",
        "param_heavy": f"len(list_filter(str_split({q}, '&'), x -> x <> '')) >= 6",
        "calendar_like": f"regexp_matches({path}, '/(19|20)[0-9]{{2}}/[0-9]{{1,2}}(/|$)')",
    }


# --- SURT (Sort-friendly URI Reordering Transform) ---------------------------
#
# The key form CDX indexes sort by (org,example)/path?a=1&b=2): host labels
# reversed so one host's captures — and one registered domain's subdomains —
# are CONTIGUOUS under a plain lexicographic sort, which is what makes
# binary-searchable CDX shards and prefix range-scans work. One rule set,
# two dialects; parity pinned in tests/test_urlfns.py.


def surt_key(col: Column | str) -> Column:
    """SURT form of a url: lowercase; scheme and fragment dropped; userinfo
    dropped; the scheme's OWN default port dropped (``:80`` only for http,
    ``:443`` only for https — a non-default-port capture like
    ``https://host:80/x`` keeps its port and does NOT collide with
    ``http://host/x``); leading ``www.`` dropped; host labels reversed and
    comma-joined; empty path becomes ``/``; query params sorted."""
    u = F.lower(_c(col))
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.\-]*)://", 1)
    auth = F.regexp_extract(u, r"^[a-z][a-z0-9+.\-]*://([^/?#]*)", 1)
    auth = F.regexp_replace(auth, r"^[^/@]*@", "")
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    port = F.regexp_extract(auth, r"(:[0-9]+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(auth, r":[0-9]+$", ""), r"^www\.", ""
    )
    rev = F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","), port)
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(rest, r"\?([^#]*)", 1)
    qsorted = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )


def surt_sql(expr: str) -> str:
    """DuckDB twin of :func:`surt_key` — same regexes, same ops."""
    u = f"lower({expr})"
    scheme = f"regexp_extract({u}, '^([a-z][a-z0-9+.\\-]*)://', 1)"
    auth = f"regexp_extract({u}, '^[a-z][a-z0-9+.\\-]*://([^/?#]*)', 1)"
    auth = f"regexp_replace({auth}, '^[^/@]*@', '')"
    auth = (
        f"(CASE WHEN {scheme} = 'http' THEN regexp_replace({auth}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth}, ':443$', '') "
        f"ELSE {auth} END)"
    )
    port = f"regexp_extract({auth}, '(:[0-9]+)$', 1)"
    host = f"regexp_replace(regexp_replace({auth}, ':[0-9]+$', ''), '^www\\.', '')"
    rev = (
        f"(list_aggregate(list_reverse(string_split({host}, '.')), "
        f"'string_agg', ',') || {port})"
    )
    rest = f"regexp_replace({u}, '^[a-z][a-z0-9+.\\-]*://[^/?#]*', '')"
    path = f"regexp_extract({rest}, '^([^?#]*)', 1)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q = f"regexp_extract({rest}, '\\?([^#]*)', 1)"
    qsorted = f"array_to_string(list_sort(string_split({q}, '&')), '&')"
    return (
        f"{rev} || ')' || {path} || "
        f"(CASE WHEN {q} = '' THEN '' ELSE '?' || {qsorted} END)"
    )
