"""Text analytics for a training-data pipeline — pure column expressions.

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting over a ``text`` column. Every function here is
JVM-side (whole-stage codegen); nothing drops to Python. Each is designed to
be expressible in ANSI/DuckDB SQL too, so the driver's oracle comparison can
verify values exactly (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Stopword profiles for the language-ID heuristic. Order matters: argmax
# ties resolve to the first language in this list (deterministic).
# Stopword profiles only discriminate WITHIN Latin script — non-Latin
# scripts are decided by the Unicode-block gate below (SCRIPT_RANGES).
LANG_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "to", "in", "that", "with"]),
    ("de", ["der", "die", "und", "das", "nicht", "ist", "ein"]),
    ("es", ["el", "los", "que", "por", "con", "una", "para"]),
    ("fr", ["le", "la", "et", "les", "des", "est", "une"]),
    ("hi", ["hai", "aur", "ke", "ki", "se", "mein", "par"]),
]

# Script-level detection (the first thing a real Common-Crawl corpus
# needs): Unicode-block character ranges, decided by integer thresholds
# BEFORE the stopword argmax. Order is precedence: kana implies Japanese
# even though Japanese text also carries Han ideographs; Hangul before
# Han for the same reason (mixed hanja). Ranges are plain BMP character
# classes — valid in Java regex, RE2 (DuckDB), and Python `re` alike.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("ja", "぀-ヿ"),  # hiragana + katakana
    ("ko", "가-힯"),  # hangul syllables
    ("zh", "一-鿿"),  # CJK unified ideographs
    ("ru", "Ѐ-ӿ"),  # cyrillic
    ("ar", "؀-ۿ"),  # arabic
]

#: Latin letters incl. the supplement/extended-A/B accents European
#: languages use — the denominator of the script-dominance rule.
LATIN_RANGE = "A-Za-zÀ-ɏ"

#: a script wins iff it has ≥ SCRIPT_MIN_CHARS characters AND at least
#: half as many characters as the Latin letters (2·script ≥ latin) — a
#: Latin page quoting a few CJK characters stays Latin; integer
#: arithmetic only, so the rule replays exactly in any engine.
SCRIPT_MIN_CHARS = 4

_PUNCT_CLASS = "[.,;:!?()]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace tokenization; empty/blank → 0."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def stopword_regex(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def stopword_count(col: Column | str, words: list[str]) -> Column:
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(stopword_regex(words)), F.lit(0))).cast("int")


def punct_count(col: Column | str) -> Column:
    s = _c(col)
    return (F.length(s) - F.length(F.regexp_replace(s, _PUNCT_CLASS, ""))).cast("int")


def uppercase_ratio(col: Column | str) -> Column:
    s = _c(col)
    upper = F.length(s) - F.length(F.regexp_replace(s, "[A-Z]", ""))
    return F.when(F.length(s) > 0, upper / F.length(s)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword density
    − punctuation noise. Rounded to 4 dp for cross-engine value stability.

    Mirrors the *shape* of boilerplate/quality heuristics used in web-corpus
    curation (length / punct / stopword ratios)."""
    s = _c(col)
    toks = token_count(s).cast("double")
    en_stops = stopword_count(s, LANG_PROFILES[0][1]).cast("double")
    punct = punct_count(s).cast("double")
    length_part = F.least(toks / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
    stop_part = F.least(
        F.when(toks > 0, en_stops / toks).otherwise(F.lit(0.0)) * F.lit(5.0),
        F.lit(1.0),
    ) * F.lit(0.3)
    punct_part = (
        F.lit(1.0)
        - F.least(
            F.when(toks > 0, punct / toks).otherwise(F.lit(1.0)) * F.lit(2.0),
            F.lit(1.0),
        )
    ) * F.lit(0.3)
    return F.round(length_part + stop_part + punct_part, 4)


def lang_scores(col: Column | str) -> list[tuple[str, Column]]:
    return [(lang, stopword_count(col, words)) for lang, words in LANG_PROFILES]


def char_class_count(col: Column | str, ranges: str) -> Column:
    """Characters of ``col`` inside the character-class ``ranges`` —
    ``length(s) - length(regexp_replace(s, '[ranges]', ''))``, the exact
    expression DuckDB runs with the same class."""
    s = _c(col)
    return (F.length(s) - F.length(F.regexp_replace(s, f"[{ranges}]", ""))).cast("int")


def lang_id(col: Column | str) -> Column:
    """Two-tier language ID. Tier 1 — script gate: the first Unicode block
    in ``SCRIPT_RANGES`` precedence order with ≥ ``SCRIPT_MIN_CHARS``
    characters and 2·count ≥ latin letters decides (ja/ko/zh/ru/ar;
    CJK/Cyrillic/Arabic never reach the stopword stage). Tier 2 — within
    Latin script, argmax of per-language stopword hits; ties → first
    profile in order; zero hits everywhere → 'und' (undetermined)."""
    scores = lang_scores(col)
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    latin = char_class_count(col, LATIN_RANGE)
    for lang, rng in reversed(SCRIPT_RANGES):
        c = char_class_count(col, rng)
        expr = F.when(
            (c >= SCRIPT_MIN_CHARS) & (c * 2 >= latin), F.lit(lang)
        ).otherwise(expr)
    return expr


def normalized_text(col: Column | str) -> Column:
    """lowercase + collapse whitespace + trim (the canonical form used by
    fingerprinting and near-dup shingling)."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text (md5
    exists in both Spark and DuckDB → oracle-checkable)."""
    return F.md5(normalized_text(_c(col)))


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` exactly once per row and feed the result to ``fn``
    as a lambda variable: ``element_at(transform(array(expr), fn), 1)``.

    WHY: an expression referenced inside a higher-order-function lambda is
    re-evaluated once PER ELEMENT after Catalyst's CollapseProject inlines
    it (a regex normalize referenced from a per-gram lambda ran ~2000× per
    row — measured ~25× total runtime at sf0.1). A lambda VARIABLE, by
    contrast, is bound once; this wrapper is the projection barrier that
    CollapseProject cannot inline through, with no staging/caching cost."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def word_shingles(col: Column | str, k: int = 3, bound: bool = True) -> Column:
    """Array of k-word shingles over the normalized text (built-ins only:
    split + transform + slice + concat_ws). Short texts (<k words) yield a
    single shingle of whatever is there. The split-words array is λ-bound
    (``bind_once``) so normalize+split run once per row, not once per
    shingle — measured ~2× on the sf0.1 shingle stage.

    ``bound=False`` reverts to the plain nested expression: required when
    the result feeds a pandas-UDF argument, where Spark's interpreted input
    projection cannot evaluate the ``element_at(transform(array(...)))``
    binding (INTERNAL_ERROR Cannot evaluate expression) — the UDF path
    materializes the column in its own projection anyway."""
    words_expr = F.split(normalized_text(_c(col)), " ")

    def shingles_of(words: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        )

    if not bound:
        return shingles_of(words_expr)
    return bind_once(words_expr, shingles_of)


def char_kgram_hashes(
    col: Column | str, k: int = 8, normalized: bool = False
) -> Column:
    """``array<long>`` of xxhash64'd character k-grams over the normalized
    text, in position order (NOT distinct — winnowing needs the positional
    sequence). Texts shorter than ``k`` chars yield one gram of what's
    there. Built-ins only: sequence + transform + substr.

    The normalized string is λ-bound (``bind_once``) so the regex
    normalize runs once per row even though the per-gram lambda references
    it; ``normalized=True`` skips normalization for callers that already
    materialized it (e.g. the staged catalog query)."""

    def grams_of(norm: Column) -> Column:
        n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n), lambda i: F.xxhash64(norm.substr(i, F.lit(k)))
        )

    if normalized:
        return grams_of(_c(col))
    return bind_once(normalized_text(_c(col)), grams_of)


def winnow_fingerprints(
    col: Column | str, k: int = 8, w: int = 4, normalized: bool = False
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): slide a window of ``w`` consecutive k-gram hashes and keep
    each window's minimum; the DISTINCT sorted selection is the document's
    fingerprint set. Guarantee: any shared substring of length ≥ w + k - 1
    between two documents yields at least one shared fingerprint, while only
    ~2/(w+1) of all gram hashes are retained — a tunable-density rolling-
    hash fingerprint (the prompt's 'document fingerprinting' op).

    Pure column expressions; the selection is position-independent (set of
    window minima), so no tie-break rule is needed. Equivalence to the
    exploded window-frame formulation is pinned in tests/test_textfns
    parity; the catalog query stages the gram table so DuckDB reproduces
    the same selection with a window frame (queries.py)."""
    return bind_once(
        char_kgram_hashes(_c(col), k, normalized=normalized),
        lambda grams: F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(grams) - F.lit(w - 1), F.lit(1))
                    ),
                    lambda j: F.array_min(F.slice(grams, j, w)),
                )
            )
        ),
    )


def top_bigram_frac(col: Column | str) -> Column:
    """Most-frequent word-bigram's share of all bigrams, computed PER ROW
    with pure column expressions (no explode/groupBy): sort the bigram
    array, then the max multiplicity is the longest run of equal adjacent
    elements — one ``aggregate`` pass with a (prev, run, best) accumulator.

    Identical math to the exploded ``max(c)/sum(c)`` formulation of the
    ``doc_repetition`` catalog query (parity pinned in tests/test_textfns);
    being per-row, the repetition gate fuses into the same corpus scan as
    the quality/language gates in plans/curation.py — no extra shuffle.
    Short texts (<2 words → one degenerate shingle) score 1.0, matching the
    exploded form."""

    def frac_of(sorted_grams: Column) -> Column:
        acc0 = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(a: Column, x: Column) -> Column:
            run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
            )

        best = F.aggregate(sorted_grams, acc0, step)["best"]
        return best.cast("double") / F.size(sorted_grams)

    return bind_once(F.array_sort(word_shingles(_c(col), 2)), frac_of)


GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_stats(col: Column | str) -> Column:
    """The Gopher quality-filter rule inputs (Rae et al., "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher", 2021,
    App. A1.1) as ONE struct of exact integers, pure column expressions:

    - ``n_words`` / ``n_word_chars``: whitespace words of the normalized
      text and their total characters (mean word length = chars/words,
      gated by integer cross-multiplication downstream);
    - ``n_hash`` / ``n_ellipsis``: '#' and '...' occurrences in the raw
      text (the symbol-to-word-ratio rule);
    - ``n_lines`` / ``n_bullet_lines`` / ``n_ellipsis_lines``: raw lines,
      lines starting with a bullet ('-'/'*'), lines ending in '...';
    - ``n_alpha_words``: words containing at least one alphabetic char;
    - ``n_stopwords``: how many of the paper's 8 stop words appear.

    Empty/blank text yields all-zero counts except ``n_lines`` (a blank
    page is one line). Every count is engine-neutral arithmetic, so the
    catalog oracle recomputes the whole struct directly over parquet."""
    raw = F.coalesce(_c(col), F.lit(""))

    def stats_of(norm: Column) -> Column:
        empty = norm == ""
        words = F.split(norm, " ")
        n_words = F.when(empty, F.lit(0)).otherwise(F.size(words)).cast("int")
        n_word_chars = (
            F.when(empty, F.lit(0))
            .otherwise(F.length(norm) - (F.size(words) - 1))
            .cast("int")
        )
        n_hash = (F.length(raw) - F.length(F.replace(raw, F.lit("#")))).cast("int")
        n_ellipsis = (
            (F.length(raw) - F.length(F.replace(raw, F.lit("...")))) / 3
        ).cast("int")
        lines = F.split(raw, "\n")
        n_lines = F.size(lines).cast("int")
        n_bullet = F.size(
            F.filter(
                lines,
                lambda l: F.ltrim(l).startswith("-") | F.ltrim(l).startswith("*"),
            )
        ).cast("int")
        n_ell_lines = F.size(
            F.filter(lines, lambda l: F.rtrim(l).endswith("..."))
        ).cast("int")
        n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("int")
        n_stops = sum(
            F.when(F.array_contains(words, w), 1).otherwise(0) for w in GOPHER_STOPS
        ).cast("int")
        return F.struct(
            n_words.alias("n_words"),
            n_word_chars.alias("n_word_chars"),
            n_hash.alias("n_hash"),
            n_ellipsis.alias("n_ellipsis"),
            n_lines.alias("n_lines"),
            n_bullet.alias("n_bullet_lines"),
            n_ell_lines.alias("n_ellipsis_lines"),
            n_alpha.alias("n_alpha_words"),
            n_stops.alias("n_stopwords"),
        )

    return bind_once(normalized_text(raw), stats_of)


#: Code-line predicate shared by the engine and every oracle: indentation,
#: statement terminators, or a leading keyword. RE2∩Java-safe (no
#: lookaround), applied per line after blank-line removal.
CODE_LINE_RE = r"^(    |\t)|[;{}] *$|^(def |class |import |return |while |for )"


def code_line_counts(col: Column | str) -> Column:
    """(n_lines, n_code) struct over non-blank lines — pure column
    expressions (split + filter + size), no explode, so the prose/code
    router fuses into the same map-side scan as the other gates."""
    lines = F.filter(
        F.split(F.coalesce(_c(col), F.lit("")), "\n"),
        lambda l: F.trim(l) != "",
    )
    n_lines = F.size(lines).cast("long")
    n_code = F.size(F.filter(lines, lambda l: l.rlike(CODE_LINE_RE))).cast("long")
    return F.struct(n_lines.alias("n_lines"), n_code.alias("n_code"))


def is_code_doc(col: Column | str) -> Column:
    """The integer routing rule ``10·n_code ≥ 3·n_lines`` (no float
    threshold drift); blank docs are prose."""
    c = code_line_counts(col)
    return (c["n_code"] * 10 >= c["n_lines"] * 3) & (c["n_lines"] > 0)


def script_mix_count(col: Column | str) -> Column:
    """How many scripts (Latin + every SCRIPT_RANGES block) clear
    SCRIPT_MIN_CHARS in this text — ≥2 is the script-mixing spam signal
    (`doc_script_mix`, the pipeline's script_gate). Pure column
    expressions over the same constants the lang-id gate uses."""
    s = _c(col)

    def _n(rng: str) -> Column:
        return F.length(s) - F.length(F.regexp_replace(s, f"[{rng}]", ""))

    counts = [_n(LATIN_RANGE)] + [_n(rng) for _, rng in SCRIPT_RANGES]
    return sum(
        F.when(c >= SCRIPT_MIN_CHARS, 1).otherwise(0) for c in counts
    ).cast("int")


def mixed_script_words(col: Column | str) -> Column:
    """array<string> of whitespace words mixing Latin [A-Za-z] and
    Cyrillic letters WITHIN the word — the homoglyph-spoofing unit
    ("p\u0430ypal" with a Cyrillic \u0430): a fully-Cyrillic word in Russian
    text is normal, a word straddling both scripts almost never is.
    Word-level, so it composes with doc-level script_mix_count (which
    cannot see one spoofed word inside a Latin page)."""
    s = _c(col)
    words = F.filter(F.split(s, r"\s+", -1), lambda x: x != F.lit(""))
    return F.filter(
        words,
        lambda w: w.rlike("[A-Za-z]") & w.rlike("[\u0400-\u04ff]"),
    )
