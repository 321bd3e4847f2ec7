"""Pure-Python fuzzy string scoring + SELECT-value mapping.

Deterministic reimplementation of the reference's fuzzy SELECT mapper
(``ocr_backend/app/api/ocr_routes.py:31-166``): top-5 candidates at
score_cutoff=75, auto-accept at ≥90, best-fuzzy fallback otherwise. The
reference escalates the 75–89 band to an LLM (``:114-156``); a remote model
is non-deterministic, so this rebuild always takes the reference's *own*
no-API-key / error fallback path (``:125-131, :153-163``): best fuzzy match.
Documented semantic delta; fixture-pinned in tests/test_select_mapping.py.

Scorer: fuzzywuzzy/rapidfuzz are not installed here, so ``wratio_like`` is a
from-scratch weighted scorer on ``difflib.SequenceMatcher`` (stdlib,
platform-stable): max of full ratio, token-sort ratio, and token-set ratio —
the same family of signals WRatio combines. Scores are 0-100 ints.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from functools import lru_cache


def _preprocess(s: str) -> str:
    """Lowercase, non-alphanumeric → space, collapse runs, strip (the
    standard full_process step fuzzy scorers apply)."""
    out = []
    for ch in s.lower():
        out.append(ch if ch.isalnum() else " ")
    return " ".join("".join(out).split())


def _ratio(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return SequenceMatcher(None, a, b).ratio()


def _partial_ratio(a: str, b: str) -> float:
    """Best alignment of the shorter string against same-length windows of
    the longer (fuzzywuzzy's partial_ratio idea, anchored on matching
    blocks)."""
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return 0.0
    m = SequenceMatcher(None, a, b)
    best = 0.0
    for block in m.get_matching_blocks():
        start = max(block.b - block.a, 0)
        window = b[start : start + len(a)]
        r = _ratio(a, window)
        if r > best:
            best = r
            if best == 1.0:
                break
    return best


def wratio_like(a: str, b: str) -> int:
    """Weighted similarity in [0, 100]:
    max(full, .95·token-sort, .95·token-set, .9·partial) — the signal family
    and weights of WRatio, on stdlib SequenceMatcher."""
    return wratio_like_pre(_preprocess(a), _preprocess(b))


def wratio_like_pre(pa: str, pb: str) -> int:
    """:func:`wratio_like` over ALREADY-preprocessed strings. The hot-path
    entry: the mapper preprocesses each distinct value once and every
    vocabulary label once (at build time) instead of re-running the
    full_process step per (value, option) pair."""
    if pa == pb:
        return 100 if pa else 0
    full = _ratio(pa, pb)
    ta, tb = pa.split(), pb.split()
    sort_r = _ratio(" ".join(sorted(ta)), " ".join(sorted(tb)))
    sa, sb = set(ta), set(tb)
    inter = " ".join(sorted(sa & sb))
    t1 = (inter + " " + " ".join(sorted(sa - sb))).strip()
    t2 = (inter + " " + " ".join(sorted(sb - sa))).strip()
    set_r = max(_ratio(inter, t1), _ratio(inter, t2), _ratio(t1, t2)) if inter else 0.0
    partial = _partial_ratio(pa, pb)
    score = max(full, 0.95 * sort_r, 0.95 * set_r, 0.9 * partial)
    return int(round(100 * score))


SCORE_CUTOFF = 75   # ocr_routes.py:59
AUTO_ACCEPT = 90    # ocr_routes.py:71
TOP_K = 5           # ocr_routes.py:60


def map_select_value(
    ocr_value: str | None, options: list[tuple[str, str]]
) -> str | None:
    """Map one raw value onto a constrained vocabulary.

    ``options`` is ``[(option_value, option_label), ...]``. Returns the
    mapped option_value, the original when no vocabulary is configured
    (ocr_routes.py:46-47), or None when nothing clears the cutoff (:64-67).
    """
    if not ocr_value:
        return None
    if not options:
        return ocr_value
    pa = _preprocess(ocr_value)
    best_s, best_idx = 0, -1
    for idx, (_value, label) in enumerate(options):
        s = wratio_like_pre(pa, _preprocess(label))
        if s > best_s and s >= SCORE_CUTOFF:
            best_s, best_idx = s, idx
            if s == 100:
                # nothing later can beat (-100, idx): the sort key is
                # (score desc, vocabulary order asc)
                break
    if best_idx < 0:
        return None
    # auto-accept ≥90 (:71-76) and the deterministic best-fuzzy fallback for
    # the 75-89 band (:153-163) coincide: best match wins; ties keep the
    # earliest vocabulary index (strict > above), matching the stable
    # (-score, idx) sort of the reference's top-5 selection.
    return options[best_idx][0]


def score_all(ocr_value: str, options: list[tuple[str, str]]) -> list[int]:
    """Per-option scores of one value against a vocabulary, vocabulary
    order (no cutoff, no early exit) — the staged-oracle surface: an
    independent SQL engine re-applies cutoff/top-k/tie-break over these to
    re-derive the mapping (queries.fuzzy_supplier_mapping)."""
    pa = _preprocess(ocr_value or "")
    return [wratio_like_pre(pa, _preprocess(label)) for _v, label in options]


class CachedMapper:
    """Per-field vocabulary mapper with value-level memoization — web-scale
    columns repeat values heavily; the cache collapses per-batch cost to
    per-distinct-value cost.

    Labels are preprocessed ONCE at build time (the full_process step used
    to run per (value, option) pair); per distinct value the scoring loop
    early-exits on a 100 score, which nothing later in vocabulary order can
    beat. Outputs are byte-identical to :func:`map_select_value`."""

    def __init__(self, vocab_by_field: dict[str, list[tuple[str, str]]]):
        self._vocab = vocab_by_field
        self._pre = {
            f: [_preprocess(label) for _v, label in opts]
            for f, opts in vocab_by_field.items()
        }

        @lru_cache(maxsize=65536)
        def _cached(field: str, value: str) -> str | None:
            opts = self._vocab.get(field, [])
            if not opts:
                return value  # passthrough: no vocabulary configured
            pa = _preprocess(value)
            best_s, best_idx = 0, -1
            for idx, plbl in enumerate(self._pre[field]):
                s = wratio_like_pre(pa, plbl)
                if s > best_s and s >= SCORE_CUTOFF:
                    best_s, best_idx = s, idx
                    if s == 100:
                        break
            return None if best_idx < 0 else opts[best_idx][0]

        self._cached = _cached

    def map(self, field: str, value: str | None) -> str | None:
        if not value:
            return None
        return self._cached(field, value)
