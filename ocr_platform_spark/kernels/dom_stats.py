"""DOM-structure statistics — the structural quality features of a page.

Boilerplate-heavy pages look different from content pages BEFORE any text
heuristic runs: deep nesting, high tag-to-text ratios, link floods. This
kernel emits those per-document integers (the features trafilatura/
readability implementations expose as diagnostics, and host-level quality
models consume), from the SAME token stream the content kernel parses
(``html_extract._TOKEN`` — one grammar, every consumer).

Like every kernel here it is a pure function of the payload bytes: same
bytes in → same ints out at any parallelism (the north rule), errors
degrade to zeros rather than exceptions (error-as-data, cf. the
reference's ``ocr_backend/app/utils/data_conversion.py:261-302``).

Fields (all non-negative ints):
- ``n_chars_raw``   — decoded document length in characters;
- ``n_chars_text``  — characters in text segments (markup excluded;
  script/style/comment interiors never appear as text — the tokenizer
  swallows them whole);
- ``n_tags``        — start tags (void and self-closing included);
- ``n_links``       — ``<a>`` start tags;
- ``n_blocks``      — block-level start tags (the content kernel's
  ``_BLOCK_TAGS``);
- ``max_depth``     — deepest open-element nesting, with the same
  tolerant unwind the content parser applies to mis-nested markup.

Non-HTML payloads (PDF magic, empty) are all-zeros: DOM shape is an HTML
concept — the page-metadata kernel makes the same call.
"""

from __future__ import annotations

from ocr_platform_spark.kernels.html_extract import (
    _BLOCK_TAGS,
    _TOKEN,
    _VOID_TAGS,
    decode_html,
)

FIELDS = (
    "n_chars_raw",
    "n_chars_text",
    "n_tags",
    "n_links",
    "n_blocks",
    "max_depth",
)

_ZEROS = {f: 0 for f in FIELDS}


def dom_stats(data: bytes | None) -> dict:
    """Per-document DOM-structure integers (see module docstring)."""
    if not data or data[:5] == b"%PDF-":
        return dict(_ZEROS)
    raw = decode_html(data)
    n_chars_text = n_tags = n_links = n_blocks = 0
    depth = max_depth = 0
    stack: list[str] = []
    voids = _VOID_TAGS
    blocks = _BLOCK_TAGS
    parts = _TOKEN.split(raw)
    n = len(parts)
    idx = 0
    while True:
        seg = parts[idx]
        if seg:
            n_chars_text += len(seg)
        idx += 1
        if idx >= n:
            break
        is_end = parts[idx]
        tag = parts[idx + 1]
        attrs = parts[idx + 2]
        idx += 3
        if tag is None:  # comment / doctype / PI / swallowed raw-text
            continue
        if not tag.islower():
            tag = tag.lower()
        if is_end:
            if stack and stack[-1] == tag:  # well-nested close
                stack.pop()
                depth -= 1
            elif tag in voids or tag not in stack:
                continue
            else:  # tolerant unwind, same semantics as the content parser
                while stack:
                    open_tag = stack.pop()
                    depth -= 1
                    if open_tag == tag:
                        break
            continue
        n_tags += 1
        if tag == "a":
            n_links += 1
        if tag in blocks:
            n_blocks += 1
        if tag in voids:
            continue
        if attrs and attrs[-1] == "/":  # self-closing <x/> never nests
            continue
        stack.append(tag)
        depth += 1
        if depth > max_depth:
            max_depth = depth
    return {
        "n_chars_raw": len(raw),
        "n_chars_text": n_chars_text,
        "n_tags": n_tags,
        "n_links": n_links,
        "n_blocks": n_blocks,
        "max_depth": max_depth,
    }
