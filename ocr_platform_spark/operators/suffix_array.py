"""Per-shard suffix-array ExactSubstr marking (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the paper's
own data structure, not an approximation of it).

The engine now has three repeated-span marking modes, one per scale
regime:

- :func:`dedup.char_gram_postings` — exact, corpus-wide, one row per
  character through a corpus-wide shuffle (the correctness baseline;
  30-60× amplification — fine at fixture scale, not at 100 TB);
- :func:`dedup.winnowed_gram_postings` — content-sampled, corpus-wide,
  ~2/(w+1) of the rows (the global scale path);
- THIS — exact within a shard with ZERO shuffle for the marking itself:
  the suffix structure lives in executor memory, one shard per task, and
  only doc-sized marked-position lists leave the kernel. Most web
  boilerplate is host-/template-local, so sharding by host or url bucket
  co-locates almost all of it; the winnowed global pass catches the
  cross-shard remainder. This split — exact-local + sampled-global — is
  the composition that actually runs at 10^12 documents.

Implementation notes (all numpy, C-vectorized; no per-row Python):

- Manber-Myers rank doubling (O(n log² n) lexsorts) over the shard's
  concatenated codepoints; documents are separated by UNIQUE negative
  sentinel codes, so no comparison window ever crosses a document
  boundary and no suffix containing a sentinel can equal another.
- No LCP array and no final suffix order are materialized: marking only
  needs k-PREFIX EQUALITY CLASSES, read from the rank array by the
  sparse-table trick — with ``a`` the largest power of two ≤ k, suffixes
  p and q share their first k codes iff ``rank_a[p] == rank_a[q]`` and
  ``rank_a[p+k-a] == rank_a[q+k-a]`` (the two a-windows overlap and
  cover [p, p+k)). One lexsort groups the classes; a run is marked iff
  it spans ≥ 2 distinct documents.
- Semantics are IDENTICAL to ``char_gram_postings → repeated_spans`` at
  ``min_df=2`` restricted to the shard (pinned by a pytest differential):
  a position is marked iff its k-gram also occurs in a DIFFERENT document
  of the shard; documents shorter than k contribute their whole text as
  one gram at position 0 (matched against other short documents only —
  the same contract the gram hashes imply, since strings of different
  lengths never collide); marked positions feed the shared
  :func:`dedup.merge_position_islands` tail, so span construction is the
  same two-window integer pipeline every other marking mode uses.
- The catalog oracle (queries.doc_repeated_spans_sa) needs NO staging:
  shard assignment is the md5 bucket both engines share, and DuckDB
  replays gram extraction from raw parquet by substring value — exact
  codes on both sides, no hash anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ocr_platform_spark.operators.dedup import merge_position_islands


def _rank_pow2(codes: np.ndarray, target: int) -> np.ndarray:
    """Dense rank of every suffix of ``codes`` by its first ``target``
    (a power of two) elements — the Manber-Myers doubling ladder, stopped
    at ``target`` instead of full order."""
    n = len(codes)
    order = np.argsort(codes, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    sc = codes[order]
    diff = np.empty(n, dtype=bool)
    diff[0] = False
    np.not_equal(sc[1:], sc[:-1], out=diff[1:])
    rank[order] = np.cumsum(diff)
    step = 1
    while step < target:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - step] = rank[step:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        diff = np.empty(n, dtype=bool)
        diff[0] = False
        diff[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        rank[order] = np.cumsum(diff)
        step *= 2
        if rank[order[-1]] == n - 1:  # all suffixes already distinct
            break
    return rank


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def mark_shard(ids: list, texts: list[str | None], k: int) -> tuple[list, list[int]]:
    """Marked (id, pos) pairs for one shard — every position whose k-gram
    (or whole text, for docs shorter than k) occurs in ≥ 2 distinct
    documents of the shard. Pure function; the Spark face is
    :func:`sa_marked_positions`."""
    out_ids: list = []
    out_pos: list[int] = []

    # short documents (len < k): one gram = the whole text, position 0 —
    # comparable only against other short docs (length-distinct strings
    # never match), exactly as char_gram_postings' single short gram
    short: dict[str, list] = {}
    segs: list[tuple] = []
    for i, t in zip(ids, texts):
        if t is None:
            continue
        if len(t) < k:
            short.setdefault(t, []).append(i)
        else:
            segs.append((i, t))
    for t, ds in short.items():
        if len(ds) >= 2:  # one row per doc, so list length = distinct docs
            for i in ds:
                out_ids.append(i)
                out_pos.append(0)

    if not segs:
        return out_ids, out_pos

    lens = np.array([len(t) for _, t in segs], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]
    parts: list[np.ndarray] = []
    for j, (_, t) in enumerate(segs):
        parts.append(_codepoints(t))
        parts.append(np.array([-(j + 1)], dtype=np.int64))  # unique sentinel
    codes = np.concatenate(parts)

    # candidate gram positions: full in-doc k-windows only
    n_cand = lens - k + 1
    cand = np.concatenate(
        [starts[j] + np.arange(n_cand[j], dtype=np.int64) for j in range(len(segs))]
    )
    cand_doc = np.repeat(np.arange(len(segs), dtype=np.int64), n_cand)

    a = 1 << (k.bit_length() - 1)  # largest power of two <= k
    rank_a = _rank_pow2(codes, a)
    key1 = rank_a[cand]
    key2 = key1 if a == k else rank_a[cand + (k - a)]

    order = np.lexsort((key2, key1))
    k1s, k2s, docs_s = key1[order], key2[order], cand_doc[order]
    new_run = np.empty(len(order), dtype=bool)
    new_run[0] = True
    new_run[1:] = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.append(run_starts, len(order)))
    # a run (one k-gram equality class) marks iff it spans >= 2 distinct docs
    dmin = np.minimum.reduceat(docs_s, run_starts)
    dmax = np.maximum.reduceat(docs_s, run_starts)
    marked = np.repeat(dmin != dmax, run_lens)

    sel = order[marked]
    if len(sel):
        sel_docs = cand_doc[sel]
        pos = cand[sel] - starts[sel_docs]
        seg_ids = np.array([i for i, _ in segs], dtype=object)
        out_ids.extend(seg_ids[sel_docs].tolist())
        out_pos.extend(pos.tolist())
    return out_ids, out_pos


def sa_marked_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    k: int = 30,
) -> DataFrame:
    """(id, pos) marked positions, one ``applyInPandas`` suffix-structure
    pass per shard. Output is a set — independent of row order and
    partitioning (parallelism-invariant by construction)."""
    id_t = df.schema[id_col].dataType.simpleString()

    def _mark(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, pos = mark_shard(
            pdf[id_col].tolist(), pdf[text_col].tolist(), k
        )
        return pd.DataFrame({"id": ids, "pos": pos})

    return (
        df.select(id_col, text_col, shard_col)
        .groupBy(shard_col)
        .applyInPandas(_mark, f"id {id_t}, pos int")
    )


def sa_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    k: int = 30,
) -> DataFrame:
    """(id, span_start, span_end) — maximal within-shard repeated spans,
    suffix-array marking + the shared gaps-and-islands merge."""
    return merge_position_islands(
        sa_marked_positions(df, id_col, text_col, shard_col, k), k
    )
