"""Content-defined chunking (CDC) for payload-level dedup.

The storage-system dedup mechanic (LBFS/FastCDC family) applied to crawl
payloads: chunk boundaries come from the CONTENT (a Gear rolling hash
hitting a zero-mask condition), not from fixed offsets, so inserting one
byte near the start of a page shifts only the chunk containing the edit —
every later boundary re-synchronizes, and the unchanged tail keeps its
chunk hashes. Re-crawled pages, mirrored hosts and templated documents
then dedup at the CHUNK level even when no two payloads are
byte-identical, which document-level fingerprints (operators/dedup.py)
can never see.

Spark shape
-----------
- The boundary scan is inherently sequential PER PAYLOAD but embarrassingly
  parallel ACROSS payloads: an Arrow-batched ``mapInPandas`` kernel walks
  each payload once (the same kernel-vectorization contract as
  kernels/html_extract.py — no per-row Python UDF, no JVM round-trips
  inside a batch).
- The emitted chunk table ``(id, idx, start, length, chunk_hash)`` is tiny
  next to the payloads (one row per ~2^avg_bits bytes) and purely
  relational — dedup statistics, per-host savings, and cross-snapshot
  delta sizing are ordinary joins/aggregates that DuckDB replays from the
  staged table (the staging.py split), while the boundary rule itself is
  pinned by pytest: min/max bounds, shift-resynchronization, and
  partitioning invariance.

Determinism: the gear table derives from a fixed LCG seed (no RNG state),
and the chunk hash is xxhash-free CPython ``hashlib.md5`` over the chunk
bytes — identical on any executor, any platform.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_CHUNK_SCHEMA = (
    "id long, idx int, start long, length int, chunk_hash string"
)

_MASK64 = (1 << 64) - 1


def gear_table(seed: int = 0x2F6E_6C6B) -> list[int]:
    """256 deterministic 64-bit gear values from a fixed LCG (Numerical
    Recipes constants). No library RNG: byte-stable everywhere."""
    out = []
    x = seed & _MASK64
    for _ in range(256):
        x = (x * 6364136223846793005 + 1442695040888963407) & _MASK64
        out.append(x)
    return out


_GEAR = gear_table()

_GEAR_LOW: dict[int, "object"] = {}


def _gear_low_table(width: int):
    """Gear table truncated to the low ``width`` bits as a numpy array
    (cached) — see cdc_boundaries_fast for why truncation is exact."""
    import numpy as np

    if width not in _GEAR_LOW:
        dt = {8: np.uint8, 16: np.uint16, 32: np.uint32}[width]
        _GEAR_LOW[width] = np.asarray(
            [g & ((1 << width) - 1) for g in _GEAR], dtype=dt
        )
    return _GEAR_LOW[width]


def cdc_boundaries(
    data: bytes,
    avg_bits: int = 6,
    min_size: int = 16,
    max_size: int = 256,
) -> list[tuple[int, int]]:
    """[(start, end)] chunk spans covering ``data`` exactly.

    Gear CDC: ``h = (h << 1) + gear[byte] (mod 2^64)``; a boundary fires
    after position ``i`` when the low ``avg_bits`` bits of h are zero
    (expected chunk ≈ 2^avg_bits bytes) — but the condition is only
    CHECKED once the current chunk reaches ``min_size``, and a boundary
    is forced at ``max_size``. The low ``avg_bits`` bits of the gear
    hash depend on only the last ``avg_bits`` bytes (each shift pushes
    older contributions up), which is what makes boundaries re-
    synchronize a few bytes after any edit. Empty input yields no spans.
    """
    if not 0 < min_size <= max_size:
        raise ValueError(f"need 0 < min_size <= max_size, got {min_size=} {max_size=}")
    mask = (1 << avg_bits) - 1
    spans: list[tuple[int, int]] = []
    n = len(data)
    start = 0
    h = 0
    for i in range(n):
        clen = i - start + 1
        if clen == 1:
            h = 0
        h = ((h << 1) + _GEAR[data[i]]) & _MASK64
        if clen < min_size:
            continue
        if (h & mask) == 0 or clen >= max_size:
            spans.append((start, i + 1))
            start = i + 1
    if start < n:
        spans.append((start, n))
    return spans


def cdc_boundaries_fast(
    data: bytes,
    avg_bits: int = 6,
    min_size: int = 16,
    max_size: int = 256,
) -> list[tuple[int, int]]:
    """Vectorized twin of :func:`cdc_boundaries` — bit-identical spans
    (pinned by tests), ~50× faster on CPython.

    Key identity: the boundary test reads only the low ``avg_bits`` bits
    of the gear hash, and each shift pushes older bytes' contributions
    up — so those bits depend on just the last ``avg_bits`` bytes.
    Because the test is only CHECKED once a chunk reaches ``min_size``
    (>= ``avg_bits``), the per-chunk hash reset has already been shifted
    out of the masked bits at every checked position, and the hit mask
    equals a reset-free CONVOLUTION of gear values — computable for the
    whole payload in one numpy pass. Chunking then walks the sparse hit
    list (~2^-avg_bits of positions) applying the min/max-size rules.
    """
    if not 0 < min_size <= max_size:
        raise ValueError(f"need 0 < min_size <= max_size, got {min_size=} {max_size=}")
    if min_size < avg_bits:
        # reset leakage into the masked bits -> fall back to the scalar walk
        return cdc_boundaries(data, avg_bits, min_size, max_size)
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    # the test reads h mod 2^avg_bits; wrap-around addition mod 2^width
    # preserves it exactly whenever avg_bits <= width, so the whole
    # convolution runs in the narrowest unsigned dtype that fits
    width = 8 if avg_bits <= 8 else (16 if avg_bits <= 16 else 32)
    gear_low = _gear_low_table(width)
    gv = gear_low[np.frombuffer(data, dtype=np.uint8)]
    acc = np.zeros(n, dtype=gv.dtype)
    for k in range(min(avg_bits, n)):
        # gear value of the byte k positions back, shifted k bits up
        acc[k:] += gv[: n - k] << gv.dtype.type(k)
    mask = gv.dtype.type((1 << avg_bits) - 1)
    hits = np.flatnonzero((acc & mask) == 0)
    # successor table: if a chunk ends at hits[j]+1, the next chunk's
    # earliest admissible boundary hit is the first hit >= hits[j]+min_size
    # — one vectorized searchsorted replaces the per-chunk bisect (the walk
    # was ~90% of runtime at small avg_bits); a fresh searchsorted is only
    # needed after the rare max_size-forced boundary
    nxt = hits.searchsorted(hits + min_size, side="left").tolist()
    hl = hits.tolist()  # python-int list: loop indexing beats numpy scalars
    spans: list[tuple[int, int]] = []
    append = spans.append
    start = 0
    nh = len(hl)
    j = int(hits.searchsorted(min_size - 1))
    while start < n:
        if j < nh:
            h = hl[j]
            if h < start + max_size:
                end = h + 1
                append((start, end))
                start = end
                j = nxt[j]
                continue
        end = start + max_size
        if end > n:
            end = n
        append((start, end))
        start = end
        j = int(hits.searchsorted(start + min_size - 1))
    return spans


def cdc_chunk_table(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    avg_bits: int = 6,
    min_size: int = 16,
    max_size: int = 256,
) -> DataFrame:
    """(id, idx, start, length, chunk_hash) — one row per content-defined
    chunk of every payload. Arrow-batched kernel; inherits the input
    partitioning (no shuffle)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.operators.cdc import cdc_boundaries_fast  # executor

        for pdf in batches:
            rows = []
            for pid, data in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(data) if data is not None else b""
                for idx, (a, b) in enumerate(
                    cdc_boundaries_fast(data, avg_bits, min_size, max_size)
                ):
                    rows.append(
                        (
                            pid,
                            idx,
                            a,
                            b - a,
                            hashlib.md5(data[a:b]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["id", "idx", "start", "length", "chunk_hash"]
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(kernel, _CHUNK_SCHEMA)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """(id, n_chunks, n_bytes, n_dup_chunks, dup_bytes) per payload, where a
    chunk is a duplicate when its hash occurs in >= 2 DISTINCT payloads
    (cross-document shared content — templating, mirrors, re-crawls).
    Two hash aggregates plus one join, all keyed by chunk_hash/id — the
    chunk table is ~payload_bytes / 2^avg_bits rows, so this is the cheap
    relational tail of the pipeline."""
    shared = (
        chunks.select("chunk_hash", "id")
        .groupBy("chunk_hash", "id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("chunk_hash")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("chunk_hash", F.lit(True).alias("_dup"))
    )
    marked = chunks.join(shared, "chunk_hash", "left")
    return marked.groupBy("id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("length").cast("long").alias("n_bytes"),
        F.count(F.when(F.col("_dup").isNotNull(), 1)).cast("long").alias("n_dup_chunks"),
        F.coalesce(
            F.sum(F.when(F.col("_dup").isNotNull(), F.col("length"))), F.lit(0)
        )
        .cast("long")
        .alias("dup_bytes"),
    )


def cdc_host_dictionary_stats(chunks: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, n_docs, n_chunks, total_bytes, dict_bytes, saved_bytes,
    saved_pm) — per-host SHARED-DICTIONARY savings estimate: if each host
    stores every chunk whose hash occurs in ≥ 2 of its documents exactly
    once (the host dictionary — template furniture, shared JS/CSS,
    syndicated blocks), repeated occurrences cost nothing, so
    ``saved_bytes = Σ (occurrences − 1) × length`` over shared hashes and
    ``dict_bytes`` is the dictionary's one-copy size. ``saved_pm`` is the
    integer per-mille of payload bytes the dictionary removes — the number
    that prices chunk-level storage for a recrawl archive. Input is the
    chunk table joined with a host column; everything here is two hash
    aggregates keyed by (host, chunk_hash) and host — chunk-table-sized,
    nothing touches payload bytes."""
    per_hash = chunks.groupBy(host_col, "chunk_hash").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("id").alias("n_ids"),
        # same hash => same bytes => same length; max is just the value
        F.max("length").alias("length"),
    )
    shared = per_hash.where(F.col("n_ids") >= 2)
    tot = chunks.groupBy(host_col).agg(
        F.countDistinct("id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("length").cast("long").alias("total_bytes"),
    )
    sav = shared.groupBy(host_col).agg(
        F.sum("length").cast("long").alias("dict_bytes"),
        F.sum((F.col("n_occ") - 1) * F.col("length")).cast("long").alias("saved_bytes"),
    )
    return (
        tot.join(sav, host_col, "left")
        .select(
            host_col,
            "n_docs",
            "n_chunks",
            "total_bytes",
            F.coalesce("dict_bytes", F.lit(0)).cast("long").alias("dict_bytes"),
            F.coalesce("saved_bytes", F.lit(0)).cast("long").alias("saved_bytes"),
        )
        .withColumn(
            "saved_pm", F.expr("cast((1000 * saved_bytes) div total_bytes as bigint)")
        )
    )
