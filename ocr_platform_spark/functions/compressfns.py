"""Compression-ratio quality signal (deflate), Arrow-batched.

A document's deflate ratio is a cheap, model-free repetitiveness/entropy
probe used by web-corpus builds (RefinedWeb §3 "repetitious content",
Gopher's repetition family): machine-generated loops compress far below
natural prose, while random/binary junk barely compresses at all — both
are drop candidates that length/stopword heuristics miss.

The compressor runs Python-side (zlib level 6) but NEVER per row from the
driver: a pandas UDF compresses whole Arrow batches inside the executors —
the mapInArrow discipline of the extraction kernels. Everything downstream
of the two byte counts (ratio, keep band) is integer arithmetic, so the
catalog query stages ``(id, n_bytes, z_bytes)`` and lets DuckDB recompute
the verdicts bit-for-bit (staging.py pattern: the kernel is pinned by
pytest, the relational tail by the oracle).

Scale shape: one scan, no shuffle — the signal is a per-row map; deflate
throughput (~100 MB/s/core) is the bound and parallelizes embarrassingly.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_LEVEL = 6


# LongType() (not the DDL string "long") so importing this module never
# needs an active session for return-type parsing
@pandas_udf(LongType())
def deflate_size(texts: pd.Series) -> pd.Series:
    """Compressed byte length of each text's UTF-8 bytes (zlib level 6);
    null/empty → 0-byte input compressed (a few header bytes)."""
    return texts.fillna("").map(
        lambda t: len(zlib.compress(t.encode("utf-8"), _LEVEL))
    )


def utf8_size(col: Column | str) -> Column:
    """Uncompressed UTF-8 byte length (built-in, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.octet_length(F.coalesce(c, F.lit(""))).cast("long")


def compression_signal(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_bytes, z_bytes) — the staged kernel output; ratio and keep
    decisions belong downstream (see ``compression_verdict``) so an
    independent engine can recompute them from these integers."""
    return df.select(
        F.col(id_col).alias("id"),
        utf8_size(text_col).alias("n_bytes"),
        deflate_size(F.coalesce(F.col(text_col), F.lit(""))).alias("z_bytes"),
    )


def compression_verdict(
    sig: DataFrame,
    min_ratio_x1000: int = 200,
    max_ratio_x1000: int = 900,
) -> DataFrame:
    """All-integer verdicts over a (id, n_bytes, z_bytes) table:

    - ``ratio_x1000 = z_bytes * 1000 div n_bytes`` (floor; 0 for empty);
    - ``too_repetitive``: ratio below the floor (loops, boilerplate spam);
    - ``too_random``: ratio above the ceiling (binary junk, encrypted streams);
    - ``compression_keep``: inside the band.
    """
    r = F.when(
        F.col("n_bytes") > 0, F.expr("z_bytes * 1000 div n_bytes")
    ).otherwise(F.lit(0)).cast("long")
    return sig.select(
        "id",
        "n_bytes",
        "z_bytes",
        r.alias("ratio_x1000"),
        (r < min_ratio_x1000).alias("too_repetitive"),
        (r > max_ratio_x1000).alias("too_random"),
        ((r >= min_ratio_x1000) & (r <= max_ratio_x1000)).alias("compression_keep"),
    )
