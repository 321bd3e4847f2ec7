"""Unicode normalization — the canonicalization step real crawls need
before any byte-level dedup or fingerprinting (CCNet normalizes text
before hashing; two byte-different spellings of ``café`` must not defeat
exact dedup).

Spark has no Unicode-normalization builtin, so this is an Arrow-batched
pandas UDF over ``unicodedata`` (the UDF-policy slow path, ~100 ns/row —
acceptable for a one-off canonicalization pass fused with ingest). DuckDB
ships ``nfc_normalize`` natively (utf8proc), which gives the catalog a
rare treat: a CROSS-ENGINE equivalence check of two independent
implementations of the Unicode canonical-composition algorithm (CPython's
unicodedata vs utf8proc), value-hashed over staged bytes — pinned by
tests/test_unicodefns.py on combining marks, reordering, ligatures and
Hangul."""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F


def _nfc_batch(texts):
    rows = []
    for t in texts:
        if t is None:
            # propagate NULL (DuckDB's nfc_normalize(NULL) is NULL too);
            # coercing to '' would let a NULL document hash/dedup as the
            # empty string
            rows.append((None, None, None))
            continue
        norm = unicodedata.normalize("NFC", t)
        rows.append((norm, len(t), len(norm)))
    return pd.DataFrame(rows, columns=["norm", "len_before", "len_after"])


# real annotation objects, not PEP-563 strings (the module-wide future
# import would break pandas_udf's Series->DataFrame type inference)
_nfc_batch.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}


def nfc_normalize_udf() -> Column:
    """Built lazily — pandas_udf parses its DDL return type against the
    ACTIVE SparkContext, so a module-level instance would fail on import
    before any session exists."""
    return F.pandas_udf("struct<norm: string, len_before: int, len_after: int>")(
        _nfc_batch
    )


def with_nfc(df, text_col: str, out_prefix: str = ""):
    """Append ``norm``, ``changed``, ``len_before``, ``len_after`` columns
    (codepoint lengths — both engines count codepoints, not UTF-16
    units)."""
    p = out_prefix
    return df.withColumn("_n", nfc_normalize_udf()(F.col(text_col))).select(
        "*",
        F.col("_n.norm").alias(f"{p}norm"),
        # null-safe: a NULL text is "unchanged" (False), not NULL — a
        # plain != would make where(changed) AND where(~changed) both
        # silently drop NULL rows
        (~F.col("_n.norm").eqNullSafe(F.col(text_col))).alias(f"{p}changed"),
        F.col("_n.len_before").alias(f"{p}len_before"),
        F.col("_n.len_after").alias(f"{p}len_after"),
    ).drop("_n")
