"""Vectorized fuzzy SELECT mapping — the similarity join (SURVEY.md J6).

The reference scores each OCR value against a per-field option vocabulary
(``ocr_backend/app/api/ocr_routes.py:31-166``). Relationally this is a theta
/similarity join: ``values ⋈_{score(v,label) ≥ 75} options``. The vocabulary
is tiny (a dimension table), so the distributed execution is:

  broadcast(vocab as a plain dict) → Arrow-batched pandas UDF computing the
  top-scoring option per value, memoized per distinct value.

No shuffle at all — the fact side streams through map tasks; this is the
broadcast-nested-loop-join plan Catalyst would pick, executed inside one
vectorized kernel where the scorer lives.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ocr_platform_spark.functions.fuzzy import CachedMapper


def vocab_dict(field_options: DataFrame) -> dict[str, list[tuple[str, str]]]:
    """Collect a field_options dimension (field_name, option_value,
    option_label) into the broadcastable python shape. The dimension is tiny
    by construction (constrained vocabularies) — collect is correct here."""
    out: dict[str, list[tuple[str, str]]] = {}
    rows = field_options.select("field_name", "option_value", "option_label").collect()
    for r in rows:
        out.setdefault(r["field_name"], []).append((r["option_value"], r["option_label"]))
    # deterministic vocabulary order regardless of collect order
    for k in out:
        out[k].sort()
    return out


def map_select_column(
    df: DataFrame,
    value_col: str,
    field_col: str,
    field_options: DataFrame,
    out_col: str = "mapped_value",
) -> DataFrame:
    """Append ``out_col``: the vocabulary-mapped value (None when no match
    clears the cutoff; passthrough when the field has no vocabulary)."""
    spark = df.sparkSession
    vocab = vocab_dict(field_options)
    bc = spark.sparkContext.broadcast(vocab)

    @F.pandas_udf("string")
    def _map(values: pd.Series, fields: pd.Series) -> pd.Series:
        mapper = CachedMapper(bc.value)
        return pd.Series(
            [mapper.map(f, v) for v, f in zip(values, fields)], dtype="object"
        )

    return df.withColumn(out_col, _map(F.col(value_col), F.col(field_col)))


def map_select_single_vocab(
    df: DataFrame, value_col: str, options: list[tuple[str, str]], out_col: str = "mapped_value"
) -> DataFrame:
    """Single-vocabulary variant (one SELECT field)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast({"_": sorted(options)})

    @F.pandas_udf("string")
    def _map(values: pd.Series) -> pd.Series:
        mapper = CachedMapper(bc.value)
        return pd.Series([mapper.map("_", v) for v in values], dtype="object")

    return df.withColumn(out_col, _map(F.col(value_col)))
