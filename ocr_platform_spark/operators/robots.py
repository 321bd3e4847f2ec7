"""Robots-directive operators over the raw page table (kernels/robots.py).

``drop_noindex`` is the polite-corpus gate: applied BEFORE extraction so
opted-out pages never enter the snapshot. It is a fused boolean filter on
the same scan the extraction kernel reads — one Arrow-batched predicate,
no join, no second pass over the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

_FLAGS_DDL = "url string, noindex boolean, nofollow boolean"


def meta_robots_flags(docs: DataFrame) -> DataFrame:
    """documents(url, html, ...) → (url, noindex, nofollow), Arrow-batched,
    column-pruned to (url, html)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.kernels.robots import parse_robots_meta

        for pdf in batches:
            ni: list[bool] = []
            nf: list[bool] = []
            for html in pdf["html"]:
                a, b = parse_robots_meta(bytes(html) if html is not None else b"")
                ni.append(a)
                nf.append(b)
            yield pd.DataFrame(
                {"url": pdf["url"], "noindex": ni, "nofollow": nf}
            )

    return docs.select("url", "html").mapInPandas(kernel, _FLAGS_DDL)


@pandas_udf(BooleanType())
def _is_noindex(htmls: pd.Series) -> pd.Series:
    from ocr_platform_spark.kernels.robots import parse_robots_meta

    return htmls.map(
        lambda h: parse_robots_meta(bytes(h) if h is not None else b"")[0]
    )


def drop_noindex(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """Rows whose page does NOT carry a robots noindex directive — a fused
    Arrow predicate on the input scan (plan: one ArrowEvalPython + Filter,
    no shuffle)."""
    return docs.where(~_is_noindex(F.col(html_col)))
