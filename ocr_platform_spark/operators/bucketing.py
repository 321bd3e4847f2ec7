"""Bucketed table layout — co-located, shuffle-free fact⋈fact joins
(SURVEY.md §4.2: partitioning/shuffle handled explicitly).

Broadcast covers every dimension join in the catalog (J1-J10), but a
fact⋈fact equi join (extracted results ⋈ corrections history at 10^12
rows, or resume anti-joins against a billion-url processed set) shuffles
BOTH sides on every query. Bucketing pays that shuffle once at write time:
rows are hash-clustered into a fixed number of buckets on the join key, so
any later join (or groupBy) on that key reads co-located buckets and plans
with NO Exchange on either side — at 100 TB the difference between a
terabyte-scale network shuffle per query and none.

Spark specifics encoded here:
- ``bucketBy`` requires ``saveAsTable`` (bucket metadata lives in the
  catalog, not in parquet footers) — plain ``.parquet(path)`` silently
  drops bucketing;
- both sides must agree on (key, n_buckets); the plan test pins the
  exchange-free join shape so a regression (e.g. a bucket-count drift)
  surfaces as a failing test, not a silent 100×-cost query;
- ``sortBy`` within buckets additionally removes the per-task Sort before
  a SortMergeJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.
    ``path`` makes it an external table at an explicit location (the
    warehouse dir is a static conf — tests and multi-tenant jobs pass their
    own path)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    (key, n_buckets) Catalyst plans a SortMergeJoin with ZERO shuffle
    exchanges (pinned in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
