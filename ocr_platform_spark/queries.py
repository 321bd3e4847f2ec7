"""Driver-contract query catalog: every SURVEY.md §2 operator family as a
named (Spark query, DuckDB oracle SQL) pair over the /root/testdata tables.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/types line up with the oracle SQL (the driver sorts columns by
name and value-hashes — see /root/repo/__spark_entry__.py docstring), so
every aggregate/computed column is aliased identically on both sides.

Oracle discipline: the SQL is a *genuine reimplementation* of the semantics
in DuckDB (not a table of expected constants), and cross-engine value
stability is engineered, not hoped for:

- sums are computed on DECIMAL or quantized BIGINT (exact, order-independent)
  — never on raw doubles, whose partial-aggregation order differs between
  engines;
- derived doubles come from a *single deterministic op sequence* on exact
  inputs (e.g. ``round(cast(dec as double) / n, 4)``), identical per IEEE-754
  in both engines;
- similarity scores (cosine) are computed on quantized integer vectors so
  dot products and norms are exact integers in both engines;
- window ranks always carry a deterministic tie-break key.

Queries whose operators have no SQL equivalent (xxhash64-based MinHash/
SimHash LSH, the difflib fuzzy mapper, the Arrow extraction kernel) are
registered without an oracle → the driver records a rows-only check
(weaker, by design; the strong checks for those live in tests/).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ocr_platform_spark.functions import conversions as C
from ocr_platform_spark.functions import encodingfns as ENC
from ocr_platform_spark.functions import textfns as TX
from ocr_platform_spark.operators import ann, dedup, embed
from ocr_platform_spark.operators.select_mapping import (
    map_select_single_vocab,
    score_select_column,
)
from ocr_platform_spark.operators.robots_txt import (
    crawl_delay_schedule_oracle_sql,
    robots_oracle_sql,
)
from ocr_platform_spark.operators.sampling import oracle_bucket_sql
from ocr_platform_spark.staging import stage, staged_glob


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


CATALOG: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver may pass a session built without our factory —
            # executors then lack the package unless we ship it here
            from ocr_platform_spark.session import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        CATALOG[name] = QuerySpec(wrapped, oracle)
        return fn

    return deco


# =========================================================================
# Relational core (SURVEY §2.2-§2.7) over the TPC-H-ish tables
# =========================================================================


@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)        AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)  AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE)      AS sum_disc_price,
           COUNT(*)                                                      AS n_rows,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4)                                          AS avg_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (A1/A3 aggregates + P-filters). Decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("n_rows"),
            F.round(F.sum(price).cast("double") / F.count("*"), 4).alias("avg_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "top_customers",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*)                                   AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-style dim join + aggregate + deterministic global top-k (O2)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


@q(
    "regional_balance",
    """
    SELECT r.r_name,
           COUNT(*)                                 AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def regional_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast hash joins (J1/J7: tiny dims) + hash aggregate."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_balance"),
        )
        .orderBy("r_name")
    )


@q(
    "customers_without_orders",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J8 — the ensure-exists / resume primitive)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@q(
    "customers_with_open_orders",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J2/J9 existence check) with pushed-down predicate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@q(
    "orders_topk_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
           CAST(rk AS INT) AS rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                                         o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def orders_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-group top-k with deterministic tie-break."""
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey").orderBy(price.desc(), "o_orderkey")
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            price.cast("double").alias("totalprice"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@q(
    "lineitem_row_index",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_linenumber) - 1 AS INT) AS row_index
    FROM lineitem WHERE l_orderkey <= 800
    """,
)
def lineitem_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: the reference's row_index enumeration per (doc, table-field)
    (``ocr_backend/app/api/ocr_routes.py:625-631``) on relational data."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 800)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.row_number().over(w) - 1).cast("int").alias("row_index"),
    )


@q(
    "order_status_pivot",
    """
    SELECT o_custkey,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders GROUP BY o_custkey
    """,
)
def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2 pivot (EAV→wide): explicit value list → single hash aggregate,
    no pivot-values discovery pass."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_custkey")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_custkey",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_pending"),
    )


@q(
    "part_attrs_unpivot",
    """
    SELECT p_partkey, 'brand' AS attr, p_brand AS value FROM part WHERE p_partkey <= 500
    UNION ALL
    SELECT p_partkey, 'type'  AS attr, p_type  AS value FROM part WHERE p_partkey <= 500
    """,
)
def part_attrs_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 unpivot (wide→EAV) via stack — the reference's wide-dict→EAV-row
    persistence shape (``ocr_routes.py:549-596``)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.expr("stack(2, 'brand', p_brand, 'type', p_type) AS (attr, value)"),
    )


@q(
    "distinct_segments",
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 DISTINCT."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")


@q(
    "priority_union",
    """
    SELECT o_orderkey, 'urgent' AS priority_class FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, 'high'   AS priority_class FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def priority_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 union of tagged partitions (the reference's text/table field
    re-union, ``ocr_routes.py:521-524,717-727``)."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("priority_class")
    )
    high = o.where(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", F.lit("high").alias("priority_class")
    )
    return urgent.unionByName(high)


@q(
    "events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_micros
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate (the batch face of the
    streaming windowed agg in streaming/incremental.py). Quantized-exact sum."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias(
                "total_value_micros"
            ),
        )
        .orderBy("hour_start", "event_type")
    )


@q(
    "events_props_json",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 JSON parsing (``gemini_ocr.py:209-258``'s from_json face):
    extract a typed value from the JSON ``props`` column and aggregate —
    exact integer sums, cross-engine."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.where(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@q(
    "event_type_spans",
    """
    SELECT event_type,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_type_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 min/max timestamp + distinct-count aggregate."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@q(
    "voucher_totals",
    """
    SELECT o.o_orderkey AS voucher_id,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS subtotal,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(l.l_tax AS DECIMAL(18,4))) AS DOUBLE) AS tax_amount,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS discount_amount,
           CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                 + SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_tax AS DECIMAL(18,4)))
                 - SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_discount AS DECIMAL(18,4))))
                * CASE WHEN o.o_orderstatus = 'O' THEN -1 ELSE 1 END AS DOUBLE) AS voucher_total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey <= 3000
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def voucher_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's voucher aggregation (A3/A4: per-voucher SUM(amount),
    SUM(qty), SUM(tax), SUM(discount); total = sub + tax − disc,
    ``ocr_backend/app/tally/utils.py:149-186``) with the sales-side sign
    flip (F16, ``app/tally/session.py:474-476``) keyed on order status."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 3000)
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    sub = F.sum(price)
    tax = F.sum(price * F.col("l_tax").cast("decimal(18,4)"))
    disc = F.sum(price * F.col("l_discount").cast("decimal(18,4)"))
    sign = F.when(F.col("o_orderstatus") == "O", -1).otherwise(1)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"),
            sub.cast("double").alias("subtotal"),
            tax.cast("double").alias("tax_amount"),
            disc.cast("double").alias("discount_amount"),
            ((sub + tax - disc) * sign).cast("double").alias("voucher_total"),
        )
        .select(
            F.col("o_orderkey").alias("voucher_id"),
            "total_qty", "subtotal", "tax_amount", "discount_amount", "voucher_total",
        )
    )


@q(
    "party_name_normalization",
    r"""
    WITH fx AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN 'M/s.  ' || c_name || '  Pvt Ltd'
                  WHEN c_custkey % 3 = 1 THEN 'm/s ' || c_name || ' PRIVATE LIMITED'
                  ELSE c_name || '   Ltd.' END AS raw
      FROM customer
    )
    SELECT c_custkey, raw,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(lower(raw), '^m/s\.?\s+', '', 'g'),
               '\s+(pvt\.?\s+ltd\.?|private\s+limited|ltd\.?)\s*$', '', 'g'),
             '\s+', ' ', 'g')) AS normalized
    FROM fx
    """,
)
def party_name_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 ``normalize_party_name`` (``app/tally/utils.py:114-146``): strip
    M/s prefixes and Pvt-Ltd-style suffixes, collapse whitespace — the
    anchored regexp_replace chain, lowercased canonical form."""
    c = _t(spark, sf_dir, "customer")
    raw = (
        F.when(
            F.pmod("c_custkey", F.lit(3)) == 0,
            F.concat(F.lit("M/s.  "), F.col("c_name"), F.lit("  Pvt Ltd")),
        )
        .when(
            F.pmod("c_custkey", F.lit(3)) == 1,
            F.concat(F.lit("m/s "), F.col("c_name"), F.lit(" PRIVATE LIMITED")),
        )
        .otherwise(F.concat(F.col("c_name"), F.lit("   Ltd.")))
    )
    fx = c.select("c_custkey", raw.alias("raw"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower("raw"), r"^m/s\.?\s+", ""),
                r"\s+(pvt\.?\s+ltd\.?|private\s+limited|ltd\.?)\s*$",
                "",
            ),
            r"\s+",
            " ",
        )
    )
    return fx.select("c_custkey", "raw", norm.alias("normalized"))


@q(
    "first_order_per_customer",
    """
    SELECT o_custkey,
           arg_min(o_orderkey, epoch(o_orderdate) * 100000 + o_orderkey) AS first_orderkey
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 first-match semantics (``document_routes.py:516`` ``.first()``)
    as ``min_by`` on a unique (date, key) scalar — no window, one agg."""
    o = _t(spark, sf_dir, "orders")
    order_key = F.unix_timestamp("o_orderdate") * 100000 + F.col("o_orderkey")
    return (
        o.groupBy("o_custkey")
        .agg(F.min_by("o_orderkey", order_key).alias("first_orderkey"))
        .orderBy("o_custkey")
    )


@q(
    "order_rollup",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (engine capability beyond the reference's
    flat GROUP BYs — SURVEY §2.4 notes the reference has none)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


@q(
    "user_sessions",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM tagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM numbered GROUP BY user_id, session_no ORDER BY user_id, session_no
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap), batch face of the custom
    stateful streaming operator (streaming/sessions.py)."""
    from ocr_platform_spark.streaming.sessions import sessionize_batch

    return sessionize_batch(_t(spark, sf_dir, "events"))


@q(
    "user_sessions_native",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM tagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM numbered GROUP BY user_id, session_no ORDER BY user_id, session_no
    """,
)
def user_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via Spark's BUILT-IN ``session_window`` operator
    (merging gap windows inside one aggregation — the form that runs
    unchanged on a watermarked stream). session_window merges an event at
    EXACTLY last+gap (verified in tests/test_sessions.py), i.e. the same
    ``diff > gap`` boundary as the lag/cumsum formulation the oracle runs —
    two independent formulations of one semantics, cross-engine."""
    from ocr_platform_spark.streaming.sessions import sessionize_session_window

    return sessionize_session_window(_t(spark, sf_dir, "events"))


@q("host_cardinality")
def host_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct over hosts + HLL-style scale story (sketch
    results are engine-specific → rows-only driver check; exactness is
    asserted against countDistinct in tests at small scale, and the
    sketch's target value is pinned cross-engine by the
    ``host_cardinality_exact`` companion query below)."""
    docs = _synth_docs(spark)
    from ocr_platform_spark.operators.partitioning import host_of

    return docs.select(host_of("url").alias("host")).agg(
        F.approx_count_distinct("host", 0.01).alias("approx_hosts"),
        F.countDistinct("host").alias("exact_hosts"),
    )


@q(
    "host_cardinality_exact",
    f"""
    SELECT CAST(COUNT(DISTINCT regexp_extract(url, '^https?://([^/?#]+)', 1)) AS BIGINT)
             AS exact_hosts,
           CAST(COUNT(*) AS BIGINT) AS n_urls
    FROM read_parquet('{staged_glob("host_urls")}')
    """,
)
def host_cardinality_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact companion of ``host_cardinality``: the url column is staged,
    and BOTH engines independently derive the host (the ONE shared regex,
    partitioning.HOST_RE ≡ frontier.HOST_SQL) and count distinct —
    pinning the exact value the HLL sketch approximates."""
    from ocr_platform_spark.operators.partitioning import host_of

    urls = stage(_synth_docs(spark).select("url"), "host_urls", partitions=2)
    return urls.agg(
        F.countDistinct(host_of("url")).alias("exact_hosts"),
        F.count("*").alias("n_urls"),
    )


# =========================================================================
# Typed conversion layer (SURVEY §1.2, §2.8) — fixtures derived on the fly
# from the relational tables; both engines run the same conversion logic.
# =========================================================================

_DATE_RENDER_SPARK = [
    "yyyy-MM-dd",
    "dd/MM/yyyy",
    "dd-MMM-yyyy",
    "MMMM d, yyyy",
    "dd.MM.yyyy",
]
_DATE_RENDER_DUCK = ["%Y-%m-%d", "%d/%m/%Y", "%d-%b-%Y", "%B %-d, %Y", "%d.%m.%Y"]

_DUCK_TRY_FORMATS = [
    "%Y-%m-%d",
    "%d/%m/%Y",
    "%m/%d/%Y",
    "%d-%m-%Y",
    "%m-%d-%Y",
    "%d-%b-%Y",
    "%d-%B-%Y",
    "%d.%m.%Y",
    "%Y/%m/%d",
    "%B %-d, %Y",
    "%b %-d, %Y",
    "%-d %B %Y",
    "%-d %b %Y",
    "%Y-%m-%d %H:%M:%S",
    "%d/%m/%Y %H:%M",
]
_DUCK_PARSE = "COALESCE(" + ", ".join(
    f"try_strptime(raw, '{f}')" for f in _DUCK_TRY_FORMATS
) + ")"


@q(
    "convert_date_multiformat",
    f"""
    WITH fx AS (
      SELECT o_orderkey,
             CASE o_orderkey % 5
               {' '.join(f"WHEN {i} THEN strftime(o_orderdate, '{f}')" for i, f in enumerate(_DATE_RENDER_DUCK))}
             END AS raw
      FROM orders WHERE o_orderkey <= 5000
    )
    SELECT o_orderkey, raw,
           strftime({_DUCK_PARSE}, '%d/%m/%Y') AS converted
    FROM fx
    """,
)
def convert_date_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9: the 15-format date parser round-trip. Each order date is
    rendered in one of 5 formats (keyed by orderkey), then re-parsed by the
    full multi-format chain and re-rendered DD/MM/YYYY (the reference's
    canonical date string, ``data_conversion.py:73,141``)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 5000)
    raw = F.lit(None).cast("string")
    branch = None
    for i, fmt in enumerate(_DATE_RENDER_SPARK):
        cond = F.pmod(F.col("o_orderkey"), F.lit(5)) == i
        rendered = F.date_format("o_orderdate", fmt)
        branch = F.when(cond, rendered) if branch is None else branch.when(cond, rendered)
    raw = branch
    fx = o.select("o_orderkey", raw.alias("raw"))
    return fx.select(
        "o_orderkey", "raw", C.convert_date("raw").getField("value").alias("converted")
    )


@q(
    "convert_currency_cases",
    r"""
    WITH fx AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 3 = 0 THEN '$'
                  WHEN o_orderkey % 3 = 1 THEN '₹'
                  ELSE 'EUR ' END AS sym
      FROM orders WHERE o_orderkey <= 5000
    ), built AS (
      SELECT o_orderkey,
             sym || format('{:,}', cents // 100) || '.' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS raw
      FROM fx
    ), cleaned AS (
      SELECT o_orderkey, raw,
             replace(regexp_replace(trim(raw), '[^0-9,.\-]', '', 'g'), ',', '') AS c
      FROM built
    )
    SELECT o_orderkey, raw,
           CASE WHEN regexp_matches(c, '^-?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$')
                THEN regexp_replace(c, '^(-?)0+([0-9])', '\1\2')
                ELSE NULL END AS converted,
           CASE WHEN regexp_matches(c, '^-?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$')
                THEN NULL ELSE 'err' END AS has_error
    FROM cleaned
    """,
)
def convert_currency_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: currency symbol strip + de-comma + Decimal parse
    (``data_conversion.py:209-232``). Strings built exactly (integer math)
    in both engines: '$1,234.56' / '₹…' / 'EUR …'."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 5000)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    sym = (
        F.when(F.pmod("o_orderkey", F.lit(3)) == 0, "$")
        .when(F.pmod("o_orderkey", F.lit(3)) == 1, "₹")
        .otherwise("EUR ")
    )
    raw = F.concat(
        sym,
        F.format_number((cents / 100).cast("long"), 0),
        F.lit("."),
        F.lpad((F.pmod(cents, F.lit(100))).cast("string"), 2, "0"),
    )
    fx = o.select("o_orderkey", raw.alias("raw"))
    conv = C.convert_currency("raw")
    return fx.select(
        "o_orderkey",
        "raw",
        conv.getField("value").alias("converted"),
        F.when(conv.getField("error").isNotNull(), "err").alias("has_error"),
    )


@q(
    "convert_number_cases",
    r"""
    WITH fx AS (
      SELECT l_orderkey * 10 + l_linenumber AS fx_id,
             CASE WHEN l_orderkey % 4 = 0
                  THEN format('{:,}', CAST(round(l_extendedprice) AS BIGINT))
                  WHEN l_orderkey % 4 = 1
                  THEN CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
                  WHEN l_orderkey % 4 = 2
                  THEN CAST(round(l_extendedprice) AS BIGINT) || '.' ||
                       lpad(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0')
                  ELSE 'not-a-number' END AS raw
      FROM lineitem WHERE l_orderkey <= 2000
    ), cleaned AS (
      SELECT fx_id, raw, replace(trim(raw), ',', '') AS c FROM fx
    )
    SELECT fx_id, raw,
           CASE WHEN regexp_matches(c, '[.eE]')
                THEN CASE WHEN try_cast(c AS DOUBLE) IS NOT NULL
                          THEN CAST(try_cast(c AS DOUBLE) AS VARCHAR) ELSE raw END
                ELSE CASE WHEN regexp_matches(c, '^-?[0-9]+$')
                          THEN CAST(try_cast(c AS BIGINT) AS VARCHAR) ELSE raw END
           END AS converted,
           CASE WHEN (CASE WHEN regexp_matches(c, '[.eE]')
                           THEN try_cast(c AS DOUBLE) IS NULL
                           ELSE NOT regexp_matches(c, '^-?[0-9]+$') END)
                THEN 'err' END AS has_error
    FROM cleaned
    """,
)
def convert_number_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: NUMBER conversion (comma strip; int unless '.'/'e';
    ``data_conversion.py:61-66``) incl. the error-as-data contract."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    whole = F.round(F.col("l_extendedprice"), 0).cast("long")
    raw = (
        F.when(F.pmod("l_orderkey", F.lit(4)) == 0, F.format_number(whole, 0))
        .when(F.pmod("l_orderkey", F.lit(4)) == 1, cents.cast("string"))
        .when(
            F.pmod("l_orderkey", F.lit(4)) == 2,
            F.concat(
                whole.cast("string"),
                F.lit("."),
                F.lpad(F.pmod(cents, F.lit(100)).cast("string"), 2, "0"),
            ),
        )
        .otherwise("not-a-number")
    )
    fx = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("fx_id"),
        raw.alias("raw"),
    )
    conv = C.convert_number("raw")
    return fx.select(
        "fx_id",
        "raw",
        conv.getField("value").alias("converted"),
        F.when(conv.getField("error").isNotNull(), "err").alias("has_error"),
    )


_BOOL_TOKENS = [
    "true", "YES", " on ", "Enabled", "1", "active", "y", "ENABLE",
    "false", "No", " off ", "Disabled", "0", "inactive", "n", "DISABLE",
    "maybe", "2", "", "truthy",
]
_BOOL_SQL_ARRAY = "[" + ", ".join(f"'{t}'" for t in _BOOL_TOKENS) + "]"


@q(
    "convert_boolean_cases",
    f"""
    WITH fx AS (
      SELECT event_id, ({_BOOL_SQL_ARRAY})[CAST(event_id % 20 AS INT) + 1] AS raw
      FROM events
    )
    SELECT event_id, raw,
      CASE WHEN raw IS NULL OR trim(raw) = '' THEN NULL
           WHEN lower(trim(raw)) IN ('true','1','yes','y','on','enable','enabled','active') THEN 'true'
           WHEN lower(trim(raw)) IN ('false','0','no','n','off','disable','disabled','inactive') THEN 'false'
           ELSE raw END AS converted,
      CASE WHEN raw IS NOT NULL AND trim(raw) <> ''
            AND lower(trim(raw)) NOT IN
              ('true','1','yes','y','on','enable','enabled','active',
               'false','0','no','n','off','disable','disabled','inactive')
           THEN 'err' END AS has_error
    FROM fx
    """,
)
def convert_boolean_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: the 8+8 boolean token sets (``data_conversion.py:235-258``);
    failures keep the original value and carry an error."""
    e = _t(spark, sf_dir, "events")
    tokens = F.array(*[F.lit(t) for t in _BOOL_TOKENS])
    fx = e.select(
        "event_id",
        F.element_at(tokens, (F.pmod("event_id", F.lit(20)) + 1).cast("int")).alias("raw"),
    )
    conv = C.convert_boolean("raw")
    return fx.select(
        "event_id",
        "raw",
        conv.getField("value").alias("converted"),
        F.when(conv.getField("error").isNotNull(), "err").alias("has_error"),
    )


@q(
    "convert_email_cases",
    """
    WITH fx AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN replace(c_name, '#', '-') || '.example.com'
                  ELSE replace(c_name, '#', '.') || '@Example.COM' END AS raw
      FROM customer
    )
    SELECT c_custkey, raw,
           CASE WHEN contains(trim(raw), '@') AND contains(trim(raw), '.')
                THEN lower(trim(raw)) ELSE raw END AS converted,
           CASE WHEN NOT (contains(trim(raw), '@') AND contains(trim(raw), '.'))
                THEN 'err' END AS has_error
    FROM fx
    """,
)
def convert_email_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: email shape check + lowercase (``data_conversion.py:76-80``);
    every 7th synthesized address lacks '@' → error carried, original kept."""
    c = _t(spark, sf_dir, "customer")
    raw = F.when(
        F.pmod("c_custkey", F.lit(7)) == 0,
        F.concat(F.regexp_replace("c_name", "#", "-"), F.lit(".example.com")),
    ).otherwise(F.concat(F.regexp_replace("c_name", "#", "."), F.lit("@Example.COM")))
    fx = c.select("c_custkey", raw.alias("raw"))
    conv = C.convert_email("raw")
    return fx.select(
        "c_custkey",
        "raw",
        conv.getField("value").alias("converted"),
        F.when(conv.getField("error").isNotNull(), "err").alias("has_error"),
    )


# =========================================================================
# Text analysis / curation (documents table: doc_id, text, lang, source,
# n_chars)
# =========================================================================

_STOP_RE = {lang: TX.stopword_regex(words) for lang, words in TX.LANG_PROFILES}

#: SQL faces of the script-level language gate — generated from the same
#: textfns constants the Spark expressions use, so the two engines cannot
#: drift (column class, threshold, precedence order all shared).
_SCRIPT_COUNTS_SQL = ", ".join(
    f"length(text) - length(regexp_replace(text, '[{rng}]', '', 'g')) AS c_{lang}"
    for lang, rng in TX.SCRIPT_RANGES
) + (
    f", length(text) - length(regexp_replace(text, '[{TX.LATIN_RANGE}]', '', 'g'))"
    " AS c_lat"
)
_SCRIPT_WHENS_SQL = " ".join(
    f"WHEN c_{lang} >= {TX.SCRIPT_MIN_CHARS} AND c_{lang} * 2 >= c_lat THEN '{lang}'"
    for lang, _ in TX.SCRIPT_RANGES
)

#: deterministic non-Latin fixture pages appended to the doc_lang_id
#: oracle pair (the testdata corpus is Latin-only; a real crawl is not) —
#: identical literals on both engines. The mixed row pins the dominance
#: rule: a Latin page quoting two ideographs stays English.
_LANG_FIXTURES: list[tuple[int, str]] = [
    (900001, "这是一个中文测试文档 包含足够的汉字字符 用于脚本检测"),
    (900002, "これは日本語のテスト文書です ひらがなとカタカナを含みます"),
    (900003, "이것은 한국어 테스트 문서입니다 한글 문자가 충분합니다"),
    (900004, "Это русский тестовый документ с достаточным количеством букв"),
    (900005, "هذه وثيقة اختبار باللغة العربية تحتوي على حروف كافية"),
    (900006, "the quick brown fox jumps over the lazy dog and that is that"),
    (900007, "English text quoting 日本 briefly stays English in the mix"),
]
_LANG_FIXTURES_SQL = ", ".join(f"({i}, '{t}')" for i, t in _LANG_FIXTURES)


@q(
    "doc_token_stats",
    r"""
    SELECT doc_id,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           length(text) - length(regexp_replace(text, '[.,;:!?()]', '', 'g')) AS n_punct
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + punctuation counting (JVM-side regex only)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.punct_count("text").alias("n_punct"),
    )


@q(
    "doc_lang_id",
    f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id AS BIGINT), text
      FROM (VALUES {_LANG_FIXTURES_SQL}) AS fx(doc_id, text)
    ),
    scores AS (
      SELECT doc_id,
        {', '.join(f"len(regexp_extract_all(lower(text), '{_STOP_RE[lang]}')) AS s_{lang}" for lang, _ in TX.LANG_PROFILES)},
        {_SCRIPT_COUNTS_SQL}
      FROM docs
    )
    SELECT doc_id,
      CASE {_SCRIPT_WHENS_SQL}
           WHEN greatest(s_en, s_de, s_es, s_fr, s_hi) = 0 THEN 'und'
           {' '.join(f"WHEN s_{lang} = greatest(s_en, s_de, s_es, s_fr, s_hi) THEN '{lang}'" for lang, _ in TX.LANG_PROFILES)}
      END AS pred_lang
    FROM scores
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier language ID (functions/textfns.lang_id): Unicode-block
    script gate first (ja/ko/zh/ru/ar by integer character thresholds
    with a Latin-dominance guard — the first thing a real Common-Crawl
    corpus needs), stopword-profile argmax within Latin script (ties →
    first profile). The testdata corpus is Latin-only, so deterministic
    non-Latin fixture pages (identical literals in both engines,
    including a mixed Latin-quoting-CJK row) extend the oracle surface."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fx = spark.createDataFrame(_LANG_FIXTURES, "doc_id long, text string")
    return d.unionByName(fx).select(
        "doc_id", TX.lang_id("text").alias("pred_lang")
    )


@q(
    "doc_quality",
    r"""
    WITH c AS (
      SELECT doc_id,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
        CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|that|with)\b')) AS DOUBLE) AS stops,
        CAST(length(text) - length(regexp_replace(text, '[.,;:!?()]', '', 'g')) AS DOUBLE) AS punct
      FROM documents
    )
    SELECT doc_id,
      round(
        least(toks / 100.0, 1.0) * 0.4
        + least((CASE WHEN toks > 0 THEN stops / toks ELSE 0.0 END) * 5.0, 1.0) * 0.3
        + (1.0 - least((CASE WHEN toks > 0 THEN punct / toks ELSE 1.0 END) * 2.0, 1.0)) * 0.3,
        4) AS quality
    FROM c
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band + stopword density − punctuation noise."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score("text").alias("quality"))


#: Decomposed/ligature fragments appended per doc_id%6 — gives the NFC
#: kernel real work (combining marks, reordering, ligatures) on an
#: otherwise-ASCII corpus; both engines read the staged bytes.
_NFC_FRAGS = [
    "cafe\u0301",              # e + combining acute -> composes to \u00e9
    "A\u030aberg",             # A + combining ring -> composes to \u00c5
    "s\u0307\u0323urface",     # marks canonically reorder, then compose
    "\ufb01le",                # fi ligature -- NFC keeps it (NFKC splits)
    "plain ascii",             # unchanged
    "ko\u0301\u0302pia",       # acute+circumflex stack
]


@q(
    "doc_nfc_normalization",
    f"""
    WITH i AS (SELECT doc_id, raw FROM read_parquet('{staged_glob("nfc_input")}')),
    n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM i)
    SELECT doc_id, norm, (norm <> raw) AS changed,
           CAST(length(raw) AS INT) AS len_before,
           CAST(length(norm) AS INT) AS len_after
    FROM n ORDER BY doc_id
    """,
)
def doc_nfc_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization (functions/unicodefns.py) — the
    pre-dedup text canonicalization every real crawl runs. Each doc gets a
    deterministic decomposed-unicode fragment appended (combining marks,
    canonical reordering, ligatures, Hangul-free BMP shapes), the input is
    staged, then CPython's ``unicodedata`` (Arrow-batched pandas UDF)
    normalizes on the Spark side while DuckDB's native ``nfc_normalize``
    (utf8proc) recomputes independently — two separate implementations of
    the Unicode composition algorithm, value-hash-matched. Lengths are
    codepoint counts in both engines."""
    from ocr_platform_spark.functions.unicodefns import with_nfc

    d = _t(spark, sf_dir, "documents")
    frags = spark.createDataFrame(
        list(enumerate(_NFC_FRAGS)), "fid int, frag string"
    )
    inp = stage(
        d.withColumn("fid", (F.col("doc_id") % len(_NFC_FRAGS)).cast("int"))
        .join(F.broadcast(frags), "fid")
        .select(
            "doc_id",
            F.concat(F.substring("text", 1, 24), F.lit(" "), F.col("frag")).alias(
                "raw"
            ),
        ),
        "nfc_input",
    )
    return (
        with_nfc(inp, "raw")
        .select("doc_id", "norm", "changed", "len_before", "len_after")
        .orderBy("doc_id")
    )


@q(
    "doc_mojibake_scan",
    f"""
    WITH acc AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(replace(COALESCE(text, ''), 'e', 'é'), 'o', 'ô')
                  ELSE COALESCE(text, '') END AS clean
      FROM documents
    ),
    w AS (
      SELECT doc_id, clean,
             CASE WHEN doc_id % 6 = 0
                  THEN {ENC.corrupt_mojibake_sql("clean")}
                  ELSE clean END AS wire
      FROM acc
    ),
    s AS (
      SELECT doc_id, clean, wire, {ENC.mojibake_count_sql("wire")} AS n_markers
      FROM w
    ),
    r AS (
      SELECT doc_id, clean, wire, n_markers,
             CASE WHEN n_markers > 0
                  THEN {ENC.repair_mojibake_sql("wire")}
                  ELSE wire END AS fixed
      FROM s
    )
    SELECT doc_id, n_markers, (n_markers > 0) AS is_mojibake,
           (fixed = clean) AS recovered,
           CAST(length(wire) - length(fixed) AS BIGINT) AS n_chars_fixed
    FROM r ORDER BY doc_id
    """,
)
def doc_mojibake_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding hygiene (functions/encodingfns.py) — the ftfy/CCNet "fix
    unicode" stage of a web corpus build: detect windows-1252 mojibake
    (UTF-8 bytes decoded with the wrong codec: 'é' arriving as 'Ã©') and
    repair it. The corpus text is ASCII, so the query deterministically
    accentizes a third of the docs and wire-corrupts half of those using
    the SAME derived table the repair uses (the corrupt chain is pinned
    equal to a true utf-8-encode/cp1252-decode round trip in
    tests/test_encodingfns.py); detection counts marker occurrences with
    pure length/replace arithmetic (no regex dialect risk) and repair is a
    longest-marker-first replace chain. Both engines replay the full
    inject → corrupt → scan → repair path from the raw parquet; the
    ``recovered`` column asserts end-to-end that repair inverts the
    corruption byte-exactly. Everything is a column expression — JVM-side,
    no UDF, no shuffle (scale shape: a map-only pass)."""
    d = _t(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    clean = F.when(
        F.col("doc_id") % 3 == 0,
        F.replace(F.replace(text, F.lit("e"), F.lit("é")), F.lit("o"), F.lit("ô")),
    ).otherwise(text)
    df = (
        d.select("doc_id", clean.alias("clean"))
        .withColumn(
            "wire",
            F.when(
                F.col("doc_id") % 6 == 0, ENC.corrupt_mojibake("clean")
            ).otherwise(F.col("clean")),
        )
        .withColumn("n_markers", ENC.mojibake_count("wire"))
    )
    df = df.withColumn(
        "fixed",
        F.when(F.col("n_markers") > 0, ENC.repair_mojibake("wire")).otherwise(
            F.col("wire")
        ),
    )
    return df.select(
        "doc_id",
        "n_markers",
        (F.col("n_markers") > 0).alias("is_mojibake"),
        (F.col("fixed") == F.col("clean")).alias("recovered"),
        (F.length("wire") - F.length("fixed")).cast("long").alias("n_chars_fixed"),
    ).orderBy("doc_id")


@q(
    "doc_gopher_rules",
    r"""
    WITH c AS (
      SELECT doc_id, COALESCE(text, '') AS text,
             trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ', 'g')) AS norm,
             string_split(COALESCE(text, ''), chr(10)) AS lines
      FROM documents
    ),
    s AS (
      SELECT doc_id,
        CAST(CASE WHEN norm = '' THEN 0
             ELSE len(string_split(norm, ' ')) END AS INT) AS n_words,
        CAST(CASE WHEN norm = '' THEN 0
             ELSE length(norm) - (len(string_split(norm, ' ')) - 1) END AS INT)
          AS n_word_chars,
        CAST(length(text) - length(replace(text, '#', '')) AS INT) AS n_hash,
        CAST((length(text) - length(replace(text, '...', ''))) // 3 AS INT)
          AS n_ellipsis,
        CAST(len(lines) AS INT) AS n_lines,
        CAST(len(list_filter(lines,
             l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS INT)
          AS n_bullet_lines,
        CAST(len(list_filter(lines, l -> rtrim(l) LIKE '%...')) AS INT)
          AS n_ellipsis_lines,
        CAST(len(list_filter(string_split(norm, ' '),
             w -> regexp_matches(w, '[a-z]'))) AS INT) AS n_alpha_words,
        CAST((CASE WHEN list_contains(string_split(norm, ' '), 'the') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(string_split(norm, ' '), 'be') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(string_split(norm, ' '), 'to') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(string_split(norm, ' '), 'of') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(string_split(norm, ' '), 'and') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(string_split(norm, ' '), 'that') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(string_split(norm, ' '), 'have') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(string_split(norm, ' '), 'with') THEN 1 ELSE 0 END)
          AS INT) AS n_stopwords
      FROM c
    )
    SELECT *,
      (n_words BETWEEN 50 AND 100000
       AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
       AND 10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words
       AND 10 * n_bullet_lines < 9 * n_lines
       AND 10 * n_ellipsis_lines < 3 * n_lines
       AND 5 * n_alpha_words >= 4 * n_words
       AND n_stopwords >= 2) AS gopher_keep
    FROM s ORDER BY doc_id
    """,
)
def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher quality-filter rule set (Rae et al. 2021, App.
    A1.1) as one fused scan of exact-integer column expressions
    (functions/textfns.gopher_stats): word-count band 50..100k, mean word
    length 3..10 (integer cross-multiplied, no float ratio), '#'/'...'
    symbol-to-word ratios ≤0.1, <90% bullet-started lines, <30%
    ellipsis-ended lines, ≥80% alphabetic words, ≥2 of the paper's 8 stop
    words. Every count and every gate recomputes directly in the DuckDB
    oracle over the raw parquet — no staging. At scale this is one
    map-side projection fused into the corpus scan, the same shape as the
    curation funnel's gates."""
    d = _t(spark, sf_dir, "documents")
    s = d.select("doc_id", TX.gopher_stats("text").alias("g")).select(
        "doc_id", "g.*"
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & (3 * F.col("n_words") <= F.col("n_word_chars"))
        & (F.col("n_word_chars") <= 10 * F.col("n_words"))
        & (10 * F.col("n_hash") <= F.col("n_words"))
        & (10 * F.col("n_ellipsis") <= F.col("n_words"))
        & (10 * F.col("n_bullet_lines") < 9 * F.col("n_lines"))
        & (10 * F.col("n_ellipsis_lines") < 3 * F.col("n_lines"))
        & (5 * F.col("n_alpha_words") >= 4 * F.col("n_words"))
        & (F.col("n_stopwords") >= 2)
    )
    return s.withColumn("gopher_keep", keep).orderBy("doc_id")


@q(
    "doc_case_stats",
    r"""
    SELECT doc_id,
           round(CASE WHEN length(text) > 0
                 THEN CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                      / length(text)
                 ELSE 0.0 END, 4) AS upper_ratio,
           length(text) - length(replace(text, ' ', '')) AS n_spaces
    FROM documents
    """,
)
def doc_case_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uppercase-ratio + space-count text features (quality signals)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(TX.uppercase_ratio("text"), 4).alias("upper_ratio"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).cast("long").alias(
            "n_spaces"
        ),
    )


@q(
    "doc_exact_dups",
    r"""
    WITH fp AS (
      SELECT doc_id AS id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT fp, MIN(id) AS keep_id, COUNT(*) AS n_dups
    FROM fp GROUP BY fp HAVING COUNT(*) > 1
    """,
)
def doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups on the normalized-text md5 fingerprint."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d, "doc_id", "text")


@q(
    "doc_dedup_survivors",
    r"""
    SELECT doc_id FROM (
      SELECT doc_id,
             row_number() OVER (
               PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1 ORDER BY doc_id
    """,
)
def doc_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the min-id representative per fingerprint."""
    d = _t(spark, sf_dir, "documents")
    return (
        dedup.drop_exact_duplicates(d, "doc_id", "text").select("doc_id").orderBy("doc_id")
    )


@q(
    "doc_decontam",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS g
      FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS i
            FROM t WHERE len(ts) >= 8)
    ),
    ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
    tot AS (SELECT doc_id, COUNT(DISTINCT g) AS n_grams
            FROM g WHERE doc_id % 7 <> 0 GROUP BY 1),
    hit AS (SELECT gg.doc_id, COUNT(DISTINCT gg.g) AS n_hits
            FROM g gg JOIN ev USING (g) WHERE gg.doc_id % 7 <> 0 GROUP BY 1)
    SELECT t.doc_id,
           COALESCE(tot.n_grams, 0) AS n_grams,
           COALESCE(hit.n_hits, 0) AS n_hits,
           COALESCE(hit.n_hits, 0) >= 1 AS contaminated
    FROM t LEFT JOIN tot USING (doc_id) LEFT JOIN hit USING (doc_id)
    WHERE t.doc_id % 7 <> 0 ORDER BY t.doc_id
    """,
)
def doc_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/Llama 13-gram rule, n=8 here for the
    short synthetic docs): docs with ``doc_id % 7 = 0`` play the eval set,
    the rest are the training corpus; any train doc sharing an exact word
    8-gram with the eval set is flagged. The eval gram set broadcasts and
    the corpus is never shuffled (see operators/decontam.py for the 100 TB
    plan shape). The oracle is staging-free: DuckDB recomputes gram
    construction, set membership, and per-doc tallies from the raw parquet."""
    from ocr_platform_spark.operators.decontam import (
        eval_ngram_set,
        mark_contaminated,
    )

    d = _t(spark, sf_dir, "documents")
    ev = eval_ngram_set(d.where(F.col("doc_id") % 7 == 0), "text", n=8)
    train = d.where(F.col("doc_id") % 7 != 0)
    return mark_contaminated(train, ev, "doc_id", "text", n=8).orderBy("doc_id")


@q(
    "doc_decontam_by_suite",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS g
      FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS i
            FROM t WHERE len(ts) >= 8)
    ),
    ev AS (
      SELECT DISTINCT
             CASE WHEN doc_id % 14 = 0 THEN 'suite_a' ELSE 'suite_b' END AS suite,
             g
      FROM g WHERE doc_id % 7 = 0
    ),
    tg AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 7 <> 0)
    SELECT tg.doc_id, ev.suite,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           COUNT(*) >= 1 AS contaminated
    FROM tg JOIN ev USING (g)
    GROUP BY 1, 2
    ORDER BY doc_id, suite
    """,
)
def doc_decontam_by_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark contamination audit (operators/decontam.
    contamination_by_suite): the eval pool (``doc_id % 7 = 0``) is split
    into two suites (``% 14`` → suite_a, the rest suite_b) and every
    training doc reports, PER SUITE, how many of its distinct 8-grams
    leak — the audit a real decontamination run publishes alongside the
    corpus-wide drop set (which benchmark leaked, how hard, into which
    documents). Clean (doc, suite) pairs emit no row. The multi-suite gram
    table stays benchmark-sized and broadcasts; the corpus explodes its
    grams exactly once regardless of suite count. Staging-free oracle:
    DuckDB recomputes gram construction, suite assignment, and the
    per-(doc, suite) tallies from the raw parquet."""
    from ocr_platform_spark.operators.decontam import (
        contamination_by_suite,
        eval_ngram_set_by_suite,
    )

    d = _t(spark, sf_dir, "documents")
    ev_docs = d.where(F.col("doc_id") % 7 == 0).select(
        F.when(F.col("doc_id") % 14 == 0, F.lit("suite_a"))
        .otherwise(F.lit("suite_b"))
        .alias("suite"),
        "text",
    )
    sg = eval_ngram_set_by_suite(ev_docs, "suite", "text", n=8)
    train = d.where(F.col("doc_id") % 7 != 0)
    return contamination_by_suite(train, sg, "doc_id", "text", n=8).orderBy(
        "doc_id", "suite"
    )


@q(
    "doc_decontam_strip",
    f"""
    WITH po AS (SELECT * FROM read_parquet('{staged_glob("dstrip_posts")}')),
    eh AS (SELECT * FROM read_parquet('{staged_glob("dstrip_eval_hs")}')),
    m AS (SELECT po.id, po.pos FROM po JOIN eh USING (h)),
    pe AS (
      SELECT id, pos,
             MAX(pos + 30) OVER (
               PARTITION BY id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM m
    ),
    i AS (
      SELECT id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM pe
    ),
    spans AS (
      SELECT id, MIN(pos) AS span_start, MAX(pos) + 30 AS span_end
      FROM i GROUP BY id, island
    ),
    docs AS (
      SELECT d.doc_id AS id, d.text FROM documents d
      JOIN (SELECT DISTINCT id FROM spans) s ON s.id = d.doc_id
    ),
    segs AS (
      SELECT id,
             COALESCE(LAG(span_end) OVER (PARTITION BY id ORDER BY span_start), 0)
               AS seg_start,
             span_start AS seg_end
      FROM spans
      UNION ALL
      SELECT s.id, MAX(s.span_end), length(d.text)
      FROM spans s JOIN docs d ON s.id = d.id
      GROUP BY s.id, length(d.text)
    ),
    stats AS (
      SELECT id, COUNT(*) AS n_spans_cut,
             SUM(span_end - span_start) AS n_chars_cut
      FROM spans GROUP BY id
    ),
    rebuilt AS (
      SELECT segs.id,
             string_agg(
               substr(d.text, seg_start + 1, greatest(seg_end - seg_start, 0)),
               '' ORDER BY seg_start) AS cut
      FROM segs JOIN docs d ON segs.id = d.id
      GROUP BY segs.id
    )
    SELECT d.id AS doc_id, r.cut AS text,
           st.n_spans_cut,
           CAST(st.n_chars_cut AS BIGINT) AS n_chars_cut
    FROM docs d
    JOIN rebuilt r ON d.id = r.id
    JOIN stats st ON d.id = st.id
    ORDER BY doc_id
    """,
)
def doc_decontam_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURGICAL decontamination (operators/decontam.strip_eval_spans):
    training docs flagged by the exact 8-gram rule are REWRITTEN — the
    character spans whose 30-grams occur anywhere in the eval set
    (``doc_id % 7 = 0``) are cut out, the doc's own prose survives —
    instead of dropping whole documents (``doc_decontam``'s verdict).
    The flag restriction runs FIRST, so char-gram postings exist only for
    contaminated docs (contamination-sized, not corpus-sized); the eval
    side stages its distinct gram hashes (benchmark-sized, broadcast).
    BOTH engines replay the semi-join marking, the gaps-and-islands span
    merge, and the byte-exact complement-segment surgery from the staged
    frames."""
    from ocr_platform_spark.operators.decontam import (
        eval_ngram_set,
        mark_contaminated,
        strip_eval_spans,
    )

    d = _t(spark, sf_dir, "documents")
    ev_docs = d.where(F.col("doc_id") % 7 == 0)
    train = d.where(F.col("doc_id") % 7 != 0)
    ev = eval_ngram_set(ev_docs, "text", n=8)
    flagged = (
        mark_contaminated(train, ev, "doc_id", "text", n=8)
        .where(F.col("contaminated"))
        .select("doc_id")
    )
    hit = train.join(flagged, "doc_id", "left_semi")
    names = {"corpus_posts": ("dstrip_posts", 4), "eval_hs": ("dstrip_eval_hs", 1)}
    return strip_eval_spans(
        hit,
        ev_docs,
        "doc_id",
        "text",
        k=30,
        persist_stage=lambda df, name: stage(
            df, names[name][0], partitions=names[name][1]
        ),
    ).orderBy("doc_id")


@q(
    "doc_decontam_fuzzy",
    f"""
    WITH hs AS (SELECT * FROM read_parquet('{staged_glob("fdecon_hs_train")}')),
    ev AS (SELECT * FROM read_parquet('{staged_glob("fdecon_hs_eval")}')),
    c AS (SELECT * FROM read_parquet('{staged_glob("fdecon_cands")}')),
    j AS (
      SELECT c.id, c.eval_id,
             len(list_intersect(h.hs, e.hs)) AS n_common,
             len(h.hs) + len(e.hs) - len(list_intersect(h.hs, e.hs)) AS n_union
      FROM c JOIN hs h ON h.id = c.id JOIN ev e ON e.eval_id = c.eval_id
    ),
    s AS (
      SELECT id, eval_id,
             CAST(n_common AS DOUBLE) / n_union AS jaccard,
             COUNT(*) OVER (PARTITION BY id) AS n_candidates,
             row_number() OVER (PARTITION BY id
                                ORDER BY CAST(n_common AS DOUBLE) / n_union DESC,
                                         eval_id) AS rk
      FROM j WHERE n_union > 0
    )
    SELECT h.id AS doc_id,
           CAST(COALESCE(s.n_candidates, 0) AS INT) AS n_candidates,
           s.eval_id AS best_eval_id,
           s.jaccard AS best_jaccard,
           COALESCE(s.jaccard >= 0.5, FALSE) AS contaminated
    FROM hs h LEFT JOIN s ON s.id = h.id AND s.rk = 1
    ORDER BY h.id
    """,
)
def doc_decontam_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-match decontamination (operators/decontam.mark_contaminated_
    fuzzy): docs with ``doc_id % 7 = 0`` play the benchmark, the rest the
    training corpus; any train doc whose shingle Jaccard against some eval
    doc reaches 0.5 is flagged — the fuzzy sibling of ``doc_decontam``
    that catches paraphrased eval leakage the exact 8-gram rule misses.
    The xxhash64 MinHash banding has no DuckDB equivalent, so the query
    splits at the staged boundary exactly like ``minhash_near_dups``: the
    hashed shingle sets (both sides) and the band-collision candidates are
    materialized, and BOTH engines replay the exact-Jaccard verification,
    the per-doc best-match selection (jaccard DESC, eval_id ASC — a total
    order), and the threshold gate. The eval side is benchmark-sized →
    broadcast; zero corpus-sized shuffles (plan shape in decontam.py)."""
    from ocr_platform_spark.operators.decontam import mark_contaminated_fuzzy

    d = _t(spark, sf_dir, "documents")
    ev_docs = d.where(F.col("doc_id") % 7 == 0)
    train = d.where(F.col("doc_id") % 7 != 0)
    names = {"hs_train": ("fdecon_hs_train", 4), "hs_eval": ("fdecon_hs_eval", 1),
             "cands": ("fdecon_cands", 1)}
    return mark_contaminated_fuzzy(
        train,
        ev_docs,
        "doc_id",
        "text",
        threshold=0.5,
        persist_stage=lambda df, name: stage(df, names[name][0], partitions=names[name][1]),
    ).orderBy("doc_id")


@q(
    "decontam_lsh_recall",
    f"""
    WITH hs AS (SELECT * FROM read_parquet('{staged_glob("drecall_hs_train")}')),
    ev AS (SELECT * FROM read_parquet('{staged_glob("drecall_hs_eval")}')),
    c AS (SELECT * FROM read_parquet('{staged_glob("drecall_cands")}')),
    tr AS (SELECT id, unnest(hs) AS h FROM hs),
    eg AS (SELECT eval_id, unnest(hs) AS h FROM ev),
    inter AS (
      SELECT tr.id, eg.eval_id, COUNT(*) AS n_common
      FROM tr JOIN eg USING (h) GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.id, i.eval_id
      FROM inter i JOIN hs ON hs.id = i.id JOIN ev ON ev.eval_id = i.eval_id
      WHERE CAST(i.n_common AS DOUBLE)
            / (len(hs.hs) + len(ev.hs) - i.n_common) >= 0.5
    ),
    cfg(rows_per_band, n_bands) AS (VALUES (1, 16), (2, 8), (4, 4), (8, 2)),
    caught AS (
      SELECT c.rows_per_band, COUNT(*) AS n_caught
      FROM c JOIN truth USING (id, eval_id) GROUP BY 1
    ),
    tc AS (SELECT COUNT(*) AS n_true FROM truth)
    SELECT CAST(cfg.rows_per_band AS INT) AS rows_per_band,
           CAST(cfg.n_bands AS INT) AS n_bands,
           tc.n_true,
           COALESCE(ca.n_caught, 0) AS n_caught,
           CASE WHEN tc.n_true > 0
                THEN round(CAST(COALESCE(ca.n_caught, 0) AS DOUBLE) / tc.n_true, 4)
           END AS recall
    FROM cfg CROSS JOIN tc
    LEFT JOIN caught ca ON ca.rows_per_band = cfg.rows_per_band
    ORDER BY rows_per_band
    """,
)
def decontam_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-recall report for fuzzy decontamination (operators/decontam.
    banding_recall_report): of the (train, eval) pairs whose EXACT shingle
    Jaccard reaches the 0.5 contamination threshold, what fraction does each
    MinHash banding configuration (k=16; 16×1 / 8×2 / 4×4 / 2×8 bands)
    surface as a candidate? The sizing table a user reads before picking
    ``decontam_fuzzy_rows_per_band`` — the same justify-the-approximation
    discipline as ``ann_lsh_recall``. Ground truth is sparse (explode +
    equi-join on the shingle hash — exhaustive for thresholds > 0, never
    all-pairs); the eval side broadcasts. The hashed shingle sets and the
    multi-config candidates are staged; BOTH engines replay truth, catch
    counts, and recall."""
    from ocr_platform_spark.operators.decontam import (
        banding_candidates_multi,
        banding_recall_report,
    )
    from ocr_platform_spark.operators.dedup import hashed_shingle_sets

    d = _t(spark, sf_dir, "documents")
    hs_c = stage(
        hashed_shingle_sets(d.where(F.col("doc_id") % 7 != 0), "doc_id", "text"),
        "drecall_hs_train",
        partitions=4,
    )
    hs_e = stage(
        hashed_shingle_sets(
            d.where(F.col("doc_id") % 7 == 0), "doc_id", "text"
        ).withColumnRenamed("id", "eval_id"),
        "drecall_hs_eval",
        partitions=1,
    )
    cands = stage(banding_candidates_multi(hs_c, hs_e), "drecall_cands", partitions=1)
    return banding_recall_report(hs_c, hs_e, cands, threshold=0.5).orderBy(
        "rows_per_band"
    )


@q(
    "doc_split_assign",
    f"""
    WITH b AS (
      SELECT doc_id, {oracle_bucket_sql("doc_id", 1000)} AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 800 THEN 'train'
                WHEN bucket < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM b ORDER BY doc_id
    """,
)
def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from an md5 bucket
    of the document key — a pure column expression (no shuffle, no rand()),
    so the same doc lands in the same split on every run, cluster size, and
    engine. The oracle recomputes the bucket arithmetic from raw parquet
    via the dialect-mirrored `oracle_bucket_sql`."""
    from ocr_platform_spark.operators.sampling import assign_split

    d = _t(spark, sf_dir, "documents")
    return (
        assign_split(d, "doc_id")
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")
    )


@q(
    "doc_split_by_source",
    f"""
    WITH b AS (
      SELECT source, {oracle_bucket_sql("source", 1000)} AS bucket,
             COUNT(*) AS n_docs
      FROM documents GROUP BY source
    )
    SELECT source, bucket,
           CASE WHEN bucket < 800 THEN 'train'
                WHEN bucket < 900 THEN 'val'
                ELSE 'test' END AS split,
           n_docs
    FROM b ORDER BY source
    """,
)
def doc_split_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split — the leakage guard ``doc_split_
    assign`` lacks: bucketing on the SOURCE (host) key puts every page of
    a host in the same split, so near-duplicate pages from one site can
    never straddle train and test (the standard eval-contamination trap
    of web corpora). One row per source in the output IS the disjointness
    audit: a source appears with exactly one split. Same md5 bucket
    arithmetic as the per-doc split, dialect-mirrored in the oracle."""
    from ocr_platform_spark.operators.sampling import assign_split

    d = _t(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        assign_split(per_source, "source")
        .select("source", "bucket", "split", "n_docs")
        .orderBy("source")
    )


@q(
    "host_downsample",
    f"""
    WITH u AS (SELECT * FROM read_parquet('{staged_glob("host_downsample")}')),
    r AS (
      SELECT host,
             row_number() OVER (PARTITION BY host ORDER BY md5(url), url) AS rk
      FROM u
    )
    SELECT host, COUNT(*) AS n_docs,
           COUNT(CASE WHEN rk <= 5 THEN 1 END) AS n_kept
    FROM r GROUP BY host ORDER BY host
    """,
)
def host_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level downsampling over the crawl corpus: at most 5 docs per
    host, drawn by md5(url) order (an unbiased deterministic subsample —
    the stage that stops mega-hosts from dominating the training mix; the
    zipf-distributed synth hosts make it bite). The (url, host) projection
    is staged; BOTH engines rank within host and tally kept-vs-total, so
    the draw order and the cap are verified cross-engine."""
    from ocr_platform_spark.operators.partitioning import host_of
    from ocr_platform_spark.operators.sampling import group_rank

    docs = _synth_docs(spark)
    staged = stage(
        docs.select("url", host_of("url").alias("host")), "host_downsample", partitions=4
    )
    return (
        group_rank(staged, "host", "url")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("_rank") <= 5, 1)).alias("n_kept"),
        )
        .orderBy("host")
    )


_MIX_WEIGHTS = {"en": 400, "zh": 150, "es": 150, "de": 150, "fr": 150}
_MIX_TOTAL_TOKENS = 8000


def _mixture_oracle() -> str:
    values = ", ".join(f"('{g}', {w})" for g, w in _MIX_WEIGHTS.items())
    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
          AS n_tokens
      FROM documents
    ),
    avail AS (SELECT lang, SUM(n_tokens) AS avail FROM toks GROUP BY lang),
    w(lang, w) AS (VALUES {values}),
    thr AS (
      SELECT a.lang,
        least(CAST(1000 AS BIGINT),
              (((CAST({_MIX_TOTAL_TOKENS} AS BIGINT) * w.w) // 1000) * 1000)
                // a.avail)
          AS thr
      FROM avail a JOIN w ON a.lang = w.lang
    )
    SELECT t.doc_id, t.lang, CAST(t.n_tokens AS INT) AS n_tokens
    FROM toks t JOIN thr ON t.lang = thr.lang
    WHERE {oracle_bucket_sql("t.doc_id", 1000, "mix")} < thr.thr
    ORDER BY t.doc_id
    """


@q("corpus_mixture_sample", _mixture_oracle())
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing stage (operators/sampling.mixture_sample): sample each
    language at the rate that steers the corpus toward a target token
    mixture (en 40%, the rest 15% each, 8k-token budget). Thresholds are
    all-integer — ``(T·w·buckets) div (1000·avail)`` — and the md5 bucket
    is the cross-engine primitive, so DuckDB recomputes availability,
    thresholds, and membership exactly. At sf0.001 the budget oversupplies
    every group (take-all cap); at sf0.01 every group samples
    proportionally — both branches of the threshold exercise under the
    driver's two scales. Engine-side training-data surface (no counterpart
    in the reference)."""
    from ocr_platform_spark.operators.sampling import mixture_sample

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", TX.token_count("text").cast("long").alias("n_tokens")
    )
    return (
        mixture_sample(
            toks,
            "lang",
            "doc_id",
            "n_tokens",
            _MIX_WEIGHTS,
            _MIX_TOTAL_TOKENS,
            salt="mix",
        )
        .select("doc_id", "lang", F.col("n_tokens").cast("int").alias("n_tokens"))
        .orderBy("doc_id")
    )


_EPOCH_WEIGHTS = {"en": 250, "zh": 300, "es": 150, "de": 150, "fr": 150}
_EPOCH_TOTAL_TOKENS = 30_000
_EPOCH_BUCKETS = 16


def _epoch_plan_ctes() -> str:
    """Shared WITH-body computing the epoch plan rows (``plan``):
    the selection chain of ``corpus_epoch_plan``, reused verbatim by the
    training-order oracle so the two can never drift apart."""
    values = ", ".join(f"('{g}', {w})" for g, w in _EPOCH_WEIGHTS.items())
    return f"""toks AS (
      SELECT doc_id, lang,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
          AS n_tokens
      FROM documents
    ),
    w(lang, w) AS (VALUES {values}),
    avail AS (SELECT lang, SUM(n_tokens) AS avail FROM toks GROUP BY lang),
    need AS (
      SELECT a.lang,
             ((CAST({_EPOCH_TOTAL_TOKENS} AS BIGINT) * w.w) // 1000) // a.avail
               AS fullep,
             ((CAST({_EPOCH_TOTAL_TOKENS} AS BIGINT) * w.w) // 1000) % a.avail
               AS rem
      FROM avail a JOIN w ON a.lang = w.lang WHERE a.avail > 0
    ),
    ord AS (
      SELECT t.*, {oracle_bucket_sql("t.doc_id", _EPOCH_BUCKETS, "ep")} AS b,
             md5(CAST(doc_id AS VARCHAR) || 'ep') AS h
      FROM toks t
    ),
    cum AS (
      SELECT *, COALESCE(SUM(n_tokens) OVER (
          PARTITION BY lang ORDER BY b, h, CAST(doc_id AS VARCHAR)
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumpre
      FROM ord
    ),
    plan AS (
      SELECT c.doc_id, c.lang, CAST(c.n_tokens AS INT) AS n_tokens,
             CAST(n.fullep + CASE WHEN c.cumpre < n.rem THEN 1 ELSE 0 END AS INT)
               AS n_epochs,
             CAST(c.n_tokens
                  * (n.fullep + CASE WHEN c.cumpre < n.rem THEN 1 ELSE 0 END)
                 AS BIGINT) AS planned_tokens
      FROM cum c JOIN need n ON c.lang = n.lang
      WHERE n.fullep + CASE WHEN c.cumpre < n.rem THEN 1 ELSE 0 END > 0
    )"""


def _epoch_oracle() -> str:
    return f"""
    WITH {_epoch_plan_ctes()}
    SELECT doc_id, lang, n_tokens, n_epochs, planned_tokens
    FROM plan ORDER BY doc_id
    """


@q("corpus_epoch_plan", _epoch_oracle())
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planner (operators/sampling.epoch_plan) — the
    step that turns the curated corpus plus a target mixture into the
    actual training plan, INCLUDING upsampling: a group whose target share
    exceeds its available tokens gets whole repeat epochs plus a
    deterministic partial epoch filled in md5 draw order until the running
    token sum covers the remainder (``mixture_sample`` can only cap at
    take-all). All-integer arithmetic; the weights here make zh plan ×2
    epochs + partial, es/de whole-epoch + partial, en partial-only — and
    fr flips between partial-only and epoch+partial across the driver's
    two scales, so every branch is driver-exercised. The Spark side runs
    the scale shape (two-level prefix sum: per-bucket rollup + window over
    the tiny bucket table + intra-bucket window on the single boundary
    bucket per group); the oracle replays the selection as one flat window
    over the same (bucket, md5, key) total order — equivalent by
    prefix-sum associativity — and hash-checks every per-doc epoch count.
    Engine-side training-data surface (no counterpart in the reference)."""
    from ocr_platform_spark.operators.sampling import epoch_plan

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", TX.token_count("text").cast("long").alias("n_tokens")
    )
    return (
        epoch_plan(
            toks,
            "lang",
            "doc_id",
            "n_tokens",
            _EPOCH_WEIGHTS,
            _EPOCH_TOTAL_TOKENS,
            n_buckets=_EPOCH_BUCKETS,
            salt="ep",
        )
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "n_epochs",
            "planned_tokens",
        )
        .orderBy("doc_id")
    )


_TEMP_SCALE = 1_000_000


@q(
    "corpus_temperature_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
          AS n_tokens
      FROM documents
    ),
    avail AS (
      SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS avail_tokens
      FROM toks GROUP BY lang HAVING SUM(n_tokens) > 0
    ),
    raw AS (
      SELECT lang, avail_tokens,
             CAST(floor(sqrt(CAST(avail_tokens AS DOUBLE)) * {float(_TEMP_SCALE)}) AS BIGINT) AS rw
      FROM avail
    ),
    tot AS (
      SELECT *, CAST(SUM(rw) OVER () AS BIGINT) AS rsum FROM raw
    ),
    quota AS (
      SELECT lang, avail_tokens,
             (1000 * rw) // rsum AS q, (1000 * rw) % rsum AS rem
      FROM tot
    ),
    seats AS (
      SELECT *,
             CAST(row_number() OVER (ORDER BY rem DESC, lang)
                  <= 1000 - CAST(SUM(q) OVER () AS BIGINT) AS BIGINT) AS extra
      FROM quota
    )
    SELECT lang, avail_tokens, CAST(q + extra AS INT) AS weight_per_mille
    FROM seats WHERE q + extra > 0 ORDER BY lang
    """,
)
def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weights (operators/sampling.
    temperature_weights — the UniMax / multilingual-LM recipe: sample each
    language proportional to ``share^(1/T)``, flattening the head). T=2 via
    one correctly-rounded sqrt — the ONLY float op; IEEE 754 requires sqrt
    (unlike pow) to be exactly rounded, so ``floor(sqrt(avail)·10^6)`` is
    bit-identical in Spark and DuckDB — after which the largest-remainder
    seat assignment is pure integer arithmetic, hash-checked end to end.
    Weights sum to exactly 1000 and feed epoch_plan/mixture_sample.
    Engine-side training-data surface (no counterpart in the reference)."""
    from ocr_platform_spark.operators.sampling import temperature_weights

    d = _t(spark, sf_dir, "documents")
    toks = d.select("lang", TX.token_count("text").cast("long").alias("n_tokens"))
    return (
        temperature_weights(toks, "lang", "n_tokens", sqrt_iters=1, scale=_TEMP_SCALE)
        .orderBy("lang")
    )


_ORDER_SHARDS = 8


def _training_order_oracle() -> str:
    return f"""
    WITH {_epoch_plan_ctes()},
    rep AS (
      SELECT doc_id, CAST(unnest(generate_series(1, n_epochs)) AS INT) AS epoch
      FROM plan
    ),
    keyed AS (
      SELECT doc_id, epoch,
             md5(CAST(doc_id AS VARCHAR) || '#' || CAST(epoch AS VARCHAR) || 'to') AS h
      FROM rep
    ),
    sharded AS (
      SELECT doc_id, epoch, h,
             CAST(CAST(('0x' || substr(h, 1, 6)) AS BIGINT) % {_ORDER_SHARDS} AS INT) AS shard
      FROM keyed
    )
    SELECT doc_id, epoch, shard,
           CAST(row_number() OVER (
               PARTITION BY shard ORDER BY h, CAST(doc_id AS VARCHAR), epoch
           ) AS INT) AS pos
    FROM sharded
    ORDER BY shard, pos
    """


@q("corpus_training_order", _training_order_oracle())
def corpus_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch plan materialized into the trainer's feed order
    (operators/sampling.training_order): one row per (document, epoch
    replica), md5-assigned to a shard with a deterministic position inside
    it — readers stream shards and interleave, so no global total order is
    ever materialized (a global row_number would serialize the corpus
    through one task). Replica keys are ``doc#epoch``, so repeat epochs of
    an upsampled doc scatter independently. The explode is map-side
    (``sequence``); the one shuffle is the per-shard rank window. Oracle
    replays plan → explode → shard → rank and hash-checks every position.
    Engine-side training-data surface (no counterpart in the reference)."""
    from ocr_platform_spark.operators.sampling import epoch_plan, training_order

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", TX.token_count("text").cast("long").alias("n_tokens")
    )
    plan = epoch_plan(
        toks,
        "lang",
        "doc_id",
        "n_tokens",
        _EPOCH_WEIGHTS,
        _EPOCH_TOTAL_TOKENS,
        n_buckets=_EPOCH_BUCKETS,
        salt="ep",
    )
    return (
        training_order(plan, "doc_id", _ORDER_SHARDS, salt="to")
        .select("doc_id", "epoch", "shard", "pos")
        .orderBy("shard", "pos")
    )


@q(
    "ingest_path_hygiene",
    r"""
    WITH raw AS (
      SELECT doc_id,
        CASE CAST(doc_id % 5 AS INT)
          WHEN 0 THEN '../../etc/' || substr(text, 1, 10)
          WHEN 1 THEN '/srv/data/uploads/' || substr(text, 1, 10) || '.pdf'
          WHEN 2 THEN '  report café ' || substr(text, 1, 8) || '..PDF '
          WHEN 3 THEN 'a\b\' || substr(text, 1, 10) || '.tar.gz'
          ELSE substr(text, 1, 16) || '_v1.txt'
        END AS fname
      FROM documents
    )
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            trim(regexp_replace(regexp_replace(fname, '[/\\]', ' ', 'g'),
                                '[^\x00-\x7F]', '', 'g')),
            '\s+', '_', 'g'),
          '[^A-Za-z0-9_.\-]', '', 'g'),
        '^[._]+|[._]+$', '', 'g') AS clean,
      (NOT regexp_matches(fname, '(^|/)\.\.(/|$)'))
        AND (NOT starts_with(fname, '/')
             OR starts_with(fname, '/srv/data/') OR fname = '/srv/data')
        AS safe
    FROM raw ORDER BY doc_id
    """,
)
def ingest_path_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 end-to-end: werkzeug-style ``secure_filename`` plus the
    base-directory containment check from the reference's upload/download
    routes (``document_routes.py:218``, ``:87-99``), both as pure column
    expressions over a manifest of adversarial filenames built
    deterministically from table columns (traversal, absolute-path,
    unicode + whitespace + separator cases). The oracle rebuilds the full
    sanitize chain and the containment predicate in DuckDB regex — every
    rule verified byte-for-byte (NFKD delta documented in
    functions/pathfns.py)."""
    from ocr_platform_spark.functions.pathfns import (
        path_within_base,
        secure_filename_col,
    )

    d = _t(spark, sf_dir, "documents")
    t10 = F.substring("text", 1, 10)
    fname = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("../../etc/"), t10))
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("/srv/data/uploads/"), t10, F.lit(".pdf")),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(F.lit("  report café "), F.substring("text", 1, 8), F.lit("..PDF ")),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("a\\b\\"), t10, F.lit(".tar.gz")),
        )
        .otherwise(F.concat(F.substring("text", 1, 16), F.lit("_v1.txt")))
    )
    return (
        d.select("doc_id", fname.alias("fname"))
        .select(
            "doc_id",
            secure_filename_col("fname").alias("clean"),
            path_within_base("fname", "/srv/data").alias("safe"),
        )
        .orderBy("doc_id")
    )


def _pii_oracle() -> str:
    from ocr_platform_spark.functions.piifns import (
        EMAIL_RE,
        EMAIL_TOKEN,
        IPV4_RE,
        IPV4_TOKEN,
        PHONE_RE,
        PHONE_TOKEN,
    )

    return f"""
    WITH raw AS (
      SELECT doc_id,
        'Contact ' || substr(text, 1, 20)
        || CASE WHEN doc_id % 3 = 0
             THEN ' at user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        || CASE WHEN doc_id % 4 = 0
             THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE '' END
        || CASE WHEN doc_id % 5 = 0
             THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
        || ' end' AS body
      FROM documents
    ),
    s1 AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(body, '{EMAIL_RE}')) AS INT) AS n_email,
        regexp_replace(body, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g') AS b1
      FROM raw
    ),
    s2 AS (
      SELECT doc_id, n_email,
        CAST(len(regexp_extract_all(b1, '{IPV4_RE}')) AS INT) AS n_ipv4,
        regexp_replace(b1, '{IPV4_RE}', '{IPV4_TOKEN}', 'g') AS b2
      FROM s1
    )
    SELECT doc_id,
      regexp_replace(b2, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS clean,
      n_email, n_ipv4,
      CAST(len(regexp_extract_all(b2, '{PHONE_RE}')) AS INT) AS n_phone
    FROM s2 ORDER BY doc_id
    """


@q("doc_pii_scrub", _pii_oracle())
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (engine-side training-data surface; the reference has
    no scrubbing pass — extracted values are stored verbatim,
    ``ocr_backend/app/services/extraction_service.py``): the chained
    email → IPv4 → phone ``regexp_replace`` pass from functions/piifns.py
    plus per-rule counts, over a deterministically constructed body that
    plants each PII kind on a different doc_id residue (and none on
    residue-free rows). The oracle replays the identical chain in DuckDB —
    every pattern is written in the Java∩RE2 regex subset so the redacted
    bytes hash-match exactly."""
    from ocr_platform_spark.functions.piifns import pii_counts, scrub_pii

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = did.cast("string")
    body = F.concat(
        F.lit("Contact "),
        F.substring("text", 1, 20),
        F.when(did % 3 == 0, F.concat(F.lit(" at user"), s, F.lit("@example.com"))).otherwise(
            F.lit("")
        ),
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" call 415-555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" ip 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" end"),
    )
    counts = pii_counts("body")
    return (
        d.select("doc_id", body.alias("body"))
        .select(
            "doc_id",
            scrub_pii("body").alias("clean"),
            *[c.alias(f"n_{name}") for name, c in counts],
        )
        .orderBy("doc_id")
    )


def _pii_cards_oracle() -> str:
    from ocr_platform_spark.functions.piifns import (
        CC_RE,
        card_counts_sql,
        scrub_cards_sql,
    )

    n_shaped, n_valid = card_counts_sql("wire")
    return f"""
    WITH w AS (
      SELECT doc_id,
             COALESCE(text, '')
             || CASE WHEN doc_id % 5 = 0
                     THEN ' card 4111 1111 1111 1111 please' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' ref 4111-1111-1111-1112 thanks' ELSE '' END AS wire
      FROM documents
    ),
    s AS (
      SELECT doc_id, wire,
             {n_shaped} AS n_card_shaped,
             {n_valid} AS n_luhn_valid,
             {scrub_cards_sql("wire")} AS clean
      FROM w
    )
    SELECT doc_id, n_card_shaped, n_luhn_valid,
           NOT regexp_matches(clean, '{CC_RE}') AS fully_redacted,
           CAST(length(wire) - length(clean) AS BIGINT) AS n_chars_delta
    FROM s ORDER BY doc_id
    """


@q("doc_pii_cards", _pii_cards_oracle())
def doc_pii_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-card redaction with Luhn verification (functions/piifns.py
    card family). Card-shaped digit runs are planted deterministically —
    one Luhn-VALID number on the doc_id%5 residue, one shaped-but-invalid
    on %7 — then both engines replay shape detection (13-19 digits with
    optional separators), the Luhn checksum as pure integer column
    arithmetic over a generate_series digit walk (the Spark lambda and
    the generated DuckDB twin come from the same module, encodingfns-style
    single source), and the conservative shape-based scrub. ``n_luhn_valid
    < n_card_shaped`` on the %7 rows is the observable false-positive rate
    the policy note documents; ``fully_redacted`` asserts the scrub left
    nothing card-shaped behind. Map-only pass, no UDF, no shuffle."""
    from ocr_platform_spark.functions.piifns import (
        CC_RE,
        card_counts,
        scrub_cards,
    )

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    wire = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(did % 5 == 0, F.lit(" card 4111 1111 1111 1111 please")).otherwise(
            F.lit("")
        ),
        F.when(did % 7 == 0, F.lit(" ref 4111-1111-1111-1112 thanks")).otherwise(
            F.lit("")
        ),
    )
    base = d.select("doc_id", wire.alias("wire"))
    n_shaped, n_valid = card_counts("wire")
    s = base.select(
        "doc_id",
        "wire",
        n_shaped.alias("n_card_shaped"),
        n_valid.alias("n_luhn_valid"),
        scrub_cards("wire").alias("clean"),
    )
    return s.select(
        "doc_id",
        "n_card_shaped",
        "n_luhn_valid",
        (~F.col("clean").rlike(CC_RE)).alias("fully_redacted"),
        (F.length("wire") - F.length("clean")).cast("long").alias("n_chars_delta"),
    ).orderBy("doc_id")


@q(
    "doc_c4_line_filter",
    r"""
    WITH raw AS (
      SELECT doc_id,
        substr(text, 1, 60) || '.' || chr(10)
        || 'short line' || chr(10)
        || 'Please enable JavaScript to view this site.' || chr(10)
        || CASE WHEN doc_id % 7 = 0 THEN 'css rules { display: none }'
                ELSE 'cascading styles are described elsewhere.' END || chr(10)
        || CASE WHEN doc_id % 11 = 0 THEN 'Lorem ipsum dolor sit amet, consectetur.'
                ELSE 'closing remarks for doc ' || CAST(doc_id AS VARCHAR) || ' end.' END
        AS body
      FROM documents
    ),
    k AS (
      SELECT doc_id, body,
        list_filter(
          list_transform(string_split(body, chr(10)), x -> trim(x)),
          t -> t <> ''
            AND regexp_matches(t, '[.!?"'']$')
            AND len(regexp_split_to_array(t, '\s+')) >= 5
            AND NOT contains(lower(t), 'javascript')
            AND NOT contains(lower(t), 'cookie')
        ) AS kept
      FROM raw
    )
    SELECT doc_id,
      array_to_string(kept, chr(10)) AS clean,
      CAST(len(string_split(body, chr(10))) AS INT) AS n_lines,
      CAST(len(kept) AS INT) AS n_kept,
      (len(kept) >= 3 AND NOT contains(lower(body), 'lorem ipsum')
        AND NOT contains(body, '{')) AS keep
    FROM k ORDER BY doc_id
    """,
)
def doc_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line rules (functions/linefns.py) over a deterministically
    constructed multi-line body: terminal-punctuation + min-word line
    gates, javascript/cookie line drops, lorem-ipsum / curly-brace page
    drops. Engine-side training-data surface (no counterpart in the
    reference); the oracle mirrors every rule in DuckDB list lambdas and
    verifies the surviving bytes exactly."""
    from ocr_platform_spark.functions.linefns import (
        c4_clean_text,
        kept_lines,
        page_keep,
        trimmed_lines,
    )

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.concat_ws(
        "\n",
        F.concat(F.substring("text", 1, 60), F.lit(".")),
        F.lit("short line"),
        F.lit("Please enable JavaScript to view this site."),
        F.when(did % 7 == 0, F.lit("css rules { display: none }")).otherwise(
            F.lit("cascading styles are described elsewhere.")
        ),
        F.when(did % 11 == 0, F.lit("Lorem ipsum dolor sit amet, consectetur.")).otherwise(
            F.concat(F.lit("closing remarks for doc "), did.cast("string"), F.lit(" end."))
        ),
    )
    staged = d.select("doc_id", body.alias("body")).select(
        "doc_id", "body", kept_lines("body").alias("kept")
    )
    return staged.select(
        "doc_id",
        c4_clean_text(F.col("kept")).alias("clean"),
        F.size(trimmed_lines("body")).cast("int").alias("n_lines"),
        F.size("kept").cast("int").alias("n_kept"),
        page_keep("body", F.col("kept")).alias("keep"),
    ).orderBy("doc_id")


@q(
    "jaccard_adjacent_docs",
    r"""
    WITH sh AS (
      SELECT doc_id AS id, list_distinct(sh0) AS sh FROM (
        SELECT doc_id,
          list_transform(
            generate_series(1, greatest(len(words) - 2, 1)),
            i -> array_to_string(words[i:i+2], ' ')) AS sh0
        FROM (
          SELECT doc_id,
                 regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
          FROM documents
        )
      )
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b ON b.id = a.id + 1
    """,
)
def jaccard_adjacent_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard on consecutive-id pairs — oracle-checkable slice
    of the shingle+Jaccard machinery the MinHash pipeline verifies with."""
    d = _t(spark, sf_dir, "documents")
    from ocr_platform_spark.operators.dedup import _spread

    sets_df = _spread(d, "doc_id").select(
        F.col("doc_id").alias("id"),
        F.array_distinct(TX.word_shingles("text", 3)).alias("sh"),
    )
    a = sets_df.alias("a")
    b = sets_df.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return (
        a.join(b, F.col("b.id") == F.col("a.id") + 1)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
    )


@q(
    "corpus_rollup",
    """
    SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
)
def corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation rollup per (lang, source) — exact integer sums."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang", "source")
    )


# --- no-oracle text ops (engine-specific hashes) --------------------------


@q(
    "minhash_near_dups",
    f"""
    WITH hs AS (SELECT * FROM read_parquet('{staged_glob("minhash_hs")}')),
    c AS (SELECT * FROM read_parquet('{staged_glob("minhash_cands")}')),
    j AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.hs, b.hs)) AS n_common,
             len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS n_union
      FROM c JOIN hs a ON c.id_a = a.id JOIN hs b ON c.id_b = b.id
    )
    SELECT id_a, id_b, CAST(n_common AS INT) AS n_common,
           CAST(n_union AS INT) AS n_union,
           CAST(n_common AS DOUBLE) / n_union AS jaccard
    FROM j
    WHERE n_union > 0 AND CAST(n_common AS DOUBLE) / n_union >= 0.5
    ORDER BY id_a, id_b
    """,
)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verification stage oracle-checked.

    The xxhash64 shingle/signature kernel has no DuckDB equivalent, so the
    query is split at the staged-parquet boundary (staging.py): the hashed
    shingle sets and the LSH candidate pairs are materialized, and BOTH
    engines compute the exact-Jaccard verification + threshold from those
    same files (DuckDB via list_intersect). Candidate *generation* stays
    pinned by tests/test_dedup.py recall goldens. Jaccard is an unrounded
    division of the exact integer intersection/union sizes — bit-identical
    in any engine."""
    d = _t(spark, sf_dir, "documents")
    hs = stage(
        dedup.hashed_shingle_sets(d, "doc_id", "text"), "minhash_hs", partitions=8
    )
    sig = hs.select("id", dedup.minhash_signature_from_hashes("hs", 16).alias("sig"))
    banded = sig.select(
        "id", F.posexplode(dedup.minhash_bands("sig", 16, 2)).alias("band_id", "band_hash")
    )
    cands = stage(dedup._bucket_pairs(banded, "id", 64), "minhash_cands")
    sets_df = hs.withColumnRenamed("hs", "sh")
    j = (
        cands.join(sets_df.withColumnRenamed("sh", "sh_a"), cands.id_a == sets_df.id)
        .drop("id")
        .join(
            sets_df.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        j.select(
            "id_a",
            "id_b",
            inter.alias("n_common"),
            union.alias("n_union"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where((F.col("n_union") > 0) & (F.col("jaccard") >= 0.5))
        .orderBy("id_a", "id_b")
    )


@q(
    "dedup_lsh_recall",
    f"""
    WITH hs AS (SELECT * FROM read_parquet('{staged_glob("ddrecall_hs")}')),
    c AS (SELECT * FROM read_parquet('{staged_glob("ddrecall_cands")}')),
    tr AS (SELECT id, unnest(hs) AS h FROM hs),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
      FROM tr a JOIN tr b ON a.h = b.h AND a.id < b.id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.id_a, i.id_b
      FROM inter i JOIN hs ha ON ha.id = i.id_a JOIN hs hb ON hb.id = i.id_b
      WHERE CAST(i.n_common AS DOUBLE)
            / (len(ha.hs) + len(hb.hs) - i.n_common) >= 0.5
    ),
    cfg(rows_per_band, n_bands) AS (VALUES (1, 16), (2, 8), (4, 4), (8, 2)),
    caught AS (
      SELECT c.rows_per_band, COUNT(*) AS n_caught
      FROM c JOIN truth USING (id_a, id_b) GROUP BY 1
    ),
    tc AS (SELECT COUNT(*) AS n_true FROM truth)
    SELECT CAST(cfg.rows_per_band AS INT) AS rows_per_band,
           CAST(cfg.n_bands AS INT) AS n_bands,
           tc.n_true,
           COALESCE(ca.n_caught, 0) AS n_caught,
           CASE WHEN tc.n_true > 0
                THEN round(CAST(COALESCE(ca.n_caught, 0) AS DOUBLE) / tc.n_true, 4)
           END AS recall
    FROM cfg CROSS JOIN tc
    LEFT JOIN caught ca ON ca.rows_per_band = cfg.rows_per_band
    ORDER BY rows_per_band
    """,
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-recall report for MinHash near-dup dedup (operators/dedup.
    dedup_banding_recall_report): of the (a, b) pairs whose EXACT shingle
    Jaccard reaches the 0.5 dedup threshold, what fraction does each
    banding configuration (k=16; 16×1 / 8×2 / 4×4 / 2×8 bands, production
    max_bucket=64 applied) surface as a candidate? The sizing table a user
    reads before picking ``minhash_candidate_pairs``' (k, rows_per_band) —
    completing the justify-the-approximation family (``ann_lsh_recall``
    for ANN, ``decontam_lsh_recall`` for decontamination). Ground truth is
    sparse (explode + self-equi-join on the shingle hash with id_a < id_b —
    exhaustive for thresholds > 0, never all-pairs) and, as the operator
    docstring prescribes, the report runs on a BOUNDED CALIBRATION SAMPLE
    (a deterministic third of the corpus here — Σ df(h)² over the sample's
    shingles, never corpus-scale), while the production path stays the
    banded operator. The sampled shingle sets and the multi-config
    candidates are staged; BOTH engines replay truth, catch counts, and
    recall from the same bytes."""
    from ocr_platform_spark.operators.dedup import (
        banding_candidates_multi_self,
        dedup_banding_recall_report,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    hs = stage(
        dedup.hashed_shingle_sets(d, "doc_id", "text"), "ddrecall_hs", partitions=4
    )
    cands = stage(
        banding_candidates_multi_self(hs), "ddrecall_cands", partitions=1
    )
    return dedup_banding_recall_report(hs, cands, threshold=0.5).orderBy(
        "rows_per_band"
    )


@q(
    "doc_repeated_spans",
    f"""
    WITH p AS (SELECT * FROM read_parquet('{staged_glob("span_postings")}')),
    rep AS (
      SELECT h FROM (SELECT h, id FROM p GROUP BY h, id)
      GROUP BY h HAVING COUNT(*) >= 2
    ),
    m AS (SELECT p.id, p.pos FROM p JOIN rep USING (h)),
    pe AS (
      SELECT id, pos,
             MAX(pos + 30) OVER (
               PARTITION BY id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM m
    ),
    i AS (
      SELECT id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM pe
    )
    SELECT id AS doc_id, MIN(pos) AS span_start, MAX(pos) + 30 AS span_end
    FROM i GROUP BY id, island
    ORDER BY doc_id, span_start
    """,
)
def doc_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style repeated-span marking (Lee et al. 2022, the
    finer-grained sibling of paragraph dedup): every maximal span whose
    30-char substrings all occur in ≥2 distinct documents. The xxhash64
    positional postings are staged; BOTH engines run the identical
    integer pipeline from there — distinct-doc hash filter, then
    gaps-and-islands span merging with two window functions. See
    operators/dedup.repeated_spans for the 10^12-row shape notes."""
    d = _t(spark, sf_dir, "documents")
    posts = stage(
        dedup.char_gram_postings(d, "doc_id", "text", k=30),
        "span_postings",
        partitions=8,
    )
    return (
        dedup.repeated_spans(posts, k=30, min_df=2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "span_start")
    )


@q(
    "doc_repeated_spans_strided",
    f"""
    WITH p AS (SELECT * FROM read_parquet('{staged_glob("span_postings_w")}')),
    rep AS (
      SELECT h FROM (SELECT h, id FROM p GROUP BY h, id)
      GROUP BY h HAVING COUNT(*) >= 2
    ),
    m AS (SELECT p.id, p.pos FROM p JOIN rep USING (h)),
    pe AS (
      SELECT id, pos,
             MAX(pos + 30) OVER (
               PARTITION BY id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM m
    ),
    i AS (
      SELECT id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM pe
    )
    SELECT id AS doc_id, MIN(pos) AS span_start, MAX(pos) + 30 AS span_end
    FROM i GROUP BY id, island
    ORDER BY doc_id, span_start
    """,
)
def doc_repeated_spans_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr repeated-span marking over SAMPLED postings — the
    100-TB shape of doc_repeated_spans. The per-character posting table
    (30-60× the corpus text through a corpus-wide shuffle) is replaced by
    winnowing-sampled postings (~2/(w+1) of the grams, selected map-side
    BEFORE the explode, so the reduction happens ahead of the shuffle);
    any cross-doc shared substring of length ≥ w+k−1 = 37 still marks.
    Content-defined (window-min) sampling, NOT a position stride — stride
    phases don't survive offset misalignment between documents (see
    operators/dedup.winnowed_gram_postings). Downstream span merging is
    the identical integer pipeline, replayed by the oracle from the
    staged sampled postings; the sampling itself is differentially pinned
    against the exact operator in tests/test_dedup.py."""
    d = _t(spark, sf_dir, "documents")
    posts = stage(
        dedup.winnowed_gram_postings(d, "doc_id", "text", k=30, w=8),
        "span_postings_w",
        partitions=8,
    )
    return (
        dedup.repeated_spans(posts, k=30, min_df=2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "span_start")
    )


@q(
    "doc_strip_spans",
    f"""
    WITH p AS (SELECT * FROM read_parquet('{staged_glob("cut_postings")}')),
    rep AS (
      SELECT h FROM (SELECT h, id FROM p GROUP BY h, id)
      GROUP BY h HAVING COUNT(*) >= 2
    ),
    m AS (SELECT p.id, p.pos FROM p JOIN rep USING (h)),
    pe AS (
      SELECT id, pos,
             MAX(pos + 30) OVER (
               PARTITION BY id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM m
    ),
    i AS (
      SELECT id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM pe
    ),
    spans AS (
      SELECT id, MIN(pos) AS span_start, MAX(pos) + 30 AS span_end
      FROM i GROUP BY id, island
    ),
    segs AS (
      SELECT id,
             COALESCE(LAG(span_end) OVER (PARTITION BY id ORDER BY span_start), 0)
               AS seg_start,
             span_start AS seg_end
      FROM spans
      UNION ALL
      SELECT s.id, MAX(s.span_end), length(d.text)
      FROM spans s JOIN documents d ON s.id = d.doc_id
      GROUP BY s.id, length(d.text)
    ),
    stats AS (
      SELECT id, COUNT(*) AS n_spans_cut,
             SUM(span_end - span_start) AS n_chars_cut
      FROM spans GROUP BY id
    ),
    rebuilt AS (
      SELECT segs.id,
             string_agg(
               substr(d.text, seg_start + 1, greatest(seg_end - seg_start, 0)),
               '' ORDER BY seg_start) AS cut
      FROM segs JOIN documents d ON segs.id = d.doc_id
      GROUP BY segs.id
    )
    SELECT d.doc_id, COALESCE(r.cut, d.text) AS text,
           COALESCE(st.n_spans_cut, 0) AS n_spans_cut,
           CAST(COALESCE(st.n_chars_cut, 0) AS BIGINT) AS n_chars_cut
    FROM documents d
    LEFT JOIN rebuilt r ON d.doc_id = r.id
    LEFT JOIN stats st ON d.doc_id = st.id
    ORDER BY d.doc_id
    """,
)
def doc_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT phase of ExactSubstr dedup: documents rebuilt with their
    cross-doc repeated 30-char spans removed. Byte-exact cross-engine text
    surgery at arbitrary character offsets — both engines derive the spans
    from the same staged postings, take the complement segments via one
    window ``lag`` + a tail row, slice with the SAME clamped substring
    semantics (DuckDB's negative-length substr reaches backward; both
    sides clamp at 0), and concatenate in offset order."""
    d = _t(spark, sf_dir, "documents")
    posts = stage(
        dedup.char_gram_postings(d, "doc_id", "text", k=30),
        "cut_postings",
        partitions=8,
    )
    return dedup.strip_repeated_spans(
        d, "doc_id", "text", k=30, min_df=2, postings=posts
    ).orderBy("doc_id")


_CC_ITER = 6


@q(
    "doc_dedup_clusters",
    f"""
    WITH RECURSIVE
    p AS (SELECT * FROM read_parquet('{staged_glob("cc_pairs")}')),
    n AS (SELECT DISTINCT id FROM
          (SELECT id_a AS id FROM p UNION ALL SELECT id_b AS id FROM p)),
    e AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION ALL SELECT id_b, id_a FROM p
      UNION ALL SELECT id, id FROM n
    ),
    lab AS (
      SELECT 0 AS it, id, id AS comp FROM n
      UNION ALL
      SELECT l.it + 1, e.src AS id, MIN(l.comp) AS comp
      FROM lab l JOIN e ON e.dst = l.id
      WHERE l.it < {_CC_ITER}
      GROUP BY l.it, e.src
    ),
    fin AS (SELECT id, comp FROM lab WHERE it = {_CC_ITER})
    SELECT f.id AS doc_id, f.comp AS cluster_id,
           CAST(s.n AS BIGINT) AS cluster_size,
           f.id = f.comp AS is_survivor
    FROM fin f JOIN (SELECT comp, COUNT(*) AS n FROM fin GROUP BY comp) s
      ON f.comp = s.comp
    ORDER BY cluster_id, doc_id
    """,
)
def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (not just pairs): MinHash/LSH pairs at Jaccard
    ≥ 0.5 → connected components by min-label propagation → one survivor
    (the min doc_id) per component. This is the transitive-closure step a
    real dedup pass needs — A~B and B~C collapse to one keeper even though
    A~C was never an LSH candidate.

    Cross-engine EXACT like ``host_pagerank``: the propagation recurrence
    runs a fixed {_CC_ITER} iterations on both engines (labels are monotone
    non-increasing integers → bit-deterministic), DuckDB replaying it as a
    recursive CTE over the same staged pair list. Pair *generation* rides
    the already-oracled minhash pipeline (`minhash_near_dups`)."""
    from ocr_platform_spark.operators.linkgraph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = stage(
        dedup.minhash_near_duplicates(d, "doc_id", "text", threshold=0.5).select(
            "id_a", "id_b"
        ),
        "cc_pairs",
    )
    comp = connected_components(pairs, iterations=_CC_ITER)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("comp")).alias("is_survivor"),
        )
        .orderBy("cluster_id", "doc_id")
    )


@q(
    "simhash_near_dups",
    f"""
    WITH s AS (SELECT * FROM read_parquet('{staged_glob("simhash_sig")}')),
    c AS (SELECT * FROM read_parquet('{staged_glob("simhash_cands")}'))
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
    FROM c JOIN s a ON c.id_a = a.id JOIN s b ON c.id_b = b.id
    WHERE bit_count(xor(a.sh, b.sh)) <= 7
    ORDER BY c.id_a, c.id_b
    """,
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup pairs, Hamming verification oracle-checked
    over the staged signature + candidate tables (DuckDB bit_count(xor)).

    max_hamming=7 is the exact recall guarantee of the 8×8-bit banding
    (pigeonhole: any pair within distance n_bands-1 shares a band) — asking
    for a larger radius than the banding guarantees would silently drop
    pairs found 'only by luck'. The numpy sign-sum kernel itself is pinned
    against the pure-expression twin in tests/test_dedup.py."""
    d = _t(spark, sf_dir, "documents")
    sim = stage(dedup._simhash_df(d, "doc_id", "text"), "simhash_sig", partitions=8)
    bands = sim.select(
        "id", F.posexplode(dedup.simhash_bands("sh", 8)).alias("band_id", "band_hash")
    )
    cands = stage(dedup._bucket_pairs(bands, "id", 64), "simhash_cands")
    j = (
        cands.join(sim.withColumnRenamed("sh", "sh_a"), cands.id_a == sim.id)
        .drop("id")
        .join(
            sim.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    return (
        j.select(
            "id_a",
            "id_b",
            dedup.hamming64(F.col("sh_a"), F.col("sh_b")).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= 7)
        .orderBy("id_a", "id_b")
    )


# =========================================================================
# Similarity search (embeddings table: vec_id, embedding FLOAT[], label)
# =========================================================================


@q(
    "ann_topk_quantized",
    """
    WITH qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, i.vec_id AS item_id,
             list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(i.v, x -> x * x)) AS ni
      FROM qz q, qz i
      WHERE q.vec_id < 8 AND i.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    )
    SELECT query_id, item_id, cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """,
)
def ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k on quantized (×1000, rounded) vectors —
    integer dot products/norms are exact in both engines, so ranks and
    scores agree bit-for-bit. The float (non-quantized) variant and the
    LSH-bucketed scale path are exercised in tests/test_ann.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return ann.quantized_topk(
        emb, emb.where(F.col("vec_id") < 8), id_col="vec_id", vec_col="embedding", k=10
    )


@q(
    "semantic_dedup",
    rf"""
    WITH a AS (
      SELECT id, cluster, cent_sim FROM read_parquet('{staged_glob("semdedup_assign")}')
    ),
    qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    m AS (SELECT a.id, a.cluster, a.cent_sim, qz.v FROM a JOIN qz ON a.id = qz.vec_id),
    p0 AS (
      SELECT x.id AS x_id, x.cent_sim AS x_cs, y.id AS y_id, y.cent_sim AS y_cs,
             list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(x.v, t -> t * t)) AS nx,
             list_sum(list_transform(y.v, t -> t * t)) AS ny
      FROM m x JOIN m y ON x.cluster = y.cluster AND x.id <> y.id
    ),
    p AS (
      SELECT x_id, x_cs, y_id, y_cs,
             CAST(round(CASE WHEN nx > 0 AND ny > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))), 6)
                  ELSE 0.0 END * 1000000) AS BIGINT) AS c
      FROM p0
    ),
    s AS (
      SELECT x_id, CAST(COUNT(*) AS INT) AS n_dup_neighbors,
             MAX(CASE WHEN y_cs < x_cs OR (y_cs = x_cs AND y_id < x_id)
                 THEN 1 ELSE 0 END) = 1 AS has_better
      FROM p WHERE c >= 400000 GROUP BY x_id
    )
    SELECT a.id AS vec_id, a.cluster, a.cent_sim,
           COALESCE(s.n_dup_neighbors, 0) AS n_dup_neighbors,
           COALESCE(s.has_better, FALSE) AS is_dup
    FROM a LEFT JOIN s ON a.id = s.x_id
    ORDER BY vec_id
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup (operators/semdedup.py; Abbas et al. 2023): k-means-cluster
    the embedding space with the IVF coarse quantizer, compare pairs only
    within clusters, and inside every ε-ball keep the item least similar
    to its centroid (the paper's keep-outliers rule, a strict total order
    on ``(cent_sim, id)``). The numpy assignment stage is staged; the
    oracle recomputes every within-cluster quantized cosine, the ε gate,
    and every keep/drop verdict from those bytes. The synthetic embeddings
    are near-orthogonal by construction, so the catalog gate runs at
    ε=0.40 to produce nonzero hash-checked duplicate verdicts (same
    convention as ``embedding_near_dups``); production would run 0.95+."""
    from ocr_platform_spark.operators.semdedup import (
        assign_with_centroid_sim,
        semantic_duplicates,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.train_ivf(emb, n_lists=16)
    a = stage(assign_with_centroid_sim(emb, cents), "semdedup_assign")
    return semantic_duplicates(emb, a, threshold_q6=400000)


@q(
    "bitext_margin_pairs",
    """
    WITH qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    x AS (SELECT q.vec_id AS id, q.v FROM qz q JOIN documents d ON q.vec_id = d.doc_id
          WHERE d.lang = 'en' AND q.vec_id % 2 = 0),
    y AS (SELECT q.vec_id AS id, q.v FROM qz q JOIN documents d ON q.vec_id = d.doc_id
          WHERE d.lang = 'fr' AND q.vec_id % 2 = 0),
    xy0 AS (
      SELECT x.id AS x_id, y.id AS y_id,
             list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(x.v, t -> t * t)) AS nx,
             list_sum(list_transform(y.v, t -> t * t)) AS ny
      FROM x, y
    ),
    cos AS (
      SELECT x_id, y_id,
             CASE WHEN nx > 0 AND ny > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM xy0
    ),
    cxy AS (SELECT x_id, y_id, CAST(round(cosine * 1000000) AS BIGINT) AS c,
                   row_number() OVER (PARTITION BY x_id ORDER BY cosine DESC, y_id) AS rk
            FROM cos),
    cyx AS (SELECT x_id, y_id, CAST(round(cosine * 1000000) AS BIGINT) AS c,
                   row_number() OVER (PARTITION BY y_id ORDER BY cosine DESC, x_id) AS rk
            FROM cos),
    sx AS (SELECT x_id, CAST(SUM(c) AS BIGINT) AS s_x FROM cxy WHERE rk <= 4 GROUP BY x_id),
    sy AS (SELECT y_id, CAST(SUM(c) AS BIGINT) AS s_y FROM cyx WHERE rk <= 4 GROUP BY y_id),
    cand AS (
      SELECT p.x_id, p.y_id, p.c AS c_xy, sx.s_x, sy.s_y
      FROM cxy p JOIN sx USING (x_id) JOIN sy USING (y_id)
      WHERE p.rk <= 4 AND sx.s_x + sy.s_y > 0
        AND 100 * 8 * p.c >= 105 * (sx.s_x + sy.s_y)
    ),
    scored AS (
      SELECT *, round(CAST(8 * c_xy AS DOUBLE) / (s_x + s_y), 6) AS margin FROM cand
    )
    SELECT x_id, y_id, c_xy, s_x, s_y, margin FROM (
      SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id) AS rk2
      FROM scored
    ) WHERE rk2 = 1 ORDER BY x_id
    """,
)
def bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/bitext.py; Artetxe & Schwenk
    2019, the CCMatrix recipe): mine en→fr translation-pair candidates by
    the ratio margin — each en doc's best fr neighbor kept only when its
    cosine clears the mean of both sides' k-NN neighborhoods (k=4,
    threshold 1.05, gated by exact integer cross-multiplication on ×10^6
    rescaled quantized cosines). Both halves (even doc_ids) of the two
    language slices are mined; the oracle re-runs the ENTIRE pipeline —
    brute-force quantized cosine matrix, both kNN directions, neighborhood
    sums, margin gate and best-per-x selection — natively in SQL. At scale
    the kNN stage swaps to the LSH/IVF ladder; the margin math only
    consumes (query, item, cosine) triples."""
    from ocr_platform_spark.operators.bitext import margin_mine_pairs

    emb = _t(spark, sf_dir, "embeddings")
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    e = (
        emb.join(d, emb["vec_id"] == d["doc_id"])
        .where(F.col("vec_id") % 2 == 0)
        .select("vec_id", "embedding", "lang")
    )
    xs = e.where(F.col("lang") == "en").select("vec_id", "embedding")
    ys = e.where(F.col("lang") == "fr").select("vec_id", "embedding")
    return margin_mine_pairs(xs, ys, k=4, threshold_x100=105)


@q(
    "bitext_url_candidates",
    """
    WITH u AS (
      SELECT doc_id, lang,
             'https://' || source || '.example.org/' || lang || '/page-'
               || CAST(doc_id % 25 AS VARCHAR) || '.html' AS url
      FROM documents
    ),
    parsed AS (
      SELECT doc_id, url,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 2) AS url_lang,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 1) || '/' ||
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 3) AS key
      FROM u WHERE regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 2) <> ''
    ),
    reps AS (
      SELECT key, url_lang, MIN(doc_id) AS doc_id, arg_min(url, doc_id) AS url
      FROM parsed GROUP BY key, url_lang
    )
    SELECT p.key, p.doc_id AS doc_pivot, p.url AS url_pivot,
           o.doc_id AS doc_xx, o.url AS url_xx, o.url_lang AS lang_xx
    FROM reps p JOIN reps o USING (key)
    WHERE p.url_lang = 'en' AND o.url_lang <> 'en'
    ORDER BY key, lang_xx
    """,
)
def bitext_url_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-matched bitext candidates (operators/bitext.url_matched_pairs;
    the ParaCrawl/WMT recall stage): pages whose URLs are identical after
    stripping the language folder ("/en/" vs "/fr/" on one site) pair as
    candidate translations — run BEFORE embedding margin mining, which
    then scores these candidates. The corpus tables carry no URLs, so the
    query derives them deterministically from (source, lang, doc_id) —
    both engines build the same strings, then the oracle replays the
    marker parse, mirror-collapse (min doc_id per key+lang) and the
    key equi-join. The representative url is ``arg_min(url, doc_id)`` on
    BOTH engines (Spark ``min_by``) — the same expression, so on real
    corpora where one stripped key maps to scheme/query-string url
    variants the operator and oracle cannot drift."""
    from ocr_platform_spark.operators.bitext import url_matched_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/"),
            F.col("lang"),
            F.lit("/page-"),
            (F.col("doc_id") % 25).cast("string"),
            F.lit(".html"),
        ).alias("url"),
    )
    return url_matched_pairs(d, pivot_lang="en")


@q(
    "bitext_url_scored",
    """
    WITH u AS (
      SELECT doc_id, lang,
             'https://' || source || '.example.org/' || lang || '/page-'
               || CAST(doc_id % 25 AS VARCHAR) || '.html' AS url
      FROM documents
    ),
    parsed AS (
      SELECT doc_id, url,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 2) AS url_lang,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 1) || '/' ||
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 3) AS key
      FROM u WHERE regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 2) <> ''
    ),
    reps AS (
      SELECT key, url_lang, MIN(doc_id) AS doc_id
      FROM parsed GROUP BY key, url_lang
    ),
    cand AS (
      SELECT p.key, p.doc_id AS doc_pivot, o.doc_id AS doc_xx, o.url_lang AS lang_xx
      FROM reps p JOIN reps o USING (key)
      WHERE p.url_lang = 'en' AND o.url_lang <> 'en'
    ),
    qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT c.key, c.doc_pivot, c.doc_xx, c.lang_xx,
             list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) AS dot,
             list_sum(list_transform(a.v, x -> x * x)) AS na,
             list_sum(list_transform(b.v, x -> x * x)) AS nb
      FROM cand c
      JOIN qz a ON a.vec_id = c.doc_pivot % 500
      JOIN qz b ON b.vec_id = c.doc_xx % 500
    )
    SELECT key, doc_pivot, doc_xx, lang_xx,
           CASE WHEN na > 0 AND nb > 0
                THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
                ELSE 0.0 END AS cosine,
           CASE WHEN na > 0 AND nb > 0
                THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
                ELSE 0.0 END >= 0.5 AS accepted
    FROM s ORDER BY key, lang_xx, doc_xx
    """,
)
def bitext_url_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed ParaCrawl shape: URL-matched candidate pairs
    (operators/bitext.url_matched_pairs — the recall stage) flowed into
    embedding similarity scoring (the precision stage) — each candidate
    pair scored by the exact quantized cosine of its two document
    embeddings plus the ≥0.5 accept gate. Documents map to the embeddings
    table by the deterministic synthetic assignment ``doc_id % 500``
    (both engines derive it identically). Scale shape: the two
    embedding joins are plain equi-joins on the derived vec key —
    candidate-sized probes against the embedding table, co-partitionable
    at 10^12 rows; scoring is the shared exact-integer cosine tail."""
    from ocr_platform_spark.operators.ann import _quantize, _quantized_cosine
    from ocr_platform_spark.operators.bitext import url_matched_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/"),
            F.col("lang"),
            F.lit("/page-"),
            (F.col("doc_id") % 25).cast("string"),
            F.lit(".html"),
        ).alias("url"),
    )
    cands = url_matched_pairs(d, pivot_lang="en").select(
        "key", "doc_pivot", "doc_xx", "lang_xx"
    )
    qz = _t(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding"), 1000).alias("v")
    )
    j = (
        cands.join(
            qz.select(F.col("vec_id").alias("_va_id"), F.col("v").alias("va")),
            (F.col("doc_pivot") % 500) == F.col("_va_id"),
        )
        .join(
            qz.select(F.col("vec_id").alias("_vb_id"), F.col("v").alias("vb")),
            (F.col("doc_xx") % 500) == F.col("_vb_id"),
        )
        .select(
            "key",
            "doc_pivot",
            "doc_xx",
            "lang_xx",
            _quantized_cosine("va", "vb").alias("cosine"),
        )
    )
    return j.withColumn("accepted", F.col("cosine") >= 0.5).orderBy(
        "key", "lang_xx", "doc_xx"
    )


@q(
    "retrieval_mrr_report",
    """
    WITH qz AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pos AS (
      SELECT q.vec_id AS query_id, MIN(i.vec_id) AS pos_id
      FROM qz q JOIN qz i ON i.label = q.label AND i.vec_id <> q.vec_id
      WHERE q.vec_id < 16 GROUP BY q.vec_id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE)
                             / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM (
        SELECT q.vec_id AS query_id, i.vec_id AS item_id,
               list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
               list_sum(list_transform(q.v, x -> x * x)) AS nq,
               list_sum(list_transform(i.v, x -> x * x)) AS ni
        FROM qz q, qz i
        WHERE q.vec_id < 16 AND i.vec_id <> q.vec_id
      )
    ),
    pc AS (
      SELECT s.query_id, p.pos_id, s.cosine AS pos_cosine
      FROM pos p JOIN scored s ON s.query_id = p.query_id AND s.item_id = p.pos_id
    ),
    r AS (
      SELECT pc.query_id, pc.pos_id,
             CAST(1 + COUNT(CASE WHEN s.cosine > pc.pos_cosine
                                   OR (s.cosine = pc.pos_cosine
                                       AND s.item_id < pc.pos_id)
                                 THEN 1 END) AS INT) AS rank
      FROM pc JOIN scored s ON s.query_id = pc.query_id
      GROUP BY pc.query_id, pc.pos_id
    )
    SELECT query_id, pos_id, rank,
           rank = 1 AS hit_at_1, rank <= 10 AS hit_at_10,
           CAST(CASE WHEN rank <= 10 THEN 1000000 // rank ELSE 0 END AS BIGINT)
             AS rr_x1e6
    FROM r ORDER BY query_id
    """,
)
def retrieval_mrr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation metrics (operators/ann.positive_rank_metrics):
    MRR@10 / hit@1 / hit@10 of labeled (query, positive) pairs under
    exact brute-force cosine — the ground-truth yardstick every index
    variant (ann_lsh_*, ann_ivf*, ann_pq*) is compared against.
    Positives are label-derived (the lowest same-label vec_id). The
    positive's full rank comes from a count-comparison per query, not a
    global row_number window, so nothing materializes a corpus-wide
    total order; reciprocal ranks are integer parts-per-million so the
    report hashes identically cross-engine."""
    from ocr_platform_spark.operators.ann import positive_rank_metrics

    emb = _t(spark, sf_dir, "embeddings")
    qz = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "label"
    )
    cand = emb.select(F.col("vec_id").alias("pos_cand"), F.col("label").alias("plabel"))
    positives = (
        qz.join(cand, (F.col("plabel") == F.col("label")) & (F.col("pos_cand") != F.col("query_id")))
        .groupBy("query_id")
        .agg(F.min("pos_cand").alias("pos_id"))
    )
    return positive_rank_metrics(emb, positives, k=10).orderBy("query_id")


@q(
    "retrieval_hard_negatives",
    """
    WITH qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pos AS (SELECT vec_id AS query_id, vec_id + 100 AS pos_id FROM embeddings WHERE vec_id < 8),
    pairs AS (
      SELECT q.vec_id AS query_id, i.vec_id AS item_id,
             list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(i.v, x -> x * x)) AS ni
      FROM qz q JOIN pos ON q.vec_id = pos.query_id
      JOIN qz i ON i.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    ),
    ps AS (
      SELECT s.query_id, p.pos_id, s.cosine AS pos_cosine
      FROM scored s JOIN pos p ON s.query_id = p.query_id AND s.item_id = p.pos_id
    ),
    negs AS (
      SELECT s.query_id, ps.pos_id, s.item_id AS neg_id, s.cosine, ps.pos_cosine
      FROM scored s JOIN ps ON s.query_id = ps.query_id
      WHERE s.cosine < ps.pos_cosine
        AND NOT EXISTS (SELECT 1 FROM pos p2
                        WHERE p2.query_id = s.query_id AND p2.pos_id = s.item_id)
    )
    SELECT query_id, pos_id, neg_id, cosine, pos_cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id, pos_id ORDER BY cosine DESC, neg_id) AS rk
      FROM negs
    ) WHERE rk <= 5
    ORDER BY query_id, rank
    """,
)
def retrieval_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoised hard-negative mining (operators/ann.hard_negatives; the
    DPR/RocketQA contrastive-training recipe): for each labeled
    (query, positive) pair, the top-5 most-similar corpus items scoring
    strictly below the positive — near-misses train the ranker, while
    candidates OUTSCORING the positive are presumed unlabeled true matches
    (false negatives) and are excluded. Labeled pairs are synthesized
    deterministically (query q ↔ q+100); exact quantized cosines make the
    ranks, scores and the denoising gate identical cross-engine."""
    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), (F.col("vec_id") + 100).alias("pos_id")
    )
    return ann.hard_negatives(emb, pos, k=5).orderBy("query_id", "rank")


#: DuckDB recompute of the deterministic trigram-hash embedder — every
#: derived-embedding oracle shares this single source of truth
#: (operators/embed.derived_embeddings_cte).
_DEMB = embed.derived_embeddings_cte()


@q(
    "doc_embedding",
    f"""
    WITH {_DEMB}
    SELECT doc_id, array_to_string(embedding, ' ') AS embedding_txt, n_grams
    FROM demb ORDER BY doc_id
    """,
)
def doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text→embedding (operators/embed.hashed_ngram_embedding;
    the feature-hashing trick): hashed char-trigram features with a
    hash-derived sign, summed into 64 signed integer buckets. The oracle
    RECOMPUTES every vector from the raw parquet — normalize, slide
    trigrams, 31-bit modular polynomial hash, bucket+sign, scatter-add —
    with no staging, closing the synthetic-input dependency of the
    semantic/retrieval family (see the *_derived twins). Map-side only:
    one Arrow pass, no shuffle, no model.

    The vector is emitted as a space-joined scalar (catalog convention:
    no array/struct columns in catalog outputs — the driver's pandas
    canonicalizer cannot sort list cells); the array-typed operator itself
    is unchanged and consumed as-is by the *_derived twins."""
    d = _t(spark, sf_dir, "documents")
    return (
        embed.hashed_ngram_embedding(d, "doc_id", "text")
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(F.col("embedding").cast("array<string>"), " ").alias(
                "embedding_txt"
            ),
            "n_grams",
        )
        .orderBy("doc_id")
    )


@q(
    "ann_derived_topk",
    f"""
    WITH {_DEMB},
    qz AS (SELECT doc_id AS vec_id, list_transform(embedding, x -> x * 1000) AS v
           FROM demb),
    pairs AS (
      SELECT q.vec_id AS query_id, i.vec_id AS item_id,
             list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(i.v, x -> x * x)) AS ni
      FROM qz q, qz i
      WHERE q.vec_id < 8 AND i.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    )
    SELECT query_id, item_id, cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def ann_derived_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over embeddings DERIVED FROM TEXT (the
    doc_embedding operator) instead of the pregenerated embeddings table —
    text → vector → retrieval verified end to end from the raw parquet by
    one oracle, nothing staged. Counts are exact in float32, so the ×1000
    quantization is exact and ranks/scores agree bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    # persist: the item scan, the query-side filter, and quantized_topk's
    # internal branches would each re-run the Arrow embed kernel otherwise
    emb_d = dedup._staged(
        embed.hashed_ngram_embedding(d, "doc_id", "text", as_float=True).select(
            F.col("id").alias("vec_id"), "embedding"
        )
    )
    return ann.quantized_topk(emb_d, emb_d.where(F.col("vec_id") < 8), k=5)


@q(
    "semantic_dedup_derived",
    rf"""
    WITH {_DEMB},
    a AS (
      SELECT id, cluster, cent_sim FROM read_parquet('{staged_glob("semdedup_assign_d")}')
    ),
    qz AS (SELECT doc_id AS vec_id, list_transform(embedding, x -> x * 1000) AS v
           FROM demb),
    m AS (SELECT a.id, a.cluster, a.cent_sim, qz.v FROM a JOIN qz ON a.id = qz.vec_id),
    p0 AS (
      SELECT x.id AS x_id, x.cent_sim AS x_cs, y.id AS y_id, y.cent_sim AS y_cs,
             list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(x.v, t -> t * t)) AS nx,
             list_sum(list_transform(y.v, t -> t * t)) AS ny
      FROM m x JOIN m y ON x.cluster = y.cluster AND x.id <> y.id
    ),
    p AS (
      SELECT x_id, x_cs, y_id, y_cs,
             CAST(round(CASE WHEN nx > 0 AND ny > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))), 6)
                  ELSE 0.0 END * 1000000) AS BIGINT) AS c
      FROM p0
    ),
    s AS (
      SELECT x_id, CAST(COUNT(*) AS INT) AS n_dup_neighbors,
             MAX(CASE WHEN y_cs < x_cs OR (y_cs = x_cs AND y_id < x_id)
                 THEN 1 ELSE 0 END) = 1 AS has_better
      FROM p WHERE c >= 900000 GROUP BY x_id
    )
    SELECT a.id AS vec_id, a.cluster, a.cent_sim,
           COALESCE(s.n_dup_neighbors, 0) AS n_dup_neighbors,
           COALESCE(s.has_better, FALSE) AS is_dup
    FROM a LEFT JOIN s ON a.id = s.x_id
    ORDER BY vec_id
    """,
)
def semantic_dedup_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup over embeddings DERIVED FROM TEXT — the full semantic-dedup
    loop (text → trigram-hash vector → IVF cluster → within-cluster
    ε-ball keep-outliers rule) with only the trained-model assignment
    staged; the oracle recomputes the vectors from raw parquet AND every
    within-cluster verdict. Trigram-count embeddings of same-boilerplate
    pages score high cosine, so the gate runs at ε=0.90 (real near-dups,
    not the near-orthogonal synthetic-vector convention)."""
    from ocr_platform_spark.operators.semdedup import (
        assign_with_centroid_sim,
        semantic_duplicates,
    )

    d = _t(spark, sf_dir, "documents")
    # persist: train_ivf's sample, the assignment scan, and BOTH pair
    # sides of semantic_duplicates re-run the Arrow embed kernel otherwise
    # (measured 36 s -> ~8 s at sf0.1)
    emb_d = dedup._staged(
        embed.hashed_ngram_embedding(d, "doc_id", "text", as_float=True).select(
            F.col("id").alias("vec_id"), "embedding"
        )
    )
    cents = ann.train_ivf(emb_d, n_lists=16)
    a = stage(assign_with_centroid_sim(emb_d, cents), "semdedup_assign_d")
    return semantic_duplicates(emb_d, a, threshold_q6=900000)


@q(
    "bitext_url_scored_derived",
    f"""
    WITH {_DEMB},
    u AS (
      SELECT doc_id, lang,
             'https://' || source || '.example.org/' || lang || '/page-'
               || CAST(doc_id % 25 AS VARCHAR) || '.html' AS url
      FROM documents
    ),
    parsed AS (
      SELECT doc_id, url,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{{2}})/(.*)$', 2) AS url_lang,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{{2}})/(.*)$', 1) || '/' ||
             regexp_extract(url, '^https?://([^/]+)/([a-z]{{2}})/(.*)$', 3) AS key
      FROM u WHERE regexp_extract(url, '^https?://([^/]+)/([a-z]{{2}})/(.*)$', 2) <> ''
    ),
    reps AS (
      SELECT key, url_lang, MIN(doc_id) AS doc_id
      FROM parsed GROUP BY key, url_lang
    ),
    cand AS (
      SELECT p.key, p.doc_id AS doc_pivot, o.doc_id AS doc_xx, o.url_lang AS lang_xx
      FROM reps p JOIN reps o USING (key)
      WHERE p.url_lang = 'en' AND o.url_lang <> 'en'
    ),
    qz AS (SELECT doc_id AS vec_id, list_transform(embedding, x -> x * 1000) AS v
           FROM demb),
    s AS (
      SELECT c.key, c.doc_pivot, c.doc_xx, c.lang_xx,
             list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) AS dot,
             list_sum(list_transform(a.v, x -> x * x)) AS na,
             list_sum(list_transform(b.v, x -> x * x)) AS nb
      FROM cand c
      JOIN qz a ON a.vec_id = c.doc_pivot
      JOIN qz b ON b.vec_id = c.doc_xx
    )
    SELECT key, doc_pivot, doc_xx, lang_xx,
           CASE WHEN na > 0 AND nb > 0
                THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
                ELSE 0.0 END AS cosine,
           CASE WHEN na > 0 AND nb > 0
                THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
                ELSE 0.0 END >= 0.5 AS accepted
    FROM s ORDER BY key, lang_xx, doc_xx
    """,
)
def bitext_url_scored_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed ParaCrawl shape over DERIVED embeddings: URL-matched
    candidates scored by the cosine of each page's OWN text-derived
    vector — no pregenerated table, no synthetic doc→vec mapping; the
    oracle recomputes vectors AND the url/candidate/scoring pipeline
    entirely from the raw parquet."""
    from ocr_platform_spark.operators.ann import _quantize, _quantized_cosine
    from ocr_platform_spark.operators.bitext import url_matched_pairs

    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/"),
            F.col("lang"),
            F.lit("/page-"),
            (F.col("doc_id") % 25).cast("string"),
            F.lit(".html"),
        ).alias("url"),
    )
    cands = url_matched_pairs(d, pivot_lang="en").select(
        "key", "doc_pivot", "doc_xx", "lang_xx"
    )
    # persist: both join sides (pivot + xx) re-run the embed kernel otherwise
    qz = dedup._staged(
        embed.hashed_ngram_embedding(docs, "doc_id", "text", as_float=True).select(
            F.col("id").alias("vec_id"), _quantize(F.col("embedding"), 1000).alias("v")
        )
    )
    j = (
        cands.join(qz.withColumnRenamed("vec_id", "doc_pivot").withColumnRenamed("v", "v_a"), "doc_pivot")
        .join(qz.withColumnRenamed("vec_id", "doc_xx").withColumnRenamed("v", "v_b"), "doc_xx")
        .select(
            "key", "doc_pivot", "doc_xx", "lang_xx",
            _quantized_cosine("v_a", "v_b").alias("cosine"),
        )
    )
    return j.withColumn("accepted", F.col("cosine") >= 0.5).orderBy(
        "key", "lang_xx", "doc_xx"
    )


@q(
    "retrieval_index_build",
    rf"""
    WITH split AS (
      SELECT doc_id, string_split_regex(text, '\n{{2,}}') AS ps FROM documents
    ),
    paras AS (
      SELECT doc_id, CAST(i - 1 AS INT) AS idx, ps[i] AS para
      FROM (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i FROM split)
      WHERE length(ps[i]) >= 1
    ),
    toks AS (
      SELECT doc_id, idx, para,
             CAST(len(list_filter(string_split_regex(para, '\s+'), x -> x <> ''))
                  AS BIGINT) AS tok
      FROM paras
    ),
    cum AS (
      SELECT doc_id, idx, para, tok,
             COALESCE(SUM(tok) OVER (PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM toks
    ),
    chunksrc AS (
      SELECT doc_id, CAST(cum_before // 40 AS INT) AS chunk_id,
             string_agg(para, chr(10) || chr(10) ORDER BY idx) AS text
      FROM cum GROUP BY doc_id, cum_before // 40
    ),
    chunks AS (SELECT doc_id * 100000 + chunk_id AS doc_id, text FROM chunksrc),
    {embed.derived_embeddings_cte(table="chunks")},
    qz AS (SELECT doc_id AS vec_id, list_transform(embedding, x -> x * 1000) AS v
           FROM demb),
    codes AS (SELECT id, list_id, codes FROM read_parquet('{staged_glob("rix_codes")}')),
    biases AS (SELECT * FROM read_parquet('{staged_glob("rix_biases")}')),
    luts AS (SELECT * FROM read_parquet('{staged_glob("rix_luts")}')),
    cb AS (SELECT * FROM read_parquet('{staged_glob("rix_cb")}')),
    cents AS (SELECT * FROM read_parquet('{staged_glob("rix_cents")}')),
    cand AS (
      SELECT b.query_id, c.id AS item_id, b.bias, c.codes
      FROM codes c JOIN biases b ON c.list_id = b.list_id
      WHERE c.id != b.query_id
    ),
    adcterm AS (
      SELECT query_id, item_id, bias,
             CAST(i - 1 AS INT) AS m_idx, CAST(codes[i] AS INT) AS code
      FROM (SELECT query_id, item_id, bias, codes,
                   unnest(generate_series(1, len(codes))) AS i FROM cand)
    ),
    adc AS (
      SELECT t.query_id, t.item_id, CAST(MAX(t.bias) + SUM(l.w) AS BIGINT) AS score
      FROM adcterm t
      JOIN luts l ON l.query_id = t.query_id AND l.m_idx = t.m_idx AND l.code = t.code
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, item_id FROM (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, item_id) AS rn
        FROM adc) WHERE rn <= 50
    ),
    recterm AS (
      SELECT id, list_id, CAST(i - 1 AS INT) AS m_idx, CAST(codes[i] AS INT) AS code
      FROM (SELECT id, list_id, codes,
                   unnest(generate_series(1, len(codes))) AS i FROM codes)
    ),
    resid AS (
      SELECT id, list_id, flatten(list(sub ORDER BY m_idx)) AS resid
      FROM recterm JOIN cb USING (m_idx, code)
      GROUP BY id, list_id
    ),
    recon AS (
      SELECT id,
             list_transform(list_zip(cvec, resid),
                            p -> CAST(round((p[1] + p[2]) * 1000) AS BIGINT)) AS xq
      FROM resid JOIN cents USING (list_id)
    ),
    pairs AS (
      SELECT s.query_id, s.item_id,
             list_sum(list_transform(list_zip(q.v, r.xq), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(r.xq, x -> x * x)) AS ni
      FROM short s JOIN qz q ON s.query_id = q.vec_id JOIN recon r ON s.item_id = r.id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    )
    SELECT query_id, item_id, cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    ORDER BY query_id, rank
    """,
)
def retrieval_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed retrieval-index flagship (plans/retrieval_index.py):
    text → paragraph chunks (40-token budget) → deterministic trigram-hash
    embeddings → IVF-PQ train/encode → ADC shortlist-50 → INDEX-ONLY
    refine to top-10, queried by the chunks of the first 4 documents. The
    oracle replays chunking, embedding (recomputed from raw parquet —
    nothing query-side is pregenerated), ADC scoring from the staged
    integer model tables, reconstruction, and the cosine re-rank; only
    the trained model (codes/LUTs/biases/centroids/codebooks — numpy
    k-means, relational-staged like every ANN model here) crosses the
    engine boundary as data."""
    from ocr_platform_spark.plans.retrieval_index import (
        UID_STRIDE,
        build_retrieval_index,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    index = build_retrieval_index(d, budget_tokens=40)
    codes = stage(index["codes"], "rix_codes")
    cents_df = stage(index["cents_df"], "rix_cents")
    cb_df = stage(index["cb_df"], "rix_cb")
    queries_df = index["emb"].where(F.col("vec_id") < 4 * UID_STRIDE)
    luts, biases = ann.ivfpq_query_tables(
        queries_df, index["cents"], index["cb"], n_probe=4
    )
    luts = stage(luts, "rix_luts")
    biases = stage(biases, "rix_biases")
    short = ann.ivfpq_adc_topk(codes, luts, biases, k=50).select(
        "query_id", "item_id"
    )
    return ann.ivfpq_refined_topk(
        short, codes, cents_df, cb_df, queries_df
    ).orderBy("query_id", "rank")


#: Quantized-cosine scoring + top-k over a staged candidate table — the
#: exact (oracle-checkable) tail shared by the LSH and IVF queries. The
#: candidate set itself comes from the numpy bucketing kernels; staging it
#: lets DuckDB reproduce everything downstream of the approximation.
def _ann_tail_sql(cands_name: str) -> str:
    return f"""
    WITH qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    c AS (SELECT * FROM read_parquet('{staged_glob(cands_name)}')),
    pairs AS (
      SELECT c.query_id, c.item_id,
             list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(i.v, x -> x * x)) AS ni
      FROM c JOIN qz q ON c.query_id = q.vec_id JOIN qz i ON c.item_id = i.vec_id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    )
    SELECT query_id, item_id, cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    ORDER BY query_id, rank
    """


@q("ann_lsh_topk", _ann_tail_sql("ann_lsh_cands"))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN, split at the staged candidate boundary:
    the numpy sign-projection buckets produce (query_id, item_id) candidates
    (recall vs brute force pinned in tests/test_ann.py), then BOTH engines
    run the exact quantized-cosine scoring + top-k from the staged pairs."""
    emb = _t(spark, sf_dir, "embeddings")
    cands = stage(
        ann.lsh_candidates(emb, emb.where(F.col("vec_id") < 8), dim=64),
        "ann_lsh_cands",
    )
    return ann.quantized_rank_candidates(cands, emb, k=10).orderBy("query_id", "rank")


@q(
    "ann_lsh_recall",
    f"""
    WITH exact AS (
      SELECT query_id, item_id FROM read_parquet('{staged_glob("ann_recall_exact")}')
    ),
    approx AS (
      SELECT query_id, item_id FROM read_parquet('{staged_glob("ann_recall_lsh")}')
    )
    SELECT e.query_id,
           CAST(COUNT(a.item_id) AS INT) AS n_hit,
           CAST(COUNT(*) AS INT) AS k,
           round(COUNT(a.item_id) * 1.0 / COUNT(*), 4) AS recall
    FROM exact e
    LEFT JOIN approx a ON a.query_id = e.query_id AND a.item_id = e.item_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LSH scale path against the exact brute-force
    ground truth — the measurement that justifies shipping an
    approximation (tests pin a floor; this query REPORTS the number,
    per query). Both top-k frames are staged, so DuckDB recomputes the
    per-query hit counts and recall from the same bytes."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8)
    exact = stage(
        ann.quantized_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=10)
        .select("query_id", "item_id"),
        "ann_recall_exact",
    )
    approx = stage(
        ann.quantized_rank_candidates(ann.lsh_candidates(emb, qs, dim=64), emb, k=10)
        .select("query_id", "item_id"),
        "ann_recall_lsh",
    )
    j = exact.join(approx.withColumn("_hit", F.lit(1)), ["query_id", "item_id"], "left")
    return (
        j.groupBy("query_id")
        .agg(
            F.count("_hit").cast("int").alias("n_hit"),
            F.count(F.lit(1)).cast("int").alias("k"),
        )
        .select(
            "query_id",
            "n_hit",
            "k",
            F.round(F.col("n_hit") * 1.0 / F.col("k"), 4).alias("recall"),
        )
        .orderBy("query_id")
    )


_PQ_SQL = f"""
    WITH codes AS (SELECT id, codes FROM read_parquet('{staged_glob("pq_codes")}')),
    terms AS (
      SELECT id AS item_id, CAST(i - 1 AS INT) AS m_idx, CAST(codes[i] AS INT) AS code
      FROM (SELECT id, codes, unnest(generate_series(1, len(codes))) AS i FROM codes)
    ),
    luts AS (SELECT * FROM read_parquet('{staged_glob("pq_luts")}')),
    adc AS (
      SELECT l.query_id, t.item_id, SUM(l.w) AS score
      FROM terms t JOIN luts l ON l.m_idx = t.m_idx AND l.code = t.code
      WHERE t.item_id != l.query_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, item_id FROM (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, item_id) AS rn
        FROM adc) WHERE rn <= 50
    ),
    qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pairs AS (
      SELECT c.query_id, c.item_id,
             list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(i.v, x -> x * x)) AS ni
      FROM short c JOIN qz q ON c.query_id = q.vec_id JOIN qz i ON c.item_id = i.vec_id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    )
    SELECT query_id, item_id, cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    ORDER BY query_id, rank
    """


@q("ann_pq_topk", _PQ_SQL)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the 10^9-vector regime (index = m bytes
    per vector instead of 4·dim): per-subspace codebooks (train_pq, bounded
    driver sample), items encoded to m codes, queries carried as INTEGER
    ADC lookup tables. Shortlist-50 by exact-integer ADC score, then exact
    quantized-cosine re-rank to top-10. Both the shortlist AND the re-rank
    are recomputed by the oracle from the staged (codes, luts) tables —
    the entire search tail is cross-engine exact; codebook training and
    recall-vs-brute-force are pinned in tests/test_ann.py."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = ann.train_pq(emb, m=8, k_codes=16)
    codes = stage(ann.pq_encode(emb, cb), "pq_codes")
    luts = stage(
        ann.pq_query_luts(emb.where(F.col("vec_id") < 8), cb), "pq_luts"
    )
    short = ann.pq_adc_topk(codes, luts, k=50).select("query_id", "item_id")
    return ann.quantized_rank_candidates(short, emb, k=10).orderBy("query_id", "rank")


_IVFPQ_SQL = f"""
    WITH codes AS (SELECT id, list_id, codes FROM read_parquet('{staged_glob("ivfpq_codes")}')),
    biases AS (SELECT * FROM read_parquet('{staged_glob("ivfpq_biases")}')),
    luts AS (SELECT * FROM read_parquet('{staged_glob("ivfpq_luts")}')),
    cand AS (
      SELECT b.query_id, c.id AS item_id, b.bias, c.codes
      FROM codes c JOIN biases b ON c.list_id = b.list_id
      WHERE c.id != b.query_id
    ),
    terms AS (
      SELECT query_id, item_id, bias,
             CAST(i - 1 AS INT) AS m_idx, CAST(codes[i] AS INT) AS code
      FROM (SELECT query_id, item_id, bias, codes,
                   unnest(generate_series(1, len(codes))) AS i FROM cand)
    ),
    adc AS (
      SELECT t.query_id, t.item_id, CAST(MAX(t.bias) + SUM(l.w) AS BIGINT) AS score
      FROM terms t
      JOIN luts l ON l.query_id = t.query_id AND l.m_idx = t.m_idx AND l.code = t.code
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, item_id FROM (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, item_id) AS rn
        FROM adc) WHERE rn <= 50
    ),
    qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pairs AS (
      SELECT c.query_id, c.item_id,
             list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(i.v, x -> x * x)) AS ni
      FROM short c JOIN qz q ON c.query_id = q.vec_id JOIN qz i ON c.item_id = i.vec_id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    )
    SELECT query_id, item_id, cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    ORDER BY query_id, rank
    """


@q("ann_ivfpq_topk", _IVFPQ_SQL)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composed 10^9-vector index (coarse quantizer routes
    each vector to one inverted list; PQ codebooks encode the RESIDUAL;
    queries probe n_probe lists and score by integer ADC = per-list bias +
    residual LUT sum). The oracle recomputes the ENTIRE search from the
    staged (codes, biases, luts) tables: IVF pruning (the bias join),
    exact-integer ADC shortlist-50, and the quantized-cosine re-rank to
    top-10 — the full approximate-search tail is cross-engine exact.
    Training determinism and recall-vs-brute-force are pinned in
    tests/test_ann.py."""
    emb = _t(spark, sf_dir, "embeddings")
    cents, cb = ann.train_ivfpq(emb, n_lists=8, m=8, k_codes=16)
    codes = stage(ann.ivfpq_encode(emb, cents, cb), "ivfpq_codes")
    luts, biases = ann.ivfpq_query_tables(
        emb.where(F.col("vec_id") < 8), cents, cb, n_probe=4
    )
    luts = stage(luts, "ivfpq_luts")
    biases = stage(biases, "ivfpq_biases")
    short = ann.ivfpq_adc_topk(codes, luts, biases, k=50).select("query_id", "item_id")
    return ann.quantized_rank_candidates(short, emb, k=10).orderBy("query_id", "rank")


_IVFPQ_REFINE_SQL = f"""
    WITH codes AS (SELECT * FROM read_parquet('{staged_glob("rec_codes")}')),
    cb AS (SELECT * FROM read_parquet('{staged_glob("rec_cb")}')),
    cents AS (SELECT * FROM read_parquet('{staged_glob("rec_cents")}')),
    short AS (SELECT * FROM read_parquet('{staged_glob("rec_short")}')),
    terms AS (
      SELECT id, list_id, CAST(i - 1 AS INT) AS m_idx, CAST(codes[i] AS INT) AS code
      FROM (SELECT id, list_id, codes,
                   unnest(generate_series(1, len(codes))) AS i FROM codes)
    ),
    resid AS (
      SELECT id, list_id, flatten(list(sub ORDER BY m_idx)) AS resid
      FROM terms JOIN cb USING (m_idx, code)
      GROUP BY id, list_id
    ),
    recon AS (
      SELECT id,
             list_transform(list_zip(cvec, resid),
                            p -> CAST(round((p[1] + p[2]) * 1000) AS BIGINT)) AS xq
      FROM resid JOIN cents USING (list_id)
    ),
    qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pairs AS (
      SELECT s.query_id, s.item_id,
             list_sum(list_transform(list_zip(q.v, r.xq), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(r.xq, x -> x * x)) AS ni
      FROM short s JOIN qz q ON s.query_id = q.vec_id JOIN recon r ON s.item_id = r.id
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    )
    SELECT query_id, item_id, cosine, CAST(rk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    ORDER BY query_id, rank
    """


@q("ann_ivfpq_refine_topk", _IVFPQ_REFINE_SQL)
def ann_ivfpq_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with INDEX-ONLY refine — the 10^9-vector deployment shape:
    ADC shortlist-50, then re-rank against vectors RECONSTRUCTED from the
    index (x̂ = coarse centroid + residual codebook entries,
    operators/ann.ivfpq_reconstruct) instead of re-fetching raw
    embeddings, which at that scale cost a second corpus pass. The model
    itself is staged as two relational tables (n_lists + m·k rows), so the
    oracle replays reconstruction, quantization, and the cosine re-rank
    exactly — binary64 addition is correctly rounded in both engines.
    Reconstruction ≡ numpy is pinned in tests/test_ann.py."""
    emb = _t(spark, sf_dir, "embeddings")
    cents, cb = ann.train_ivfpq(emb, n_lists=8, m=8, k_codes=16)
    codes = stage(ann.ivfpq_encode(emb, cents, cb), "rec_codes")
    cents_raw, cb_raw = ann.ivfpq_model_tables(spark, cents, cb)
    cents_df = stage(cents_raw, "rec_cents")
    cb_df = stage(cb_raw, "rec_cb")
    queries_df = emb.where(F.col("vec_id") < 8)
    luts, biases = ann.ivfpq_query_tables(queries_df, cents, cb, n_probe=4)
    short = stage(
        ann.ivfpq_adc_topk(codes, luts, biases, k=50).select("query_id", "item_id"),
        "rec_short",
    )
    return ann.ivfpq_refined_topk(
        short, codes, cents_df, cb_df, queries_df
    ).orderBy("query_id", "rank")


@q("ann_ivf_topk", _ann_tail_sql("ann_ivf_cands"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: deterministic coarse k-means quantizer,
    items sharded by nearest list, queries probe 4 lists. Probed-list
    candidates are staged; the exact scoring + top-k tail is oracle-checked
    (recall + full-probe==bruteforce equivalence in tests/test_ann.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.train_ivf(emb, n_lists=8)
    cands = stage(
        ann.ivf_candidates(emb, emb.where(F.col("vec_id") < 8), cents, n_probe=4),
        "ann_ivf_cands",
    )
    return ann.quantized_rank_candidates(cands, emb, k=10).orderBy("query_id", "rank")


@q(
    "embedding_near_dups",
    f"""
    WITH qz AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    p AS (SELECT * FROM read_parquet('{staged_glob("emb_dup_cands")}')),
    pairs AS (
      SELECT p.id_a, p.id_b,
             list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) AS dot,
             list_sum(list_transform(a.v, x -> x * x)) AS na,
             list_sum(list_transform(b.v, x -> x * x)) AS nb
      FROM p JOIN qz a ON p.id_a = a.vec_id JOIN qz b ON p.id_b = b.vec_id
    )
    SELECT id_a, id_b,
           CASE WHEN na > 0 AND nb > 0
                THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
                ELSE 0.0 END AS cosine
    FROM pairs
    WHERE CASE WHEN na > 0 AND nb > 0
               THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
               ELSE 0.0 END >= 0.25
    ORDER BY id_a, id_b
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH self-join candidates
    staged, quantized-cosine verification oracle-checked in both engines
    from the same candidate table. The synthetic embeddings table is
    near-orthogonal (max candidate cosine ~0.35 — no true duplicates by
    construction), so the catalog query verifies the scoring tail at a
    0.25 threshold to produce NONZERO hash-checked rows; production
    near-dup semantics use the operator default (0.95)."""
    emb = _t(spark, sf_dir, "embeddings")
    cands = stage(
        ann.embedding_lsh_pairs(emb, id_col="vec_id", vec_col="embedding", dim=64),
        "emb_dup_cands",
    )
    return ann.quantized_verify_pairs(cands, emb, threshold=0.25).orderBy("id_a", "id_b")


# =========================================================================
# Fuzzy SELECT mapping (J6) — vocabulary from the supplier dimension
# =========================================================================


@q(
    "fuzzy_exact_roundtrip",
    """
    SELECT s_suppkey, s_name AS raw_name, s_name AS mapped_name
    FROM supplier ORDER BY s_suppkey
    """,
)
def fuzzy_exact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable invariant of the similarity join: a value exactly
    equal to an option label maps to that option's value (score 100 beats
    every non-identical candidate; vocabulary labels here are unique).
    The fuzzy band (75-89) is pinned by the pytest corpus instead."""
    s = _t(spark, sf_dir, "supplier")
    vocab = [(r["s_name"], r["s_name"]) for r in s.select("s_name").collect()]
    return (
        map_select_single_vocab(
            s.select("s_suppkey", F.col("s_name").alias("raw_name")),
            "raw_name",
            vocab,
            "mapped_name",
        )
        .orderBy("s_suppkey")
    )


@q(
    "fuzzy_supplier_mapping",
    f"""
    WITH pick AS (
      SELECT s_suppkey, option_value,
             row_number() OVER (
               PARTITION BY s_suppkey ORDER BY score DESC, option_value
             ) AS rn
      FROM read_parquet('{staged_glob("fuzzy_scores")}')
      WHERE score >= 75
    )
    SELECT st.s_suppkey, st.raw_name,
           CASE WHEN st.s_suppkey % 3 = 2 THEN p.option_value ELSE s.s_name END
             AS mapped_name
    FROM read_parquet('{staged_glob("fuzzy_supplier_mapping")}') st
    JOIN supplier s ON st.s_suppkey = s.s_suppkey
    LEFT JOIN (SELECT s_suppkey, option_value FROM pick WHERE rn = 1) p
      ON p.s_suppkey = st.s_suppkey
    ORDER BY st.s_suppkey
    """,
)
def fuzzy_supplier_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The similarity join: customer-entered supplier strings (deterministic
    typo synthesis from s_name) mapped onto the supplier vocabulary.

    Two of the three probe partitions have an analytically-known answer the
    oracle recomputes *independently*: ``UPPER(s_name)`` is exact after the
    scorer's lowercase preprocessing (score 100), and ``'  name inc. '`` is
    a token-superset whose token-set ratio is 1.0 → 0.95 weight → score 95 ≥
    auto-accept, with no competing label able to tie — both MUST map back to
    ``s_name``. The genuinely fuzzy truncated-prefix partition (suppkey%3=2)
    stages its FULL per-option score matrix (score_select_column — every
    (value, option) wratio_like score, no cutoff), and the oracle re-derives
    the mapping from those numbers alone: cutoff ≥ 75, argmax with the
    vocabulary-order tie-break, NULL when nothing clears the cutoff. The
    selection logic is therefore cross-engine verified end-to-end; the raw
    pair scores themselves stay pinned by the pytest golden corpus
    (tests/test_select_mapping.py)."""
    s = _t(spark, sf_dir, "supplier")
    vocab = [(r["s_name"], r["s_name"]) for r in s.select("s_name").collect()]
    noisy = s.select(
        "s_suppkey",
        F.when(
            F.pmod("s_suppkey", F.lit(3)) == 0, F.upper(F.col("s_name"))
        )
        .when(
            F.pmod("s_suppkey", F.lit(3)) == 1,
            F.concat(F.lit("  "), F.col("s_name"), F.lit(" inc. ")),
        )
        .otherwise(F.substring(F.col("s_name"), 1, 12))
        .alias("raw_name"),
    )
    # full score matrix for the fuzzy partition (vocabulary order == the
    # sorted order both score_all and the mapper's tie-break use)
    opt_values = F.array(*[F.lit(v) for v, _l in sorted(vocab)])
    scored = score_select_column(
        noisy.where(F.pmod("s_suppkey", F.lit(3)) == 2), "raw_name", vocab
    )
    stage(
        scored.select(
            "s_suppkey", F.posexplode("scores").alias("idx", "score")
        ).select(
            "s_suppkey",
            F.element_at(opt_values, F.col("idx") + 1).alias("option_value"),
            "score",
        ),
        "fuzzy_scores",
    )
    mapped = map_select_single_vocab(noisy, "raw_name", vocab, "mapped_name")
    return stage(mapped, "fuzzy_supplier_mapping").orderBy("s_suppkey")


# =========================================================================
# Extraction world (synthetic Common-Crawl-style corpus; independent of
# sf_dir — the BASELINE.json input shape). The mapInArrow kernels are
# pinned byte-identically by tests/test_extraction.py goldens; the driver
# check is made a full rows+schema+hash gate by staging the kernel output
# to parquet and letting DuckDB aggregate the same files (staging.py).
# =========================================================================


def _synth_docs(spark: SparkSession, n: int = 400) -> DataFrame:
    from ocr_platform_spark.operators.corpus_spark import documents_df

    return documents_df(spark, n)


@q(
    "extract_corpus_stats",
    f"""
    SELECT payload_kind, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_text_chars,
           CAST(SUM(n_spans) AS BIGINT) AS total_spans,
           COUNT(error) AS n_errors
    FROM read_parquet('{staged_glob("extract_corpus_stats")}')
    GROUP BY payload_kind ORDER BY payload_kind
    """,
)
def extract_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship kernel rollup: synth corpus → mapInArrow extraction →
    per-payload-kind stats (SURVEY §7.1). Per-doc kernel output is staged;
    both engines aggregate the same files."""
    from ocr_platform_spark.operators.extract import extract_documents

    ext = extract_documents(_synth_docs(spark)).select(
        "url",
        "payload_kind",
        F.length("text").alias("n_chars"),
        F.size(F.coalesce("spans", F.array())).alias("n_spans"),
        "error",
    )
    staged = stage(ext, "extract_corpus_stats")
    return (
        staged.groupBy("payload_kind")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_text_chars"),
            F.sum("n_spans").cast("long").alias("total_spans"),
            F.count("error").alias("n_errors"),
        )
        .orderBy("payload_kind")
    )


def _page_meta_oracle() -> str:
    from ocr_platform_spark.kernels.page_meta import FIELDS, sql_exprs

    e = sql_exprs("raw")
    cols = ",\n           ".join(f"{e[f]} AS {f}" for f in FIELDS)
    return f"""
    SELECT url,
           {cols},
           {e["n_hreflang"]} AS n_hreflang
    FROM read_parquet('{staged_glob("page_meta")}')
    ORDER BY url
    """


@q("extract_page_metadata", _page_meta_oracle())
def extract_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The <head> metadata face of the extraction tier
    (kernels/page_meta.py): synth corpus → one mapInArrow pass emitting the
    charset-decoded payload plus (title, description, canonical, lang,
    og:*, robots, hreflang count) per url. The decoded payload is staged
    and the oracle REPLAYS every field's regular expression in DuckDB
    (RE2) over identical characters — ``sql_exprs`` derives the SQL from
    the same compiled patterns the kernel searches, so this is a
    cross-engine check of the parse itself (dialect-parity contract
    documented in the kernel), not a rollup of kernel output. Per-doc
    rows hash-checked; reference metadata face:
    ``ocr_backend/app/api/document_routes.py`` (document name/metadata
    listing)."""
    from ocr_platform_spark.kernels.page_meta import FIELDS
    from ocr_platform_spark.operators.extract import page_metadata_df

    meta = page_metadata_df(_synth_docs(spark))
    staged = stage(meta, "page_meta")
    return staged.select("url", *FIELDS, "n_hreflang").orderBy("url")


def _canonical_dups_oracle() -> str:
    from ocr_platform_spark.kernels.page_meta import sql_exprs

    canon = sql_exprs("raw")["canonical"]
    return f"""
    WITH m AS (
      SELECT url, {canon} AS canonical
      FROM read_parquet('{staged_glob("canon_meta")}')
    ),
    t AS (SELECT url, COALESCE(canonical, url) AS target FROM m)
    SELECT target AS canonical_url,
           COUNT(*) AS n_pages,
           CAST(SUM(CASE WHEN url <> target THEN 1 ELSE 0 END) AS BIGINT)
             AS n_noncanonical,
           MIN(url) AS representative
    FROM t GROUP BY target
    HAVING COUNT(*) >= 2
       AND SUM(CASE WHEN url <> target THEN 1 ELSE 0 END) >= 1
    ORDER BY canonical_url
    """


@q("doc_canonical_dups", _canonical_dups_oracle())
def doc_canonical_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup from DECLARED canonicals — the dedup signal that
    costs no content hashing at all: pages whose ``<link rel="canonical">``
    targets coincide are duplicates by the site's own declaration
    (tracking-parameter variants, print views, pagination mirrors), and
    real crawl pipelines collapse them before any MinHash runs. The kernel
    frame (url, raw, canonical) is staged; the oracle re-extracts the
    canonical from the raw payload with the same RE2∩``re`` pattern
    (kernels/page_meta.py dialect-parity contract) and rebuilds every
    cluster — so the parse AND the clustering are cross-engine-checked.
    A page with no canonical is its own target (self-canonical pages count
    toward their cluster but never create one). Scale shape: one
    mapInArrow extraction pass, one hash aggregate on the canonical
    target — the cheapest dedup family in the engine, run FIRST in the
    published crawl recipes. Complements content-side families in
    operators/dedup.py; reference parity: URL-keyed document identity
    (``ocr_backend/app/models/document.py`` unique url per document)."""
    from ocr_platform_spark.operators.extract import page_metadata_df

    meta = page_metadata_df(_synth_docs(spark)).select("url", "raw", "canonical")
    staged = stage(meta, "canon_meta")
    t = staged.select(
        "url", F.coalesce("canonical", "url").alias("target")
    )
    nonc = F.sum((F.col("url") != F.col("target")).cast("long"))
    return (
        t.groupBy(F.col("target").alias("canonical_url"))
        .agg(
            F.count("*").alias("n_pages"),
            nonc.alias("n_noncanonical"),
            F.min("url").alias("representative"),
        )
        .where((F.col("n_pages") >= 2) & (F.col("n_noncanonical") >= 1))
        .orderBy("canonical_url")
    )


def _hreflang_seeds_oracle() -> str:
    from ocr_platform_spark.kernels.page_meta import alternates_sql_exprs

    langs_sql, hrefs_sql = alternates_sql_exprs("raw")
    return f"""
    WITH m AS (
      SELECT url, raw FROM read_parquet('{staged_glob("hreflang_meta")}')
    ),
    alts AS (
      SELECT url,
             unnest({langs_sql}) AS alt_lang,
             unnest({hrefs_sql}) AS alt_url
      FROM m
    ),
    f AS (SELECT * FROM alts WHERE alt_lang <> '' AND alt_url <> ''),
    seeds AS (
      SELECT f.* FROM f LEFT JOIN m d ON f.alt_url = d.url
      WHERE d.url IS NULL
    )
    SELECT alt_url AS seed_url, alt_lang AS declared_lang,
           COUNT(*) AS n_declaring, MIN(url) AS representative
    FROM seeds GROUP BY alt_url, alt_lang
    ORDER BY seed_url, declared_lang
    """


@q("hreflang_frontier_seeds", _hreflang_seeds_oracle())
def hreflang_frontier_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-targeted crawl expansion from DECLARED alternates: every
    ``<link rel="alternate" hreflang=..>`` names a translation of the page
    at another URL — the multilingual-corpus recipes mine exactly these
    declarations to find parallel pages, and a crawler uses the ones NOT
    yet in the corpus as frontier seeds pre-tagged with their language
    (fetch priority for low-resource langs costs nothing here). One
    pattern string runs on THREE engines: the kernel's ``re`` form
    (kernels/page_meta.hreflang_alternates), Spark's JVM regex via
    ``F.regexp_extract_all`` over the staged decoded payload (group-1 and
    group-2 lists zipped positionally — whole-stage codegen, zero Python
    past the staging boundary), and DuckDB RE2 in the oracle, which
    replays extraction, the not-in-corpus anti-join, and the per-seed
    rollup from the same staged rows. Scale shape: one extraction scan +
    one left-anti hash join on url — the same shape as Bloom-accelerated
    resume (operators/bloom.py) if the crawled set outgrows a shuffle
    join. Crawl-face sibling of bitext_url_candidates (those INFER pairs
    from URL structure; this reads the site's declaration)."""
    from ocr_platform_spark.kernels.page_meta import _ALT_HH
    from ocr_platform_spark.operators.extract import page_metadata_df

    meta = page_metadata_df(_synth_docs(spark)).select("url", "raw")
    staged = stage(meta, "hreflang_meta")
    pat = F.lit(_ALT_HH.pattern)
    alts = (
        staged.select(
            "url",
            F.explode(
                F.arrays_zip(
                    F.regexp_extract_all("raw", pat, F.lit(1)).alias("alt_lang"),
                    F.regexp_extract_all("raw", pat, F.lit(2)).alias("alt_url"),
                )
            ).alias("a"),
        )
        .select("url", F.col("a.alt_lang").alias("alt_lang"), F.col("a.alt_url").alias("alt_url"))
        .where((F.col("alt_lang") != "") & (F.col("alt_url") != ""))
    )
    seeds = alts.join(
        staged.select(F.col("url").alias("alt_url")), "alt_url", "left_anti"
    )
    return (
        seeds.groupBy(
            F.col("alt_url").alias("seed_url"), F.col("alt_lang").alias("declared_lang")
        )
        .agg(
            F.count("*").alias("n_declaring"),
            F.min("url").alias("representative"),
        )
        .orderBy("seed_url", "declared_lang")
    )


def _zorder_oracle() -> str:
    from ocr_platform_spark.operators.layout import zorder_sql

    return f"""
    WITH ev AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             CAST(user_id AS BIGINT) AS uid
      FROM events
    ),
    rng AS (SELECT MIN(ep) AS xlo, MAX(ep) AS xhi,
                   MIN(uid) AS ylo, MAX(uid) AS yhi FROM ev),
    q AS (
      SELECT ep, uid,
             ((ep - xlo) * 256) // (xhi - xlo + 1) AS qx,
             ((uid - ylo) * 256) // (yhi - ylo + 1) AS qy
      FROM ev, rng
    ),
    z AS (SELECT ep, uid, {zorder_sql("qx", "qy", 8)} AS zval FROM q)
    SELECT CAST(zval >> 12 AS INT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ep) AS BIGINT) AS ep_min, CAST(MAX(ep) AS BIGINT) AS ep_max,
           CAST(MIN(uid) AS BIGINT) AS uid_min, CAST(MAX(uid) AS BIGINT) AS uid_max,
           CAST(MIN(zval) AS BIGINT) AS z_min, CAST(MAX(zval) AS BIGINT) AS z_max
    FROM z GROUP BY 1 ORDER BY 1
    """


@q("events_zorder_layout", _zorder_oracle())
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout planning (operators/layout.py) over
    the events fact table: quantize (epoch seconds, user_id) to an 8-bit
    grid from table stats, interleave to a z-value, shard into 16 fixed
    z-ranges. The per-file report (counts, both-dimension bounding boxes,
    z extents) is hash-checked — the oracle recomputes quantization,
    bit interleave, and sharding with identical integer arithmetic. The
    measured pruning benefit (bounding-box volume vs a time-sorted
    layout, read from real parquet footers) is pinned in
    tests/test_layout.py. Engine-side layout surface (no counterpart in
    the reference)."""
    from ocr_platform_spark.operators.layout import zorder_layout

    ev = _t(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("ep"), F.col("user_id").cast("long").alias("uid")
    )
    r = ev.agg(
        F.min("ep").alias("xlo"), F.max("ep").alias("xhi"),
        F.min("uid").alias("ylo"), F.max("uid").alias("yhi"),
    ).first()
    lay = zorder_layout(
        ev, "ep", (r["xlo"], r["xhi"]), "uid", (r["ylo"], r["yhi"]),
        bits=8, file_bits=4,
    )
    return (
        lay.groupBy("file_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ep").alias("ep_min"), F.max("ep").alias("ep_max"),
            F.min("uid").alias("uid_min"), F.max("uid").alias("uid_max"),
            F.min("zval").alias("z_min"), F.max("zval").alias("z_max"),
        )
        .orderBy("file_id")
    )


@q(
    "extract_feed_blocks",
    f"""
    SELECT url,
           CAST(COUNT(*) AS INT) AS n_blocks,
           CAST(COUNT(CASE WHEN field = 'title' THEN 1 END) AS INT) AS n_items,
           CAST(SUM(length(value)) AS BIGINT) AS block_chars,
           CAST(MAX("end") AS INT) AS text_len
    FROM read_parquet('{staged_glob("feed_spans")}')
    GROUP BY url ORDER BY url
    """,
)
def extract_feed_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feed extraction branch (kernels/feed_extract.py) end to end:
    synth corpus → dispatch routes RSS/Atom payloads to the feed kernel →
    per-block spans exploded and staged → per-feed rollup (block count,
    item count, block chars, text length from the max span end) aggregated
    by BOTH engines over the same staged bytes. Block values and offsets
    are hash-checked transitively: any kernel drift changes block_chars/
    text_len. Byte-identity of the full text is pinned corpus-wide by the
    golden drive (tests/test_extraction.py, tests/test_feed.py)."""
    from ocr_platform_spark.operators.extract import extract_documents

    ext = extract_documents(_synth_docs(spark)).where(
        F.col("payload_kind") == "feed"
    )
    spans = ext.select("url", F.explode("spans").alias("s")).select(
        "url", "s.field", "s.start", "s.end", "s.value"
    )
    staged = stage(spans, "feed_spans")
    return (
        staged.groupBy("url")
        .agg(
            F.count("*").cast("int").alias("n_blocks"),
            F.count_if(F.col("field") == "title").cast("int").alias("n_items"),
            F.sum(F.length("value")).cast("long").alias("block_chars"),
            F.max("end").cast("int").alias("text_len"),
        )
        .orderBy("url")
    )


@q(
    "extract_sitemap_entries",
    f"""
    SELECT url,
           CAST(COUNT(CASE WHEN field = 'loc' THEN 1 END) AS INT) AS n_locs,
           CAST(COUNT(CASE WHEN field = 'lastmod' THEN 1 END) AS INT) AS n_lastmod,
           CAST(COUNT(CASE WHEN field = 'changefreq' THEN 1 END) AS INT) AS n_changefreq,
           CAST(SUM(CASE WHEN field = 'loc' THEN length(value) END) AS BIGINT) AS loc_chars,
           CAST(MAX("end") AS INT) AS text_len,
           MIN(CASE WHEN field = 'lastmod' THEN value END) AS earliest_lastmod
    FROM read_parquet('{staged_glob("sitemap_spans")}')
    GROUP BY url ORDER BY url
    """,
)
def extract_sitemap_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sitemap extraction branch (kernels/sitemap_extract.py) end to
    end: synth corpus → dispatch routes <urlset>/<sitemapindex> payloads
    to the sitemap kernel → per-entry spans (loc + freshness metadata)
    exploded and staged → per-sitemap rollup (loc count, metadata
    coverage, loc chars, text length, earliest lastmod) aggregated by
    BOTH engines over the same staged bytes. Loc values and offsets are
    hash-checked transitively via loc_chars/text_len; byte-identity of
    the full text is pinned by the golden drive (tests/test_sitemap.py)."""
    from ocr_platform_spark.operators.extract import extract_documents

    ext = extract_documents(_synth_docs(spark)).where(
        F.col("payload_kind") == "sitemap"
    )
    spans = ext.select("url", F.explode("spans").alias("s")).select(
        "url", "s.field", "s.start", "s.end", "s.value"
    )
    staged = stage(spans, "sitemap_spans")
    return (
        staged.groupBy("url")
        .agg(
            F.count_if(F.col("field") == "loc").cast("int").alias("n_locs"),
            F.count_if(F.col("field") == "lastmod").cast("int").alias("n_lastmod"),
            F.count_if(F.col("field") == "changefreq").cast("int").alias("n_changefreq"),
            F.sum(F.when(F.col("field") == "loc", F.length("value")))
            .cast("long")
            .alias("loc_chars"),
            F.max("end").cast("int").alias("text_len"),
            F.min(F.when(F.col("field") == "lastmod", F.col("value"))).alias(
                "earliest_lastmod"
            ),
        )
        .orderBy("url")
    )


@q(
    "doc_para_dedup",
    f"""
    WITH corpus AS (SELECT url, text FROM read_parquet('{staged_glob("para_corpus")}')),
    split AS (SELECT url, string_split_regex(text, '\\n{{2,}}') AS ps FROM corpus),
    paras AS (
      SELECT url, CAST(i - 1 AS INT) AS idx, ps[i] AS para
      FROM (SELECT url, ps, unnest(generate_series(1, len(ps))) AS i FROM split)
      WHERE length(ps[i]) >= 1
    ),
    freq AS (
      SELECT md5(para) AS h FROM paras GROUP BY 1 HAVING COUNT(DISTINCT url) >= 3
    ),
    marked AS (
      SELECT p.url, p.idx, p.para, (f.h IS NOT NULL) AS rep
      FROM paras p LEFT JOIN freq f ON md5(p.para) = f.h
    )
    SELECT url,
           COALESCE(string_agg(CASE WHEN NOT rep THEN para END, chr(10) || chr(10)
                               ORDER BY idx), '') AS text,
           COUNT(CASE WHEN NOT rep THEN 1 END) AS n_kept,
           COUNT(CASE WHEN rep THEN 1 END) AS n_dropped
    FROM marked GROUP BY url ORDER BY url
    """,
)
def doc_para_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level repeated-span removal (RefinedWeb/Gopher line dedup)
    over the EXTRACTED corpus: site-wide license blurbs survive DOM
    boilerplate stripping because they are plain in-content text, so the
    curation layer removes any paragraph appearing verbatim in ≥3 distinct
    documents and rebuilds every doc's text in original order. The whole
    pipeline — split, md5 per paragraph, distinct-doc frequency, rebuild —
    is recomputed by the oracle from the staged extracted text, so the
    rebuilt corpus is verified byte-for-byte cross-engine."""
    from ocr_platform_spark.operators.extract import extract_documents

    ext = extract_documents(_synth_docs(spark)).select("url", "text").where(
        F.col("text").isNotNull()
    )
    staged = stage(ext, "para_corpus", partitions=2)
    return (
        dedup.strip_repeated_paragraphs(staged, "url", "text", min_df=3)
        .select("url", "text", "n_kept", "n_dropped")
        .orderBy("url")
    )


@q(
    "host_boilerplate_strip",
    r"""
    WITH raw AS (
      SELECT doc_id, source AS host,
        concat_ws(chr(10) || chr(10),
          'Home | About | Contact — ' || source,
          'Article ' || CAST(doc_id AS VARCHAR) || ': ' ||
            regexp_replace(substr(text, 1, 80), '\s+', ' ', 'g'),
          CASE WHEN doc_id % 2 = 0
               THEN 'Subscribe to the ' || source || ' newsletter.' END,
          CASE WHEN doc_id % 125 = 0
               THEN 'Creative Commons Attribution applies to this page.' END
        ) AS body
      FROM documents
    ),
    paras AS (
      SELECT host, doc_id, CAST(i - 1 AS INT) AS idx, ps[i] AS para
      FROM (SELECT host, doc_id, ps, unnest(generate_series(1, len(ps))) AS i
            FROM (SELECT host, doc_id, string_split_regex(body, '\n{2,}') AS ps
                  FROM raw))
      WHERE length(ps[i]) >= 1
    ),
    rep AS (
      SELECT host, md5(para) AS h
      FROM paras GROUP BY host, md5(para) HAVING COUNT(DISTINCT doc_id) >= 3
    ),
    marked AS (
      SELECT p.host, p.doc_id, p.idx, p.para, (r.h IS NOT NULL) AS is_rep
      FROM paras p LEFT JOIN rep r ON p.host = r.host AND md5(p.para) = r.h
    )
    SELECT host, doc_id,
           COALESCE(string_agg(CASE WHEN NOT is_rep THEN para END,
                               chr(10) || chr(10) ORDER BY idx), '') AS text,
           COUNT(CASE WHEN NOT is_rep THEN 1 END) AS n_kept,
           COUNT(CASE WHEN is_rep THEN 1 END) AS n_dropped
    FROM marked GROUP BY host, doc_id ORDER BY doc_id
    """,
)
def host_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOST-scoped boilerplate removal (operators/dedup.strip_host_
    boilerplate; the CCNet/trafilatura convention, vs doc_para_dedup's
    corpus-GLOBAL rule): a paragraph on ≥3 distinct pages of the SAME
    host is site furniture and is cut from that host's pages only. The
    deterministic bodies exercise all three regimes — a nav line on
    every page of its host (stripped), a newsletter line on every page
    of even hosts only (stripped there, absent elsewhere), and a
    license line on exactly one page of four different hosts: globally
    repeated (4×, which the global min_df=3 rule would strip) yet
    per-host unique, so the host rule KEEPS it. The oracle replays the
    split, per-(host, md5) distinct-page frequency and the in-order
    rebuild, verifying the surviving bytes exactly."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.concat_ws(
        "\n\n",
        F.concat(F.lit("Home | About | Contact — "), F.col("source")),
        F.concat(
            F.lit("Article "),
            did.cast("string"),
            F.lit(": "),
            F.regexp_replace(F.substring("text", 1, 80), r"\s+", " "),
        ),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("Subscribe to the "), F.col("source"), F.lit(" newsletter.")),
        ),
        F.when(
            did % 125 == 0,
            F.lit("Creative Commons Attribution applies to this page."),
        ),
    )
    docs = d.select(F.col("source").alias("host"), "doc_id", body.alias("body"))
    return (
        dedup.strip_host_boilerplate(docs, "doc_id", "body", "host", min_df=3)
        .select("host", "doc_id", "text", "n_kept", "n_dropped")
        .orderBy("doc_id")
    )


@q(
    "doc_chunk_plan",
    r"""
    WITH split AS (
      SELECT doc_id, string_split_regex(text, '\n{2,}') AS ps FROM documents
    ),
    paras AS (
      SELECT doc_id, CAST(i - 1 AS INT) AS idx, ps[i] AS para
      FROM (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i FROM split)
      WHERE length(ps[i]) >= 1
    ),
    toks AS (
      SELECT doc_id, idx, para,
             CAST(len(list_filter(string_split_regex(para, '\s+'), x -> x <> ''))
                  AS BIGINT) AS tok
      FROM paras
    ),
    cum AS (
      SELECT doc_id, idx, para, tok,
             COALESCE(SUM(tok) OVER (PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM toks
    )
    SELECT doc_id,
           CAST(cum_before // 40 AS INT) AS chunk_id,
           string_agg(para, chr(10) || chr(10) ORDER BY idx) AS text,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(MIN(idx) AS INT) AS start_idx
    FROM cum GROUP BY doc_id, cum_before // 40
    ORDER BY doc_id, chunk_id
    """,
)
def doc_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-boundary chunking under a 40-token budget
    (operators/chunking.chunk_paragraphs) — the segmentation pass between
    extraction and encoding that re-cuts long pages for fixed-window
    encoders without splitting mid-paragraph. Chunk assignment is
    cumulative-offset bucketing (paragraph joins chunk
    ``tokens_before div budget``): one doc-partitioned window cumsum
    decides every boundary, so the oracle replays the whole plan — split,
    whitespace token count, cumsum, integer-div bucketing, in-order
    rejoin — and the chunk text is verified byte-for-byte cross-engine."""
    from ocr_platform_spark.operators.chunking import chunk_paragraphs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        chunk_paragraphs(d, "doc_id", "text", budget_tokens=40)
        .select("doc_id", "chunk_id", "text", "n_paras", "n_tokens", "start_idx")
        .orderBy("doc_id", "chunk_id")
    )


@q(
    "doc_chunk_overlap",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
      FROM documents
    ),
    t AS (SELECT doc_id, words, len(words) AS n_tok FROM w),
    n AS (
      SELECT doc_id, words, n_tok,
             CASE WHEN n_tok <= 64 THEN 1
                  ELSE (n_tok - 64 + 47) // 48 + 1 END AS n_chunks
      FROM t
    ),
    c AS (
      SELECT doc_id, words, n_tok,
             unnest(generate_series(0, n_chunks - 1)) AS cid
      FROM n
    )
    SELECT doc_id, CAST(cid AS INT) AS chunk_id,
           CAST(cid * 48 AS BIGINT) AS start_tok,
           CAST(least(cid * 48 + 64, n_tok) AS BIGINT) AS end_tok,
           CAST(least(cid * 48 + 64, n_tok) - cid * 48 AS BIGINT) AS n_tokens,
           array_to_string(words[cid * 48 + 1 : least(cid * 48 + 64, n_tok)], ' ')
             AS body
    FROM c ORDER BY doc_id, chunk_id
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAPPING sliding token windows (operators/chunking.
    sliding_token_windows; size 64, overlap 16 → stride 48) — the
    RAG/embedding-model segmentation, vs doc_chunk_plan's disjoint
    paragraph buckets: every boundary sentence lands in two consecutive
    windows so retrieval can't fall into a chunk gap, and the trailing
    partial window is emitted clamped, never dropped. Window count,
    token offsets and the window text itself are pure integer/array
    math, so the oracle replays every boundary and verifies the chunk
    bytes exactly."""
    from ocr_platform_spark.operators.chunking import sliding_token_windows

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        sliding_token_windows(d, "doc_id", "text", size=64, overlap=16)
        .orderBy("doc_id", "chunk_id")
    )


@q(
    "extract_per_host",
    f"""
    SELECT host, COUNT(*) AS n_docs, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
    FROM read_parquet('{staged_glob("extract_per_host")}')
    GROUP BY host ORDER BY n_docs DESC, host
    """,
)
def extract_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-aware per-host rollup. The (url, host, n_bytes) projection is
    staged; Spark then runs the hot-host-salted two-phase aggregation while
    the oracle runs a plain GROUP BY over the same rows — a genuine
    cross-engine proof that salting + re-aggregation preserves exact
    per-key totals."""
    from ocr_platform_spark.operators.partitioning import (
        detect_hot_hosts,
        host_of,
        per_host_stats,
    )

    docs = _synth_docs(spark)
    base = docs.select(
        "url",
        host_of("url").alias("host"),
        F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("n_bytes"),
    )
    staged = stage(base, "extract_per_host", partitions=4)
    hot = detect_hot_hosts(staged, threshold_fraction=0.05)
    return per_host_stats(staged, hot, size=F.col("n_bytes"))


#: Sitemap metadata spans carry the owning <loc> line's OFFSETS and their
#: own value (the typed view the flat text cannot hold —
#: kernels/sitemap_extract.py module docstring); every other field is a
#: byte-exact substring pointer.
_TYPED_SPAN_FIELDS = ("lastmod", "changefreq", "priority")


@q(
    "extract_span_audit",
    f"""
    WITH s AS (SELECT * FROM read_parquet('{staged_glob("span_rows")}')),
    t AS (SELECT * FROM read_parquet('{staged_glob("span_texts")}')),
    ptr AS (
      SELECT url, span_idx, field, start, "end", value FROM s
      WHERE field NOT IN {_TYPED_SPAN_FIELDS!r}
    ),
    pj AS (
      SELECT p.field,
             (substr(t.text, p.start + 1, p."end" - p.start) = p.value
              AND p.start >= COALESCE(
                LAG(p."end") OVER (PARTITION BY p.url ORDER BY p.span_idx), 0))
               AS ok
      FROM ptr p JOIN t USING (url)
    ),
    tj AS (
      SELECT ty.field, (l.url IS NOT NULL) AS ok
      FROM (SELECT url, field, start, "end" FROM s
            WHERE field IN {_TYPED_SPAN_FIELDS!r}) ty
      LEFT JOIN (SELECT DISTINCT url, start, "end" FROM s WHERE field = 'loc') l
        ON ty.url = l.url AND ty.start = l.start AND ty."end" = l."end"
    )
    SELECT field, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
    FROM (SELECT * FROM pj UNION ALL SELECT * FROM tj)
    GROUP BY field ORDER BY field
    """,
)
def extract_span_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-span CONTRACT audit — the north rule emits (text, spans)
    per url; this query proves the whole contract in both engines.
    Pointer spans (html blocks, pdf lines, feed entries, sitemap locs):
    ``substr(text, start+1, end-start) = value`` AND ascending
    non-overlapping offsets per document. Typed sitemap metadata spans
    (lastmod/changefreq/priority) deliberately alias their owning loc
    line's offsets (the kernel's documented typed-view rule), so their
    check is that the offsets match a loc span of the same document
    exactly. The exploded span rows and per-doc texts are staged; the
    per-field rollup must show n_ok = n_spans everywhere (pinned by
    tests/test_extraction.py::test_span_audit_all_ok). Scale shape:
    extraction's mapInArrow pass + one field-keyed aggregation; the
    window runs per document over its handful of spans."""
    from ocr_platform_spark.operators.extract import extract_documents

    ext = extract_documents(_synth_docs(spark)).where(F.size("spans") > 0)
    spans = stage(
        ext.select(
            "url", F.posexplode("spans").alias("span_idx", "sp")
        ).select(
            "url",
            "span_idx",
            F.col("sp.field").alias("field"),
            F.col("sp.start").alias("start"),
            F.col("sp.end").alias("end"),
            F.col("sp.value").alias("value"),
        ),
        "span_rows",
        partitions=4,
    )
    texts = stage(ext.select("url", "text"), "span_texts", partitions=2)
    typed = F.col("field").isin(*_TYPED_SPAN_FIELDS)
    w = Window.partitionBy("url").orderBy("span_idx")
    pj = (
        spans.where(~typed)
        .withColumn("prev_end", F.coalesce(F.lag("end").over(w), F.lit(0)))
        .join(texts, "url")
        .select(
            "field",
            (
                (F.expr("substr(text, start + 1, end - start)") == F.col("value"))
                & (F.col("start") >= F.col("prev_end"))
            ).alias("ok"),
        )
    )
    locs = (
        spans.where(F.col("field") == "loc")
        .select(
            F.col("url").alias("_lu"),
            F.col("start").alias("_ls"),
            F.col("end").alias("_le"),
        )
        .distinct()
    )
    tj = (
        spans.where(typed)
        .select("url", "field", "start", "end")
        .join(
            locs,
            (F.col("url") == F.col("_lu"))
            & (F.col("start") == F.col("_ls"))
            & (F.col("end") == F.col("_le")),
            "left",
        )
        .select("field", F.col("_lu").isNotNull().alias("ok"))
    )
    return (
        pj.unionByName(tj)
        .groupBy("field")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_ok"),
        )
        .orderBy("field")
    )


@q(
    "extract_lineage_audit",
    f"""
    WITH s AS (SELECT * FROM read_parquet('{staged_glob("lineage_docs")}'))
    SELECT partition_id, CAST(COUNT(*) AS BIGINT) AS input_count,
           CAST(SUM(input_bytes) AS BIGINT) AS input_bytes
    FROM s GROUP BY partition_id
    UNION ALL
    SELECT -1, CAST(COUNT(*) AS BIGINT), CAST(SUM(input_bytes) AS BIGINT) FROM s
    ORDER BY partition_id
    """,
)
def extract_lineage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition LINEAGE rollup, oracle-replayed — the north rule's
    resumability bookkeeping (partition id, input count, bytes) recomputed
    by an independent engine from the staged per-document rows, with a
    grand-total row (partition_id = -1) making the "lineage sums to the
    corpus" invariant visible in the data itself. The Spark side is the
    same one hash aggregate ``lineage_from_extracted`` runs (map-side
    combinable, partition-count-sized result)."""
    from ocr_platform_spark.operators.extract import extract_documents
    from ocr_platform_spark.operators.partitioning import (
        repartition_for_extraction,
    )

    ext = extract_documents(
        repartition_for_extraction(_synth_docs(spark), 8)
    )
    docs = stage(
        ext.select("url", "partition_id", "input_bytes"), "lineage_docs", partitions=4
    )
    per_part = docs.groupBy("partition_id").agg(
        F.count("*").cast("long").alias("input_count"),
        F.sum("input_bytes").cast("long").alias("input_bytes"),
    )
    total = docs.agg(
        F.lit(-1).cast("int").alias("partition_id"),
        F.count("*").cast("long").alias("input_count"),
        F.sum("input_bytes").cast("long").alias("input_bytes"),
    )
    return per_part.unionByName(total).orderBy("partition_id")


@q(
    "extract_dom_stats",
    f"""
    WITH s AS (SELECT * FROM read_parquet('{staged_glob("dom_stats")}'))
    SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tags) AS BIGINT) AS total_tags,
           CAST(SUM(n_links) AS BIGINT) AS total_links,
           CAST(SUM(n_blocks) AS BIGINT) AS total_blocks,
           CAST(MAX(max_depth) AS INT) AS deepest,
           CAST(SUM(n_chars_text) AS BIGINT) AS total_text_chars,
           CAST(SUM(n_chars_raw) AS BIGINT) AS total_raw_chars,
           (SUM(n_chars_text) * 2 < SUM(n_chars_raw)) AS markup_heavy
    FROM s
    WHERE n_chars_raw > 0
    GROUP BY host ORDER BY host
    """,
)
def extract_dom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM-structure profile of the crawl (kernels/dom_stats.py) — the
    structural quality features host-level models consume: tag/link/block
    counts, nesting depth, and the text-to-markup ratio, rolled up per
    host. The per-document kernel integers are staged (the kernel itself
    is pinned by goldens + fuzz in tests/test_dom_stats.py); BOTH engines
    derive the host from the url and aggregate the same rows, including
    the ``markup_heavy`` flag (text is less than half the decoded bytes —
    all-integer, no float ratio drift). Scale shape: one mapInArrow pass
    + one host-keyed map-side-combinable aggregation; non-HTML payloads
    are all-zeros rows excluded by the n_chars_raw > 0 gate in both
    engines."""
    from ocr_platform_spark.operators.extract import dom_stats_df

    stats = dom_stats_df(_synth_docs(spark))
    staged = stage(stats, "dom_stats", partitions=4)
    host = F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host")
    return (
        staged.where(F.col("n_chars_raw") > 0)
        .groupBy(host)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tags").cast("long").alias("total_tags"),
            F.sum("n_links").cast("long").alias("total_links"),
            F.sum("n_blocks").cast("long").alias("total_blocks"),
            F.max("max_depth").cast("int").alias("deepest"),
            F.sum("n_chars_text").cast("long").alias("total_text_chars"),
            F.sum("n_chars_raw").cast("long").alias("total_raw_chars"),
            (F.sum("n_chars_text") * 2 < F.sum("n_chars_raw")).alias(
                "markup_heavy"
            ),
        )
        .orderBy("host")
    )


@q(
    "process_template_fields",
    f"""
    SELECT field_name, COUNT(*) AS n_rows, COUNT(conversion_error) AS n_errors
    FROM read_parquet('{staged_glob("process_template_fields")}')
    GROUP BY field_name ORDER BY field_name
    """,
)
def process_template_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship flow end-to-end: extract → template join →
    convert_by_type → SELECT mapping → per-field result tallies. Result rows
    staged; tallies oracle-checked (full metadata contract pinned in
    tests/test_process_documents.py)."""
    from ocr_platform_spark.operators.extract import extract_documents
    from ocr_platform_spark.plans.process_documents import (
        TEMPLATE_FIELDS_DDL,
        process_extracted,
    )

    template = spark.createDataFrame(
        [
            ("PAGE_TITLE", "h1", 0, "text", 1),
            ("FIRST_PARAGRAPH", "p", 0, "text", 2),
            ("TITLE_AS_NUMBER", "h1", 0, "number", 3),
            ("BULLET_POINTS", "li", 0, "table", 4),
        ],
        TEMPLATE_FIELDS_DDL,
    )
    rows = process_extracted(extract_documents(_synth_docs(spark)), template)
    staged = stage(
        rows.select("url", "field_name", "value", "conversion_error"),
        "process_template_fields",
    )
    return (
        staged.groupBy("field_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("conversion_error").alias("n_errors"),
        )
        .orderBy("field_name")
    )


@q(
    "media_metadata_rollup",
    f"""
    SELECT mime, category, COUNT(*) AS n_files,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           COUNT(width) AS n_with_dims,
           COUNT(sample_rate) AS n_with_audio_meta
    FROM read_parquet('{staged_glob("media_metadata_rollup")}')
    GROUP BY mime, category ORDER BY mime
    """,
)
def media_metadata_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary columns: magic-byte sniff + header-metadata kernel
    over the synthetic media corpus, staged per-file, rolled up per
    (mime, category) in both engines (parser goldens in
    tests/test_multimodal.py)."""
    from ocr_platform_spark.operators.multimodal import (
        extract_media_metadata,
        media_corpus,
    )

    meta = stage(
        extract_media_metadata(media_corpus(spark, 120)), "media_metadata_rollup"
    )
    return (
        meta.groupBy("mime", "category")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.count("width").alias("n_with_dims"),
            F.count("sample_rate").alias("n_with_audio_meta"),
        )
        .orderBy("mime")
    )


@q(
    "extract_html_tables",
    f"""
    SELECT column_name, COUNT(*) AS n_cells
    FROM read_parquet('{staged_glob("extract_html_tables")}')
    GROUP BY column_name ORDER BY column_name
    """,
)
def extract_html_tables_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column <table> extraction (reference TABLE/sub-field shape):
    cells EAV staged, per-column tallies oracle-checked (typed-conversion
    goldens in tests/test_tables.py)."""
    from ocr_platform_spark.operators.tables import extract_tables, table_cells_eav

    pages = [
        (
            f"https://tbl.example.org/{k}",
            None,
            (
                "<html><body><table><tr><th>ITEM</th><th>QTY</th><th>PRICE</th></tr>"
                + "".join(
                    f"<tr><td>item {k}-{i}</td><td>{i}</td><td>${i}.50</td></tr>"
                    for i in range(2 + k % 4)
                )
                + "</table></body></html>"
            ).encode(),
            None,
            "en",
        )
        for k in range(50)
    ]
    docs = spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cells = stage(table_cells_eav(extract_tables(docs)), "extract_html_tables")
    return (
        cells.groupBy("column_name")
        .agg(F.count("*").alias("n_cells"))
        .orderBy("column_name")
    )


@q(
    "extract_eav_view",
    f"""
    SELECT field_name, COUNT(*) AS n_values
    FROM read_parquet('{staged_glob("extract_eav_view")}')
    GROUP BY field_name ORDER BY field_name
    """,
)
def extract_eav_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide nested extraction → EAV view (V1 unpivot, staged) → field tally
    aggregated by both engines."""
    from ocr_platform_spark.operators.eav import unpivot_extracted
    from ocr_platform_spark.operators.extract import extract_documents

    eav = stage(
        unpivot_extracted(extract_documents(_synth_docs(spark))).select(
            "url", "field_name", "row_index", "predicted_value"
        ),
        "extract_eav_view",
    )
    return (
        eav.groupBy("field_name")
        .agg(F.count("*").alias("n_values"))
        .orderBy("field_name")
    )


# =========================================================================
# Correction overlay (J5 MERGE-on-read), OR-key lookup (J7), keyword
# dispatch (P10), blocklist (P11) — the reference's write/lookup lifecycle
# =========================================================================


@q(
    "corrected_field_values",
    """
    WITH eav AS (
      SELECT CAST(doc_id AS VARCHAR) AS url, 'LANG' AS field_name,
             lang AS predicted_value FROM documents
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR), 'SOURCE', source FROM documents
    ),
    corr AS (
      SELECT CAST(doc_id AS VARCHAR) AS url, 'LANG' AS field_name,
             UPPER(lang) AS corrected_value,
             TIMESTAMP '2024-01-01' AS corrected_at
      FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR), 'LANG', 'xx',
             TIMESTAMP '2024-02-01'
      FROM documents WHERE doc_id % 40 = 0
    ),
    latest AS (
      SELECT url, field_name, corrected_value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY url, field_name
          ORDER BY corrected_at DESC, corrected_value DESC) AS rn
        FROM corr) t WHERE rn = 1
    )
    SELECT e.url, e.field_name,
           COALESCE(l.corrected_value, e.predicted_value) AS value
    FROM eav e LEFT JOIN latest l USING (url, field_name)
    ORDER BY url, field_name
    """,
)
def corrected_field_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 correction lifecycle, oracle-checked end-to-end: EAV rows +
    an append-only correction log → latest-wins overlay → canonical value
    (``apply_corrections`` + ``canonical_value``; reference
    document_routes.py:487-533 write, :416-446 read)."""
    from ocr_platform_spark.operators.corrections import apply_corrections
    from ocr_platform_spark.operators.eav import canonical_value

    d = _t(spark, sf_dir, "documents")
    url = F.col("doc_id").cast("string").alias("url")
    eav = (
        d.select(url, F.lit("LANG").alias("field_name"), F.col("lang").alias("predicted_value"))
        .unionByName(
            d.select(url, F.lit("SOURCE").alias("field_name"), F.col("source").alias("predicted_value"))
        )
        .withColumn("row_index", F.lit(None).cast("int"))
        .withColumn("column_name", F.lit(None).cast("string"))
        .withColumn("actual_value", F.lit(None).cast("string"))
    )
    corr = (
        d.where(F.col("doc_id") % 20 == 0)
        .select(
            url,
            F.lit("LANG").alias("field_name"),
            F.lit(None).cast("int").alias("row_index"),
            F.lit(None).cast("string").alias("column_name"),
            F.upper("lang").alias("corrected_value"),
            F.lit("2024-01-01").cast("timestamp").alias("corrected_at"),
        )
        .unionByName(
            d.where(F.col("doc_id") % 40 == 0).select(
                url,
                F.lit("LANG").alias("field_name"),
                F.lit(None).cast("int").alias("row_index"),
                F.lit(None).cast("string").alias("column_name"),
                F.lit("xx").alias("corrected_value"),
                F.lit("2024-02-01").cast("timestamp").alias("corrected_at"),
            )
        )
    )
    return (
        apply_corrections(eav, corr)
        .select("url", "field_name", canonical_value().alias("value"))
        .orderBy("url", "field_name")
    )


@q(
    "ledger_or_alias_lookup",
    """
    WITH dim AS (
      SELECT c_custkey AS ledger_key, c_name AS name,
             'AL-' || CAST(c_custkey AS VARCHAR) AS alias
      FROM customer
    ),
    probes AS (
      SELECT c_custkey AS probe_id,
             CASE CAST(c_custkey % 3 AS INT)
               WHEN 0 THEN UPPER(c_name)
               WHEN 1 THEN '  al-' || CAST(c_custkey AS VARCHAR) || ' '
               ELSE 'no-such-ledger-' || CAST(c_custkey AS VARCHAR)
             END AS probe
      FROM customer
    )
    SELECT p.probe_id, p.probe, d.ledger_key, d.name
    FROM probes p LEFT JOIN dim d
      ON LOWER(TRIM(p.probe)) = LOWER(TRIM(d.name))
      OR LOWER(TRIM(p.probe)) = LOWER(TRIM(d.alias))
    ORDER BY p.probe_id
    """,
)
def ledger_or_alias_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: case-insensitive name-OR-alias dimension lookup (the reference's
    ledger search, ``app/tally/data_retrieval.py:184-217``). The OR-of-two-
    equalities predicate has no hash-join form — with a broadcast dimension
    it executes as BroadcastNestedLoopJoin, the correct plan for a tiny dim
    at any fact scale."""
    c = _t(spark, sf_dir, "customer")
    dim = c.select(
        F.col("c_custkey").alias("ledger_key"),
        F.col("c_name").alias("name"),
        F.concat(F.lit("AL-"), F.col("c_custkey").cast("string")).alias("alias"),
    )
    probes = c.select(
        F.col("c_custkey").alias("probe_id"),
        F.when(F.pmod("c_custkey", F.lit(3)) == 0, F.upper("c_name"))
        .when(
            F.pmod("c_custkey", F.lit(3)) == 1,
            F.concat(F.lit("  al-"), F.col("c_custkey").cast("string"), F.lit(" ")),
        )
        .otherwise(F.concat(F.lit("no-such-ledger-"), F.col("c_custkey").cast("string")))
        .alias("probe"),
    )
    norm = lambda col: F.lower(F.trim(col))  # noqa: E731
    return (
        probes.join(
            F.broadcast(dim),
            (norm(F.col("probe")) == norm(F.col("name")))
            | (norm(F.col("probe")) == norm(F.col("alias"))),
            "left",
        )
        .select("probe_id", "probe", "ledger_key", "name")
        .orderBy("probe_id")
    )


#: P11 — the reference's document-specific fields that must never auto-load
#: dimension options (``app/tally/tally_field_options.py:371-407``).
NON_TALLY_FIELDS = [
    "invoice_number", "po_number", "challan_number", "eway_bill_number",
    "voucher_reference", "lr_number", "vehicle_number", "invoice_date",
    "due_date", "challan_date", "eway_bill_date", "quantity", "unit_price",
    "line_total", "total_amount", "subtotal", "gst_rate", "cgst_rate",
    "sgst_rate", "igst_rate", "taxable_value", "cgst_amount", "sgst_amount",
    "igst_amount", "hsn_code", "sac_code", "vendor_gstin", "customer_gstin",
    "vendor_pan", "customer_pan", "ifsc_code", "upi_id",
]

_FIELD_NAME_CYCLE = [
    "vendor_name", "customer_name", "item_description", "unit_of_measure",
    "company_name", "invoice_number", "total_amount", "supplier_name",
    "stock_item_name", "uom", "place_of_supply", "quantity",
]


def _synth_field_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic field-name probe set derived from the part table."""
    p = _t(spark, sf_dir, "part")
    cyc = F.element_at(
        F.array(*[F.lit(s) for s in _FIELD_NAME_CYCLE]),
        (F.pmod("p_partkey", F.lit(len(_FIELD_NAME_CYCLE))) + 1).cast("int"),
    )
    return p.select(F.col("p_partkey").alias("field_id"), cyc.alias("field_name_str"))


def _field_cycle_sql() -> str:
    whens = "\n".join(
        f"        WHEN {i} THEN '{s}'" for i, s in enumerate(_FIELD_NAME_CYCLE)
    )
    return (
        "SELECT p_partkey AS field_id,\n"
        "       CASE CAST(p_partkey % 12 AS INT)\n"
        f"{whens}\n"
        "       END AS field_name_str\n"
        "FROM part"
    )


@q(
    "field_option_dispatch",
    f"""
    WITH fields AS ({_field_cycle_sql()})
    SELECT
      CASE
        WHEN (field_name_str LIKE '%vendor%' OR field_name_str LIKE '%supplier%'
              OR field_name_str LIKE '%creditor%')
             AND field_name_str LIKE '%name%' THEN 'ledgers:Sundry Creditors'
        WHEN (field_name_str LIKE '%customer%' OR field_name_str LIKE '%client%'
              OR field_name_str LIKE '%debtor%')
             AND field_name_str LIKE '%name%' THEN 'ledgers:Sundry Debtors'
        WHEN (field_name_str LIKE '%item%' OR field_name_str LIKE '%product%'
              OR field_name_str LIKE '%stock%')
             AND (field_name_str LIKE '%description%' OR field_name_str LIKE '%name%')
          THEN 'stock_items'
        WHEN field_name_str LIKE '%unit%' OR field_name_str LIKE '%uom%'
             OR field_name_str LIKE '%measure%' THEN 'units'
        WHEN field_name_str LIKE '%company%' AND field_name_str LIKE '%name%'
          THEN 'companies'
        ELSE 'skip:no_mapping_defined'
      END AS route,
      COUNT(*) AS n_fields
    FROM fields
    GROUP BY route
    ORDER BY route
    """,
)
def field_option_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: the keyword-dispatch CASE routing field names to option loaders
    (``app/tally/tally_field_options.py:473-496``) — ordered keyword checks,
    first match wins, default = skip."""
    fields = _synth_field_names(spark, sf_dir)
    s = F.col("field_name_str")
    has = lambda *kws: F.greatest(*[s.contains(k) for k in kws]) if len(kws) > 1 else s.contains(kws[0])  # noqa: E731
    route = (
        F.when(has("vendor", "supplier", "creditor") & s.contains("name"), "ledgers:Sundry Creditors")
        .when(has("customer", "client", "debtor") & s.contains("name"), "ledgers:Sundry Debtors")
        .when(has("item", "product", "stock") & (s.contains("description") | s.contains("name")), "stock_items")
        .when(has("unit", "uom", "measure"), "units")
        .when(s.contains("company") & s.contains("name"), "companies")
        .otherwise("skip:no_mapping_defined")
    )
    return (
        fields.select(route.alias("route"))
        .groupBy("route")
        .agg(F.count("*").alias("n_fields"))
        .orderBy("route")
    )


@q(
    "blocklist_filter",
    f"""
    WITH fields AS ({_field_cycle_sql()})
    SELECT field_id, field_name_str
    FROM fields
    WHERE field_name_str NOT IN ({", ".join(f"'{s}'" for s in NON_TALLY_FIELDS)})
    ORDER BY field_id
    """,
)
def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: the non-Tally-field blocklist (~isin over the 32 document-
    specific names, ``tally_field_options.py:371-407``) — fields allowed to
    auto-load dimension options."""
    fields = _synth_field_names(spark, sf_dir)
    return (
        fields.where(~F.col("field_name_str").isin(NON_TALLY_FIELDS))
        .orderBy("field_id")
    )


@q(
    "process_table_subfields",
    f"""
    SELECT column_name, data_type, COUNT(*) AS n_cells,
           COUNT(conversion_error) AS n_errors,
           COUNT(mapped_value) AS n_mapped
    FROM read_parquet('{staged_glob("process_table_subfields")}')
    GROUP BY column_name, data_type ORDER BY column_name
    """,
)
def process_table_subfields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column TABLE fields end-to-end (ocr_routes.py:620-698): HTML
    table kernel → cells EAV → sub-field binding join → per-column typed
    conversion → per-sub-field SELECT mapping → per-column tallies over the
    staged result rows, aggregated by both engines (value-level goldens in
    tests/test_process_documents.py)."""
    from ocr_platform_spark.operators.tables import extract_tables, table_cells_eav
    from ocr_platform_spark.plans.process_documents import (
        SUB_FIELDS_DDL,
        process_table_fields,
    )

    pages = [
        (
            f"https://inv.example.org/{k}",
            None,
            (
                "<html><body><table>"
                "<tr><th>ITEM</th><th>QTY</th><th>PRICE</th><th>STATUS</th></tr>"
                + "".join(
                    f"<tr><td>part {k}-{i}</td><td>{i if (k + i) % 5 else 'bad'}</td>"
                    f"<td>${i}.25</td><td>{'shiped' if i % 2 else 'Delivered'}</td></tr>"
                    for i in range(2 + k % 3)
                )
                + "</table></body></html>"
            ).encode(),
            None,
            "en",
        )
        for k in range(40)
    ]
    docs = spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    sub_fields = spark.createDataFrame(
        [
            ("LINE_ITEMS", "ITEM", "text", 1),
            ("LINE_ITEMS", "QTY", "integer", 2),
            ("LINE_ITEMS", "PRICE", "currency", 3),
            ("LINE_ITEMS", "STATUS", "select", 4),
        ],
        SUB_FIELDS_DDL,
    )
    options = spark.createDataFrame(
        [
            ("STATUS", "SHIPPED", "shipped"),
            ("STATUS", "DELIVERED", "delivered"),
        ],
        "column_name string, option_value string, option_label string",
    )
    rows = process_table_fields(table_cells_eav(extract_tables(docs)), sub_fields, options)
    staged = stage(
        rows.select(
            "url", "row_index", "column_name", "data_type",
            "conversion_error", "mapped_value",
        ),
        "process_table_subfields",
    )
    return (
        staged.groupBy("column_name", "data_type")
        .agg(
            F.count("*").alias("n_cells"),
            F.count("conversion_error").alias("n_errors"),
            F.count("mapped_value").alias("n_mapped"),
        )
        .orderBy("column_name")
    )


#: MinHash estimator recomputed in SQL: fraction of equal signature
#: components (k=16, DuckDB lists are 1-indexed). Every value is a multiple
#: of 1/16 — exactly representable, so round(x, 6) agrees bit-for-bit.
_EST_JACCARD_SQL = "round((" + " + ".join(
    f"CASE WHEN a.sig[{i}] = b.sig[{i}] THEN 1 ELSE 0 END" for i in range(1, 17)
) + ") / 16.0, 6)"


@q(
    "incremental_minhash_pairs",
    f"""
    WITH s AS (SELECT * FROM read_parquet('{staged_glob("inc_sigs")}')),
    p AS (SELECT * FROM read_parquet('{staged_glob("inc_pairs")}'))
    SELECT p.id_a, p.id_b, {_EST_JACCARD_SQL} AS est_jaccard
    FROM p JOIN s a ON p.id_a = a.id JOIN s b ON p.id_b = b.id
    ORDER BY p.id_a, p.id_b
    """,
)
def incremental_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup over a growing corpus (SignatureStore): batch 1
    commits signatures, batch 2 ingests only new ids and pairs new×all —
    estimator-verified with no text re-read. The committed signature table
    and the emitted pairs are staged; the oracle independently recomputes
    the MinHash Jaccard estimate per pair from the signatures (candidate
    *generation* invariants live in tests/test_incremental_dedup.py)."""
    import tempfile

    from ocr_platform_spark.operators.incremental_dedup import (
        SignatureStore,
        incremental_near_duplicates,
    )

    d = _t(spark, sf_dir, "documents")
    store = SignatureStore(tempfile.mkdtemp(prefix="incdedup-"), k=16)
    half = d.agg(F.max("doc_id")).first()[0] // 2
    store.ingest(d.where(F.col("doc_id") <= half), "doc_id", "text", run_id="b1")
    new_sigs = store.ingest(d.where(F.col("doc_id") > half), "doc_id", "text", run_id="b2")
    pairs = incremental_near_duplicates(store, new_sigs, threshold=0.5)
    stage(store.signatures(spark), "inc_sigs", partitions=4)
    return stage(pairs, "inc_pairs").orderBy("id_a", "id_b")


@q(
    "dimension_as_of_lookup",
    """
    WITH v1 AS (SELECT n_nationkey AS dim_key, n_name AS name FROM nation),
    v2 AS (SELECT n_nationkey AS dim_key,
                  CASE WHEN n_nationkey % 2 = 0 THEN n_name || ' LTD' ELSE n_name END AS name
           FROM nation)
    SELECT c.c_custkey, a.name AS name_asof, l.name AS name_latest
    FROM customer c
    JOIN v1 a ON c.c_nationkey = a.dim_key
    JOIN v2 l ON c.c_nationkey = l.dim_key
    ORDER BY c.c_custkey
    """,
)
def dimension_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 ERP dimension source end-to-end: two full dimension pulls synced
    into a DimensionStore (v1 effective Jan, v2 — with renamed even-keyed
    rows — effective Jun), then a fact join against BOTH ``as_of(March)``
    (must resolve to v1) and ``latest()`` (must resolve to v2). The oracle
    recomputes both versions analytically, so a wrong version pick (union,
    off-by-one on the effective-ts cut, stale latest) hash-mismatches."""
    import tempfile
    from datetime import datetime, timezone

    from ocr_platform_spark.sources.dimensions import DimensionStore

    n = _t(spark, sf_dir, "nation")
    v1 = n.select(F.col("n_nationkey").alias("dim_key"), F.col("n_name").alias("name"))
    v2 = n.select(
        F.col("n_nationkey").alias("dim_key"),
        F.when(
            F.pmod("n_nationkey", F.lit(2)) == 0, F.concat("n_name", F.lit(" LTD"))
        )
        .otherwise(F.col("n_name"))
        .alias("name"),
    )
    store = DimensionStore(tempfile.mkdtemp(prefix="dimstore-"))
    store.sync(v1, "v1", effective_ts=datetime(2024, 1, 1, tzinfo=timezone.utc))
    store.sync(v2, "v2", effective_ts=datetime(2024, 6, 1, tzinfo=timezone.utc))
    asof = store.as_of(spark, datetime(2024, 3, 1, tzinfo=timezone.utc))
    latest = store.latest(spark)
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(
            F.broadcast(asof.select("dim_key", F.col("name").alias("name_asof"))),
            c.c_nationkey == F.col("dim_key"),
        )
        .drop("dim_key")
        .join(
            F.broadcast(latest.select("dim_key", F.col("name").alias("name_latest"))),
            c.c_nationkey == F.col("dim_key"),
        )
        .select("c_custkey", "name_asof", "name_latest")
        .orderBy("c_custkey")
    )


@q(
    "doc_containment_pairs",
    f"""
    WITH p AS (SELECT * FROM read_parquet('{staged_glob("contain_postings")}')),
    capped AS (
      SELECT id, fp FROM (
        SELECT id, fp, COUNT(*) OVER (PARTITION BY fp) AS _df FROM p
      ) WHERE _df <= 64
    ),
    sized AS (
      SELECT id, fp, COUNT(*) OVER (PARTITION BY id) AS n_fp FROM capped
    ),
    agg AS (
      SELECT a.id AS id_a, b.id AS id_b, a.n_fp AS n_fp_a, b.n_fp AS n_fp_b,
             COUNT(*) AS n_shared
      FROM sized a JOIN sized b ON a.fp = b.fp AND a.id < b.id
      GROUP BY 1, 2, 3, 4
      HAVING COUNT(*) >= 2
    ),
    directed AS (
      SELECT id_a AS id_in, id_b AS id_out, n_shared, n_fp_a AS n_fp_in,
             n_fp_b AS n_fp_out FROM agg
      UNION ALL
      SELECT id_b, id_a, n_shared, n_fp_b, n_fp_a FROM agg
    )
    SELECT id_in, id_out, CAST(n_shared AS BIGINT) AS n_shared,
           CAST(n_fp_in AS BIGINT) AS n_fp_in,
           CAST(n_fp_out AS BIGINT) AS n_fp_out,
           round(CAST(n_shared AS DOUBLE) / n_fp_in, 6) AS containment
    FROM directed
    WHERE round(CAST(n_shared AS DOUBLE) / n_fp_in, 6) >= 0.8
    ORDER BY id_in, id_out
    """,
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-CONTAINMENT detection (operators/dedup.winnow_
    containment_pairs): documents whose winnowing fingerprints are ≥ 80%
    a subset of another document's — the syndication/quote-inclusion/
    page-wraps-article signal that symmetric Jaccard dilutes away. The
    xxhash64 fingerprint postings are staged; BOTH engines replay the
    frequency cap (pure aggregate predicate — no row_number truncation),
    the unordered-pair aggregate, the two directed projections, and the
    containment threshold."""
    d = _t(spark, sf_dir, "documents")
    posts = stage(
        dedup.winnow_fp_postings(d, "doc_id", "text"), "contain_postings", partitions=4
    )
    return dedup.winnow_containment_pairs(
        posts, min_shared=2, max_df=64, min_containment=0.8
    ).orderBy("id_in", "id_out")


@q(
    "doc_containment_strip",
    f"""
    WITH pr AS (SELECT * FROM read_parquet('{staged_glob("cstrip_pairs")}')),
    op AS (SELECT * FROM read_parquet('{staged_glob("cstrip_outer_posts")}')),
    ih AS (SELECT * FROM read_parquet('{staged_glob("cstrip_inner_hs")}')),
    m AS (
      SELECT DISTINCT op.id, op.pos
      FROM op JOIN pr ON pr.id_out = op.id
              JOIN ih ON ih.id_in = pr.id_in AND ih.h = op.h
    ),
    pe AS (
      SELECT id, pos,
             MAX(pos + 30) OVER (
               PARTITION BY id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM m
    ),
    i AS (
      SELECT id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM pe
    ),
    spans AS (
      SELECT id, MIN(pos) AS span_start, MAX(pos) + 30 AS span_end
      FROM i GROUP BY id, island
    ),
    docs AS (
      SELECT d.doc_id AS id, d.text FROM documents d
      JOIN (SELECT DISTINCT id_out FROM pr) o ON o.id_out = d.doc_id
    ),
    segs AS (
      SELECT id,
             COALESCE(LAG(span_end) OVER (PARTITION BY id ORDER BY span_start), 0)
               AS seg_start,
             span_start AS seg_end
      FROM spans
      UNION ALL
      SELECT s.id, MAX(s.span_end), length(d.text)
      FROM spans s JOIN docs d ON s.id = d.id
      GROUP BY s.id, length(d.text)
    ),
    stats AS (
      SELECT id, COUNT(*) AS n_spans_cut,
             SUM(span_end - span_start) AS n_chars_cut
      FROM spans GROUP BY id
    ),
    rebuilt AS (
      SELECT segs.id,
             string_agg(
               substr(d.text, seg_start + 1, greatest(seg_end - seg_start, 0)),
               '' ORDER BY seg_start) AS cut
      FROM segs JOIN docs d ON segs.id = d.id
      GROUP BY segs.id
    )
    SELECT d.id AS doc_id, COALESCE(r.cut, d.text) AS text,
           COALESCE(st.n_spans_cut, 0) AS n_spans_cut,
           CAST(COALESCE(st.n_chars_cut, 0) AS BIGINT) AS n_chars_cut
    FROM docs d
    LEFT JOIN rebuilt r ON d.id = r.id
    LEFT JOIN stats st ON d.id = st.id
    ORDER BY doc_id
    """,
)
def doc_containment_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-driven CURATION CUT (operators/dedup.strip_contained_
    spans): instead of dropping a document that near-contains another
    (``doc_containment_pairs``' verdict), keep it and cut out the spans it
    shares with its paired inner doc(s) — syndication chrome and list-page
    commentary survive, the duplicated article body leaves the corpus
    exactly once. The directed pairs, the outer docs' positional char-gram
    postings, and the inner docs' distinct gram hashes are staged; BOTH
    engines replay the pair-scoped semi-join marking, the gaps-and-islands
    span merge, and the byte-exact complement-segment surgery. Postings
    exist only for pair participants — volume scales with the containment
    set, not the corpus."""
    d = _t(spark, sf_dir, "documents")
    posts = dedup.winnow_fp_postings(d, "doc_id", "text")
    pairs = dedup.winnow_containment_pairs(
        posts, min_shared=2, max_df=64, min_containment=0.8
    )
    names = {
        "pairs": ("cstrip_pairs", 1),
        "outer_posts": ("cstrip_outer_posts", 4),
        "inner_hs": ("cstrip_inner_hs", 2),
    }
    return dedup.strip_contained_spans(
        d,
        pairs,
        "doc_id",
        "text",
        k=30,
        persist_stage=lambda df, name: stage(
            df, names[name][0], partitions=names[name][1]
        ),
    ).orderBy("doc_id")


@q(
    "doc_winnow_fingerprints",
    f"""
    WITH g AS (SELECT * FROM read_parquet('{staged_glob("winnow_grams")}')),
    win AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min,
             MAX(pos) OVER (PARTITION BY doc_id) AS n_grams
      FROM g
    )
    SELECT doc_id, COUNT(DISTINCT win_min) AS n_fingerprints,
           MIN(win_min) AS min_fp, MAX(win_min) AS max_fp
    FROM win
    WHERE pos <= GREATEST(n_grams - 3, 1)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) document fingerprints over the documents
    table. The positional k-gram hash table is staged; BOTH engines then run
    the winnowing selection itself — window-of-4 minima over valid window
    starts, distinct per document — so the fingerprint-selection logic is
    oracle-checked end-to-end (the single-pass array formulation
    ``winnow_fingerprints`` is pinned equivalent in tests/test_textfns.py)."""
    from ocr_platform_spark.functions.textfns import char_kgram_hashes, normalized_text

    d = _t(spark, sf_dir, "documents")
    # Stage the normalized text FIRST (projection barrier): without it
    # CollapseProject inlines the regex normalize into the per-gram lambda
    # and re-runs it once per gram — measured ~25× the runtime at sf0.1.
    # The bounded prefix keeps per-doc fingerprint cost constant at any
    # corpus scale (near-dup docs share prefixes — standard curation trade).
    norm = stage(
        d.select(
            "doc_id", normalized_text(F.substring("text", 1, 2000)).alias("norm")
        ),
        "winnow_norm",
        partitions=8,
    )
    grams = stage(
        norm.select(
            "doc_id",
            F.posexplode(char_kgram_hashes("norm", 8, normalized=True)).alias(
                "pos0", "h"
            ),
        ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h"),
        "winnow_grams",
        partitions=8,
    )
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    wdoc = Window.partitionBy("doc_id")
    win = grams.select(
        "doc_id",
        "pos",
        F.min("h").over(wmin).alias("win_min"),
        F.max("pos").over(wdoc).alias("n_grams"),
    )
    return (
        win.where(F.col("pos") <= F.greatest(F.col("n_grams") - 3, F.lit(1)))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("win_min").alias("n_fingerprints"),
            F.min("win_min").alias("min_fp"),
            F.max("win_min").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


@q(
    "export_pdf_roundtrip",
    f"""
    WITH i AS (SELECT * FROM read_parquet('{staged_glob("export_input")}')),
    e AS (SELECT * FROM read_parquet('{staged_glob("export_extracted")}')),
    exp AS (
      SELECT url,
             string_agg(field_name || ': ' || value, chr(10)
                        ORDER BY field_name, value) AS expected
      FROM i GROUP BY url
    )
    SELECT e.url, CAST(e.extracted_text = exp.expected AS BOOLEAN) AS roundtrip_ok
    FROM e JOIN exp ON e.url = exp.url
    ORDER BY e.url
    """,
)
def export_pdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 rendered-export sink proven end-to-end: EAV result rows →
    ``render_exports`` PDF archive → re-extraction with the engine's OWN
    pdf kernel. The staged input and the staged re-extracted text are
    compared against an *independently computed* expected rendering
    (DuckDB: string_agg ordered by field; Spark: sort_array+concat_ws), so
    a bug in either the renderer or the extractor flips roundtrip_ok."""
    from ocr_platform_spark.sources.export import render_exports

    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    url = F.col("p_partkey").cast("string").alias("url")
    inp = stage(
        p.select(url, F.lit("NAME").alias("field_name"), F.col("p_name").alias("value"))
        .unionByName(
            p.select(url, F.lit("TYPE").alias("field_name"), F.col("p_type").alias("value"))
        ),
        "export_input",
    )
    arch = render_exports(inp, "pdf")

    def _reextract_fn(contents):
        import pandas as pd

        from ocr_platform_spark.kernels.pdf_extract import extract_pdf

        return pd.Series([extract_pdf(bytes(c))[0] for c in contents])

    _reextract = F.pandas_udf(_reextract_fn, "string")

    extracted = stage(
        arch.select("url", _reextract(F.col("content")).alias("extracted_text")),
        "export_extracted",
    )
    expected = inp.groupBy("url").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("field_name", "value"))),
                lambda s: F.concat(s["field_name"], F.lit(": "), s["value"]),
            ),
        ).alias("expected")
    )
    return (
        extracted.join(expected, "url")
        .select(
            "url", (F.col("extracted_text") == F.col("expected")).alias("roundtrip_ok")
        )
        .orderBy("url")
    )


@q(
    "wet_roundtrip",
    f"""
    WITH i AS (SELECT * FROM read_parquet('{staged_glob("wet_input")}')),
    r AS (SELECT * FROM read_parquet('{staged_glob("wet_reread")}'))
    SELECT i.url,
           CAST(length(i.text) AS BIGINT) AS n_chars,
           (r.text = i.text AND r.wet_ts = i.wet_ts) AS roundtrip_ok
    FROM i JOIN r ON r.url = i.url
    ORDER BY i.url
    """,
)
def wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S6 WET archive sink+source proven end-to-end: the documents table
    → distributed ``write_wet_shards`` (executors write gzip-member WET
    segments, manifest audited) → ``read_wet`` with the engine's own WARC
    record splitter. The staged input and the staged re-read are joined on
    url and compared text- and timestamp-exact in BOTH engines, so a bug in
    the record framing (Content-Length over multi-byte UTF-8, embedded
    CRLF CRLF separators), the gzip member layout, or the splitter flips
    ``roundtrip_ok`` — and a lost/duplicated record flips the row count.
    Timestamps are built at second resolution (the WARC-Date grain)."""
    import os as _os

    from ocr_platform_spark.sources.wet import read_wet, write_wet_shards
    from ocr_platform_spark.staging import STAGE_ROOT

    d = _t(spark, sf_dir, "documents")
    inp = stage(
        d.select(
            F.concat(F.lit("https://"), "source", F.lit("/doc/"), "doc_id").alias("url"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") % 86400).alias(
                "wet_ts"
            ),
            "text",
        ),
        "wet_input",
    )
    archive = _os.path.join(STAGE_ROOT, "wet_archive")
    write_wet_shards(inp, archive, n_shards=4)
    reread = stage(read_wet(spark, archive), "wet_reread", partitions=2)
    return (
        inp.alias("i")
        .join(reread.alias("r"), F.col("r.url") == F.col("i.url"))
        .select(
            F.col("i.url").alias("url"),
            F.length("i.text").cast("long").alias("n_chars"),
            (
                (F.col("r.text") == F.col("i.text"))
                & (F.col("r.wet_ts") == F.col("i.wet_ts"))
            ).alias("roundtrip_ok"),
        )
        .orderBy("url")
    )


@q(
    "corrected_table_cells",
    """
    WITH cells AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS url, 'LINE_ITEMS' AS field_name,
             CAST(l_linenumber AS INT) AS row_index, 'QTY' AS column_name,
             CAST(CAST(l_quantity AS INT) AS VARCHAR) AS predicted_value
      FROM lineitem WHERE l_orderkey <= 800
    ),
    corr AS (
      -- the synthetic lineitem carries duplicate (orderkey, linenumber)
      -- pairs; the overlay's latest-wins rule (equal timestamps → value
      -- DESC tie-break) collapses them to MAX(corrected_value) per key
      SELECT url, field_name, row_index, column_name,
             MAX(predicted_value || '-fixed') AS corrected_value
      FROM cells WHERE row_index = 1 AND CAST(url AS BIGINT) % 3 = 0
      GROUP BY url, field_name, row_index, column_name
    )
    SELECT c.url, c.field_name, c.row_index, c.column_name,
           COALESCE(k.corrected_value, c.predicted_value) AS value,
           k.corrected_value IS NOT NULL AS was_corrected
    FROM cells c LEFT JOIN corr k
      ON c.url = k.url AND c.field_name = k.field_name
     AND c.row_index = k.row_index AND c.column_name = k.column_name
    ORDER BY c.url, c.row_index
    """,
)
def corrected_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 at TABLE-cell granularity: corrections addressed to the full
    (url, field_name, row_index, column_name) EAV key — only the addressed
    row_index/column changes, null-safe key semantics exercised with
    non-null cell keys (reference ocr_line_item_value.py:4-14,
    document_routes.py:577-590)."""
    from ocr_platform_spark.operators.corrections import apply_corrections
    from ocr_platform_spark.operators.eav import canonical_value

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 800)
    cells = li.select(
        F.col("l_orderkey").cast("string").alias("url"),
        F.lit("LINE_ITEMS").alias("field_name"),
        F.col("l_linenumber").cast("int").alias("row_index"),
        F.lit("QTY").alias("column_name"),
        F.col("l_quantity").cast("int").cast("string").alias("predicted_value"),
        F.lit(None).cast("string").alias("actual_value"),
    )
    corr = cells.where(
        (F.col("row_index") == 1) & (F.col("url").cast("long") % 3 == 0)
    ).select(
        "url",
        "field_name",
        "row_index",
        "column_name",
        F.concat("predicted_value", F.lit("-fixed")).alias("corrected_value"),
        F.lit("2024-01-01").cast("timestamp").alias("corrected_at"),
    )
    return (
        apply_corrections(cells, corr)
        .select(
            "url",
            "field_name",
            "row_index",
            "column_name",
            canonical_value().alias("value"),
            F.col("actual_value").isNotNull().alias("was_corrected"),
        )
        .orderBy("url", "row_index")
    )


@q(
    "media_near_dups",
    f"""
    WITH e AS (SELECT * FROM read_parquet('{staged_glob("media_emb")}')),
    qz AS (
      SELECT media_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM e
    ),
    p AS (SELECT * FROM read_parquet('{staged_glob("media_dup_cands")}')),
    pairs AS (
      SELECT p.id_a, p.id_b,
             list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) AS dot,
             list_sum(list_transform(a.v, x -> x * x)) AS na,
             list_sum(list_transform(b.v, x -> x * x)) AS nb
      FROM p JOIN qz a ON p.id_a = a.media_id JOIN qz b ON p.id_b = b.media_id
    )
    SELECT id_a, id_b,
           CASE WHEN na > 0 AND nb > 0
                THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
                ELSE 0.0 END AS cosine
    FROM pairs
    WHERE CASE WHEN na > 0 AND nb > 0
               THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
               ELSE 0.0 END >= 0.8
    ORDER BY id_a, id_b
    """,
)
def media_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal × ANN end-to-end: binary media payloads → byte-histogram
    content embedding (codec-free numpy kernel) → hyperplane-LSH self-join
    candidates → exact quantized-cosine verification ≥ 0.8. The embedding
    table and the candidate pairs are staged, so DuckDB reproduces the
    quantization + cosine + threshold tail over the same bytes — the
    near-dup path a media corpus runs before any decode step exists."""
    from ocr_platform_spark.operators.multimodal import media_corpus, with_byte_histogram

    media = media_corpus(spark, 150)
    emb = stage(
        with_byte_histogram(media).select("media_id", "embedding"), "media_emb"
    )
    cands = stage(
        ann.embedding_lsh_pairs(emb, id_col="media_id", vec_col="embedding", dim=256),
        "media_dup_cands",
    )
    return ann.quantized_verify_pairs(
        cands, emb, id_col="media_id", vec_col="embedding", threshold=0.8
    ).orderBy("id_a", "id_b")


#: SQL faces of the curation gates — textually identical to the proven
#: doc_quality / doc_lang_id oracles so the funnel reuses verified math.
_QUALITY_SQL = r"""
      SELECT doc_id,
        round(
          least(toks / 100.0, 1.0) * 0.4
          + least((CASE WHEN toks > 0 THEN stops / toks ELSE 0.0 END) * 5.0, 1.0) * 0.3
          + (1.0 - least((CASE WHEN toks > 0 THEN punct / toks ELSE 1.0 END) * 2.0, 1.0)) * 0.3,
          4) AS quality
      FROM (
        SELECT doc_id,
          CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
          CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|that|with)\b')) AS DOUBLE) AS stops,
          CAST(length(text) - length(regexp_replace(text, '[.,;:!?()]', '', 'g')) AS DOUBLE) AS punct
        FROM documents
      )
"""


def _lang_sql() -> str:
    scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '{_STOP_RE[lang]}')) AS s_{lang}"
        for lang, _ in TX.LANG_PROFILES
    )
    whens = " ".join(
        f"WHEN s_{lang} = greatest(s_en, s_de, s_es, s_fr, s_hi) THEN '{lang}'"
        for lang, _ in TX.LANG_PROFILES
    )
    return f"""
      SELECT doc_id,
        CASE {_SCRIPT_WHENS_SQL}
             WHEN greatest(s_en, s_de, s_es, s_fr, s_hi) = 0 THEN 'und'
             {whens}
        END AS pred_lang
      FROM (SELECT doc_id, {scores}, {_SCRIPT_COUNTS_SQL} FROM documents)
"""


@q(
    "curation_funnel",
    f"""
    WITH q AS ({_QUALITY_SQL}),
    l AS ({_lang_sql()}),
    s1 AS (
      SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
      WHERE q.quality >= 0.3
    ),
    s2 AS (
      SELECT s1.* FROM s1 JOIN l USING (doc_id) WHERE l.pred_lang = 'en'
    ),
    rep AS (
      SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS frac FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(list_transform(
                   generate_series(1, greatest(len(words) - 1, 1)),
                   i -> array_to_string(words[i:i+1], ' '))) AS g
          FROM (
            SELECT doc_id,
                   regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS words
            FROM s2
          )
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    ),
    s3 AS (
      SELECT s2.* FROM s2 JOIN rep USING (doc_id) WHERE rep.frac <= 0.11
    ),
    s4 AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (
          PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
          ORDER BY doc_id) AS rn
        FROM s3
      ) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT doc_id FROM read_parquet('{staged_glob("curation_dropped")}')
    ),
    s5 AS (SELECT doc_id FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
    fps AS (SELECT id, fp FROM read_parquet('{staged_glob("curation_winnow_fps")}')),
    good AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 64),
    gp AS (SELECT fps.id, fps.fp FROM fps JOIN good USING (fp)),
    sizes AS (SELECT id, COUNT(*) AS n_fp FROM gp GROUP BY id),
    wpairs AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
      FROM gp a JOIN gp b ON a.fp = b.fp AND a.id < b.id
      GROUP BY a.id, b.id HAVING COUNT(*) >= 2
    ),
    wdrop AS (
      SELECT DISTINCT w.id_b FROM wpairs w
      JOIN sizes sa ON sa.id = w.id_a
      JOIN sizes sb ON sb.id = w.id_b
      WHERE round(CAST(w.n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp), 6) >= 0.35
    ),
    s6 AS (SELECT doc_id FROM s5 WHERE doc_id NOT IN (SELECT id_b FROM wdrop))
    SELECT CAST(stage_no AS INT) AS stage_no, stage, CAST(n_docs AS BIGINT) AS n_docs FROM (
      VALUES (0, 'input',         (SELECT COUNT(*) FROM documents)),
             (1, 'quality',       (SELECT COUNT(*) FROM s1)),
             (2, 'lang',          (SELECT COUNT(*) FROM s2)),
             (3, 'repetition',    (SELECT COUNT(*) FROM s3)),
             (4, 'exact_dedup',   (SELECT COUNT(*) FROM s4)),
             (5, 'near_dup_drop', (SELECT COUNT(*) FROM s5)),
             (6, 'winnow_drop',   (SELECT COUNT(*) FROM s6))
    ) AS t(stage_no, stage, n_docs)
    ORDER BY stage_no
    """,
)
def curation_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composed curation pipeline (plans/curation.py
    run_curation_funnel): quality >= 0.3 -> lang = en -> repetition
    (top-bigram share <= 0.11) -> exact dedup -> MinHash near-dup drop ->
    winnowing near-dup drop, as a per-stage funnel. The Spark side runs the
    SINGLE-PASS shape: all three gates are pure column expressions fused
    into one corpus scan whose counts come from ``df.observe`` metrics (no
    per-gate rescans); the dedup tail runs over the staged survivor table.
    The oracle recomputes stages 0-4 entirely in SQL (the same verified
    quality/lang/repetition/fingerprint math), applies the staged LSH drop
    set for stage 5, and re-derives the winnowing drop set from the staged
    fingerprint postings (frequency cap + overlap, pure aggregates) — every
    count cross-engine hash-checked."""
    from ocr_platform_spark.plans.curation import run_curation_funnel

    d = _t(spark, sf_dir, "documents")
    report, _details = run_curation_funnel(
        d,
        min_quality=0.3,
        langs=("en",),
        max_top_bigram_frac=0.11,
        near_dup_threshold=0.5,
        winnow_min_shared=2,
        winnow_max_df=64,
        winnow_min_overlap=0.35,
    )
    return report.orderBy("stage_no")


@q(
    "corpus_build_report",
    rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS g
      FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS i
            FROM t WHERE len(ts) >= 8)
    ),
    ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
    contaminated AS (
      SELECT DISTINCT gg.doc_id FROM g gg JOIN ev USING (g)
      WHERE gg.doc_id % 7 <> 0
    ),
    s1 AS (
      SELECT d.doc_id, d.text FROM documents d
      WHERE d.doc_id % 7 <> 0
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    fzhs AS (SELECT * FROM read_parquet('{staged_glob("cbr_fz_hs")}')),
    fzev AS (SELECT * FROM read_parquet('{staged_glob("cbr_fz_ev")}')),
    fzc AS (SELECT * FROM read_parquet('{staged_glob("cbr_fz_cands")}')),
    fzj AS (
      SELECT c.id,
             len(list_intersect(h.hs, e.hs)) AS n_common,
             len(h.hs) + len(e.hs) - len(list_intersect(h.hs, e.hs)) AS n_union
      FROM fzc c JOIN fzhs h ON h.id = c.id JOIN fzev e ON e.eval_id = c.eval_id
    ),
    fzbad AS (
      SELECT DISTINCT id FROM fzj
      WHERE n_union > 0 AND CAST(n_common AS DOUBLE) / n_union >= 0.5
    ),
    s1b AS (SELECT doc_id, text FROM s1
            WHERE doc_id NOT IN (SELECT id FROM fzbad)),
    {embed.derived_embeddings_cte(table="s1b")},
    a AS (SELECT id, cluster, cent_sim FROM read_parquet('{staged_glob("cbr_assign")}')),
    qz AS (SELECT doc_id AS vec_id, list_transform(embedding, x -> x * 1000) AS v
           FROM demb),
    m AS (SELECT a.id, a.cluster, a.cent_sim, qz.v FROM a JOIN qz ON a.id = qz.vec_id),
    p0 AS (
      SELECT x.id AS x_id, x.cent_sim AS x_cs, y.id AS y_id, y.cent_sim AS y_cs,
             list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(x.v, q -> q * q)) AS nx,
             list_sum(list_transform(y.v, q -> q * q)) AS ny
      FROM m x JOIN m y ON x.cluster = y.cluster AND x.id <> y.id
    ),
    p AS (
      SELECT x_id, x_cs, y_id, y_cs,
             CAST(round(CASE WHEN nx > 0 AND ny > 0
                  THEN round(CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))), 6)
                  ELSE 0.0 END * 1000000) AS BIGINT) AS c
      FROM p0
    ),
    dups AS (
      SELECT x_id FROM p WHERE c >= 900000 GROUP BY x_id
      HAVING MAX(CASE WHEN y_cs < x_cs OR (y_cs = x_cs AND y_id < x_id)
                 THEN 1 ELSE 0 END) = 1
    ),
    s2 AS (SELECT doc_id, text FROM s1b
           WHERE doc_id NOT IN (SELECT x_id FROM dups)),
    split2 AS (
      SELECT doc_id, string_split_regex(text, '\n{{2,}}') AS ps FROM s2
    ),
    paras AS (
      SELECT doc_id, CAST(i - 1 AS INT) AS idx, ps[i] AS para
      FROM (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i FROM split2)
      WHERE length(ps[i]) >= 1
    ),
    toks AS (
      SELECT doc_id, idx,
             CAST(len(list_filter(string_split_regex(para, '\s+'), x -> x <> ''))
                  AS BIGINT) AS tok
      FROM paras
    ),
    cum AS (
      SELECT doc_id, idx, tok,
             COALESCE(SUM(tok) OVER (PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM toks
    ),
    chunkcnt AS (
      SELECT COUNT(*) AS n FROM (
        SELECT doc_id, cum_before // 40 AS cid FROM cum GROUP BY doc_id, cum_before // 40
      )
    )
    SELECT CAST(stage_no AS INT) AS stage_no, stage, CAST(n AS BIGINT) AS n_docs
    FROM (
      VALUES (0, 'input',           (SELECT COUNT(*) FROM documents)),
             (1, 'train_split',     (SELECT COUNT(*) FROM documents WHERE doc_id % 7 <> 0)),
             (2, 'decontam',        (SELECT COUNT(*) FROM s1)),
             (3, 'decontam_fuzzy',  (SELECT COUNT(*) FROM s1b)),
             (4, 'semdedup',        (SELECT COUNT(*) FROM s2)),
             (5, 'chunks',          (SELECT n FROM chunkcnt))
    ) AS v(stage_no, stage, n)
    ORDER BY stage_no
    """,
)
def corpus_build_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-build job's post-curation refinement tail
    (plans/pipeline.corpus_refine_stages) as an oracle-verified funnel:
    eval split (doc_id % 7 = 0) → benchmark DECONTAMINATION (exact word
    8-gram overlap, left-anti) → FUZZY decontamination (MinHash-banded
    near-match against the same eval set, Jaccard ≥ 0.5; the banded
    shingle sets and candidates staged) → SEMDEDUP over embeddings derived
    from text (ε=0.90 keep-outliers rule; only the trained IVF assignment
    staged) → paragraph CHUNKING of the survivors (40-token budget). The
    oracle recomputes gram overlap, the fuzzy Jaccard verdicts, the
    derived vectors, every within-cluster verdict, and the chunk plan —
    each stage count cross-engine hash-checked."""
    from ocr_platform_spark.plans.pipeline import corpus_refine_stages

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ev = d.where(F.col("doc_id") % 7 == 0)
    train = d.where(F.col("doc_id") % 7 != 0)
    fz_names = {"hs_train": "cbr_fz_hs", "hs_eval": "cbr_fz_ev", "cands": "cbr_fz_cands"}
    survivors, chunks, metrics = corpus_refine_stages(
        train,
        decontam_eval=ev,
        decontam_n=8,
        decontam_fuzzy_threshold=0.5,
        semdedup_threshold_q6=900000,
        semdedup_n_lists=16,
        chunk_budget=40,
        persist_assign=lambda a: stage(a, "cbr_assign"),
        persist_fuzzy=lambda df, name: stage(df, fz_names[name]),
    )
    n0 = d.count()
    n_train = train.count()
    n1 = n_train - metrics["decontam_dropped"]
    n1b = n1 - metrics["decontam_fuzzy_dropped"]
    n2 = n1b - metrics["semdedup_dropped"]
    rows = [
        (0, "input", n0),
        (1, "train_split", n_train),
        (2, "decontam", n1),
        (3, "decontam_fuzzy", n1b),
        (4, "semdedup", n2),
        (5, "chunks", metrics["n_chunks"]),
    ]
    return spark.createDataFrame(rows, "stage_no int, stage string, n_docs bigint")


@q(
    "host_link_graph",
    f"""
    SELECT src_host, COUNT(*) AS n_links,
           COUNT(DISTINCT dst_host) AS n_dst_hosts
    FROM read_parquet('{staged_glob("host_edges")}')
    GROUP BY src_host ORDER BY n_links DESC, src_host
    """,
)
def host_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl link graph: anchor-extraction kernel → resolved outlink edges
    → host projection (staged) → per-host degree rollup aggregated by both
    engines. The edge list is the PageRank/host-authority substrate a
    crawl pipeline maintains alongside the text."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        host_degree_stats,
        host_edges,
    )

    docs = _synth_docs(spark)
    edges = stage(host_edges(extract_outlinks(docs)), "host_edges", partitions=4)
    return host_degree_stats(edges)


@q(
    "crawl_fetch_schedule",
    f"""
    WITH e AS (SELECT * FROM read_parquet('{staged_glob("frontier_edges")}')),
    crawled AS (SELECT url FROM read_parquet('{staged_glob("frontier_crawled")}')),
    cand AS (
      SELECT dst_url AS url, COUNT(DISTINCT src_url) AS n_referrers
      FROM e GROUP BY 1
    ),
    fresh AS (
      SELECT c.url, regexp_extract(c.url, '^https?://([^/?#]+)', 1) AS host,
             c.n_referrers
      FROM cand c ANTI JOIN crawled w ON c.url = w.url
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY host
                                   ORDER BY n_referrers DESC, url) AS rnk
      FROM fresh
    )
    SELECT url, host, n_referrers,
           CAST((rnk - 1) // 2 AS INT) AS wave,
           CAST((rnk - 1) % 2 AS INT) AS slot
    FROM ranked WHERE rnk <= 6
    ORDER BY host, wave, slot, url
    """,
)
def crawl_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl face composed end-to-end: anchor kernel → url-level edge
    list (staged) → frontier = distinct targets minus already-crawled urls
    (left-anti, the resume shape) ranked by distinct referrers → politeness
    schedule (operators/frontier.py: ≤2 fetches per host per wave, 3-wave
    generate-cycle cap expressed as a row_number filter so Catalyst runs a
    partial top-k before the host shuffle). The oracle replays frontier
    build, host parse, ranking, and wave/slot assignment from the same
    staged edges — the whole schedule is hash-checked cross-engine."""
    from ocr_platform_spark.operators.frontier import build_frontier, fetch_schedule
    from ocr_platform_spark.operators.linkgraph import extract_outlinks

    docs = _synth_docs(spark)
    edges = stage(extract_outlinks(docs), "frontier_edges", partitions=4)
    crawled = stage(docs.select("url"), "frontier_crawled")
    sched = fetch_schedule(build_frontier(edges, crawled), per_wave=2, max_waves=3)
    return sched.select("url", "host", "n_referrers", "wave", "slot").orderBy(
        "host", "wave", "slot", "url"
    )


def _robots_texts() -> list[tuple[str, str]]:
    """Deterministic robots.txt per corpus host, exercising every branch
    of the parse contract: comments, foreign-agent groups (ignored),
    multi-agent groups containing ``*``, allow/disallow longest-prefix
    interplay, exact ties (→ allow), empty values (no rule), mixed-case
    field names, and the Crawl-delay branches (min-of-many, fractional
    ignored, foreign-group delay ignored)."""
    out = []
    for i in range(40):
        host = f"site-{i:02d}.example.org"
        parts = [f"# robots for {host}", ""]
        if i % 7 == 0:
            # foreign group: its Disallow AND its Crawl-delay are ignored
            parts += ["User-agent: evilbot", "Disallow: /", "Crawl-delay: 99", ""]
        parts += ["User-Agent: *"]
        if i % 2 == 0:
            parts += ["Disallow: /page/", "Allow: /page/000"]
        if i % 3 == 0:
            parts += ["disallow: /x"]
        if i % 5 == 0:
            parts += ["Disallow: /sitemap-"]
        if i % 4 == 1:
            parts += ["Disallow: /lorem", "Allow: /lorem"]  # tie → allow
        parts += ["Disallow:", "Crawl-delay: 2  # comment stripped"]
        if i % 4 == 2:
            parts += ["Crawl-delay: 1.5"]  # fractional → out of contract
        if i % 9 == 0:
            parts += ["crawl-delay: 1"]  # min(1, 2) → 1
        if i % 6 == 0:
            parts += ["", "User-agent: otherbot", "User-agent: *", "Disallow: /w"]
        out.append((host, "\n".join(parts)))
    return out


@q(
    "url_prefix_rollup",
    r"""
    WITH u AS (
      SELECT DISTINCT
        'site-' || CAST(doc_id % 8 AS VARCHAR) || '.example.org' AS host,
        CASE doc_id % 4
          WHEN 0 THEN '/blog/c' || CAST(doc_id % 3 AS VARCHAR)
                   || '/post-' || CAST(doc_id AS VARCHAR)
          WHEN 1 THEN '/blog/c' || CAST(doc_id % 3 AS VARCHAR)
                   || '/media/img-' || CAST(doc_id AS VARCHAR)
          WHEN 2 THEN '/shop/item-' || CAST(doc_id AS VARCHAR)
          ELSE '/help/faq-' || CAST(doc_id AS VARCHAR)
        END AS path
      FROM documents
    ),
    segs AS (
      SELECT host, path, list_filter(str_split(path, '/'), x -> x <> '') AS ss
      FROM u
    ),
    pref AS (
      SELECT host, path, CAST(i AS INT) AS depth,
             '/' || array_to_string(ss[1:i], '/') AS prefix
      FROM (SELECT host, path, ss, unnest(generate_series(1, len(ss) - 1)) AS i
            FROM segs)
    ),
    tot AS (SELECT host, COUNT(*) AS n_host_urls FROM u GROUP BY host),
    roll AS (
      SELECT host, prefix, depth, COUNT(*) AS n_urls
      FROM pref GROUP BY host, prefix, depth
    )
    SELECT r.host, r.prefix, r.depth,
           CAST(r.n_urls AS BIGINT) AS n_urls,
           CAST(t.n_host_urls AS BIGINT) AS n_host_urls,
           r.n_urls * 2 >= t.n_host_urls AS dominant
    FROM roll r JOIN tot t USING (host)
    WHERE r.n_urls >= 4
    ORDER BY host, prefix
    """,
)
def url_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-PREFIX subtree rollup per host — the crawl-analytics readout
    behind section-level budgeting and trap triage: every directory
    prefix of every url aggregates its page count, so '/blog' dominating
    half a host's urls (``dominant``) is visible at any depth without
    knowing the site's layout in advance. The prefix explode is
    map-side and bounded by path depth; the rollup is one shuffle keyed
    (host, prefix) — far finer than host, so a mega-host's subtrees
    spread across reducers. Counts are exact integers; the oracle
    replays the prefix expansion and both aggregates."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    ds = did.cast("string")
    path = (
        F.when(
            did % 4 == 0,
            F.concat(F.lit("/blog/c"), (did % 3).cast("string"), F.lit("/post-"), ds),
        )
        .when(
            did % 4 == 1,
            F.concat(F.lit("/blog/c"), (did % 3).cast("string"), F.lit("/media/img-"), ds),
        )
        .when(did % 4 == 2, F.concat(F.lit("/shop/item-"), ds))
        .otherwise(F.concat(F.lit("/help/faq-"), ds))
    )
    u = d.select(
        F.concat(F.lit("site-"), (did % 8).cast("string"), F.lit(".example.org")).alias(
            "host"
        ),
        path.alias("path"),
    ).distinct()
    segs = u.select(
        "host", "path", F.filter(F.split("path", "/", -1), lambda x: x != F.lit("")).alias("ss")
    )
    # Spark sequence(1, 0) is DESCENDING [1, 0] while DuckDB
    # generate_series(1, 0) is empty — guard single-segment paths
    depths = F.when(F.size("ss") >= 2, F.sequence(F.lit(1), F.size("ss") - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pref = segs.select(
        "host",
        "path",
        "ss",
        F.explode(depths).alias("depth"),
    ).select(
        "host",
        "path",
        F.col("depth").cast("int").alias("depth"),
        F.concat(F.lit("/"), F.array_join(F.slice("ss", 1, F.col("depth")), "/")).alias(
            "prefix"
        ),
    )
    tot = u.groupBy("host").agg(F.count("*").alias("n_host_urls"))
    roll = pref.groupBy("host", "prefix", "depth").agg(F.count("*").alias("n_urls"))
    return (
        roll.join(F.broadcast(tot), "host")
        .where(F.col("n_urls") >= 4)
        .select(
            "host",
            "prefix",
            "depth",
            F.col("n_urls").cast("long").alias("n_urls"),
            F.col("n_host_urls").cast("long").alias("n_host_urls"),
            (F.col("n_urls") * 2 >= F.col("n_host_urls")).alias("dominant"),
        )
        .orderBy("host", "prefix")
    )


@q(
    "payload_cdc_dedup",
    f"""
    WITH c AS (
      SELECT id, idx, start, length, chunk_hash
      FROM read_parquet('{staged_glob("cdc_chunks")}')
    ),
    dup AS (
      SELECT chunk_hash
      FROM (SELECT chunk_hash, id FROM c GROUP BY chunk_hash, id)
      GROUP BY chunk_hash HAVING COUNT(*) >= 2
    ),
    m AS (
      SELECT c.*, (d.chunk_hash IS NOT NULL) AS isdup
      FROM c LEFT JOIN dup d USING (chunk_hash)
    )
    SELECT id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(length) AS BIGINT) AS n_bytes,
           CAST(COUNT(CASE WHEN isdup THEN 1 END) AS BIGINT) AS n_dup_chunks,
           CAST(COALESCE(SUM(CASE WHEN isdup THEN length END), 0) AS BIGINT)
             AS dup_bytes
    FROM m GROUP BY id ORDER BY doc_id
    """,
)
def payload_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup over binary payloads (operators/
    cdc.py — the LBFS/FastCDC storage mechanic applied to crawl
    payloads): Gear rolling-hash boundaries cut each payload into
    content-addressed chunks, so re-crawls/mirrors/templated pages dedup
    at chunk level even when no two payloads are byte-identical. Each
    5-group of docs shares its leader's text as a payload block, so
    cross-document duplicate chunks exist by construction. The
    sequential boundary scan runs in the Arrow-batched kernel (pinned by
    tests/test_cdc.py: bounds, resynchronization, partitioning
    invariance); the staged chunk table is the oracle boundary — BOTH
    engines compute the distinct-payload duplicate set and the per-doc
    dedup accounting from the same rows."""
    from ocr_platform_spark.operators.cdc import cdc_chunk_table, cdc_dedup_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    leaders = d.select(F.col("doc_id").alias("lid"), F.col("text").alias("ltext"))
    pay = (
        d.withColumn("lid", F.col("doc_id") - F.pmod("doc_id", F.lit(5)))
        .join(F.broadcast(leaders), "lid")
        .select(
            "doc_id",
            F.encode(F.concat("text", F.lit("\n"), "ltext"), "utf-8").alias("payload"),
        )
    )
    chunks = stage(
        cdc_chunk_table(pay, "doc_id", "payload"), "cdc_chunks", partitions=2
    )
    return (
        cdc_dedup_stats(chunks)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


@q(
    "payload_cdc_delta",
    f"""
    WITH prev AS (
      SELECT DISTINCT id, chunk_hash
      FROM read_parquet('{staged_glob("cdc_prev")}')
    ),
    curr AS (
      SELECT id, idx, length, chunk_hash
      FROM read_parquet('{staged_glob("cdc_curr")}')
    ),
    m AS (
      SELECT c.id, c.length, (p.chunk_hash IS NOT NULL) AS seen
      FROM curr c LEFT JOIN prev p
        ON c.id = p.id AND c.chunk_hash = p.chunk_hash
    )
    SELECT id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(length) AS BIGINT) AS n_bytes,
           CAST(COUNT(CASE WHEN NOT seen THEN 1 END) AS BIGINT) AS n_new_chunks,
           CAST(COALESCE(SUM(CASE WHEN NOT seen THEN length END), 0) AS BIGINT)
             AS new_bytes
    FROM m GROUP BY id ORDER BY doc_id
    """,
)
def payload_cdc_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-crawl TRANSFER sizing via content-defined chunks
    (operators/cdc.py): snapshot t1 re-chunks every payload and only
    chunks whose hash is absent from the SAME url's t0 chunk set need
    storing — the rsync/casync delta mechanic on top of the resume/
    revisit family. Half the docs get a 4-byte prefix edit at t1; the
    Gear hash re-synchronizes a few bytes past the edit, so those docs
    transfer one or two chunks (new_bytes ≪ n_bytes) and untouched docs
    transfer zero — which is exactly the property that makes chunk-level
    storage viable for 10^12-document recrawls. Both chunk tables are
    staged; the oracle replays the per-url anti-join and byte
    accounting."""
    from ocr_platform_spark.operators.cdc import cdc_chunk_table

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    prev_pay = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    curr_pay = d.select(
        "doc_id",
        F.encode(
            F.concat(
                F.when(F.col("doc_id") % 2 == 0, F.lit("v2: ")).otherwise(F.lit("")),
                F.col("text"),
            ),
            "utf-8",
        ).alias("payload"),
    )
    prev = stage(cdc_chunk_table(prev_pay, "doc_id", "payload"), "cdc_prev", partitions=2)
    curr = stage(cdc_chunk_table(curr_pay, "doc_id", "payload"), "cdc_curr", partitions=2)
    seen = prev.select("id", "chunk_hash").distinct().withColumn("_seen", F.lit(True))
    m = curr.join(seen, ["id", "chunk_hash"], "left")
    return (
        m.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("length").cast("long").alias("n_bytes"),
            F.count(F.when(F.col("_seen").isNull(), 1)).cast("long").alias("n_new_chunks"),
            F.coalesce(
                F.sum(F.when(F.col("_seen").isNull(), F.col("length"))), F.lit(0)
            )
            .cast("long")
            .alias("new_bytes"),
        )
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def _trap_oracle_sql() -> str:
    from ocr_platform_spark.functions.urlfns import trap_flags_sql

    flags = trap_flags_sql("url")
    flag_exprs = ",\n           ".join(f"{v} AS {k}" for k, v in flags.items())
    any_trap = " OR ".join(f"({v})" for v in flags.values())
    return f"""
    WITH u AS (
      SELECT doc_id,
        'https://site-' || CAST(doc_id % 8 AS VARCHAR) || '.example.org' ||
        CASE doc_id % 5
          WHEN 0 THEN '/archive/' || CAST(2000 + doc_id % 40 AS VARCHAR)
                   || '/' || CAST(doc_id % 12 + 1 AS VARCHAR) || '/page'
          WHEN 1 THEN '/d1/d2/d3/d4/d5/d6/d7/d8/x-' || CAST(doc_id AS VARCHAR)
          WHEN 2 THEN '/tag/tag/tag/item-' || CAST(doc_id AS VARCHAR)
          WHEN 3 THEN '/p?a=1&b=2&c=3&d=4&e=' || CAST(doc_id AS VARCHAR) || '&f=6'
          ELSE '/p/' || CAST(doc_id AS VARCHAR)
        END AS url
      FROM documents
    )
    SELECT doc_id, url,
           {flag_exprs},
           ({any_trap}) AS is_trap
    FROM u ORDER BY doc_id
    """


@q("crawl_trap_detection", _trap_oracle_sql())
def crawl_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap gating (functions/urlfns.trap_*; the Heritrix
    pathological-URL family): self-similar repeated path segments,
    excessive path depth, parameter explosions and year/month calendar
    spaces each flag BEFORE a url is enqueued, since traps generate
    unbounded URL spaces under a single host and politeness alone never
    drains them. All four rules are map-side string/array expressions
    (no shuffle, no UDF); the oracle SQL twins are generated next to the
    Column functions and their equality is additionally pinned on
    adversarial urls in tests/test_urlfns.py."""
    from ocr_platform_spark.functions.urlfns import (
        trap_calendar_like,
        trap_param_heavy,
        trap_segment_repeat,
        trap_too_deep,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    ds = did.cast("string")
    path = (
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit("/archive/"),
                (did % 40 + 2000).cast("string"),
                F.lit("/"),
                (did % 12 + 1).cast("string"),
                F.lit("/page"),
            ),
        )
        .when(did % 5 == 1, F.concat(F.lit("/d1/d2/d3/d4/d5/d6/d7/d8/x-"), ds))
        .when(did % 5 == 2, F.concat(F.lit("/tag/tag/tag/item-"), ds))
        .when(did % 5 == 3, F.concat(F.lit("/p?a=1&b=2&c=3&d=4&e="), ds, F.lit("&f=6")))
        .otherwise(F.concat(F.lit("/p/"), ds))
    )
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("https://site-"), (did % 8).cast("string"), F.lit(".example.org"), path
        ).alias("url"),
    )
    flags = {
        "seg_repeat": trap_segment_repeat("url"),
        "too_deep": trap_too_deep("url"),
        "param_heavy": trap_param_heavy("url"),
        "calendar_like": trap_calendar_like("url"),
    }
    is_trap = None
    for c in flags.values():
        is_trap = c if is_trap is None else (is_trap | c)
    return u.select(
        "doc_id",
        "url",
        *[c.alias(k) for k, c in flags.items()],
        is_trap.alias("is_trap"),
    ).orderBy("doc_id")


@q(
    "crawl_robots_filter",
    # the oracle string is built by the operator module so the two parses
    # share one source of truth (see robots_txt.robots_oracle_sql)
    robots_oracle_sql(staged_glob("robots_raw"), staged_glob("robots_frontier")),
)
def crawl_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level politeness end to end: synthetic per-host robots.txt
    (staged raw) + the outlink frontier (staged) → relational robots.txt
    parse (operators/robots_txt.py: section grouping by window, ``*``-agent
    selection, prefix rules) → longest-prefix allow/disallow decision per
    frontier URL. The oracle replays the ENTIRE chain — line split,
    grouping, rule extraction, longest-match, tie-to-allow — from the same
    staged raw text: a full cross-engine proof of the parser, not a rollup.
    Hosts with no robots.txt (off-corpus targets) default to allowed."""
    from ocr_platform_spark.operators.frontier import build_frontier
    from ocr_platform_spark.operators.linkgraph import extract_outlinks
    from ocr_platform_spark.operators.robots_txt import (
        robots_decisions,
        robots_rules,
    )

    docs = _synth_docs(spark)
    robots = stage(
        spark.createDataFrame(_robots_texts(), "host string, text string"),
        "robots_raw",
    )
    frontier = stage(
        build_frontier(extract_outlinks(docs), docs.select("url")).select(
            "url", "host"
        ),
        "robots_frontier",
    )
    return robots_decisions(frontier, robots_rules(robots)).orderBy("url")


@q(
    "crawl_delay_schedule",
    crawl_delay_schedule_oracle_sql(
        staged_glob("delay_robots"), staged_glob("delay_frontier")
    ),
)
def crawl_delay_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness budget: Crawl-delay parse (min of the valid
    ``*``-agent lines, strict digit gate — operators/robots_txt.crawl_delays)
    joined onto the robots-allowed frontier fan-in, estimating the serial
    fetch time a single-connection-per-host crawler needs
    (``delay_s × (n_allowed − 1)``; hosts without a valid delay default to
    1 s). The oracle replays the ENTIRE chain from the staged raw
    robots.txt — grouping, delay extraction, allow/disallow decision,
    rollup. Delay table is host-dimension sized → broadcast join."""
    from ocr_platform_spark.operators.frontier import build_frontier
    from ocr_platform_spark.operators.linkgraph import extract_outlinks
    from ocr_platform_spark.operators.robots_txt import (
        crawl_delays,
        robots_decisions,
        robots_rules,
    )

    docs = _synth_docs(spark)
    robots = stage(
        spark.createDataFrame(_robots_texts(), "host string, text string"),
        "delay_robots",
    )
    frontier = stage(
        build_frontier(extract_outlinks(docs), docs.select("url")).select(
            "url", "host"
        ),
        "delay_frontier",
    )
    allowed = robots_decisions(frontier, robots_rules(robots)).where(F.col("allowed"))
    per_host = allowed.groupBy("host").agg(F.count("*").alias("n_allowed"))
    delay = F.coalesce(F.col("delay_s"), F.lit(1)).cast("int")
    return (
        per_host.join(F.broadcast(crawl_delays(robots)), "host", "left")
        .select(
            "host",
            delay.alias("delay_s"),
            "n_allowed",
            (delay.cast("bigint") * (F.col("n_allowed") - 1)).alias("est_crawl_s"),
        )
        .orderBy("host")
    )


_PR_SCALE, _PR_DAMP, _PR_ITER = 10**9, 85, 10


@q(
    "host_pagerank",
    f"""
    WITH RECURSIVE
    e AS (SELECT * FROM read_parquet('{staged_glob("pr_edges")}')),
    deg AS (SELECT src_host, COUNT(*) AS out_deg FROM e GROUP BY src_host),
    hosts AS (SELECT DISTINCT host FROM
              (SELECT src_host AS host FROM e UNION ALL SELECT dst_host AS host FROM e)),
    e2 AS (
      SELECT src_host, dst_host, FALSE AS phantom FROM e
      UNION ALL
      SELECT host, host, TRUE FROM hosts
    ),
    pr AS (
      SELECT 0 AS it, host,
             CAST(CAST({_PR_SCALE} AS BIGINT) // (SELECT COUNT(*) FROM hosts) AS BIGINT) AS rank
      FROM hosts
      UNION ALL
      SELECT p.it + 1, e2.dst_host AS host,
             CAST( ((CAST({100 - _PR_DAMP} AS BIGINT) * {_PR_SCALE}) // 100)
                     // (SELECT COUNT(*) FROM hosts)
                   + (CAST({_PR_DAMP} AS BIGINT)
                      * SUM(CASE WHEN e2.phantom THEN CAST(0 AS BIGINT)
                                 ELSE p.rank // d.out_deg END)) // 100
               AS BIGINT) AS rank
      FROM pr p
      JOIN e2 ON e2.src_host = p.host
      LEFT JOIN deg d ON d.src_host = p.host
      WHERE p.it < {_PR_ITER}
      GROUP BY p.it, e2.dst_host
    )
    SELECT host, rank FROM pr WHERE it = {_PR_ITER} ORDER BY rank DESC, host
    """,
)
def host_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative host PageRank, cross-engine EXACT: the integer recurrence
    (operators/linkgraph.py) is replayed by DuckDB as a recursive CTE over
    the same staged edge list — ten iterations of joins + aggregates
    verified value-for-value, the strongest oracle shape in the catalog
    (iterative algorithms are normally written off as non-SQL-checkable)."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        host_edges,
        host_pagerank,
    )

    docs = _synth_docs(spark)
    edges = stage(host_edges(extract_outlinks(docs)), "pr_edges", partitions=4)
    return host_pagerank(edges, iterations=_PR_ITER, damping_pct=_PR_DAMP, scale=_PR_SCALE)


@q(
    "host_trustrank",
    f"""
    WITH RECURSIVE
    e AS (SELECT * FROM read_parquet('{staged_glob("tr_edges")}')),
    deg AS (SELECT src_host, COUNT(*) AS out_deg FROM e GROUP BY src_host),
    hosts AS (SELECT DISTINCT host FROM
              (SELECT src_host AS host FROM e UNION ALL SELECT dst_host AS host FROM e)),
    seeds AS (SELECT host FROM hosts
              WHERE host LIKE 'site-%'
                AND TRY_CAST(substr(host, 6, 2) AS INT) < 8),
    e2 AS (
      SELECT src_host, dst_host, FALSE AS phantom FROM e
      UNION ALL
      SELECT host, host, TRUE FROM hosts
    ),
    tr AS (
      SELECT 0 AS it, hosts.host,
             CAST(CASE WHEN s.host IS NOT NULL
                  THEN CAST({_PR_SCALE} AS BIGINT) // (SELECT COUNT(*) FROM seeds)
                  ELSE 0 END AS BIGINT) AS rank
      FROM hosts LEFT JOIN seeds s USING (host)
      UNION ALL
      SELECT p.it + 1, e2.dst_host AS host,
             CAST( CASE WHEN sd.host IS NOT NULL
                        THEN ((CAST({100 - _PR_DAMP} AS BIGINT) * {_PR_SCALE}) // 100)
                               // (SELECT COUNT(*) FROM seeds)
                        ELSE 0 END
                   + (CAST({_PR_DAMP} AS BIGINT)
                      * SUM(CASE WHEN e2.phantom THEN CAST(0 AS BIGINT)
                                 ELSE p.rank // d.out_deg END)) // 100
               AS BIGINT) AS rank
      FROM tr p
      JOIN e2 ON e2.src_host = p.host
      LEFT JOIN deg d ON d.src_host = p.host
      LEFT JOIN seeds sd ON sd.host = e2.dst_host
      WHERE p.it < {_PR_ITER}
      GROUP BY p.it, e2.dst_host, sd.host
    )
    SELECT host, rank FROM tr WHERE it = {_PR_ITER} ORDER BY rank DESC, host
    """,
)
def host_trustrank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer TrustRank (operators/linkgraph.host_trustrank): teleport
    mass restricted to a trusted seed set (here the deterministic
    site-00..07 hosts), so authority flows outward from vetted hosts and
    unreachable spam clusters starve. Cross-engine EXACT like
    ``host_pagerank``: the seeded integer recurrence is replayed by a
    DuckDB recursive CTE over the same staged edges, ten iterations
    verified value-for-value."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        host_edges,
        host_trustrank,
    )

    docs = _synth_docs(spark)
    edges = stage(host_edges(extract_outlinks(docs)), "tr_edges", partitions=4)
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    # try_cast + prefix guard: the graph also contains non-site hosts
    # (feed <link> targets like example.com), which must not crash the
    # seed rule under ANSI casting
    seeds = hosts.where(
        F.col("host").startswith("site-")
        & (F.substring("host", 6, 2).try_cast("int") < 8)
    )
    return host_trustrank(
        edges, seeds, iterations=_PR_ITER, damping_pct=_PR_DAMP, scale=_PR_SCALE
    )


@q(
    "host_spam_mass",
    f"""
    WITH RECURSIVE
    e AS (SELECT * FROM read_parquet('{staged_glob("sm_edges")}')),
    deg AS (SELECT src_host, COUNT(*) AS out_deg FROM e GROUP BY src_host),
    hosts AS (SELECT DISTINCT host FROM
              (SELECT src_host AS host FROM e UNION ALL SELECT dst_host AS host FROM e)),
    seeds AS (SELECT host FROM hosts
              WHERE host LIKE 'site-%'
                AND TRY_CAST(substr(host, 6, 2) AS INT) < 8),
    e2 AS (
      SELECT src_host, dst_host, FALSE AS phantom FROM e
      UNION ALL
      SELECT host, host, TRUE FROM hosts
    ),
    pr AS (
      SELECT 0 AS it, host,
             CAST(CAST({_PR_SCALE} AS BIGINT) // (SELECT COUNT(*) FROM hosts) AS BIGINT) AS rank
      FROM hosts
      UNION ALL
      SELECT p.it + 1, e2.dst_host AS host,
             CAST( ((CAST({100 - _PR_DAMP} AS BIGINT) * {_PR_SCALE}) // 100)
                     // (SELECT COUNT(*) FROM hosts)
                   + (CAST({_PR_DAMP} AS BIGINT)
                      * SUM(CASE WHEN e2.phantom THEN CAST(0 AS BIGINT)
                                 ELSE p.rank // d.out_deg END)) // 100
               AS BIGINT) AS rank
      FROM pr p
      JOIN e2 ON e2.src_host = p.host
      LEFT JOIN deg d ON d.src_host = p.host
      WHERE p.it < {_PR_ITER}
      GROUP BY p.it, e2.dst_host
    ),
    tr AS (
      SELECT 0 AS it, hosts.host,
             CAST(CASE WHEN s.host IS NOT NULL
                  THEN CAST({_PR_SCALE} AS BIGINT) // (SELECT COUNT(*) FROM seeds)
                  ELSE 0 END AS BIGINT) AS rank
      FROM hosts LEFT JOIN seeds s USING (host)
      UNION ALL
      SELECT p.it + 1, e2.dst_host AS host,
             CAST( CASE WHEN sd.host IS NOT NULL
                        THEN ((CAST({100 - _PR_DAMP} AS BIGINT) * {_PR_SCALE}) // 100)
                               // (SELECT COUNT(*) FROM seeds)
                        ELSE 0 END
                   + (CAST({_PR_DAMP} AS BIGINT)
                      * SUM(CASE WHEN e2.phantom THEN CAST(0 AS BIGINT)
                                 ELSE p.rank // d.out_deg END)) // 100
               AS BIGINT) AS rank
      FROM tr p
      JOIN e2 ON e2.src_host = p.host
      LEFT JOIN deg d ON d.src_host = p.host
      LEFT JOIN seeds sd ON sd.host = e2.dst_host
      WHERE p.it < {_PR_ITER}
      GROUP BY p.it, e2.dst_host, sd.host
    )
    SELECT pr.host, pr.rank AS pr_rank, tr.rank AS tr_rank,
           CAST(CASE WHEN pr.rank > 0
                THEN (greatest(pr.rank - tr.rank, 0) * 1000000) // pr.rank
                ELSE 0 END AS BIGINT) AS spam_mass_ppm,
           (CASE WHEN pr.rank > 0
                 THEN (greatest(pr.rank - tr.rank, 0) * 1000000) // pr.rank
                 ELSE 0 END) >= 700000 AS spam_flag
    FROM (SELECT host, rank FROM pr WHERE it = {_PR_ITER}) pr
    JOIN (SELECT host, rank FROM tr WHERE it = {_PR_ITER}) tr USING (host)
    ORDER BY spam_mass_ppm DESC, pr.host
    """,
)
def host_spam_mass_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative spam mass per host (operators/linkgraph.host_spam_mass,
    Gyöngyi et al.): the PageRank share NOT flowing from the trusted seeds
    — ``max(pr − tr, 0)·10^6 div pr`` with the same site-00..07 seed rule
    as ``host_trustrank``. The demotion signal a crawl pipeline pairs with
    content quality scores: link farms score near 10^6, seed-reachable
    hosts near 0. Cross-engine EXACT: BOTH integer recurrences are
    replayed by twin recursive CTEs over the same staged edge list, then
    the join + clamped integer division — the difference is clamped ≥ 0
    before dividing because Spark ``div`` truncates while DuckDB ``//``
    floors (they agree only on non-negatives)."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        host_edges,
        host_spam_mass,
    )

    docs = _synth_docs(spark)
    edges = stage(host_edges(extract_outlinks(docs)), "sm_edges", partitions=4)
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    seeds = hosts.where(
        F.col("host").startswith("site-")
        & (F.substring("host", 6, 2).try_cast("int") < 8)
    )
    return host_spam_mass(
        edges,
        seeds,
        iterations=_PR_ITER,
        damping_pct=_PR_DAMP,
        scale=_PR_SCALE,
        threshold_ppm=700_000,
    )


# scale 10^8: raw sums stay ≤ 2·10^18 even at 10^10 edges (int64-safe)
# while floor-division keeps resolution for the sub-dominant hosts; 4
# iterations — the Zipf-star host graph concentrates fast and more
# iterations just floor the tail to zero (measured: 12/36 hosts nonzero
# at K=4 vs 2/36 at K=8)
_HITS_SCALE, _HITS_ITER = 10**8, 4


@q(
    "host_hits",
    f"""
    WITH RECURSIVE
    e AS (SELECT src_host, dst_host FROM read_parquet('{staged_glob("hits_edges")}')),
    hosts AS (
      -- DISTINCT over UNION ALL, not plain UNION: inside WITH RECURSIVE
      -- DuckDB treats a CTE's top-level UNION as the recursion separator
      -- and skips its dedup (measured: 72 rows for 36 hosts)
      SELECT DISTINCT host FROM
      (SELECT src_host AS host FROM e UNION ALL SELECT dst_host AS host FROM e)
    ),
    st(it, host, hub, authority) AS (
      SELECT 0, host,
             CAST({_HITS_SCALE} // (SELECT COUNT(*) FROM hosts) AS BIGINT),
             CAST(0 AS BIGINT)
      FROM hosts
      UNION ALL
      SELECT * FROM (
        -- every phase derives from prev (which carries one row per host),
        -- so an empty prev (it = iteration cap) yields an empty step and
        -- the recursion terminates
        WITH prev AS (SELECT * FROM st WHERE it < {_HITS_ITER}),
        araw AS (
          SELECT prev.it, prev.host, CAST(COALESCE(s.raw, 0) AS BIGINT) AS a_raw
          FROM prev LEFT JOIN (
            SELECT e.dst_host AS host, SUM(prev.hub) AS raw
            FROM e JOIN prev ON e.src_host = prev.host
            GROUP BY e.dst_host
          ) s USING (host)
        ),
        anorm AS (
          SELECT it, host,
                 CAST(a_raw // GREATEST(1, SUM(a_raw) OVER () // {_HITS_SCALE}) AS BIGINT)
                   AS authority
          FROM araw
        ),
        hraw AS (
          SELECT anorm.it, anorm.host, CAST(COALESCE(s.raw, 0) AS BIGINT) AS h_raw
          FROM anorm LEFT JOIN (
            SELECT e.src_host AS host, SUM(anorm.authority) AS raw
            FROM e JOIN anorm ON e.dst_host = anorm.host
            GROUP BY e.src_host
          ) s USING (host)
        ),
        hnorm AS (
          SELECT it, host,
                 CAST(h_raw // GREATEST(1, SUM(h_raw) OVER () // {_HITS_SCALE}) AS BIGINT)
                   AS hub
          FROM hraw
        )
        SELECT hnorm.it + 1, hnorm.host, hnorm.hub, anorm.authority
        FROM hnorm JOIN anorm USING (it, host)
      )
    )
    SELECT host, hub, authority FROM st WHERE it = {_HITS_ITER}
    ORDER BY authority DESC, hub DESC, host
    """,
)
def host_hits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer HITS hubs & authorities over the host graph
    (operators/linkgraph.host_hits) — the authority/hub split PageRank
    can't provide (seed lists want authorities; spam farms show as hubs
    pointing at each other). Cross-engine EXACT like ``host_pagerank``:
    the all-integer recurrence (per-iteration L1 renormalization via
    ``div max(1, total div scale)``) is replayed by DuckDB as a recursive
    CTE over the same staged edges — eight iterations of two join+agg
    phases each, verified value-for-value."""
    from ocr_platform_spark.operators.linkgraph import extract_outlinks, host_edges, host_hits

    docs = _synth_docs(spark)
    edges = stage(host_edges(extract_outlinks(docs)), "hits_edges", partitions=4)
    return host_hits(edges, iterations=_HITS_ITER, scale=_HITS_SCALE)


@q(
    "doc_robots_rollup",
    f"""
    SELECT noindex, nofollow, COUNT(*) AS n_docs
    FROM read_parquet('{staged_glob("robots_flags")}')
    GROUP BY noindex, nofollow
    ORDER BY noindex, nofollow
    """,
)
def doc_robots_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots meta-directive census (kernels/robots.py): a deterministic
    third of the synth pages get a ``<meta name=robots>`` tag injected
    (rotating noindex / nofollow,noindex / none variants, single- and
    double-quoted), the Arrow kernel parses flags per url, and the staged
    flag table is rolled up by both engines. Parser edge cases (quote
    styles, attribute order, bot-specific metas ignored, multiple tags
    OR-ing) are pinned in tests/test_robots.py."""
    from ocr_platform_spark.operators.robots import meta_robots_flags

    docs = _synth_docs(spark)
    variant = F.pmod(F.xxhash64("url"), F.lit(9))
    tag = (
        F.when(variant == 0, F.lit(b'<meta name="robots" content="noindex">'))
        .when(variant == 1, F.lit(b"<meta content='nofollow, noindex' name='robots'>"))
        .when(variant == 2, F.lit(b'<meta name="ROBOTS" content="none">'))
        .otherwise(F.lit(b""))
    )
    tagged = docs.withColumn("html", F.concat(tag, F.col("html")))
    flags = stage(meta_robots_flags(tagged), "robots_flags", partitions=4)
    return (
        flags.groupBy("noindex", "nofollow")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("noindex", "nofollow")
    )


@q(
    "host_anchor_texts",
    f"""
    WITH e AS (
      SELECT regexp_extract(dst_url, '^https?://([^/?#]+)', 1) AS dst_host, anchor
      FROM read_parquet('{staged_glob("anchor_edges")}')
    ),
    per AS (SELECT dst_host, anchor, COUNT(*) AS n FROM e GROUP BY dst_host, anchor),
    top AS (
      SELECT dst_host, anchor AS top_anchor, CAST(n AS BIGINT) AS top_anchor_n,
             row_number() OVER (PARTITION BY dst_host ORDER BY n DESC, anchor) AS rn
      FROM per
    ),
    stats AS (
      SELECT dst_host, COUNT(*) AS n_links,
             COUNT(DISTINCT anchor) AS n_anchors
      FROM e GROUP BY dst_host
    )
    SELECT s.dst_host, s.n_links, s.n_anchors, t.top_anchor, t.top_anchor_n
    FROM stats s JOIN top t ON s.dst_host = t.dst_host AND t.rn = 1
    ORDER BY s.dst_host
    """,
)
def host_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation per target host — the off-page signal
    (what OTHER pages call a site: search relevance, spam phrase
    detection). The quote-aware anchor kernel
    (kernels/links.extract_links_with_anchors) stages (dst_url, anchor);
    both engines derive the host, count links and distinct anchors, and
    pick the deterministic top anchor (count desc, text asc) per host.
    Host-partitioned window — host-dimension-sized, never corpus-wide."""
    from ocr_platform_spark.operators.linkgraph import extract_outlink_anchors

    edges = stage(
        extract_outlink_anchors(_synth_docs(spark)).select("dst_url", "anchor"),
        "anchor_edges",
        partitions=4,
    )
    from ocr_platform_spark.operators.partitioning import host_of

    e = edges.select(host_of("dst_url").alias("dst_host"), "anchor")
    per = e.groupBy("dst_host", "anchor").agg(F.count("*").alias("n"))
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), "anchor")
    top = (
        per.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "dst_host",
            F.col("anchor").alias("top_anchor"),
            F.col("n").alias("top_anchor_n"),
        )
    )
    stats = e.groupBy("dst_host").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("anchor").alias("n_anchors"),
    )
    return stats.join(top, "dst_host").orderBy("dst_host")


def _noisy_url_sql() -> str:
    base = "'//Site-' || CAST(doc_id % 40 AS VARCHAR) || '.Example.org'"
    return f"""
      SELECT doc_id,
        CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN 'HTTPS:' || {base} || ':443/Page/' || CAST(doc_id AS VARCHAR)
                      || '/?utm_source=feed&q=' || CAST(doc_id AS VARCHAR) || '#top'
          WHEN 1 THEN 'http:' || lower({base}) || ':80/page/' || CAST(doc_id AS VARCHAR) || '/'
          WHEN 2 THEN 'https:' || lower({base}) || '/page/' || CAST(doc_id AS VARCHAR)
                      || '?gclid=abc&q=' || CAST(doc_id AS VARCHAR) || '&fbclid=z'
          ELSE 'https:' || lower({base}) || '/page/' || CAST(doc_id AS VARCHAR)
        END AS raw_url
      FROM documents
"""


@q(
    "url_canonicalization",
    (
        lambda: f"""
    WITH u AS ({_noisy_url_sql()})
    SELECT doc_id, raw_url,
           {__import__("ocr_platform_spark.functions.urlfns", fromlist=["canonical_sql"]).canonical_sql("raw_url")} AS canon_url
    FROM u ORDER BY doc_id
    """
    )(),
)
def url_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (the dedup key BEFORE content dedup): both
    engines synthesize the same noisy variants (case, default ports,
    tracking params, fragments, trailing slashes) and run the SAME
    canonicalization chain — Spark as column expressions, DuckDB via the
    dialect-translated mirror (functions/urlfns.py) — hash-compared
    per row."""
    from ocr_platform_spark.functions.urlfns import canonical_url

    d = _t(spark, sf_dir, "documents")
    base = F.concat(
        F.lit("//Site-"), F.pmod("doc_id", F.lit(40)).cast("string"), F.lit(".Example.org")
    )
    did = F.col("doc_id").cast("string")
    raw = (
        F.when(
            F.pmod("doc_id", F.lit(4)) == 0,
            F.concat(F.lit("HTTPS:"), base, F.lit(":443/Page/"), did,
                     F.lit("/?utm_source=feed&q="), did, F.lit("#top")),
        )
        .when(
            F.pmod("doc_id", F.lit(4)) == 1,
            F.concat(F.lit("http:"), F.lower(base), F.lit(":80/page/"), did, F.lit("/")),
        )
        .when(
            F.pmod("doc_id", F.lit(4)) == 2,
            F.concat(F.lit("https:"), F.lower(base), F.lit("/page/"), did,
                     F.lit("?gclid=abc&q="), did, F.lit("&fbclid=z")),
        )
        .otherwise(F.concat(F.lit("https:"), F.lower(base), F.lit("/page/"), did))
    )
    return (
        d.select("doc_id", raw.alias("raw_url"))
        .withColumn("canon_url", canonical_url("raw_url"))
        .orderBy("doc_id")
    )


#: GPT-2-family pretokenizer shape (contractions, letter runs, digit runs,
#: punctuation runs, whitespace), restricted to the RE2 ∩ Java common
#: subset — identical counts in both engines.
_BPE_PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


@q(
    "doc_bpe_tokens",
    f"""
    SELECT doc_id,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_PAT.replace(chr(39), chr(39) * 2)}')) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both faces the prompt asks for: whitespace tokens
    and a BPE-ish pretokenizer count (GPT-2 pattern family) — the unit a
    training-data budget is denominated in. Same regex in both engines."""
    from ocr_platform_spark.functions.textfns import token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@q(
    "doc_repetition",
    r"""
    WITH lines AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> x <> '') AS ls
      FROM documents
    ),
    line_stats AS (
      SELECT doc_id, len(ls) AS n_lines,
             CASE WHEN len(ls) > 0
                  THEN round(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls), 4)
                  ELSE 0.0 END AS dup_line_frac
      FROM lines
    ),
    grams AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(words) - 1, 1)),
               i -> array_to_string(words[i:i+1], ' '))) AS g
      FROM (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
        FROM documents
      )
    ),
    gram_counts AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ),
    gram_stats AS (
      SELECT doc_id,
             round(CAST(MAX(c) AS DOUBLE) / SUM(c), 4) AS top_bigram_frac
      FROM gram_counts GROUP BY doc_id
    )
    SELECT l.doc_id, l.n_lines, l.dup_line_frac,
           COALESCE(g.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM line_stats l LEFT JOIN gram_stats g ON l.doc_id = g.doc_id
    ORDER BY l.doc_id
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition gates (the Gopher-family curation signals): fraction of
    duplicated non-empty lines, and the most-frequent word-bigram's share
    of all bigrams — the two signals that catch boilerplate loops and
    machine-generated spam that length/stopword scores miss. Pure column
    expressions + one explode/agg; identical math in the oracle."""
    from ocr_platform_spark.functions.textfns import word_shingles

    d = _t(spark, sf_dir, "documents")
    lines = F.filter(
        F.transform(F.split("text", "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    line_stats = d.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.when(
            F.size(lines) > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(lines)).cast("double") / F.size(lines),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
    )
    grams = d.select("doc_id", F.explode(word_shingles("text", 2)).alias("g"))
    gram_stats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.max("c").cast("double") / F.sum("c"), 4).alias("top_bigram_frac"))
    )
    return (
        line_stats.join(gram_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@q(
    "corpus_length_deciles",
    r"""
    WITH h AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY n_chars),
    cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
             (SELECT SUM(c) FROM h) AS n
      FROM h
    ),
    d AS (SELECT unnest(generate_series(1, 10)) AS decile)
    SELECT d.decile, CAST(MIN(cum.v) AS BIGINT) AS value
    FROM d JOIN cum ON cum.cum * 10 >= cum.n * d.decile
    GROUP BY d.decile ORDER BY d.decile
    """,
)
def corpus_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT document-length deciles at corpus scale — without the global
    sort that makes naive exact quantiles a single-partition job. The trick
    is the integer domain: aggregate counts BY VALUE (the histogram — one
    map-side-combinable shuffle of distinct-value size, not corpus size),
    cumulative-sum over that tiny value table, and decile k is the smallest
    value whose running count reaches rank ceil(n·k/10) — expressed as the
    all-integer ``cum*10 ≥ n*k``. Distributed where it's big, exact where
    approx_percentile would hand back engine-specific sketch values (the
    same exact-twin discipline as host_cardinality_exact)."""
    d = _t(spark, sf_dir, "documents")
    h = d.groupBy(F.col("n_chars").alias("v")).agg(F.count("*").alias("c"))
    # the window runs over the distinct-VALUE table (tiny), never the corpus
    cum = h.select(
        "v", F.sum("c").over(Window.orderBy("v")).alias("cum")
    ).crossJoin(F.broadcast(h.agg(F.sum("c").alias("n"))))
    deciles = spark.range(1, 11).select(F.col("id").alias("decile"))
    return (
        F.broadcast(deciles)
        .join(cum, cum.cum * 10 >= F.col("n") * F.col("decile"))
        .groupBy("decile")
        .agg(F.min("v").alias("value"))
        .orderBy("decile")
    )


@q(
    "corpus_vocab_growth",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(
        list_transform(
          generate_series(1, greatest(len(words) - 2, 1)),
          i -> array_to_string(words[i:i+2], ' '))) AS term
      FROM (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
        FROM documents
      )
    ),
    firsts AS (SELECT term, MIN(doc_id) AS first_seen FROM toks GROUP BY term),
    mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    b AS (
      SELECT CAST(first_seen * 10 // n AS INT) AS decile
      FROM firsts, mx
    ),
    g AS (SELECT decile, COUNT(*) AS n_new_terms FROM b GROUP BY decile)
    SELECT decile, CAST(n_new_terms AS BIGINT) AS n_new_terms,
           CAST(SUM(n_new_terms) OVER (ORDER BY decile) AS BIGINT) AS vocab_size
    FROM g ORDER BY decile
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve — the corpus-analytics readout
    behind tokenizer sizing and dedup health checks (a flattening type
    curve on a growing crawl usually means near-duplicate flooding). The
    vocabulary unit is the 3-word shingle (the same convention as the
    Jaccard/MinHash family — single words saturate instantly on any
    corpus with a bounded lexicon); each shingle is attributed to the
    decile of the corpus where it FIRST appears (min(doc_id)), and the
    running sum of new-term counts is the vocabulary size after each
    tenth of the corpus. Scale shape: one vocabulary-keyed shuffle with
    map-side combine (explode → min(doc_id) per term); the cumulative
    window runs over 10 rows, never the corpus. Deciles are exact
    integer arithmetic (`* 10 div n`) in both engines — no float
    boundary drift."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(TX.word_shingles("text", 3)).alias("term")
    )
    firsts = toks.groupBy("term").agg(F.min("doc_id").alias("first_seen"))
    n = d.agg((F.max("doc_id") + 1).alias("n"))
    g = (
        firsts.crossJoin(F.broadcast(n))
        .select(F.expr("CAST(first_seen * 10 div n AS INT)").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("n_new_terms"))
    )
    # the window runs over at most 10 decile rows, never the corpus
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        "decile",
        F.col("n_new_terms").cast("long").alias("n_new_terms"),
        F.sum("n_new_terms").over(w).cast("long").alias("vocab_size"),
    ).orderBy("decile")


@q(
    "snapshot_expiry_plan",
    """
    WITH snaps AS (SELECT doc_id AS sid FROM documents WHERE doc_id < 10),
    refs AS (
      SELECT sid, unnest(generate_series(greatest(sid - 2, 0) * 10, sid * 10 + 9))
               AS file_id
      FROM snaps
    ),
    files AS (
      SELECT file_id,
             MAX(sid) AS last_ref,
             file_id // 10 AS owner,
             (file_id % 50 + 1) * 1024 AS bytes
      FROM refs GROUP BY file_id
    )
    SELECT owner AS snapshot_id,
           owner >= 7 AS retained,
           CAST(COUNT(*) AS BIGINT) AS n_files_owned,
           CAST(COUNT(CASE WHEN last_ref < 7 THEN 1 END) AS BIGINT)
             AS n_reclaimable,
           CAST(COALESCE(SUM(CASE WHEN last_ref < 7 THEN bytes END), 0) AS BIGINT)
             AS reclaimable_bytes
    FROM files GROUP BY owner ORDER BY snapshot_id
    """,
)
def snapshot_expiry_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot EXPIRY / garbage-collection planning — the table-
    maintenance sibling of storage_compaction_plan (Iceberg's
    expire_snapshots): under a keep-last-3 retention policy, a data file
    is reclaimable only when NO retained snapshot references it, so the
    plan computes each file's latest referencing snapshot over the
    reference explode (snapshots re-reference the previous two
    snapshots' files, modelling rewrite-on-compact) and rolls
    reclaimable counts/bytes up by owning snapshot. One explode + two
    keyed aggregates; at real scale the reference table is manifest
    metadata — millions of rows, not data — and the whole plan never
    touches payloads."""
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("sid")).where(
        F.col("sid") < 10
    )
    refs = d.select(
        "sid",
        F.explode(
            F.sequence(F.greatest(F.col("sid") - 2, F.lit(0)) * 10, F.col("sid") * 10 + 9)
        ).alias("file_id"),
    )
    files = refs.groupBy("file_id").agg(F.max("sid").alias("last_ref")).select(
        "file_id",
        "last_ref",
        F.expr("file_id div 10").alias("owner"),
        ((F.col("file_id") % 50 + 1) * 1024).alias("bytes"),
    )
    rec = F.col("last_ref") < 7
    return (
        files.groupBy("owner")
        .agg(
            F.count("*").cast("long").alias("n_files_owned"),
            F.count(F.when(rec, 1)).cast("long").alias("n_reclaimable"),
            F.coalesce(F.sum(F.when(rec, F.col("bytes"))), F.lit(0))
            .cast("long")
            .alias("reclaimable_bytes"),
        )
        .select(
            F.col("owner").alias("snapshot_id"),
            (F.col("owner") >= 7).alias("retained"),
            "n_files_owned",
            "n_reclaimable",
            "reclaimable_bytes",
        )
        .orderBy("snapshot_id")
    )


@q(
    "retrieval_rrf_fusion",
    f"""
    WITH hsrc AS (
      SELECT id, unnest(hs) AS h FROM read_parquet('{staged_glob("rrf_shingles")}')
    ),
    lexovl AS (
      SELECT q.id AS query_id, i.id AS item_id, COUNT(*) AS n_common
      FROM hsrc q JOIN hsrc i ON q.h = i.h AND i.id <> q.id
      WHERE q.id < 8 GROUP BY q.id, i.id
    ),
    lex AS (
      SELECT query_id, item_id,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY n_common DESC, item_id) AS INT)
               AS rank_lex
      FROM lexovl
    ),
    lex20 AS (SELECT * FROM lex WHERE rank_lex <= 20),
    qz AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE)
                             / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM (
        SELECT q.vec_id AS query_id, i.vec_id AS item_id,
               list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
               list_sum(list_transform(q.v, x -> x * x)) AS nq,
               list_sum(list_transform(i.v, x -> x * x)) AS ni
        FROM qz q, qz i WHERE q.vec_id < 8 AND i.vec_id <> q.vec_id
      )
    ),
    cos20 AS (
      SELECT query_id, item_id, CAST(rk AS INT) AS rank_cos FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
        FROM scored
      ) WHERE rk <= 20
    ),
    f AS (
      SELECT COALESCE(c.query_id, l.query_id) AS query_id,
             COALESCE(c.item_id, l.item_id) AS item_id,
             c.rank_cos, l.rank_lex,
             CAST(COALESCE(1000000 // (60 + c.rank_cos), 0)
                  + COALESCE(1000000 // (60 + l.rank_lex), 0) AS BIGINT)
               AS rrf_x1e6
      FROM cos20 c FULL OUTER JOIN lex20 l
        ON c.query_id = l.query_id AND c.item_id = l.item_id
    )
    SELECT query_id, item_id, rank_cos, rank_lex, rrf_x1e6,
           CAST(fr AS INT) AS fused_rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_x1e6 DESC, item_id) AS fr
      FROM f
    ) WHERE fr <= 5 ORDER BY query_id, fused_rank
    """,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of DENSE and LEXICAL retrieval — the
    hybrid-search combiner (Cormack et al.'s RRF, the default fusion in
    modern search stacks): each system contributes
    ``1_000_000 div (60 + rank)`` and items missing from one ranking
    simply contribute nothing, so neither score scale needs calibrating.
    Dense ranks come from the exact quantized-cosine top-20; lexical
    ranks from 3-word-shingle overlap counts over the STAGED xxhash
    postings (the MinHash family's shingle table, so the oracle replays
    the lexical side from the same rows and the dense side from the
    embeddings). All ranks and fusion scores are integers; both
    per-query windows are candidate-bounded, never corpus-wide."""
    from ocr_platform_spark.operators import ann as _ann

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    cos = _ann.quantized_topk(
        emb, emb.where(F.col("vec_id") < 8), id_col="vec_id", vec_col="embedding", k=20
    ).select("query_id", "item_id", F.col("rank").cast("int").alias("rank_cos"))
    hs = stage(
        dedup.hashed_shingle_sets(docs, "doc_id", "text"), "rrf_shingles", partitions=2
    )
    posts = hs.select("id", F.explode("hs").alias("h"))
    qp = posts.where(F.col("id") < 8).select(F.col("id").alias("query_id"), "h")
    ip = posts.select(F.col("id").alias("item_id"), "h")
    lex = (
        qp.join(ip, "h")
        .where(F.col("item_id") != F.col("query_id"))
        .groupBy("query_id", "item_id")
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "rank_lex",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy(F.desc("n_common"), "item_id"))
            .cast("int"),
        )
        .where(F.col("rank_lex") <= 20)
        .select("query_id", "item_id", "rank_lex")
    )
    fused = cos.join(lex, ["query_id", "item_id"], "full_outer").select(
        "query_id",
        "item_id",
        "rank_cos",
        "rank_lex",
        (
            F.coalesce(F.expr("1000000 div (60 + rank_cos)"), F.lit(0))
            + F.coalesce(F.expr("1000000 div (60 + rank_lex)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_x1e6"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_x1e6"), "item_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fused_rank") <= 5)
        .orderBy("query_id", "fused_rank")
    )


@q(
    "split_leakage_audit",
    f"""
    WITH leaders AS (SELECT doc_id, text FROM documents),
    docs AS (
      SELECT d.doc_id, md5(l.text) AS fp
      FROM documents d JOIN leaders l ON l.doc_id = d.doc_id - d.doc_id % 3
    ),
    assigned AS (
      SELECT doc_id, fp,
             CASE WHEN {oracle_bucket_sql("doc_id", 1000)} < 800 THEN 'train'
                  WHEN {oracle_bucket_sql("doc_id", 1000)} < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM docs
    ),
    per AS (
      SELECT fp,
             COUNT(CASE WHEN split = 'train' THEN 1 END) AS c_tr,
             COUNT(CASE WHEN split = 'val' THEN 1 END) AS c_va,
             COUNT(CASE WHEN split = 'test' THEN 1 END) AS c_te
      FROM assigned GROUP BY fp
    )
    SELECT split_a, split_b,
           CAST(SUM(np) AS BIGINT) AS n_pairs,
           CAST(COUNT(CASE WHEN np > 0 THEN 1 END) AS BIGINT) AS n_groups
    FROM (
      SELECT 'train' AS split_a, 'val' AS split_b, c_tr * c_va AS np FROM per
      UNION ALL
      SELECT 'train', 'test', c_tr * c_te FROM per
      UNION ALL
      SELECT 'test', 'val', c_te * c_va FROM per
    ) GROUP BY split_a, split_b ORDER BY split_a, split_b
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test LEAKAGE audit — duplicate content straddling split
    boundaries silently inflates eval scores, so every release needs
    this count: documents sharing a content fingerprint (each 3-group
    shares its leader's text by construction) roll up to per-(fp, split)
    counts, and cross-split pair totals come from count PRODUCTS per
    group — the audit never materializes a pair explode, so a
    pathological million-copy group costs one row of integer arithmetic
    instead of 10^12 pairs. Split assignment is the engine's own
    deterministic md5 bucketing (operators/sampling.assign_split), the
    same rule doc_split_assign oracles."""
    from ocr_platform_spark.operators.sampling import assign_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    leaders = d.select(F.col("doc_id").alias("lid"), F.col("text").alias("ltext"))
    docs = (
        d.withColumn("lid", F.col("doc_id") - F.col("doc_id") % 3)
        .join(F.broadcast(leaders), "lid")
        .select("doc_id", F.md5("ltext").alias("fp"))
    )
    assigned = assign_split(docs, "doc_id").select("doc_id", "fp", "split")
    per = assigned.groupBy("fp").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("c_tr"),
        F.count(F.when(F.col("split") == "val", 1)).alias("c_va"),
        F.count(F.when(F.col("split") == "test", 1)).alias("c_te"),
    )
    pairs = per.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("train").alias("split_a"),
                    F.lit("val").alias("split_b"),
                    (F.col("c_tr") * F.col("c_va")).alias("np"),
                ),
                F.struct(
                    F.lit("train").alias("split_a"),
                    F.lit("test").alias("split_b"),
                    (F.col("c_tr") * F.col("c_te")).alias("np"),
                ),
                F.struct(
                    F.lit("test").alias("split_a"),
                    F.lit("val").alias("split_b"),
                    (F.col("c_te") * F.col("c_va")).alias("np"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return (
        pairs.groupBy("split_a", "split_b")
        .agg(
            F.sum("np").cast("long").alias("n_pairs"),
            F.count(F.when(F.col("np") > 0, 1)).cast("long").alias("n_groups"),
        )
        .orderBy("split_a", "split_b")
    )


def _rake_oracle() -> str:
    from ocr_platform_spark.operators.keyphrases import rake_oracle_sql

    return rake_oracle_sql("documents", "doc_id", "text")


@q("doc_keyphrases", _rake_oracle())
def doc_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (operators/keyphrases.py; Rose et al.
    2010) — top-3 candidate phrases per document scored by summed
    word degree/frequency over stopword-delimited word runs: the
    unsupervised keyword surface behind tagging, routing and topic
    seeding. The stopword alternation has ONE source of truth from
    which both the Column chain and the oracle SQL derive, and scores
    are integer ×1000, so the full segmentation + scoring + per-doc
    top-k replays bit-for-bit in DuckDB. Doc-local keys throughout:
    word stats, phrase regroup and the top-k window all partition by
    doc."""
    from ocr_platform_spark.operators.keyphrases import rake_keyphrases

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return rake_keyphrases(d, "doc_id", "text", top_k=3).orderBy("doc_id", "rank")


@q(
    "host_mirror_detection",
    """
    WITH src AS (
      SELECT doc_id, 'site-' || CAST(doc_id % 12 AS VARCHAR) AS host, text
      FROM documents
    ),
    pages AS (
      SELECT s.doc_id, s.host,
             md5(CASE WHEN s.doc_id % 12 = 11 THEN m.text
                      WHEN s.doc_id % 12 = 5 AND s.doc_id % 24 = 5 THEN m.text
                      ELSE s.text END) AS h
      FROM src s LEFT JOIN src m ON m.doc_id = s.doc_id - 1
    ),
    hs AS (SELECT DISTINCT host, h FROM pages),
    sizes AS (SELECT host, COUNT(*) AS n FROM hs GROUP BY host),
    inter AS (
      SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS n_shared
      FROM hs a JOIN hs b ON a.h = b.h AND a.host < b.host
      GROUP BY a.host, b.host
    )
    SELECT i.host_a, i.host_b,
           CAST(i.n_shared AS BIGINT) AS n_shared,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST((1000 * i.n_shared) // (sa.n + sb.n - i.n_shared) AS BIGINT)
             AS jaccard_x1000,
           (1000 * i.n_shared) // (sa.n + sb.n - i.n_shared) >= 500 AS is_mirror
    FROM inter i
    JOIN sizes sa ON sa.host = i.host_a
    JOIN sizes sb ON sb.host = i.host_b
    ORDER BY host_a, host_b
    """,
)
def host_mirror_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIRROR-site detection by content-hash set overlap — the crawl-side
    dedup that catches whole hosts serving the same corpus under
    different names (CDNs, scrapers, country mirrors) before any
    document-level dedup runs: per-host distinct content-hash sets join
    on the hash, and host pairs with Jaccard ≥ 0.5 flag as mirrors (one
    synthetic full mirror and one partial-overlap pair exercise both
    sides of the gate). The hash join keys by CONTENT — a mega-host's
    pages spread across reducers — and the pair aggregate is
    host-pair-sized; nothing collects a per-host set into one row.
    Integer Jaccard (×1000, floor div) hashes identically
    cross-engine."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    src = d.select(
        "doc_id",
        F.concat(F.lit("site-"), (F.col("doc_id") % 12).cast("string")).alias("host"),
        "text",
    )
    prev = src.select((F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("ptext"))
    pages = (
        src.join(prev, "doc_id", "left")
        .select(
            "host",
            F.md5(
                F.when(F.col("doc_id") % 12 == 11, F.col("ptext"))
                .when(
                    (F.col("doc_id") % 12 == 5) & (F.col("doc_id") % 24 == 5),
                    F.col("ptext"),
                )
                .otherwise(F.col("text"))
            ).alias("h"),
        )
    )
    hs = pages.select("host", "h").distinct()
    sizes = hs.groupBy("host").agg(F.count("*").alias("n"))
    a = hs.select(F.col("host").alias("host_a"), "h")
    b = hs.select(F.col("host").alias("host_b"), "h")
    inter = (
        a.join(b, "h")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.expr("(1000 * n_shared) div (n_a + n_b - n_shared)")
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))),
            "host_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            jac.alias("jaccard_x1000"),
            (jac >= 500).alias("is_mirror"),
        )
        .orderBy("host_a", "host_b")
    )


@q(
    "corpus_release_diff",
    """
    WITH a AS (
      SELECT doc_id, lang, md5(text) AS h
      FROM documents WHERE doc_id % 17 <> 0
    ),
    b AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 23 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS h
      FROM documents WHERE doc_id % 19 <> 0
    ),
    j AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             COALESCE(a.lang, b.lang) AS lang,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.h <> b.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    )
    SELECT lang, status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM j GROUP BY lang, status ORDER BY lang, status
    """,
)
def corpus_release_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-manifest diff between two curation runs — the audit a
    dataset release ships with: per (lang, status) counts of docs added,
    removed, changed (same url, different content hash) and unchanged
    between release A and release B, from a single full-outer join on
    the doc key with hash comparison. At 10^12 docs the manifests are
    (id, lang, hash) projections — tiny beside the corpus — and the
    join keys by doc_id, so the diff costs one co-partitioned shuffle
    regardless of payload size. Both releases derive deterministically
    from the documents table; the oracle replays join and
    categorization."""
    d = _t(spark, sf_dir, "documents")
    a = d.where(F.col("doc_id") % 17 != 0).select(
        "doc_id", "lang", F.md5("text").alias("h")
    )
    b = d.where(F.col("doc_id") % 19 != 0).select(
        "doc_id",
        "lang",
        F.when(F.col("doc_id") % 23 == 0, F.md5(F.concat("text", F.lit("v2"))))
        .otherwise(F.md5("text"))
        .alias("h"),
    )
    j = (
        a.withColumnRenamed("lang", "lang_a").withColumnRenamed("h", "h_a")
        .join(
            b.withColumnRenamed("doc_id", "doc_id_b")
            .withColumnRenamed("lang", "lang_b")
            .withColumnRenamed("h", "h_b"),
            F.col("doc_id") == F.col("doc_id_b"),
            "full_outer",
        )
        .select(
            F.coalesce("lang_a", "lang_b").alias("lang"),
            F.when(F.col("doc_id").isNull(), F.lit("added"))
            .when(F.col("doc_id_b").isNull(), F.lit("removed"))
            .when(F.col("h_a") != F.col("h_b"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
    return (
        j.groupBy("lang", "status")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "status")
    )


@q(
    "events_hourly_incremental",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_micros
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_hourly_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate MAINTENANCE: the hourly rollup is kept as
    mergeable state — counts and integer-micros sums are commutative
    monoids — so a snapshot's aggregate plus a delta batch's aggregate
    FULL-OUTER-merge into the new total without touching old events
    (the materialized-view maintenance mechanic behind every streaming
    rollup; the Spark side literally stages the t0 state, aggregates
    only the t1 delta, and merges). The oracle is the strongest form of
    the check: it recomputes the rollup from ALL events in one pass, so
    the merged-state path must equal the full recompute bit-for-bit."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("v_micros"),
    )
    split = ev.agg(F.expr("(max(event_id) + 1) div 2").alias("s"))
    ev2 = ev.crossJoin(F.broadcast(split))

    def rollup(df):
        return df.groupBy("hour_start", "event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("v_micros").cast("long").alias("total_value_micros"),
        )

    t0_state = stage(
        rollup(ev2.where(F.col("event_id") < F.col("s"))), "hourly_state_t0"
    )
    delta = rollup(ev2.where(F.col("event_id") >= F.col("s"))).select(
        "hour_start",
        "event_type",
        F.col("n_events").alias("d_n"),
        F.col("total_value_micros").alias("d_v"),
    )
    merged = (
        t0_state.join(delta, ["hour_start", "event_type"], "full_outer")
        .select(
            "hour_start",
            "event_type",
            (F.coalesce("n_events", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
            .cast("long")
            .alias("n_events"),
            (F.coalesce("total_value_micros", F.lit(0)) + F.coalesce("d_v", F.lit(0)))
            .cast("long")
            .alias("total_value_micros"),
        )
    )
    return merged.orderBy("hour_start", "event_type")


@q(
    "shard_zonemap_skipping",
    """
    WITH ev AS (SELECT event_id, user_id FROM events),
    mx AS (
      SELECT MAX(event_id) + 1 AS n_ev, MAX(user_id) AS mu FROM ev
    ),
    shards AS (
      SELECT 'arrival' AS layout, (event_id * 8) // n_ev AS shard, user_id
      FROM ev, mx
      UNION ALL
      SELECT 'clustered' AS layout, (user_id * 8) // (mu + 1) AS shard, user_id
      FROM ev, mx
    ),
    zones AS (
      SELECT layout, shard, MIN(user_id) AS min_u, MAX(user_id) AS max_u,
             COUNT(*) AS n_rows
      FROM shards GROUP BY layout, shard
    ),
    probes AS (
      SELECT 'low' AS probe, 0 AS lo, mu // 10 AS hi FROM mx
      UNION ALL
      SELECT 'mid', mu // 2, mu // 2 + mu // 10 FROM mx
      UNION ALL
      SELECT 'high', mu - mu // 10, mu FROM mx
    )
    SELECT z.layout, p.probe,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(COUNT(CASE WHEN z.max_u < p.lo OR z.min_u > p.hi THEN 1 END)
                AS BIGINT) AS n_skipped,
           CAST(COALESCE(SUM(CASE WHEN NOT (z.max_u < p.lo OR z.min_u > p.hi)
                                  THEN z.n_rows END), 0) AS BIGINT)
             AS rows_scanned
    FROM zones z CROSS JOIN probes p
    GROUP BY z.layout, p.probe ORDER BY layout, probe
    """,
)
def shard_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-skipping report — the Iceberg/Parquet row-group
    pruning mechanic measured end to end: per-shard (min, max) of the
    probe column under an ARRIVAL-ORDER layout vs a value-CLUSTERED
    layout (the repartitionByRange write events_zorder_layout plans),
    against three range probes derived from the data's own extent.
    Arrival shards each span the full value range (zero skips — every
    probe scans everything); clustered shards are disjoint ranges, so a
    10%-selectivity probe skips ~7 of 8 shards. This is the quantified
    WHY behind sort-on-write: the report prices the layout decision in
    rows scanned. Pure integer bucketing/aggregation — no global sort
    is needed for the report itself."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    mx = ev.agg(
        (F.max("event_id") + 1).alias("n_ev"), F.max("user_id").alias("mu")
    )
    base = ev.crossJoin(F.broadcast(mx))
    shards = base.select(
        F.lit("arrival").alias("layout"),
        F.expr("(event_id * 8) div n_ev").alias("shard"),
        "user_id",
    ).unionAll(
        base.select(
            F.lit("clustered").alias("layout"),
            F.expr("(user_id * 8) div (mu + 1)").alias("shard"),
            "user_id",
        )
    )
    zones = shards.groupBy("layout", "shard").agg(
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.count("*").alias("n_rows"),
    )
    probes = (
        mx.select(F.lit("low").alias("probe"), F.lit(0).cast("long").alias("lo"),
                  F.expr("mu div 10").alias("hi"))
        .unionAll(
            mx.select(F.lit("mid").alias("probe"), F.expr("mu div 2").alias("lo"),
                      F.expr("mu div 2 + mu div 10").alias("hi"))
        )
        .unionAll(
            mx.select(F.lit("high").alias("probe"), F.expr("mu - mu div 10").alias("lo"),
                      F.col("mu").cast("long").alias("hi"))
        )
    )
    skipped = (F.col("max_u") < F.col("lo")) | (F.col("min_u") > F.col("hi"))
    return (
        zones.crossJoin(F.broadcast(probes))
        .groupBy("layout", "probe")
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.count(F.when(skipped, 1)).cast("long").alias("n_skipped"),
            F.coalesce(F.sum(F.when(~skipped, F.col("n_rows"))), F.lit(0))
            .cast("long")
            .alias("rows_scanned"),
        )
        .orderBy("layout", "probe")
    )


@q(
    "corpus_negative_sampling_table",
    r"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS n FROM toks GROUP BY word),
    top AS (
      SELECT word, n FROM freq ORDER BY n DESC, word LIMIT 64
    ),
    wt AS (
      SELECT word, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE))
                        * sqrt(sqrt(CAST(n AS DOUBLE))) * 1e6) AS BIGINT)
               AS weight_x1e6
      FROM top
    ),
    t AS (SELECT CAST(SUM(weight_x1e6) AS BIGINT) AS total FROM wt),
    b AS (
      SELECT word, n, weight_x1e6,
             (1000000 * weight_x1e6) // total AS base,
             (1000000 * weight_x1e6) % total AS rem
      FROM wt, t
    ),
    l AS (SELECT CAST(1000000 - SUM(base) AS BIGINT) AS leftover FROM b),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, word) AS rk FROM b)
    SELECT word, CAST(n AS BIGINT) AS n, weight_x1e6,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS slots,
           CAST(SUM(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
                  OVER (ORDER BY word) AS BIGINT) AS cum_end
    FROM r, l ORDER BY word
    """,
)
def corpus_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram^0.75 NEGATIVE-SAMPLING table (the word2vec/contrastive
    convention: damping the unigram distribution keeps frequent words
    from dominating the negatives) as an integer slot table a sampler
    binary-searches by ``cum_end``. The 3/4 power is computed as
    sqrt·sqrt∘sqrt — both correctly rounded per IEEE, the same
    cross-engine float discipline as the temperature mixtures — then
    floored to integer micro-weights, and exactly 1,000,000 slots are
    apportioned largest-remainder (rem DESC, word tie-break). Vocab is
    bounded to the top-64 (orderBy+limit → per-partition top-k); every
    window after that runs on ≤64 rows."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+", -1), lambda x: x != F.lit(""))
        ).alias("word")
    )
    freq = words.groupBy("word").agg(F.count("*").alias("n"))
    top = freq.orderBy(F.desc("n"), F.asc("word")).limit(64)
    nd = F.col("n").cast("double")
    wt = top.select(
        "word",
        "n",
        F.floor(F.sqrt(nd) * F.sqrt(F.sqrt(nd)) * F.lit(1e6)).cast("long").alias(
            "weight_x1e6"
        ),
    )
    tot = wt.agg(F.sum("weight_x1e6").cast("long").alias("total"))
    b = wt.crossJoin(tot).select(
        "word",
        "n",
        "weight_x1e6",
        F.expr("(1000000 * weight_x1e6) div total").alias("base"),
        (F.lit(1000000) * F.col("weight_x1e6") % F.col("total")).alias("rem"),
    )
    leftover = b.agg((F.lit(1000000) - F.sum("base")).cast("long").alias("leftover"))
    r = b.crossJoin(leftover).withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("word")))
    )
    slots = F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return r.select(
        "word",
        F.col("n").cast("long").alias("n"),
        "weight_x1e6",
        slots.cast("long").alias("slots"),
        F.sum(slots)
        .over(Window.orderBy("word").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_end"),
    ).orderBy("word")


@q(
    "corpus_oov_curve",
    r"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    ranked AS (
      SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk
      FROM freq
    ),
    tot AS (SELECT COUNT(*) AS total FROM toks),
    ks AS (SELECT unnest([256, 1024, 4096, 16384]) AS vocab_size)
    SELECT k.vocab_size,
           CAST(COALESCE(SUM(r.cnt), 0) AS BIGINT) AS covered,
           CAST(t.total AS BIGINT) AS total,
           CAST(t.total - COALESCE(SUM(r.cnt), 0) AS BIGINT) AS oov
    FROM ks k CROSS JOIN tot t
    LEFT JOIN ranked r ON r.rnk <= k.vocab_size
    GROUP BY k.vocab_size, t.total
    ORDER BY k.vocab_size
    """,
)
def corpus_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-budget OOV curve — the tokenizer-sizing readout that
    complements corpus_vocab_growth's Heaps law: for each candidate
    word-vocabulary size K (top-K terms by corpus frequency, ties broken
    by term), how many running tokens are covered and how many fall out
    of vocabulary. Pure integer counts so the curve hashes identically
    cross-engine. Scale shape: the term aggregate gets map-side combine;
    the global rank is bounded to the top max(K) rows by an orderBy+limit
    (TakeOrderedAndProject — per-partition top-k, no full sort) before a
    single-partition row_number over ≤16384 rows; the K table is four
    broadcast rows. Tie order (cnt DESC, term) is a total order, so both
    engines rank identically."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+", -1), lambda x: x != F.lit(""))
        ).alias("term")
    )
    freq = words.groupBy("term").agg(F.count("*").alias("cnt"))
    top = freq.orderBy(F.desc("cnt"), F.asc("term")).limit(16384)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term")))
    )
    total = words.agg(F.count("*").alias("total"))
    ks = spark.createDataFrame([(k,) for k in (256, 1024, 4096, 16384)], "vocab_size int")
    return (
        ks.join(ranked, F.col("rnk") <= F.col("vocab_size"), "left")
        .groupBy("vocab_size")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("covered"))
        .crossJoin(total)
        .select(
            "vocab_size",
            "covered",
            F.col("total").cast("long").alias("total"),
            (F.col("total") - F.col("covered")).cast("long").alias("oov"),
        )
        .orderBy("vocab_size")
    )


@q(
    "host_quality_rollup",
    r"""
    WITH c AS (
      SELECT doc_id, lang,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
        CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|that|with)\b')) AS DOUBLE) AS stops,
        CAST(length(text) - length(regexp_replace(text, '[.,;:!?()]', '', 'g')) AS DOUBLE) AS punct
      FROM documents
    ),
    d AS (
      SELECT 'site-' || CAST(doc_id % 40 AS VARCHAR) AS host, lang,
        CAST(round(round(
          least(toks / 100.0, 1.0) * 0.4
          + least((CASE WHEN toks > 0 THEN stops / toks ELSE 0.0 END) * 5.0, 1.0) * 0.3
          + (1.0 - least((CASE WHEN toks > 0 THEN punct / toks ELSE 1.0 END) * 2.0, 1.0)) * 0.3,
          4) * 1000) AS BIGINT) AS q_x1000
      FROM c
    )
    SELECT host,
           COUNT(*) AS n_docs,
           CAST(SUM(q_x1000) AS BIGINT) // COUNT(*) AS mean_quality_x1000,
           COUNT(CASE WHEN q_x1000 < 300 THEN 1 END) AS n_low_quality,
           COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
           (COUNT(CASE WHEN q_x1000 < 300 THEN 1 END) * 3 >= COUNT(*))
             OR (COUNT(CASE WHEN lang = 'en' THEN 1 END) * 2 < COUNT(*))
             AS host_flagged
    FROM d GROUP BY host ORDER BY host
    """,
)
def host_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level quality profile — the aggregation behind derived domain
    blocklists (UT1/RefinedWeb curate at the DOMAIN, not just the page):
    per-host doc count, mean quality (quality quantized to integer
    milli-units BEFORE summing, so the rollup is order-independent and
    cross-engine exact), low-quality share, language mix, and an
    all-integer spam flag (≥⅓ low-quality docs, or minority-English).
    Hosts here are the deterministic doc_id%40 assignment (the documents
    table carries no url; the real-url variant is host_link_graph's
    substrate). One hash aggregate on host — the 10^8-host scale shape."""
    d = _t(spark, sf_dir, "documents")
    q1000 = F.round(TX.quality_score("text") * 1000).cast("long")
    per_doc = d.select(
        F.concat(F.lit("site-"), (F.col("doc_id") % 40).cast("string")).alias("host"),
        "lang",
        q1000.alias("q_x1000"),
    )
    n_low = F.count(F.when(F.col("q_x1000") < 300, 1))
    n_en = F.count(F.when(F.col("lang") == "en", 1))
    return (
        per_doc.groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("sum(q_x1000) div count(*)").alias("mean_quality_x1000"),
            n_low.alias("n_low_quality"),
            n_en.alias("n_en"),
            ((n_low * 3 >= F.count("*")) | (n_en * 2 < F.count("*"))).alias(
                "host_flagged"
            ),
        )
        .orderBy("host")
    )


@q(
    "doc_compression_signal",
    f"""
    WITH s AS (SELECT * FROM read_parquet('{staged_glob("compress_sig")}')),
    v AS (
      SELECT id, n_bytes, z_bytes,
             CASE WHEN n_bytes > 0 THEN z_bytes * 1000 // n_bytes
                  ELSE 0 END AS ratio_x1000
      FROM s
    )
    SELECT id AS doc_id, n_bytes, z_bytes, ratio_x1000,
           ratio_x1000 < 430 AS too_repetitive,
           ratio_x1000 > 750 AS too_random,
           ratio_x1000 >= 430 AND ratio_x1000 <= 750 AS compression_keep
    FROM v ORDER BY doc_id
    """,
)
def doc_compression_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deflate-ratio quality gate (functions/compressfns.py): the Arrow-
    batched zlib kernel stages per-doc (uncompressed, compressed) byte
    counts; BOTH engines derive the integer ratio and the keep band from
    those same integers (floor division — no floats anywhere). The zlib
    kernel itself is pinned by tests/test_compressfns.py against direct
    zlib calls in the same interpreter."""
    from ocr_platform_spark.functions.compressfns import (
        compression_signal,
        compression_verdict,
    )

    d = _t(spark, sf_dir, "documents")
    sig = stage(compression_signal(d, "doc_id", "text"), "compress_sig", partitions=8)
    return (
        compression_verdict(sig, min_ratio_x1000=430, max_ratio_x1000=750)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


@q(
    "corpus_pack_sequences",
    f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, {oracle_bucket_sql('doc_id', 8)} AS shard_id,
             CAST(n_chars AS BIGINT) AS w
      FROM documents
    ),
    t AS (
      SELECT doc_id, shard_id, w,
             row_number() OVER (PARTITION BY shard_id ORDER BY doc_id) AS rn
      FROM base
    ),
    pack AS (
      SELECT shard_id, rn, doc_id, w,
             CAST(1 AS BIGINT) AS seq_id, w AS fill_after
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.shard_id, t.rn, t.doc_id, t.w,
             CASE WHEN p.fill_after + t.w <= 4000 THEN p.seq_id
                  ELSE p.seq_id + 1 END,
             CASE WHEN p.fill_after + t.w <= 4000 THEN p.fill_after + t.w
                  ELSE t.w END
      FROM pack p JOIN t ON t.shard_id = p.shard_id AND t.rn = p.rn + 1
    )
    SELECT doc_id, shard_id, seq_id, fill_after
    FROM pack ORDER BY shard_id, doc_id
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py): greedy first-fit-in-order
    assignment of whole documents to ≤4000-weight sequences, packed
    independently within each of 8 md5 shards — the distributed shape real
    training-prep uses (pack per output file, no cross-shard state). The
    order-dependent greedy recurrence is replayed bit-for-bit by DuckDB as
    a recursive CTE stepping one rank per iteration with every shard
    advancing in parallel — the same oracle family as host_pagerank and
    doc_dedup_clusters, extended to order-dependent per-group state."""
    from ocr_platform_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(
        d, "doc_id", "n_chars", budget=4000, n_shards=8
    ).orderBy("shard_id", "doc_id")


@q(
    "corpus_shard_manifest",
    f"""
    WITH b AS (
      SELECT doc_id, n_chars,
             {oracle_bucket_sql('doc_id', 16)} AS shard_id
      FROM documents
    )
    SELECT shard_id, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_key, MAX(doc_id) AS max_key
    FROM b GROUP BY shard_id ORDER BY shard_id
    """,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-sink write audit (sources/shards.py): the documents table is
    physically written as 16 md5-bucketed shard directories, and the
    manifest the sink computes FROM THE WRITTEN FILES is compared against
    DuckDB recomputing the assignment from the raw table — proving every
    row landed exactly once in its deterministic shard. The oracle is the
    sink check, not just the bucket math (the bucket expression itself is
    the already-oracled sampling dialect pair)."""
    import os as _os

    from ocr_platform_spark.sources.shards import write_sharded
    from ocr_platform_spark.staging import STAGE_ROOT

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return write_sharded(
        d, _os.path.join(STAGE_ROOT, "shard_sink"), "doc_id", 16
    )


@q(
    "doc_lm_score",
    r"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(words) - 1, 1)),
               i -> array_to_string(words[i:i+1], ' '))) AS bigram
      FROM t
    ),
    ref AS (
      SELECT bigram, COUNT(*) AS c FROM g WHERE doc_id % 5 = 0
      GROUP BY bigram HAVING COUNT(*) >= 2
    )
    SELECT g.doc_id,
           COUNT(*) AS n_bigrams,
           COUNT(CASE WHEN ref.c IS NULL THEN 1 END) AS n_oov,
           CAST(COALESCE(SUM(CASE WHEN ref.c IS NOT NULL
                                  THEN length(bin(ref.c)) END), 0) AS BIGINT)
             AS bits_total,
           CAST(COALESCE(SUM(CASE WHEN ref.c IS NOT NULL
                                  THEN length(bin(ref.c)) END), 0) AS DOUBLE)
             / COUNT(*) AS bits_per_gram,
           (COALESCE(SUM(CASE WHEN ref.c IS NOT NULL
                               THEN length(bin(ref.c)) END), 0) * 1 >= COUNT(*) * 3)
             AND (COUNT(CASE WHEN ref.c IS NULL THEN 1 END) * 100 <= COUNT(*) * 10)
             AS lm_keep
    FROM g LEFT JOIN ref USING (bigram)
    WHERE g.doc_id % 5 <> 0
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality gate (operators/lmscore.py): bigram counts
    trained on the reference slice (``doc_id % 5 = 0`` plays the clean
    corpus), every other document scored by the integer bit-length
    surrogate of its grams' reference counts, head-bucket keep decided by
    all-integer threshold comparisons. The oracle retrains the count table
    and rescores from the raw parquet — no staging, fully cross-engine
    exact (the only double is one final exact-int division per row)."""
    from ocr_platform_spark.operators.lmscore import lm_score, reference_bigram_counts

    d = _t(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 5 == 0)
    counts = reference_bigram_counts(ref, "doc_id", "text", min_count=2)
    return lm_score(
        d.where(F.col("doc_id") % 5 != 0), counts, "doc_id", "text"
    ).orderBy("doc_id")


@q(
    "doc_tfidf_terms",
    r"""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
      FROM documents WHERE trim(COALESCE(text, '')) <> ''
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS INT) AS tf FROM w GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(*) AS INT) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * length(bin((2 * n.n) // df.df)) AS INT) AS w
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, w, CAST(rn AS INT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY w DESC, term) AS rn
      FROM scored) WHERE rn <= 3
    ORDER BY doc_id, rank
    """,
)
def doc_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by exact-integer
    tf-idf — ``tf × bits(2N // df)``, the same bit-length idf surrogate as
    the BM25 search ranking (monotone in log(N/df), zero float logs) — the
    document-tagging face of the inverted index. One explode, two hash
    aggregates (term df is vocabulary-sized and broadcast back), one
    per-doc window. Direct SQL oracle over raw parquet, no staging."""
    from ocr_platform_spark.functions.textfns import normalized_text

    d = _t(spark, sf_dir, "documents").where(
        F.trim(F.coalesce("text", F.lit(""))) != ""
    )
    words = d.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").cast("int").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").cast("int").alias("df"))
    n = tf.select("doc_id").distinct().count()
    scored = tf.join(F.broadcast(df_t), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.length(F.bin(F.floor(F.lit(2 * n) / F.col("df")))))
        .cast("int")
        .alias("w"),
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("w"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .where(F.col("rank") <= 3)
        .orderBy("doc_id", "rank")
    )


_CLF_VOCAB = [
    "ablation", "basalt", "cobalt", "delta", "ember", "fjord",
    "garnet", "harbor", "isotope", "jasper", "kelvin", "lumen",
    "meridian", "nickel", "obsidian", "pylon", "quartz", "rivet",
    "sextant", "tungsten", "umbra", "vertex", "wharf", "xenon",
]


@q(
    "doc_topic_classifier",
    f"""
    WITH t AS (
      SELECT doc_id, label,
             list_distinct(regexp_split_to_array(text, ' ')) AS toks
      FROM read_parquet('{staged_glob("clf_corpus")}')
    ),
    tok AS (SELECT doc_id, label, unnest(toks) AS token FROM t),
    w AS (
      SELECT label, token, CAST(length(bin(COUNT(*))) AS INT) AS w
      FROM tok WHERE doc_id % 5 <> 0
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    scored AS (
      SELECT tok.doc_id, tok.label AS actual, w.label AS cand, SUM(w.w) AS score
      FROM tok JOIN w ON tok.token = w.token
      WHERE tok.doc_id % 5 = 0
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, actual, cand AS predicted FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT actual, predicted, COUNT(*) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY actual, predicted
    """,
)
def doc_topic_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained document classifier — the fastText-classifier slot of a
    corpus pipeline (operators/classify.py): integer Naive-Bayes over
    distinct-token presence. The labeled corpus is synthesized
    deterministically in-query (three topics drawing 40 tokens each from
    overlapping 12-token slices of a 24-token vocabulary — neighbor
    topics share half their vocabulary, so classification requires the
    learned weights, not a lookup) and STAGED; both engines then train on
    the ``doc_id % 5 != 0`` split and score the held-out fifth from the
    same bytes. Training and inference are exact-integer (bit-length
    weights, integer sums, lexicographic tie-break), so the oracle
    retrains the entire model and reproduces every prediction — a
    cross-engine-exact supervised learner. Map-side deployment twin
    pinned equal in tests/test_classify.py."""
    from ocr_platform_spark.operators.classify import (
        classify_documents,
        confusion_matrix,
        train_class_token_weights,
    )

    vocab = F.array(*[F.lit(t) for t in _CLF_VOCAB])
    labels = F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma"))
    base = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.element_at(labels, (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("label"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.element_at(
                    vocab,
                    (
                        F.pmod("id", F.lit(3)) * 6
                        + F.pmod(F.xxhash64(F.col("id"), j), F.lit(12))
                        + 1
                    ).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    corpus = stage(base, "clf_corpus")
    train = corpus.where(F.col("doc_id") % 5 != 0)
    test = corpus.where(F.col("doc_id") % 5 == 0)
    weights = train_class_token_weights(train, "label", "doc_id", "text", min_count=2)
    pred = classify_documents(test, weights, "doc_id", "text")
    return confusion_matrix(pred, test, "doc_id", "label")


@q(
    "doc_topic_classifier_tf",
    f"""
    WITH t AS (
      SELECT doc_id, label, regexp_split_to_array(text, ' ') AS toks
      FROM read_parquet('{staged_glob("clf_tf_corpus")}')
    ),
    tok AS (SELECT doc_id, label, unnest(toks) AS token FROM t),
    counts AS (
      SELECT label, token, COUNT(*) AS c
      FROM tok WHERE doc_id % 5 <> 0 GROUP BY 1, 2
    ),
    totals AS (SELECT label, SUM(c) AS class_total FROM counts GROUP BY 1),
    w AS (
      SELECT counts.label, token,
             CAST(length(bin((c * 16384) // class_total)) AS INT) AS w
      FROM counts JOIN totals ON counts.label = totals.label
      WHERE c >= 2
    ),
    scored AS (
      SELECT tok.doc_id, tok.label AS actual, w.label AS cand, SUM(w.w) AS score
      FROM tok JOIN w ON tok.token = w.token
      WHERE tok.doc_id % 5 = 0
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, actual, cand AS predicted FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT actual, predicted, COUNT(*) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY actual, predicted
    """,
)
def doc_topic_classifier_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial twin of ``doc_topic_classifier`` — the
    frequency-signal corpus case (operators/classify.py
    ``mode="multinomial"`` + ``per_occurrence=True``). Every class shares
    the SAME 12-token vocabulary, so token PRESENCE carries zero signal
    (the Bernoulli model is structurally blind here); each class instead
    over-samples its own 4-token block (~2× frequency). Weights are the
    bit length of a 2^14-scaled integer P(token|class) — exact in both
    engines — and scoring sums weights per OCCURRENCE. The oracle retrains
    the whole model from the staged corpus and reproduces every held-out
    prediction, like its presence-mode sibling."""
    from ocr_platform_spark.operators.classify import (
        classify_documents,
        confusion_matrix,
        train_class_token_weights,
    )

    vocab = F.array(*[F.lit(t) for t in _CLF_VOCAB[:12]])
    labels = F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma"))
    cls = F.pmod("id", F.lit(3))
    # token draw: r ∈ [0, 18); r < 12 → uniform over the shared vocab,
    # r ≥ 12 → the class's own 4-token block (the frequency skew)
    def _tok(j):
        r = F.pmod(F.xxhash64(F.col("id"), j), F.lit(18))
        idx = F.when(r < 12, r).otherwise(cls * 4 + F.pmod(r, F.lit(4)))
        return F.element_at(vocab, (idx + 1).cast("int"))

    base = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.element_at(labels, (cls + 1).cast("int")).alias("label"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), F.lit(39)), _tok)
        ).alias("text"),
    )
    corpus = stage(base, "clf_tf_corpus")
    train = corpus.where(F.col("doc_id") % 5 != 0)
    test = corpus.where(F.col("doc_id") % 5 == 0)
    weights = train_class_token_weights(
        train, "label", "doc_id", "text", min_count=2, mode="multinomial"
    )
    pred = classify_documents(test, weights, "doc_id", "text", per_occurrence=True)
    return confusion_matrix(pred, test, "doc_id", "label")


@q(
    "quality_threshold_sweep",
    f"""
    WITH t AS (
      SELECT doc_id, label,
             list_distinct(regexp_split_to_array(text, ' ')) AS toks
      FROM read_parquet('{staged_glob("qsweep_corpus")}')
    ),
    tok AS (SELECT doc_id, label, unnest(toks) AS token FROM t),
    w AS (
      SELECT label, token, CAST(length(bin(COUNT(*))) AS INT) AS w
      FROM tok WHERE doc_id % 5 <> 0
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    m AS (
      SELECT tok.doc_id,
             CAST(SUM(CASE WHEN w.label = 'quality' THEN w.w ELSE 0 END)
                  AS BIGINT) AS pos_score,
             CAST(SUM(CASE WHEN w.label = 'spam' THEN w.w ELSE 0 END)
                  AS BIGINT) AS neg_score
      FROM tok JOIN w ON tok.token = w.token
      WHERE tok.doc_id % 5 = 0
      GROUP BY 1
    ),
    j AS (
      SELECT m.doc_id, m.pos_score - m.neg_score AS margin, t.label AS actual
      FROM m JOIN (SELECT DISTINCT doc_id, label
                   FROM read_parquet('{staged_glob("qsweep_corpus")}')) t
           USING (doc_id)
    ),
    cfg(threshold) AS (VALUES (-6), (-4), (-2), (0), (2), (4), (6)),
    kept AS (
      SELECT cfg.threshold, COUNT(*) AS n_kept,
             CAST(SUM(CASE WHEN actual = 'quality' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos_kept
      FROM cfg JOIN j ON j.margin >= cfg.threshold GROUP BY 1
    ),
    tot AS (
      SELECT COUNT(*) AS n_scored,
             CAST(SUM(CASE WHEN actual = 'quality' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos_total
      FROM j
    )
    SELECT CAST(cfg.threshold AS INT) AS threshold,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.n_pos_kept, 0) AS n_pos_kept,
           tot.n_pos_total, tot.n_scored,
           CASE WHEN COALESCE(k.n_kept, 0) > 0
                THEN round(CAST(COALESCE(k.n_pos_kept, 0) AS DOUBLE)
                           / k.n_kept, 4)
           END AS "precision",
           CASE WHEN tot.n_pos_total > 0
                THEN round(CAST(COALESCE(k.n_pos_kept, 0) AS DOUBLE)
                           / tot.n_pos_total, 4)
           END AS recall,
           CASE WHEN tot.n_scored > 0
                THEN round(CAST(COALESCE(k.n_kept, 0) AS DOUBLE)
                           / tot.n_scored, 4)
           END AS keep_rate
    FROM cfg CROSS JOIN tot
    LEFT JOIN kept k ON k.threshold = cfg.threshold
    ORDER BY threshold
    """,
)
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier threshold calibration (operators/classify.
    class_margin_scores + threshold_sweep) — the FineWeb-Edu / DCLM recipe:
    train a binary quality-vs-spam model, score held-out labeled docs with
    the integer margin (quality evidence minus spam evidence), and sweep
    the keep threshold, reporting precision / recall / keep-rate per cut so
    a user picks the threshold by target precision or token budget instead
    of defaulting to argmax. The labeled corpus is synthesized
    deterministically in-query (two classes drawing 40 tokens each from
    overlapping 15-token slices of a 24-token vocabulary — 6 shared tokens
    make margins spread instead of saturating) and STAGED; both engines
    retrain the presence model on the ``doc_id % 5 != 0`` split, recompute
    every margin, and replay the whole sweep. All-integer until the final
    correctly-rounded ratio columns."""
    from ocr_platform_spark.operators.classify import (
        class_margin_scores,
        threshold_sweep,
        train_class_token_weights,
    )

    vocab = F.array(*[F.lit(t) for t in _CLF_VOCAB])
    labels = F.array(F.lit("quality"), F.lit("spam"))
    cls = F.pmod("id", F.lit(2))
    base = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.element_at(labels, (cls + 1).cast("int")).alias("label"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.element_at(
                    vocab,
                    (
                        cls * 9
                        + F.pmod(F.xxhash64(F.col("id"), j), F.lit(15))
                        + 1
                    ).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    corpus = stage(base, "qsweep_corpus")
    train = corpus.where(F.col("doc_id") % 5 != 0)
    test = corpus.where(F.col("doc_id") % 5 == 0)
    weights = train_class_token_weights(train, "label", "doc_id", "text", min_count=2)
    margins = class_margin_scores(
        test, weights, "doc_id", "text", pos_label="quality", neg_label="spam"
    )
    return threshold_sweep(
        margins, corpus, "doc_id", "label", pos_label="quality"
    ).orderBy("threshold")


@q(
    "url_bloom_resume",
    f"""
    WITH flags AS (SELECT * FROM read_parquet('{staged_glob("bloom_flags")}')),
    truth AS (SELECT doc_id, (doc_id % 3 = 0) AS seen FROM documents)
    SELECT COUNT(*) AS n_input,
           CAST(SUM(CASE WHEN t.seen THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
           CAST(SUM(CASE WHEN NOT f.maybe_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_definitely_new,
           CAST(SUM(CASE WHEN f.maybe_seen AND NOT t.seen THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN NOT f.maybe_seen AND t.seen THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           CAST(SUM(CASE WHEN NOT t.seen THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM flags f JOIN truth t USING (doc_id)
    """,
)
def url_bloom_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental resume (operators/bloom.py): the seen
    set becomes a distributed 64-bit-word bitmap (one bit_or aggregate);
    probe keys the filter rejects are DEFINITELY new and bypass the exact
    anti-join; only the maybe-seen sliver joins. The per-key decisions are
    staged, and the report's n_pending comes from actually running
    ``bloom_resume`` — so the oracle's exact NOT-seen count hash-gates the
    operator's output (an approximate structure with an exact contract:
    false positives cost work, never correctness; n_false_neg is the
    no-false-negatives invariant and must be 0)."""
    from ocr_platform_spark.operators.bloom import (
        bloom_resume,
        bloom_words,
        with_bloom_flag,
    )

    n_bits, k = 1 << 14, 4  # ~10 bits/key at sf0.1's 1.7k seen → ~1% fpp
    d = _t(spark, sf_dir, "documents").select("doc_id")
    seen = d.where(F.col("doc_id") % 3 == 0)
    words = bloom_words(seen, "doc_id", n_bits, k)
    flags = stage(
        with_bloom_flag(d, "doc_id", words, n_bits, k).select("doc_id", "maybe_seen"),
        "bloom_flags",
    )
    n_pending = bloom_resume(d, seen, "doc_id", n_bits, k).count()
    truth = d.select("doc_id", (F.col("doc_id") % 3 == 0).alias("seen"))
    return (
        flags.join(truth, "doc_id")
        .agg(
            F.count("*").alias("n_input"),
            F.sum(F.when(F.col("seen"), 1).otherwise(0)).cast("long").alias("n_seen"),
            F.sum(F.when(~F.col("maybe_seen"), 1).otherwise(0))
            .cast("long")
            .alias("n_definitely_new"),
            F.sum(F.when(F.col("maybe_seen") & ~F.col("seen"), 1).otherwise(0))
            .cast("long")
            .alias("n_false_pos"),
            F.sum(F.when(~F.col("maybe_seen") & F.col("seen"), 1).otherwise(0))
            .cast("long")
            .alias("n_false_neg"),
        )
        .withColumn("n_pending", F.lit(n_pending).cast("long"))
    )


@q(
    "url_revisit_diff",
    f"""
    WITH d AS (
      SELECT doc_id, text,
             {oracle_bucket_sql("doc_id", 3, "rv")} AS b3,
             {oracle_bucket_sql("doc_id", 2, "rvc")} = 0 AS c1,
             {oracle_bucket_sql("doc_id", 2, "rvd")} = 0 AS c2
      FROM documents
    ),
    snaps AS (
      SELECT doc_id, 0 AS cycle, text AS snap_text FROM d
      UNION ALL
      SELECT doc_id, 1, CASE WHEN c1 THEN text || ' rev1' ELSE text END
      FROM d WHERE b3 < 2
      UNION ALL
      SELECT doc_id, 2,
             CASE WHEN c2 THEN (CASE WHEN c1 THEN text || ' rev1' ELSE text END) || ' rev2'
                  ELSE (CASE WHEN c1 THEN text || ' rev1' ELSE text END) END
      FROM d WHERE b3 = 0
    ),
    dig AS (
      SELECT doc_id, cycle, md5(snap_text) AS digest,
             lag(md5(snap_text)) OVER (PARTITION BY doc_id ORDER BY cycle) AS prev
      FROM snaps
    ),
    flags AS (
      SELECT doc_id, cycle,
             CASE WHEN prev IS NULL THEN FALSE ELSE digest <> prev END AS changed
      FROM dig
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_snapshots,
           CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
           CAST(MAX(cycle) AS INT) AS latest_cycle,
           arg_max(changed, cycle) AS latest_changed,
           CAST(CASE WHEN COUNT(*) > 1
                THEN (SUM(CASE WHEN changed THEN 1 ELSE 0 END) * 1000) // (COUNT(*) - 1)
                ELSE 0 END AS BIGINT) AS change_rate_pm
    FROM flags GROUP BY doc_id ORDER BY doc_id
    """,
)
def url_revisit_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-crawl change detection — the CDX/WARC-revisit shape: a crawler
    refetches pages across cycles, and only content whose digest CHANGED
    should re-enter extraction (unchanged snapshots become 'revisit'
    records, the other half of the Bloom/anti-join resume story). The
    corpus has one snapshot per doc, so revisit cycles are synthesized
    deterministically (md5-bucketed: 2/3 of docs get a second fetch, 1/3 a
    third; a bucketed subset mutates per cycle). Per page: digest lag
    comparison per cycle → change count, latest-cycle changed flag (the
    reprocess gate), and an integer per-mille change rate — the adaptive
    revisit-frequency signal (change-rate-proportional scheduling).
    One window + one aggregate, both partitioned on doc_id — at 10^12
    snapshots this shuffles each url's handful of rows once."""
    from ocr_platform_spark.operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b3 = hash_bucket("doc_id", 3, "rv")
    c1 = hash_bucket("doc_id", 2, "rvc") == 0
    c2 = hash_bucket("doc_id", 2, "rvd") == 0
    t1 = F.when(c1, F.concat(F.col("text"), F.lit(" rev1"))).otherwise(F.col("text"))
    t2 = F.when(c2, F.concat(t1, F.lit(" rev2"))).otherwise(t1)
    snaps = (
        d.select("doc_id", F.lit(0).alias("cycle"), F.col("text").alias("snap_text"))
        .unionByName(
            d.where(b3 < 2).select("doc_id", F.lit(1).alias("cycle"), t1.alias("snap_text"))
        )
        .unionByName(
            d.where(b3 == 0).select("doc_id", F.lit(2).alias("cycle"), t2.alias("snap_text"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy("cycle")
    flags = snaps.select(
        "doc_id",
        "cycle",
        F.md5("snap_text").alias("digest"),
        F.lag(F.md5("snap_text")).over(w).alias("prev"),
    ).select(
        "doc_id",
        "cycle",
        F.when(F.col("prev").isNull(), F.lit(False))
        .otherwise(F.col("digest") != F.col("prev"))
        .alias("changed"),
    )
    n_changes = F.sum(F.when(F.col("changed"), 1).otherwise(0)).cast("long")
    return (
        flags.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_snapshots"),
            n_changes.alias("n_changes"),
            F.max("cycle").cast("int").alias("latest_cycle"),
            F.max_by("changed", "cycle").alias("latest_changed"),
        )
        .withColumn(
            "change_rate_pm",
            F.when(
                F.col("n_snapshots") > 1,
                F.expr("(n_changes * 1000) div (n_snapshots - 1)"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .orderBy("doc_id")
    )


_SEARCH_TERMS = ("window", "merge", "customer")


@q(
    "corpus_keyword_search",
    rf"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(toks) AS token FROM t
    ),
    q AS (SELECT unnest({list(_SEARCH_TERMS)}) AS token),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok JOIN q USING (token) GROUP BY 1, 2
    ),
    idf AS (
      SELECT token,
             CAST(length(bin((2 * (SELECT COUNT(*) FROM t)) // COUNT(DISTINCT doc_id))) AS INT) AS w
      FROM tok JOIN q USING (token) GROUP BY token
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score, CAST(rk AS INT) AS rank FROM (
      SELECT tf.doc_id, SUM(LEAST(tf.tf, 3) * idf.w) AS score,
             row_number() OVER (ORDER BY SUM(LEAST(tf.tf, 3) * idf.w) DESC, tf.doc_id) AS rk
      FROM tf JOIN idf USING (token)
      GROUP BY tf.doc_id
    ) WHERE rk <= 20
    ORDER BY rank
    """,
)
def corpus_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-family keyword retrieval over the corpus — the audit/search
    tool a dataset build uses to inspect what made it in ("find eval-set
    lookalikes", "show me the spammiest docs for term X"). Exact-integer
    ranking: tf saturated at 3 (BM25's k1 saturation, integerized), idf =
    bit length of 2N // df (the log(N/df) surrogate in the repo's integer
    family) — every score an integer SUM, replayed by DuckDB from raw
    parquet with no staging. Map-side: the idf table is term-count-sized
    and broadcast; the only corpus shuffle is the per-doc tf aggregate."""
    d = _t(spark, sf_dir, "documents")
    from ocr_platform_spark.functions.textfns import normalized_text

    toks = d.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("token")
    ).where(F.col("token").isin(list(_SEARCH_TERMS)))
    n_docs = d.count()
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    idf = (
        toks.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            "token",
            F.length(F.bin(F.expr(f"CAST({2 * n_docs} AS BIGINT) div df")))
            .cast("int")
            .alias("w"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .groupBy("doc_id")
        .agg(F.sum(F.least("tf", F.lit(3)) * F.col("w")).cast("long").alias("score"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject (distributed top-k
    # merge); the ranking window then runs over 20 rows only
    top = scored.orderBy(F.desc("score"), "doc_id").limit(20)
    w = Window.orderBy(F.desc("score"), "doc_id")
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("int").alias("rank")
    ).orderBy("rank")


_BPE_MERGES = 8


def _bpe_seq_retrain_sql(words_stage: str) -> str:
    """The sequential-BPE retrain oracle, parameterized by the staged
    (word, n) table: recursive CTE, per-round argmax with lexicographic
    tie-break, gaps-and-islands greedy merge. Shared verbatim by
    ``corpus_bpe_merges`` (full-recount trainer) and
    ``corpus_bpe_merges_delta`` (incremental-count trainer) — the two
    trainers are proven merge-identical, so one oracle checks both."""
    return f"""
    WITH RECURSIVE
    w AS (SELECT word, n FROM read_parquet('{staged_glob(words_stage)}')),
    st(it, sym, n) AS (
      SELECT 0, trim(regexp_replace(word, '(.)', '\\1 ', 'g')), n FROM w
      UNION ALL
      SELECT * FROM (
        WITH prev AS (SELECT * FROM st WHERE it < {_BPE_MERGES}),
        tok AS (
          SELECT it, sym, n, i, arr[i] AS s, arr[i+1] AS s2
          FROM (SELECT it, sym, n, regexp_split_to_array(sym, ' ') AS arr FROM prev),
               unnest(generate_series(1, len(arr))) AS g(i)
        ),
        best AS (
          SELECT s || ' ' || s2 AS pair FROM tok WHERE s2 IS NOT NULL
          GROUP BY 1 ORDER BY SUM(n) DESC, pair LIMIT 1
        ),
        p AS (
          SELECT tok.sym, tok.i FROM tok, best
          WHERE tok.s2 IS NOT NULL AND tok.s || ' ' || tok.s2 = best.pair
        ),
        runs AS (
          SELECT sym, i, i - row_number() OVER (PARTITION BY sym ORDER BY i) AS run
          FROM p
        ),
        kept AS (
          SELECT sym, i FROM (
            SELECT sym, i, (i - MIN(i) OVER (PARTITION BY sym, run)) % 2 AS par
            FROM runs
          ) WHERE par = 0
        )
        SELECT t.it + 1,
               string_agg(CASE WHEN k.i IS NOT NULL THEN t.s || t.s2 ELSE t.s END,
                          ' ' ORDER BY t.i) AS sym,
               t.n
        FROM tok t
        LEFT JOIN kept k ON k.sym = t.sym AND k.i = t.i
        LEFT JOIN kept k2 ON k2.sym = t.sym AND k2.i = t.i - 1
        WHERE k2.i IS NULL
        GROUP BY t.it, t.sym, t.n
      )
    ),
    tok2 AS (
      SELECT it, n, arr[i] AS s, arr[i+1] AS s2
      FROM (SELECT it, sym, n, regexp_split_to_array(sym, ' ') AS arr FROM st),
           unnest(generate_series(1, len(arr) - 1)) AS g(i)
      WHERE it < {_BPE_MERGES}
    ),
    ranked AS (
      SELECT it, s || ' ' || s2 AS pair, SUM(n) AS cnt,
             row_number() OVER (
               PARTITION BY it ORDER BY SUM(n) DESC, s || ' ' || s2) AS rn
      FROM tok2 GROUP BY it, s || ' ' || s2
    )
    SELECT CAST(it AS INT) AS rank, pair, CAST(cnt AS BIGINT) AS n
    FROM ranked WHERE rn = 1 ORDER BY rank
    """


@q("corpus_bpe_merges", _bpe_seq_retrain_sql("bpe_words"))
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary induction (operators/bpe.py): the corpus
    collapses once to a staged (word, n) table; eight merge rounds each
    count pair frequencies, argmax with a lexicographic tie-break, and
    apply the greedy left-to-right merge (run-parity over match positions,
    a row-local fold in Spark). The oracle RETRAINS the whole tokenizer in
    a DuckDB recursive CTE — per-round argmax plus a gaps-and-islands
    formulation of the same greedy merge — and the learned merge table
    matches value-for-value: cross-engine-exact tokenizer training. Pinned
    against a pure-python classic-BPE reference in tests/test_bpe.py."""
    from ocr_platform_spark.operators.bpe import train_bpe_merges, word_counts

    d = _t(spark, sf_dir, "documents")
    words = stage(word_counts(d, "text", min_count=2), "bpe_words")
    merges, _syms = train_bpe_merges(words, n_merges=_BPE_MERGES)
    return spark.createDataFrame(merges, "rank int, pair string, n long").orderBy(
        "rank"
    )


@q("corpus_bpe_merges_delta", _bpe_seq_retrain_sql("bpe_words_d"))
def corpus_bpe_merges_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential BPE with INCREMENTAL pair counts (operators/bpe.py
    train_bpe_merges_delta) — the fastBPE/SentencePiece count-update
    optimization in distributed form. Each round argmaxes over a maintained
    (pair, cnt) table instead of re-exploding the whole vocabulary, splits
    the symbol table on a literal substring test for the merged pair, merges
    only the hit rows, and folds their (new − old) pair deltas back into the
    count table; per-round work is O(|hit words| + |pair table|), so late
    rounds — rare pairs, few hit words — become nearly free at 10^8-word
    vocabularies. Provably merge-identical to the full-recount trainer
    (delta = exact multiset difference on hit words, by induction the
    maintained table equals the recount every round), so the oracle is the
    SAME sequential retrain CTE as ``corpus_bpe_merges`` over this query's
    own staged word table; equality with the recount trainer and a
    pure-python reference is pinned in tests/test_bpe.py."""
    from ocr_platform_spark.operators.bpe import train_bpe_merges_delta, word_counts

    d = _t(spark, sf_dir, "documents")
    words = stage(word_counts(d, "text", min_count=2), "bpe_words_d")
    merges, _syms = train_bpe_merges_delta(words, n_merges=_BPE_MERGES)
    return spark.createDataFrame(merges, "rank int, pair string, n long").orderBy(
        "rank"
    )


_BPE_B_ROUNDS, _BPE_B_BATCH, _BPE_B_TOPK = 3, 4, 64


def _bpe_chained_selection(src: str, part: str | None) -> str:
    """CTE text replaying ``select_merge_batch``'s greedy walk in plain SQL:
    s1 = the rank-1 pair; s_{i+1} = the min-rank pair whose {l, r, l||r}
    trio is disjoint from every earlier pick's trio. Chained-min equals the
    walk by induction (a lower-ranked non-conflicting pair would already be
    some s_j). ``part`` partitions the chain per training round for the
    final merge-table pass. Picks order by the TOTAL key (cnt desc, pair),
    never a precomputed row number: DuckDB 1.0 re-evaluates inlined CTEs
    per reference inside a recursive query, and two evaluations of the same
    window may disagree on tie order (observed; the shared tails below are
    also AS MATERIALIZED for the same reason — and list_reduce, the compact
    alternative, silently drops accumulator state on lists of ≥9 elements
    in this DuckDB build)."""
    pcols = f"{part}, " if part else ""
    ctes = [f"s1 AS (SELECT *, 1 AS slot FROM {src} WHERE rn = 1)"]
    for i in range(2, _BPE_B_BATCH + 1):
        joins = " ".join(
            f"JOIN s{j} ON s{j}.rn IS NOT NULL "
            + (f"AND r.{part} = s{j}.{part} " if part else "")
            + f"AND NOT (r.l IN (s{j}.l, s{j}.r, s{j}.cat) "
            f"OR r.r IN (s{j}.l, s{j}.r, s{j}.cat) "
            f"OR r.cat IN (s{j}.l, s{j}.r, s{j}.cat))"
            for j in range(1, i)
        )
        ctes.append(
            f"s{i} AS (SELECT {pcols}l, r, cat, cnt, rn, {i} AS slot FROM ("
            f"SELECT r.*, row_number() OVER ("
            + (f"PARTITION BY r.{part} " if part else "")
            + f"ORDER BY r.cnt DESC, r.l || ' ' || r.r) AS pick "
            f"FROM {src} r {joins}) WHERE pick = 1)"
        )
    chosen = " UNION ALL ".join(
        f"SELECT {pcols}l, r, cat, cnt, rn, slot FROM s{i}"
        for i in range(1, _BPE_B_BATCH + 1)
    )
    ctes.append(f"chosen AS ({chosen})")
    return ",\n    ".join(ctes)


@q(
    "corpus_bpe_merges_batched",
    rf"""
    WITH RECURSIVE
    w AS (SELECT word, n FROM read_parquet('{staged_glob("bpe_words_b")}')),
    st(it, sym, n) AS (
      SELECT 0, trim(regexp_replace(word, '(.)', '\1 ', 'g')), n FROM w
      UNION ALL
      SELECT * FROM (
        WITH prev AS (SELECT * FROM st WHERE it < {_BPE_B_ROUNDS}),
        tok AS (
          SELECT it, sym, n, i, arr[i] AS s, arr[i+1] AS s2
          FROM (SELECT it, sym, n, regexp_split_to_array(sym, ' ') AS arr FROM prev),
               unnest(generate_series(1, len(arr))) AS g(i)
        ),
        ranked AS (
          SELECT l, r, cat, cnt, rn FROM (
            SELECT s AS l, s2 AS r, s || s2 AS cat, SUM(n) AS cnt,
                   row_number() OVER (ORDER BY SUM(n) DESC, s || ' ' || s2) AS rn
            FROM tok WHERE s2 IS NOT NULL GROUP BY s, s2
          ) WHERE rn <= {_BPE_B_TOPK}
        ),
        {_bpe_chained_selection("ranked", None)},
        p AS (
          SELECT tok.sym, tok.i FROM tok JOIN chosen c
            ON tok.s = c.l AND tok.s2 = c.r
        ),
        runs AS (
          SELECT sym, i, i - row_number() OVER (PARTITION BY sym ORDER BY i) AS run
          FROM p
        ),
        kept AS (
          SELECT sym, i FROM (
            SELECT sym, i, (i - MIN(i) OVER (PARTITION BY sym, run)) % 2 AS par
            FROM runs
          ) WHERE par = 0
        )
        SELECT t.it + 1,
               string_agg(CASE WHEN k.i IS NOT NULL THEN t.s || t.s2 ELSE t.s END,
                          ' ' ORDER BY t.i) AS sym,
               t.n
        FROM tok t
        LEFT JOIN kept k ON k.sym = t.sym AND k.i = t.i
        LEFT JOIN kept k2 ON k2.sym = t.sym AND k2.i = t.i - 1
        WHERE k2.i IS NULL
        GROUP BY t.it, t.sym, t.n
      )
    ),
    tok2 AS MATERIALIZED (
      SELECT it, n, arr[i] AS s, arr[i+1] AS s2
      FROM (SELECT it, sym, n, regexp_split_to_array(sym, ' ') AS arr FROM st),
           unnest(generate_series(1, len(arr) - 1)) AS g(i)
      WHERE it < {_BPE_B_ROUNDS}
    ),
    ranked2 AS MATERIALIZED (
      SELECT it, l, r, cat, cnt, rn FROM (
        SELECT it, s AS l, s2 AS r, s || s2 AS cat, SUM(n) AS cnt,
               row_number() OVER (PARTITION BY it
                                  ORDER BY SUM(n) DESC, s || ' ' || s2) AS rn
        FROM tok2 GROUP BY it, s, s2
      ) WHERE rn <= {_BPE_B_TOPK}
    ),
    {_bpe_chained_selection("ranked2", "it")}
    SELECT CAST(row_number() OVER (ORDER BY it, slot) - 1 AS INT) AS rank,
           l || ' ' || r AS pair, CAST(cnt AS BIGINT) AS n
    FROM chosen ORDER BY rank
    """,
)
def corpus_bpe_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BPE training (operators/bpe.py train_bpe_merges_batched) —
    the production shape for large vocabularies: each round counts pairs
    ONCE, keeps the top ``batch`` pairwise-non-interacting pairs (greedy
    over the (cnt desc, pair) ranking with the {l, r, l+r} trio rule), and
    applies the whole batch in one fused merge pass, so a 50k-merge vocab
    costs 50k/batch cluster rounds instead of 50k. Disjointness makes the
    batch order-free and keeps the run-parity greedy-merge fold valid over
    the union of match positions (batch-mates' matches are never adjacent).
    The oracle RETRAINS the batched tokenizer in DuckDB — the recursive CTE
    replays selection via chained min-rank picks and the same
    gaps-and-islands merge — and the full merge table matches
    value-for-value. Differential-tested against a pure-python batched
    reference (and against sequential BPE at batch=1) in tests/test_bpe.py."""
    from ocr_platform_spark.operators.bpe import (
        train_bpe_merges_batched,
        word_counts,
    )

    d = _t(spark, sf_dir, "documents")
    words = stage(word_counts(d, "text", min_count=2), "bpe_words_b")
    # delta=True: incremental pair counts (the production combination —
    # batched rounds bound the job count, delta counts bound the per-job
    # work); merge-identical to the recount path, so the retrain oracle
    # gates BOTH (recount≡delta pinned in tests/test_bpe.py)
    merges, _syms = train_bpe_merges_batched(
        words, n_rounds=_BPE_B_ROUNDS, batch=_BPE_B_BATCH, topk=_BPE_B_TOPK, delta=True
    )
    return spark.createDataFrame(merges, "rank int, pair string, n long").orderBy(
        "rank"
    )


@q(
    "corpus_bpe_token_counts",
    rf"""
    WITH seg AS (
      SELECT word, n_tok FROM read_parquet('{staged_glob("bpe_seg_final")}')
    ),
    wordstream AS (
      SELECT doc_id, unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      FROM documents
    ),
    w AS (SELECT doc_id, word FROM wordstream WHERE word <> '')
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(COALESCE(seg.n_tok, length(w.word))) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN seg.n_tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov_words
    FROM w LEFT JOIN seg USING (word)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def corpus_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under the LEARNED vocabulary — the token-budget step
    measured in the tokenizer the model will train with, not a whitespace
    proxy: train BPE on the corpus (operators/bpe.py), stage the final
    word→segmentation table, then one broadcast join prices every word at
    its trained token count (out-of-vocabulary words — rare words pruned
    below min_count — fall back to character count, the worst-case BPE
    bound). The oracle recomputes every per-doc count from the staged
    segmentation over raw parquet; training itself is hash-gated by
    ``corpus_bpe_merges``."""
    from ocr_platform_spark.operators.bpe import train_bpe_merges, word_counts
    from ocr_platform_spark.functions.textfns import normalized_text

    d = _t(spark, sf_dir, "documents")
    words = word_counts(d, "text", min_count=2)
    _merges, syms = train_bpe_merges(words, n_merges=_BPE_MERGES)
    seg = stage(
        syms.select(
            F.regexp_replace("sym", " ", "").alias("word"),
            F.size(F.split("sym", " ")).cast("int").alias("n_tok"),
        ),
        "bpe_seg_final",
    )
    w = d.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        w.join(F.broadcast(seg), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("n_tok"), F.length("word")))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.when(F.col("n_tok").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov_words"),
        )
        .orderBy("doc_id")
    )


@q(
    "corpus_bpe_encode",
    rf"""
    WITH seg AS (
      SELECT word, toks FROM read_parquet('{staged_glob("bpe_enc_seg")}')
    ),
    t AS (
      SELECT doc_id,
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
      FROM documents
    ),
    w AS (
      SELECT doc_id, i AS wpos, ws[i] AS word
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM t)
      WHERE ws[i] <> ''
    ),
    ex AS (
      SELECT w.doc_id, w.wpos,
             COALESCE(seg.toks,
                      list_transform(generate_series(1, length(w.word)),
                                     j -> substr(w.word, j, 1))) AS toks
      FROM w LEFT JOIN seg USING (word)
    ),
    tk AS (
      SELECT doc_id, wpos, j AS tpos, toks[j] AS token
      FROM (SELECT doc_id, wpos, toks,
                   unnest(generate_series(1, len(toks))) AS j FROM ex)
    ),
    v AS (
      SELECT token, CAST(row_number() OVER (ORDER BY token) AS INT) AS tok_id
      FROM (SELECT DISTINCT token FROM tk)
    )
    SELECT tk.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(CAST(v.tok_id AS VARCHAR), ' '
                      ORDER BY tk.wpos, tk.tpos) AS ids
    FROM tk JOIN v USING (token)
    GROUP BY tk.doc_id
    ORDER BY doc_id
    """,
)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING under the learned vocabulary (operators/bpe.
    encode_with_segmentation) — the step that turns the curated corpus
    into the token-id sequences a training run actually consumes,
    completing train (``corpus_bpe_merges``) → price
    (``corpus_bpe_token_counts``) → encode. The trained word→segmentation
    table is staged; BOTH engines replay the word stream, the OOV
    character fallback, the dense-rank vocabulary ids (row_number over
    the distinct emitted tokens — vocabulary-sized, never the corpus),
    and the full space-joined id sequence per document, hash-compared
    byte-for-byte. Training itself is hash-gated by
    ``corpus_bpe_merges``."""
    from ocr_platform_spark.operators.bpe import (
        encode_with_segmentation,
        train_bpe_merges,
        word_counts,
    )

    d = _t(spark, sf_dir, "documents")
    words = word_counts(d, "text", min_count=2)
    _merges, syms = train_bpe_merges(words, n_merges=_BPE_MERGES)
    seg = stage(
        syms.select(
            F.regexp_replace("sym", " ", "").alias("word"),
            F.split("sym", " ").alias("toks"),
        ),
        "bpe_enc_seg",
    )
    return encode_with_segmentation(d, seg, "doc_id", "text").orderBy("doc_id")


@q(
    "corpus_bpe_fertility",
    rf"""
    WITH seg AS (
      SELECT word, n_toks FROM read_parquet('{staged_glob("bpe_fert_seg")}')
    ),
    t AS (
      SELECT lang,
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
      FROM documents
    ),
    w AS (
      SELECT lang, ws[i] AS word
      FROM (SELECT lang, ws, unnest(generate_series(1, len(ws))) AS i FROM t)
      WHERE ws[i] <> ''
    ),
    pw AS (SELECT lang, word, COUNT(*) AS cnt FROM w GROUP BY lang, word),
    j AS (
      SELECT lang, cnt,
             COALESCE(seg.n_toks, CAST(length(pw.word) AS INT)) AS tpw
      FROM pw LEFT JOIN seg USING (word)
    )
    SELECT lang, CAST(SUM(cnt) AS BIGINT) AS total_words,
           CAST(SUM(cnt * tpw) AS BIGINT) AS total_tokens,
           CAST((SUM(cnt * tpw) * 1000) // SUM(cnt) AS BIGINT) AS fertility_x1000
    FROM j GROUP BY lang ORDER BY lang
    """,
)
def corpus_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language (tokens emitted per word — the
    standard multilingual-tokenizer health metric: a vocabulary trained
    lopsidedly makes under-represented languages pay more tokens for the
    same text, skewing both cost and effective context length). Uses the
    trained segmentation of ``corpus_bpe_merges`` with the same OOV
    character fallback as encoding; fertility is reported ×1000 in
    integer div so the curve hashes identically cross-engine. Scale
    shape: the word stream collapses to (lang, word) counts FIRST
    (map-side combine; vocabulary×lang-sized, never the corpus), then
    joins the BROADCAST segmentation — no corpus-wide shuffle after the
    first aggregate."""
    from ocr_platform_spark.functions.textfns import normalized_text
    from ocr_platform_spark.operators.bpe import train_bpe_merges, word_counts

    d = _t(spark, sf_dir, "documents")
    words = word_counts(d, "text", min_count=2)
    _merges, syms = train_bpe_merges(words, n_merges=_BPE_MERGES)
    seg = stage(
        syms.select(
            F.regexp_replace("sym", " ", "").alias("word"),
            F.size(F.split("sym", " ")).cast("int").alias("n_toks"),
        ),
        "bpe_fert_seg",
    )
    w = d.select(
        "lang",
        F.explode(
            F.filter(F.split(normalized_text("text"), " "), lambda x: x != F.lit(""))
        ).alias("word"),
    )
    per_word = w.groupBy("lang", "word").agg(F.count("*").alias("cnt"))
    j = per_word.join(F.broadcast(seg), "word", "left").select(
        "lang",
        "cnt",
        F.coalesce("n_toks", F.length("word").cast("int")).alias("tpw"),
    )
    return (
        j.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("total_words"),
            F.sum(F.col("cnt") * F.col("tpw")).cast("long").alias("total_tokens"),
        )
        .select(
            "lang",
            "total_words",
            "total_tokens",
            F.expr("(total_tokens * 1000) div total_words").alias("fertility_x1000"),
        )
        .orderBy("lang")
    )


@q(
    "corpus_token_blocks",
    f"""
    WITH e AS (SELECT * FROM read_parquet('{staged_glob("bpack_enc")}')),
    o AS (
      SELECT doc_id, ids,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM e
    ),
    tt AS (SELECT off, string_split(ids, ' ') AS ts FROM o),
    tk AS (
      SELECT off + i - 1 AS gpos, ts[i] AS tok
      FROM (SELECT off, ts, unnest(generate_series(1, len(ts))) AS i FROM tt)
    )
    SELECT CAST(gpos // 64 AS BIGINT) AS block_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(tok, ' ' ORDER BY gpos) AS ids
    FROM tk GROUP BY 1
    ORDER BY block_id
    """,
)
def corpus_token_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-block packing of the tokenized corpus (operators/packing.
    pack_blocks_encoded): the encoded id sequences concatenate in doc_id
    order and split into consecutive 64-token blocks, documents crossing
    block boundaries — the "concatenate and chunk to context length"
    recipe pretraining actually consumes, completing encode
    (``corpus_bpe_encode``) → pack. Offsets are a two-level ordered
    prefix sum (order-preserving range buckets; no global window — the
    oracle replays them as one flat window over the same total order,
    equivalent by associativity). The encoded table is staged; BOTH
    engines replay offsets, the token-position explode, block assignment,
    and every block's exact id sequence."""
    from ocr_platform_spark.operators.bpe import (
        encode_with_segmentation,
        train_bpe_merges,
        word_counts,
    )
    from ocr_platform_spark.operators.packing import pack_blocks_encoded

    d = _t(spark, sf_dir, "documents")
    words = word_counts(d, "text", min_count=2)
    _merges, syms = train_bpe_merges(words, n_merges=_BPE_MERGES)
    seg = stage(
        syms.select(
            F.regexp_replace("sym", " ", "").alias("word"),
            F.split("sym", " ").alias("toks"),
        ),
        "bpack_seg",
    )
    enc = stage(
        encode_with_segmentation(d, seg, "doc_id", "text"), "bpack_enc", partitions=4
    )
    return pack_blocks_encoded(enc, seq_len=64, id_col="doc_id").orderBy("block_id")


@q(
    "corpus_token_blocks_sep",
    f"""
    WITH e AS (
      SELECT doc_id, n_tokens + 1 AS n_tokens, ids || ' 0' AS ids
      FROM read_parquet('{staged_glob("bpacksep_enc")}')
    ),
    o AS (
      SELECT doc_id, ids,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM e
    ),
    tt AS (SELECT off, string_split(ids, ' ') AS ts FROM o),
    tk AS (
      SELECT off + i - 1 AS gpos, ts[i] AS tok
      FROM (SELECT off, ts, unnest(generate_series(1, len(ts))) AS i FROM tt)
    )
    SELECT CAST(gpos // 64 AS BIGINT) AS block_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(tok, ' ' ORDER BY gpos) AS ids
    FROM tk GROUP BY 1
    ORDER BY block_id
    """,
)
def corpus_token_blocks_sep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corpus_token_blocks`` with the published document-separator
    recipe (operators/packing.pack_blocks_encoded ``sep_id``): an EOS id
    (0 — the dense-rank vocabulary is 1-based, so 0 is reserved) is
    appended after EVERY document before the stream splits into 64-token
    blocks, so a model can learn where one document ends inside a block.
    The encoded table is staged; the oracle appends the same separator
    per document and replays offsets, the token-position explode, block
    assignment, and every block's exact id sequence."""
    from ocr_platform_spark.operators.bpe import (
        encode_with_segmentation,
        train_bpe_merges,
        word_counts,
    )
    from ocr_platform_spark.operators.packing import pack_blocks_encoded

    d = _t(spark, sf_dir, "documents")
    words = word_counts(d, "text", min_count=2)
    _merges, syms = train_bpe_merges(words, n_merges=_BPE_MERGES)
    seg = stage(
        syms.select(
            F.regexp_replace("sym", " ", "").alias("word"),
            F.split("sym", " ").alias("toks"),
        ),
        "bpacksep_seg",
    )
    enc = stage(
        encode_with_segmentation(d, seg, "doc_id", "text"),
        "bpacksep_enc",
        partitions=4,
    )
    return pack_blocks_encoded(enc, seq_len=64, id_col="doc_id", sep_id=0).orderBy(
        "block_id"
    )


@q(
    "doc_dsir_sample",
    rf"""
    WITH f AS (
      SELECT id, bucket, cnt FROM read_parquet('{staged_glob("dsir_features")}')
    ),
    tgt AS (
      SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS c
      FROM f JOIN documents d ON f.id = d.doc_id
      WHERE d.lang = 'en' GROUP BY bucket
    ),
    raw AS (
      SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS c FROM f GROUP BY bucket
    ),
    w AS (
      SELECT f.id,
             CAST(SUM(f.cnt) AS BIGINT) AS n_grams,
             CAST(SUM(f.cnt * (COALESCE(length(bin(t.c)), 0)
                               - COALESCE(length(bin(r.c)), 0))) AS BIGINT)
               AS w_bits
      FROM f LEFT JOIN tgt t USING (bucket) LEFT JOIN raw r USING (bucket)
      GROUP BY f.id
    )
    SELECT CAST(id AS BIGINT) AS doc_id, n_grams, w_bits,
           CAST(w_bits AS DOUBLE) / n_grams AS bits_per_gram,
           CAST(row_number() OVER (
             ORDER BY CAST(w_bits AS DOUBLE) / n_grams DESC, w_bits DESC, id
           ) AS INT) AS rank
    FROM w
    QUALIFY rank <= 100
    ORDER BY rank
    """,
)
def doc_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (operators/dsir.py; Xie et al.,
    NeurIPS 2023): hash every word bigram into 4096 buckets (the paper's
    bag-of-hashed-ngrams features), fit the target distribution on the
    ``lang='en'`` slice and the raw distribution on the whole corpus, and
    weight each document by the integer bit-length surrogate of
    ``log p(doc) - log q(doc)``; the deterministic top-100 per-gram rates
    are the selected sample. The xxhash64 feature stage is staged to
    parquet; the oracle recomputes BOTH distributions, every weight, and
    the final ranked selection from those bytes. At scale the feature
    stream is map-side, both distributions are B-row broadcasts, and the
    selection is a distributed TakeOrderedAndProject."""
    from ocr_platform_spark.operators.dsir import (
        bucket_distribution,
        dsir_select,
        dsir_weights,
        hashed_gram_counts,
    )

    d = _t(spark, sf_dir, "documents")
    feats = stage(
        hashed_gram_counts(d, "doc_id", "text", n_buckets=4096, n=2),
        "dsir_features",
    )
    target = bucket_distribution(feats, d.where(F.col("lang") == "en").select("doc_id"))
    raw = bucket_distribution(feats)
    sel = dsir_select(dsir_weights(feats, target, raw), 100)
    win = Window.orderBy(F.desc("bits_per_gram"), F.desc("w_bits"), "id")
    return sel.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "w_bits",
        "bits_per_gram",
        F.row_number().over(win).cast("int").alias("rank"),
    ).orderBy("rank")


@q(
    "ccnet_bucket_sample",
    rf"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(words) - 1, 1)),
               i -> array_to_string(words[i:i+1], ' '))) AS bigram
      FROM t
    ),
    ref AS (
      SELECT bigram, COUNT(*) AS c FROM g WHERE doc_id % 5 = 0
      GROUP BY bigram HAVING COUNT(*) >= 2
    ),
    sc AS (
      SELECT g.doc_id,
             (CAST(COALESCE(SUM(CASE WHEN ref.c IS NOT NULL
                                     THEN length(bin(ref.c)) END), 0) AS BIGINT)
              * 1000) // COUNT(*) AS mb
      FROM g LEFT JOIN ref USING (bigram)
      WHERE g.doc_id % 5 <> 0
      GROUP BY g.doc_id
    ),
    hist AS (SELECT mb, COUNT(*) AS c FROM sc GROUP BY mb),
    cum AS (
      SELECT mb, SUM(c) OVER (ORDER BY mb) AS cum,
             (SELECT COUNT(*) FROM sc) AS n
      FROM hist
    ),
    cuts AS (
      SELECT MIN(CASE WHEN cum * 3 >= n THEN mb END) AS t1,
             MIN(CASE WHEN cum * 3 >= 2 * n THEN mb END) AS t2
      FROM cum
    ),
    b AS (
      SELECT sc.doc_id,
             CASE WHEN mb >= t2 THEN 'head'
                  WHEN mb >= t1 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             CASE WHEN mb >= t2 THEN TRUE
                  WHEN mb >= t1 THEN {oracle_bucket_sql('sc.doc_id', 2, 'ccnet')} = 0
                  ELSE {oracle_bucket_sql('sc.doc_id', 4, 'ccnet')} = 0
             END AS keep
      FROM sc, cuts
    )
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def ccnet_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's closing move end-to-end: LM-score every document (integer
    milli-bits-per-gram against the reference slice), cut EXACT terciles
    into head/middle/tail (distinct-value cumulative histogram — the
    corpus_length_deciles technique, bounded by the score range), and
    sample proportionally (head kept whole, middle 1/2, tail 1/4 via the
    dialect-mirrored md5 bucket). Every quantity an integer, staging-free:
    the oracle retrains the LM, re-derives the tercile cuts, and replays
    the sampling decision per document."""
    from ocr_platform_spark.operators.lmscore import lm_score, reference_bigram_counts
    from ocr_platform_spark.operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 5 == 0)
    counts = reference_bigram_counts(ref, "doc_id", "text", min_count=2)
    sc = lm_score(d.where(F.col("doc_id") % 5 != 0), counts, "doc_id", "text").select(
        "doc_id", F.expr("bits_total * 1000 div n_bigrams").alias("mb")
    )
    hist = sc.groupBy("mb").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("mb").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("mb", F.sum("c").over(wcum).alias("cum")).crossJoin(
        F.broadcast(sc.agg(F.count("*").alias("n")))
    )
    cuts = cum.agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("mb"))).alias("t1"),
        F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("mb"))).alias("t2"),
    ).first()
    t1, t2 = int(cuts["t1"]), int(cuts["t2"])
    bucket = (
        F.when(F.col("mb") >= t2, F.lit("head"))
        .when(F.col("mb") >= t1, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    keep = (
        F.when(F.col("mb") >= t2, F.lit(True))
        .when(F.col("mb") >= t1, hash_bucket("doc_id", 2, "ccnet") == 0)
        .otherwise(hash_bucket("doc_id", 4, "ccnet") == 0)
    )
    return (
        sc.select(bucket.alias("bucket"), keep.alias("keep"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_sampled"),
        )
        .orderBy("bucket")
    )


_PHRASE = ("fast", "table")


@q(
    "corpus_phrase_search",
    rf"""
    WITH tok AS (
      SELECT doc_id, i AS pos, words[i] AS token
      FROM (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
        FROM documents
      ), unnest(generate_series(1, len(words))) AS g(i)
    )
    SELECT a.doc_id AS doc_id, COUNT(*) AS n_hits
    FROM tok a JOIN tok b
      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.token = '{_PHRASE[0]}' AND b.token = '{_PHRASE[1]}'
    GROUP BY a.doc_id
    ORDER BY n_hits DESC, a.doc_id
    """,
)
def corpus_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional token index — the
    inverted-index construction shape (one posexplode builds (doc, pos,
    token) postings; a phrase is an adjacency self-join on positions,
    pre-filtered to the phrase's terms so the join input is postings-list
    sized, never the corpus). Counts per doc are exact integers; the
    oracle rebuilds the same index and join from raw parquet."""
    from ocr_platform_spark.functions.textfns import normalized_text

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(normalized_text("text"), " ")).alias("pos", "token"),
    )
    a = tok.where(F.col("token") == _PHRASE[0]).select(
        "doc_id", (F.col("pos") + 1).alias("next_pos")
    )
    b = tok.where(F.col("token") == _PHRASE[1]).select(
        "doc_id", F.col("pos").alias("next_pos")
    )
    return (
        a.join(b, ["doc_id", "next_pos"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .orderBy(F.desc("n_hits"), "doc_id")
    )


@q(
    "corpus_top_bigrams",
    r"""
    WITH grams AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(words) - 1, 1)),
               i -> array_to_string(words[i:i+1], ' '))) AS g
      FROM (
        SELECT regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
        FROM documents
      )
    )
    SELECT g AS bigram, COUNT(*) AS n FROM grams
    GROUP BY g
    QUALIFY row_number() OVER (ORDER BY n DESC, g) <= 50
    ORDER BY n DESC, bigram
    """,
)
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide n-gram frequency (the vocabulary/boilerplate census a
    dataset build runs before choosing filters): global bigram counts,
    deterministic top-50. Map-side partial aggregation makes the global
    count one shuffle of the distinct-gram dimension, not the corpus."""
    from ocr_platform_spark.functions.textfns import word_shingles

    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(word_shingles("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # per-partition top-k merge, not a single-partition global window
    return counts.orderBy(F.desc("n"), "bigram").limit(50)


def _structdata_oracle() -> str:
    from ocr_platform_spark.kernels.structdata import blocks_sql_expr, sql_block_exprs

    e = sql_block_exprs("j")
    return f"""
    WITH s AS (SELECT url, raw FROM read_parquet('{staged_glob("structdata")}')),
    blocks AS (
      SELECT url, unnest(list_transform({blocks_sql_expr("raw")},
                                        (b, i) -> struct_pack(idx := i - 1, b := b))) AS u
      FROM s
    ),
    f AS (
      SELECT url, CAST(u.idx AS INT) AS block_idx, TRY_CAST(u.b AS JSON) AS j0
      FROM blocks
    ),
    g AS (
      SELECT url, block_idx,
             CASE WHEN j0 IS NOT NULL AND json_type(j0) = 'OBJECT' THEN j0 END AS j
      FROM f
    )
    SELECT url, block_idx, {e["is_valid"]} AS is_valid,
           {e["schema_type"]} AS schema_type, {e["n_keys"]} AS n_keys
    FROM g ORDER BY url, block_idx
    """


@q("extract_structured_data", _structdata_oracle())
def extract_structured_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema.org JSON-LD extraction (kernels/structdata.py): synth corpus →
    one mapInArrow pass per page emitting the decoded payload plus every
    ``<script type="application/ld+json">`` block parsed to (is_valid,
    @type, key count). The decoded payload is staged and the oracle replays
    BOTH halves over identical characters — block discovery with the same
    compiled regex under RE2, and the JSON semantics under DuckDB's JSON
    extension vs CPython ``json`` (two independent RFC 8259 parsers —
    validity verdicts, root-object rule, @type string-or-first-of-array,
    key counts all hash-checked per block). Reference typed-record face:
    ``ocr_backend/app/services/processing_service.py`` (field/table records
    per document)."""
    from ocr_platform_spark.operators.extract import structured_data_df

    sd = structured_data_df(_synth_docs(spark))
    staged = stage(sd, "structdata")
    b = F.explode("blocks").alias("b")
    return (
        staged.select("url", b)
        .select(
            "url",
            F.col("b.block_idx").alias("block_idx"),
            F.col("b.is_valid").alias("is_valid"),
            F.col("b.schema_type").alias("schema_type"),
            F.col("b.n_keys").alias("n_keys"),
        )
        .orderBy("url", "block_idx")
    )


@q(
    "corpus_cluster_weights",
    f"""
    WITH a AS (
      SELECT id, cluster FROM read_parquet('{staged_glob("cluster_weights_assign")}')
    ),
    toks AS (
      SELECT a.cluster,
        CAST(CASE WHEN d.text IS NULL OR trim(d.text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END AS BIGINT)
          AS n_tokens
      FROM documents d JOIN a ON d.doc_id = a.id
    ),
    avail AS (
      SELECT cluster, CAST(SUM(n_tokens) AS BIGINT) AS avail_tokens
      FROM toks GROUP BY cluster HAVING SUM(n_tokens) > 0
    ),
    raw AS (
      SELECT cluster, avail_tokens,
             CAST(floor(sqrt(CAST(avail_tokens AS DOUBLE)) * {float(_TEMP_SCALE)}) AS BIGINT) AS rw
      FROM avail
    ),
    tot AS (SELECT *, CAST(SUM(rw) OVER () AS BIGINT) AS rsum FROM raw),
    quota AS (
      SELECT cluster, avail_tokens,
             (1000 * rw) // rsum AS q, (1000 * rw) % rsum AS rem
      FROM tot
    ),
    seats AS (
      SELECT *,
             CAST(row_number() OVER (ORDER BY rem DESC, CAST(cluster AS VARCHAR))
                  <= 1000 - CAST(SUM(q) OVER () AS BIGINT) AS BIGINT) AS extra
      FROM quota
    )
    SELECT cluster, avail_tokens, CAST(q + extra AS INT) AS weight_per_mille
    FROM seats WHERE q + extra > 0 ORDER BY cluster
    """,
)
def corpus_cluster_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture weights over DISCOVERED domains: the same
    Hamilton-seat T=2 arithmetic as ``corpus_temperature_weights``, but the
    group axis is the staged k-means cluster instead of the language tag —
    the piece that turns clustering-as-curation-dimension into an actual
    sampling plan (profile → weight → epoch plan, all reusing
    operators/sampling.py unchanged). Exact integers after one correctly-
    rounded sqrt; weights sum to exactly 1000 in both engines."""
    from ocr_platform_spark.operators.sampling import temperature_weights
    from ocr_platform_spark.operators.semdedup import assign_with_centroid_sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.train_ivf(emb, n_lists=16)
    a = stage(
        assign_with_centroid_sim(emb, cents).select("id", "cluster"),
        "cluster_weights_assign",
    )
    d = _t(spark, sf_dir, "documents")
    toks = d.join(a, d.doc_id == a.id).select(
        "cluster", TX.token_count("text").cast("long").alias("n_tokens")
    )
    return (
        temperature_weights(toks, "cluster", "n_tokens", sqrt_iters=1, scale=_TEMP_SCALE)
        .orderBy("cluster")
    )


_CLUSTER_EPOCH_TOTAL = 120_000


@q(
    "corpus_cluster_epoch_plan",
    f"""
    WITH a AS (
      SELECT id, cluster FROM read_parquet('{staged_glob("cluster_epoch_assign")}')
    ),
    toks AS (
      SELECT d.doc_id, CAST(a.cluster AS VARCHAR) AS cluster,
        CAST(CASE WHEN d.text IS NULL OR trim(d.text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END AS BIGINT)
          AS n_tokens
      FROM documents d JOIN a ON d.doc_id = a.id
    ),
    avail AS (
      SELECT cluster, CAST(SUM(n_tokens) AS BIGINT) AS avail
      FROM toks GROUP BY cluster HAVING SUM(n_tokens) > 0
    ),
    raw AS (
      SELECT cluster, avail,
             CAST(floor(sqrt(CAST(avail AS DOUBLE)) * {float(_TEMP_SCALE)}) AS BIGINT) AS rw
      FROM avail
    ),
    tot AS (SELECT *, CAST(SUM(rw) OVER () AS BIGINT) AS rsum FROM raw),
    quota AS (
      SELECT cluster, avail, (1000 * rw) // rsum AS q, (1000 * rw) % rsum AS qrem
      FROM tot
    ),
    seats AS (
      SELECT *,
             CAST(row_number() OVER (ORDER BY qrem DESC, cluster)
                  <= 1000 - CAST(SUM(q) OVER () AS BIGINT) AS BIGINT) AS extra
      FROM quota
    ),
    w AS (SELECT cluster, avail, q + extra AS w FROM seats WHERE q + extra > 0),
    need AS (
      SELECT cluster,
             ((CAST({_CLUSTER_EPOCH_TOTAL} AS BIGINT) * w) // 1000) // avail AS fullep,
             ((CAST({_CLUSTER_EPOCH_TOTAL} AS BIGINT) * w) // 1000) % avail AS rem
      FROM w
    ),
    ord AS (
      SELECT t.*, {oracle_bucket_sql("t.doc_id", _EPOCH_BUCKETS, "cep")} AS b,
             md5(CAST(t.doc_id AS VARCHAR) || 'cep') AS h
      FROM toks t
    ),
    cum AS (
      SELECT *, COALESCE(SUM(n_tokens) OVER (
          PARTITION BY cluster ORDER BY b, h, CAST(doc_id AS VARCHAR)
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumpre
      FROM ord
    )
    SELECT c.doc_id, CAST(c.cluster AS INT) AS cluster,
           CAST(c.n_tokens AS INT) AS n_tokens,
           CAST(n.fullep + CASE WHEN c.cumpre < n.rem THEN 1 ELSE 0 END AS INT)
             AS n_epochs,
           CAST(c.n_tokens
                * (n.fullep + CASE WHEN c.cumpre < n.rem THEN 1 ELSE 0 END)
               AS BIGINT) AS planned_tokens
    FROM cum c JOIN need n ON c.cluster = n.cluster
    WHERE n.fullep + CASE WHEN c.cumpre < n.rem THEN 1 ELSE 0 END > 0
    ORDER BY c.doc_id
    """,
)
def corpus_cluster_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full discovered-domain sampling chain in ONE oracled job:
    k-means clusters over the embedding space (staged assignment) →
    temperature weights (T=2, Hamilton seats) → token-budget epoch plan
    with upsampling. This is what corpus_kmeans_domains exists FOR — the
    published cluster-as-domain recipes (DoReMi-style domain reweighting
    over discovered rather than labeled domains) end in exactly this plan:
    small semantic clusters get super-proportional weight from the sqrt
    flattening, and when a small cluster's target share exceeds its
    available tokens it plans whole repeat epochs plus a deterministic
    partial epoch. Both engines recompute weights AND the plan from the
    staged (id, cluster) table — every integer (seats, full epochs,
    boundary-doc selection) is hash-checked end to end. Scale shape
    inherits from operators/sampling.py: weights from one dimension-sized
    aggregate; the plan's running sum is the two-level prefix sum (only
    the single boundary bucket per cluster sorts rows in a task).
    Engine-side training-data surface (no counterpart in the reference)."""
    from ocr_platform_spark.operators.sampling import (
        collect_weights,
        epoch_plan,
        temperature_weights,
    )
    from ocr_platform_spark.operators.semdedup import assign_with_centroid_sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.train_ivf(emb, n_lists=16)
    a = stage(
        assign_with_centroid_sim(emb, cents).select("id", "cluster"),
        "cluster_epoch_assign",
    )
    d = _t(spark, sf_dir, "documents")
    toks = d.join(a, d.doc_id == a.id).select(
        F.col("cluster").cast("string").alias("cluster"),
        "doc_id",
        TX.token_count("text").cast("long").alias("n_tokens"),
    )
    w = collect_weights(
        temperature_weights(toks, "cluster", "n_tokens", sqrt_iters=1, scale=_TEMP_SCALE),
        "cluster",
    )
    plan = epoch_plan(
        toks,
        "cluster",
        "doc_id",
        "n_tokens",
        w,
        _CLUSTER_EPOCH_TOTAL,
        n_buckets=_EPOCH_BUCKETS,
        salt="cep",
    )
    return plan.select(
        "doc_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "n_epochs",
        "planned_tokens",
    ).orderBy("doc_id")


@q(
    "structured_product_offers",
    f"""
    WITH b AS (SELECT url, block FROM read_parquet('{staged_glob("product_blocks")}')),
    o AS (
      SELECT url,
             TRY_CAST(json_extract_string(block, '$.offers.price') AS DECIMAL(10,2))
               AS price,
             json_extract_string(block, '$.offers.priceCurrency') AS currency
      FROM b
    )
    SELECT currency, COUNT(*) AS n_offers,
           CAST(MIN(price) AS DOUBLE) AS min_price,
           CAST(MAX(price) AS DOUBLE) AS max_price,
           CAST(SUM(price) AS DOUBLE) AS sum_price
    FROM o GROUP BY currency ORDER BY currency
    """,
)
def structured_product_offers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed records out of structured data: the valid schema.org Product
    blocks (from the JSON-LD kernel) priced per currency — JSON-path
    extraction runs ENTIRELY JVM-side (``get_json_object``, whole-stage
    codegen; no Python after the staged kernel boundary), with exact
    DECIMAL aggregation. The oracle runs the same paths under DuckDB's
    JSON extension over the staged block strings — a third engine-pair
    check (Jackson vs yyjson) on top of the per-block parse contract of
    ``extract_structured_data``. This is the web-corpus analogue of the
    reference's typed field extraction + voucher arithmetic
    (``ocr_backend/app/services/processing_service.py``,
    ``tally_service.py``: string fields → validated decimals → totals)."""
    from ocr_platform_spark.operators.extract import structured_data_df

    sd = structured_data_df(_synth_docs(spark))
    blocks = (
        sd.select("url", F.explode("blocks").alias("b"))
        .where(F.col("b.is_valid") & (F.col("b.schema_type") == F.lit("Product")))
        .select("url", F.col("b.block").alias("block"))
    )
    staged = stage(blocks, "product_blocks")
    offers = staged.select(
        "url",
        F.expr(
            "try_cast(get_json_object(block, '$.offers.price') AS DECIMAL(10,2))"
        ).alias("price"),
        F.get_json_object("block", "$.offers.priceCurrency").alias("currency"),
    )
    return (
        offers.groupBy("currency")
        .agg(
            F.count("*").alias("n_offers"),
            F.min("price").cast("double").alias("min_price"),
            F.max("price").cast("double").alias("max_price"),
            F.sum("price").cast("double").alias("sum_price"),
        )
        .orderBy("currency")
    )


@q(
    "doc_repeated_spans_sa",
    f"""
    WITH d AS (
      SELECT doc_id, text,
             CAST({oracle_bucket_sql("doc_id", 4, "sa")} AS INT) AS shard
      FROM documents WHERE text IS NOT NULL
    ),
    g AS (
      SELECT doc_id, shard, CAST(i - 1 AS INT) AS pos, substr(text, i, 30) AS g
      FROM (SELECT doc_id, shard, text,
                   unnest(generate_series(1, greatest(len(text) - 29, 1))) AS i
            FROM d)
    ),
    rep AS (
      SELECT shard, g FROM (SELECT shard, g, doc_id FROM g GROUP BY 1, 2, 3)
      GROUP BY shard, g HAVING COUNT(*) >= 2
    ),
    m AS (SELECT g.doc_id, g.pos FROM g JOIN rep ON g.shard = rep.shard AND g.g = rep.g),
    pe AS (
      SELECT doc_id, pos,
             MAX(pos + 30) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM m
    ),
    i AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM pe
    )
    SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 30 AS span_end
    FROM i GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
)
def doc_repeated_spans_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array ExactSubstr marking (operators/suffix_array.py — Lee et
    al. 2022's own data structure): docs are md5-bucketed into 4 shards,
    each shard's repeated spans found by one in-memory rank-doubling pass —
    ZERO shuffle for the marking, the exact-local half of the
    exact-local + winnowed-global composition that runs at 10^12 docs.
    NOTHING is staged: shard assignment is the md5 bucket both engines
    share, and the oracle replays gram extraction from raw parquet BY
    SUBSTRING VALUE — exact codepoints on both sides, no hash anywhere —
    then the same distinct-doc filter and island merge. Differential
    equality with the char-gram exact operator on a single shard is pinned
    in tests/test_suffix_array.py."""
    from ocr_platform_spark.operators.sampling import hash_bucket
    from ocr_platform_spark.operators.suffix_array import sa_repeated_spans

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id", "text", hash_bucket("doc_id", 4, "sa").cast("int").alias("shard")
        )
    )
    return (
        sa_repeated_spans(d, "doc_id", "text", "shard", k=30)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "span_start")
    )


@q(
    "host_heavy_hitters",
    f"""
    WITH s AS (SELECT * FROM read_parquet('{staged_glob("cms_hosts")}')),
    grid AS (SELECT r, b, CAST(SUM(n) AS BIGINT) AS c FROM s GROUP BY r, b),
    est AS (
      SELECT s.host, s.n, MIN(g.c) AS cms_est
      FROM s JOIN grid g ON s.r = g.r AND s.b = g.b
      GROUP BY s.host, s.n
    )
    SELECT host, CAST(n AS BIGINT) AS exact_n, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - n AS BIGINT) AS overcount
    FROM est ORDER BY exact_n DESC, host LIMIT 20
    """,
)
def host_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters (operators/sketches.py): per-host crawl
    frequency read from a 4×32 additive counter grid instead of a full
    per-key shuffle, reported against the exact count (the same
    sketch-vs-exact twin convention as host_cardinality /
    host_cardinality_exact — here BOTH halves are oracle-checked). The
    xxhash64 bucket map is staged with the exact counts; both engines
    rebuild the grid, take every host's min-cell estimate, and verify the
    over-estimate gap row by row. Width 32 against ~50 hosts forces real
    collisions, so nonzero overcounts are part of the hash-checked
    output. The row-path grid (no per-key aggregation — the 10^12-row
    shape) is pinned equal to this staged-path grid in
    tests/test_sketches.py."""
    from ocr_platform_spark.operators import sketches as SK
    from ocr_platform_spark.operators.partitioning import host_of

    docs = _synth_docs(spark)
    exact = (
        docs.select(host_of("url").alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n"))
    )
    bm = SK.cms_bucket_map(exact, "host", depth=4, width=32)
    staged = stage(
        exact.join(bm, exact.host == bm.key).select("host", "n", "r", "b"),
        "cms_hosts",
    )
    grid = staged.groupBy("r", "b").agg(F.sum("n").alias("c"))
    est = (
        staged.join(grid, ["r", "b"])
        .groupBy("host", "n")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.select(
            "host",
            F.col("n").alias("exact_n"),
            "cms_est",
            (F.col("cms_est") - F.col("n")).alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), "host")
        .limit(20)
    )


@q(
    "corpus_kmeans_domains",
    f"""
    WITH a AS (
      SELECT id, cluster, cent_sim FROM read_parquet('{staged_glob("kmeans_assign")}')
    ),
    j AS (
      SELECT a.cluster, a.cent_sim, d.lang, d.n_chars
      FROM a JOIN documents d ON a.id = d.doc_id
    ),
    base AS (
      SELECT cluster, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(cent_sim) AS BIGINT) AS cent_sim_sum
      FROM j GROUP BY cluster
    ),
    pl AS (SELECT cluster, lang, COUNT(*) AS _n FROM j GROUP BY cluster, lang),
    top AS (
      SELECT cluster, lang AS top_lang, CAST(_n AS BIGINT) AS top_lang_docs
      FROM pl
      QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY _n DESC, lang) = 1
    )
    SELECT b.cluster, b.n_docs, b.total_chars, b.n_langs, b.cent_sim_sum,
           t.top_lang, t.top_lang_docs
    FROM base b JOIN top t USING (cluster) ORDER BY cluster
    """,
)
def corpus_kmeans_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discovered-domain profile (operators/clustering.py): k-means-cluster
    the embedding space with the IVF coarse quantizer (bounded driver
    sample, deterministic Lloyd), stage the numpy assignment, and profile
    every cluster against document metadata — size, text mass, language
    spread, the plurality language (count ties broken on the language
    value), and the exact integer sum of ×10^6 centroid similarities. The
    oracle recomputes the whole profile from the staged assignment plus
    raw parquet. This is the topic axis a mixture build uses when metadata
    has none (SemDedup's coarse stage repurposed as curation dimension)."""
    from ocr_platform_spark.operators.clustering import cluster_profile
    from ocr_platform_spark.operators.semdedup import assign_with_centroid_sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.train_ivf(emb, n_lists=16)
    a = stage(assign_with_centroid_sim(emb, cents), "kmeans_assign")
    d = _t(spark, sf_dir, "documents")
    prof = cluster_profile(d, a)
    return prof.select(
        "cluster",
        "n_docs",
        "total_chars",
        "n_langs",
        F.col("cent_sim_sum"),
        "top_lang",
        "top_lang_docs",
    ).orderBy("cluster")


@q(
    "corpus_cluster_sample",
    f"""
    WITH a AS (
      SELECT id, cluster FROM read_parquet('{staged_glob("cluster_sample_assign")}')
    ),
    r AS (
      SELECT id, cluster,
             row_number() OVER (
               PARTITION BY cluster
               ORDER BY md5(CAST(id AS VARCHAR) || 'cb'), CAST(id AS VARCHAR)
             ) AS rk
      FROM a
    )
    SELECT id AS vec_id, cluster, CAST(rk AS INT) AS draw_rank
    FROM r WHERE rk <= 40 ORDER BY cluster, vec_id
    """,
)
def corpus_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced downsampling (operators/clustering.py): at most 40
    docs per discovered k-means cluster, drawn by md5 order — the
    ClusterClip-style flattening that stops a template-farm cluster from
    dominating the mix the way a mega-host would without host_downsample.
    The (id, cluster) assignment is staged; BOTH engines rank within
    cluster under the identical md5 draw and apply the cap, so draw order
    and cap are verified cross-engine. The rank filter compiles to
    WindowGroupLimit — no cluster is ever fully sorted."""
    from ocr_platform_spark.operators.clustering import cluster_balanced_sample
    from ocr_platform_spark.operators.semdedup import assign_with_centroid_sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.train_ivf(emb, n_lists=16)
    a = stage(
        assign_with_centroid_sim(emb, cents).select("id", "cluster"),
        "cluster_sample_assign",
    )
    return (
        cluster_balanced_sample(a, cap=40)
        .select(F.col("id").alias("vec_id"), "cluster", "draw_rank")
        .orderBy("cluster", "vec_id")
    )


# =========================================================================
# Round-4 tail: URL hygiene, readability, code routing, quality-aware dedup
# =========================================================================


@q(
    "url_param_stats",
    rf"""
    WITH u AS (SELECT url FROM read_parquet('{staged_glob("url_param_urls")}')),
    kv AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
             url,
             unnest(str_split(regexp_extract(url, '\?([^#]*)', 1), '&')) AS pair
      FROM u
    ),
    p AS (
      SELECT host, url, split_part(pair, '=', 1) AS param,
             split_part(pair, '=', 2) AS val
      FROM kv WHERE pair <> ''
    )
    SELECT host, param,
           COUNT(DISTINCT url) AS n_urls,
           COUNT(DISTINCT val) AS n_vals,
           (COUNT(DISTINCT val) = COUNT(DISTINCT url)
            AND COUNT(DISTINCT url) >= 4) AS per_visit
    FROM p GROUP BY host, param ORDER BY host, param
    """,
)
def url_param_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracking/session query-parameter mining — the evidence table behind a
    URL-canonicalization strip list (`url_canonicalization` hard-codes the
    utm/gclid list; this DISCOVERS per-visit params from the crawl itself):
    a (host, param) whose distinct-value count equals its url count is a
    per-visit identifier (session ids, cache busters) and safe to strip
    before URL-level dedup. Fully relational — one explode + one groupBy on
    (host, param), so at 10^12 urls it is a single shuffle keyed far finer
    than host. Both engines parse the SAME staged url table with the same
    regex/split chain; counts are exact integers."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    host = F.concat(
        F.lit("site-"), F.pmod("doc_id", F.lit(8)).cast("string"), F.lit(".example.org")
    )
    qstr = F.concat(
        F.lit("q="), F.pmod("doc_id", F.lit(10)).cast("string"),
        F.when(F.pmod("doc_id", F.lit(2)) == 0, F.concat(F.lit("&sid=s"), did))
        .otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(F.lit("&page="), F.pmod("doc_id", F.lit(5)).cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit("&utm_source=feed"))
        .otherwise(F.lit("")),
    )
    urls = d.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"), did, F.lit("?"), qstr).alias("url")
    )
    staged = stage(urls, "url_param_urls", partitions=2)
    kv = staged.select(
        F.regexp_extract("url", r"^[a-z]+://([^/?#]+)", 1).alias("host"),
        "url",
        F.explode(F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&")).alias("pair"),
    ).where(F.col("pair") != "")
    p = kv.select(
        "host",
        "url",
        F.substring_index("pair", "=", 1).alias("param"),
        F.substring_index("pair", "=", -1).alias("val"),
    )
    return (
        p.groupBy("host", "param")
        .agg(
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("val").alias("n_vals"),
        )
        .withColumn(
            "per_visit",
            (F.col("n_vals") == F.col("n_urls")) & (F.col("n_urls") >= 4),
        )
        .orderBy("host", "param")
    )


_SOFTBLOCK_SLUGS = [
    "news", "travel", "casino-royale", "cooking", "poker-tips", "health",
    "free-bets", "science", "adult-stories", "history", "win-big-now",
    "sports", "essay", "webcam-chat", "nature", "free-library",
]


def _softblock_oracle_sql() -> str:
    from ocr_platform_spark.functions.urlfns import softblock_score_sql

    slug_list = ", ".join(f"'{s}'" for s in _SOFTBLOCK_SLUGS)
    score = softblock_score_sql("url")
    return f"""
    WITH u AS (
      SELECT doc_id,
        'https://site-' || CAST(doc_id % 8 AS VARCHAR) || '.example.org/' ||
        ([{slug_list}])[(doc_id % 16) + 1] ||
        '/item-' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id, url, CAST({score} AS INT) AS score,
           {score} >= 40 AS blocked
    FROM u ORDER BY doc_id
    """


@q("url_softblock_score", _softblock_oracle_sql())
def url_softblock_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft URL blocklist scoring (functions/urlfns.url_softblock_score;
    the RefinedWeb recipe's weighted-fragment URL rule, complementing the
    exact-match blocklist_filter): each flagged fragment CONTAINED in the
    url adds its weight, and the page blocks above a threshold — so
    'free-bets' accumulates free+bet past the gate while a lone 'webcam'
    or 'free-library' hit stays under it. The weight table has ONE source
    of truth (urlfns.SOFTBLOCK_WEIGHTS) from which both the Column
    expression and the oracle SQL are generated, so engines cannot
    drift. Map-side only: the fragment list unrolls into the row
    expression (whole-stage codegen, no join, no shuffle)."""
    from ocr_platform_spark.functions.urlfns import url_softblock_score as score_fn

    d = _t(spark, sf_dir, "documents").select("doc_id")
    slug = F.element_at(
        F.array(*[F.lit(s) for s in _SOFTBLOCK_SLUGS]),
        (F.pmod("doc_id", F.lit(16)) + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://site-"),
        F.pmod("doc_id", F.lit(8)).cast("string"),
        F.lit(".example.org/"),
        slug,
        F.lit("/item-"),
        F.col("doc_id").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    s = score_fn("url")
    return u.select(
        "doc_id", "url", s.cast("int").alias("score"), (s >= 40).alias("blocked")
    ).orderBy("doc_id")


@q(
    "doc_readability",
    """
    WITH c AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(lower(coalesce(text,'')), '[a-z]+')) AS BIGINT) AS words,
        CAST(greatest(len(regexp_extract_all(coalesce(text,''), '[.!?]+')), 1) AS BIGINT) AS sents,
        CAST(len(regexp_extract_all(lower(coalesce(text,'')), '[aeiouy]+')) AS BIGINT) AS sylls
      FROM documents
    ),
    s AS (
      SELECT doc_id, words, sents, sylls,
        round(206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))
              - 84.6 * (CAST(sylls AS DOUBLE) / CAST(greatest(words, 1) AS DOUBLE)),
              4) AS flesch
      FROM c
    )
    SELECT doc_id, words, sents, sylls, flesch,
      CASE WHEN flesch >= 70 THEN 'easy' WHEN flesch >= 50 THEN 'standard'
           WHEN flesch >= 30 THEN 'difficult' ELSE 'very_difficult' END AS band
    FROM s ORDER BY doc_id
    """,
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — a standard curation quality axis
    alongside `doc_quality`/`doc_gopher_rules` (readability bands drive
    mixture weights for kid-safe / technical subsets). Deterministic
    syllable proxy: vowel groups ``[aeiouy]+`` in lowercased text (the usual
    cheap estimator); sentences = ``[.!?]+`` runs, floored at 1. The score
    is ONE double op sequence over exact integer counts, identical per
    IEEE-754 in both engines, rounded to 4 dp; the band is derived from the
    rounded value so the CASE sees identical inputs. Map-side only — no
    shuffle at any scale."""
    d = _t(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    words = F.size(F.regexp_extract_all(F.lower(txt), F.lit("[a-z]+"), F.lit(0))).cast("long")
    sents = (
        F.greatest(F.size(F.regexp_extract_all(txt, F.lit("[.!?]+"), F.lit(0))), F.lit(1))
        .cast("long")
    )
    sylls = F.size(F.regexp_extract_all(F.lower(txt), F.lit("[aeiouy]+"), F.lit(0))).cast("long")
    c = d.select("doc_id", words.alias("words"), sents.alias("sents"), sylls.alias("sylls"))
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words").cast("double") / F.col("sents").cast("double"))
        - F.lit(84.6)
        * (
            F.col("sylls").cast("double")
            / F.greatest(F.col("words"), F.lit(1).cast("long")).cast("double")
        ),
        4,
    )
    return (
        c.withColumn("flesch", flesch)
        .withColumn(
            "band",
            F.when(F.col("flesch") >= 70, F.lit("easy"))
            .when(F.col("flesch") >= 50, F.lit("standard"))
            .when(F.col("flesch") >= 30, F.lit("difficult"))
            .otherwise(F.lit("very_difficult")),
        )
        .orderBy("doc_id")
    )


#: One source of truth for the code-line predicate lives in
#: functions/textfns.CODE_LINE_RE (shared with the pipeline's code_route
#: stage); the oracle SQL embeds it literally and the parity test catches
#: any drift.
_CODE_LINE_RE = TX.CODE_LINE_RE


def _mix_code_docs(d: DataFrame) -> DataFrame:
    """Deterministically rewrite every 5th doc as a synthetic code snippet
    (pure function of doc_id) so the prose/code router has both classes —
    shared by `doc_code_density` and `corpus_code_route_report`."""
    did = F.col("doc_id").cast("string")
    code = F.concat(
        F.lit("import os\ndef fn_"), did,
        F.lit("(x):\n    y = x + "), F.pmod("doc_id", F.lit(97)).cast("string"),
        F.lit(";\n    return y * 2\nclass C"), did,
        F.lit(":\n    pass\nwhile x:\n    x -= 1\nresult = fn_"), did,
        F.lit("(3);\n# done\n"),
    )
    return d.withColumn(
        "text", F.when(F.pmod("doc_id", F.lit(5)) == 0, code).otherwise(F.col("text"))
    )


@q(
    "doc_code_density",
    rf"""
    WITH l AS (
      SELECT doc_id, unnest(str_split(coalesce(text,''), chr(10))) AS line
      FROM read_parquet('{staged_glob("code_density_docs")}')
    ),
    nz AS (SELECT doc_id, line FROM l WHERE trim(line) <> ''),
    a AS (
      SELECT doc_id, COUNT(*) AS n_lines,
             CAST(SUM(CASE WHEN regexp_matches(line,
               '^(    |\t)|[;{{}}] *$|^(def |class |import |return |while |for )')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_code
      FROM nz GROUP BY doc_id
    )
    SELECT doc_id, n_lines, n_code,
           round(CAST(n_code AS DOUBLE) / CAST(n_lines AS DOUBLE), 4) AS code_ratio,
           n_code * 10 >= n_lines * 3 AS is_code
    FROM a ORDER BY doc_id
    """,
)
def doc_code_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prose/code routing gate (StarCoder-style corpus splitting): per-doc
    share of code-shaped lines (indent, ``;{{}}`` terminators, leading
    keyword), flag ``is_code`` decided by the EXACT integer comparison
    ``10·n_code ≥ 3·n_lines`` (no float threshold drift). Every 5th doc is
    deterministically rewritten as a synthetic code snippet so the gate has
    both classes to separate; the mixed text is staged and BOTH engines
    classify the same bytes with the same regex. Explode + groupBy(doc_id)
    keys the one shuffle on the finest key there is — scale-indifferent."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    staged = stage(_mix_code_docs(d), "code_density_docs", partitions=2)
    lines = staged.select(
        "doc_id",
        F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), "\n")).alias("line"),
    ).where(F.trim("line") != "")
    agg = lines.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("line").rlike(_CODE_LINE_RE), 1).otherwise(0))
        .cast("long")
        .alias("n_code"),
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_code",
        F.round(F.col("n_code").cast("double") / F.col("n_lines").cast("double"), 4)
        .alias("code_ratio"),
        (F.col("n_code") * 10 >= F.col("n_lines") * 3).alias("is_code"),
    ).orderBy("doc_id")


@q(
    "dedup_quality_eviction",
    rf"""
    WITH lab AS (SELECT * FROM read_parquet('{staged_glob("qevict_labels")}')),
    s AS (
      SELECT d.doc_id,
             COALESCE(l.comp, d.doc_id) AS cluster_id,
             CAST(100 * len(regexp_extract_all(lower(coalesce(d.text,'')),
                    '\b(the|and|of|to|in|that|with)\b'))
                  + length(coalesce(d.text,'')) AS BIGINT) AS score
      FROM documents d LEFT JOIN lab l ON l.id = d.doc_id
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rn
      FROM s
    )
    SELECT doc_id, cluster_id, score, rn = 1 AS kept
    FROM r ORDER BY cluster_id, doc_id
    """,
)
def dedup_quality_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup eviction: keep the HIGHEST-quality doc per
    near-dup cluster instead of the min-id survivor (`doc_dedup_survivors`)
    — the policy real curation uses so a cleaner mirror beats a boilerplate-
    laden original (RefinedWeb keeps "best by heuristic" within clusters).
    Cluster labels ride the already-oracled MinHash→connected-components
    pipeline (`doc_dedup_clusters` replays that recurrence cross-engine;
    here the final labels are staged) and BOTH engines recompute the integer
    quality score ``100·stopword_hits + n_chars`` from the raw parquet, rank
    within cluster under the identical (score DESC, doc_id) order, and keep
    rank 1. Unclustered docs are their own cluster via the left join. The
    rank-1 filter compiles to WindowGroupLimit — no cluster fully sorted."""
    from ocr_platform_spark.operators.linkgraph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(d, "doc_id", "text", threshold=0.5).select(
        "id_a", "id_b"
    )
    labels = stage(connected_components(pairs, iterations=_CC_ITER), "qevict_labels")
    txt = F.coalesce(F.col("text"), F.lit(""))
    stops = F.size(
        F.regexp_extract_all(
            F.lower(txt), F.lit(r"\b(the|and|of|to|in|that|with)\b"), F.lit(0)
        )
    ).cast("long")
    scored = d.select(
        "doc_id", (F.lit(100).cast("long") * stops + F.length(txt).cast("long")).alias("score")
    )
    assigned = (
        scored.join(labels, scored.doc_id == labels.id, "left")
        .select("doc_id", F.coalesce("comp", "doc_id").alias("cluster_id"), "score")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        assigned.withColumn("rn", F.row_number().over(w))
        .select("doc_id", "cluster_id", "score", (F.col("rn") == 1).alias("kept"))
        .orderBy("cluster_id", "doc_id")
    )


@q(
    "crawl_budget_allocation",
    r"""
    WITH c AS (
      SELECT doc_id,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
        CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|that|with)\b')) AS DOUBLE) AS stops,
        CAST(length(text) - length(regexp_replace(text, '[.,;:!?()]', '', 'g')) AS DOUBLE) AS punct
      FROM documents
    ),
    d AS (
      SELECT 'site-' || CAST(doc_id % 40 AS VARCHAR) AS host,
        CAST(round(round(
          least(toks / 100.0, 1.0) * 0.4
          + least((CASE WHEN toks > 0 THEN stops / toks ELSE 0.0 END) * 5.0, 1.0) * 0.3
          + (1.0 - least((CASE WHEN toks > 0 THEN punct / toks ELSE 1.0 END) * 2.0, 1.0)) * 0.3,
          4) * 1000) AS BIGINT) AS q_x1000
      FROM c
    ),
    m AS (SELECT host, CAST(SUM(q_x1000) AS BIGINT) AS mass FROM d GROUP BY host),
    t AS (SELECT CAST(SUM(mass) AS BIGINT) AS total FROM m),
    b AS (
      SELECT host, mass,
             (1000 * mass) // total AS base,
             (1000 * mass) % total AS rem
      FROM m, t
    ),
    l AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS leftover FROM b),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk FROM b
    )
    SELECT host, mass,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS slots,
           CAST(least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END, 120)
                AS BIGINT) AS capped_slots
    FROM r, l ORDER BY host
    """,
)
def crawl_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-budget apportionment: split a 1000-slot fetch budget across
    hosts proportional to their quality MASS (sum of per-doc quality in
    integer milli-units — the host_quality_rollup substrate), by exact
    largest-remainder rounding: ``base = ⌊B·m/M⌋`` plus one extra slot to
    the top-remainder hosts until the budget is whole, then a politeness
    cap (120 slots/host, cap losses intentionally unredistributed). This is
    the planning step between `host_quality_rollup` (which hosts deserve
    crawl) and `crawl_fetch_schedule` (when to fetch) — the same integer
    apportionment recipe as `corpus_epoch_plan`, applied to the frontier.
    All arithmetic is BIGINT so both engines agree bit-for-bit; the two
    scalar aggregates (total mass, leftover) broadcast — at 10^8 hosts the
    only shuffle is the host rollup plus one global top-leftover rank over
    host-count-sized (not corpus-sized) data."""
    d = _t(spark, sf_dir, "documents")
    q1000 = F.round(TX.quality_score("text") * 1000).cast("long")
    mass = (
        d.select(
            F.concat(F.lit("site-"), (F.col("doc_id") % 40).cast("string")).alias("host"),
            q1000.alias("q_x1000"),
        )
        .groupBy("host")
        .agg(F.sum("q_x1000").cast("long").alias("mass"))
    )
    total = mass.agg(F.sum("mass").cast("long").alias("total"))
    b = mass.crossJoin(F.broadcast(total)).select(
        "host",
        "mass",
        F.expr("(1000 * mass) div total").alias("base"),
        F.pmod(F.lit(1000) * F.col("mass"), F.col("total")).alias("rem"),
    )
    leftover = b.agg((F.lit(1000) - F.sum("base")).cast("long").alias("leftover"))
    w = Window.orderBy(F.desc("rem"), F.asc("host"))
    slots = F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return (
        b.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            "host",
            "mass",
            slots.cast("long").alias("slots"),
            F.least(slots, F.lit(120)).cast("long").alias("capped_slots"),
        )
        .orderBy("host")
    )


#: genuinely script-mixed fixture pages for `doc_script_mix` (the synth
#: corpus is Latin-only; SEO spam and boilerplate-injected pages are not) —
#: identical literals on both engines.
_MIX_FIXTURES: list[tuple[int, str]] = [
    (910001, "english words mixed with 中文字符测试 and русские буквы here"),
    (910002, "这是一个纯中文文档 没有其他文字"),
    (910003, "plain english with وثيقة عربية مختلطة inside the page"),
    (910004, "entirely latin text with no other scripts at all"),
    (910005, "ひらがな文書 with trailing english tail words"),
]
_MIX_FIXTURES_SQL = ", ".join(f"({i}, '{t}')" for i, t in _MIX_FIXTURES)
_MIX_SCRIPTS = ["lat"] + [lang for lang, _ in TX.SCRIPT_RANGES]
_MIX_NS_SQL = " + ".join(
    f"(CASE WHEN c_{s} >= {TX.SCRIPT_MIN_CHARS} THEN 1 ELSE 0 END)"
    for s in _MIX_SCRIPTS
)


@q(
    "corpus_code_route_report",
    rf"""
    WITH ccr AS (SELECT doc_id, text FROM read_parquet('{staged_glob("croute_docs")}')),
    sc AS (SELECT doc_id, {_SCRIPT_COUNTS_SQL} FROM ccr),
    mixed AS (SELECT doc_id FROM sc WHERE {_MIX_NS_SQL} >= 2),
    gated AS (
      SELECT doc_id, text FROM ccr
      WHERE doc_id % 7 <> 0 AND doc_id NOT IN (SELECT doc_id FROM mixed)
    ),
    lines AS (
      SELECT doc_id, unnest(str_split(coalesce(text,''), chr(10))) AS line FROM gated
    ),
    nz AS (SELECT doc_id, line FROM lines WHERE trim(line) <> ''),
    lc AS (
      SELECT doc_id, COUNT(*) AS n_lines,
             SUM(CASE WHEN regexp_matches(line,
               '^(    |\t)|[;{{}}] *$|^(def |class |import |return |while |for )')
               THEN 1 ELSE 0 END) AS n_code
      FROM nz GROUP BY doc_id
    ),
    codes AS (SELECT doc_id FROM lc WHERE n_code * 10 >= n_lines * 3),
    routed AS (
      SELECT doc_id, text FROM gated
      WHERE doc_id NOT IN (SELECT doc_id FROM codes)
    ),
    t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM ccr
    ),
    g AS (
      SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS g
      FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS i
            FROM t WHERE len(ts) >= 8)
    ),
    ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
    contaminated AS (
      SELECT DISTINCT gg.doc_id FROM g gg JOIN ev USING (g)
      WHERE gg.doc_id IN (SELECT doc_id FROM routed)
    ),
    s1 AS (
      SELECT doc_id, text FROM routed
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    split2 AS (
      SELECT doc_id, string_split_regex(text, '\n{{2,}}') AS ps FROM s1
    ),
    paras AS (
      SELECT doc_id, CAST(i - 1 AS INT) AS idx, ps[i] AS para
      FROM (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i FROM split2)
      WHERE length(ps[i]) >= 1
    ),
    toks AS (
      SELECT doc_id, idx,
             CAST(len(list_filter(string_split_regex(para, '\s+'), x -> x <> ''))
                  AS BIGINT) AS tok
      FROM paras
    ),
    cum AS (
      SELECT doc_id, idx, tok,
             COALESCE(SUM(tok) OVER (PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM toks
    ),
    chunkcnt AS (
      SELECT COUNT(*) AS n FROM (
        SELECT doc_id, cum_before // 40 AS cid FROM cum GROUP BY doc_id, cum_before // 40
      )
    )
    SELECT CAST(stage_no AS INT) AS stage_no, stage, CAST(n AS BIGINT) AS n_docs
    FROM (
      VALUES (0, 'input',       (SELECT COUNT(*) FROM ccr)),
             (1, 'train_split', (SELECT COUNT(*) FROM ccr WHERE doc_id % 7 <> 0)),
             (2, 'script_gate', (SELECT COUNT(*) FROM gated)),
             (3, 'code_route',  (SELECT COUNT(*) FROM routed)),
             (4, 'decontam',    (SELECT COUNT(*) FROM s1)),
             (5, 'chunks',      (SELECT n FROM chunkcnt))
    ) AS v(stage_no, stage, n)
    ORDER BY stage_no
    """,
)
def corpus_code_route_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refine tail's map-side GATES composed with their neighbors
    (plans/pipeline.corpus_refine_stages ``script_gate=True,
    code_route='prose'``) and oracle-verified as a funnel: a mixed
    prose+code+non-Latin corpus (every 5th doc rewritten as a
    deterministic code snippet, the script-mixed fixture pages appended,
    staged) → eval split (doc_id % 7 = 0) → SCRIPT-MIXING gate (≥2
    scripts over the shared threshold, textfns.script_mix_count) → code
    routing by the integer line-share rule → benchmark decontamination
    (exact word 8-gram overlap vs the eval set) → paragraph chunking of
    the survivors (40-token budget). The oracle replays script counting,
    line classification, the gram overlap, and the chunk plan from the
    same staged bytes — each stage count cross-engine checked. Both gates
    are pure map-side expressions: composing them adds NO shuffle ahead
    of the decontam anti-join."""
    from ocr_platform_spark.plans.pipeline import corpus_refine_stages

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fx = spark.createDataFrame(_MIX_FIXTURES, "doc_id long, text string")
    mixed = stage(_mix_code_docs(d).unionByName(fx), "croute_docs", partitions=2)
    ev = mixed.where(F.col("doc_id") % 7 == 0)
    train = mixed.where(F.col("doc_id") % 7 != 0)
    _, _, metrics = corpus_refine_stages(
        train,
        script_gate=True,
        code_route="prose",
        decontam_eval=ev,
        decontam_n=8,
        chunk_budget=40,
    )
    n0 = mixed.count()
    nt = train.count()
    n_gate = nt - metrics["script_gate_dropped"]
    n_route = n_gate - metrics["code_route_dropped"]
    n_dec = n_route - metrics["decontam_dropped"]
    rows = [
        (0, "input", n0),
        (1, "train_split", nt),
        (2, "script_gate", n_gate),
        (3, "code_route", n_route),
        (4, "decontam", n_dec),
        (5, "chunks", metrics["n_chunks"]),
    ]
    return spark.createDataFrame(rows, "stage_no int, stage string, n_docs bigint")


@q(
    "url_revisit_policy",
    f"""
    WITH stats AS ({{revisit_sql}}),
    pol AS (
      SELECT doc_id,
             'site-' || CAST(doc_id % 40 AS VARCHAR) AS host,
             latest_cycle + (CASE WHEN change_rate_pm >= 500 THEN 1
                                  WHEN change_rate_pm >= 250 THEN 2
                                  WHEN change_rate_pm > 0 THEN 4
                                  ELSE 8 END) AS next_fetch
      FROM stats
    )
    SELECT host,
           COUNT(*) AS n_pages,
           CAST(SUM(CASE WHEN next_fetch <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_due,
           CAST(greatest(
             SUM(CASE WHEN next_fetch <= 3 THEN 1 ELSE 0 END) - 20, 0
           ) AS BIGINT) AS n_overflow
    FROM pol GROUP BY host ORDER BY host
    """.format(revisit_sql=CATALOG["url_revisit_diff"].oracle),
)
def url_revisit_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive revisit SCHEDULING on top of `url_revisit_diff`'s change
    detection (Cho & Garcia-Molina: refresh frequency ∝ observed change
    rate): each page's next-fetch cycle = latest cycle + an integer
    interval tier from its per-mille change rate (≥500‰ → every cycle,
    ≥250‰ → 2, any change → 4, static → 8), then a per-host load report
    for the upcoming cycle — pages due, and the overflow past a 20-page
    per-host-per-cycle politeness cap that must spill to later cycles.
    The oracle embeds url_revisit_diff's SQL verbatim as a CTE (one
    source of truth for the replay) and reapplies the same integer
    tiers. Scale shape unchanged from the diff query — one window + two
    aggregates, all keyed by doc_id then host."""
    stats = url_revisit_diff(spark, sf_dir)
    interval = (
        F.when(F.col("change_rate_pm") >= 500, 1)
        .when(F.col("change_rate_pm") >= 250, 2)
        .when(F.col("change_rate_pm") > 0, 4)
        .otherwise(8)
    )
    pol = stats.select(
        F.concat(F.lit("site-"), (F.col("doc_id") % 40).cast("string")).alias("host"),
        (F.col("latest_cycle") + interval).alias("next_fetch"),
    )
    n_due = F.sum(F.when(F.col("next_fetch") <= 3, 1).otherwise(0)).cast("long")
    return (
        pol.groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            n_due.alias("n_due"),
        )
        .withColumn("n_overflow", F.greatest(F.col("n_due") - 20, F.lit(0).cast("long")))
        .orderBy("host")
    )


@q(
    "host_token_budget_cut",
    r"""
    WITH c AS (
      SELECT doc_id,
        'site-' || CAST(doc_id % 40 AS VARCHAR) AS host,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
             END AS BIGINT) AS tok,
        CAST(100 * len(regexp_extract_all(lower(coalesce(text,'')),
               '\b(the|and|of|to|in|that|with)\b'))
             + length(coalesce(text,'')) AS BIGINT) AS score
      FROM documents
    ),
    w AS (
      SELECT doc_id, host, tok, score,
             COALESCE(SUM(tok) OVER (PARTITION BY host
               ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM c
    )
    SELECT host,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN cum_before < 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN cum_before < 2000 THEN tok ELSE 0 END) AS BIGINT)
             AS tokens_kept
    FROM w GROUP BY host ORDER BY host
    """,
)
def host_token_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host TOKEN budget (the unit training mixes are actually priced
    in — `host_downsample` caps doc COUNT by random draw; this caps token
    share, keeping each host's best docs first): within every host, docs
    ranked by the integer quality score (100·stopword_hits + n_chars,
    the dedup_quality_eviction scale) descending, kept while the running
    token total BEFORE the doc is under the 2000-token host budget — the
    same keep-iff-cum-before-under-budget rule as the composed job's
    global cut, applied per host. One window + one aggregate, both
    partitioned by host: at 10^8 hosts the shuffle key is host and no
    global sort exists. All arithmetic integer; both engines replay the
    identical (score DESC, doc_id) order."""
    d = _t(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    stops = F.size(
        F.regexp_extract_all(
            F.lower(txt), F.lit(r"\b(the|and|of|to|in|that|with)\b"), F.lit(0)
        )
    ).cast("long")
    c = d.select(
        "doc_id",
        F.concat(F.lit("site-"), (F.col("doc_id") % 40).cast("string")).alias("host"),
        TX.token_count("text").cast("long").alias("tok"),
        (F.lit(100).cast("long") * stops + F.length(txt).cast("long")).alias("score"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept = F.col("cum_before") < 2000
    return (
        c.withColumn("cum_before", F.coalesce(F.sum("tok").over(w), F.lit(0).cast("long")))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum("tok").cast("long").alias("tokens_total"),
            F.sum(F.when(kept, F.col("tok")).otherwise(0)).cast("long").alias("tokens_kept"),
        )
        .orderBy("host")
    )


@q(
    "doc_script_mix",
    f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id AS BIGINT), text
      FROM (VALUES {_MIX_FIXTURES_SQL}) AS fx(doc_id, text)
    ),
    s AS (SELECT doc_id, {_SCRIPT_COUNTS_SQL} FROM docs)
    SELECT doc_id,
      {', '.join(f"CAST(c_{x} AS INT) AS c_{x}" for x in _MIX_SCRIPTS)},
      CAST({_MIX_NS_SQL} AS INT) AS n_scripts,
      ({_MIX_NS_SQL}) >= 2 AS mixed
    FROM s ORDER BY doc_id
    """,
)
def doc_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-MIXING detection — the spam/SEO signal `doc_lang_id`'s
    dominance rule deliberately ignores (it picks ONE language; keyword
    stuffers interleave scripts): per-doc character counts for Latin and
    each non-Latin block in textfns.SCRIPT_RANGES, the number of scripts
    present at the shared SCRIPT_MIN_CHARS threshold, and a ``mixed``
    flag at ≥2 scripts. Both engines derive their counting expressions
    from the SAME textfns constants (ranges, threshold), so the rule
    cannot drift; mixed fixture pages extend the Latin-only testdata.
    Pure map-side column expressions — no shuffle before the final sort."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fx = spark.createDataFrame(_MIX_FIXTURES, "doc_id long, text string")
    docs = d.unionByName(fx)

    def script_count(rng: str):
        return (
            F.length("text") - F.length(F.regexp_replace("text", f"[{rng}]", ""))
        ).cast("int")

    counts = [script_count(TX.LATIN_RANGE).alias("c_lat")] + [
        script_count(rng).alias(f"c_{lang}") for lang, rng in TX.SCRIPT_RANGES
    ]
    s = docs.select("doc_id", *counts)
    ns = sum(
        F.when(F.col(f"c_{x}") >= TX.SCRIPT_MIN_CHARS, 1).otherwise(0)
        for x in _MIX_SCRIPTS
    )
    return (
        s.withColumn("n_scripts", ns.cast("int"))
        .withColumn("mixed", F.col("n_scripts") >= 2)
        .orderBy("doc_id")
    )


#: regex shared verbatim by both engines (page_meta dialect-parity
#: contract: no lookaround, ASCII classes, (?is) flags only)
_HEADING_PAT = r"(?is)<h([1-3])[^>]*>([^<]*)</h"

#: multi-level outline fixtures — the synth corpus emits a single <h1>
#: per page, so nested h2/h3 structure rides fixture pages (identical
#: literals through the same staged table both engines read).
_HEADING_FIXTURES: list[tuple[str, str]] = [
    (
        "fixture://outline-1",
        '<html><body><h1>Alpha One</h1><p>x</p><h2 class="s">Beta Two</h2>'
        "<h3>Gamma Three</h3><h2>Delta Four</h2></body></html>",
    ),
    ("fixture://outline-2", "<html><body><h1>Only Top</h1></body></html>"),
    ("fixture://outline-3", "<html><body><p>no headings here</p></body></html>"),
]


@q(
    "doc_homoglyph_scan",
    r"""
    WITH raw AS (
      SELECT doc_id,
        substr(text, 1, 60)
        || CASE WHEN doc_id % 7 = 0 THEN ' pаypal-login now' ELSE '' END
        || CASE WHEN doc_id % 11 = 0 THEN ' сhase bank' ELSE '' END
        || CASE WHEN doc_id % 13 = 0 THEN ' Москва photos' ELSE '' END
        AS body
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(body, '\s+'), x -> x <> '') AS ws
      FROM raw
    ),
    m AS (
      SELECT doc_id, ws,
             list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')
                              AND regexp_matches(x, '[\x{0400}-\x{04ff}]')) AS mixed
      FROM w
    )
    SELECT doc_id,
           CAST(len(ws) AS INT) AS n_words,
           CAST(len(mixed) AS INT) AS n_mixed,
           COALESCE(list_min(mixed), '') AS example,
           len(mixed) >= 1 AS has_spoof
    FROM m ORDER BY doc_id
    """,
)
def doc_homoglyph_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level homoglyph spoofing scan (functions/textfns.
    mixed_script_words): a word straddling Latin AND Cyrillic letters
    ('pаypal' with а = U+0430) is the phishing/cloaking unit that
    doc-level script counting (doc_script_mix) cannot see — one spoofed
    word in a Latin page clears no per-script threshold, while a fully
    Cyrillic word in Russian text is normal and must NOT flag (the
    'Москва' control row). Map-side split+filter expressions, no
    shuffle; the oracle replays the word split, the two-script regex
    conjunction and the deterministic example pick."""
    from ocr_platform_spark.functions.textfns import mixed_script_words

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.concat(
        F.substring("text", 1, 60),
        F.when(did % 7 == 0, F.lit(" pаypal-login now")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit(" сhase bank")).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.lit(" Москва photos")).otherwise(
            F.lit("")
        ),
    )
    raw = d.select("doc_id", body.alias("body"))
    ws = F.filter(F.split("body", r"\s+", -1), lambda x: x != F.lit(""))
    m = raw.select(
        "doc_id", ws.alias("ws"), mixed_script_words("body").alias("mixed")
    )
    return m.select(
        "doc_id",
        F.size("ws").cast("int").alias("n_words"),
        F.size("mixed").cast("int").alias("n_mixed"),
        F.coalesce(F.array_min("mixed"), F.lit("")).alias("example"),
        (F.size("mixed") >= 1).alias("has_spoof"),
    ).orderBy("doc_id")


@q(
    "extract_headings",
    rf"""
    WITH r AS (SELECT url, raw FROM read_parquet('{staged_glob("headings_raw")}')),
    x AS (
      SELECT url,
             regexp_extract_all(raw, '(?is)<h([1-3])[^>]*>([^<]*)</h', 1) AS ls,
             regexp_extract_all(raw, '(?is)<h([1-3])[^>]*>([^<]*)</h', 2) AS ts
      FROM r
    )
    SELECT url, CAST(i AS INT) AS pos, CAST(ls[i] AS INT) AS level, ts[i] AS heading
    FROM (SELECT url, ls, ts, unnest(generate_series(1, len(ls))) AS i FROM x)
    ORDER BY url, pos
    """,
)
def extract_headings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-OUTLINE extraction (h1-h3 hierarchy per page, in document
    order) — the structure layer between main-content extraction (which
    flattens headings into text) and retrieval chunking (section-aware
    chunk boundaries are the canonical upgrade over fixed token windows).
    The charset-decoded payload is staged and BOTH engines run the same
    heading regex over identical characters (the page_meta dialect-parity
    contract), emitting (position, level, heading text) per match — the
    parse itself is cross-engine verified, fixture pages supplying the
    nested h2/h3 cases the single-h1 synth corpus lacks. Map-side
    regexp_extract_all + posexplode: no shuffle before the final sort."""
    from ocr_platform_spark.operators.extract import page_metadata_df

    meta = page_metadata_df(_synth_docs(spark)).select("url", "raw")
    fx = spark.createDataFrame(_HEADING_FIXTURES, "url string, raw string")
    staged = stage(meta.unionByName(fx), "headings_raw", partitions=2)
    ls = F.regexp_extract_all("raw", F.lit(_HEADING_PAT), F.lit(1)).alias("lv")
    ts = F.regexp_extract_all("raw", F.lit(_HEADING_PAT), F.lit(2)).alias("tx")
    z = staged.select(
        "url", F.posexplode(F.arrays_zip(ls, ts)).alias("p", "h")
    )
    return z.select(
        "url",
        (F.col("p") + 1).cast("int").alias("pos"),
        F.col("h.lv").cast("int").alias("level"),
        F.col("h.tx").alias("heading"),
    ).orderBy("url", "pos")


@q(
    "sitemap_coverage",
    rf"""
    WITH l AS (SELECT DISTINCT loc FROM read_parquet('{staged_glob("smcov_locs")}')),
    u AS (SELECT url FROM read_parquet('{staged_glob("smcov_urls")}')),
    h AS (
      SELECT loc,
             regexp_extract(loc, '^[a-z]+://([^/?#]+)', 1) AS host,
             loc IN (SELECT url FROM u) AS crawled
      FROM l
    )
    SELECT host,
           COUNT(*) AS n_declared,
           CAST(SUM(CASE WHEN crawled THEN 1 ELSE 0 END) AS BIGINT) AS n_crawled,
           CAST((SUM(CASE WHEN crawled THEN 1 ELSE 0 END) * 1000) // COUNT(*)
                AS BIGINT) AS coverage_pm
    FROM h GROUP BY host ORDER BY host
    """,
)
def sitemap_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-COVERAGE audit — the crawl-ops report joining what a host
    DECLARES (sitemap <loc> entries, via the sitemap kernel branch)
    against what the crawl actually HOLDS (the corpus url set): per
    declared host, declared count, crawled count, and an integer
    per-mille coverage — the gap report that drives frontier seeding
    (undeclared-but-crawled is `hreflang_frontier_seeds`' mirror image;
    declared-but-uncrawled is THIS one). Both engines read the same
    staged loc and url tables; membership is one distinct + one semi
    join keyed by url, then a host rollup — nothing corpus-wide beyond
    the url set itself at any scale."""
    from ocr_platform_spark.operators.extract import extract_documents

    docs = _synth_docs(spark)
    ext = extract_documents(docs).where(F.col("payload_kind") == "sitemap")
    locs = (
        ext.select(F.explode("spans").alias("s"))
        .where(F.col("s.field") == "loc")
        .select(F.col("s.value").alias("loc"))
    )
    # the kernel's sitemap locs are synthetic targets outside the corpus
    # (coverage 0 across the board); declare a deterministic slice of REAL
    # corpus urls too so the audit exercises both hit and miss
    declared_real = docs.orderBy("url").limit(12).select(F.col("url").alias("loc"))
    staged_locs = stage(locs.unionByName(declared_real), "smcov_locs")
    staged_urls = stage(docs.select("url"), "smcov_urls", partitions=2)
    crawled = staged_urls.select(F.col("url").alias("loc")).withColumn(
        "_hit", F.lit(1)
    )
    h = (
        staged_locs.distinct()
        .join(F.broadcast(crawled), "loc", "left")
        .select(
            F.regexp_extract("loc", r"^[a-z]+://([^/?#]+)", 1).alias("host"),
            F.col("_hit").isNotNull().alias("crawled"),
        )
    )
    n_crawled = F.sum(F.when(F.col("crawled"), 1).otherwise(0)).cast("long")
    return (
        h.groupBy("host")
        .agg(
            F.count("*").alias("n_declared"),
            n_crawled.alias("n_crawled"),
        )
        .withColumn("coverage_pm", F.expr("(n_crawled * 1000) div n_declared"))
        .orderBy("host")
    )


#: clickbait fixtures: titles sharing no tokens with the body — the case
#: the synth corpus never produces (its <h1> repeats the <title> words).
_TBC_FIXTURES: list[tuple[str, str, str]] = [
    (
        "fixture://clickbait-1",
        "you will never believe this one trick",
        "entirely unrelated body prose about gardening and soil quality",
    ),
    (
        "fixture://clickbait-2",
        "shocking secret doctors hide",
        "quarterly revenue grew moderately across all business segments",
    ),
]


@q(
    "doc_title_body_consistency",
    rf"""
    WITH d AS (SELECT url, title, text FROM read_parquet('{staged_glob("tbc_docs")}')),
    t AS (
      SELECT url,
        list_distinct(list_filter(string_split_regex(lower(title), '\s+'), x -> x <> '')) AS tt,
        list_distinct(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS bt
      FROM d
    )
    SELECT url,
           CAST(len(tt) AS INT) AS n_title_tokens,
           CAST(len(list_intersect(tt, bt)) AS INT) AS n_overlap,
           CAST((len(list_intersect(tt, bt)) * 1000) // greatest(len(tt), 1)
                AS BIGINT) AS overlap_pm,
           (len(list_intersect(tt, bt)) * 2) < len(tt) AS title_disjoint
    FROM t ORDER BY url
    """,
)
def doc_title_body_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title/body CONSISTENCY — the clickbait/SEO-bait signal (a title
    whose tokens barely occur in the body is optimized for the click, not
    the content; search-quality stacks gate on exactly this): per page,
    distinct title tokens, how many recur in the extracted main text, an
    integer per-mille overlap, and a ``title_disjoint`` flag at <50%
    (exact integer comparison). Titles come from the page_meta kernel and
    bodies from the main-content kernel — the two extraction faces joined
    on url, staged once; BOTH engines tokenize and intersect the same
    bytes. Map-side set ops per row, no shuffle beyond the url join."""
    from ocr_platform_spark.operators.extract import (
        extract_documents,
        page_metadata_df,
    )

    docs = _synth_docs(spark)
    titles = page_metadata_df(docs).select("url", "title")
    bodies = extract_documents(docs).where(
        (F.col("payload_kind") == "html") & F.col("error").isNull()
    ).select("url", "text")
    joined = titles.where(F.col("title").isNotNull()).join(bodies, "url")
    fx = spark.createDataFrame(_TBC_FIXTURES, "url string, title string, text string")
    staged = stage(joined.unionByName(fx), "tbc_docs", partitions=2)

    def toks(col: str):
        return F.array_distinct(
            F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda x: x != "")
        )

    t = staged.select("url", toks("title").alias("tt"), toks("text").alias("bt"))
    n_overlap = F.size(F.array_intersect("tt", "bt"))
    return t.select(
        "url",
        F.size("tt").cast("int").alias("n_title_tokens"),
        n_overlap.cast("int").alias("n_overlap"),
        F.expr(
            "cast((size(array_intersect(tt, bt)) * 1000) div greatest(size(tt), 1) as bigint)"
        ).alias("overlap_pm"),
        ((n_overlap * 2) < F.size("tt")).alias("title_disjoint"),
    ).orderBy("url")


@q(
    "extract_section_chunks",
    rf"""
    WITH r AS (SELECT url, raw FROM read_parquet('{staged_glob("sections_raw")}')),
    sp AS (
      SELECT url, regexp_split_to_array(raw, '(?is)<h[1-3][^>]*>') AS ss FROM r
    ),
    sec AS (
      SELECT url, CAST(i - 1 AS INT) AS sec_idx, ss[i] AS body
      FROM (SELECT url, ss, unnest(generate_series(2, len(ss))) AS i FROM sp)
    )
    SELECT url, sec_idx,
           regexp_extract(body, '^([^<]*)', 1) AS heading,
           CAST((length(body) - length(replace(body, '<p>', ''))) // 3 AS INT)
             AS n_paras,
           CAST(length(body) AS INT) AS n_chars_section
    FROM sec ORDER BY url, sec_idx
    """,
)
def extract_section_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section-aware SEGMENTATION — the structure `extract_headings`
    surfaces, applied as chunk boundaries (the canonical upgrade over
    fixed token windows for retrieval: a chunk should not straddle a
    heading): each page splits at its h1-h3 tags; per section the
    heading text, paragraph count (exact integer occurrence count of
    ``<p>``), and character size. BOTH engines split the same staged
    decoded payloads with the same regex and count occurrences by the
    same length-difference arithmetic — the segmentation itself is
    cross-engine verified, fixture pages supplying multi-section
    outlines. Map-side split + posexplode; no shuffle before the final
    sort."""
    from ocr_platform_spark.operators.extract import page_metadata_df

    meta = page_metadata_df(_synth_docs(spark)).select("url", "raw")
    fx = spark.createDataFrame(_HEADING_FIXTURES, "url string, raw string")
    staged = stage(meta.unionByName(fx), "sections_raw", partitions=2)
    sp = staged.select(
        "url", F.split("raw", r"(?is)<h[1-3][^>]*>").alias("ss")
    )
    sec = sp.select("url", F.posexplode("ss").alias("p", "body")).where(
        F.col("p") >= 1
    )
    return sec.select(
        "url",
        F.col("p").cast("int").alias("sec_idx"),
        F.regexp_extract("body", r"^([^<]*)", 1).alias("heading"),
        F.expr(
            "cast((length(body) - length(replace(body, '<p>', ''))) div 3 as int)"
        ).alias("n_paras"),
        F.length("body").cast("int").alias("n_chars_section"),
    ).orderBy("url", "sec_idx")


@q(
    "robots_sitemap_directives",
    rf"""
    WITH r AS (SELECT host, raw FROM read_parquet('{staged_glob("robots_sm_raw")}')),
    l AS (
      SELECT host, CAST(i AS INT) AS line_no,
             trim(regexp_replace(replace(ls[i], chr(13), ''), '#.*', '')) AS line
      FROM (SELECT host, str_split(raw, chr(10)) AS ls,
                   unnest(generate_series(1, len(str_split(raw, chr(10))))) AS i
            FROM r)
    ),
    sm AS (
      SELECT host, line_no,
             regexp_replace(regexp_extract(line, '^[^:]*:(.*)$', 1),
                            '^[ \t]+|[ \t]+$', '', 'g') AS sitemap_url
      FROM l
      WHERE regexp_matches(lower(line), '^[ \t]*sitemap[ \t]*:')
    )
    SELECT host,
           CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY line_no) AS INT)
             AS sm_idx,
           sitemap_url
    FROM sm ORDER BY host, sm_idx
    """,
)
def robots_sitemap_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Sitemap:`` directive mining from robots.txt — the missing link
    between the host-politeness face (operators/robots_txt.py parses
    allow/disallow groups) and the sitemap kernel (`extract_sitemap_entries`
    parses the files those directives POINT AT): per RFC 9309 the field is
    group-independent and case-insensitive, so every matching line yields a
    (host, order, sitemap url) row — the seed list `sitemap_coverage`
    audits. Robots files are synthesized deterministically per host
    (declaring hosts carry 1-2 directives, mixed field case, comment and
    rule noise lines), staged once, and BOTH engines replay the same
    line-split → comment-strip → field-match → value-trim chain. Rules-
    table-sized end to end: one row per host file, no corpus-scale data."""
    d = _t(spark, sf_dir, "documents")
    hosts = d.select(F.pmod("doc_id", F.lit(40)).alias("h")).distinct()
    hs = F.col("h").cast("string")
    site = F.concat(F.lit("https://site-"), hs, F.lit(".example.org"))
    raw = F.concat(
        F.lit("User-agent: *\nDisallow: /private\n# generated robots file\n"),
        F.when(
            F.pmod("h", F.lit(3)) != 0,
            F.when(
                F.pmod("h", F.lit(4)) == 0,
                F.concat(F.lit("sitemap: "), site, F.lit("/sitemap-0.xml\n")),
            ).otherwise(
                F.concat(F.lit("Sitemap: "), site, F.lit("/sitemap-0.xml\n"))
            ),
        ).otherwise(F.lit("")),
        F.when(
            (F.pmod("h", F.lit(3)) != 0) & (F.pmod("h", F.lit(2)) == 1),
            F.concat(F.lit("Sitemap:\t"), site, F.lit("/sitemap-1.xml  # extra\n")),
        ).otherwise(F.lit("")),
        F.lit("Crawl-delay: 2\n"),
    )
    staged = stage(
        hosts.select(
            F.concat(F.lit("site-"), hs, F.lit(".example.org")).alias("host"),
            raw.alias("raw"),
        ),
        "robots_sm_raw",
    )
    lines = staged.select(
        "host",
        F.posexplode(F.split("raw", "\n")).alias("p", "l0"),
    ).select(
        "host",
        (F.col("p") + 1).cast("int").alias("line_no"),
        F.trim(
            F.regexp_replace(F.replace(F.col("l0"), F.lit("\r"), F.lit("")), "#.*", "")
        ).alias("line"),
    )
    sm = lines.where(
        F.lower("line").rlike(r"^[ \t]*sitemap[ \t]*:")
    ).select(
        "host",
        "line_no",
        F.regexp_replace(
            F.regexp_extract("line", r"^[^:]*:(.*)$", 1), r"^[ \t]+|[ \t]+$", ""
        ).alias("sitemap_url"),
    )
    w = Window.partitionBy("host").orderBy("line_no")
    return (
        sm.withColumn("sm_idx", F.row_number().over(w).cast("int"))
        .select("host", "sm_idx", "sitemap_url")
        .orderBy("host", "sm_idx")
    )


@q(
    "ann_lsh_multiprobe_sweep",
    f"""
    WITH exact AS (SELECT query_id, item_id FROM read_parquet('{staged_glob("mp_exact")}')),
    t0 AS ({_ann_tail_sql("mp_cands_0")}),
    t1 AS ({_ann_tail_sql("mp_cands_1")}),
    t2 AS ({_ann_tail_sql("mp_cands_2")}),
    arms AS (
      SELECT 0 AS multiprobe, query_id, item_id FROM t0
      UNION ALL SELECT 1, query_id, item_id FROM t1
      UNION ALL SELECT 2, query_id, item_id FROM t2
    ),
    cand_counts AS (
      SELECT 0 AS multiprobe,
             (SELECT COUNT(*) FROM read_parquet('{staged_glob("mp_cands_0")}')) AS n_cands
      UNION ALL SELECT 1,
             (SELECT COUNT(*) FROM read_parquet('{staged_glob("mp_cands_1")}'))
      UNION ALL SELECT 2,
             (SELECT COUNT(*) FROM read_parquet('{staged_glob("mp_cands_2")}'))
    ),
    hits AS (
      SELECT c.multiprobe,
             CAST(SUM(CASE WHEN a.item_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit,
             CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM cand_counts c
      CROSS JOIN exact e
      LEFT JOIN arms a ON a.multiprobe = c.multiprobe
                      AND a.query_id = e.query_id AND a.item_id = e.item_id
      GROUP BY c.multiprobe
    )
    SELECT CAST(h.multiprobe AS INT) AS multiprobe,
           CAST(c.n_cands AS BIGINT) AS n_cands,
           h.n_hit, h.n_exact,
           CAST((h.n_hit * 1000) // h.n_exact AS BIGINT) AS recall_pm
    FROM hits h JOIN cand_counts c ON c.multiprobe = h.multiprobe
    ORDER BY multiprobe
    """,
)
def ann_lsh_multiprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe CALIBRATION sweep — the recall-vs-cost curve that picks
    the LSH knob at scale (`ann_lsh_recall` reports ONE operating point;
    production tuning needs the curve): for multiprobe ∈ {0, 1, 2} the
    query side probes that many extra near-boundary buckets per table,
    and the report shows candidate-pair cost next to recall@10 against
    the staged brute-force ground truth. The oracle RERANKS each arm's
    staged candidates with the shared quantized-cosine tail and recomputes
    every hit count — the approximation's only unverifiable part stays the
    numpy bucketing itself, same boundary as the other ANN entries.
    Candidate tables are query-side-sized; nothing corpus-wide."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8)
    exact = stage(
        ann.quantized_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=10)
        .select("query_id", "item_id"),
        "mp_exact",
    )
    rows = None
    counts = None
    for m in (0, 1, 2):
        cands = stage(
            ann.lsh_candidates(emb, qs, dim=64, multiprobe=m), f"mp_cands_{m}"
        )
        cnt = cands.agg(F.count("*").cast("long").alias("n_cands")).select(
            F.lit(m).alias("multiprobe"), "n_cands"
        )
        counts = cnt if counts is None else counts.unionByName(cnt)
        topk = ann.quantized_rank_candidates(cands, emb, k=10).select(
            "query_id", "item_id"
        )
        j = exact.join(topk.withColumn("_h", F.lit(1)), ["query_id", "item_id"], "left")
        row = j.agg(
            F.sum(F.when(F.col("_h").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hit"),
            F.count(F.lit(1)).cast("long").alias("n_exact"),
        ).select(F.lit(m).alias("multiprobe"), "n_hit", "n_exact")
        rows = row if rows is None else rows.unionByName(row)
    return (
        rows.join(counts, "multiprobe")
        .select(
            F.col("multiprobe").cast("int").alias("multiprobe"),
            "n_cands",
            "n_hit",
            "n_exact",
            F.expr("cast((n_hit * 1000) div n_exact as bigint)").alias("recall_pm"),
        )
        .orderBy("multiprobe")
    )


@q(
    "storage_compaction_plan",
    r"""
    WITH files AS (
      SELECT CAST(doc_id % 64 AS BIGINT) AS file_id,
             CAST(doc_id % 8 AS BIGINT) AS bucket,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY doc_id % 64, doc_id % 8
    ),
    w AS (
      SELECT file_id, bucket, bytes,
             COALESCE(SUM(bytes) OVER (PARTITION BY bucket ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM files
    ),
    plan AS (
      SELECT bucket, file_id, bytes, cum_before // 6000 AS task_id FROM w
    )
    SELECT bucket, CAST(task_id AS BIGINT) AS task_id,
           COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(bytes) AS BIGINT) > 6000 AS overshoot
    FROM plan GROUP BY bucket, task_id ORDER BY bucket, task_id
    """,
)
def storage_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION planning — the table-maintenance job any
    Iceberg/parquet lake needs at 100 TB (thousands of tiny files per
    partition kill scan throughput; compaction rewrites them into
    target-size groups, cf. Spark's own maxPartitionBytes coalescing):
    per partition bucket, files in id order are assigned to rewrite
    tasks by the SAME keep-iff-cum-before-under-budget rule as the
    token-budget cut (integer ``cum_before div target``) — a task may
    overshoot only by its last file's tail, flagged exactly. The file
    inventory is derived deterministically from the documents table
    (doc_id%64 files, doc_id%8 partition buckets, decimal-exact byte
    sums); BOTH engines replay the identical window arithmetic. The
    window and the rollup are bucket-partitioned — inventory tables are
    file-count-sized and per-partition, never a global sort."""
    d = _t(spark, sf_dir, "documents")
    files = (
        d.groupBy(
            (F.col("doc_id") % 64).cast("long").alias("file_id"),
            (F.col("doc_id") % 8).cast("long").alias("bucket"),
        )
        .agg(F.sum("n_chars").cast("long").alias("bytes"))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    plan = files.withColumn(
        "cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0).cast("long"))
    ).withColumn("task_id", F.expr("cum_before div 6000"))
    return (
        plan.groupBy("bucket", "task_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
        )
        .withColumn("overshoot", F.col("total_bytes") > 6000)
        .orderBy("bucket", "task_id")
    )


@q(
    "host_mirror_near_dups",
    f"""
    WITH sigs AS (SELECT * FROM read_parquet('{staged_glob("hostmirror_sigs")}')),
    cands AS (SELECT * FROM read_parquet('{staged_glob("hostmirror_cands")}')),
    hm AS (
      SELECT host, i, MIN(sig[i]) AS mv
      FROM (SELECT host, sig, unnest(generate_series(1, len(sig))) AS i FROM sigs)
      GROUP BY host, i
    ),
    nd AS (SELECT host, COUNT(*) AS n_docs FROM sigs GROUP BY host),
    mt AS (
      SELECT c.host_a, c.host_b,
             COUNT(CASE WHEN a.mv = b.mv THEN 1 END) AS n_match
      FROM cands c
      JOIN hm a ON a.host = c.host_a
      JOIN hm b ON b.host = c.host_b AND b.i = a.i
      GROUP BY c.host_a, c.host_b
    )
    SELECT mt.host_a, mt.host_b,
           CAST(na.n_docs AS BIGINT) AS n_a, CAST(nb.n_docs AS BIGINT) AS n_b,
           CAST(mt.n_match AS INT) AS n_match,
           CAST((1000 * mt.n_match) // 16 AS BIGINT) AS jaccard_est_x1000,
           (1000 * mt.n_match) // 16 >= 500 AS is_mirror
    FROM mt
    JOIN nd na ON na.host = mt.host_a
    JOIN nd nb ON nb.host = mt.host_b
    ORDER BY host_a, host_b
    """,
)
def host_mirror_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror detection at NEAR-dup grain (operators/dedup.py
    host_union_signatures + host_mirror_near_pairs): exact content-hash
    overlap (``host_mirror_detection``) goes blind the moment a mirror
    injects per-page banners — every page hash drifts. Here each host gets
    a MinHash signature of its shingle-set UNION, composed as the
    elementwise MIN of per-document signatures (min over A∪B = min of
    mins — a map-combinable k-column aggregate, so no per-host shingle set
    ever materializes), hosts band into LSH buckets like documents, and
    candidate pairs score by the MinHash estimate in integer per-mille.
    The synthetic corpus plants one full mirror and one partial mirror
    whose copied pages all carry page-unique banners: page-hash Jaccard is
    ZERO for those pairs, union-MinHash still flags them. Per-doc
    signatures and candidate host pairs are staged (xxhash64 boundary);
    the oracle replays the union-min composition, the component-match
    count, and the gate from the same bytes."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    src = d.select(
        "doc_id",
        F.concat(F.lit("site-"), (F.col("doc_id") % 12).cast("string")).alias("host"),
        "text",
    )
    prev = src.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("ptext")
    )
    banner = F.concat(
        F.lit(" mirrored by site eleven banner "), F.col("doc_id").cast("string")
    )
    pages = src.join(prev, "doc_id", "left").select(
        "doc_id",
        "host",
        F.when(F.col("doc_id") % 12 == 11, F.concat(F.col("ptext"), banner))
        .when(
            (F.col("doc_id") % 12 == 5) & (F.col("doc_id") % 24 == 5),
            F.concat(F.col("ptext"), banner),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    hs = dedup.hashed_shingle_sets(pages, "doc_id", "text")
    doc_sigs = stage(
        hs.select("id", dedup.minhash_signature_from_hashes("hs", 16).alias("sig"))
        .join(src.select(F.col("doc_id").alias("id"), "host"), "id")
        .select("id", "host", "sig"),
        "hostmirror_sigs",
    )
    hosts = dedup.host_union_signatures(doc_sigs, "host", "sig", 16)
    banded = hosts.select(
        "host",
        F.posexplode(dedup.minhash_bands("sig", 16, 2)).alias("band_id", "band_hash"),
    )
    cands = stage(
        dedup._bucket_pairs(banded, "host", 64).select(
            F.col("id_a").alias("host_a"), F.col("id_b").alias("host_b")
        ),
        "hostmirror_cands",
    )
    a = hosts.select(
        F.col("host").alias("host_a"), F.col("sig").alias("sig_a"), F.col("n_docs").alias("n_a")
    )
    b = hosts.select(
        F.col("host").alias("host_b"), F.col("sig").alias("sig_b"), F.col("n_docs").alias("n_b")
    )
    n_match = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return (
        cands.join(F.broadcast(a), "host_a")
        .join(F.broadcast(b), "host_b")
        .select(
            "host_a",
            "host_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            n_match.cast("int").alias("n_match"),
        )
        .withColumn("jaccard_est_x1000", F.expr("cast((1000 * n_match) div 16 as bigint)"))
        .withColumn("is_mirror", F.col("jaccard_est_x1000") >= 500)
        .orderBy("host_a", "host_b")
    )


@q(
    "retrieval_index_report",
    f"""
    WITH c AS (SELECT * FROM read_parquet('{staged_glob("rir_cands")}')),
    qz AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pairs AS (
      SELECT c.arm, c.query_id, c.item_id,
             list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
             list_sum(list_transform(q.v, x -> x * x)) AS nq,
             list_sum(list_transform(i.v, x -> x * x)) AS ni
      FROM c JOIN qz q ON c.query_id = q.vec_id JOIN qz i ON c.item_id = i.vec_id
    ),
    scored AS (
      SELECT arm, query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE)
                             / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM pairs
    ),
    top AS (
      SELECT arm, query_id, item_id,
             row_number() OVER (PARTITION BY arm, query_id
                                ORDER BY cosine DESC, item_id) AS rk
      FROM scored
    ),
    pos AS (SELECT query_id, item_id AS pos_id FROM top WHERE arm = 'exact' AND rk = 1),
    ex10 AS (SELECT query_id, item_id FROM top WHERE arm = 'exact' AND rk <= 10),
    hits AS (
      SELECT t.arm, COUNT(*) AS n_hit, SUM(1000000 // t.rk) AS sum_rr
      FROM top t JOIN pos p ON p.query_id = t.query_id AND p.pos_id = t.item_id
      WHERE t.rk <= 10 GROUP BY t.arm
    ),
    rec AS (
      SELECT t.arm, COUNT(*) AS n_rec
      FROM top t JOIN ex10 e ON e.query_id = t.query_id AND e.item_id = t.item_id
      WHERE t.rk <= 10 GROUP BY t.arm
    ),
    ac AS (SELECT arm, COUNT(*) AS n_scored FROM c GROUP BY arm),
    np AS (SELECT COUNT(*) AS n_queries FROM pos),
    ne AS (SELECT COUNT(*) AS n_exact FROM ex10)
    SELECT ac.arm, CAST(ac.n_scored AS BIGINT) AS n_scored,
           CAST(np.n_queries AS BIGINT) AS n_queries,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS nn_hit_at_10,
           CAST(COALESCE(h.sum_rr, 0) // np.n_queries AS BIGINT) AS mrr_nn_x1e6,
           CAST((COALESCE(r.n_rec, 0) * 1000) // ne.n_exact AS BIGINT) AS recall_at_10_pm
    FROM ac CROSS JOIN np CROSS JOIN ne
    LEFT JOIN hits h ON h.arm = ac.arm
    LEFT JOIN rec r ON r.arm = ac.arm
    ORDER BY ac.arm
    """,
)
def retrieval_index_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-selection report (ROADMAP 5b): every ANN index variant
    judged on ONE yardstick — how well it finds the brute-force nearest
    neighbor (nn hits@10 + MRR of the true NN in the arm's ranking) and
    how much of the exact top-10 it recovers (recall@10, per-mille) —
    next to its scan cost (candidate pairs scored), in a single table:
    ``exact`` full scan (the anchor: MRR 1.0, recall 1000 by
    construction), ``lsh`` and ``lsh_mp2`` (multiprobe-2) hyperplane
    buckets, ``ivf`` (probe-2 inverted lists), and the byte-budget arms
    ``pq`` / ``ivfpq`` whose candidates are their integer-ADC shortlists
    (the refine pattern of ann_ivfpq_refine_topk). Every arm feeds the
    SAME exact quantized-cosine rerank, so quality differences are purely
    recall of candidate generation — the number that picks the index at
    10^9 vectors. The union candidate table is staged (numpy bucketing /
    ADC boundary, each generator oracle-verified by its own catalog
    entry); ground truth, rerank, ranks and all metrics replay in the
    oracle from the same bytes. Costs stay sublinear for every arm but
    ``exact`` — nothing here is corpus-quadratic."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8)

    def _arm(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("arm"), "query_id", "item_id")

    exact = (
        qs.select(F.col("vec_id").alias("query_id"))
        .crossJoin(emb.select(F.col("vec_id").alias("item_id")))
        .where(F.col("item_id") != F.col("query_id"))
    )
    lsh0 = ann.lsh_candidates(emb, qs, dim=64)
    lsh2 = ann.lsh_candidates(emb, qs, dim=64, multiprobe=2)
    cents = ann.train_ivf(emb, n_lists=8)
    ivf = ann.ivf_candidates(emb, qs, cents, n_probe=2)
    cb = ann.train_pq(emb, m=8, k_codes=16)
    pq_short = ann.pq_adc_topk(ann.pq_encode(emb, cb), ann.pq_query_luts(qs, cb), k=20)
    cents2, cb2 = ann.train_ivfpq(emb, n_lists=8, m=8, k_codes=16)
    luts2, biases2 = ann.ivfpq_query_tables(qs, cents2, cb2, n_probe=4)
    ivfpq_short = ann.ivfpq_adc_topk(ann.ivfpq_encode(emb, cents2, cb2), luts2, biases2, k=20)
    cands = stage(
        _arm("exact", exact)
        .unionByName(_arm("lsh", lsh0))
        .unionByName(_arm("lsh_mp2", lsh2))
        .unionByName(_arm("ivf", ivf))
        .unionByName(_arm("pq", pq_short.select("query_id", "item_id")))
        .unionByName(_arm("ivfpq", ivfpq_short.select("query_id", "item_id"))),
        "rir_cands",
    )
    qz = emb.select(
        F.col("vec_id").alias("_vid"), ann._quantize(F.col("embedding"), 1000).alias("_v")
    )
    scored = (
        cands.join(qz.withColumnRenamed("_vid", "query_id").withColumnRenamed("_v", "q_v"), "query_id")
        .join(qz.withColumnRenamed("_vid", "item_id").withColumnRenamed("_v", "i_v"), "item_id")
        .select("arm", "query_id", "item_id", ann._quantized_cosine("q_v", "i_v").alias("cosine"))
    )
    w = Window.partitionBy("arm", "query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    top = (
        scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 10).persist()
    )
    pos = top.where((F.col("arm") == "exact") & (F.col("rk") == 1)).select(
        F.col("query_id").alias("p_qid"), F.col("item_id").alias("pos_id")
    )
    ex10 = top.where(F.col("arm") == "exact").select(
        F.col("query_id").alias("e_qid"), F.col("item_id").alias("e_iid")
    )
    hits = (
        top.join(
            F.broadcast(pos),
            (top.query_id == F.col("p_qid")) & (top.item_id == F.col("pos_id")),
        )
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_hit"),
            F.sum(F.expr("1000000 div rk")).alias("sum_rr"),
        )
    )
    rec = (
        top.join(
            F.broadcast(ex10),
            (top.query_id == F.col("e_qid")) & (top.item_id == F.col("e_iid")),
        )
        .groupBy("arm")
        .agg(F.count("*").alias("n_rec"))
    )
    ac = cands.groupBy("arm").agg(F.count("*").cast("long").alias("n_scored"))
    np_ = pos.agg(F.count("*").alias("n_queries"))
    ne = ex10.agg(F.count("*").alias("n_exact"))
    return (
        ac.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(ne))
        .join(F.broadcast(hits), "arm", "left")
        .join(F.broadcast(rec), "arm", "left")
        .select(
            "arm",
            "n_scored",
            F.col("n_queries").cast("long").alias("n_queries"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("nn_hit_at_10"),
            F.expr("cast(coalesce(sum_rr, 0) div n_queries as bigint)").alias("mrr_nn_x1e6"),
            F.expr("cast((coalesce(n_rec, 0) * 1000) div n_exact as bigint)").alias(
                "recall_at_10_pm"
            ),
        )
        .orderBy("arm")
    )


@q(
    "retrieval_rrf_sweep",
    f"""
    WITH hsrc AS (
      SELECT id, unnest(hs) AS h FROM read_parquet('{staged_glob("rrfs_shingles")}')
    ),
    lexovl AS (
      SELECT q.id AS query_id, i.id AS item_id, COUNT(*) AS n_common
      FROM hsrc q JOIN hsrc i ON q.h = i.h AND i.id <> q.id
      WHERE q.id < 8 GROUP BY q.id, i.id
    ),
    lex AS (
      SELECT query_id, item_id,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY n_common DESC, item_id) AS INT)
               AS rank_lex
      FROM lexovl
    ),
    lex20 AS (SELECT * FROM lex WHERE rank_lex <= 20),
    qz AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    scored AS (
      SELECT query_id, item_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE)
                             / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM (
        SELECT q.vec_id AS query_id, i.vec_id AS item_id,
               list_sum(list_transform(list_zip(q.v, i.v), p -> p[1] * p[2])) AS dot,
               list_sum(list_transform(q.v, x -> x * x)) AS nq,
               list_sum(list_transform(i.v, x -> x * x)) AS ni
        FROM qz q, qz i WHERE q.vec_id < 8 AND i.vec_id <> q.vec_id
      )
    ),
    cos20 AS (
      SELECT query_id, item_id, CAST(rk AS INT) AS rank_cos FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rk
        FROM scored
      ) WHERE rk <= 20
    ),
    cfg(rrf_k, w_dense, w_lex) AS (VALUES
      (10, 1, 1), (10, 2, 1), (10, 1, 2),
      (60, 1, 1), (60, 2, 1), (60, 1, 2),
      (240, 1, 1), (240, 2, 1), (240, 1, 2)),
    f AS (
      SELECT cfg.rrf_k, cfg.w_dense, cfg.w_lex,
             COALESCE(c.query_id, l.query_id) AS query_id,
             COALESCE(c.item_id, l.item_id) AS item_id,
             c.rank_cos, l.rank_lex,
             CAST(COALESCE(cfg.w_dense * (1000000 // (cfg.rrf_k + c.rank_cos)), 0)
                  + COALESCE(cfg.w_lex * (1000000 // (cfg.rrf_k + l.rank_lex)), 0)
                  AS BIGINT) AS rrf_x1e6
      FROM cfg CROSS JOIN (SELECT * FROM cos20 FULL OUTER JOIN lex20 USING (query_id, item_id)) u
      LEFT JOIN cos20 c ON c.query_id = u.query_id AND c.item_id = u.item_id
      LEFT JOIN lex20 l ON l.query_id = u.query_id AND l.item_id = u.item_id
    ),
    fused5 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY rrf_k, w_dense, w_lex, query_id
          ORDER BY rrf_x1e6 DESC, item_id) AS fr
        FROM f
      ) WHERE fr <= 5
    )
    SELECT CAST(rrf_k AS INT) AS rrf_k, CAST(w_dense AS INT) AS w_dense,
           CAST(w_lex AS INT) AS w_lex,
           CAST(COUNT(CASE WHEN rank_cos <= 5 THEN 1 END) AS BIGINT) AS n_dense5,
           CAST(COUNT(CASE WHEN rank_lex <= 5 THEN 1 END) AS BIGINT) AS n_lex5,
           CAST(COUNT(CASE WHEN rank_cos IS NOT NULL AND rank_lex IS NOT NULL
                      THEN 1 END) AS BIGINT) AS n_both
    FROM fused5 GROUP BY rrf_k, w_dense, w_lex
    ORDER BY rrf_k, w_dense, w_lex
    """,
)
def retrieval_rrf_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF weight/K calibration sweep (ROADMAP 5b, mirroring the LSH
    multiprobe sweep): reciprocal-rank fusion's two knobs — the damping
    constant K (small → rank-1 dominance, large → smooth blending) and
    the per-system weights — swept over 9 configs, each judged by HOW
    the fused top-5 tilts: items drawn from the dense top-5, from the
    lexical top-5, and items ranked by BOTH systems (the consensus set
    RRF is meant to surface). Source rankings are computed once (exact
    quantized-cosine dense top-20; staged-shingle lexical top-20 — the
    retrieval_rrf_fusion machinery) and every config reuses them, so the
    sweep costs 9 window passes over candidate-bounded lists, never a
    corpus rescan. All contributions are integers
    (``w * (1e6 div (K + rank))``); the oracle replays both rankings,
    all 9 fusions, and the tilt counts from the same bytes."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    cos20 = ann.quantized_topk(
        emb, emb.where(F.col("vec_id") < 8), id_col="vec_id", vec_col="embedding", k=20
    ).select("query_id", "item_id", F.col("rank").cast("int").alias("rank_cos"))
    hs = stage(
        dedup.hashed_shingle_sets(docs, "doc_id", "text"), "rrfs_shingles", partitions=2
    )
    posts = hs.select("id", F.explode("hs").alias("h"))
    qp = posts.where(F.col("id") < 8).select(F.col("id").alias("query_id"), "h")
    ip = posts.select(F.col("id").alias("item_id"), "h")
    lex20 = (
        qp.join(ip, "h")
        .where(F.col("item_id") != F.col("query_id"))
        .groupBy("query_id", "item_id")
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "rank_lex",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy(F.desc("n_common"), "item_id"))
            .cast("int"),
        )
        .where(F.col("rank_lex") <= 20)
        .select("query_id", "item_id", "rank_lex")
    )
    cfg = spark.createDataFrame(
        [(k, wd, wl) for k in (10, 60, 240) for (wd, wl) in ((1, 1), (2, 1), (1, 2))],
        "rrf_k int, w_dense int, w_lex int",
    )
    merged = cos20.join(lex20, ["query_id", "item_id"], "full_outer")
    f = merged.crossJoin(F.broadcast(cfg)).select(
        "rrf_k",
        "w_dense",
        "w_lex",
        "query_id",
        "item_id",
        "rank_cos",
        "rank_lex",
        (
            F.coalesce(F.expr("w_dense * (1000000 div (rrf_k + rank_cos))"), F.lit(0))
            + F.coalesce(F.expr("w_lex * (1000000 div (rrf_k + rank_lex))"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_x1e6"),
    )
    w = Window.partitionBy("rrf_k", "w_dense", "w_lex", "query_id").orderBy(
        F.desc("rrf_x1e6"), "item_id"
    )
    fused5 = f.withColumn("fr", F.row_number().over(w)).where(F.col("fr") <= 5)
    return (
        fused5.groupBy("rrf_k", "w_dense", "w_lex")
        .agg(
            F.count(F.when(F.col("rank_cos") <= 5, 1)).cast("long").alias("n_dense5"),
            F.count(F.when(F.col("rank_lex") <= 5, 1)).cast("long").alias("n_lex5"),
            F.count(F.when(F.col("rank_cos").isNotNull() & F.col("rank_lex").isNotNull(), 1))
            .cast("long")
            .alias("n_both"),
        )
        .orderBy("rrf_k", "w_dense", "w_lex")
    )


@q(
    "payload_cdc_storage",
    f"""
    WITH c AS (SELECT * FROM read_parquet('{staged_glob("cdcs_chunks")}')),
    per_hash AS (
      SELECT host, chunk_hash, COUNT(*) AS n_occ,
             COUNT(DISTINCT id) AS n_ids, MAX(length) AS length
      FROM c GROUP BY host, chunk_hash
    ),
    shared AS (SELECT * FROM per_hash WHERE n_ids >= 2),
    tot AS (
      SELECT host, COUNT(DISTINCT id) AS n_docs, COUNT(*) AS n_chunks,
             SUM(length) AS total_bytes
      FROM c GROUP BY host
    ),
    sav AS (
      SELECT host, SUM(length) AS dict_bytes,
             SUM((n_occ - 1) * length) AS saved_bytes
      FROM shared GROUP BY host
    )
    SELECT t.host, CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(t.n_chunks AS BIGINT) AS n_chunks,
           CAST(t.total_bytes AS BIGINT) AS total_bytes,
           CAST(COALESCE(s.dict_bytes, 0) AS BIGINT) AS dict_bytes,
           CAST(COALESCE(s.saved_bytes, 0) AS BIGINT) AS saved_bytes,
           CAST((1000 * COALESCE(s.saved_bytes, 0)) // t.total_bytes AS BIGINT)
             AS saved_pm
    FROM tot t LEFT JOIN sav s ON s.host = t.host
    ORDER BY t.host
    """,
)
def payload_cdc_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC at STORAGE-REALISTIC parameters (ROADMAP 5a): avg_bits=12
    (~4 KB expected chunks, uint16 convolution mask), min 1 KB / max
    16 KB — the FastCDC/casync operating point — over ~35 KB payloads
    built so each host's documents embed a shared 24 KB host blob at a
    DIFFERENT byte offset per document (doc-unique head of varying
    length, then the blob, then a unique tail). Fixed-offset chunking
    can never dedup content that moves; Gear boundaries re-synchronize
    inside the shared region, so the host's interior blob chunks hash
    identically across its documents, and the per-host
    shared-dictionary savings estimate (operators/cdc.
    cdc_host_dictionary_stats) prices exactly that: dictionary size
    (one copy of every chunk shared by ≥ 2 docs of the host),
    saved bytes, and the per-mille of payload the dictionary removes.
    The boundary scan is the pinned Arrow kernel; the staged chunk
    table is the oracle boundary — BOTH engines compute the entire
    savings accounting from the same rows."""
    from ocr_platform_spark.operators.cdc import cdc_chunk_table, cdc_host_dictionary_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    leaders = d.where(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("hid"), F.col("text").alias("ltext")
    )
    # aperiodic pseudo-random char streams (md5 chain blocks): repeated
    # text would make whole regions hit-free under the gear mask (period
    # shorter than the expected boundary gap -> only forced, offset-
    # dependent boundaries -> nothing resynchronizes or dedups)
    def _stream(col: F.Column, tag: str, n_blocks: int) -> F.Column:
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda i: F.md5(F.concat(col, F.lit(tag), i.cast("string"))),
            ),
            "",
        )

    pay = (
        d.withColumn("hid", F.col("doc_id") % 8)
        .join(F.broadcast(leaders), "hid")
        .select(
            "doc_id",
            F.concat(F.lit("host-"), F.col("hid").cast("string")).alias("host"),
            F.encode(
                F.concat(
                    # doc-unique head, length varies 13..5995 bytes -> the
                    # shared blob below starts at a different offset per doc
                    F.substring(
                        _stream(F.col("text"), "h", 188),
                        1,
                        (F.col("doc_id") % 7) * 997 + 13,
                    ),
                    # 24 KB host-shared blob (identical for every doc of the host)
                    _stream(F.col("ltext"), "b", 768),
                    # doc-unique tail, 8-12 KB
                    F.substring(
                        _stream(F.col("text"), "t", 384),
                        1,
                        8192 + (F.col("doc_id") % 5) * 1024,
                    ),
                ),
                "utf-8",
            ).alias("payload"),
        )
    )
    chunks = stage(
        cdc_chunk_table(
            pay, "doc_id", "payload", avg_bits=12, min_size=1024, max_size=16384
        ).join(
            pay.select(F.col("doc_id").alias("id"), "host"), "id"
        ),
        "cdcs_chunks",
        partitions=2,
    )
    return cdc_host_dictionary_stats(chunks, "host").orderBy("host")


@q(
    "anchor_training_pairs",
    f"""
    WITH e AS (
      SELECT regexp_extract(src_url, '^https?://([^/?#]+)', 1) AS src_host,
             regexp_extract(dst_url, '^https?://([^/?#]+)', 1) AS dst_host,
             dst_url,
             regexp_replace(trim(lower(anchor)), '\\s+', ' ', 'g') AS anchor
      FROM read_parquet('{staged_glob("anchor_pair_edges")}')
    ),
    kept AS (
      SELECT anchor, dst_url, src_host
      FROM e
      WHERE src_host <> dst_host
        AND length(anchor) >= 3
        AND anchor NOT IN ('home', 'next', 'previous', 'click here',
                           'read more', 'more', 'link', 'here')
    ),
    sup AS (
      SELECT anchor, dst_url,
             COUNT(DISTINCT src_host) AS n_hosts, COUNT(*) AS n_links
      FROM kept GROUP BY anchor, dst_url
    ),
    denoised AS (SELECT * FROM sup WHERE n_hosts >= 2)
    SELECT anchor, dst_url, CAST(n_hosts AS BIGINT) AS n_hosts,
           CAST(n_links AS BIGINT) AS n_links, CAST(rk AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY anchor ORDER BY n_hosts DESC, n_links DESC, dst_url) AS rk
      FROM denoised
    ) WHERE rk <= 3
    ORDER BY anchor, rank
    """,
)
def anchor_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text WEAK-SUPERVISION mining — the classic free training
    signal for retrieval/ranking models: an anchor is a human-written
    query and its link target the labeled positive. Denoising is the
    standard two-gate recipe: (1) cross-host links only (same-host
    anchors are navigation furniture) and (2) support from ≥ 2 DISTINCT
    source hosts (independent sites agreeing on the phrase); a
    navigational stoplist drops the 'click here' class, and each anchor
    keeps its top-3 targets by (host support, link count, url). Edge
    supply = the quote-aware anchor kernel's real extraction over the
    synthetic corpus UNIONED with a deterministic planted cross-host
    recommendation layer (descriptive anchors drawn from target text —
    the corpus's organic links are intra-host navigation). The union
    edge table is staged; the oracle replays normalization, both denoise
    gates, support counting and the per-anchor ranking. Everything
    shuffles on (anchor, dst_url) — corpus-proportional keys, no
    skew-prone host-wide grouping."""
    from ocr_platform_spark.operators.linkgraph import extract_outlink_anchors
    from ocr_platform_spark.operators.partitioning import host_of

    organic = extract_outlink_anchors(_synth_docs(spark)).select(
        "src_url", "dst_url", "anchor"
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    targets = d.where(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(
            F.lit("https://target-"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
        ).alias("dst_url"),
        F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 4), " ").alias("anchor"),
    )
    # each target is recommended by 2-4 distinct referrer hosts
    planted = targets.select(
        "dst_url",
        "anchor",
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 3) + 1)
        ).alias("ref"),
    ).select(
        F.concat(
            F.lit("https://blog-"), F.col("ref").cast("string"), F.lit(".example.net/post")
        ).alias("src_url"),
        "dst_url",
        "anchor",
    )
    edges = stage(
        organic.unionByName(planted), "anchor_pair_edges", partitions=4
    )
    e = edges.select(
        host_of("src_url").alias("src_host"),
        host_of("dst_url").alias("dst_host"),
        "dst_url",
        F.regexp_replace(F.trim(F.lower("anchor")), r"\s+", " ").alias("anchor"),
    )
    kept = e.where(
        (F.col("src_host") != F.col("dst_host"))
        & (F.length("anchor") >= 3)
        & ~F.col("anchor").isin(
            "home", "next", "previous", "click here", "read more", "more", "link", "here"
        )
    )
    sup = kept.groupBy("anchor", "dst_url").agg(
        F.countDistinct("src_host").alias("n_hosts"), F.count("*").alias("n_links")
    )
    w = Window.partitionBy("anchor").orderBy(
        F.desc("n_hosts"), F.desc("n_links"), "dst_url"
    )
    return (
        sup.where(F.col("n_hosts") >= 2)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            "anchor",
            "dst_url",
            F.col("n_hosts").cast("long").alias("n_hosts"),
            F.col("n_links").cast("long").alias("n_links"),
            "rank",
        )
        .orderBy("anchor", "rank")
    )


@q(
    "host_link_farm_pairs",
    f"""
    WITH e AS (
      SELECT DISTINCT
             regexp_extract(src_url, '^https?://([^/?#]+)', 1) AS src_host,
             regexp_extract(dst_url, '^https?://([^/?#]+)', 1) AS dst_host,
             dst_url
      FROM read_parquet('{staged_glob("farm_edges")}')
      WHERE regexp_extract(src_url, '^https?://([^/?#]+)', 1)
            <> regexp_extract(dst_url, '^https?://([^/?#]+)', 1)
    ),
    outs AS (SELECT DISTINCT src_host, dst_url FROM e),
    osz AS (SELECT src_host, COUNT(*) AS n FROM outs GROUP BY src_host),
    coup AS (
      SELECT a.src_host AS host_a, b.src_host AS host_b, COUNT(*) AS n_shared_out
      FROM outs a JOIN outs b ON a.dst_url = b.dst_url AND a.src_host < b.src_host
      GROUP BY 1, 2
    ),
    ins AS (SELECT DISTINCT dst_host, src_host FROM e),
    cocit AS (
      SELECT a.dst_host AS host_a, b.dst_host AS host_b, COUNT(*) AS n_shared_in
      FROM ins a JOIN ins b ON a.src_host = b.src_host AND a.dst_host < b.dst_host
      GROUP BY 1, 2
    ),
    u AS (
      SELECT COALESCE(c.host_a, i.host_a) AS host_a,
             COALESCE(c.host_b, i.host_b) AS host_b,
             COALESCE(c.n_shared_out, 0) AS n_shared_out,
             COALESCE(i.n_shared_in, 0) AS n_shared_in
      FROM coup c FULL OUTER JOIN cocit i
        ON c.host_a = i.host_a AND c.host_b = i.host_b
    )
    SELECT u.host_a, u.host_b,
           CAST(u.n_shared_out AS BIGINT) AS n_shared_out,
           CAST(u.n_shared_in AS BIGINT) AS n_shared_in,
           CAST(CASE WHEN sa.n IS NULL OR sb.n IS NULL THEN 0
                ELSE (1000 * u.n_shared_out) // (sa.n + sb.n - u.n_shared_out)
                END AS BIGINT) AS coupling_x1000,
           (u.n_shared_out >= 10 AND sa.n IS NOT NULL AND sb.n IS NOT NULL
            AND (1000 * u.n_shared_out) // (sa.n + sb.n - u.n_shared_out) >= 600)
             AS is_farm_pair
    FROM u
    LEFT JOIN osz sa ON sa.src_host = u.host_a
    LEFT JOIN osz sb ON sb.src_host = u.host_b
    ORDER BY u.host_a, u.host_b
    """,
)
def host_link_farm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-farm detection by DUAL link-set overlap — the off-content spam
    geometry TrustRank's seed flow can miss when a farm interlinks with
    crawled-but-unseeded regions: per host pair, bibliographic COUPLING
    (shared outlink urls — farms pushing the same promoted pages) and
    CO-CITATION (shared referrer hosts — pages promoted by the same
    farm), with the farm gate on integer coupling Jaccard ≥ 0.6 over ≥ 10
    shared targets. The corpus's organic cross-host links stay below the
    gate; a planted 3-host farm promoting one 20-url slate trips it, and
    the promoted target hosts surface as strongly co-cited WITHOUT
    tripping the coupling gate — the two directions separate promoter
    from promoted. Both overlaps join on corpus-proportional keys
    (dst_url / src_host), never per-host collected sets; the staged edge
    list is the only kernel boundary and the oracle replays every set
    size, overlap, quotient and gate."""
    from ocr_platform_spark.operators.linkgraph import extract_outlinks
    from ocr_platform_spark.operators.partitioning import host_of

    organic = extract_outlinks(_synth_docs(spark)).select("src_url", "dst_url")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    promo = d.where(F.col("doc_id") < 20).select(
        F.concat(
            F.lit("https://promo-"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.org/offer/"), F.col("doc_id").cast("string"),
        ).alias("dst_url")
    )
    planted = promo.crossJoin(
        spark.range(3).select(
            F.concat(F.lit("https://farm-"), F.col("id").cast("string"), F.lit(".example.biz/page"))
            .alias("src_url")
        )
    ).select("src_url", "dst_url")
    edges = stage(
        organic.unionByName(planted), "farm_edges", partitions=4
    )
    e = (
        edges.select(
            host_of("src_url").alias("src_host"),
            host_of("dst_url").alias("dst_host"),
            "dst_url",
        )
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )
    outs = e.select("src_host", "dst_url").distinct()
    osz = outs.groupBy("src_host").agg(F.count("*").alias("n"))
    oa = outs.select(F.col("src_host").alias("host_a"), "dst_url")
    ob = outs.select(F.col("src_host").alias("host_b"), "dst_url")
    coup = (
        oa.join(ob, "dst_url")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared_out"))
    )
    ins = e.select("dst_host", "src_host").distinct()
    ia = ins.select(F.col("dst_host").alias("host_a"), "src_host")
    ib = ins.select(F.col("dst_host").alias("host_b"), "src_host")
    cocit = (
        ia.join(ib, "src_host")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared_in"))
    )
    u = (
        coup.join(cocit, ["host_a", "host_b"], "full_outer")
        .select(
            "host_a",
            "host_b",
            F.coalesce("n_shared_out", F.lit(0)).alias("n_shared_out"),
            F.coalesce("n_shared_in", F.lit(0)).alias("n_shared_in"),
        )
    )
    jac = F.expr(
        "case when n_a is null or n_b is null then 0 "
        "else (1000 * n_shared_out) div (n_a + n_b - n_shared_out) end"
    )
    return (
        u.join(
            F.broadcast(osz.select(F.col("src_host").alias("host_a"), F.col("n").alias("n_a"))),
            "host_a",
            "left",
        )
        .join(
            F.broadcast(osz.select(F.col("src_host").alias("host_b"), F.col("n").alias("n_b"))),
            "host_b",
            "left",
        )
        .select(
            "host_a",
            "host_b",
            F.col("n_shared_out").cast("long").alias("n_shared_out"),
            F.col("n_shared_in").cast("long").alias("n_shared_in"),
            jac.cast("long").alias("coupling_x1000"),
            (
                (F.col("n_shared_out") >= 10)
                & F.col("n_a").isNotNull()
                & F.col("n_b").isNotNull()
                & (jac >= 600)
            ).alias("is_farm_pair"),
        )
        .orderBy("host_a", "host_b")
    )


def _fim_hash_sql(salt: str, mod_sql: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 6)) "
        f"AS BIGINT) % ({mod_sql})"
    )


@q(
    "corpus_fim_transform",
    f"""
    WITH e AS (SELECT * FROM read_parquet('{staged_glob("fim_enc")}')),
    cut AS (
      SELECT doc_id, n_tokens, ids, string_split(ids, ' ') AS ts,
             ({_fim_hash_sql("-fimg", "1000")}) < 500 AND n_tokens > 0 AS applied,
             {_fim_hash_sql("-fim1", "n_tokens + 1")} AS c1,
             {_fim_hash_sql("-fim2", "n_tokens + 1")} AS c2
      FROM e
    ),
    sp AS (
      SELECT doc_id, n_tokens, ids, ts, applied,
             least(c1, c2) AS lo, greatest(c1, c2) AS hi
      FROM cut
    )
    SELECT doc_id, applied AS fim_applied,
           CAST(CASE WHEN applied THEN n_tokens + 3 ELSE n_tokens END AS INT)
             AS n_tokens,
           CASE WHEN applied THEN array_to_string(
                  list_concat(list_concat(list_concat(list_concat(
                    ['-1'], ts[1:CAST(lo AS INT)]),
                    ['-2']), ts[CAST(hi AS INT) + 1 : CAST(n_tokens AS INT)]),
                    list_concat(['-3'], ts[CAST(lo AS INT) + 1 : CAST(hi AS INT)])),
                  ' ')
                ELSE ids END AS ids
    FROM sp ORDER BY doc_id
    """,
)
def corpus_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022 — the FIM
    recipe code models train with): for a deterministic 50% of documents
    (md5 gate), the encoded token sequence splits at two md5-derived cut
    points into prefix/middle/suffix and reorders to PSM —
    ``<PRE> prefix <SUF> suffix <MID> middle`` — with sentinel ids
    -1/-2/-3 (the dense-rank vocabulary is positive, 0 is the EOS
    reserve), completing the tokenizer chain train → encode → FIM →
    pack. Everything after encoding is pure column arithmetic: the cut
    points are per-row md5 draws modulo n+1 (the hash_bucket dialect
    pair with a per-row modulus), splits are array slices, and the
    reorder is one concat — so the oracle replays gate, cuts, slices and
    the exact output id sequence per document from the staged encoded
    table. Wholly map-side; no shuffle beyond the staged input."""
    from ocr_platform_spark.operators.bpe import (
        encode_with_segmentation,
        train_bpe_merges,
        word_counts,
    )

    d = _t(spark, sf_dir, "documents")
    words = word_counts(d, "text", min_count=2)
    _merges, syms = train_bpe_merges(words, n_merges=_BPE_MERGES)
    seg = stage(
        syms.select(
            F.regexp_replace("sym", " ", "").alias("word"),
            F.split("sym", " ").alias("toks"),
        ),
        "fim_seg",
    )
    enc = stage(
        encode_with_segmentation(d, seg, "doc_id", "text"), "fim_enc", partitions=4
    )

    def _h(salt: str, mod: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 6
                ),
                16,
                10,
            ).cast("long")
            % mod
        )

    n = F.col("n_tokens")
    cut = enc.select(
        "doc_id",
        "n_tokens",
        "ids",
        F.split("ids", " ").alias("ts"),
        ((_h("-fimg", F.lit(1000)) < 500) & (n > 0)).alias("applied"),
        _h("-fim1", n + 1).alias("c1"),
        _h("-fim2", n + 1).alias("c2"),
    ).select(
        "doc_id",
        "n_tokens",
        "ids",
        "ts",
        "applied",
        F.least("c1", "c2").alias("lo"),
        F.greatest("c1", "c2").alias("hi"),
    )
    fim_ids = F.array_join(
        F.concat(
            F.array(F.lit("-1")),
            F.expr("slice(ts, 1, cast(lo as int))"),
            F.array(F.lit("-2")),
            F.expr("slice(ts, cast(hi as int) + 1, cast(n_tokens - hi as int))"),
            F.array(F.lit("-3")),
            F.expr("slice(ts, cast(lo as int) + 1, cast(hi - lo as int))"),
        ),
        " ",
    )
    return cut.select(
        "doc_id",
        F.col("applied").alias("fim_applied"),
        F.when(F.col("applied"), (n + 3).cast("int"))
        .otherwise(n.cast("int"))
        .alias("n_tokens"),
        F.when(F.col("applied"), fim_ids).otherwise(F.col("ids")).alias("ids"),
    ).orderBy("doc_id")


@q(
    "doc_novelty_scores",
    f"""
    WITH hs AS (SELECT * FROM read_parquet('{staged_glob("novelty_hs")}')),
    tr AS (SELECT id, unnest(hs) AS h FROM hs),
    first AS (SELECT h, MIN(id) AS first_id FROM tr GROUP BY h),
    nov AS (
      SELECT tr.id, COUNT(*) AS n_novel
      FROM tr JOIN first f ON f.h = tr.h AND f.first_id = tr.id
      GROUP BY tr.id
    )
    SELECT hs.id AS doc_id,
           CAST(len(hs.hs) AS BIGINT) AS n_shingles,
           CAST(COALESCE(nov.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(CASE WHEN len(hs.hs) > 0
                THEN (1000 * COALESCE(nov.n_novel, 0)) // len(hs.hs)
                ELSE 0 END AS BIGINT) AS novelty_pm
    FROM hs LEFT JOIN nov ON nov.id = hs.id
    ORDER BY doc_id
    """,
)
def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document NOVELTY under arrival order — the incremental-utility
    signal diversity-aware curation ranks by (a document contributes
    only what the corpus hasn't already seen; the marginal-value cousin
    of dedup's binary verdict): each doc's score is the per-mille of its
    distinct word shingles whose FIRST occurrence (minimum doc_id) is
    this document. One explode, one map-combinable MIN keyed by shingle
    hash (corpus-proportional key — parallelizes arbitrarily, no per-doc
    state), one count-back join. The staged shingle table is the xxhash
    boundary; the oracle replays first-occurrence assignment and every
    quotient. Templated/syndicated documents score low; fresh content
    scores near 1000 — thresholding this IS the quality-aware sampling
    knob for over-crawled hosts."""
    d = _t(spark, sf_dir, "documents")
    hs = stage(
        dedup.hashed_shingle_sets(d, "doc_id", "text"), "novelty_hs", partitions=8
    )
    tr = hs.select("id", F.explode("hs").alias("h"))
    first = tr.groupBy("h").agg(F.min("id").alias("first_id"))
    nov = (
        tr.join(first, (tr.h == first.h) & (tr.id == F.col("first_id")))
        .groupBy(tr.id)
        .agg(F.count("*").alias("n_novel"))
    )
    return (
        hs.join(nov, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.size("hs").cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.size("hs") > 0,
                F.expr("cast((1000 * coalesce(n_novel, 0)) div size(hs) as bigint)"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("novelty_pm"),
        )
        .orderBy("doc_id")
    )


@q(
    "event_burst_segments",
    """
    WITH RECURSIVE ev AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) * 24
                  + EXTRACT(hour FROM ts) + 1 AS BIGINT) AS t
      FROM events
    ),
    nmax AS (SELECT MAX(t) AS tn FROM ev),
    grid AS (
      SELECT et.event_type, CAST(unnest(generate_series(1, nmax.tn)) AS BIGINT) AS t
      FROM (SELECT DISTINCT event_type FROM ev) et, nmax
    ),
    cnt AS (SELECT event_type, t, COUNT(*) AS n FROM ev GROUP BY 1, 2),
    kk0 AS (
      SELECT g.event_type, g.t,
             CAST(COALESCE(c.n, 0)
                  + CASE WHEN g.event_type = 'click' AND g.t % 17 < 5
                         THEN 12 ELSE 0 END AS BIGINT) AS k
      FROM grid g LEFT JOIN cnt c ON c.event_type = g.event_type AND c.t = g.t
    ),
    params AS (
      SELECT event_type, SUM(k) // COUNT(*) AS r0,
             2 * (SUM(k) // COUNT(*)) + 1 AS r1,
             greatest(2 * (SUM(k) // COUNT(*)), 2) AS gamma
      FROM kk0 GROUP BY 1
    ),
    kk AS MATERIALIZED (
      SELECT kk0.*, p.r0, p.r1, p.gamma
      FROM kk0 JOIN params p ON p.event_type = kk0.event_type
    ),
    fwd AS (
      SELECT event_type, t, k,
             CAST(abs(k - r0) AS BIGINT) AS c0,
             CAST(gamma + abs(k - r1) AS BIGINT) AS c1,
             -1 AS f0, -1 AS f1
      FROM kk WHERE t = 1
      UNION ALL
      SELECT k.event_type, k.t, k.k,
             CAST(abs(k.k - k.r0) + least(f.c0, f.c1 + k.gamma) AS BIGINT),
             CAST(abs(k.k - k.r1) + least(f.c1, f.c0 + k.gamma) AS BIGINT),
             CASE WHEN f.c0 <= f.c1 + k.gamma THEN 0 ELSE 1 END,
             CASE WHEN f.c1 <= f.c0 + k.gamma THEN 1 ELSE 0 END
      FROM fwd f JOIN kk k ON k.event_type = f.event_type AND k.t = f.t + 1
    ),
    fwdm AS MATERIALIZED (SELECT * FROM fwd),
    fin AS (SELECT event_type, MAX(t) AS tn FROM fwdm GROUP BY 1),
    bwd AS (
      SELECT f.event_type, f.t,
             CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END AS s
      FROM fwdm f JOIN fin ON fin.event_type = f.event_type AND f.t = fin.tn
      UNION ALL
      SELECT b.event_type, b.t - 1,
             CASE WHEN b.s = 0 THEN f2.f0 ELSE f2.f1 END
      FROM bwd b
      JOIN fwdm f2 ON f2.event_type = b.event_type AND f2.t = b.t
      WHERE b.t > 1
    )
    SELECT k.event_type, k.t, k.k, b.s = 1 AS in_burst
    FROM kk k JOIN bwd b ON b.event_type = k.event_type AND b.t = k.t
    ORDER BY k.event_type, k.t
    """,
)
def event_burst_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style BURST detection over the event stream (operators/
    bursts.py) — the trending-content signal that drives burst-aware
    crawl scheduling and sampling: each event type's dense hourly series
    (zero-filled grid, a planted 5-of-17-hours boost on one type) is
    labeled base/burst by the globally OPTIMAL two-state segmentation
    minimizing Σ |k_t − r_state| + γ·transitions, integer costs
    throughout. This is a different order-dependent-state class from the
    engine's prefix sums and greedy folds: forward DP with provenance
    plus a BACKWARD trace, run in Spark as two row-local expression
    folds over each key's collected series (no Python, keys parallelize
    arbitrarily) and replayed by the oracle as twin recursive CTEs —
    forward recurrence, then backtrack — from raw parquet with no
    staging at all. Hour indexing is date arithmetic (no epoch/timezone
    dependence); the Spark fold is differentially pinned against a
    pure-python reference in tests/test_bursts.py."""
    from ocr_platform_spark.operators.bursts import burst_segments

    e = _t(spark, sf_dir, "events")
    ev = e.select(
        "event_type",
        (
            F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
            + F.hour("ts")
            + 1
        )
        .cast("long")
        .alias("t"),
    )
    tn = ev.agg(F.max("t").alias("tn"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(tn)).select(
        "event_type", F.explode(F.sequence(F.lit(1).cast("long"), F.col("tn"))).alias("t")
    )
    cnt = ev.groupBy("event_type", "t").agg(F.count("*").alias("n"))
    kk0 = grid.join(cnt, ["event_type", "t"], "left").select(
        "event_type",
        "t",
        (
            F.coalesce("n", F.lit(0))
            + F.when(
                (F.col("event_type") == "click") & (F.col("t") % 17 < 5), F.lit(12)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("k"),
    )
    params = kk0.groupBy("event_type").agg(
        F.expr("sum(k) div count(*)").alias("r0"),
        F.expr("2 * (sum(k) div count(*)) + 1").alias("r1"),
        F.expr("greatest(2 * (sum(k) div count(*)), 2)").alias("gamma"),
    )
    kk = kk0.join(F.broadcast(params), "event_type")
    return (
        burst_segments(kk, key_col="event_type", t_col="t", k_col="k")
        .orderBy("event_type", "t")
    )


@q(
    "host_triangle_stats",
    """
    WITH raw AS (
      SELECT doc_id % 40 AS a,
             (doc_id % 40 + 1 + doc_id % 13) % 40 AS b
      FROM documents WHERE doc_id % 31 = 0
      UNION ALL
      SELECT doc_id % 5, (doc_id // 5) % 5 FROM documents WHERE doc_id < 25
      UNION ALL
      SELECT 5, doc_id % 40 FROM documents WHERE doc_id % 11 = 0
    ),
    und AS (
      SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM raw WHERE a <> b
    ),
    deg AS (
      SELECT h, COUNT(*) AS degree FROM (
        SELECT u AS h FROM und UNION ALL SELECT v FROM und
      ) GROUP BY h
    ),
    o AS (
      SELECT CASE WHEN (da.degree, und.u) < (db.degree, und.v)
                  THEN und.u ELSE und.v END AS x,
             CASE WHEN (da.degree, und.u) < (db.degree, und.v)
                  THEN und.v ELSE und.u END AS y
      FROM und
      JOIN deg da ON da.h = und.u
      JOIN deg db ON db.h = und.v
    ),
    tris AS (
      SELECT w.w_a, w.w_b, w.w_c
      FROM (
        SELECT o1.x AS w_a, o1.y AS w_b, o2.y AS w_c
        FROM o o1 JOIN o o2 ON o2.x = o1.y
      ) w
      JOIN o o3 ON o3.x = w.w_a AND o3.y = w.w_c
    ),
    per AS (
      SELECT h, COUNT(*) AS n_triangles FROM (
        SELECT w_a AS h FROM tris
        UNION ALL SELECT w_b FROM tris
        UNION ALL SELECT w_c FROM tris
      ) GROUP BY h
    )
    SELECT 'h' || CAST(deg.h AS VARCHAR) AS host,
           CAST(deg.degree AS BIGINT) AS degree,
           CAST(COALESCE(per.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN deg.degree >= 2
                THEN (2000 * COALESCE(per.n_triangles, 0))
                     // (deg.degree * (deg.degree - 1))
                ELSE 0 END AS BIGINT) AS clustering_x1000
    FROM deg LEFT JOIN per ON per.h = deg.h
    ORDER BY host
    """,
)
def host_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the host
    graph (operators/linkgraph.triangle_counts) — the web-spam signal of
    Becchetti et al.: link farms interlink into near-cliques (clustering
    → 1) while organic hosts sit in sparse neighborhoods. Enumeration
    uses the degree-ordered ORIENTATION so each triangle is found once
    from its smallest-degree corner and wedge fan-out is bounded O(√m)
    even at a 10^6-degree hub — the thing that makes triangle counting
    run at web scale at all. The host graph is derived deterministically
    from doc arithmetic (a pseudo-random sparse layer, a planted K5
    clique on hosts 0-4, and a hub spoke-set on host 5), so the oracle
    is staging-free: DuckDB rebuilds the graph and replays
    symmetrization, degrees, orientation, the two wedge joins and the
    per-corner counts from raw parquet. The planted clique members show
    clustering ≈ 1000·(pairs-among-neighbors); the hub's coefficient
    collapses toward 0 — both visible in the output."""
    from ocr_platform_spark.operators.linkgraph import triangle_counts

    d = _t(spark, sf_dir, "documents").select("doc_id")
    h = F.col("doc_id") % 40
    raw = (
        d.where(F.col("doc_id") % 31 == 0)
        .select(h.alias("a"), ((h + 1 + F.col("doc_id") % 13) % 40).alias("b"))
        .unionAll(
            d.where(F.col("doc_id") < 25).select(
                (F.col("doc_id") % 5).alias("a"),
                (F.expr("doc_id div 5") % 5).alias("b"),
            )
        )
        .unionAll(
            d.where(F.col("doc_id") % 11 == 0).select(
                F.lit(5).cast("long").alias("a"), (F.col("doc_id") % 40).alias("b")
            )
        )
    )
    return (
        triangle_counts(raw, "a", "b")
        .select(
            F.concat(F.lit("h"), F.col("host").cast("string")).alias("host"),
            "degree",
            "n_triangles",
            "clustering_x1000",
        )
        .orderBy("host")
    )


@q(
    "url_canonical_chains",
    """
    WITH RECURSIVE decl AS (
      SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
             CASE
               WHEN doc_id % 8 BETWEEN 1 AND 5
                 THEN 'u' || CAST(doc_id - 1 AS VARCHAR)
               WHEN doc_id % 8 = 6 THEN 'u' || CAST(doc_id AS VARCHAR)
               WHEN doc_id % 16 = 7 THEN 'u' || CAST(doc_id + 8 AS VARCHAR)
               WHEN doc_id % 16 = 15 THEN 'u' || CAST(doc_id - 8 AS VARCHAR)
             END AS canon
      FROM documents WHERE doc_id % 8 <> 0
    ),
    nodes AS (
      SELECT DISTINCT n FROM (
        SELECT url AS n FROM decl UNION ALL SELECT canon FROM decl
      )
    ),
    nxt AS MATERIALIZED (
      SELECT n, COALESCE(d.canon, n) AS p
      FROM nodes LEFT JOIN decl d ON d.url = n
    ),
    walk AS (
      SELECT n, p AS cur,
             CAST(CASE WHEN p = n THEN 0 ELSE 1 END AS BIGINT) AS hops,
             1 AS it
      FROM nxt
      UNION ALL
      SELECT w.n, x.p,
             w.hops + CASE WHEN x.p = w.cur THEN 0 ELSE 1 END,
             w.it + 1
      FROM walk w JOIN nxt x ON x.n = w.cur
      WHERE w.it < 8
    )
    SELECT w.n AS url, w.cur AS final_url, w.hops AS n_hops,
           t.p = w.cur AS resolved
    FROM walk w JOIN nxt t ON t.n = w.cur
    WHERE w.it = 8
    ORDER BY url
    """,
)
def url_canonical_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-declaration CHAIN resolution (operators/linkgraph.
    resolve_pointer_chains): rel=canonical targets often declare their
    own canonicals, so dedup keyed on the one-hop target still splits a
    chain's members; this resolves every url to its terminal target by
    POINTER DOUBLING — 3 shuffle joins cover an 8-hop budget (log cost,
    the functional-graph path-compression trick), distances telescope to
    min(budget, dist-to-root), and declaration cycles surface as
    resolved=false instead of looping. Synthetic declarations plant
    5-hop chains, explicit self-canonicals, and 2-cycles per 16-doc
    block. The oracle resolves the SAME budget one hop at a time in a
    recursive CTE — a different algorithm whose composition equals
    f^(2^doublings), cross-checking the doubling algebra itself;
    staging-free from raw parquet. (nxt is pulled through a MATERIALIZED
    CTE: referenced from inside the recursion, an inline view would
    re-evaluate per iteration.)"""
    from ocr_platform_spark.operators.linkgraph import resolve_pointer_chains

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    decl = d.where(did % 8 != 0).select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        F.when(
            (did % 8 >= 1) & (did % 8 <= 5),
            F.concat(F.lit("u"), (did - 1).cast("string")),
        )
        .when(did % 8 == 6, F.concat(F.lit("u"), did.cast("string")))
        .when(did % 16 == 7, F.concat(F.lit("u"), (did + 8).cast("string")))
        .when(did % 16 == 15, F.concat(F.lit("u"), (did - 8).cast("string")))
        .alias("canon"),
    )
    return resolve_pointer_chains(decl, "url", "canon", doublings=3).orderBy("url")


def _anchor_eval_oracle() -> str:
    from ocr_platform_spark.operators import embed as _embed

    return f"""
    WITH e AS (
      SELECT regexp_extract(src_url, '^https?://([^/?#]+)', 1) AS src_host,
             regexp_extract(dst_url, '^https?://([^/?#]+)', 1) AS dst_host,
             dst_url,
             regexp_replace(trim(lower(anchor)), '\\s+', ' ', 'g') AS anchor
      FROM read_parquet('{staged_glob("areval_edges")}')
    ),
    sup AS (
      SELECT anchor, dst_url,
             COUNT(DISTINCT src_host) AS n_hosts, COUNT(*) AS n_links
      FROM e
      WHERE src_host <> dst_host AND length(anchor) >= 3
      GROUP BY anchor, dst_url
    ),
    mined AS (
      SELECT anchor,
             CAST(regexp_extract(dst_url, '/doc/([0-9]+)$', 1) AS BIGINT)
               AS pos_doc_id
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY anchor ORDER BY n_hosts DESC, n_links DESC, dst_url) AS rk
        FROM sup WHERE n_hosts >= 2
      ) WHERE rk = 1
    ),
    qids AS (
      SELECT anchor, pos_doc_id,
             1000000 + CAST(('0x' || substr(md5(anchor || '-q'), 1, 6)) AS BIGINT)
               % 1000000 AS qid
      FROM mined
    ),
    embin AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN (SELECT DISTINCT pos_doc_id FROM mined) t
        ON t.pos_doc_id = d.doc_id
      UNION ALL
      SELECT qid AS doc_id, anchor AS text FROM qids
    ),
    {_embed.derived_embeddings_cte(table="embin")},
    scored AS (
      SELECT q.anchor, q.pos_doc_id, t.pos_doc_id AS cand_id,
             CASE WHEN nq > 0 AND ni > 0
                  THEN round(CAST(dot AS DOUBLE)
                             / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE))), 6)
                  ELSE 0.0 END AS cosine
      FROM qids q
      JOIN (SELECT DISTINCT pos_doc_id FROM mined) t ON TRUE,
      LATERAL (
        SELECT list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                       p -> p[1] * p[2])) AS dot,
               list_sum(list_transform(a.embedding, x -> x * x)) AS nq,
               list_sum(list_transform(b.embedding, x -> x * x)) AS ni
        FROM demb a, demb b
        WHERE a.doc_id = q.qid AND b.doc_id = t.pos_doc_id
      )
    ),
    pc AS (
      SELECT anchor, pos_doc_id, cosine AS pos_cos
      FROM scored WHERE cand_id = pos_doc_id
    ),
    ranked AS (
      SELECT pc.anchor, pc.pos_doc_id,
             CAST(1 + COUNT(CASE WHEN s.cosine > pc.pos_cos
                              OR (s.cosine = pc.pos_cos
                                  AND s.cand_id < pc.pos_doc_id)
                            THEN 1 END) AS INT) AS rank
      FROM pc JOIN scored s ON s.anchor = pc.anchor
      GROUP BY pc.anchor, pc.pos_doc_id
    )
    SELECT anchor, pos_doc_id, rank, rank = 1 AS hit_at_1,
           CAST(CASE WHEN rank <= 10 THEN 1000000 // rank ELSE 0 END AS BIGINT)
             AS rr_x1e6
    FROM ranked ORDER BY anchor
    """


@q("anchor_retrieval_eval", _anchor_eval_oracle())
def anchor_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END weak-supervision retrieval eval — the composition the
    anchor pairs exist for: anchors mined from the link graph become
    queries, their link targets the labeled positives, both sides embed
    with the deterministic trigram-hash embedder, and each positive's
    rank among ALL mined targets under exact integer-vector cosine
    yields hit@1 / MRR — measuring whether anchor text actually
    retrieves its target in embedding space (it should: planted anchors
    are 4-word prefixes of their targets' text, so misses mark prefix
    collisions). Mining replays the anchor_training_pairs gates from its
    own staged edge union; query pseudo-doc ids are md5-derived; the
    oracle recomputes every embedding from raw text (the shared
    derived-embeddings CTE), every cosine, and every count-comparison
    rank — nothing numeric crosses an engine boundary unverified. Query
    and candidate sets are mining-sized; the rank needs no corpus-wide
    window."""
    from ocr_platform_spark.operators.embed import hashed_ngram_embedding
    from ocr_platform_spark.operators.linkgraph import extract_outlink_anchors
    from ocr_platform_spark.operators.partitioning import host_of

    organic = extract_outlink_anchors(_synth_docs(spark)).select(
        "src_url", "dst_url", "anchor"
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    targets = d.where(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(
            F.lit("https://target-"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
        ).alias("dst_url"),
        F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 4), " ").alias("anchor"),
    )
    planted = targets.select(
        "dst_url",
        "anchor",
        F.explode(F.sequence(F.lit(0), (F.col("doc_id") % 3) + 1)).alias("ref"),
    ).select(
        F.concat(
            F.lit("https://blog-"), F.col("ref").cast("string"), F.lit(".example.net/post")
        ).alias("src_url"),
        "dst_url",
        "anchor",
    )
    edges = stage(organic.unionByName(planted), "areval_edges", partitions=4)
    e = edges.select(
        host_of("src_url").alias("src_host"),
        host_of("dst_url").alias("dst_host"),
        "dst_url",
        F.regexp_replace(F.trim(F.lower("anchor")), r"\s+", " ").alias("anchor"),
    )
    sup = (
        e.where((F.col("src_host") != F.col("dst_host")) & (F.length("anchor") >= 3))
        .groupBy("anchor", "dst_url")
        .agg(F.countDistinct("src_host").alias("n_hosts"), F.count("*").alias("n_links"))
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("n_hosts"), F.desc("n_links"), "dst_url")
    mined = (
        sup.where(F.col("n_hosts") >= 2)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "anchor",
            F.regexp_extract("dst_url", r"/doc/([0-9]+)$", 1).cast("long").alias("pos_doc_id"),
        )
    )
    qids = mined.select(
        "anchor",
        "pos_doc_id",
        (
            F.lit(1000000)
            + F.conv(
                F.substring(F.md5(F.concat(F.col("anchor"), F.lit("-q"))), 1, 6), 16, 10
            ).cast("long")
            % 1000000
        ).alias("qid"),
    )
    tset = mined.select("pos_doc_id").distinct()
    embin = (
        d.join(tset, d.doc_id == tset.pos_doc_id)
        .select("doc_id", "text")
        .unionByName(qids.select(F.col("qid").alias("doc_id"), F.col("anchor").alias("text")))
    )
    emb = hashed_ngram_embedding(embin, "doc_id", "text").select("id", "embedding")
    qe = qids.join(emb, qids.qid == emb.id).select(
        "anchor", "pos_doc_id", F.col("embedding").alias("q_v")
    )
    te = tset.join(emb, tset.pos_doc_id == emb.id).select(
        F.col("pos_doc_id").alias("cand_id"), F.col("embedding").alias("i_v")
    )
    dot = F.aggregate(
        F.zip_with("q_v", "i_v", lambda a, b: a * b), F.lit(0).cast("long"), lambda s, x: s + x
    )
    nq = F.aggregate(F.transform("q_v", lambda x: x * x), F.lit(0).cast("long"), lambda s, x: s + x)
    ni = F.aggregate(F.transform("i_v", lambda x: x * x), F.lit(0).cast("long"), lambda s, x: s + x)
    cos = F.when(
        (nq > 0) & (ni > 0),
        F.round(dot.cast("double") / (F.sqrt(nq.cast("double")) * F.sqrt(ni.cast("double"))), 6),
    ).otherwise(F.lit(0.0))
    scored = qe.crossJoin(F.broadcast(te)).select(
        "anchor", "pos_doc_id", "cand_id", cos.alias("cosine")
    )
    pc = scored.where(F.col("cand_id") == F.col("pos_doc_id")).select(
        "anchor", F.col("cosine").alias("pos_cos")
    )
    before = (F.col("cosine") > F.col("pos_cos")) | (
        (F.col("cosine") == F.col("pos_cos")) & (F.col("cand_id") < F.col("pos_doc_id"))
    )
    ranked = (
        scored.join(F.broadcast(pc), "anchor")
        .groupBy("anchor", "pos_doc_id")
        .agg((F.lit(1) + F.count(F.when(before, 1))).cast("int").alias("rank"))
    )
    return ranked.select(
        "anchor",
        "pos_doc_id",
        "rank",
        (F.col("rank") == 1).alias("hit_at_1"),
        F.when(F.col("rank") <= 10, F.expr("cast(1000000 div rank as bigint)"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rr_x1e6"),
    ).orderBy("anchor")


@q(
    "burst_aware_crawl_budget",
    r"""
    WITH RECURSIVE ev AS (
      SELECT 'site-' || CAST(user_id % 40 AS VARCHAR) AS host,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) * 24
                  + EXTRACT(hour FROM ts) + 1 AS BIGINT) AS t
      FROM events
    ),
    nmax AS (SELECT MAX(t) AS tn FROM ev),
    grid AS (
      SELECT h.host, CAST(unnest(generate_series(1, nmax.tn)) AS BIGINT) AS t
      FROM (SELECT DISTINCT host FROM ev) h, nmax
    ),
    cnt AS (SELECT host, t, COUNT(*) AS n FROM ev GROUP BY 1, 2),
    kk0 AS (
      SELECT g.host, g.t,
             CAST(COALESCE(c.n, 0)
                  + CASE WHEN CAST(substr(g.host, 6) AS BIGINT) % 7 = 0
                              AND g.t % 13 < 3
                         THEN 9 ELSE 0 END AS BIGINT) AS k
      FROM grid g LEFT JOIN cnt c ON c.host = g.host AND c.t = g.t
    ),
    params AS (
      SELECT host, SUM(k) // COUNT(*) AS r0,
             2 * (SUM(k) // COUNT(*)) + 1 AS r1,
             greatest(2 * (SUM(k) // COUNT(*)), 2) AS gamma
      FROM kk0 GROUP BY 1
    ),
    kk AS MATERIALIZED (
      SELECT kk0.*, p.r0, p.r1, p.gamma
      FROM kk0 JOIN params p ON p.host = kk0.host
    ),
    fwd AS (
      SELECT host, t, k,
             CAST(abs(k - r0) AS BIGINT) AS c0,
             CAST(gamma + abs(k - r1) AS BIGINT) AS c1,
             -1 AS f0, -1 AS f1
      FROM kk WHERE t = 1
      UNION ALL
      SELECT k.host, k.t, k.k,
             CAST(abs(k.k - k.r0) + least(f.c0, f.c1 + k.gamma) AS BIGINT),
             CAST(abs(k.k - k.r1) + least(f.c1, f.c0 + k.gamma) AS BIGINT),
             CASE WHEN f.c0 <= f.c1 + k.gamma THEN 0 ELSE 1 END,
             CASE WHEN f.c1 <= f.c0 + k.gamma THEN 1 ELSE 0 END
      FROM fwd f JOIN kk k ON k.host = f.host AND k.t = f.t + 1
    ),
    fwdm AS MATERIALIZED (SELECT * FROM fwd),
    fin AS (SELECT host, MAX(t) AS tn FROM fwdm GROUP BY 1),
    bwd AS (
      SELECT f.host, f.t, CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END AS s
      FROM fwdm f JOIN fin ON fin.host = f.host AND f.t = fin.tn
      UNION ALL
      SELECT b.host, b.t - 1, CASE WHEN b.s = 0 THEN f2.f0 ELSE f2.f1 END
      FROM bwd b JOIN fwdm f2 ON f2.host = b.host AND f2.t = b.t
      WHERE b.t > 1
    ),
    share AS (
      SELECT host,
             CAST((1000 * COUNT(CASE WHEN s = 1 THEN 1 END)) // COUNT(*) AS BIGINT)
               AS burst_share_pm
      FROM bwd GROUP BY host
    ),
    c AS (
      SELECT doc_id,
        CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
        CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|that|with)\b')) AS DOUBLE) AS stops,
        CAST(length(text) - length(regexp_replace(text, '[.,;:!?()]', '', 'g')) AS DOUBLE) AS punct
      FROM documents
    ),
    dq AS (
      SELECT 'site-' || CAST(doc_id % 40 AS VARCHAR) AS host,
        CAST(round(round(
          least(toks / 100.0, 1.0) * 0.4
          + least((CASE WHEN toks > 0 THEN stops / toks ELSE 0.0 END) * 5.0, 1.0) * 0.3
          + (1.0 - least((CASE WHEN toks > 0 THEN punct / toks ELSE 1.0 END) * 2.0, 1.0)) * 0.3,
          4) * 1000) AS BIGINT) AS q_x1000
      FROM c
    ),
    m AS (
      SELECT dq.host, CAST(SUM(q_x1000) AS BIGINT) AS mass,
             CAST(COALESCE(MAX(sh.burst_share_pm), 0) AS BIGINT) AS burst_share_pm,
             CAST(SUM(q_x1000) * (1000 + COALESCE(MAX(sh.burst_share_pm), 0)) // 1000
                  AS BIGINT) AS boosted
      FROM dq LEFT JOIN share sh ON sh.host = dq.host
      GROUP BY dq.host
    ),
    tt AS (SELECT CAST(SUM(boosted) AS BIGINT) AS total FROM m),
    b2 AS (
      SELECT host, mass, burst_share_pm, boosted,
             (1000 * boosted) // total AS base,
             (1000 * boosted) % total AS rem
      FROM m, tt
    ),
    l AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS leftover FROM b2),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk FROM b2)
    SELECT host, mass, burst_share_pm, boosted,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS slots,
           CAST(least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END, 120)
                AS BIGINT) AS capped_slots
    FROM r, l ORDER BY host
    """,
)
def burst_aware_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURST-AWARE crawl budgeting — the composition the burst detector
    exists for: each host's event series (user-keyed activity mapped to
    hosts, a planted 3-of-13-hours surge on every 7th host) runs through
    the optimal two-state segmentation, its per-mille of burst hours
    multiplies the host's quality mass (trending hosts earn fresh-crawl
    priority on top of quality), and the boosted masses apportion the
    1000-slot budget by the exact largest-remainder rule with the
    politeness cap. Chains three proven pieces — burst DP (twin
    recursive CTEs), quality mass (host_quality_rollup substrate),
    integer apportionment (crawl_budget_allocation) — into one
    staging-free oracled plan; every intermediate is integer so the
    composition hashes identically cross-engine. Scale: the DP is
    per-host row-local, the apportionment shuffles host-count-sized
    data, and the two scalar aggregates broadcast."""
    from ocr_platform_spark.operators.bursts import burst_segments

    e = _t(spark, sf_dir, "events")
    ev = e.select(
        F.concat(F.lit("site-"), (F.col("user_id") % 40).cast("string")).alias("host"),
        (
            F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
            + F.hour("ts")
            + 1
        )
        .cast("long")
        .alias("t"),
    )
    tn = ev.agg(F.max("t").alias("tn"))
    grid = (
        ev.select("host")
        .distinct()
        .crossJoin(F.broadcast(tn))
        .select("host", F.explode(F.sequence(F.lit(1).cast("long"), F.col("tn"))).alias("t"))
    )
    cnt = ev.groupBy("host", "t").agg(F.count("*").alias("n"))
    hid = F.substring("host", 6, 10).cast("long")
    kk0 = grid.join(cnt, ["host", "t"], "left").select(
        "host",
        "t",
        (
            F.coalesce("n", F.lit(0))
            + F.when((hid % 7 == 0) & (F.col("t") % 13 < 3), F.lit(9)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("k"),
    )
    params = kk0.groupBy("host").agg(
        F.expr("sum(k) div count(*)").alias("r0"),
        F.expr("2 * (sum(k) div count(*)) + 1").alias("r1"),
        F.expr("greatest(2 * (sum(k) div count(*)), 2)").alias("gamma"),
    )
    kk = kk0.join(F.broadcast(params), "host")
    seg = burst_segments(kk, key_col="host", t_col="t", k_col="k")
    share = seg.groupBy("host").agg(
        F.expr(
            "cast((1000 * count(case when in_burst then 1 end)) div count(*) as bigint)"
        ).alias("burst_share_pm")
    )
    d = _t(spark, sf_dir, "documents")
    q1000 = F.round(TX.quality_score("text") * 1000).cast("long")
    m = (
        d.select(
            F.concat(F.lit("site-"), (F.col("doc_id") % 40).cast("string")).alias("host"),
            q1000.alias("q_x1000"),
        )
        .groupBy("host")
        .agg(F.sum("q_x1000").cast("long").alias("mass"))
        .join(F.broadcast(share), "host", "left")
        .select(
            "host",
            "mass",
            F.coalesce("burst_share_pm", F.lit(0)).cast("long").alias("burst_share_pm"),
        )
        .withColumn(
            "boosted", F.expr("cast(mass * (1000 + burst_share_pm) div 1000 as bigint)")
        )
    )
    total = m.agg(F.sum("boosted").cast("long").alias("total"))
    b2 = m.crossJoin(F.broadcast(total)).select(
        "host",
        "mass",
        "burst_share_pm",
        "boosted",
        F.expr("(1000 * boosted) div total").alias("base"),
        F.pmod(F.lit(1000) * F.col("boosted"), F.col("total")).alias("rem"),
    )
    leftover = b2.agg((F.lit(1000) - F.sum("base")).cast("long").alias("leftover"))
    w = Window.orderBy(F.desc("rem"), F.asc("host"))
    slots = F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return (
        b2.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            "host",
            "mass",
            "burst_share_pm",
            "boosted",
            slots.cast("long").alias("slots"),
            F.least(slots, F.lit(120)).cast("long").alias("capped_slots"),
        )
        .orderBy("host")
    )


def _cdx_oracle() -> str:
    from ocr_platform_spark.functions.urlfns import surt_sql
    from ocr_platform_spark.operators.sampling import oracle_bucket_sql

    return f"""
    WITH caps AS (
      SELECT doc_id, text, cap,
             CASE WHEN cap = 0
               THEN 'HTTPS://WWW.Site-' || CAST(doc_id % 24 AS VARCHAR)
                    || '.Example.org/Doc/' || CAST(doc_id AS VARCHAR)
                    || '?b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1'
               ELSE 'https://site-' || CAST(doc_id % 24 AS VARCHAR)
                    || '.example.org:443/doc/' || CAST(doc_id AS VARCHAR)
                    || '?a=1&b=' || CAST(doc_id % 3 AS VARCHAR)
             END AS url,
             '202401' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
               || lpad(CAST((doc_id + cap * 7) % 24 AS VARCHAR), 2, '0') || '0000'
               AS ts
      FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS cap)
    ),
    rec AS (
      SELECT {surt_sql("url")} AS surt, ts,
             md5(text) AS digest, CAST(length(text) AS BIGINT) AS rec_len,
             doc_id, cap
      FROM caps
    ),
    sharded AS (
      SELECT *, CAST({oracle_bucket_sql("surt", 4)} AS BIGINT) AS shard FROM rec
    ),
    laid AS (
      SELECT surt, ts, digest, rec_len, shard,
             CAST(COALESCE(SUM(rec_len) OVER (
               PARTITION BY shard ORDER BY surt, ts, doc_id, cap
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS rec_offset
      FROM sharded
    )
    SELECT surt, ts, digest, rec_len, shard, rec_offset
    FROM laid ORDER BY shard, rec_offset, surt, ts
    """


@q("cdx_index", _cdx_oracle())
def cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture-index construction — the artifact every WARC archive
    ships beside its payloads (Common Crawl's cc-index): each capture
    keys by its SURT form (functions/urlfns.surt_key — host labels
    reversed so one host's, and one registered domain's, captures are
    CONTIGUOUS under plain lexicographic order, which is what makes
    binary-searchable shards and domain prefix-scans work), secondary-
    sorted by timestamp, md5-bucketed into shards, and laid out with
    exact per-record byte offsets via an exclusive running sum within
    the shard — the (filename, offset, length) triple a replay service
    seeks by. Two captures per url with scheme/case/port/param-order
    variants land on ONE surt key (the normalization is the point). The
    SURT rule set is a single source with a DuckDB twin (dialect parity
    pinned in tests/test_urlfns.py over adversarial urls); ts strings
    are pure lpad arithmetic; the whole index replays staging-free from
    raw parquet. The only wide operation is the per-shard window over
    key-sorted records — shard-partitioned, never a global sort."""
    from ocr_platform_spark.functions.urlfns import surt_key
    from ocr_platform_spark.operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    caps = d.crossJoin(
        spark.range(2).select(F.col("id").cast("int").alias("cap"))
    ).select(
        "doc_id",
        "text",
        "cap",
        F.when(
            F.col("cap") == 0,
            F.concat(
                F.lit("HTTPS://WWW.Site-"), (F.col("doc_id") % 24).cast("string"),
                F.lit(".Example.org/Doc/"), did,
                F.lit("?b="), (F.col("doc_id") % 3).cast("string"), F.lit("&a=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://site-"), (F.col("doc_id") % 24).cast("string"),
                F.lit(".example.org:443/doc/"), did,
                F.lit("?a=1&b="), (F.col("doc_id") % 3).cast("string"),
            )
        )
        .alias("url"),
        F.concat(
            F.lit("202401"),
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            F.lpad(((F.col("doc_id") + F.col("cap") * 7) % 24).cast("string"), 2, "0"),
            F.lit("0000"),
        ).alias("ts"),
    )
    rec = caps.select(
        surt_key("url").alias("surt"),
        "ts",
        F.md5("text").alias("digest"),
        F.length("text").cast("long").alias("rec_len"),
        "doc_id",
        "cap",
    ).withColumn("shard", hash_bucket(F.col("surt"), 4).cast("long"))
    w = (
        Window.partitionBy("shard")
        .orderBy("surt", "ts", "doc_id", "cap")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rec.withColumn(
            "rec_offset", F.coalesce(F.sum("rec_len").over(w), F.lit(0)).cast("long")
        )
        .select("surt", "ts", "digest", "rec_len", "shard", "rec_offset")
        .orderBy("shard", "rec_offset", "surt", "ts")
    )


@q(
    "dedup_colocation_report",
    f"""
    WITH hs AS (SELECT * FROM read_parquet('{staged_glob("coloc_hs")}')),
    c AS (SELECT * FROM read_parquet('{staged_glob("coloc_cands")}')),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM c JOIN hs a ON c.id_a = a.id JOIN hs b ON c.id_b = b.id
      WHERE len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) > 0
        AND CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
            / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.5
    ),
    marked AS (
      SELECT v.id_a, v.id_b, sa.shard = sb.shard AS same_shard
      FROM verified v
      JOIN hs sa ON sa.id = v.id_a
      JOIN hs sb ON sb.id = v.id_b
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COUNT(CASE WHEN same_shard THEN 1 END) AS BIGINT) AS n_intra
      FROM marked
    ),
    ns AS (SELECT COUNT(DISTINCT shard) AS n_shards FROM hs)
    SELECT n_pairs, n_intra,
           CAST(CASE WHEN n_pairs > 0 THEN (1000 * n_intra) // n_pairs
                ELSE 0 END AS BIGINT) AS colocation_pm,
           CAST(1000 // n_shards AS BIGINT) AS random_baseline_pm
    FROM agg, ns
    """,
)
def dedup_colocation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-AWARE shard assignment, measured: route each document to
    the shard of its FIRST MinHash band hash, and near-duplicate pairs
    land in one shard at (roughly) the band's collision rate instead of
    the 1/n_shards random baseline — which is what lets dedup run
    SHARD-LOCALLY at 100 TB (per-shard exact verification, no
    corpus-wide pair shuffle; stragglers handled by the later bands).
    The report: of the verified near-dup pairs (exact Jaccard ≥ 0.5 over
    staged shingle sets, the minhash_near_dups tail), the per-mille
    co-located under band-sharding next to the 1000/n_shards baseline.
    Shard assignment is xxhash-side and rides the staged table; the
    oracle replays verification, the co-location join and both
    quotients. Everything pair-scoped is candidate-bounded."""
    d = _t(spark, sf_dir, "documents")
    hs_raw = dedup.hashed_shingle_sets(d, "doc_id", "text")
    sig = hs_raw.select(
        "id", "hs", dedup.minhash_signature_from_hashes("hs", 16).alias("sig")
    )
    banded_all = sig.select(
        "id",
        "hs",
        "sig",
        F.posexplode(dedup.minhash_bands("sig", 16, 2)).alias("band_id", "band_hash"),
    )
    hs = stage(
        banded_all.where(F.col("band_id") == 0).select(
            "id", "hs", F.pmod("band_hash", F.lit(8)).cast("long").alias("shard")
        ),
        "coloc_hs",
        partitions=8,
    )
    cands = stage(
        dedup._bucket_pairs(
            banded_all.select("id", "band_id", "band_hash"), "id", 64
        ),
        "coloc_cands",
    )
    sets_a = hs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("shard").alias("shard_a"))
    sets_b = hs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("shard").alias("shard_b"))
    j = cands.join(sets_a, "id_a").join(sets_b, "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size(F.array_union("hs_a", "hs_b"))
    verified = j.where(
        (union > 0) & (inter.cast("double") / union >= 0.5)
    ).select((F.col("shard_a") == F.col("shard_b")).alias("same_shard"))
    agg = verified.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.count(F.when(F.col("same_shard"), 1)).cast("long").alias("n_intra"),
    )
    ns = hs.agg(F.countDistinct("shard").alias("n_shards"))
    return agg.crossJoin(F.broadcast(ns)).select(
        "n_pairs",
        "n_intra",
        F.expr(
            "cast(case when n_pairs > 0 then (1000 * n_intra) div n_pairs else 0 end as bigint)"
        ).alias("colocation_pm"),
        F.expr("cast(1000 div n_shards as bigint)").alias("random_baseline_pm"),
    )


def _wet_cdx_oracle() -> str:
    from ocr_platform_spark.functions.urlfns import surt_sql

    return f"""
    WITH idx AS (SELECT * FROM read_parquet('{staged_glob("wetcdx_index")}')),
    laid AS (
      SELECT {surt_sql("url")} AS surt,
             strftime(wet_ts, '%Y%m%d%H%M%S') AS ts,
             shard, rec_len, rec_offset,
             CAST(COALESCE(SUM(rec_len) OVER (
               PARTITION BY shard ORDER BY url
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS computed_offset
      FROM idx
    )
    SELECT surt, ts, CAST(shard AS INT) AS shard, rec_len, rec_offset,
           rec_offset = computed_offset AS offset_ok
    FROM laid ORDER BY shard, rec_offset
    """


@q("wet_cdx_index", _wet_cdx_oracle())
def wet_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX over a REAL archive write — byte-true offsets, not layout
    algebra: the documents table flows through the indexed WET sink
    (sources/wet.write_wet_shards_indexed — executors write per-record
    gzip members and record each member's offset/length AS WRITTEN),
    and the index becomes a CDX with SURT keys and WARC-style
    timestamps. ``offset_ok`` cross-checks every recorded offset
    against the layout recomputation (exclusive running sum of member
    lengths in the shard's url order) — in BOTH engines, since the
    oracle replays the SURT transform, the timestamp render and the
    cumsum from the staged index; tests/test_wet.py additionally seeks
    the actual shard files at the recorded offsets and decompresses
    each member back to its url (the byte truth no SQL can see). The
    sink's in-shard url order and xxhash sharding make the files — and
    this index — byte-identical at any parallelism."""
    import os as _os

    from ocr_platform_spark.sources.wet import write_wet_shards_indexed
    from ocr_platform_spark.staging import STAGE_ROOT

    d = _t(spark, sf_dir, "documents")
    inp = d.select(
        F.concat(F.lit("https://"), "source", F.lit("/doc/"), "doc_id").alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") % 86400).alias("wet_ts"),
        "text",
    )
    archive = _os.path.join(STAGE_ROOT, "wetcdx_archive")
    idx = stage(
        write_wet_shards_indexed(inp, archive, n_shards=4).drop("path"),
        "wetcdx_index",
        partitions=2,
    )
    from ocr_platform_spark.functions.urlfns import surt_key

    w = (
        Window.partitionBy("shard")
        .orderBy("url")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        idx.withColumn(
            "computed_offset", F.coalesce(F.sum("rec_len").over(w), F.lit(0)).cast("long")
        )
        .select(
            surt_key("url").alias("surt"),
            F.date_format("wet_ts", "yyyyMMddHHmmss").alias("ts"),
            F.col("shard").cast("int").alias("shard"),
            "rec_len",
            "rec_offset",
            (F.col("rec_offset") == F.col("computed_offset")).alias("offset_ok"),
        )
        .orderBy("shard", "rec_offset")
    )


@q(
    "crawl_depth_labels",
    """
    WITH RECURSIVE raw AS (
      SELECT doc_id % 40 AS src, (doc_id % 40 + 1 + doc_id % 13) % 40 AS dst
      FROM documents WHERE doc_id % 9 = 0
      UNION ALL
      SELECT doc_id % 40, (doc_id % 40 + 17) % 40
      FROM documents WHERE doc_id % 21 = 0
    ),
    e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
    nodes AS (
      SELECT DISTINCT n FROM (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)
    ),
    walk AS (
      SELECT n AS id, CAST(0 AS BIGINT) AS dist FROM nodes WHERE n IN (0, 9)
      UNION ALL
      SELECT e.dst, w.dist + 1
      FROM walk w JOIN e ON e.src = w.id
      WHERE w.dist < 6
    ),
    best AS (SELECT id, MIN(dist) AS dist FROM walk GROUP BY id)
    SELECT 'h' || CAST(nodes.n AS VARCHAR) AS host,
           CAST(COALESCE(best.dist, -1) AS BIGINT) AS dist
    FROM nodes LEFT JOIN best ON best.id = nodes.n
    ORDER BY host
    """,
)
def crawl_depth_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS crawl-depth labeling (operators/linkgraph.
    seed_distances): hop distance from the seed set over the directed
    host graph — the budget axis frontier policies cut on (pages N hops
    from any trusted seed get shallower crawls; unreachable islands,
    dist = -1, get none). The same monotone join+agg loop as connected
    components with a +1 increment: distances only decrease, so a fixed
    6-hop budget replays bit-exactly — Spark iterates with per-iteration
    lineage truncation, the oracle walks a depth-capped recursive CTE
    over the SAME deterministically derived graph (staging-free) and
    takes per-node minima. The graph is doc-arithmetic (sparse ring
    jumps + long chords) so both reachable shells and unreachable
    islands exist at sf0.01."""
    from ocr_platform_spark.operators.linkgraph import seed_distances

    d = _t(spark, sf_dir, "documents").select("doc_id")
    h = F.col("doc_id") % 40
    raw = (
        d.where(F.col("doc_id") % 9 == 0)
        .select(h.alias("src"), ((h + 1 + F.col("doc_id") % 13) % 40).alias("dst"))
        .unionAll(
            d.where(F.col("doc_id") % 21 == 0).select(
                h.alias("src"), ((h + 17) % 40).alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
    )
    seeds = spark.createDataFrame([(0,), (9,)], "host long")
    return (
        seed_distances(raw, seeds, "src", "dst", "host", iterations=6)
        .select(
            F.concat(F.lit("h"), F.col("host").cast("string")).alias("host"), "dist"
        )
        .orderBy("host")
    )


@q(
    "dedup_cluster_purity",
    f"""
    WITH RECURSIVE
    hs AS (SELECT * FROM read_parquet('{staged_glob("purity_hs")}')),
    p AS (SELECT * FROM read_parquet('{staged_glob("purity_pairs")}')),
    n AS (SELECT DISTINCT id FROM
          (SELECT id_a AS id FROM p UNION ALL SELECT id_b AS id FROM p)),
    e AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION ALL SELECT id_b, id_a FROM p
      UNION ALL SELECT id, id FROM n
    ),
    lab AS (
      SELECT 0 AS it, id, id AS comp FROM n
      UNION ALL
      SELECT l.it + 1, e.src AS id, MIN(l.comp) AS comp
      FROM lab l JOIN e ON e.dst = l.id
      WHERE l.it < {_CC_ITER}
      GROUP BY l.it, e.src
    ),
    fin AS (SELECT id, comp FROM lab WHERE it = {_CC_ITER}),
    capped AS (
      SELECT id, comp FROM (
        SELECT *, row_number() OVER (PARTITION BY comp ORDER BY id) AS rk
        FROM fin
      ) WHERE rk <= 16
    ),
    intra AS (
      SELECT a.comp, a.id AS id_a, b.id AS id_b
      FROM capped a JOIN capped b ON a.comp = b.comp AND a.id < b.id
    ),
    jac AS (
      SELECT i.comp,
             CASE WHEN len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)) > 0
                  THEN CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
                       / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
                  ELSE 0.0 END AS j
      FROM intra i JOIN hs ha ON ha.id = i.id_a JOIN hs hb ON hb.id = i.id_b
    ),
    per AS (
      SELECT comp, COUNT(*) AS n_pairs, MIN(j) AS min_jaccard FROM jac GROUP BY comp
    ),
    sz AS (SELECT comp, COUNT(*) AS n_docs FROM fin GROUP BY comp)
    SELECT sz.comp AS cluster_id, CAST(sz.n_docs AS BIGINT) AS n_docs,
           CAST(per.n_pairs AS BIGINT) AS n_pairs_checked,
           per.min_jaccard,
           per.min_jaccard < 0.5 AS is_chained
    FROM sz JOIN per ON per.comp = sz.comp
    WHERE sz.n_docs >= 2
    ORDER BY cluster_id
    """,
)
def dedup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster PURITY audit — the quality check transitive closure makes
    necessary: chaining A~B~C collapses documents into one cluster even
    when A and C were never similar, so aggressive thresholds silently
    delete non-duplicates. Pairs are generated at a PERMISSIVE 0.3
    Jaccard (chains form), components close the clusters, and then every
    intra-cluster pair among each cluster's first 16 members (the
    deterministic cap that bounds the quadratic corner on spam
    mega-clusters) is re-verified with exact Jaccard: clusters whose
    MINIMUM pair similarity falls below the 0.5 keeper threshold flag
    ``is_chained`` — the clusters a production pass should split or
    re-verify before deleting. A planted sliding-window A~B~C chain
    (adjacent overlap ~0.49, ends 0.18) exercises the flag; the
    corpus's organic clusters are all tight (min ≥ 0.9). The oracle replays the component
    recurrence (recursive CTE), the cap, every pairwise Jaccard and the
    per-cluster minimum from the staged shingle sets and pair list."""
    from ocr_platform_spark.operators.linkgraph import connected_components

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # planted A~B~C chain: adjacent overlap ~1/3 (pairs at the permissive
    # threshold) but ends disjoint -> the closure clusters them and the
    # audit must flag the cluster as chained
    words = [f"chainword{i:03d}" for i in range(150)]
    chain = spark.createDataFrame(
        [
            (920001, " ".join(words[0:60])),
            (920002, " ".join(words[20:80])),
            (920003, " ".join(words[40:100])),
        ],
        "doc_id long, text string",
    )
    d = d.unionByName(chain)
    hs = stage(
        dedup.hashed_shingle_sets(d, "doc_id", "text"), "purity_hs", partitions=8
    )
    sig = hs.select("id", dedup.minhash_signature_from_hashes("hs", 16).alias("sig"))
    banded = sig.select(
        "id", F.posexplode(dedup.minhash_bands("sig", 16, 2)).alias("band_id", "band_hash")
    )
    cands = dedup._bucket_pairs(banded, "id", 64)
    sets_df = hs.withColumnRenamed("hs", "sh")
    j = (
        cands.join(sets_df.withColumnRenamed("sh", "sh_a"), cands.id_a == sets_df.id)
        .drop("id")
        .join(
            sets_df.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    pairs = stage(
        j.where((union > 0) & (inter.cast("double") / union >= 0.3)).select(
            "id_a", "id_b"
        ),
        "purity_pairs",
    )
    comp = connected_components(pairs, iterations=_CC_ITER)
    capped = (
        comp.withColumn(
            "rk", F.row_number().over(Window.partitionBy("comp").orderBy("id"))
        )
        .where(F.col("rk") <= 16)
        .select("comp", "id")
    )
    a = capped.select(F.col("comp"), F.col("id").alias("id_a"))
    b = capped.select(F.col("comp").alias("comp_b"), F.col("id").alias("id_b"))
    intra = a.join(
        b, (a.comp == F.col("comp_b")) & (F.col("id_a") < F.col("id_b"))
    ).select("comp", "id_a", "id_b")
    jj = (
        intra.join(sets_df.withColumnRenamed("sh", "sh_a"), intra.id_a == sets_df.id)
        .drop("id")
        .join(
            sets_df.withColumnRenamed("sh", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    jv = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    per = jj.select("comp", jv.alias("j")).groupBy("comp").agg(
        F.count("*").alias("n_pairs_checked"), F.min("j").alias("min_jaccard")
    )
    sz = comp.groupBy("comp").agg(F.count("*").alias("n_docs"))
    return (
        sz.where(F.col("n_docs") >= 2)
        .join(per, "comp")
        .select(
            F.col("comp").alias("cluster_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_pairs_checked").cast("long").alias("n_pairs_checked"),
            "min_jaccard",
            (F.col("min_jaccard") < 0.5).alias("is_chained"),
        )
        .orderBy("cluster_id")
    )


@q(
    "event_burst_transitions",
    """
    WITH RECURSIVE ev AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) * 24
                  + EXTRACT(hour FROM ts) + 1 AS BIGINT) AS t
      FROM events
    ),
    nmax AS (SELECT MAX(t) AS tn FROM ev),
    grid AS (
      SELECT et.event_type, CAST(unnest(generate_series(1, nmax.tn)) AS BIGINT) AS t
      FROM (SELECT DISTINCT event_type FROM ev) et, nmax
    ),
    cnt AS (SELECT event_type, t, COUNT(*) AS n FROM ev GROUP BY 1, 2),
    kk AS MATERIALIZED (
      SELECT g.event_type, g.t,
             CAST(COALESCE(c.n, 0)
                  + CASE WHEN g.event_type = 'click' AND g.t % 17 < 5
                         THEN 12 ELSE 0 END AS BIGINT) AS k
      FROM grid g LEFT JOIN cnt c ON c.event_type = g.event_type AND c.t = g.t
    ),
    walk AS (
      -- t=1 from the initial (False, 0) state: a single hot hour can
      -- never reach enter_runs=2, so in_burst stays false
      SELECT k.event_type, k.t, FALSE AS in_burst,
             CAST(CASE WHEN k.k >= 8 THEN 1 ELSE 0 END AS INT) AS run,
             CAST(NULL AS VARCHAR) AS kind
      FROM kk k WHERE k.t = 1
      UNION ALL
      SELECT k.event_type, k.t,
             CASE
               WHEN NOT w.in_burst
                 THEN (CASE WHEN k.k >= 8 THEN w.run + 1 ELSE 0 END) >= 2
               ELSE NOT ((CASE WHEN k.k < 4 THEN w.run + 1 ELSE 0 END) >= 2)
             END,
             CASE
               WHEN NOT w.in_burst THEN
                 CASE WHEN (CASE WHEN k.k >= 8 THEN w.run + 1 ELSE 0 END) >= 2
                      THEN 0 ELSE (CASE WHEN k.k >= 8 THEN w.run + 1 ELSE 0 END) END
               ELSE
                 CASE WHEN (CASE WHEN k.k < 4 THEN w.run + 1 ELSE 0 END) >= 2
                      THEN 0 ELSE (CASE WHEN k.k < 4 THEN w.run + 1 ELSE 0 END) END
             END,
             CASE
               WHEN NOT w.in_burst
                    AND (CASE WHEN k.k >= 8 THEN w.run + 1 ELSE 0 END) >= 2
                 THEN 'enter'
               WHEN w.in_burst
                    AND (CASE WHEN k.k < 4 THEN w.run + 1 ELSE 0 END) >= 2
                 THEN 'exit'
             END
      FROM walk w JOIN kk k ON k.event_type = w.event_type AND k.t = w.t + 1
    )
    SELECT event_type AS key, t, kind
    FROM walk WHERE kind IS NOT NULL
    ORDER BY key, t
    """,
)
def event_burst_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hysteresis burst detector's BATCH anchor (streaming/bursts.py):
    enter after 2 consecutive hours at count ≥ 8, exit after 2
    consecutive below 4 — the two-threshold rule an online crawler
    actually reacts with (the optimal-DP entry is the offline yardstick;
    this is its streamable cousin, and tests/test_streaming_bursts.py
    pins the applyInPandasWithState face transition-for-transition equal
    to this fold across arbitrary micro-batch splits). Series and
    planted surge are the event_burst_segments grid; the fold is a
    per-key python pass over hours-count-sized groups, and the oracle
    replays the EXACT (in_burst, run) state machine one hour at a time
    in a recursive CTE from raw parquet — staging-free."""
    from ocr_platform_spark.streaming.bursts import burst_transitions_batch

    e = _t(spark, sf_dir, "events")
    ev = e.select(
        "event_type",
        (
            F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")) * 24
            + F.hour("ts")
            + 1
        )
        .cast("long")
        .alias("t"),
    )
    tn = ev.agg(F.max("t").alias("tn"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(tn))
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("tn"))).alias("t"),
        )
    )
    cnt = ev.groupBy("event_type", "t").agg(F.count("*").alias("n"))
    kk = grid.join(cnt, ["event_type", "t"], "left").select(
        F.col("event_type").alias("key"),
        "t",
        (
            F.coalesce("n", F.lit(0))
            + F.when(
                (F.col("event_type") == "click") & (F.col("t") % 17 < 5), F.lit(12)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("k"),
    )
    return burst_transitions_batch(kk).orderBy("key", "t")


def _spam_blocklist_ctes(glob: str) -> str:
    """DuckDB CTE chain replaying operators/linkgraph.spam_host_blocklist
    over a staged (src_url, dst_url) edge table — coupling farm pairs,
    oriented triangle clustering, and the OR-fusion inputs. ONE source of
    truth for every oracle that consumes the blocklist
    (``host_spam_blocklist``, ``corpus_spam_gate_report``); ends at
    ``farm`` + ``tri_stats`` so callers pick their own projection."""
    return f"""e AS (
      SELECT DISTINCT
             regexp_extract(src_url, '^https?://([^/?#]+)', 1) AS src_host,
             regexp_extract(dst_url, '^https?://([^/?#]+)', 1) AS dst_host,
             dst_url
      FROM read_parquet('{glob}')
      WHERE regexp_extract(src_url, '^https?://([^/?#]+)', 1)
            <> regexp_extract(dst_url, '^https?://([^/?#]+)', 1)
    ),
    outs AS (SELECT DISTINCT src_host, dst_url FROM e),
    osz AS (SELECT src_host, COUNT(*) AS n FROM outs GROUP BY src_host),
    coup AS (
      SELECT a.src_host AS host_a, b.src_host AS host_b, COUNT(*) AS n_shared
      FROM outs a JOIN outs b ON a.dst_url = b.dst_url AND a.src_host < b.src_host
      GROUP BY 1, 2
    ),
    farm AS (
      SELECT host FROM (
        SELECT c.host_a AS host FROM coup c
        JOIN osz sa ON sa.src_host = c.host_a JOIN osz sb ON sb.src_host = c.host_b
        WHERE c.n_shared >= 10
          AND (1000 * c.n_shared) // (sa.n + sb.n - c.n_shared) >= 600
        UNION ALL
        SELECT c.host_b FROM coup c
        JOIN osz sa ON sa.src_host = c.host_a JOIN osz sb ON sb.src_host = c.host_b
        WHERE c.n_shared >= 10
          AND (1000 * c.n_shared) // (sa.n + sb.n - c.n_shared) >= 600
      ) GROUP BY host
    ),
    und AS (
      SELECT DISTINCT least(src_host, dst_host) AS u, greatest(src_host, dst_host) AS v
      FROM e
    ),
    deg AS (
      SELECT h, COUNT(*) AS degree FROM (
        SELECT u AS h FROM und UNION ALL SELECT v FROM und
      ) GROUP BY h
    ),
    o AS (
      SELECT CASE WHEN (da.degree, und.u) < (db.degree, und.v)
                  THEN und.u ELSE und.v END AS x,
             CASE WHEN (da.degree, und.u) < (db.degree, und.v)
                  THEN und.v ELSE und.u END AS y
      FROM und JOIN deg da ON da.h = und.u JOIN deg db ON db.h = und.v
    ),
    tris AS (
      SELECT w.w_a, w.w_b, w.w_c
      FROM (SELECT o1.x AS w_a, o1.y AS w_b, o2.y AS w_c
            FROM o o1 JOIN o o2 ON o2.x = o1.y) w
      JOIN o o3 ON o3.x = w.w_a AND o3.y = w.w_c
    ),
    per AS (
      SELECT h, COUNT(*) AS n_triangles FROM (
        SELECT w_a AS h FROM tris UNION ALL SELECT w_b FROM tris
        UNION ALL SELECT w_c FROM tris
      ) GROUP BY h
    ),
    tri_stats AS (
      SELECT deg.h AS host, deg.degree,
             CASE WHEN deg.degree >= 2
               THEN (2000 * COALESCE(per.n_triangles, 0))
                    // (deg.degree * (deg.degree - 1))
               ELSE 0 END AS clustering_x1000
      FROM deg LEFT JOIN per ON per.h = deg.h
    )"""


@q(
    "host_spam_blocklist",
    f"""
    WITH {_spam_blocklist_ctes(staged_glob("blocklist_edges"))}
    SELECT t.host,
           CAST(t.degree AS BIGINT) AS degree,
           CAST(t.clustering_x1000 AS BIGINT) AS clustering_x1000,
           f.host IS NOT NULL AS farm_coupled,
           t.degree >= 3 AND t.clustering_x1000 >= 800 AS clique_dense,
           (f.host IS NOT NULL) OR (t.degree >= 3 AND t.clustering_x1000 >= 800)
             AS is_blocked
    FROM tri_stats t LEFT JOIN farm f ON f.host = t.host
    ORDER BY t.host
    """,
)
def host_spam_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational HOST BLOCKLIST — two independent spam geometries
    fused into the verdict table a crawler actually consumes: (a)
    bibliographic-coupling farm pairs (≥ 10 shared outlink urls at
    Jaccard ≥ 0.6 — host_link_farm_pairs' gate) and (b) near-clique
    interlinking (local clustering ≥ 0.8 at degree ≥ 3 —
    host_triangle_stats' orientation-counted triangles), computed from
    ONE shared edge list so the signals can't drift apart. The synthetic
    graph plants a 3-host farm pushing a 20-url slate (trips coupling, a
    star — zero triangles), a 4-host interlinked clique with distinct
    per-pair landing pages (trips clique density, no shared-target
    coupling), and organic sparse links (trips neither) — each signal
    catches the geometry the other is blind to. Staged edges are the
    only boundary; the oracle replays both chains and the OR-fusion.
    Both signal chains live in operators/linkgraph.spam_host_blocklist —
    the same implementation the curation funnel's spam gate consumes
    (plans/pipeline.corpus_refine_stages)."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        spam_host_blocklist,
    )

    organic = extract_outlinks(_synth_docs(spark)).select("src_url", "dst_url")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    promo = d.where(F.col("doc_id") < 20).select(
        F.concat(
            F.lit("https://promo-"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.org/offer/"), F.col("doc_id").cast("string"),
        ).alias("dst_url")
    )
    farm = promo.crossJoin(
        spark.range(3).select(
            F.concat(F.lit("https://farm-"), F.col("id").cast("string"), F.lit(".example.biz/page"))
            .alias("src_url")
        )
    ).select("src_url", "dst_url")
    # 4-host clique: every ordered pair links to a pair-specific page, so
    # no two clique members share an outlink target (coupling-blind) but
    # the host graph is K4 (clustering 1000)
    ids = spark.range(4).select(F.col("id").alias("a")).crossJoin(
        spark.range(4).select(F.col("id").alias("b"))
    ).where(F.col("a") != F.col("b"))
    clique = ids.select(
        F.concat(F.lit("https://ring-"), F.col("a").cast("string"), F.lit(".example.net/out")).alias("src_url"),
        F.concat(
            F.lit("https://ring-"), F.col("b").cast("string"),
            F.lit(".example.net/land/"), F.col("a").cast("string"),
        ).alias("dst_url"),
    )
    edges = stage(
        organic.unionByName(farm).unionByName(clique), "blocklist_edges", partitions=4
    )
    return spam_host_blocklist(edges).orderBy("host")


@q(
    "corpus_spam_gate_report",
    f"""
    WITH {_spam_blocklist_ctes(staged_glob("spamgate_edges"))},
    blocked AS (
      SELECT t.host FROM tri_stats t LEFT JOIN farm f ON f.host = t.host
      WHERE f.host IS NOT NULL
         OR (t.degree >= 3 AND t.clustering_x1000 >= 800)
    ),
    docs AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 10 = 0
                    THEN 'https://farm-' || CAST(doc_id % 3 AS VARCHAR)
                         || '.example.biz/p/' || CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 10 = 5
                    THEN 'https://ring-' || CAST(doc_id % 4 AS VARCHAR)
                         || '.example.net/p/' || CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 10 = 7
                    THEN 'https://promo-' || CAST(doc_id % 4 AS VARCHAR)
                         || '.example.org/offer/' || CAST(doc_id AS VARCHAR)
                  ELSE 'https://site-' || CAST(doc_id % 40 AS VARCHAR)
                       || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
             END AS url
      FROM documents
    ),
    dh AS (
      SELECT doc_id, text,
             regexp_extract(url, '^https?://([^/?#]+)', 1) AS host
      FROM docs
    ),
    kept AS (
      SELECT doc_id, text FROM dh
      WHERE host NOT IN (SELECT host FROM blocked)
    ),
    split2 AS (
      SELECT doc_id, string_split_regex(text, '\\n{{2,}}') AS ps FROM kept
    ),
    paras AS (
      SELECT doc_id, CAST(i - 1 AS INT) AS idx, ps[i] AS para
      FROM (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i FROM split2)
      WHERE length(ps[i]) >= 1
    ),
    toks AS (
      SELECT doc_id, idx,
             CAST(len(list_filter(string_split_regex(para, '\s+'), x -> x <> ''))
                  AS BIGINT) AS tok
      FROM paras
    ),
    cum AS (
      SELECT doc_id, idx, tok,
             COALESCE(SUM(tok) OVER (PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM toks
    ),
    chunkcnt AS (
      SELECT COUNT(*) AS n FROM (
        SELECT doc_id, cum_before // 40 AS cid FROM cum GROUP BY doc_id, cum_before // 40
      )
    )
    SELECT CAST(stage_no AS INT) AS stage_no, stage, CAST(n AS BIGINT) AS n
    FROM (
      VALUES (0, 'input',         (SELECT COUNT(*) FROM docs)),
             (1, 'spam_gate',     (SELECT COUNT(*) FROM kept)),
             (2, 'chunks',        (SELECT n FROM chunkcnt)),
             (3, 'blocked_hosts', (SELECT COUNT(*) FROM blocked))
    ) AS v(stage_no, stage, n)
    ORDER BY stage_no
    """,
)
def corpus_spam_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The host spam BLOCKLIST as a curation-funnel stage
    (plans/pipeline.corpus_refine_stages ``spam_blocklist=...`` — the way
    the spam-mass gate works), oracle-verified as a funnel: documents get
    deterministic urls (every 10th doc on a planted farm host, every
    10th+5 on a clique host, every 10th+7 on a PROMO host — a spam
    *target* that must NOT be blocked, the overfire check — rest on clean
    site hosts) → the spam gate drops docs whose url host the fused
    coupling/clique blocklist (operators/linkgraph.spam_host_blocklist,
    the r4-green ``host_spam_blocklist`` implementation, same planted
    edge graph) marks blocked → paragraph chunking of the survivors
    (40-token budget). The oracle replays the whole coupling + oriented-
    triangle chain from the staged edges AND the url synthesis/host gate
    from the raw parquet; stage counts plus the blocked-host count are
    cross-engine checked. The gate itself is a broadcast anti-join on a
    host-count-sized verdict table — no corpus shuffle."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        spam_host_blocklist,
    )
    from ocr_platform_spark.plans.pipeline import corpus_refine_stages

    organic = extract_outlinks(_synth_docs(spark)).select("src_url", "dst_url")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    promo = d.where(F.col("doc_id") < 20).select(
        F.concat(
            F.lit("https://promo-"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.org/offer/"), F.col("doc_id").cast("string"),
        ).alias("dst_url")
    )
    farm = promo.crossJoin(
        spark.range(3).select(
            F.concat(F.lit("https://farm-"), F.col("id").cast("string"),
                     F.lit(".example.biz/page")).alias("src_url")
        )
    ).select("src_url", "dst_url")
    ids = spark.range(4).select(F.col("id").alias("a")).crossJoin(
        spark.range(4).select(F.col("id").alias("b"))
    ).where(F.col("a") != F.col("b"))
    clique = ids.select(
        F.concat(F.lit("https://ring-"), F.col("a").cast("string"),
                 F.lit(".example.net/out")).alias("src_url"),
        F.concat(
            F.lit("https://ring-"), F.col("b").cast("string"),
            F.lit(".example.net/land/"), F.col("a").cast("string"),
        ).alias("dst_url"),
    )
    edges = stage(
        organic.unionByName(farm).unionByName(clique), "spamgate_edges", partitions=4
    )
    blocklist = spam_host_blocklist(edges)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit("https://farm-"), (F.col("doc_id") % 3).cast("string"),
                     F.lit(".example.biz/p/"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 10 == 5,
            F.concat(F.lit("https://ring-"), (F.col("doc_id") % 4).cast("string"),
                     F.lit(".example.net/p/"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 10 == 7,
            F.concat(F.lit("https://promo-"), (F.col("doc_id") % 4).cast("string"),
                     F.lit(".example.org/offer/"), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("https://site-"), (F.col("doc_id") % 40).cast("string"),
                     F.lit(".example.com/doc/"), F.col("doc_id").cast("string"))
        )
        .alias("url"),
    )
    _, _, metrics = corpus_refine_stages(
        docs, spam_blocklist=blocklist, url_col="url", chunk_budget=40
    )
    n0 = docs.count()
    n1 = n0 - metrics["spam_gate_dropped"]
    n_blocked = blocklist.where(F.col("is_blocked")).count()
    rows = [
        (0, "input", n0),
        (1, "spam_gate", n1),
        (2, "chunks", metrics["n_chunks"]),
        (3, "blocked_hosts", n_blocked),
    ]
    return spark.createDataFrame(rows, "stage_no int, stage string, n bigint")


_PRD_ITER = 6


@q(
    "host_pagerank_delta",
    f"""
    WITH RECURSIVE
    b AS (SELECT src_host, dst_host FROM read_parquet('{staged_glob("prd_base")}')),
    ra AS (SELECT src_host, dst_host FROM read_parquet('{staged_glob("prd_add")}')),
    rm AS (SELECT src_host, dst_host FROM read_parquet('{staged_glob("prd_rm")}')),
    e AS MATERIALIZED (
      SELECT b.src_host, b.dst_host FROM b
      WHERE NOT EXISTS (SELECT 1 FROM rm
                        WHERE rm.src_host = b.src_host AND rm.dst_host = b.dst_host)
      UNION ALL
      SELECT src_host, dst_host FROM ra
    ),
    deg AS MATERIALIZED (SELECT src_host, COUNT(*) AS out_deg FROM e GROUP BY src_host),
    hosts AS MATERIALIZED (SELECT DISTINCT host FROM
              (SELECT src_host AS host FROM e UNION ALL SELECT dst_host AS host FROM e)),
    e2 AS MATERIALIZED (
      SELECT src_host, dst_host, FALSE AS phantom FROM e
      UNION ALL
      SELECT host, host, TRUE FROM hosts
    ),
    pr AS (
      SELECT 0 AS it, host,
             CAST(CAST({_PR_SCALE} AS BIGINT) // (SELECT COUNT(*) FROM hosts) AS BIGINT) AS rank
      FROM hosts
      UNION ALL
      SELECT p.it + 1, e2.dst_host AS host,
             CAST( ((CAST({100 - _PR_DAMP} AS BIGINT) * {_PR_SCALE}) // 100)
                     // (SELECT COUNT(*) FROM hosts)
                   + (CAST({_PR_DAMP} AS BIGINT)
                      * SUM(CASE WHEN e2.phantom THEN CAST(0 AS BIGINT)
                                 ELSE p.rank // d.out_deg END)) // 100
               AS BIGINT) AS rank
      FROM pr p
      JOIN e2 ON e2.src_host = p.host
      LEFT JOIN deg d ON d.src_host = p.host
      WHERE p.it < {_PRD_ITER}
      GROUP BY p.it, e2.dst_host
    )
    SELECT host, rank FROM pr WHERE it = {_PRD_ITER} ORDER BY rank DESC, host
    """,
)
def host_pagerank_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL PageRank (operators/linkgraph.host_pagerank_delta —
    ROADMAP 6e): a recrawl's edge delta (staged adds: reversed existing
    pairs; staged removals: pairs guarded so no host vanishes) is folded
    into the previous run's persisted per-iteration rank ladder
    (host_pagerank_states), recomputing per iteration ONLY the delta's
    reachable cone — per-iteration edge work is the i-hop out-
    neighbourhood of the changed sources, not the whole graph. The oracle
    recomputes the SAME fixed-point-free integer recurrence FROM SCRATCH
    over the post-delta edge set with a recursive CTE: a hash match
    proves delta-maintained ranks ≡ full recompute bit-for-bit, the
    differential-correctness contract of delta-push maintenance.
    Exactness of the incremental path (no silent fallback) is pinned in
    tests/test_links.py; the vertex-set-drift fallback is tested there
    too."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        host_edges,
        host_pagerank_delta,
        host_pagerank_states,
    )

    docs = _synth_docs(spark)
    base = stage(host_edges(extract_outlinks(docs)), "prd_base", partitions=4)
    dp = base.select("src_host", "dst_host").distinct()
    cnt = (
        dp.select(F.col("src_host").alias("host"))
        .unionAll(dp.select(F.col("dst_host").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("c"))
    )
    guarded = (
        dp.join(
            cnt.select(F.col("host").alias("src_host"), F.col("c").alias("_cs")),
            "src_host",
        )
        .join(
            cnt.select(F.col("host").alias("dst_host"), F.col("c").alias("_cd")),
            "dst_host",
        )
        .where(
            (F.col("_cs") >= 3)
            & (F.col("_cd") >= 3)
            & (F.pmod(F.xxhash64("src_host", "dst_host"), F.lit(5)) == 0)
        )
    )
    w_src = Window.partitionBy("src_host").orderBy("dst_host")
    w_dst = Window.partitionBy("dst_host").orderBy("src_host")
    removed = stage(
        guarded.withColumn("_rs", F.row_number().over(w_src))
        .where(F.col("_rs") == 1)
        .withColumn("_rd", F.row_number().over(w_dst))
        .where(F.col("_rd") == 1)
        .select("src_host", "dst_host"),
        "prd_rm",
        partitions=1,
    )
    added = stage(
        dp.select(
            F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
        )
        .join(dp, ["src_host", "dst_host"], "left_anti")
        .where(F.pmod(F.xxhash64("src_host", "dst_host"), F.lit(7)) == 0),
        "prd_add",
        partitions=1,
    )
    states = host_pagerank_states(base, iterations=_PRD_ITER)
    return host_pagerank_delta(base, states, added=added, removed=removed)


@q(
    "recrawl_rank_maintenance",
    f"""
    WITH RECURSIVE
    prevu AS (SELECT src_url, dst_url FROM read_parquet('{staged_glob("rcm_prev")}')),
    ch AS (
      SELECT substr(md5(dst_url), 1, 2) AS _b, src_url, dst_url
      FROM prevu WHERE substr(md5(src_url), 1, 1) IN ('0', '1', '2')
    ),
    keep AS (
      SELECT src_url, dst_url FROM prevu
      WHERE substr(md5(src_url), 1, 1) NOT IN ('0', '1', '2')
    ),
    chn AS (
      SELECT _b, src_url, dst_url,
             ROW_NUMBER() OVER (PARTITION BY _b ORDER BY src_url, dst_url) AS _rn,
             COUNT(*) OVER (PARTITION BY _b) AS _n
      FROM ch
    ),
    rot AS (
      SELECT l.src_url, r.dst_url
      FROM chn l JOIN chn r ON r._b = l._b AND r._rn = l._rn % l._n + 1
    ),
    curru AS (
      SELECT src_url, dst_url FROM keep
      UNION ALL SELECT src_url, dst_url FROM rot
    ),
    e AS MATERIALIZED (
      SELECT regexp_extract(src_url, '^https?://([^/?#]+)', 1) AS src_host,
             regexp_extract(dst_url, '^https?://([^/?#]+)', 1) AS dst_host
      FROM curru
    ),
    deg AS MATERIALIZED (SELECT src_host, COUNT(*) AS out_deg FROM e GROUP BY src_host),
    hosts AS MATERIALIZED (SELECT DISTINCT host FROM
              (SELECT src_host AS host FROM e UNION ALL SELECT dst_host AS host FROM e)),
    e2 AS MATERIALIZED (
      SELECT src_host, dst_host, FALSE AS phantom FROM e
      UNION ALL
      SELECT host, host, TRUE FROM hosts
    ),
    pr AS (
      SELECT 0 AS it, host,
             CAST(CAST({_PR_SCALE} AS BIGINT) // (SELECT COUNT(*) FROM hosts) AS BIGINT) AS rank
      FROM hosts
      UNION ALL
      SELECT p.it + 1, e2.dst_host AS host,
             CAST( ((CAST({100 - _PR_DAMP} AS BIGINT) * {_PR_SCALE}) // 100)
                     // (SELECT COUNT(*) FROM hosts)
                   + (CAST({_PR_DAMP} AS BIGINT)
                      * SUM(CASE WHEN e2.phantom THEN CAST(0 AS BIGINT)
                                 ELSE p.rank // d.out_deg END)) // 100
               AS BIGINT) AS rank
      FROM pr p
      JOIN e2 ON e2.src_host = p.host
      LEFT JOIN deg d ON d.src_host = p.host
      WHERE p.it < {_PRD_ITER}
      GROUP BY p.it, e2.dst_host
    )
    SELECT host, rank FROM pr WHERE it = {_PRD_ITER} ORDER BY rank DESC, host
    """,
)
def recrawl_rank_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recrawl→rank-maintenance COMPOSITION end-to-end: a recrawl
    rewires links on ~19% of pages (docs whose url md5 starts 0/1/2 —
    the SAME rule in both engines — have their outlink targets rotated
    among the changed edges of the same dst-url md5 bucket — a
    PERMUTATION of existing dst urls (256 bounded window partitions that
    deliberately mix hosts so host pairings actually change), so the
    vertex set is preserved BY CONSTRUCTION and the incremental path
    never falls back). The url-grain diff is then
    lifted to an exact HOST-grain multiset delta (pairs whose
    multiplicity changed: remove-all + re-add-at-current-multiplicity)
    and folded into the previous crawl's persisted rank ladder with
    host_pagerank_delta. ONLY the pre-recrawl url-grain edge table is
    staged: the oracle independently replays the change rule, the
    rotation, the host projection, and the full integer recurrence FROM
    SCRATCH over the post-recrawl graph — a hash match verifies the
    change model, the delta derivation, AND the incremental fold in one
    comparison. This is the daily loop tools/run_graph_maintenance.py
    ships: recrawl → delta → fold, never a full graph re-walk."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        host_edges,
        host_pagerank_delta,
        host_pagerank_states,
    )
    from ocr_platform_spark.operators.partitioning import host_of

    prev = stage(
        extract_outlinks(_synth_docs(spark)).distinct(), "rcm_prev", partitions=4
    )
    first = F.substring(F.md5("src_url"), 1, 1)
    ch = prev.where(first.isin("0", "1", "2")).select(
        F.substring(F.md5("dst_url"), 1, 2).alias("_b"), "src_url", "dst_url"
    )
    keep = prev.where(~first.isin("0", "1", "2")).select("src_url", "dst_url")
    w = Window.partitionBy("_b").orderBy("src_url", "dst_url")
    chn = ch.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy("_b"))
    )
    rot = (
        chn.alias("l")
        .join(
            chn.select(
                F.col("_b"), F.col("_rn").alias("_take"),
                F.col("dst_url").alias("_dst"),
            ).alias("r"),
            (F.col("l._b") == F.col("r._b"))
            & (F.col("_take") == F.col("l._rn") % F.col("l._n") + 1),
        )
        .select(F.col("l.src_url").alias("src_url"), F.col("_dst").alias("dst_url"))
    )
    curr = keep.unionByName(rot)

    prev_h = host_edges(prev)
    curr_h = host_edges(curr)
    pc = prev_h.groupBy("src_host", "dst_host").agg(F.count("*").alias("_pc"))
    cc = curr_h.groupBy("src_host", "dst_host").agg(F.count("*").alias("_cc"))
    chg = (
        pc.join(cc, ["src_host", "dst_host"], "full")
        .where(F.coalesce("_pc", F.lit(0)) != F.coalesce("_cc", F.lit(0)))
        .localCheckpoint(eager=True)
    )
    removed = chg.where(F.col("_pc").isNotNull()).select("src_host", "dst_host")
    added = curr_h.join(
        chg.where(F.col("_cc").isNotNull()).select("src_host", "dst_host"),
        ["src_host", "dst_host"],
        "left_semi",
    )
    states = host_pagerank_states(prev_h, iterations=_PRD_ITER)
    return host_pagerank_delta(prev_h, states, added=added, removed=removed)


@q(
    "host_ppr_vectors",
    f"""
    WITH RECURSIVE
    e AS (SELECT * FROM read_parquet('{staged_glob("ppr_edges")}')),
    deg AS MATERIALIZED (SELECT src_host, COUNT(*) AS out_deg FROM e GROUP BY src_host),
    hosts AS MATERIALIZED (SELECT DISTINCT host FROM
              (SELECT src_host AS host FROM e UNION ALL SELECT dst_host AS host FROM e)),
    e2 AS MATERIALIZED (
      SELECT src_host, dst_host, FALSE AS phantom FROM e
      UNION ALL
      SELECT host, host, TRUE FROM hosts
    ),
    seeds AS MATERIALIZED (SELECT host AS seed FROM hosts ORDER BY host LIMIT 3),
    pr AS (
      SELECT 0 AS it, s.seed, h.host,
             CAST(CASE WHEN h.host = s.seed THEN {_PR_SCALE} ELSE 0 END AS BIGINT) AS rank
      FROM seeds s CROSS JOIN hosts h
      UNION ALL
      SELECT p.it + 1, p.seed, e2.dst_host AS host,
             CAST( (CASE WHEN e2.dst_host = p.seed
                         THEN (CAST({100 - _PR_DAMP} AS BIGINT) * {_PR_SCALE}) // 100
                         ELSE 0 END)
                   + (CAST({_PR_DAMP} AS BIGINT)
                      * SUM(CASE WHEN e2.phantom THEN CAST(0 AS BIGINT)
                                 ELSE p.rank // d.out_deg END)) // 100
               AS BIGINT) AS rank
      FROM pr p
      JOIN e2 ON e2.src_host = p.host
      LEFT JOIN deg d ON d.src_host = p.host
      WHERE p.it < {_PRD_ITER}
      GROUP BY p.it, p.seed, e2.dst_host
    )
    SELECT seed, host, rank FROM pr WHERE it = {_PRD_ITER}
    ORDER BY seed, rank DESC, host
    """,
)
def host_ppr_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED personalized PageRank (operators/linkgraph.host_ppr;
    Haveliwala's topic-sensitive PageRank in the same exact-integer
    discipline as host_pagerank): one rank VECTOR per seed hub, all
    seeds advanced through ONE edges⋈ranks join per iteration with the
    seed riding as a grouping column — k seeds cost one pass over k·m
    join rows, not k sequential recurrences. Seeds are the three
    lexicographically-first hosts (the same deterministic rule in both
    engines). The oracle replays the whole k-seed recurrence with seed
    carried as a recursive-CTE column — every (seed, host, rank) cell
    bit-checked. The per-seed vectors are the topic-conditioned
    authority a crawler uses to prioritize fetches near trusted hubs."""
    from ocr_platform_spark.operators.linkgraph import (
        extract_outlinks,
        host_edges,
        host_ppr,
    )

    docs = _synth_docs(spark)
    edges = stage(host_edges(extract_outlinks(docs)), "ppr_edges", partitions=4)
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    seeds = hosts.orderBy("host").limit(3)
    return host_ppr(edges, seeds, iterations=_PRD_ITER).orderBy(
        "seed", F.desc("rank"), "host"
    )






# Driver-facing ordering: the per-round correctness harness records the
# FIRST 50 queries() entries. Cumulative driver coverage after round 4 is
# 137/216 (136 green + the doc_embedding err row). Round 5's window:
# doc_embedding first (its round-4 err was a canonicalizer array-column
# issue, fixed above — latest row wins) followed by 49 entries that have
# never appeared in any CORRECTNESS_r*.json, in the long-standing queue
# order. The remaining 30 never-recorded entries sit at positions 51-80
# (plus this round's new additions, appended newest-last); entries past
# any window stay verified every session by tools/oracle_check.py and
# tests/test_oracle_parity.py.
_PRIORITY = [
    # -- round-5 driver window (slots 1-50): the red row + never-recorded --
    "doc_embedding", "dedup_lsh_recall", "quality_threshold_sweep",
    "doc_decontam_by_suite", "doc_decontam_strip", "corpus_bpe_encode",
    "corpus_token_blocks", "corpus_token_blocks_sep", "doc_mojibake_scan",
    "corpus_vocab_growth", "extract_dom_stats", "doc_pii_cards",
    "extract_span_audit", "extract_lineage_audit", "corpus_kmeans_domains",
    "corpus_cluster_sample", "extract_structured_data", "host_heavy_hitters",
    "doc_repeated_spans_sa", "corpus_cluster_weights",
    "structured_product_offers", "corpus_cluster_epoch_plan",
    "doc_canonical_dups", "hreflang_frontier_seeds", "url_param_stats",
    "doc_readability", "doc_code_density", "dedup_quality_eviction",
    "crawl_budget_allocation", "corpus_code_route_report",
    "url_revisit_policy", "host_token_budget_cut", "doc_script_mix",
    "extract_headings", "sitemap_coverage", "doc_title_body_consistency",
    "extract_section_chunks", "robots_sitemap_directives",
    "ann_lsh_multiprobe_sweep", "storage_compaction_plan",
    "host_boilerplate_strip", "doc_chunk_overlap", "corpus_oov_curve",
    "url_softblock_score", "corpus_bpe_fertility", "crawl_trap_detection",
    "url_prefix_rollup", "payload_cdc_dedup", "payload_cdc_delta",
    "retrieval_mrr_report",
    # -- positions 51+: remaining never-recorded, then driver-green history --
    "doc_homoglyph_scan", "corpus_negative_sampling_table",
    "shard_zonemap_skipping", "events_hourly_incremental",
    "corpus_release_diff", "host_mirror_detection", "doc_keyphrases",
    "snapshot_expiry_plan", "split_leakage_audit", "retrieval_rrf_fusion",
    "host_mirror_near_dups", "retrieval_index_report", "retrieval_rrf_sweep",
    "payload_cdc_storage", "anchor_training_pairs", "host_link_farm_pairs",
    "corpus_fim_transform", "doc_novelty_scores", "event_burst_segments",
    "host_triangle_stats", "url_canonical_chains", "anchor_retrieval_eval",
    "burst_aware_crawl_budget", "cdx_index", "dedup_colocation_report",
    "wet_cdx_index", "crawl_depth_labels", "dedup_cluster_purity",
    "event_burst_transitions", "host_spam_blocklist",
    "wet_roundtrip", "doc_decontam_fuzzy", "host_spam_mass",
    "doc_containment_pairs", "decontam_lsh_recall", "doc_containment_strip",
    "retrieval_index_build", "ann_derived_topk", "semantic_dedup_derived",
    "bitext_url_scored_derived", "doc_repeated_spans_strided",
    "corpus_build_report", "ann_ivfpq_refine_topk",
    "retrieval_hard_negatives", "bitext_url_candidates", "bitext_url_scored",
    "doc_chunk_plan", "corpus_pack_sequences", "corpus_shard_manifest",
    "doc_decontam", "doc_split_assign", "doc_split_by_source",
    "host_downsample", "corpus_mixture_sample", "corpus_length_deciles",
    "doc_pii_scrub", "doc_c4_line_filter", "doc_nfc_normalization",
    "doc_tfidf_terms", "doc_topic_classifier_tf", "corpus_keyword_search",
    "corpus_phrase_search", "corpus_top_bigrams", "host_trustrank",
    "host_anchor_texts", "host_quality_rollup", "host_cardinality_exact",
    "doc_robots_rollup", "crawl_delay_schedule", "url_canonicalization",
    "url_bloom_resume", "url_revisit_diff", "ingest_path_hygiene",
    "field_option_dispatch", "blocklist_filter", "process_table_subfields",
    "dimension_as_of_lookup", "export_pdf_roundtrip", "corrected_table_cells",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = [n for n in _PRIORITY if n in CATALOG]
    ordered += [n for n in CATALOG if n not in set(ordered)]
    return {name: CATALOG[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}
