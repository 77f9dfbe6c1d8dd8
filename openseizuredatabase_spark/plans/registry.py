"""Query registry: every operator from SURVEY.md §2 as a named query over
the driver's synthetic lake, each with a DuckDB oracle SQL string.

Each entry maps one reference operator (the SURVEY id in the name and
docstring) onto the driver tables (region nation customer supplier part
orders lineitem events documents embeddings). The Spark side is the
engine's operator library; the oracle side is independent ANSI SQL so the
two implementations are genuinely cross-checked, not copies.

Column-name discipline: every computed column is aliased identically in
both, and every float that undergoes arithmetic is rounded (sums→2dp,
ratios→6dp) so cross-engine summation order can't flip the value hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openseizuredatabase_spark.operators import aggregates as agg_ops
from openseizuredatabase_spark.operators import dedup as dedup_ops
from openseizuredatabase_spark.operators import filters as filter_ops
from openseizuredatabase_spark.operators import joins as join_ops
from openseizuredatabase_spark.operators import splits as split_ops
from openseizuredatabase_spark.operators import windows as window_ops
from openseizuredatabase_spark.functions import text as text_fn
from openseizuredatabase_spark.functions import vectors as vec_fn
from openseizuredatabase_spark.functions.hashing import seeded_md5_long, seeded_md5_long_sql
from openseizuredatabase_spark.sources.tables import load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str], doc: str):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Relational core (scan → filter → aggregate; SURVEY A1/A7, TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "A1/A7 scan-agg (TPC-H Q1 shape): map-side partial agg, 2-col group key.",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "j3_top_orders",
    """
    SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    "J3 broadcast enrichment + multi-join agg (TPC-H Q3 shape): the small "
    "filtered dimension broadcasts; lineitem never shuffles for the dim join.",
)
def j3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(
        F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "j2_semi_join_customers",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    "J2 semi-join by id set (osdDbConnection.py:279-303 retrieveEvents).",
)
def j2_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return filter_ops.semi_join_ids(
        c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


@query(
    "f7_anti_join_customers",
    """
    SELECT c_custkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "F7/J6 anti-join (invalid-event removal / new-event diff shape).",
)
def f7_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return filter_ops.anti_join_ids(
        c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey")


@query(
    "j5_snapshot_merge",
    """
    WITH tagged AS (
        SELECT event_id, user_id, value, 'a' AS src FROM events WHERE event_id % 3 <> 0
        UNION ALL
        SELECT event_id, user_id, value, 'b' AS src FROM events WHERE event_id % 2 <> 0
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY src ASC) AS rn
        FROM tagged
    )
    SELECT event_id, user_id, value, src FROM ranked WHERE rn = 1
    """,
    "J5 snapshot merge: union + reconcile by key, snapshot 'a' wins "
    "(merge_json.py:119-147).",
)
def j5_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    snap_a = ev.filter(F.col("event_id") % 3 != 0)
    snap_b = ev.filter(F.col("event_id") % 2 != 0)
    return join_ops.snapshot_merge(
        [("a", snap_a), ("b", snap_b)], "event_id", ["a", "b"]
    ).select("event_id", "user_id", "value", "src")


# ---------------------------------------------------------------------------
# Filters (F1-F6, C5 JSON extraction)
# ---------------------------------------------------------------------------


@query(
    "f1_include_exclude",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
      AND user_id NOT IN (1, 2, 3)
      AND value BETWEEN 10 AND 500
    """,
    "F1 multi-field include/exclude filter compiled to one predicate "
    "(osdDbConnection.py:405-537).",
)
def f1_include_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return filter_ops.apply_filter(
        ev,
        {
            "include": {"event_type": ["purchase", "signup"]},
            "exclude": {"user_id": [1, 2, 3]},
            "between": {"value": (10, 500)},
        },
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "f2_ci_substring",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE lower(text) LIKE '%join%' OR lower(text) LIKE '%merge%'
    """,
    "F2 case-insensitive substring OR-match (osdDbConnection.py:540-587).",
)
def f2_ci_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return filter_ops.apply_filter(
        docs, {"contains": {"text": ["join", "merge"]}}
    ).select("doc_id", "lang", "source")


@query(
    "f3_sql_predicate",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type = 'purchase' OR event_type = 'error' OR value > 450
    """,
    "F3 SQL-ish query string filter (makeOsdDb.py:136-138 df.query).",
)
def f3_sql_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        "event_type = 'purchase' OR event_type = 'error' OR value > 450"
    ).select("event_id", "event_type", "value")


@query(
    "f4_date_range_daily",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY 1, 2
    """,
    "F4 date-range predicate + D4 daily grouping (makeOsdDb.py:141-152, "
    "false_alarm_analysis.py:99-124). Range predicate reaches the parquet "
    "scan (min/max pruning).",
)
def f4_date_range_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
        )
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "c5_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                 THEN 1 END) AS n_high
    FROM events
    GROUP BY event_type
    """,
    "C5 nested-JSON field extraction promoted to columns "
    "(osdDbConnection.py:33-64 dataJSON expansion) + aggregation.",
)
def c5_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )
