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


# ---------------------------------------------------------------------------
# Dedup & grouping (D1-D4) — the signature curator queries
# ---------------------------------------------------------------------------


@query(
    "d1_unique_event_grouping",
    """
    WITH bucketed AS (
        SELECT *,
               (floor(epoch(ts) / 180) * 180)::BIGINT AS bucket_start,
               CASE WHEN value >= 150 THEN 0
                    WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50 THEN 1
                    ELSE 2 END AS prec
        FROM events
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id, event_type, bucket_start
                                  ORDER BY prec ASC, ts ASC, event_id ASC) AS rn,
               count(*) OVER (PARTITION BY user_id, event_type, bucket_start) AS n_rows
        FROM bucketed
    )
    SELECT user_id, event_type, bucket_start, event_id AS rep_event_id, n_rows
    FROM ranked WHERE rn = 1
    """,
    "D1 unique-event grouping (makeOsdDb.py:180-242): fixed 3-min wall-clock "
    "buckets per (user, type); best row by ALARM > tagged > first precedence. "
    "One window over one shuffle whose key IS the group key.",
)
def d1_unique_event_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    precedence = (
        F.when(F.col("value") >= 150, 0).when(k > 50, 1).otherwise(2)
    )
    out = dedup_ops.unique_group_representative(
        ev,
        ["user_id", "event_type"],
        "ts",
        180,
        precedence,
        "event_id",
    )
    return out.select(
        "user_id",
        "event_type",
        "bucket_start",
        F.col("event_id").alias("rep_event_id"),
        "n_rows",
    )


@query(
    "d2_gap_clustering",
    """
    WITH diffs AS (
        SELECT *,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id, event_type
                                               ORDER BY ts ASC)) AS gap_s
        FROM events
    ), clustered AS (
        SELECT *,
               (sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id, event_type ORDER BY ts ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
               )::BIGINT AS cluster_id
        FROM diffs
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id, event_type, cluster_id
                                  ORDER BY value DESC, ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id, event_type, cluster_id) AS cluster_n
        FROM clustered
    )
    SELECT user_id, event_type, cluster_id, event_id AS rep_event_id, cluster_n
    FROM ranked WHERE rn = 1
    """,
    "D2 adjacent-duplicate clustering (merge_json.py:148-250): gap>30min "
    "starts a new cluster per (user, type); keep max-value row, later-time "
    "tiebreak. lag + running-sum sessionization, single shuffle.",
)
def d2_gap_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clustered = dedup_ops.gap_clusters(ev, ["user_id", "event_type"], "ts", 1800)
    best = dedup_ops.cluster_representative(
        clustered,
        ["user_id", "event_type"],
        [F.col("value").desc(), F.col("ts").desc(), F.col("event_id").desc()],
    )
    return best.select(
        "user_id",
        "event_type",
        "cluster_id",
        F.col("event_id").alias("rep_event_id"),
        "cluster_n",
    )


@query(
    "d3_drop_duplicates",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    "D3 dropDuplicates (splitData.py:101-103 unique event list).",
)
def d3_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )


@query(
    "d4_weekly_counts",
    """
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, event_type,
           user_id, count(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
    "D4 weekly alarm grouping (dashboard.py:132-145 Grouper freq='1W').",
)
def d4_weekly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"),
        "event_type",
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Window / time-series operators (W3-W7, W5, W12, A8)
# ---------------------------------------------------------------------------


@query(
    "w3_gap_fill",
    """
    WITH diffs AS (
        SELECT user_id, ts,
               epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC)) AS prev_e,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC)) AS gap_s
        FROM events
    ), gaps AS (
        SELECT user_id, prev_e, floor(gap_s / 1800)::BIGINT AS n_fill
        FROM diffs WHERE gap_s > 3600
    )
    SELECT user_id, floor(prev_e + i * 1800)::BIGINT AS fill_epoch
    FROM gaps, unnest(generate_series(1, n_fill)) AS t(i)
    """,
    "W3 gap repair, fill-row synthesis (flattenData.py:240-342): for every "
    "gap > 1h per user emit floor(gap/30min) filler timestamps on the grid. "
    "sequence()+explode generates rows executor-side — no driver loop.",
)
def w3_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return window_ops.gap_fill_rows(ev, ["user_id"], "ts", 1800, 3600)


@query(
    "w4_gap_census",
    """
    WITH diffs AS (
        SELECT user_id,
               epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC)) AS t_diff_s
        FROM events
    )
    SELECT user_id,
           count(CASE WHEN t_diff_s > 7200 THEN 1 END) AS n_gaps,
           count(CASE WHEN t_diff_s < 60 THEN 1 END) AS n_extras,
           count(*) AS n_rows
    FROM diffs GROUP BY user_id
    """,
    "W4 gap/extra census (eventAnalyser.py:180-191): tDiff>6s gap, <4s "
    "extra, scaled to the events table (2h / 60s).",
)
def w4_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return window_ops.gap_census(
        _t(spark, sf_dir, "events"), ["user_id"], "ts", 7200, 60
    )


@query(
    "w5_epoch_segmentation",
    """
    WITH numbered AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts ASC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n,
               round(sum(round(value * 100)::BIGINT) OVER (PARTITION BY user_id ORDER BY ts ASC
                     ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING)
                     / (100.0 * count(value) OVER (PARTITION BY user_id ORDER BY ts ASC
                        ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING)), 6) AS win_avg,
               count(value) OVER (PARTITION BY user_id ORDER BY ts ASC
                     ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING) AS win_n
        FROM events
    )
    SELECT user_id, (rn - 1)::BIGINT AS epoch_start_rn, win_avg, win_n
    FROM numbered
    WHERE (rn - 1) % 12 = 0 AND rn + 24 <= n
    """,
    "W5 epoch segmentation (extractFeatures.py:143-211): overlapping "
    "25-row windows every 12 rows per user, with per-window aggregate — "
    "forward window frame + row_number filter, no per-group collect.",
)
def w5_epoch_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-integer cents (round(value*100) is bit-exact in both engines)
    # so the windowed mean can't straddle a rounding boundary cross-engine
    ev = _t(spark, sf_dir, "events").withColumn(
        "__cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc())
    frame = w.rowsBetween(0, 24)
    d = (
        ev.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .withColumn("__sum", F.sum("__cents").over(frame))
        .withColumn("win_n", F.count("value").over(frame))
    )
    return d.filter(
        ((F.col("__rn") - 1) % 12 == 0) & (F.col("__rn") + 24 <= F.col("__n"))
    ).select(
        "user_id",
        (F.col("__rn") - 1).cast("long").alias("epoch_start_rn"),
        F.round(F.col("__sum") / (100.0 * F.col("win_n")), 6).alias("win_avg"),
        "win_n",
    )


@query(
    "w6_feature_history",
    """
    WITH lagged AS (
        SELECT event_id, user_id,
               value AS value_t0,
               lag(value, 1) OVER w AS value_t1,
               lag(value, 2) OVER w AS value_t2,
               round(sum(round(value * 100)::BIGINT) OVER (PARTITION BY user_id ORDER BY ts ASC
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                     / (100.0 * count(value) OVER (PARTITION BY user_id ORDER BY ts ASC
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)), 6) AS value_mean,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    )
    SELECT event_id, user_id, value_t0, value_t1, value_t2, value_mean
    FROM lagged WHERE rn >= 3
    """,
    "W6 feature-history lags (addFeatureHistory.py:21-39): col_t-0..t-2 + "
    "rolling mean per user, first n-1 rows dropped.",
)
def w6_feature_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rolling mean and lags are computed over the FULL per-user sequence,
    # then the first n-1 rows are dropped (window exprs must be
    # materialized before any filter — filtering first would re-pair lag
    # neighbors)
    ev = _t(spark, sf_dir, "events").withColumn(
        "__cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc())
    frame = w.rowsBetween(-2, 0)
    d = (
        ev.withColumn("value_t0", F.col("value"))
        .withColumn("value_t1", F.lag("value", 1).over(w))
        .withColumn("value_t2", F.lag("value", 2).over(w))
        .withColumn(
            "value_mean",
            F.round(
                F.sum("__cents").over(frame) / (100.0 * F.count("value").over(frame)),
                6,
            ),
        )
        .withColumn("__rn", F.row_number().over(w))
    )
    return d.filter(F.col("__rn") >= 3).select(
        "event_id", "user_id", "value_t0", "value_t1", "value_t2", "value_mean"
    )


@query(
    "w7_moving_average",
    """
    WITH framed AS (
        SELECT event_id, user_id,
               sum(CASE WHEN value >= 20 THEN round(value * 100)::BIGINT END) OVER (
                   PARTITION BY user_id ORDER BY ts ASC
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS s,
               count(CASE WHEN value >= 20 THEN 1 END) OVER (
                   PARTITION BY user_id ORDER BY ts ASC
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS c
        FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN c > 0 THEN round(s / (100.0 * c), 6) END AS mov_avg
    FROM framed
    """,
    "W7 moving-average with sentinel skip + adaptive thresholds "
    "(hrAlg.py:55-113): trailing 6-row mean ignoring missing values.",
)
def w7_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(-5, 0)
    )
    valid_cents = F.when(
        F.col("value") >= 20, F.round(F.col("value") * 100, 0).cast("long")
    )
    valid_one = F.when(F.col("value") >= 20, 1)
    cnt = F.count(valid_one).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.when(
            cnt > 0,
            F.round(F.sum(valid_cents).over(w) / (100.0 * cnt), 6),
        ).alias("mov_avg"),
    )


@query(
    "w12_topk_per_group",
    """
    WITH ranked AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id ASC) AS rank
        FROM events
    )
    SELECT event_type, rank, event_id, value FROM ranked WHERE rank <= 3
    """,
    "W12 top-k per group (rank/limit pattern; D1/D2 'best row' generalized).",
)
def w12_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = window_ops.top_k_per_group(
        _t(spark, sf_dir, "events"),
        ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        3,
    )
    return out.select("event_type", "rank", "event_id", "value")


@query(
    "a8_cumulative_daily",
    """
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n,
           sum(n) OVER (PARTITION BY event_type ORDER BY day ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
    FROM daily
    """,
    "A8 cumulative counts over time (generateGraphs.py:176-278): daily "
    "count + running total per category.",
)
def a8_cumulative_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return window_ops.cumulative_sum(daily, ["event_type"], "day", "n", "cum_n")
