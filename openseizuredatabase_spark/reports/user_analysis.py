"""Per-user reliability analysis (dataSummariser/userAnalyser.py,
false_alarm_analysis.py) — Spark-first.

The reference loads a user's events into pandas and derives (userAnalyser
.py:50-100): a 10-minute max-alarm dedup of rapid-succession seizures,
the spacing in days between seizure DAYS (not events — same-day repeats
collapse) with a 3-point rolling mean, and month-end counts reindexed so
empty months appear as zeros. All three are window/grid operations
Catalyst expresses directly; none need pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seizure_day_spacing(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    roll: int = 3,
) -> DataFrame:
    """userAnalyser.py:66-78: distinct seizure days per user → day diff to
    the previous seizure day → ``roll``-point rolling mean (null until the
    window holds ``roll`` non-null spacings, pandas min_periods
    semantics). One shuffle on the user key serves dedup and both
    windows."""
    days = events.select(
        user_col, F.date_trunc("DAY", F.col(ts_col)).alias("day")
    ).distinct()
    w = Window.partitionBy(user_col).orderBy("day")
    wr = w.rowsBetween(-(roll - 1), 0)
    out = days.withColumn(
        "spacing", F.datediff(F.col("day"), F.lag("day").over(w))
    )
    return out.withColumn(
        "spacing_avg",
        F.when(
            F.count("spacing").over(wr) >= roll,
            F.round(F.avg("spacing").over(wr), 6),
        ),
    )


def rapid_succession_dedup(
    events: DataFrame,
    ts_col: str = "ts",
    state_col: str = "value",
    bucket: str = "10 minutes",
) -> DataFrame:
    """userAnalyser.py:50-62: collapse rapid-succession duplicates by
    10-minute bucket, keeping the max alarm state; empty/zero buckets
    drop."""
    return (
        events.groupBy(F.window(F.col(ts_col), bucket).alias("w"))
        .agg(F.max(F.col(state_col)).alias("max_state"))
        .filter(F.col("max_state") > 0)
        .select(F.col("w.start").alias("bucket_start"), "max_state")
    )


def dense_month_counts(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """userAnalyser.py:84-100: month-end counts per type with zero-filled
    missing (type, month) cells — the pandas reindex-from-product trick
    as a sequence() month grid × distinct-types broadcast cross join,
    left-joined to the real counts."""
    bounds = events.select(
        F.date_trunc("MONTH", F.min(ts_col)).cast("date").alias("lo"),
        F.date_trunc("MONTH", F.max(ts_col)).cast("date").alias("hi"),
    )
    months = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 month"))
        ).alias("month")
    )
    grid = months.crossJoin(
        F.broadcast(events.select(type_col).distinct())
    )
    counts = events.groupBy(
        F.date_trunc("MONTH", F.col(ts_col)).cast("date").alias("month"),
        type_col,
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        grid.join(counts, ["month", type_col], "left")
        .fillna({"n": 0})
        .select(type_col, "month", "n")
    )
