"""Structured Streaming mode (SURVEY §2.10).

The runtime system behind the reference is a true stream (watch →
phone → server); the reference only replays it batch-wise. Here the
same operators run as a Structured Streaming job:

* D1's fixed 3-minute grouping → tumbling ``window(ts, '3 minutes')``
  aggregation with a watermark for late data.
* D2's 60-s adjacency clustering → ``session_window(ts, gap)``.
* W10's alarm machine → ``applyInPandasWithState`` keyed by user: the
  accumulate/decay recurrence carries (state, count) across micro-batches
  — the streaming twin of the batch ``run_state_machine``.

Batch/streaming parity matters: both paths call the same
``alarm_recurrence`` so detection semantics cannot drift.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from openseizuredatabase_spark.detection.osd_alg import OsdSettings


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    window_duration: str = "3 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """D1 streaming shape: per-(group, fixed window) counts + max value."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("bucket_start"),
            *group_cols,
            "n",
        )
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    window_duration: str = "2 days",
    slide: str = "1 day",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding (overlapping) windowed counts: each event lands in
    window_duration/slide epoch-aligned windows, so a bucket's count is
    a trailing-window aggregate rather than a tumbling partition. State
    per open window is bounded by the watermark exactly as in
    :func:`windowed_counts` — there are just duration/slide times more
    open windows, still constant per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration, slide), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("bucket_start"),
            *group_cols,
            "n",
        )
    )


def enriched_counts(
    stream: DataFrame,
    dim: DataFrame,
    ts_col: str,
    join_on,
    group_cols: Sequence[str],
    window_duration: str = "1 day",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-static dimension enrichment → windowed counts.

    The static side joins as a BROADCAST per micro-batch — Structured
    Streaming keeps NO state for it (only the windowed aggregation holds
    state, watermark-evicted). This is the standard streaming dimension
    join: the dim table can be arbitrarily refreshed between restarts
    without touching the stream's checkpoint."""
    return (
        stream.withWatermark(ts_col, watermark)
        .join(F.broadcast(dim), join_on, "left")
        .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("bucket_start"),
            *group_cols,
            "n",
        )
    )


def streaming_distinct(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """D3 streaming twin: exact dedup of an unbounded stream.

    ``dropDuplicatesWithinWatermark`` keys the state store on the dedup
    columns and EXPIRES each key once the watermark passes its first
    sighting — bounded state, the production requirement a plain
    streaming ``dropDuplicates`` (whose state never expires unless the
    event-time column itself is a key) fails at ingest scale. Duplicates
    separated by more than the watermark re-emit, the standard
    at-least-once dedup contract for late data.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    ).select(*key_cols)


def session_clusters(
    stream: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    gap: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """D2 streaming shape: gap-based session windows per group."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *group_cols,
            "n",
        )
    )


def streaming_alarm_machine(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    flag_col: str,
    settings: OsdSettings | None = None,
) -> DataFrame:
    """W10 as a stateful streaming operator.

    State per key = (alarmState, alarmCount), carried across micro-batches
    (the batch replay resets per event; a live stream never resets unless
    the state times out). Same recurrence step as batch
    ``alarm_recurrence`` — parity by construction.
    """
    s = settings or OsdSettings()
    out_schema = f"{key_col} long, {ts_col} timestamp, alarmState int, alarmCount double"
    state_schema = "state int, count double"

    def step(state: int, count: float, flag: bool) -> tuple[int, float]:
        if flag:
            count += s.sample_period
            if count > s.alarm_time:
                state = 2
            elif count > s.warn_time:
                state = 1
        else:
            if state == 2:
                state = 1
                count = s.warn_time
            else:
                state = 0
                count = 0.0
        return state, count

    def process(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        group_state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if group_state.exists:
            state, count = group_state.get
        else:
            state, count = 0, 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            states, counts = [], []
            for flag in pdf[flag_col].fillna(False).astype(bool):
                state, count = step(state, count, bool(flag))
                states.append(state)
                counts.append(count)
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].values,
                    ts_col: pdf[ts_col].values,
                    "alarmState": states,
                    "alarmCount": counts,
                }
            )
        group_state.update((state, count))

    return (
        stream.select(key_col, ts_col, flag_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            process,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "5 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right rows in [left.ts − lookback, left.ts]
    for the same key — Spark's canonical two-stream join shape (J4's
    interval containment as a streaming operator).

    Both sides carry their own watermark; the time-range condition is
    what lets the engine bound join state (right rows older than
    left-watermark − lookback are evicted). Inner-join output is
    complete — the watermark governs state size, not result membership —
    so the emission is deterministic and batch-oracle-checkable.

    ``how="leftOuter"`` adds null-padded emission for unmatched left
    rows — but only once the global watermark PROVES no future right
    row can match (l.ts < watermark), so rows inside the final
    watermark horizon are withheld at stream end: output membership is
    matched-pairs ∪ {unmatched left | l.ts < max(event time) −
    watermark delay}, deterministic under availableNow replay and
    pinned by s23's oracle.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, how)


def paced_replay(
    spark,
    dps: DataFrame,
    rows_per_second: float = 0.2,
    ts_col: str = "dpTimestamp",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """W11 event replay pacing (libosd/analyse_event.py:361-404 — feed
    datapoints to a live consumer at 5 s intervals via time.sleep(5)).

    Spark-first: the ``rate`` source is the clock — it emits one
    monotonically increasing ``value`` per tick — and a stream-static
    equi-join against the time-ordered, row-numbered datapoint table
    releases exactly the next datapoint(s) each tick. The reference's
    default one-dp-per-5-s pace is ``rows_per_second=0.2``; any pace
    (including faster-than-realtime re-drives) is the same plan. The
    static side is broadcast-sized per event replay; for whole-lake
    re-drives repartition the static side on the join key instead.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    indexed = dps.withColumn(
        "__idx", F.row_number().over(Window.orderBy(*order)) - 1
    )
    # the rate source's rowsPerSecond is integral; sub-1 Hz pacing (the
    # reference's 0.2 Hz) ticks at 1 Hz and releases every Nth tick
    if rows_per_second >= 1.0:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", int(rows_per_second))
            .load()
        )
        cond = rate["value"] == indexed["__idx"]
    else:
        period = max(1, round(1.0 / rows_per_second))
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .filter(F.col("value") % period == 0)
        )
        cond = rate["value"] == indexed["__idx"] * period
    return (
        rate.join(indexed, cond, "inner")
        .drop("value")
        .withColumnRenamed("timestamp", "replay_ts")
    )
