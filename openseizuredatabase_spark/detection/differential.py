"""Two-backend differential validation (the reference's
compare_streaming_algorithms.py role, user_tools/nnTraining2/
compare_streaming_algorithms.py:338-432): replay ONE event set through
TWO detector backends, join their per-datapoint outputs, and report
per-event and overall agreement statistics.

The reference replays serially (a local .pte model vs a physical device
over HTTP) and diffs per-dp pSeizure in pandas. Spark-first shape: each
backend is an independent distributed job over the same datapoint frame;
the diff is an equi-join on (event, timestamp) — co-partitioned, no
driver loop — and every statistic is an aggregation, so the comparison
itself scales to the full lake.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AlgFactory = Callable[[DataFrame], DataFrame]


def per_dp_diff(
    out_a: DataFrame,
    out_b: DataFrame,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
) -> DataFrame:
    """Join two per-dp detector outputs on (event, dp timestamp).

    Emits one row per datapoint seen by either backend (full outer join —
    a backend that dropped datapoints shows as nulls, a real failure mode
    the reference's device path exhibits). ``pSeizure`` columns are
    optional per side; ``alarmState`` is required.
    """
    keep_a = [c for c in ("pSeizure", "alarmState") if c in out_a.columns]
    keep_b = [c for c in ("pSeizure", "alarmState") if c in out_b.columns]
    a = out_a.select(
        F.col(event_col), F.col(ts_col),
        *[F.col(c).alias(f"{c}_a") for c in keep_a],
    )
    b = out_b.select(
        F.col(event_col), F.col(ts_col),
        *[F.col(c).alias(f"{c}_b") for c in keep_b],
    )
    d = a.join(b, [event_col, ts_col], "full_outer")
    if "pSeizure_a" in d.columns and "pSeizure_b" in d.columns:
        d = d.withColumn(
            "p_abs_diff", F.abs(F.col("pSeizure_a") - F.col("pSeizure_b"))
        )
    return d


def event_diff_summary(
    diff: DataFrame,
    event_col: str = "eventId",
    prob_tol: float = 1e-4,
) -> DataFrame:
    """Per-event agreement rollup (one aggregation pass):

    * n_dps — datapoints either backend emitted;
    * n_both — datapoints both backends emitted;
    * n_state_match — dps where the alarm-state machines agree;
    * verdict_a / verdict_b — event-level verdict per backend (1 iff any
      dp reached ALARM, the reference's alarm_state2 event rule);
    * verdict_match — whether the backends agree on the event;
    * p_max_diff / p_mean_diff / n_within_tol — pSeizure drift stats
      (present only when both sides scored probabilities).
    """
    both = F.col("alarmState_a").isNotNull() & F.col("alarmState_b").isNotNull()
    aggs = [
        F.count(F.lit(1)).alias("n_dps"),
        F.sum(both.cast("long")).alias("n_both"),
        F.sum(
            (both & (F.col("alarmState_a") == F.col("alarmState_b"))).cast("long")
        ).alias("n_state_match"),
        F.max((F.col("alarmState_a") == 2).cast("int")).alias("verdict_a"),
        F.max((F.col("alarmState_b") == 2).cast("int")).alias("verdict_b"),
    ]
    if "p_abs_diff" in diff.columns:
        aggs += [
            F.round(F.max("p_abs_diff"), 6).alias("p_max_diff"),
            F.round(F.avg("p_abs_diff"), 6).alias("p_mean_diff"),
            F.sum(
                (F.col("p_abs_diff") <= prob_tol).cast("long")
            ).alias("n_within_tol"),
        ]
    out = diff.groupBy(event_col).agg(*aggs)
    return out.withColumn(
        "verdict_match", (F.col("verdict_a") == F.col("verdict_b")).cast("int")
    )


def overall_diff_stats(summary: DataFrame) -> DataFrame:
    """Single-row report footer: totals + agreement rates across events
    (the reference's end-of-run VALIDATION REPORT block)."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("n_dps").alias("n_dps"),
        F.sum("n_both").alias("n_both"),
        F.sum("n_state_match").alias("n_state_match"),
        F.round(
            F.sum("n_state_match") / F.sum("n_both").cast("double"), 6
        ).alias("state_agree_rate"),
        F.sum("verdict_match").alias("n_verdict_match"),
        F.round(
            F.sum("verdict_match") / F.count(F.lit(1)).cast("double"), 6
        ).alias("verdict_agree_rate"),
    ]
    if "p_max_diff" in summary.columns:
        aggs += [
            F.round(F.max("p_max_diff"), 6).alias("p_max_diff"),
            F.round(F.avg("p_mean_diff"), 6).alias("p_mean_diff_avg"),
        ]
    return summary.agg(*aggs)


def differential_report(
    events_dp: DataFrame,
    alg_a: AlgFactory,
    alg_b: AlgFactory,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    prob_tol: float = 1e-4,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run two registered backends over one datapoint frame and return
    (per_dp_diff, per_event_summary, overall_stats) — the three tables of
    the reference's validation report, as composable DataFrames."""
    diff = per_dp_diff(
        alg_a(events_dp), alg_b(events_dp), event_col, ts_col
    )
    summary = event_diff_summary(diff, event_col, prob_tol)
    return diff, summary, overall_diff_stats(summary)


def write_differential_report(
    out_dir: str,
    summary: DataFrame,
    overall: DataFrame,
    name_a: str = "backendA",
    name_b: str = "backendB",
    event_col: str = "eventId",
    max_rows: int = 100_000,
) -> dict[str, str]:
    """Render the validation report through the report layer's artifact
    conventions (results.py style: bounded collect, CSV + summary txt —
    the reference's end-of-run VALIDATION REPORT block,
    compare_streaming_algorithms.py:434+).

    All statistics come from DataFrame aggregations; the collect is the
    bounded per-event table only.
    """
    import os

    from openseizuredatabase_spark.reports.results import _check_cap

    rows = summary.orderBy(event_col).collect()
    _check_cap(len(rows), max_rows, "differential summary")
    os.makedirs(out_dir, exist_ok=True)

    has_p = rows and "p_max_diff" in rows[0].asDict()
    csv_path = os.path.join(out_dir, "differential_events.csv")
    with open(csv_path, "w") as f:
        header = (
            f"{event_col}, n_dps, n_both, n_state_match, "
            f"{name_a}_verdict, {name_b}_verdict, verdict_match"
        )
        if has_p:
            header += ", p_max_diff, p_mean_diff, n_within_tol"
        f.write(header + "\n")
        for r in rows:
            line = (
                f"{r[event_col]}, {r['n_dps']}, {r['n_both']}, "
                f"{r['n_state_match']}, {r['verdict_a']}, "
                f"{r['verdict_b']}, {r['verdict_match']}"
            )
            if has_p:
                line += (
                    f", {r['p_max_diff']}, {r['p_mean_diff']}, "
                    f"{r['n_within_tol']}"
                )
            f.write(line + "\n")

    o = overall.collect()[0]
    txt_path = os.path.join(out_dir, "differential_summary.txt")
    with open(txt_path, "w") as f:
        f.write("Differential Validation Report\n")
        f.write(f"  backends: {name_a} vs {name_b}\n\n")
        f.write(f"  events compared     = {o['n_events']}\n")
        f.write(f"  datapoints (union)  = {o['n_dps']}\n")
        f.write(f"  datapoints (both)   = {o['n_both']}\n")
        f.write(
            f"  state agreement     = {o['n_state_match']}"
            f" ({100.0 * (o['state_agree_rate'] or 0):.2f}%)\n"
        )
        f.write(
            f"  verdict agreement   = {o['n_verdict_match']}"
            f" ({100.0 * (o['verdict_agree_rate'] or 0):.2f}%)\n"
        )
        if "p_max_diff" in o.asDict():
            f.write(f"  max |p diff|        = {o['p_max_diff']}\n")
            f.write(f"  mean |p diff|       = {o['p_mean_diff_avg']}\n")
    return {"events_csv": csv_path, "summary_txt": txt_path}
