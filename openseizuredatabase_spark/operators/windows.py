"""Window-function / time-series operators (reference W1-W12).

Everything here is a plain Spark Window transform — one shuffle on the
partition key, no Python. The sequential-recurrence operators (W10 alarm
machine) live in ``detection/`` because they need applyInPandas.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_s(col: Column) -> Column:
    """Fractional epoch seconds (microsecond precision, exact in double).

    NOT unix_timestamp(), which truncates to whole seconds and diverges
    from any fractional-epoch implementation on sub-second data.
    """
    return col.cast("double")


def time_diffs(df: DataFrame, group_cols: Sequence[str], ts_col: str) -> DataFrame:
    """Per-group ordered time delta to the previous row, seconds (W4)."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col).asc())
    return df.withColumn(
        "t_diff_s",
        epoch_s(F.col(ts_col)) - epoch_s(F.lag(ts_col).over(w)),
    )


def gap_census(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    gap_thresh_s: float,
    extra_thresh_s: float,
) -> DataFrame:
    """W4: count gaps (diff > gap_thresh) and extras (diff < extra_thresh)
    per group — eventAnalyser.py:180-191 semantics on any table."""
    d = time_diffs(df, group_cols, ts_col)
    return d.groupBy(*group_cols).agg(
        F.count(F.when(F.col("t_diff_s") > gap_thresh_s, 1)).alias("n_gaps"),
        F.count(F.when(F.col("t_diff_s") < extra_thresh_s, 1)).alias("n_extras"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def gap_fill_rows(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    grid_secs: int,
    min_gap_secs: int,
) -> DataFrame:
    """W3 gap repair, row-synthesis half: for every gap > min_gap_secs
    emit floor(gap/grid)-capped filler timestamps on the grid after the
    previous row. Returns (group_cols..., fill_epoch long).

    The reference walks datapoints in Python and inserts zero-filled dicts
    (flattenData.py:240-342); here `sequence()+explode` generates the same
    rows declaratively so Catalyst parallelizes per group.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col).asc())
    prev = F.lag(epoch_s(F.col(ts_col))).over(w)
    cur = epoch_s(F.col(ts_col))
    gap = cur - prev
    # __n must derive from the materialized __gap column: re-using the
    # window expression after .filter() would recompute lag() over the
    # filtered rows and pair different neighbors
    d = (
        df.select(*group_cols, F.col(ts_col))
        .withColumn("__prev", prev)
        .withColumn("__gap", gap)
        .filter(F.col("__gap") > min_gap_secs)
        .withColumn("__n", F.floor(F.col("__gap") / grid_secs))
    )
    return d.select(
        *group_cols,
        F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__i"),
        F.col("__prev"),
    ).select(
        *group_cols,
        # explicit floor: Spark's double→long cast truncates while other
        # engines round — keep the grid timestamp engine-independent
        F.floor(F.col("__prev") + F.col("__i") * grid_secs).cast("long").alias("fill_epoch"),
    )


def drop_overlaps(
    df: DataFrame, group_cols: Sequence[str], ts_col: str, min_spacing_s: float
) -> DataFrame:
    """W3 overlap half, PAIRWISE form: drop rows closer than min_spacing
    to the predecessor. Note this compares each row to its raw
    predecessor; the reference's dp repair compares to the last KEPT
    row (a stateful walk) — that literal variant is
    :func:`repair_dp_stream`."""
    d = time_diffs(df, group_cols, ts_col)
    return d.filter(
        F.col("t_diff_s").isNull() | (F.col("t_diff_s") >= min_spacing_s)
    ).drop("t_diff_s")


def repair_dp_stream(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    dp_duration_s: float = 5.0,
    tolerance_s: float = 2.0,
) -> DataFrame:
    """W3 literal datapoint-stream repair — the flattenData.py:274-337
    walk, semantics exact (round-8 fidelity audit):

    * each dp's START is its dataTime minus dp_duration; the carried
      state is the END time of the last KEPT dp
    * gap  (start − last_end >  tolerance): emit
      ``int(gap / dp_duration)`` zero-fill rows at
      ``last_end + dp_duration·i`` (i = 1..n) — a >tolerance gap
      shorter than one dp emits ZERO fills — then keep the dp
    * overlap (start − last_end < −tolerance): SKIP the dp, carried
      end UNCHANGED, so a run of overlaps all compare against the last
      kept dp (lag()-pairwise diffs cannot express this)
    * otherwise keep the dp; the carried end moves to its dataTime

    The walk is order-dependent per key → one applyInPandas stage (the
    run_osd_alg idiom; keys parallel across executors, the reference
    is serial). Output: (group..., epoch_s double, kind 'dp'|'fill').
    """
    import pandas as pd

    group_schema = ", ".join(f"{c} long" for c in group_cols)
    out_schema = f"{group_schema}, epoch_s double, kind string"

    def per_key(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        keys = [pdf[c].iloc[0] for c in group_cols]
        rows = []
        last_end = None
        for ts in pdf[ts_col]:
            t = float(ts.timestamp()) if hasattr(ts, "timestamp") else float(ts)
            if last_end is None:
                rows.append((*keys, t, "dp"))
                last_end = t
                continue
            gap = (t - dp_duration_s) - last_end
            if gap > tolerance_s:
                n = int(gap / dp_duration_s)
                for i in range(n):
                    rows.append(
                        (*keys, last_end + dp_duration_s * (i + 1), "fill")
                    )
                # falls through: the dp itself is kept (flattenData
                # appends it after the fill loop)
            elif gap < -tolerance_s:
                continue  # skipped; last_end pinned to the kept dp
            rows.append((*keys, t, "dp"))
            last_end = t
        return pd.DataFrame(rows, columns=[*group_cols, "epoch_s", "kind"])

    return (
        df.select(*group_cols, ts_col)
        .groupBy(*group_cols)
        .applyInPandas(per_key, out_schema)
    )


def feature_history(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    feature_cols: Sequence[str],
    n_hist: int,
) -> DataFrame:
    """W6: per feature emit {col}_t0..{col}_t{n-1} lags + {col}_mean over
    the trailing n rows; drop the first n-1 rows of each group
    (addFeatureHistory.py:21-39)."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col).asc())
    out = df
    for c in feature_cols:
        for h in range(n_hist):
            out = out.withColumn(f"{c}_t{h}", F.lag(F.col(c), h).over(w))
        out = out.withColumn(
            f"{c}_mean",
            F.avg(F.col(c)).over(w.rowsBetween(-(n_hist - 1), 0)),
        )
    out = out.withColumn("__rn", F.row_number().over(w))
    return out.filter(F.col("__rn") >= n_hist).drop("__rn")


def moving_average(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    window_rows: int,
    missing_sentinel: float | None = None,
) -> DataFrame:
    """W7: trailing moving average over the last ``window_rows`` rows,
    ignoring sentinel values (hrAlg.py:55-113 semantics)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(-(window_rows - 1), 0)
    )
    v = F.col(value_col)
    valid = v if missing_sentinel is None else F.when(v != missing_sentinel, v)
    return df.withColumn("mov_avg", F.avg(valid).over(w))


def epoch_windows(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    window_rows: int,
    step_rows: int,
) -> DataFrame:
    """W5 epoch segmentation, relational form: overlapping fixed-length
    row windows every ``step_rows`` rows, with per-window aggregate.

    Uses a forward window frame + row_number filter — no per-group
    collect, no UDF; survives arbitrary group sizes.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col).asc())
    frame = w.rowsBetween(0, window_rows - 1)
    d = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols)))
        .withColumn("win_avg", F.avg(F.col(value_col)).over(frame))
        .withColumn("win_n", F.count(F.col(value_col)).over(frame))
    )
    return (
        d.filter(
            ((F.col("__rn") - 1) % step_rows == 0)
            & (F.col("__rn") + window_rows - 1 <= F.col("__n"))
        )
        .select(
            *group_cols,
            (F.col("__rn") - 1).alias("epoch_start_rn"),
            F.col("win_avg"),
            F.col("win_n"),
        )
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """W12: rank rows in each group, keep top k (deterministic order)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cumulative_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "cum_sum",
) -> DataFrame:
    """A8: running total per group in order (cumulative monthly counts)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(F.col(value_col)).over(w))
