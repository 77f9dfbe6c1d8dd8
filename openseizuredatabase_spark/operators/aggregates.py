"""Aggregation & metrics operators (reference A1-A11).

All conditional aggregations — one groupBy each, partial aggregation
(map-side combine) before the shuffle, so they scale with input size not
group count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def presence_flags(
    df: DataFrame,
    group_cols: Sequence[str],
    valid_pred: Column,
    flag_name: str,
    threshold: float = 0.5,
) -> DataFrame:
    """A3: per group, flag = (valid rows >= threshold * all rows).

    Mirrors tidy_db.py:91-146 (has3dData/hasHrData: ≥50% of an event's
    datapoints valid) as a single conditional aggregation.
    """
    return df.groupBy(*group_cols).agg(
        (
            F.count(F.when(valid_pred, 1)) >= threshold * F.count(F.lit(1))
        ).alias(flag_name),
        F.count(F.when(valid_pred, 1)).alias("n_valid"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def max_severity(
    df: DataFrame,
    group_cols: Sequence[str],
    severity: Column,
) -> DataFrame:
    """A4: worst state per group (severity mapping is caller-supplied,
    cf. alg_runner.py:27-40 warn<alarm<fall ordering)."""
    return df.groupBy(*group_cols).agg(F.max(severity).alias("max_severity"))


def event_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    pred_col: Column,
    prob_col: Column,
) -> DataFrame:
    """A5: event-level prediction rollup — any positive datapoint makes
    the event positive; keep the max probability (nnTester.py:1345-1384).
    """
    return df.groupBy(*group_cols).agg(
        F.max(pred_col.cast("int")).alias("pred"),
        F.max(prob_col).alias("max_prob"),
        F.count(F.lit(1)).alias("n_dp"),
    )


def confusion_matrix(
    df: DataFrame, label: Column, pred: Column, group_cols: Sequence[str] = ()
) -> DataFrame:
    """A6: NTP/NFP/NTN/NFN conditional aggregation
    (results.py:76-160, nnTester.py:1925-1954)."""
    l_ = label.cast("boolean")
    p = pred.cast("boolean")
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return gb.agg(
        F.count(F.when(l_ & p, 1)).alias("ntp"),
        F.count(F.when(~l_ & p, 1)).alias("nfp"),
        F.count(F.when(~l_ & ~p, 1)).alias("ntn"),
        F.count(F.when(l_ & ~p, 1)).alias("nfn"),
    )


def derived_metrics(cm: DataFrame, ndigits: int = 6) -> DataFrame:
    """A7: TPR/TNR/precision/F1 from confusion counts
    (results.py:233-240; nnTester.py:1558-1575). Rounded for stable
    cross-engine comparison."""
    tp, fp, tn, fn = (F.col(c).cast("double") for c in ("ntp", "nfp", "ntn", "nfn"))
    # ANSI-safe: an algorithm that predicts no positives (tp+fp=0) or a
    # single-class label set must yield NULL, not DIVIDE_BY_ZERO
    tpr = F.try_divide(tp, tp + fn)
    tnr = F.try_divide(tn, tn + fp)
    prec = F.try_divide(tp, tp + fp)
    f1 = F.try_divide(2 * prec * tpr, prec + tpr)
    return cm.select(
        "*",
        F.round(tpr, ndigits).alias("tpr"),
        F.round(tnr, ndigits).alias("tnr"),
        F.round(prec, ndigits).alias("precision"),
        F.round(f1, ndigits).alias("f1"),
    )


def small_group_rebucket(
    df: DataFrame,
    key_col: str,
    min_count: int,
    other_label: str = "Other",
) -> DataFrame:
    """A11: relabel keys with fewer than min_count rows as 'Other' then
    re-aggregate (analyzeEventResults.py:123-208). Two aggregations, both
    map-side-combinable; the per-key count join broadcasts."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__kc"))
    relabeled = (
        df.join(F.broadcast(counts), key_col)
        .withColumn(
            "cohort",
            F.when(F.col("__kc") >= min_count, F.col(key_col).cast("string")).otherwise(
                F.lit(other_label)
            ),
        )
        .drop("__kc")
    )
    return relabeled
