"""Aggregation & metrics operators (reference A1-A11).

All conditional aggregations — one groupBy each, partial aggregation
(map-side combine) before the shuffle, so they scale with input size not
group count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
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


def event_level_metrics(
    df: DataFrame,
    event_col: str,
    label: Column,
    p: Column,
    threshold: float = 0.5,
) -> DataFrame:
    """Event-level TPR/FPR from datapoint-level probabilities
    (eventLevelMetrics.py:13-90): an event's prediction is the MAX
    probability over its datapoints (nnTester's rule), thresholded at
    0.5; datapoint-level TPR/FPR ride along for the comparison the
    reference prints.

    Two aggregations: datapoints → events (shuffle on the event key —
    partial max/count combine map-side), events → one metrics row (a
    tiny final reduce). ``label`` is a per-datapoint expression whose
    event-level truth is its MAX over the event (constant-per-event
    labels pass through unchanged).
    """
    ev = df.groupBy(event_col).agg(
        F.max(label.cast("int")).cast("boolean").alias("__label"),
        F.max(p).alias("__max_p"),
        F.count(F.lit(1)).alias("__n_dp"),
        F.count(F.when(p >= threshold, 1)).alias("__n_dp_pos"),
    )
    lbl = F.col("__label")
    pred = F.col("__max_p") >= threshold
    tp = F.count(F.when(lbl & pred, 1)).cast("double")
    fp = F.count(F.when(~lbl & pred, 1)).cast("double")
    tn = F.count(F.when(~lbl & ~pred, 1)).cast("double")
    fn = F.count(F.when(lbl & ~pred, 1)).cast("double")
    dp_tp = F.sum(F.when(lbl, F.col("__n_dp_pos"))).cast("double")
    dp_fp = F.sum(F.when(~lbl, F.col("__n_dp_pos"))).cast("double")
    dp_pos = F.sum(F.when(lbl, F.col("__n_dp"))).cast("double")
    dp_neg = F.sum(F.when(~lbl, F.col("__n_dp"))).cast("double")
    return ev.groupBy().agg(
        tp.cast("long").alias("event_tp"),
        fp.cast("long").alias("event_fp"),
        tn.cast("long").alias("event_tn"),
        fn.cast("long").alias("event_fn"),
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(lbl, 1)).alias("n_seizure_events"),
        F.round(F.try_divide(tp, tp + fn), 6).alias("event_tpr"),
        F.round(F.try_divide(fp, fp + tn), 6).alias("event_fpr"),
        F.round(F.try_divide(dp_tp, dp_pos), 6).alias("datapoint_tpr"),
        F.round(F.try_divide(dp_fp, dp_neg), 6).alias("datapoint_fpr"),
    )


def threshold_sweep(
    df: DataFrame,
    event_col: str,
    label: Column,
    p: Column,
    thresholds: Sequence[float],
) -> DataFrame:
    """Event-level TPR/FPR at a grid of decision thresholds
    (nnTester.py:1578-1616 event_threshold_list loop; the ROC points of
    nnTester.py:1648-1664): per threshold, an event fires if its MAX
    datapoint probability reaches it.

    The reference loops thresholds in Python over a pandas frame,
    re-scanning per threshold. Here the expensive datapoint→event
    aggregate runs ONCE; the sweep then explodes a constant ``len(
    thresholds)``-row fan-out of the (small) event table and re-
    aggregates with map-side combine — a 100-point grid changes the
    plan's shape not at all, and the datapoints are never re-read.
    """
    ev = df.groupBy(event_col).agg(
        F.max(label.cast("int")).cast("boolean").alias("__label"),
        F.max(p).alias("__max_p"),
    )
    grid = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    sw = ev.select("__label", "__max_p", grid)
    lbl = F.col("__label")
    pred = F.col("__max_p") >= F.col("threshold")
    tp = F.count(F.when(lbl & pred, 1)).cast("double")
    fp = F.count(F.when(~lbl & pred, 1)).cast("double")
    tn = F.count(F.when(~lbl & ~pred, 1)).cast("double")
    fn = F.count(F.when(lbl & ~pred, 1)).cast("double")
    return sw.groupBy("threshold").agg(
        tp.cast("long").alias("event_tp"),
        fp.cast("long").alias("event_fp"),
        tn.cast("long").alias("event_tn"),
        fn.cast("long").alias("event_fn"),
        F.round(F.try_divide(tp, tp + fn), 6).alias("event_tpr"),
        F.round(F.try_divide(fp, fp + tn), 6).alias("event_fpr"),
    )


def auc_rank(
    df: DataFrame, label: Column, p: Column, ndigits: int = 6
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney rank identity —
    AUC = P(p_pos > p_neg) + 0.5·P(p_pos = p_neg) — the scalar behind
    the reference's ROC plot (nnTester.py:1648-1664).

    Scale shape: scores quantize to ``ndigits`` decimals, so the
    per-bin pos/neg histogram (ONE partial-combined shuffle over the
    data) has at most 10^ndigits·range rows regardless of corpus size;
    the cumulative window then runs over the BOUNDED bin table, not the
    data — no global sort of datapoints ever happens. Ties (same bin)
    count half, exactly the rank-statistic convention.
    """
    bin_ = F.round(p, ndigits).alias("bin")
    lbl = label.cast("boolean")
    bins = (
        df.select(bin_, lbl.alias("__l"))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("__l"), 1)).alias("n_pos"),
            F.count(F.when(~F.col("__l"), 1)).alias("n_neg"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    contrib = F.col("n_pos") * (
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).cast("double")
        + 0.5 * F.col("n_neg")
    )
    per_bin = bins.select(
        contrib.alias("__c"), "n_pos", "n_neg"
    )
    n_pos = F.sum("n_pos").cast("double")
    n_neg = F.sum("n_neg").cast("double")
    return per_bin.groupBy().agg(
        n_pos.cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
        F.round(
            F.try_divide(F.sum("__c"), n_pos * n_neg), 6
        ).alias("auc"),
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
