"""Data-augmentation operators (reference M4-M7).

Determinism stance (SURVEY §7.4 risk 7): the reference mixes seeded and
unseeded numpy RNG (augmentData.py:163 vs :259-261). Spark's rand/randn
are seeded but partition-layout-dependent, which breaks reproducibility
under repartitioning. We therefore derive every random draw from
md5(seed, id, copy, index) — bit-stable under any partitioning, any
cluster size, any engine. This is a deliberate, documented divergence
from the reference's RNG stream (same distribution, different draws).
"""

from __future__ import annotations

import math
import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openseizuredatabase_spark.operators.splits import oversample_by_factor

TWO_PI = 2.0 * math.pi
_HASH_DENOM = float(1 << 60)  # md5_long yields 60-bit ints


def _unit_hash(parts: Column) -> Column:
    """Deterministic uniform(0,1) from a string key (never exactly 0)."""
    h = F.conv(F.substring(F.md5(parts), 1, 15), 16, 10).cast("double")
    return (h + 0.5) / _HASH_DENOM


def gaussian_noise_expr(key: Column, sigma: float) -> Column:
    """Box-Muller normal(0, sigma) from two independent hash-uniforms."""
    u1 = _unit_hash(F.concat_ws(":", F.lit("u1"), key))
    u2 = _unit_hash(F.concat_ws(":", F.lit("u2"), key))
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(TWO_PI) * u2) * sigma


def noise_augment(
    df: DataFrame,
    id_col: str,
    signal_col: str,
    n_copies: int,
    sigma: float,
    seed: int = 0,
) -> DataFrame:
    """M5: per row emit n_copies noisy copies of the signal array (plus
    the original as copy 0), noise ~ N(0, sigma) per element.

    Pure expressions: explode(sequence) for the copies, transform() for
    the per-element noise — no shuffle, no Python, deterministic.
    """
    copies = oversample_by_factor(df, id_col, F.lit(n_copies + 1))
    is_orig = F.col("__copy") == 0
    key_prefix = F.concat_ws(
        ":",
        F.lit(str(seed)),
        F.col(id_col).cast("string"),
        F.col("__copy").cast("string"),
    )

    def noisy(x: Column, i: Column) -> Column:
        return x + gaussian_noise_expr(
            F.concat_ws(":", key_prefix, i.cast("string")), sigma
        )

    sig = F.when(is_orig, F.col(signal_col)).otherwise(
        F.zip_with(
            F.col(signal_col),
            F.transform(F.col(signal_col), lambda _, i: i),
            lambda x, i: noisy(x, i),
        )
    )
    return copies.withColumn(signal_col, sig).drop("__copy")


def user_balance_factors(
    df: DataFrame, user_col: str, id_col: str
) -> DataFrame:
    """M4: per-user replication factor ceil(max_user_count / user_count)
    so under-represented users catch up to the largest
    (augmentData.py:126-184). Tiny aggregate → broadcast back."""
    counts = df.groupBy(user_col).agg(F.countDistinct(id_col).alias("__cnt"))
    max_cnt = counts.agg(F.max("__cnt").alias("__max"))
    return counts.crossJoin(F.broadcast(max_cnt)).select(
        user_col,
        F.ceil(F.col("__max") / F.col("__cnt")).cast("int").alias("balance_factor"),
    )


def user_balance_augment(df: DataFrame, user_col: str, id_col: str) -> DataFrame:
    factors = user_balance_factors(df, user_col, id_col)
    return oversample_by_factor(
        df.join(F.broadcast(factors), user_col), id_col, F.col("balance_factor")
    ).drop("balance_factor", "__copy")


def duplicate_class(
    df: DataFrame, id_col: str, pred: Column, factor: int
) -> DataFrame:
    """M7: replicate rows matching ``pred`` (tonic-clonic duplication,
    augmentData.py:772-879) ``factor``× and union with the rest."""
    dup = oversample_by_factor(df.filter(pred), id_col, F.lit(factor)).drop("__copy")
    return df.filter(~pred).withColumn(
        "copy_id", F.col(id_col).cast("string")
    ).unionByName(dup)


def phase_augment(
    events_dp: DataFrame,
    event_col: str,
    ts_col: str,
    signal_col: str,
    window_len: int = 125,
    n_offsets: int = 5,
) -> DataFrame:
    """M6 phase augmentation (augmentData.py:316-470): concatenate an
    event's samples; for each phase offset slide non-overlapping
    window_len windows → synthetic datapoint rows with ids
    `{event}-phase{k}` (C20 convention).

    Per-event applyInPandas: signal concat is inherently per-event and
    events are small (minutes); groups parallelize across executors.
    """
    step = window_len // n_offsets
    out_schema = (
        f"{event_col} long, phase_id string, window_idx int, "
        f"{signal_col} array<double>"
    )

    def per_event(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        sig = np.concatenate([np.asarray(s, dtype=float) for s in pdf[signal_col]])
        eid = pdf[event_col].iloc[0]
        out = []
        for k in range(n_offsets):
            off = k * step
            n_win = (len(sig) - off) // window_len
            for w in range(n_win):
                seg = sig[off + w * window_len : off + (w + 1) * window_len]
                out.append(
                    {
                        event_col: eid,
                        "phase_id": f"{eid}-phase{k}",
                        "window_idx": w,
                        signal_col: seg.tolist(),
                    }
                )
        return pd.DataFrame(
            out, columns=[event_col, "phase_id", "window_idx", signal_col]
        )

    return (
        events_dp.select(event_col, ts_col, signal_col)
        .groupBy(event_col)
        .applyInPandas(per_event, out_schema)
    )
