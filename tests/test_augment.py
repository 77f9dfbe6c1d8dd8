"""Augmentation operator tests: determinism, distribution sanity, fan-out."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.operators.augment import (
    duplicate_class,
    noise_augment,
    phase_augment,
    user_balance_augment,
)


@pytest.fixture(scope="module")
def signals(spark):
    return spark.createDataFrame(
        [Row(id=i, label="s" if i < 2 else "n", sig=[100.0] * 50) for i in range(5)]
    )


def test_noise_augment_counts_and_original_preserved(signals):
    out = noise_augment(signals, "id", "sig", n_copies=2, sigma=5.0, seed=1)
    assert out.count() == 15  # 5 × (1 original + 2 copies)
    rows = out.filter("copy_id like '%-0'").collect()
    assert all(r.sig == [100.0] * 50 for r in rows)  # copy 0 untouched


def test_noise_augment_deterministic_and_distributed(signals):
    out1 = {
        r.copy_id: r.sig
        for r in noise_augment(signals, "id", "sig", 2, 5.0, seed=1).collect()
    }
    out2 = {
        r.copy_id: r.sig
        for r in noise_augment(
            signals.repartition(5), "id", "sig", 2, 5.0, seed=1
        ).collect()
    }
    assert out1 == out2  # stable under repartitioning
    noise = np.array(
        [v - 100.0 for cid, s in out1.items() if not cid.endswith("-0") for v in s]
    )
    assert abs(noise.mean()) < 1.0
    assert 4.0 < noise.std() < 6.0  # sigma=5
    out3 = {
        r.copy_id: r.sig
        for r in noise_augment(signals, "id", "sig", 2, 5.0, seed=2).collect()
    }
    assert out1 != out3  # seed matters


def test_user_balance_augment(spark):
    rows = [Row(user="a", id=i) for i in range(4)] + [Row(user="b", id=10)]
    out = user_balance_augment(spark.createDataFrame(rows), "user", "id")
    counts = {r.user: r.n for r in out.groupBy("user").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 4, "b": 4}  # b replicated ceil(4/1)=4×


def test_duplicate_class(signals):
    out = duplicate_class(signals, "id", F.col("label") == "s", factor=3)
    counts = {r.label: r.n for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s": 6, "n": 3}


def test_phase_augment_window_math(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(eventId=7, t=base + dt.timedelta(seconds=5 * i), sig=[float(i)] * 125)
        for i in range(4)  # 500 concatenated samples
    ]
    out = phase_augment(
        spark.createDataFrame(rows), "eventId", "t", "sig",
        window_len=125, n_offsets=5,
    ).collect()
    # offset k*25: n_windows = (500 - 25k) // 125 → k=0:4, k=1..4: 3 → 16
    assert len(out) == 16
    phases = {r.phase_id for r in out}
    assert phases == {f"7-phase{k}" for k in range(5)}
    assert all(len(r.sig) == 125 for r in out)
    w0 = [r for r in out if r.phase_id == "7-phase0" and r.window_idx == 0][0]
    assert w0.sig == [0.0] * 125  # first window = first dp's samples
