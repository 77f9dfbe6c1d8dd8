"""Executed salting proof: the d16 skew audit RECOMMENDS salting; this
pins that the recommendation works physically — on a frame where one
key owns half the rows, hash-partitioning by the raw key funnels that
half through one shuffle partition, and an 8-way salt spreads it.

The measurement is the real post-shuffle partition row histogram
(spark_partition_id() after repartition(col)), not a model."""

import pytest
from pyspark.sql import functions as F


N_PARTS = 16
SALT = 8


def _partition_histogram(df, *cols):
    return {
        r["pid"]: r["n"]
        for r in (
            df.repartition(N_PARTS, *cols)
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 owns ~half the rows; keys 1..999 share the rest
    return spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 999 + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_skew_concentrates_without_salt(spark, skewed):
    hist = _partition_histogram(skewed, "k")
    assert max(hist.values()) >= 10000  # the hot key's partition


def test_salting_spreads_the_hot_key(spark, skewed):
    # hashed salt: the hot key's rows are the EVEN ids, so a plain
    # v % SALT would only ever produce even salts (half the spread)
    salted = skewed.withColumn("salt", F.pmod(F.hash("v"), SALT))
    hist = _partition_histogram(salted, "k", "salt")
    # the hot key's 10k rows now land on SALT distinct (k, salt) hash
    # keys: even with some landing on the same partition, the worst
    # partition must hold well under the unsalted hot partition's 10k
    assert max(hist.values()) < 10000 / 2


def test_salted_aggregate_matches_unsalted(spark, skewed):
    """Two-stage salted aggregation (partial per (k, salt), then final
    per k) must be value-identical to the direct groupBy."""
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in skewed.withColumn("salt", F.pmod(F.hash("v"), SALT))
        .groupBy("k", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps"))
        .groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
        .collect()
    }
    assert direct == salted
