"""Join operators (reference J1-J6).

The reference only has id lookups and dict-map enrichment over in-memory
lists (libosd/osdDbConnection.py:254-303, nnTester.py:1430-1456). Here
they are real joins with explicit physical intent: small dimension →
broadcast hash join (no shuffle of the fact side); snapshot
reconciliation → union + window dedup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich(fact: DataFrame, dim: DataFrame, key: str | Sequence[str], how: str = "left") -> DataFrame:
    """J3/J4: broadcast-hash enrichment of a fact table with metadata."""
    return fact.join(F.broadcast(dim), key, how)


def snapshot_merge(
    snapshots: Sequence[tuple[str, DataFrame]],
    key: str,
    prefer_order: Sequence[str],
) -> DataFrame:
    """J5: merge DB snapshots by key; the earliest source in
    ``prefer_order`` wins (merge_json.py:119-147 'reference set wins').

    unionByName + one row_number window — a single shuffle on the key.
    """
    tagged = []
    for src, df in snapshots:
        tagged.append(df.withColumn("src", F.lit(src)))
    all_rows = tagged[0]
    for t in tagged[1:]:
        all_rows = all_rows.unionByName(t)
    prec = None
    for i, src in enumerate(prefer_order):
        prec = (
            F.when(F.col("src") == src, i)
            if prec is None
            else prec.when(F.col("src") == src, i)
        )
    w = Window.partitionBy(key).orderBy(prec.asc(), F.col("src").asc())
    return (
        all_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def new_keys(server: DataFrame, local: DataFrame, key: str) -> DataFrame:
    """J6: keys present on the server but not locally (left_anti)."""
    return server.select(key).distinct().join(local.select(key).distinct(), key, "left_anti")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_secs: int,
) -> DataFrame:
    """Many-to-many range join — every (point, interval) pair with
    ``start <= ts <= end`` on the same key — via interval bucketing.

    The as-of/window trick (j4) only finds the LATEST interval; when a
    point can fall inside SEVERAL overlapping intervals (tidy_db.py's
    seizure windows can overlap after curator edits) a real join is
    required, and Spark plans a naive ts-inequality join as
    BroadcastNestedLoop/cartesian — O(n*m), dead at lake scale.

    Shape: each interval explodes to the epoch buckets it covers
    (ceil(len/bucket)+1 rows — pick ``bucket_secs`` >= the typical
    interval length so fan-out is ~2); each point maps to exactly ONE
    bucket, so the (key, bucket) equi-join emits every qualifying pair
    exactly once (no post-dedup) and the exact range predicate filters
    in place. One shuffle each side, map-side fan-out only.
    """
    b = lambda c: F.floor(F.unix_timestamp(F.col(c)) / bucket_secs)
    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(b(start_col), b(end_col))),
    )
    pt = points.withColumn("__b", b(ts_col))
    joined = pt.join(iv, [key, "__b"]).filter(
        (F.col(start_col) <= F.col(ts_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__b")
