"""Skew mitigation (SURVEY §4: one user dominates events — A11's 'Other'
bucketing exists precisely because of user skew).

Two tools:
* AQE skew-join handling is ON in the session factory — the first line
  of defense, zero code.
* ``salted_aggregate`` for aggregations whose group key is pathologically
  hot: a two-phase aggregate through a salted intermediate key. Phase 1
  spreads the hot key over ``n_salts`` reducers; phase 2 merges the
  partials. Correct for any algebraic aggregate (sum/count/min/max).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge function per algebraic aggregate kind
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Mapping[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: out_name -> (kind, input column), kind ∈ sum|count|min|max.
    Equivalent to ``df.groupBy(group_cols).agg(...)`` but the hot key's
    phase-1 work is spread over ``n_salts`` partitions.
    """
    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    phase1_aggs = []
    for name, (kind, col) in aggs.items():
        fn = F.count if kind == "count" else getattr(F, kind)
        phase1_aggs.append(fn(col).alias(f"__p_{name}"))
    partial = df.withColumn("__salt", salt).groupBy(*group_cols, "__salt").agg(
        *phase1_aggs
    )
    phase2_aggs = [
        _MERGE[kind](F.col(f"__p_{name}")).alias(name)
        for name, (kind, _) in aggs.items()
    ]
    return partial.groupBy(*group_cols).agg(*phase2_aggs)
