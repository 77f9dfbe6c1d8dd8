"""Composable filter builder (reference F1-F13).

The reference builds include/exclude id-sets with linear scans over an
in-memory event list (libosd/osdDbConnection.py:405-537) and matches
strings case-insensitively by substring (:540-587). Here a filter spec is
compiled to ONE Catalyst predicate so parquet scans get the whole
conjunction pushed down — no id-set materialization, no second pass.

Spec format (all keys optional):
    {"include": {col: [values...]}, "exclude": {col: [values...]},
     "contains": {col: [substrings...]},          # case-insensitive OR
     "not_contains": {col: [substrings...]},
     "between": {col: (lo, hi)},
     "require": [col, ...]}                        # boolean flags / not-null
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _contains_any(col: str, subs: Sequence[str]) -> Column:
    preds = [F.lower(F.col(col).cast("string")).contains(s.lower()) for s in subs]
    return reduce(lambda a, b: a | b, preds)


def compile_filter(spec: Mapping[str, Any]) -> Column:
    """Compile a filter spec into a single boolean Column."""
    preds: list[Column] = []
    for col, values in spec.get("include", {}).items():
        preds.append(F.col(col).isin(list(values)))
    for col, values in spec.get("exclude", {}).items():
        preds.append(~F.col(col).isin(list(values)))
    for col, subs in spec.get("contains", {}).items():
        preds.append(_contains_any(col, subs))
    for col, subs in spec.get("not_contains", {}).items():
        preds.append(~_contains_any(col, subs) | F.col(col).isNull())
    for col, (lo, hi) in spec.get("between", {}).items():
        preds.append(F.col(col).between(lo, hi))
    for col in spec.get("require", []):
        c = F.col(col)
        preds.append(c.isNotNull() & c.cast("boolean"))
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def apply_filter(df: DataFrame, spec: Mapping[str, Any]) -> DataFrame:
    return df.filter(compile_filter(spec))


def anti_join_ids(df: DataFrame, ids: DataFrame, key: str) -> DataFrame:
    """F7/F8: remove rows whose key appears in ``ids`` (left_anti).

    At scale the id list is small (invalid events, training contamination
    guard) → Catalyst broadcasts the right side automatically; the big
    side never shuffles.
    """
    return df.join(ids.select(key).distinct(), key, "left_anti")


def semi_join_ids(df: DataFrame, ids: DataFrame, key: str) -> DataFrame:
    """J2: keep rows whose key appears in ``ids`` (left_semi)."""
    return df.join(ids.select(key).distinct(), key, "left_semi")
