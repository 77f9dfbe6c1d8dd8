"""Curator ETL pipeline — the makeOsdDb.py equivalent (SURVEY §3.1).

The reference's `makeOsdDb update` downloads events, filters, groups to
unique events, routes to per-category JSON files and writes CSV indexes
(curator_tools/makeOsdDb.py:459-525 orchestration). Here the whole thing
is ONE lazy DataFrame pipeline materialized by a single lake write —
filters reach the scan, dedup is one window, category routing is a
partition column (not N output loops).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openseizuredatabase_spark.operators.dedup import unique_group_representative
from openseizuredatabase_spark.operators.filters import apply_filter
from openseizuredatabase_spark.sources.lake import category_of, write_events_lake
from openseizuredatabase_spark.sources.sinks import write_csv_index

INDEX_COLUMNS = [
    "id",
    "userId",
    "dataTime",
    "type",
    "subType",
    "osdAlarmState",
    "desc",
]


@dataclass(frozen=True)
class CuratorConfig:
    """osdb.cfg.template equivalents."""

    grouping_period_s: int = 180          # "3min" (osdb.cfg.template:3)
    invalid_events: tuple = ()            # invalidEvents (template:29)
    drop_desc_containing: str = "test"    # makeOsdDb.py:156-157
    date_from: str | None = None
    date_to: str | None = None
    data_sources: tuple = ()              # include list; empty = all
    filters: Mapping[str, Any] = field(default_factory=dict)


def curate(events: DataFrame, cfg: CuratorConfig) -> DataFrame:
    """filter → unique-event dedup → category column. Lazy; one pass."""
    out = events
    # F3: drop untagged warnings (keep seizures/falls/real alarms)
    out = out.filter(
        "type = 'Seizure' OR type = 'Fall' OR osdAlarmState <> 1 OR osdAlarmState IS NULL"
    )
    # F4 date range (partition/rowgroup prunable)
    if cfg.date_from:
        out = out.filter(F.col("eventTimestamp") >= F.lit(cfg.date_from))
    if cfg.date_to:
        out = out.filter(F.col("eventTimestamp") <= F.lit(cfg.date_to))
    # F5 'test' text exclusion
    out = out.filter(
        F.col("desc").isNull()
        | ~F.lower(F.col("desc")).contains(cfg.drop_desc_containing)
    )
    # F6 data-source include
    if cfg.data_sources:
        out = out.filter(F.col("dataSourceName").isin(list(cfg.data_sources)))
    # F7 invalid-event removal
    if cfg.invalid_events:
        out = out.filter(~F.col("id").isin(list(cfg.invalid_events)))
    # extra composable filters (F1/F2/F9)
    if cfg.filters:
        out = apply_filter(out, cfg.filters)
    # D1 unique-event grouping: ALARM > tagged-desc > first
    tagged = (
        F.col("desc").isNotNull()
        & (F.length(F.trim("desc")) > 0)
        & ~F.lower(F.col("desc")).contains("null")
    )
    precedence = (
        F.when(F.col("osdAlarmState") == 2, 0).when(tagged, 1).otherwise(2)
    )
    deduped = unique_group_representative(
        out, ["userId", "type"], "eventTimestamp", cfg.grouping_period_s,
        precedence, "id",
    )
    return deduped.withColumn("category", category_of())


def run_curator(
    events: DataFrame,
    cfg: CuratorConfig,
    lake_path: str,
    index_path: str | None = None,
) -> DataFrame:
    """Materialize: partitioned lake write + (optional) CSV index (S5)."""
    curated = curate(events, cfg)
    write_events_lake(curated.drop("category"), lake_path)
    if index_path:
        idx_cols = [c for c in INDEX_COLUMNS if c in curated.columns]
        write_csv_index(curated, index_path, idx_cols, order_by="dataTime")
    return curated
