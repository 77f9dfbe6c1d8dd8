"""Standalone index-builder CLI — `curator_tools/makeIndex.py:1-66` as a
thin wrapper over the engine's S5 CSV index writer
(sources/sinks.write_csv_index): project the metadata columns, order by
time with a range-partitioned sort (global order across part files, no
single-reducer bottleneck), quote everything.

Usage: python tools/make_index.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from openseizuredatabase_spark.sources.sinks import write_csv_index
    from openseizuredatabase_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_time"),
        "user_id",
        "event_type",
    )
    write_csv_index(
        ev, out_dir, ["event_id", "iso_time", "user_id", "event_type"],
        order_by="iso_time",
    )


def main(argv=None) -> int:
    args = (argv if argv is not None else sys.argv[1:]) or []
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    out_dir = args[1] if len(args) > 1 else "/tmp/osdb_index"

    from openseizuredatabase_spark.session import get_spark

    spark = get_spark("make_index")
    build(spark, sf_dir, out_dir)
    print(f"index written to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
