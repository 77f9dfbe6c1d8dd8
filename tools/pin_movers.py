"""Min-of-N pinning for flagged bench movers (round-9 ask #5).

Round-8 flagged four sub-second CORE queries that moved >= 2x vs r7
(d2_gap_clustering, c1_timestamp_cascade, j3_top_orders,
j5_snapshot_merge) with no code change; the verdict asked for a
min-of-5 re-run on an idle box to separate ambient noise from a real
regression. This times each query N times in ONE warm session (same
no-op-sink discipline as bench.py) and prints min/median/all.

Usage: python tools/pin_movers.py [N] [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVERS = [
    "d2_gap_clustering",
    "c1_timestamp_cascade",
    "j3_top_orders",
    "j5_snapshot_merge",
]


def main(argv) -> int:
    n = int(argv[1]) if len(argv) > 1 else 5
    sf = argv[2] if len(argv) > 2 else "/root/testdata/sf0.1"
    names = (
        [q for q in argv[3].split(",") if q] if len(argv) > 3 else MOVERS
    )

    from openseizuredatabase_spark.plans.registry import QUERIES
    from openseizuredatabase_spark.session import get_spark

    spark = get_spark("pin_movers")
    spark.range(1000).count()

    out = {}
    for name in names:
        times = []
        for _ in range(n):
            t0 = time.time()
            QUERIES[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
        out[name] = {
            "min": min(times),
            "median": round(statistics.median(times), 3),
            "runs": times,
        }
    print(json.dumps({"n": n, "sf": sf, "queries": out}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
