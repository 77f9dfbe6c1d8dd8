"""testRunner/dataSummariser report layer — the tables behind
results.py / report.py / summariseData.py, Spark-first.

The reference walks events serially and hand-writes four CSV buckets
with footer statistics (results.py:44-263 saveResults2), a summary text
file (results.py:224-246), and a jinja2 HTML index grouping events into
tcSeizures/allSeizures/falseAlarms/otherEvents
(dataSummariser/summariseData.py:105-205). Here every table is a
DataFrame (distributed, one pass over the per-dp detector output), and
only the final render — inherently a small, human-sized artifact — is
driver-side, with an explicit row cap (the export_small_json policy).

PNG event graphs (report.py:35-135) need matplotlib, absent in this
environment; ``event_graph_frame`` produces the exact per-dp series the
reference plots, ready for any renderer.
"""

from __future__ import annotations

import html
import os
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# results.py:21-37 type2index buckets, in index order
OUTPUT_BUCKETS = ("otherEvents", "allSeizures", "falseAlarms", "nda")

# results.py:100 alarmPhrases (index = alarm state)
ALARM_PHRASES = ("----", "WARN", "ALARM", "FALL", "unused", "MAN_ALARM", "NDA")

# driver-lake analog of the OSDB type strings (a6 convention: 'error'
# events are the seizure class)
DEFAULT_TYPE_MAP = {
    "error": "allSeizures",
    "click": "falseAlarms",
    "signup": "nda",
}


def type_bucket(
    type_col: Column, type_map: Mapping[str, str] | None = None
) -> Column:
    """results.py:28-37 type2index as a CASE column: unmatched types fall
    through to otherEvents."""
    m = DEFAULT_TYPE_MAP if type_map is None else type_map
    expr = F.lit("otherEvents")
    for k, bucket in m.items():
        expr = F.when(F.lower(type_col) == k.lower(), bucket).otherwise(expr)
    return expr


def alarm_phrase(state_col: Column) -> Column:
    """results.py:100,138-143: numeric alarm state → display phrase."""
    expr = F.lit(ALARM_PHRASES[0])
    for i, phrase in enumerate(ALARM_PHRASES):
        expr = F.when(state_col == i, phrase).otherwise(expr)
    return expr


def event_results_table(
    per_dp: DataFrame,
    events_meta: DataFrame,
    alg_names: Sequence[str],
    event_col: str = "eventId",
    type_col: str = "event_type",
    seizure_type: str = "error",
    type_map: Mapping[str, str] | None = None,
) -> DataFrame:
    """The per-event line rows of saveResults2 (results.py:106-165): one
    row per event, one verdict column per algorithm (event alarmed ⇔ any
    dp reached ALARM, warned ⇔ any dp reached WARN), plus the expectation
    and output bucket.

    ``per_dp`` is evaluate_algorithms output (algorithm, eventId,
    alarmState); the pivot is a single shuffle on the event key, and the
    metadata join broadcasts (events ≪ datapoints)."""
    rolled = (
        per_dp.groupBy(event_col)
        .pivot("algorithm", list(alg_names))
        .agg(F.max("alarmState"))
    )
    out = rolled.join(F.broadcast(events_meta), event_col)
    out = out.withColumn("expect_alarm", F.lower(F.col(type_col)) == seizure_type)
    out = out.withColumn("bucket", type_bucket(F.col(type_col), type_map))
    for name in alg_names:
        st = F.coalesce(F.col(name), F.lit(0))
        out = (
            out.withColumn(f"{name}_verdict", alarm_phrase(st))
            .withColumn(f"{name}_alarmed", (st >= 2))
            # results.py:122-136: correct = alarmed == expected
            .withColumn(
                f"{name}_correct",
                ((st >= 2) == F.col("expect_alarm")).cast("int"),
            )
            .drop(name)
        )
    return out


def bucket_footers(
    table: DataFrame,
    alg_names: Sequence[str],
    tc_col: Column | None = None,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """The #Total / #Correct Count / #Correct Prop footer rows per output
    bucket (results.py:178-219), plus the Tonic-Clonic triple for the
    allSeizures bucket when ``tc_col`` marks TC events. ``extra_aggs``
    ride the same single aggregation (one shuffle) rather than forcing
    callers into a second pass + join."""
    aggs = [F.count(F.lit(1)).alias("total")]
    for name in alg_names:
        aggs.append(F.sum(f"{name}_correct").alias(f"{name}_correct"))
        aggs.append(
            F.round(F.avg(f"{name}_correct"), 2).alias(f"{name}_prop")
        )
    aggs.extend(extra_aggs)
    out = table.groupBy("bucket").agg(*aggs)
    if tc_col is not None:
        tc = table.filter((F.col("bucket") == "allSeizures") & tc_col)
        tc_aggs = [F.count(F.lit(1)).alias("total")]
        for name in alg_names:
            tc_aggs.append(F.sum(f"{name}_correct").alias(f"{name}_correct"))
            tc_aggs.append(
                F.round(F.avg(f"{name}_correct"), 2).alias(f"{name}_prop")
            )
        tc_aggs.extend(extra_aggs)
        out = out.unionByName(
            tc.groupBy(F.lit("tonicClonic").alias("bucket")).agg(*tc_aggs)
        )
    return out


def summary_stats(
    table: DataFrame, alg_names: Sequence[str], ndigits: int = 6
) -> DataFrame:
    """testRunner_Summary.txt statistics (results.py:224-246): one row per
    algorithm with NTP/NFP/NTN/NFN and TPR/TNR percentages."""
    from openseizuredatabase_spark.operators.aggregates import (
        confusion_matrix,
        derived_metrics,
    )

    parts = []
    for name in alg_names:
        cm = confusion_matrix(
            table, F.col("expect_alarm"), F.col(f"{name}_alarmed")
        ).select(F.lit(name).alias("algorithm"), "*")
        parts.append(cm)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return derived_metrics(out, ndigits)


def event_summaries(
    events_dp: DataFrame,
    events_meta: DataFrame,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    expected_dt_s: float = 5.0,
) -> DataFrame:
    """dataSummariser summaryObj rows (summariseData.py:150-166): event
    metadata + nDataPoints/nDpGaps/nDpExtras from the gap census
    (eventAnalyser semantics via the W4 operator) + the per-event detail
    URL the index page links."""
    from openseizuredatabase_spark.operators.windows import gap_census

    census = gap_census(
        events_dp,
        [event_col],
        ts_col,
        gap_thresh_s=expected_dt_s * 1.5,
        extra_thresh_s=expected_dt_s * 0.5,
    )
    counts = events_dp.groupBy(event_col).agg(
        F.count(F.lit(1)).alias("nDataPoints")
    )
    out = (
        events_meta.join(F.broadcast(counts), event_col, "left")
        .join(F.broadcast(census), event_col, "left")
        .fillna({"nDataPoints": 0})
    )
    return out.withColumn(
        "url", F.concat(F.lit("Event_"), F.col(event_col), F.lit("_summary/index.html"))
    )


def event_graph_frame(
    per_dp: DataFrame,
    event_id: int,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
) -> DataFrame:
    """report.py:35-135 generateEventGraph data: the per-dp series
    (pSeizure / alarmState / powers — whatever the algorithm emitted)
    for ONE event, time-ordered. Rendering is the caller's concern; the
    filter prunes partitions before any collect."""
    return per_dp.filter(F.col(event_col) == event_id).orderBy(ts_col)


# --- bounded driver-side renders ------------------------------------------


def _check_cap(n: int, cap: int, what: str) -> None:
    if n > cap:
        raise ValueError(
            f"{what} has {n} rows > cap {cap}; reports are human-sized "
            "artifacts — aggregate further or raise the cap deliberately"
        )


def write_results_csv(
    out_dir: str,
    table: DataFrame,
    alg_names: Sequence[str],
    max_rows: int = 100_000,
    tc_col: Column | None = None,
) -> dict[str, str]:
    """saveResults2's four output_<bucket>.csv files + footers + the
    testRunner_Summary.txt stats file. The per-event table is collected
    once (bounded by ``max_rows``); all statistics come from DataFrame
    aggregations, not driver loops."""
    rows = table.collect()
    _check_cap(len(rows), max_rows, "results table")
    footers = {
        r["bucket"]: r
        for r in bucket_footers(table, alg_names, tc_col=tc_col).collect()
    }
    os.makedirs(out_dir, exist_ok=True)
    header = (
        "eventId, type, userId"
        + "".join(f", {n}" for n in alg_names)
        + ", expected"
    )
    paths: dict[str, str] = {}
    for bucket in OUTPUT_BUCKETS:
        path = os.path.join(out_dir, f"output_{bucket}.csv")
        with open(path, "w") as f:
            f.write(header + "\n")
            for r in rows:
                if r["bucket"] != bucket:
                    continue
                line = f"{r['eventId']}, {r['event_type']}, {r['user_id']}"
                for n in alg_names:
                    line += f", {r[f'{n}_verdict']}"
                line += ", ALARM" if r["expect_alarm"] else ", ----"
                f.write(line + "\n")
            fr = footers.get(bucket)
            total = fr["total"] if fr else 0
            f.write(f"#Total, , {total}\n")
            if fr:
                cc = ", ".join(str(fr[f"{n}_correct"]) for n in alg_names)
                cp = ", ".join(str(fr[f"{n}_prop"]) for n in alg_names)
                f.write(f"#Correct Count, , {cc}\n")
                f.write(f"#Correct Prop, , {cp}\n")
            if bucket == "allSeizures" and "tonicClonic" in footers:
                tc = footers["tonicClonic"]
                f.write(f"#TonicClonic Total, , {tc['total']}\n")
                tcc = ", ".join(str(tc[f"{n}_correct"]) for n in alg_names)
                f.write(f"#TonicClonic Correct Count, , {tcc}\n")
        paths[bucket] = path

    stats = summary_stats(table, alg_names).collect()
    spath = os.path.join(out_dir, "testRunner_Summary.txt")
    with open(spath, "w") as f:
        f.write("TestRunner Summary\n\n")
        for r in stats:
            f.write(f"Algorithm: {r['algorithm']}\n")
            f.write(f"  NTP = {r['ntp']}\n  NFP = {r['nfp']}\n")
            f.write(f"  NTN = {r['ntn']}\n  NFN = {r['nfn']}\n")
            tpr = "Not Calculated" if r["tpr"] is None else f"{100 * r['tpr']:.1f}%"
            tnr = "Not Calculated" if r["tnr"] is None else f"{100 * r['tnr']:.1f}%"
            f.write(f"  TPR = {tpr}\n  TNR = {tnr}\n\n")
    paths["summary"] = spath
    return paths


def summary_index_html(
    summaries: DataFrame,
    type_col: str = "event_type",
    seizure_type: str = "error",
    tc_filter: Column | None = None,
    max_rows: int = 50_000,
    type_map: Mapping[str, str] | None = None,
) -> str:
    """dataSummariser index page (summariseData.py:181-205 +
    summary_index template): events grouped into tcSeizures /
    allSeizures / falseAlarms / otherEvents with per-event rows linking
    the detail pages. Pure-string HTML (no jinja2 dependency)."""
    tagged = summaries.withColumn(
        "bucket", type_bucket(F.col(type_col), type_map)
    )
    if tc_filter is not None:
        tagged = tagged.withColumn("is_tc", tc_filter)
    rows = tagged.collect()
    _check_cap(len(rows), max_rows, "summary index")

    groups: dict[str, list] = {
        "tcSeizures": [],
        "allSeizures": [],
        "falseAlarms": [],
        "otherEvents": [],
    }
    for r in rows:
        b = r["bucket"]
        if b == "allSeizures":
            groups["allSeizures"].append(r)
            if tc_filter is not None and r["is_tc"]:
                groups["tcSeizures"].append(r)
        elif b == "falseAlarms":
            groups["falseAlarms"].append(r)
        else:
            groups["otherEvents"].append(r)

    def _table(rs) -> str:
        if not rs:
            return "<p>none</p>"
        cells = "".join(
            "<tr><td><a href={url}>{eid}</a></td><td>{typ}</td>"
            "<td>{user}</td><td>{ndp}</td><td>{gaps}</td></tr>".format(
                url=html.escape(str(r["url"])),
                eid=r["eventId"],
                typ=html.escape(str(r[type_col])),
                user=r["user_id"],
                ndp=r["nDataPoints"],
                gaps=r["n_gaps"] if r["n_gaps"] is not None else 0,
            )
            for r in rs
        )
        return (
            "<table><tr><th>event</th><th>type</th><th>user</th>"
            "<th>nDataPoints</th><th>nDpGaps</th></tr>" + cells + "</table>"
        )

    sections = "".join(
        f"<h2>{title} ({len(groups[key])})</h2>{_table(groups[key])}"
        for key, title in (
            ("tcSeizures", "Tonic-Clonic Seizures"),
            ("allSeizures", "All Seizures"),
            ("falseAlarms", "False Alarms"),
            ("otherEvents", "Other Events"),
        )
    )
    return (
        "<!DOCTYPE html><html><head><title>OSDB Summary</title></head>"
        f"<body><h1>Event Summary Index</h1>{sections}</body></html>"
    )
