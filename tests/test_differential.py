"""Two-backend differential report (detection/differential.py) vs the
reference's compare_streaming_algorithms.py semantics: per-dp join,
pSeizure drift stats, alarm-state agreement, event verdicts
(compare_streaming_algorithms.py:338-432)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.differential import (
    differential_report,
    event_diff_summary,
    overall_diff_stats,
    per_dp_diff,
)


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, 0, 0, i)


@pytest.fixture
def outputs(spark):
    a = spark.createDataFrame(
        [
            Row(eventId=1, dpTimestamp=_ts(0), pSeizure=0.10, alarmState=0),
            Row(eventId=1, dpTimestamp=_ts(5), pSeizure=0.90, alarmState=2),
            Row(eventId=2, dpTimestamp=_ts(0), pSeizure=0.20, alarmState=0),
            Row(eventId=2, dpTimestamp=_ts(5), pSeizure=0.30, alarmState=1),
        ]
    )
    b = spark.createDataFrame(
        [
            Row(eventId=1, dpTimestamp=_ts(0), pSeizure=0.10, alarmState=0),
            Row(eventId=1, dpTimestamp=_ts(5), pSeizure=0.85, alarmState=2),
            Row(eventId=2, dpTimestamp=_ts(0), pSeizure=0.20, alarmState=0),
            # backend b dropped event 2's second dp (device-path failure)
        ]
    )
    return a, b


def test_per_dp_diff_full_outer_and_p_diff(outputs):
    a, b = outputs
    d = per_dp_diff(a, b).orderBy("eventId", "dpTimestamp").collect()
    assert len(d) == 4  # union of dps from both sides
    r = {(x.eventId, x.dpTimestamp.second): x for x in d}
    assert abs(r[(1, 5)].p_abs_diff - 0.05) < 1e-12
    # dropped dp: b-side columns null, diff null
    assert r[(2, 5)].alarmState_b is None
    assert r[(2, 5)].p_abs_diff is None


def test_event_summary_and_overall(outputs):
    a, b = outputs
    d = per_dp_diff(a, b)
    s = {r.eventId: r for r in event_diff_summary(d, prob_tol=0.01).collect()}
    assert s[1].n_dps == 2 and s[1].n_both == 2 and s[1].n_state_match == 2
    assert s[1].verdict_a == 1 and s[1].verdict_b == 1 and s[1].verdict_match == 1
    assert abs(s[1].p_max_diff - 0.05) < 1e-12
    assert s[1].n_within_tol == 1  # only the 0.0-diff dp is within 0.01
    # event 2: one dp dropped by b; no alarm on either side → verdicts agree
    assert s[2].n_dps == 2 and s[2].n_both == 1 and s[2].n_state_match == 1
    assert s[2].verdict_a == 0 and s[2].verdict_b == 0 and s[2].verdict_match == 1

    o = overall_diff_stats(event_diff_summary(d, prob_tol=0.01)).collect()[0]
    assert o.n_events == 2 and o.n_dps == 4 and o.n_both == 3
    assert o.n_state_match == 3
    assert abs(o.state_agree_rate - 1.0) < 1e-12
    assert o.n_verdict_match == 2
    assert abs(o.verdict_agree_rate - 1.0) < 1e-12
    assert abs(o.p_max_diff - 0.05) < 1e-12


def test_states_only_backends_skip_p_stats(spark):
    """A backend without pSeizure (e.g. the osd threshold machine) still
    compares on alarm states; p-columns are simply absent."""
    a = spark.createDataFrame(
        [Row(eventId=1, dpTimestamp=_ts(0), alarmState=2)]
    )
    b = spark.createDataFrame(
        [Row(eventId=1, dpTimestamp=_ts(0), pSeizure=0.9, alarmState=0)]
    )
    d = per_dp_diff(a, b)
    assert "p_abs_diff" not in d.columns
    s = event_diff_summary(d).collect()[0]
    assert s.n_state_match == 0 and s.verdict_match == 0
    o = overall_diff_stats(event_diff_summary(d)).collect()[0]
    assert o.state_agree_rate == 0.0
    assert "p_max_diff" not in o.asDict()


def test_write_differential_report_artifacts(spark, tmp_path, outputs):
    from openseizuredatabase_spark.detection.differential import (
        write_differential_report,
    )

    a, b = outputs
    d = per_dp_diff(a, b)
    s = event_diff_summary(d, prob_tol=0.01)
    paths = write_differential_report(
        str(tmp_path), s, overall_diff_stats(s), "local", "device"
    )
    csv = open(paths["events_csv"]).read().splitlines()
    assert csv[0].startswith("eventId, n_dps, n_both, n_state_match")
    assert len(csv) == 3  # header + 2 events
    txt = open(paths["summary_txt"]).read()
    assert "local vs device" in txt
    assert "state agreement     = 3 (100.00%)" in txt
    assert "max |p diff|        = 0.05" in txt


def test_differential_report_runs_registered_backends(spark):
    """End-to-end through two real backends: identical backends agree
    everywhere; shifted-threshold backends disagree where expected."""
    from openseizuredatabase_spark.detection.osd_alg import (
        OsdSettings,
        run_state_machine,
    )

    rows = [
        Row(eventId=1, dpTimestamp=_ts(5 * i), dp_id=i, value=v)
        for i, v in enumerate([100.0, 200.0, 200.0, 200.0, 100.0, 100.0])
    ]
    ev = spark.createDataFrame(rows)

    def machine(thresh):
        def run(dps):
            out = run_state_machine(
                dps.withColumn("in_alarm", F.col("value") > thresh),
                ["eventId"],
                "dpTimestamp",
                "in_alarm",
                "dp_id",
                OsdSettings(sample_period=5, warn_time=5, alarm_time=10),
            )
            return out.join(
                dps.select("dp_id", "dpTimestamp"), "dp_id"
            ).select("eventId", "dpTimestamp", "alarmState")

        return run

    _, summary, overall = differential_report(
        ev, machine(150.0), machine(150.0)
    )
    o = overall.collect()[0]
    assert o.state_agree_rate == 1.0 and o.verdict_agree_rate == 1.0

    _, _, overall2 = differential_report(ev, machine(150.0), machine(250.0))
    o2 = overall2.collect()[0]
    assert o2.verdict_agree_rate == 0.0  # b never alarms
    assert o2.state_agree_rate < 1.0
