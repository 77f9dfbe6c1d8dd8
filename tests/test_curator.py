"""Curator lake-edit operations (reference curator_tools semantics)."""

from pyspark.sql import functions as F

from openseizuredatabase_spark.operators.curator import (
    apply_event_edits,
    delete_events,
    edits_frame,
    mark_events,
    strip_datasource,
)


def _events(spark):
    return spark.createDataFrame(
        [
            (1, 10, "seizure", "Phone"),
            (2, 10, "falseAlarm", "Garmin"),
            (3, 20, "seizure", None),
            (4, 20, "unknown", "Phone"),
            (5, 30, "seizure", "PineTime"),
        ],
        ["event_id", "user_id", "event_type", "source"],
    )


def test_apply_edits_updates_only_specified_fields(spark):
    ev = _events(spark)
    edits = edits_frame(
        spark,
        {2: {"event_type": "seizure"}, 3: {"user_id": 99}},
        "event_id",
        ["event_type", "user_id"],
    )
    out = {
        r["event_id"]: (r["event_type"], r["user_id"])
        for r in apply_event_edits(ev, edits).collect()
    }
    assert out[2] == ("seizure", 10)  # type edited, user kept
    assert out[3] == ("seizure", 99)  # user edited, type kept
    assert out[1] == ("seizure", 10)  # untouched row identical
    assert len(out) == 5


def test_delete_events_anti_join(spark):
    ev = _events(spark)
    left = delete_events(ev, [2, 4, 999])
    assert sorted(r["event_id"] for r in left.collect()) == [1, 3, 5]


def test_strip_datasource_keeps_nulls(spark):
    # reference: ev.get('dataSourceName') == 'Phone' — missing key is kept
    kept = strip_datasource(_events(spark), "source", "Phone")
    assert sorted(r["event_id"] for r in kept.collect()) == [2, 3, 5]


def test_mark_events_relabels(spark):
    out = mark_events(_events(spark), [1, 5], new_value="deleted")
    types = {r["event_id"]: r["event_type"] for r in out.collect()}
    assert types[1] == "deleted" and types[5] == "deleted"
    assert types[2] == "falseAlarm"


def test_edit_then_delete_composes(spark):
    ev = _events(spark)
    edits = edits_frame(
        spark, {1: {"event_type": "curated"}}, "event_id", ["event_type"]
    )
    out = delete_events(apply_event_edits(ev, edits), [2])
    rows = {r["event_id"]: r["event_type"] for r in out.collect()}
    assert rows == {1: "curated", 3: "seizure", 4: "unknown", 5: "seizure"}


def test_edit_join_is_broadcast(spark):
    ev = _events(spark)
    edits = edits_frame(
        spark, {1: {"event_type": "x"}}, "event_id", ["event_type"]
    )
    plan = apply_event_edits(ev, edits)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_check_alarm_states_cli(spark, sf_dir, capsys):
    """The curator CLI (curator_tools/checkAlarmStates.py:1-92 twin)
    surfaces every group at or above the severity threshold."""
    import tools.check_alarm_states as cas

    rows = cas.build(spark, sf_dir, min_severity=3).collect()
    assert all(r.max_severity >= 3 for r in rows)
    # threshold 0 covers every group
    allrows = cas.build(spark, sf_dir, min_severity=0).collect()
    assert len(allrows) >= len(rows) > 0


def test_make_index_cli(spark, sf_dir, tmp_path):
    """The index CLI (curator_tools/makeIndex.py:1-66 twin) writes a
    globally time-ordered, fully-quoted CSV index."""
    import csv
    import glob

    import tools.make_index as mi

    out = str(tmp_path / "idx")
    mi.build(spark, sf_dir, out)
    parts = sorted(glob.glob(f"{out}/part-*"))
    assert parts
    times = []
    for pth in parts:
        with open(pth) as fh:
            for row in csv.reader(fh):
                if row and row[0] != "event_id":
                    times.append(row[1])
    assert times == sorted(times) and len(times) > 100
