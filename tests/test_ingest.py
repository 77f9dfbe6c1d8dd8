"""Ingest/tidy tests: nested OSDB-shaped JSON → canonical events frame.

Fixture mirrors the reference's synthetic DB (tests/test_osdDbConnection.py
setUp + the legacy double-nested dataJSON variant in libosd/tidy_db.py).
"""

import json

import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.sources.ingest import (
    deinterleave_3d,
    explode_datapoints,
    parse_osdb_time,
    read_events_json,
    tidy_events,
)


def _dp(dp_id, t, hr=70.0, raw=None, raw3d=None, state=0):
    return {
        "id": dp_id,
        "dataTime": t,
        "hr": hr,
        "rawData": raw if raw is not None else [1000.0] * 125,
        "rawData3D": raw3d,
        "alarmState": state,
    }


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("osdb") / "events.json")
    legacy_inner = json.dumps(
        {"hr": 88.0, "o2Sat": 97.0, "rawData": [2000.0] * 130}  # over-length → truncate
    )
    legacy_outer = json.dumps({"dataJSON": legacy_inner})
    events = [
        {
            "id": 1,
            "userId": "1",
            "dataTime": "2023-05-05T06:28:47Z",  # ISO with Z
            "type": "Seizure",
            "subType": "Tonic-Clonic",
            "osdAlarmState": 0,
            "datapoints": [
                _dp(1, "2023-05-05T06:28:47Z", state=1),
                _dp(2, "2023-05-05T06:28:52Z", state=2),
                _dp(3, "2023-05-05T06:28:57Z", hr=-1.0),
            ],
        },
        {
            "id": 2,
            "userId": "2",
            "dataTime": "09-05-2022 02:37:25",  # legacy dayfirst
            "type": "False Alarm",
            "datapoints": [
                {"id": 9, "dataTime": "09-05-2022 02:37:25", "dataJSON": legacy_outer}
            ],
        },
        {
            "id": 3,
            "userId": "1",
            "dataTime": "2023-06-01 10:00:00",
            "type": "Seizure",
            "datapoints": [
                _dp(1, "2023-06-01 10:00:00", raw3d=[1.0, 2.0, 2.0] * 125),
                _dp(2, "2023-06-01 10:00:05", raw3d=[0.0] * 375),  # all-zero = absent
            ],
        },
    ]
    with open(path, "w") as f:
        json.dump(events, f)
    return path


def test_timestamp_cascade(spark):
    df = spark.createDataFrame(
        [
            ("2023-05-05T06:28:47Z",),
            ("2023-05-05T06:28:47.123456Z",),
            ("09-05-2022 02:37:25",),
            ("2023-06-01 10:00:00",),
            ("garbage",),
        ],
        ["s"],
    )
    out = [r.t for r in df.select(parse_osdb_time(F.col("s")).alias("t")).collect()]
    assert out[0].isoformat() == "2023-05-05T06:28:47"
    assert out[1].microsecond == 123456
    # dayfirst legacy: 9 May, not Sep 5
    assert (out[2].day, out[2].month) == (9, 5)
    assert out[3].hour == 10
    assert out[4] is None


def test_read_and_tidy(spark, events_path):
    tidy = tidy_events(read_events_json(spark, events_path))
    rows = {r.id: r for r in tidy.collect()}
    assert set(rows) == {1, 2, 3}
    # A4 alarm repair: event 1 worst dp state == 2 → ALARM
    assert rows[1].osdAlarmState == 2
    # A3 flags: event 1 has hr on 2/3 dps (≥50%) → hasHrData
    assert rows[1].hasHrData is True
    # C5 legacy expansion: dataJSON→dataJSON fields recovered
    ev2_dp = rows[2].datapoints[0]
    assert ev2_dp.hr == 88.0
    assert ev2_dp.o2Sat == 97.0
    # C7 truncation: 130-elem rawData cut to 125
    assert len(ev2_dp.rawData) == 125
    # event 3: only 1 of 2 dps has valid 3D (all-zero = absent) → 50% ≥ 50%
    assert rows[3].has3dData is True


def test_explode_and_deinterleave(spark, events_path):
    tidy = tidy_events(read_events_json(spark, events_path))
    dps = explode_datapoints(tidy)
    assert dps.count() == 6
    ev3 = deinterleave_3d(dps.filter("eventId = 3 AND dpId = 1")).collect()[0]
    assert ev3.accX[:2] == [1.0, 1.0]
    assert ev3.accY[0] == 2.0
    assert ev3.accZ[0] == 2.0
    assert ev3.magnitude3D[0] == 3.0  # sqrt(1+4+4)
    # per-dp timestamps parsed and ordered
    times = [
        r.dpTimestamp
        for r in dps.filter("eventId = 1").orderBy("dpTimestamp").collect()
    ]
    assert times[0] < times[1] < times[2]
