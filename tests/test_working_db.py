"""OsdWorkingLake unit semantics beyond the e5 oracle: versioned
time travel, atomic pointer, upsert/edit/remove behavior, point lookup
and statistics (reference osdb_sqlite.py OsdWorkingDb)."""

import os

import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.sources.working_db import OsdWorkingLake

DDL = (
    "id string, userId bigint, type string, subType string, "
    "descr string, dataTime string, eventNum bigint, "
    "seizureTimes string, "
    "datapoints array<struct<dataTime: string, hr: double>>"
)


def _docs(spark, ids, desc="orig", hr=60.0):
    rows = [
        (
            f"e{i}",
            100 + i % 3,
            "falseAlarm" if i % 2 else "seizure",
            f"s{i % 2}",
            desc,
            f"2024-01-01 00:{i:02d}:00",
            i,
            None,
            [
                {"dataTime": f"2024-01-01 00:{i:02d}:00", "hr": hr},
                {"dataTime": f"2024-01-01 00:{i:02d}:05", "hr": hr + 1},
            ],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def db(spark, tmp_path):
    d = OsdWorkingLake(spark, str(tmp_path / "wdb"))
    d.add_events(_docs(spark, range(10)))
    return d


def test_versions_are_immutable_snapshots(spark, db):
    assert db.current_version() == 0
    db.add_events(_docs(spark, [3, 4, 10, 11], desc="upsert", hr=99.0))
    db.remove_events(["e0", "e10"])
    assert db.current_version() == 2
    # v0 still reads the pre-mutation world, byte-for-byte semantics
    v0 = db.events(0)
    assert v0.count() == 10
    assert v0.filter(F.col("descr") == "upsert").count() == 0
    # v1 sees the upsert (12 rows: 10 + 2 new, 2 replaced in place)
    v1 = db.events(1)
    assert v1.count() == 12
    assert v1.filter(F.col("descr") == "upsert").count() == 4
    # latest sees the removal, and the pointer names it
    assert db.events().count() == 10
    assert db.events().filter(F.col("id") == "e0").count() == 0


def test_upsert_replaces_datapoints_too(spark, db):
    db.add_events(_docs(spark, [3], desc="upsert", hr=99.0))
    dps = db.datapoints().filter(F.col("event_id") == "e3").collect()
    assert sorted(r["hr"] for r in dps) == [99.0, 100.0]
    # unrelated events keep their original datapoints
    other = db.datapoints().filter(F.col("event_id") == "e2").collect()
    assert sorted(r["hr"] for r in other) == [60.0, 61.0]


def test_update_event_and_point_lookup(spark, db):
    assert db.update_event("e5", "seizure", "TC", "curated", [1.5, 3.0])
    d = db.get_event_details("e5")
    assert d["type"] == "seizure" and d["subType"] == "TC"
    assert d["descr"] == "curated" and d["seizureTimes"] == "[1.5, 3.0]"
    # datapoints ride the lookup, sorted by time
    assert [p["hr"] for p in d["datapoints"]] == [60.0, 61.0]
    # non-edit columns survived the edit
    assert d["eventNum"] == 5
    # unknown id -> None, not an exception
    assert db.get_event_details("nope") is None


def test_remove_cascades_to_datapoints(spark, db):
    n = db.remove_events(["e1", "e2", "nope"])
    assert n == 2
    assert db.events().count() == 8
    assert (
        db.datapoints().filter(F.col("event_id").isin("e1", "e2")).count()
        == 0
    )


def test_get_events_filters(spark, db):
    assert db.get_events(event_type="seizure").count() == 5
    assert db.get_events(user_id=101).count() == len(
        [i for i in range(10) if 100 + i % 3 == 101]
    )
    rng = db.get_events(
        start_time="2024-01-01 00:03:00", end_time="2024-01-01 00:06:00"
    )
    assert sorted(r["id"] for r in rng.collect()) == ["e3", "e4", "e5", "e6"]


def test_statistics_and_pointer_file(spark, db):
    st = db.get_statistics()
    assert st["total_events"] == 10
    assert st["unique_users"] == 3
    assert st["events_by_type"]["seizure"] == 5
    with open(os.path.join(db.root, "_LATEST")) as f:
        assert int(f.read()) == db.current_version()
