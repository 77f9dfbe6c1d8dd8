"""Human-activity dataset ETL (sources/activity.py) on REAL txt files.

Expected values come from an independent pandas replay of the reference
semantics (activity_data_osdb_processor.py:12-91 decode/resample/
truncate, data_restructurer.py:34-54 window restructure,
dataset_generator.py:26-46 combine) — not from the Spark code under
test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from openseizuredatabase_spark.sources.activity import (
    TIMESTEP,
    activity_to_osdb,
    assign_event_ids,
    combine_datasets,
    load_activity_txt,
    restructure_windows,
)

RNG = np.random.default_rng(42)


def _write_txt(path, n):
    arr = RNG.integers(0, 64, size=(n, 3))
    path.write_text(
        "\n".join(" ".join(str(v) for v in row) for row in arr) + "\n"
    )
    return arr


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """walking/ and sitting_MODEL/ dirs + skip-listed files, two users,
    lengths chosen to produce 2 windows, 1 window, and a <1-window
    recording that must drop entirely."""
    root = tmp_path_factory.mktemp("activity")
    walking = root / "walking"
    walking.mkdir()
    jogging = root / "jogging"
    jogging.mkdir()
    skipdir = root / "sitting_MODEL"
    skipdir.mkdir()
    data = {}
    # 320 raw samples -> 250 bins -> 2 windows
    data["walking/acc-u1.txt"] = _write_txt(walking / "acc-u1.txt", 320)
    # 170 raw samples -> 133 bins -> truncate to 125 -> 1 window
    data["jogging/acc-u2.txt"] = _write_txt(jogging / "acc-u2.txt", 170)
    # 100 raw samples -> 79 bins < 125 -> drops entirely
    data["jogging/acc-u3.txt"] = _write_txt(jogging / "acc-u3.txt", 100)
    _write_txt(walking / "README.txt", 5)
    _write_txt(walking / "acc_MODEL.txt", 5)
    _write_txt(skipdir / "acc-u9.txt", 200)
    return root, data


def _reference_replay(coded: np.ndarray, event_seq: int, user: str,
                      label: str) -> pd.DataFrame:
    """The reference pipeline verbatim (pandas resample and all)."""
    df = pd.DataFrame(coded, columns=["x", "y", "z"]).astype(float)
    df = -1.5 + (df / 63) * 3.0
    df.index = pd.date_range(
        start="2023-01-01", periods=len(df), freq="31.25ms"
    )
    r = df.resample("40ms").mean()
    r[["x", "y", "z"]] *= 1000
    r["magnitude"] = np.sqrt(r.x**2 + r.y**2 + r.z**2)
    r["eventId"] = int(f"99999{event_seq}")
    r["Id"] = np.arange(1, len(r) + 1)
    r["userId"] = user
    r["label"] = label
    keep = len(r) - (len(r) % TIMESTEP)
    return r.iloc[:keep].reset_index(drop=True)


@pytest.fixture(scope="module")
def loaded(spark, tree):
    root, _ = tree
    return load_activity_txt(spark, str(root)).cache()


def test_loader_filters_and_parses(loaded, tree):
    _, data = tree
    got = loaded.groupBy("file_path", "label", "user_tag").count()
    rows = {
        (r["label"], r["user_tag"]): r["count"] for r in got.collect()
    }
    # README/_MODEL file and _MODEL dir are gone; 3 real files remain
    assert rows == {
        ("walking", "u1"): 320,
        ("jogging", "u2"): 170,
        ("jogging", "u3"): 100,
    }
    # spot-check coded triplets ride the posexplode ordinal faithfully
    first = (
        loaded.filter("user_tag = 'u1' AND line_idx = 0")
        .select("xc", "yc", "zc")
        .first()
    )
    assert tuple(first) == tuple(data["walking/acc-u1.txt"][0])


def test_pipeline_matches_reference_replay(spark, loaded, tree):
    _, data = tree
    osdb = activity_to_osdb(assign_event_ids(loaded)).toPandas()
    # file order (sorted paths): jogging/u2=1, jogging/u3=2, walking/u1=3
    exp = pd.concat(
        [
            _reference_replay(
                data["jogging/acc-u2.txt"], 1, "u2", "jogging"
            ),
            _reference_replay(
                data["walking/acc-u1.txt"], 3, "u1", "walking"
            ),
        ],
        ignore_index=True,
    )
    got = osdb.sort_values(["eventId", "Id"]).reset_index(drop=True)
    assert set(got.eventId) == {999991, 999993}  # u3 dropped (<1 window)
    exp = exp.sort_values(["eventId", "Id"]).reset_index(drop=True)
    assert len(got) == len(exp) == 250 + 125
    for c in ("eventId", "Id", "userId", "label"):
        assert got[c].tolist() == exp[c].tolist()
    for c in ("x", "y", "z", "magnitude"):
        np.testing.assert_allclose(got[c], exp[c], rtol=0, atol=1e-9)


def test_restructure_and_combine(spark, loaded):
    osdb = activity_to_osdb(assign_event_ids(loaded))
    w = restructure_windows(osdb).orderBy("Id").collect()
    assert [r["Id"] for r in w] == [1, 2, 3]
    assert [r["eventId"] for r in w] == [999991, 999993, 999993]
    for r in w:
        assert len(r["magnitude"]) == TIMESTEP
        assert len(r["rawData3d"]) == 3 * TIMESTEP
    # interleave layout: rawData3d[3i:3i+3] is row i's (x, y, z)
    ev = osdb.filter("eventId = 999991").orderBy("Id").limit(2).collect()
    r0 = w[0]
    assert r0["rawData3d"][0:3] == [ev[0]["x"], ev[0]["y"], ev[0]["z"]]
    assert r0["rawData3d"][3:6] == [ev[1]["x"], ev[1]["y"], ev[1]["z"]]
    assert r0["magnitude"][1] == ev[1]["magnitude"]
    # combine: df1 rows first, Id restarts at 1 and is gapless
    a = osdb.filter("eventId = 999993")
    b = osdb.filter("eventId = 999991")
    c = combine_datasets(a, b).orderBy("Id").collect()
    assert [r["Id"] for r in c] == list(range(1, len(c) + 1))
    assert [r["eventId"] for r in c[:250]] == [999993] * 250
    assert [r["eventId"] for r in c[250:]] == [999991] * 125
