"""Differential tests for the makeOsdDb_refactor curator operators.

Goldens are LITERAL PORTS of the reference's executed code — the loops
below are transcribed (minus tqdm/printing) from
curator_tools/makeOsdDb_refactor/src/event_grouping.py,
event_deduplication.py, event_validation.py and
datetime_normalization.py, each method citing its source lines — and the
engine operators (operators/curator.py) are replayed against them over a
fixture event list exercising every branch: gap chains, alarm_first
precedence (existing-event priority, alarm, desc, time, tie), datapoint
concatenation with 100 ms tolerance dedup, desc annotation punctuation,
excluded (NDA) types, field-hash dedup keep-first/last/most-datapoints,
rule-tagged validation precedence, and the datetime format cascade.
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openseizuredatabase_spark.operators import curator as cur


# ---------------------------------------------------------------------------
# Literal ports (reference: curator_tools/makeOsdDb_refactor/src/)
# ---------------------------------------------------------------------------


class RefGrouping:
    """Literal port of event_grouping.py (pandas/loop semantics kept)."""

    @staticmethod
    def concatenate_datapoints(events, remove_duplicates=True,
                               time_tolerance_ms=100):
        # event_grouping.py:34-83
        if not events:
            return []
        all_datapoints = []
        for event in events:
            datapoints = event.get("datapoints", [])
            if datapoints:
                all_datapoints.extend(datapoints)
        if not all_datapoints:
            return []

        def get_time(dp):
            for field in ["time", "dataTime", "t"]:
                if field in dp:
                    return dp[field]
            return 0

        all_datapoints.sort(key=get_time)
        if not remove_duplicates:
            return all_datapoints
        deduplicated = []
        last_time = None
        for dp in all_datapoints:
            current_time = get_time(dp)
            if last_time is not None:
                time_diff = abs(current_time - last_time)
                if time_diff < time_tolerance_ms:
                    continue
            deduplicated.append(dp)
            last_time = current_time
        return deduplicated

    @staticmethod
    def merge_grouped_events(group, selected_event,
                             concatenate_datapoints_flag=True,
                             update_desc=True):
        # event_grouping.py:86-124
        if not concatenate_datapoints_flag or len(group) <= 1:
            return selected_event
        merged = selected_event.copy()
        concatenated = RefGrouping.concatenate_datapoints(
            group, remove_duplicates=True
        )
        merged["datapoints"] = concatenated
        merged["_merged_from_event_ids"] = [e["id"] for e in group]
        merged["_merged_event_count"] = len(group)
        merged["_merged_datapoint_count"] = len(concatenated)
        if update_desc and len(group) > 1:
            selected_id = selected_event.get("id")
            merged_ids = [e["id"] for e in group if e["id"] != selected_id]
            if merged_ids:
                current_desc = merged.get("desc", "") or ""
                merged_ids_str = ", ".join(
                    sorted(str(eid) for eid in merged_ids)
                )
                merge_note = (
                    f"Includes data from merged event(s): {merged_ids_str}"
                )
                if merge_note not in current_desc:
                    if current_desc and not current_desc.endswith("."):
                        current_desc += "."
                    if current_desc:
                        current_desc += " "
                    merged["desc"] = current_desc + merge_note
                else:
                    merged["desc"] = current_desc
        return merged

    @staticmethod
    def group_events_by_proximity(events, threshold_seconds):
        # event_grouping.py:127-174 (threshold pre-parsed to seconds)
        if not events:
            return []
        df = pd.DataFrame(events)
        df["dataTime"] = pd.to_datetime(df["dataTime"], utc=True)
        df = df.sort_values(["userId", "type", "dataTime"]).reset_index(
            drop=True
        )
        groups = []
        current_group = []
        current_user = None
        current_type = None
        last_time = None
        for _, row in df.iterrows():
            event = row.to_dict()
            user_id = event["userId"]
            event_type = event["type"]
            event_time = event["dataTime"]
            if user_id != current_user or event_type != current_type:
                if current_group:
                    groups.append(current_group)
                current_group = [event]
                current_user = user_id
                current_type = event_type
                last_time = event_time
                continue
            time_diff = (event_time - last_time).total_seconds()
            if time_diff <= threshold_seconds:
                current_group.append(event)
            else:
                groups.append(current_group)
                current_group = [event]
            last_time = event_time
        if current_group:
            groups.append(current_group)
        return groups

    @staticmethod
    def select_best_event_from_group(group, strategy="alarm_first"):
        # event_grouping.py:177-220
        if not group:
            return None
        if len(group) == 1:
            return group[0]
        existing_events = [
            e for e in group if e.get("_is_existing_event", False)
        ]
        if strategy == "alarm_first":
            def sort_key(event):
                is_existing = (
                    0 if event.get("_is_existing_event", False) else 1
                )
                alarm_state = event.get("osdAlarmState", 0)
                has_desc = 1 if event.get("desc", "").strip() else 0
                datatime = pd.to_datetime(event["dataTime"], utc=True)
                return (is_existing, -alarm_state, -has_desc, datatime)
            sorted_group = sorted(group, key=sort_key)
            return sorted_group[0]
        if strategy == "most_datapoints":
            if existing_events:
                return max(
                    existing_events,
                    key=lambda e: len(e.get("datapoints", [])),
                )
            return max(group, key=lambda e: len(e.get("datapoints", [])))
        if strategy == "last":
            # event_grouping.py:213-216
            if existing_events:
                return max(
                    existing_events,
                    key=lambda e: pd.to_datetime(e["dataTime"], utc=True),
                )
            return max(
                group, key=lambda e: pd.to_datetime(e["dataTime"], utc=True)
            )
        # event_grouping.py:217-220 (else: earliest)
        if existing_events:
            return min(
                existing_events,
                key=lambda e: pd.to_datetime(e["dataTime"], utc=True),
            )
        return min(
            group, key=lambda e: pd.to_datetime(e["dataTime"], utc=True)
        )

    @staticmethod
    def apply_sliding_window_grouping(events, threshold_seconds=180,
                                      exclude_event_types=None,
                                      update_desc=True,
                                      selection_strategy="alarm_first"):
        # event_grouping.py:223-341 (stats/validation reporting elided)
        if not events:
            return []
        excluded_types = exclude_event_types or []
        if excluded_types:
            lowered = [t.lower() for t in excluded_types]
            excluded_events = [
                e for e in events if e.get("type", "").lower() in lowered
            ]
            events_to_group = [
                e for e in events if e.get("type", "").lower() not in lowered
            ]
        else:
            excluded_events = []
            events_to_group = events
        groups = RefGrouping.group_events_by_proximity(
            events_to_group, threshold_seconds
        )
        unique_events = []
        for group in groups:
            selected = RefGrouping.select_best_event_from_group(
                group, selection_strategy
            )
            if len(group) > 1:
                unique_events.append(
                    RefGrouping.merge_grouped_events(
                        group, selected, update_desc=update_desc
                    )
                )
            else:
                unique_events.append(selected)
        return unique_events + excluded_events


class RefDedup:
    """Literal port of event_deduplication.py."""

    @staticmethod
    def compute_event_hash(event, fields=None):
        # event_deduplication.py:16-39
        if fields is None:
            fields = ["id", "userId", "dataTime", "type"]
        hash_data = {}
        for field in fields:
            if field in event:
                hash_data[field] = event[field]
        hash_str = json.dumps(hash_data, sort_keys=True)
        return hashlib.md5(hash_str.encode()).hexdigest()

    @staticmethod
    def remove_duplicate_events(events, hash_fields=None, keep="first"):
        # event_deduplication.py:80-173 (method='hash')
        from collections import defaultdict

        duplicates = defaultdict(list)
        for event in events:
            duplicates[
                RefDedup.compute_event_hash(event, hash_fields)
            ].append(event)
        duplicates = {k: v for k, v in duplicates.items() if len(v) > 1}
        seen = set()
        deduplicated = []
        removed_ids = []
        for event in events:
            key = RefDedup.compute_event_hash(event, hash_fields)
            if key in duplicates and key in seen:
                removed_ids.append(event.get("id"))
                continue
            if key in duplicates:
                dup_group = duplicates[key]
                if keep == "first":
                    selected = dup_group[0]
                elif keep == "last":
                    selected = dup_group[-1]
                elif keep == "most_datapoints":
                    selected = max(
                        dup_group,
                        key=lambda e: len(e.get("datapoints", [])),
                    )
                else:
                    selected = dup_group[0]
                deduplicated.append(selected)
                seen.add(key)
                for dup_event in dup_group:
                    if dup_event["id"] != selected["id"]:
                        removed_ids.append(dup_event["id"])
            else:
                deduplicated.append(event)
                seen.add(key)
        return deduplicated, removed_ids


class RefValidation:
    """Literal port of event_validation.py:70-198."""

    REQUIRED = ["id", "userId", "dataTime", "type", "osdAlarmState"]

    @staticmethod
    def validate_event(event, min_datapoints=1, required_fields=None):
        required = required_fields or RefValidation.REQUIRED
        missing = [f for f in required if f not in event]
        if missing:
            return "Missing required fields", missing
        if "datapoints" not in event:
            return "Event has no datapoints field", None
        if not isinstance(event["datapoints"], list):
            return "Event datapoints is not a list", None
        if len(event["datapoints"]) < min_datapoints:
            return "Event has insufficient datapoints", None
        return None, None

    @staticmethod
    def validate_events_batch(events, min_datapoints=1,
                              invalid_event_ids=None):
        invalid_event_ids = invalid_event_ids or []
        reasons = {}
        for event in events:
            event_id = event.get("id", "unknown")
            if event_id in invalid_event_ids:
                reasons[event_id] = "marked_invalid_in_config"
                continue
            reason, _ = RefValidation.validate_event(event, min_datapoints)
            reasons[event_id] = reason
        return reasons


def ref_normalize_datetime_string(dt_str):
    # datetime_normalization.py:25-63: target-shape short-circuit,
    # KNOWN_FORMATS cascade, then the dateutil dayfirst fallback tier
    # (:58-63). The raising branch maps to None (engine quarantines as
    # NULL; the reference's caller keeps the original string and warns).
    from datetime import datetime

    if not dt_str or not isinstance(dt_str, str):
        return dt_str
    if len(dt_str) == 20 and dt_str[10] == "T" and dt_str[-1] == "Z":
        try:
            datetime.strptime(dt_str, "%Y-%m-%dT%H:%M:%SZ")
            return dt_str
        except ValueError:
            pass
    for fmt in ["%d-%m-%Y %H:%M:%S", "%Y-%m-%dT%H:%M:%SZ",
                "%Y-%m-%d %H:%M:%S"]:
        try:
            return datetime.strptime(dt_str, fmt).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
        except ValueError:
            continue
    try:
        from dateutil import parser as dateutil_parser

        return dateutil_parser.parse(dt_str, dayfirst=True).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
    except Exception:
        return None


def ref_datetime_parse_source(dt_str):
    # Which normalize_datetime_string tier handled the string: the
    # KNOWN_FORMATS loop (:50-55), the dateutil fallback (:58-63), or
    # the raising branch; empty/None is the :40-41 early return.
    from datetime import datetime

    if not dt_str:
        return "missing"
    for fmt in ["%d-%m-%Y %H:%M:%S", "%Y-%m-%dT%H:%M:%SZ",
                "%Y-%m-%d %H:%M:%S"]:
        try:
            datetime.strptime(dt_str, fmt)
            return "known_format"
        except ValueError:
            continue
    try:
        from dateutil import parser as dateutil_parser

        dateutil_parser.parse(dt_str, dayfirst=True)
        return "fallback"
    except Exception:
        return "unparseable"


def ref_detect_datetime_format(dt_str):
    # datetime_normalization.py:160-192, per-string classification
    if not dt_str:
        return "missing"
    if not isinstance(dt_str, str):
        return "other"
    if len(dt_str) == 20 and dt_str[10] == "T" and dt_str[-1] == "Z":
        return "iso_8601"
    if len(dt_str) == 19 and dt_str[2] == "-" and dt_str[5] == "-":
        return "old_format"
    return "other"


# ---------------------------------------------------------------------------
# Fixture events
# ---------------------------------------------------------------------------

_BASE = 1_660_000_000  # epoch seconds


def _iso(epoch_s: int) -> str:
    return pd.Timestamp(epoch_s, unit="s", tz="UTC").strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _dps(t0_ms: int, offsets_ms: list[int], base_v: int) -> list[dict]:
    return [
        {"time": t0_ms + off, "v": base_v + i}
        for i, off in enumerate(offsets_ms)
    ]


def _fixture_events() -> list[dict]:
    ev = []

    def add(eid, uid, etype, t_s, alarm=0, desc="", existing=False,
            dp_offsets=None):
        ev.append(
            {
                "id": eid,
                "userId": uid,
                "type": etype,
                "dataTime": _iso(_BASE + t_s),
                "osdAlarmState": alarm,
                "desc": desc,
                "_is_existing_event": existing,
                "datapoints": _dps(
                    (_BASE + t_s) * 1000, dp_offsets or [0, 5000], eid * 10
                ),
            }
        )

    # user 1, Seizure: 3-event chain (0s, 120s, 290s — chained: each gap
    # <=180 s) with dp collisions: event 11's dp at +120000 lands exactly
    # on event 12's dp at 0 offset; event 13 dp at +40 ms of event 12's
    # second dp (within 100 ms tolerance).
    add(11, 1, "Seizure", 0, alarm=1, desc="first event",
        dp_offsets=[0, 60_000, 120_000])
    add(12, 1, "Seizure", 120, alarm=2, desc="",
        dp_offsets=[0, 5_000])
    add(13, 1, "Seizure", 290, alarm=2, desc="big one.",
        dp_offsets=[-170_000 + 5_040, 0])
    # user 1, Seizure: singleton far away
    add(14, 1, "Seizure", 10_000, alarm=0, desc="lonely")
    # user 1, falseAlarm: pair where the EXISTING event wins despite
    # lower alarm state
    add(15, 1, "falseAlarm", 500, alarm=2, desc="")
    add(16, 1, "falseAlarm", 560, alarm=0, desc="from published db",
        existing=True)
    # user 2, Seizure: pair tied on (existing, alarm, has_desc, time) —
    # input order id-ascending, engine tiebreak = id
    add(21, 2, "Seizure", 1000, alarm=1, desc="tie a")
    add(22, 2, "Seizure", 1000, alarm=1, desc="tie b")
    # user 2, Seizure: desc ends without '.' → '. ' punctuation branch
    add(23, 2, "Seizure", 2000, alarm=0, desc="no punct")
    add(24, 2, "Seizure", 2100, alarm=0, desc="")
    # user 2, nda: excluded type passes through ungrouped
    add(25, 2, "NDA", 2000, alarm=0, desc="nda 1")
    add(26, 2, "NDA", 2030, alarm=0, desc="nda 2")
    # user 3: empty-desc representative → note lands on empty desc
    add(31, 3, "fall", 100, alarm=0, desc="")
    add(32, 3, "fall", 150, alarm=0, desc="")
    # id 33: string-sort of merged ids matters (10 < 9 as strings)
    add(9, 3, "other", 300, alarm=0, desc="")
    add(10, 3, "other", 350, alarm=0, desc="")
    add(33, 3, "other", 400, alarm=2, desc="keeper")
    return ev


_DP_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("time", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("userId", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("ts", T.DoubleType()),
        T.StructField("dataTime", T.StringType()),
        T.StructField("osdAlarmState", T.LongType()),
        T.StructField("desc", T.StringType()),
        T.StructField("_is_existing_event", T.BooleanType()),
        T.StructField("datapoints", _DP_TYPE),
    ]
)


def _events_df(spark, events):
    rows = [
        (
            e["id"],
            e["userId"],
            e["type"],
            float(pd.Timestamp(e["dataTime"]).timestamp()),
            e["dataTime"],
            e["osdAlarmState"],
            e["desc"],
            e["_is_existing_event"],
            [(dp["time"], dp["v"]) for dp in e["datapoints"]],
        )
        for e in events
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _run_engine(spark, events, exclude_types=None,
                strategy="alarm_first"):
    df = _events_df(spark, events)
    out = cur.merge_proximity_groups(
        df,
        strategy=strategy,
        group_cols=["userId", "type"],
        ts_col="ts",
        id_col="id",
        alarm_col="osdAlarmState",
        desc_col="desc",
        dp_col="datapoints",
        dp_time_field="time",
        threshold=180,
        tolerance_ms=100,
        existing_col="_is_existing_event",
        exclude_types=exclude_types,
        type_col="type",
    )
    return {r["id"]: r.asDict(recursive=True) for r in out.collect()}


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_merge_sort_honors_time_field_position(spark):
    """The concatenated-datapoint sort must key on ``dp_time_field``
    even when that field is NOT the first struct field (a bare struct
    sort would order by field position — here the leading ``v`` field
    carries a deliberately time-reversed ranking, so a positional sort
    scrambles the fold and the tolerance dedup drops the wrong points).
    concatenate_datapoints sorts by the TIME value (event_grouping.py
    :46-66) regardless of dict layout."""
    events = _fixture_events()
    ref = RefGrouping.apply_sliding_window_grouping(
        events, threshold_seconds=180, exclude_event_types=["nda"]
    )
    # v DESC vs time: v = 10_000_000 - time makes positional order the
    # exact reverse of time order
    rows = [
        (
            e["id"], e["userId"], e["type"],
            float(pd.Timestamp(e["dataTime"]).timestamp()),
            e["dataTime"], e["osdAlarmState"], e["desc"],
            e["_is_existing_event"],
            [
                (10_000_000 - (dp["time"] % 10_000_000), dp["time"])
                for dp in e["datapoints"]
            ],
        )
        for e in events
    ]
    schema = T.StructType(
        list(_SCHEMA)[:-1]
        + [
            T.StructField(
                "datapoints",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("v", T.LongType()),
                            T.StructField("time", T.LongType()),
                        ]
                    )
                ),
            )
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = cur.merge_proximity_groups(
        df,
        group_cols=["userId", "type"],
        ts_col="ts",
        id_col="id",
        alarm_col="osdAlarmState",
        desc_col="desc",
        dp_col="datapoints",
        dp_time_field="time",
        threshold=180,
        tolerance_ms=100,
        existing_col="_is_existing_event",
        exclude_types=["nda"],
        type_col="type",
    )
    got = {r["id"]: r.asDict(recursive=True) for r in out.collect()}
    assert set(got) == {e["id"] for e in ref}
    for e in ref:
        assert [dp["time"] for dp in got[e["id"]]["datapoints"]] == [
            dp["time"] for dp in e.get("datapoints", [])
        ], e["id"]


def test_merge_grouping_matches_literal_port(spark):
    events = _fixture_events()
    ref = RefGrouping.apply_sliding_window_grouping(
        events, threshold_seconds=180, exclude_event_types=["nda"]
    )
    got = _run_engine(spark, events, exclude_types=["nda"])

    assert set(got) == {e["id"] for e in ref}
    for e in ref:
        g = got[e["id"]]
        # representative survives with merged datapoints in ref order
        ref_times = [dp["time"] for dp in e.get("datapoints", [])]
        got_times = [dp["time"] for dp in g["datapoints"]]
        assert got_times == ref_times, e["id"]
        ref_vs = [dp["v"] for dp in e.get("datapoints", [])]
        assert [dp["v"] for dp in g["datapoints"]] == ref_vs, e["id"]
        assert g["desc"] == e.get("desc", ""), e["id"]
        if "_merged_from_event_ids" in e:
            assert (
                g["_merged_from_event_ids"] == e["_merged_from_event_ids"]
            ), e["id"]
            assert g["_merged_event_count"] == e["_merged_event_count"]
            assert (
                g["_merged_datapoint_count"] == e["_merged_datapoint_count"]
            )
        else:
            assert g["_merged_from_event_ids"] is None
            assert g["_merged_event_count"] is None
            assert g["_merged_datapoint_count"] is None


def test_merge_grouping_chain_vs_fixed_bins(spark):
    """The 0/120/290 chain merges into ONE event under gap chaining even
    though it spans 290 s > 180 s — the defining difference vs D1's fixed
    bins (event_grouping.py:161-169: gap measured to the PREVIOUS event,
    not the chain start)."""
    events = _fixture_events()
    got = _run_engine(spark, events, exclude_types=["nda"])
    assert got[13]["_merged_event_count"] == 3
    assert got[13]["_merged_from_event_ids"] == [11, 12, 13]
    # alarm_first picked 13 (alarm=2 tie with 12, has_desc breaks it)
    assert 12 not in got and 11 not in got


def test_tolerance_dedup_keeps_chained_semantics(spark):
    """|t - last_KEPT| < 100 ms skips, and the NEXT point compares against
    the kept time, not the skipped one (event_grouping.py:71-83)."""
    events = [
        {
            "id": 1, "userId": 1, "type": "s", "dataTime": _iso(_BASE),
            "osdAlarmState": 0, "desc": "", "_is_existing_event": False,
            "datapoints": [
                {"time": 1_000_000, "v": 0},
                {"time": 1_000_050, "v": 1},  # +50 of kept → skip
                {"time": 1_000_080, "v": 2},  # +80 of kept → skip
                {"time": 1_000_120, "v": 3},  # +120 of kept → KEEP
            ],
        },
        {
            "id": 2, "userId": 1, "type": "s", "dataTime": _iso(_BASE + 10),
            "osdAlarmState": 0, "desc": "", "_is_existing_event": False,
            "datapoints": [],
        },
    ]
    ref = RefGrouping.apply_sliding_window_grouping(events, 180)
    got = _run_engine(spark, events)
    (merged,) = [e for e in ref if "_merged_from_event_ids" in e]
    assert [dp["time"] for dp in merged["datapoints"]] == [
        1_000_000, 1_000_120,
    ]
    assert [dp["time"] for dp in got[1]["datapoints"]] == [
        1_000_000, 1_000_120,
    ]


def test_field_hash_matches_reference_json_dumps(spark):
    events = _fixture_events()
    df = _events_df(spark, events).withColumn(
        "userId2", F.col("userId")
    )
    fields = [("id", "num"), ("userId", "num"), ("dataTime", "str"),
              ("type", "str")]
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", cur.event_field_hash(fields).alias("h")
        ).collect()
    }
    for e in events:
        assert got[e["id"]] == RefDedup.compute_event_hash(e), e["id"]


def test_field_hash_null_field_drops_key(spark):
    """A NULL field drops out of the canonical JSON exactly like the
    reference's ``if field in event`` (event_deduplication.py:33-35)."""
    df = spark.createDataFrame(
        [(1, None, "2022-01-01T00:00:00Z", "Seizure")],
        "id long, userId long, dataTime string, type string",
    )
    fields = [("id", "num"), ("userId", "num"), ("dataTime", "str"),
              ("type", "str")]
    (h,) = df.select(cur.event_field_hash(fields).alias("h")).collect()[0]
    ref_event = {"id": 1, "dataTime": "2022-01-01T00:00:00Z",
                 "type": "Seizure"}
    assert h == RefDedup.compute_event_hash(ref_event)


@pytest.mark.parametrize("keep", ["first", "last", "most_datapoints"])
def test_dedup_by_field_hash_matches_port(spark, keep):
    events = _fixture_events()
    # clone three events (same hash fields, different datapoints size)
    clones = []
    for i, src in enumerate([events[0], events[3], events[7]]):
        c = dict(src)
        c["datapoints"] = src["datapoints"][: max(0, len(
            src["datapoints"]) - 1 - i % 2)]
        clones.append(c)
    all_events = events + clones
    fields = [("id", "num"), ("userId", "num"), ("dataTime", "str"),
              ("type", "str")]
    ref_kept, ref_removed = RefDedup.remove_duplicate_events(
        all_events, keep=keep
    )

    rows = [
        (
            i,  # input position
            e["id"], e["userId"], e["dataTime"], e["type"],
            [(dp["time"], dp["v"]) for dp in e["datapoints"]],
        )
        for i, e in enumerate(all_events)
    ]
    df = spark.createDataFrame(
        rows, T.StructType([
            T.StructField("pos", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("userId", T.LongType()),
            T.StructField("dataTime", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("datapoints", _DP_TYPE),
        ])
    )
    kept = cur.dedup_by_field_hash(df, fields, pos_col="pos", keep=keep)
    got_pos = sorted(r["pos"] for r in kept.select("pos").collect())
    # the reference keeps list elements; map them back to positions
    ref_pos = []
    used = set()
    for e in ref_kept:
        for i, a in enumerate(all_events):
            if a is e and i not in used:
                ref_pos.append(i)
                used.add(i)
                break
    assert got_pos == sorted(ref_pos)

    stats = cur.dedup_stats(kept).collect()[0]
    assert stats["total_input"] == len(all_events)
    assert stats["total_output"] == len(ref_kept)
    assert stats["duplicates_removed"] == len(ref_removed)


def test_validation_rules_match_port(spark):
    base = {
        "userId": 1, "dataTime": "2022-01-01T00:00:00Z",
        "type": "Seizure", "osdAlarmState": 1,
    }
    events = [
        {"id": 1, **base, "datapoints": [{"time": 0}]},          # valid
        {"id": 2, **base, "datapoints": []},                     # too few
        {"id": 3, **base},                                       # no dp field
        {"id": 4, **base, "datapoints": 7},                      # not a list
        {"id": 5, "dataTime": "x", "type": "s",
         "datapoints": [{"time": 0}]},                           # missing 2
        {"id": 6, **base, "datapoints": [{"time": 0}]},          # config-inv
    ]
    ref = RefValidation.validate_events_batch(
        events, min_datapoints=1, invalid_event_ids=[6]
    )

    rows = [
        (
            e["id"],
            e.get("userId"),
            e.get("dataTime"),
            e.get("type"),
            e.get("osdAlarmState"),
            (
                None
                if "datapoints" not in e
                else (
                    json.dumps(e["datapoints"])
                    if isinstance(e["datapoints"], list)
                    else str(e["datapoints"])
                )
            ),
        )
        for e in events
    ]
    df = spark.createDataFrame(
        rows,
        "id long, userId long, dataTime string, type string,"
        " osdAlarmState long, dp_json string",
    )
    reason, missing = cur.validation_rule_tags(
        ["id", "userId", "dataTime", "type", "osdAlarmState"],
        dp_json_col="dp_json",
        min_datapoints=1,
        invalid_ids=[6],
        id_col="id",
    )
    got = {
        r["id"]: (r["reason"], r["missing"])
        for r in df.select(
            "id", reason.alias("reason"), missing.alias("missing")
        ).collect()
    }
    for e in events:
        assert got[e["id"]][0] == ref[e["id"]], e["id"]
    # the missing-fields detail carries the field names like the
    # EventValidationError details dict (event_validation.py:92-98)
    assert got[5][1] == ["userId", "osdAlarmState"]

    report = cur.validation_report(
        df.select("id", reason.alias("reason"))
    )
    got_counts = {r["reason"]: r["n"] for r in report.collect()}
    from collections import Counter

    ref_counts = Counter(v or "valid" for v in ref.values())
    assert got_counts == dict(ref_counts)


def test_validation_dp_count_is_parsed_not_textual(spark):
    """The insufficient-datapoints rule counts the PARSED top-level list
    (event_validation.py:117 ``len(event['datapoints'])``). Real OSDB
    datapoints are multi-key objects whose serialization carries internal
    commas — at min_datapoints=2 a single two-key object must fail the
    rule even though a textual comma count reads it as 2 elements."""
    base = {
        "userId": 1, "dataTime": "2022-01-01T00:00:00Z",
        "type": "Seizure", "osdAlarmState": 1,
    }
    events = [
        # one object element, internal comma → insufficient at min 2
        {"id": 1, **base, "datapoints": [{"time": 0, "hr": 60}]},
        # two object elements → valid
        {"id": 2, **base,
         "datapoints": [{"time": 0, "hr": 60}, {"time": 5, "hr": 61}]},
        # two flat elements → valid
        {"id": 3, **base, "datapoints": [1, 2]},
        # one flat element → insufficient
        {"id": 4, **base, "datapoints": [1]},
        {"id": 5, **base, "datapoints": []},
    ]
    ref = RefValidation.validate_events_batch(events, min_datapoints=2)

    rows = [
        (
            e["id"], e["userId"], e["dataTime"], e["type"],
            e["osdAlarmState"], json.dumps(e["datapoints"]),
        )
        for e in events
    ]
    df = spark.createDataFrame(
        rows,
        "id long, userId long, dataTime string, type string,"
        " osdAlarmState long, dp_json string",
    )
    reason, _ = cur.validation_rule_tags(
        ["id", "userId", "dataTime", "type", "osdAlarmState"],
        dp_json_col="dp_json",
        min_datapoints=2,
        id_col="id",
    )
    got = {
        r["id"]: r["reason"]
        for r in df.select("id", reason.alias("reason")).collect()
    }
    assert got == ref


def test_datetime_cascade_matches_port(spark):
    cases = [
        # known tier (KNOWN_FORMATS, datetime_normalization.py:18-22)
        "02-10-2022 13:44:56",
        "2024-07-12T05:58:24Z",
        "04-05-2022 15:33:56",
        "2022-10-27T03:36:01Z",
        "2024-07-12 05:58:24",
        # fallback tier: strings the reference hands to
        # dateutil.parse(dayfirst=True) (:58-63) — the deterministic
        # subset the engine mirrors (ingest cascade's remainder,
        # flattenData.py:30-74)
        "2024-07-12T05:58:24.123456Z",
        "2024-07-12T05:58:24.123456",
        "2024-07-12T05:58:24",
        "12/07/2024 05:58:24",   # dayfirst: 12 July, not Dec 7
        "03/04/2022 15:33:56",   # ambiguous day<=12: dayfirst = 3 April
        "2024/07/12 05:58:24",   # 4-digit year leads: y/m/d either way
        # raising branch → engine NULL quarantine
        "not a date",
        "",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "dt string")
    got = df.select(
        "dt",
        cur.normalize_datetime_cascade(F.col("dt")).alias("norm"),
        cur.datetime_format_census(F.col("dt")).alias("fmt"),
        cur.datetime_parse_source(F.col("dt")).alias("src"),
    ).collect()
    for r in got:
        ref_norm = ref_normalize_datetime_string(r["dt"])
        if ref_norm in ("", None):
            assert r["norm"] is None or r["norm"] == ref_norm
        else:
            assert r["norm"] == ref_norm, r["dt"]
        assert r["fmt"] == ref_detect_datetime_format(r["dt"]), r["dt"]
        assert r["src"] == ref_datetime_parse_source(r["dt"]), r["dt"]


def test_publication_flatten_keeps_empty_events(spark):
    """osdb_publication.py:177-192: an event with no datapoints still
    emits its base record (datapoint columns absent → NULL here); events
    with datapoints emit one row per datapoint."""
    df = spark.createDataFrame(
        [
            (1, [(100, 60), (200, 61)]),
            (2, []),
            (3, None),
        ],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("datapoints", T.ArrayType(T.StructType([
                T.StructField("t", T.LongType()),
                T.StructField("hr", T.LongType()),
            ]))),
        ]),
    )
    flat = cur.flatten_for_publication(
        df, dp_col="datapoints", event_cols=["id"], dp_fields=["t", "hr"]
    )
    rows = sorted(
        ((r["id"], r["datapoint_t"], r["datapoint_hr"]) for r in
         flat.collect())
    )
    assert rows == [
        (1, 100, 60), (1, 200, 61), (2, None, None), (3, None, None),
    ]


@pytest.mark.parametrize(
    "strategy", ["most_datapoints", "last", "first"]
)
def test_selection_strategies_match_port(spark, strategy):
    """The non-default selection strategies
    (event_grouping.py:208-220): most_datapoints / last / else-earliest,
    each with the existing-event priority, replayed against the literal
    port over the same fixture."""
    events = _fixture_events()
    ref = RefGrouping.apply_sliding_window_grouping(
        events, threshold_seconds=180, exclude_event_types=["nda"],
        selection_strategy=strategy,
    )
    got = _run_engine(
        spark, events, exclude_types=["nda"], strategy=strategy
    )
    assert set(got) == {e["id"] for e in ref}
    for e in ref:
        g = got[e["id"]]
        assert [dp["time"] for dp in g["datapoints"]] == [
            dp["time"] for dp in e.get("datapoints", [])
        ], (strategy, e["id"])


def test_shape_gates_never_change_cascade_results(spark):
    """The _DT_SHAPE_GATES length/separator tests are NECESSARY
    conditions only: the gated cascade must equal the raw ungated
    coalesce(try_to_timestamp...) on every shape — including Spark's
    LENIENT fraction parsing (SSSSSS accepts 1-6 digits, so the micro
    layouts gate a length range, not an exact length)."""
    from pyspark.sql import functions as F

    cases = [
        "02-10-2022 13:44:56",
        "2024-07-12T05:58:24Z",
        "2024-07-12 05:58:24",
        "2024-07-12T05:58:24.123456Z",
        "2024-07-12T05:58:24.1Z",       # 1-digit fraction + Z
        "2024-07-12T05:58:24.12",       # 2-digit fraction, no Z
        "2024-07-12T05:58:24.123",
        "2024-07-12T05:58:24.123456",
        "2024-07-12T05:58:24.123456789",  # 9 digits: both reject
        "2024-07-12T05:58:24",
        "12/07/2024 05:58:24",
        "07/25/2024 05:58:24",
        "2024/07/12 05:58:24",
        "2024-7-12T05:58:24",           # 1-digit month: both reject
        "2024-07-12T5:58:24",           # 1-digit hour: both reject
        "garbage", "", None,
        "2024-07-12X05:58:24",          # wrong separator
        "02-10-2022 13:44:5",           # truncated seconds
    ]
    df = spark.createDataFrame([(c,) for c in cases], "dt string")
    for tier in (cur.KNOWN_DT_FORMATS, cur.FALLBACK_DT_FORMATS):
        raw = F.coalesce(
            *[F.try_to_timestamp(F.col("dt"), F.lit(f)) for f in tier]
        )
        got = df.select(
            "dt",
            cur._dt_cascade(F.col("dt"), tier).alias("gated"),
            raw.alias("ungated"),
        ).collect()
        for r in got:
            assert r["gated"] == r["ungated"], (r["dt"], tier)
