"""Report-layer parity: saveResults2 tables/footers/summary
(results.py:44-263) and the dataSummariser index
(summariseData.py:105-205) against hand-computed expectations."""

import datetime

import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.reports.results import (
    ALARM_PHRASES,
    alarm_phrase,
    bucket_footers,
    event_graph_frame,
    event_results_table,
    event_summaries,
    summary_index_html,
    summary_stats,
    type_bucket,
    write_results_csv,
)


@pytest.fixture()
def fixtures(spark):
    # per-dp detector output for two algorithms over four events
    per_dp = spark.createDataFrame(
        [
            # event 1 (seizure): osd alarms, hr warns only
            ("osd", 1, 0), ("osd", 1, 2), ("hr", 1, 1),
            # event 2 (seizure): neither fires -> FN for both
            ("osd", 2, 0), ("hr", 2, 0),
            # event 3 (false alarm): osd fires -> FP
            ("osd", 3, 2), ("hr", 3, 0),
            # event 4 (other): quiet
            ("osd", 4, 0), ("hr", 4, 1),
        ],
        "algorithm string, eventId long, alarmState int",
    )
    meta = spark.createDataFrame(
        [
            (1, "error", 10, "tc"),
            (2, "error", 11, "plain"),
            (3, "click", 10, ""),
            (4, "view", 12, ""),
        ],
        "eventId long, event_type string, user_id long, sub string",
    )
    return per_dp, meta


def test_event_results_table(spark, fixtures):
    per_dp, meta = fixtures
    t = event_results_table(per_dp, meta, ["osd", "hr"])
    rows = {r["eventId"]: r for r in t.collect()}
    assert rows[1]["osd_verdict"] == "ALARM"
    assert rows[1]["hr_verdict"] == "WARN"
    assert rows[1]["bucket"] == "allSeizures" and rows[1]["expect_alarm"]
    assert rows[1]["osd_correct"] == 1 and rows[1]["hr_correct"] == 0
    assert rows[2]["osd_correct"] == 0  # FN
    assert rows[3]["bucket"] == "falseAlarms" and rows[3]["osd_correct"] == 0
    assert rows[4]["bucket"] == "otherEvents" and rows[4]["osd_correct"] == 1


def test_bucket_footers_and_tc(spark, fixtures):
    per_dp, meta = fixtures
    t = event_results_table(per_dp, meta, ["osd", "hr"])
    f = {
        r["bucket"]: r
        for r in bucket_footers(t, ["osd", "hr"], tc_col=F.col("sub") == "tc")
        .collect()
    }
    assert f["allSeizures"]["total"] == 2
    assert f["allSeizures"]["osd_correct"] == 1
    assert f["allSeizures"]["osd_prop"] == 0.5
    # TC footer: event 1 only, osd caught it
    assert f["tonicClonic"]["total"] == 1
    assert f["tonicClonic"]["osd_correct"] == 1
    assert f["falseAlarms"]["hr_prop"] == 1.0


def test_summary_stats_matches_reference_counting(spark, fixtures):
    per_dp, meta = fixtures
    t = event_results_table(per_dp, meta, ["osd", "hr"])
    s = {r["algorithm"]: r for r in summary_stats(t, ["osd", "hr"]).collect()}
    # results.py:122-136: osd -> TP=1 (e1), FN=1 (e2), FP=1 (e3), TN=1 (e4)
    assert (s["osd"]["ntp"], s["osd"]["nfn"], s["osd"]["nfp"], s["osd"]["ntn"]) == (1, 1, 1, 1)
    assert s["osd"]["tpr"] == 0.5 and s["osd"]["tnr"] == 0.5
    # hr never alarms: TPR 0, TNR 1
    assert (s["hr"]["ntp"], s["hr"]["nfn"]) == (0, 2)
    assert s["hr"]["tnr"] == 1.0


def test_alarm_phrases_cover_reference_indices(spark):
    df = spark.range(7).select(
        F.col("id").cast("int").alias("s")
    ).withColumn("p", alarm_phrase(F.col("s")))
    got = [r["p"] for r in df.orderBy("s").collect()]
    assert got == list(ALARM_PHRASES)


def test_write_results_csv(tmp_path, spark, fixtures):
    per_dp, meta = fixtures
    t = event_results_table(per_dp, meta, ["osd", "hr"])
    paths = write_results_csv(
        str(tmp_path), t, ["osd", "hr"], tc_col=F.col("sub") == "tc"
    )
    seiz = (tmp_path / "output_allSeizures.csv").read_text()
    assert "1, error, 10, ALARM, WARN, ALARM" in seiz
    assert "#Total, , 2" in seiz
    assert "#TonicClonic Total, , 1" in seiz
    summary = (tmp_path / "testRunner_Summary.txt").read_text()
    assert "Algorithm: osd" in summary and "TPR = 50.0%" in summary
    assert set(paths) == {
        "otherEvents", "allSeizures", "falseAlarms", "nda", "summary",
    }


def test_write_results_csv_cap(tmp_path, spark, fixtures):
    per_dp, meta = fixtures
    t = event_results_table(per_dp, meta, ["osd"])
    with pytest.raises(ValueError, match="cap"):
        write_results_csv(str(tmp_path), t, ["osd"], max_rows=2)


def test_event_summaries_and_index_html(spark):
    base = datetime.datetime(2024, 1, 1)
    dps = spark.createDataFrame(
        [
            # event 1: 5s grid with one 15s gap -> 1 gap
            (1, base), (1, base + datetime.timedelta(seconds=5)),
            (1, base + datetime.timedelta(seconds=20)),
            # event 2: clean pair
            (2, base), (2, base + datetime.timedelta(seconds=5)),
        ],
        "eventId long, dpTimestamp timestamp",
    )
    meta = spark.createDataFrame(
        [(1, "error", 10, "tc"), (2, "click", 11, "")],
        "eventId long, event_type string, user_id long, sub string",
    )
    s = event_summaries(dps, meta)
    rows = {r["eventId"]: r for r in s.collect()}
    assert rows[1]["nDataPoints"] == 3 and rows[1]["n_gaps"] == 1
    assert rows[2]["n_gaps"] == 0
    assert rows[1]["url"] == "Event_1_summary/index.html"

    page = summary_index_html(s, tc_filter=F.col("sub") == "tc")
    assert "Tonic-Clonic Seizures (1)" in page
    assert "All Seizures (1)" in page
    assert "False Alarms (1)" in page
    assert "Event_1_summary/index.html" in page


def test_event_graph_frame(spark, fixtures):
    per_dp, _ = fixtures
    per_dp = per_dp.withColumn(
        "dpTimestamp", F.timestamp_micros(F.monotonically_increasing_id())
    )
    g = event_graph_frame(per_dp, 1)
    assert g.count() == 3
    assert set(r["eventId"] for r in g.collect()) == {1}


def test_type_bucket_custom_map(spark):
    df = spark.createDataFrame([("Seizure",), ("NDA",), ("x",)], "t string")
    out = df.select(
        type_bucket(
            F.col("t"),
            {"seizure": "allSeizures", "nda": "nda"},
        ).alias("b")
    ).collect()
    assert [r["b"] for r in out] == ["allSeizures", "nda", "otherEvents"]


def test_seizure_day_spacing_pandas_semantics(spark):
    # userAnalyser.py:66-78 — same-day repeats collapse; rolling mean is
    # null until 3 non-null spacings fill the window (pandas min_periods)
    import datetime

    from openseizuredatabase_spark.reports.user_analysis import (
        seizure_day_spacing,
    )

    base = datetime.datetime(2024, 1, 1, 9)
    rows = []
    for d in (0, 0, 2, 5, 6, 10):  # day offsets; day 0 repeats
        rows.append((7, base + datetime.timedelta(days=d)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["day"].day: (r["spacing"], r["spacing_avg"])
        for r in seizure_day_spacing(ev).collect()
    }
    assert len(out) == 5  # distinct days only
    assert out[1] == (None, None)
    assert out[3][0] == 2 and out[3][1] is None
    assert out[6][0] == 3 and out[6][1] is None  # only 2 non-null spacings
    assert out[7][0] == 1 and out[7][1] == 2.0  # (2+3+1)/3
    assert out[11][0] == 4 and out[11][1] == round((3 + 1 + 4) / 3, 6)


def test_rapid_succession_dedup(spark):
    import datetime

    from openseizuredatabase_spark.reports.user_analysis import (
        rapid_succession_dedup,
    )

    base = datetime.datetime(2024, 1, 1, 9, 0)
    ev = spark.createDataFrame(
        [
            (base, 2.0), (base + datetime.timedelta(minutes=4), 1.0),
            (base + datetime.timedelta(minutes=25), 0.0),
            (base + datetime.timedelta(minutes=42), 1.0),
        ],
        "ts timestamp, value double",
    )
    out = sorted(
        (r["bucket_start"], r["max_state"])
        for r in rapid_succession_dedup(ev).collect()
    )
    # bucket 9:00 keeps max 2; 9:20 bucket has only state 0 -> dropped
    assert [m for _, m in out] == [2.0, 1.0]


def test_dense_month_counts_zero_fill(spark):
    import datetime

    from openseizuredatabase_spark.reports.user_analysis import (
        dense_month_counts,
    )

    ev = spark.createDataFrame(
        [
            ("a", datetime.datetime(2024, 1, 5)),
            ("a", datetime.datetime(2024, 4, 5)),
            ("b", datetime.datetime(2024, 2, 5)),
        ],
        "event_type string, ts timestamp",
    )
    out = dense_month_counts(ev)
    rows = {(r["event_type"], r["month"].month): r["n"] for r in out.collect()}
    # full 2-type x 4-month grid with zeros
    assert len(rows) == 8
    assert rows[("a", 1)] == 1 and rows[("a", 2)] == 0
    assert rows[("b", 2)] == 1 and rows[("b", 3)] == 0


def test_line_chart_svg_well_formed():
    import xml.etree.ElementTree as ET

    from openseizuredatabase_spark.reports.svg_chart import line_chart_svg

    svg = line_chart_svg(
        {"pSeizure": [(0, 0.1), (5, 0.9), (10, 0.4)],
         "alarmState": [(0, 0.0), (5, 2.0), (10, 1.0)]},
        title="event 42 <replay>", x_label="t", y_label="p",
    )
    root = ET.fromstring(svg)  # valid XML
    polys = [e for e in root.iter() if e.tag.endswith("polyline")]
    assert len(polys) == 2
    assert len(polys[0].attrib["points"].split()) == 3
    assert "&lt;replay&gt;" in svg  # titles are escaped


def test_bar_chart_svg_counts_and_cap():
    import xml.etree.ElementTree as ET

    import pytest as _pytest

    from openseizuredatabase_spark.reports.svg_chart import (
        MAX_POINTS,
        bar_chart_svg,
    )

    svg = bar_chart_svg(["2025-01", "2025-02"], [3, 7], title="monthly")
    root = ET.fromstring(svg)
    bars = [e for e in root.iter() if e.tag.endswith("rect")]
    assert len(bars) == 3  # background + 2 bars
    with _pytest.raises(ValueError):
        bar_chart_svg(["x"] * (MAX_POINTS + 1), [1] * (MAX_POINTS + 1))


def test_event_graph_svg_from_spark(spark):
    import xml.etree.ElementTree as ET

    from pyspark.sql import functions as F

    from openseizuredatabase_spark.reports.results import event_graph_frame
    from openseizuredatabase_spark.reports.svg_chart import event_graph_svg

    per_dp = spark.createDataFrame(
        [(7, float(i), 0.1 * i, i % 3) for i in range(20)]
        + [(8, 0.0, 0.5, 1)],
        "eventId long, dpTimestamp double, pSeizure double, alarmState long",
    )
    frame = event_graph_frame(per_dp, 7)
    svg = event_graph_svg(frame, ["pSeizure", "alarmState"], title="ev7")
    root = ET.fromstring(svg)
    polys = [e for e in root.iter() if e.tag.endswith("polyline")]
    assert len(polys) == 2
    assert len(polys[0].attrib["points"].split()) == 20  # event 8 pruned


def test_spectrogram_svg_grid(spark):
    from pyspark.sql import Row

    from openseizuredatabase_spark.reports.svg_chart import spectrogram_svg

    rows = [
        Row(sliceIdx=s, bin=b, power=float((s + 1) * (b + 1)))
        for s in range(4)
        for b in range(8)
    ]
    svg = spectrogram_svg(spark.createDataFrame(rows), title="spec")
    assert svg.count('fill="rgb(') == 32  # one cell per (slice, bin)
    assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
    assert "rgb(" in svg


def test_spectrogram_svg_empty_and_zero(spark):
    from pyspark.sql import Row

    from openseizuredatabase_spark.reports.svg_chart import spectrogram_svg

    empty = spark.createDataFrame([], "sliceIdx int, bin int, power double")
    assert "</svg>" in spectrogram_svg(empty)
    zeros = spark.createDataFrame(
        [Row(sliceIdx=0, bin=0, power=0.0), Row(sliceIdx=1, bin=0, power=0.0)]
    )
    svg = spectrogram_svg(zeros)
    assert svg.count('fill="rgb(') == 2  # all-floor values still render


def test_histogram_svg_bins_and_validity():
    """Histogram twin of the dataVisualiser skewness-distribution
    plotter: correct bin mass, valid XML."""
    import xml.etree.ElementTree as ET

    from openseizuredatabase_spark.reports.svg_chart import histogram_svg

    vals = [0.0] * 5 + [1.0] * 3 + [10.0] * 2
    svg = histogram_svg(vals, n_bins=10, title="skewness dist")
    root = ET.fromstring(svg)
    rects = [
        e for e in root.iter("{http://www.w3.org/2000/svg}rect")
        if e.get("fill") != "white"
    ]
    heights = [float(r.get("height")) for r in rects]
    assert len(rects) == 10
    # bin 0 holds 5 values, the top bin 2 — 2.5x the height
    assert heights[0] == max(heights)
    assert abs(heights[0] / heights[-1] - 2.5) < 0.01
    assert sum(1 for h in heights if h > 0) == 3


def test_scatter_svg_points_and_groups():
    """Scatter twin of the std-vs-max per-event plotter: one circle per
    point, group legend, valid XML."""
    import xml.etree.ElementTree as ET

    from openseizuredatabase_spark.reports.svg_chart import scatter_svg

    pts = [(1.0, 2.0), (2.0, 4.0), (3.0, 1.0)]
    svg = scatter_svg(pts, labels=["seizure", "normal", "seizure"],
                      title="std vs max")
    root = ET.fromstring(svg)
    circles = list(root.iter("{http://www.w3.org/2000/svg}circle"))
    assert len(circles) == 3
    fills = {c.get("fill") for c in circles}
    assert len(fills) == 2  # two groups, two colors
    assert "seizure" in svg and "normal" in svg
