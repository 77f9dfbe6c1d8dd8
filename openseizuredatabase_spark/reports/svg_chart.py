"""Dependency-free SVG renders of the reference's PNG report charts.

The reference draws its report figures with matplotlib — the per-event
pSeizure/alarmState time series (user_tools/testRunner/report.py:35-135)
and the dataSummariser monthly-count bars (user_tools/dataSummariser/
dashboard.py:132-145). That wheel is not in this environment, so the
charts render as plain SVG strings instead: same inputs (the bounded
report frames), same figures, zero dependencies, valid XML that any
browser opens. Rendering stays a driver-side, capped artifact — all
heavy lifting happened in the DataFrame stages that produced the frame.
"""

from __future__ import annotations

from typing import Sequence
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

_W, _H = 800, 300
_ML, _MR, _MT, _MB = 60, 20, 30, 40  # margins
MAX_POINTS = 100_000  # reports are human-sized artifacts

_PALETTE = ("#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#76b7b2")


def _check_cap(n: int) -> None:
    if n > MAX_POINTS:
        raise ValueError(
            f"chart frame has {n} rows > cap {MAX_POINTS}; aggregate "
            "further — report charts are bounded driver-side renders"
        )


def _scale(vals: Sequence[float], lo_px: float, hi_px: float):
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    return lambda v: lo_px + (v - lo) / span * (hi_px - lo_px), lo, hi


def _frame(title: str, x_label: str, y_label: str, body: str) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{_H}" viewBox="0 0 {_W} {_H}">\n'
        f'<rect width="{_W}" height="{_H}" fill="white"/>\n'
        f'<text x="{_W / 2}" y="18" text-anchor="middle" '
        f'font-size="14">{escape(title)}</text>\n'
        f'<text x="{_W / 2}" y="{_H - 8}" text-anchor="middle" '
        f'font-size="11">{escape(x_label)}</text>\n'
        f'<text x="14" y="{_H / 2}" text-anchor="middle" font-size="11" '
        f'transform="rotate(-90 14 {_H / 2})">{escape(y_label)}</text>\n'
        f'<line x1="{_ML}" y1="{_H - _MB}" x2="{_W - _MR}" '
        f'y2="{_H - _MB}" stroke="black"/>\n'
        f'<line x1="{_ML}" y1="{_MT}" x2="{_ML}" y2="{_H - _MB}" '
        f'stroke="black"/>\n'
        f"{body}</svg>\n"
    )


def line_chart_svg(
    series: dict[str, list[tuple[float, float]]],
    title: str = "",
    x_label: str = "",
    y_label: str = "",
) -> str:
    """Multi-series polyline chart from (x, y) pairs per series name."""
    pts = [p for s in series.values() for p in s]
    _check_cap(len(pts))
    if not pts:
        return _frame(title, x_label, y_label, "")
    sx, *_ = _scale([p[0] for p in pts], _ML, _W - _MR)
    sy, ylo, yhi = _scale([p[1] for p in pts], _H - _MB, _MT)
    body = []
    for i, (name, s) in enumerate(series.items()):
        color = _PALETTE[i % len(_PALETTE)]
        coords = " ".join(
            f"{sx(x):.1f},{sy(y):.1f}" for x, y in sorted(s)
        )
        body.append(
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{coords}"/>\n'
            f'<text x="{_W - _MR - 4}" y="{_MT + 14 * (i + 1)}" '
            f'text-anchor="end" font-size="11" fill="{color}">'
            f"{escape(name)}</text>\n"
        )
    for frac, val in ((0.0, ylo), (1.0, yhi)):
        ypx = (_H - _MB) + frac * (_MT - (_H - _MB))
        body.append(
            f'<text x="{_ML - 6}" y="{ypx:.1f}" text-anchor="end" '
            f'font-size="10">{val:g}</text>\n'
        )
    return _frame(title, x_label, y_label, "".join(body))


def bar_chart_svg(
    labels: Sequence[str],
    values: Sequence[float],
    title: str = "",
    x_label: str = "",
    y_label: str = "",
) -> str:
    """Categorical bar chart (the dashboard monthly-count figure shape)."""
    _check_cap(len(values))
    if not values:
        return _frame(title, x_label, y_label, "")
    sy, _, vhi = _scale([0.0, *values], _H - _MB, _MT)
    n = len(values)
    slot = (_W - _ML - _MR) / n
    bw = max(1.0, slot * 0.8)
    body = []
    for i, (lab, v) in enumerate(zip(labels, values)):
        x = _ML + i * slot + (slot - bw) / 2
        y = sy(v)
        # the chart models counts; a negative value would put y below the
        # baseline and emit an invalid negative-height rect — clamp at 0
        h = max(0.0, (_H - _MB) - y)
        body.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" '
            f'height="{h:.1f}" fill="{_PALETTE[0]}"/>\n'
        )
        if n <= 40:  # label density guard
            body.append(
                f'<text x="{x + bw / 2:.1f}" y="{_H - _MB + 12}" '
                f'text-anchor="middle" font-size="9">{escape(str(lab))}'
                "</text>\n"
            )
    body.append(
        f'<text x="{_ML - 6}" y="{_MT}" text-anchor="end" '
        f'font-size="10">{vhi:g}</text>\n'
    )
    return _frame(title, x_label, y_label, "".join(body))


def event_graph_svg(
    frame: DataFrame,
    value_cols: Sequence[str],
    ts_col: str = "dpTimestamp",
    title: str = "",
) -> str:
    """report.py:35-135 generateEventGraph as SVG: per-dp series of the
    given columns for one event (feed it event_graph_frame's output —
    already filtered/ordered, so this collect is one event's dps)."""
    # cap BEFORE collecting: limit(cap+1) bounds what can ever reach the
    # driver, so an oversized frame fails the guard instead of exhausting
    # driver memory during the collect
    per_row = max(1, len(value_cols))
    row_cap = MAX_POINTS // per_row
    rows = frame.select(ts_col, *value_cols).limit(row_cap + 1).collect()
    _check_cap(len(rows) * per_row)
    xs = [
        r[ts_col].timestamp() if hasattr(r[ts_col], "timestamp") else float(r[ts_col])
        for r in rows
    ]
    series = {
        c: [
            (x, float(r[c]))
            for x, r in zip(xs, rows)
            if r[c] is not None
        ]
        for c in value_cols
    }
    return line_chart_svg(
        series, title=title, x_label="time (s)", y_label="value"
    )


def spectrogram_svg(
    frame: DataFrame,
    x_col: str = "sliceIdx",
    y_col: str = "bin",
    val_col: str = "power",
    title: str = "",
) -> str:
    """dataVisualiser/spectrogram_rawdata_plotter.py as SVG: a (time
    slice x frequency bin) power heatmap, log-scaled color like the
    reference's imshow(norm=LogNorm).

    Feed it a per-event spectral frame (w9 spectral_history output
    unnested to one row per (slice, bin)) — already event-filtered, so
    the grid is epochs x n_bins and the capped collect is tiny.
    """
    rows = (
        frame.select(x_col, y_col, val_col).limit(MAX_POINTS + 1).collect()
    )
    _check_cap(len(rows))
    if not rows:
        return _frame(title, "time slice", "freq bin", "")
    import math as _math

    xs = sorted({int(r[x_col]) for r in rows})
    ys = sorted({int(r[y_col]) for r in rows})
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    vals = [max(float(r[val_col]), 0.0) for r in rows]
    vmax = max(vals) or 1.0
    floor = vmax / 1e6  # 60 dB display range, like a LogNorm colorbar
    cw = (_W - _ML - _MR) / len(xs)
    ch = (_H - _MT - _MB) / len(ys)
    body = []
    for r, v in zip(rows, vals):
        frac = (
            0.0
            if v <= floor
            else _math.log(v / floor) / _math.log(vmax / floor)
        )
        # dark blue -> bright yellow ramp
        red = int(250 * frac)
        green = int(60 + 190 * frac)
        blue = int(110 * (1 - frac) + 40)
        x = _ML + xi[int(r[x_col])] * cw
        # SVG y grows downward; low frequency bins at the bottom
        y = _MT + (len(ys) - 1 - yi[int(r[y_col])]) * ch
        body.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{cw + 0.5:.1f}" '
            f'height="{ch + 0.5:.1f}" '
            f'fill="rgb({red},{green},{blue})"/>\n'
        )
    return _frame(title, "time slice", "freq bin", "".join(body))


def histogram_svg(
    values: Sequence[float],
    n_bins: int = 20,
    title: str = "",
    x_label: str = "",
    y_label: str = "count",
) -> str:
    """Histogram — the dataVisualiser per-feature distribution plotter
    (the skewness-distribution figure of user_tools/dataVisualiser's
    plotters) as SVG: fixed equal-width bins over [min, max], rendered
    through the bar renderer. Binning is driver-side over an already
    bounded value list (cap enforced); the heavy reduction to those
    values happened in DataFrame stages."""
    _check_cap(len(values))
    if not values:
        return _frame(title, x_label, y_label, "")
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    counts = [0] * n_bins
    for v in values:
        b = min(int((v - lo) / span * n_bins), n_bins - 1)
        counts[b] += 1
    labels = [f"{lo + span * (i + 0.5) / n_bins:.3g}" for i in range(n_bins)]
    return bar_chart_svg(labels, counts, title, x_label, y_label)


def scatter_svg(
    points: Sequence[tuple[float, float]],
    title: str = "",
    x_label: str = "",
    y_label: str = "",
    labels: Sequence[str] | None = None,
) -> str:
    """Scatter plot — the dataVisualiser std-vs-max per-event figure as
    SVG: one circle per (x, y) with optional per-point group labels
    colored by the shared palette."""
    _check_cap(len(points))
    if not points:
        return _frame(title, x_label, y_label, "")
    sx, *_ = _scale([p[0] for p in points], _ML, _W - _MR)
    sy, ylo, yhi = _scale([p[1] for p in points], _H - _MB, _MT)
    names = list(dict.fromkeys(labels)) if labels else []
    body = []
    for i, (x, y) in enumerate(points):
        color = (
            _PALETTE[names.index(labels[i]) % len(_PALETTE)]
            if labels
            else _PALETTE[0]
        )
        body.append(
            f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="2.5" '
            f'fill="{color}" fill-opacity="0.7"/>\n'
        )
    for i, name in enumerate(names[: len(_PALETTE)]):
        body.append(
            f'<text x="{_W - _MR - 4}" y="{_MT + 14 * (i + 1)}" '
            f'text-anchor="end" font-size="11" '
            f'fill="{_PALETTE[i % len(_PALETTE)]}">{escape(name)}</text>\n'
        )
    for frac, val in ((0.0, ylo), (1.0, yhi)):
        ypx = (_H - _MB) + frac * (_MT - (_H - _MB))
        body.append(
            f'<text x="{_ML - 6}" y="{ypx:.1f}" text-anchor="end" '
            f'font-size="10">{val:g}</text>\n'
        )
    return _frame(title, x_label, y_label, "".join(body))
