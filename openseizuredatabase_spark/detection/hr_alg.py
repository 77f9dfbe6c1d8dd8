"""Heart-rate seizure-detection algorithm (reference W7 stateful variant).

Re-expresses user_tools/testRunner/hrAlg.py as a per-event
``applyInPandas`` stage. Three modes (hrAlg.py:10-17):

* MODE_SIMPLE — fixed high/low thresholds on the instantaneous HR
* MODE_ADAPTIVE_THRESHOLD — thresholds = trailing-average HR ± offsets
  (average over a fixed dp window, -1 sentinels excluded,
  hrAlg.py:55-67; the average INCLUDES the current dp since the history
  is updated before the check, hrAlg.py:117-121)
* MODE_AVERAGE_HR — the trailing average itself against fixed thresholds

A missing HR (-1) fully resets the machine and emits alarmState=0:
hrAlg.py:123-127 assign -1, but processDp falls through to the
not-in-alarm branch (hrAlg.py:147-156) which overwrites it with 0
before anything is emitted — the -1 is a dead store in the reference,
reproduced as such here (round-8 fidelity audit). The -1 slot still
occupies a position in the moving-average history (addToHist runs
before the validity check, hrAlg.py:117-121), excluded from the mean.
Otherwise the same accumulate/decay machine as the OSD algorithm runs
on the in-alarm flags (hrAlg.py:140-156).

The trailing averages are vectorized with pandas rolling windows; the
accumulate/decay recurrence is the shared ``alarm_recurrence``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from openseizuredatabase_spark.detection.osd_alg import OsdSettings, alarm_recurrence

MODE_SIMPLE = "MODE_SIMPLE"
MODE_ADAPTIVE = "MODE_ADAPTIVE_THRESHOLD"
MODE_AVERAGE = "MODE_AVERAGE_HR"


@dataclass(frozen=True)
class HrSettings:
    mode: str = MODE_SIMPLE
    thresh_high: float = 120.0
    thresh_low: float = 40.0
    thresh_offset_high: float = 30.0
    thresh_offset_low: float = 20.0
    moving_average_window_dps: int = 12  # 60 s / 5 s
    sample_period: float = 5.0
    warn_time: float = 5.0
    alarm_time: float = 10.0


def hr_in_alarm(hr: pd.Series, s: HrSettings) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized in-alarm flags + the missing mask for one ordered event."""
    missing = (hr == -1) | hr.isna()
    valid = hr.where(~missing)
    # trailing average over the last N dps including current, sentinel-free
    avg = valid.rolling(s.moving_average_window_dps, min_periods=1).mean()
    if s.mode == MODE_SIMPLE:
        flags = (hr > s.thresh_high) | (hr < s.thresh_low)
    elif s.mode == MODE_ADAPTIVE:
        flags = (hr > avg + s.thresh_offset_high) | (hr < avg - s.thresh_offset_low)
    elif s.mode == MODE_AVERAGE:
        flags = (avg > s.thresh_high) | (avg < s.thresh_low)
    else:
        raise ValueError(f"unknown mode {s.mode!r}")
    flags = flags.fillna(False) & ~missing
    return flags.to_numpy(dtype=bool), missing.to_numpy(dtype=bool)


def run_hr_alg(
    events_dp: DataFrame,
    settings: HrSettings | None = None,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    hr_col: str = "hr",
) -> DataFrame:
    s = settings or HrSettings()
    out_schema = f"{event_col} long, {ts_col} timestamp, hr double, alarmState int, alarmCount double"
    osd = OsdSettings(
        sample_period=s.sample_period, warn_time=s.warn_time, alarm_time=s.alarm_time
    )

    def per_event(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        hr = pdf[hr_col].astype(float)
        flags, missing = hr_in_alarm(hr, s)
        states, counts = alarm_recurrence(flags.tolist(), osd, missing.tolist())
        states = np.asarray(states)
        counts = np.asarray(counts, dtype=float)
        return pd.DataFrame(
            {
                event_col: pdf[event_col].values,
                ts_col: pdf[ts_col].values,
                "hr": hr.values,
                "alarmState": states,
                "alarmCount": counts,
            }
        )

    return (
        events_dp.select(event_col, ts_col, hr_col)
        .groupBy(event_col)
        .applyInPandas(per_event, out_schema)
    )
