"""DSP kernel library (reference C9-C17) — the pandas-UDF slow path,
Arrow-vectorized, plus pure-SQL implementations where Catalyst can
express the math (line length, ZCR, taper, normalization).

Numerics follow the reference bit-for-bit where it matters
(SURVEY §7.4 risk 4):
* FFT magnitude² kept un-rooted "for pebble consistency"
  (libosd/osdAlgTools.py:6-14)
* specPower = mean bin power ≤12.5 Hz, DC excluded, / (nSamp/2), / 1000
  (libosd/osdAlgTools.py:107-122; osdAlg.py:29,211-212)
* roiPower = mean power in [alarmFreqMin, alarmFreqMax] (3-8 Hz default),
  / 1000 (libosd/osdAlgTools.py:124-134)
* roiRatio = 10 * roi / spec, gated: only computed when
  roiPower > alarmThresh (libosd/osdAlgTools.py:136-158)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SAMPLE_FREQ = 25.0
DEFAULT_FREQ_CUTOFF = 12.5


# --- numpy kernels (shared by the pandas UDFs and the tests) ---------------


def fft_power(accel: np.ndarray) -> np.ndarray:
    """Magnitude² spectrum of the first len(accel) samples (C9).

    Matches getFFT (libosd/osdAlgTools.py:95-105): numpy rfft-style via
    full fft, |X|² per bin (no sqrt — 'pebble consistency'), bins
    0..n//2.
    """
    fft = np.fft.fft(accel)
    n = len(accel) // 2
    power = np.abs(fft[: n + 1]) ** 2
    return power


def freq_to_bin(freq: float, n_samp: int, sample_freq: float) -> int:
    """freq → FFT bin index (libosd/osdAlgTools.py:17-24)."""
    return int(freq * n_samp / sample_freq)


def spec_power(
    accel: np.ndarray,
    sample_freq: float = DEFAULT_SAMPLE_FREQ,
    freq_cutoff: float = DEFAULT_FREQ_CUTOFF,
) -> float:
    """C10 specPower: mean bin power below cutoff, DC excluded,
    / (nSamp/2) / 1000 (libosd/osdAlgTools.py:107-122 incl. the
    acknowledged nSamp/2 FIXME, and the /1000 scale in osdAlg.py:29)."""
    n = len(accel)
    power = fft_power(accel)
    cutoff_bin = freq_to_bin(freq_cutoff, n, sample_freq)
    sel = power[1 : cutoff_bin + 1]
    return float(np.sum(sel) / len(sel) / (n / 2) / 1000.0)


def roi_power(
    accel: np.ndarray,
    freq_min: float = 3.0,
    freq_max: float = 8.0,
    sample_freq: float = DEFAULT_SAMPLE_FREQ,
) -> float:
    """C10 roiPower: mean bin power in [freq_min, freq_max] / 1000
    (libosd/osdAlgTools.py:124-134; osdAlg.py:198-212)."""
    n = len(accel)
    power = fft_power(accel)
    lo = freq_to_bin(freq_min, n, sample_freq)
    hi = freq_to_bin(freq_max, n, sample_freq)
    sel = power[lo : hi + 1]
    return float(np.sum(sel) / len(sel) / 1000.0)


def spectrum_ratio(spec: float, roi: float, alarm_thresh: float) -> float:
    """C11: 10*roi/spec gated by roiPower > alarmThresh
    (libosd/osdAlgTools.py:136-158); 0 when below threshold."""
    if roi <= alarm_thresh or spec <= 0:
        return 0.0
    return 10.0 * roi / spec


# --- taper windows (C12, libosd/osdAlgTools.py:27-92) ----------------------


def taper(kind: str, n: int) -> np.ndarray:
    i = np.arange(n)
    if kind == "rect":
        return np.ones(n)
    if kind == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * i / (n - 1))
    if kind == "hann":
        return 0.5 * (1 - np.cos(2 * np.pi * i / (n - 1)))
    if kind == "triangular":
        return 1 - np.abs((i - (n - 1) / 2) / ((n - 1) / 2))
    if kind == "raised_cosine":
        return 0.5 * (1 + np.cos(np.pi * (2 * i / (n - 1) - 1)))
    raise ValueError(f"unknown taper {kind!r}")


def taper_column(signal: Column, kind: str, n: int) -> Column:
    """Apply a precomputed taper to an array column JVM-side:
    zip_with(signal, lit(window), (a,b) -> a*b)."""
    win = taper(kind, n)
    win_col = F.array(*[F.lit(float(w)) for w in win])
    return F.zip_with(signal, win_col, lambda a, b: a * b)


# --- pure-SQL array kernels (C15-C17) --------------------------------------


def mean_line_length(arr: Column) -> Column:
    """C15 Σ|xᵢ−xᵢ₋₁|/(n−1) (libosd/osdAlgTools.py:161-172) — aggregate
    over zip_with of the array with its shifted self; no UDF."""
    n = F.size(arr)
    # both slices must be exactly n-1 long: zip_with pads the shorter
    # array with NULLs, which would poison the aggregate
    diffs = F.zip_with(
        F.slice(arr, 2, n - 1),
        F.slice(arr, 1, n - 1),
        lambda a, b: F.abs(a - b),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x) / (n - 1).cast(
        "double"
    )


def zero_crossing_rate(arr: Column, mean_center: bool = True) -> Column:
    """C16 ZCR (accelFeatures.py:79): crossings of the (mean-centered)
    signal / n. signum + pairwise diff, all JVM-side."""
    centered = arr
    if mean_center:
        m = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.size(arr).cast(
            "double"
        )
        centered = F.transform(arr, lambda x: x - m)
    signs = F.transform(centered, lambda x: F.signum(x))
    n1 = F.size(arr) - 1
    flips = F.zip_with(
        F.slice(signs, 2, n1),
        F.slice(signs, 1, n1),
        lambda a, b: F.abs(a - b),
    )
    return F.aggregate(flips, F.lit(0.0), lambda acc, x: acc + x) / (
        2.0 * F.size(arr).cast("double")
    )


def normalize_spectrum(arr: Column) -> Column:
    """C17: divide by array max (eventAnalyser.py:262-268)."""
    return F.transform(arr, lambda x: x / F.array_max(arr))


# --- Spark-level FFT feature stage (the Arrow batch path) ------------------

FFT_RESULT_FIELDS = "specPower double, roiPower double, roiRatio double"


def with_fft_features(
    df: DataFrame,
    signal_col: str = "rawData",
    sample_freq: float = DEFAULT_SAMPLE_FREQ,
    freq_min: float = 3.0,
    freq_max: float = 8.0,
    alarm_thresh: float = 100.0,
) -> DataFrame:
    """Compute specPower/roiPower/roiRatio per row from an array column
    via one Arrow-batched pandas UDF (mapInPandas keeps all other columns
    and avoids per-row serialization)."""
    schema_str = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema_str}, specPower_c double, roiPower_c double, roiRatio_c double"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            specs, rois, ratios = [], [], []
            for sig in pdf[signal_col]:
                if sig is None or len(sig) == 0:
                    specs.append(None)
                    rois.append(None)
                    ratios.append(None)
                    continue
                a = np.asarray(sig, dtype=np.float64)
                sp = spec_power(a, sample_freq)
                rp = roi_power(a, freq_min, freq_max, sample_freq)
                specs.append(sp)
                rois.append(rp)
                ratios.append(spectrum_ratio(sp, rp, alarm_thresh))
            yield pdf.assign(
                specPower_c=specs, roiPower_c=rois, roiRatio_c=ratios
            )

    return df.mapInPandas(compute, out_schema)
