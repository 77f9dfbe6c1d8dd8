"""Model-backed detectors: specAlg (spectrogram CNN) and nnAlg (raw-window
CNN) — Spark-first replay.

The reference runs both as stateful per-datapoint Python objects:

* specAlg (user_tools/testRunner/specAlg.py:54-124): accumulate accel
  samples into a rolling buffer (nnTraining2/specCnnModel.py:103-118,
  trim to analysisSamp), build a spectrogram of FFT-magnitude slices
  (specCnnModel.py:120-167: de-mean, mG→G, |fft|[0:n/2], zero-clip),
  score with a keras CNN, pSeizure>0.5 ⇒ in-alarm, then the OSD
  accumulate/decay alarm machine (specAlg.py:88-113) with 'single' mode
  override.
* nnAlg (user_tools/testRunner/nnAlg.py:90-191): same rolling buffer to
  bufferSeconds·sampleFreq samples (deepEpiCnnModel_torch.py:249-284,
  mG→G, optional z-normalise), ExecuTorch CNN, pSeizure≥probThresh,
  same alarm machine — but an invalid/not-yet-full datapoint REPORTS the
  current state without advancing the machine (nnAlg.py:136-143),
  whereas specAlg advances it with in-alarm=False (specAlg.py:70-73).

Spark mapping: the buffer+recurrence is order-dependent per event, so
each runs as ONE ``applyInPandas`` grouped transform (the run_osd_alg
shape — events parallel across executors, recurrence vectorized inside
the Arrow batch). The CNN backends (keras / ExecuTorch) are absent in
this environment; scoring is pluggable via the ml.inference contract —
any callable mapping the flattened input window to P(seizure). The
default is the LinearModel stub, which keeps every trace deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from openseizuredatabase_spark.detection.osd_alg import OsdSettings, alarm_recurrence

ScoreFn = Callable[[np.ndarray], float]


@dataclass(frozen=True)
class SpecSettings:
    """specAlg + SpecCnnModel knobs (specAlg.py:32-41,
    specCnnModel.py:30-46)."""

    analysis_samp: int = 250
    spec_samp: int = 125
    spec_step: int = 125
    sample_freq: float = 25.0
    zero_tol: float = 0.001
    mode: str = "multi"  # 'single' forces 2/0 from the current dp alone
    sample_period: float = 5.0
    warn_time: float = 5.0
    alarm_time: float = 10.0
    prob_thresh: float = 0.5

    @property
    def n_freq(self) -> int:
        return self.spec_samp // 2

    @property
    def n_spec(self) -> int:
        if self.spec_step < self.spec_samp:
            return (
                self.analysis_samp // self.spec_step
                - self.spec_samp // self.spec_step
                + 1
            )
        return self.analysis_samp // self.spec_step


@dataclass(frozen=True)
class NnSettings:
    """nnAlg knobs (nnAlg.py:38-51)."""

    sample_freq: float = 25.0
    buffer_seconds: float = 30.0
    normalise: bool = False
    sd_thresh: float = 0.0  # stdev-% low-motion rejection; 0 disables
    mode: str = "multi"
    sample_period: float = 5.0
    warn_time: float = 5.0
    alarm_time: float = 10.0
    prob_thresh: float = 0.5

    @property
    def buffer_samp(self) -> int:
        return int(self.buffer_seconds * self.sample_freq)


def make_spectrogram(buf: np.ndarray, s: SpecSettings) -> np.ndarray:
    """specCnnModel.generateSpectralHistoryFromAccelLst:120-167 — per
    slice: de-mean, mG→G, rect-window FFT magnitude, clip |m|<zeroTol to
    0, keep bins [0, n/2). Output shape (nFreq, nSpec)."""
    cols = []
    end = s.spec_samp
    while end <= len(buf):
        sl = buf[end - s.spec_samp : end]
        sl = (sl - sl.mean()) / 1000.0
        mag = np.abs(np.fft.fft(sl))
        mag[mag < s.zero_tol] = 0.0
        cols.append(mag[: s.n_freq])
        end += s.spec_step
    return np.stack(cols, axis=1)


def _step(state: int, count: float, in_alarm: bool, s) -> tuple[int, float]:
    """One alarm-machine step (shared accumulate/decay, specAlg.py:88-104
    == osdAlg.py:299-313); alarm_recurrence is its vectorized batch form."""
    states, counts = alarm_recurrence(
        [in_alarm],
        OsdSettings(
            sample_period=s.sample_period,
            warn_time=s.warn_time,
            alarm_time=s.alarm_time,
        ),
        init_state=state,
        init_count=count,
    )
    return states[0], counts[0]


def run_spec_alg(
    events_dp: DataFrame,
    score: ScoreFn,
    settings: SpecSettings | None = None,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    signal_col: str = "rawData",
) -> DataFrame:
    """Replay exploded datapoints through specAlg. One shuffle on the
    event key; each event is one Arrow batch, events run in parallel."""
    s = settings or SpecSettings()
    out_schema = (
        f"{event_col} long, {ts_col} timestamp, pSeizure double, "
        "valid boolean, alarmState int, alarmCount double"
    )

    def per_event(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        buf: list[float] = []
        state, count = 0, 0.0
        probs, valids, states, counts = [], [], [], []
        for sig in pdf[signal_col]:
            p, valid = 0.0, False
            if sig is not None and len(sig) > 0:
                buf.extend(float(x) for x in sig)
                if len(buf) > s.analysis_samp:
                    buf = buf[-s.analysis_samp :]
                if len(buf) >= s.analysis_samp:
                    spec = make_spectrogram(np.asarray(buf), s)
                    p = float(score(spec.flatten()))
                    valid = True
            # invalid dp ⇒ in_alarm=False but the machine STILL advances
            # (specAlg.py:70-73,97-104 — decay path runs)
            in_alarm = valid and p > s.prob_thresh
            state, count = _step(state, count, in_alarm, s)
            if s.mode == "single":  # specAlg.py:109-113 overrides state
                state = 2 if in_alarm else 0
            probs.append(p)
            valids.append(valid)
            states.append(state)
            counts.append(count)
        return pd.DataFrame(
            {
                event_col: pdf[event_col].values,
                ts_col: pdf[ts_col].values,
                "pSeizure": probs,
                "valid": valids,
                "alarmState": states,
                "alarmCount": counts,
            }
        )

    return (
        events_dp.select(event_col, ts_col, signal_col)
        .groupBy(event_col)
        .applyInPandas(per_event, out_schema)
    )


def run_nn_alg(
    events_dp: DataFrame,
    score: ScoreFn,
    settings: NnSettings | None = None,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    signal_col: str = "rawData",
) -> DataFrame:
    """Replay exploded datapoints through nnAlg (same scaffold; differs
    from specAlg in buffering window, input normalisation, low-motion
    rejection, and the no-advance-on-invalid rule)."""
    s = settings or NnSettings()
    out_schema = (
        f"{event_col} long, {ts_col} timestamp, pSeizure double, "
        "valid boolean, alarmState int, alarmCount double"
    )

    def per_event(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        buf: list[float] = []
        state, count = 0, 0.0
        probs, valids, states, counts = [], [], [], []
        for sig in pdf[signal_col]:
            arr = None
            if sig is not None and len(sig) > 0 and not any(
                x is None for x in sig
            ):
                arr = np.asarray(sig, dtype=float)
                # low-motion rejection: stdev as % of mean (nnAlg.py:114-121)
                if s.sd_thresh > 0.0:
                    avg = float(arr.mean()) if arr.size else 0.0
                    sd_pct = 100.0 * float(arr.std()) / avg if avg != 0 else 0.0
                    if sd_pct < s.sd_thresh:
                        arr = None
            if arr is not None:
                buf.extend(arr.tolist())
                if len(buf) > s.buffer_samp:
                    buf = buf[-s.buffer_samp :]
            if arr is None or len(buf) < s.buffer_samp:
                # invalid or buffer not yet full: report current state,
                # machine does NOT advance (nnAlg.py:136-143)
                probs.append(None)
                valids.append(False)
                states.append(state)
                counts.append(count)
                continue
            vec = np.asarray(buf[-s.buffer_samp :], dtype=float) / 1000.0
            if s.normalise:  # deepEpiCnnModel_torch.py:279-284
                std = vec.std()
                vec = (vec - vec.mean()) / std if std != 0 else vec - vec.mean()
            p = float(score(vec))
            in_alarm = p >= s.prob_thresh  # nnAlg.py:153 (>=, not >)
            state, count = _step(state, count, in_alarm, s)
            if s.mode == "single":  # nnAlg.py:180-181
                state = 2 if in_alarm else 0
            probs.append(p)
            valids.append(True)
            states.append(state)
            counts.append(count)
        return pd.DataFrame(
            {
                event_col: pdf[event_col].values,
                ts_col: pdf[ts_col].values,
                "pSeizure": probs,
                "valid": valids,
                "alarmState": states,
                "alarmCount": counts,
            }
        )

    return (
        events_dp.select(event_col, ts_col, signal_col)
        .groupBy(event_col)
        .applyInPandas(per_event, out_schema)
    )


def default_spec_score(settings: SpecSettings | None = None) -> ScoreFn:
    """Deterministic stand-in for the keras spectrogram CNN: mean-activity
    linear scorer through the ml.inference LinearModel contract."""
    from openseizuredatabase_spark.ml.inference import LinearModel

    s = settings or SpecSettings()
    dim = s.n_freq * s.n_spec
    model = LinearModel(weights=tuple([1.0 / dim] * dim), bias=-0.5)
    return lambda vec: float(model.predict(vec.reshape(1, -1))[0])


def default_nn_score(settings: NnSettings | None = None) -> ScoreFn:
    """Deterministic stand-in for the ExecuTorch CNN over the raw 30 s
    window (same contract: vector in, P(seizure) out)."""
    from openseizuredatabase_spark.ml.inference import LinearModel

    s = settings or NnSettings()
    dim = s.buffer_samp
    model = LinearModel(weights=tuple([1.0 / dim] * dim), bias=-1.0)
    return lambda vec: float(model.predict(vec.reshape(1, -1))[0])


def cnn_spec_score(
    settings: SpecSettings | None = None, model=None, seed: int = 7
) -> ScoreFn:
    """The real spec-CNN scorer: a pure-numpy forward pass of the
    reference architecture (Conv1D(64,3,same)+BN+ReLU blocks, GAP,
    softmax — specCnnModel.py:55-75) over the flattened spectrogram.
    Pass ``model`` to score trained ``.npz`` weights; default weights
    are deterministic dyadic rationals."""
    from openseizuredatabase_spark.ml.cnn import make_spec_cnn

    s = settings or SpecSettings()
    m = model if model is not None else make_spec_cnn(s.n_freq, s.n_spec, seed=seed)
    return lambda vec: float(m.predict(vec.reshape(1, -1))[0])


def cnn_nn_score(
    settings: NnSettings | None = None, model=None, seed: int = 13
) -> ScoreFn:
    """The real raw-accel CNN scorer: DeepEpiCnn's 14-conv forward pass
    (deepEpiCnnModel_torch.py:38-162) over the 30 s magnitude buffer."""
    from openseizuredatabase_spark.ml.cnn import make_deep_epi_cnn

    s = settings or NnSettings()
    m = model if model is not None else make_deep_epi_cnn(s.buffer_samp, seed=seed)
    return lambda vec: float(m.predict(vec.reshape(1, -1))[0])
