"""Per-datapoint model detectors: svmAlg, amberAlg, jamie1, lstmAlg,
deviceAlg — the remaining testRunner algorithm family, Spark-first.

Unlike spec/nn (rolling multi-dp buffers, detection/model_algs.py), these
score each datapoint independently and only the alarm machine is
order-dependent:

* svmAlg (user_tools/testRunner/svmAlg.py:44-98): raw 125-sample window →
  keras CNN, pSeizure>0.5 ⇒ in-alarm, OSD accumulate/decay machine,
  'single' mode forces 2/0 from the current dp.
* amberAlg (user_tools/testRunner/amberAlg.py:56-155): low-movement
  rejection (stdev as % of mean < sdThresh ⇒ invalid, machine still
  advances with in-alarm=False), input = (125,2) of [accel, HR·125],
  keras AMBER model, same machine + 'single' override.
* jamie1 (user_tools/testRunner/jamie1.py:74-186): per-dp FFT features
  (its OWN copies of specPower/roiPower — no ACCEL_SCALE_FACTOR
  division, and the ratio gates on specPower > alarmThresh where
  osdAlg.py:213 gates on roiPower), input = (125,5) rows of
  [specPower, roiPower, ratio, HR, accel[n]], joblib model, same
  machine; 'single' sets alarmState to the raw 2/0 verdict.
* lstmAlg (user_tools/testRunner/lstmAlg.py:60-80): parses data3D as
  |x|+|y|+|z| per triplet (falling back to the magnitude array), but its
  getAlarmState is an acknowledged stub ("FIXME - implement") that
  always returns 0 and no machine runs — reproduced here as the same
  scaffold with a pluggable scorer defaulting to the reference's
  constant-0 verdict, stateless output (alarmCount always 0).
* deviceAlg (user_tools/testRunner/deviceAlg.py:58-91): drives a
  physical watch over TCP. The protocol logic (sendSettings handshake,
  bounded result retries, non-JSON fallback) is implemented and testable
  against an injected transport; only the socket itself is environment-
  blocked (same policy as the S7/S8 connectors).

Spark mapping: scoring is stateless per row, so it runs MAP-SIDE as an
Arrow-batched pandas UDF before any exchange — the Arrow batch is the
inference batch (predict_on_batch done properly) and the wide signal
arrays never shuffle. Only the alarm machine is order-dependent: it runs
as mapInPandas over key-partitioned, key+time-sorted narrow rows
(event, ts, p, flag — the run_state_machine idiom), so the single
shuffle moves 4 scalar columns instead of 125-sample windows. Events
parallel across executors (the reference replays serially,
alg_runner.py:189-374).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.osd_alg import (
    OsdSettings,
    alarm_recurrence,
)

# (N, D) window matrix -> (N,) P(seizure); LinearModel.predict satisfies it
BatchScoreFn = Callable[[np.ndarray], np.ndarray]


@dataclass(frozen=True)
class DpModelSettings:
    """Shared knobs of the per-dp model family (svmAlg.py:22-31,
    amberAlg.py:33-46, jamie1.py:20-36)."""

    n_samp: int = 125
    sample_freq: float = 25.0
    mode: str = "multi"  # 'single' reports the raw per-dp verdict
    sample_period: float = 5.0
    warn_time: float = 5.0
    alarm_time: float = 10.0
    prob_thresh: float = 0.5
    sd_thresh: float = 0.0  # amber: % stdev low-movement gate; 0 disables
    # jamie1 spectral-feature knobs (jamie1.py:26-31)
    alarm_freq_min: float = 3.0
    alarm_freq_max: float = 8.0
    alarm_thresh: float = 100.0
    stateless: bool = False  # lstm: no alarm machine, count pinned to 0

    @property
    def osd(self) -> OsdSettings:
        return OsdSettings(
            sample_period=self.sample_period,
            warn_time=self.warn_time,
            alarm_time=self.alarm_time,
        )


# --- per-algorithm window builders ----------------------------------------
# Each maps the event's raw windows to a stacked (N, D) float matrix plus a
# validity mask; invalid rows score 0 and count as in-alarm=False.

VectorizeFn = Callable[[pd.Series, pd.Series], tuple[np.ndarray, np.ndarray]]


def _clean(sig, n_samp: int) -> np.ndarray | None:
    if sig is None or len(sig) != n_samp:
        return None
    try:
        # Arrow delivers null elements as NaN; raw Python lists may
        # carry None, which asarray rejects — both mean invalid
        a = np.asarray(sig, dtype=np.float64)
    except (TypeError, ValueError):
        return None
    if np.isnan(a).any():
        return None
    return a


def svm_vectorize(s: DpModelSettings) -> VectorizeFn:
    """svmAlg.py:46-48: the raw window, unnormalised, reshaped (1,125,1).
    (Reference hard-exits on a short window, amberAlg.py:88-90 pattern —
    here it is an invalid row instead so one bad dp can't kill the job.)

    Batch fast path: right-length rows stack into one matrix and the
    NaN/validity screen vectorizes across the whole Arrow batch."""

    def build(sigs: pd.Series, _hr: pd.Series):
        n = len(sigs)
        mat = np.zeros((n, s.n_samp))
        valid = np.zeros(n, dtype=bool)
        arrs = sigs.to_numpy()
        rows, kept = [], []
        for i, a in enumerate(arrs):
            if a is None or len(a) != s.n_samp:
                continue
            try:
                rows.append(np.asarray(a, dtype=np.float64))
                kept.append(i)
            except (TypeError, ValueError):
                continue
        if kept:
            sub = np.stack(rows)
            good = ~np.isnan(sub).any(axis=1)
            idx = np.asarray(kept)[good]
            mat[idx] = sub[good]
            valid[idx] = True
        return mat, valid

    return build


def amber_vectorize(s: DpModelSettings) -> VectorizeFn:
    """amberAlg.py:56-99 dp2vector: reject low-movement windows
    (100·std/mean < sdThresh; zero mean ⇒ accStd 0 ⇒ rejected when the
    gate is on), then two stacked channels [accel·125, HR·125]."""

    def build(sigs: pd.Series, hrs: pd.Series):
        mat = np.zeros((len(sigs), 2 * s.n_samp))
        valid = np.zeros(len(sigs), dtype=bool)
        for i, (sig, hr) in enumerate(zip(sigs, hrs)):
            a = _clean(sig, s.n_samp)
            if a is None:
                continue
            if s.sd_thresh > 0.0:
                avg = float(a.mean())
                acc_std = 100.0 * float(a.std()) / avg if avg != 0 else 0.0
                if acc_std < s.sd_thresh:
                    continue  # machine still advances, in-alarm=False
            hr_val = 0.0 if hr is None or pd.isna(hr) else float(hr)
            mat[i, : s.n_samp] = a
            mat[i, s.n_samp :] = hr_val
            valid[i] = True
        return mat, valid

    return build


def jamie1_vectorize(s: DpModelSettings) -> VectorizeFn:
    """jamie1.py:74-135: per-window FFT features by jamie1's own
    formulas — specPower = Σ|fft[1..n/2]|² / n / 2 (no scale division,
    jamie1.py:77-90), roiPower = Σ|fft[nMin..nMax)|² / (nMax-nMin), ratio
    = 10·roi/spec gated on specPower > alarmThresh (jamie1.py:105-112) —
    then 125 rows of [spec, roi, ratio, HR, accel[n]] flattened."""
    freq_res = 1.0 / s.sample_period
    n_cut = int((s.sample_freq / 2.0) / freq_res)
    n_min = int(s.alarm_freq_min / freq_res)
    n_max = int(s.alarm_freq_max / freq_res)

    def build(sigs: pd.Series, hrs: pd.Series):
        mat = np.zeros((len(sigs), 5 * s.n_samp))
        valid = np.zeros(len(sigs), dtype=bool)
        for i, (sig, hr) in enumerate(zip(sigs, hrs)):
            a = _clean(sig, s.n_samp)
            if a is None:
                continue
            # re²+im² magnitude (jamie1.py:47-56 getMagnitude) — NOT
            # |X|², whose hypot-then-square differs in the last ulp;
            # left-to-right accumulation matches the reference loops
            from openseizuredatabase_spark.functions.signal import _seq_sum

            fft = np.fft.fft(a)
            mags = fft.real * fft.real + fft.imag * fft.imag
            hi = min(n_cut, s.n_samp - 1)
            spec = _seq_sum(mags[1 : hi + 1]) / s.n_samp / 2.0
            roi = _seq_sum(mags[n_min:n_max]) / (n_max - n_min)
            ratio = 10.0 * roi / spec if spec > s.alarm_thresh else 0.0
            rows = np.empty((s.n_samp, 5))
            rows[:, 0] = spec
            rows[:, 1] = roi
            rows[:, 2] = ratio
            rows[:, 3] = 0.0 if hr is None or pd.isna(hr) else float(hr)
            rows[:, 4] = a
            mat[i] = rows.reshape(-1)
            valid[i] = True
        return mat, valid

    return build


def run_dp_model_alg(
    events_dp: DataFrame,
    vectorize: VectorizeFn,
    score: BatchScoreFn,
    settings: DpModelSettings | None = None,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    signal_col: str = "rawData",
    hr_col: str | None = None,
) -> DataFrame:
    """Replay exploded datapoints through a per-dp model algorithm.

    Shared scaffold of svmAlg/amberAlg/jamie1 (their processDp bodies are
    line-identical outside the input build, svmAlg.py:59-98): score the
    stacked windows with ONE batch model call, walk the alarm machine,
    apply the 'single'-mode override. ``settings.stateless`` switches to
    the lstmAlg contract (raw verdict, no machine, count 0)."""
    s = settings or DpModelSettings()

    # Stage 1 — stateless scoring, MAP-SIDE (no exchange): one Arrow
    # batch = one model call; the wide signal windows are consumed here
    # and never reach a shuffle.
    @F.pandas_udf("struct<p: double, valid: boolean>")
    def score_rows(sigs: pd.Series, hrs: pd.Series) -> pd.DataFrame:
        mat, valid = vectorize(sigs, hrs)
        probs = np.zeros(len(sigs))
        if valid.any():
            probs[valid] = np.asarray(score(mat[valid]), dtype=float)
        return pd.DataFrame(
            {"p": np.where(valid, probs, np.nan), "valid": valid}
        )

    hr_expr = F.col(hr_col) if hr_col else F.lit(None).cast("double")
    scored = events_dp.select(
        event_col,
        ts_col,
        score_rows(F.col(signal_col), hr_expr).alias("__s"),
    ).select(
        event_col,
        ts_col,
        F.col("__s.p").alias("pSeizure"),
        F.col("__s.valid").alias("valid"),
    )
    # NaN pSeizure (invalid row) is gated by `valid`, never compared alone
    flag = F.col("valid") & (F.col("pSeizure") > s.prob_thresh)
    raw_state = F.when(flag, 2).otherwise(0).cast("int")
    if s.stateless:  # lstmAlg contract: raw verdict, no machine, count 0
        return scored.select(
            event_col, ts_col, "pSeizure", "valid",
            raw_state.alias("alarmState"),
            F.lit(0.0).alias("alarmCount"),
        )

    # Stage 2 — the order-dependent alarm machine over NARROW rows
    # (event, ts, p, valid, flag): mapInPandas over key-partitioned,
    # key+time-sorted partitions with cross-batch carry (the
    # run_state_machine idiom — one Python call per partition of
    # groups, not per group).
    out_schema = (
        f"{event_col} long, {ts_col} timestamp, pSeizure double, "
        "valid boolean, alarmState int, alarmCount double"
    )
    osd = s.osd

    def per_partition(batches):
        carry_key, carry_state, carry_count = None, 0, 0.0
        for pdf in batches:
            if pdf.empty:
                continue
            states_all: list[int] = []
            counts_all: list[float] = []
            for key, g in pdf.groupby(event_col, sort=False):
                if key == carry_key:
                    st0, ct0 = carry_state, carry_count
                else:
                    st0, ct0 = 0, 0.0
                states, counts = alarm_recurrence(
                    g["__flag"].fillna(False).astype(bool).tolist(),
                    osd,
                    init_state=st0,
                    init_count=ct0,
                )
                states_all.extend(states)
                counts_all.extend(counts)
                carry_key, carry_state, carry_count = (
                    key, states[-1], counts[-1],
                )
            yield pd.DataFrame(
                {
                    event_col: pdf[event_col].values,
                    ts_col: pdf[ts_col].values,
                    "pSeizure": pdf["pSeizure"].values,
                    "valid": pdf["valid"].values,
                    "alarmState": states_all,
                    "alarmCount": counts_all,
                }
            )

    out = (
        scored.withColumn("__flag", flag)
        .repartition(event_col)
        .sortWithinPartitions(event_col, ts_col)
        .mapInPandas(per_partition, out_schema)
    )
    if s.mode == "single":  # svmAlg.py:83-87: raw verdict, machine counts
        out = out.withColumn(
            "alarmState",
            F.when(
                F.col("valid") & (F.col("pSeizure") > s.prob_thresh), 2
            ).otherwise(0).cast("int"),
        )
    return out


def default_dp_score(dim: int, bias: float = -0.5) -> BatchScoreFn:
    """Deterministic stand-in for the keras/joblib artifacts (absent in
    this environment): mean-activity linear scorer via the ml.inference
    contract — swap in any (N,D)->(N,) callable for a real backend."""
    from openseizuredatabase_spark.ml.inference import LinearModel

    model = LinearModel(weights=tuple([1.0 / dim] * dim), bias=bias)
    return model.predict


# --- deviceAlg protocol ----------------------------------------------------


class DeviceAlgProtocol:
    """deviceAlg.py:58-91 request/response logic with the transport
    injected: POST the datapoint; on a 'sendSettings'/'settings' reply,
    send the GarminSD-style settings block and re-send the dp so no
    sample is dropped; poll the result up to 3 times, answering settings
    requests; fall back to {"valid": false, "alarmState": 0} rather than
    ever returning a non-JSON string."""

    SETTINGS = {
        "dataType": "settings",
        "analysisPeriod": 5,
        "sampleFreq": 25,
        "battery": 0,
        "watchPartNo": "n/a",
        "watchFwVersion": "n/a",
        "sdVersion": "n/a",
        "sdName": "deviceAlg",
    }

    def __init__(self, transport):
        # transport: send_data(json_str) -> reply str; get_result() -> str
        self.transport = transport

    @staticmethod
    def _is_settings_request(resp) -> bool:
        if not isinstance(resp, str):
            return False
        return resp.strip().lower() in {"sendsettings", "settings"}

    def process_dp(self, data_json: str) -> str:
        post_resp = self.transport.send_data(data_json)
        if self._is_settings_request(post_resp):
            self.transport.send_data(json.dumps(self.SETTINGS))
            self.transport.send_data(data_json)
        ret = None
        for _ in range(3):
            ret = self.transport.get_result()
            if self._is_settings_request(ret):
                self.transport.send_data(json.dumps(self.SETTINGS))
                continue
            break
        if self._is_settings_request(ret) or ret is None:
            ret = json.dumps({"valid": False, "alarmState": 0})
        return ret


class OsdAppTransport:
    """Live HTTP transport to an OSD app's web interface
    (libosd/osdAppConnection.py:21-114): POST the datapoint JSON to
    ``/data``, GET ``/data`` for the latest analysis result.  Mirrors
    the reference's lenient error contract — connection errors and
    non-200 statuses return None (the protocol layer's retry/fallback
    logic owns recovery), timeouts propagate.  stdlib urllib, no
    third-party HTTP stack."""

    def __init__(self, addr: str, timeout_s: float = 10.0):
        if "://" not in addr:
            addr = f"http://{addr}"
        parsed = urllib.parse.urlparse(addr)
        netloc = parsed.netloc
        if ":" not in netloc:  # url_has_port → default port 8080
            netloc = f"{netloc}:8080"
        self.base_url = f"http://{netloc}"
        self.timeout_s = timeout_s

    def _request(self, data: bytes | None) -> str | None:
        req = urllib.request.Request(
            f"{self.base_url}/data",
            data=data,
            method="POST" if data is not None else "GET",
        )
        try:
            with urllib.request.urlopen(
                req, timeout=self.timeout_s
            ) as resp:
                if resp.status != 200:
                    return None
                return resp.read().decode("utf-8")
        except urllib.error.URLError as exc:
            if isinstance(exc.reason, TimeoutError):
                raise
            return None

    def send_data(self, data_json: str) -> str | None:
        return self._request(data_json.encode("utf-8"))

    def get_result(self) -> str | None:
        return self._request(None)


def device_alg_transport(ip_addr: str) -> OsdAppTransport:
    """Transport factory for DeviceAlgProtocol against a reachable OSD
    device/app (deviceAlg.py uses OsdAppConnection the same way). The
    loopback path is exercised against a live in-process HTTP server in
    tests/test_dp_model_algs.py; a physical watch just changes the
    address."""
    return OsdAppTransport(ip_addr)
