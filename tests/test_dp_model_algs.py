"""Golden-trace parity for the per-dp model family (svm/amber/jamie1/
lstm) plus the deviceAlg protocol.

The oracle is an independent straight-line replay of each reference
processDp (svmAlg.py:44-98, amberAlg.py:103-155, jamie1.py:137-186)
driven datapoint-by-datapoint in plain Python over the same synthetic
events, with the same stand-in scorer on both sides.
"""

import datetime
import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.dp_model_algs import (
    DeviceAlgProtocol,
    DpModelSettings,
    amber_vectorize,
    default_dp_score,
    device_alg_transport,
    jamie1_vectorize,
    run_dp_model_alg,
    svm_vectorize,
)

S = DpModelSettings(n_samp=25, sample_freq=25.0, sample_period=5.0)


def _mk_events(spark, sigs_by_event, hrs_by_event=None):
    rows = []
    for eid, sigs in sigs_by_event.items():
        hrs = (hrs_by_event or {}).get(eid, [70.0] * len(sigs))
        for i, (sig, hr) in enumerate(zip(sigs, hrs)):
            rows.append((eid, datetime.datetime(2024, 1, 1, 0, 0, i), sig, hr))
    return spark.createDataFrame(
        rows,
        "eventId long, dpTimestamp timestamp, rawData array<double>, "
        "hr double",
    )


def _burst(amp, n=25):
    return [1000.0 + amp * ((-1) ** i) for i in range(n)]


def _machine_step(state, count, in_alarm, s=S):
    # svmAlg.py:59-81 == osdAlg.py:299-313
    if in_alarm:
        count += s.sample_period
        if count > s.alarm_time:
            state = 2
        elif count > s.warn_time:
            state = 1
    else:
        if state == 2:
            state, count = 1, s.warn_time
        else:
            state, count = 0, 0.0
    return state, count


def _ref_svm_trace(sigs, score, s=S, single=False):
    state, count, out = 0, 0.0, []
    for sig in sigs:
        ok = sig is not None and len(sig) == s.n_samp
        p = float(score(np.asarray(sig, float).reshape(1, -1))[0]) if ok else 0.0
        in_alarm = ok and p > s.prob_thresh
        state, count = _machine_step(state, count, in_alarm, s)
        out.append((2 if in_alarm else 0) if single else state)
    return out


def _ref_amber_trace(sigs, hrs, score, s):
    state, count, out = 0, 0.0, []
    for sig, hr in zip(sigs, hrs):
        vec = None
        if sig is not None and len(sig) == s.n_samp:
            a = np.asarray(sig, float)
            avg = a.mean()
            acc_std = 100.0 * a.std() / avg if avg != 0 else 0.0
            if acc_std >= s.sd_thresh:
                vec = np.concatenate([a, np.full(s.n_samp, hr)])
        in_alarm = False
        if vec is not None:
            in_alarm = float(score(vec.reshape(1, -1))[0]) > s.prob_thresh
        state, count = _machine_step(state, count, in_alarm, s)
        out.append(state)
    return out


def _ref_jamie1_features(a, s=S):
    # jamie1.py:74-112 — its own (unscaled, specPower-gated) formulas
    freq_res = 1.0 / s.sample_period
    n_cut = int((s.sample_freq / 2.0) / freq_res)
    mags = np.abs(np.fft.fft(a)) ** 2
    spec = sum(
        mags[i] for i in range(1, s.n_samp) if i <= n_cut
    ) / s.n_samp / 2.0
    n_min = int(s.alarm_freq_min / freq_res)
    n_max = int(s.alarm_freq_max / freq_res)
    roi = mags[n_min:n_max].sum() / (n_max - n_min)
    ratio = 10.0 * roi / spec if spec > s.alarm_thresh else 0.0
    return spec, roi, ratio


def _ref_jamie1_trace(sigs, hrs, score, s=S):
    state, count, out = 0, 0.0, []
    for sig, hr in zip(sigs, hrs):
        in_alarm = False
        if sig is not None and len(sig) == s.n_samp:
            a = np.asarray(sig, float)
            spec, roi, ratio = _ref_jamie1_features(a, s)
            rows = [[spec, roi, ratio, hr, a[n]] for n in range(s.n_samp)]
            vec = np.asarray(rows).reshape(1, -1)
            in_alarm = float(score(vec)[0]) > s.prob_thresh
        state, count = _machine_step(state, count, in_alarm, s)
        out.append(state)
    return out


EVENTS = {
    1: [_burst(800)] * 5,                      # sustained high activity
    2: [_burst(800)] * 2 + [_burst(0)] * 3,    # alarm then decay
    3: [_burst(0)] * 4,                        # quiet
    4: [_burst(800), None, _burst(800), _burst(5)],  # invalid mid-stream
}


def _collect(df):
    return {
        (r["eventId"], r["dpTimestamp"]): r
        for r in df.collect()
    }


def _spark_states(df):
    out = {}
    for (eid, _ts), r in sorted(_collect(df).items()):
        out.setdefault(eid, []).append(r["alarmState"])
    return out


def test_svm_alg_matches_reference_trace(spark):
    score = default_dp_score(S.n_samp, bias=-0.55)
    df = _mk_events(spark, EVENTS)
    got = _spark_states(run_dp_model_alg(df, svm_vectorize(S), score, S))
    for eid, sigs in EVENTS.items():
        assert got[eid] == _ref_svm_trace(sigs, score, S), f"event {eid}"


def test_svm_single_mode(spark):
    s = DpModelSettings(n_samp=25, mode="single")
    score = default_dp_score(s.n_samp, bias=-0.55)
    df = _mk_events(spark, EVENTS)
    got = _spark_states(run_dp_model_alg(df, svm_vectorize(s), score, s))
    for eid, sigs in EVENTS.items():
        assert got[eid] == _ref_svm_trace(sigs, score, s, single=True)
        assert set(got[eid]) <= {0, 2}


def test_amber_low_movement_rejection(spark):
    s = DpModelSettings(n_samp=25, sd_thresh=5.0)
    score = default_dp_score(2 * s.n_samp, bias=-0.55)
    # event 4's _burst(5) window: std% ≈ 0.5 < 5 ⇒ rejected ⇒ decay step
    df = _mk_events(spark, EVENTS)
    got = _spark_states(
        run_dp_model_alg(df, amber_vectorize(s), score, s, hr_col="hr")
    )
    for eid, sigs in EVENTS.items():
        hrs = [70.0] * len(sigs)
        assert got[eid] == _ref_amber_trace(sigs, hrs, score, s), f"event {eid}"


def test_jamie1_matches_reference_trace(spark):
    score = default_dp_score(5 * S.n_samp, bias=-0.55)
    hrs = {eid: [60.0 + i for i in range(len(s))] for eid, s in EVENTS.items()}
    df = _mk_events(spark, EVENTS, hrs)
    got = _spark_states(
        run_dp_model_alg(df, jamie1_vectorize(S), score, S, hr_col="hr")
    )
    for eid, sigs in EVENTS.items():
        assert got[eid] == _ref_jamie1_trace(sigs, hrs[eid], score, S)


def test_jamie1_ratio_gates_on_spec_power():
    # jamie1.py:105-112 gates on specPower (osdAlg gates on roiPower):
    # a quiet signal with spec <= alarmThresh must yield ratio == 0
    quiet = np.asarray(_burst(1), float)
    spec, _roi, ratio = _ref_jamie1_features(quiet, S)
    assert spec <= S.alarm_thresh and ratio == 0.0
    loud = np.asarray(_burst(800), float)
    spec, roi, ratio = _ref_jamie1_features(loud, S)
    assert spec > S.alarm_thresh and ratio == pytest.approx(10.0 * roi / spec)
    # and the vectorizer embeds exactly these values
    import pandas as pd

    mat, valid = jamie1_vectorize(S)(
        pd.Series([loud.tolist()]), pd.Series([70.0])
    )
    rows = mat[0].reshape(S.n_samp, 5)
    assert valid[0]
    assert rows[0, 0] == pytest.approx(spec)
    assert rows[0, 1] == pytest.approx(roi)
    assert rows[0, 2] == pytest.approx(ratio)
    assert (rows[:, 4] == loud).all()


def test_lstm_is_reference_stub(spark):
    # lstmAlg.py:66-70: verdict constant 0, no machine, count 0
    from openseizuredatabase_spark.detection.registry import ALGORITHMS

    out = ALGORITHMS["lstm"](_mk_events(spark, EVENTS)).collect()
    assert len(out) == sum(len(v) for v in EVENTS.values())
    assert all(r["alarmState"] == 0 and r["alarmCount"] == 0.0 for r in out)


def test_registry_exposes_dp_model_algs(spark):
    from openseizuredatabase_spark.detection.registry import ALGORITHMS

    for name in ("svm", "amber", "jamie1", "lstm"):
        assert name in ALGORITHMS
    df = _mk_events(spark, {1: [_burst(800)] * 3})
    out = ALGORITHMS["amber"](df)
    assert {"pSeizure", "alarmState", "alarmCount"} <= set(out.columns)
    assert out.count() == 3


class _FakeTransport:
    """Scripted device: replays deviceAlg.py's handshake cases."""

    def __init__(self, post_replies, results):
        self.post_replies = list(post_replies)
        self.results = list(results)
        self.sent = []

    def send_data(self, data):
        self.sent.append(data)
        return self.post_replies.pop(0) if self.post_replies else "OK"

    def get_result(self):
        return self.results.pop(0) if self.results else None


def test_device_protocol_settings_handshake():
    # POST answered with sendSettings ⇒ send settings THEN re-send the dp
    t = _FakeTransport(["sendSettings"], ['{"alarmState": 1}'])
    out = DeviceAlgProtocol(t).process_dp('{"data": []}')
    assert json.loads(out)["alarmState"] == 1
    assert json.loads(t.sent[1])["dataType"] == "settings"
    assert t.sent[2] == '{"data": []}'  # dp re-sent, not dropped


def test_device_protocol_result_retries_and_fallback():
    # every GET asks for settings ⇒ bounded retries then valid-JSON fallback
    t = _FakeTransport(["OK"], ["settings", "settings", "settings"])
    out = json.loads(DeviceAlgProtocol(t).process_dp('{"data": []}'))
    assert out == {"valid": False, "alarmState": 0}
    # and a clean pass-through when the device answers directly
    t2 = _FakeTransport(["OK"], ['{"alarmState": 2}'])
    assert json.loads(DeviceAlgProtocol(t2).process_dp("{}"))["alarmState"] == 2


class _OsdAppHandler:
    """Minimal OSD-app web interface (the thing osdAppConnection.py
    talks to): POST /data receives dp or settings JSON, GET /data
    serves the latest analysis result.  Scripted to demand the
    settings handshake once on the POST path and once on the GET
    path, so both retry branches run over the real socket."""

    def __make(state):
        from http.server import BaseHTTPRequestHandler

        class H(BaseHTTPRequestHandler):
            def _reply(self, text):
                body = text.encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                obj = json.loads(self.rfile.read(n).decode())
                if obj.get("dataType") == "settings":
                    state["settings"].append(obj)
                    self._reply("OK")
                    return
                if not state["settings"]:
                    state["post_nags"] += 1
                    self._reply("sendSettings")
                    return
                state["dps"].append(obj)
                self._reply("OK")

            def do_GET(self):
                if state["get_nags"] < 1:
                    state["get_nags"] += 1
                    self._reply("settings")
                    return
                amp = state["dps"][-1]["amp"] if state["dps"] else 0
                self._reply(json.dumps(
                    {"valid": True, "alarmState": 2 if amp > 500 else 0}
                ))

            def log_message(self, *a):
                pass

        return H

    make = staticmethod(__make)


def test_device_alg_over_live_loopback_socket():
    """End-to-end over a REAL socket: device_alg_transport → HTTP →
    in-process OSD-app emulator, including both settings-handshake
    branches and the dp re-send (osdAppConnection.py:98-114 transport
    under deviceAlg.py:58-91 logic)."""
    import threading
    from http.server import ThreadingHTTPServer

    state = {"settings": [], "dps": [], "post_nags": 0, "get_nags": 0}
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), _OsdAppHandler.make(state)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        addr = f"127.0.0.1:{srv.server_address[1]}"
        proto = DeviceAlgProtocol(device_alg_transport(addr))
        out1 = json.loads(proto.process_dp(json.dumps({"amp": 900})))
        out2 = json.loads(proto.process_dp(json.dumps({"amp": 10})))
    finally:
        srv.shutdown()
        srv.server_close()
    # POST path: first dp was nagged, settings sent, dp re-sent
    assert state["post_nags"] == 1
    assert [s["dataType"] for s in state["settings"]][:1] == ["settings"]
    assert [d["amp"] for d in state["dps"]] == [900, 10]
    # GET path: one settings nag answered with a second settings block
    assert state["get_nags"] == 1
    assert len(state["settings"]) == 2
    assert (out1["alarmState"], out2["alarmState"]) == (2, 0)
    assert out1["valid"] and out2["valid"]


def test_device_transport_default_port_and_connrefused():
    from openseizuredatabase_spark.detection.dp_model_algs import (
        OsdAppTransport,
    )

    assert OsdAppTransport("192.168.1.162").base_url.endswith(":8080")
    # reference contract: connection errors → None, protocol falls back
    dead = DeviceAlgProtocol(device_alg_transport("127.0.0.1:9"))
    assert json.loads(dead.process_dp("{}")) == {
        "valid": False,
        "alarmState": 0,
    }
