"""Golden-trace parity for specAlg / nnAlg replays.

The oracle here is an independent straight-line re-implementation of the
reference semantics (specAlg.py processDp / nnAlg.py processDp driven
per datapoint), run in plain Python against the same synthetic events.
"""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.model_algs import (
    NnSettings,
    SpecSettings,
    make_spectrogram,
    run_nn_alg,
    run_spec_alg,
)

SPEC = SpecSettings(
    analysis_samp=50, spec_samp=25, spec_step=25,
    sample_period=5.0, warn_time=5.0, alarm_time=10.0,
)
NN = NnSettings(buffer_seconds=2.0)  # 50 samples


def _mk_events(spark, sigs_by_event):
    rows = []
    for eid, sigs in sigs_by_event.items():
        for i, sig in enumerate(sigs):
            rows.append((eid, datetime.datetime(2024, 1, 1, 0, 0, i), sig))
    return spark.createDataFrame(
        rows, "eventId long, dpTimestamp timestamp, rawData array<double>"
    )


def _burst(amp, n=25):
    return [1000.0 + amp * ((-1) ** i) for i in range(n)]


def _ref_machine_step(state, count, in_alarm, period=5.0, warn=5.0, alarm=10.0):
    # specAlg.py:88-104 / osdAlg.py:299-313
    if in_alarm:
        count += period
        if count > alarm:
            state = 2
        elif count > warn:
            state = 1
    else:
        if state == 2:
            state, count = 1, warn
        else:
            state, count = 0, 0.0
    return state, count


def _ref_spec_trace(sigs, score, s: SpecSettings):
    buf, state, count, out = [], 0, 0.0, []
    for sig in sigs:
        p, valid = 0.0, False
        if sig:
            buf = (buf + list(sig))[-s.analysis_samp:]
            if len(buf) >= s.analysis_samp:
                p = score(make_spectrogram(np.asarray(buf), s).flatten())
                valid = True
        in_alarm = valid and p > s.prob_thresh
        state, count = _ref_machine_step(
            state, count, in_alarm, s.sample_period, s.warn_time, s.alarm_time
        )
        if s.mode == "single":
            state = 2 if in_alarm else 0
        out.append((state, count))
    return out


def _ref_nn_trace(sigs, score, s: NnSettings):
    buf, state, count, out = [], 0, 0.0, []
    for sig in sigs:
        ok = sig is not None and len(sig) > 0 and all(x is not None for x in sig)
        if ok and s.sd_thresh > 0:
            a = np.asarray(sig, float)
            avg = a.mean()
            if (100.0 * a.std() / avg if avg else 0.0) < s.sd_thresh:
                ok = False
        if ok:
            buf = (buf + list(sig))[-s.buffer_samp:]
        if not ok or len(buf) < s.buffer_samp:
            out.append((state, count))  # nnAlg.py:136-143 — no advance
            continue
        vec = np.asarray(buf, float) / 1000.0
        if s.normalise:
            std = vec.std()
            vec = (vec - vec.mean()) / std if std else vec - vec.mean()
        p = score(vec)
        state, count = _ref_machine_step(
            state, count, p >= s.prob_thresh,
            s.sample_period, s.warn_time, s.alarm_time,
        )
        if s.mode == "single":
            state = 2 if in_alarm else 0  # pragma: no cover
        out.append((state, count))
    return out


def _make_score_energy():
    # nested so cloudpickle serializes it BY VALUE (a module-level test
    # function would be pickled by reference and fail to import on the
    # Python worker)
    def score(vec):
        # deterministic high-gain scorer: big spectral/raw energy => p→1
        return float(
            1.0 / (1.0 + np.exp(-(vec.astype(float).mean() - 0.2) * 50))
        )

    return score


_score_energy = _make_score_energy()


@pytest.fixture(scope="module")
def spec_events():
    return {
        1: [_burst(5)] * 2 + [_burst(800)] * 4 + [_burst(5)] * 3,
        2: [_burst(5)] * 6,          # never alarms
        3: [None, _burst(800)] + [_burst(800)] * 3,  # empty dp advances machine
    }


def test_spec_alg_matches_reference_trace(spark, spec_events):
    df = _mk_events(spark, spec_events)
    got = (
        run_spec_alg(df, _score_energy, SPEC)
        .orderBy("eventId", "dpTimestamp")
        .collect()
    )
    by_event = {}
    for r in got:
        by_event.setdefault(r["eventId"], []).append(
            (r["alarmState"], r["alarmCount"])
        )
    for eid, sigs in spec_events.items():
        assert by_event[eid] == _ref_spec_trace(sigs, _score_energy, SPEC), eid


def test_spec_single_mode_forces_2_or_0(spark, spec_events):
    s = SpecSettings(**{**SPEC.__dict__, "mode": "single"})
    df = _mk_events(spark, {1: spec_events[1]})
    states = [
        r["alarmState"]
        for r in run_spec_alg(df, _score_energy, s)
        .orderBy("dpTimestamp")
        .collect()
    ]
    assert set(states) <= {0, 2}
    ref = [st for st, _ in _ref_spec_trace(spec_events[1], _score_energy, s)]
    assert states == ref


def test_nn_alg_matches_reference_trace(spark):
    events = {
        1: [_burst(900)] * 6,                      # fills at dp2 then alarms
        2: [_burst(900), None, _burst(900), _burst(900)],  # None freezes state
        3: [_burst(0)] * 4,                        # low p, no alarm
    }
    df = _mk_events(spark, events)
    got = (
        run_nn_alg(df, _score_energy, NN)
        .orderBy("eventId", "dpTimestamp")
        .collect()
    )
    by_event = {}
    for r in got:
        by_event.setdefault(r["eventId"], []).append(
            (r["alarmState"], r["alarmCount"])
        )
    for eid, sigs in events.items():
        assert by_event[eid] == _ref_nn_trace(sigs, _score_energy, NN), eid


def test_nn_low_motion_rejection_freezes_machine(spark):
    s = NnSettings(buffer_seconds=1.0, sd_thresh=5.0)  # 25 samples
    events = {1: [_burst(900), _burst(1), _burst(900)]}
    df = _mk_events(spark, events)
    got = [
        (r["valid"], r["alarmState"], r["alarmCount"])
        for r in run_nn_alg(df, _score_energy, s)
        .orderBy("dpTimestamp")
        .collect()
    ]
    # dp1: valid, machine advances; dp2: rejected (std% < 5), state frozen
    assert got[1][0] is False
    assert (got[1][1], got[1][2]) == (got[0][1], got[0][2])
    ref = _ref_nn_trace(events[1], _score_energy, s)
    assert [(st, ct) for _, st, ct in got] == ref


def test_spectrogram_shape_and_zero_clip():
    s = SPEC
    buf = np.asarray(_burst(5, 50), dtype=float)
    img = make_spectrogram(buf, s)
    assert img.shape == (s.n_freq, s.n_spec)
    flat = np.asarray(_burst(0, 50), dtype=float)  # constant => all-zero spec
    assert np.all(make_spectrogram(flat, s) == 0.0)


def test_registry_exposes_model_algs(spark):
    from openseizuredatabase_spark.detection.registry import ALGORITHMS

    assert {"spec", "spec_single", "nn"} <= set(ALGORITHMS)
    df = _mk_events(spark, {1: [_burst(800)] * 3})
    out = ALGORITHMS["spec"](df)
    assert {"alarmState", "pSeizure"} <= set(out.columns)
    assert out.count() == 3
