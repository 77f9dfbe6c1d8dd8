"""Pluggable algorithm registry + testRunner-equivalent evaluation.

The reference discovers algorithms by dynamic import and replays every
event through each serially (testRunner.py:126-143, alg_runner.py:189-374
— nested event×algorithm×datapoint loops). Here:

* an algorithm is a named factory returning a per-event transform
  (exploded datapoints in → per-dp alarm states out) — same contract as
  the reference's ``processDp`` + ``resetAlg`` pair, but batched per
  event;
* evaluation runs every (event, algorithm) pair as parallel Spark jobs —
  the event×alg grid the reference walks serially is embarrassingly
  parallel;
* results roll up with the metrics layer (A5 event rollup + A6/A7
  confusion tables per algorithm, results.py:44-263 equivalents).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.hr_alg import (
    MODE_ADAPTIVE,
    MODE_SIMPLE,
    HrSettings,
    run_hr_alg,
)
from openseizuredatabase_spark.detection.dp_model_algs import (
    DpModelSettings,
    amber_vectorize,
    default_dp_score,
    jamie1_vectorize,
    run_dp_model_alg,
    svm_vectorize,
)
from openseizuredatabase_spark.detection.model_algs import (
    NnSettings,
    SpecSettings,
    default_nn_score,
    default_spec_score,
    run_nn_alg,
    run_spec_alg,
)
from openseizuredatabase_spark.detection.osd_alg import OsdSettings, run_osd_alg
from openseizuredatabase_spark.operators.aggregates import (
    confusion_matrix,
    derived_metrics,
)

AlgFactory = Callable[[DataFrame], DataFrame]


def _osd(
    settings: OsdSettings | None = None, raw3d_col: str | None = None
) -> AlgFactory:
    return lambda dps: run_osd_alg(
        dps, settings or OsdSettings(), raw3d_col=raw3d_col
    )


def _hr(settings: HrSettings | None = None) -> AlgFactory:
    return lambda dps: run_hr_alg(dps, settings or HrSettings())


def _spec(settings: SpecSettings | None = None) -> AlgFactory:
    s = settings or SpecSettings()
    return lambda dps: run_spec_alg(dps, default_spec_score(s), s)


def _nn(settings: NnSettings | None = None) -> AlgFactory:
    s = settings or NnSettings()
    return lambda dps: run_nn_alg(dps, default_nn_score(s), s)


def _svm(settings: DpModelSettings | None = None) -> AlgFactory:
    s = settings or DpModelSettings()
    return lambda dps: run_dp_model_alg(
        dps, svm_vectorize(s), default_dp_score(s.n_samp), s
    )


def _amber(settings: DpModelSettings | None = None) -> AlgFactory:
    s = settings or DpModelSettings(sd_thresh=5.0)  # amberAlg.py:43 default
    return lambda dps: run_dp_model_alg(
        dps, amber_vectorize(s), default_dp_score(2 * s.n_samp), s,
        hr_col="hr",
    )


def _jamie1(settings: DpModelSettings | None = None) -> AlgFactory:
    s = settings or DpModelSettings()
    return lambda dps: run_dp_model_alg(
        dps, jamie1_vectorize(s), default_dp_score(5 * s.n_samp), s,
        hr_col="hr",
    )


def _lstm(settings: DpModelSettings | None = None) -> AlgFactory:
    # lstmAlg.py:66-70 — getAlarmState is the reference's own stub
    # (constant 0); keep its contract: stateless, score pluggable
    s = settings or DpModelSettings(stateless=True)
    zero = lambda mat: np.zeros(len(mat))
    return lambda dps: run_dp_model_alg(dps, svm_vectorize(s), zero, s)


ALGORITHMS: dict[str, AlgFactory] = {
    "osd": _osd(),
    "osd_flap": _osd(OsdSettings(flap_enabled=True)),
    "osd_v4": _osd(
        OsdSettings(magnitude_mode="V4"), raw3d_col="rawData3D"
    ),
    "hr_simple": _hr(HrSettings(mode=MODE_SIMPLE)),
    "hr_adaptive": _hr(HrSettings(mode=MODE_ADAPTIVE)),
    "spec": _spec(),
    "spec_single": _spec(SpecSettings(mode="single")),
    "nn": _nn(),
    "svm": _svm(),
    "amber": _amber(),
    "jamie1": _jamie1(),
    "lstm": _lstm(),
}


def register(name: str, factory: AlgFactory) -> None:
    """Plug in a custom algorithm (the importlib-discovery equivalent —
    svmAlg/lstmAlg/... style extensions register here)."""
    ALGORITHMS[name] = factory


def evaluate_algorithms(
    events_dp: DataFrame,
    alg_names: list[str] | None = None,
    event_col: str = "eventId",
) -> DataFrame:
    """Replay the datapoint table through each algorithm; union the
    per-dp outputs tagged with the algorithm name.

    Each algorithm is one independent Spark job over all events (parallel
    within; the reference is serial on both axes).
    """
    names = alg_names or list(ALGORITHMS)
    outs = []
    for name in names:
        out = ALGORITHMS[name](events_dp)
        outs.append(
            out.select(
                F.lit(name).alias("algorithm"),
                F.col(event_col),
                F.col("alarmState"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def algorithm_report(
    per_dp: DataFrame,
    labels: DataFrame,
    event_col: str = "eventId",
    label_col: str = "is_seizure",
) -> DataFrame:
    """testRunner results table: per-algorithm event rollup + confusion
    metrics (event detected ⇔ any dp reached ALARM, results.py:76-240)."""
    rolled = per_dp.groupBy("algorithm", event_col).agg(
        (F.max("alarmState") >= 2).cast("int").alias("detected")
    )
    joined = rolled.join(F.broadcast(labels), event_col)
    cm = confusion_matrix(
        joined, F.col(label_col), F.col("detected") == 1, ["algorithm"]
    )
    return derived_metrics(cm)
