"""ML-prep operator tests (M8-M10)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.ml.inference import (
    LinearModel,
    assemble_features,
    iter_training_batches,
    load_model,
    predict_proba,
    subtype_weights,
)
from openseizuredatabase_spark.operators.aggregates import event_rollup


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(eventId=1, subType="Tonic-Clonic", f1=5.0, f2=0.0, label=1),
        Row(eventId=1, subType="Tonic-Clonic", f1=4.0, f2=1.0, label=1),
        Row(eventId=2, subType="Other", f1=-5.0, f2=0.0, label=0),
        Row(eventId=2, subType="Other", f1=-4.0, f2=-1.0, label=0),
    ]
    return spark.createDataFrame(rows)


def test_assemble_and_predict(frame):
    model = LinearModel(weights=(1.0, 0.5), bias=0.0)
    df = predict_proba(assemble_features(frame, ["f1", "f2"]), model)
    probs = {(r.eventId, r.f1): r.pSeizure for r in df.collect()}
    assert probs[(1, 5.0)] == pytest.approx(1 / (1 + np.exp(-5.0)))
    assert probs[(2, -5.0)] == pytest.approx(1 / (1 + np.exp(5.0)))


def test_event_rollup_of_predictions(frame):
    model = LinearModel(weights=(1.0, 0.5))
    scored = predict_proba(assemble_features(frame, ["f1", "f2"]), model)
    rolled = event_rollup(
        scored, ["eventId"], F.col("pSeizure") > 0.5, F.col("pSeizure")
    )
    got = {r.eventId: (r.pred, r.n_dp) for r in rolled.collect()}
    assert got == {1: (1, 2), 2: (0, 2)}


def test_subtype_weights(frame):
    out = subtype_weights(frame, "subType", {"Tonic-Clonic": 3.0}, default=1.0)
    w = {r.subType: r.sample_weight for r in out.collect()}
    assert w == {"Tonic-Clonic": 3.0, "Other": 1.0}


def test_iter_training_batches(frame):
    df = assemble_features(frame, ["f1", "f2"])
    batches = list(iter_training_batches(df, "fvec", "label", batch_size=3))
    assert [len(b[1]) for b in batches] == [3, 1]
    x, y = batches[0]
    assert x.shape == (3, 2)
    assert set(y) <= {0, 1}


def test_load_model_fails_cleanly():
    with pytest.raises(NotImplementedError):
        load_model("model.keras")
