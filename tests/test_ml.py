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


def test_mlp_forward_golden():
    import numpy as np

    from openseizuredatabase_spark.ml.inference import MLPModel

    m = MLPModel(
        layers=(
            (np.array([[1.0, -1.0], [0.5, 0.5]]), np.array([0.0, 0.25])),
            (np.array([[2.0], [-2.0]]), np.array([0.5])),
        )
    )
    x = np.array([[1.0, 2.0], [-3.0, 0.0]])
    # hand-computed: h = relu(x@W0 + b0); p = sigmoid(h@W1 + b1)
    h = np.maximum(x @ m.layers[0][0] + m.layers[0][1], 0.0)
    expect = 1.0 / (1.0 + np.exp(-(h @ m.layers[1][0] + m.layers[1][1])))
    got = m.predict(x)
    assert np.allclose(got, expect[:, 0])
    # row 0: z0=x@W0+b0=(2.0, 0.25), relu no-op -> z=2*2-2*0.25+0.5=4.0
    assert abs(got[0] - 1.0 / (1.0 + np.exp(-4.0))) < 1e-12


def test_mlp_npz_roundtrip(tmp_path):
    import numpy as np

    from openseizuredatabase_spark.ml.inference import (
        MLPModel,
        load_model,
        save_mlp_npz,
    )

    rng = np.random.default_rng(7)
    m = MLPModel(
        layers=(
            (rng.normal(size=(5, 4)), rng.normal(size=4)),
            (rng.normal(size=(4, 1)), rng.normal(size=1)),
        )
    )
    path = str(tmp_path / "model.npz")
    save_mlp_npz(m, path)
    m2 = load_model(path)
    x = rng.normal(size=(16, 5))
    assert np.array_equal(m.predict(x), m2.predict(x))


def test_load_model_formats_fail_fast(tmp_path):
    import pytest as _pytest

    from openseizuredatabase_spark.ml.inference import load_model

    with _pytest.raises(NotImplementedError):
        load_model("weights.h5")
    with _pytest.raises(NotImplementedError):
        load_model("weights.bin")


def test_mlp_predict_proba_spark(spark):
    import numpy as np

    from openseizuredatabase_spark.ml.inference import (
        MLPModel,
        assemble_features,
        predict_proba,
    )

    m = MLPModel(
        layers=(
            (np.array([[1.0], [1.0]]), np.array([-1.0])),
            (np.array([[4.0]]), np.array([0.0])),
        )
    )
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 0.0, 0.0)], "id long, a double, b double"
    )
    out = {
        r["id"]: r["p"]
        for r in predict_proba(
            assemble_features(df, ["a", "b"]), m, out_col="p"
        ).collect()
    }
    # id1: relu(2-1)=1 -> sigmoid(4); id2: relu(-1)=0 -> sigmoid(0)=0.5
    assert abs(out[1] - 1.0 / (1.0 + np.exp(-4.0))) < 1e-12
    assert abs(out[2] - 0.5) < 1e-12
