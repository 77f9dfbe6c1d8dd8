"""End-to-end train → save → load → distributed-score loop (ml/train.py
+ ml/inference.py): the nnTrainer role with the engine's own artifacts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.ml.inference import (
    load_model,
    predict_proba,
    save_mlp_npz,
)
from openseizuredatabase_spark.ml.train import fit_mlp


@pytest.fixture
def labelled(spark):
    """Linearly-separable 2-D blobs (deterministic)."""
    rng = np.random.default_rng(3)
    rows = []
    for i in range(400):
        y = i % 2
        center = (1.5, 1.5) if y else (-1.5, -1.5)
        x = rng.normal(center, 0.6)
        rows.append(Row(fvec=[float(x[0]), float(x[1])], label=y))
    return spark.createDataFrame(rows)


def test_fit_mlp_learns_and_roundtrips(spark, labelled, tmp_path):
    model, losses = fit_mlp(
        labelled, "fvec", "label", hidden=(8,), epochs=8, lr=0.5, seed=7
    )
    # training converges: loss drops substantially
    assert losses[-1] < losses[0] * 0.5

    scored = predict_proba(labelled, model, out_col="p")
    acc = scored.select(
        F.avg(
            ((F.col("p") > 0.5).cast("int") == F.col("label")).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    assert acc > 0.95

    # artifact roundtrip: identical scores after save/load
    path = str(tmp_path / "trained.npz")
    save_mlp_npz(model, path)
    re = load_model(path)
    x = np.array([[1.5, 1.5], [-1.5, -1.5]])
    np.testing.assert_array_equal(model.predict(x), re.predict(x))
    assert re.predict(x)[0] > 0.5 > re.predict(x)[1]


def test_fit_is_deterministic(spark, labelled):
    m1, l1 = fit_mlp(labelled, "fvec", "label", epochs=2, seed=11)
    m2, l2 = fit_mlp(labelled, "fvec", "label", epochs=2, seed=11)
    assert l1 == l2
    for (w1, b1), (w2, b2) in zip(m1.layers, m2.layers):
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(b1, b2)


def test_fit_empty_frame_raises(spark):
    df = spark.createDataFrame([], "fvec array<double>, label int")
    with pytest.raises(ValueError, match="empty training frame"):
        fit_mlp(df, "fvec", "label")


def test_fit_cnn_learns_local_pattern(spark, tmp_path):
    """The conv net must learn a translation-invariant local pattern
    (a [+1,-1] edge anywhere in the signal) that a GAP-linear model
    can't separate from position; closes train/save/load/score for the
    convolutional backend."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.ml.cnn import save_cnn_npz
    from openseizuredatabase_spark.ml.inference import load_model
    from openseizuredatabase_spark.ml.train import fit_cnn

    rng = np.random.default_rng(3)
    rows = []
    for i in range(400):
        base = rng.normal(0, 0.05, 12)
        label = i % 2
        if label:
            pos = rng.integers(0, 10)
            base[pos] += 1.0
            base[pos + 1] -= 1.0
        rows.append(Row(fvec=[float(v) for v in base], label=label))
    df = spark.createDataFrame(rows)
    model, losses = fit_cnn(
        df, "fvec", "label", n_filters=4, kernel=3, epochs=8, lr=0.5
    )
    assert losses[-1] < losses[0]  # converges
    x = np.array([r.fvec for r in rows])
    y = np.array([r.label for r in rows])
    acc = ((model.predict(x) >= 0.5).astype(int) == y).mean()
    assert acc > 0.9
    # deterministic retrain
    model2, _ = fit_cnn(
        df, "fvec", "label", n_filters=4, kernel=3, epochs=8, lr=0.5
    )
    assert np.array_equal(model.predict(x), model2.predict(x))
    # artifact roundtrip through the shared loader
    path = str(tmp_path / "cnn.npz")
    save_cnn_npz(model, path)
    assert np.allclose(load_model(path).predict(x), model.predict(x))
