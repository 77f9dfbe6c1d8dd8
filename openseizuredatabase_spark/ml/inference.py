"""ML-prep & inference operators (reference M8-M10).

The reference converts flattened rows to tensors per event
(nnTrainer.py:61-137), runs keras/torch/tflite batch inference
(nnTester.py:333-504) and applies per-subtype sample weights
(subtype_weighting.py). Spark-first mapping:

* M8 tensor assembly → an array column built JVM-side + Arrow hand-off
  (``toArrow``/``toLocalIterator`` at the trainer boundary — training
  itself is a single-node consumer exactly like the reference's fit loop).
* M9 inference → a vectorized pandas UDF over Arrow batches with the
  model weights broadcast once per executor (the predict_batch_udf
  pattern). Deep-learning runtimes aren't in this environment, so the
  bundled model is a linear scorer with identical plumbing; loading a
  keras/torch artifact raises cleanly at plan time.
* M10 subtype weighting → broadcast weight-table join.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover — DL runtimes absent in this environment
    import tensorflow  # noqa: F401

    _HAS_TF = True
except ImportError:
    _HAS_TF = False


@dataclass(frozen=True)
class LinearModel:
    """Stub inference model: sigmoid(w·x + b). Stands in for the keras/
    tflite artifacts of nnTester.py:333-504 with the same batch contract
    (float feature vector in, probability out)."""

    weights: tuple[float, ...]
    bias: float = 0.0

    def predict(self, x: np.ndarray) -> np.ndarray:
        z = x @ np.asarray(self.weights) + self.bias
        return 1.0 / (1.0 + np.exp(-z))


@dataclass(frozen=True)
class MLPModel:
    """Dense feed-forward scorer: relu hidden layers, sigmoid head.

    Same batch contract as LinearModel ((N, D) float matrix in, (N,)
    probabilities out), so every consumer — predict_proba, the nnAlg /
    per-dp detector scaffolds — takes either interchangeably. Fills the
    nnTester.py:333-504 multi-layer role with the one artifact format
    this environment can genuinely load (``.npz``); keras/torch/tflite
    remain honest fail-fasts in load_model.
    """

    layers: tuple[tuple[np.ndarray, np.ndarray], ...]  # ((W, b), ...)

    def predict(self, x: np.ndarray) -> np.ndarray:
        a = np.asarray(x, dtype=np.float64)
        last = len(self.layers) - 1
        for i, (w, b) in enumerate(self.layers):
            z = a @ w + b
            a = 1.0 / (1.0 + np.exp(-z)) if i == last else np.maximum(z, 0.0)
        return a[:, 0] if a.ndim == 2 and a.shape[1] == 1 else a


@dataclass(frozen=True)
class ForestModel:
    """Random-forest scorer (the rfModel.py:28-100 sklearn role): mean of
    per-tree leaf probabilities, same (N, D)-in / (N,)-out batch contract
    as LinearModel/MLPModel so every inference consumer takes it
    interchangeably.

    Each tree is five flat arrays indexed by node id — (feat, thr, left,
    right, value) with ``feat == -1`` marking a leaf — i.e. the classic
    sklearn tree export layout. Traversal is VECTORIZED over the batch:
    one index vector walks all rows level-by-level (<= depth iterations
    per tree), so scoring cost is O(rows × depth), not a per-row Python
    descent. Split rule: go left iff x[feat] <= thr.
    """

    trees: tuple[
        tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray],
        ...,
    ]

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        n = x.shape[0]
        rows = np.arange(n)
        acc = np.zeros(n, dtype=np.float64)
        for feat, thr, left, right, value in self.trees:
            idx = np.zeros(n, dtype=np.int64)
            active = feat[idx] >= 0
            while active.any():
                f = np.maximum(feat[idx], 0)
                go_left = x[rows, f] <= thr[idx]
                nxt = np.where(go_left, left[idx], right[idx])
                idx = np.where(active, nxt, idx)
                active = feat[idx] >= 0
            acc += value[idx]
        return acc / len(self.trees)


def save_forest_npz(model: ForestModel, path: str) -> None:
    """Persist a ForestModel as t{i}_feat/thr/left/right/value arrays."""
    arrays: dict[str, np.ndarray] = {}
    for i, (feat, thr, left, right, value) in enumerate(model.trees):
        arrays[f"t{i}_feat"] = np.asarray(feat, dtype=np.int64)
        arrays[f"t{i}_thr"] = np.asarray(thr, dtype=np.float64)
        arrays[f"t{i}_left"] = np.asarray(left, dtype=np.int64)
        arrays[f"t{i}_right"] = np.asarray(right, dtype=np.int64)
        arrays[f"t{i}_value"] = np.asarray(value, dtype=np.float64)
    np.savez(path, **arrays)


def save_mlp_npz(model: MLPModel, path: str) -> None:
    """Persist an MLPModel as W0,b0,W1,b1,... arrays in one .npz."""
    arrays: dict[str, np.ndarray] = {}
    for i, (w, b) in enumerate(model.layers):
        arrays[f"W{i}"] = np.asarray(w, dtype=np.float64)
        arrays[f"b{i}"] = np.asarray(b, dtype=np.float64)
    np.savez(path, **arrays)


def load_model(path: str):
    """Load a scorer artifact: ``.npz`` with W0/b0… arrays → MLPModel;
    ``.npz`` with an ``arch`` manifest → ml.cnn.CnnModel (pure-numpy
    conv forward pass); DL-framework checkpoints fail fast."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            if "arch" in z:
                from openseizuredatabase_spark.ml.cnn import load_cnn_npz

                return load_cnn_npz(z)
            if "t0_feat" in z:
                trees = []
                i = 0
                while f"t{i}_feat" in z:
                    trees.append(
                        (
                            z[f"t{i}_feat"],
                            z[f"t{i}_thr"],
                            z[f"t{i}_left"],
                            z[f"t{i}_right"],
                            z[f"t{i}_value"],
                        )
                    )
                    i += 1
                return ForestModel(trees=tuple(trees))
            layers = []
            i = 0
            while f"W{i}" in z:
                layers.append((z[f"W{i}"], z[f"b{i}"]))
                i += 1
        if not layers:
            raise ValueError(f"{path!r} holds no W0/b0 layer arrays")
        return MLPModel(layers=tuple(layers))
    if path.endswith((".h5", ".keras", ".pt", ".pte", ".tflite")):
        if not _HAS_TF:
            raise NotImplementedError(
                f"loading {path!r} requires a DL runtime not present in "
                "this environment; use a LinearModel or install one"
            )
    raise NotImplementedError(
        "supported artifact formats here: .npz (MLPModel); keras/torch/"
        "tflite need their runtimes"
    )


def assemble_features(df: DataFrame, feature_cols: Sequence[str], out_col: str = "fvec") -> DataFrame:
    """M8: per-row tensor assembly as an array<double> column (JVM-side)."""
    return df.withColumn(
        out_col, F.array(*[F.col(c).cast("double") for c in feature_cols])
    )


def predict_proba(
    df: DataFrame,
    model: LinearModel,
    vec_col: str = "fvec",
    out_col: str = "pSeizure",
) -> DataFrame:
    """M9: Arrow-vectorized batch inference; the model rides the closure
    (small — broadcast by task serialization) and scores whole batches."""

    @F.pandas_udf("double")
    def score(batch: pd.Series) -> pd.Series:
        x = np.vstack(batch.to_numpy())
        return pd.Series(model.predict(x))

    return df.withColumn(out_col, score(F.col(vec_col)))


def ensemble_predict(
    df: DataFrame,
    models: Sequence,
    quantile: float,
    vec_col: str = "fvec",
    out_col: str = "pEnsemble",
) -> DataFrame:
    """Harrell-Davis ensemble combine (ensemblePredictor.py:27-66 /
    Spahr et al. 2025): score every model on each row, sort the K scores,
    and take the HD-weighted sum — a smooth, tunable-sensitivity quantile
    over the k-fold models.

    Scale shape: the K models ride the task closure (they are kilobytes);
    ONE Arrow-vectorized stage computes the (N, K) score matrix, sorts
    along axis 1 and dots it with the K constant weights — no shuffle, no
    per-row Python, no cross-row dependency, so it runs map-side on every
    partition of a 100-TB scan. The beta-CDF weights are computed once
    driver-side (functions/stats.py) since (K, quantile) are fixed.
    """
    from openseizuredatabase_spark.functions.stats import (
        harrell_davis_weights,
    )

    weights = np.asarray(
        harrell_davis_weights(len(models), quantile), dtype=np.float64
    )
    model_list = list(models)

    @F.pandas_udf("double")
    def score(batch: pd.Series) -> pd.Series:
        x = np.vstack(batch.to_numpy())
        scores = np.column_stack([m.predict(x) for m in model_list])
        scores.sort(axis=1)
        return pd.Series(scores @ weights)

    return df.withColumn(out_col, score(F.col(vec_col)))


def subtype_weights(
    df: DataFrame,
    subtype_col: str,
    weights: Mapping[str, float],
    default: float = 1.0,
    out_col: str = "sample_weight",
) -> DataFrame:
    """M10: per-subtype sample weights via broadcast map join."""
    spark = df.sparkSession
    from openseizuredatabase_spark.functions.literal import literal_df

    wdf = literal_df(
        spark,
        [(k, float(v)) for k, v in weights.items()],
        f"{subtype_col} string, {out_col} double",
    )
    return df.join(F.broadcast(wdf), subtype_col, "left").fillna(
        {out_col: default}
    )


def iter_training_batches(
    df: DataFrame, vec_col: str, label_col: str, batch_size: int = 1024
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """M8 trainer hand-off: stream (X, y) numpy batches to a single-node
    fit loop without materializing the dataset on the driver
    (toLocalIterator pulls one partition at a time)."""
    xs: list = []
    ys: list = []
    for row in df.select(vec_col, label_col).toLocalIterator():
        xs.append(row[vec_col])
        ys.append(row[label_col])
        if len(xs) >= batch_size:
            yield np.asarray(xs, dtype=float), np.asarray(ys)
            xs, ys = [], []
    if xs:
        yield np.asarray(xs, dtype=float), np.asarray(ys)
