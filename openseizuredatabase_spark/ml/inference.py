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


def load_model(path: str) -> LinearModel:
    if path.endswith((".h5", ".keras", ".pt", ".pte", ".tflite")):
        if not _HAS_TF:
            raise NotImplementedError(
                f"loading {path!r} requires a DL runtime not present in "
                "this environment; use a LinearModel or install one"
            )
    raise NotImplementedError("only in-memory LinearModel is supported here")


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


def subtype_weights(
    df: DataFrame,
    subtype_col: str,
    weights: Mapping[str, float],
    default: float = 1.0,
    out_col: str = "sample_weight",
) -> DataFrame:
    """M10: per-subtype sample weights via broadcast map join."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], [subtype_col, out_col]
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
