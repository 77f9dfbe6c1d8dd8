"""Single-node minibatch trainer for the engine's numpy model backends —
the nnTrainer role (reference user_tools/nnTraining2/nnTrainer.py: build
tensors from the lake, fit on one node, save an artifact).

Spark-first split, same as the reference's: feature assembly, balancing,
augmentation, and splits are DISTRIBUTED (operators/splits.py,
operators/augment.py, ml.assemble_features); the fit loop itself is a
single-node consumer fed by ``iter_training_batches`` (toLocalIterator —
one partition on the driver at a time, never the whole dataset). The
artifact round-trips through ``save_mlp_npz``/``load_model`` and scores
distributed via the Arrow ``predict_proba`` path.

Pure numpy (the environment has no DL runtime): relu hidden layers,
sigmoid head, binary cross-entropy, plain SGD with a deterministic
seeded init — bit-reproducible given the same input order.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame

from openseizuredatabase_spark.ml.inference import (
    MLPModel,
    iter_training_batches,
)


def _init_layers(
    dims: Sequence[int], seed: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """He-style init, deterministic from the seed."""
    rng = np.random.default_rng(seed)
    layers = []
    for d_in, d_out in zip(dims[:-1], dims[1:]):
        w = rng.normal(0.0, np.sqrt(2.0 / d_in), size=(d_in, d_out))
        layers.append((w, np.zeros(d_out)))
    return layers


def _forward(
    layers: list[tuple[np.ndarray, np.ndarray]], x: np.ndarray
) -> list[np.ndarray]:
    """Activations per layer (input first); relu hiddens, sigmoid head —
    the exact MLPModel.predict computation, kept in step with it."""
    acts = [x]
    last = len(layers) - 1
    for i, (w, b) in enumerate(layers):
        z = acts[-1] @ w + b
        acts.append(
            1.0 / (1.0 + np.exp(-z)) if i == last else np.maximum(z, 0.0)
        )
    return acts


def _sgd_step(
    layers: list[tuple[np.ndarray, np.ndarray]],
    x: np.ndarray,
    y: np.ndarray,
    lr: float,
) -> float:
    """One minibatch of backprop; returns the batch BCE loss.

    With a sigmoid head + BCE, the output delta is simply (p - y)/N —
    no separate loss-derivative pass needed.
    """
    acts = _forward(layers, x)
    p = acts[-1][:, 0]
    eps = 1e-12
    loss = float(
        -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    )
    delta = ((p - y) / len(y)).reshape(-1, 1)
    for i in range(len(layers) - 1, -1, -1):
        w, b = layers[i]
        a_in = acts[i]
        gw = a_in.T @ delta
        gb = delta.sum(axis=0)
        if i > 0:
            delta = (delta @ w.T) * (acts[i] > 0)  # relu'
        layers[i] = (w - lr * gw, b - lr * gb)
    return loss


def fit_mlp(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    hidden: Sequence[int] = (16,),
    epochs: int = 5,
    lr: float = 0.1,
    batch_size: int = 1024,
    seed: int = 7,
) -> tuple[MLPModel, list[float]]:
    """Train an MLPModel on (vec_col, label_col) and return it with the
    per-epoch mean losses.

    Each epoch streams the dataset through ``iter_training_batches`` —
    the driver holds one batch at a time. Re-scanning per epoch trades
    IO for memory exactly like the reference's generator-based fit.
    """
    first = df.select(vec_col).head(1)
    if not first:
        raise ValueError("empty training frame")
    d_in = len(first[0][0])
    dims = [d_in, *hidden, 1]
    layers = _init_layers(dims, seed)
    losses: list[float] = []
    for _ in range(epochs):
        epoch_losses = []
        for x, y in iter_training_batches(
            df, vec_col, label_col, batch_size
        ):
            epoch_losses.append(
                _sgd_step(layers, x.astype(float), y.astype(float), lr)
            )
        losses.append(float(np.mean(epoch_losses)))
    return MLPModel(layers=tuple(layers)), losses
