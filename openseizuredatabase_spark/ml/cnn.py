"""Pure-numpy convolutional forward pass behind the ``ml.inference``
batch contract ((N, D) float matrix in, (N,) probabilities out).

The reference's daily-driver detectors are CNNs the environment's absent
DL runtimes would normally run:

* spec CNN — repeated ``Conv1D(64, kernel_size=3, padding='same')`` →
  BatchNorm → ReLU blocks, GlobalAveragePooling1D, softmax dense head
  (reference user_tools/nnTraining2/specCnnModel.py:55-75), with a 2-D
  variant of Conv2D(32, 3x3, same) → MaxPool2D(2x2, same) → BatchNorm
  blocks (specCnnModel.py:77-99).
* DeepEpiCnn — 14 ``Conv1d(kernel_size=5, padding=0)`` layers, filters
  [16] + [32]*11 + [64, 64], stride 2 on every 5th layer, each followed
  by BatchNorm1d + ReLU; AdaptiveAvgPool1d(1); dense head
  64 -> 64 -> 32 -> 16 -> num_classes with BatchNorm + ReLU between
  (reference user_tools/nnTraining2/deepEpiCnnModel_torch.py:38-162).

This module reproduces those forward passes exactly (inference mode:
dropout = identity, batchnorm uses running statistics) so the spec/nn
detector algorithms score a real convolution. Weights load from ``.npz``
artifacts like MLPModel — keras/torch checkpoint formats remain honest
fail-fasts in ``ml.inference.load_model``.

Everything is vectorized numpy (sliding_window_view + einsum), executed
inside Arrow-batched pandas UDFs — the model rides the task closure, one
batched forward pass per Arrow batch, no per-row Python.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Sequence

import numpy as np

__all__ = [
    "Layer",
    "CnnModel",
    "conv1d",
    "conv2d_same",
    "maxpool2d_same",
    "batchnorm",
    "make_spec_cnn",
    "make_spec_cnn2d",
    "make_deep_epi_cnn",
    "save_cnn_npz",
    "load_cnn_npz",
]


# ---------------------------------------------------------------------------
# kernels (inference-mode semantics of the corresponding keras/torch layers)
# ---------------------------------------------------------------------------


def conv1d(
    x: np.ndarray,
    w: np.ndarray,
    b: np.ndarray,
    stride: int = 1,
    padding: str = "valid",
) -> np.ndarray:
    """1-D convolution (cross-correlation, as in torch/keras).

    x: (N, C_in, L); w: (C_out, C_in, K); b: (C_out,) → (N, C_out, L_out).

    ``valid`` matches ``nn.Conv1d(padding=0)``: L_out = (L - K)//s + 1.
    ``same`` matches keras ``padding='same'`` with stride 1: pad
    (K-1)//2 left and K//2 right so L_out = L.
    """
    k = w.shape[2]
    if padding == "same":
        if stride != 1:  # keras same+stride>1 is not used by the reference
            raise ValueError("padding='same' supported for stride=1 only")
        x = np.pad(x, ((0, 0), (0, 0), ((k - 1) // 2, k // 2)))
    elif padding != "valid":
        raise ValueError(f"unknown padding {padding!r}")
    win = np.lib.stride_tricks.sliding_window_view(x, k, axis=2)[:, :, ::stride]
    # win: (N, C_in, L_out, K) × w: (C_out, C_in, K) → (N, C_out, L_out)
    return np.einsum("nclk,ock->nol", win, w, optimize=True) + b[None, :, None]


def conv2d_same(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """2-D 'same' convolution, stride 1 (keras Conv2D semantics).

    x: (N, C_in, H, W); w: (C_out, C_in, KH, KW); b: (C_out,).
    """
    kh, kw = w.shape[2], w.shape[3]
    x = np.pad(
        x,
        (
            (0, 0),
            (0, 0),
            ((kh - 1) // 2, kh // 2),
            ((kw - 1) // 2, kw // 2),
        ),
    )
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    # win: (N, C_in, H, W, KH, KW) × w: (C_out, C_in, KH, KW)
    return (
        np.einsum("nchwij,ocij->nohw", win, w, optimize=True)
        + b[None, :, None, None]
    )


def maxpool2d_same(x: np.ndarray, pool: int = 2) -> np.ndarray:
    """MaxPooling2D(pool_size, padding='same'): pads with -inf up to a
    multiple of ``pool`` then takes block maxima — out dim = ceil(in/pool).
    """
    n, c, h, w = x.shape
    ph = (-h) % pool
    pw = (-w) % pool
    if ph or pw:
        x = np.pad(
            x,
            ((0, 0), (0, 0), (0, ph), (0, pw)),
            constant_values=-np.inf,
        )
    h2, w2 = x.shape[2] // pool, x.shape[3] // pool
    return x.reshape(n, c, h2, pool, w2, pool).max(axis=(3, 5))


def batchnorm(
    x: np.ndarray,
    gamma: np.ndarray,
    beta: np.ndarray,
    mean: np.ndarray,
    var: np.ndarray,
    eps: float = 1e-3,
) -> np.ndarray:
    """Inference-mode batch normalization over the channel axis (axis 1):
    y = gamma * (x - running_mean) / sqrt(running_var + eps) + beta.

    Default eps matches keras BatchNormalization (1e-3); torch
    BatchNorm1d uses 1e-5 — pass it explicitly for DeepEpiCnn parity.
    """
    shape = (1, -1) + (1,) * (x.ndim - 2)
    scale = gamma / np.sqrt(var + eps)
    return x * scale.reshape(shape) + (beta - mean * scale).reshape(shape)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Layer:
    """One forward-pass step. ``kind`` ∈ conv1d | conv2d | maxpool2d |
    batchnorm | relu | gap | flatten | dense | softmax | sigmoid.
    ``params`` holds the arrays (w, b, gamma, ...); ``opts`` the scalars
    (stride, padding, eps, pool)."""

    kind: str
    params: tuple[np.ndarray, ...] = ()
    opts: tuple[tuple[str, float | int | str], ...] = ()

    def opt(self, name: str, default=None):
        for k, v in self.opts:
            if k == name:
                return v
        return default


@dataclass(frozen=True)
class CnnModel:
    """Convolutional scorer with the LinearModel/MLPModel batch contract.

    ``input_shape`` reshapes each flat input row: (C, L) for 1-D stacks,
    (C, H, W) for 2-D. ``predict`` returns the probability of the
    positive class: the sigmoid output for a 1-unit head, else softmax
    class ``positive_class`` (the reference reads the seizure-class
    column of the softmax the same way,
    deepEpiCnnModel_torch.py:327-330).
    """

    layers: tuple[Layer, ...]
    input_shape: tuple[int, ...]
    positive_class: int = 1

    def forward(self, x: np.ndarray) -> np.ndarray:
        a = np.asarray(x, dtype=np.float64).reshape(
            (x.shape[0],) + self.input_shape
        )
        for ly in self.layers:
            if ly.kind == "conv1d":
                w, b = ly.params
                a = conv1d(
                    a, w, b,
                    stride=int(ly.opt("stride", 1)),
                    padding=str(ly.opt("padding", "valid")),
                )
            elif ly.kind == "conv2d":
                w, b = ly.params
                a = conv2d_same(a, w, b)
            elif ly.kind == "maxpool2d":
                a = maxpool2d_same(a, int(ly.opt("pool", 2)))
            elif ly.kind == "batchnorm":
                g, bt, m, v = ly.params
                a = batchnorm(a, g, bt, m, v, eps=float(ly.opt("eps", 1e-3)))
            elif ly.kind == "relu":
                a = np.maximum(a, 0.0)
            elif ly.kind == "gap":
                # GlobalAveragePooling / AdaptiveAvgPool1d(1): mean over
                # every spatial axis, keeping (N, C)
                a = a.mean(axis=tuple(range(2, a.ndim)))
            elif ly.kind == "flatten":
                a = a.reshape(a.shape[0], -1)
            elif ly.kind == "dense":
                w, b = ly.params
                a = a @ w + b
            elif ly.kind == "softmax":
                z = a - a.max(axis=1, keepdims=True)
                e = np.exp(z)
                a = e / e.sum(axis=1, keepdims=True)
            elif ly.kind == "sigmoid":
                a = 1.0 / (1.0 + np.exp(-a))
            else:  # pragma: no cover
                raise ValueError(f"unknown layer kind {ly.kind!r}")
        return a

    def predict(self, x: np.ndarray) -> np.ndarray:
        out = self.forward(np.asarray(x, dtype=np.float64))
        if out.ndim == 2 and out.shape[1] == 1:
            return out[:, 0]
        if out.ndim == 2:
            return out[:, self.positive_class]
        return out


# ---------------------------------------------------------------------------
# npz artifacts (same pattern as MLPModel's save_mlp_npz)
# ---------------------------------------------------------------------------


def save_cnn_npz(model: CnnModel, path: str) -> None:
    """Persist a CnnModel: an ``arch`` JSON manifest + L{i}_p{j} arrays."""
    manifest = {
        "input_shape": list(model.input_shape),
        "positive_class": model.positive_class,
        "layers": [
            {"kind": ly.kind, "n_params": len(ly.params), "opts": list(ly.opts)}
            for ly in model.layers
        ],
    }
    arrays: dict[str, np.ndarray] = {
        "arch": np.frombuffer(json.dumps(manifest).encode(), dtype=np.uint8)
    }
    for i, ly in enumerate(model.layers):
        for j, p in enumerate(ly.params):
            arrays[f"L{i}_p{j}"] = np.asarray(p, dtype=np.float64)
    np.savez(path, **arrays)


def load_cnn_npz(z) -> CnnModel:
    """Rebuild a CnnModel from an opened ``np.load`` handle."""
    manifest = json.loads(bytes(z["arch"].tobytes()).decode())
    layers = []
    for i, spec in enumerate(manifest["layers"]):
        params = tuple(z[f"L{i}_p{j}"] for j in range(spec["n_params"]))
        opts = tuple((k, v) for k, v in spec.get("opts", []))
        layers.append(Layer(kind=spec["kind"], params=params, opts=opts))
    return CnnModel(
        layers=tuple(layers),
        input_shape=tuple(manifest["input_shape"]),
        positive_class=int(manifest.get("positive_class", 1)),
    )


# ---------------------------------------------------------------------------
# deterministic builders mirroring the reference architectures
# ---------------------------------------------------------------------------


def _dyadic(shape: Sequence[int], seed: int) -> np.ndarray:
    """Deterministic exactly-representable weights in [-1, 1): integers
    from a seeded generator divided by 64 — dyadic rationals, so every
    engine computing the same forward pass gets bit-identical floats."""
    rng = np.random.default_rng(seed)
    return rng.integers(-64, 64, size=tuple(shape)).astype(np.float64) / 64.0


def _bn_params(c: int, seed: int) -> tuple[np.ndarray, ...]:
    g = 1.0 + _dyadic([c], seed) / 4.0  # gamma near 1
    beta = _dyadic([c], seed + 1) / 4.0
    mean = _dyadic([c], seed + 2) / 4.0
    var = 1.0 + np.abs(_dyadic([c], seed + 3)) / 4.0  # var near 1, > 0
    return g, beta, mean, var


def make_spec_cnn(
    n_freq: int, n_spec: int, n_layers: int = 3, num_classes: int = 2,
    filters: int = 64, seed: int = 7,
) -> CnnModel:
    """The reference spec CNN (specCnnModel.py:55-75): the spectrogram
    image flattened to a 1-channel sequence, ``n_layers`` blocks of
    Conv1D(filters, 3, same) → BatchNorm → ReLU, GAP, softmax dense."""
    length = n_freq * n_spec
    layers: list[Layer] = []
    c_in = 1
    for n in range(n_layers):
        layers.append(
            Layer(
                "conv1d",
                (_dyadic([filters, c_in, 3], seed + 10 * n), _dyadic([filters], seed + 10 * n + 5)),
                (("stride", 1), ("padding", "same")),
            )
        )
        layers.append(Layer("batchnorm", _bn_params(filters, seed + 10 * n + 6), (("eps", 1e-3),)))
        layers.append(Layer("relu"))
        c_in = filters
    layers.append(Layer("gap"))
    layers.append(
        Layer("dense", (_dyadic([filters, num_classes], seed + 901), _dyadic([num_classes], seed + 902)))
    )
    layers.append(Layer("softmax"))
    return CnnModel(tuple(layers), input_shape=(1, length))


def make_spec_cnn2d(
    n_freq: int, n_spec: int, n_layers: int = 3, num_classes: int = 2,
    filters: int = 32, seed: int = 11,
) -> CnnModel:
    """The reference 2-D spec CNN (specCnnModel.py:77-99): blocks of
    Conv2D(filters, 3x3, same, relu) → MaxPool2D(2x2, same) → BatchNorm
    (dropout = identity at inference), then Flatten → softmax dense."""
    layers: list[Layer] = []
    c_in = 1
    h, w = n_freq, n_spec
    for n in range(n_layers):
        layers.append(
            Layer(
                "conv2d",
                (_dyadic([filters, c_in, 3, 3], seed + 10 * n), _dyadic([filters], seed + 10 * n + 5)),
            )
        )
        layers.append(Layer("relu"))
        layers.append(Layer("maxpool2d", (), (("pool", 2),)))
        layers.append(Layer("batchnorm", _bn_params(filters, seed + 10 * n + 6), (("eps", 1e-3),)))
        c_in = filters
        h, w = -(-h // 2), -(-w // 2)
    layers.append(Layer("flatten"))
    layers.append(
        Layer("dense", (_dyadic([filters * h * w, num_classes], seed + 901), _dyadic([num_classes], seed + 902)))
    )
    layers.append(Layer("softmax"))
    return CnnModel(tuple(layers), input_shape=(1, n_freq, n_spec))


def make_deep_epi_cnn(
    input_length: int = 750, num_classes: int = 2, seed: int = 13
) -> CnnModel:
    """DeepEpiCnn (deepEpiCnnModel_torch.py:38-162): 14 Conv1d(k=5,
    valid) layers — filters [16]+[32]*11+[64,64], stride 2 every 5th —
    each + BatchNorm1d(eps=1e-5) + ReLU; AdaptiveAvgPool1d(1); dense
    head 64→64→32→16→classes with BatchNorm+ReLU; softmax probs."""
    filters = [16] + [32] * 11 + [64, 64]
    strides = [1 if ((i + 1) % 5) != 0 else 2 for i in range(14)]
    layers: list[Layer] = []
    c_in = 1
    for i in range(14):
        layers.append(
            Layer(
                "conv1d",
                (_dyadic([filters[i], c_in, 5], seed + 10 * i), _dyadic([filters[i]], seed + 10 * i + 5)),
                (("stride", strides[i]), ("padding", "valid")),
            )
        )
        layers.append(Layer("batchnorm", _bn_params(filters[i], seed + 10 * i + 6), (("eps", 1e-5),)))
        layers.append(Layer("relu"))
        c_in = filters[i]
    layers.append(Layer("gap"))
    # fc1 64→64, fc2 64→64, fc3 64→32, fc4 32→16, each + BN + ReLU
    dims = [64, 64, 64, 32, 16]
    for j in range(4):
        layers.append(
            Layer("dense", (_dyadic([dims[j], dims[j + 1]], seed + 500 + 10 * j), _dyadic([dims[j + 1]], seed + 505 + 10 * j)))
        )
        layers.append(Layer("batchnorm", _bn_params(dims[j + 1], seed + 506 + 10 * j), (("eps", 1e-5),)))
        layers.append(Layer("relu"))
    layers.append(
        Layer("dense", (_dyadic([16, num_classes], seed + 801), _dyadic([num_classes], seed + 802)))
    )
    layers.append(Layer("softmax"))
    return CnnModel(tuple(layers), input_shape=(1, input_length))
