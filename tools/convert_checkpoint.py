"""Offline DL-checkpoint → .npz converter for the inference engine.

A user arriving with a real released checkpoint (keras .h5/.keras spec
CNN, torch .pt DeepEpiCnn — reference user_tools/nnTraining2/
nnTester.py:333-504 loads these through their frameworks) can convert
it ONCE, on any machine that has the framework installed, into the
engine's framework-free ``.npz`` artifact (``ml.cnn.save_cnn_npz``
layout: an ``arch`` JSON manifest + ``L{i}_p{j}`` float64 arrays).
``ml.inference.load_model`` then scores it with the pure-numpy forward
pass on every executor — no DL runtime in the cluster image.

The NAME/SHAPE mapping is framework-independent and fully tested here
(tests/test_cnn.py feeds synthetic state dicts); only the initial
``torch.load`` / ``keras.models.load_model`` call needs the framework,
and that import is guarded.

Usage:
    python tools/convert_checkpoint.py model.pt  out.npz --arch deep_epi
    python tools/convert_checkpoint.py model.h5  out.npz --arch spec_cnn

Conventions converted (verified against the builders in ml/cnn.py):
* torch Conv1d weight (C_out, C_in, K)  → ours as-is
* torch Linear weight (out, in)         → ours (in, out): TRANSPOSED
* torch BatchNorm weight/bias/running_mean/running_var
                                        → (gamma, beta, mean, var), eps 1e-5
* keras Conv1D kernel (K, C_in, C_out)  → ours (C_out, C_in, K)
* keras Dense kernel (in, out)          → ours as-is
* keras BatchNormalization [gamma, beta, mean, var], eps 1e-3
"""

from __future__ import annotations

import os
import re
import sys
from typing import Mapping, Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openseizuredatabase_spark.ml.cnn import (  # noqa: E402
    CnnModel,
    Layer,
    save_cnn_npz,
)


def torch_state_to_deep_epi(
    sd: Mapping[str, np.ndarray],
    input_length: int = 750,
    positive_class: int = 1,
) -> CnnModel:
    """Map a DeepEpiCnn ``state_dict`` (deepEpiCnnModel_torch.py:38-162:
    ``conv_stack`` Sequential of Conv1d/BatchNorm1d(/Dropout), then
    fc1..fc4 + bn1..bn4, fc_out) onto the numpy forward pass.

    Modules are classified by their parameter shapes, not hard-coded
    Sequential indices, so checkpoints saved with or without dropout
    modules (which hold no params) map identically. Strides follow the
    architecture rule (2 on every 5th conv), kernel padding 'valid'.
    """
    sd = {k: np.asarray(v, dtype=np.float64) for k, v in sd.items()}
    conv_idx = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"conv_stack\.(\d+)\.weight$", k))
        }
    )
    layers: list[Layer] = []
    n_conv = 0
    for i in conv_idx:
        w = sd[f"conv_stack.{i}.weight"]
        if w.ndim == 3:  # Conv1d
            stride = 2 if ((n_conv + 1) % 5 == 0) else 1
            layers.append(
                Layer(
                    "conv1d",
                    (w, sd[f"conv_stack.{i}.bias"]),
                    (("stride", stride), ("padding", "valid")),
                )
            )
            n_conv += 1
        else:  # BatchNorm1d: weight=gamma (1-D)
            layers.append(
                Layer(
                    "batchnorm",
                    (
                        w,
                        sd[f"conv_stack.{i}.bias"],
                        sd[f"conv_stack.{i}.running_mean"],
                        sd[f"conv_stack.{i}.running_var"],
                    ),
                    (("eps", 1e-5),),
                )
            )
            layers.append(Layer("relu"))
    if n_conv != 14:
        raise ValueError(f"DeepEpiCnn expects 14 conv layers, found {n_conv}")
    layers.append(Layer("gap"))
    for j in range(1, 5):
        layers.append(
            Layer(
                "dense",
                (sd[f"fc{j}.weight"].T, sd[f"fc{j}.bias"]),  # (in, out)
            )
        )
        layers.append(
            Layer(
                "batchnorm",
                (
                    sd[f"bn{j}.weight"],
                    sd[f"bn{j}.bias"],
                    sd[f"bn{j}.running_mean"],
                    sd[f"bn{j}.running_var"],
                ),
                (("eps", 1e-5),),
            )
        )
        layers.append(Layer("relu"))
    layers.append(Layer("dense", (sd["fc_out.weight"].T, sd["fc_out.bias"])))
    layers.append(Layer("softmax"))
    return CnnModel(
        tuple(layers),
        input_shape=(1, input_length),
        positive_class=positive_class,
    )


def keras_weights_to_spec_cnn(
    weights: Sequence[np.ndarray],
    n_freq: int,
    n_spec: int,
    positive_class: int = 1,
) -> CnnModel:
    """Map ``model.get_weights()`` of the reference spec CNN
    (specCnnModel.py:55-75: repeated Conv1D(64, 3, same) → BatchNorm →
    ReLU, GlobalAveragePooling1D, Dense softmax head) onto the numpy
    forward pass. ``get_weights`` order per block:
    [conv kernel (K, C_in, C_out), conv bias, gamma, beta, mean, var];
    tail: [dense kernel (in, out), dense bias].
    """
    ws = [np.asarray(w, dtype=np.float64) for w in weights]
    if (len(ws) - 2) % 6:
        raise ValueError(
            f"unexpected weight count {len(ws)}: spec CNN blocks carry 6 "
            "arrays each plus a 2-array dense head"
        )
    layers: list[Layer] = []
    for b in range((len(ws) - 2) // 6):
        k, bias, gamma, beta, mean, var = ws[6 * b : 6 * b + 6]
        layers.append(
            Layer(
                "conv1d",
                (k.transpose(2, 1, 0), bias),  # (C_out, C_in, K)
                (("stride", 1), ("padding", "same")),
            )
        )
        layers.append(
            Layer("batchnorm", (gamma, beta, mean, var), (("eps", 1e-3),))
        )
        layers.append(Layer("relu"))
    layers.append(Layer("gap"))
    layers.append(Layer("dense", (ws[-2], ws[-1])))
    layers.append(Layer("softmax"))
    # the reference flattens the (n_freq, n_spec) spectrogram to ONE
    # 1-channel sequence before the Conv1D stack (specCnnModel.py:55-62)
    return CnnModel(
        tuple(layers),
        input_shape=(1, n_freq * n_spec),
        positive_class=positive_class,
    )


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    src, dst = argv[1], argv[2]
    arch = "deep_epi"
    n_freq, n_spec = 63, 6
    for i, a in enumerate(argv):
        if a == "--arch" and i + 1 < len(argv):
            arch = argv[i + 1]
        if a == "--shape" and i + 1 < len(argv):
            n_freq, n_spec = (int(x) for x in argv[i + 1].split("x"))
    if src.endswith((".pt", ".pth")):
        try:
            import torch
        except ImportError:
            raise SystemExit(
                "converting a torch checkpoint needs torch installed; run "
                "this converter offline on a machine that has it — the "
                "resulting .npz needs no framework anywhere"
            )
        obj = torch.load(src, map_location="cpu")
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        model = torch_state_to_deep_epi(sd)
    elif src.endswith((".h5", ".keras")):
        try:
            from tensorflow import keras
        except ImportError:
            try:
                import keras
            except ImportError:
                raise SystemExit(
                    "converting a keras checkpoint needs keras/tensorflow "
                    "installed; run this converter offline — the resulting "
                    ".npz needs no framework anywhere"
                )
        km = keras.models.load_model(src, compile=False)
        if arch != "spec_cnn":
            raise SystemExit(f"unsupported keras arch {arch!r}")
        model = keras_weights_to_spec_cnn(km.get_weights(), n_freq, n_spec)
    else:
        raise SystemExit(f"unsupported checkpoint format: {src!r}")
    save_cnn_npz(model, dst)
    print(f"wrote {dst}: {len(model.layers)} layers, arch={arch}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
