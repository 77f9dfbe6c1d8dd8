"""Golden-trace tests for the pure-numpy CNN forward pass (ml/cnn.py)
against the reference layer semantics:

* conv kernels vs explicit nested loops implementing the torch/keras
  formulas (deepEpiCnnModel_torch.py:70-78 Conv1d valid/stride;
  specCnnModel.py:63 Conv1D same; specCnnModel.py:85-86 Conv2D same +
  MaxPool2D same).
* DeepEpiCnn shape trace vs the torch output-length recurrence
  floor((L - K)/stride) + 1 through the documented stride pattern.
* npz roundtrip and load_model dispatch.
* the spec/nn detector algs scoring a real convolution end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from openseizuredatabase_spark.ml import cnn as C


def _conv1d_loops(x, w, b, stride=1):
    """Reference implementation: torch Conv1d(padding=0) by definition."""
    n, cin, L = x.shape
    cout, _, k = w.shape
    lout = (L - k) // stride + 1
    out = np.zeros((n, cout, lout))
    for bi in range(n):
        for o in range(cout):
            for p in range(lout):
                acc = b[o]
                for c in range(cin):
                    for j in range(k):
                        acc += x[bi, c, p * stride + j] * w[o, c, j]
                out[bi, o, p] = acc
    return out


def test_conv1d_valid_matches_loops():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 17))
    w = rng.normal(size=(4, 3, 5))
    b = rng.normal(size=4)
    for stride in (1, 2, 3):
        got = C.conv1d(x, w, b, stride=stride, padding="valid")
        want = _conv1d_loops(x, w, b, stride=stride)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_conv1d_same_keras_padding():
    """keras 'same' stride-1: pad (k-1)//2 left, k//2 right, L_out = L."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 2, 9))
    w = rng.normal(size=(3, 2, 3))
    b = rng.normal(size=3)
    got = C.conv1d(x, w, b, padding="same")
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1)))
    want = _conv1d_loops(xp, w, b)
    assert got.shape == (1, 3, 9)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # even kernel: keras pads 1 left, 2 right for k=4
    w4 = rng.normal(size=(3, 2, 4))
    got4 = C.conv1d(x, w4, b, padding="same")
    want4 = _conv1d_loops(np.pad(x, ((0, 0), (0, 0), (1, 2))), w4, b)
    assert got4.shape == (1, 3, 9)
    np.testing.assert_allclose(got4, want4, rtol=1e-12)


def test_conv2d_same_matches_loops():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 2, 5, 6))
    w = rng.normal(size=(3, 2, 3, 3))
    b = rng.normal(size=3)
    got = C.conv2d_same(x, w, b)
    assert got.shape == (2, 3, 5, 6)
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    want = np.zeros((2, 3, 5, 6))
    for bi in range(2):
        for o in range(3):
            for i in range(5):
                for j in range(6):
                    want[bi, o, i, j] = b[o] + np.sum(
                        xp[bi, :, i : i + 3, j : j + 3] * w[o]
                    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_maxpool2d_same_odd_dims():
    """MaxPool2D(2, same): out = ceil(in/2); the padded cell never wins
    (pad value is -inf)."""
    x = np.arange(2 * 1 * 3 * 5, dtype=float).reshape(2, 1, 3, 5)
    got = C.maxpool2d_same(x, 2)
    assert got.shape == (2, 1, 2, 3)
    assert got[0, 0, 0, 0] == max(x[0, 0, 0, 0], x[0, 0, 0, 1], x[0, 0, 1, 0], x[0, 0, 1, 1])
    # last column pools a single element (width 5 → pad to 6)
    assert got[0, 0, 0, 2] == max(x[0, 0, 0, 4], x[0, 0, 1, 4])
    # last row pools a single row (height 3 → pad to 4)
    assert got[0, 0, 1, 0] == max(x[0, 0, 2, 0], x[0, 0, 2, 1])


def test_batchnorm_formula():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 7))
    g, bt, m, v = (rng.normal(size=4), rng.normal(size=4),
                   rng.normal(size=4), rng.uniform(0.5, 2.0, size=4))
    got = C.batchnorm(x, g, bt, m, v, eps=1e-5)
    want = np.empty_like(x)
    for c in range(4):
        want[:, c] = g[c] * (x[:, c] - m[c]) / np.sqrt(v[c] + 1e-5) + bt[c]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # dense (2-D) activations normalize over axis 1 as well
    x2 = rng.normal(size=(3, 4))
    got2 = C.batchnorm(x2, g, bt, m, v, eps=1e-5)
    want2 = g * (x2 - m) / np.sqrt(v + 1e-5) + bt
    np.testing.assert_allclose(got2, want2, rtol=1e-12)


def test_deep_epi_cnn_shape_trace():
    """Conv length recurrence floor((L-5)/s)+1 through the stride
    pattern [1,1,1,1,2]*2,[1,1,1,1,2],... for L=750 — the model must
    survive its own architecture (torch would crash on a negative
    length), and GAP must collapse whatever remains."""
    L = 750
    strides = [1 if ((i + 1) % 5) != 0 else 2 for i in range(14)]
    for s in strides:
        L = (L - 5) // s + 1
    assert L > 0
    m = C.make_deep_epi_cnn(750, num_classes=2)
    x = np.random.default_rng(4).normal(size=(3, 750))
    p = m.predict(x)
    assert p.shape == (3,)
    assert np.all((p >= 0) & (p <= 1))
    # softmax head: class probabilities sum to 1
    full = m.forward(x)
    np.testing.assert_allclose(full.sum(axis=1), 1.0, rtol=1e-12)
    # 14 conv + 14 bn + 14 relu + gap + 4*(dense+bn+relu) + out + softmax
    assert sum(1 for ly in m.layers if ly.kind == "conv1d") == 14
    assert sum(1 for ly in m.layers if ly.kind == "dense") == 5


def test_spec_cnn_batch_vs_single_row():
    """Batched forward == per-row forward (no cross-row leakage)."""
    m = C.make_spec_cnn(n_freq=8, n_spec=2, n_layers=2, filters=6)
    x = np.random.default_rng(5).normal(size=(4, 16))
    batch = m.predict(x)
    singles = np.array([m.predict(x[i : i + 1])[0] for i in range(4)])
    np.testing.assert_allclose(batch, singles, rtol=1e-12)


def test_spec_cnn2d_shapes_and_probs():
    m = C.make_spec_cnn2d(n_freq=10, n_spec=5, n_layers=2, filters=4)
    x = np.random.default_rng(6).normal(size=(3, 50))
    p = m.predict(x)
    assert p.shape == (3,)
    assert np.all((p >= 0) & (p <= 1))


def test_npz_roundtrip_and_load_model_dispatch(tmp_path):
    from openseizuredatabase_spark.ml.inference import load_model

    m = C.make_spec_cnn(n_freq=6, n_spec=2, n_layers=1, filters=4)
    path = str(tmp_path / "spec_cnn.npz")
    C.save_cnn_npz(m, path)
    m2 = load_model(path)
    x = np.random.default_rng(7).normal(size=(5, 12))
    np.testing.assert_array_equal(m.predict(x), m2.predict(x))
    assert m2.input_shape == (1, 12)


def test_relu_and_gap_semantics():
    m = C.CnnModel(
        layers=(C.Layer("relu"), C.Layer("gap")),
        input_shape=(2, 4),
    )
    x = np.array([[-1.0, 2.0, -3.0, 4.0, 5.0, -6.0, 7.0, -8.0]])
    out = m.forward(x)
    # channel 0: relu([-1,2,-3,4]).mean() = 6/4; channel 1: 12/4
    np.testing.assert_allclose(out, [[1.5, 3.0]])


def test_cnn_scorers_plug_into_algs():
    from openseizuredatabase_spark.detection.model_algs import (
        NnSettings,
        SpecSettings,
        cnn_nn_score,
        cnn_spec_score,
    )

    s = SpecSettings()
    score = cnn_spec_score(s)
    v = np.random.default_rng(8).normal(size=s.n_freq * s.n_spec)
    p = score(v)
    assert 0.0 <= p <= 1.0
    # deterministic: same vector, same probability
    assert score(v) == p

    ns = NnSettings()
    nscore = cnn_nn_score(ns)
    v2 = np.random.default_rng(9).normal(size=ns.buffer_samp)
    p2 = nscore(v2)
    assert 0.0 <= p2 <= 1.0
    assert nscore(v2) == p2


def test_torch_state_dict_converts_to_identical_forward():
    """tools/convert_checkpoint.torch_state_to_deep_epi: a DeepEpiCnn
    state dict (torch naming/shapes, synthesized from the builder's own
    params so no framework is needed) converts to a model whose forward
    pass is bit-identical to the directly-built one — including the
    Linear (out,in)→(in,out) transpose and dropout-free Sequential
    index drift."""
    import numpy as np

    from openseizuredatabase_spark.ml.cnn import make_deep_epi_cnn
    from tools.convert_checkpoint import torch_state_to_deep_epi

    ref = make_deep_epi_cnn(input_length=750, num_classes=2, seed=13)
    sd = {}
    seq = 0
    li = iter(ref.layers)
    for ly in li:
        if ly.kind == "conv1d":
            sd[f"conv_stack.{seq}.weight"] = ly.params[0]
            sd[f"conv_stack.{seq}.bias"] = ly.params[1]
            seq += 1
        elif ly.kind == "batchnorm" and seq > 0 and seq < 40:
            g, b, m, v = ly.params
            sd[f"conv_stack.{seq}.weight"] = g
            sd[f"conv_stack.{seq}.bias"] = b
            sd[f"conv_stack.{seq}.running_mean"] = m
            sd[f"conv_stack.{seq}.running_var"] = v
            seq += 2  # reference interleaves a ReLU module (no params)
        elif ly.kind == "gap":
            break
    # dense head: fc1..fc4 + bn1..bn4 + fc_out (torch stores (out, in))
    tail = [ly for ly in ref.layers if ly.kind in ("dense", "batchnorm")]
    tail = tail[-9:]
    for j in range(4):
        w, b = tail[2 * j].params
        sd[f"fc{j + 1}.weight"] = w.T
        sd[f"fc{j + 1}.bias"] = b
        g, bb, m, v = tail[2 * j + 1].params
        sd[f"bn{j + 1}.weight"] = g
        sd[f"bn{j + 1}.bias"] = bb
        sd[f"bn{j + 1}.running_mean"] = m
        sd[f"bn{j + 1}.running_var"] = v
    w, b = tail[8].params
    sd["fc_out.weight"] = w.T
    sd["fc_out.bias"] = b

    got = torch_state_to_deep_epi(sd, input_length=750)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 750))
    assert np.array_equal(got.predict(x), ref.predict(x))


def test_keras_weights_convert_to_identical_forward(tmp_path):
    """tools/convert_checkpoint.keras_weights_to_spec_cnn: the keras
    get_weights() ordering/orientation (kernel (K,C_in,C_out), 6 arrays
    per block) converts to a bit-identical spec CNN; the result
    round-trips through save_cnn_npz → inference.load_model."""
    import numpy as np

    from openseizuredatabase_spark.ml.cnn import make_spec_cnn, save_cnn_npz
    from openseizuredatabase_spark.ml.inference import load_model
    from tools.convert_checkpoint import keras_weights_to_spec_cnn

    ref = make_spec_cnn(n_freq=12, n_spec=6, n_layers=2, seed=7)
    ws = []
    for ly in ref.layers:
        if ly.kind == "conv1d":
            w, b = ly.params
            ws += [w.transpose(2, 1, 0), b]  # back to keras layout
        elif ly.kind == "batchnorm":
            ws += list(ly.params)
        elif ly.kind == "dense":
            ws += list(ly.params)
    got = keras_weights_to_spec_cnn(ws, n_freq=12, n_spec=6)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 12 * 6))
    assert np.array_equal(got.predict(x), ref.predict(x))

    path = str(tmp_path / "spec.npz")
    save_cnn_npz(got, path)
    loaded = load_model(path)
    assert np.array_equal(loaded.predict(x), ref.predict(x))
