"""Round-3 model surface: ForestModel traversal, .npz roundtrip,
incomplete-beta kernel, Harrell-Davis ensemble combine, nested k-fold,
boilerplate scrub."""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.functions.stats import (
    betainc_reg,
    harrell_davis_weights,
)
from openseizuredatabase_spark.ml.inference import (
    ForestModel,
    LinearModel,
    assemble_features,
    ensemble_predict,
    load_model,
    predict_proba,
    save_forest_npz,
)
from openseizuredatabase_spark.operators.dedup import boilerplate_scrub
from openseizuredatabase_spark.operators.splits import nested_kfold


def _stump(feat, thr, lo, hi):
    return (
        np.array([feat, -1, -1], dtype=np.int64),
        np.array([thr, 0, 0], dtype=np.float64),
        np.array([1, -1, -1], dtype=np.int64),
        np.array([2, -1, -1], dtype=np.int64),
        np.array([0, lo, hi], dtype=np.float64),
    )


def test_forest_traversal_matches_hand_walk():
    # depth-2 tree: x0<=0 -> (x1<=1 ? 0.1 : 0.9) else leaf 0.4
    tree = (
        np.array([0, 1, -1, -1, -1], dtype=np.int64),
        np.array([0.0, 1.0, 0, 0, 0], dtype=np.float64),
        np.array([1, 3, -1, -1, -1], dtype=np.int64),
        np.array([2, 4, -1, -1, -1], dtype=np.int64),
        np.array([0, 0, 0.4, 0.1, 0.9], dtype=np.float64),
    )
    model = ForestModel(trees=(tree, _stump(1, 0.5, 0.2, 0.8)))
    x = np.array(
        [[-1.0, 0.5], [-1.0, 2.0], [1.0, 0.0], [0.0, 0.6]], dtype=float
    )
    # row0: tree->0.1 stump->0.2 ; row1: tree->0.9 stump->0.8
    # row2: tree->0.4 stump->0.2 ; row3: x0<=0 left, x1<=1 -> 0.1; stump 0.8
    want = np.array(
        [(0.1 + 0.2) / 2, (0.9 + 0.8) / 2, (0.4 + 0.2) / 2, (0.1 + 0.8) / 2]
    )
    assert np.allclose(model.predict(x), want)


def test_forest_npz_roundtrip(tmp_path):
    model = ForestModel(trees=(_stump(0, 0.0, 0.25, 0.75),))
    path = str(tmp_path / "forest.npz")
    save_forest_npz(model, path)
    loaded = load_model(path)
    assert isinstance(loaded, ForestModel)
    x = np.array([[-1.0], [1.0]])
    assert np.allclose(loaded.predict(x), model.predict(x))
    assert np.allclose(loaded.predict(x), [0.25, 0.75])


def test_betainc_integer_orders_binomial_identity():
    # For integer a,b: I_x(a,b) = sum_{j=a}^{n} C(n,j) x^j (1-x)^(n-j),
    # n = a+b-1 — an independent closed form.
    for a, b in [(1, 1), (2, 3), (3, 2), (4, 4), (2, 7)]:
        n = a + b - 1
        for x in [0.05, 0.25, 0.5, 0.75, 0.95]:
            want = sum(
                math.comb(n, j) * x**j * (1 - x) ** (n - j)
                for j in range(a, n + 1)
            )
            assert betainc_reg(a, b, x) == pytest.approx(want, abs=1e-12)


def test_betainc_bounds_and_symmetry():
    assert betainc_reg(2.5, 3.5, 0.0) == 0.0
    assert betainc_reg(2.5, 3.5, 1.0) == 1.0
    for x in [0.1, 0.3, 0.7]:
        # I_x(a,b) = 1 - I_{1-x}(b,a)
        assert betainc_reg(3.6, 2.4, x) == pytest.approx(
            1.0 - betainc_reg(2.4, 3.6, 1.0 - x), abs=1e-12
        )


def test_hd_weights_reference_formula():
    # weights are beta CDF increments at i/n (ensemblePredictor.py:46-66)
    n, q = 5, 0.6
    ws = harrell_davis_weights(n, q)
    assert sum(ws) == pytest.approx(1.0, abs=1e-12)
    a, b = (n + 1) * q, (n + 1) * (1 - q)
    for i, w in enumerate(ws):
        want = betainc_reg(a, b, (i + 1) / n) - betainc_reg(a, b, i / n)
        assert w == pytest.approx(want, abs=1e-15)
    # q=0.6 skews weight toward the upper order statistics
    assert ws[3] + ws[4] > ws[0] + ws[1]


def test_ensemble_predict_matches_manual(spark):
    models = [
        LinearModel(weights=(0.5,), bias=0.0),
        LinearModel(weights=(-0.25,), bias=0.125),
        LinearModel(weights=(1.0,), bias=-0.5),
    ]
    rows = [Row(i=i, f1=float(v)) for i, v in enumerate([-2.0, 0.0, 3.0])]
    df = assemble_features(spark.createDataFrame(rows), ["f1"])
    got = {
        r["i"]: r["p"]
        for r in ensemble_predict(df, models, 0.6, out_col="p").collect()
    }
    ws = np.array(harrell_davis_weights(3, 0.6))
    for i, v in enumerate([-2.0, 0.0, 3.0]):
        scores = np.sort(
            [m.predict(np.array([[v]]))[0] for m in models]
        )
        assert got[i] == pytest.approx(float(scores @ ws), abs=1e-12)


def test_nested_kfold_partitions(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "event_id")
    out = nested_kfold(df, "event_id", 5, 3)
    rows = out.collect()
    # every row gets exactly one (outer, inner); outer partitions the ids
    assert len(rows) == 300
    for r in rows:
        assert 0 <= r["outer_fold"] < 5
        assert 0 <= r["inner_fold"] < 3
        assert r["outer_fold"] == r["event_id"] % 5
        assert r["inner_fold"] == (r["event_id"] // 5) % 3
    # balanced: 300/5 per outer fold, 300/15 per (outer, inner)
    counts = (
        out.groupBy("outer_fold", "inner_fold").count().collect()
    )
    assert all(c["count"] == 20 for c in counts) and len(counts) == 15


def test_boilerplate_scrub_drops_hot_segment_keeps_order(spark):
    boiler = "all rights reserved by the corpus owner inc"  # 8 tokens
    docs = [
        Row(doc_id=i, text=f"{boiler} unique body text number {i} is here")
        for i in range(5)
    ] + [Row(doc_id=99, text="a fully unique document body with no header")]
    df = spark.createDataFrame(docs)
    out = {
        r["doc_id"]: r
        for r in boilerplate_scrub(
            df, "text", "doc_id", seg_tokens=8, max_df=4
        ).collect()
    }
    # the 8-token boilerplate block appears in 5 docs > max_df=4: dropped
    for i in range(5):
        assert out[i]["cleaned"] == f"unique body text number {i} is here"
        assert out[i]["n_kept"] == 1
    # untouched doc survives whole (two segments, order preserved)
    assert out[99]["cleaned"] == "a fully unique document body with no header"
    assert out[99]["n_kept"] == 1


def test_boilerplate_scrub_all_boilerplate_doc_drops_out(spark):
    seg = "x y z w p q r s"
    docs = [Row(doc_id=i, text=seg) for i in range(3)]
    df = spark.createDataFrame(docs)
    out = boilerplate_scrub(df, "text", "doc_id", seg_tokens=8, max_df=2)
    assert out.count() == 0


def test_threshold_sweep_hand_case(spark):
    from openseizuredatabase_spark.operators.aggregates import (
        threshold_sweep,
    )

    # events: A (pos, max_p=0.9), B (pos, max_p=0.4), C (neg, max_p=0.6)
    rows = [
        Row(ev="A", lab=1, p=0.9), Row(ev="A", lab=1, p=0.2),
        Row(ev="B", lab=1, p=0.4),
        Row(ev="C", lab=0, p=0.6), Row(ev="C", lab=0, p=0.1),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["threshold"]: r
        for r in threshold_sweep(
            df, "ev", F.col("lab") == 1, F.col("p"), [0.3, 0.5, 0.8]
        ).collect()
    }
    # th=0.3: A,B fire (tp=2) and C fires (fp=1)
    assert (out[0.3]["event_tp"], out[0.3]["event_fp"]) == (2, 1)
    # th=0.5: A fires, B missed, C fires
    assert (out[0.5]["event_tp"], out[0.5]["event_fn"]) == (1, 1)
    assert out[0.5]["event_fp"] == 1
    # th=0.8: only A fires
    assert (out[0.8]["event_tp"], out[0.8]["event_fp"]) == (1, 0)
    assert out[0.8]["event_tpr"] == pytest.approx(0.5)
    assert out[0.8]["event_fpr"] == pytest.approx(0.0)


def test_auc_rank_matches_pair_counting(spark):
    from openseizuredatabase_spark.operators.aggregates import auc_rank

    # pos scores: .9 .7 .4 ; neg scores: .7 .3 .1
    # pairs won: (.9 beats all 3) + (.7 beats .3,.1; ties .7 -> .5)
    #           + (.4 beats .3,.1) = 3 + 2.5 + 2 = 7.5 ; AUC = 7.5/9
    rows = [
        Row(lab=1, p=0.9), Row(lab=1, p=0.7), Row(lab=1, p=0.4),
        Row(lab=0, p=0.7), Row(lab=0, p=0.3), Row(lab=0, p=0.1),
    ]
    out = auc_rank(
        spark.createDataFrame(rows), F.col("lab") == 1, F.col("p")
    ).collect()[0]
    assert (out["n_pos"], out["n_neg"]) == (3, 3)
    assert out["auc"] == pytest.approx(round(7.5 / 9, 6))


def test_auc_rank_perfect_and_random(spark):
    from openseizuredatabase_spark.operators.aggregates import auc_rank

    perfect = spark.createDataFrame(
        [Row(lab=1, p=0.9), Row(lab=1, p=0.8), Row(lab=0, p=0.2)]
    )
    out = auc_rank(perfect, F.col("lab") == 1, F.col("p")).collect()[0]
    assert out["auc"] == pytest.approx(1.0)
    all_tied = spark.createDataFrame(
        [Row(lab=1, p=0.5), Row(lab=0, p=0.5)]
    )
    out = auc_rank(all_tied, F.col("lab") == 1, F.col("p")).collect()[0]
    assert out["auc"] == pytest.approx(0.5)


def test_fit_tree_learns_separable_split(spark):
    from openseizuredatabase_spark.ml.train import fit_tree

    # y = 1 iff f1 > 0.5 (single clean split on feature 1 of 2)
    rows = [
        Row(id=i, f0=float((i * 37) % 11) / 11.0,
            f1=float(i % 10) / 10.0, y=1 if (i % 10) / 10.0 > 0.5 else 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    model = fit_tree(df, ["f0", "f1"], "y", max_depth=2, n_bins=16)
    import numpy as np

    x = np.array([[r["f0"], r["f1"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    p = model.predict(x)
    acc = ((p >= 0.5).astype(int) == y).mean()
    assert acc == 1.0
    # the root should split on feature 1
    assert model.trees[0][0][0] == 1


def test_fit_tree_pure_node_stays_leaf(spark):
    from openseizuredatabase_spark.ml.train import fit_tree

    rows = [Row(id=i, f0=float(i), y=1) for i in range(50)]
    model = fit_tree(
        spark.createDataFrame(rows), ["f0"], "y", max_depth=3
    )
    feat, thr, left, right, value = model.trees[0]
    assert feat[0] == -1 and value[0] == 1.0  # pure: no split grown


def test_fit_forest_roundtrip_and_determinism(spark, tmp_path):
    from openseizuredatabase_spark.ml.inference import (
        load_model,
        save_forest_npz,
    )
    from openseizuredatabase_spark.ml.train import fit_forest

    rows = [
        Row(id=i, f0=float((i * 7) % 13) / 13.0,
            f1=float(i % 8) / 8.0, f2=float((i * 3) % 5) / 5.0,
            y=1 if (i % 8) / 8.0 >= 0.5 else 0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    m1 = fit_forest(df, ["f0", "f1", "f2"], "y", "id", n_trees=3,
                    max_depth=2, n_bins=8)
    m2 = fit_forest(df, ["f0", "f1", "f2"], "y", "id", n_trees=3,
                    max_depth=2, n_bins=8)
    import numpy as np

    x = np.array([[r["f0"], r["f1"], r["f2"]] for r in rows])
    assert np.array_equal(m1.predict(x), m2.predict(x))  # deterministic
    y = np.array([r["y"] for r in rows])
    acc = ((m1.predict(x) >= 0.5).astype(int) == y).mean()
    assert acc > 0.9
    path = str(tmp_path / "forest.npz")
    save_forest_npz(m1, path)
    assert np.allclose(load_model(path).predict(x), m1.predict(x))


def test_auc_rank_single_class_yields_null(spark):
    from openseizuredatabase_spark.operators.aggregates import auc_rank

    pos_only = spark.createDataFrame(
        [Row(lab=1, p=0.9), Row(lab=1, p=0.1)]
    )
    out = auc_rank(pos_only, F.col("lab") == 1, F.col("p")).collect()[0]
    assert out["n_neg"] == 0 and out["auc"] is None  # no divide-by-zero


def test_threshold_sweep_empty_frame(spark):
    from openseizuredatabase_spark.operators.aggregates import (
        threshold_sweep,
    )

    empty = spark.createDataFrame([], "ev string, lab int, p double")
    out = threshold_sweep(
        empty, "ev", F.col("lab") == 1, F.col("p"), [0.5]
    ).collect()
    assert out == []  # no events -> no sweep rows, no error


def test_event_level_metrics_single_class(spark):
    from openseizuredatabase_spark.operators.aggregates import (
        event_level_metrics,
    )

    rows = [Row(ev="A", lab=0, p=0.4), Row(ev="B", lab=0, p=0.6)]
    out = event_level_metrics(
        spark.createDataFrame(rows), "ev", F.col("lab") == 1, F.col("p")
    ).collect()[0]
    assert out["event_tpr"] is None  # no positives: NULL, not crash
    assert out["event_fpr"] == pytest.approx(0.5)
