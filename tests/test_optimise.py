"""Config-grid evaluation harness (runOptimisation.py:8-96 equivalent):
baseline + one-at-a-time sweeps as ONE Spark job, featurization shared
across model-only variants, kfold_summary-style metrics per config."""

import json

import numpy as np
import pandas as pd
import pytest

from openseizuredatabase_spark.ml.optimise import (
    config_rows,
    data_key,
    fit_local_forest,
    run_param_grid,
    summarise,
)

BASE_CONFIG = {
    "modelConfig": {"n_estimators": 8, "max_depth": 3},
    "dataProcessing": {"window": 125, "step": 25, "highPassOrder": 4},
}


def _make_features(seed: int, n_events: int = 40, dps_per_event: int = 6):
    """Separable two-feature fixture: seizure events sit in a corner of
    feature space that one axis split cannot isolate (XOR-ish), so a
    depth-1 stump underfits and depth>=3 recovers it — the baseline-vs-
    variant signal the reference's sweep table surfaces."""
    rng = np.random.default_rng(seed)
    rows = []
    for e in range(n_events):
        label = int(e % 2 == 0)
        for _ in range(dps_per_event):
            if label:
                f1, f2 = rng.normal(2.0, 0.3), rng.normal(2.0, 0.3)
                if rng.random() < 0.5:
                    f1, f2 = -f1, -f2  # XOR arm
            else:
                f1, f2 = rng.normal(2.0, 0.3), rng.normal(-2.0, 0.3)
                if rng.random() < 0.5:
                    f1, f2 = -f1, -f2
            rows.append(
                {"eventId": e, "label": label, "f1": f1, "f2": f2}
            )
    return pd.DataFrame(rows)


def _featurize_factory(calls):
    def featurize(data_cfg: dict):
        calls.append(json.dumps(data_cfg, sort_keys=True))
        # window size participates in the seed so distinct data configs
        # yield distinct (deterministic) feature tables
        seed = int(data_cfg.get("window") or 125)
        return _make_features(seed), _make_features(seed + 1)

    return featurize


def test_config_rows_one_at_a_time_sweep():
    rows = config_rows(
        BASE_CONFIG,
        ["max_depth", "window"],
        {"max_depth": [1, 3], "window": [125, 250]},
    )
    assert [r["param"] for r in rows] == [
        "baseline", "max_depth", "max_depth", "window", "window",
    ]
    # each sweep row overrides exactly its own key, nested scopes resolved
    cfg_d1 = json.loads(rows[1]["config"])
    assert cfg_d1["modelConfig"]["max_depth"] == 1
    assert cfg_d1["dataProcessing"]["window"] == 125
    cfg_w250 = json.loads(rows[4]["config"])
    assert cfg_w250["dataProcessing"]["window"] == 250
    assert cfg_w250["modelConfig"]["max_depth"] == 3
    # run_ids unique and baseline first
    assert [r["run_id"] for r in rows] == list(range(5))


def test_data_key_groups_model_only_variants():
    rows = config_rows(
        BASE_CONFIG,
        ["max_depth", "window"],
        {"max_depth": [1, 3], "window": [125, 250]},
    )
    keys = {data_key(json.loads(r["config"])) for r in rows}
    # baseline, max_depth=1, max_depth=3, window=125 all share the
    # baseline featurization; window=250 is the only second key
    assert len(keys) == 2


def test_fit_local_forest_learns_and_is_deterministic():
    pdf = _make_features(7)
    x = pdf[["f1", "f2"]].to_numpy()
    y = pdf["label"].to_numpy(dtype=float)
    m1 = fit_local_forest(x, y, n_estimators=8, max_depth=4)
    m2 = fit_local_forest(x, y, n_estimators=8, max_depth=4)
    p1, p2 = m1.predict(x), m2.predict(x)
    assert np.array_equal(p1, p2)
    acc = np.mean((p1 >= 0.5) == (y == 1))
    assert acc > 0.9


def test_run_param_grid_baseline_vs_variant(spark):
    calls = []
    results = run_param_grid(
        spark,
        _featurize_factory(calls),
        BASE_CONFIG,
        ["max_depth", "window"],
        {"max_depth": [1, 4], "window": [125, 250]},
        feature_cols=["f1", "f2"],
    ).toPandas().sort_values("run_id").reset_index(drop=True)

    # one featurization per distinct data-param subset, not per config
    assert len(calls) == 2

    assert list(results["param"]) == [
        "baseline", "max_depth", "max_depth", "window", "window",
    ]
    base = results.iloc[0]
    d1 = results[results["value"] == "1"].iloc[0]
    d4 = results[results["value"] == "4"].iloc[0]
    # depth-1 stump cannot isolate the XOR corner (it alarms on whole
    # arms — every non-seizure event trips); depth-4 can — the sweep
    # reproduces the reference's baseline-vs-variant comparison
    assert d4["tpr"] > d1["tpr"]
    assert d4["event_fpr"] < d1["event_fpr"]
    # baseline (depth 3) also beats the stump
    assert base["event_fpr"] < d1["event_fpr"]
    # window=125 sweep row shares the baseline featurization AND model
    # params, so its metrics equal the baseline row exactly
    w125 = results[(results["param"] == "window") & (results["value"] == "125")].iloc[0]
    for c in ("tp", "fp", "tn", "fn", "event_tpr", "event_fpr"):
        assert w125[c] == base[c]
    # confusion counts are complete partitions of the test rows
    n = results[["tp", "fp", "tn", "fn"]].sum(axis=1)
    assert n.nunique() == 1 and int(n.iloc[0]) == 40 * 6


def test_summarise_deltas(spark):
    results = run_param_grid(
        spark,
        _featurize_factory([]),
        BASE_CONFIG,
        ["max_depth"],
        {"max_depth": [1]},
        feature_cols=["f1", "f2"],
    )
    summary = summarise(results).toPandas().sort_values("run_id")
    base = summary.iloc[0]
    assert base["param"] == "baseline"
    assert base["d_event_tpr"] == pytest.approx(0.0)
    assert base["d_event_fpr"] == pytest.approx(0.0)
    stump = summary.iloc[1]
    assert stump["d_event_tpr"] == pytest.approx(
        stump["event_tpr"] - base["event_tpr"]
    )


def test_save_and_analyse_only_roundtrip(tmp_path, spark):
    from openseizuredatabase_spark.ml.optimise import (
        load_results,
        save_summary,
    )

    results = run_param_grid(
        spark,
        _featurize_factory([]),
        BASE_CONFIG,
        ["max_depth"],
        {"max_depth": [1]},
        feature_cols=["f1", "f2"],
    )
    csv_path, json_path = save_summary(results, str(tmp_path / "opt"))
    import os

    assert os.path.exists(csv_path) and os.path.exists(json_path)
    # analyse-only: reload and summarise without rerunning the grid
    reloaded = load_results(spark, str(tmp_path / "opt"))
    a = results.toPandas().sort_values("run_id").reset_index(drop=True)
    b = reloaded.toPandas().sort_values("run_id").reset_index(drop=True)
    assert list(a["param"]) == list(b["param"])
    for c in ("tp", "fp", "tn", "fn", "event_tpr", "event_fpr"):
        assert list(a[c]) == list(b[c])
    s = summarise(reloaded).toPandas()
    assert s.iloc[0]["param"] == "baseline"
