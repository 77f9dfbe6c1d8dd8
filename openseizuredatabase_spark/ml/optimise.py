"""Config-grid evaluation harness — the meta-parameter optimisation
workflow (`user_tools/nnTraining2/runOptimisation.py:8-96`) as ONE Spark
job instead of a serial per-config pipeline rerun.

The reference sweeps each parameter one at a time around a baseline
config (`run_and_collect`): for every (param, value) it rewrites
nnConfig.json, reruns the train pipeline in a subprocess, and scrapes
tpr/fpr/event_tpr/event_fpr out of `kfold_summary.json`. Two structural
ideas survive the re-expression; everything else changes shape:

* **one-at-a-time sweep around a baseline** (`runOptimisation.py:42-55`)
  → `config_rows()` materializes the same row set (baseline + one row
  per swept value) as a small DataFrame of JSON configs;
* **"copy baseline files to save re-generating them"**
  (`runOptimisation.py:70-83` — model-only params reuse the baseline's
  featurized CSVs; window/step/highPassOrder rebuild them) → configs
  are grouped by their DATA-AFFECTING parameter subset; each distinct
  subset is featurized ONCE (a fully distributed Spark stage), and all
  model-param variants of that subset share the result via a broadcast.

Execution shape: the featurized (train, test) tables for each distinct
data-config are compact model inputs (the reference's
trainFeatures.csv — orders of magnitude smaller than the raw signal
lake, bounded by epochs × ~150 features), so they broadcast; the grid
rows then fan out as one `groupBy(run_id).applyInPandas` stage where
every task fits + evaluates its config independently — the grid the
reference walks serially is embarrassingly parallel. For feature tables
too large to broadcast, fall back to the fully distributed
`ml.train.fit_forest` per config (sequential configs, parallel fit) —
same metrics layer.

Metrics per config reproduce `kfold_summary.json`'s row:
datapoint-level tpr/fpr (threshold 0.5, nnTester.py:948) and
event-level tpr/fpr via max-probability-per-event, threshold 0.5
(`eventLevelMetrics.py:46-90`).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from openseizuredatabase_spark.ml.inference import ForestModel

# the reference's data-affecting params: sweeping these invalidates the
# featurized CSVs (runOptimisation.py:72 `if param not in ["window",
# "step", "highPassOrder"]`); everything else reuses baseline features
DATA_PARAMS: frozenset[str] = frozenset({"window", "step", "highPassOrder"})

RESULT_SCHEMA = (
    "run_id long, param string, value string, "
    "tp long, fp long, tn long, fn long, tpr double, fpr double, "
    "event_tp long, event_fp long, event_tn long, event_fn long, "
    "event_tpr double, event_fpr double, n_events long"
)


def config_rows(
    base_config: dict,
    params_to_vary: Sequence[str],
    param_values: dict[str, Sequence],
) -> list[dict]:
    """The run_and_collect sweep set: a baseline row, then one row per
    (param, value) with that single key overridden (nested lookup into
    modelConfig / dataProcessing mirrors runOptimisation.py:49-54)."""
    rows = [
        {
            "run_id": 0,
            "param": "baseline",
            "value": None,
            "config": json.dumps(base_config, sort_keys=True),
        }
    ]
    rid = 1
    for param in params_to_vary:
        for val in param_values[param]:
            cfg = json.loads(json.dumps(base_config))
            if param in cfg:
                cfg[param] = val
            elif param in cfg.get("modelConfig", {}):
                cfg["modelConfig"][param] = val
            elif param in cfg.get("dataProcessing", {}):
                cfg["dataProcessing"][param] = val
            else:
                cfg[param] = val
            rows.append(
                {
                    "run_id": rid,
                    "param": param,
                    "value": json.dumps(val),
                    "config": json.dumps(cfg, sort_keys=True),
                }
            )
            rid += 1
    return rows


def _cfg_get(cfg: dict, key: str, default):
    for scope in (cfg, cfg.get("modelConfig", {}), cfg.get("dataProcessing", {})):
        if key in scope:
            return scope[key]
    return default


def data_key(cfg: dict, data_params: frozenset[str] = DATA_PARAMS) -> str:
    """Canonical key over the data-affecting parameter subset — configs
    sharing it share one featurization (the baseline-file-copy reuse)."""
    return json.dumps(
        {p: _cfg_get(cfg, p, None) for p in sorted(data_params)}, sort_keys=True
    )


def fit_local_forest(
    x: np.ndarray,
    y: np.ndarray,
    n_estimators: int = 4,
    max_depth: int = 3,
    n_bins: int = 32,
    min_rows: int = 2,
) -> ForestModel:
    """Executor-local twin of ml.train.fit_tree/fit_forest (same
    histogram-CART algorithm and ForestModel tree layout, numpy instead
    of Spark jobs) for the grid harness, where each config's fit runs
    whole inside one task over the broadcast feature table. Determinism:
    seeded row subsample + seeded sqrt-feature subset per tree, so the
    sweep is reproducible run to run (no RNG shared across tasks)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, nf = x.shape
    mins = x.min(axis=0)
    widths = np.maximum(x.max(axis=0) - mins, 1e-12) / n_bins
    bins = np.minimum(((x - mins) / widths).astype(np.int64), n_bins - 1)

    def fit_tree(rows: np.ndarray, feats: list[int]):
        feat = [-1]
        thr = [0.0]
        left = [-1]
        right = [-1]
        value = [0.0]
        node_of = np.zeros(len(rows), dtype=np.int64)
        open_nodes = {0}
        for _ in range(max_depth):
            if not open_nodes:
                break
            next_open: set[int] = set()
            any_split = False
            for node in sorted(open_nodes):
                mask = node_of == node
                yb = y[rows[mask]]
                tot_n, tot_p = len(yb), float(yb.sum())
                value[node] = tot_p / tot_n if tot_n else 0.0
                if tot_n < 2 * min_rows or tot_p in (0.0, float(tot_n)):
                    continue
                parent_gini = 2 * (tot_p / tot_n) * (1 - tot_p / tot_n)
                best = None
                for f in feats:
                    bf = bins[rows[mask], f]
                    cn = np.cumsum(np.bincount(bf, minlength=n_bins))
                    cp = np.cumsum(np.bincount(bf, weights=yb, minlength=n_bins))
                    for b in range(n_bins - 1):
                        ln, lp = cn[b], cp[b]
                        rn, rp = tot_n - ln, tot_p - lp
                        if ln < min_rows or rn < min_rows:
                            continue
                        gl = 2 * (lp / ln) * (1 - lp / ln)
                        gr = 2 * (rp / rn) * (1 - rp / rn)
                        gain = parent_gini - (ln * gl + rn * gr) / tot_n
                        if best is None or gain > best[0] + 1e-15:
                            best = (gain, f, b)
                if best is None or best[0] <= 1e-12:
                    continue
                _, f, b = best
                li, ri = len(feat), len(feat) + 1
                feat.extend([-1, -1])
                thr.extend([0.0, 0.0])
                left.extend([-1, -1])
                right.extend([-1, -1])
                value.extend([0.0, 0.0])
                feat[node] = f
                thr[node] = float(np.nextafter(mins[f] + widths[f] * (b + 1), -np.inf))
                left[node], right[node] = li, ri
                sub = bins[rows[mask], f] <= b
                node_idx = np.where(mask)[0]
                node_of[node_idx[sub]] = li
                node_of[node_idx[~sub]] = ri
                next_open.update((li, ri))
                any_split = True
            open_nodes = next_open
            if not any_split:
                break
        for node in open_nodes:  # final-level leaves
            mask = node_of == node
            if mask.any():
                value[node] = float(y[rows[mask]].mean())
        return (
            np.array(feat, dtype=np.int64),
            np.array(thr, dtype=np.float64),
            np.array(left, dtype=np.int64),
            np.array(right, dtype=np.int64),
            np.array(value, dtype=np.float64),
        )

    n_sub = max(1, int(np.ceil(np.sqrt(nf))))
    trees = []
    for t in range(n_estimators):
        rng = np.random.default_rng(1000 + t)
        feats = sorted(rng.choice(nf, size=n_sub, replace=False).tolist())
        rows = np.where(rng.random(n) < 0.632)[0]
        if len(rows) < 2 * min_rows:
            rows = np.arange(n)
        trees.append(fit_tree(rows, feats))
    return ForestModel(trees=tuple(trees))


def _metrics(
    pdf: pd.DataFrame, prob: np.ndarray, label_col: str, event_col: str
) -> dict:
    y = pdf[label_col].to_numpy(dtype=np.float64)
    pred = prob >= 0.5
    pos = y == 1
    tp = int(np.sum(pred & pos))
    fp = int(np.sum(pred & ~pos))
    tn = int(np.sum(~pred & ~pos))
    fn = int(np.sum(~pred & pos))
    # event level: max probability per event, first label (all dps in an
    # event share the label) — eventLevelMetrics.py:46-66
    ev = (
        pd.DataFrame({"e": pdf[event_col].to_numpy(), "p": prob, "y": y})
        .groupby("e", sort=False)
        .agg(p=("p", "max"), y=("y", "first"))
    )
    epred = ev["p"].to_numpy() >= 0.5
    epos = ev["y"].to_numpy() == 1
    etp = int(np.sum(epred & epos))
    efp = int(np.sum(epred & ~epos))
    etn = int(np.sum(~epred & ~epos))
    efn = int(np.sum(~epred & epos))
    return {
        "tp": tp, "fp": fp, "tn": tn, "fn": fn,
        "tpr": tp / (tp + fn) if tp + fn else 0.0,
        "fpr": fp / (fp + tn) if fp + tn else 0.0,
        "event_tp": etp, "event_fp": efp, "event_tn": etn, "event_fn": efn,
        "event_tpr": etp / (etp + efn) if etp + efn else 0.0,
        "event_fpr": efp / (efp + etn) if efp + etn else 0.0,
        "n_events": len(ev),
    }


def run_param_grid(
    spark: SparkSession,
    featurize: Callable[[dict], tuple[pd.DataFrame, pd.DataFrame]],
    base_config: dict,
    params_to_vary: Sequence[str],
    param_values: dict[str, Sequence],
    feature_cols: Sequence[str],
    label_col: str = "label",
    event_col: str = "eventId",
    data_params: frozenset[str] = DATA_PARAMS,
) -> DataFrame:
    """The whole sweep as one Spark job. `featurize(config)` returns the
    (train, test) feature tables for a config's data-affecting params —
    in production a fully distributed flatten/extract pipeline whose
    compact output is collected (it is the model-input table, not the
    raw lake); here any callable with that contract.

    Featurization runs once per DISTINCT data-param subset; its outputs
    are broadcast and every config's fit/eval runs as one task in a
    single applyInPandas stage keyed by run_id.
    """
    rows = config_rows(base_config, params_to_vary, param_values)
    keys = {}
    for r in rows:
        k = data_key(json.loads(r["config"]), data_params)
        r["dkey"] = k
        keys.setdefault(k, None)
    sc = spark.sparkContext
    for k in keys:  # one distributed featurization per distinct subset
        train_pdf, test_pdf = featurize(json.loads(k))
        keys[k] = sc.broadcast((train_pdf, test_pdf))
    bmap = dict(keys)
    fcols = list(feature_cols)

    def fit_eval(pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        cfg = json.loads(row["config"])
        train_pdf, test_pdf = bmap[row["dkey"]].value
        model = fit_local_forest(
            train_pdf[fcols].to_numpy(dtype=np.float64),
            train_pdf[label_col].to_numpy(dtype=np.float64),
            n_estimators=int(_cfg_get(cfg, "n_estimators", 4)),
            max_depth=int(_cfg_get(cfg, "max_depth", 3)),
        )
        prob = model.predict(test_pdf[fcols].to_numpy(dtype=np.float64))
        m = _metrics(test_pdf, prob, label_col, event_col)
        return pd.DataFrame(
            [{"run_id": row["run_id"], "param": row["param"],
              "value": row["value"], **m}]
        )

    grid = spark.createDataFrame(
        pd.DataFrame(rows), "run_id long, param string, value string, config string, dkey string"
    ).repartition("run_id")
    return grid.groupBy("run_id").applyInPandas(fit_eval, RESULT_SCHEMA)


def summarise(results: DataFrame) -> DataFrame:
    """The per-parameter comparison table the reference prints
    (runOptimisation.py:160-166): baseline row first, then each swept
    value with its delta vs baseline event_tpr/event_fpr."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = results.filter(F.col("param") == "baseline").select(
        F.col("event_tpr").alias("base_event_tpr"),
        F.col("event_fpr").alias("base_event_fpr"),
    )
    return (
        results.crossJoin(F.broadcast(base))
        .withColumn("d_event_tpr", F.col("event_tpr") - F.col("base_event_tpr"))
        .withColumn("d_event_fpr", F.col("event_fpr") - F.col("base_event_fpr"))
        .select(
            "run_id", "param", "value", "tpr", "fpr",
            "event_tpr", "event_fpr", "d_event_tpr", "d_event_fpr",
        )
        .withColumn(
            "rank_in_param",
            F.row_number().over(
                Window.partitionBy("param").orderBy(
                    F.desc("event_tpr"), F.asc("event_fpr"), F.asc("run_id")
                )
            ),
        )
        .orderBy("run_id")
    )


def save_summary(results: DataFrame, out_dir: str) -> tuple[str, str]:
    """The reference's result artifacts (runOptimisation.py:147-156):
    `optimisation_summary.csv` and `optimisation_summary.json` in the
    output dir. Written from the collected summary frame — it is
    grid-sized (one row per config), never corpus-sized."""
    import csv
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = [r.asDict() for r in results.collect()]
    csv_path = os.path.join(out_dir, "optimisation_summary.csv")
    json_path = os.path.join(out_dir, "optimisation_summary.json")
    cols = list(rows[0].keys()) if rows else []
    # csv.writer quotes embedded commas/quotes — a json.dumps'd list
    # value (e.g. a layer-size sweep "[32, 16]") stays one cell
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        for r in rows:
            w.writerow(["" if r[c] is None else r[c] for c in cols])
    with open(json_path, "w") as f:
        json.dump(rows, f, indent=2)
    return csv_path, json_path


def load_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """Analyse-only mode (runOptimisation.py:118-139): reload a prior
    sweep's summary JSON instead of rerunning the grid, so `summarise`
    / reporting run on saved results."""
    import json
    import os

    with open(os.path.join(out_dir, "optimisation_summary.json")) as f:
        rows = json.load(f)
    return spark.createDataFrame(pd.DataFrame(rows))
