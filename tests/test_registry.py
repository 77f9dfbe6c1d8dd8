"""Registry-level checks: every query runs, matches its oracle at
sf0.001, and core plans have the physical shape we designed for
(pushdown, broadcast, no Python UDFs in relational paths)."""

import duckdb
import pytest

from openseizuredatabase_spark.plans.oracle_check import _duckdb_conn, compare_query
from openseizuredatabase_spark.plans.registry import QUERIES


@pytest.fixture(scope="module")
def con(sf_dir):
    return _duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, sf_dir, name):
    ok, msg = compare_query(spark, con, QUERIES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_a1_filter_pushed_down(spark, sf_dir):
    plan = QUERIES["a1_pricing_summary"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_j3_uses_broadcast_join(spark, sf_dir):
    plan = QUERIES["j3_top_orders"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_relational_queries_have_no_python_udf(spark, sf_dir):
    # every oracle-checked query must stay JVM-side (no BatchEvalPython /
    # ArrowEvalPython stages) — except the ones whose SEMANTICS are a
    # Python model/kernel stage (the Arrow batch contract is the product,
    # not an accident); group-map ops (applyInPandas/mapInPandas) compile
    # to MapInPandas nodes and are out of this check's scope
    # m9/m14/m15/m16: Arrow-vectorized model scoring IS the operator;
    # n1/n2: the dp-detector's map-side Arrow scorer is likewise the
    # product (the alarm machine behind it is mapInPandas, out of
    # scope); n4: the ensemble's (N, K) score-matrix combine is the
    # Arrow stage under test; x_signatures embeds their member branches
    python_by_design = {
        "m9_batch_inference",
        "m14_mlp_inference",
        "m15_cnn_inference",
        "m16_rf_inference",
        "n1_dp_detector",
        "n2_differential_report",
        "n4_ensemble_quantile",
        # t24: per-cluster numpy integer matmul IS the operator (the
        # v3-style Arrow kernel; interpreted zip_with pairs are ~10x off)
        "t24_semantic_dedup",
        # c13/c14: the numpy IIR / Welch kernels ARE the operators under test
        "c13_iir_recurrence",
        "c14_welch_psd",
        # w5_band_power: built on c14's Arrow Welch kernel
        "w5_band_power",
        # m20/m21/m22: the REAL stdlib codecs (PNG decode/resize, WAV
        # decode) are Python by nature — the mapInPandas stage IS the
        # operator, and the oracle verifies the codec round trip
        "m20_png_decode",
        "m21_png_resize",
        "m22_wav_decode",
        "x_sig_relational",
        "x_sig_aggwindow",
        "x_sig_text",
        "x_sig_mlvector",
    }
    for name, spec in QUERIES.items():
        if spec.oracle is None or name in python_by_design:
            continue
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"
