"""Sketch library contracts: estimator quality, merge laws, and the
overestimate guarantee — the properties the cross-engine oracles
(a16/a17/a18) can't express because they replay the same formulas."""

import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.functions import sketches


def _ids_df(spark, n, groups=1):
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        F.col("id").alias("v"),
    )


def test_kmv_exact_below_k(spark):
    """A group with fewer than k distinct values reports the exact count."""
    df = _ids_df(spark, 10)
    sk = sketches.kmv_estimate(
        sketches.kmv_topk(df, ["g"], "v"), ["g"]
    ).collect()[0]
    assert sk.n_in == 10
    assert sk.kmv_est == 10


def test_kmv_estimate_within_tolerance(spark):
    """KMV with k=16 has relative std ~1/sqrt(k-2) ≈ 27%; 2000 distinct
    values must estimate within a generous 3-sigma band."""
    df = _ids_df(spark, 2000)
    sk = sketches.kmv_estimate(
        sketches.kmv_topk(df, ["g"], "v"), ["g"]
    ).collect()[0]
    assert sk.n_in == sketches.KMV_K
    assert 2000 * 0.2 <= sk.kmv_est <= 2000 * 2.5


def test_kmv_merge_law(spark):
    """Sketch(A ∪ B) == merge(Sketch(A), Sketch(B)): union the retained
    hash sets, re-rank, keep k — identical to sketching the union."""
    a = _ids_df(spark, 500)
    b = spark.range(300, 900).select(
        F.lit(0).alias("g"), F.col("id").alias("v")
    )
    direct = sketches.kmv_estimate(
        sketches.kmv_topk(a.unionByName(b), ["g"], "v"), ["g"]
    ).collect()[0]
    ka = sketches.kmv_topk(a, ["g"], "v").select("g", "h")
    kb = sketches.kmv_topk(b, ["g"], "v").select("g", "h")
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h")
    merged_topk = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= sketches.KMV_K)
    )
    merged = sketches.kmv_estimate(merged_topk, ["g"]).collect()[0]
    assert direct.kth_hash == merged.kth_hash
    assert direct.kmv_est == merged.kmv_est
    assert direct.kmv_sig == merged.kmv_sig


@pytest.mark.parametrize("n,lo,hi", [(50, 35, 75), (3000, 2100, 4500)])
def test_hll_estimate_quality(spark, n, lo, hi):
    """m=64 HLL has relative std ~1.04/8 = 13%; both the small-range
    (linear-counting) and the raw regime must land in a 3-sigma band."""
    df = _ids_df(spark, n)
    est = sketches.hll_estimate(
        sketches.hll_registers(df, ["g"], "v"), ["g"]
    ).collect()[0]
    # pick whichever estimate the standard algorithm would use
    use_lin = est.lin_est > 0 and est.hll_est <= 2.5 * sketches.HLL_M
    val = est.lin_est if use_lin else est.hll_est
    assert lo <= val <= hi, (n, est)


def test_hll_merge_by_union_remax(spark):
    """Register frames from disjoint corpora merge via union + re-max and
    give the same registers as sketching the union directly."""
    a = _ids_df(spark, 400)
    b = spark.range(200, 700).select(
        F.lit(0).alias("g"), F.col("id").alias("v")
    )
    direct = sketches.hll_estimate(
        sketches.hll_registers(a.unionByName(b), ["g"], "v"), ["g"]
    ).collect()[0]
    ra = sketches.hll_registers(a, ["g"], "v")
    rb = sketches.hll_registers(b, ["g"], "v")
    remaxed = (
        ra.unionByName(rb).groupBy("g", "j").agg(F.max("reg").alias("reg"))
    )
    merged = sketches.hll_estimate(remaxed, ["g"]).collect()[0]
    assert direct.reg_sig == merged.reg_sig
    assert direct.hll_est == merged.hll_est


def test_countmin_never_underestimates(spark):
    """min-over-d-counters ≥ true count for every probed token, with
    equality when no collision — the CM guarantee."""
    rows = [("the",)] * 50 + [("a",)] * 20 + [(f"w{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "t string")
    cm = sketches.countmin_counters(df, "t")
    truth = df.groupBy("t").agg(F.count(F.lit(1)).alias("n_true"))
    est = sketches.countmin_lookup(cm, truth, "t")
    bad = est.filter(F.col("cm_est") < F.col("n_true")).count()
    assert bad == 0
    # the heavy hitter is estimated closely (width 64 vs 202 types)
    top = est.filter(F.col("t") == "the").collect()[0]
    assert 50 <= top.cm_est <= 50 + 30


def test_countmin_unseen_probe_reports_zero(spark):
    """A probe token absent from the stream must still come back, with
    the true d-way minimum: if any of its d cells is empty the estimate
    is 0 — not the min over only non-empty cells, and never dropped."""
    rows = [("x",)] * 5
    df = spark.createDataFrame(rows, "t string")
    cm = sketches.countmin_counters(df, "t")
    # one seen + several unseen probes; with only one distinct seen
    # token the counter table holds d cells, so almost every unseen
    # probe hits at least one empty cell
    probes = spark.createDataFrame(
        [("x",)] + [(f"unseen{i}",) for i in range(20)], "t string"
    )
    est = {r.t: r.cm_est for r in sketches.countmin_lookup(cm, probes, "t").collect()}
    assert len(est) == 21  # nothing dropped
    assert est["x"] == 5
    unseen = [v for k, v in est.items() if k != "x"]
    # every unseen token maps to >=1 empty cell here → exact zero
    assert all(v == 0 for v in unseen)


def test_hll_constants_are_dyadic_exact():
    """The pre-scaled numerator literals must be exactly representable so
    the SQL literal and the Spark literal are the same double."""
    assert sketches.KMV_NUM == (sketches.KMV_K - 1) * (1 << 60)
    assert float(repr(sketches.HLL_NUM)) == sketches.HLL_NUM


def test_kmv_theta_intersection_estimate(spark):
    """Theta-sketch intersection from two KMV sketches alone: on sets
    A = [0,600), B = [400,1000) (true ∩ = 200, ∪ = 1000) the estimate
    must land within a 3-sigma-ish band, and every union-sketch hash
    found in A's sketch must indeed be one of A's k smallest (the
    kth(U) ≤ kth(A) containment the estimator relies on)."""
    from pyspark.sql import Window

    a = spark.range(0, 600).select(
        F.lit(1).alias("g"), F.col("id").alias("v")
    )
    b = spark.range(400, 1000).select(
        F.lit(1).alias("g"), F.col("id").alias("v")
    )
    ta = sketches.kmv_topk(a, ["g"], "v").select("h")
    tb = sketches.kmv_topk(b, ["g"], "v").select("h")
    k = sketches.KMV_K
    w = Window.orderBy("h")
    tu = (
        ta.union(tb)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("h")
    )
    kth_u = tu.agg(F.max("h")).collect()[0][0]
    kth_a = ta.agg(F.max("h")).collect()[0][0]
    assert kth_u <= kth_a  # containment property
    union_est = sketches.kmv_estimate(
        tu.withColumn("g", F.lit(1)).withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("h"))
        ),
        ["g"],
    ).collect()[0]["kmv_est"]
    n_both = tu.join(ta, "h").join(tb, "h").count()
    inter_est = round(n_both * union_est / k)
    assert 300 <= union_est <= 2500
    assert 0 <= inter_est <= 620  # true 200; k=16 is a coarse sketch
