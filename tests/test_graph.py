"""Integer PageRank contracts: structure sensitivity, mass bounds,
determinism — the properties the t36 oracle (same-formula replay)
can't establish on its own."""

from pyspark.sql import functions as F

from openseizuredatabase_spark.operators.graph import integer_pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "u string, v string, w long")


def test_star_center_dominates(spark):
    """Symmetric star: every leaf sends its full rank to the hub, the
    hub splits its rank across leaves — hub rank must dominate every
    leaf and leaves must tie exactly (identical integer paths)."""
    leaves = [f"l{i}" for i in range(5)]
    rows = []
    for l in leaves:
        rows.append(("hub", l, 1))
        rows.append((l, "hub", 1))
    out = {
        r["node"]: r["rank_micro"]
        for r in integer_pagerank(_edges(spark, rows), iters=3).collect()
    }
    leaf_ranks = {out[l] for l in leaves}
    assert len(leaf_ranks) == 1
    assert out["hub"] > 3 * leaf_ranks.pop()


def test_rank_mass_bounded(spark):
    """Total rank stays within [n·base, n·scale·(1+eps)]: damping leaks
    only floor-division remainders (< 1 micro-unit per edge per round)."""
    rows = [
        ("a", "b", 2), ("b", "a", 2),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 3), ("a", "c", 3),
    ]
    out = integer_pagerank(_edges(spark, rows), iters=3).collect()
    total = sum(r["rank_micro"] for r in out)
    n = len(out)
    assert n == 3
    assert n * 150_000 <= total <= n * 1_000_000 + n


def test_pagerank_deterministic_across_runs(spark):
    rows = [("a", "b", 5), ("b", "a", 5), ("b", "c", 2), ("c", "b", 2)]
    r1 = sorted(map(tuple, integer_pagerank(_edges(spark, rows)).collect()))
    r2 = sorted(map(tuple, integer_pagerank(_edges(spark, rows)).collect()))
    assert r1 == r2


def test_heavier_edge_pulls_rank(spark):
    """b is linked by both a (weight 9) and c (weight 1): a keeps most
    of its outflow pointed at b vs c's split — b must outrank c and d."""
    rows = [
        ("a", "b", 9), ("b", "a", 9),
        ("a", "c", 1), ("c", "a", 1),
        ("c", "d", 1), ("d", "c", 1),
    ]
    out = {
        r["node"]: r["rank_micro"]
        for r in integer_pagerank(_edges(spark, rows), iters=3).collect()
    }
    assert out["b"] > out["c"]
    assert out["b"] > out["d"]


def test_hits_star_authority(spark):
    """A supplier bought by every customer must be the top authority;
    a customer buying from everyone must be the top hub."""
    from openseizuredatabase_spark.operators.graph import hits_scores

    # customers 1-3, suppliers 101-103; customer 1 buys everything,
    # supplier 101 is bought by everyone
    rows = [(1, 101, 1), (1, 102, 1), (1, 103, 1),
            (2, 101, 1), (3, 101, 1)]
    edges = spark.createDataFrame(rows, "u long, v long, w long")
    out = {(r.role, r.node): r.score_micro
           for r in hits_scores(edges, iters=2).collect()}
    auths = {n: s for (role, n), s in out.items() if role == "auth"}
    hubs = {n: s for (role, n), s in out.items() if role == "hub"}
    assert max(auths, key=auths.get) == 101
    assert max(hubs, key=hubs.get) == 1
    assert auths[101] == 1_000_000 and hubs[1] == 1_000_000  # max-norm
    # scores are deterministic integers
    out2 = {(r.role, r.node): r.score_micro
            for r in hits_scores(edges, iters=2).collect()}
    assert out == out2


def test_hits_weight_sensitivity(spark):
    """Doubling an edge weight must raise the target's authority
    relative to an otherwise-identical sibling."""
    from openseizuredatabase_spark.operators.graph import hits_scores

    rows = [(1, 101, 2), (1, 102, 1), (2, 101, 2), (2, 102, 1)]
    edges = spark.createDataFrame(rows, "u long, v long, w long")
    out = {(r.role, r.node): r.score_micro
           for r in hits_scores(edges, iters=2).collect()}
    assert out[("auth", 101)] > out[("auth", 102)]


def test_butterfly_count_matches_brute_force(spark):
    """j19's wedge-pair formula vs explicit 4-cycle enumeration on a
    small bipartite graph (parts x suppliers)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    edges = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 11), (3, 12),
        (4, 13),
    ]
    # brute force: suppliers pairs sharing >= 2 parts -> C(shared, 2)
    from collections import defaultdict
    parts_of = defaultdict(set)
    for p, s in edges:
        parts_of[s].add(p)
    expected = sum(
        len(parts_of[a] & parts_of[b]) * (len(parts_of[a] & parts_of[b]) - 1) // 2
        for a, b in combinations(sorted(parts_of), 2)
    )
    li = spark.createDataFrame(
        [(p, s) for p, s in edges] * 2,  # dup rows: the distinct() must collapse
        "l_partkey long, l_suppkey long",
    )
    e = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s"), F.col("b.s"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = pairs.agg(
        F.coalesce(F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0)).cast("long")
    ).first()[0]
    assert got == expected == 2  # {1,2}x{10,11} and {1,3}x{11,12}
