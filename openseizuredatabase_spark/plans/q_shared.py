"""Helpers shared by more than one query-family module."""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openseizuredatabase_spark.operators import aggregates as agg_ops
from openseizuredatabase_spark.operators import dedup as dedup_ops
from openseizuredatabase_spark.operators import filters as filter_ops
from openseizuredatabase_spark.operators import joins as join_ops
from openseizuredatabase_spark.operators import splits as split_ops
from openseizuredatabase_spark.operators import windows as window_ops
from openseizuredatabase_spark.functions import text as text_fns
from openseizuredatabase_spark.functions.text import bpe_token_count_sql
from openseizuredatabase_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
    seeded_md5_long,
    seeded_md5_long_sql,
)
from openseizuredatabase_spark.sources.lake import morton_sql
from openseizuredatabase_spark.sources import tables
from openseizuredatabase_spark.sources.tables import (
    load_table,
    spread_small_scan,
    table_meta,
)

from openseizuredatabase_spark.plans._core import (  # noqa: F401
    QUERIES,
    QuerySpec,
    query,
    _t,
    _ts,
)



# ---------------------------------------------------------------------------
# Similarity search over `embeddings` (ANN building blocks)
# ---------------------------------------------------------------------------
#
# Cross-engine float discipline: dot products are accumulated as EXACT
# integers — each term is round(a_i*b_i*1e6)::bigint (the double product of
# two float32s is bit-identical in any IEEE engine; rounding it to a
# micro-unit integer makes the SUM order-independent). The final similarity
# is one double division + sqrt on identical integers → bit-identical.

_EMB_DIM = 64


def _quantized_dot(a, b):
    """Spark: sum_i round(a_i*b_i*1e6) as bigint — order-independent."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.round(x * y * 1e6, 0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_N3_P = "1.0 / (1.0 + exp(-((value - 150) / 25.0)))"


def _v5_ctes() -> str:
    d = _EMB_DIM
    floor_div = "((s - (((s % n) + n) % n)) / n)::BIGINT"
    return f"""
    WITH q AS (
        SELECT vec_id, g.i - 1 AS dim,
               round(embedding[g.i]::DOUBLE * 1000)::BIGINT AS v
        FROM embeddings, unnest(generate_series(1, {d})) AS g(i)
    ), c0 AS (
        SELECT vec_id AS cid, dim, v AS c FROM q WHERE vec_id BETWEEN 1 AND 8
    ), d1 AS (
        SELECT q.vec_id, c.cid, sum((q.v - c.c) * (q.v - c.c)) AS dist
        FROM q JOIN c0 c USING (dim) GROUP BY q.vec_id, c.cid
    ), a1 AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d1) WHERE rn = 1
    ), s1 AS (
        SELECT a.cid, q.dim, sum(q.v) AS s, count(*) AS n
        FROM q JOIN a1 a ON q.vec_id = a.vec_id GROUP BY a.cid, q.dim
    ), c1 AS (
        SELECT cid, dim, {floor_div} AS c FROM s1
    ), d2 AS (
        SELECT q.vec_id, c.cid, sum((q.v - c.c) * (q.v - c.c)) AS dist
        FROM q JOIN c1 c USING (dim) GROUP BY q.vec_id, c.cid
    ), a2 AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d2) WHERE rn = 1
    ), s2 AS (
        SELECT a.cid, q.dim, sum(q.v) AS s, count(*) AS n
        FROM q JOIN a2 a ON q.vec_id = a.vec_id GROUP BY a.cid, q.dim
    ), c2 AS (
        SELECT cid, dim, {floor_div} AS c FROM s2
    )"""


def _ham18_sql(a: str, b: str) -> str:
    """Hamming distance over 18 fixed positions as an explicit integer
    sum (portable — no reliance on an engine hamming builtin)."""
    return (
        "("
        + " + ".join(
            f"(CASE WHEN substr({a}, {p}, 1) <> substr({b}, {p}, 1)"
            " THEN 1 ELSE 0 END)"
            for p in range(1, 19)
        )
        + ")"
    )


def _ham18(a: F.Column, b: F.Column) -> F.Column:
    out = F.lit(0)
    for p in range(1, 19):
        out = out + F.when(
            F.substring(a, p, 1) != F.substring(b, p, 1), 1
        ).otherwise(0)
    return out


def _pigeonhole_keys_sql(src: str) -> str:
    """Interleaved digit-class blocking keys over the 9-digit payload of
    the fixed-format c_name (positions 10-18): class k holds positions
    {10+k, 13+k, 16+k}. Hamming <= 2 touches <= 2 of the 3 classes, so
    every qualifying pair shares at least one untouched class — the
    pigeonhole/PassJoin candidate rule. Interleaving (not contiguous
    3-digit segments) matters: sequential ids keep HIGH digits constant,
    so contiguous segments collapse into a few hot blocks, while every
    interleaved class contains one of the fastest-varying low digits."""
    return f"""
        SELECT id, name, blk, g.i AS cls,
               concat(substr(name, 10 + g.i, 1),
                      substr(name, 13 + g.i, 1),
                      substr(name, 16 + g.i, 1)) AS val
        FROM {src}, unnest(generate_series(0, 2)) AS g(i)
    """


def _pigeonhole_keys(c: DataFrame) -> DataFrame:
    rows = []
    for k in range(3):
        rows.append(
            c.select(
                "id",
                "name",
                "blk",
                F.lit(k).alias("cls"),
                F.concat(
                    F.substring("name", 10 + k, 1),
                    F.substring("name", 13 + k, 1),
                    F.substring("name", 16 + k, 1),
                ).alias("val"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _ham_candidates(c: DataFrame, max_dist: int) -> DataFrame:
    """Distinct (id_a, id_b, dist) pairs with hamming <= max_dist via
    pigeonhole blocking — never the O(block²) nation join."""
    k = _pigeonhole_keys(c)
    ka, kb = k.alias("ka"), k.alias("kb")
    cand = (
        ka.join(
            kb,
            (F.col("ka.blk") == F.col("kb.blk"))
            & (F.col("ka.cls") == F.col("kb.cls"))
            & (F.col("ka.val") == F.col("kb.val"))
            & (F.col("ka.id") < F.col("kb.id")),
        )
        .select(
            F.col("ka.id").alias("id_a"),
            F.col("kb.id").alias("id_b"),
            F.col("ka.name").alias("name_a"),
            F.col("kb.name").alias("name_b"),
        )
        .distinct()
    )
    dist = _ham18(F.col("name_a"), F.col("name_b"))
    return cand.select(
        "id_a", "id_b", dist.cast("long").alias("dist")
    ).filter(F.col("dist") <= max_dist)


def _reps_sql() -> str:
    """Exact-duplicate collapse: identical (block, name) records group
    under their min-id representative BEFORE any fuzzy work — the
    fuzzy stage's cost then depends on DISTINCT entities, not records
    (clone-heavy data otherwise forces R² genuine zero-distance pairs
    through the verifier)."""
    return """
        SELECT blk, name, min(id) AS id, count(*)::BIGINT AS grp_n
        FROM c GROUP BY blk, name
    """
