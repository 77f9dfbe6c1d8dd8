"""Embedding-vector operators (similarity search building blocks).

All math is done JVM-side with higher-order array functions
(``zip_with`` / ``aggregate`` / ``transform``) in double precision, so the
brute-force path is whole-stage-codegen'd and needs no Python. The LSH
path derives its hyperplanes deterministically from md5 so the oracle can
reproduce them bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (fold left, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(a: Column) -> Column:
    return a.cast("array<double>")


def hyperplane(seed: int, j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Component i of plane j = (md5("{seed}:{j}:{i}") first 15 hex digits as
    int mod 2000)/1000 - 1. Matches the SQL rendering used by the oracle.
    """
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
        v = int(h[:15], 16) % 2000
        out.append(v / 1000.0 - 1.0)
    return out


def lsh_bit(vec: Column, plane: list[float]) -> Column:
    """Sign bit of <vec, plane> (random-hyperplane LSH)."""
    return (dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0).cast("int")


def lsh_bucket(vec: Column, seed: int, n_bits: int, dim: int) -> Column:
    """n_bits-bit LSH bucket id (0 .. 2^n_bits-1)."""
    acc = F.lit(0)
    for j in range(n_bits):
        acc = acc * 2 + lsh_bit(vec, hyperplane(seed, j, dim))
    return acc


def hyperplane_sql_terms(seed: int, j: int, dim: int, vec_expr: str) -> str:
    """DuckDB SQL: dot(vec, plane_j) as an explicit sum of dim terms."""
    comps = hyperplane(seed, j, dim)
    terms = " + ".join(
        f"({vec_expr}[{i + 1}]::DOUBLE * ({c!r}))" for i, c in enumerate(comps)
    )
    return f"({terms})"
