"""Portable deterministic hashing (engine-independent).

Spark's ``hash()`` is murmur3 and DuckDB's ``hash()`` is its own — neither
matches the other, so every hash that must be oracle-checkable (minhash,
LSH bucketing, fold assignment, fingerprints) is built from ``md5`` which
both engines implement identically: take the first 15 hex digits (60 bits,
fits a signed 64-bit int) and parse as an integer.

Spark side:   conv(substr(md5(s),1,15),16,10) cast to bigint
DuckDB side:  ('0x' || substr(md5(s),1,15))::bigint
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime < 2^61 used for affine re-hashing h_j(x) = (a_j*x + b_j) mod P.
MERSENNE_P = (1 << 61) - 1


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string column (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`md5_long` for oracle parity."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint)"


def seeded_md5_long(col: Column, seed: int) -> Column:
    """Family of independent portable hash functions h_seed(s)."""
    return md5_long(F.concat_ws(":", F.lit(str(seed)), col))


def seeded_md5_long_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'{seed}' || ':' || {expr}")
