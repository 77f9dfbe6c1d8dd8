"""Oracle SQL type hygiene.

The driver compares Spark and DuckDB results with a type-sensitive value
hash.  DuckDB types integer ``sum()`` / ``list_sum()`` as HUGEINT
(int128), so any oracle that lets one reach its output projection
hash-fails against Spark's BIGINT even when every value is identical
(round-1 driver failures a8/t1/m1/a9 all shared this mechanism).

This lint binds every oracle against the sf0.001 views (bind only — no
execution, so it runs in milliseconds) and asserts the projected types
are Spark-representable.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from openseizuredatabase_spark.plans.registry import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

FORBIDDEN = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            c.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return c


@pytest.mark.parametrize(
    "name", [n for n, s in QUERIES.items() if s.oracle is not None]
)
def test_oracle_has_no_int128_outputs(con, name):
    rel = con.sql(QUERIES[name].oracle)
    bad = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in FORBIDDEN
    ]
    assert not bad, (
        f"{name}: oracle projects int128 columns {bad}; append ::BIGINT — "
        "the driver's hash distinguishes HUGEINT from Spark long even when "
        "values are equal"
    )


@pytest.mark.parametrize(
    "name", [n for n, s in QUERIES.items() if s.oracle is not None]
)
def test_oracle_has_no_array_outputs(con, name):
    """The driver's canonicalizer pandas-sorts result rows over ALL
    columns; a LIST/STRUCT/MAP cell is unhashable and crashes the check
    (round-6 e3 driver red).  Encode arrays as concat_ws of micro-int
    strings or explode to scalar rows — in BOTH engines."""
    rel = con.sql(QUERIES[name].oracle)
    bad = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if "[]" in str(t)
        or str(t).upper().startswith(("LIST", "STRUCT", "MAP", "ARRAY"))
    ]
    assert not bad, (
        f"{name}: oracle projects nested columns {bad}; the driver "
        "canonicalizer crashes on list cells (unhashable type) — project "
        "a scalar encoding instead"
    )


@pytest.mark.parametrize(
    "name", [n for n, s in QUERIES.items() if s.oracle is not None]
)
def test_oracle_has_no_decimal_outputs(con, name):
    """DuckDB types bare numeric literals (0.5, CASE ... 5.0) as
    DECIMAL; the value crosses to Python as decimal.Decimal, which is
    ==-equal to Spark's float but type-distinct under the driver's
    byte hash (round-7 audit finds: a27 epsilon, m10 sample_weight).
    Cast ``::DOUBLE`` at the projection."""
    rel = con.sql(QUERIES[name].oracle)
    bad = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper().startswith("DECIMAL")
    ]
    assert not bad, (
        f"{name}: oracle projects DECIMAL columns {bad}; append ::DOUBLE "
        "— Decimal hash-mismatches Spark's double even when values are "
        "equal"
    )
