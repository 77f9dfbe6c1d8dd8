"""Adaptive-branch differential check for the production oracles.

Round 6 gave the data-adaptive production entries (v18_pq_sampled_train,
v19_hier_assign_scaled, t24_semdedup_scaled) full value-hash oracles by
replaying the parameter derivation IN SQL — k/g/sample-rate computed
from count(*), the SQL twin of the parquet-footer row count the Spark
side reads via table_meta.

The driver's tables hold only 500 embeddings, where that logic
degenerates (k=8, keep-everything sample).  This test runs the same
Spark-vs-DuckDB comparison on a synthetic 8000-vector corpus where the
adaptive branches actually bite: k = 8000//625 = 12 (> the 8-seed
floor), and the training samples thin to fpm=250 (v18) / fpm=625 (v19)
per-mille — so the sampled-Lloyd CTEs are exercised against a genuinely
proper subset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import duckdb

from openseizuredatabase_spark.plans.oracle_check import compare_query
from openseizuredatabase_spark.plans.registry import QUERIES

N = 8000
DIM = 64


@pytest.fixture(scope="module")
def adaptive_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adaptive_sf")
    rng = np.random.default_rng(20260815)
    mat = rng.uniform(-1.0, 1.0, size=(N, DIM)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N, dtype=np.int64)),
            "embedding": pa.array(
                list(mat), type=pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(adaptive_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adaptive_dir}/embeddings.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "name", ["v18_pq_sampled_train", "v19_hier_assign_scaled"]
)
def test_adaptive_oracle_matches_at_8k(spark, duck, adaptive_dir, name):
    ok, msg = compare_query(spark, duck, QUERIES[name], adaptive_dir)
    assert ok, f"{name} at n={N}: {msg}"


def test_adaptive_parameters_actually_adapt(duck):
    # guard: at n=8000 the branches must leave their 500-row defaults,
    # otherwise this file tests nothing beyond the sweep
    k, g, fpm = duck.execute(
        "SELECT greatest(8, count(*) // 625),"
        "       greatest(3, floor(sqrt(greatest(8, count(*) // 625)"
        "::DOUBLE))::BIGINT),"
        "       greatest(1, 5000000 // count(*)) FROM embeddings"
    ).fetchone()
    assert (k, g) == (12, 3)
    assert fpm == 625 < 1000
