"""Local replica of the driver's correctness gate.

Runs each registry query on Spark and its oracle SQL on DuckDB over the
same parquet dir, then compares row count, column-name set, and an
order-insensitive BYTE-EXACT value comparison (columns sorted by name,
rows sorted).  Doubles compare by their IEEE-754 bytes — ``-0.0`` and
``+0.0`` are DIFFERENT (the round-6 e2 driver red: Spark's BigDecimal
``round`` normalizes a tiny negative to +0.0 where DuckDB keeps -0.0;
the two are ``==``-equal, so a tolerance compare is blind to the byte
hash the driver actually uses).  Array/list cells are a hard FAIL: the
driver's canonicalizer pandas-sorts over all columns and crashes on
unhashable list cells (the round-6 e3 driver red).

Usage:  python -m openseizuredatabase_spark.plans.oracle_check [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time

import duckdb


class ArrayCellError(ValueError):
    """An output cell is a list/array — the driver canonicalizer crashes
    on these (pandas sort_values: unhashable type 'list')."""


def _duckdb_conn(sf_dir: str):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f64", "NaN")
        # IEEE-754 bytes: type-sensitive AND signed-zero-sensitive,
        # exactly like the driver's value hash (-0.0 != +0.0 here).
        return ("f64", struct.pack(">d", v).hex())
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        raise ArrayCellError(
            "array-typed output cell — the driver canonicalizer crashes "
            "on list cells; encode as concat_ws of micro-ints or explode "
            "to scalar rows"
        )
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def _rows_match(a, b) -> bool:
    """Byte-exact, type-sensitive row compare (driver-faithful)."""
    return a == b


def compare_query(spark, con, spec, sf_dir: str) -> tuple[bool, str]:
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(_norm_cell(row[c]) for c in spark_cols) for row in sdf.collect()
    ]
    if spec.oracle is None:
        return True, f"rows-only ({len(spark_rows)} rows)"
    # The driver's value hash is type-sensitive: DuckDB types integer
    # sum()/list_sum() as HUGEINT (int128), which hash-mismatches Spark's
    # BIGINT even when every value is identical. Python-int normalization
    # below can't see that, so reject int128 oracle outputs explicitly.
    rel = con.sql(spec.oracle)
    int128 = [
        c
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in ("HUGEINT", "UHUGEINT", "INT128", "UINT128")
    ]
    if int128:
        return False, (
            f"oracle emits int128 columns {int128} — add ::BIGINT "
            "(driver hash distinguishes HUGEINT from Spark long)"
        )
    cur = con.execute(spec.oracle)
    raw_cols = [d[0] for d in cur.description]
    raw_rows = cur.fetchall()  # fetchall, NOT fetch_df: pandas turns NULL→NaN
    duck_cols = sorted(raw_cols)
    if spark_cols != duck_cols:
        return False, f"schema mismatch: spark={spark_cols} duck={duck_cols}"
    order = [raw_cols.index(c) for c in duck_cols]
    duck_rows = [
        tuple(_norm_cell(row[i]) for i in order) for row in raw_rows
    ]
    if len(spark_rows) != len(duck_rows):
        return False, f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    spark_rows.sort(key=_sort_key)
    duck_rows.sort(key=_sort_key)
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        if not _rows_match(a, b):
            return False, f"row {i} differs:\n  spark={a}\n  duck ={b}"
    return True, f"match ({len(spark_rows)} rows)"


def main(argv):
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    only = set(argv[2:])
    from openseizuredatabase_spark.plans.registry import QUERIES
    from openseizuredatabase_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = _duckdb_conn(sf_dir)
    failures = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ok, msg = compare_query(spark, con, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.1f}s  {msg}")
        if not ok:
            failures += 1
    print(f"\n{failures} failures / {len(only or QUERIES)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
