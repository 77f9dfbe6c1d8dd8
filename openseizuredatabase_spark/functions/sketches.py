"""Mergeable cardinality / frequency sketches with cross-engine-exact
semantics (KMV distinct, deterministic HLL, Count-Min).

Why this module exists: the reference counts distincts and frequencies
exactly — pandas ``nunique`` / ``value_counts`` over the whole DB in one
process (``osdb/osdbUtils.py`` summary paths, ``dataSummariser``'s
per-category tallies). At 100 TB an exact distinct is a full shuffle of
every key and an exact frequency table is O(n_types) state; the standard
engine answer is a bounded-state sketch that merges associatively so
partial aggregation (map-side combine) applies and per-group state is a
constant number of integers.

Every sketch here is DETERMINISTIC and engine-portable: built only on
``functions/hashing.md5_long`` (md5 → 60-bit int, identical in Spark and
DuckDB), integer register arithmetic (shifts, masks, max, integer sums)
and single correctly-rounded IEEE divisions. A DuckDB oracle therefore
replays the *identical* sketch and the value-hash check pins the
estimator itself — contrast ``a15_approx_distinct``, which can only
assert Spark's native HLL++ lands within a 5 % band because the two
engines' native sketches differ.

Scale design notes (100 TB):

* KMV: per group only the k smallest distinct hashes survive; the
  ``distinct`` is one shuffle, the per-group top-k is a sort-based
  window (spillable, never collects a group into memory). For
  incremental maintenance, screen new rows with ``h < kth`` from the
  previous epoch — the threshold only shrinks, so the screen is a
  pushed-down scan predicate.
* HLL: register state is m integers per group regardless of input
  size; ``max`` per (group, register) is a partial aggregate, so the
  map side combines before the single shuffle. Register frames from
  disjoint corpora union + re-max to merge — the lake-wide rollup
  pattern.
* Count-Min: global state is d×w counters however many token types
  exist; heavy-hitter probes broadcast the counter table. The estimate
  upper-bounds the true count (only hash collisions inflate it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openseizuredatabase_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
    seeded_md5_long,
)

# ---------------------------------------------------------------- KMV ---
KMV_K = 16
# (k-1) * 2^60: mantissa 15 → exactly representable as a double, so the
# same literal in Spark and DuckDB yields bit-identical divisions.
KMV_NUM = float((KMV_K - 1) * (1 << 60))

# ---------------------------------------------------------------- HLL ---
HLL_M = 64  # 6 index bits
HLL_WIDTH = 54  # 60-bit md5_long hash minus 6 index bits
# rho(w) = leading zeros of the 54-bit suffix + 1  ∈ [1, 55]
HLL_RHO_MAX = HLL_WIDTH + 1
# alpha_m * m^2 * 2^55, the numerator of the raw estimate pre-scaled so
# the register sum can stay an exact BIGINT (sum of 2^(55-reg) terms,
# ≤ 64·2^55 = 2^61). Multiplying a float by a power of two is exact, so
# this Python literal is the same double both engines multiply with.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_MAX)

# ----------------------------------------------------------- Count-Min ---
CM_DEPTH = 4
CM_WIDTH = 64


def _str(col: Column) -> Column:
    return col.cast("string")


# ------------------------------------------------------------------ KMV


def kmv_topk(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group k smallest distinct hashes of ``value_col``.

    One distinct shuffle + one sort-based window; only k rows per group
    survive. Columns: group_cols + (h, rn).
    """
    h = md5_long(_str(F.col(value_col))).alias("h")
    d = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def kmv_estimate(
    topk: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Collapse a :func:`kmv_topk` frame to per-group sketch outputs.

    n_in < k means the sketch saw every distinct value and the estimate
    IS the exact count; otherwise est = (k-1)·2^60 / h_(k) (hashes are
    uniform on [0, 2^60)). ``kmv_sig`` is an order-free integer
    signature of the retained hash set.
    """
    num = float((k - 1) * (1 << 60))
    g = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_in"),
        F.max("h").alias("kth"),
        F.sum(F.col("h") % 1000003).alias("kmv_sig"),
    )
    est = F.when(F.col("n_in") < k, F.col("n_in")).otherwise(
        F.round(F.lit(num) / F.col("kth").cast("double"), 0).cast("long")
    )
    return g.select(
        *group_cols,
        "n_in",
        F.col("kth").alias("kth_hash"),
        F.col("kmv_sig").cast("long").alias("kmv_sig"),
        est.alias("kmv_est"),
    )


# ------------------------------------------------------------------ HLL


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-(group, register) max-rho frame — the mergeable HLL state.

    j = h & 63 picks the register; rho = leading zeros of the remaining
    54 bits + 1 (via the portable minimal-binary-string length, which
    Spark ``bin`` and DuckDB ``bin`` render identically). ``max`` makes
    this a partial aggregate: the map side combines before the shuffle,
    and register frames from disjoint corpora merge by union + re-max.
    """
    h = md5_long(_str(F.col(value_col)))
    j = h.bitwiseAND(F.lit(63)).alias("j")
    w = F.shiftright(h, 6)
    rho = (
        F.when(w == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.bin(w)))
        .alias("rho")
    )
    return (
        df.select(*group_cols, j, rho)
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a register frame to per-group estimates, all-integer
    until one IEEE division.

    S = Σ_j 2^(−reg_j) is computed as the exact BIGINT Σ 2^(55−reg_j)
    (absent registers contribute 2^55), so summation order cannot move a
    ulp; the raw estimate is the single division HLL_NUM / S. The
    standard small-range linear-counting correction (m·ln(m/V) when V>0
    and raw ≤ 2.5m) involves a libm ``ln`` → emitted rounded to 6 dp,
    −1.0 sentinel when V = 0.
    """
    term = F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - reg)")
    g = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(term).alias("s_present"),
        F.sum(F.col("reg") * (F.lit(7) + F.col("j") * F.col("j"))).alias(
            "reg_sig"
        ),
    )
    empty = (F.lit(HLL_M) - F.col("n_regs")).cast("long")
    s_int = (
        F.col("s_present") + empty * F.lit(1 << HLL_RHO_MAX).cast("long")
    ).cast("long")
    raw = F.lit(HLL_NUM) / s_int.cast("double")
    lin = F.when(F.col("n_regs") == HLL_M, F.lit(-1.0)).otherwise(
        F.round(F.log(F.lit(float(HLL_M)) / empty.cast("double")) * HLL_M, 6)
    )
    return g.select(
        *group_cols,
        "n_regs",
        F.col("reg_sig").cast("long").alias("reg_sig"),
        F.round(raw, 0).cast("long").alias("hll_est"),
        lin.alias("lin_est"),
    )


def hll_oracle_ctes(source_sql: str, group_expr: str, value_expr: str) -> str:
    """DuckDB CTE chain replaying :func:`hll_registers` +
    :func:`hll_estimate` bit-for-bit (shared by the a17 oracle and
    tests)."""
    h = md5_long_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
    hashed AS (
        SELECT {group_expr} AS g, {h} AS h FROM {source_sql}
    ), split AS (
        SELECT g, h & 63 AS j, h >> 6 AS w FROM hashed
    ), rhos AS (
        SELECT g, j,
               CASE WHEN w = 0 THEN {HLL_RHO_MAX}
                    ELSE {HLL_RHO_MAX} - length(bin(w)) END AS rho
        FROM split
    ), regs AS (
        SELECT g, j, max(rho) AS reg FROM rhos GROUP BY g, j
    ), hagg AS (
        SELECT g, count(*) AS n_regs,
               sum(1::BIGINT << ({HLL_RHO_MAX} - reg))::BIGINT AS s_present,
               sum(reg * (7 + j * j))::BIGINT AS reg_sig
        FROM regs GROUP BY g
    ), hll AS (
        SELECT g, n_regs, reg_sig,
               CAST(round({HLL_NUM!r} /
                    (s_present + (64 - n_regs) * (1::BIGINT << {HLL_RHO_MAX}))
                    ::DOUBLE, 0) AS BIGINT) AS hll_est,
               CASE WHEN n_regs = 64 THEN -1.0
                    ELSE round(ln(64.0 / (64 - n_regs)) * 64, 6)
               END AS lin_est
        FROM hagg
    )"""


# ------------------------------------------------------------- Count-Min


def countmin_counters(
    tok_df: DataFrame,
    token_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the d×w Count-Min counter table from a token frame.

    Each row contributes one increment per hash row: explode d (seed,
    bucket) structs, one groupBy — state is depth·width counters total,
    independent of the number of token types.
    """
    tok = F.col(token_col)
    arr = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                (seeded_md5_long(tok, s) % width).alias("bucket"),
            )
            for s in range(depth)
        ]
    )
    e = tok_df.select(F.explode(arr).alias("sb"))
    return e.groupBy(
        F.col("sb.s").alias("s"), F.col("sb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def countmin_lookup(
    counters: DataFrame,
    probe_df: DataFrame,
    token_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-estimate each probe token: min over the d counters it maps
    to. Counters (d·w rows) broadcast; probes keep their other columns.

    Counters are LEFT-joined and missing cells coalesced to 0: the CM
    estimate is the min over ALL d cells, so a probe token with any
    empty cell reports that 0 (an inner join would take the min over
    only the non-empty cells — inflating the estimate past the true CM
    minimum — and would drop a token mapping to all-empty cells from
    the output entirely instead of reporting cm_est=0).
    """
    tok = F.col(token_col)
    arr = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                (seeded_md5_long(tok, s) % width).alias("bucket"),
            )
            for s in range(depth)
        ]
    )
    probed = probe_df.withColumn("sb", F.explode(arr)).select(
        *probe_df.columns, F.col("sb.s").alias("s"),
        F.col("sb.bucket").alias("bucket")
    )
    joined = probed.join(F.broadcast(counters), ["s", "bucket"], "left")
    return joined.groupBy(*probe_df.columns).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("cm_est")
    )
