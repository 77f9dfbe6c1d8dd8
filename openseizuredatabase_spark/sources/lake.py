"""Canonical lake layout — the physical design that makes every operator
in this engine work at 100 TB.

The reference stores per-category JSON array files read whole into memory
(osdDbConnection.py:92-126). The lake equivalent:

* ``events`` partitioned by (category, event_date): partition pruning
  serves F3/F4/F6 (category + date-range predicates) without touching
  irrelevant files; each partition's files are sorted by (userId,
  eventTimestamp) so per-user time-ordered stages (D1/D2, W3-W7,
  detection replay) read nearly-clustered data.
* file sizing via ``maxRecordsPerFile`` — many ~128 MB-class files per
  partition, not one giant file: 1000 executors need parallel splits.
* optional bucketing by the dominant join/group key (userId) via
  ``bucketBy`` when a metastore is available (saveAsTable) — co-locates
  D1/D2/W* shuffles into bucket-local work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def category_of(type_col: str = "type") -> F.Column:
    """Reference category routing (tidy_db.py:23-29 file list)."""
    t = F.lower(F.coalesce(F.col(type_col), F.lit("")))
    return (
        F.when(t == "seizure", "allSeizures")
        .when(t == "false alarm", "falseAlarms")
        .when(t == "fall", "fallEvents")
        .when(t == "nda", "ndaEvents")
        .otherwise("unknownEvents")
    )


def write_events_lake(
    events: DataFrame,
    path: str,
    ts_col: str = "eventTimestamp",
    max_records_per_file: int = 500_000,
    mode: str = "overwrite",
) -> None:
    """Write the canonical partitioned events table."""
    out = (
        events.withColumn("category", category_of())
        .withColumn("event_date", F.to_date(F.col(ts_col)))
        .repartition("category", "event_date")
        .sortWithinPartitions("userId", ts_col)
    )
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("category", "event_date")
        .parquet(path)
    )


def read_events_lake(
    spark: SparkSession,
    path: str,
    categories: list[str] | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """Read with partition pruning: category/date predicates resolve at
    the file listing, never scanning excluded partitions."""
    df = spark.read.parquet(path)
    if categories:
        df = df.filter(F.col("category").isin(categories))
    if date_from:
        df = df.filter(F.col("event_date") >= F.lit(date_from))
    if date_to:
        df = df.filter(F.col("event_date") <= F.lit(date_to))
    return df


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "userId",
    n_buckets: int = 256,
) -> None:
    """Bucketed variant (needs a metastore): joins/aggregations on
    ``bucket_col`` become shuffle-free bucket-local work."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def morton_key(x: F.Column, y: F.Column, bits: int = 16) -> F.Column:
    """Z-order (Morton) key: bit-interleave two pre-quantized non-negative
    ints < 2^bits into one long.

    Sorting/range-partitioning the lake by this key clusters BOTH
    dimensions at once, so per-file min/max footer stats prune scans
    with predicates on either column — the multi-column layout trick
    (Delta/Iceberg OPTIMIZE ZORDER) for when one partition key isn't
    enough at 100 TB. Pure bitwise built-ins: codegen'd, no UDF.
    """
    key = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftleft(
            F.shiftrightunsigned(x.cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i,
        )
        yb = F.shiftleft(
            F.shiftrightunsigned(y.cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
        key = key.bitwiseOR(xb).bitwiseOR(yb)
    return key


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """ANSI-SQL rendering of morton_key (oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def hilbert_frame(
    df: DataFrame,
    x: F.Column,
    y: F.Column,
    out_col: str = "hkey",
    bits: int = 8,
) -> DataFrame:
    """Append a Hilbert key column
    for two pre-quantized non-negative ints < 2^bits: unlike Morton's,
    CONSECUTIVE key values are always grid-adjacent (verified bijective
    + unit-step on the full 256x256 grid), so range-partitioning by it
    yields strictly tighter per-file min/max boxes than z-order — the
    layout liquid clustering moved to. One named projection chains per
    xy2d round (within-subsquare s-1-x flip variant), keeping the
    Catalyst tree linear in ``bits`` — an inline Column unrolling is
    exponential because every round substitutes the previous round's x
    AND y twice. Integer CASE/shift built-ins only: codegen'd, no UDF."""
    cur = df.select("*", x.cast("long").alias("__hx"),
                    y.cast("long").alias("__hy"),
                    F.lit(0).cast("long").alias("__hd"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftrightunsigned(F.col("__hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftrightunsigned(F.col("__hy"), i).bitwiseAND(F.lit(1))
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when(rx == 0, 1)
            .when(ry == 0, 3)
            .otherwise(2)
        )
        others = [c for c in cur.columns if c not in ("__hx", "__hy", "__hd")]
        cur = cur.select(
            *others,
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(s - 1) - F.col("__hy")).otherwise(
                    F.col("__hy")
                ),
            )
            .otherwise(F.col("__hx"))
            .alias("__hx"),
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(s - 1) - F.col("__hx")).otherwise(
                    F.col("__hx")
                ),
            )
            .otherwise(F.col("__hy"))
            .alias("__hy"),
            (F.col("__hd") + F.lit(s * s).cast("long") * quad).alias(
                "__hd"
            ),
        )
    keep = [c for c in cur.columns if c not in ("__hx", "__hy", "__hd")]
    return cur.select(*keep, F.col("__hd").alias(out_col))


def hilbert_sql(x: str, y: str, bits: int = 8) -> str:
    """DuckDB CTE-chain rendering of :func:`hilbert_frame`. Returns the
    text of chained CTE bodies ``h0 .. h{bits}`` mapping input columns
    ``{x}``/``{y}`` (plus carried pass-through ``keep_cols``) to a
    final ``d{bits}`` — each round gets distinctly-named columns so
    DuckDB's lateral alias resolution can never bind a self-reference."""
    rounds = []
    rounds.append(
        f"h0 AS (SELECT *, {x} AS x0, {y} AS y0, 0 AS d0 FROM hq)"
    )
    for r, i in enumerate(range(bits - 1, -1, -1), start=1):
        s = 1 << i
        p = r - 1
        rx = f"((x{p} >> {i}) & 1)"
        ry = f"((y{p} >> {i}) & 1)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END)"
        )
        nx = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - y{p} ELSE y{p} END) ELSE x{p} END)"
        )
        ny = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - x{p} ELSE x{p} END) ELSE y{p} END)"
        )
        rounds.append(
            f"h{r} AS (SELECT *, {nx} AS x{r}, {ny} AS y{r},"
            f" d{p} + {s * s} * {quad} AS d{r} FROM h{p})"
        )
    return ",\n    ".join(rounds)


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` z-ordered on two pre-quantized int columns.

    repartitionByRange on the Morton key gives each output file a
    contiguous key range (a small 2-D tile), sortWithinPartitions keeps
    row groups tight inside the file, and the key itself is dropped —
    the layout, not an extra column, carries the locality.
    """
    keyed = df.withColumn(
        "__z", morton_key(F.col(x_col), F.col(y_col), bits)
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_events_lake(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    ts_col: str = "eventTimestamp",
    categories: list[str] | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
) -> dict:
    """Small-file compaction — the maintenance pass an append-heavy lake
    (streaming sink, S6 batched appends, curator edits) needs to keep
    scans fast at scale: many tiny parquet files turn a 100 TB scan into
    a file-listing + task-scheduling bottleneck.

    Scope-prunes to the selected partitions, sizes the rewrite from the
    REAL input bytes (file status, not a row-count guess), rewrites with
    one shuffle into ceil(bytes/target) tasks sorted back to the
    canonical (userId, ts) order, then atomically swaps the affected
    partition directories via the Hadoop FileSystem API (rename on
    HDFS/local; object stores pay a copy — run from a job with
    committer support there). Returns before/after file counts + bytes.
    """
    import math
    from urllib.parse import urlparse

    df = read_events_lake(spark, path, categories, date_from, date_to)
    # NOT df.inputFiles(): that lists the whole FileIndex ignoring the
    # partition filters; input_file_name() over the pruned scan returns
    # exactly the in-scope files (bounded driver list — maintenance op)
    files = [
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    ]
    if not files:
        return {"files_before": 0, "files_after": 0, "bytes": 0}

    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()

    def _fs_path(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = _fs_path(path).getFileSystem(conf)
    total = sum(fs.getFileStatus(_fs_path(f)).getLen() for f in files)
    n_tasks = max(1, math.ceil(total / target_file_bytes))

    tmp = path.rstrip("/") + "__compacting"
    (
        df.repartition(n_tasks, "category", "event_date")
        .sortWithinPartitions("userId", ts_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 10_000_000)
        .partitionBy("category", "event_date")
        .parquet(tmp)
    )

    # swap only the partition directories the rewrite produced —
    # untouched partitions keep their files byte-for-byte
    partition_dirs = set()
    for f in files:
        rel = urlparse(f).path
        parts = [seg for seg in rel.split("/") if "=" in seg][-2:]
        if len(parts) == 2:
            partition_dirs.add("/".join(parts))
    for pdir in sorted(partition_dirs):
        src = _fs_path(f"{tmp}/{pdir}")
        dst = _fs_path(f"{path.rstrip('/')}/{pdir}")
        if fs.exists(src):
            fs.delete(dst, True)
            fs.mkdirs(dst.getParent())
            fs.rename(src, dst)
    fs.delete(_fs_path(tmp), True)

    after = read_events_lake(spark, path, categories, date_from, date_to)
    n_after = after.select(F.input_file_name()).distinct().count()
    return {
        "files_before": len(files),
        "files_after": int(n_after),
        "bytes": int(total),
    }
