"""Human-activity dataset ETL (accelerometer txt -> OSDB-shaped events).

Reference semantics: user_tools/datasets/human_activity_dataset/
activity_data_osdb_processor.py:12-91 (coded-value decode
-1.5 + v/63*3.0, filename user-id extraction, 32 Hz -> 25 Hz regrid,
eventId synthesis "99999"+seq, x1000 scaling + magnitude, truncate to a
multiple of 125 rows), data_restructurer.py:15-64 (125-sample window
restructure into magnitude / interleaved rawData3d arrays) and
dataset_generator.py:11-49 (row-level concat + global re-Id).

Spark-first re-expression:

* the os.walk + per-file pandas loop becomes ONE ``wholetext`` read —
  each txt file is a row, so per-file line order is explicit data
  (posexplode index), not an accident of partitioning; a directory of
  millions of recordings parallelizes per file with no driver loop.
* pandas ``resample('40ms').mean()`` becomes an integer bin key
  ``(i*25) div 32`` + groupBy-avg: at 32 Hz in / 25 Hz out every 40 ms
  bin holds 1-2 samples, so the mean is an exact IEEE op chain and the
  regrid is a single partial-aggregated shuffle keyed (event, bin).
* the "multiple of 125 rows" truncation is a max-bin window per event,
  not a collected length check.

All arithmetic is straight-line IEEE (divide, multiply, sqrt) on
deterministic inputs, so every stage is DuckDB-oracle hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: samples per restructured training window (the reference TIMESTEP)
TIMESTEP = 125


def decode_accel(col: F.Column) -> F.Column:
    """Coded 0..63 accelerometer value -> g units: -1.5 + (v/63)*3.0
    (activity_data_osdb_processor.py:12-13), same operation order so
    the IEEE result is bit-identical to the reference and the oracle."""
    return F.lit(-1.5) + (col / F.lit(63)) * F.lit(3.0)


def load_activity_txt(spark: SparkSession, root: str) -> DataFrame:
    """Read a human-activity directory tree of whitespace-separated
    ``x y z`` coded txt files into (file_path, label, user_tag,
    line_idx, xc, yc, zc).

    Mirrors the reference's os.walk filters (skip ``*_MODEL`` dirs,
    ``README.txt``/``MANUAL.txt``/``*_MODEL.txt``), its
    activity-label-from-parent-dir and user-id-from-filename rules
    (``...-<user>.txt``). ``wholetext`` makes each file one row, so the
    per-file sample index is an explicit posexplode ordinal — correct
    under any partitioning, unlike a line-mode read.
    """
    raw = (
        spark.read.format("text")
        # NB: must ride format().load() — DataFrameReader.text() drops
        # the wholetext option on the floor in pyspark 4.x
        .option("wholetext", "true")
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.txt")
        .load(root)
        .select(F.input_file_name().alias("file_path"), "value")
    )
    fname = F.element_at(F.split(F.col("file_path"), "/"), -1)
    parent = F.element_at(F.split(F.col("file_path"), "/"), -2)
    keep = (
        ~fname.isin("README.txt", "MANUAL.txt")
        & ~fname.endswith("_MODEL.txt")
        & ~parent.endswith("_MODEL")
    )
    lines = (
        raw.filter(keep)
        .select(
            "file_path",
            parent.alias("label"),
            F.regexp_extract(fname, r"-([^-.]+)\.txt$", 1).alias(
                "user_tag"
            ),
            F.posexplode(
                F.split(F.col("value"), "\n")
            ).alias("line_idx", "line"),
        )
        .withColumn("line", F.trim("line"))
        .filter(F.col("line") != "")
    )
    parts = F.split(F.col("line"), r"\s+")
    return lines.select(
        "file_path",
        "label",
        "user_tag",
        "line_idx",
        F.element_at(parts, 1).cast("int").alias("xc"),
        F.element_at(parts, 2).cast("int").alias("yc"),
        F.element_at(parts, 3).cast("int").alias("zc"),
    )


def assign_event_ids(samples: DataFrame) -> DataFrame:
    """One OSDB eventId per file: 99999<seq> with seq = 1-based rank of
    the file path (deterministic, vs the reference's os.walk order)."""
    seq = F.dense_rank().over(Window.orderBy("file_path"))
    return samples.withColumn(
        "eventId",
        F.concat(F.lit("99999"), seq.cast("string")).cast("long"),
    )


def activity_to_osdb(
    samples: DataFrame,
    event_col: str = "eventId",
    idx_col: str = "line_idx",
) -> DataFrame:
    """Decode + 32->25 Hz regrid + x1000 + magnitude + truncate-to-125s
    (activity_data_osdb_processor.py:44-69), fully distributed.

    Input: (event_col, user_tag, label, idx_col, xc, yc, zc) with
    idx_col the 0-based 32 Hz sample ordinal within the event.
    Output: (eventId, Id, userId, x, y, z, magnitude, label) at 25 Hz,
    each event truncated to a multiple of ``TIMESTEP`` rows (events
    shorter than one window drop entirely, as the reference's
    ``iloc[:0]`` does).

    The pandas resample is the bin key floor(i * 31.25ms / 40ms) =
    (i*25) div 32; 32 in / 25 out means every bin holds 1-2 samples, so
    no empty bins exist and Id = bin+1 reproduces the reference's
    arange over resampled rows.
    """
    binned = (
        samples.withColumn(
            "bin", F.expr(f"({idx_col} * 25) div 32")
        )
        .groupBy(event_col, "user_tag", "label", "bin")
        .agg(
            F.avg(decode_accel(F.col("xc"))).alias("xg"),
            F.avg(decode_accel(F.col("yc"))).alias("yg"),
            F.avg(decode_accel(F.col("zc"))).alias("zg"),
        )
    )
    wev = Window.partitionBy(event_col)
    kept = (
        binned.withColumn("n_bins", F.max("bin").over(wev) + F.lit(1))
        .filter(
            F.col("bin")
            < (F.col("n_bins") - F.col("n_bins") % TIMESTEP)
        )
    )
    x, y, z = (F.col(c) * 1000 for c in ("xg", "yg", "zg"))
    return kept.select(
        F.col(event_col).alias("eventId"),
        (F.col("bin") + 1).alias("Id"),
        F.col("user_tag").alias("userId"),
        x.alias("x"),
        y.alias("y"),
        z.alias("z"),
        F.sqrt(x * x + y * y + z * z).alias("magnitude"),
        "label",
    )


def restructure_windows(
    osdb: DataFrame, timestep: int = TIMESTEP
) -> DataFrame:
    """125-sample window restructure (data_restructurer.py:34-54):
    consecutive ``timestep``-row chunks of each event become one row of
    (eventId, userId, label, magnitude list, interleaved x/y/z
    rawData3d list, Id) — incomplete tail chunks drop.  The global
    chunk Id is sequential over (eventId, window) order, matching the
    reference's single-pass counter over the event-ordered CSV."""
    win = ((F.col("Id") - 1) / timestep).cast("long")
    chunks = (
        osdb.withColumn("w", win)
        .groupBy("eventId", "w")
        .agg(
            F.first("userId").alias("userId"),
            F.first("label").alias("label"),
            F.array_sort(
                F.collect_list(F.struct("Id", "magnitude"))
            ).alias("_m"),
            F.array_sort(
                F.collect_list(F.struct("Id", "x", "y", "z"))
            ).alias("_r"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") == timestep)
    )
    gid = F.row_number().over(Window.orderBy("eventId", "w"))
    return chunks.select(
        "eventId",
        "userId",
        "label",
        F.transform(F.col("_m"), lambda s: s["magnitude"]).alias(
            "magnitude"
        ),
        F.flatten(
            F.transform(
                F.col("_r"),
                lambda s: F.array(s["x"], s["y"], s["z"]),
            )
        ).alias("rawData3d"),
        gid.alias("Id"),
    )


def combine_datasets(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Row-level concat of a seizure-sample frame and an activity frame
    with a fresh global Id (dataset_generator.py:26-46): df1's rows
    keep their relative order ahead of df2's, Id restarts at 1."""
    a = df1.withColumn("_src", F.lit(0))
    b = df2.withColumn("_src", F.lit(1))
    u = a.unionByName(b).withColumnRenamed("Id", "_oid")
    gid = F.row_number().over(Window.orderBy("_src", "eventId", "_oid"))
    return u.withColumn("Id", gid).select(
        "eventId", "Id", "userId", "x", "y", "z", "magnitude", "label"
    )
