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
* the reference's global sequential Ids (file seq, window Id, combined
  row Id) are NOT computed with an unpartitioned global window over the
  data rows (that would funnel every sample through one partition).
  Each is a partitioned local rank plus a cumulative offset computed on
  a metadata-sized side table (one row per file / per event / per
  (src, event)) that is broadcast back — row_number over the total
  order (a, b) equals offset(a) + rank-within-a exactly.

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
    # reference extract_user_id: fname.split('-')[-1].split('.')[0] —
    # substring after the LAST '-' (whole name if no dash), cut at the
    # FIRST '.' ("a-12.5.txt" -> "12", "abc.txt" -> "abc")
    user_tag = F.element_at(
        F.split(F.element_at(F.split(fname, "-"), -1), r"\."), 1
    )
    lines = (
        raw.filter(keep)
        .select(
            "file_path",
            parent.alias("label"),
            user_tag.alias("user_tag"),
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
    the file path (deterministic, vs the reference's os.walk order).

    The rank is computed on the DISTINCT file list (one row per file —
    metadata-sized) and broadcast-joined back, so the sample rows never
    funnel through a single-partition global window."""
    seq = F.row_number().over(Window.orderBy("file_path"))
    ids = (
        samples.select("file_path")
        .distinct()
        .withColumn(
            "eventId",
            F.concat(F.lit("99999"), seq.cast("string")).cast("long"),
        )
    )
    return samples.join(F.broadcast(ids), "file_path")


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
    # global Id = per-event cumulative chunk offset + rank within event:
    # the data-sized window is PARTITIONED by event; only the one-row-
    # per-event offset table rides a global window (metadata-sized).
    local = F.row_number().over(
        Window.partitionBy("eventId").orderBy("w")
    )
    offsets = (
        chunks.groupBy("eventId")
        .agg(F.count(F.lit(1)).alias("_nch"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_nch").over(
                    Window.orderBy("eventId").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_nch")
    )
    return chunks.join(F.broadcast(offsets), "eventId").select(
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
        (F.col("_off") + local).alias("Id"),
    )


def combine_datasets(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Row-level concat of a seizure-sample frame and an activity frame
    with a fresh global Id (dataset_generator.py:26-46): df1's rows
    keep their relative order ahead of df2's, Id restarts at 1.

    Id = row_number over the total order (_src, eventId, _oid),
    computed as a PARTITIONED rank within (_src, eventId) plus a
    cumulative offset from a one-row-per-(src, event) side table — the
    data rows never cross a single-partition global window."""
    a = df1.withColumn("_src", F.lit(0))
    b = df2.withColumn("_src", F.lit(1))
    u = a.unionByName(b).withColumnRenamed("Id", "_oid")
    local = F.row_number().over(
        Window.partitionBy("_src", "eventId").orderBy("_oid")
    )
    offsets = (
        u.groupBy("_src", "eventId")
        .agg(F.count(F.lit(1)).alias("_ng"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_ng").over(
                    Window.orderBy("_src", "eventId").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_ng")
    )
    return (
        u.join(F.broadcast(offsets), ["_src", "eventId"])
        .withColumn("Id", F.col("_off") + local)
        .select(
            "eventId", "Id", "userId", "x", "y", "z", "magnitude",
            "label",
        )
    )
