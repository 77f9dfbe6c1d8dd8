"""OSDB-shaped ingest: nested events JSON → canonical Parquet lake.

Re-expresses the reference's load + tidy pipeline as declarative Spark:

* S1 JSON DB load (libosd/osdDbConnection.py:101-126): one
  ``spark.read.schema(EVENT_SCHEMA).json(multiLine=True)`` — Spark
  partitions and streams natively (S2's hand-rolled chunked decoder
  disappears).
* C1 multi-format timestamp parse (libosd/dpTools.py:6-11,
  flattenData.py:30-74 — 8 formats, dayfirst legacy):
  ``coalesce(to_timestamp(...), ...)`` cascade.
* C5 double-nested dataJSON expansion (libosd/tidy_db.py:49-85,
  libosd/dpTools.py:28-36): two ``from_json`` levels.
* C7 array truncation to 125/375 (libosd/tidy_db.py:67-74): ``slice``.
* A3 data-presence flags (libosd/tidy_db.py:91-146): ≥50% valid rule as
  an aggregate over exploded datapoints.
* A4 alarm-state repair (libosd/tidy_db.py:170-201): severity-ordered max.

Everything is a column expression — no Python row loops, so ingest scales
with executors and Catalyst prunes unused fields at the JSON scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- canonical schemas -----------------------------------------------------

DATAPOINT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("eventId", T.LongType()),
        T.StructField("userId", T.StringType()),
        T.StructField("dataTime", T.StringType()),
        T.StructField("hr", T.DoubleType()),
        T.StructField("o2Sat", T.DoubleType()),
        T.StructField("specPower", T.DoubleType()),
        T.StructField("roiPower", T.DoubleType()),
        T.StructField("roiRatio", T.DoubleType()),
        T.StructField("alarmState", T.IntegerType()),
        T.StructField("alarmPhrase", T.StringType()),
        T.StructField("simpleSpec", T.ArrayType(T.DoubleType())),
        T.StructField("rawData", T.ArrayType(T.DoubleType())),
        T.StructField("rawData3D", T.ArrayType(T.DoubleType())),
        T.StructField("dataJSON", T.StringType()),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("userId", T.StringType()),
        T.StructField("dataTime", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("subType", T.StringType()),
        T.StructField("desc", T.StringType()),
        T.StructField("osdAlarmState", T.IntegerType()),
        T.StructField("dataSourceName", T.StringType()),
        T.StructField("phoneAppVersion", T.StringType()),
        T.StructField("watchSdVersion", T.StringType()),
        T.StructField("sampleFreq", T.IntegerType()),
        T.StructField("alarmFreqMin", T.DoubleType()),
        T.StructField("alarmFreqMax", T.DoubleType()),
        T.StructField("alarmThresh", T.DoubleType()),
        T.StructField("alarmRatioThresh", T.DoubleType()),
        T.StructField("seizureTimes", T.ArrayType(T.DoubleType())),
        T.StructField("dataJSON", T.StringType()),
        T.StructField("datapoints", T.ArrayType(DATAPOINT_SCHEMA)),
    ]
)

# Inner payload carried by the legacy double-nested dataJSON strings
# (libosd/tidy_db.py:49-85: outer object has its own dataJSON string whose
# object holds the real fields).
_INNER_DP_JSON = T.StructType(
    [
        T.StructField("dataTime", T.StringType()),
        T.StructField("dataTimeStr", T.StringType()),
        T.StructField("hr", T.DoubleType()),
        T.StructField("o2Sat", T.DoubleType()),
        T.StructField("specPower", T.DoubleType()),
        T.StructField("roiPower", T.DoubleType()),
        T.StructField("alarmState", T.IntegerType()),
        T.StructField("alarmPhrase", T.StringType()),
        T.StructField("simpleSpec", T.ArrayType(T.DoubleType())),
        T.StructField("rawData", T.ArrayType(T.DoubleType())),
        T.StructField("rawData3D", T.ArrayType(T.DoubleType())),
    ]
)

_OUTER_DP_JSON = T.StructType([T.StructField("dataJSON", T.StringType())])

# The 8 timestamp formats the reference parses defensively
# (flattenData.py:30-74), most-specific first; dayfirst legacy last.
TIMESTAMP_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "dd-MM-yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
)


def parse_osdb_time(col: Column) -> Column:
    """C1: multi-format timestamp cascade → TimestampType.

    coalesce(try_to_timestamp(fmt1), try_to_timestamp(fmt2), ...) — one
    expression, no UDF; unparseable strings become NULL (the reference
    returns None and guards downstream).
    """
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in TIMESTAMP_FORMATS]
    return F.coalesce(*attempts)


def read_events_json(spark: SparkSession, path: str, multi_line: bool = True) -> DataFrame:
    """S1/S2: read an OSDB JSON DB file (array or NDJSON) with the fixed
    nested schema — no inference pass over 100 TB."""
    return spark.read.schema(EVENT_SCHEMA).json(path, multiLine=multi_line)


def expand_datapoint_json(dp: Column) -> Column:
    """C5: resolve a datapoint struct's legacy double-nested dataJSON.

    Returns a struct with the real fields: prefer the explicit field if
    present, else the value recovered from dataJSON→dataJSON.
    """
    inner_str = F.coalesce(
        F.from_json(dp["dataJSON"], _OUTER_DP_JSON)["dataJSON"], dp["dataJSON"]
    )
    inner = F.from_json(inner_str, _INNER_DP_JSON)

    def pick(name: str) -> Column:
        return F.coalesce(dp[name], inner[name])

    return F.struct(
        dp["id"].alias("id"),
        F.coalesce(dp["dataTime"], inner["dataTime"], inner["dataTimeStr"]).alias(
            "dataTime"
        ),
        pick("hr").alias("hr"),
        pick("o2Sat").alias("o2Sat"),
        pick("specPower").alias("specPower"),
        pick("roiPower").alias("roiPower"),
        dp["roiRatio"].alias("roiRatio"),
        pick("alarmState").alias("alarmState"),
        pick("alarmPhrase").alias("alarmPhrase"),
        F.slice(F.coalesce(dp["simpleSpec"], inner["simpleSpec"]), 1, 10).alias(
            "simpleSpec"
        ),
        # C7: truncate to exactly 125 / 375 elements (tidy_db.py:67-74)
        F.slice(F.coalesce(dp["rawData"], inner["rawData"]), 1, 125).alias("rawData"),
        F.slice(F.coalesce(dp["rawData3D"], inner["rawData3D"]), 1, 375).alias(
            "rawData3D"
        ),
    )


_SEVERITY = "CASE WHEN x = 5 THEN -1 WHEN x = 1 THEN 1 WHEN x = 2 THEN 2 WHEN x = 3 THEN 3 ELSE 0 END"


def tidy_events(events: DataFrame) -> DataFrame:
    """Tidy stage (libosd/tidy_db.py:226-238) as pure column transforms:

    * expand every datapoint's legacy JSON (C5) and truncate arrays (C7)
    * parse event time (C1) into ``eventTimestamp``
    * A3 presence flags: ≥50% of datapoints valid
      (3D: 375 elems & non-zero sum; hr>0; o2Sat>0)
    * A4 alarm-state repair: event osdAlarmState := worst datapoint state
      (warn < alarm < fall severity order, manual(5) ignored)
    """
    dps = F.transform(F.col("datapoints"), expand_datapoint_json)

    def frac_valid(pred_sql: str) -> Column:
        # share of datapoints satisfying pred (SQL lambda over the array)
        return F.expr(
            f"CASE WHEN size(__dps) > 0 THEN "
            f"size(filter(__dps, dp -> {pred_sql})) / CAST(size(__dps) AS DOUBLE) "
            f"ELSE 0.0 END"
        )

    valid3d = (
        "dp.rawData3D IS NOT NULL AND size(dp.rawData3D) = 375 "
        "AND aggregate(dp.rawData3D, CAST(0.0 AS DOUBLE), (a, x) -> a + abs(x)) > 0"
    )
    out = (
        events.withColumn("__dps", dps)
        .withColumn("eventTimestamp", parse_osdb_time(F.col("dataTime")))
        .withColumn("has3dData", frac_valid(valid3d) >= 0.5)
        .withColumn("hasHrData", frac_valid("dp.hr IS NOT NULL AND dp.hr > 0") >= 0.5)
        .withColumn(
            "hasO2SatData", frac_valid("dp.o2Sat IS NOT NULL AND dp.o2Sat > 0") >= 0.5
        )
        .withColumn(
            "__worst",
            F.expr(
                "aggregate(__dps, 0, (acc, dp) -> greatest(acc, "
                + _SEVERITY.replace("x", "coalesce(dp.alarmState, 0)")
                + "))"
            ),
        )
        .withColumn(
            "osdAlarmState",
            F.when(F.col("__worst") > 0, F.col("__worst")).otherwise(
                F.coalesce(F.col("osdAlarmState"), F.lit(0))
            ),
        )
        .drop("datapoints", "dataJSON")
        .withColumnRenamed("__dps", "datapoints")
        .drop("__worst")
    )
    return out


def explode_datapoints(events: DataFrame) -> DataFrame:
    """events (nested) → one row per datapoint, with event metadata and a
    parsed per-dp timestamp. The exploded frame is the input to the
    flatten / feature / detection layers."""
    dp = F.explode("datapoints").alias("dp")
    base = events.select(
        F.col("id").alias("eventId"),
        "userId",
        "type",
        "subType",
        "eventTimestamp",
        dp,
    )
    return base.select(
        "eventId",
        "userId",
        "type",
        "subType",
        "eventTimestamp",
        F.col("dp.id").alias("dpId"),
        parse_osdb_time(F.col("dp.dataTime")).alias("dpTimestamp"),
        F.col("dp.hr").alias("hr"),
        F.col("dp.o2Sat").alias("o2Sat"),
        F.col("dp.specPower").alias("specPower"),
        F.col("dp.roiPower").alias("roiPower"),
        F.col("dp.alarmState").alias("alarmState"),
        F.col("dp.simpleSpec").alias("simpleSpec"),
        F.col("dp.rawData").alias("rawData"),
        F.col("dp.rawData3D").alias("rawData3D"),
    )


def deinterleave_3d(events_dp: DataFrame) -> DataFrame:
    """C6: split interleaved rawData3D into x/y/z arrays + C8 magnitude.

    Pure `transform(sequence(...))` expressions — stays in codegen.
    """
    def axis(i: int) -> Column:
        return F.expr(
            f"transform(sequence(0, 124), n -> rawData3D[3 * n + {i}])"
        )

    mag = F.expr(
        "transform(sequence(0, 124), n -> sqrt("
        "rawData3D[3*n] * rawData3D[3*n] + "
        "rawData3D[3*n+1] * rawData3D[3*n+1] + "
        "rawData3D[3*n+2] * rawData3D[3*n+2]))"
    )
    return (
        events_dp.withColumn("accX", axis(0))
        .withColumn("accY", axis(1))
        .withColumn("accZ", axis(2))
        .withColumn("magnitude3D", mag)
    )


def accel_magnitude(
    raw: Column,
    raw3d: Column,
    mode: str = "V0",
    offset: float = 0.0,
) -> Column:
    """OSD algorithm V0-V3 magnitude reconstruction
    (testRunner/osdAlg.py:68-115 getAccelDataFromJson):

    * V0 — the device-computed magnitude array (``data``) as-is;
    * V1 — |x|+|y|+|z| per sample from the interleaved 3D array;
    * V2 — √(x²+y²+z²);
    * V3 — √((x+o)²+(y+o)²+(z+o)²) with a per-axis milli-g offset.

    V1-V3 fall back to the V0 array when the 3D array is absent/empty or
    sums to exactly zero (osdAlg.py:104-114) — the reference's guard for
    devices that upload a zeroed 3D block. Pure Catalyst ``transform``/
    ``aggregate`` expressions: stays in whole-stage codegen, no UDF.
    """
    if mode == "V0":
        return raw
    n = (F.size(raw3d) / 3).cast("int")
    idx = F.sequence(F.lit(0), n - 1)

    def xyz(i):
        return (
            F.element_at(raw3d, 3 * i + 1),
            F.element_at(raw3d, 3 * i + 2),
            F.element_at(raw3d, 3 * i + 3),
        )

    if mode == "V1":
        per = lambda i: (lambda x, y, z: F.abs(x) + F.abs(y) + F.abs(z))(
            *xyz(i)
        )
    elif mode == "V2":
        per = lambda i: (lambda x, y, z: F.sqrt(x * x + y * y + z * z))(
            *xyz(i)
        )
    elif mode == "V3":
        o = F.lit(float(offset))
        per = lambda i: (
            lambda x, y, z: F.sqrt(
                (x + o) * (x + o) + (y + o) * (y + o) + (z + o) * (z + o)
            )
        )(*xyz(i))
    else:
        raise ValueError(f"unknown OSD magnitude mode: {mode}")

    mag = F.transform(idx, per)
    data_sum = F.aggregate(
        raw3d, F.lit(0.0), lambda acc, x: acc + F.coalesce(x, F.lit(0.0))
    )
    usable = (
        raw3d.isNotNull() & (F.size(raw3d) >= 3) & (data_sum != 0.0)
    )
    return F.when(usable, mag).otherwise(raw)


def type_to_label(type_col: Column) -> Column:
    """C4 label encoding (flattenData.py:13-27): seizure→1,
    false-alarm/NDA→0, everything else→2."""
    t = F.lower(F.coalesce(type_col, F.lit("")))
    return (
        F.when(t.contains("seizure"), 1)
        .when(t.contains("false alarm") | t.contains("nda"), 0)
        .otherwise(2)
    )


def has_accel_data(raw: Column, raw3d: Column) -> Column:
    """F10 datapoint accel-presence predicate (flattenData.py:149-172):
    keep datapoints whose rawData OR rawData3D has any non-null,
    non-all-zero content."""
    def any_nonzero(arr: Column) -> Column:
        return (
            arr.isNotNull()
            & (F.size(arr) > 0)
            & F.exists(arr, lambda x: x.isNotNull() & (x != 0))
        )

    return any_nonzero(raw) | any_nonzero(raw3d)


def zero_datapoint(epoch_s: Column, n_samples: int = 125) -> Column:
    """C18 zero-filled datapoint template (flattenData.py:77-101,
    alg_runner.py:47-62): struct literal with zeroed arrays, used for
    gap fill and detector state flush."""
    return F.struct(
        F.lit(None).cast("long").alias("id"),
        F.date_format(F.timestamp_seconds(epoch_s), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "dataTime"
        ),
        F.lit(None).cast("double").alias("hr"),
        F.lit(None).cast("double").alias("o2Sat"),
        F.lit(0.0).alias("specPower"),
        F.lit(0.0).alias("roiPower"),
        F.lit(None).cast("double").alias("roiRatio"),
        F.lit(0).alias("alarmState"),
        F.lit(None).cast("string").alias("alarmPhrase"),
        F.array_repeat(F.lit(0.0), 10).alias("simpleSpec"),
        F.array_repeat(F.lit(0.0), n_samples).alias("rawData"),
        F.array_repeat(F.lit(0.0), 3 * n_samples).alias("rawData3D"),
    )


def flatten_view(events_dp: DataFrame, n_samples: int = 125) -> DataFrame:
    """§1.1 'flattened table' compat view (flattenData.py:104-146): one
    row per datapoint with M000..M124 / X.../Y.../Z... wide columns.

    NOT a physical layout — arrays stay columnar in the lake; this view
    exists only for CSV interchange with the reference's ML tooling.
    Generated columns are pure element_at projections (no shuffle).
    """
    cols = [
        "eventId",
        "userId",
        F.concat_ws(
            "/", F.coalesce(F.col("type"), F.lit("")), F.coalesce(F.col("subType"), F.lit(""))
        ).alias("typeStr"),
        type_to_label(F.col("type")).alias("type"),
        F.col("dpTimestamp").alias("dataTime"),
        F.col("alarmState").alias("osdAlarmState"),
        F.col("specPower").alias("osdSpecPower"),
        F.col("roiPower").alias("osdRoiPower"),
        "hr",
        F.col("o2Sat").alias("o2sat"),
    ]
    for i in range(n_samples):
        cols.append(F.element_at("rawData", i + 1).alias(f"M{i:03d}"))
    for name, off in (("X", 0), ("Y", 1), ("Z", 2)):
        for i in range(n_samples):
            cols.append(
                F.element_at("rawData3D", 3 * i + off + 1).alias(f"{name}{i:03d}")
            )
    return events_dp.select(*cols)
