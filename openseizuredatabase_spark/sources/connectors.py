"""External connectors (reference S7 web API, S8 MongoDB).

Design: external systems feed a LANDING ZONE in the lake (Parquet/NDJSON
written by an ingest job); the engine only ever reads the lake. This is
the scale-correct shape — the reference instead pages a REST API inside
its curator loop (libosd/webApiConnection.py:86-148) which cannot fan out.

Neither a data-sharing server nor MongoDB exists in this environment, so
the connectors validate configuration and fail fast with a clear message;
their read/write contracts (paths, schemas, modes) are real.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from openseizuredatabase_spark.sources.ingest import EVENT_SCHEMA


@dataclass(frozen=True)
class WebApiConfig:
    """S7: Django data-sharing server (token auth, paged /api/events/)."""

    base_url: str
    auth_token_path: str = "~/.osd_token"
    page_size: int = 100


def ingest_webapi_to_landing(
    spark: SparkSession, cfg: WebApiConfig, landing_path: str
) -> None:
    """Pages the remote API into NDJSON landing files, then converts to
    Parquet with the canonical EVENT_SCHEMA. Requires network access."""
    raise NotImplementedError(
        "no data-sharing server is reachable from this environment; "
        f"point WebApiConfig.base_url at a live server (got {cfg.base_url!r}) "
        "and re-run — the landing layout is NDJSON then "
        "read_events_json(multi_line=False) → parquet"
    )


def read_landing(spark: SparkSession, landing_path: str) -> DataFrame:
    """Read a landing zone written by any connector (NDJSON, canonical
    schema) — this half works anywhere."""
    return spark.read.schema(EVENT_SCHEMA).json(landing_path)


def write_mongodb(df: DataFrame, uri: str, database: str, collection: str) -> None:
    """S8 sink (importOsdb.py:38-52 insert_many). Needs the Spark MongoDB
    connector jar on the classpath."""
    try:
        (
            df.write.format("mongodb")
            .option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .mode("append")
            .save()
        )
    except Exception as exc:  # jar absent in this environment
        raise NotImplementedError(
            "mongodb spark connector jar is not on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector and retry"
        ) from exc
