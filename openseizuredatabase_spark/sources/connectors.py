"""External connectors (reference S7 web API, S8 MongoDB).

Design: external systems feed a LANDING ZONE in the lake (NDJSON written
by an ingest job, then Parquet); the engine only ever reads the lake.

S7 is fully implemented on the stdlib HTTP client with the fetch
DISTRIBUTED: the reference pages the REST API serially inside its
curator loop (libosd/webApiConnection.py:86-148 getEvents +
getDataPointsByEvent per event, requests.get with token auth
webApiConnection.py:320-345, login webApiConnection.py:348-367) — a
single-machine bottleneck at any scale. Here the driver makes ONE
request to learn the page count, then a ``spark.range(n_pages)`` ×
``mapInPandas`` job fetches pages (and their events' datapoints) in
parallel on executors and writes NDJSON straight to the landing path —
ingest bandwidth scales with the cluster, bytes never route through the
driver. Works against any DRF-style paginated endpoint and falls back
to the reference server's plain-list response.

S8 (MongoDB) still needs the mongo-spark connector jar, absent here;
the write contract is real and fails fast with the remedy.
"""

from __future__ import annotations

import json
import math
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from openseizuredatabase_spark.sources.ingest import EVENT_SCHEMA


@dataclass(frozen=True)
class WebApiConfig:
    """S7: Django data-sharing server (token auth, paged /events/)."""

    base_url: str
    token: str | None = None
    page_size: int = 100
    max_events: int = 1_000_000
    include_datapoints: bool = False
    user_id: int | None = None
    timeout_s: float = 10.0


def _get_json(url: str, token: str | None, timeout: float):
    """requests.get + token header (webApiConnection.py:320-345) on the
    stdlib client; network failures surface with the URL for diagnosis."""
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Token {token}")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.URLError as exc:
        raise ConnectionError(
            f"web API request failed for {url!r}: {exc}; check that the "
            "data-sharing server is reachable from every executor"
        ) from exc


def fetch_token(
    base_url: str, username: str, password: str, timeout: float = 10.0
) -> str:
    """POST /accounts/login/ (webApiConnection.py:348-367)."""
    url = f"{base_url.rstrip('/')}/accounts/login/"
    body = json.dumps({"login": username, "password": password}).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            obj = json.loads(resp.read().decode("utf-8"))
    except urllib.error.URLError as exc:
        raise ConnectionError(f"login failed against {url!r}: {exc}") from exc
    token = obj.get("token")
    if not token:
        raise ValueError(f"no token in login response from {url!r}")
    return str(token)


def _events_url(cfg: WebApiConfig, page: int) -> str:
    params = {"page": page, "page_size": cfg.page_size}
    if cfg.user_id is not None:  # webApiConnection.py:99-101 ?user= filter
        params["user"] = cfg.user_id
    return (
        f"{cfg.base_url.rstrip('/')}/events/?"
        + urllib.parse.urlencode(params)
    )


def _page_events(cfg: WebApiConfig, page: int) -> list[dict]:
    obj = _get_json(_events_url(cfg, page), cfg.token, cfg.timeout_s)
    if isinstance(obj, list):  # reference server: whole list, no paging
        return obj if page == 1 else []
    return obj.get("results", [])


def _attach_datapoints(cfg: WebApiConfig, event: dict) -> dict:
    """getDataPointsByEvent (webApiConnection.py:221-226) + the time sort
    and zero-dp drop of getEvents (webApiConnection.py:115-140)."""
    url = (
        f"{cfg.base_url.rstrip('/')}/datapoints/?"
        + urllib.parse.urlencode({"eventId": event["id"]})
    )
    dps = _get_json(url, cfg.token, cfg.timeout_s)
    if isinstance(dps, dict):
        dps = dps.get("results", [])
    dps = sorted(dps, key=lambda d: str(d.get("dataTime", "")))
    if not dps:
        return {}
    out = dict(event)
    out["datapoints"] = dps
    return out


def probe_event_count(cfg: WebApiConfig) -> int:
    """ONE driver-side request: DRF responses carry total ``count``;
    plain-list servers are their own count."""
    obj = _get_json(_events_url(cfg, 1), cfg.token, cfg.timeout_s)
    if isinstance(obj, list):
        return len(obj)
    return int(obj.get("count", len(obj.get("results", []))))


def webapi_events_ndjson(spark: SparkSession, cfg: WebApiConfig) -> DataFrame:
    """The distributed fetch: one NDJSON line per event, pages fanned out
    across executors (each task holds at most page_size events)."""
    n = min(probe_event_count(cfg), cfg.max_events)
    n_pages = max(1, math.ceil(n / cfg.page_size))
    pages = spark.range(1, n_pages + 1).toDF("page")
    cap = cfg.max_events

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines: list[str] = []
            for page in pdf["page"]:
                events = _page_events(cfg, int(page))
                # honour the global cap per page (maxEvents,
                # webApiConnection.py:137-140): pages are page_size-sized,
                # so events past the cap live on pages > ceil(cap/size)
                # which were never scheduled; trim the boundary page
                first_idx = (int(page) - 1) * cfg.page_size
                if first_idx + len(events) > cap:
                    events = events[: max(0, cap - first_idx)]
                for ev in events:
                    if cfg.include_datapoints:
                        ev = _attach_datapoints(cfg, ev)
                        if not ev:  # zero-datapoint events dropped
                            continue
                    lines.append(json.dumps(ev, sort_keys=True))
            yield pd.DataFrame({"value": lines})

    return pages.mapInPandas(fetch, "value string")


def ingest_webapi_to_landing(
    spark: SparkSession, cfg: WebApiConfig, landing_path: str
) -> DataFrame:
    """S7 end-to-end: distributed page fetch → NDJSON landing files
    (written by executors, not the driver) → canonical-schema read."""
    webapi_events_ndjson(spark, cfg).write.mode("overwrite").text(landing_path)
    return read_landing(spark, landing_path)


def read_landing(spark: SparkSession, landing_path: str) -> DataFrame:
    """Read a landing zone written by any connector (NDJSON, canonical
    schema) — this half works on any lake."""
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
