"""S7 web-API connector against a live in-process HTTP server: DRF-style
pagination, token auth, datapoint attachment, plain-list fallback, and
the distributed landing-zone write."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from openseizuredatabase_spark.sources.connectors import (
    WebApiConfig,
    fetch_token,
    ingest_webapi_to_landing,
    probe_event_count,
    webapi_events_ndjson,
)

N_EVENTS = 23
EVENTS = [
    {
        "id": i,
        "userId": 100 + (i % 3),
        "type": "Seizure" if i % 4 == 0 else "False Alarm",
        "subType": "Tonic-Clonic" if i % 8 == 0 else "",
        "dataTime": f"2024-01-01T00:{i:02d}:00Z",
        "desc": f"event {i}",
    }
    for i in range(1, N_EVENTS + 1)
]


class _Handler(BaseHTTPRequestHandler):
    paginated = True
    require_token = "sekrit"

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if self.path.rstrip("/").endswith("accounts/login"):
            n = int(self.headers.get("Content-Length", 0))
            creds = json.loads(self.rfile.read(n))
            if creds.get("login") == "u" and creds.get("password") == "p":
                self._send({"token": self.require_token})
            else:
                self._send({"detail": "bad credentials"}, 403)
        else:
            self._send({}, 404)

    def do_GET(self):
        if self.require_token and self.headers.get("Authorization") != (
            f"Token {self.require_token}"
        ):
            self._send({"detail": "unauthorized"}, 401)
            return
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        if parsed.path.rstrip("/").endswith("events"):
            evs = EVENTS
            if "user" in qs:
                evs = [e for e in evs if e["userId"] == int(qs["user"][0])]
            if not self.paginated:
                self._send(evs)
                return
            page = int(qs.get("page", ["1"])[0])
            size = int(qs.get("page_size", ["100"])[0])
            chunk = evs[(page - 1) * size : page * size]
            self._send({"count": len(evs), "results": chunk})
        elif parsed.path.rstrip("/").endswith("datapoints"):
            eid = int(qs["eventId"][0])
            if eid % 5 == 0:  # zero-dp events get dropped by the client
                self._send({"count": 0, "results": []})
                return
            dps = [
                {"eventId": eid, "dataTime": f"2024-01-01T00:00:{s:02d}Z"}
                for s in (2, 0, 1)  # unsorted: client must time-sort
            ]
            self._send({"count": len(dps), "results": dps})
        else:
            self._send({}, 404)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_token(server):
    assert fetch_token(server, "u", "p") == "sekrit"
    with pytest.raises(ConnectionError):
        fetch_token(server, "u", "wrong")


def test_probe_and_distributed_fetch(spark, server):
    cfg = WebApiConfig(base_url=server, token="sekrit", page_size=5)
    assert probe_event_count(cfg) == N_EVENTS
    lines = webapi_events_ndjson(spark, cfg).collect()
    got = sorted(json.loads(r["value"])["id"] for r in lines)
    assert got == list(range(1, N_EVENTS + 1))


def test_max_events_cap_trims_boundary_page(spark, server):
    cfg = WebApiConfig(
        base_url=server, token="sekrit", page_size=5, max_events=12
    )
    lines = webapi_events_ndjson(spark, cfg).collect()
    got = sorted(json.loads(r["value"])["id"] for r in lines)
    assert got == list(range(1, 13))  # 2 full pages + trimmed third


def test_user_filter(spark, server):
    cfg = WebApiConfig(
        base_url=server, token="sekrit", page_size=5, user_id=101
    )
    lines = webapi_events_ndjson(spark, cfg).collect()
    assert all(
        json.loads(r["value"])["userId"] == 101 for r in lines
    ) and lines


def test_datapoint_attachment_sorts_and_drops_empty(spark, server):
    cfg = WebApiConfig(
        base_url=server, token="sekrit", page_size=50,
        include_datapoints=True,
    )
    rows = [json.loads(r["value"]) for r in webapi_events_ndjson(spark, cfg).collect()]
    ids = {r["id"] for r in rows}
    assert not any(i % 5 == 0 for i in ids)  # zero-dp events dropped
    for r in rows:
        times = [d["dataTime"] for d in r["datapoints"]]
        assert times == sorted(times)  # client time-sorts


def test_plain_list_fallback(spark, server):
    _Handler.paginated = False
    try:
        cfg = WebApiConfig(base_url=server, token="sekrit", page_size=5)
        assert probe_event_count(cfg) == N_EVENTS
        lines = webapi_events_ndjson(spark, cfg).collect()
        assert len(lines) == N_EVENTS
    finally:
        _Handler.paginated = True


def test_ingest_to_landing_roundtrip(tmp_path, spark, server):
    cfg = WebApiConfig(base_url=server, token="sekrit", page_size=5)
    df = ingest_webapi_to_landing(spark, cfg, str(tmp_path / "landing"))
    assert df.count() == N_EVENTS
    assert "id" in df.columns and "type" in df.columns


def test_unreachable_server_fails_with_context(spark):
    cfg = WebApiConfig(base_url="http://127.0.0.1:1", timeout_s=0.5)
    with pytest.raises(ConnectionError, match="web API request failed"):
        probe_event_count(cfg)


def test_write_mongodb_fail_fast_without_connector_jar(spark):
    """S8: PySpark ships no third-party connector jars, so the mongodb
    DataSource is unresolvable here; the sink must fail fast with the
    exact --packages remediation rather than a raw ClassNotFound."""
    from openseizuredatabase_spark.sources.connectors import write_mongodb

    df = spark.range(1).selectExpr("id AS event_id")
    with pytest.raises(NotImplementedError, match="mongo-spark-connector"):
        write_mongodb(df, "mongodb://localhost:27017", "osdb", "events")
