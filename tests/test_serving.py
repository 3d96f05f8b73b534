"""HTTP serving layer (serving.py vs reference serving/_fastapi.py):
live-server tests over a real catalog — list/metadata/rows/insert/query
routes, typed error mapping."""

from __future__ import annotations

import http.client
import json

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.serving import TableServer


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    cat = pxt.Catalog(spark, str(tmp_path_factory.mktemp("store")))
    t = cat.create_table("films", {"name": pxt.String(False),
                                   "revenue": pxt.Float()},
                         primary_key=["name"])
    t.insert([{"name": "alien", "revenue": 100.0},
              {"name": "brazil", "revenue": 50.0},
              {"name": "clue", "revenue": 75.0}])
    srv = TableServer(cat).start()
    yield srv
    srv.stop()


def _req(server, method, path, body=None):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    payload = json.dumps(body) if body is not None else None
    headers = {"Content-Type": "application/json"} if payload else {}
    conn.request(method, path, body=payload, headers=headers)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


class TestServing:
    def test_health_and_list(self, server):
        assert _req(server, "GET", "/health") == (200, {"status": "ok"})
        status, data = _req(server, "GET", "/tables")
        assert status == 200 and "films" in data["tables"]

    def test_metadata(self, server):
        status, md = _req(server, "GET", "/tables/films")
        assert status == 200
        assert md["kind"] == "table" and md["primary_key"] == ["name"]
        assert md["columns"]["revenue"]["type_"] == "float"

    def test_rows_and_query(self, server):
        status, data = _req(server, "GET", "/tables/films/rows?limit=2")
        assert status == 200 and len(data["rows"]) == 2
        status, data = _req(server, "POST", "/tables/films/query",
                            {"where": {"name": "clue"},
                             "select": ["revenue"]})
        assert status == 200 and data["rows"] == [{"revenue": 75.0}]

    def test_insert_roundtrip(self, server):
        status, st = _req(server, "POST", "/tables/films/insert",
                          {"rows": [{"name": "dune", "revenue": 400.0}]})
        assert status == 200 and st["num_rows"] == 1 and st["op"] == "insert"
        status, data = _req(server, "POST", "/tables/films/query",
                            {"where": {"name": "dune"}})
        assert status == 200 and data["rows"][0]["revenue"] == 400.0

    def test_dashboard_html(self, server):
        import http.client
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=30)
        conn.request("GET", "/")
        resp = conn.getresponse()
        body = resp.read().decode()
        conn.close()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/html")
        assert "<html>" in body and "/tables" in body  # live JS API wiring
        # /dashboard alias serves the same page
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=30)
        conn.request("GET", "/dashboard")
        assert conn.getresponse().status == 200
        conn.close()

    def test_history_route(self, server):
        status, data = _req(server, "GET", "/tables/films/history")
        assert status == 200
        assert len(data["versions"]) >= 1
        assert any("version" in v for v in data["versions"])

    def test_errors(self, server):
        status, err = _req(server, "GET", "/tables/missing")
        assert status == 404 and "error" in err
        status, err = _req(server, "GET", "/nope")
        assert status == 404
