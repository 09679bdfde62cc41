"""HTTP/Arrow API server tests (reference ``api_server.py:165-209``)."""

from __future__ import annotations

import io
import json
import urllib.error
import urllib.request

import pytest

from sidemantic_spark.models.tpch import build_layer
from sidemantic_spark.server import SemanticHttpServer


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    layer = build_layer(spark, sf_dir)
    srv = SemanticHttpServer(layer, token="sekrit").start()
    yield srv
    srv.stop()


def _req(server, path, body=None, token="sekrit", raw=False):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        payload = resp.read()
    return payload if raw else json.loads(payload)


def test_health_and_auth(server):
    assert _req(server, "/health")["status"] == "ok"
    with pytest.raises(urllib.error.HTTPError) as exc:
        _req(server, "/health", token=None)
    assert exc.value.code == 401


def test_models_listing(server):
    models = _req(server, "/models")["models"]
    assert "orders" in models and "customer" in models
    names = {m["name"] for m in models["orders"]["metrics"]}
    assert "revenue" in names


def test_structured_query(server):
    rows = _req(server, "/query", {
        "metrics": ["orders.revenue", "orders.order_count"],
        "dimensions": ["orders.status"],
        "order_by": ["status"],
    })["rows"]
    assert [r["status"] for r in rows] == ["F", "O", "P"]
    assert all(r["order_count"] > 0 for r in rows)


def test_sql_endpoint(server):
    rows = _req(server, "/sql", {
        "sql": "SELECT orders.status, orders.order_count FROM orders ORDER BY orders.status",
    })["rows"]
    assert len(rows) == 3


def test_compile_endpoint(server):
    sql = _req(server, "/compile", {
        "metrics": ["orders.revenue"], "dimensions": ["orders.status"],
    })["sql"]
    assert "GROUP BY" in sql and "SUM" in sql


def test_arrow_endpoint(server):
    import pyarrow as pa

    payload = _req(server, "/query.arrow", {
        "metrics": ["orders.order_count"],
        "dimensions": ["orders.status"],
    }, raw=True)
    table = pa.ipc.open_stream(io.BytesIO(payload)).read_all()
    assert table.num_rows == 3
    assert set(table.column_names) == {"status", "order_count"}


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _req(server, "/query", {"metrics": ["orders.nope"]})
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _req(server, "/nope", {})
    assert exc.value.code == 404


def test_dashboard_and_chart_endpoint(server):
    """Web UI (reference api_server web UI) + /chart Vega-Lite endpoint."""
    text = _req(server, "/", raw=True).decode()
    assert "sidemantic-spark" in text and "vegaEmbed" in text

    spec = _req(server, "/chart", body={
        "metrics": ["orders.revenue"], "dimensions": ["orders.status"],
    })["vega_lite"]
    assert spec["mark"]["type"] == "bar"
    assert len(spec["data"]["values"]) == 3
