"""Cross-surface equivalence (reference
tests/core/test_cross_surface_equivalence.py): the same semantic query
must return identical rows through every surface — structured Python
API, semantic SQL, MCP tool, and HTTP endpoint. Guards against a
surface applying its own defaults/limits/coercions.
"""

from __future__ import annotations

import json

import pytest

from sidemantic_spark.models.tpch import build_layer

METRICS = ["orders.revenue", "orders.order_count"]
DIMS = ["orders.status"]
SQL = (
    "SELECT orders.status, orders.revenue, orders.order_count FROM orders"
)


@pytest.fixture(scope="module")
def layer(spark, sf_dir):
    return build_layer(spark, sf_dir)


def _canon(rows: list[dict]) -> list[tuple]:
    out = []
    for r in rows:
        out.append((
            r["status"],
            round(float(r["revenue"]), 2),
            int(r["order_count"]),
        ))
    return sorted(out)


def test_all_surfaces_agree(layer):
    api_rows = _canon([r.asDict() for r in layer.query(
        metrics=METRICS, dimensions=DIMS).collect()])
    sql_rows = _canon([r.asDict() for r in layer.sql(SQL).collect()])

    from sidemantic_spark.server.mcp import McpServer

    mcp = McpServer(layer)
    resp = mcp.handle({
        "jsonrpc": "2.0", "id": 1, "method": "tools/call",
        "params": {"name": "run_query",
                   "arguments": {"metrics": METRICS, "dimensions": DIMS}},
    })
    mcp_rows = _canon(
        json.loads(resp["result"]["content"][0]["text"])["rows"]
    )

    from sidemantic_spark.server.http_api import SemanticHttpServer

    srv = SemanticHttpServer(layer).start()
    try:
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=json.dumps({"metrics": METRICS, "dimensions": DIMS}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            http_rows = _canon(json.loads(r.read())["rows"])
    finally:
        srv.stop()

    assert api_rows == sql_rows == mcp_rows == http_rows
    assert len(api_rows) == 3
