"""Language-server tests (reference lsp/server.py surface): the
JSON-RPC handlers are exercised directly plus one full stdio-framing
roundtrip.

No Spark session needed — the LSP operates on model documents only.
"""

from __future__ import annotations

import io
import json

from sidemantic_spark.server.lsp import (
    LspServer,
    completions_for,
    document_symbols,
    hover_for,
    parse_models,
)

DOC = """\
models:
  - name: orders
    table: orders
    primary_key: o_orderkey
    dimensions:
      - name: status
        sql: o_orderstatus
      - name: order_date
        sql: o_orderdate
        type: time
    metrics:
      - name: revenue
        agg: sum
        sql: o_totalprice
        description: total order value
      - name: order_count
        agg: count
"""


def test_parse_models_and_diagnostics():
    models, diags = parse_models(DOC)
    assert [m.name for m in models] == ["orders"]
    assert diags == []

    # bad agg -> error diagnostic on the offending line
    bad = DOC.replace("agg: sum", "agg: summ")
    models, diags = parse_models(bad)
    assert any("summ" in d["message"] for d in diags)
    line = next(d for d in diags if "summ" in d["message"])["range"]["start"]["line"]
    assert "summ" in bad.splitlines()[line]

    # YAML syntax error
    _, diags = parse_models("models:\n  - name: x\n   bad_indent: 1\n")
    assert diags and "YAML" in diags[0]["message"]

    # derived metric referencing an unknown field -> warning
    der = DOC + """\
      - name: bogus_share
        type: derived
        expr: revenue / missing_metric
"""
    _, diags = parse_models(der)
    assert any("missing_metric" in d["message"] and d["severity"] == 2
               for d in diags)


def test_completions_contexts():
    # agg value completion
    doc = DOC + "      - name: x\n        agg: "
    lines = doc.splitlines()
    items = completions_for(doc, len(lines) - 1, len(lines[-1]))
    assert {i["label"] for i in items} >= {"sum", "count_distinct", "median"}

    # model.field completion in a filter/sql position
    doc2 = DOC + "# orders.re"
    lines = doc2.splitlines()
    items = completions_for(doc2, len(lines) - 1, len(lines[-1]))
    assert [i["label"] for i in items] == ["revenue"]

    # metric-block key completion
    doc3 = DOC + "      - na"
    lines = doc3.splitlines()
    items = completions_for(doc3, len(lines) - 1, len(lines[-1]))
    assert "name" in [i["label"] for i in items]


def test_hover_and_symbols():
    md = hover_for(DOC, DOC.splitlines().index("      - name: revenue"), 16)
    assert md and "sum aggregate" in md and "o_totalprice" in md
    syms = document_symbols(DOC)
    assert syms[0]["name"] == "orders"
    child_names = {c["name"] for c in syms[0]["children"]}
    assert child_names == {"status", "order_date", "revenue", "order_count"}


def test_lsp_rpc_flow_and_stdio_framing():
    srv = LspServer()
    init = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                       "params": {}})
    caps = init["result"]["capabilities"]
    assert caps["hoverProvider"] and caps["completionProvider"]

    note = srv.handle({
        "jsonrpc": "2.0", "method": "textDocument/didOpen",
        "params": {"textDocument": {"uri": "file:///m.yml",
                                    "text": DOC.replace("agg: sum", "agg: summ")}},
    })
    assert note["method"] == "textDocument/publishDiagnostics"
    assert note["params"]["diagnostics"]

    comp = srv.handle({
        "jsonrpc": "2.0", "id": 2, "method": "textDocument/completion",
        "params": {"textDocument": {"uri": "file:///m.yml"},
                   "position": {"line": 0, "character": 0}},
    })
    assert comp["result"]["items"]

    # stdio framing roundtrip
    msgs = [
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "id": 2, "method": "shutdown"},
        {"jsonrpc": "2.0", "method": "exit"},
    ]
    buf = b"".join(
        f"Content-Length: {len(json.dumps(m).encode())}\r\n\r\n".encode()
        + json.dumps(m).encode()
        for m in msgs
    )
    out = io.BytesIO()
    LspServer().serve_stdio(stdin=io.BytesIO(buf), stdout=out)
    raw = out.getvalue().decode()
    assert "sidemantic-spark-lsp" in raw
    assert raw.count("Content-Length") == 2  # initialize + shutdown replies
