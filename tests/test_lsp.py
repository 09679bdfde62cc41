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


def test_definition_and_references():
    from sidemantic_spark.server.lsp import definition_for, references_for

    lines = DOC.splitlines()
    # "revenue" appears declared at its `- name: revenue` line
    decl_line = next(i for i, ln in enumerate(lines) if "name: revenue" in ln)
    # put a reference in a derived metric and resolve from there
    doc = DOC + """\
      - name: rev_share
        type: derived
        expr: revenue / order_count
"""
    ref_line = len(doc.splitlines()) - 1
    col = doc.splitlines()[ref_line].index("revenue") + 1
    rng = definition_for(doc, ref_line, col)
    assert rng is not None and rng["start"]["line"] == decl_line

    # case-insensitive lookup (ref lsp/server.py find_definition_by_name)
    rng2 = definition_for(doc.replace("expr: revenue /", "expr: REVENUE /"),
                          ref_line, col)
    assert rng2 is None or rng2["start"]["line"] == decl_line  # REVENUE token
    assert definition_for(doc, ref_line, doc.splitlines()[ref_line].index("order_count") + 1) is not None

    refs_incl = references_for(doc, ref_line, col, include_declaration=True)
    refs_excl = references_for(doc, ref_line, col, include_declaration=False)
    assert len(refs_incl) == len(refs_excl) + 1
    assert all(r["start"]["line"] != decl_line for r in refs_excl)


def test_rename_and_keyword_guard():
    from sidemantic_spark.server.lsp import rename_edits

    doc = DOC + """\
      - name: rev_share
        type: derived
        expr: revenue / order_count
"""
    ref_line = len(doc.splitlines()) - 1
    col = doc.splitlines()[ref_line].index("revenue") + 1
    edits = rename_edits(doc, ref_line, col, "gross_revenue")
    assert edits and len(edits) == doc.count("revenue") - doc.count("revenue_")  # whole words only
    # applying the edits yields no leftover whole-word 'revenue'
    new_lines = doc.splitlines()
    for e in sorted(edits, key=lambda e: (e["range"]["start"]["line"],
                                          -e["range"]["start"]["character"])):
        ln = e["range"]["start"]["line"]
        s, t = e["range"]["start"]["character"], e["range"]["end"]["character"]
        new_lines[ln] = new_lines[ln][:s] + e["newText"] + new_lines[ln][t:]
    joined = "\n".join(new_lines)
    import re as _re
    assert not _re.search(r"(?<![\w.])revenue(?![\w])", joined)

    # structural keywords are refused (ref build_rename_workspace_edit
    # skips keywords); so are invalid new names
    kw_line = next(i for i, ln in enumerate(doc.splitlines()) if ln.strip() == "metrics:")
    kw_col = doc.splitlines()[kw_line].index("metrics") + 1
    assert rename_edits(doc, kw_line, kw_col, "things") is None
    assert rename_edits(doc, ref_line, col, "1bad name") is None


def test_signature_help_contexts():
    from sidemantic_spark.server.lsp import signature_help

    lines = DOC.splitlines()
    in_metric = next(i for i, ln in enumerate(lines) if "agg: sum" in ln)
    sh = signature_help(DOC, in_metric)
    assert sh and "metric(" in sh["signatures"][0]["label"]
    params = [p["label"] for p in sh["signatures"][0]["parameters"]]
    assert "agg" in params and "filters" in params

    in_dim = next(i for i, ln in enumerate(lines) if "sql: o_orderstatus" in ln)
    sh = signature_help(DOC, in_dim)
    assert sh and "dimension(" in sh["signatures"][0]["label"]


def test_server_dispatch_new_methods():
    srv = LspServer()
    init = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}})
    caps = init["result"]["capabilities"]
    for cap in ("definitionProvider", "referencesProvider", "renameProvider",
                "signatureHelpProvider"):
        assert caps.get(cap), cap

    doc = DOC + """\
      - name: rev_share
        type: derived
        expr: revenue / order_count
"""
    srv.handle({"jsonrpc": "2.0", "method": "textDocument/didOpen",
                "params": {"textDocument": {"uri": "u", "text": doc}}})
    ref_line = len(doc.splitlines()) - 1
    col = doc.splitlines()[ref_line].index("revenue") + 1
    pos = {"line": ref_line, "character": col}

    r = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "textDocument/definition",
                    "params": {"textDocument": {"uri": "u"}, "position": pos}})
    assert r["result"]["uri"] == "u"

    r = srv.handle({"jsonrpc": "2.0", "id": 3, "method": "textDocument/references",
                    "params": {"textDocument": {"uri": "u"}, "position": pos,
                               "context": {"includeDeclaration": False}}})
    assert r["result"] and all(loc["uri"] == "u" for loc in r["result"])

    r = srv.handle({"jsonrpc": "2.0", "id": 4, "method": "textDocument/rename",
                    "params": {"textDocument": {"uri": "u"}, "position": pos,
                               "newName": "net_revenue"}})
    assert r["result"]["changes"]["u"]

    r = srv.handle({"jsonrpc": "2.0", "id": 5, "method": "textDocument/signatureHelp",
                    "params": {"textDocument": {"uri": "u"},
                               "position": {"line": ref_line, "character": 0}}})
    assert r["result"]["signatures"]


# ---------------------------------------------------------------------------
# JSON Schema generation (r11 VERDICT optional ask #6; ref schema.py)
# ---------------------------------------------------------------------------


def test_yaml_schema_matches_loader_surface():
    """The generated schema's property sets ARE the loader's key
    allowlists — the editor can never suggest a key load_yaml rejects,
    and a new loader key automatically appears in the schema."""
    from sidemantic_spark.authoring import yaml_io
    from sidemantic_spark.authoring.schema import generate_yaml_schema

    schema = generate_yaml_schema()
    defs = schema["$defs"]
    for title, allowed in (
        ("Model", yaml_io._MODEL_KEYS),
        ("Dimension", yaml_io._DIM_KEYS),
        ("Metric", yaml_io._METRIC_KEYS),
        ("Relationship", yaml_io._REL_KEYS),
        ("Segment", yaml_io._SEG_KEYS),
        ("Parameter", yaml_io._PARAM_KEYS),
        ("SecurityPolicy", yaml_io._SECURITY_KEYS),
        ("Freshness", yaml_io._FRESHNESS_KEYS),
        ("Deprecation", yaml_io._DEPRECATION_KEYS),
        ("PreAggregation", yaml_io._PREAGG_KEYS),
    ):
        assert set(defs[title]["properties"]) == set(allowed), title
    # enum surfaces track the engine's constants
    from sidemantic_spark.core.model import SIMPLE_AGGS

    aggs = defs["Metric"]["properties"]["agg"]["anyOf"][0]["enum"]
    assert set(aggs) == set(SIMPLE_AGGS)
    grains = defs["Dimension"]["properties"]["granularity"]["enum"]
    assert set(grains) == yaml_io._GRAINS


def test_yaml_schema_validates_real_document():
    """A real model document validates; an unknown metric key fails
    (additionalProperties: false mirrors the loader's _check_keys)."""
    import jsonschema
    import yaml as _yaml

    from sidemantic_spark.authoring.schema import generate_yaml_schema

    schema = generate_yaml_schema()
    doc = _yaml.safe_load(DOC)
    jsonschema.validate(doc, schema)

    bad = _yaml.safe_load(DOC)
    bad["models"][0]["metrics"][0]["not_a_real_key"] = 1
    import pytest as _pytest

    with _pytest.raises(jsonschema.ValidationError):
        jsonschema.validate(bad, schema)
    # a document with no models is rejected (required: [models])
    with _pytest.raises(jsonschema.ValidationError):
        jsonschema.validate({"metrics": []}, schema)


def test_lsp_serves_schema_and_completions_agree():
    """End-to-end: the sidemantic/schema request returns the schema, and
    every property the LSP offers as a completion inside a metrics
    block is a key the schema (and therefore the loader) accepts."""
    from sidemantic_spark.server.lsp import METRIC_KEYS

    srv = LspServer()
    r = srv.handle({"jsonrpc": "2.0", "id": 9, "method": "sidemantic/schema",
                    "params": {}})
    schema = r["result"]
    assert schema["$schema"].startswith("http://json-schema.org/")
    metric_props = set(schema["$defs"]["Metric"]["properties"])
    assert set(METRIC_KEYS) <= metric_props

    # completion e2e: inside the metrics block the offered property
    # names are all schema-valid keys
    srv.handle({"jsonrpc": "2.0", "method": "textDocument/didOpen",
                "params": {"textDocument": {"uri": "s", "text": DOC}}})
    lines = DOC.splitlines()
    metric_line = next(
        i for i, ln in enumerate(lines) if "agg: sum" in ln
    )
    r = srv.handle({"jsonrpc": "2.0", "id": 10,
                    "method": "textDocument/completion",
                    "params": {"textDocument": {"uri": "s"},
                               "position": {"line": metric_line,
                                            "character": 8}}})
    labels = {item["label"] for item in r["result"]["items"]}
    prop_labels = labels & metric_props
    assert "fill_nulls_with" in prop_labels or "agg" in prop_labels
    assert prop_labels <= metric_props
