"""Language server for sidemantic-spark model files.

Re-expression of the reference's LSP (``lsp/server.py:619`` — pygls
based, YAML + Python definition documents). This environment has no
pygls, so the server speaks LSP's JSON-RPC with Content-Length framing
directly over stdio (same dependency-free approach as our MCP server).

Features (the reference's high-traffic subset):

- **diagnostics** on open/change: YAML parse errors and semantic
  validation (unknown metric refs, duplicate models, bad agg types),
  published as ``textDocument/publishDiagnostics``.
- **completions**: model-definition property keys in YAML context
  (``table:``, ``metrics:``, ``agg:`` values, ...) and
  ``model.field`` references in semantic-SQL documents.
- **hover**: field documentation for a ``model.field`` token, built
  from the parsed graph (type, agg, SQL expression, description).
- **documentSymbol**: models with nested dimension/metric symbols.

Run: ``python -m sidemantic_spark lsp`` (stdio).
"""

from __future__ import annotations

import json
import re
import sys

import yaml

from sidemantic_spark.core.model import Dimension, Metric, Model

# property completions per block type (dataclass field surface)
MODEL_KEYS = [
    "name", "table", "sql", "source_uri", "primary_key", "dimensions",
    "metrics", "relationships", "segments", "pre_aggregations",
    "default_time_dimension", "description", "row_filters", "extends",
]
DIMENSION_KEYS = [
    "name", "type", "sql", "granularity", "label", "description",
    "parent", "window", "public",
]
METRIC_KEYS = [
    "name", "agg", "sql", "type", "description", "label", "filters",
    "fill_nulls_with", "numerator", "denominator", "expr", "window",
    "grain_to_date", "base_metric", "comparison_type", "calculation",
    "entity", "base_event", "conversion_event", "conversion_window",
    "non_additive_dimension", "non_additive_window",
]
AGG_VALUES = [
    "sum", "count", "count_distinct", "approx_count_distinct", "avg",
    "min", "max", "median", "stddev", "stddev_pop", "variance",
    "variance_pop",
]
DIM_TYPE_VALUES = ["categorical", "time", "boolean", "numeric"]

_WORD_RE = re.compile(r"[\w.]+")


def parse_models(text: str) -> tuple[list[Model], list[dict]]:
    """(models, diagnostics) for a YAML model document. Diagnostics are
    LSP Diagnostic dicts; line attribution uses the YAML mark when
    available, else the first line mentioning the failing name."""
    diags: list[dict] = []
    models: list[Model] = []
    try:
        docs = [d for d in yaml.safe_load_all(text) if d]
    except yaml.YAMLError as exc:
        line = 0
        mark = getattr(exc, "problem_mark", None)
        if mark is not None:
            line = mark.line
        diags.append(_diag(line, f"YAML parse error: {exc}", severity=1))
        return [], diags

    def line_of(token: str) -> int:
        for i, ln in enumerate(text.splitlines()):
            if token in ln:
                return i
        return 0

    seen: set[str] = set()
    for doc in docs:
        specs = (doc.get("models") or []) if isinstance(doc, dict) else []
        for spec in specs:
            if not isinstance(spec, dict):
                continue  # mid-edit partial entries
            name = spec.get("name")
            if not name:
                diags.append(_diag(0, "model missing name", severity=1))
                continue
            if name in seen:
                diags.append(_diag(
                    line_of(name), f"duplicate model {name!r}", severity=1))
                continue
            seen.add(name)
            try:
                dims = [
                    Dimension(**d)
                    for d in spec.get("dimensions") or []
                    if isinstance(d, dict)
                ]
                mets = []
                for m in spec.get("metrics") or []:
                    if not isinstance(m, dict):
                        continue  # mid-edit partial entries
                    agg = m.get("agg")
                    if agg is not None and agg not in AGG_VALUES:
                        diags.append(_diag(
                            line_of(str(agg)),
                            f"unknown agg {agg!r} (metric {m.get('name')!r})",
                            severity=1,
                        ))
                        continue
                    mets.append(Metric(**{
                        k: v for k, v in m.items() if k in METRIC_KEYS
                    }))
                models.append(Model(
                    name=name,
                    table=spec.get("table"),
                    sql=spec.get("sql"),
                    source_uri=spec.get("source_uri"),
                    primary_key=spec.get("primary_key", "id"),
                    dimensions=dims,
                    metrics=mets,
                    description=spec.get("description"),
                ))
            except TypeError as exc:
                diags.append(_diag(
                    line_of(name), f"model {name!r}: {exc}", severity=1))
    # reference-style semantic checks: derived metrics referencing
    # unknown fields
    known = {
        f"{m.name}.{x.name}" for m in models for x in (m.metrics + m.dimensions)
    } | {x.name for m in models for x in (m.metrics + m.dimensions)}
    for m in models:
        for met in m.metrics:
            if met.type == "derived" and met.expr:
                for tok in re.findall(r"[a-zA-Z_]\w*", met.expr):
                    if tok.isupper() or tok in known or not tok.isidentifier():
                        continue
                    if tok.lower() in ("nullif", "coalesce", "case", "when",
                                       "then", "else", "end", "and", "or",
                                       "not", "null", "cast", "as", "double"):
                        continue
                    diags.append(_diag(
                        0,
                        f"derived metric {m.name}.{met.name} references "
                        f"unknown field {tok!r}",
                        severity=2,
                    ))
    return models, diags


def _diag(line: int, message: str, severity: int = 1) -> dict:
    return {
        "range": {"start": {"line": line, "character": 0},
                  "end": {"line": line, "character": 200}},
        "message": message,
        "severity": severity,
        "source": "sidemantic-spark",
    }


def completions_for(text: str, line: int, character: int) -> list[dict]:
    """Context-aware completion items."""
    lines = text.splitlines()
    cur = lines[line][:character] if line < len(lines) else ""
    models, _ = parse_models(text)

    def items(names, kind=5, detail=None):
        return [{"label": n, "kind": kind, "detail": detail} for n in names]

    stripped = cur.strip()
    # value positions
    if re.search(r"\bagg:\s*\w*$", stripped):
        return items(AGG_VALUES, kind=12, detail="aggregation")
    if re.search(r"\btype:\s*\w*$", stripped):
        return items(DIM_TYPE_VALUES, kind=12, detail="dimension type")
    # `model.` prefix -> field completions (semantic SQL or filters)
    m = re.search(r"(\w+)\.(\w*)$", cur)
    if m and models:
        model = next((x for x in models if x.name == m.group(1)), None)
        if model is not None:
            fields = [d.name for d in model.dimensions] + [
                mm.name for mm in model.metrics
            ]
            return items(
                [f for f in fields if f.startswith(m.group(2))],
                kind=5, detail=model.name,
            )
    # key position inside a block: offer the surrounding block's keys
    block = _enclosing_block(lines, line)
    keys = {"models": MODEL_KEYS, "dimensions": DIMENSION_KEYS,
            "metrics": METRIC_KEYS}.get(block, MODEL_KEYS)
    prefix = stripped.lstrip("- ").rstrip(":")
    return items([k for k in keys if k.startswith(prefix)], kind=10,
                 detail=block or "model")


def _enclosing_block(lines: list[str], line: int) -> str | None:
    indent = None
    for i in range(min(line, len(lines) - 1), -1, -1):
        ln = lines[i]
        if not ln.strip():
            continue
        ind = len(ln) - len(ln.lstrip())
        if indent is None:
            indent = ind
        if ind < indent and ln.strip().rstrip(":") in (
            "dimensions", "metrics", "models", "relationships", "segments"
        ):
            return ln.strip().rstrip(":")
    return None


def hover_for(text: str, line: int, character: int) -> str | None:
    """Markdown hover for the model.field token under the cursor."""
    lines = text.splitlines()
    if line >= len(lines):
        return None
    ln = lines[line]
    for m in _WORD_RE.finditer(ln):
        if m.start() <= character <= m.end():
            word = m.group(0)
            break
    else:
        return None
    models, _ = parse_models(text)
    target_model, field = None, word
    if "." in word:
        mn, field = word.split(".", 1)
        target_model = next((x for x in models if x.name == mn), None)
        candidates = [target_model] if target_model else []
    else:
        candidates = models
    for model in candidates:
        d = model.dimension(field)
        if d is not None:
            out = f"**{model.name}.{d.name}** — {d.type} dimension"
            if d.sql:
                out += f"\n\n`{d.sql}`"
            if d.description:
                out += f"\n\n{d.description}"
            return out
        mt = model.metric(field)
        if mt is not None:
            kind = mt.type or f"{mt.agg} aggregate"
            out = f"**{model.name}.{mt.name}** — {kind}"
            if mt.sql:
                out += f"\n\n`{mt.sql}`"
            if mt.expr:
                out += f"\n\n`{mt.expr}`"
            if mt.description:
                out += f"\n\n{mt.description}"
            return out
        if model.name == word:
            binding = model.table or model.source_uri or "(derived sql)"
            return (
                f"**{model.name}** — model over `{binding}`; "
                f"{len(model.dimensions)} dimensions, "
                f"{len(model.metrics)} metrics"
            )
    return None


def document_symbols(text: str) -> list[dict]:
    models, _ = parse_models(text)
    lines = text.splitlines()

    def line_of(token: str) -> int:
        for i, ln in enumerate(lines):
            if token in ln:
                return i
        return 0

    def sym(name: str, kind: int, line: int, children=None) -> dict:
        rng = {"start": {"line": line, "character": 0},
               "end": {"line": line, "character": 200}}
        out = {"name": name, "kind": kind, "range": rng,
               "selectionRange": rng}
        if children:
            out["children"] = children
        return out

    out = []
    for m in models:
        children = [sym(d.name, 8, line_of(d.name)) for d in m.dimensions]
        children += [sym(x.name, 12, line_of(x.name)) for x in m.metrics]
        out.append(sym(m.name, 5, line_of(m.name), children))
    return out


def _word_at(text: str, line: int, character: int) -> str | None:
    lines = text.splitlines()
    if line >= len(lines):
        return None
    for m in _WORD_RE.finditer(lines[line]):
        if m.start() <= character <= m.end():
            return m.group(0)
    return None


def _definition_lines(text: str) -> list[tuple[str, int, int, int]]:
    """(name, line, start_char, end_char) for every ``name: X`` and
    ``- name: X`` declaration in document order."""
    out = []
    for i, ln in enumerate(text.splitlines()):
        m = re.match(r"^\s*-?\s*name:\s*([\w.]+)\s*$", ln)
        if m:
            out.append((m.group(1), i, ln.index(m.group(1)), ln.index(m.group(1)) + len(m.group(1))))
    return out


def _rng(line: int, start: int, end: int) -> dict:
    return {"start": {"line": line, "character": start},
            "end": {"line": line, "character": end}}


def definition_for(text: str, line: int, character: int) -> dict | None:
    """Range of the ``name:`` declaration for the token under the
    cursor. ``model.field`` resolves the field part; lookup is
    case-insensitive (ref lsp/server.py find_definition_by_name)."""
    word = _word_at(text, line, character)
    if not word:
        return None
    target = word.rsplit(".", 1)[-1].lower()
    for name, dline, s, e in _definition_lines(text):
        if name.lower() == target:
            return _rng(dline, s, e)
    return None


def references_for(
    text: str, line: int, character: int, include_declaration: bool = True
) -> list[dict]:
    """Whole-word occurrence ranges of the token under the cursor.
    The ``name:`` declaration line is included only when asked (LSP
    ``context.includeDeclaration``)."""
    word = _word_at(text, line, character)
    if not word:
        return []
    target = word.rsplit(".", 1)[-1]
    decl_lines = {
        dline for name, dline, _, _ in _definition_lines(text)
        if name.lower() == target.lower()
    }
    pat = re.compile(rf"(?<![\w.]){re.escape(target)}(?![\w])")
    out = []
    for i, ln in enumerate(text.splitlines()):
        for m in pat.finditer(ln):
            if i in decl_lines and not include_declaration:
                continue
            out.append(_rng(i, m.start(), m.end()))
    return out


# renaming a structural key would corrupt the document, not the model
_RENAME_KEYWORDS = frozenset(
    MODEL_KEYS + DIMENSION_KEYS + METRIC_KEYS
    + ["models", "dimensions", "metrics", "relationships", "segments"]
)


def rename_edits(
    text: str, line: int, character: int, new_name: str
) -> list[dict] | None:
    """TextEdits renaming every whole-word occurrence of the symbol
    under the cursor. Refuses YAML structure keywords and invalid new
    names (ref lsp/server.py build_rename_workspace_edit)."""
    word = _word_at(text, line, character)
    if not word or "." in word:
        word = word.rsplit(".", 1)[-1] if word else None
    if not word or word in _RENAME_KEYWORDS:
        return None
    if not re.fullmatch(r"[A-Za-z_]\w*", new_name or ""):
        return None
    pat = re.compile(rf"(?<![\w.]){re.escape(word)}(?![\w])")
    edits = [
        {"range": _rng(i, m.start(), m.end()), "newText": new_name}
        for i, ln in enumerate(text.splitlines())
        for m in pat.finditer(ln)
    ]
    return edits or None


_SIGNATURES = {
    "models": ("model(name, table|sql, primary_key, dimensions, metrics, ...)",
               MODEL_KEYS),
    "dimensions": ("dimension(name, type, sql, granularity, ...)",
                   DIMENSION_KEYS),
    "metrics": ("metric(name, agg|type, sql, filters, ...)", METRIC_KEYS),
}


def signature_help(text: str, line: int) -> dict | None:
    """Block-contextual signature: the enclosing definition's field
    surface (ref lsp/server.py build_signature_help)."""
    block = _enclosing_block(text.splitlines(), line) or "models"
    sig = _SIGNATURES.get(block)
    if sig is None:
        return None
    label, keys = sig
    return {
        "signatures": [{
            "label": label,
            "parameters": [{"label": k} for k in keys],
        }],
        "activeSignature": 0,
        "activeParameter": 0,
    }


class LspServer:
    """Content-Length framed JSON-RPC loop over stdio."""

    def __init__(self) -> None:
        self.docs: dict[str, str] = {}

    # -- request handling ---------------------------------------------

    def handle(self, msg: dict) -> dict | None:
        method = msg.get("method")
        msg_id = msg.get("id")
        params = msg.get("params") or {}
        if method == "initialize":
            return self._result(msg_id, {
                "capabilities": {
                    "textDocumentSync": 1,  # full
                    "completionProvider": {"triggerCharacters": [".", ":"]},
                    "hoverProvider": True,
                    "documentSymbolProvider": True,
                    "definitionProvider": True,
                    "referencesProvider": True,
                    "renameProvider": True,
                    "signatureHelpProvider": {"triggerCharacters": [":", " "]},
                },
                "serverInfo": {"name": "sidemantic-spark-lsp", "version": "1.0"},
            })
        if method in ("initialized", "exit", "$/cancelRequest"):
            return None
        if method == "shutdown":
            return self._result(msg_id, None)
        if method == "sidemantic/schema":
            # JSON Schema of the YAML authoring surface (ref schema.py
            # generate_yaml_schema, served for editor completion — pair
            # with the yaml-language-server $schema directive)
            from sidemantic_spark.authoring.schema import generate_yaml_schema

            return self._result(msg_id, generate_yaml_schema())
        if method in ("textDocument/didOpen", "textDocument/didChange"):
            td = params.get("textDocument") or {}
            uri = td.get("uri")
            if method == "textDocument/didOpen":
                text = td.get("text", "")
            else:
                changes = params.get("contentChanges") or [{}]
                text = changes[-1].get("text", "")
            self.docs[uri] = text
            _models, diags = parse_models(text)
            return {  # server-initiated notification
                "jsonrpc": "2.0",
                "method": "textDocument/publishDiagnostics",
                "params": {"uri": uri, "diagnostics": diags},
            }
        if method == "textDocument/completion":
            uri = (params.get("textDocument") or {}).get("uri")
            pos = params.get("position") or {}
            items = completions_for(
                self.docs.get(uri, ""), pos.get("line", 0),
                pos.get("character", 0),
            )
            return self._result(msg_id, {"isIncomplete": False, "items": items})
        if method == "textDocument/hover":
            uri = (params.get("textDocument") or {}).get("uri")
            pos = params.get("position") or {}
            md = hover_for(self.docs.get(uri, ""), pos.get("line", 0),
                           pos.get("character", 0))
            if md is None:
                return self._result(msg_id, None)
            return self._result(msg_id, {
                "contents": {"kind": "markdown", "value": md}
            })
        if method == "textDocument/documentSymbol":
            uri = (params.get("textDocument") or {}).get("uri")
            return self._result(msg_id, document_symbols(self.docs.get(uri, "")))
        if method == "textDocument/definition":
            uri = (params.get("textDocument") or {}).get("uri")
            pos = params.get("position") or {}
            rng = definition_for(self.docs.get(uri, ""), pos.get("line", 0),
                                 pos.get("character", 0))
            if rng is None:
                return self._result(msg_id, None)
            return self._result(msg_id, {"uri": uri, "range": rng})
        if method == "textDocument/references":
            uri = (params.get("textDocument") or {}).get("uri")
            pos = params.get("position") or {}
            include = bool((params.get("context") or {}).get(
                "includeDeclaration", True))
            locs = references_for(
                self.docs.get(uri, ""), pos.get("line", 0),
                pos.get("character", 0), include_declaration=include)
            return self._result(
                msg_id, [{"uri": uri, "range": r} for r in locs])
        if method == "textDocument/rename":
            uri = (params.get("textDocument") or {}).get("uri")
            pos = params.get("position") or {}
            edits = rename_edits(
                self.docs.get(uri, ""), pos.get("line", 0),
                pos.get("character", 0), params.get("newName", ""))
            if edits is None:
                return self._result(msg_id, None)
            return self._result(msg_id, {"changes": {uri: edits}})
        if method == "textDocument/signatureHelp":
            uri = (params.get("textDocument") or {}).get("uri")
            pos = params.get("position") or {}
            return self._result(
                msg_id, signature_help(self.docs.get(uri, ""),
                                       pos.get("line", 0)))
        if msg_id is not None:
            return self._error(msg_id, -32601, f"method not found: {method}")
        return None

    @staticmethod
    def _result(msg_id, result) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    @staticmethod
    def _error(msg_id, code: int, message: str) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id,
                "error": {"code": code, "message": message}}

    # -- stdio transport ----------------------------------------------

    def serve_stdio(self, stdin=None, stdout=None) -> None:
        stdin = stdin or sys.stdin.buffer
        stdout = stdout or sys.stdout.buffer
        while True:
            headers = {}
            while True:
                line = stdin.readline()
                if not line:
                    return
                line = line.decode().strip()
                if not line:
                    break
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers.get("content-length", 0))
            if length <= 0:
                continue
            body = stdin.read(length)
            try:
                msg = json.loads(body)
            except json.JSONDecodeError:
                continue
            if msg.get("method") == "exit":
                return
            resp = self.handle(msg)
            if resp is not None:
                payload = json.dumps(resp).encode()
                stdout.write(
                    f"Content-Length: {len(payload)}\r\n\r\n".encode() + payload
                )
                stdout.flush()
