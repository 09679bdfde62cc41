"""Graphene GSQL importer.

Clean-room importer for the documented ``.gsql`` model syntax, like the
reference's (``adapters/graphene.py``, itself a clean-room compatibility
parser; this one is an independent scanner — no grammar is vendored).

Statements:

- ``table name ( ... )`` / ``table name from source ( ... )`` — physical
  model with typed columns, computed fields, joins and measures
- ``table name as ( <gsql query> )`` — derived-table view; the body is
  kept verbatim as the model SQL (GSQL clause order, CTEs and ``$page``
  input placeholders included) and the projection's output aliases
  become queryable dimensions (ref ``graphene.py`` view tests)
- ``extend name ( ... )`` — adds fields/joins to an existing model
- anything else (example queries after the models) is ignored

Body items (split at top level so multi-line ``case`` expressions and
parameterized types with internal commas stay whole):

- ``col TYPE [primary_key] [#key=value ...] [-- comment]`` — dimension
  typed from the declared type; explicit ``primary_key`` markers beat
  inference (composite allowed); the verbatim type is retained under
  ``meta["graphene"]["data_type"]``
- ``name: expr`` — measure when the expression aggregates or references
  other measures (order-independent), else a dimension typed from the
  expression (comparison -> boolean, arithmetic -> numeric,
  date-shaped -> time); computed dimensions referenced inside measures
  are inlined; ``pNN(x)`` percentile shorthand becomes an exact
  ordered-set aggregate
- ``agg(expr) as name`` — measure
- ``join one|many|cross target [as alias] [on cond]`` — relationship;
  composite equi-keys supported; an alias creates a role model cloned
  from the target; non-equi/unresolvable conditions are retained under
  ``meta["graphene"]["unsupported_joins"]`` and not planned

Annotations: ``#currency=X`` -> value_format_name, ``#ratio``/``#pct``
-> percent, ``#timeGrain`` -> granularity, ``#description="..."`` ->
description; all annotations are retained verbatim under
``meta["graphene"]["annotations"]``. ``--`` comments become
descriptions (a leading block names the model). ``#``/``--`` inside
string literals are preserved.
"""

from __future__ import annotations

import copy
import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_GRANULARITIES = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


def _skip_string(s: str, i: int) -> int:
    """Index past the single-quoted literal opening at ``i`` (SQL ``''``
    doubling and backslash escapes honored)."""
    n = len(s)
    i += 1
    while i < n:
        if s[i] == "\\":
            i += 2
            continue
        if s[i] == "'":
            if i + 1 < n and s[i + 1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    return n

_STMT_RE = re.compile(
    r"^[ \t]*(table|extend)\s+(\w+)"
    r"(?:\s+from\s+([\w.]+))?(\s+as)?\s*\(",
    re.M | re.I,
)

_TYPE_TOKEN = (
    r"(?:u?int(?:eger|8|16|32|64)?|bigint|smallint|tinyint|serial|"
    r"float(?:4|8|16|32|64)?|double|real|numeric|decimal|number|"
    r"string|varchar|char|text|bool(?:ean)?|timestamp(?:tz)?|datetime|"
    r"date|time|array|struct|map|list|json|uuid|binary|bytes|variant|"
    r"interval|geography)"
)
_COLUMN_RE = re.compile(
    rf"^(\w+)\s+({_TYPE_TOKEN}(?:<.*>|\([^)]*\))?)"
    rf"(\s+primary_key)?\s*$",
    re.I,
)
_JOIN_RE = re.compile(
    r"^join\s+(one|many|cross)\s+([\w.]+)(?:\s+as\s+(\w+))?"
    r"(?:\s+on\s+(.+))?$",
    re.I | re.S,
)
_NAMED_RE = re.compile(r"^(\w+)\s*:\s*(.+)$", re.S)
_AS_MEASURE_RE = re.compile(r"^(\w[\w.]*\s*\(.*\))\s+as\s+(\w+)\s*$", re.I | re.S)
_ANNOT_RE = re.compile(
    r"#([A-Za-z][\w-]*)(?:\s*=\s*(\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'|[^\s#]+))?"
)
_AGG_CALL_RE = re.compile(
    r"\b(sum|count|count_distinct|approx_count_distinct|avg|min|max|"
    r"median|mode|stddev|stddev_pop|variance|variance_pop|var_pop|var_samp|"
    r"percentile_cont|percentile_disc)\s*\(",
    re.I,
)
_PCT_SHORTHAND_RE = re.compile(r"\bp(\d{1,2})\s*\(")
_EQUI_RE = re.compile(r"^(\w+)\s*=\s*(\w+)\.(\w+)$")
_WORD_RE = re.compile(r"\b[A-Za-z_]\w*\b")

_NUMERIC_TYPES = ("int", "uint", "bigint", "smallint", "tinyint", "serial",
                  "float", "double", "real", "numeric", "decimal", "number")
_TIME_TYPES = ("timestamp", "datetime", "date", "time")


def _scan_top_level(text: str, start: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``start``,
    skipping single-quoted strings and ``--`` comments."""
    depth = 0
    i = start
    n = len(text)
    while i < n:
        c = text[i]
        if c == "'":
            i = _skip_string(text, i)
            continue
        if c == "-" and text[i:i + 2] == "--":
            i = text.find("\n", i)
            if i < 0:
                return n
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return n


def _split_outside(s: str, pattern: re.Pattern) -> list[str]:
    """Split ``s`` on ``pattern`` matches at paren/bracket depth 0 and
    outside single-quoted strings."""
    parts: list[str] = []
    depth = 0
    last = 0
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i = _skip_string(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif depth == 0:
            m = pattern.match(s, i)
            if m:
                parts.append(s[last:i])
                i = m.end()
                last = i
                continue
        i += 1
    parts.append(s[last:])
    return parts


_COMMA_RE = re.compile(r",")
_AND_RE = re.compile(r"\band\b", re.I)


def _strip_inline(line: str) -> tuple[str, dict, str | None]:
    """Split one source line into (code, annotations, comment), honoring
    ``#``/``--`` inside string literals."""
    annos: dict = {}
    comment = None
    i = 0
    n = len(line)
    code_end = n
    while i < n:
        c = line[i]
        if c == "'":
            i = _skip_string(line, i)
            continue
        if c == '"':
            i += 1
            while i < n and line[i] != '"':
                i += 2 if line[i] == "\\" else 1
            i += 1
            continue
        if c == "-" and line[i:i + 2] == "--":
            comment = line[i + 2:].strip() or None
            code_end = min(code_end, i)
            break
        if c == "#":
            code_end = min(code_end, i)
            for m in _ANNOT_RE.finditer(line[i:]):
                val = m.group(2)
                if val is None:
                    annos[m.group(1)] = True
                else:
                    if val[:1] in "\"'":
                        val = val[1:-1]
                    annos[m.group(1)] = val
            # a trailing -- comment may follow the annotations
            cpos = line.find("--", i)
            if cpos >= 0:
                comment = line[cpos + 2:].strip() or None
            break
        i += 1
    return line[:code_end].rstrip(), annos, comment


def _item_starts(code: str) -> bool:
    s = code.strip()
    if not s:
        return False
    if re.match(r"^join\s+(one|many|cross)\b", s, re.I):
        return True
    if _COLUMN_RE.match(s):
        return True
    if re.match(r"^\w+\s*:", s):
        return True
    if _AS_MEASURE_RE.match(s):
        return True
    # single-line agg-as spanning: ``sum(...) as name`` handled above;
    # ``agg(`` opening a multi-line as-measure
    if re.match(r"^\w[\w.]*\s*\([^)]*$", s) and _AGG_CALL_RE.match(s):
        return True
    return False


def _split_items(body: str) -> list[tuple[str, dict, str | None]]:
    """Body -> [(item_text, annotations, description)]. Items start at
    column/join/named-def/measure lines; other lines continue the
    current item (multi-line ``case`` expressions)."""
    items: list[tuple[list[str], dict, str | None]] = []
    for raw in body.splitlines():
        code, annos, comment = _strip_inline(raw)
        if not code.strip():
            continue
        if _item_starts(code) or not items:
            items.append(([code.strip()], annos, comment))
        else:
            cur = items[-1]
            cur[0].append(code.strip())
            cur[1].update(annos)
            if comment and cur[2] is None:
                items[-1] = (cur[0], cur[1], comment)
    return [(" ".join(lines), annos, comment)
            for lines, annos, comment in items]


def _rewrite_percentile(expr: str) -> tuple[str, bool]:
    """``p90(x)`` -> ``PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY x)``."""
    out = []
    last = 0
    hit = False
    for m in _PCT_SHORTHAND_RE.finditer(expr):
        open_i = m.end() - 1
        close_i = _scan_top_level(expr, open_i) - 1
        arg = expr[open_i + 1:close_i].strip()
        if not arg or "," in arg:
            continue
        frac = int(m.group(1)) / 100.0
        out.append(expr[last:m.start()])
        out.append(f"PERCENTILE_CONT({frac}) WITHIN GROUP (ORDER BY {arg})")
        last = close_i + 1
        hit = True
    out.append(expr[last:])
    return "".join(out), hit


def _norm(expr: str) -> str:
    return re.sub(r"\s+", " ", expr).strip()


def _dim_type_from_expr(expr: str, name: str, annos: dict) -> str:
    low = expr.lower()
    if _grain_from(annos, expr):
        return "time"
    if name.lower().startswith(("is_", "has_")):
        return "boolean"
    if any(t in low for t in ("date_trunc", "date_bin", "::date",
                              "::timestamp", "timestamp(", "date(")):
        return "time"
    if not low.strip().startswith("case"):
        no_str = re.sub(r"'(?:[^'\\]|\\.)*'", "", expr)
        if re.search(r"(?:[<>!]=?|(?<![<>!])=|\bis\s+(?:not\s+)?null\b|\bbetween\b|\bin\s*\()", no_str, re.I):
            return "boolean"
        if re.search(r"[+\-*/%]", no_str):
            return "numeric"
    return "categorical"


def _grain_from(annos: dict, expr_or_type: str) -> str | None:
    g = annos.get("timeGrain") or annos.get("timegrain")
    if isinstance(g, str) and g.lower() in _GRANULARITIES:
        return g.lower()
    m = re.search(r"date_trunc\s*\(\s*'(\w+)'", expr_or_type, re.I)
    if m and m.group(1).lower() in _GRANULARITIES:
        return m.group(1).lower()
    low = expr_or_type.lower()
    if any(t in low for t in ("date", "timestamp", "datetime")):
        return "day"
    return None


def _formatting(annos: dict) -> str | None:
    cur = annos.get("currency")
    if cur and cur is not True:
        return str(cur).lower()
    if "ratio" in annos or "pct" in annos:
        return "percent"
    return None


def _graphene_meta(annos: dict, extra: dict | None = None) -> dict | None:
    payload: dict = {}
    if annos:
        payload["annotations"] = dict(annos)
    if extra:
        payload.update(extra)
    return {"graphene": payload} if payload else None


def _refs(expr: str) -> set[str]:
    no_str = re.sub(r"'(?:[^'\\]|\\.)*'", "", expr)
    return set(_WORD_RE.findall(no_str))


class GrapheneAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        import os

        if os.path.isdir(path):
            texts = []
            for root, _dirs, files in os.walk(path):
                for f in sorted(files):
                    if f.endswith(".gsql"):
                        with open(os.path.join(root, f)) as fh:
                            texts.append(fh.read())
            self.parse_text(layer, "\n".join(texts))
            return
        with open(path) as fh:
            self.parse_text(layer, fh.read())

    def parse(self, layer, data) -> None:
        raise NotImplementedError("GSQL is text, use parse_file/parse_text")

    def parse_text(self, layer, text: str) -> None:
        for m in _STMT_RE.finditer(text):
            kind = m.group(1).lower()
            name, source, as_view = m.group(2), m.group(3), bool(m.group(4))
            open_i = text.index("(", m.start())
            end = _scan_top_level(text, open_i)
            body = text[open_i + 1:end - 1]
            desc = _leading_comment(text, m.start())
            if kind == "extend":
                target = layer.graph.models.get(name)
                if target is None:
                    continue
                self._merge(layer, target, self._parse_body(
                    name, source, body,
                    existing_metrics={mm.name for mm in target.metrics},
                ))
                layer.graph._invalidate()
                continue
            if as_view:
                model = self._parse_view(name, body, desc)
            else:
                model = self._parse_body(name, source, body, description=desc)
            existing = layer.graph.models.get(name)
            if existing is not None:
                # re-declared ``table name (...)``: merge like extend
                self._merge(layer, existing, model)
                layer.graph._invalidate()
            else:
                layer.add_model(model)
        self._resolve_aliases(layer)

    # ------------------------------------------------------------------

    @staticmethod
    def _merge(layer, existing: Model, new: Model) -> None:
        for d in new.dimensions:
            if existing.dimension(d.name) is None:
                existing.dimensions.append(d)
        for met in new.metrics:
            if existing.metric(met.name) is None:
                existing.metrics.append(met)
        existing.relationships.extend(new.relationships)
        new_meta = (new.meta or {}).get("graphene") or {}
        if new_meta:
            if existing.meta is None:
                existing.meta = {}
            g = existing.meta.setdefault("graphene", {})
            if "join_aliases" in new_meta:
                g.setdefault("join_aliases", {}).update(new_meta["join_aliases"])
            if "unsupported_joins" in new_meta:
                g.setdefault("unsupported_joins", []).extend(
                    new_meta["unsupported_joins"])
        existing.reindex()

    def _parse_view(self, name: str, body: str, desc: str | None) -> Model:
        sql = body.strip()
        dims = [Dimension(name=a, sql=a,
                          type="numeric" if agg else "categorical")
                for a, agg in _projection_aliases(sql)]
        return Model(
            name=name, sql=sql, description=desc,
            primary_key=dims[0].name if dims else "id",
            dimensions=dims,
        )

    def _parse_body(self, name: str, source: str | None, body: str,
                    description: str | None = None,
                    existing_metrics: set[str] | None = None) -> Model:
        items = _split_items(body)

        # pass 1: classify measure names (order-independent composition)
        measure_names: set[str] = set(existing_metrics or ())
        computed_sql: dict[str, str] = {}
        named_items: list[tuple[str, str]] = []
        for text_, _annos, _c in items:
            am = _AS_MEASURE_RE.match(text_)
            if am:
                measure_names.add(am.group(2))
                continue
            nd = _NAMED_RE.match(text_)
            if nd and not _COLUMN_RE.match(text_) \
                    and not re.match(r"^join\s", text_, re.I):
                named_items.append((nd.group(1), _norm(nd.group(2))))
        for dname, expr in named_items:
            if _AGG_CALL_RE.search(expr) or _PCT_SHORTHAND_RE.search(expr):
                measure_names.add(dname)
        changed = True
        while changed:
            changed = False
            for dname, expr in named_items:
                if dname not in measure_names and _refs(expr) & measure_names:
                    measure_names.add(dname)
                    changed = True
        for dname, expr in named_items:
            if dname not in measure_names:
                computed_sql[dname] = expr

        dims: list[Dimension] = []
        mets: list[Metric] = []
        rels: list[Relationship] = []
        explicit_pk: list[str] = []
        pk_candidates: list[str] = []
        unsupported: list[dict] = []
        aliases: dict[str, str] = {}

        for text_, annos, comment in items:
            jm = _JOIN_RE.match(text_)
            if jm:
                self._parse_join(jm, rels, unsupported, aliases, pk_candidates)
                continue
            cm = _COLUMN_RE.match(text_)
            if cm:
                cname, ctype, pk_mark = cm.group(1), cm.group(2), cm.group(3)
                dtype = _column_type(ctype)
                dims.append(Dimension(
                    name=cname, type=dtype,
                    granularity=_grain_from(annos, ctype) if dtype == "time" else None,
                    description=(annos.get("description")
                                 if isinstance(annos.get("description"), str)
                                 else None) or comment,
                    value_format_name=_formatting(annos),
                    meta=_graphene_meta(
                        {k: v for k, v in annos.items() if k != "description"},
                        {"data_type": ctype}),
                ))
                if pk_mark:
                    explicit_pk.append(cname)
                continue
            am = _AS_MEASURE_RE.match(text_)
            if am:
                mets.append(self._measure(
                    am.group(2), _norm(am.group(1)), annos, comment,
                    measure_names, computed_sql))
                continue
            nd = _NAMED_RE.match(text_)
            if nd:
                dname, expr = nd.group(1), _norm(nd.group(2))
                dsc = (annos.get("description")
                       if isinstance(annos.get("description"), str)
                       else None) or comment
                if dname in measure_names:
                    mets.append(self._measure(
                        dname, expr, annos, comment, measure_names, computed_sql))
                else:
                    dims.append(Dimension(
                        name=dname, sql=expr,
                        type=_dim_type_from_expr(expr, dname, annos),
                        granularity=_grain_from(annos, expr)
                        if _dim_type_from_expr(expr, dname, annos) == "time" else None,
                        description=dsc,
                        value_format_name=_formatting(annos),
                        meta=_graphene_meta(
                            {k: v for k, v in annos.items() if k != "description"}),
                    ))

        pk = _choose_pk(explicit_pk, dims, pk_candidates)
        meta_extra: dict = {}
        if unsupported:
            meta_extra["unsupported_joins"] = unsupported
        if aliases:
            meta_extra["join_aliases"] = aliases
        return Model(
            name=name, table=source or name, primary_key=pk,
            dimensions=dims, metrics=mets, relationships=rels,
            description=description,
            meta={"graphene": meta_extra} if meta_extra else None,
        )

    def _measure(self, name: str, expr: str, annos: dict,
                 comment: str | None, measure_names: set[str],
                 computed_sql: dict[str, str]) -> Metric:
        expr, pct = _rewrite_percentile(expr)
        expr = _inline_computed(expr, computed_sql, exclude={name})
        dsc = (annos.get("description")
               if isinstance(annos.get("description"), str) else None) or comment
        kwargs = dict(
            name=name, description=dsc,
            value_format_name=_formatting(annos),
            meta=_graphene_meta(
                {k: v for k, v in annos.items() if k != "description"}),
        )
        has_agg = bool(_AGG_CALL_RE.search(expr))
        if pct or (has_agg and not _is_single_agg_call(expr)):
            # ordered-set aggregate or formula mixing aggregates:
            # emit verbatim into the aggregate scope
            return Metric(sql=expr, sql_is_complete=True, **kwargs)
        if has_agg:
            return Metric(sql=expr, **kwargs)  # auto-extracts agg/sql
        return Metric(type="derived", expr=expr, **kwargs)

    def _parse_join(self, jm: re.Match, rels: list, unsupported: list,
                    aliases: dict, pk_candidates: list) -> None:
        kind = jm.group(1).lower()
        target, alias = jm.group(2), jm.group(3)
        cond = _norm(jm.group(4)) if jm.group(4) else None
        rel_name = alias or target
        rtype = {"one": "many_to_one", "many": "one_to_many",
                 "cross": "cross"}[kind]
        if kind == "cross" or not cond:
            rels.append(Relationship(name=rel_name, type=rtype))
            if alias:
                aliases[alias] = target
            return
        local: list[str] = []
        remote: list[str] = []
        ok = True
        for conj in _split_outside(cond, _AND_RE):
            em = _EQUI_RE.match(conj.strip())
            if em and em.group(2) in (rel_name, target):
                local.append(em.group(1))
                remote.append(em.group(3))
            else:
                ok = False
                break
        if not ok:
            unsupported.append({"target": rel_name, "on": cond,
                                "unsupported_reason": "unresolved_join_keys"})
            return
        if alias:
            aliases[alias] = target

        def _one_or_list(cols: list[str]):
            return cols[0] if len(cols) == 1 else cols

        if kind == "one":
            rels.append(Relationship(
                name=rel_name, type="many_to_one",
                foreign_key=_one_or_list(local),
                primary_key=_one_or_list(remote),
            ))
        else:  # many: local key joins the FK on the related model
            rels.append(Relationship(
                name=rel_name, type="one_to_many",
                primary_key=_one_or_list(local),
                foreign_key=_one_or_list(remote),
            ))
            pk_candidates.extend(local)

    def _resolve_aliases(self, layer) -> None:
        """Create role models for alias joins once targets exist
        (ref ``graphene.py`` ``_add_alias_models``)."""
        pending: dict[str, str] = {}
        for model in layer.graph.models.values():
            g = (model.meta or {}).get("graphene") or {}
            for alias, target in (g.get("join_aliases") or {}).items():
                if alias not in layer.graph.models and target in layer.graph.models:
                    pending[alias] = target
        for alias, target in pending.items():
            t = layer.graph.models[target]
            layer.add_model(Model(
                name=alias, table=t.table, sql=t.sql,
                primary_key=copy.copy(t.primary_key),
                dimensions=copy.deepcopy(t.dimensions),
                metrics=copy.deepcopy(t.metrics),
                segments=copy.deepcopy(t.segments),
                description=t.description,
                meta={"graphene": {"alias_for": target}},
            ))


def _column_type(ctype: str) -> str:
    base = re.match(r"[A-Za-z_]+", ctype).group(0).lower()
    if base.startswith(_NUMERIC_TYPES):
        return "numeric"
    if base.startswith(("bool",)):
        return "boolean"
    if base.startswith(_TIME_TYPES) and base not in ("timeuuid",):
        return "time"
    return "categorical"


def _choose_pk(explicit: list[str], dims: list[Dimension],
               candidates: list[str]):
    if explicit:
        return explicit[0] if len(explicit) == 1 else explicit
    names = {d.name for d in dims}
    for c in candidates:
        if c in names:
            return c
    if candidates:
        return candidates[0]
    if "id" in names:
        return "id"
    for d in dims:
        if d.name.endswith("_id"):
            return d.name
    return dims[0].name if dims else "id"


def _inline_computed(expr: str, computed: dict[str, str],
                     exclude: set[str]) -> str:
    """Replace computed-dimension refs inside a measure with their SQL
    so the measure evaluates against raw columns (ref graphene
    ``_inline_computed_dimensions``)."""
    out = expr
    for _ in range(5):  # nested computed dims
        changed = False
        for dname, dsql in computed.items():
            if dname in exclude:
                continue
            new = re.sub(rf"\b{re.escape(dname)}\b", f"({dsql})", out)
            if new != out:
                out = new
                changed = True
        if not changed:
            break
    return out


def _is_single_agg_call(expr: str) -> bool:
    s = expr.strip()
    m = _AGG_CALL_RE.match(s)
    if not m:
        return False
    return _scan_top_level(s, s.index("(", m.start())) >= len(s)


def _leading_comment(text: str, stmt_start: int) -> str | None:
    """Contiguous ``--`` lines immediately above a statement."""
    lines = text[:stmt_start].splitlines()
    out: list[str] = []
    for ln in reversed(lines):
        s = ln.strip()
        if not s:
            if out:
                break
            continue
        if s.startswith("--"):
            out.append(s[2:].strip())
        else:
            break
    return " ".join(reversed(out)) or None


def _projection_aliases(sql: str) -> list[tuple[str, bool]]:
    """Output columns of the OUTER query of a GSQL/SQL view body:
    [(name, is_aggregate)]. CTE selects are skipped."""
    s = sql
    # skip a leading WITH block (balanced parens per CTE)
    mw = re.match(r"\s*with\s", s, re.I)
    if mw:
        i = mw.end()
        while True:
            mo = re.compile(r"\bas\s*\(", re.I).search(s, i)
            if not mo:
                break
            i = _scan_top_level(s, s.index("(", mo.start()))
            mc = re.match(r"\s*,", s[i:])
            if mc:
                i += mc.end()
                continue
            break
        s = s[i:]
    # find the top-level SELECT clause
    sel = None
    for m in re.finditer(r"\bselect\b", s, re.I):
        before = s[:m.start()]
        if before.count("(") - before.count(")") == 0:
            sel = m.end()
            break
    if sel is None:
        return []
    tail = s[sel:]
    endm = re.search(r"\b(from|where|group\s+by|having|order\s+by|limit|qualify)\b",
                     tail, re.I)
    # clause-order GSQL puts select last, so also stop at end of text
    proj = tail[:endm.start()] if endm else tail
    out: list[tuple[str, bool]] = []
    for item in _split_outside(proj, _COMMA_RE):
        item = _norm(item)
        if not item or item == "*":
            continue
        is_agg = bool(_AGG_CALL_RE.search(item))
        am = re.search(r"\s+as\s+(\w+)\s*$", item, re.I)
        if am:
            out.append((am.group(1), is_agg))
            continue
        if re.fullmatch(r"[\w.]+", item):
            out.append((item.split(".")[-1], is_agg))
    return out
