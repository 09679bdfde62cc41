"""Holistics AML importer.

Re-expression of the reference's Holistics adapter
(``adapters/holistics.py`` + ``holistics_grammar``): AML blocks
``Model name { ... }`` with ``dimension`` / ``measure`` sub-blocks
(``definition: @sql {{ ... }};;`` expressions, ``#SOURCE`` = own
table), ``Relationship name { from: r(a.col) to: r(b.col) }``
declarations, and ``Dataset`` files grouping models + inline
relationship configs.
"""

from __future__ import annotations

import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_MODEL_RE = re.compile(r"^Model\s+(\w+)\s*\{", re.M)
_REL_RE = re.compile(r"^\s*(?:Relationship\s+(\w+)\s*\{|rel:\s*Relationship\s*\{)", re.M)
_FIELD_BLOCK_RE = re.compile(r"^(\s*)(dimension|measure)\s+(\w+)\s*\{", re.M)
_PROP_RE = re.compile(r"^\s*(\w+)\s*:\s*(.+?)\s*$", re.M)
_SQL_DEF_RE = re.compile(r"@sql\s*(.*?);;", re.S)
_R_REF_RE = re.compile(r"r\(\s*(\w+)\.(\w+)\s*\)")
_REL_EXPR_RE = re.compile(r"rel\(\s*rel_expr:\s*(\w+)\.(\w+)\s*([-=<>!]+)\s*(\w+)\.(\w+)\s*,\s*active:\s*(\w+)\s*\)")

_AGG_MAP = {
    "count": "count",
    "count_distinct": "count_distinct",
    "sum": "sum",
    "avg": "avg",
    "average": "avg",
    "min": "min",
    "max": "max",
    "median": "median",
    "stdev": "stddev",
    "stddev": "stddev",
    "var": "variance",
    "variance": "variance",
}

_TYPE_MAP = {
    "number": "numeric",
    "text": "categorical",
    "truefalse": "boolean",
    "datetime": "time",
    "date": "time",
}


def _block(text: str, open_idx: int) -> tuple[str, int]:
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[open_idx + 1 : i], i
    return text[open_idx + 1 :], len(text)


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] in "'\"" and v[-1] == v[0]:
        return v[1:-1]
    return v


def _clean_sql(defn: str) -> str:
    """``{{ #SOURCE.col }}`` -> ``col``; ``{{ other }}`` -> ``other``."""
    out = re.sub(r"\{\{\s*#SOURCE\.(\w+)\s*\}\}", r"\1", defn)
    out = re.sub(r"\{\{\s*([\w.]+)\s*\}\}", r"\1", out)
    return out.strip()


class HolisticsAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        with open(path) as fh:
            self.parse_text(layer, fh.read())

    def parse(self, layer, data) -> None:
        raise NotImplementedError("Holistics AML is text, use parse_file/parse_text")

    def parse_text(self, layer, text: str) -> None:
        for m in _MODEL_RE.finditer(text):
            body, _ = _block(text, text.index("{", m.start()))
            model = self._parse_model(m.group(1), body)
            try:
                layer.add_model(model)
            except Exception:
                pass
        # standalone + dataset-inline Relationship blocks
        for m in re.finditer(r"Relationship\s*(?:\w+\s*)?\{", text):
            body, _ = _block(text, text.index("{", m.start()))
            self._parse_relationship(layer, body)
        for m in _REL_EXPR_RE.finditer(text):
            # rel(rel_expr: a.x - b.y, active: true) — '-' means equality
            # on the two columns in Holistics AML shorthand
            if m.group(6) != "true":
                continue
            frm_model, frm_col, op, to_model, to_col = m.group(1), m.group(2), m.group(3), m.group(4), m.group(5)
            if op not in ("-", "="):
                continue  # inequality rel_exprs are display-only
            self._add_rel(layer, frm_model, frm_col, to_model, to_col, "many_to_one")

    def _parse_model(self, name: str, body: str) -> Model:
        dims: list[Dimension] = []
        mets: list[Metric] = []
        table = None
        tm = re.search(r"table_name\s*:\s*(.+)", body)
        if tm:
            table = _unquote(tm.group(1))
        pk = "id"
        pos = 0
        while True:
            fb = _FIELD_BLOCK_RE.search(body, pos)
            if not fb:
                break
            kind, fname = fb.group(2), fb.group(3)
            fbody, end = _block(body, body.index("{", fb.start()))
            pos = end + 1
            props = {p.group(1): p.group(2) for p in _PROP_RE.finditer(fbody)}
            sql = None
            sm = _SQL_DEF_RE.search(fbody)
            if sm:
                sql = _clean_sql(sm.group(1))
            if kind == "dimension":
                if _unquote(props.get("primary_key", "")) in ("true", "True"):
                    pk = fname
                dims.append(Dimension(
                    name=fname,
                    type=_TYPE_MAP.get(_unquote(props.get("type", "text")).lower(), "categorical"),
                    sql=None if sql in (None, fname) else sql,
                    label=_unquote(props["label"]) if "label" in props else None,
                ))
            else:
                agg = _AGG_MAP.get(_unquote(props.get("aggregation_type", "")).lower())
                if agg:
                    mets.append(Metric(
                        name=fname, agg=agg,
                        sql=None if agg == "count" and sql in (None, pk) else sql,
                    ))
                else:  # custom aggregation: formula over other fields
                    mets.append(Metric(name=fname, type="derived", expr=sql))
        return Model(name=name, table=table, primary_key=pk,
                     dimensions=dims, metrics=mets)

    def _parse_relationship(self, layer, body: str) -> None:
        t = re.search(r"type\s*:\s*(.+)", body)
        rtype = _unquote(t.group(1)) if t else "many_to_one"
        refs = _R_REF_RE.findall(body)
        if len(refs) != 2:
            return
        (fm, fc), (tm_, tc) = refs
        self._add_rel(layer, fm, fc, tm_, tc, rtype)

    def _add_rel(self, layer, from_model: str, from_col: str,
                 to_model: str, to_col: str, rtype: str) -> None:
        try:
            model = layer.graph.get_model(from_model)
        except Exception:
            return
        if any(r.name == to_model and r.fk_list() == [from_col] for r in model.relationships):
            return
        model.relationships.append(Relationship(
            name=to_model, type=rtype if rtype in
            ("many_to_one", "one_to_one", "one_to_many", "many_to_many", "cross")
            else "many_to_one",
            foreign_key=from_col, primary_key=to_col,
        ))
        layer.graph._invalidate()


# ----------------------------------------------------------------------
# export (reference adapters/holistics.py export contract)
# ----------------------------------------------------------------------

_TYPE_OUT = {"numeric": "number", "categorical": "text",
             "boolean": "truefalse", "time": "datetime"}
_AGG_OUT = {"sum": "sum", "count": "count", "count_distinct": "count_distinct",
            "avg": "avg", "min": "min", "max": "max", "median": "median",
            "stddev": "stddev", "variance": "var"}


def _defn(sql: str) -> str:
    """Render a dimension/measure SQL body: bare columns use the
    ``{{ #SOURCE.col }}`` ref syntax, expressions pass through raw."""
    if re.fullmatch(r"\w+", sql):
        return f"@sql {{{{ #SOURCE.{sql} }}}};;"
    return f"@sql {sql};;"


def export_holistics(graph) -> str:
    """Graph -> Holistics AML text (Model blocks + Relationship
    declarations)."""
    from sidemantic_spark.adapters.base import m2o_edges

    blocks: list[str] = []
    for model in graph.models.values():
        lines = [f"Model {model.name} {{"]
        lines.append(f"  table_name: '{model.table or model.name}'")
        pk = set(model.pk_list())
        covered = set()
        for d in model.dimensions:
            lines.append(f"  dimension {d.name} {{")
            lines.append(f"    type: '{_TYPE_OUT.get(d.type, 'text')}'")
            if d.name in pk or (d.sql in pk if d.sql else False):
                lines.append("    primary_key: true")
            if d.label:
                lines.append(f"    label: '{d.label}'")
            if d.sql and d.sql != d.name:
                lines.append(f"    definition: {_defn(d.sql)}")
                covered.add(d.sql)
            lines.append("  }")
            covered.add(d.name)
        for c in sorted(pk - covered):
            if not re.fullmatch(r"\w+", c):
                continue
            lines.append(f"  dimension {c} {{")
            lines.append("    type: 'number'")
            lines.append("    primary_key: true")
            lines.append("  }")
        for m in model.metrics:
            if m.is_simple and m.agg in _AGG_OUT:
                lines.append(f"  measure {m.name} {{")
                lines.append(f"    aggregation_type: '{_AGG_OUT[m.agg]}'")
                if m.sql:
                    lines.append(f"    definition: {_defn(m.sql)}")
                lines.append("  }")
            elif m.type == "derived" and m.expr:
                lines.append(f"  measure {m.name} {{")
                lines.append(f"    definition: @sql {m.expr};;")
                lines.append("  }")
        lines.append("}")
        blocks.append("\n".join(lines))
    for owner, tgt, fks, pks, rtype, _jt in m2o_edges(graph):
        if len(fks) != 1:
            continue
        blocks.append(
            f"Relationship {owner}_{tgt} {{\n"
            f"  type: '{rtype}'\n"
            f"  from: r({owner}.{fks[0]})\n"
            f"  to: r({tgt}.{pks[0]})\n"
            f"}}"
        )
    return "\n\n".join(blocks) + "\n"
