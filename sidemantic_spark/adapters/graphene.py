"""Graphene GSQL importer.

Clean-room importer for the documented ``.gsql`` model syntax, like
the reference's (``adapters/graphene.py``, itself a clean-room
compatibility parser): ``table name ( ... )`` blocks containing typed
columns with ``#tag=value`` annotations, ``join one|many target on
cond``, named definitions ``name: expr`` (dimension when non-
aggregate, measure when aggregate or measure-referencing), and
``agg(expr) as name`` measures.
"""

from __future__ import annotations

import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_TABLE_RE = re.compile(r"^\s*table\s+(\w+)\s*(?:from\s+(\S+)\s*)?\(", re.M)
_COLUMN_RE = re.compile(r"^(\w+)\s+(INT\d*|FLOAT\d*|STRING|BOOL(?:EAN)?|TIMESTAMP|DATE|NUMERIC|DECIMAL[\w(),]*)\s*(#.*)?$", re.I)
_JOIN_RE = re.compile(r"^join\s+(one|many|cross)\s+(\w+)(?:\s+as\s+(\w+))?(?:\s+on\s+(.+?))?\s*(#.*)?$", re.I)
_NAMED_DEF_RE = re.compile(r"^(\w+)\s*:\s*(.+?)\s*(#\S+.*)?$")
_AS_MEASURE_RE = re.compile(r"^(\w+\s*\(.*\))\s+as\s+(\w+)\s*(#.*)?$", re.I)
_AGG_FUNCS = ("sum(", "count(", "avg(", "min(", "max(", "median(",
              "stddev(", "count_distinct(", "approx_count_distinct(")
_TAG_RE = re.compile(r"#(\w+)(?:=(\S+))?")

_TYPE_MAP = {
    "INT": "numeric", "FLOAT": "numeric", "NUMERIC": "numeric",
    "DECIMAL": "numeric", "STRING": "categorical", "BOOL": "boolean",
    "BOOLEAN": "boolean", "TIMESTAMP": "time", "DATE": "time",
}


def _strip_comments(text: str) -> str:
    return re.sub(r"--[^\n]*", "", text)


def _semantic_type(type_tok: str) -> str:
    base = re.sub(r"\d+.*$", "", type_tok.upper()).rstrip("(")
    return _TYPE_MAP.get(base, "categorical")


def _is_aggregate(expr: str) -> bool:
    low = expr.lower()
    return any(f in low for f in _AGG_FUNCS)


class GrapheneAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        import os

        if os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                if f.endswith(".gsql"):
                    self.parse_file(layer, os.path.join(path, f))
            return
        with open(path) as fh:
            self.parse_text(layer, fh.read())

    def parse(self, layer, data) -> None:
        raise NotImplementedError("GSQL is text, use parse_file/parse_text")

    def parse_text(self, layer, text: str) -> None:
        text = _strip_comments(text)
        for m in _TABLE_RE.finditer(text):
            name, source = m.group(1), m.group(2)
            open_idx = text.index("(", m.start())
            depth = 0
            end = len(text)
            for i in range(open_idx, len(text)):
                if text[i] == "(":
                    depth += 1
                elif text[i] == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            body = text[open_idx + 1 : end]
            model = self._parse_table(name, source, body)
            existing = layer.graph.models.get(name)
            if existing is not None:
                # `table name extend (...)`-style re-declaration: merge
                for d in model.dimensions:
                    if existing.dimension(d.name) is None:
                        existing.add_dimension(d)
                for met in model.metrics:
                    if existing.metric(met.name) is None:
                        existing.add_metric(met)
                existing.relationships.extend(model.relationships)
                layer.graph._invalidate()
            else:
                layer.add_model(model)

    def _parse_table(self, name: str, source: str | None, body: str) -> Model:
        dims: list[Dimension] = []
        mets: list[Metric] = []
        rels: list[Relationship] = []
        pk = None
        measure_names: set[str] = set()
        # two passes: collect measure names first so formula defs classify
        lines = [ln.strip() for ln in body.splitlines() if ln.strip()]
        for line in lines:
            am = _AS_MEASURE_RE.match(line)
            if am:
                measure_names.add(am.group(2))
                continue
            nd = _NAMED_DEF_RE.match(line)
            if nd and _is_aggregate(nd.group(2)):
                measure_names.add(nd.group(1))
        # classification helper: formulas over measures are measures too
        changed = True
        while changed:
            changed = False
            for line in lines:
                nd = _NAMED_DEF_RE.match(line)
                if nd and nd.group(1) not in measure_names:
                    refs = set(re.findall(r"\b\w+\b", nd.group(2)))
                    if refs & measure_names:
                        measure_names.add(nd.group(1))
                        changed = True

        for line in lines:
            jm = _JOIN_RE.match(line)
            if jm:
                kind, target, alias, cond = jm.group(1).lower(), jm.group(2), jm.group(3), jm.group(4)
                rtype = {"one": "many_to_one", "many": "one_to_many", "cross": "cross"}[kind]
                fk = pk_col = sql = None
                if cond:
                    em = re.match(rf"^(\w+)\s*=\s*{target}\.(\w+)$", cond.strip())
                    em2 = re.match(rf"^(\w+)\s*=\s*(\w+)\.(\w+)$", cond.strip())
                    if em:
                        fk, pk_col = em.group(1), em.group(2)
                    elif em2:
                        fk, pk_col = em2.group(1), em2.group(3)
                    else:
                        sql = re.sub(rf"\b{target}\.", "{to}.", cond.strip())
                rels.append(Relationship(
                    name=alias or target, type=rtype,
                    foreign_key=fk, primary_key=pk_col, sql=sql,
                ))
                continue
            cm = _COLUMN_RE.match(line)
            if cm:
                cname, ctype, tags = cm.group(1), cm.group(2), cm.group(3) or ""
                tagmap = dict(_TAG_RE.findall(tags))
                dtype = _semantic_type(ctype)
                dims.append(Dimension(
                    name=cname, type=dtype,
                    granularity=tagmap.get("timeGrain") if dtype == "time" else None,
                ))
                if pk is None:
                    pk = cname
                continue
            am = _AS_MEASURE_RE.match(line)
            if am:
                mets.append(Metric(name=am.group(2), sql=am.group(1)))
                continue
            nd = _NAMED_DEF_RE.match(line)
            if nd:
                dname, expr = nd.group(1), nd.group(2).strip()
                if dname in measure_names:
                    if _is_aggregate(expr):
                        mets.append(Metric(name=dname, sql=expr))
                    else:
                        mets.append(Metric(name=dname, type="derived", expr=expr))
                else:
                    low = expr.lower()
                    dtype = "boolean" if re.search(r"[<>=]", expr) or " is " in low else "categorical"
                    dims.append(Dimension(name=dname, sql=expr, type=dtype))
        return Model(
            name=name, table=source or name, primary_key=pk or "id",
            dimensions=dims, metrics=mets, relationships=rels,
        )
