"""BSL (Boring Semantic Layer) importer.

Re-expression of the reference's BSL adapter (``adapters/bsl.py`` +
``bsl_expr.py``): YAML keyed by model name with ibis-deferred
expressions — ``_.col`` (own column), ``_.col.sum()/.mean()/...``
(aggregations), ``_.count()`` (row count). ``is_entity`` marks the
primary key, ``is_time_dimension``+``smallest_time_grain`` mark time
dimensions. Measures whose expressions combine other measures map to
derived metrics.
"""

from __future__ import annotations

import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_AGG_METHOD_MAP = {
    "sum": "sum",
    "mean": "avg",
    "avg": "avg",
    "min": "min",
    "max": "max",
    "count": "count",
    "nunique": "count_distinct",
    "median": "median",
    "std": "stddev",
    "var": "variance",
}

_DEFERRED_AGG_RE = re.compile(r"^_\.(\w+)\.(\w+)\(\s*\)$")
_DEFERRED_COUNT_RE = re.compile(r"^_\.count\(\s*\)$")
_DEFERRED_COL_RE = re.compile(r"^_\.(\w+)$")
_GRAIN_RE = re.compile(r"TIME_GRAIN_(\w+)", re.I)


def _deferred_to_sql(expr: str) -> str:
    """``_.col`` refs inside a larger expression -> bare column names."""
    return re.sub(r"_\.(\w+)", r"\1", expr)


class BslAdapter(BaseAdapter):
    def parse(self, layer, data: dict) -> None:
        for name, spec in (data or {}).items():
            if not isinstance(spec, dict) or not (
                "dimensions" in spec or "measures" in spec or "table" in spec
            ):
                continue
            model = self._parse_model(name, spec)
            if model is not None:
                try:
                    layer.add_model(model)
                except Exception:
                    pass

    def _parse_model(self, name: str, spec: dict) -> Model | None:
        dims: list[Dimension] = []
        pk = "id"
        for dname, d in (spec.get("dimensions") or {}).items():
            if isinstance(d, str):
                d = {"expr": d}
            expr = d.get("expr") or f"_.{dname}"
            m = _DEFERRED_COL_RE.match(expr.strip())
            sql = m.group(1) if m else _deferred_to_sql(expr)
            if d.get("is_entity"):
                pk = dname
            grain = None
            gm = _GRAIN_RE.search(str(d.get("smallest_time_grain") or ""))
            if gm:
                grain = gm.group(1).lower()
            dims.append(Dimension(
                name=dname,
                type="time" if d.get("is_time_dimension") or grain else "categorical",
                sql=None if sql == dname else sql,
                granularity=grain,
                description=d.get("description"),
            ))

        mets: list[Metric] = []
        measure_names = set((spec.get("measures") or {}).keys())
        for mname, m in (spec.get("measures") or {}).items():
            if isinstance(m, str):
                m = {"expr": m}
            expr = (m.get("expr") or "").strip()
            desc = m.get("description")
            if _DEFERRED_COUNT_RE.match(expr):
                mets.append(Metric(name=mname, agg="count", description=desc))
                continue
            am = _DEFERRED_AGG_RE.match(expr)
            if am and am.group(2) in _AGG_METHOD_MAP:
                mets.append(Metric(
                    name=mname, agg=_AGG_METHOD_MAP[am.group(2)],
                    sql=am.group(1), description=desc,
                ))
                continue
            body = _deferred_to_sql(expr)
            # formula referencing other measures -> derived
            refs = set(re.findall(r"\b(\w+)\b", body))
            if refs & measure_names - {mname}:
                mets.append(Metric(name=mname, type="derived", expr=body, description=desc))
            else:
                mets.append(Metric(name=mname, sql=body, description=desc))

        rels: list[Relationship] = []
        for rname, r in (spec.get("joins") or {}).items():
            if not isinstance(r, dict):
                continue
            rels.append(Relationship(
                name=r.get("model") or rname,
                type=r.get("type") or ("one_to_many" if r.get("kind") == "many" else "many_to_one"),
                foreign_key=r.get("with") or r.get("foreign_key"),
            ))

        return Model(
            name=name, table=spec.get("table") or name, primary_key=pk,
            dimensions=dims, metrics=mets, relationships=rels,
            description=spec.get("description"),
        )


# ----------------------------------------------------------------------
# export (reference adapters/bsl.py export contract)
# ----------------------------------------------------------------------

_AGG_METHOD_OUT = {
    "sum": "sum", "avg": "mean", "min": "min", "max": "max",
    "count_distinct": "nunique", "median": "median",
    "stddev": "std", "variance": "var",
}


def export_bsl(graph) -> dict:
    """Graph -> BSL YAML (dict keyed by model name) with ibis-deferred
    expressions. Bare-column aggs render as ``_.col.method()``; richer
    expressions fall back to plain SQL strings which re-import through
    aggregate auto-extraction."""
    import re as _re

    from sidemantic_spark.adapters.base import simple_agg_sql

    out: dict = {}
    for model in graph.models.values():
        spec: dict = {"table": model.table or model.name}
        dims: dict = {}
        pk = model.pk_list()
        for d in model.dimensions:
            dspec: dict = {}
            if d.sql and d.sql != d.name:
                dspec["expr"] = (
                    f"_.{d.sql}" if _re.fullmatch(r"\w+", d.sql) else d.sql
                )
            if d.name in pk or (d.sql in pk if d.sql else False):
                dspec["is_entity"] = True
            if d.type == "time":
                dspec["is_time_dimension"] = True
                if d.granularity:
                    dspec["smallest_time_grain"] = f"TIME_GRAIN_{d.granularity.upper()}"
            if d.description:
                dspec["description"] = d.description
            dims[d.name] = dspec or {"expr": f"_.{d.name}"}
        if dims:
            spec["dimensions"] = dims
        measures: dict = {}
        for m in model.metrics:
            if m.is_simple:
                if m.agg == "count" and not m.sql:
                    expr = "_.count()"
                elif m.sql and _re.fullmatch(r"\w+", m.sql) and m.agg in _AGG_METHOD_OUT:
                    expr = f"_.{m.sql}.{_AGG_METHOD_OUT[m.agg]}()"
                else:
                    expr = simple_agg_sql(m)
            elif m.type == "derived":
                expr = m.expr
            else:
                expr = None
            if not expr:
                continue
            mspec: dict = {"expr": expr}
            if m.description:
                mspec["description"] = m.description
            measures[m.name] = mspec
        if measures:
            spec["measures"] = measures
        joins: dict = {}
        for r in model.relationships:
            if r.type == "cross" or r.through or r.sql or not r.foreign_key:
                continue
            joins[r.name] = {"model": r.name, "type": r.type,
                             "with": r.foreign_key}
        if joins:
            spec["joins"] = joins
        if model.description:
            spec["description"] = model.description
        out[model.name] = spec
    return out
