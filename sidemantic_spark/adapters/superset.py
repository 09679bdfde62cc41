"""Apache Superset dataset importer.

Maps Superset dataset export YAML (reference ``adapters/superset.py``;
public format: superset import/export datasets) onto one Model:
``table_name``/``sql`` -> binding, ``columns`` -> dimensions
(``is_dttm`` -> time), ``metrics`` -> Metric via aggregate
auto-extraction of the SQL expression (``COUNT(*)``, ``SUM(x)``, ...);
non-extractable expressions become derived metrics.
"""

from __future__ import annotations

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model


class SupersetAdapter(BaseAdapter):
    def parse(self, layer, data: dict) -> None:
        name = data.get("table_name")
        if not name or ("metrics" not in data and "columns" not in data):
            return

        dims: list[Dimension] = []
        for c in data.get("columns") or []:
            cname = c.get("column_name")
            if not cname:
                continue
            ctype = (c.get("type") or "").upper()
            if c.get("is_dttm"):
                dtype = "time"
            elif any(t in ctype for t in ("INT", "FLOAT", "DOUBLE", "DECIMAL", "NUMERIC")):
                dtype = "numeric"
            elif "BOOL" in ctype:
                dtype = "boolean"
            else:
                dtype = "categorical"
            expr = c.get("expression")
            dims.append(Dimension(
                name=cname,
                type=dtype,
                sql=expr if expr else None,
                label=c.get("verbose_name"),
                description=c.get("description"),
            ))
        main_dttm = data.get("main_dttm_col")
        if main_dttm and not any(d.name == main_dttm for d in dims):
            dims.append(Dimension(name=main_dttm, type="time"))

        metrics: list[Metric] = []
        for m in data.get("metrics") or []:
            mname = m.get("metric_name")
            expr = m.get("expression")
            if not mname or not expr:
                continue
            metric = Metric(
                name=mname, sql=expr,
                label=m.get("verbose_name"),
                description=m.get("description"),
            )
            if metric.agg is None:
                metric = Metric(name=mname, type="derived", expr=expr,
                                description=m.get("description"))
            metrics.append(metric)

        layer.add_model(Model(
            name=name,
            table=name if not data.get("sql") else None,
            sql=data.get("sql"),
            primary_key="id",
            dimensions=dims,
            metrics=metrics,
            default_time_dimension=main_dttm if main_dttm else None,
            description=data.get("description"),
        ))


# ----------------------------------------------------------------------
# export (reference adapters/superset.py export contract)
# ----------------------------------------------------------------------

_TYPE_OUT = {"numeric": "DOUBLE", "boolean": "BOOLEAN",
             "time": "TIMESTAMP", "categorical": "TEXT"}


def export_superset(graph) -> list[dict]:
    """Graph -> one Superset dataset-export doc per model. The dataset
    name doubles as the table binding (Superset identifies datasets by
    table_name), so models whose name differs from their table keep the
    model name and re-import bound to it."""
    from sidemantic_spark.adapters.base import simple_agg_sql

    docs = []
    for model in graph.models.values():
        doc: dict = {"table_name": model.name}
        if model.sql:
            doc["sql"] = model.sql
        time_dims = [d for d in model.dimensions if d.type == "time"]
        main_dttm = model.default_time_dimension or (
            time_dims[0].name if time_dims else None
        )
        if main_dttm:
            doc["main_dttm_col"] = main_dttm
        cols = []
        for d in model.dimensions:
            out = {"column_name": d.name,
                   "type": _TYPE_OUT.get(d.type, "TEXT")}
            if d.type == "time":
                out["is_dttm"] = True
            if d.sql and d.sql != d.name:
                out["expression"] = d.sql
            if d.label:
                out["verbose_name"] = d.label
            if d.description:
                out["description"] = d.description
            cols.append(out)
        if cols:
            doc["columns"] = cols
        mets = []
        for m in model.metrics:
            expr = simple_agg_sql(m) if m.is_simple else (
                m.expr if m.type == "derived" else None
            )
            if expr is None:
                continue
            out = {"metric_name": m.name, "expression": expr}
            if m.label:
                out["verbose_name"] = m.label
            if m.description:
                out["description"] = m.description
            mets.append(out)
        if mets:
            doc["metrics"] = mets
        if model.description:
            doc["description"] = model.description
        docs.append(doc)
    return docs
