"""Rill (metrics_view) importer.

Maps Rill metrics-view YAML (reference ``adapters/rill.py``; public
docs docs.rilldata.com/build/metrics-view) onto one Model per view:
``model``/``table`` -> table binding, ``timeseries`` -> default time
dimension, dimensions (column / expression), measures (SQL expressions
with aggregate auto-extraction; non-extractable formulas become derived
metrics).
"""

from __future__ import annotations

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model


class RillAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        import os as _os

        import yaml as _yaml

        with open(path) as fh:
            docs = [d for d in _yaml.safe_load_all(fh.read()) if d]
        stem = _os.path.splitext(_os.path.basename(path))[0]
        for doc in docs:
            if isinstance(doc, dict):
                self.parse(layer, doc, filestem=stem)

    def parse(self, layer, data: dict, filestem: str | None = None) -> None:
        if data.get("type") not in (None, "metrics_view"):
            return  # canvases/explores/dashboards have no semantic content
        if data.get("parent"):
            # derived (parent) metrics view: selects a field subset of
            # its parent instead of defining its own (rill
            # parse_metrics_view.go) — copy the named fields
            parent = layer.graph.models.get(data["parent"])
            if parent is None:
                return
            pdims = set(data.get("parent_dimensions") or [])
            pmets = set(data.get("parent_measures") or [])
            import dataclasses

            import re as _re

            raw_name = data.get("name") or data.get("display_name") or "derived"
            layer.add_model(dataclasses.replace(
                parent,
                name=_re.sub(r"\W+", "_", str(raw_name)).strip("_").lower(),
                dimensions=[dataclasses.replace(d) for d in parent.dimensions
                            if not pdims or d.name in pdims
                            or d.name == parent.default_time_dimension],
                metrics=[dataclasses.replace(m) for m in parent.metrics
                         if not pmets or m.name in pmets],
                label=data.get("display_name"),
            ))
            return
        if "measures" not in data and "dimensions" not in data:
            return
        # Rill names a metrics view by its FILE STEM when `name:` is
        # absent (runtime/parser); `model:` is the backing table, not
        # the view's identity
        name = data.get("name") or filestem or data.get("model") or data.get("table")
        if not name:
            return

        timeseries = data.get("timeseries")
        dims: list[Dimension] = []
        seen = set()
        for d in data.get("dimensions") or []:
            dname = d.get("name") or d.get("column")
            if not dname or dname in seen:
                continue
            seen.add(dname)
            expr = d.get("expression") or d.get("column")
            dims.append(Dimension(
                name=dname,
                type="categorical",
                sql=None if expr == dname else expr,
                label=d.get("display_name") or d.get("label"),
                description=d.get("description"),
            ))
        if timeseries and timeseries not in seen:
            dims.append(Dimension(
                name=timeseries, type="time",
                granularity=_grain(data.get("smallest_time_grain")),
            ))

        metrics: list[Metric] = []
        for m in data.get("measures") or []:
            if not m.get("name"):
                continue
            expr = m.get("expression") or m.get("sql")
            metric = Metric(
                name=m["name"],
                sql=expr,
                label=m.get("display_name") or m.get("label"),
                description=m.get("description"),
            )
            if metric.agg is None:  # auto-extraction failed: formula
                metric = Metric(name=m["name"], type="derived", expr=expr,
                                description=m.get("description"))
            metrics.append(metric)

        layer.add_model(Model(
            name=name if isinstance(name, str) else str(name),
            table=data.get("model") or data.get("table") or name,
            primary_key=data.get("primary_key", "id"),
            dimensions=dims,
            metrics=metrics,
            default_time_dimension=timeseries if timeseries else None,
            description=data.get("description"),
        ))


def _grain(g: str | None) -> str | None:
    if not g:
        return None
    g = g.lower().strip()
    return g if g in ("second", "minute", "hour", "day", "week", "month",
                      "quarter", "year") else None


# ----------------------------------------------------------------------
# export (reference adapters/rill.py export contract)
# ----------------------------------------------------------------------

def export_rill(graph) -> list[dict]:
    """Graph -> one Rill metrics_view doc per model. Lossy-but-faithful
    inverse of :meth:`RillAdapter.parse`: simple aggs render as SQL
    expressions (auto-extraction re-derives the agg on import), derived
    metrics keep their formula; window-metric types are dropped."""
    from sidemantic_spark.adapters.base import simple_agg_sql

    docs = []
    for model in graph.models.values():
        time_dims = [d for d in model.dimensions if d.type == "time"]
        timeseries = model.default_time_dimension or (
            time_dims[0].name if time_dims else None
        )
        doc: dict = {"type": "metrics_view", "name": model.name,
                     "model": model.table or model.name}
        if model.primary_key != "id":
            doc["primary_key"] = model.primary_key
        if timeseries:
            doc["timeseries"] = timeseries
            ts = next((d for d in time_dims if d.name == timeseries), None)
            if ts is not None and ts.granularity:
                doc["smallest_time_grain"] = ts.granularity
        dims = []
        for d in model.dimensions:
            if d.name == timeseries:
                continue
            out = {"name": d.name}
            if d.sql and d.sql != d.name:
                out["expression"] = d.sql
            else:
                out["column"] = d.name
            if d.label:
                out["display_name"] = d.label
            if d.description:
                out["description"] = d.description
            dims.append(out)
        if dims:
            doc["dimensions"] = dims
        measures = []
        for m in model.metrics:
            expr = simple_agg_sql(m) if m.is_simple else (
                m.expr if m.type == "derived" else None
            )
            if expr is None:
                continue
            out = {"name": m.name, "expression": expr}
            if m.label:
                out["display_name"] = m.label
            if m.description:
                out["description"] = m.description
            measures.append(out)
        if measures:
            doc["measures"] = measures
        if model.description:
            doc["description"] = model.description
        docs.append(doc)
    return docs
