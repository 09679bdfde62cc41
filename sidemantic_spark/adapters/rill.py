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
    def parse(self, layer, data: dict) -> None:
        if data.get("type") not in (None, "metrics_view"):
            return  # canvases/explores/dashboards have no semantic content
        if "measures" not in data and "dimensions" not in data:
            return
        name = data.get("name") or data.get("model") or data.get("table")
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
