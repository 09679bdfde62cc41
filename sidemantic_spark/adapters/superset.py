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
