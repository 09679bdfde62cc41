"""ThoughtSpot TML importer.

Re-expression of the reference's ThoughtSpot adapter
(``adapters/thoughtspot.py``): ``*.table.tml`` files declare physical
tables whose columns carry ``column_type`` (ATTRIBUTE/MEASURE) and
``aggregation``; ``*.worksheet.tml`` files declare multi-table join
graphs (``[a::col] = [b::col]`` conditions) plus formulas; model TML
aliases tables. ``default_date_bucket`` maps to a time dimension with
the matching granularity.
"""

from __future__ import annotations

import re

import yaml

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_AGG_MAP = {
    "SUM": "sum",
    "COUNT": "count",
    "COUNT_DISTINCT": "count_distinct",
    "AVERAGE": "avg",
    "MIN": "min",
    "MAX": "max",
    "MEDIAN": "median",
    "STD_DEVIATION": "stddev",
    "VARIANCE": "variance",
}

_BUCKET_GRAIN = {
    "HOURLY": "hour", "DAILY": "day", "WEEKLY": "week",
    "MONTHLY": "month", "QUARTERLY": "quarter", "YEARLY": "year",
}

_DTYPE_MAP = {
    "INT32": "numeric", "INT64": "numeric", "FLOAT": "numeric",
    "DOUBLE": "numeric", "DATE": "time", "DATETIME": "time",
    "TIMESTAMP": "time", "BOOL": "boolean", "BOOLEAN": "boolean",
    "VARCHAR": "categorical",
}

_JOIN_COND_RE = re.compile(r"\[(\w+)::(\w+)\]\s*=\s*\[(\w+)::(\w+)\]")
_TS_REF_RE = re.compile(r"\[(\w+)::([\w ]+)\]")


class ThoughtSpotAdapter(BaseAdapter):
    def parse(self, layer, data: dict) -> None:
        if "table" in data:
            self._parse_table(layer, data["table"])
        if "worksheet" in data:
            self._parse_worksheet(layer, data["worksheet"])
        if "model" in data:
            self._parse_worksheet(layer, data["model"])

    def _parse_table(self, layer, tbl: dict) -> None:
        name = tbl.get("name")
        if not name:
            return
        dims: list[Dimension] = []
        mets: list[Metric] = []
        pk = "id"
        for col in tbl.get("columns") or []:
            cname = col.get("name")
            if not cname:
                continue
            props = col.get("properties") or {}
            db_col = col.get("db_column_name") or cname
            dt = str(col.get("data_type") or "VARCHAR").upper()
            if str(props.get("column_type", "ATTRIBUTE")).upper() == "MEASURE":
                agg = _AGG_MAP.get(str(props.get("aggregation", "SUM")).upper())
                if agg is None:
                    continue
                mets.append(Metric(
                    name=cname, agg=agg,
                    sql=db_col if agg != "count" else None,
                    label=col.get("custom_name"),
                    description=col.get("description"),
                ))
            else:
                bucket = props.get("default_date_bucket")
                dtype = _DTYPE_MAP.get(dt, "categorical")
                gran = _BUCKET_GRAIN.get(str(bucket).upper()) if bucket else None
                if gran:
                    dtype = "time"
                dims.append(Dimension(
                    name=cname, type=dtype,
                    sql=None if db_col == cname else db_col,
                    granularity=gran,
                    label=col.get("custom_name"),
                ))
                if cname == "id" or props.get("is_primary_key"):
                    pk = cname
        db_table = tbl.get("db_table") or name
        schema = tbl.get("schema")
        table = f"{schema}.{db_table}" if schema and schema.lower() not in ("public",) else db_table
        try:
            layer.add_model(Model(
                name=name, table=db_table if table != db_table else table,
                primary_key=pk, dimensions=dims, metrics=mets,
                description=tbl.get("description"),
            ))
        except Exception:
            pass

    def _parse_worksheet(self, layer, ws: dict) -> None:
        # joins between already-imported table models
        for join in ws.get("joins") or []:
            # YAML 1.1 parses the bare `on:` key as boolean True
            cond = join.get("on") or join.get(True) or ""
            src, dst = join.get("source"), join.get("destination")
            pairs = _JOIN_COND_RE.findall(cond)
            if not (src and dst and pairs):
                continue
            fks = [p[1] for p in pairs if p[0] == src]
            pks = [p[3] for p in pairs if p[2] == dst]
            if len(fks) != len(pks) or not fks:
                continue
            rtype = "one_to_one" if join.get("is_one_to_one") else "many_to_one"
            jt = str(join.get("type", "")).upper()
            try:
                model = layer.graph.get_model(src)
            except Exception:
                continue
            if any(r.name == dst for r in model.relationships):
                continue
            model.relationships.append(Relationship(
                name=dst, type=rtype,
                foreign_key=fks if len(fks) > 1 else fks[0],
                primary_key=pks if len(pks) > 1 else pks[0],
                join_type="inner" if jt == "INNER" else None,
            ))
            layer.graph._invalidate()
        # formulas: derived metrics on the first referenced table
        for formula in ws.get("formulas") or []:
            fname, expr = formula.get("name"), formula.get("expr")
            if not fname or not expr:
                continue
            refs = _TS_REF_RE.findall(expr)
            if not refs:
                continue
            owner = refs[0][0]
            try:
                model = layer.graph.get_model(owner)
            except Exception:
                continue
            if model.metric(fname) is not None:
                continue
            body = _TS_REF_RE.sub(lambda m: m.group(2).replace(" ", "_"), expr)
            model.add_metric(Metric(name=fname, type="derived", expr=body))


    def parse_file(self, layer, path: str) -> None:
        with open(path) as fh:
            data = yaml.safe_load(fh)
        if isinstance(data, dict):
            self.parse(layer, data)
