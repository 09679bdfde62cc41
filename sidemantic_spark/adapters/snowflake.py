"""Snowflake Cortex Analyst semantic-model YAML importer.

Re-expression of the reference's Snowflake adapter
(``adapters/snowflake.py:85``): ``tables`` -> models (base_table ->
physical binding, primary_key.columns -> composite PK), dimensions /
time_dimensions -> typed dimensions, measures (``facts`` in newer
schemas) -> metrics with ``default_aggregation`` (default sum),
top-level ``relationships`` -> edges on the left table, filters ->
segments. ``verified_queries`` are documentation-only and skipped.
"""

from __future__ import annotations

from sidemantic_spark.adapters.base import AGG_TYPES, BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship, Segment


class SnowflakeAdapter(BaseAdapter):
    def parse(self, layer, data: dict) -> None:
        tables = data.get("tables") or []
        for tbl in tables:
            model = self._parse_table(tbl)
            if model is not None:
                try:
                    layer.add_model(model)
                except Exception:
                    pass
        for rel in data.get("relationships") or []:
            left = rel.get("left_table")
            right = rel.get("right_table")
            cols = rel.get("relationship_columns") or []
            if not (left and right and cols):
                continue
            try:
                model = layer.graph.get_model(left)
            except Exception:
                continue
            fks = [c.get("left_column") for c in cols if c.get("left_column")]
            pks = [c.get("right_column") for c in cols if c.get("right_column")]
            if not fks or len(fks) != len(pks):
                continue
            rtype = rel.get("relationship_type") or "many_to_one"
            if rtype not in ("many_to_one", "one_to_one", "one_to_many", "many_to_many"):
                rtype = "many_to_one"
            jt = str(rel.get("join_type") or "").lower()
            if any(r.name == right for r in model.relationships):
                continue
            model.relationships.append(Relationship(
                name=right, type=rtype,
                foreign_key=fks if len(fks) > 1 else fks[0],
                primary_key=pks if len(pks) > 1 else pks[0],
                join_type="inner" if jt == "inner" else None,
            ))
            layer.graph._invalidate()

    def _parse_table(self, tbl: dict) -> Model | None:
        name = tbl.get("name")
        if not name:
            return None
        base = tbl.get("base_table") or {}
        physical = base.get("table") or name
        schema = base.get("schema")
        table = f"{schema}.{physical}" if schema else physical

        dims: list[Dimension] = []
        for d in tbl.get("dimensions") or []:
            if not d.get("name"):
                continue
            dt = str(d.get("data_type") or "text").lower()
            dims.append(Dimension(
                name=d["name"],
                type="numeric" if dt in ("number", "int", "float", "decimal") else (
                    "boolean" if dt == "boolean" else "categorical"),
                sql=None if d.get("expr") in (None, d["name"]) else d["expr"],
                description=d.get("description"),
            ))
        for td in tbl.get("time_dimensions") or []:
            if not td.get("name"):
                continue
            dims.append(Dimension(
                name=td["name"], type="time",
                sql=None if td.get("expr") in (None, td["name"]) else td["expr"],
                description=td.get("description"),
            ))

        mets: list[Metric] = []
        for m in (tbl.get("measures") or []) + (tbl.get("facts") or []):
            if not m.get("name"):
                continue
            agg = AGG_TYPES.get(str(m.get("default_aggregation") or "sum").lower(), "sum")
            mets.append(Metric(
                name=m["name"], agg=agg,
                sql=m.get("expr") or m["name"],
                description=m.get("description"),
            ))
        # Cortex "metrics" entries carry complete SQL over the table
        for m in tbl.get("metrics") or []:
            if not m.get("name") or not m.get("expr"):
                continue
            mets.append(Metric(name=m["name"], sql=m["expr"],
                               description=m.get("description")))

        segs = []
        for f in tbl.get("filters") or []:
            if f.get("name") and f.get("expr"):
                segs.append(Segment(name=f["name"], sql=f["expr"],
                                    description=f.get("description")))

        pk_cols = (tbl.get("primary_key") or {}).get("columns") or []
        return Model(
            name=name, table=table,
            primary_key=pk_cols if len(pk_cols) > 1 else (pk_cols[0] if pk_cols else "id"),
            dimensions=dims, metrics=mets, segments=segs,
            description=tbl.get("description"),
        )


# ----------------------------------------------------------------------
# export (reference adapters/snowflake.py export contract)
# ----------------------------------------------------------------------

def export_snowflake(graph) -> dict:
    """Graph -> Cortex Analyst semantic-model YAML (dict): tables with
    dimensions/time_dimensions/measures + top-level relationships."""
    tables = []
    rels_out = []
    for model in graph.models.values():
        tbl: dict = {"name": model.name}
        table = model.table or model.name
        if "." in table:
            schema, phys = table.rsplit(".", 1)
            tbl["base_table"] = {"schema": schema, "table": phys}
        else:
            tbl["base_table"] = {"table": table}
        pk = model.pk_list()
        if pk != ["id"]:
            tbl["primary_key"] = {"columns": pk}
        dims, tdims = [], []
        for d in model.dimensions:
            out = {"name": d.name}
            if d.sql and d.sql != d.name:
                out["expr"] = d.sql
            if d.description:
                out["description"] = d.description
            if d.type == "time":
                tdims.append(out)
            else:
                out["data_type"] = {"numeric": "number",
                                    "boolean": "boolean"}.get(d.type, "text")
                dims.append(out)
        if dims:
            tbl["dimensions"] = dims
        if tdims:
            tbl["time_dimensions"] = tdims
        measures = []
        for m in model.metrics:
            if not m.is_simple or m.agg not in (
                "sum", "count", "avg", "min", "max", "count_distinct",
                "approx_count_distinct", "median", "stddev",
            ):
                continue
            measures.append({
                "name": m.name,
                "expr": m.sql or m.name,
                "default_aggregation": m.agg,
                **({"description": m.description} if m.description else {}),
            })
        if measures:
            tbl["measures"] = measures
        if model.segments:
            tbl["filters"] = [
                {"name": s.name, "expr": s.sql,
                 **({"description": s.description} if s.description else {})}
                for s in model.segments
            ]
        if model.description:
            tbl["description"] = model.description
        tables.append(tbl)
    from sidemantic_spark.adapters.base import m2o_edges

    for owner, tgt, fks, pks, rtype, jt in m2o_edges(graph):
        rels_out.append({
            "name": f"{owner}_to_{tgt}",
            "left_table": owner,
            "right_table": tgt,
            "relationship_columns": [
                {"left_column": fk, "right_column": pkc}
                for fk, pkc in zip(fks, pks)
            ],
            "relationship_type": rtype,
            **({"join_type": jt} if jt else {}),
        })
    out: dict = {"name": "semantic_model", "tables": tables}
    if rels_out:
        out["relationships"] = rels_out
    return out
