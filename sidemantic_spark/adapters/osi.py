"""OSI (Open Semantic Interchange) importer.

Re-expression of the reference's OSI adapter (``adapters/osi.py:61``):
``semantic_model`` entries hold ``datasets`` (-> models; ``fields``
with per-dialect expressions -> dimensions, ``dimension.is_time`` ->
time type), ``relationships`` (from/to + from_columns/to_columns) and
``metrics`` whose ANSI_SQL expressions reference dataset-qualified
columns (``SUM(orders.amount)``) — each metric attaches to the model
its expression references.
"""

from __future__ import annotations

import json
import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_QUALIFIED_RE = re.compile(r"\b(\w+)\.(\w+)\b")


def _dialect_expr(obj: dict | None) -> str | None:
    """Pick the ANSI_SQL (preferred) or first dialect expression."""
    if not obj:
        return None
    if isinstance(obj, str):
        return obj
    dialects = obj.get("dialects") or []
    for d in dialects:
        if str(d.get("dialect", "")).upper() in ("ANSI_SQL", "SPARK", "SPARKSQL"):
            return d.get("expression")
    return dialects[0].get("expression") if dialects else obj.get("expression")


class OsiAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        if path.endswith(".json"):
            with open(path) as fh:
                data = json.load(fh)
            self.parse(layer, data)
        else:
            super().parse_file(layer, path)

    def parse(self, layer, data: dict) -> None:
        sms = data.get("semantic_model")
        if sms is None and "datasets" in data:
            sms = [data]
        if isinstance(sms, dict):
            sms = [sms]
        for sm in sms or []:
            if not isinstance(sm, dict):
                continue
            self._parse_semantic_model(layer, sm)

    def _parse_semantic_model(self, layer, sm: dict) -> None:
        dataset_names = []
        for ds in sm.get("datasets") or []:
            model = self._parse_dataset(ds)
            if model is not None:
                dataset_names.append(model.name)
                try:
                    layer.add_model(model)
                except Exception:
                    pass
        for rel in sm.get("relationships") or []:
            frm, to = rel.get("from"), rel.get("to")
            fcols = rel.get("from_columns") or []
            tcols = rel.get("to_columns") or []
            if not (frm and to and fcols):
                continue
            try:
                model = layer.graph.get_model(frm)
            except Exception:
                continue
            if any(r.name == to for r in model.relationships):
                continue
            model.relationships.append(Relationship(
                name=to,
                type=rel.get("type") or "many_to_one",
                foreign_key=fcols if len(fcols) > 1 else fcols[0],
                primary_key=(tcols if len(tcols) > 1 else tcols[0]) if tcols else None,
            ))
            layer.graph._invalidate()
        for met in sm.get("metrics") or []:
            self._attach_metric(layer, met, dataset_names)

    def _parse_dataset(self, ds: dict) -> Model | None:
        name = ds.get("name")
        if not name:
            return None
        dims: list[Dimension] = []
        for f in ds.get("fields") or []:
            fname = f.get("name")
            if not fname:
                continue
            expr = _dialect_expr(f.get("expression"))
            dim_meta = f.get("dimension") or {}
            dims.append(Dimension(
                name=fname,
                type="time" if dim_meta.get("is_time") else "categorical",
                sql=None if expr in (None, fname) else expr,
                description=f.get("description"),
            ))
        pk = ds.get("primary_key") or []
        if isinstance(pk, str):
            pk = [pk]
        return Model(
            name=name,
            table=ds.get("source") or name,
            primary_key=pk if len(pk) > 1 else (pk[0] if pk else "id"),
            dimensions=dims,
            description=ds.get("description"),
        )

    def _attach_metric(self, layer, met: dict, dataset_names: list[str]) -> None:
        name = met.get("name")
        expr = _dialect_expr(met.get("expression"))
        if not name or not expr:
            return
        # find the owning dataset from qualified refs
        owner = None
        for model_name, _col in _QUALIFIED_RE.findall(expr):
            if model_name in layer.graph.models:
                owner = model_name
                break
        if owner is None:
            owner = dataset_names[0] if dataset_names else None
        if owner is None:
            return
        model = layer.graph.models[owner]
        if model.metric(name) is not None:
            return
        # strip the owner qualification: inside the model CTE columns are bare
        local = re.sub(rf"\b{owner}\.(\w+)\b", r"\1", expr)
        model.add_metric(Metric(name=name, sql=local, description=met.get("description")))
        layer.graph._invalidate()


# ----------------------------------------------------------------------
# export (reference adapters/osi.py export contract)
# ----------------------------------------------------------------------

def export_osi(graph) -> dict:
    """Graph -> OSI semantic_model (dict): datasets with per-dialect
    field expressions, relationships, and ANSI_SQL metrics whose column
    refs are dataset-qualified (the import strips the qualification)."""
    from sidemantic_spark.adapters.base import qualify_columns, simple_agg_sql

    datasets = []
    relationships = []
    metrics = []
    for model in graph.models.values():
        ds: dict = {"name": model.name, "source": model.table or model.name}
        pk = model.pk_list()
        if pk != ["id"]:
            ds["primary_key"] = pk if len(pk) > 1 else pk[0]
        fields = []
        for d in model.dimensions:
            f: dict = {"name": d.name}
            if d.sql and d.sql != d.name:
                f["expression"] = {"dialects": [
                    {"dialect": "ANSI_SQL", "expression": d.sql}
                ]}
            if d.type == "time":
                f["dimension"] = {"is_time": True}
            if d.description:
                f["description"] = d.description
            fields.append(f)
        if fields:
            ds["fields"] = fields
        if model.description:
            ds["description"] = model.description
        datasets.append(ds)
        for m in model.metrics:
            agg_sql = simple_agg_sql(m)
            if agg_sql is None:
                continue
            # COUNT(*) carries no qualified ref, so the import could not
            # resolve the owning dataset — count the (non-null) pk instead
            if agg_sql == "COUNT(*)" and pk:
                agg_sql = f"COUNT({pk[0]})"
            metrics.append({
                "name": m.name,
                "expression": {"dialects": [
                    {"dialect": "ANSI_SQL",
                     "expression": qualify_columns(agg_sql, model.name)}
                ]},
                **({"description": m.description} if m.description else {}),
            })
    from sidemantic_spark.adapters.base import m2o_edges

    for owner, tgt, fks, pks, rtype, _jt in m2o_edges(graph):
        relationships.append({
            "from": owner, "to": tgt, "type": rtype,
            "from_columns": fks, "to_columns": pks,
        })
    sm: dict = {"datasets": datasets}
    if relationships:
        sm["relationships"] = relationships
    if metrics:
        sm["metrics"] = metrics
    return {"semantic_model": [sm]}
