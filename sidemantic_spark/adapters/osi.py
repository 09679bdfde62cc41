"""OSI (Open Semantic Interchange) importer.

Re-expression of the reference's OSI adapter (``adapters/osi.py:56``;
public spec github.com/open-semantic-interchange/OSI). Both profiles
are handled by one parser: the in-development ``0.2.x`` YAML profile
and the released ``0.1.x`` JSON profile that dbt's OSI consumer ingests
from an ``OSI/`` directory (generated ``target/``/``dbt_packages/``
copies are skipped on directory parses).

- ``semantic_model`` entries (list or single object) and the ontology
  spec's ``ontology_mappings[].semantic_model`` both yield datasets;
  semantic-model-level fields plus ``version``/``ontology`` are
  preserved under ``graph.metadata["osi"]``
- datasets -> models (``source`` binding, ``primary_key`` composite,
  ``unique_keys`` retained in meta, first time field becomes the
  default time dimension)
- fields -> dimensions (per-dialect expressions with ANSI_SQL
  preference, ``dimension.is_time`` -> time)
- metrics carry full aggregate expressions over dataset-qualified
  columns (``SUM(orders.amount)``): each attaches to the model its
  expression references with the qualification stripped — the
  reference registers them graph-level instead (``adapters/osi.py:385``)
- ``ai_context`` / ``custom_extensions`` are retained in meta at every
  level; a single SIDEMANTIC-vendor extension wrapper is unwrapped
  back to its JSON payload (ref ``:933-953``)
- relationships (from/to + from_columns/to_columns, composite)
"""

from __future__ import annotations

import json
import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.graph import SemanticGraphError
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_QUALIFIED_RE = re.compile(r"\b(\w+)\.(\w+)\b")
_DIALECT_PREFERENCE = ["ANSI_SQL", "SPARK", "SPARKSQL", "DATABRICKS",
                       "SNOWFLAKE", "MAQL", "TABLEAU", "MDX"]
_GENERATED_DIRS = {"target", "dbt_packages"}


def _dialect_expr(obj: dict | None) -> str | None:
    """Pick the preferred dialect expression (ANSI_SQL first, then the
    Spark-executable dialects, then anything)."""
    if not obj:
        return None
    if isinstance(obj, str):
        return obj
    dialects = obj.get("dialects") or []
    by_name = {str(d.get("dialect", "")).upper(): d.get("expression")
               for d in dialects if d.get("expression")}
    for pref in _DIALECT_PREFERENCE:
        if pref in by_name:
            return by_name[pref]
    if dialects and dialects[0].get("expression"):
        return dialects[0]["expression"]
    return obj.get("expression")


def _decode_extensions(ext) -> object | None:
    """Unwrap a single SIDEMANTIC-vendor extension back to its payload;
    restore vendors the released JSON profile coerced to COMMON."""
    if isinstance(ext, list):
        restored = []
        for e in ext:
            if isinstance(e, dict) and e.get("vendor_name") == "COMMON" \
                    and e.get("original_vendor_name"):
                e = dict(e, vendor_name=e.pop("original_vendor_name"))
                e.pop("original_vendor_name", None)
            restored.append(e)
        ext = restored
    if (isinstance(ext, list) and len(ext) == 1 and isinstance(ext[0], dict)
            and ext[0].get("vendor_name") == "SIDEMANTIC"):
        data = ext[0].get("data")
        if isinstance(data, str):
            try:
                return json.loads(data)
            except json.JSONDecodeError:
                return data
        return data
    return ext


def _field_meta(obj: dict) -> dict | None:
    meta = {}
    if "ai_context" in obj:
        meta["ai_context"] = obj.get("ai_context")
    ext = _decode_extensions(obj.get("custom_extensions"))
    if ext is not None:
        meta["custom_extensions"] = ext
    return meta or None


class OsiAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        import os

        if os.path.isdir(path):
            for root, dirs, files in os.walk(path):
                # dbt writes a compiled OSI copy to target/ — parsing it
                # would duplicate or resurrect stale models
                dirs[:] = [d for d in dirs if d not in _GENERATED_DIRS]
                for f in sorted(files):
                    if f.endswith((".yml", ".yaml", ".json")):
                        self.parse_file(layer, os.path.join(root, f))
            return
        if path.endswith(".json"):
            with open(path) as fh:
                text = fh.read()
            if text.strip():
                self.parse(layer, json.loads(text))
        else:
            super().parse_file(layer, path)

    def parse(self, layer, data: dict) -> None:
        osi_meta = layer.graph.metadata.setdefault("osi", {"semantic_models": []})
        if data.get("version"):
            osi_meta["version"] = data["version"]
        if data.get("ontology"):
            osi_meta["ontology"] = data["ontology"]

        sms = data.get("semantic_model")
        if sms is None and "datasets" in data:
            sms = [data]
        if isinstance(sms, dict):
            sms = [sms]
        entries: list[tuple[dict, str, dict | None]] = [
            (sm, "semantic_model", None) for sm in sms or []
            if isinstance(sm, dict)
        ]
        # ontology spec: one semantic model per mapping entry
        for i, mapping in enumerate(data.get("ontology_mappings") or []):
            if isinstance(mapping, dict) and isinstance(
                    mapping.get("semantic_model"), dict):
                entries.append((mapping["semantic_model"],
                                f"ontology_mappings[{i}].semantic_model",
                                mapping))

        for sm, source, mapping in entries:
            sm_meta: dict = {"source": source}
            for key in ("name", "description", "ai_context", "custom_extensions"):
                if key in sm:
                    sm_meta[key] = sm[key]
            if mapping:
                mm = {k: mapping[k]
                      for k in ("name", "description", "concept_mappings")
                      if k in mapping}
                if mm:
                    sm_meta["ontology_mapping"] = mm
            osi_meta.setdefault("semantic_models", []).append(sm_meta)
            self._parse_semantic_model(layer, sm)

    def _parse_semantic_model(self, layer, sm: dict) -> None:
        dataset_names = []
        for ds in sm.get("datasets") or []:
            model = self._parse_dataset(ds)
            if model is not None:
                dataset_names.append(model.name)
                try:
                    layer.add_model(model)
                except SemanticGraphError:
                    pass  # duplicate across imports: first wins
        for rel in sm.get("relationships") or []:
            frm, to = rel.get("from"), rel.get("to")
            fcols = rel.get("from_columns") or []
            tcols = rel.get("to_columns") or []
            if not (frm and to):
                continue
            try:
                model = layer.graph.get_model(frm)
            except SemanticGraphError:
                continue
            if any(r.name == to for r in model.relationships):
                continue
            fk = (fcols if len(fcols) > 1 else fcols[0]) if fcols else f"{to}_id"
            model.relationships.append(Relationship(
                name=to,
                type=rel.get("type") or "many_to_one",
                foreign_key=fk,
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
            is_time = bool((f.get("dimension") or {}).get("is_time"))
            dims.append(Dimension(
                name=fname,
                type="time" if is_time else "categorical",
                sql=None if expr in (None, fname) else expr,
                granularity="day" if is_time else None,
                description=f.get("description"),
                label=f.get("label"),
                meta=_field_meta(f),
            ))
        pk = ds.get("primary_key") or []
        if isinstance(pk, str):
            pk = [pk]
        meta = _field_meta(ds) or {}
        if ds.get("unique_keys"):
            meta["osi_unique_keys"] = ds["unique_keys"]
        return Model(
            name=name,
            table=ds.get("source") or name,
            primary_key=pk if len(pk) > 1 else (pk[0] if pk else "id"),
            dimensions=dims,
            default_time_dimension=next(
                (d.name for d in dims if d.type == "time"), None),
            description=ds.get("description"),
            meta=meta or None,
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
        model.add_metric(Metric(name=name, sql=local,
                                description=met.get("description"),
                                meta=_field_meta(met)))
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
        if (model.meta or {}).get("osi_unique_keys"):
            ds["unique_keys"] = model.meta["osi_unique_keys"]
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
            if d.label:
                f["label"] = d.label
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
