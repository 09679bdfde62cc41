"""MetricFlow / dbt Semantic Layer importer.

Maps dbt ``semantic_models`` + ``metrics`` YAML (reference
``adapters/metricflow.py``; public spec docs.getdbt.com/docs/build/
semantic-models) onto our graph:

- semantic_model -> Model; ``model: ref('tbl')`` -> table
- entities: primary -> model pk; foreign -> many_to_one Relationship to
  whichever model declares that entity as primary (resolved after all
  models parse)
- measures -> Metric (agg, expr; ``non_additive_dimension`` with
  window_choice/window_groupings -> semi-additive fields;
  ``create_metric: true`` also registers a graph-level metric)
- dimensions: time (granularity from type_params) / categorical
- metrics: simple (measure passthrough), ratio, derived, cumulative
  (window / grain_to_date), conversion -> graph-level Metric
"""

from __future__ import annotations

from sidemantic_spark.adapters.base import BaseAdapter, resolve_dbt_ref
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship


class MetricFlowAdapter(BaseAdapter):
    def parse(self, layer, data: dict) -> None:
        parsed: list[tuple[Model, list[dict], str | None]] = []
        for sm in data.get("semantic_models") or []:
            parsed.append(self._parse_semantic_model(sm))

        # entity name -> owning model (declared primary there)
        primary_owner: dict[str, str] = {}
        for model, _entities, primary in parsed:
            if primary:
                primary_owner[primary] = model.name
        for name, mdl in layer.graph.models.items():
            pe = getattr(mdl, "_mf_primary_entity", None)
            if pe:
                primary_owner.setdefault(pe, name)

        for model, entities, _primary in parsed:
            for e in entities:
                if e.get("type") == "foreign" and e["name"] in primary_owner:
                    target = primary_owner[e["name"]]
                    if target != model.name:
                        model.relationships.append(Relationship(
                            name=target,
                            type="many_to_one",
                            foreign_key=e.get("expr") or e["name"],
                        ))
            layer.add_model(model)

        for mdata in data.get("metrics") or []:
            metric = self._parse_metric(mdata)
            if metric is not None:
                layer.graph.add_metric(metric)

        for sq in data.get("saved_queries") or []:
            from sidemantic_spark.core.consumption import SavedQuery

            qp = sq.get("query_params") or {}
            layer.graph.add_saved_query(SavedQuery(
                name=sq["name"],
                metrics=qp.get("metrics") or [],
                dimensions=[_strip_dunder(d) for d in qp.get("group_by") or []],
                filters=qp.get("where") or [],
                description=sq.get("description"),
            ))

    def _parse_semantic_model(self, sm: dict):
        name = sm["name"]
        table = resolve_dbt_ref(sm.get("model")) or name
        defaults = sm.get("defaults") or {}
        agg_time_dim = defaults.get("agg_time_dimension")

        entities = sm.get("entities") or []
        pk = None
        primary_entity = sm.get("primary_entity")
        for e in entities:
            if e.get("type") == "primary":
                pk = e.get("expr") or e["name"]
                primary_entity = primary_entity or e["name"]

        dims: list[Dimension] = []
        for d in sm.get("dimensions") or []:
            tp = d.get("type_params") or {}
            dims.append(Dimension(
                name=d["name"],
                type="time" if d.get("type") == "time" else "categorical",
                sql=d.get("expr"),
                granularity=tp.get("time_granularity"),
                description=d.get("description"),
            ))

        metrics: list[Metric] = []
        for m in sm.get("measures") or []:
            nad = m.get("non_additive_dimension") or {}
            metrics.append(Metric(
                name=m["name"],
                agg={"sum_boolean": "sum", "percentile": "median"}.get(m.get("agg"), m.get("agg")),
                sql=m.get("expr"),
                description=m.get("description"),
                non_additive_dimension=nad.get("name"),
                non_additive_window={"min": "min", "max": "max"}.get(
                    nad.get("window_choice", "max"), "max"
                ),
                non_additive_window_groupings=nad.get("window_groupings") or [],
            ))

        model = Model(
            name=name,
            table=table,
            primary_key=pk or "id",
            dimensions=dims,
            metrics=metrics,
            default_time_dimension=agg_time_dim if any(
                d.name == agg_time_dim and d.type == "time" for d in dims
            ) else None,
            description=sm.get("description"),
        )
        model._mf_primary_entity = primary_entity
        return model, entities, primary_entity

    def _parse_metric(self, m: dict) -> Metric | None:
        tp = m.get("type_params") or {}
        mtype = m.get("type", "simple")
        name = m["name"]
        if mtype == "simple":
            measure = tp.get("measure")
            measure_name = measure["name"] if isinstance(measure, dict) else measure
            if measure_name == name:
                return None  # same-named passthrough; model metric suffices
            return Metric(name=name, type="derived", expr=measure_name,
                          description=m.get("description"))
        if mtype == "ratio":
            num, den = tp.get("numerator"), tp.get("denominator")
            num = num["name"] if isinstance(num, dict) else num
            den = den["name"] if isinstance(den, dict) else den
            return Metric(name=name, type="ratio", numerator=num, denominator=den,
                          description=m.get("description"))
        if mtype == "derived":
            return Metric(name=name, type="derived", expr=tp.get("expr"),
                          description=m.get("description"))
        if mtype == "cumulative":
            ctp = tp.get("cumulative_type_params") or {}
            measure = tp.get("measure")
            measure_name = measure["name"] if isinstance(measure, dict) else measure
            return Metric(
                name=name, type="cumulative", base_metric=measure_name,
                window=tp.get("window") or ctp.get("window"),
                grain_to_date=tp.get("grain_to_date") or ctp.get("grain_to_date"),
                description=m.get("description"),
            )
        if mtype == "conversion":
            ctp = tp.get("conversion_type_params") or {}
            base = ctp.get("base_measure")
            conv = ctp.get("conversion_measure")
            return Metric(
                name=name, type="conversion",
                entity=ctp.get("entity"),
                base_event=base["name"] if isinstance(base, dict) else base,
                conversion_event=conv["name"] if isinstance(conv, dict) else conv,
                conversion_window=ctp.get("window"),
                description=m.get("description"),
            )
        return Metric(name=name, type="derived", expr=tp.get("expr") or name)


def _strip_dunder(ref: str) -> str:
    """``Dimension('order_id__ordered_at').grain('month')`` and
    ``metric_time__month`` style refs -> plain dim refs."""
    import re

    m = re.search(r"Dimension\(\s*'([^']+)'\s*\)(?:\.grain\(\s*'(\w+)'\s*\))?", ref)
    if m:
        base = m.group(1).split("__", 1)[-1]
        return f"{base}__{m.group(2)}" if m.group(2) else base
    return ref


# ----------------------------------------------------------------------
# export (reference adapters/base.py:9 parse/export contract)
# ----------------------------------------------------------------------

def export_metricflow(graph) -> dict:
    """Graph -> dbt/MetricFlow semantic-model YAML document (dict)."""
    semantic_models = []
    metrics_out = []
    for model in graph.models.values():
        entities = []
        pk = model.pk_list()
        entities.append({
            "name": model.name,
            "type": "primary",
            "expr": pk[0] if len(pk) == 1 else " || ".join(pk),
        })
        for r in model.relationships:
            if r.type == "many_to_one" and r.foreign_key:
                fks = r.fk_list()
                entities.append({"name": r.name, "type": "foreign",
                                 "expr": fks[0] if len(fks) == 1 else " || ".join(fks)})
        dims = []
        for d in model.dimensions:
            out = {"name": d.name, "type": "time" if d.type == "time" else "categorical"}
            if d.sql and d.sql != d.name:
                out["expr"] = d.sql
            if d.type == "time":
                out["type_params"] = {"time_granularity": d.granularity or "day"}
            dims.append(out)
        measures = []
        for m in model.metrics:
            if m.type == "ratio":
                metrics_out.append({
                    "name": m.name, "type": "ratio",
                    "type_params": {"numerator": m.numerator, "denominator": m.denominator},
                })
                continue
            if m.type == "derived":
                metrics_out.append({
                    "name": m.name, "type": "derived",
                    "type_params": {"expr": m.expr},
                })
                continue
            if not m.is_simple:
                continue
            out = {"name": m.name, "agg": m.agg or "sum"}
            if m.sql:
                out["expr"] = m.sql
            measures.append(out)
        sm = {"name": model.name,
              "model": f"ref('{model.table or model.name}')",
              "entities": entities}
        if dims:
            sm["dimensions"] = dims
        if measures:
            sm["measures"] = measures
        semantic_models.append(sm)
    doc: dict = {"semantic_models": semantic_models}
    for name, m in graph.metrics.items():
        if m.type == "ratio":
            metrics_out.append({"name": name, "type": "ratio",
                                "type_params": {"numerator": m.numerator,
                                                "denominator": m.denominator}})
        elif m.type == "derived":
            metrics_out.append({"name": name, "type": "derived",
                                "type_params": {"expr": m.expr}})
    if metrics_out:
        doc["metrics"] = metrics_out
    return doc
