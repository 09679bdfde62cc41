"""GoodData declarative LDM / analytics importer.

Re-expression of the reference's GoodData adapter
(``adapters/gooddata.py:32`` parse; cloud LDM ``:122``, legacy project
model ``:505``): datasets map to models (attributes -> dimensions via
sourceColumn, facts -> sum metrics, grain -> primary key, references ->
many_to_one relationships); analytics ``metrics`` with simple MAQL
(``SELECT <AGG>({fact/x})`` or arithmetic over ``{metric/y}`` refs)
become graph-level metrics.
"""

from __future__ import annotations

import json
import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_MAQL_AGG_RE = re.compile(
    r"^\s*SELECT\s+(SUM|COUNT|AVG|MIN|MAX|MEDIAN)\s*\(\s*\{(?:fact|label|attribute)/([\w.]+)\}\s*"
    r"(?:,\s*\{(?:label|attribute)/[\w.]+\}\s*)?\)\s*$",
    re.I,
)
_MAQL_METRIC_REF_RE = re.compile(r"\{metric/([\w.]+)\}")
_DATE_TYPES = {"DATE", "TIMESTAMP", "TIMESTAMP_TZ"}


class GoodDataAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        with open(path) as fh:
            data = json.load(fh)
        self.parse(layer, data)

    def parse(self, layer, data: dict) -> None:
        if "ldm" in data:
            self._parse_cloud_ldm(layer, data["ldm"])
        if "analytics" in data:
            self._parse_analytics(layer, data["analytics"])
        if "projectModel" in data:
            self._parse_legacy(layer, data["projectModel"])
        # SDK declarative bundles nest under declarativeModel/declarativeAnalytics
        dm = data.get("declarativeModel") or {}
        if "ldm" in dm:
            self._parse_cloud_ldm(layer, dm["ldm"])
        da = data.get("declarativeAnalytics") or {}
        if "analytics" in da:
            self._parse_analytics(layer, da["analytics"])

    # -- cloud LDM ---------------------------------------------------

    def _parse_cloud_ldm(self, layer, ldm: dict) -> None:
        for ds in ldm.get("datasets") or []:
            if isinstance(ds.get("dataset"), dict):
                ds = ds["dataset"]
            model = self._parse_dataset(ds)
            if model is not None:
                try:
                    layer.add_model(model)
                except Exception:
                    pass
        for dd in ldm.get("dateInstances") or ldm.get("dateDatasets") or []:
            if isinstance(dd.get("dateInstance"), dict):
                dd = dd["dateInstance"]
            name = dd.get("id")
            if not name:
                continue
            try:
                layer.add_model(Model(
                    name=name, table=name, primary_key="date",
                    dimensions=[Dimension(name="date", type="time", granularity="day")],
                    description=dd.get("title"),
                ))
            except Exception:
                pass

    def _parse_dataset(self, ds: dict) -> Model | None:
        name = ds.get("id")
        if not name:
            return None
        dims: list[Dimension] = []
        mets: list[Metric] = []
        for attr in ds.get("attributes") or []:
            if isinstance(attr.get("attribute"), dict):
                attr = attr["attribute"]
            aid = attr.get("id")
            if not aid:
                continue
            src = attr.get("sourceColumn") or aid
            dt = (attr.get("sourceColumnDataType") or "STRING").upper()
            dims.append(Dimension(
                name=aid,
                type="time" if dt in _DATE_TYPES else (
                    "numeric" if dt in ("NUMERIC", "INT", "DECIMAL") else "categorical"),
                sql=None if src == aid else src,
                label=attr.get("title"),
            ))
        for fact in ds.get("facts") or []:
            if isinstance(fact.get("fact"), dict):
                fact = fact["fact"]
            fid = fact.get("id")
            if not fid:
                continue
            src = fact.get("sourceColumn") or fid
            # facts are additive numeric columns; expose both the raw
            # column (as a numeric dimension for filters) and SUM metric
            dims.append(Dimension(name=f"{fid}__raw", type="numeric",
                                  sql=src, public=False))
            mets.append(Metric(name=fid, agg="sum", sql=src, label=fact.get("title")))
        rels: list[Relationship] = []
        for ref in ds.get("references") or []:
            ident = (ref.get("identifier") or {}).get("id")
            cols = ref.get("sourceColumns") or []
            if ident and cols:
                rels.append(Relationship(
                    name=ident, type="many_to_one", foreign_key=cols[0],
                ))
        grain = ds.get("grain") or []
        pk = grain[0]["id"] if grain and isinstance(grain[0], dict) and grain[0].get("id") else "id"
        table = None
        dst = ds.get("dataSourceTableId") or {}
        if isinstance(dst, dict) and dst.get("path"):
            table = dst["path"][-1]
        return Model(
            name=name, table=table or name, primary_key=pk,
            dimensions=dims, metrics=mets, relationships=rels,
            description=ds.get("title"),
        )

    # -- analytics metrics (MAQL subset) -----------------------------

    def _parse_analytics(self, layer, analytics: dict) -> None:
        for met in analytics.get("metrics") or []:
            mid = met.get("id")
            content = met.get("content") or {}
            maql = content.get("maql") or ""
            title = content.get("title") or met.get("title")
            if not mid or not maql:
                continue
            m = _MAQL_AGG_RE.match(maql)
            if m:
                agg = {"sum": "sum", "count": "count_distinct", "avg": "avg",
                       "min": "min", "max": "max", "median": "median"}[m.group(1).lower()]
                ref = m.group(2)
                owner = self._owner_of(layer, ref)
                if owner:
                    target = layer.graph.models[owner]
                    if target.metric(mid) is None and not any(d.name == mid for d in target.dimensions):
                        src = ref if agg != "count_distinct" else ref
                        target.add_metric(Metric(name=mid, agg=agg, sql=self._column_of(target, ref), label=title))
                continue
            # pure arithmetic over metric refs -> graph-level derived metric
            stripped = re.sub(r"^\s*SELECT\s+", "", maql, flags=re.I)
            stripped = re.sub(r"\s+BY\s+.*$", "", stripped, flags=re.I)
            if _MAQL_METRIC_REF_RE.search(stripped):
                body = _MAQL_METRIC_REF_RE.sub(lambda mm: mm.group(1), stripped)
                if re.match(r"^[\w\s+\-*/().,]+$", body):
                    layer.graph.add_metric(Metric(name=mid, type="derived", expr=body, label=title))

    def _owner_of(self, layer, field_id: str) -> str | None:
        for name, model in layer.graph.models.items():
            if model.metric(field_id) is not None or any(
                d.name == field_id for d in model.dimensions
            ):
                return name
        return None

    def _column_of(self, model, field_id: str) -> str:
        d = model.dimension(field_id)
        if d is not None:
            return d.sql or field_id
        m = model.metric(field_id)
        if m is not None and m.sql:
            return m.sql
        return field_id

    # -- legacy project model ---------------------------------------

    def _parse_legacy(self, layer, pm: dict) -> None:
        for ds in pm.get("datasets") or []:
            if isinstance(ds.get("dataset"), dict):
                ds = ds["dataset"]
            name = ds.get("identifier") or ds.get("title")
            if not name:
                continue
            name = _legacy_name(name)
            dims: list[Dimension] = []
            mets: list[Metric] = []
            pk = "id"
            anchor = ds.get("anchor") or {}
            if isinstance(anchor.get("attribute"), dict):
                a = anchor["attribute"]
                pk = _legacy_name(a.get("identifier") or "id")
                dims.append(Dimension(name=pk, sql=_legacy_col(a)))
            for attr in ds.get("attributes") or []:
                if isinstance(attr.get("attribute"), dict):
                    attr = attr["attribute"]
                aid = _legacy_name(attr.get("identifier") or "")
                if aid:
                    dims.append(Dimension(name=aid, sql=_legacy_col(attr), label=attr.get("title")))
            for fact in ds.get("facts") or []:
                if isinstance(fact.get("fact"), dict):
                    fact = fact["fact"]
                fid = _legacy_name(fact.get("identifier") or "")
                if fid:
                    mets.append(Metric(name=fid, agg="sum", sql=_legacy_col(fact), label=fact.get("title")))
            try:
                layer.add_model(Model(name=name, table=name, primary_key=pk,
                                      dimensions=dims, metrics=mets))
            except Exception:
                pass


def _legacy_name(ident: str) -> str:
    """``attr.orders.status`` -> ``status``; ``dataset.orders`` -> ``orders``."""
    return ident.split(".")[-1] if ident else ident


def _legacy_col(obj: dict) -> str | None:
    cols = obj.get("sourceColumn")
    if isinstance(cols, str):
        return cols
    return None


# ----------------------------------------------------------------------
# export (reference adapters/gooddata.py export contract)
# ----------------------------------------------------------------------

def export_gooddata(graph) -> dict:
    """Graph -> GoodData declarative bundle: cloud LDM datasets
    (attributes/facts/references/grain) + analytics metrics for derived
    formulas (MAQL arithmetic over ``{metric/...}`` refs). Sum metrics
    ride as facts; other agg types have no LDM slot and are emitted as
    ``SELECT AGG({fact/...})`` MAQL metrics."""
    from sidemantic_spark.adapters.base import m2o_edges

    edges: dict[str, list] = {}
    for owner, tgt, fks, pks, rtype, _jt in m2o_edges(graph):
        if rtype == "many_to_one" and len(fks) == 1:
            edges.setdefault(owner, []).append((tgt, fks[0]))

    maql_agg = {"count_distinct": "COUNT", "avg": "AVG", "min": "MIN",
                "max": "MAX", "median": "MEDIAN", "sum": "SUM"}
    datasets = []
    analytics_metrics = []
    for model in graph.models.values():
        ds: dict = {"id": model.name}
        if model.description:
            ds["title"] = model.description
        attributes = []
        for d in model.dimensions:
            if d.name.endswith("__raw") and not d.public:
                continue  # re-synthesized from facts below
            attr = {"id": d.name}
            src = d.sql or d.name
            if src != d.name:
                attr["sourceColumn"] = src
            attr["sourceColumnDataType"] = {
                "time": "DATE", "numeric": "NUMERIC", "boolean": "STRING",
            }.get(d.type, "STRING")
            if d.label:
                attr["title"] = d.label
            attributes.append({"attribute": attr})
        facts = []
        attr_ids = {a["attribute"]["id"] for a in attributes}
        for m in model.metrics:
            if m.is_simple and m.agg == "sum" and m.sql:
                fact = {"id": m.name, "sourceColumn": m.sql}
                if m.label:
                    fact["title"] = m.label
                facts.append({"fact": fact})
            elif m.is_simple and (
                (m.agg in maql_agg and m.sql)
                # plain row count: MAQL has no COUNT(*) — count the grain
                # attribute (COUNT reimports as count_distinct(pk), equal
                # for a unique key; fidelity reports the approximation)
                or (m.agg == "count" and not m.sql)
            ):
                import re as _re

                ref = m.sql if m.sql else (
                    model.pk_list()[0] if model.pk_list() else None
                )
                if ref is None or not _re.fullmatch(r"\w+", ref):
                    continue  # expression measures have no MAQL fact ref
                if ref not in attr_ids:
                    attributes.append({"attribute": {
                        "id": ref, "sourceColumnDataType": "NUMERIC",
                    }})
                    attr_ids.add(ref)
                fn = maql_agg.get(m.agg, "COUNT")
                analytics_metrics.append({
                    "id": m.name,
                    "content": {
                        "title": m.label or m.name,
                        "maql": f"SELECT {fn}({{fact/{ref}}})",
                    },
                })
            elif m.type == "derived" and m.expr:
                import re as _re

                body = _re.sub(r"\b([a-zA-Z_]\w*)\b",
                               lambda mm: f"{{metric/{mm.group(1)}}}"
                               if graph_metric_exists(graph, mm.group(1))
                               else mm.group(1), m.expr)
                analytics_metrics.append({
                    "id": m.name,
                    "content": {"title": m.label or m.name,
                                "maql": f"SELECT {body}"},
                })
        if attributes:
            ds["attributes"] = attributes
        if facts:
            ds["facts"] = facts
        pk = model.pk_list()
        if pk and pk != ["id"]:
            ds["grain"] = [{"id": pk[0]}]
        if model.table and model.table != model.name:
            ds["dataSourceTableId"] = {"path": [model.table]}
        refs = []
        for tgt, fk in edges.get(model.name, []):
            refs.append({"identifier": {"id": tgt}, "sourceColumns": [fk]})
        if refs:
            ds["references"] = refs
        datasets.append({"dataset": ds})
    out: dict = {"ldm": {"datasets": datasets}}
    if analytics_metrics:
        out["analytics"] = {"metrics": analytics_metrics}
    return out


def graph_metric_exists(graph, name: str) -> bool:
    if name in getattr(graph, "metrics", {}):
        return True
    return any(m.metric(name) is not None for m in graph.models.values())
