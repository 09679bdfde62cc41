"""Versioned semantic dashboard documents (ref ``sidemantic/dashboard.py``).

Same authoring contract as the reference — a ``sidemantic.dashboard.v1``
YAML/JSON payload of tabs of charts over semantic metric/dimension
refs, validated against the layer's graph — with a Spark-native
renderer: instead of the reference's 5k-LoC crossfilter runtime,
:func:`render_dashboard_html` compiles every chart through the layer
(one semantic query each, preagg routing and security included) and
emits ONE self-contained HTML page of Vega-Lite views.  The TS type
generator (:func:`generate_dashboard_typescript`) mirrors the
reference's ``dashboard types`` output shape.
"""

from __future__ import annotations

import html as _html
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Mapping

DASHBOARD_SCHEMA = "sidemantic.dashboard.v1"
TS_SCHEMA = DASHBOARD_SCHEMA + "+types"
VALID_CHART_TYPES = {"auto", "bar", "line", "area", "scatter", "point"}
VALID_RENDERERS = {"vega-lite", "plotly", "observable-plot", "d3", "crossfilter"}
TIME_GRANULARITIES = [
    "second", "minute", "hour", "day", "week", "month", "quarter", "year",
]

__all__ = [
    "DASHBOARD_SCHEMA",
    "DashboardDocument",
    "DashboardSpecError",
    "build_semantic_types_schema",
    "generate_dashboard_typescript",
    "load_dashboard",
    "render_dashboard_html",
]


class DashboardSpecError(ValueError):
    """Raised when a dashboard spec cannot be loaded or built."""


@dataclass(frozen=True)
class DashboardDocument:
    """A versioned semantic dashboard definition (ref dashboard.py:42)."""

    payload: dict[str, Any]

    @classmethod
    def from_file(cls, path: str | Path) -> "DashboardDocument":
        spec_path = Path(path)
        if not spec_path.exists():
            raise DashboardSpecError(f"Dashboard spec {spec_path} does not exist")
        text = spec_path.read_text()
        if spec_path.suffix.lower() == ".json":
            payload = json.loads(text)
        else:
            import yaml

            payload = yaml.safe_load(text)
        return cls.from_dict(payload)

    @classmethod
    def from_dict(cls, payload: Mapping[str, Any]) -> "DashboardDocument":
        if not isinstance(payload, Mapping):
            raise DashboardSpecError("Dashboard spec must be a mapping")
        return cls(dict(payload))

    @property
    def title(self) -> str:
        return str(self.payload.get("title") or "Semantic Dashboard")

    @property
    def tabs(self) -> list[dict[str, Any]]:
        return list(self.payload.get("tabs") or [])

    def to_dict(self) -> dict[str, Any]:
        return dict(self.payload)

    def validate(self, layer) -> list[str]:
        """Structural + reference errors against the layer's graph
        (ref dashboard.py:85)."""
        schema = build_semantic_types_schema(layer)
        metrics = set(schema["metrics"])
        fields = set(schema["fields"])
        errors: list[str] = []

        declared = self.payload.get("schema")
        if declared not in (None, DASHBOARD_SCHEMA):
            errors.append(f"schema must be {DASHBOARD_SCHEMA!r}")
        if not isinstance(self.payload.get("title"), str) or not self.payload.get("title"):
            errors.append("title is required")

        defaults = self.payload.get("defaults") or {}
        if defaults and not isinstance(defaults, Mapping):
            errors.append("defaults must be a mapping")
        elif isinstance(defaults, Mapping) and "renderer" in defaults:
            if str(defaults["renderer"]) not in VALID_RENDERERS:
                errors.append(
                    "defaults.renderer must be one of: "
                    + ", ".join(sorted(VALID_RENDERERS))
                )

        tabs = self.payload.get("tabs")
        if not isinstance(tabs, list) or not tabs:
            errors.append("tabs must be a non-empty list")
            return errors

        tab_ids: set[str] = set()
        for ti, tab in enumerate(tabs):
            path = f"tabs[{ti}]"
            if not isinstance(tab, Mapping):
                errors.append(f"{path} must be a mapping")
                continue
            tab_id = tab.get("id")
            if not isinstance(tab_id, str) or not tab_id:
                errors.append(f"{path}.id is required")
            elif tab_id in tab_ids:
                errors.append(f"{path}.id duplicates {tab_id!r}")
            else:
                tab_ids.add(tab_id)
            charts = tab.get("charts")
            if not isinstance(charts, list) or not charts:
                errors.append(f"{path}.charts must be a non-empty list")
                continue
            chart_ids: set[str] = set()
            for ci, chart in enumerate(charts):
                cpath = f"{path}.charts[{ci}]"
                if not isinstance(chart, Mapping):
                    errors.append(f"{cpath} must be a mapping")
                    continue
                cid = chart.get("id")
                if not isinstance(cid, str) or not cid:
                    errors.append(f"{cpath}.id is required")
                elif cid in chart_ids:
                    errors.append(f"{cpath}.id duplicates {cid!r}")
                else:
                    chart_ids.add(cid)
                ctype = str(chart.get("type") or "auto")
                if ctype not in VALID_CHART_TYPES:
                    errors.append(
                        f"{cpath}.type must be one of: "
                        + ", ".join(sorted(VALID_CHART_TYPES))
                    )
                renderer = chart.get("renderer")
                if renderer is not None and str(renderer) not in VALID_RENDERERS:
                    errors.append(
                        f"{cpath}.renderer must be one of: "
                        + ", ".join(sorted(VALID_RENDERERS))
                    )
                cmetrics = chart.get("metrics") or []
                cdims = chart.get("dimensions") or []
                if not cmetrics and not cdims:
                    errors.append(f"{cpath} needs metrics or dimensions")
                for ref in cmetrics:
                    if ref not in metrics:
                        errors.append(f"{cpath}.metrics: unknown metric {ref!r}")
                for ref in cdims:
                    if ref not in fields:
                        errors.append(f"{cpath}.dimensions: unknown field {ref!r}")
        return errors


def load_dashboard(path: str | Path) -> DashboardDocument:
    return DashboardDocument.from_file(path)


def build_semantic_types_schema(layer) -> dict[str, Any]:
    """Semantic fields for generated TS dashboard typing (ref
    dashboard.py:212)."""
    models: dict[str, Any] = {}
    metric_fields: list[str] = []
    dimension_fields: list[str] = []
    field_types: dict[str, str] = {}

    for model_name, model in sorted(layer.graph.models.items()):
        payload: dict[str, Any] = {"metrics": {}, "dimensions": {}}
        for metric in sorted(model.metrics, key=lambda m: m.name):
            field = f"{model_name}.{metric.name}"
            metric_fields.append(field)
            field_types[field] = "number"
            payload["metrics"][metric.name] = {
                "field": field,
                "type": "number",
                "agg": metric.agg,
                "description": metric.description,
            }
        for dim in sorted(model.dimensions, key=lambda d: d.name):
            base = f"{model_name}.{dim.name}"
            fields = [base]
            if dim.type == "time":
                grains = dim.supported_granularities or TIME_GRANULARITIES
                fields.extend(f"{base}__{g}" for g in grains)
            for field in fields:
                dimension_fields.append(field)
                field_types[field] = _ts_scalar(dim.type)
            payload["dimensions"][dim.name] = {
                "field": base,
                "fields": fields,
                "type": dim.type,
                "description": dim.description,
                "label": dim.label,
            }
        models[model_name] = payload

    for metric_name in sorted(layer.graph.metrics):
        if metric_name not in metric_fields:
            metric_fields.append(metric_name)
            field_types[metric_name] = "number"

    metric_fields = sorted(set(metric_fields))
    dimension_fields = sorted(set(dimension_fields))
    return {
        "schema": TS_SCHEMA,
        "models": models,
        "metrics": metric_fields,
        "dimensions": dimension_fields,
        "fields": sorted({*metric_fields, *dimension_fields}),
        "fieldTypes": {f: field_types[f] for f in sorted(field_types)},
    }


def generate_dashboard_typescript(
    layer, *, schema_name: str = "sidemanticSchema"
) -> str:
    """Self-contained TypeScript types for dashboard authoring (ref
    dashboard.py:271)."""
    schema = build_semantic_types_schema(layer)
    value_map = "\n".join(
        f"  {json.dumps(field)}: {_ts_value(ftype)};"
        for field, ftype in sorted(schema["fieldTypes"].items())
    )
    schema_json = json.dumps(schema, indent=2, default=str)
    return f"""/* Generated by `sidemantic-spark dashboard types`. Do not edit by hand. */
export const {schema_name} = {schema_json} as const;

export type SemanticMetric = keyof typeof {schema_name}["fieldTypes"] & string;
export type SemanticFieldValueMap = {{
{value_map}
}};
export type SemanticField = keyof SemanticFieldValueMap & string;
export type SemanticRow = Partial<SemanticFieldValueMap>;
"""


def render_dashboard_html(layer, doc: DashboardDocument) -> str:
    """Execute every chart's semantic query and emit one self-contained
    HTML page of Vega-Lite views (tabs as sections).  The Spark-native
    stand-in for the reference's crossfilter renderer: all data access
    goes through the layer, so routing/caching/security apply."""
    from sidemantic_spark.charts import chart_for_query

    errors = doc.validate(layer)
    if errors:
        raise DashboardSpecError("; ".join(errors))
    sections: list[str] = []
    for tab in doc.tabs:
        blocks: list[str] = []
        for chart in tab.get("charts") or []:
            spec = chart_for_query(
                layer,
                metrics=chart.get("metrics") or [],
                dimensions=chart.get("dimensions") or [],
                filters=chart.get("filters") or [],
                chart_type=str(chart.get("type") or "auto"),
                title=chart.get("title") or chart.get("id"),
            )
            div_id = f"view_{tab['id']}_{chart['id']}".replace("-", "_")
            # escape "</" so a data value containing "</script>" cannot
            # terminate the script block (markup injection via queried
            # warehouse values)
            spec_js = json.dumps(spec).replace("</", "<\\/")
            blocks.append(
                f'<div class="chart" id="{div_id}"></div>'
                f"<script>vegaEmbed('#{div_id}', {spec_js});</script>"
            )
        label = _html.escape(str(tab.get("label") or tab["id"]))
        sections.append(
            f'<section><h2>{label}</h2>{"".join(blocks)}</section>'
        )
    title = _html.escape(doc.title)
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{title}</title>
<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>
<style>body{{font-family:sans-serif;margin:2rem}}.chart{{margin:1rem 0}}</style>
</head><body><h1>{title}</h1>{"".join(sections)}</body></html>"""


def _ts_scalar(dimension_type: str) -> str:
    return {
        "categorical": "string",
        "time": "date",
        "boolean": "boolean",
        "numeric": "number",
    }.get(dimension_type, "unknown")


def _ts_value(field_type: str) -> str:
    return {
        "number": "number",
        "string": "string",
        "boolean": "boolean",
        "date": "string | Date",
    }.get(field_type, "unknown")
