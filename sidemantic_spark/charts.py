"""Chart generation for semantic-layer queries.

Re-expression of the reference's chart surface (``charts.py:52``
create_chart with smart type selection, ``mcp_server.py:486`` chart
tool). The reference builds Altair objects and renders PNGs via
vl-convert; neither library ships in this environment, so we emit the
**Vega-Lite v5 spec dict directly** — the same interchange format
Altair compiles to, renderable by any Vega-Lite client (the MCP chart
tool returns it as JSON). PNG rasterization is deliberately out of
scope (``chart_to_png`` raises with instructions).

Auto chart-type selection mirrors ``charts.py:153``: a time dimension
on x -> line (area when a single cumulative-looking metric), a
categorical x -> bar, two quantitative axes -> scatter; multiple
metrics fold into a layered/colored series encoding.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any

# semantic palette (reference charts.py:22-40 COLORS): named roles plus
# the categorical series palette; the reference's chart tests pin the
# dict shape (primary present, >=8 hex categorical entries)
COLORS = {
    "primary": "#2E5EAA",
    "secondary": "#E8702A",
    "success": "#4C9A2A",
    "warning": "#F39C12",
    "danger": "#C0392B",
    "neutral": "#7F8C8D",
    "categorical": [
        "#2E5EAA", "#E8702A", "#4C9A2A", "#9B59B6",
        "#1ABC9C", "#E74C3C", "#F39C12", "#34495E",
    ],
}
CATEGORICAL = COLORS["categorical"]


class ChartError(Exception):
    pass


def _encoding_type(values: list[Any]) -> str:
    """nominal | quantitative | temporal from sampled values."""
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return "nominal"
        if isinstance(v, (datetime.date, datetime.datetime)):
            return "temporal"
        if isinstance(v, (int, float, decimal.Decimal)):
            return "quantitative"
        return "nominal"
    return "nominal"


def _format_label(column: str) -> str:
    """Readable axis/tooltip label (reference charts.py _format_label):
    ``order_count`` -> ``Order Count``; grain suffixes parenthesize
    (``created_at__month`` -> ``Created At (Month)``); model prefixes
    drop (``orders.revenue`` -> ``Revenue``)."""
    if "__" in column:
        base, granularity = column.rsplit("__", 1)
        return f"{_format_label(base)} ({granularity.title()})"
    if "." in column:
        column = column.rsplit(".", 1)[1]
    return " ".join(w.capitalize() for w in column.replace("_", " ").split())


def _auto_detect(data: list[dict[str, Any]]) -> tuple[str, list[str]]:
    """(x, ys): first temporal column, else first nominal, else first
    column; ys = the quantitative columns (reference charts.py:120)."""
    if not data:
        raise ChartError("no rows to chart")
    cols = list(data[0].keys())
    types = {c: _encoding_type([r.get(c) for r in data[:50]]) for c in cols}
    x = next((c for c in cols if types[c] == "temporal"), None)
    if x is None:
        x = next((c for c in cols if types[c] == "nominal"), cols[0])
    ys = [c for c in cols if c != x and types[c] == "quantitative"]
    if not ys:
        raise ChartError("no quantitative column to plot")
    return x, ys


def _select_type(x_type: str, n_metrics: int) -> str:
    if x_type == "temporal":
        return "line"
    if x_type == "quantitative" and n_metrics == 1:
        return "point"
    return "bar"


def _jsonable(v: Any) -> Any:
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


# value_format_name -> d3 axis/tooltip format (reference viz.py applies
# ",.2f" to quantitative encodings; named formats extend that to the
# metric's declared display metadata)
VALUE_FORMATS = {
    "usd": "$,.2f",
    "eur": ",.2f",
    "currency": "$,.2f",
    "percent": ".1%",
    "percent_0": ".0%",
    "percent_2": ".2%",
    "decimal": ",.2f",
    "decimal_0": ",.0f",
    "count": ",",
    "id": "d",
}


def axis_format_for(metric) -> str | None:
    """d3 format string for a Metric's display metadata, if any."""
    if getattr(metric, "value_format_name", None):
        return VALUE_FORMATS.get(metric.value_format_name)
    fmt = getattr(metric, "format", None)
    if fmt:
        # spreadsheet-style masks: map the common shapes to d3
        if "%" in fmt:
            return ".1%"
        if "$" in fmt:
            return "$,.2f"
        if "#,##0" in fmt or "0.00" in fmt:
            return ",.2f"
    return None


class CompiledField:
    """One semantic field compiled to one renderer/runtime column
    (ref viz.py:72 ``CompiledField``)."""

    def __init__(self, *, id, semantic_ref, alias, kind, source_model,
                 roles=(), metric_agg=None):
        self.id = id
        self.semantic_ref = semantic_ref
        self.alias = alias
        self.kind = kind
        self.source_model = source_model
        self.roles = tuple(roles)
        self.metric_agg = metric_agg

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "id": self.id,
            "semantic_ref": self.semantic_ref,
            "alias": self.alias,
            "label": _format_label(self.alias),
            "kind": self.kind,
            "source_model": self.source_model,
            "roles": list(self.roles),
        }
        if self.kind == "metric":
            out["metric_agg"] = self.metric_agg
        return out


def _compiled_field_ref(field: CompiledField) -> dict[str, Any]:
    return {
        "id": field.id,
        "semantic_ref": field.semantic_ref,
        "alias": field.alias,
        "label": _format_label(field.alias),
        "kind": field.kind,
        "source_model": field.source_model,
    }


def _resolve_compiled_field(value, fields, *, expected_kind=None):
    if isinstance(value, dict):
        candidate = value.get("id") or value.get("semantic_ref") or value.get("alias")
    else:
        candidate = value
    text = str(candidate or "")
    for f in fields:
        if text in {f.id, f.semantic_ref, f.alias}:
            if expected_kind is not None and f.kind != expected_kind:
                raise ChartError(
                    f"Chart interaction field {text!r} must be a "
                    f"{expected_kind}; {f.id!r} is a {f.kind}"
                )
            return f
    expected = ", ".join(sorted({f.id for f in fields} | {f.alias for f in fields}))
    raise ChartError(
        f"Unknown chart interaction field {text!r}. Expected one of: {expected}"
    )


class CompiledChartPlan:
    """Canonical field lineage + interaction plan for a chart runtime
    (ref viz.py:99 ``CompiledChartPlan``): every semantic field with
    its output alias, roles (x / y / series / breakdown), source model
    and metric agg, plus a sha256 fingerprint over the canonical
    payload so clients can cache compiled runtimes per plan."""

    def __init__(self, fields, encodings, interactions, fingerprint):
        self.fields = tuple(fields)
        self.encodings = encodings
        self.interactions = interactions
        self.fingerprint = fingerprint

    @classmethod
    def build(cls, chart: "ChartBuilder") -> "CompiledChartPlan":
        import hashlib
        import json as _json

        dim_outs, met_outs = chart._out_names()
        aliases = [*dim_outs, *met_outs]
        dupes = {a for a in aliases if aliases.count(a) > 1}
        if dupes:
            raise ChartError(
                "Compiled chart plan received duplicate output "
                f"alias(es): {', '.join(sorted(dupes))}. Chart SQL "
                "aliases must be unique before plan compilation."
            )
        x_alias = dim_outs[0] if dim_outs else None
        series_alias = dim_outs[1] if len(dim_outs) > 1 else None

        def _model_of(ref: str) -> str | None:
            base = ref.split(" ", 1)[0]
            return base.split(".", 1)[0] if "." in base else None

        def _agg_of(ref: str) -> str | None:
            base = ref.split(" ", 1)[0]
            if "." not in base:
                return None
            model_name, metric_name = base.split(".", 1)
            try:
                m = chart.layer.graph.get_model(model_name).metric(metric_name)
                return getattr(m, "agg", None)
            except Exception:
                return None

        fields: list[CompiledField] = []
        for ref, alias in zip(chart.dimensions, dim_outs):
            roles = ["dimension"]
            if alias == x_alias:
                roles.append("x")
            if alias == series_alias:
                roles.append("series")
            if alias != x_alias:
                roles.append("breakdown")
            fields.append(CompiledField(
                id=ref, semantic_ref=ref, alias=alias, kind="dimension",
                source_model=_model_of(ref), roles=roles,
            ))
        for ref, alias in zip(chart.metrics, met_outs):
            roles = ["metric", "y"]
            fields.append(CompiledField(
                id=ref, semantic_ref=ref, alias=alias, kind="metric",
                source_model=_model_of(ref), roles=roles,
                metric_agg=_agg_of(ref),
            ))
        by_alias = {f.alias: f for f in fields}
        encodings = {
            "x": _compiled_field_ref(by_alias[x_alias]) if x_alias else None,
            "y": [_compiled_field_ref(by_alias[a]) for a in met_outs],
            "series": (
                _compiled_field_ref(by_alias[series_alias])
                if series_alias else None
            ),
        }
        interactions: dict[str, Any] = {}
        if "brush" in chart.interactions:
            brush = dict(chart.interactions["brush"])
            raw = list(brush.get("fields") or [])
            if raw:
                planned = [_resolve_compiled_field(v, fields) for v in raw]
            elif x_alias:
                planned = [by_alias[x_alias]]
            else:
                planned = []
            channel = str(brush.get("channel") or "x")
            # an empty field list is NOT vacuously supported — a chart
            # with no dimensions has nothing to brush over (r11 review)
            supported = bool(planned) and channel == "x" and all(
                f.kind == "dimension" for f in planned
            )
            interactions["brush"] = {
                "channel": channel,
                "fields": [_compiled_field_ref(f) for f in planned],
                "filter_type": "range",
                "request_type": "xRange",
                "supported": supported,
                "unsupported_reason": None if supported else (
                    "live crossfilter brush currently supports "
                    "x-channel dimension ranges"
                ),
                "ignored_by": ["trend"],
            }
        if "select" in chart.interactions:
            sel = dict(chart.interactions["select"])
            raw = list(sel.get("fields") or [])
            if raw:
                planned = [
                    _resolve_compiled_field(v, fields, expected_kind="dimension")
                    for v in raw
                ]
            else:
                planned = [by_alias[a] for a in dim_outs[1:]]
            interactions["select"] = {
                "fields": [_compiled_field_ref(f) for f in planned],
                "filter_type": "category",
                "request_type": "category",
                "supported": True,
                "ignored_by": ["matching breakdown"],
            }
        payload = {
            "protocol": "sidemantic-chart-plan-v1",
            "fields": [f.to_dict() for f in fields],
            "encodings": encodings,
            "interactions": interactions,
            "query": {
                "metrics": chart.metrics,
                "dimensions": chart.dimensions,
                "filters": chart.filters,
                "segments": chart.segments,
                "order_by": chart.order_by,
                "limit": chart.limit,
            },
        }
        fp = hashlib.sha256(
            _json.dumps(payload, sort_keys=True, default=str).encode()
        ).hexdigest()
        return cls(fields, encodings, interactions, fp)

    def field_plan(self) -> dict[str, Any]:
        return {
            "protocol": "sidemantic-field-plan-v1",
            "fingerprint": self.fingerprint,
            "fields": [f.to_dict() for f in self.fields],
            "aliases": {f.alias: f.id for f in self.fields},
            "encodings": self.encodings,
        }

    def interaction_plan(self) -> dict[str, Any]:
        return {
            "protocol": "sidemantic-interaction-plan-v1",
            "fingerprint": self.fingerprint,
            **self.interactions,
        }

    def legacy_interactions(self) -> dict[str, Any]:
        payload: dict[str, Any] = {}
        brush = self.interactions.get("brush")
        if brush:
            payload["brush"] = {
                "fields": [f["alias"] for f in brush.get("fields", [])],
                "channel": brush.get("channel") or "x",
            }
        select = self.interactions.get("select")
        if select:
            payload["select"] = {
                "fields": [f["alias"] for f in select.get("fields", [])]
            }
        return payload


def create_chart(
    data: list[dict[str, Any]],
    x: str | None = None,
    y: str | list[str] | None = None,
    chart_type: str = "auto",
    title: str | None = None,
    x_label: str | None = None,
    y_label: str | None = None,
    width: int = 600,
    height: int = 360,
    y_format: str | None = None,
) -> dict:
    """Rows -> Vega-Lite v5 spec. ``chart_type`` in {auto, bar, line,
    area, scatter, point}."""
    if chart_type not in ("auto", "bar", "line", "area", "scatter", "point"):
        raise ChartError(f"unknown chart_type {chart_type!r}")
    if x is None or y is None:
        # only consult auto-detection for the axes the caller omitted —
        # explicit x/y must work even when detection finds nothing
        auto_x, auto_ys = _auto_detect(data)
    else:
        auto_x, auto_ys = None, None
    x = x or auto_x
    ys = [y] if isinstance(y, str) else (y or auto_ys)
    if not ys:
        raise ChartError("no y column")
    sample = data[:50]
    x_type = _encoding_type([r.get(x) for r in sample])
    if chart_type == "auto":
        chart_type = _select_type(x_type, len(ys))
    if chart_type == "scatter":
        chart_type = "point"

    values = [{k: _jsonable(v) for k, v in row.items()} for row in data]
    spec: dict = {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "width": width,
        "height": height,
        "data": {"values": values},
        "config": {
            "range": {"category": CATEGORICAL},
            "axis": {"labelFontSize": 11, "titleFontSize": 12},
            "view": {"stroke": None},
        },
    }
    if title:
        spec["title"] = title

    x_enc = {"field": x, "type": x_type, "title": x_label or _format_label(x)}
    if len(ys) == 1:
        spec["mark"] = {"type": chart_type, "tooltip": True}
        if chart_type in ("line", "area"):
            spec["mark"]["point"] = True
        y_enc = {"field": ys[0], "type": "quantitative",
                 "title": y_label or _format_label(ys[0])}
        if y_format:
            y_enc["axis"] = {"format": y_format}
        spec["encoding"] = {
            "x": x_enc,
            "y": y_enc,
            "color": {"value": CATEGORICAL[0]},
        }
    else:
        # fold multiple metrics into a colored series
        spec["transform"] = [{"fold": ys, "as": ["series", "value"]}]
        spec["mark"] = {"type": chart_type, "tooltip": True}
        y_enc = {"field": "value", "type": "quantitative",
                 "title": y_label or "Value"}
        if y_format:
            y_enc["axis"] = {"format": y_format}
        enc: dict = {
            "x": x_enc,
            "y": y_enc,
            "color": {"field": "series", "type": "nominal",
                      "title": None},
        }
        if chart_type == "bar":
            enc["xOffset"] = {"field": "series"}
        spec["encoding"] = enc
    return spec


def chart_to_png(spec: dict) -> bytes:
    """PNG rasterization needs a Vega-Lite renderer (vl-convert /
    altair_saver), which this environment does not ship. The spec is
    fully renderable client-side; raise with instructions rather than
    fake bytes."""
    raise NotImplementedError(
        "PNG rendering requires vl-convert-python; render the returned "
        "Vega-Lite spec client-side or install vl-convert"
    )


def chart_for_query(layer, metrics=None, dimensions=None, filters=None,
                    chart_type: str = "auto", limit: int = 5000,
                    user: dict | None = None, **kw) -> dict:
    """Run a semantic query and chart the result. Row cap keeps the
    spec (which inlines data) bounded — charts are for aggregates, not
    corpus dumps. ``user`` feeds access gates and row policies."""
    df = layer.query(metrics=metrics or [], dimensions=dimensions or [],
                     filters=filters or [], limit=limit, user=user)
    rows = [r.asDict() for r in df.collect()]
    title = kw.pop("title", None) or " / ".join(
        m.split(".")[-1] for m in (metrics or [])
    ).replace("_", " ").title() or None
    # metric display metadata -> axis format (first metric wins, the
    # single-axis chart shape)
    if "y_format" not in kw:
        for mref in metrics or []:
            model_name, _, mname = mref.rpartition(".")
            try:
                model = layer.graph.get_model(model_name)
                mt = model.metric(mname) if model else None
            except Exception:
                mt = None
            if mt is None and mref in layer.graph.metrics:
                mt = layer.graph.metrics[mref]
            fmt = axis_format_for(mt) if mt is not None else None
            if fmt:
                kw["y_format"] = fmt
                break
    return create_chart(rows, chart_type=chart_type, title=title, **kw)


# ----------------------------------------------------------------------
# fluent builder (reference viz.py:1903 ChartBuilder)
# ----------------------------------------------------------------------

class ChartBuilder:
    """Chainable, renderer-neutral chart builder (reference
    ``viz.py:1903``). Authors charts over semantic fields; the query
    compiles and executes only when ``data()`` / ``sql`` /
    ``to_vegalite()`` / ``to_html()`` is requested.

    >>> layer.chart("orders.revenue", by="orders.status").bar().to_vegalite()
    """

    def __init__(
        self,
        layer,
        metrics,
        *,
        by=None,
        mark: str = "auto",
        filters: list[str] | None = None,
        segments: list[str] | None = None,
        order_by: list[str] | None = None,
        limit: int | None = None,
        title: str | None = None,
        user: dict | None = None,
    ) -> None:
        self.layer = layer
        self.metrics = [metrics] if isinstance(metrics, str) else list(metrics)
        self.dimensions = ([by] if isinstance(by, str) else list(by or []))
        if not self.metrics:
            raise ChartError("at least one metric is required")
        self.mark = mark
        self.filters = list(filters or [])
        self.segments = list(segments or [])
        self.order_by = list(order_by) if order_by is not None else None
        self.limit = limit
        self.title = title
        self.user = user
        self.interactions: dict[str, Any] = {}
        self._rows: list[dict[str, Any]] | None = None
        self._sql: str | None = None

    # -- chainable marks ------------------------------------------------
    def bar(self) -> "ChartBuilder":
        self.mark = "bar"
        return self

    def line(self) -> "ChartBuilder":
        self.mark = "line"
        return self

    def area(self) -> "ChartBuilder":
        self.mark = "area"
        return self

    def scatter(self) -> "ChartBuilder":
        self.mark = "scatter"
        return self

    def point(self) -> "ChartBuilder":
        self.mark = "point"
        return self

    # -- interactions ---------------------------------------------------
    def brush(self, fields=None, *, name: str = "brush",
              channel: str = "x") -> "ChartBuilder":
        """Interval brush selection over ``channel`` (x | y | xy)."""
        self.interactions["brush"] = {
            "name": name,
            "fields": [fields] if isinstance(fields, str) else list(fields or []),
            "channel": channel if channel in ("x", "y", "xy") else "x",
        }
        return self

    def interactive(self, enabled: bool = True) -> "ChartBuilder":
        if enabled:
            self.interactions.setdefault(
                "brush", {"name": "brush", "fields": [], "channel": "x"})
        else:
            self.interactions.pop("brush", None)
        return self

    def select(self, fields=None) -> "ChartBuilder":
        """Add grouping dimensions (chainable spelling of ``by``)."""
        add = [fields] if isinstance(fields, str) else list(fields or [])
        self.dimensions += [f for f in add if f not in self.dimensions]
        self._rows = None
        return self

    def categories(self, fields=None) -> "ChartBuilder":
        """Register a category-select interaction (ref viz.py select
        interaction): clicking a category filters coordinated views.
        Defaults to the breakdown dimensions (every dim after the x
        axis)."""
        self.interactions["select"] = {
            "fields": [fields] if isinstance(fields, str) else list(fields or []),
        }
        return self

    def compiled_plan(self) -> CompiledChartPlan:
        """Canonical field/interaction plan + fingerprint for chart
        runtimes (ref viz.py:99 CompiledChartPlan.build)."""
        return CompiledChartPlan.build(self)

    def where(self, filter_expr: str) -> "ChartBuilder":
        self.filters.append(filter_expr)
        self._rows = None
        return self

    def crossfilter(self, **kw):
        """Spin up a coordinated-views crossfilter session over this
        chart's fields (reference viz.py:1993). Segments resolve to
        their filter SQL so the session sees the same rows as the
        chart; a user context cannot be threaded through a session and
        raises rather than silently widening visibility."""
        if self.user is not None:
            raise ChartError(
                "crossfilter sessions do not carry a user context; "
                "build the session without user= or pre-filter the fields"
            )
        from sidemantic_spark.crossfilter import CrossfilterSession

        filters = list(self.filters)
        for seg_ref in self.segments:
            if "." not in seg_ref:
                raise ChartError(f"segment ref must be model.segment: {seg_ref!r}")
            model_name, seg_name = seg_ref.split(".", 1)
            seg = self.layer.graph.get_model(model_name).segment(seg_name)
            if seg is None:
                raise ChartError(f"unknown segment {seg_ref!r}")
            filters.append(seg.sql.replace("{model}", model_name))
        return CrossfilterSession(
            self.layer,
            self.metrics,
            self.dimensions,
            base_filters=filters,
            title=self.title,
            **kw,
        )

    # -- execution ------------------------------------------------------
    def data(self) -> list[dict[str, Any]]:
        if self._rows is None:
            kwargs: dict = dict(
                metrics=self.metrics, dimensions=self.dimensions,
                filters=self.filters, segments=self.segments,
            )
            if self.order_by is not None:
                kwargs["order_by"] = self.order_by
            if self.limit is not None:
                kwargs["limit"] = self.limit
            if self.user is not None:
                kwargs["user"] = self.user
            self._sql = self.layer.compile(**kwargs)
            df = self.layer.query(**kwargs)
            self._rows = [r.asDict() for r in df.collect()]
        return self._rows

    @property
    def sql(self) -> str:
        # compile only — asking a builder for its SQL must not run the query
        if self._sql is None:
            kwargs: dict = dict(
                metrics=self.metrics, dimensions=self.dimensions,
                filters=self.filters, segments=self.segments,
            )
            if self.order_by is not None:
                kwargs["order_by"] = self.order_by
            if self.limit is not None:
                kwargs["limit"] = self.limit
            if self.user is not None:
                kwargs["user"] = self.user
            self._sql = self.layer.compile(**kwargs)
        return self._sql

    def to_vegalite(self) -> dict[str, Any]:
        rows = self.data()
        x, ys = self._xy(rows)
        spec = create_chart(
            rows,
            x=x,
            y=ys,
            chart_type=self.mark if self.mark != "scatter" else "point",
            title=self.title,
        )
        # a SECOND dimension becomes the color series (ref viz.py
        # to_vegalite series_col); with multiple metrics the fold keeps
        # its own channel as strokeDash so both groupings stay legible
        series = self._series_column(rows)
        if series:
            if len(ys) > 1 and "transform" in spec:
                spec["encoding"]["strokeDash"] = {
                    "field": "series", "type": "nominal",
                    "title": "Metric",
                }
            spec["encoding"]["color"] = {
                "field": series, "type": "nominal",
                "title": _format_label(series),
            }
        brush = self.interactions.get("brush")
        if brush:
            encodings = {"x": ["x"], "y": ["y"], "xy": ["x", "y"]}[brush["channel"]]
            spec["params"] = [{
                "name": brush["name"],
                "select": {"type": "interval", "encodings": encodings},
            }]
            # dim everything outside the brushed interval (ref
            # viz.py to_vegalite selection opacity condition)
            spec["encoding"]["opacity"] = {
                "condition": {"param": brush["name"], "value": 1},
                "value": 0.25,
            }
        spec["usermeta"] = {"sidemantic_spark": {
            "metrics": self.metrics,
            "dimensions": self.dimensions,
            "filters": self.filters,
        }}
        return spec

    def _series_column(self, rows: list[dict[str, Any]]) -> str | None:
        """Output name of the SECOND grouping dimension, when present
        in the executed rows (ref viz.py ``_series_column``)."""
        dim_outs, _ = self._out_names()
        if len(dim_outs) < 2:
            return None
        out = dim_outs[1]
        if rows and out not in rows[0]:
            base = out.split("__", 1)[0]
            out = next((c for c in rows[0] if c.startswith(base)), out)
        return out

    # -- renderer-neutral outputs (reference viz.py to_plotly /
    # to_observable_plot / to_d3 / to_renderer family) ------------------
    def _out_names(self) -> tuple[list[str], list[str]]:
        """(dimension outs, metric outs): ask the GENERATOR's resolver
        for the real output names (zero drift from compile); fall back
        to a local replication of its naming rules only when resolution
        itself fails (the chart query would fail too — the names then
        serve the error path)."""
        try:
            from sidemantic_spark.sql.generator import QuerySpec

            r = self.layer.generator._resolve(QuerySpec(
                metrics=list(self.metrics),
                dimensions=list(self.dimensions),
            ))
            return [rd.out for rd in r.dims], [rm.out for rm in r.metrics]
        except Exception:
            pass
        import re as _re

        used: set[str] = set()

        def split_alias(ref: str) -> tuple[str, str | None]:
            parts = _re.split(r"\s+AS\s+", ref.strip(), flags=_re.I)
            if len(parts) == 2:
                return parts[0].strip(), parts[1].strip()
            return ref.strip(), None

        dim_outs: list[str] = []
        met_outs: list[str] = []
        for pool, refs in ((dim_outs, self.dimensions), (met_outs, self.metrics)):
            for ref in refs:
                base, alias = split_alias(ref)
                model, _, tail = base.rpartition(".")
                out = alias or tail
                if out in used and model:
                    out = f"{model}_{out}"
                used.add(out)
                pool.append(out)
        return dim_outs, met_outs

    def _xy(self, rows: list[dict[str, Any]]) -> tuple[str | None, list[str]]:
        """(x column, y columns) resolved against the executed rows via
        the generator's output names; EVERY metric must resolve — a
        structured metric (conversion/retention) resolves to its derived
        column family, and an unresolvable metric raises instead of
        silently dropping its traces."""
        dim_outs, met_outs = self._out_names()
        if not rows:
            return (dim_outs[0] if dim_outs else None), met_outs
        cols = rows[0]
        ys: list[str] = []
        for o in met_outs:
            if o in cols:
                ys.append(o)
                continue
            family = [c for c in cols if c.startswith(f"{o}_")]
            if not family:
                raise ChartError(
                    f"metric output {o!r} not found in result columns "
                    f"{list(cols)}"
                )
            ys.extend(family)
        x = None
        if dim_outs:
            x = dim_outs[0]
            if x not in cols:
                base = x.split("__", 1)[0]
                x = next((c for c in cols if c.startswith(base)), x)
        return x, ys

    def _resolved_mark(self) -> str:
        if self.mark != "auto":
            return "point" if self.mark == "scatter" else self.mark
        rows = self.data()
        x, _ys = self._xy(rows)
        if x is None:
            return "bar"
        xt = _encoding_type([r.get(x) for r in rows[:50]])
        return "line" if xt == "temporal" else "bar"

    def _metadata(self) -> dict[str, Any]:
        return {
            "metrics": self.metrics,
            "dimensions": self.dimensions,
            "filters": self.filters,
            "sql": self.sql,
        }

    def to_plotly(self) -> dict[str, Any]:
        """Plotly figure dict (traces + layout + config): one trace per
        metric, mark mapped onto plotly's type/mode split."""
        rows = self.data()
        mark = self._resolved_mark()
        x, ys = self._xy(rows)
        ttype, mode = {
            "bar": ("bar", None),
            "line": ("scatter", "lines"),
            "area": ("scatter", "lines"),
            "point": ("scatter", "markers"),
        }.get(mark, ("scatter", "markers"))
        # one trace per (metric x series value): a second dimension
        # splits the rows into named series (ref viz.py to_plotly
        # _group_rows/_trace_name), with selected/unselected marker
        # states for brush-style interactions
        series = self._series_column(rows)
        groups: list[tuple[Any, list[dict[str, Any]]]]
        if series:
            by_val: dict[Any, list[dict[str, Any]]] = {}
            for r in rows:
                by_val.setdefault(r.get(series), []).append(r)
            groups = list(by_val.items())
        else:
            groups = [(None, rows)]
        traces: list[dict[str, Any]] = []
        for i, y in enumerate(ys):
            for si, (sval, srows) in enumerate(groups):
                color = CATEGORICAL[(si if series else i) % len(CATEGORICAL)]
                if sval is None:
                    name = _format_label(y)
                elif len(ys) > 1:
                    name = f"{sval} - {_format_label(y)}"
                else:
                    name = str(sval)
                trace: dict[str, Any] = {
                    "type": ttype,
                    "name": name,
                    "x": [_jsonable(r.get(x)) for r in srows]
                    if x else list(range(len(srows))),
                    "y": [_jsonable(r.get(y)) for r in srows],
                    "marker": {"color": color},
                    "line": {"color": color},
                    "selected": {"marker": {"opacity": 1}},
                    "unselected": {"marker": {"opacity": 0.22}},
                }
                if mode:
                    trace["mode"] = mode
                if mark == "area":
                    trace["fill"] = "tozeroy"
                traces.append(trace)
        layout: dict[str, Any] = {
            "title": {"text": self.title or self._default_title()},
            "xaxis": {"title": {"text": _format_label(x) if x else ""}},
            "yaxis": {
                "title": {"text": "Value" if len(ys) > 1 else _format_label(ys[0])}
            },
            "template": "plotly_white",
        }
        if "brush" in self.interactions:
            layout["dragmode"] = "select"
        return {
            "data": traces,
            "layout": layout,
            "config": {"responsive": True, "displayModeBar": True},
            "sidemantic_spark": self._metadata(),
        }

    def _default_title(self) -> str:
        """'m1 + m2 by dim' (ref viz.py ``_default_title``)."""
        metric_label = " + ".join(_format_label(m) for m in self.metrics)
        if self.dimensions:
            return f"{metric_label} by {_format_label(self.dimensions[0])}"
        return metric_label

    def to_observable_plot(self) -> dict[str, Any]:
        """Observable Plot spec: one mark per metric over shared rows;
        a second dimension becomes the z/stroke/fill series channel
        (ref viz.py ``_observable_options``)."""
        rows = self.data()
        mark = self._resolved_mark()
        x, ys = self._xy(rows)
        series = self._series_column(rows)
        obs_mark = {"bar": "barY", "line": "lineY", "area": "areaY",
                    "point": "dot"}.get(mark, "dot")

        def opts(y: str, i: int) -> dict[str, Any]:
            o: dict[str, Any] = {"x": x, "y": y, "tip": True}
            if series:
                o["z"] = series
                o["stroke"] = series
                if mark in ("bar", "area", "point", "scatter"):
                    o["fill"] = series
            else:
                color = CATEGORICAL[i % len(CATEGORICAL)]
                o["stroke"] = color
                if mark in ("bar", "area", "point", "scatter"):
                    o["fill"] = color
            return o

        return {
            "renderer": "observable-plot",
            "data": [{k: _jsonable(v) for k, v in r.items()} for r in rows],
            "marks": [
                {"type": obs_mark, "options": opts(y, i)}
                for i, y in enumerate(ys)
            ],
            "options": {
                "title": self.title or self._default_title(),
                "grid": True,
                "x": {"label": _format_label(x) if x else None},
                "y": {"label": "Value" if len(ys) > 1 else _format_label(ys[0])},
                "color": {"legend": bool(series)},
            },
            "sidemantic_spark": self._metadata(),
        }

    def to_d3(self) -> dict[str, Any]:
        """Minimal d3 contract: rows + mark + field mapping."""
        rows = self.data()
        x, ys = self._xy(rows)
        return {
            "renderer": "d3",
            "data": [{k: _jsonable(v) for k, v in r.items()} for r in rows],
            "mark": self._resolved_mark(),
            "fields": {"x": x, "y": ys, "series": self._series_column(rows)},
            "title": self.title or self._default_title(),
            "sidemantic_spark": self._metadata(),
        }

    def to_renderer(self, renderer: str) -> dict[str, Any]:
        """Dispatch by renderer name (reference viz.py to_renderer):
        vega-lite | plotly | observable-plot | d3; aliases accepted."""
        key = renderer.strip().lower().replace("_", "-")
        aliases = {
            "vegalite": "vega-lite", "vega": "vega-lite", "altair": "vega-lite",
            "observable": "observable-plot", "plot": "observable-plot",
        }
        key = aliases.get(key, key)
        if key == "vega-lite":
            return self.to_vegalite()
        if key == "plotly":
            return self.to_plotly()
        if key == "observable-plot":
            return self.to_observable_plot()
        if key == "d3":
            return self.to_d3()
        raise ChartError(
            f"unknown renderer {renderer!r} "
            "(vega-lite | plotly | observable-plot | d3)"
        )

    def to_html(self) -> str:
        """Standalone HTML page embedding the chart via vega-embed."""
        import json as _json

        spec = self.to_vegalite()
        title = self.title or "Chart"
        return (
            "<!DOCTYPE html>\n<html><head><meta charset='utf-8'>"
            f"<title>{title}</title>\n"
            "<script src=\"https://cdn.jsdelivr.net/npm/vega@5\"></script>\n"
            "<script src=\"https://cdn.jsdelivr.net/npm/vega-lite@5\"></script>\n"
            "<script src=\"https://cdn.jsdelivr.net/npm/vega-embed@6\"></script>\n"
            "</head><body><div id='vis'></div>\n<script>\n"
            f"vegaEmbed('#vis', {_json.dumps(spec)});\n"
            "</script></body></html>\n"
        )
