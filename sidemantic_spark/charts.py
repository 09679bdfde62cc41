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

# categorical palette (reference charts.py COLORS["categorical"])
CATEGORICAL = [
    "#2E5EAA", "#E8702A", "#4C9A2A", "#9B59B6",
    "#1ABC9C", "#E74C3C", "#F39C12", "#34495E",
]


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
    return column.replace("_", " ").title()


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
        spec["encoding"] = {
            "x": x_enc,
            "y": {"field": ys[0], "type": "quantitative",
                  "title": y_label or _format_label(ys[0])},
            "color": {"value": CATEGORICAL[0]},
        }
    else:
        # fold multiple metrics into a colored series
        spec["transform"] = [{"fold": ys, "as": ["series", "value"]}]
        spec["mark"] = {"type": chart_type, "tooltip": True}
        enc: dict = {
            "x": x_enc,
            "y": {"field": "value", "type": "quantitative",
                  "title": y_label or "Value"},
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
    return create_chart(rows, chart_type=chart_type, title=title, **kw)
