"""anywidget front-end for :class:`ExplorerEngine` (optional deps).

Mirrors the reference's traitlet surface (ref widget/_widget.py:131-185):
config/metrics_config/dimensions_config flow Python->JS, UI state
(filters, date_range, selected_metric, comparison_mode, time_grain,
active_dimension) flows both ways, and data lands as Arrow IPC
(base64 or binary transport).  All query work delegates to the
headless engine so this module stays a thin sync shim.
"""

from __future__ import annotations

from typing import Any

import anywidget
import traitlets

from sidemantic_spark.widget._engine import ExplorerEngine

_ESM = """
export function render({ model, el }) {
  // Minimal placeholder front-end: the full chart UI ships separately;
  // this renders status + totals so the widget is usable end-to-end.
  const div = document.createElement("div");
  const update = () => {
    const totals = model.get("metric_totals") || {};
    const status = model.get("status");
    div.innerHTML = "<b>status:</b> " + status + "<pre>" +
      JSON.stringify(totals, null, 2) + "</pre>";
  };
  model.on("change:metric_totals", update);
  model.on("change:status", update);
  update();
  el.appendChild(div);
}
"""


class MetricsExplorer(anywidget.AnyWidget):
    """Interactive metrics explorer (notebook UI over ExplorerEngine)."""

    _esm = _ESM

    config = traitlets.Dict({}).tag(sync=True)
    metrics_config = traitlets.List([]).tag(sync=True)
    dimensions_config = traitlets.List([]).tag(sync=True)

    filters = traitlets.Dict({}).tag(sync=True)
    date_range = traitlets.List([]).tag(sync=True)
    selected_metric = traitlets.Unicode("").tag(sync=True)
    comparison_mode = traitlets.Unicode("wow").tag(sync=True)
    time_grain = traitlets.Unicode("day").tag(sync=True)
    time_grain_options = traitlets.List([]).tag(sync=True)
    active_dimension = traitlets.Unicode("").tag(sync=True)
    transport = traitlets.Unicode("base64").tag(sync=True)

    metric_series_data = traitlets.Unicode("").tag(sync=True)
    dimension_data = traitlets.Dict({}).tag(sync=True)
    metric_totals = traitlets.Dict({}).tag(sync=True)

    status = traitlets.Unicode("loading").tag(sync=True)
    error = traitlets.Unicode("").tag(sync=True)

    def __init__(self, data: Any = None, **kwargs: Any) -> None:
        engine_kwargs = {
            k: kwargs.pop(k)
            for k in (
                "layer",
                "metrics",
                "dimensions",
                "time_dimension",
                "max_dimension_cardinality",
                "top_n",
            )
            if k in kwargs
        }
        super().__init__(**kwargs)
        self._engine = ExplorerEngine(data, **engine_kwargs)
        self.metrics_config = self._engine.metrics_config()
        self.dimensions_config = self._engine.dimensions_config()
        self.time_grain_options = self._engine.time_grain_options()
        self.selected_metric = self._engine.selected_metric
        self.observe(
            self._on_state_change,
            names=[
                "filters",
                "date_range",
                "selected_metric",
                "comparison_mode",
                "time_grain",
            ],
        )
        self._refresh()

    def _on_state_change(self, change: dict) -> None:
        eng = self._engine
        eng.filters = dict(self.filters)
        eng.date_range = list(self.date_range)
        eng.comparison_mode = self.comparison_mode
        eng.time_grain = self.time_grain or "day"
        eng.selected_metric = self.selected_metric
        self._refresh()

    def _refresh(self) -> None:
        self.status = "loading"
        payload = self._engine.refresh_all(transport="base64")
        self.metric_series_data = payload.get("metric_series_data", "")
        self.dimension_data = payload.get("dimension_data", {})
        self.metric_totals = payload.get("metric_totals", {})
        self.error = payload.get("error", "")
        self.status = payload.get("status", "ready")
