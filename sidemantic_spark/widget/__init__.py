"""Interactive metrics-explorer widget (Spark-native).

Port of the reference's anywidget explorer (``sidemantic/widget/``):
the headless query/serialization engine (:class:`ExplorerEngine`) is
always importable and fully testable without notebook dependencies;
the anywidget UI class loads lazily and raises the same actionable
error as the reference when the optional dependencies are missing
(ref ``widget/__init__.py``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from sidemantic_spark.widget._engine import (
    ExplorerEngine,
    build_auto_model,
    table_to_ipc,
)

__all__ = ["MetricsExplorer", "ExplorerEngine", "build_auto_model", "table_to_ipc"]

if TYPE_CHECKING:
    from sidemantic_spark.widget._widget import MetricsExplorer as MetricsExplorer


def __getattr__(name: str):
    if name != "MetricsExplorer":
        raise AttributeError(name)
    try:
        from sidemantic_spark.widget._widget import MetricsExplorer
    except ModuleNotFoundError as exc:
        raise ModuleNotFoundError(
            "MetricsExplorer requires the optional widget dependencies "
            "(anywidget, traitlets). Install them to use the notebook UI; "
            "the headless ExplorerEngine works without them."
        ) from exc
    return MetricsExplorer
