"""Import adapters: external semantic-model formats -> our graph.

Re-expression of the reference's adapter surface (``adapters/base.py:9``
defines parse/export/validate over 15+ formats). We implement the
highest-traffic importers — Cube, MetricFlow (dbt semantic layer),
Rill, Superset — translating each into our Model/Metric/Relationship
objects; everything downstream (compile, execute, preaggs, governance)
is format-agnostic.

Each adapter is lossy-but-faithful: constructs without a Spark-side
equivalent (display formatting, dashboards, caching hints) are dropped,
semantic constructs (measures, dimensions, joins, segments, rollups,
semi-additive windows) are mapped 1:1.
"""

from sidemantic_spark.adapters.atscale import AtScaleAdapter
from sidemantic_spark.adapters.bsl import BslAdapter
from sidemantic_spark.adapters.cube import CubeAdapter
from sidemantic_spark.adapters.gooddata import GoodDataAdapter
from sidemantic_spark.adapters.graphene import GrapheneAdapter
from sidemantic_spark.adapters.holistics import HolisticsAdapter
from sidemantic_spark.adapters.hex import HexAdapter
from sidemantic_spark.adapters.lookml import LookMLAdapter
from sidemantic_spark.adapters.malloy import MalloyAdapter
from sidemantic_spark.adapters.metricflow import MetricFlowAdapter
from sidemantic_spark.adapters.omni import OmniAdapter
from sidemantic_spark.adapters.osi import OsiAdapter
from sidemantic_spark.adapters.rill import RillAdapter
from sidemantic_spark.adapters.snowflake import SnowflakeAdapter
from sidemantic_spark.adapters.superset import SupersetAdapter
from sidemantic_spark.adapters.tableau import TableauAdapter
from sidemantic_spark.adapters.thoughtspot import ThoughtSpotAdapter
from sidemantic_spark.adapters.tmdl import TmdlAdapter
from sidemantic_spark.adapters.yardstick import YardstickAdapter

ADAPTERS = {
    "atscale": AtScaleAdapter,
    "bsl": BslAdapter,
    "cube": CubeAdapter,
    "gooddata": GoodDataAdapter,
    "graphene": GrapheneAdapter,
    "holistics": HolisticsAdapter,
    "hex": HexAdapter,
    "lookml": LookMLAdapter,
    "malloy": MalloyAdapter,
    "metricflow": MetricFlowAdapter,
    "omni": OmniAdapter,
    "osi": OsiAdapter,
    "rill": RillAdapter,
    "snowflake": SnowflakeAdapter,
    "superset": SupersetAdapter,
    "tableau": TableauAdapter,
    "thoughtspot": ThoughtSpotAdapter,
    "tmdl": TmdlAdapter,
    "yardstick": YardstickAdapter,
}


def export_graph(graph, format: str) -> str:
    """Serialize the graph in the named format (YAML text)."""
    import yaml as _yaml

    if format in ("native", "sidemantic"):
        from sidemantic_spark.authoring import export_yaml

        return export_yaml(graph)
    if format == "cube":
        from sidemantic_spark.adapters.cube import export_cube

        return _yaml.safe_dump(export_cube(graph), sort_keys=False)
    if format == "metricflow":
        from sidemantic_spark.adapters.metricflow import export_metricflow

        return _yaml.safe_dump(export_metricflow(graph), sort_keys=False)
    if format == "lookml":
        from sidemantic_spark.adapters.lookml import export_lookml

        return export_lookml(graph)
    raise ValueError(
        f"no exporter for format {format!r} (native, cube, metricflow, lookml)"
    )


def import_file(layer, path: str, format: str) -> None:
    """Parse ``path`` in the named format into ``layer``."""
    try:
        adapter_cls = ADAPTERS[format]
    except KeyError:
        raise ValueError(
            f"unknown adapter {format!r} (available: {sorted(ADAPTERS)})"
        ) from None
    adapter_cls().parse_file(layer, path)


__all__ = ["ADAPTERS", "import_file", "AtScaleAdapter", "BslAdapter",
           "CubeAdapter", "GoodDataAdapter", "GrapheneAdapter",
           "HexAdapter", "HolisticsAdapter", "LookMLAdapter",
           "MalloyAdapter", "MetricFlowAdapter", "OmniAdapter",
           "OsiAdapter", "RillAdapter", "SnowflakeAdapter",
           "SupersetAdapter", "TableauAdapter", "ThoughtSpotAdapter",
           "TmdlAdapter", "YardstickAdapter"]
