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
    """Serialize the graph in the named format.

    Text formats (lookml, malloy, tmdl, holistics) return native text;
    dict/doc formats return YAML (multi-doc where the format is
    file-per-object); gooddata returns JSON. Every exporter is the
    lossy-but-faithful inverse of its importer — ``parse(export(g))``
    reconstructs the representable subset of ``g`` (roundtrip-tested in
    tests/test_adapters.py).
    """
    import json as _json

    import yaml as _yaml

    if format in ("native", "sidemantic"):
        from sidemantic_spark.authoring import export_yaml

        return export_yaml(graph)
    if format == "lookml":
        from sidemantic_spark.adapters.lookml import export_lookml

        return export_lookml(graph)
    if format == "malloy":
        from sidemantic_spark.adapters.malloy import export_malloy

        return export_malloy(graph)
    if format == "tmdl":
        from sidemantic_spark.adapters.tmdl import export_tmdl

        return export_tmdl(graph)
    if format == "holistics":
        from sidemantic_spark.adapters.holistics import export_holistics

        return export_holistics(graph)
    if format == "gooddata":
        from sidemantic_spark.adapters.gooddata import export_gooddata

        return _json.dumps(export_gooddata(graph), indent=2)

    single_doc = {
        "cube": ("sidemantic_spark.adapters.cube", "export_cube"),
        "metricflow": ("sidemantic_spark.adapters.metricflow", "export_metricflow"),
        "snowflake": ("sidemantic_spark.adapters.snowflake", "export_snowflake"),
        "bsl": ("sidemantic_spark.adapters.bsl", "export_bsl"),
        "osi": ("sidemantic_spark.adapters.osi", "export_osi"),
    }
    multi_doc = {
        "rill": ("sidemantic_spark.adapters.rill", "export_rill"),
        "superset": ("sidemantic_spark.adapters.superset", "export_superset"),
        "hex": ("sidemantic_spark.adapters.hex", "export_hex"),
        "omni": ("sidemantic_spark.adapters.omni", "export_omni"),
        "atscale": ("sidemantic_spark.adapters.atscale", "export_atscale"),
        "thoughtspot": ("sidemantic_spark.adapters.thoughtspot", "export_thoughtspot"),
    }
    import importlib

    if format in single_doc:
        mod, fn = single_doc[format]
        doc = getattr(importlib.import_module(mod), fn)(graph)
        return _yaml.safe_dump(doc, sort_keys=False)
    if format in multi_doc:
        mod, fn = multi_doc[format]
        docs = getattr(importlib.import_module(mod), fn)(graph)
        return _yaml.safe_dump_all(docs, sort_keys=False)
    raise ValueError(
        f"no exporter for format {format!r} (native, "
        f"{', '.join(sorted(single_doc | multi_doc | {'lookml': 0, 'malloy': 0, 'tmdl': 0, 'holistics': 0, 'gooddata': 0}))})"
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
