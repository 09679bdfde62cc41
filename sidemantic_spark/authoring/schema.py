"""JSON Schema generation for the YAML authoring surface.

Re-expression of the reference's ``schema.py`` (``generate_yaml_schema``
/ ``export_schema``): a draft-07 JSON Schema the YAML Language Server
(or any editor) can use for completion and validation of model files.

The reference derives its schema from Pydantic models; this engine's
authoring surface is the dataclasses in ``core/model.py`` plus the
key allowlists in ``authoring/yaml_io.py`` (the loader's
``_check_keys`` contract). The generator here derives each block's
PROPERTY SET from those same allowlists — so the schema can never
drift from what ``load_yaml`` actually accepts — and enriches types
from the dataclass annotations where a same-named field exists.

Usage (mirrors ref ``schema.py:109``):
    python -m sidemantic_spark.authoring.schema  # writes the JSON file
    # yaml-language-server: $schema=./sidemantic-spark-schema.json
"""

from __future__ import annotations

import dataclasses
import json
import typing
from pathlib import Path

from sidemantic_spark.authoring import yaml_io
from sidemantic_spark.core.model import (
    Dimension,
    Metric,
    Model,
    Parameter,
    Relationship,
    Segment,
)

# enumerations the loader/generator actually accept (kept small and
# checked by tests against the engine's constants)
_GRAIN_ENUM = sorted(yaml_io._GRAINS)
_DIM_TYPES = ["categorical", "time", "numeric", "number", "boolean"]
_REL_TYPES = ["many_to_one", "one_to_many", "one_to_one", "many_to_many", "cross"]
_METRIC_TYPES = [
    "ratio", "derived", "cumulative", "time_comparison", "conversion",
    "retention", "cohort",
]
_COMPARISON_TYPES = ["yoy", "qoq", "mom", "wow", "dod", "prior_period"]
_CALCULATIONS = ["difference", "percent_change", "ratio"]
_PARAM_TYPES = ["string", "number", "date", "unquoted", "yesno"]


def _json_type(py_type) -> dict:
    """Best-effort annotation -> JSON-schema fragment."""
    origin = typing.get_origin(py_type)
    if origin is typing.Union or str(origin) == "types.UnionType":
        args = [a for a in typing.get_args(py_type) if a is not type(None)]
        inner = _json_type(args[0]) if args else {}
        return {"anyOf": [inner, {"type": "null"}]}
    if py_type is str:
        return {"type": "string"}
    if py_type is bool:
        return {"type": "boolean"}
    if py_type is int:
        return {"type": "integer"}
    if py_type is float:
        return {"type": "number"}
    if origin in (list, tuple) or py_type in (list, tuple):
        args = typing.get_args(py_type)
        item = _json_type(args[0]) if args else {}
        return {"type": "array", "items": item}
    if origin is dict or py_type is dict:
        return {"type": "object"}
    return {}


def _block_schema(
    title: str,
    allowed_keys: set[str],
    dataclass_type=None,
    overrides: dict | None = None,
    required: list[str] | None = None,
) -> dict:
    """One block's schema: properties = the loader's key allowlist,
    types from the dataclass annotation of the same-named field."""
    hints: dict = {}
    if dataclass_type is not None:
        try:
            hints = typing.get_type_hints(dataclass_type)
        except Exception:
            hints = {
                f.name: f.type for f in dataclasses.fields(dataclass_type)
            }
    props: dict = {}
    for key in sorted(allowed_keys):
        frag: dict = {}
        if key in hints:
            try:
                frag = dict(_json_type(hints[key]))
            except Exception:
                frag = {}
        frag.setdefault("title", key.replace("_", " ").title())
        props[key] = frag
    for key, frag in (overrides or {}).items():
        if key in props:
            props[key].update(frag)
    out = {
        "title": title,
        "type": "object",
        "properties": props,
        "additionalProperties": False,
    }
    if required:
        out["required"] = required
    return out


def generate_yaml_schema() -> dict:
    """Draft-07 JSON Schema for this engine's YAML format (ref
    ``schema.py:58`` generate_yaml_schema). Property sets come from
    ``yaml_io``'s loader allowlists, so the schema and the loader
    cannot disagree."""
    grain = {"enum": _GRAIN_ENUM}
    dimension = _block_schema(
        "Dimension", yaml_io._DIM_KEYS, Dimension,
        overrides={
            "type": {"enum": _DIM_TYPES},
            "granularity": grain,
            "supported_granularities": {
                "type": "array", "items": {"enum": _GRAIN_ENUM},
            },
        },
        required=["name"],
    )
    metric = _block_schema(
        "Metric", yaml_io._METRIC_KEYS, Metric,
        overrides={
            "agg": {"anyOf": [
                {"enum": sorted(
                    getattr(yaml_io, "_SIMPLE_AGGS", None)
                    or _default_aggs()
                )},
                {"type": "null"},
            ]},
            "type": {"anyOf": [{"enum": _METRIC_TYPES}, {"type": "null"}]},
            "comparison_type": {
                "anyOf": [{"enum": _COMPARISON_TYPES}, {"type": "null"}],
            },
            "calculation": {"enum": _CALCULATIONS},
            "retention_granularity": grain,
        },
        required=["name"],
    )
    relationship = _block_schema(
        "Relationship", yaml_io._REL_KEYS, Relationship,
        overrides={
            "type": {"enum": _REL_TYPES},
            # ref schema.py:16 add_native_relationship_aliases — the
            # explicit-column aliases and the {from}/{to} custom SQL
            "foreign_key_columns": {
                "description": "Explicit source-column list (alias for foreign_key)",
            },
            "primary_key_columns": {
                "description": "Explicit target-column list (alias for primary_key)",
            },
            "sql": {
                "description": "Custom join SQL using {from} and {to} runtime placeholders",
            },
        },
        required=["name"],
    )
    segment = _block_schema(
        "Segment", yaml_io._SEG_KEYS, Segment, required=["name", "sql"]
    )
    parameter = _block_schema(
        "Parameter", yaml_io._PARAM_KEYS, Parameter,
        overrides={"type": {"enum": _PARAM_TYPES}},
        required=["name"],
    )
    security = _block_schema("SecurityPolicy", yaml_io._SECURITY_KEYS)
    freshness = _block_schema("Freshness", yaml_io._FRESHNESS_KEYS)
    deprecation = _block_schema("Deprecation", yaml_io._DEPRECATION_KEYS)
    preagg = _block_schema(
        "PreAggregation", yaml_io._PREAGG_KEYS,
        overrides={
            "granularity": grain,
            "partition_granularity": grain,
        },
        required=["name"],
    )
    model = _block_schema(
        "Model", yaml_io._MODEL_KEYS, Model,
        overrides={
            "dimensions": {"type": "array", "items": {"$ref": "#/$defs/Dimension"}},
            "metrics": {"type": "array", "items": {"$ref": "#/$defs/Metric"}},
            "measures": {
                "type": "array", "items": {"$ref": "#/$defs/Metric"},
                "description": "Alias for metrics",
            },
            "relationships": {
                "type": "array", "items": {"$ref": "#/$defs/Relationship"},
            },
            "segments": {"type": "array", "items": {"$ref": "#/$defs/Segment"}},
            "pre_aggregations": {
                "type": "array", "items": {"$ref": "#/$defs/PreAggregation"},
            },
            "security": {"$ref": "#/$defs/SecurityPolicy"},
            "freshness": {"$ref": "#/$defs/Freshness"},
            "deprecation": {"$ref": "#/$defs/Deprecation"},
            "default_grain": grain,
        },
        required=["name"],
    )
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Sidemantic-Spark Semantic Layer",
        "description": (
            "Schema for semantic layer YAML configuration "
            "(generated from the loader's authoring surface)"
        ),
        "type": "object",
        "properties": {
            "version": {"type": ["integer", "string"]},
            "models": {
                "type": "array",
                "description": "Model definitions",
                "items": {"$ref": "#/$defs/Model"},
            },
            "metrics": {
                "type": "array",
                "description": (
                    "Top-level metric definitions "
                    "(optional - can also define in models)"
                ),
                "items": {"$ref": "#/$defs/Metric"},
            },
            "parameters": {
                "type": "array",
                "description": "Parameter definitions for dynamic queries",
                "items": {"$ref": "#/$defs/Parameter"},
            },
        },
        "required": ["models"],
        "$defs": {
            "Model": model,
            "Dimension": dimension,
            "Metric": metric,
            "Relationship": relationship,
            "Segment": segment,
            "Parameter": parameter,
            "SecurityPolicy": security,
            "Freshness": freshness,
            "Deprecation": deprecation,
            "PreAggregation": preagg,
        },
    }


def _default_aggs() -> list[str]:
    from sidemantic_spark.core.model import SIMPLE_AGGS

    return sorted(SIMPLE_AGGS)


def export_schema(output_path: str | Path = "sidemantic-spark-schema.json") -> Path:
    """Write the schema to disk for editor completion (ref
    ``schema.py:109``)."""
    output_path = Path(output_path)
    output_path.write_text(json.dumps(generate_yaml_schema(), indent=2))
    return output_path


if __name__ == "__main__":
    p = export_schema()
    print(f"JSON Schema exported to: {p}")
    print("Add this to the top of your YAML files:")
    print(f"# yaml-language-server: $schema=./{p.name}")
