"""Semantic-format registry: names, aliases, capabilities.

Mirrors the reference's ``sidemantic/formats.py`` public surface
(``SemanticFormat``/``semantic_formats``/``get_semantic_format``/
``load_semantic_source``/``convert_semantic_source``, exercised by ref
``tests/test_formats.py``) over this repo's adapter set. Adapters here
import via ``parse_file(layer, path)`` and export to *text* via
``adapters.export_graph`` — so ``convert_semantic_source`` returns the
converted text rather than writing format-native directory trees.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class UnknownFormatError(ValueError):
    """Format name or alias not registered."""


class UnsupportedFormatOperationError(ValueError):
    """Registered format cannot perform the requested operation."""


@dataclass(frozen=True)
class SemanticFormat:
    """One interchange format and its adapter capabilities."""

    name: str
    adapter: str  # key into adapters.ADAPTERS ("sidemantic" = native yaml)
    aliases: tuple[str, ...] = ()
    extensions: tuple[str, ...] = ()
    supports_export: bool = True
    # "file" (single document), "directory" (file-per-object tree), or
    # "file_or_directory"
    source_kind: str = "file_or_directory"

    @property
    def supports_import(self) -> bool:
        return True

    def create_adapter(self):
        from sidemantic_spark.adapters import ADAPTERS

        if self.adapter == "sidemantic":
            return None  # native yaml loads through authoring.yaml_io
        return ADAPTERS[self.adapter]()


_FORMATS: tuple[SemanticFormat, ...] = (
    SemanticFormat("atscale", "atscale", aliases=("sml", "atscale-sml")),
    SemanticFormat("bsl", "bsl", aliases=("boring-semantic-layer",)),
    SemanticFormat("cube", "cube", aliases=("cubejs", "cube-js", "cube_js")),
    SemanticFormat("gooddata", "gooddata", aliases=("good-data",)),
    SemanticFormat("graphene", "graphene", aliases=("gsql",), supports_export=False),
    SemanticFormat("hex", "hex"),
    SemanticFormat("holistics", "holistics", aliases=("aml",)),
    SemanticFormat("lookml", "lookml", aliases=("looker",)),
    SemanticFormat("malloy", "malloy"),
    SemanticFormat("metricflow", "metricflow", aliases=("dbt", "dbt-semantic-layer")),
    SemanticFormat("omni", "omni"),
    SemanticFormat("osi", "osi", aliases=("open-semantic-interchange",)),
    SemanticFormat("rill", "rill"),
    SemanticFormat("sidemantic", "sidemantic", aliases=("native",)),
    SemanticFormat("snowflake", "snowflake", aliases=("cortex", "snowflake-cortex")),
    SemanticFormat("superset", "superset"),
    SemanticFormat("tableau", "tableau", aliases=("twb",), supports_export=False),
    SemanticFormat("thoughtspot", "thoughtspot", aliases=("thought-spot", "tml")),
    SemanticFormat("tmdl", "tmdl", aliases=("powerbi", "power-bi")),
    SemanticFormat("yardstick", "yardstick", aliases=("yardstick-sql",),
                   supports_export=False),
)


def semantic_formats() -> tuple[SemanticFormat, ...]:
    """Registered formats in stable (sorted) display order."""
    return _FORMATS


def get_semantic_format(name: str, *, operation: str | None = None) -> SemanticFormat:
    """Resolve a canonical name or alias; focused error per operation."""
    normalized = (name or "").strip().lower().replace("_", "-")
    spec = next(
        (c for c in _FORMATS
         if normalized in (c.name, c.name.replace("_", "-")) or normalized in c.aliases
         or normalized.replace("-", "_") in (c.name,) + c.aliases),
        None,
    )
    if spec is None:
        known = ", ".join(c.name for c in _FORMATS)
        raise UnknownFormatError(
            f"Unknown semantic format '{name}'. Available formats: {known}")
    if operation == "export" and not spec.supports_export:
        raise UnsupportedFormatOperationError(
            f"Format '{spec.name}' supports import but not export")
    if operation not in (None, "import", "export"):
        raise ValueError(f"Unknown format operation '{operation}'")
    return spec


def load_semantic_source(layer, source: str, *, source_format: str = "auto") -> None:
    """Load one semantic source into ``layer``.

    ``auto`` on a FILE parses exactly that file (never scans siblings);
    ``auto`` on a directory runs project-wide multi-format discovery.
    """
    if not os.path.exists(source):
        raise FileNotFoundError(f"Semantic source does not exist: {source}")

    if (source_format or "auto").strip().lower() == "auto":
        from sidemantic_spark.authoring.loaders import load_from_directory, load_from_file

        if os.path.isfile(source):
            load_from_file(layer, source)
        else:
            load_from_directory(layer, source)
        return

    spec = get_semantic_format(source_format, operation="import")
    if spec.adapter == "sidemantic":
        from sidemantic_spark.authoring.yaml_io import load_path

        load_path(layer, source)
        return
    spec.create_adapter().parse_file(layer, source)


def export_semantic_graph(graph, *, target_format: str = "sidemantic") -> str:
    """Serialize ``graph`` through a registered format; returns text."""
    spec = get_semantic_format(target_format, operation="export")
    from sidemantic_spark.adapters import export_graph

    return export_graph(graph, "native" if spec.adapter == "sidemantic" else spec.adapter)


def convert_semantic_source(
    layer, source: str, *, source_format: str = "auto",
    target_format: str = "sidemantic",
) -> str:
    """Load an exact source into ``layer`` and return it re-serialized
    in ``target_format``."""
    load_semantic_source(layer, source, source_format=source_format)
    return export_semantic_graph(layer.graph, target_format=target_format)
