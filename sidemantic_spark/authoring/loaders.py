"""Multi-format auto-detecting project loader (reference
``loaders.py:load_from_directory``): point the layer at a directory and
every recognized semantic file loads through the right adapter — Cube,
MetricFlow/dbt, Hex, Rill, Snowflake, GoodData, Omni, Superset, AtScale
SML, BSL YAML; LookML/Malloy/ThoughtSpot/TMDL/Holistics/Graphene by
extension; Yardstick vs plain SQL definitions by content; Python
definition files; OSI JSON trees; native YAML as the fallback.

Detection is content-based for YAML/JSON/SQL (extensions are ambiguous
across BI formats) and mirrors the reference's heuristics:

- generated artifacts (``target/``, ``dbt_packages/``, ``node_modules/``,
  dotdirs) are skipped;
- a ``.lkml`` anywhere hands the WHOLE directory to the LookML adapter
  once, so ``include:`` scoping and cross-file refinements resolve
  (reference parses LookML projects whole for the same reason);
- OSI ``.json`` loads only when it looks like an OSI document (root
  ``interfaces``/``datasets`` shape) — random JSON is never guessed at;
- ``strict=True`` re-raises parse failures naming the file; lenient
  mode warns and continues.
"""

from __future__ import annotations

import json
import os
import re
import warnings

import yaml

SKIP_DIRS = {"target", "dbt_packages", "node_modules", "__pycache__",
             ".git", ".venv", "venv"}

_YARDSTICK_RE = re.compile(r"\bAS\s+MEASURE\b", re.I)
_PY_MODEL_RE = re.compile(r"\bModel\s*\(")


class FormatDetectionError(Exception):
    pass


def _docs(text: str) -> list:
    from sidemantic_spark.authoring.yaml_io import yaml_safe_load_all

    return [d for d in yaml_safe_load_all(text) if d is not None]


def detect_yaml_format(text: str) -> str:
    """Format name for a YAML document's content (ADAPTERS key or
    'native'). Mirrors the reference's per-file detector
    (loaders.py:231-586)."""
    try:
        docs = _docs(text)
    except yaml.YAMLError:
        return "native"  # parse error surfaces through the native path
    if not docs:
        return "native"
    first = docs[0]
    if not isinstance(first, dict):
        return "native"

    # multi-doc typed resources: hex (type: model|view|metric per doc)
    if len(docs) > 1 and all(
        isinstance(d, dict)
        and (d.get("type") in ("model", "view", "metric")
             or "base_sql_query" in d or "relations" in d)
        for d in docs
    ):
        return "hex"
    if first.get("type") in ("model", "view") and (
        "base_sql_query" in first or "relations" in first
        or "contents" in first
    ):
        return "hex"

    if "cubes" in first or (
        "views" in first and isinstance(first.get("views"), list)
        and any(isinstance(v, dict) and ("cubes" in v or "join_path"
                in json.dumps(v.get("cubes", ""))) for v in first["views"])
    ):
        return "cube"
    if "semantic_models" in first:
        return "metricflow"
    if "metrics" in first and isinstance(first["metrics"], list) and any(
        isinstance(m, dict) and "type_params" in m for m in first["metrics"]
    ):
        return "metricflow"
    if first.get("type") == "metrics_view" or (
        ("measures" in first or "dimensions" in first)
        and ("timeseries" in first or "smallest_time_grain" in first
             or first.get("parent"))
    ):
        return "rill"
    if "ldm" in first or "projectModel" in first or "declarativeModel" in first:
        return "gooddata"
    if "tables" in first and isinstance(first["tables"], list) and any(
        isinstance(t, dict) and ("base_table" in t or "facts" in t
                                 or "time_dimensions" in t)
        for t in first["tables"]
    ):
        return "snowflake"
    if first.get("object_type") in ("dataset", "dimension", "model",
                                    "metric", "metric_calc"):
        return "atscale"
    if "table_name" in first and ("metrics" in first or "columns" in first):
        return "superset"
    if "base_view" in first or (
        isinstance(first.get("dimensions"), dict)
        or isinstance(first.get("measures"), dict)
    ) and "models" not in first:
        return "omni"
    if "connection" in first and "models" not in first and any(
        isinstance(v, dict) and ("dimensions" in v or "measures" in v)
        for k, v in first.items() if k not in ("connection",)
    ):
        return "bsl"
    return "native"


def _looks_like_osi_json(data) -> bool:
    if isinstance(data, dict):
        return "interfaces" in data or "datasets" in data or "osi" in data
    if isinstance(data, list):
        return bool(data) and all(
            isinstance(d, dict) and ("datasets" in d or "interface" in d)
            for d in data
        )
    return False


def load_from_file(layer, path: str) -> None:
    """Auto-detect and load exactly one semantic file.

    Exact-file semantics (ref ``tests/test_formats.py``
    auto_file_load_is_exact): only the named file is parsed — sibling
    files are never scanned, including for LookML.
    """
    _load_one(layer, path, lookml_target=path)


def load_from_directory(layer, directory: str, strict: bool = True) -> None:
    """Auto-detect and load every semantic file under ``directory``."""
    directory = os.path.abspath(directory)
    saw_lookml = [False]
    files: list[str] = []
    for root, dirs, names in os.walk(directory):
        dirs[:] = sorted(
            d for d in dirs if d not in SKIP_DIRS and not d.startswith(".")
        )
        for name in sorted(names):
            files.append(os.path.join(root, name))

    for path in files:
        try:
            _load_one(layer, path, lookml_target=directory,
                      saw_lookml=saw_lookml)
        except Exception as exc:
            if strict:
                if isinstance(exc, FormatDetectionError):
                    raise
                raise FormatDetectionError(f"{path}: {exc}") from exc
            warnings.warn(f"skipped {path}: {exc}", stacklevel=2)


def _load_one(layer, path: str, *, lookml_target: str,
              saw_lookml: list | None = None) -> None:
    """Dispatch one file to its format loader. ``lookml_target`` is what
    the LookML adapter receives (the project directory when scanning a
    tree — LookML views/explores cross-reference between files — or the
    file itself for exact-file loads); ``saw_lookml`` dedupes the
    directory-wide parse across a tree walk."""
    from sidemantic_spark.adapters import ADAPTERS, import_file
    from sidemantic_spark.authoring.sql_defs import load_sql_definitions
    from sidemantic_spark.authoring.yaml_io import (
        load_python_definitions,
        load_yaml,
    )

    ext = os.path.splitext(path)[1].lower()
    if ext in (".lkml", ".lookml"):
        if saw_lookml is None:
            ADAPTERS["lookml"]().parse_file(layer, lookml_target)
        elif not saw_lookml[0]:
            saw_lookml[0] = True
            ADAPTERS["lookml"]().parse_file(layer, lookml_target)
        return
    if ext == ".malloy":
        return import_file(layer, path, "malloy")
    if ext == ".tml":
        return import_file(layer, path, "thoughtspot")
    if ext == ".tmdl":
        return import_file(layer, path, "tmdl")
    if ext == ".aml":
        return import_file(layer, path, "holistics")
    if ext == ".gsql":
        return import_file(layer, path, "graphene")
    if ext == ".json":
        with open(path) as fh:
            try:
                data = json.load(fh)
            except json.JSONDecodeError as exc:
                raise FormatDetectionError(
                    f"malformed JSON in {path}: {exc}"
                ) from exc
        if _looks_like_osi_json(data) or os.path.basename(
            os.path.dirname(path)
        ).upper() == "OSI":
            return import_file(layer, path, "osi")
        if isinstance(data, dict) and (
            "ldm" in data or "projectModel" in data
        ):
            return import_file(layer, path, "gooddata")
        return None  # random JSON: never guessed at
    if ext == ".sql":
        with open(path) as fh:
            text = fh.read()
        if _YARDSTICK_RE.search(text):
            ADAPTERS["yardstick"]().parse_text(layer, text)
            return
        return load_sql_definitions(layer, text, source=path)
    if ext == ".py":
        with open(path) as fh:
            text = fh.read()
        if _PY_MODEL_RE.search(text):
            return load_python_definitions(layer, text, source=path)
        return None
    if ext in (".yml", ".yaml"):
        with open(path) as fh:
            text = fh.read()
        fmt = detect_yaml_format(text)
        if fmt == "native":
            return load_yaml(layer, text, source=path)
        stem = os.path.splitext(os.path.basename(path))[0]
        adapter = ADAPTERS[fmt]()
        try:
            docs = _docs(text)
        except yaml.YAMLError as exc:
            raise FormatDetectionError(
                f"malformed YAML in {path}: {exc}"
            ) from exc
        import inspect

        takes_stem = "filestem" in inspect.signature(
            adapter.parse
        ).parameters
        for doc in docs:
            if takes_stem:
                adapter.parse(layer, doc, filestem=stem)
            else:
                adapter.parse(layer, doc)
        return None
    return None
