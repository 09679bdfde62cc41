"""Format-registry facade (mined from reference ``tests/test_formats.py``):
stable names, alias resolution, capability errors, exact-file auto
loading, and source conversion."""

from __future__ import annotations

import pytest

from sidemantic_spark.core.layer import SparkSemanticLayer
from sidemantic_spark.formats import (
    UnknownFormatError,
    UnsupportedFormatOperationError,
    convert_semantic_source,
    get_semantic_format,
    load_semantic_source,
    semantic_formats,
)

NATIVE = """\
models:
  - name: fmt_orders
    table: fmt_orders
    primary_key: id
    dimensions:
      - name: id
        type: numeric
        sql: id
    metrics:
      - name: order_count
        agg: count
"""


def test_registry_stable_names_aliases_capabilities():
    names = [s.name for s in semantic_formats()]
    assert names == sorted(names)
    assert get_semantic_format("native").name == "sidemantic"
    assert get_semantic_format("cube_js").name == "cube"
    assert get_semantic_format("powerbi").name == "tmdl"
    assert get_semantic_format("dbt").name == "metricflow"
    assert get_semantic_format("looker").name == "lookml"
    assert get_semantic_format("tableau").supports_export is False
    assert get_semantic_format("tmdl").supports_export is True
    assert all(s.supports_import for s in semantic_formats())


def test_unknown_and_unsupported_formats():
    with pytest.raises(UnknownFormatError, match="Available formats"):
        get_semantic_format("not_a_format")
    with pytest.raises(UnsupportedFormatOperationError, match="not export"):
        get_semantic_format("tableau", operation="export")
    with pytest.raises(ValueError, match="Unknown format operation"):
        get_semantic_format("cube", operation="sideways")


def test_every_registry_adapter_resolves():
    for spec in semantic_formats():
        adapter = spec.create_adapter()
        assert spec.adapter == "sidemantic" or adapter is not None


def test_auto_file_load_is_exact_and_ignores_siblings(spark, tmp_path):
    (tmp_path / "good.yml").write_text(NATIVE)
    (tmp_path / "sibling.yml").write_text(
        NATIVE.replace("fmt_orders", "sibling_model"))
    layer = SparkSemanticLayer(spark)
    load_semantic_source(layer, str(tmp_path / "good.yml"))
    assert "fmt_orders" in layer.graph.models
    assert "sibling_model" not in layer.graph.models  # never scans siblings


def test_auto_directory_load_scans_tree(spark, tmp_path):
    (tmp_path / "a.yml").write_text(NATIVE)
    (tmp_path / "b.yml").write_text(NATIVE.replace("fmt_orders", "second"))
    layer = SparkSemanticLayer(spark)
    load_semantic_source(layer, str(tmp_path))
    assert {"fmt_orders", "second"} <= set(layer.graph.models)


def test_missing_source_raises(spark):
    with pytest.raises(FileNotFoundError):
        load_semantic_source(SparkSemanticLayer(spark), "/nonexistent/path.yml")


def test_convert_native_to_cube_text(spark, tmp_path):
    (tmp_path / "m.yml").write_text(NATIVE)
    layer = SparkSemanticLayer(spark)
    out = convert_semantic_source(
        layer, str(tmp_path / "m.yml"), target_format="cube")
    assert "cubes" in out and "fmt_orders" in out


def test_explicit_format_load(spark, tmp_path):
    cube_doc = """\
cubes:
  - name: explicit_cube
    sql_table: t
    measures:
      - name: count
        type: count
"""
    p = tmp_path / "model.yml"
    p.write_text(cube_doc)
    layer = SparkSemanticLayer(spark)
    load_semantic_source(layer, str(p), source_format="cube_js")
    assert "explicit_cube" in layer.graph.models


def test_cli_accepts_format_aliases(spark, tmp_path, capsys):
    """`convert --to powerbi` and `--format cube_js` resolve through the
    registry (ref formats.py alias table)."""
    import argparse

    from sidemantic_spark.cli import cmd_convert

    cube_doc = """\
cubes:
  - name: alias_cube
    sql_table: t
    measures:
      - name: count
        type: count
"""
    p = tmp_path / "model.yml"
    p.write_text(cube_doc)
    args = argparse.Namespace(
        models=str(p), config=None, format="cube_js", register=None,
        to="powerbi", out=None, fidelity=False)
    assert cmd_convert(args) == 0
    out = capsys.readouterr().out
    assert "alias_cube" in out and "table alias_cube" in out  # TMDL text
