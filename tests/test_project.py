"""Project discovery + config defaults (ref sidemantic/project.py,
config.py, tests/test_project.py)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
import yaml

from sidemantic_spark.project import (
    ProjectContext,
    ProjectResolutionError,
    find_config,
)


def _write_project(root, models_dir="models"):
    (root / models_dir).mkdir(parents=True, exist_ok=True)
    (root / models_dir / "sales.yml").write_text(yaml.safe_dump({
        "models": [{
            "name": "sales",
            "table": "sales",
            "primary_key": "sale_id",
            "dimensions": [{"name": "cat", "sql": "cat"}],
            "metrics": [{"name": "total", "agg": "sum", "sql": "amount"}],
        }]
    }))
    (root / "sidemantic-spark.yml").write_text(yaml.safe_dump({
        "models_dir": models_dir,
        "tables": {"sales": "data/sales.csv"},
        "spark": {"spark.sql.shuffle.partitions": "4"},
        "preagg_path": ".rollups",
    }))
    data = root / "data"
    data.mkdir(exist_ok=True)
    (data / "sales.csv").write_text(
        "sale_id,cat,amount\n1,a,100\n2,b,50\n3,a,25\n"
    )


def test_discover_upward_and_resolve(tmp_path):
    _write_project(tmp_path)
    nested = tmp_path / "sub" / "deeper"
    nested.mkdir(parents=True)
    ctx = ProjectContext.discover(start_dir=nested)
    assert ctx.root == tmp_path
    assert ctx.config_path == tmp_path / "sidemantic-spark.yml"
    assert ctx.resolve_models() == tmp_path / "models"
    assert ctx.spark_conf() == {"spark.sql.shuffle.partitions": "4"}
    assert ctx.tables() == {"sales": tmp_path / "data" / "sales.csv"}
    assert ctx.preagg_path() == tmp_path / ".rollups"


def test_no_config_falls_back_to_conventional(tmp_path):
    (tmp_path / "models").mkdir()
    ctx = ProjectContext.discover(start_dir=tmp_path)
    assert ctx.config_path is None
    assert ctx.resolve_models() == tmp_path / "models"
    assert find_config(tmp_path) is None


def test_explicit_config_is_authoritative(tmp_path):
    with pytest.raises(ProjectResolutionError, match="not found"):
        ProjectContext.discover(start_dir=tmp_path, config_path="nope.yml")
    bad = tmp_path / "broken.yml"
    bad.write_text("- just\n- a list\n")
    with pytest.raises(ProjectResolutionError, match="mapping"):
        ProjectContext.discover(start_dir=tmp_path, config_path=bad)


def test_explicit_models_beats_config(tmp_path):
    _write_project(tmp_path)
    other = tmp_path / "other_models"
    other.mkdir()
    ctx = ProjectContext.discover(start_dir=tmp_path)
    assert ctx.resolve_models(explicit="other_models") == other
    with pytest.raises(ProjectResolutionError):
        ctx.resolve_models(explicit="missing_dir")


def test_apply_registers_tables_and_preagg(tmp_path, spark):
    _write_project(tmp_path)
    from sidemantic_spark.authoring import load_path
    from sidemantic_spark.core.layer import SparkSemanticLayer

    ctx = ProjectContext.discover(start_dir=tmp_path)
    layer = SparkSemanticLayer(spark)
    load_path(layer, str(ctx.resolve_models()))
    ctx.apply(layer, spark)
    assert layer.preaggs.base_path == str(tmp_path / ".rollups")
    rows = {
        (r["cat"], r["total"])
        for r in layer.query(
            metrics=["sales.total"], dimensions=["sales.cat"]
        ).collect()
    }
    assert rows == {("a", 125), ("b", 50)}


def test_cli_uses_project_config(tmp_path):
    """`query` with no --models inside a project discovers the config,
    registers tables and answers (ref CLI project contract)."""
    _write_project(tmp_path)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="2",
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    out = subprocess.run(
        [sys.executable, "-m", "sidemantic_spark", "query",
         "-m", "sales.total", "-d", "sales.cat", "--output", "csv"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if "," in l]
    assert "cat,total" in lines
    assert {"a,125", "b,50"} <= set(lines)


def test_data_file_name_sanitization():
    """Reference datafiles.py table_name_for parity."""
    from pathlib import Path

    from sidemantic_spark.project import table_name_for

    assert table_name_for(Path("orders.csv")) == "orders"
    assert table_name_for(Path("Orders.CSV")) == "orders"
    assert table_name_for(Path("weird--name.csv")) == "weird__name"
    assert table_name_for(Path("2020 orders!.csv")) == "t_2020_orders"
    assert table_name_for(Path("__.csv")) == "data"


def test_data_dir_auto_discovery(spark, tmp_path):
    """A conventional data/ directory auto-registers every raw data
    file as a view; duplicate resolved names are an error (reference
    tests/test_datafiles.py + test_project_data_files.py)."""
    import csv as _csv

    import pytest as _pytest

    from sidemantic_spark.project import (
        ProjectContext,
        ProjectResolutionError,
        discover_data_files,
        register_data_files,
    )
    from sidemantic_spark.core.layer import SparkSemanticLayer

    d = tmp_path / "proj"
    (d / "data").mkdir(parents=True)
    (d / "models").mkdir()
    (d / "sidemantic-spark.yml").write_text("models_dir: models\n")
    with open(d / "data" / "My Sales!.csv", "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["id", "amount"])
        w.writerows([[1, 10], [2, 20]])
    (d / "data" / "notes.txt").write_text("not a data file")

    files = discover_data_files(d / "data")
    assert [p.name for p in files] == ["My Sales!.csv"]

    ctx = ProjectContext.discover(start_dir=d)
    layer = SparkSemanticLayer(spark)
    ctx.apply(layer, spark)
    assert spark.sql("SELECT SUM(amount) FROM my_sales").collect()[0][0] == 30

    # duplicate resolved names refuse
    (d / "data" / "my-sales.csv").write_text("id,amount\n3,5\n")
    with _pytest.raises(ProjectResolutionError, match="resolve to view"):
        register_data_files(spark, discover_data_files(d / "data"))


def test_directory_load_strict_vs_lenient(spark, tmp_path):
    """Strict directory loading raises on a YAML parse error WITHOUT
    leaving a partial graph; lenient mode skips the broken file with a
    warning (reference tests/test_loaders.py strict/lenient pair)."""
    import warnings as _warnings

    import pytest as _pytest

    from sidemantic_spark.authoring import load_path
    from sidemantic_spark.authoring.yaml_io import AuthoringError
    from sidemantic_spark.core.layer import SparkSemanticLayer

    (tmp_path / "good.yml").write_text(
        "models:\n  - name: ld_orders\n    table: orders\n"
        "    primary_key: id\n    metrics:\n      - name: n\n        agg: count\n")
    (tmp_path / "zbad.yml").write_text("models:\n  - name: broken\n    table: [\n")

    layer = SparkSemanticLayer(spark)
    with _pytest.raises(AuthoringError, match="Could not parse"):
        load_path(layer, str(tmp_path))
    assert not layer.graph.models  # strict failure left no partial graph

    layer2 = SparkSemanticLayer(spark)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        load_path(layer2, str(tmp_path), strict=False)
    assert set(layer2.graph.models) == {"ld_orders"}
    assert any("zbad" in str(w.message) for w in caught)
