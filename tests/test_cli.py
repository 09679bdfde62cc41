"""CLI contract tests (reference ``sidemantic/cli.py:285`` command set:
query/compile/rewrite/convert/validate/info/test/init/preagg).

Runs ``main(argv)`` in-process; commands that need Spark reuse the
session fixture via a monkeypatched ``_build_spark``.
"""

from __future__ import annotations

import json
import os

import pytest
import yaml

from sidemantic_spark import cli


@pytest.fixture()
def models_yml(tmp_path, sf_dir):
    path = tmp_path / "models.yml"
    path.write_text(f"""
models:
  - name: orders
    source_uri: {sf_dir}/orders.parquet
    primary_key: o_orderkey
    dimensions:
      - name: status
        sql: o_orderstatus
      - name: order_date
        sql: o_orderdate
        type: time
    metrics:
      - name: order_count
        agg: count
      - name: revenue
        agg: sum
        sql: o_totalprice
""")
    return str(path)


@pytest.fixture(autouse=True)
def _use_test_spark(monkeypatch, spark):
    monkeypatch.setattr(cli, "_build_spark", lambda app="x": spark)


def test_cli_compile(models_yml, capsys):
    rc = cli.main(["compile", "-f", models_yml, "-m", "orders.revenue", "-d", "orders.status"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "GROUP BY" in out and "SUM" in out


def test_cli_query_json(models_yml, capsys):
    rc = cli.main(["query", "-f", models_yml, "-m", "orders.order_count",
                   "-d", "orders.status", "-o", "json"])
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3
    assert {r["status"] for r in rows} == {"O", "P", "F"}


def test_cli_sql_and_rewrite(models_yml, capsys):
    rc = cli.main(["rewrite", "-f", models_yml,
                   "SELECT orders.status, orders.revenue FROM orders"])
    assert rc == 0
    assert "GROUP BY" in capsys.readouterr().out
    rc = cli.main(["sql", "-f", models_yml, "-o", "json",
                   "SELECT orders.status, orders.order_count FROM orders"])
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3


def test_cli_validate_and_info(models_yml, capsys):
    assert cli.main(["validate", "-f", models_yml]) == 0
    assert "OK" in capsys.readouterr().out
    assert cli.main(["info", "-f", models_yml]) == 0
    out = capsys.readouterr().out
    assert "model orders" in out and "metric revenue" in out


def test_cli_convert_from_adapter(tmp_path, capsys):
    cube = tmp_path / "cube.yml"
    cube.write_text("""
cubes:
  - name: sales
    sql_table: t_sales
    dimensions:
      - name: id
        sql: id
        type: number
        primary_key: true
    measures:
      - name: total
        type: sum
        sql: amount
""")
    out_path = tmp_path / "native.yml"
    rc = cli.main(["convert", "-f", str(cube), "--format", "cube", "--out", str(out_path)])
    assert rc == 0
    doc = yaml.safe_load(out_path.read_text())
    names = {m["name"] for m in doc["models"]}
    assert "sales" in names


def test_cli_init_and_roundtrip(tmp_path, sf_dir, capsys):
    out_path = tmp_path / "gen.yml"
    rc = cli.main(["init", f"{sf_dir}/nation.parquet", "--out", str(out_path)])
    assert rc == 0
    doc = yaml.safe_load(out_path.read_text())
    assert doc["models"][0]["name"] == "nation"
    capsys.readouterr()  # drain the init "wrote ..." line
    rc = cli.main(["query", "-f", str(out_path), "-m", "nation.count", "-o", "json"])
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert rows[0]["count"] == 25


def test_cli_golden_tests(models_yml, tmp_path, capsys):
    cases = tmp_path / "cases.yml"
    cases.write_text("""
tests:
  - name: count_by_status
    query:
      metrics: [orders.order_count]
      dimensions: [orders.status]
    expect:
      row_count: 3
  - name: total_revenue_positive
    query:
      metrics: [orders.revenue]
    expect:
      row_count: 1
""")
    rc = cli.main(["test", "-f", models_yml, str(cases)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "2/2 passed" in out


def test_cli_preagg_apply_and_refresh(tmp_path, sf_dir, capsys, monkeypatch):
    """`preagg apply` materializes the rollup; `preagg refresh --since`
    rebuilds only the partitions at/after the boundary (dynamic
    partition overwrite)."""
    path = tmp_path / "models.yml"
    path.write_text(f"""
models:
  - name: orders
    source_uri: {sf_dir}/orders.parquet
    primary_key: o_orderkey
    dimensions:
      - name: status
        sql: o_orderstatus
      - name: order_date
        sql: o_orderdate
        type: time
    metrics:
      - name: revenue
        agg: sum
        sql: o_totalprice
    pre_aggregations:
      - name: daily
        measures: [revenue]
        dimensions: [status]
        time_dimension: order_date
        granularity: day
        partition_granularity: month
""")
    monkeypatch.setenv("SIDEMANTIC_SPARK_PREAGG_PATH", str(tmp_path / "preaggs"))
    rc = cli.main(["preagg", "apply", "-f", str(path), "orders"])
    assert rc == 0
    assert "materialized" in capsys.readouterr().out
    rc = cli.main(["preagg", "refresh", "-f", str(path), "orders",
                   "--name", "daily", "--since", "1997-01-01"])
    assert rc == 0
    assert "refreshed orders.daily" in capsys.readouterr().out


def test_cli_convert_all_export_formats(models_yml, tmp_path, capsys):
    for fmt in ["cube", "rill", "superset", "hex", "omni", "snowflake",
                "bsl", "osi", "atscale", "thoughtspot", "malloy", "tmdl",
                "holistics", "gooddata"]:
        out = tmp_path / f"out.{fmt}"
        rc = cli.main(["convert", "-f", models_yml, "--to", fmt,
                       "--out", str(out)])
        assert rc == 0, fmt
        assert "orders" in out.read_text(), fmt
