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


def test_migrate_check_and_generate(tmp_path, models_yml, capsys):
    """Migrator (reference core/migrator.py:195): coverage verdicts over
    a SQL corpus, semantic rewrite for covered queries, and model
    generation for uncovered tables."""
    qdir = tmp_path / "queries"
    qdir.mkdir()
    (qdir / "q1.sql").write_text(
        "SELECT o_orderstatus, SUM(o_totalprice) AS revenue, COUNT(*) AS n "
        "FROM orders GROUP BY o_orderstatus"
    )
    (qdir / "q2.sql").write_text(
        "SELECT city, SUM(amount) AS total_spend, COUNT(DISTINCT user_id) AS users "
        "FROM payments GROUP BY city"
    )
    rc = cli.main(["migrate", "check", "-f", models_yml, str(qdir), "-v"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "1/2 queries rewritable" in out
    assert "payments" in out  # missing model reported

    rc = cli.main(["migrate", "generate", "-f", models_yml, str(qdir),
                   "--out", str(tmp_path / "gen.yml")])
    assert rc == 0
    capsys.readouterr()
    gen = (tmp_path / "gen.yml").read_text()
    assert "payments" in gen and "total_spend" in gen and "city" in gen
    # generated YAML loads back as a valid model set
    from sidemantic_spark.authoring import load_path
    from sidemantic_spark.core.layer import SparkSemanticLayer

    layer = SparkSemanticLayer(None)
    load_path(layer, str(tmp_path / "gen.yml"))
    pay = layer.graph.models["payments"]
    assert pay.metric("total_spend").agg == "sum"
    assert pay.metric("users").agg == "count_distinct"
    assert pay.dimension("city") is not None


def test_migrate_rewritten_query_executes(models_yml, spark, tmp_path, capsys):
    """The rewritten semantic SQL of a covered query returns the same
    rows as the original warehouse SQL run directly on Spark."""
    from sidemantic_spark.core.migrator import Migrator

    class _Args:
        models = models_yml
        format = "native"
        register = None

    layer = cli._load_layer(_Args(), spark)
    layer.register_sources()
    mig = Migrator(layer)
    original = (
        "SELECT o_orderstatus, SUM(o_totalprice) AS revenue "
        "FROM orders WHERE o_orderstatus != 'P' GROUP BY o_orderstatus"
    )
    qa = mig.analyze(original)
    assert qa.can_rewrite, qa.reasons
    # a filter column with no covering dimension blocks auto-migration
    bad = mig.analyze(
        "SELECT o_orderstatus, SUM(o_totalprice) AS revenue "
        "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus"
    )
    assert not bad.can_rewrite
    assert any("o_orderpriority" in r for r in bad.reasons)
    got = {(r[0], round(r[1], 2)) for r in layer.sql(qa.rewritten).collect()}
    want = {(r[0], round(r[1], 2)) for r in spark.sql(original).collect()}
    assert got == want


def test_cli_explain_commands(models_yml, capsys):
    rc = cli.main(["explain", "-f", models_yml, "-m", "orders.revenue",
                   "-d", "orders.status"])
    out = capsys.readouterr().out
    assert rc == 0
    plan = json.loads(out)
    assert plan.get("models") or plan.get("join_path") is not None

    rc = cli.main(["explain-sql", "-f", models_yml,
                   "SELECT orders.status, orders.revenue FROM orders"])
    out = capsys.readouterr().out
    assert rc == 0
    exp = json.loads(out)
    assert "sql" in exp or "applied_rules" in exp or "plan" in exp


def test_generate_types_and_sql(models_yml, tmp_path, capsys):
    """TypeScript codegen (reference codegen.py): schema module +
    sqlx-style typed query signatures from TS sources."""
    rc = cli.main(["generate", "types", "-f", models_yml,
                   "--out", str(tmp_path / "schema.ts")])
    assert rc == 0
    capsys.readouterr()
    ts = (tmp_path / "schema.ts").read_text()
    assert "export const schema =" in ts and "as const;" in ts
    assert '"revenue"' in ts and '"order_date"' in ts
    assert '"grains"' in ts  # time dimension exposes selectable grains
    assert "SCHEMA_YAML" in ts

    src = tmp_path / "app.ts"
    src.write_text(
        'const q = `SELECT orders.status, orders.revenue FROM orders`;\n'
        'const bad = `SELECT orders.nope FROM orders`;\n'
    )
    rc = cli.main(["generate", "sql", "-f", models_yml, str(src),
                   "--out", str(tmp_path / "queries.ts")])
    assert rc == 0
    capsys.readouterr()
    out = (tmp_path / "queries.ts").read_text()
    assert "GeneratedQueries" in out
    assert "status: string; revenue: number" in out
    assert "nope" in out and out.index("// ") > out.index("}")  # invalid -> comment


def test_cli_convert_fidelity_flag(models_yml, capsys):
    rc = cli.main(["convert", "-f", models_yml, "--to", "rill", "--fidelity"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "rill:" in out  # summary line from the fidelity report


def test_cli_demo_and_workbench(tmp_path, capsys, monkeypatch):
    """demo writes a runnable project; workbench REPL answers semantic
    SQL over it (stdin-driven)."""
    out = tmp_path / "demo"
    rc = cli.main(["demo", "--out", str(out)])
    assert rc == 0
    assert "demo project written" in capsys.readouterr().out
    assert (out / "models.yml").exists()

    # the generated project actually queries
    rc = cli.main(["query", "-f", str(out / "models.yml"),
                   "-m", "orders.revenue", "-d", "orders.status", "-o", "json"])
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3

    inputs = iter([
        "\\models",
        "SELECT orders.status, orders.order_count FROM orders",
        "\\compile SELECT orders.revenue FROM orders",
        "\\q",
    ])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(inputs))
    rc = cli.main(["workbench", "-f", str(out / "models.yml")])
    out_text = capsys.readouterr().out
    assert rc == 0
    assert "orders:" in out_text          # \models listing
    assert "paid" in out_text             # query rows
    assert "SUM(" in out_text             # \compile output


def test_python_definition_files(tmp_path, sf_dir, capsys):
    """Python semantic definition files (reference loaders.py +
    core/registry.py:62): Models constructed in a .py file auto-register
    via the authoring registry; mixed directories load alongside YAML."""
    d = tmp_path / "models"
    d.mkdir()
    (d / "orders.py").write_text(f"""
Model(
    name="orders",
    source_uri="{sf_dir}/orders.parquet",
    primary_key="o_orderkey",
    dimensions=[Dimension(name="status", sql="o_orderstatus")],
    metrics=[Metric(name="revenue", agg="sum", sql="o_totalprice"),
             Metric(name="order_count", agg="count")],
)
""")
    (d / "extra.yml").write_text("""
models:
  - name: orders_extra
    table: orders
    primary_key: o_orderkey
    metrics:
      - name: n
        agg: count
""")
    rc = cli.main(["query", "-f", str(d), "-m", "orders.revenue",
                   "-d", "orders.status", "-o", "json"])
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3

    from sidemantic_spark.authoring.yaml_io import load_path
    from sidemantic_spark.core.layer import SparkSemanticLayer

    layer = SparkSemanticLayer(None)
    load_path(layer, str(d))
    assert set(layer.graph.models) == {"orders", "orders_extra"}


def test_cli_manpage(capsys):
    """`manpage` emits roff covering every registered subcommand
    (reference manpage.py generates the same from its Click tree)."""
    from sidemantic_spark import cli

    assert cli.main(["manpage"]) == 0
    out = capsys.readouterr().out
    assert out.startswith('.TH "SIDEMANTIC-SPARK" "1"')
    for cmd in ("query", "sql", "convert", "serve", "crossfilter",
                "preagg", "workbench", "manpage"):
        assert f"\\fB{cmd}\\fR".replace("-", r"\-") in out or f"\\fB{cmd}\\fR" in out, cmd


def test_schema_drift_detection(spark, sf_dir):
    """check_schema_drift probes the live catalog and reports dropped/
    renamed columns that static validation cannot see (reference
    sidemantic/testing.py:228 + tests/test_testing.py drift family)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship
    from sidemantic_spark.models.tpch import build_layer
    from sidemantic_spark.testing import check_schema_drift

    layer = build_layer(spark, sf_dir)
    report = check_schema_drift(layer)
    assert report.ok, report.errors
    assert report.checked_models >= 5

    bad = SparkSemanticLayer(spark)
    bad.add_model(Model(
        name="drift_orders", table="orders", primary_key="no_such_pk",
        dimensions=[
            Dimension(name="status", sql="o_orderstatus"),
            Dimension(name="ghost", sql="o_ghost_column"),
            Dimension(name="expr_ghost",
                      sql="CASE WHEN missing_col > 1 THEN 'x' END"),
        ],
        metrics=[Metric(name="rev", agg="sum", sql="o_totalprice"),
                 Metric(name="bad", agg="sum", sql="not_a_col")],
        relationships=[Relationship(name="drift_cust", type="many_to_one",
                                    foreign_key="o_missing_fk")],
    ))
    bad.add_model(Model(
        name="drift_cust", table="no_such_table_anywhere", primary_key="id",
    ))
    rep = check_schema_drift(bad)
    assert not rep.ok
    joined = "\n".join(rep.errors)
    assert "no_such_pk" in joined
    assert "o_ghost_column" in joined
    assert "missing_col" in joined
    assert "not_a_col" in joined
    assert "o_missing_fk" in joined
    assert "no_such_table_anywhere" in joined
    # the healthy columns produce no errors
    assert "o_orderstatus" not in joined and "o_totalprice" not in joined
