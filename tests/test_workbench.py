"""Workbench headless core (ref sidemantic/workbench/): model tree,
query run + compile preview, example queries, graph validation."""

from __future__ import annotations

import pytest

from sidemantic_spark.models.tpch import build_layer
from sidemantic_spark.workbench import EXAMPLE_QUERIES, WorkbenchSession


@pytest.fixture(scope="module")
def session(spark, sf_dir):
    return WorkbenchSession(build_layer(spark, sf_dir))


def test_model_tree(session):
    tree = session.model_tree()
    assert "orders" in tree and "lineitem" in tree
    assert "revenue" in tree["orders"]["metrics"]
    assert "status" in tree["orders"]["dimensions"]


def test_run_and_history(session):
    res = session.run(
        "SELECT orders.status, orders.revenue FROM orders ORDER BY orders.revenue DESC"
    )
    assert res.error is None
    assert res.columns == ["status", "revenue"]
    assert len(res.rows) >= 1
    assert "GROUP BY" in res.compiled_sql.upper()
    assert session.history[-1].startswith("SELECT orders.status")


def test_run_error_is_captured(session):
    res = session.run("SELECT nonsense.metric FROM nowhere")
    assert res.error is not None and res.rows == []


def test_example_queries_run(session):
    for name, sql in EXAMPLE_QUERIES.items():
        if name == "Custom":
            continue
        res = session.run(sql)
        assert res.error is None, f"{name}: {res.error}"
        assert len(res.rows) > 0, name


def test_validation_flags_issues(spark):
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Metric, Model, Relationship

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="a",
        table="a_t",
        metrics=[
            Metric(name="ok", agg="count"),
            Metric(name="bad_ratio", type="ratio",
                   numerator="missing", denominator="ok"),
            Metric(name="bad_derived", type="derived"),
        ],
        relationships=[
            Relationship(name="ghost", type="many_to_one", foreign_key="g_id")
        ],
    ))
    layer.add_model(Model(name="empty", table="e_t"))
    issues = WorkbenchSession(layer).validate()
    msgs = [(i.severity, i.model, i.message) for i in issues]
    assert any("unknown model" in m for _, _, m in msgs)
    assert any("unknown metric 'missing'" in m for _, _, m in msgs)
    assert any("no expression" in m for _, _, m in msgs)
    assert any(mdl == "empty" and s == "warning" for s, mdl, _ in msgs)


def test_tui_lazy_import_contract():
    try:
        import textual  # noqa: F401
        pytest.skip("textual installed; lazy error path not reachable")
    except ModuleNotFoundError:
        pass
    from sidemantic_spark.workbench import run_workbench

    with pytest.raises(ModuleNotFoundError, match="textual"):
        run_workbench(layer=None)
