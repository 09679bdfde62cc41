"""Jinja SQL templating + extends inheritance.

Reference behaviors: core/template.py (SQLTemplateRenderer),
core/parameter.py:156-178 (interpolate with full-Jinja path),
core/inheritance.py:11,96 (merge_model/merge_metric),
loaders.py:1205-1306 (registry-wide resolution).
"""

from __future__ import annotations

import pytest

from sidemantic_spark.core.inheritance import (
    merge_metric,
    merge_model,
    resolve_model_inheritance,
)
from sidemantic_spark.core.model import Dimension, Metric, Model, Parameter
from sidemantic_spark.core.template import is_sql_template, render_sql_template


def test_is_sql_template():
    assert is_sql_template("x = {{ v }}")
    assert is_sql_template("{% if a %}y{% endif %}")
    assert not is_sql_template("plain = 1")


def test_render_variable():
    assert render_sql_template("t = {{ t }}", {"t": 5}) == "t = 5"


def test_render_conditional_block():
    out = render_sql_template(
        "{% if active %}status = 'active'{% endif %}", {"active": True}
    )
    assert out == "status = 'active'"
    out = render_sql_template(
        "{% if active %}status = 'active'{% endif %}", {"active": False}
    )
    assert out == ""


def test_merge_model_child_wins_and_lists_merge():
    parent = Model(
        name="base_orders",
        table="orders",
        primary_key="o_orderkey",
        dimensions=[
            Dimension(name="status", sql="o_orderstatus"),
            Dimension(name="priority", sql="o_orderpriority"),
        ],
        metrics=[Metric(name="revenue", agg="sum", sql="o_totalprice")],
    )
    child = Model(
        name="big_orders",
        extends="base_orders",
        sql="SELECT * FROM orders WHERE o_totalprice > 100",
        dimensions=[Dimension(name="status", sql="upper(o_orderstatus)")],
        metrics=[Metric(name="n", agg="count")],
    )
    merged = merge_model(child, parent)
    assert merged.name == "big_orders"
    assert merged.extends is None
    assert merged.table == "orders"  # inherited
    assert merged.sql and "o_totalprice > 100" in merged.sql  # child override
    dims = {d.name: d for d in merged.dimensions}
    assert dims["status"].sql == "upper(o_orderstatus)"  # child wins by name
    assert "priority" in dims  # parent list item kept
    assert {m.name for m in merged.metrics} == {"revenue", "n"}


def test_merge_metric_filters_append():
    parent = Metric(name="revenue", agg="sum", sql="amount", filters=["x > 0"])
    child = Metric(name="us_revenue", extends="revenue", filters=["region = 'US'"])
    merged = merge_metric(child, parent)
    assert merged.agg == "sum" and merged.sql == "amount"
    assert merged.filters == ["x > 0", "region = 'US'"]


def test_resolve_chain_and_cycle():
    a = Model(name="a", table="t", primary_key="id")
    b = Model(name="b", extends="a")
    c = Model(name="c", extends="b")
    resolved = resolve_model_inheritance({"a": a, "b": b, "c": c})
    assert resolved["c"].table == "t"

    x = Model(name="x", extends="y")
    y = Model(name="y", extends="x")
    with pytest.raises(ValueError, match="cycle"):
        resolve_model_inheritance({"x": x, "y": y})


@pytest.fixture(scope="module")
def layer(spark, sf_dir):
    from sidemantic_spark.models.tpch import build_layer

    lyr = build_layer(spark, sf_dir)
    lyr.graph.add_parameter(Parameter(name="min_price", type="number", default_value=0))
    return lyr


def test_jinja_filter_compiles_and_runs(layer, duck):
    from tests.conftest import assert_df_matches_oracle

    df = layer.query(
        metrics=["orders.order_count"],
        dimensions=["orders.status"],
        filters=["{% if only_open %}orders.status = 'O'{% endif %}"],
        parameters={"only_open": True},
    )
    assert_df_matches_oracle(
        df,
        duck,
        "SELECT o_orderstatus AS status, COUNT(*) AS order_count FROM orders WHERE o_orderstatus = 'O' GROUP BY 1",
    )


def test_jinja_false_branch_drops_filter(layer):
    sql = layer.compile(
        metrics=["orders.order_count"],
        dimensions=["orders.status"],
        filters=["{% if only_open %}orders.status = 'O'{% endif %}"],
        parameters={"only_open": False},
    )
    assert "'O'" not in sql


def test_parameter_default_from_graph(layer):
    sql = layer.compile(
        metrics=["orders.order_count"],
        filters=["orders.total_price > {{ min_price }}"],
    )
    assert "> 0" in sql


def test_extends_model_queries_through_layer(spark, sf_dir):
    from sidemantic_spark.core.layer import SparkSemanticLayer

    lyr = SparkSemanticLayer(spark)
    lyr.add_model(
        Model(
            name="base_orders",
            source_uri=f"{sf_dir}/orders.parquet",
            primary_key="o_orderkey",
            dimensions=[Dimension(name="status", sql="o_orderstatus")],
            metrics=[Metric(name="order_count", agg="count")],
        )
    )
    lyr.add_model(
        Model(
            name="orders2",
            extends="base_orders",
            metrics=[Metric(name="revenue", agg="sum", sql="o_totalprice")],
        )
    )
    sql = lyr.compile(metrics=["orders2.revenue", "orders2.order_count"], dimensions=["orders2.status"])
    assert "SUM" in sql.upper() and "COUNT" in sql.upper()
    rows = lyr.query(metrics=["orders2.order_count"], dimensions=["orders2.status"]).collect()
    assert len(rows) == 3


def test_auto_dimensions_introspection(spark, sf_dir):
    """auto_dimensions=True discovers schema columns as typed dims
    (ref core/semantic_layer.py:492 _introspect_dimensions)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Metric, Model

    lyr = SparkSemanticLayer(spark)
    lyr.add_model(Model(
        name="auto_orders",
        source_uri=f"{sf_dir}/orders.parquet",
        primary_key="o_orderkey",
        auto_dimensions=True,
        metrics=[Metric(name="order_count", agg="count")],
    ))
    lyr.register_sources()
    m = lyr.graph.models["auto_orders"]
    dims = {d.name: d for d in m.dimensions}
    assert "o_orderstatus" in dims and dims["o_orderstatus"].type == "categorical"
    assert "o_totalprice" in dims and dims["o_totalprice"].type == "numeric"
    assert dims["o_orderdate"].type == "time"
    assert "o_orderkey" not in dims  # PK excluded
    rows = lyr.query(metrics=["auto_orders.order_count"],
                     dimensions=["auto_orders.o_orderstatus"]).collect()
    assert len(rows) == 3


def test_extends_preserves_non_none_parent_defaults():
    """An extends-only child must not reset parent fields whose
    dataclass defaults are non-None (primary_key='id',
    source_format='parquet'): overrides apply only when the child
    value differs from the DEFAULT, mirroring merge_metric."""
    from sidemantic_spark.core.inheritance import merge_model
    from sidemantic_spark.core.model import Metric, Model

    parent = Model(
        name="base_orders", table="orders", primary_key="order_id",
        source_format="csv",
        metrics=[Metric(name="n", agg="count")],
    )
    child = Model(name="orders_ext", extends="base_orders")
    merged = merge_model(child, parent)
    assert merged.primary_key == "order_id"
    assert merged.source_format == "csv"
    assert merged.table == "orders"
    # explicit child override still wins
    child2 = Model(name="o2", extends="base_orders", primary_key="oid")
    assert merge_model(child2, parent).primary_key == "oid"
