"""Schema-introspected dimensions (``auto_dimensions=True``) — mirrors
the reference's ``tests/core/test_auto_dimensions.py`` (round-9
mining): all non-PK columns become typed dimensions, explicit
definitions win, complex columns are skipped, and introspection runs
once."""

from __future__ import annotations

import pytest

from sidemantic_spark.core.layer import SparkSemanticLayer
from sidemantic_spark.core.model import Dimension, Metric, Model


@pytest.fixture()
def auto_layer(spark):
    spark.sql(
        "SELECT * FROM VALUES "
        "(1, 10, 'paid',   100.5, false, TIMESTAMP'2024-01-01 10:00:00', DATE'2024-01-01'),"
        "(2, 11, 'refund', 50.25, true,  TIMESTAMP'2024-01-02 11:00:00', DATE'2024-01-02') "
        "AS t(order_id, customer_id, status, amount, is_returned, created_at, order_date)"
    ).createOrReplaceTempView("auto_orders")
    return SparkSemanticLayer(spark)


def _introspected(layer, **kwargs) -> Model:
    model = Model(auto_dimensions=True, **kwargs)
    layer.add_model(model)
    layer.register_sources()  # introspection point
    return model


def test_auto_dimensions_from_table(auto_layer):
    m = _introspected(
        auto_layer, name="orders", table="auto_orders", primary_key="order_id",
        metrics=[Metric(name="revenue", sql="SUM(amount)")],
    )
    dims = {d.name for d in m.dimensions}
    assert {"customer_id", "status", "amount", "is_returned",
            "created_at", "order_date"} <= dims
    assert "order_id" not in dims  # PK excluded


def test_auto_dimensions_type_mapping(auto_layer):
    m = _introspected(
        auto_layer, name="orders", table="auto_orders", primary_key="order_id",
    )
    by = {d.name: d for d in m.dimensions}
    assert by["status"].type == "categorical"
    assert by["amount"].type == "numeric"
    assert by["is_returned"].type == "boolean"
    assert by["created_at"].type == "time"
    assert by["created_at"].granularity == "second"
    assert by["order_date"].type == "time"
    assert by["order_date"].granularity == "day"


def test_explicit_dimensions_take_precedence(auto_layer):
    m = _introspected(
        auto_layer, name="orders", table="auto_orders", primary_key="order_id",
        dimensions=[Dimension(name="status", type="categorical",
                              label="Custom Status")],
    )
    status = next(d for d in m.dimensions if d.name == "status")
    assert status.label == "Custom Status"  # explicit wins
    assert sum(1 for d in m.dimensions if d.name == "status") == 1
    assert any(d.name == "amount" for d in m.dimensions)  # gaps filled


def test_auto_dimensions_default_is_false(auto_layer):
    m = Model(name="orders", table="auto_orders", primary_key="order_id")
    auto_layer.add_model(m)
    auto_layer.register_sources()
    assert m.dimensions == []


def test_auto_dimensions_sql_model(auto_layer):
    m = _introspected(
        auto_layer, name="paid_orders", primary_key="order_id",
        sql="SELECT order_id, status, amount FROM auto_orders "
            "WHERE status = 'paid'",
    )
    dims = {d.name for d in m.dimensions}
    assert dims == {"status", "amount"}


def test_auto_dimensions_composite_pk(auto_layer):
    m = _introspected(
        auto_layer, name="orders", table="auto_orders",
        primary_key=["order_id", "customer_id"],
    )
    dims = {d.name for d in m.dimensions}
    assert "order_id" not in dims and "customer_id" not in dims
    assert "status" in dims


def test_auto_dimensions_query_works(auto_layer):
    _introspected(
        auto_layer, name="orders", table="auto_orders", primary_key="order_id",
        metrics=[Metric(name="revenue", agg="sum", sql="amount")],
    )
    rows = auto_layer.query(
        metrics=["orders.revenue"], dimensions=["orders.status"],
        order_by=["status"],
    ).collect()
    assert [(r["status"], float(r["revenue"])) for r in rows] == [
        ("paid", 100.5), ("refund", 50.25)]


def test_auto_dimensions_time_granularity_query(auto_layer):
    _introspected(
        auto_layer, name="orders", table="auto_orders", primary_key="order_id",
        metrics=[Metric(name="order_count", agg="count")],
    )
    rows = auto_layer.query(
        metrics=["orders.order_count"],
        dimensions=["orders.order_date__month"],
    ).collect()
    assert len(rows) == 1 and rows[0]["order_count"] == 2


def test_auto_dimensions_idempotent(auto_layer):
    m = _introspected(
        auto_layer, name="orders", table="auto_orders", primary_key="order_id",
    )
    n = len(m.dimensions)
    auto_layer.register_sources()  # second pass must not duplicate
    assert len(m.dimensions) == n
    assert m.auto_dimensions is False  # introspect once


def test_auto_dimensions_complex_columns_skipped(spark):
    spark.sql(
        "SELECT 1 AS id, array(1, 2) AS tags, named_struct('a', 1) AS meta, "
        "'x' AS status"
    ).createOrReplaceTempView("auto_complex")
    lyr = SparkSemanticLayer(spark)
    m = _introspected(lyr, name="c", table="auto_complex", primary_key="id")
    dims = {d.name for d in m.dimensions}
    assert dims == {"status"}  # array/struct columns are not dimensions
