"""Postgres catalog metadata export — mirrors the reference's
``tests/test_catalog.py`` (round-9 mining): models export as tables,
dimensions AND metrics as columns (the Cube SQL-API convention), with
pk/fk constraints, referenced-table mapping, type mappings, ordinal
positions and description/label metadata.  Pure graph-level — no Spark
session needed."""

from __future__ import annotations

from sidemantic_spark.core.graph import SemanticGraph
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship
from sidemantic_spark.server.catalog import get_catalog_metadata


def _graph(*models: Model) -> SemanticGraph:
    g = SemanticGraph()
    for m in models:
        g.add_model(m)
    return g


def test_basic_catalog_metadata():
    g = _graph(
        Model(
            name="orders", table="orders", primary_key="id",
            relationships=[Relationship(
                name="customers", type="many_to_one", foreign_key="customer_id"
            )],
            dimensions=[
                Dimension(name="status", type="categorical"),
                Dimension(name="order_date", type="time", granularity="day"),
            ],
            metrics=[
                Metric(name="revenue", agg="sum", sql="amount"),
                Metric(name="order_count", agg="count"),
            ],
        ),
        Model(
            name="customers", table="customers", primary_key="id",
            dimensions=[
                Dimension(name="name"), Dimension(name="region"),
            ],
            metrics=[Metric(name="customer_count", agg="count")],
        ),
    )
    cat = get_catalog_metadata(g)
    assert {t["table_name"] for t in cat["tables"]} == {"orders", "customers"}
    orders_table = next(t for t in cat["tables"] if t["table_name"] == "orders")
    assert orders_table["table_schema"] == "public"
    assert orders_table["table_type"] == "BASE TABLE"
    assert orders_table["is_insertable_into"] == "NO"

    cols = {c["column_name"]: c
            for c in cat["columns"] if c["table_name"] == "orders"}
    assert set(cols) == {"id", "status", "order_date", "revenue", "order_count"}
    assert cols["id"]["is_primary_key"] is True
    assert cols["id"]["is_nullable"] == "NO"
    assert cols["id"]["data_type"] == "BIGINT"
    assert cols["status"]["data_type"] == "VARCHAR"
    assert cols["status"]["is_metric"] is False
    assert cols["order_date"]["data_type"] == "DATE"  # day grain -> DATE
    assert cols["revenue"]["data_type"] == "NUMERIC"
    assert cols["revenue"]["is_metric"] is True
    assert cols["order_count"]["data_type"] == "BIGINT"  # count -> BIGINT


def test_foreign_key_constraints():
    g = _graph(
        Model(
            name="orders", table="orders", primary_key="id",
            relationships=[Relationship(
                name="customers", type="many_to_one", foreign_key="customer_id"
            )],
            dimensions=[Dimension(name="customer_id", type="numeric")],
        ),
        Model(name="customers", table="customers", primary_key="id"),
    )
    cat = get_catalog_metadata(g)
    fks = [c for c in cat["constraints"]
           if c["constraint_type"] == "FOREIGN KEY"]
    assert len(fks) == 1
    assert fks[0]["table_name"] == "orders"
    assert "customers_fkey" in fks[0]["constraint_name"]

    fk_usage = [k for k in cat["key_column_usage"]
                if "fkey" in k["constraint_name"]]
    assert len(fk_usage) == 1
    assert fk_usage[0]["column_name"] == "customer_id"
    assert fk_usage[0]["referenced_table_name"] == "customers"
    assert fk_usage[0]["referenced_column_name"] == "id"

    cust_id = next(c for c in cat["columns"]
                   if c["table_name"] == "orders"
                   and c["column_name"] == "customer_id")
    assert cust_id["is_foreign_key"] is True


def test_type_mappings():
    g = _graph(Model(
        name="t", table="t", primary_key="id",
        dimensions=[
            Dimension(name="cat_field", type="categorical"),
            Dimension(name="num_field", type="numeric"),
            Dimension(name="bool_field", type="boolean"),
            Dimension(name="date_field", type="time", granularity="day"),
            Dimension(name="ts_field", type="time", granularity="hour"),
        ],
        metrics=[
            Metric(name="sum_m", agg="sum", sql="v"),
            Metric(name="avg_m", agg="avg", sql="v"),
            Metric(name="count_m", agg="count"),
            Metric(name="cd_m", agg="count_distinct", sql="u"),
            Metric(name="min_m", agg="min", sql="v"),
            Metric(name="max_m", agg="max", sql="v"),
        ],
    ))
    cols = {c["column_name"]: c["data_type"]
            for c in get_catalog_metadata(g)["columns"]}
    assert cols["cat_field"] == "VARCHAR"
    assert cols["num_field"] == "NUMERIC"
    assert cols["bool_field"] == "BOOLEAN"
    assert cols["date_field"] == "DATE"
    assert cols["ts_field"] == "TIMESTAMP"
    assert cols["sum_m"] == "NUMERIC"
    assert cols["avg_m"] == "NUMERIC"
    assert cols["count_m"] == "BIGINT"
    assert cols["cd_m"] == "BIGINT"
    assert cols["min_m"] == "NUMERIC"
    assert cols["max_m"] == "NUMERIC"


def test_custom_schema():
    g = _graph(Model(name="t", table="t", primary_key="id"))
    cat = get_catalog_metadata(g, schema="analytics")
    assert cat["tables"][0]["table_schema"] == "analytics"
    assert cat["columns"][0]["table_schema"] == "analytics"


def test_ordinal_positions():
    g = _graph(Model(
        name="t", table="t", primary_key="id",
        dimensions=[Dimension(name="dim1"), Dimension(name="dim2")],
        metrics=[Metric(name="metric1", agg="sum", sql="m1"),
                 Metric(name="metric2", agg="count")],
    ))
    cols = sorted(get_catalog_metadata(g)["columns"],
                  key=lambda c: c["ordinal_position"])
    assert [c["column_name"] for c in cols] == [
        "id", "dim1", "dim2", "metric1", "metric2"]
    assert [c["ordinal_position"] for c in cols] == [1, 2, 3, 4, 5]


def test_metadata_fields():
    g = _graph(Model(
        name="t", table="t", primary_key="id",
        dimensions=[Dimension(name="status", description="Order status",
                              label="Status")],
        metrics=[Metric(name="revenue", agg="sum", sql="amount",
                        description="Total revenue", label="Revenue (USD)")],
    ))
    cols = {c["column_name"]: c for c in get_catalog_metadata(g)["columns"]}
    assert cols["status"]["description"] == "Order status"
    assert cols["status"]["label"] == "Status"
    assert cols["revenue"]["description"] == "Total revenue"
    assert cols["revenue"]["label"] == "Revenue (USD)"


def test_layer_delegate(spark):
    """layer.get_catalog_metadata mirrors the reference surface."""
    from sidemantic_spark.core.layer import SparkSemanticLayer

    lyr = SparkSemanticLayer(spark)
    lyr.add_model(Model(name="t", table="t", primary_key="id"))
    cat = lyr.get_catalog_metadata(schema="s2")
    assert cat["tables"][0]["table_schema"] == "s2"
