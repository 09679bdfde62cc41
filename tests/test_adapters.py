"""Import-adapter tests: Cube / MetricFlow / Rill / Superset.

Two layers of coverage:

1. Corpus sweep — parse every fixture file the reference ships for the
   format (``tests/fixtures/{cube,metricflow,rill,superset}``) and
   require that the vast majority import without error and produce
   models (skipped when the reference checkout is absent).
2. End-to-end — import a definition, seed a tiny Spark table, run a
   query through the full compile/execute path and check rows against
   DuckDB.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sidemantic_spark.core.layer import SparkSemanticLayer

FIXROOT = "/root/reference/tests/fixtures"

# files exercising format corners we deliberately don't map (semantic
# content is absent or the construct has no Spark-side equivalent)
SKIP_FILES = {
    "cube": {
        "custom_calendar.yml",  # calendar cubes: custom grain SQL per-dim
    },
    "metricflow": {},
    "rill": {},
    "superset": {},
}


def _fixture_files(fmt: str) -> list[str]:
    d = os.path.join(FIXROOT, fmt)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith((".yml", ".yaml")) and f not in SKIP_FILES.get(fmt, set())
    )


@pytest.mark.skipif(not os.path.isdir(FIXROOT), reason="reference fixtures unavailable")
@pytest.mark.parametrize("fmt", ["cube", "metricflow", "rill", "superset"])
def test_adapter_corpus_sweep(fmt, spark):
    from sidemantic_spark.adapters import ADAPTERS

    files = _fixture_files(fmt)
    assert files, f"no fixture files for {fmt}"
    parsed_models = 0
    failures: list[str] = []
    for path in files:
        layer = SparkSemanticLayer(spark)
        try:
            ADAPTERS[fmt]().parse_file(layer, path)
        except Exception as exc:
            failures.append(f"{os.path.basename(path)}: {exc}")
            continue
        parsed_models += len(layer.graph.models)
    # every file must parse; files without semantic content may yield 0
    assert not failures, f"{fmt}: {len(failures)}/{len(files)} failed: {failures[:5]}"
    assert parsed_models > 0, f"{fmt}: no models parsed from {len(files)} files"


def _seed_orders(spark):
    con = duckdb.connect()
    con.execute("""
        CREATE TABLE adapter_orders AS
        SELECT * FROM (VALUES
            (1, 'paid', 100, 10, TIMESTAMP '2026-01-01 10:00:00'),
            (2, 'paid', 150, 20, TIMESTAMP '2026-02-01 10:00:00'),
            (3, 'refunded', 50, 5, TIMESTAMP '2026-02-15 10:00:00')
        ) t(order_id, status, amount, cost, created_at)
    """)
    pdf = con.table("adapter_orders").arrow().to_pandas()
    spark.createDataFrame(pdf).createOrReplaceTempView("adapter_orders")
    return con


def test_cube_end_to_end(spark):
    import yaml

    from sidemantic_spark.adapters import CubeAdapter

    con = _seed_orders(spark)
    layer = SparkSemanticLayer(spark)
    CubeAdapter().parse(layer, yaml.safe_load("""
cubes:
  - name: orders
    sql_table: adapter_orders
    dimensions:
      - name: order_id
        sql: order_id
        type: number
        primary_key: true
      - name: status
        sql: "{CUBE}.status"
        type: string
      - name: created_at
        sql: created_at
        type: time
    measures:
      - name: order_count
        type: count
      - name: total_amount
        type: sum
        sql: amount
      - name: paid_amount
        type: sum
        sql: amount
        filters:
          - sql: "{CUBE}.status = 'paid'"
      - name: margin
        type: number
        sql: "total_amount - total_cost"
      - name: total_cost
        type: sum
        sql: cost
"""))
    model = layer.graph.models["orders"]
    assert model.table == "adapter_orders"
    assert model.primary_key == "order_id"
    assert model.metric("paid_amount").filters == ["orders.status = 'paid'"]

    rows = {
        (r["status"], r["order_count"], r["total_amount"], r["paid_amount"], r["margin"])
        for r in layer.query(
            metrics=["orders.order_count", "orders.total_amount",
                     "orders.paid_amount", "orders.margin"],
            dimensions=["orders.status"],
        ).collect()
    }
    assert rows == {("paid", 2, 250, 250, 220), ("refunded", 1, 50, None, 45)}
    con.close()


def test_cube_joins_and_segments(spark):
    import yaml

    from sidemantic_spark.adapters import CubeAdapter

    layer = SparkSemanticLayer(spark)
    CubeAdapter().parse(layer, yaml.safe_load("""
cubes:
  - name: line_items
    sql_table: t_line_items
    dimensions:
      - name: id
        sql: id
        type: number
        primary_key: true
    measures:
      - name: qty
        type: sum
        sql: qty
    joins:
      - name: products
        relationship: many_to_one
        sql: "{CUBE}.product_id = {products}.id"
    segments:
      - name: bulk
        sql: "{CUBE}.qty > 10"
  - name: products
    sql_table: t_products
    dimensions:
      - name: id
        sql: id
        type: number
        primary_key: true
      - name: category
        sql: category
        type: string
"""))
    li = layer.graph.models["line_items"]
    assert li.relationships[0].foreign_key == "product_id"
    assert li.relationships[0].primary_key == "id"
    assert li.segment("bulk").sql == "{model}.qty > 10"
    sql = layer.compile(metrics=["line_items.qty"],
                        dimensions=["products.category"])
    assert "JOIN" in sql


def test_metricflow_end_to_end(spark):
    import yaml

    from sidemantic_spark.adapters import MetricFlowAdapter

    con = _seed_orders(spark)
    layer = SparkSemanticLayer(spark)
    MetricFlowAdapter().parse(layer, yaml.safe_load("""
semantic_models:
  - name: orders
    model: ref('adapter_orders')
    entities:
      - name: order
        type: primary
        expr: order_id
    dimensions:
      - name: status
        type: categorical
      - name: created_at
        type: time
        type_params:
          time_granularity: day
    measures:
      - name: revenue
        agg: sum
        expr: amount
      - name: order_count
        agg: count
        expr: order_id
metrics:
  - name: aov
    type: ratio
    type_params:
      numerator: revenue
      denominator: order_count
"""))
    assert layer.graph.models["orders"].table == "adapter_orders"
    assert "aov" in layer.graph.metrics
    rows = layer.query(metrics=["aov"], dimensions=["orders.status"]).collect()
    got = {(r["status"], round(r["aov"], 2)) for r in rows}
    assert got == {("paid", 125.0), ("refunded", 50.0)}
    con.close()


def test_rill_and_superset_import(spark):
    import yaml

    from sidemantic_spark.adapters import RillAdapter, SupersetAdapter

    con = _seed_orders(spark)
    layer = SparkSemanticLayer(spark)
    RillAdapter().parse(layer, yaml.safe_load("""
type: metrics_view
model: adapter_orders
timeseries: created_at
dimensions:
  - name: status
    column: status
measures:
  - name: total_amount
    expression: SUM(amount)
  - name: order_share
    expression: SUM(amount) / 400.0
"""))
    m = layer.graph.models["adapter_orders"]
    assert m.metric("total_amount").agg == "sum"
    assert m.metric("order_share").type == "derived"

    layer2 = SparkSemanticLayer(spark)
    SupersetAdapter().parse(layer2, yaml.safe_load("""
table_name: adapter_orders
main_dttm_col: created_at
columns:
  - column_name: status
    type: VARCHAR
  - column_name: amount
    type: INTEGER
metrics:
  - metric_name: count
    expression: COUNT(*)
  - metric_name: total_amount
    expression: SUM(amount)
"""))
    m2 = layer2.graph.models["adapter_orders"]
    assert m2.metric("count").agg == "count"
    assert m2.dimension("created_at").type == "time"
    # default_time_dimension auto-include (reference behavior)
    sql = layer2.compile(metrics=["adapter_orders.total_amount"])
    assert "DATE_TRUNC" in sql
    con.close()
