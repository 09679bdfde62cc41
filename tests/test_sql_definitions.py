"""Semantic-SQL DDL authoring surface, mined from the reference's
``tests/core/test_sql_definitions.py``: the full METRIC field set,
list literals, SEGMENT `expression`, PRE_AGGREGATION and PARAMETER
statements, graph-level metrics, and the compact table-block form
(default time, inline segments, one/many joins with composite keys,
derived metrics declared before their bases). Driver-side only."""

from __future__ import annotations

from sidemantic_spark.authoring.sql_defs import load_sql_definitions
from sidemantic_spark.core.graph import SemanticGraph


class _BareLayer:
    def __init__(self) -> None:
        self.graph = SemanticGraph()

    def add_model(self, m):
        self.graph.add_model(m)

    def add_metric(self, m):
        self.graph.add_metric(m)


def _load(text: str) -> _BareLayer:
    layer = _BareLayer()
    load_sql_definitions(layer, text)
    return layer


def test_metric_all_fields():
    layer = _load("""
MODEL (name orders, table orders, primary_key id);
METRIC (name revenue, agg sum, sql amount, description 'Total revenue',
        label 'Revenue', format '$#,##0.00', filters status = 'completed',
        fill_nulls_with 0, non_additive_dimension time);
""")
    m = layer.graph.models["orders"].metric("revenue")
    assert m.label == "Revenue"
    assert m.format == "$#,##0.00"
    assert m.filters == ["status = 'completed'"]
    assert m.fill_nulls_with == 0
    assert m.non_additive_dimension == "time"


def test_metric_window_and_comparison_fields():
    layer = _load("""
MODEL (name orders, table orders, primary_key id);
METRIC (name rt, type cumulative, sql revenue, window 7 days);
METRIC (name yoy, type time_comparison, base_metric revenue,
        comparison_type yoy, calculation percent_change);
METRIC (name s2p, type conversion, entity user_id,
        base_event event_type = 'signup',
        conversion_event event_type = 'purchase',
        conversion_window 30 days);
""")
    o = layer.graph.models["orders"]
    assert o.metric("rt").window == "7 days"
    assert o.metric("yoy").base_metric == "revenue"
    assert o.metric("yoy").comparison_type == "yoy"
    assert o.metric("s2p").base_event == "event_type = 'signup'"
    assert o.metric("s2p").conversion_window == "30 days"


def test_list_literals():
    layer = _load("""
MODEL (name orders, table orders, primary_key id);
METRIC (name revenue, agg sum, sql amount,
        filters ['status = completed', 'status = pending'],
        drill_fields [order_id, status]);
""")
    m = layer.graph.models["orders"].metric("revenue")
    assert m.filters == ["status = completed", "status = pending"]
    assert m.drill_fields == ["order_id", "status"]


def test_segment_expression_key():
    layer = _load("""
MODEL (name orders, table orders, primary_key id);
SEGMENT (name active, expression status = 'active', description 'Active');
""")
    seg = layer.graph.models["orders"].segments[0]
    assert seg.sql == "status = 'active'"
    assert seg.description == "Active"


def test_pre_aggregation_statement():
    layer = _load("""
MODEL (name orders, table orders, primary_key id);
PRE_AGGREGATION (name daily_rollup, measures [order_count, revenue],
    dimensions [status], time_dimension order_date, granularity day,
    partition_granularity month, scheduled_refresh false,
    refresh_key { every '1 hour', incremental true, update_window '7 day' },
    indexes [{ name idx_status, columns [status], type regular }]);
""")
    pa = layer.graph.models["orders"].pre_aggregations[0]
    assert pa.name == "daily_rollup"
    assert pa.measures == ["order_count", "revenue"]
    assert pa.dimensions == ["status"]
    assert pa.granularity == "day"
    assert pa.partition_granularity == "month"
    assert pa.scheduled_refresh is False
    assert pa.refresh_key.every == "1 hour"
    assert pa.refresh_key.incremental is True
    assert pa.refresh_key.update_window == "7 day"
    assert pa.bucket_by == ["status"]  # reference indexes -> bucketed layout


def test_parameter_statement():
    layer = _load("""
PARAMETER (name region, type string, allowed_values [us, eu],
           default_value 'us');
""")
    p = layer.graph.parameters["region"]
    assert p.type == "string"
    assert p.allowed_values == ["us", "eu"]
    assert p.default_value == "us"


def test_graph_level_metric_without_model():
    layer = _load("METRIC (name total_rev, agg sum, sql orders.amount);")
    assert layer.graph.metrics["total_rev"].sql == "orders.amount"


def test_table_block_full_surface():
    layer = _load("""
model orders from orders (
  primary key (order_id)
  default time order_date grain day

  status
  date_trunc('day', created_at) as order_date : time grain day
  status = 'completed' as is_complete : boolean
  amount - discount as net_amount : numeric

  segment completed as status = 'completed'

  join one customers on customer_id = customers.id
  join many order_items on order_id = order_items.order_id and store_id = order_items.store_id

  revenue / order_count as average_order_value
  sum(amount) as revenue
  count(*) as order_count
)
""")
    m = layer.graph.models["orders"]
    assert m.primary_key == "order_id"
    assert m.default_time_dimension == "order_date"
    assert m.default_grain == "day"
    dims = {d.name: d for d in m.dimensions}
    assert dims["order_date"].sql == "date_trunc('day', created_at)"
    assert dims["order_date"].granularity == "day"
    assert dims["is_complete"].type == "boolean"
    assert dims["net_amount"].sql == "amount - discount"
    rels = {r.name: r for r in m.relationships}
    assert rels["customers"].type == "many_to_one"
    assert rels["customers"].foreign_key == "customer_id"
    assert rels["order_items"].type == "one_to_many"
    assert rels["order_items"].foreign_key == ["order_id", "store_id"]
    mets = {x.name: x for x in m.metrics}
    assert mets["revenue"].agg == "sum"
    assert mets["order_count"].agg == "count"
    # derived metric declared BEFORE its bases still resolves
    assert mets["average_order_value"].type == "derived"
    assert mets["average_order_value"].sql == "revenue / order_count"
    assert m.segments[0].name == "completed"


def test_property_aliases_resolve(spark):
    """Long-form spellings map to canonical fields: aggregation -> agg,
    expression -> sql, filter -> filters (ref core/dialect.py:24
    PROPERTY_ALIASES, tests/core/test_dialect_parsing.py)."""
    from sidemantic_spark.authoring.sql_defs import load_sql_definitions
    from sidemantic_spark.core.layer import SparkSemanticLayer

    layer = SparkSemanticLayer(spark)
    load_sql_definitions(layer, """
MODEL (name alias_m, table t1, primary_key id);
METRIC (name orders_count, aggregation count);
METRIC (name rev, aggregation sum, expression amount);
DIMENSION (name d1, expression upper(region));
""")
    m = layer.graph.models["alias_m"]
    assert m.metric("orders_count").agg == "count"
    assert m.metric("rev").agg == "sum" and m.metric("rev").sql == "amount"
    assert m.dimension("d1").sql == "upper(region)"
