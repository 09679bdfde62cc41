"""Ported reference SQL-rewriter suite (r11 VERDICT ask #3).

Source: reference ``tests/queries/test_sql_rewriter.py`` — 94 test
functions over a two-model orders/customers fixture with pinned values
(revenue total 450, completed 250, pending 200). Every test below cites
its reference line and asserts the reference's expected VALUES against
the same data loaded as Spark temp views (``rw_orders`` etc. — the
reference mutates its DuckDB tables mid-test; immutable views with
pre-built variants ``rw_orders4``/``rw_orders_feb`` replay those).

Rule mapping (reference QueryRewriter -> this engine's
SemanticSqlRewriter):
- rewrite entry: ``QueryRewriter(graph).rewrite(sql)`` ->
  ``layer.rewrite(sql)``; execution ``layer.sql(sql)`` both sides.
- sqlglot AST pass -> text-based island/wrapper rewrite
  (``sql/rewriter.py``); same observable contract.
- post_process: reference hoists inner CTEs to the top level; Spark
  scopes WITH inside derived tables, so this engine substitutes the
  whole compiled query into ``{inner}`` (same observable results,
  including the CTE-name-collision cases).

Documented divergences (each noted at its test):
- ``strict=False`` transport passthrough lives in the pgwire/transport
  layer here, not as a rewrite() flag
  (tests/test_pgwire.py + core/transport_security.py) — the reference's
  non-strict passthrough cases port against that surface.
- granularity suffix on a non-time dimension: the reference silently
  ignores it; this engine rejects at compile time (r11, beats the
  reference's runtime CAST failure).
- error types: the reference raises ValueError; this engine raises
  QueryCompileError (both with naming messages).
- ``test_filter_on_multiple_joined_tables`` is a no-op in the reference
  itself (early ``return`` at ref :1213) — ported as the working
  concept it describes.
"""

from __future__ import annotations

import pytest

from sidemantic_spark.core.layer import SparkSemanticLayer
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship
from sidemantic_spark.sql.generator import QueryCompileError

_RW_READY = False


def _rows(df):
    return [r.asDict() for r in df.collect()]


def _columns(df):
    return list(df.columns)


@pytest.fixture()
def rw_db(spark):
    """The reference fixture data (ref :22-91) as immutable temp views,
    plus the mid-test table mutations pre-built as separate views."""
    global _RW_READY
    if not _RW_READY:
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW rw_orders AS SELECT * FROM VALUES
            (1,1,'completed',DATE'2024-01-01',CAST(100.00 AS DECIMAL(10,2))),
            (2,1,'completed',DATE'2024-01-02',CAST(150.00 AS DECIMAL(10,2))),
            (3,2,'pending',DATE'2024-01-03',CAST(200.00 AS DECIMAL(10,2)))
            AS t(id,customer_id,status,order_date,amount)"""
        )
        # ref :298/:315 INSERT the orphan row (4, 999, ...) mid-test
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW rw_orders4 AS
            SELECT * FROM rw_orders UNION ALL SELECT
            4,999,'orphaned',DATE'2024-01-04',CAST(50.00 AS DECIMAL(10,2))"""
        )
        # ref :1288 INSERTs two February rows mid-test
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW rw_orders_feb AS
            SELECT * FROM rw_orders UNION ALL SELECT * FROM VALUES
            (4,1,'completed',DATE'2024-02-01',CAST(300.00 AS DECIMAL(10,2))),
            (5,2,'completed',DATE'2024-02-15',CAST(400.00 AS DECIMAL(10,2)))
            AS t(id,customer_id,status,order_date,amount)"""
        )
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW rw_customers AS SELECT * FROM VALUES
            (1,'US','premium'),(2,'EU','standard') AS t(id,region,tier)"""
        )
        # ref :861 regions lookup
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW rw_regions AS SELECT * FROM VALUES
            ('US','North America'),('EU','Europe') AS t(region,continent)"""
        )
        # ref :1007 status_codes lookup
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW rw_status_codes AS SELECT * FROM VALUES
            ('completed','Complete'),('pending','Pending') AS t(code,label)"""
        )
        # ref :1539 targets lookup
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW rw_targets AS SELECT * FROM VALUES
            ('completed',200),('pending',150) AS t(status,target)"""
        )
        _RW_READY = True
    return spark


def _orders_model(table: str = "rw_orders") -> Model:
    return Model(
        name="orders",
        table=table,
        primary_key="id",
        dimensions=[
            Dimension(name="status", type="categorical", sql="status"),
            Dimension(name="order_date", type="time", sql="order_date",
                      granularity="day"),
        ],
        metrics=[
            Metric(name="revenue", agg="sum", sql="amount"),
            Metric(name="count", agg="count"),
        ],
        relationships=[
            Relationship(name="customers", type="many_to_one",
                         foreign_key="customer_id")
        ],
    )


def _customers_model() -> Model:
    return Model(
        name="customers",
        table="rw_customers",
        primary_key="id",
        dimensions=[
            Dimension(name="region", type="categorical", sql="region"),
            Dimension(name="tier", type="categorical", sql="tier"),
        ],
        metrics=[Metric(name="count", agg="count")],
        relationships=[
            Relationship(name="orders", type="one_to_many",
                         foreign_key="customer_id")
        ],
    )


def _mk_layer(spark, orders_table: str = "rw_orders") -> SparkSemanticLayer:
    layer = SparkSemanticLayer(spark)
    layer.add_model(_orders_model(orders_table))
    layer.add_model(_customers_model())
    return layer


@pytest.fixture()
def rw_layer(rw_db):
    return _mk_layer(rw_db)


# ---------------------------------------------------------------------------
# Basics (ref :94-248)
# ---------------------------------------------------------------------------


def test_simple_metric_query(rw_layer):
    """ref :94."""
    rows = _rows(rw_layer.sql("SELECT orders.revenue FROM orders"))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 450.00


def test_metric_with_dimension(rw_layer):
    """ref :105."""
    rows = _rows(rw_layer.sql("SELECT orders.revenue, orders.status FROM orders"))
    assert len(rows) == 2
    completed = [row for row in rows if row["status"] == "completed"]
    assert float(completed[0]["revenue"]) == 250.00


def test_metric_with_filter(rw_layer):
    """ref :117."""
    rows = _rows(rw_layer.sql(
        "SELECT orders.revenue FROM orders WHERE orders.status = 'completed'"
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


def test_rewrite_not_equal_relative_date(rw_layer):
    """ref :128 — != against a relative date converts, never passes raw."""
    rewritten = rw_layer.rewrite(
        "SELECT orders.revenue FROM orders WHERE orders.order_date != 'today'"
    )
    assert "'today'" not in rewritten


def test_rewrite_less_than_relative_date(rw_layer):
    """ref :137."""
    rewritten = rw_layer.rewrite(
        "SELECT orders.revenue FROM orders WHERE orders.order_date < 'this month'"
    )
    assert "'this month'" not in rewritten


def test_multiple_filters(rw_layer):
    """ref :146."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue FROM orders
           WHERE orders.status = 'completed'
           AND orders.order_date >= '2024-01-01'"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


def test_order_by(rw_layer):
    """ref :162."""
    rows = _rows(rw_layer.sql(
        "SELECT orders.revenue, orders.status FROM orders ORDER BY orders.status DESC"
    ))
    assert [row["status"] for row in rows] == ["pending", "completed"]


def test_limit(rw_layer):
    """ref :173."""
    rows = _rows(rw_layer.sql(
        "SELECT orders.revenue, orders.status FROM orders LIMIT 1"
    ))
    assert len(rows) == 1


def test_zero_limit_and_offset_are_preserved(rw_layer):
    """ref :183 — explicit zero pagination survives the rewrite."""
    sql = ("SELECT orders.revenue, orders.status FROM orders "
           "ORDER BY orders.status LIMIT 0 OFFSET 0")
    rewritten = rw_layer.rewrite(sql)
    assert "LIMIT 0" in rewritten
    assert _rows(rw_layer.sql(sql)) == []


def test_join_query(rw_layer):
    """ref :196 — implicit join via qualified refs."""
    rows = _rows(rw_layer.sql(
        "SELECT orders.revenue, customers.region FROM orders"
    ))
    assert len(rows) == 2
    assert {row["region"] for row in rows} == {"US", "EU"}


def test_join_with_filter(rw_layer):
    """ref :207."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue, customers.region FROM orders
           WHERE customers.region = 'US'"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00
    assert rows[0]["region"] == "US"


def test_invalid_field(rw_layer):
    """ref :223 — DIVERGENCE: QueryCompileError (naming the field), the
    reference raises ValueError 'not found'."""
    with pytest.raises(QueryCompileError, match="invalid_field"):
        rw_layer.sql("SELECT orders.invalid_field FROM orders")


def test_missing_table_prefix(rw_layer):
    """ref :231 — bare columns infer the model from the FROM clause."""
    rows = _rows(rw_layer.sql("SELECT revenue FROM orders"))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 450.00


def test_ad_hoc_count_aggregation(rw_layer):
    """ref :241 — COUNT(*) without a predefined metric."""
    rows = _rows(rw_layer.sql("SELECT COUNT(*) AS count FROM orders"))
    assert rows[0]["count"] == 3


# ---------------------------------------------------------------------------
# Explicit JOIN validation (ref :251-386)
# ---------------------------------------------------------------------------


def test_explicit_join_matching_relationship_supported(rw_layer):
    """ref :251."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue, customers.region FROM orders
           JOIN customers ON orders.customer_id = customers.id"""
    ))
    assert len(rows) == 2
    assert {row["region"] for row in rows} == {"US", "EU"}


def test_explicit_join_with_aliases_supported(rw_layer):
    """ref :266."""
    rows = _rows(rw_layer.sql(
        """SELECT o.revenue, c.region FROM orders AS o
           JOIN customers AS c ON o.customer_id = c.id"""
    ))
    assert len(rows) == 2
    assert {row["region"] for row in rows} == {"US", "EU"}


def test_explicit_join_accepts_parenthesized_on_clause(rw_layer):
    """ref :281."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue, customers.region FROM orders
           JOIN customers ON (orders.customer_id = customers.id)"""
    ))
    assert len(rows) == 2
    assert {row["region"] for row in rows} == {"US", "EU"}


def test_explicit_inner_join_preserves_existence_filter(rw_db):
    """ref :296 — with an orphaned order (customer 999), INNER JOIN
    keeps join-existence semantics: 450, not 500."""
    layer = _mk_layer(rw_db, orders_table="rw_orders4")
    rows = _rows(layer.sql(
        """SELECT orders.revenue FROM orders
           JOIN customers ON orders.customer_id = customers.id"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 450.00


def test_explicit_left_join_preserves_base_rows(rw_db):
    """ref :313 — LEFT JOIN adds no existence filter: 500."""
    layer = _mk_layer(rw_db, orders_table="rw_orders4")
    rows = _rows(layer.sql(
        """SELECT orders.revenue FROM orders
           LEFT JOIN customers ON orders.customer_id = customers.id"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 500.00


def test_explicit_join_rejects_unsupported_join_type(rw_layer):
    """ref :330 — RIGHT JOIN on semantic roots fails clearly."""
    with pytest.raises(Exception, match="INNER and LEFT|RIGHT"):
        rw_layer.sql(
            """SELECT orders.revenue FROM orders
               RIGHT JOIN customers ON orders.customer_id = customers.id"""
        )


def test_explicit_join_requires_complete_composite_relationship(rw_db):
    """ref :342 — explicit JOINs must include every composite key."""
    layer = SparkSemanticLayer(rw_db)
    layer.add_model(Model(
        name="corders",
        table="rw_orders",
        primary_key=["id", "customer_id"],
        dimensions=[Dimension(name="status", type="categorical", sql="status")],
        metrics=[Metric(name="revenue", agg="sum", sql="amount")],
        relationships=[Relationship(
            name="citems", type="one_to_many",
            foreign_key=["order_id", "store_id"],
            primary_key=["id", "customer_id"],
        )],
    ))
    layer.add_model(Model(
        name="citems",
        table="rw_orders",
        primary_key=["order_id", "store_id"],
        dimensions=[Dimension(name="sku", type="categorical", sql="status")],
        metrics=[Metric(name="count", agg="count")],
    ))
    incomplete = """
        SELECT corders.revenue, citems.sku FROM corders
        JOIN citems ON corders.id = citems.order_id
    """
    with pytest.raises(Exception, match="relationship|composite|key"):
        layer.rewrite(incomplete)
    complete = """
        SELECT corders.revenue, citems.sku FROM corders
        JOIN citems ON corders.id = citems.order_id
            AND corders.customer_id = citems.store_id
    """
    assert "citems" in layer.rewrite(complete)


def test_rewriter_directly(rw_layer):
    """ref :388 — the rewritten text carries the semantic structure and
    the pushed-down filter."""
    rewritten = rw_layer.rewrite(
        "SELECT orders.revenue, orders.status FROM orders "
        "WHERE orders.status = 'completed'"
    )
    assert "orders_cte AS" in rewritten
    assert "SUM(orders_cte.revenue_raw) AS revenue" in rewritten
    assert "status = 'completed'" in rewritten


def test_dimension_only_query(rw_layer):
    """ref :412."""
    rows = _rows(rw_layer.sql("SELECT orders.status FROM orders"))
    assert len(rows) == 2
    assert {row["status"] for row in rows} == {"completed", "pending"}


def test_rewriter_invalid_sql(rw_layer):
    """ref :423 — invalid SQL raises, never silently passes."""
    with pytest.raises(Exception):
        rw_layer.sql("SELECT FROM WHERE")


def test_rewriter_non_select_query(rw_layer):
    """ref :440 — INSERT/UPDATE/DELETE against semantic models are
    refused (INSERT ... SELECT over semantic SQL is the one DML form the
    gateway compiles; bare VALUES/UPDATE/DELETE never execute)."""
    for stmt in (
        "UPDATE orders SET status = 'completed'",
        "DELETE FROM orders",
    ):
        with pytest.raises(Exception):
            rw_layer.sql(stmt)


def test_rewriter_non_strict_mode():
    """ref :465 — DIVERGENCE: passthrough of system/non-semantic SQL is
    the transport layer's job here, not a rewrite() flag. The pgwire
    server answers SELECT VERSION()/SHOW/SET itself
    (tests/test_pgwire.py) and the transport gate passes non-semantic
    sources through when no security controls are active
    (core/transport_security.py: controls_are_active). This test pins
    the gate half: unrecognized sources survive untouched when open,
    and are refused when controls are active
    (tests/test_governance.py::test_transport_security_fail_closed)."""
    from sidemantic_spark.core.transport_security import unrecognized_sources

    class _G:
        models = {"orders": None}

    class _L:
        graph = _G()

    assert unrecognized_sources(
        "SELECT * FROM pg_catalog.pg_namespace", _L()
    ) == ["pg_catalog.pg_namespace"]
    assert unrecognized_sources("SELECT o.x FROM orders o", _L()) == []


def test_rewriter_or_filters(rw_layer):
    """ref :506."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue FROM orders
           WHERE orders.status = 'completed' OR orders.status = 'pending'"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 450.00


def test_rewriter_in_filter(rw_layer):
    """ref :522."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue FROM orders
           WHERE orders.status IN ('completed', 'pending')"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 450.00


def test_rewriter_having_clause(rw_layer):
    """ref :537 — HAVING on the aggregated metric."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue, orders.status FROM orders
           HAVING orders.revenue > 150"""
    ))
    assert len(rows) == 2


def test_rewriter_distinct(rw_layer):
    """ref :553."""
    rows = _rows(rw_layer.sql("SELECT DISTINCT orders.status FROM orders"))
    assert len(rows) == 2
    assert {row["status"] for row in rows} == {"completed", "pending"}


def test_select_star_expansion(rw_layer):
    """ref :564 — SELECT * expands to all model fields."""
    df = rw_layer.sql("SELECT * FROM orders")
    columns = _columns(df)
    assert "status" in columns
    assert any(c.startswith("order_date") for c in columns)
    assert "revenue" in columns
    assert "count" in columns


def test_select_star_without_from(rw_layer):
    """ref :579."""
    with pytest.raises(Exception, match="FROM"):
        rw_layer.rewrite("SELECT *")


def test_column_alias(rw_layer):
    """ref :598 — aliases rename the output columns."""
    df = rw_layer.sql(
        "SELECT orders.revenue AS total_revenue, "
        "orders.status AS order_status FROM orders"
    )
    columns = _columns(df)
    assert len(_rows(df)) == 2
    assert "total_revenue" in columns
    assert "order_status" in columns
    assert "revenue" not in columns
    assert "status" not in columns


# ---------------------------------------------------------------------------
# Expressions over measures (ref :614-752)
# ---------------------------------------------------------------------------


def test_semantic_scalar_expression_over_measures(rw_layer):
    """ref :614."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.status,
                  orders.revenue / orders.count AS average_order_value
           FROM orders"""
    ))
    completed = [row for row in rows if row["status"] == "completed"][0]
    assert float(completed["average_order_value"]) == 125.00


def test_semantic_expression_order_by_projection_alias(rw_layer):
    """ref :632 — ORDER BY can reference a SELECT alias."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.status, orders.revenue / orders.count AS aov
           FROM orders ORDER BY aov DESC"""
    ))
    assert [row["status"] for row in rows] == ["pending", "completed"]
    assert float(rows[0]["aov"]) == 200.00
    assert float(rows[1]["aov"]) == 125.00


def test_semantic_scalar_function_over_measure(rw_layer):
    """ref :650."""
    rows = _rows(rw_layer.sql(
        "SELECT ROUND(orders.revenue / orders.count, 2) AS aov FROM orders"
    ))
    assert len(rows) == 1
    assert float(rows[0]["aov"]) == 150.00


def test_semantic_ad_hoc_aggregate_expression(rw_layer):
    """ref :661 — SUM over a raw column without predefining a metric."""
    rows = _rows(rw_layer.sql(
        "SELECT SUM(orders.amount) AS total_amount FROM orders"
    ))
    assert len(rows) == 1
    assert float(rows[0]["total_amount"]) == 450.00


def test_semantic_ad_hoc_aggregate_expression_with_dimension(rw_layer):
    """ref :672."""
    rows = _rows(rw_layer.sql(
        "SELECT orders.status, SUM(orders.amount) AS total_amount FROM orders"
    ))
    assert len(rows) == 2
    completed = [row for row in rows if row["status"] == "completed"][0]
    assert float(completed["total_amount"]) == 250.00


def test_semantic_ad_hoc_aggregate_on_joined_model_is_fanout_safe(rw_layer):
    """ref :689 rejects ad hoc aggregates on a joined model ('base
    semantic model'). DIVERGENCE, stronger: this engine computes them
    correctly — a declared-dimension aggregate registers on the dim's
    model and the entity-grain dedup plan evaluates it over DISTINCT
    joined entities, so the duplicated join rows do not inflate the sum
    (customers 1 and 2 -> 3, not the fanned-out 1+1+2=4). RAW
    (undeclared) columns on a joined model still fail early."""
    rows = _rows(rw_layer.sql(
        """SELECT SUM(customers.id) AS customer_id_sum FROM orders
           JOIN customers ON orders.customer_id = customers.id"""
    ))
    assert float(rows[0]["customer_id_sum"]) == 3.0
    with pytest.raises(Exception, match="base semantic model"):
        rw_layer.sql(
            """SELECT SUM(customers.undeclared_col) AS s FROM orders
               JOIN customers ON orders.customer_id = customers.id"""
        )


def test_graph_level_metrics(rw_layer):
    """ref :701 — the reference tolerates failure here (try/except
    pass); this engine supports graph metrics outright, so assert the
    stronger property."""
    rw_layer.graph.add_metric(Metric(
        name="orders_grand_total", type="derived", sql="orders.revenue + 0"
    ))
    rows = _rows(rw_layer.sql("SELECT orders_grand_total FROM orders"))
    assert len(rows) == 1
    assert float(rows[0]["orders_grand_total"]) == 450.00


def test_nested_and_or_filters(rw_layer):
    """ref :723."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue FROM orders
           WHERE (orders.status = 'completed' OR orders.status = 'pending')
             AND orders.order_date >= '2024-01-01'"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 450.00


def test_complex_nested_filters(rw_layer):
    """ref :739."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue FROM orders
           WHERE (orders.status = 'completed' AND orders.order_date >= '2024-01-01')
              OR (orders.status = 'pending' AND orders.order_date >= '2024-01-03')"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 450.00


def test_query_without_metrics_or_dimensions(rw_layer):
    """ref :755 — a query selecting nothing meaningful raises."""
    with pytest.raises(Exception):
        rw_layer.rewrite("SELECT FROM orders")


def test_unresolvable_column(rw_layer):
    """ref :774."""
    with pytest.raises(Exception, match="completely_unknown_field|unknown|resolve"):
        rw_layer.sql("SELECT completely_unknown_field FROM orders")


# ---------------------------------------------------------------------------
# CTEs and subqueries over semantic islands (ref :782-1035)
# ---------------------------------------------------------------------------


def test_cte_with_semantic_query(rw_layer):
    """ref :782."""
    rows = _rows(rw_layer.sql(
        """WITH orders_agg AS (SELECT revenue, status FROM orders)
           SELECT * FROM orders_agg WHERE revenue > 200"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00
    assert rows[0]["status"] == "completed"


def test_cte_with_filter_in_outer_query(rw_layer):
    """ref :799."""
    rows = _rows(rw_layer.sql(
        """WITH orders_by_status AS (SELECT revenue, status FROM orders)
           SELECT status, revenue FROM orders_by_status
           WHERE status = 'completed' ORDER BY revenue DESC"""
    ))
    assert len(rows) == 1
    assert rows[0]["status"] == "completed"
    assert float(rows[0]["revenue"]) == 250.00


def test_cte_with_aggregation_in_outer_query(rw_layer):
    """ref :819 — re-aggregating already-aggregated semantic output."""
    rows = _rows(rw_layer.sql(
        """WITH orders_data AS (SELECT revenue, status FROM orders)
           SELECT status, SUM(revenue) AS total_revenue
           FROM orders_data GROUP BY status"""
    ))
    assert len(rows) == 2
    by_status = {r["status"]: float(r["total_revenue"]) for r in rows}
    assert by_status == {"completed": 250.00, "pending": 200.00}


def test_subquery_with_semantic_query(rw_layer):
    """ref :842."""
    rows = _rows(rw_layer.sql(
        """SELECT * FROM (SELECT revenue, status FROM orders) AS orders_agg
           WHERE revenue > 100"""
    ))
    assert len(rows) == 2
    assert all(float(row["revenue"]) > 100 for row in rows)


def test_subquery_with_join_to_regular_table(rw_layer):
    """ref :858 — semantic subquery joined to a plain table in the
    outer query."""
    df = rw_layer.sql(
        """SELECT orders_agg.revenue, orders_agg.region, r.continent
           FROM (SELECT orders.revenue, customers.region FROM orders) AS orders_agg
           JOIN rw_regions r ON orders_agg.region = r.region"""
    )
    rows = _rows(df)
    assert len(rows) == 2
    assert "continent" in _columns(df)


def test_multiple_ctes_with_semantic_queries(rw_layer):
    """ref :890."""
    df = rw_layer.sql(
        """WITH
           orders_metrics AS (SELECT revenue, status FROM orders),
           customer_metrics AS (SELECT region FROM customers)
           SELECT * FROM orders_metrics"""
    )
    rows = _rows(df)
    assert len(rows) == 2
    assert "revenue" in _columns(df)
    assert "status" in _columns(df)


def test_cte_with_limit_in_inner_query(rw_layer):
    """ref :912."""
    rows = _rows(rw_layer.sql(
        """WITH top_orders AS (
               SELECT revenue, status FROM orders ORDER BY revenue DESC LIMIT 1
           )
           SELECT * FROM top_orders"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


def test_nested_subquery(rw_layer):
    """ref :930."""
    rows = _rows(rw_layer.sql(
        """SELECT * FROM (SELECT revenue, status FROM orders) AS orders_agg
           WHERE revenue > 100"""
    ))
    assert len(rows) == 2
    assert all(float(row["revenue"]) > 100 for row in rows)


def test_cte_referencing_another_cte(rw_layer):
    """ref :946 — a second CTE over the first (not itself semantic)."""
    rows = _rows(rw_layer.sql(
        """WITH
           orders_raw AS (SELECT revenue, status FROM orders),
           orders_filtered AS (SELECT * FROM orders_raw WHERE status = 'completed')
           SELECT * FROM orders_filtered"""
    ))
    assert len(rows) == 1
    assert rows[0]["status"] == "completed"


def test_cte_with_cross_model_query(rw_layer):
    """ref :966."""
    rows = _rows(rw_layer.sql(
        """WITH orders_with_region AS (
               SELECT orders.revenue, customers.region FROM orders
           )
           SELECT * FROM orders_with_region WHERE region = 'US'"""
    ))
    assert len(rows) == 1
    assert rows[0]["region"] == "US"


def test_subquery_with_alias(rw_layer):
    """ref :985."""
    df = rw_layer.sql(
        """SELECT agg.revenue AS total_revenue, agg.status AS order_status
           FROM (SELECT revenue, status FROM orders) AS agg"""
    )
    columns = _columns(df)
    _rows(df)
    assert "total_revenue" in columns
    assert "order_status" in columns


def test_cte_mixed_semantic_and_regular(rw_layer):
    """ref :1004 — semantic CTE + plain-SQL CTE in one query."""
    df = rw_layer.sql(
        """WITH
           orders_agg AS (SELECT revenue, status FROM orders),
           status_labels AS (SELECT code, label FROM rw_status_codes)
           SELECT o.revenue, s.label
           FROM orders_agg o JOIN status_labels s ON o.status = s.code"""
    )
    rows = _rows(df)
    assert len(rows) == 2
    assert "label" in _columns(df)
    assert "revenue" in _columns(df)


# ---------------------------------------------------------------------------
# FROM metrics virtual table (ref :1038-1151)
# ---------------------------------------------------------------------------


def test_from_metrics_table(rw_layer):
    """ref :1038."""
    df = rw_layer.sql(
        "SELECT orders.revenue, customers.region FROM metrics"
    )
    rows = _rows(df)
    assert len(rows) == 2
    assert "revenue" in _columns(df)
    assert "region" in _columns(df)


def test_from_metrics_multiple_models(rw_layer):
    """ref :1054."""
    df = rw_layer.sql(
        """SELECT orders.revenue, orders.status, customers.region
           FROM metrics"""
    )
    rows = _rows(df)
    assert len(rows) >= 1
    for col in ("revenue", "status", "region"):
        assert col in _columns(df)


def test_from_metrics_requires_qualified_names(rw_layer):
    """ref :1075 — model-level fields need model.field spelling."""
    with pytest.raises(Exception, match="qualif"):
        rw_layer.sql("SELECT revenue FROM metrics")


def test_from_metrics_no_select_star(rw_layer):
    """ref :1086."""
    with pytest.raises(Exception, match="\\*|star"):
        rw_layer.sql("SELECT * FROM metrics")


def test_from_metrics_with_filters(rw_layer):
    """ref :1096."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue, orders.status FROM metrics
           WHERE orders.status = 'completed'"""
    ))
    assert len(rows) == 1
    assert rows[0]["status"] == "completed"
    assert float(rows[0]["revenue"]) == 250.00


def test_from_metrics_in_cte(rw_layer):
    """ref :1112."""
    rows = _rows(rw_layer.sql(
        """WITH all_metrics AS (
               SELECT orders.revenue, customers.region FROM metrics
           )
           SELECT * FROM all_metrics WHERE region = 'US'"""
    ))
    assert len(rows) == 1
    assert rows[0]["region"] == "US"


def test_from_metrics_allows_graph_level_metrics(rw_layer):
    """ref :1129 — graph-level metrics need no table prefix."""
    rw_layer.graph.add_metric(Metric(
        name="total_revenue", type="derived", sql="orders.revenue"
    ))
    df = rw_layer.sql("SELECT total_revenue FROM metrics")
    assert "total_revenue" in _columns(df)
    assert float(_rows(df)[0]["total_revenue"]) == 450.00


def test_filter_on_joined_table_without_dimension(rw_layer):
    """ref :1154 — filtering on a joined model pulls in the join even
    when none of its dimensions are selected."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue FROM orders WHERE customers.region = 'US'"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


def test_filter_on_multiple_joined_tables(rw_layer):
    """ref :1171 — the reference test is a NO-OP (early return at
    :1213). Ported as the working concept: two filters on the same
    joined model alongside the base filter."""
    rows = _rows(rw_layer.sql(
        """SELECT orders.revenue FROM orders
           WHERE customers.region = 'US' AND customers.tier = 'premium'
             AND orders.status = 'completed'"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


# ---------------------------------------------------------------------------
# Aliases and granularities (ref :1216-1326)
# ---------------------------------------------------------------------------


def test_multiple_aliases(rw_layer):
    """ref :1216."""
    df = rw_layer.sql(
        """SELECT orders.revenue AS total_sales,
                  orders.count AS order_count,
                  orders.status AS current_status
           FROM orders"""
    )
    columns = _columns(df)
    _rows(df)
    for col in ("total_sales", "order_count", "current_status"):
        assert col in columns


def test_alias_with_join(rw_layer):
    """ref :1235."""
    df = rw_layer.sql(
        """SELECT orders.revenue AS sales, customers.region AS market
           FROM orders"""
    )
    columns = _columns(df)
    _rows(df)
    assert "sales" in columns
    assert "market" in columns
    assert "revenue" not in columns
    assert "region" not in columns


def test_alias_mixed_with_no_alias(rw_layer):
    """ref :1254."""
    df = rw_layer.sql(
        "SELECT orders.revenue AS total_revenue, orders.status FROM orders"
    )
    columns = _columns(df)
    _rows(df)
    assert "total_revenue" in columns
    assert "status" in columns


def test_time_dimension_with_granularity_syntax(rw_layer):
    """ref :1271."""
    df = rw_layer.sql(
        "SELECT orders.order_date__day, orders.revenue FROM orders"
    )
    rows = _rows(df)
    assert len(rows) == 3
    columns = _columns(df)
    assert "order_date" in columns or "order_date__day" in columns
    assert "revenue" in columns


def test_time_dimension_multiple_granularities(rw_db):
    """ref :1285 — with February data, month grain groups to 2 rows."""
    layer = _mk_layer(rw_db, orders_table="rw_orders_feb")
    df = layer.sql(
        "SELECT orders.order_date__month, orders.revenue FROM orders"
    )
    rows = _rows(df)
    assert len(rows) == 2
    columns = _columns(df)
    assert "order_date" in columns or "order_date__month" in columns
    assert "revenue" in columns


def test_granularity_with_invalid_dimension(rw_layer):
    """ref :1306."""
    with pytest.raises(Exception, match="invalid_field|unknown|not found"):
        rw_layer.sql("SELECT orders.invalid_field__day FROM orders")


def test_granularity_on_non_time_dimension(rw_layer):
    """ref :1314 — the reference silently ignores a grain suffix on a
    categorical dimension; this engine REJECTS it at compile time (r11,
    beats the reference's runtime CAST error). Both engines agree the
    plain dimension works."""
    rows = _rows(rw_layer.sql("SELECT orders.status, orders.revenue FROM orders"))
    assert len(rows) == 2
    with pytest.raises(Exception, match="non-time|granularity"):
        rw_layer.sql("SELECT orders.status__day, orders.revenue FROM orders")


# ---------------------------------------------------------------------------
# Post-processing over semantic results (ref :1331-1631)
# ---------------------------------------------------------------------------


def test_postprocess_case_expression(rw_layer):
    """ref :1331."""
    df = rw_layer.sql(
        """SELECT status, revenue,
                  CASE WHEN revenue > 200 THEN 'high' ELSE 'low' END AS tier
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq"""
    )
    rows = _rows(df)
    assert "tier" in _columns(df)
    assert len(rows) == 2
    for row in rows:
        assert row["tier"] == ("high" if float(row["revenue"]) > 200 else "low")


def test_postprocess_arithmetic(rw_layer):
    """ref :1356."""
    df = rw_layer.sql(
        """SELECT status, revenue, count, revenue / count AS avg_order_value
           FROM (SELECT orders.revenue, orders.count, orders.status FROM orders) AS sq"""
    )
    rows = _rows(df)
    assert "avg_order_value" in _columns(df)
    for row in rows:
        assert float(row["avg_order_value"]) == pytest.approx(
            float(row["revenue"]) / row["count"]
        )


def test_postprocess_window_function(rw_layer):
    """ref :1378."""
    df = rw_layer.sql(
        """SELECT status, revenue,
                  LAG(revenue) OVER (ORDER BY revenue DESC) AS next_lower_revenue
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq"""
    )
    rows = _rows(df)
    assert "next_lower_revenue" in _columns(df)
    assert len(rows) == 2


def test_postprocess_coalesce(rw_layer):
    """ref :1398."""
    df = rw_layer.sql(
        """SELECT status, COALESCE(revenue, 0) AS safe_revenue
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq"""
    )
    rows = _rows(df)
    assert "safe_revenue" in _columns(df)
    assert all(row["safe_revenue"] is not None for row in rows)


def test_postprocess_having(rw_layer):
    """ref :1417 — WHERE in the outer query over aggregated results."""
    rows = _rows(rw_layer.sql(
        """SELECT status, revenue
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq
           WHERE revenue > 200"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) > 200


def test_postprocess_order_by_in_outer(rw_layer):
    """ref :1434."""
    rows = _rows(rw_layer.sql(
        """SELECT status, revenue
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq
           ORDER BY revenue DESC"""
    ))
    assert len(rows) == 2
    assert float(rows[0]["revenue"]) >= float(rows[1]["revenue"])


def test_postprocess_limit_in_outer(rw_layer):
    """ref :1451."""
    rows = _rows(rw_layer.sql(
        """SELECT status, revenue
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq
           ORDER BY revenue DESC LIMIT 1"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


def test_postprocess_zero_limit_and_offset_in_outer(rw_layer):
    """ref :1469."""
    sql = """SELECT status, revenue
             FROM (SELECT orders.revenue, orders.status FROM orders) AS sq
             ORDER BY revenue DESC LIMIT 0 OFFSET 0"""
    rewritten = rw_layer.rewrite(sql)
    assert "LIMIT 0" in rewritten
    assert _rows(rw_layer.sql(sql)) == []


def test_postprocess_cross_model_subquery(rw_layer):
    """ref :1489."""
    df = rw_layer.sql(
        """SELECT region, revenue,
                  CASE WHEN revenue > 200 THEN 'big' ELSE 'small' END AS market_size
           FROM (SELECT orders.revenue, customers.region FROM orders) AS sq"""
    )
    _rows(df)
    for col in ("market_size", "region", "revenue"):
        assert col in _columns(df)


def test_deeply_nested_subquery(rw_layer):
    """ref :1510 — plain -> plain -> semantic."""
    rows = _rows(rw_layer.sql(
        """SELECT status, revenue, tier
           FROM (
               SELECT status, revenue,
                      CASE WHEN revenue > 200 THEN 'high' ELSE 'low' END AS tier
               FROM (SELECT orders.revenue, orders.status FROM orders) AS inner_sq
           ) AS outer_sq
           WHERE tier = 'high'"""
    ))
    assert len(rows) == 1
    assert rows[0]["tier"] == "high"
    assert float(rows[0]["revenue"]) > 200


def test_subquery_in_join(rw_layer):
    """ref :1537 — semantic subquery used in a JOIN."""
    df = rw_layer.sql(
        """SELECT sq.status, sq.revenue, t.target, sq.revenue - t.target AS delta
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq
           JOIN rw_targets t ON sq.status = t.status"""
    )
    rows = _rows(df)
    assert "delta" in _columns(df)
    assert len(rows) == 2
    for row in rows:
        assert float(row["delta"]) == float(row["revenue"]) - row["target"]


def test_compile_post_process(rw_layer):
    """ref :1568 — post_process parameter on compile()."""
    outer_sql = rw_layer.compile(
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        post_process=("SELECT *, CASE WHEN revenue > 200 THEN 'high' "
                      "ELSE 'low' END AS tier FROM ({inner})"),
    )
    assert "CASE" in outer_sql
    assert "tier" in outer_sql
    assert "orders_cte" in outer_sql
    assert "WITH WITH" not in outer_sql


def test_query_post_process(rw_layer):
    """ref :1584 — post_process parameter on query()."""
    df = rw_layer.query(
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        post_process=("SELECT *, CASE WHEN revenue > 200 THEN 'high' "
                      "ELSE 'low' END AS tier FROM ({inner})"),
    )
    rows = _rows(df)
    assert "tier" in _columns(df)
    for row in rows:
        assert row["tier"] == ("high" if float(row["revenue"]) > 200 else "low")


def test_post_process_missing_placeholder(rw_layer):
    """ref :1603."""
    with pytest.raises(ValueError, match="\\{inner\\}"):
        rw_layer.compile(
            metrics=["orders.revenue"],
            post_process="SELECT * FROM results",
        )


def test_dry_run_with_postprocess_subquery(rw_layer):
    """ref :1612 — rewrite() returns the composed SQL."""
    rewritten = rw_layer.rewrite(
        """SELECT status, revenue,
                  CASE WHEN revenue > 200 THEN 'high' ELSE 'low' END AS tier
           FROM (SELECT orders.revenue, orders.status FROM orders) AS sq"""
    )
    assert "CASE" in rewritten
    assert "tier" in rewritten
    assert "AS" in rewritten


# ---------------------------------------------------------------------------
# Semantic-root CTE handling (ref :1634-1749)
# ---------------------------------------------------------------------------


def test_semantic_root_with_join_subquery_rejected(rw_layer):
    """ref :1634 — explicit JOINs on semantic roots only accept model
    tables, never arbitrary subqueries."""
    with pytest.raises(Exception):
        rw_layer.sql(
            """SELECT orders.revenue FROM orders
               JOIN (SELECT 1 AS id) AS lk ON 1 = 1"""
        )


def test_semantic_root_with_user_cte_preserved(rw_layer):
    """ref :1648 — a user CTE feeding an IN-subquery filter survives."""
    rows = _rows(rw_layer.sql(
        """WITH allowed_statuses AS (SELECT 'completed' AS status)
           SELECT orders.revenue FROM orders
           WHERE orders.status IN (SELECT status FROM allowed_statuses)"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


def test_semantic_root_allows_unrelated_generated_cte_name(rw_layer):
    """ref :1665 — a user CTE named like a generated CTE is fine when
    THIS query does not generate it (customers_cte: no customers join
    here)."""
    rows = _rows(rw_layer.sql(
        """WITH customers_cte AS (SELECT 'completed' AS status)
           SELECT orders.revenue FROM orders
           WHERE orders.status IN (SELECT status FROM customers_cte)"""
    ))
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == 250.00


def test_semantic_root_with_recursive_cte_preserved(rw_layer):
    """ref :1682 — WITH RECURSIVE survives the merge."""
    rows = _rows(rw_layer.sql(
        """WITH RECURSIVE status_chain(status, depth) AS (
               SELECT 'completed', 1
               UNION ALL
               SELECT 'pending', depth + 1 FROM status_chain WHERE depth < 2
           )
           SELECT orders.revenue, orders.status FROM orders
           WHERE orders.status IN (SELECT status FROM status_chain)"""
    ))
    assert len(rows) == 2


def test_post_process_with_own_ctes(rw_layer):
    """ref :1701 — post_process SQL carrying its own CTEs."""
    rows = _rows(rw_layer.query(
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        post_process="""
            WITH thresholds AS (SELECT 200 AS min_rev)
            SELECT sq.*, t.min_rev
            FROM ({inner}) sq
            CROSS JOIN thresholds t
            WHERE sq.revenue >= t.min_rev
        """,
    ))
    assert len(rows) >= 1
    assert all(float(row["revenue"]) >= 200 for row in rows)


def test_post_process_cte_name_collision(rw_layer):
    """ref :1720 — a post_process CTE named like a generated CTE cannot
    collide (the inner names stay scoped to the {inner} subquery)."""
    rows = _rows(rw_layer.query(
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        post_process="""
            WITH orders_cte AS (SELECT 'custom' AS source)
            SELECT sq.*, oc.source
            FROM ({inner}) sq
            CROSS JOIN orders_cte oc
        """,
    ))
    assert len(rows) >= 1
    assert all(row["source"] == "custom" for row in rows)


def test_root_semantic_cte_name_collision(rw_layer):
    """ref :1738 — a user CTE whose name collides with a CTE this query
    actually generates raises a clear error."""
    with pytest.raises(Exception, match="orders_cte|conflict"):
        rw_layer.sql(
            """WITH orders_cte AS (SELECT 'completed' AS status)
               SELECT orders.revenue FROM orders
               WHERE orders.status IN (SELECT status FROM orders_cte)"""
        )
