"""Window-metric pipeline: cumulative / rolling / grain-to-date /
time-comparison, plus conversion, retention, cohort, semi-additive.

Mirrors sidemantic ``tests/metrics/test_cumulative.py``,
``test_retention.py``, ``test_cohort.py``, ``test_non_additive_guard.py``.
"""

from __future__ import annotations

import pytest

from sidemantic_spark.models.tpch import build_layer
from tests.conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def layer(spark, sf_dir):
    return build_layer(spark, sf_dir)


def test_running_total(layer, duck):
    df = layer.query(
        metrics=["orders.revenue", "orders.cumulative_revenue"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(o_totalprice) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT order_month, revenue,
               SUM(revenue) OVER (ORDER BY order_month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumulative_revenue
        FROM inner_q
        """,
    )


def test_running_total_partitioned(layer, duck):
    df = layer.query(
        metrics=["orders.cumulative_revenue"],
        dimensions=["orders.status", "orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT o_orderstatus AS status,
                   CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(o_totalprice) AS revenue
            FROM orders GROUP BY 1, 2
        )
        SELECT status, order_month,
               SUM(revenue) OVER (PARTITION BY status ORDER BY order_month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumulative_revenue
        FROM inner_q
        """,
    )


def test_rolling_window(layer, duck):
    df = layer.query(
        metrics=["orders.revenue_3m"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(o_totalprice) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT order_month,
               SUM(revenue) OVER (ORDER BY order_month
                   RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS revenue_3m
        FROM inner_q
        """,
    )


def test_grain_to_date(layer, duck):
    df = layer.query(
        metrics=["orders.revenue_ytd"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(o_totalprice) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT order_month,
               SUM(revenue) OVER (PARTITION BY DATE_TRUNC('year', order_month)
                   ORDER BY order_month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_ytd
        FROM inner_q
        """,
    )


def test_mom_percent_change(layer, duck):
    df = layer.query(
        metrics=["orders.revenue", "orders.revenue_mom"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(o_totalprice) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT i.order_month, i.revenue,
               (i.revenue - p.revenue) / NULLIF(p.revenue, 0) * 100 AS revenue_mom
        FROM inner_q i
        LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 1 MONTH
        """,
    )


def test_custom_time_offset_comparison(layer, duck):
    """Custom time_offset (ref core/metric.py:315): compare against
    2 months ago instead of a standard yoy/mom/wow window."""
    df = layer.query(
        metrics=["orders.revenue_vs_2mo"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(o_totalprice) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT i.order_month,
               i.revenue - p.revenue AS revenue_vs_2mo
        FROM inner_q i
        LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 2 MONTH
        """,
    )


def test_time_offset_validation(layer):
    from sidemantic_spark.core.model import Metric
    from sidemantic_spark.sql.generator import QueryCompileError

    orders = layer.graph.get_model("orders")
    if orders.metric("bad_offset") is None:
        orders.add_metric(Metric(
            name="bad_offset", type="time_comparison", base_metric="revenue",
            time_offset="fortnight",
        ))
    with pytest.raises(QueryCompileError, match="time_offset"):
        layer.compile(
            metrics=["orders.bad_offset"],
            dimensions=["orders.order_date__month AS m"],
        )


def test_yoy_difference(layer, duck):
    df = layer.query(
        metrics=["orders.revenue_yoy_diff"],
        dimensions=["orders.order_date__year AS order_year"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('year', o_orderdate) AS TIMESTAMP) AS order_year,
                   SUM(o_totalprice) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT i.order_year, i.revenue - p.revenue AS revenue_yoy_diff
        FROM inner_q i
        LEFT JOIN inner_q p ON p.order_year = i.order_year - INTERVAL 1 YEAR
        """,
    )


def test_conversion_funnel(layer, duck):
    df = layer.query(metrics=["events.signup_to_purchase"])
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH base AS (
            SELECT user_id AS entity, ts FROM events WHERE event_type = 'signup'
        ),
        conv AS (
            SELECT user_id AS entity, ts FROM events WHERE event_type = 'purchase'
        ),
        flags AS (
            SELECT b.entity,
                   MAX(CASE WHEN c.entity IS NOT NULL THEN 1 ELSE 0 END) AS converted
            FROM base b
            LEFT JOIN conv c ON c.entity = b.entity
                 AND c.ts >= b.ts AND c.ts <= b.ts + INTERVAL 7 DAY
            GROUP BY b.entity
        )
        SELECT COUNT(*) AS signup_to_purchase_base,
               SUM(converted) AS signup_to_purchase_converted,
               SUM(converted) / COUNT(*) AS signup_to_purchase
        FROM flags
        """,
    )


def test_conversion_with_dimension_no_cross_group_leak(spark):
    """Per-dimension conversion joins the conversion event to the SAME
    dimension group as its base (reference cross-group-leak fix,
    tests/test_bugfix_batch.py:607): a purchase in region EU must not
    credit a signup in region US even when entity+window match."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [
            (1, "signup", "2024-01-01 00:00:00", "US"),
            (1, "purchase", "2024-01-03 00:00:00", "EU"),  # leaks w/o dim join
            (2, "signup", "2024-01-05 00:00:00", "EU"),
            (2, "purchase", "2024-01-06 00:00:00", "EU"),
            (3, "signup", "2024-01-10 00:00:00", "EU"),
        ],
        "user_id long, event_type string, ts_s string, region string",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts", "region"
    ).createOrReplaceTempView("cg_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="cg_events",
        table="cg_events",
        primary_key="user_id",
        dimensions=[
            Dimension(name="event_type"),
            Dimension(name="ts", type="time"),
            Dimension(name="region"),
        ],
        metrics=[Metric(
            name="signup_conv",
            type="conversion",
            entity="user_id",
            base_event="cg_events.event_type = 'signup'",
            conversion_event="cg_events.event_type = 'purchase'",
            conversion_window="7 days",
        )],
    ))
    sql = layer.compile(metrics=["cg_events.signup_conv"],
                        dimensions=["cg_events.region"])
    assert "<=>" in sql  # NULL-safe dimension-group join
    rows = {
        r["region"]: r
        for r in layer.query(
            metrics=["cg_events.signup_conv"], dimensions=["cg_events.region"]
        ).collect()
    }
    # US: 1 signup, purchase was in EU -> 0.0 (the leak case)
    assert rows["US"]["signup_conv"] == 0.0
    # EU: 2 signups, 1 same-group purchase -> 0.5
    assert rows["EU"]["signup_conv"] == 0.5


def test_conversion_time_cohort_crosses_period_boundary(spark):
    """Time-grain dimensions are EXCLUDED from the conversion dim join:
    a signup on Jan 30 converting Feb 2 (inside the 7-day window) must
    count toward the JANUARY cohort, not be dropped because the
    purchase's month differs."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [
            (1, "signup", "2024-01-30 00:00:00"),
            (1, "purchase", "2024-02-02 00:00:00"),  # next month, in window
            (2, "signup", "2024-01-10 00:00:00"),
        ],
        "user_id long, event_type string, ts_s string",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("tc_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="tc_events",
        table="tc_events",
        primary_key="user_id",
        dimensions=[
            Dimension(name="event_type"),
            Dimension(name="ts", type="time"),
        ],
        metrics=[Metric(
            name="conv",
            type="conversion",
            entity="user_id",
            base_event="tc_events.event_type = 'signup'",
            conversion_event="tc_events.event_type = 'purchase'",
            conversion_window="7 days",
        )],
    ))
    rows = {
        r["m"]: r
        for r in layer.query(
            metrics=["tc_events.conv"], dimensions=["tc_events.ts__month AS m"]
        ).collect()
    }
    jan = rows[list(rows)[0]]
    assert jan["conv_base"] == 2 and jan["conv_converted"] == 1
    assert jan["conv"] == 0.5


def test_retention(layer, duck):
    df = layer.query(metrics=["events.weekly_retention"])
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH cohorts AS (
            SELECT user_id AS entity, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_date
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        activity AS (
            SELECT DISTINCT user_id AS entity, CAST(DATE_TRUNC('week', ts) AS DATE) AS period
            FROM events
        ),
        sizes AS (SELECT cohort_date, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1),
        ret AS (
            SELECT c.cohort_date,
                   CAST(FLOOR(DATEDIFF('day', c.cohort_date, a.period) / 7) AS INT) AS weeks_since,
                   a.entity
            FROM cohorts c JOIN activity a ON a.entity = c.entity
            WHERE a.period >= c.cohort_date
              AND CAST(FLOOR(DATEDIFF('day', c.cohort_date, a.period) / 7) AS INT) <= 5
        )
        SELECT r.cohort_date AS cohort_date, r.weeks_since AS weeks_since,
               COUNT(DISTINCT r.entity) AS active_users,
               s.cohort_size AS cohort_size,
               ROUND(COUNT(DISTINCT r.entity) * 100.0 / s.cohort_size, 1) AS weekly_retention
        FROM ret r JOIN sizes s ON s.cohort_date = r.cohort_date
        GROUP BY 1, 2, s.cohort_size
        """,
    )


def test_cohort_metric(layer, duck):
    df = layer.query(metrics=["events.avg_user_spend"])
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH per_entity AS (
            SELECT user_id, SUM(value) AS v
            FROM events GROUP BY 1 HAVING SUM(value) > 0
        )
        SELECT AVG(v) AS avg_user_spend FROM per_entity
        """,
    )


def test_semi_additive_last_snapshot(layer, duck):
    df = layer.query(
        metrics=["lineitem.last_qty_per_part"],
        dimensions=["lineitem.ship_date__month AS ship_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH marked AS (
            SELECT CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS ship_month,
                   l_partkey, l_quantity, l_shipdate,
                   MAX(l_shipdate) OVER (
                       PARTITION BY l_partkey, DATE_TRUNC('month', l_shipdate)
                   ) AS marker
            FROM lineitem
        )
        SELECT ship_month, SUM(l_quantity) AS last_qty_per_part
        FROM marked WHERE l_shipdate = marker
        GROUP BY 1
        """,
    )


def test_semi_additive_strategies_agree(layer, duck):
    """Plan gating: with per-entity `non_additive_window_groupings`
    (high-cardinality marker partitions) the window-marker plan is
    chosen — one sort-shuffle over tiny partitions beats the pipeline's
    three shuffles whose first GROUP BY is near row-cardinality.
    Without groupings the window partitions collapse to the dims, so
    the sort-free aggregation pipeline (partial agg per ts -> MAX_BY ->
    re-agg) is chosen instead.  Both plans must return identical rows
    for a metric exercised through each path."""
    from sidemantic_spark.core.model import Metric

    li = layer.graph.get_model("lineitem")
    # grouped metric (partkey marker) -> window plan
    kw = dict(
        metrics=["lineitem.last_qty_per_part"],
        dimensions=["lineitem.ship_date__month AS ship_month"],
    )
    sql = layer.compile(**kw)
    assert "plan=semi-additive\n" in sql or "plan=semi-additive " in sql
    assert "OVER (PARTITION BY" in sql

    # ungrouped metric (global marker per month) -> aggregation pipeline
    if li.metric("last_day_qty") is None:
        li.add_metric(Metric(
            name="last_day_qty", agg="sum", sql="l_quantity",
            non_additive_dimension="ship_date",
            non_additive_window="max",
        ))
    kw2 = dict(
        metrics=["lineitem.last_day_qty"],
        dimensions=["lineitem.ship_date__month AS ship_month"],
    )
    sql2 = layer.compile(**kw2)
    assert "plan=semi-additive-agg" in sql2
    assert "MAX_BY" in sql2 and "OVER" not in sql2
    agg_rows = {
        (r[0], round(float(r[1]), 6)) for r in layer.query(**kw2).collect()
    }
    # force the window path for the same ungrouped metric by pairing it
    # with a non-decomposable (count_distinct) sibling, then project
    # only the shared column: the two physical strategies must agree.
    if li.metric("last_cd_probe") is None:
        li.add_metric(Metric(
            name="last_cd_probe", agg="count_distinct", sql="l_partkey",
            non_additive_dimension="ship_date",
        ))
    sql_fb = layer.compile(
        metrics=["lineitem.last_day_qty", "lineitem.last_cd_probe"],
        dimensions=["lineitem.ship_date__month AS ship_month"],
    )
    assert "plan=semi-additive\n" in sql_fb or "plan=semi-additive " in sql_fb
    assert "OVER (PARTITION BY" in sql_fb
    win_rows = {
        (r[0], round(float(r[1]), 6))
        for r in layer.query(
            metrics=["lineitem.last_day_qty", "lineitem.last_cd_probe"],
            dimensions=["lineitem.ship_date__month AS ship_month"],
        ).select("ship_month", "last_day_qty").collect()
    }
    assert agg_rows == win_rows


def test_comparison_fill_nulls_applies_to_missing_prior_period(spark):
    """fill_nulls_with on a time_comparison metric applies AFTER the
    comparison: a missing prior period yields the fill value, not NULL
    (ref tests/metrics/test_advanced.py:609)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    lay = SparkSemanticLayer(spark)
    lay.add_model(Model(
        name="fn_sales",
        sql="SELECT DATE '2024-01-01' AS month, 100 AS revenue "
            "UNION ALL SELECT DATE '2024-02-01', 150",
        primary_key="month",
        dimensions=[Dimension(name="month", sql="month", type="time",
                              granularity="month")],
        metrics=[
            Metric(name="revenue", agg="sum", sql="revenue"),
            Metric(name="change", type="time_comparison",
                   base_metric="revenue", comparison_type="mom",
                   calculation="difference", fill_nulls_with=0),
        ],
    ))
    rows = lay.query(
        metrics=["fn_sales.change"],
        dimensions=["fn_sales.month__month AS m"],
        order_by=["m"],
    ).collect()
    assert [r[1] for r in rows] == [0, 50]


def test_cumulative_sql_metric_ref_and_fill_nulls(spark):
    """Cumulative metrics accept sql='model.metric' as the base
    reference (no base_metric field) and fill_nulls applies after the
    window (ref tests/metrics/test_advanced.py:172)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    lay = SparkSemanticLayer(spark)
    lay.add_model(Model(
        name="fn_sales2",
        sql="SELECT DATE '2024-01-01' AS day, CAST(NULL AS INT) AS amount "
            "UNION ALL SELECT DATE '2024-01-02', 5",
        primary_key="day",
        dimensions=[Dimension(name="day", sql="day", type="time",
                              granularity="day")],
        metrics=[
            Metric(name="amount", agg="sum", sql="amount"),
            Metric(name="running_amount", type="cumulative",
                   sql="fn_sales2.amount", fill_nulls_with=0),
        ],
    ))
    rows = lay.query(
        metrics=["fn_sales2.running_amount"],
        dimensions=["fn_sales2.day__day AS d"],
        order_by=["d"],
    ).collect()
    assert [r[1] for r in rows] == [0, 5]


def test_metric_percent_of_total(layer, duck):
    """Metric-level window total (BSL `_.all(...)`, ref
    sql/generator.py:4358-4460): all(revenue) in a derived metric
    compiles to SUM(SUM(x)) OVER () across the whole result."""
    df = layer.query(
        metrics=["orders.revenue", "orders.revenue_share"],
        dimensions=["orders.status"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT o_orderstatus AS status,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) OVER () AS DOUBLE) AS revenue_share
        FROM orders GROUP BY 1
        """,
    )
    # shares across all groups must total 1
    total = sum(r["revenue_share"] for r in df.collect())
    assert abs(total - 1.0) < 1e-9


def test_metric_window_total_count_distinct_expression_sql(layer, duck):
    """all() over a count_distinct metric whose sql is an EXPRESSION:
    every model-CTE reference inside the value must re-qualify for the
    scalar subquery's alias."""
    from sidemantic_spark.core.model import Metric

    orders = layer.graph.get_model("orders")
    if orders.metric("status_cust") is None:
        orders.add_metric(Metric(
            name="status_cust", agg="count_distinct",
            sql="CONCAT(o_orderstatus, '-', CAST(o_custkey AS STRING))",
        ))
        orders.add_metric(Metric(
            name="status_cust_share",
            type="derived",
            expr=(
                "CAST(status_cust AS DOUBLE) / "
                "CAST(all(status_cust) AS DOUBLE)"
            ),
        ))
    df = layer.query(
        metrics=["orders.status_cust_share"], dimensions=["orders.priority"]
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(DISTINCT CONCAT(o_orderstatus, '-', CAST(o_custkey AS VARCHAR))) AS DOUBLE)
                 / CAST((SELECT COUNT(DISTINCT CONCAT(o_orderstatus, '-', CAST(o_custkey AS VARCHAR)))
                         FROM orders) AS DOUBLE) AS status_cust_share
        FROM orders GROUP BY 1
        """,
    )


def test_metric_window_total_count_distinct(layer, duck):
    """count_distinct has no decomposable window-total form; all()
    falls back to a scalar subquery over the model CTE (ref
    `_build_measure_total_subquery_sql`)."""
    from sidemantic_spark.core.model import Metric

    orders = layer.graph.get_model("orders")
    if orders.metric("cust_share") is None:
        orders.add_metric(Metric(
            name="cust_share",
            type="derived",
            expr=(
                "CAST(customer_count AS DOUBLE) / "
                "CAST(all(customer_count) AS DOUBLE)"
            ),
        ))
    df = layer.query(
        metrics=["orders.cust_share"], dimensions=["orders.status"]
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT o_orderstatus AS status,
               CAST(COUNT(DISTINCT o_custkey) AS DOUBLE)
                 / CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS DOUBLE) AS cust_share
        FROM orders GROUP BY 1
        """,
    )


def test_metric_window_total_rejected_in_having(layer):
    """HAVING evaluates before window functions — all() metrics there
    must fail at compile, not at runtime."""
    from sidemantic_spark.sql.generator import QueryCompileError

    with pytest.raises(QueryCompileError, match="all\\(\\) window totals"):
        layer.compile(
            metrics=["orders.revenue"],
            dimensions=["orders.status"],
            filters=["orders.revenue_share > 0.3"],
        )


def test_multistep_funnel(layer, duck):
    """N-step funnel: sequential CTE chain enforcing chronological
    order (reference sql/generator.py:5420-5700)."""
    df = layer.query(metrics=["events.signup_funnel"])
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH s1 AS (
            SELECT user_id AS e, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY 1
        ),
        s2 AS (
            SELECT ev.user_id AS e, MIN(ev.ts) AS t2
            FROM events ev JOIN s1 ON ev.user_id = s1.e AND ev.ts >= s1.t1
            WHERE ev.event_type = 'view' GROUP BY 1
        ),
        s3 AS (
            SELECT ev.user_id AS e, MIN(ev.ts) AS t3
            FROM events ev JOIN s2 ON ev.user_id = s2.e AND ev.ts >= s2.t2
            WHERE ev.event_type = 'purchase' GROUP BY 1
        )
        SELECT COUNT(DISTINCT s1.e) AS total_entities,
               COUNT(DISTINCT s1.e) AS step_1_count,
               COUNT(DISTINCT s2.e) AS step_2_count,
               COUNT(DISTINCT s3.e) AS step_3_count,
               COUNT(DISTINCT s3.e) AS signup_funnel
        FROM s1
        LEFT JOIN s2 ON s1.e = s2.e
        LEFT JOIN s3 ON s2.e = s3.e
        """,
    )


def test_preagg_recommender(layer):
    layer.query_log.clear()
    for _ in range(12):
        layer.compile(metrics=["orders.revenue"], dimensions=["orders.status"])
    for _ in range(3):
        layer.compile(metrics=["orders.revenue"],
                      dimensions=["orders.order_date__month"])
    recs = layer.preaggs.recommend(min_query_count=10)
    assert len(recs) == 1
    rec = recs[0]
    assert rec.query_count >= 12
    assert rec.preagg.measures == ["revenue"]
    assert rec.preagg.dimensions == ["status"]
    # applying attaches it to the model and routing can now serve it
    layer.preaggs.recommend(min_query_count=1)  # smoke: low threshold sees both
    from sidemantic_spark.preagg.recommender import PreAggregationRecommender

    r = PreAggregationRecommender(layer.graph, min_query_count=10)
    r.parse_query_log(layer.query_log)
    applied = r.apply(r.get_recommendations()[0])
    model = layer.graph.get_model("orders")
    try:
        assert any(p.name == applied.name for p in model.pre_aggregations)
    finally:
        model.pre_aggregations = [p for p in model.pre_aggregations
                                  if p.name != applied.name]
        layer.graph._invalidate()


def test_wow_pct_change(layer, duck):
    """time_comparison wow over events at week grain (reference
    comparison types sql/generator.py:6217-6482)."""
    df = layer.query(
        metrics=["events.event_wow"],
        dimensions=["events.ts__week AS event_week"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS event_week,
                   COUNT(*) AS event_count
            FROM events GROUP BY 1
        )
        SELECT i.event_week,
               CAST(i.event_count - p.event_count AS DOUBLE)
                 / NULLIF(CAST(p.event_count AS DOUBLE), 0) * 100 AS event_wow
        FROM inner_q i
        LEFT JOIN inner_q p ON p.event_week = i.event_week - INTERVAL 7 DAY
        """,
    )


def test_ratio_offset_window(layer, duck):
    """ratio with offset_window: denominator from the prior period
    (reference sql/generator.py:6331-6394)."""
    sql = layer.compile(
        metrics=["orders.revenue_vs_prior_month"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert "plan=window" in sql and "INTERVAL '1' MONTH" in sql
    df = layer.query(
        metrics=["orders.revenue_vs_prior_month"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT i.order_month,
               CAST(i.revenue AS DOUBLE)
                 / NULLIF(CAST(p.revenue AS DOUBLE), 0) AS revenue_vs_prior_month
        FROM inner_q i
        LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 1 MONTH
        """,
    )


def test_window_expression_passthrough(layer, duck):
    """Raw window_expression passthrough (reference core/metric.py:299-308,
    sql/generator.py:6139-6147)."""
    sql = layer.compile(
        metrics=["orders.revenue_peak_to_date"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert "MAX(" in sql and "UNBOUNDED PRECEDING" in sql
    df = layer.query(
        metrics=["orders.revenue_peak_to_date"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT order_month,
               MAX(revenue) OVER (ORDER BY order_month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_peak_to_date
        FROM inner_q
        """,
    )


def test_having_on_window_metrics(layer, duck):
    """HAVING over a window/comparison metric filters the window
    select's output rows (previously raised not-supported)."""
    from tests.conftest import assert_df_matches_oracle

    df = layer.query(
        metrics=["orders.revenue", "orders.revenue_mom"],
        dimensions=["orders.order_date__month AS order_month"],
        # the filter classifier routes metric predicates to HAVING
        filters=["orders.revenue_mom > 0"],
        order_by=["order_month"],
    )
    assert_df_matches_oracle(df, duck, """
        WITH inner_q AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
            FROM orders GROUP BY 1
        ), w AS (
            SELECT i.order_month, CAST(i.revenue AS DOUBLE) AS revenue,
                   CAST(i.revenue - p.revenue AS DOUBLE)
                     / NULLIF(CAST(p.revenue AS DOUBLE), 0) * 100 AS revenue_mom
            FROM inner_q i
            LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 1 MONTH
        )
        SELECT * FROM w WHERE revenue_mom > 0 ORDER BY order_month
    """)


def test_metric_named_base_suffix_resolvable(spark):
    """Round-5 ADVICE: a REAL metric whose name ends in '__base' must
    resolve to itself — the internal window-plan marker only applies to
    refs the graph cannot resolve directly."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0)],
        "id long, grp string, amt double",
    ).createOrReplaceTempView("nb_rows")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="nb_rows",
        table="nb_rows",
        primary_key="id",
        dimensions=[Dimension(name="grp")],
        metrics=[
            Metric(name="amt__base", agg="sum", sql="amt"),
            # a DIFFERENT window metric named amt must not shadow it
            Metric(name="amt", type="cumulative", agg="sum", sql="amt"),
        ],
    ))
    rows = {
        r["grp"]: r["amt__base"]
        for r in layer.query(
            metrics=["nb_rows.amt__base"], dimensions=["nb_rows.grp"]
        ).collect()
    }
    assert rows == {"a": 15.0, "b": 7.0}


def _balances_layer(spark):
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [("A", "2026-01-10", 100), ("A", "2026-01-31", 110),
         ("B", "2026-01-10", 200), ("B", "2026-01-31", 210)],
        "account string, day_s string, balance int",
    ).selectExpr(
        "account", "CAST(day_s AS DATE) AS day", "balance"
    ).createOrReplaceTempView("na_bal")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="na_bal", table="na_bal", primary_key="account",
        dimensions=[
            Dimension(name="account"),
            Dimension(name="day", type="time", granularity="day"),
        ],
        metrics=[
            Metric(name="closing", agg="sum", sql="balance",
                   non_additive_dimension="day", non_additive_window="max"),
            Metric(name="opening", agg="sum", sql="balance",
                   non_additive_dimension="day", non_additive_window="min"),
            Metric(name="total_balance", agg="sum", sql="balance",
                   non_additive_dimension="day"),
            Metric(name="snapshots", agg="count"),
        ],
    ))
    return layer


def test_opening_and_closing_snapshots_compose(spark):
    """Two semi-additive metrics with DIFFERENT windows in one query
    each keep their own marker (reference tests/metrics/
    test_non_additive_guard.py test_opening_and_closing_snapshot_...)."""
    layer = _balances_layer(spark)
    row = layer.query(metrics=["na_bal.closing", "na_bal.opening"]).collect()[0]
    assert (row["closing"], row["opening"]) == (320, 300)


def test_semi_additive_keeps_additive_sibling_row_set(spark):
    """A snapshot metric must not remove rows from additive siblings
    (reference test_semi_additive_and_additive_metrics_keep_independent
    _row_sets)."""
    layer = _balances_layer(spark)
    rows = layer.query(
        metrics=["na_bal.closing", "na_bal.snapshots"],
        dimensions=["na_bal.account"],
        order_by=["account"],
    ).collect()
    assert [tuple(r) for r in rows] == [("A", 110, 2), ("B", 210, 2)]


def test_graph_metric_wrapping_semi_additive_keeps_snapshot_plan(spark):
    """A typeless graph metric whose sql names a model measure adopts
    it wholesale, snapshot plan included (reference
    test_graph_metric_wrapping_semi_additive_measure_is_planned)."""
    from sidemantic_spark.core.model import Metric

    layer = _balances_layer(spark)
    layer.graph.add_metric(Metric(name="wrapped_balance", sql="na_bal.total_balance"))
    sql = layer.compile(metrics=["wrapped_balance"], dimensions=["na_bal.account"])
    assert "plan=semi-additive" in sql
    rows = {
        r["account"]: r["wrapped_balance"]
        for r in layer.query(
            metrics=["wrapped_balance"], dimensions=["na_bal.account"]
        ).collect()
    }
    assert rows == {"A": 110, "B": 210}


def test_graph_level_funnel_resolves_owner_and_orders_steps(spark):
    """Graph-level conversion metrics resolve their owning model from
    the entity dimension, and the sequential step chain honors event
    ORDER (reference test_multistep_funnel_repeated_actions_valid_path
    + test_multistep_funnel_only_prior_step2_not_counted)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    def build(rows_sql, mname):
        lay = SparkSemanticLayer(spark)
        lay.add_model(Model(
            name=mname, sql=rows_sql, primary_key="user_id",
            dimensions=[Dimension(name="user_id"), Dimension(name="event"),
                        Dimension(name="ts", type="time")],
        ))
        return lay

    # purchase BEFORE signup plus another purchase AFTER: valid path
    l1 = build(
        "SELECT 1 AS user_id, 'purchase' AS event, CAST('2024-01-01' AS TIMESTAMP) AS ts"
        " UNION ALL SELECT 1, 'signup', CAST('2024-01-05' AS TIMESTAMP)"
        " UNION ALL SELECT 1, 'purchase', CAST('2024-01-10' AS TIMESTAMP)"
        " UNION ALL SELECT 2, 'signup', CAST('2024-01-01' AS TIMESTAMP)"
        " UNION ALL SELECT 2, 'purchase', CAST('2024-01-02' AS TIMESTAMP)",
        "gf_ev1")
    l1.graph.add_metric(Metric(name="f1", type="conversion", entity="user_id",
                               steps=["event = 'signup'", "event = 'purchase'"]))
    row = l1.query(metrics=["f1"]).collect()[0]
    assert (row["step_1_count"], row["step_2_count"]) == (2, 2)

    # purchase ONLY before signup: not counted at step 2
    l2 = build(
        "SELECT 1 AS user_id, 'purchase' AS event, CAST('2024-01-01' AS TIMESTAMP) AS ts"
        " UNION ALL SELECT 1, 'signup', CAST('2024-01-05' AS TIMESTAMP)"
        " UNION ALL SELECT 2, 'signup', CAST('2024-01-01' AS TIMESTAMP)"
        " UNION ALL SELECT 2, 'purchase', CAST('2024-01-02' AS TIMESTAMP)",
        "gf_ev2")
    l2.graph.add_metric(Metric(name="f2", type="conversion", entity="user_id",
                               steps=["event = 'signup'", "event = 'purchase'"]))
    row = l2.query(metrics=["f2"]).collect()[0]
    assert (row["step_1_count"], row["step_2_count"]) == (2, 1)


def test_cohort_inner_metrics_surface(spark):
    """The reference's inner_metrics cohort form: per-entity aggregates,
    inner HAVING over their names, outer agg over cohort_sub refs
    (reference tests/metrics/test_cohort.py
    test_cohort_outer_sql_references_subquery + validation family)."""
    import pytest as _pytest

    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model
    from sidemantic_spark.sql.generator import QueryCompileError

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="co_events",
        sql="SELECT 1 AS user_id, 'web' AS platform, 10 AS score"
            " UNION ALL SELECT 1, 'mobile', 20"
            " UNION ALL SELECT 2, 'web', 5"
            " UNION ALL SELECT 2, 'mobile', 15"
            " UNION ALL SELECT 3, 'mobile', 30",
        primary_key="user_id",
        dimensions=[Dimension(name="user_id"), Dimension(name="platform"),
                    Dimension(name="score", type="number")],
        metrics=[Metric(
            name="avg_total_score", type="cohort", entity="user_id",
            inner_metrics=[{"name": "total_score", "agg": "sum", "sql": "score"}],
            having="total_score > 0", agg="avg", sql="cohort_sub.total_score",
        )],
    ))
    val = layer.query(metrics=["co_events.avg_total_score"]).collect()[0][0]
    assert abs(val - 26.667) < 0.01
    by_platform = {
        r["platform"]: r["avg_total_score"]
        for r in layer.query(
            metrics=["co_events.avg_total_score"],
            dimensions=["co_events.platform"],
        ).collect()
    }
    assert abs(by_platform["web"] - 7.5) < 1e-9

    # validation: missing name / missing sql for non-count aggs
    model = layer.graph.get_model("co_events")
    for bad, msg in (
        ({"agg": "sum", "sql": "score"}, "missing name"),
        ({"name": "x", "agg": "sum"}, "needs sql"),
        ({"name": "x", "agg": "count_distinct"}, "needs sql"),
    ):
        model.metrics[0].inner_metrics = [bad]
        layer.generator._cache.clear()  # in-place metric edit: no generation bump
        with _pytest.raises(QueryCompileError, match=msg):
            layer.compile(metrics=["co_events.avg_total_score"])
    model.metrics[0].inner_metrics = [
        {"name": "total_score", "agg": "sum", "sql": "score"}]


def test_sparse_month_comparison_uses_calendar_prior(spark):
    """MoM against a SPARSE series compares to the calendar prior month
    (missing -> NULL), never the previous available row (reference
    test_month_comparison_does_not_use_previous_available_sparse_row)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="sp_sales",
        sql="SELECT CAST('2024-01-01' AS TIMESTAMP) AS sale_date, 100 AS revenue"
            " UNION ALL SELECT CAST('2024-03-01' AS TIMESTAMP), 180",
        primary_key="sale_date",
        dimensions=[Dimension(name="sale_date", type="time")],
        metrics=[Metric(name="revenue", agg="sum", sql="revenue")],
    ))
    layer.graph.add_metric(Metric(
        name="revenue_mom", type="time_comparison",
        base_metric="sp_sales.revenue", comparison_type="mom",
        calculation="difference"))
    rows = layer.query(
        metrics=["revenue_mom"], dimensions=["sp_sales.sale_date__month"],
        order_by=["sale_date__month"],
    ).collect()
    assert rows[1][0].month == 3 and rows[1][1] is None


def test_cumulative_fill_nulls_applies_after_window(spark):
    """fill_nulls_with on a cumulative metric coalesces the WINDOWED
    value, not the input (reference
    test_cumulative_fill_nulls_applies_after_window)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="fn_sales",
        sql="SELECT CAST('2024-01-01' AS TIMESTAMP) AS day, CAST(NULL AS INT) AS amount"
            " UNION ALL SELECT CAST('2024-01-02' AS TIMESTAMP), 5",
        primary_key="day",
        dimensions=[Dimension(name="day", type="time", granularity="day")],
        metrics=[Metric(name="amount", agg="sum", sql="amount")],
    ))
    layer.graph.add_metric(Metric(
        name="running_amount", type="cumulative",
        sql="fn_sales.amount", fill_nulls_with=0))
    rows = layer.query(
        metrics=["running_amount"], dimensions=["fn_sales.day__day"],
        order_by=["day__day"],
    ).collect()
    assert [r["running_amount"] for r in rows] == [0, 5]


def test_funnel_model_placeholder_steps_filter_and_timestamp(spark, duck):
    """{model} placeholders resolve everywhere the reference accepts
    them (tests/metrics/test_advanced.py:1594-1826): in step
    predicates and query filters (-> anchor model), and in a time
    dimension's SQL (-> bare CTE column)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    ev_sql = (
        "SELECT 1 AS user_id, 'signup' AS event, 'US' AS region, "
        "TIMESTAMP '2024-01-01' AS created_at "
        "UNION ALL SELECT 1, 'purchase', 'US', TIMESTAMP '2024-01-02' "
        "UNION ALL SELECT 2, 'signup', 'EU', TIMESTAMP '2024-01-01' "
        "UNION ALL SELECT 2, 'purchase', 'EU', TIMESTAMP '2024-01-02' "
        "UNION ALL SELECT 3, 'signup', 'US', TIMESTAMP '2024-01-01'"
    )
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="ph_events", sql=ev_sql, primary_key="user_id",
        dimensions=[
            Dimension(name="user_id", sql="user_id"),
            Dimension(name="event", sql="event"),
            Dimension(name="region", sql="region"),
            # {model}.col in a time dimension collapses to the bare col
            Dimension(name="created_at", sql="{model}.created_at", type="time"),
        ],
    ))
    layer.add_metric(Metric(
        name="ph_funnel", type="conversion", entity="user_id",
        steps=["{model}.event = 'signup'", "{model}.event = 'purchase'"],
    ))
    rows = layer.query(
        metrics=["ph_funnel"],
        filters=["{model}.region = 'US'"],
    ).collect()
    # US users: 1 (converted), 3 (signup only)
    assert rows[0]["total_entities"] == 2
    assert rows[0]["step_1_count"] == 2
    assert rows[0]["step_2_count"] == 1


def test_funnel_or_step_parenthesized_with_filter(spark):
    """OR inside a step predicate must be parenthesized against the
    appended query filter (reference
    test_multistep_funnel_or_step_with_filter) — unparenthesized, an
    EU signup leaks through the US filter."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    ev_sql = (
        "SELECT 1 AS user_id, 'email_signup' AS event, 'US' AS region, "
        "TIMESTAMP '2024-01-01' AS ts "
        "UNION ALL SELECT 1, 'purchase', 'US', TIMESTAMP '2024-01-02' "
        "UNION ALL SELECT 2, 'social_signup', 'US', TIMESTAMP '2024-01-01' "
        "UNION ALL SELECT 2, 'purchase', 'US', TIMESTAMP '2024-01-02' "
        "UNION ALL SELECT 3, 'email_signup', 'EU', TIMESTAMP '2024-01-01' "
        "UNION ALL SELECT 3, 'purchase', 'EU', TIMESTAMP '2024-01-02' "
        "UNION ALL SELECT 4, 'social_signup', 'EU', TIMESTAMP '2024-01-01'"
    )
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="or_events", sql=ev_sql, primary_key="user_id",
        dimensions=[
            Dimension(name="user_id", sql="user_id"),
            Dimension(name="event", sql="event"),
            Dimension(name="region", sql="region"),
            Dimension(name="ts", sql="ts", type="time"),
        ],
    ))
    layer.add_metric(Metric(
        name="or_funnel", type="conversion", entity="user_id",
        steps=["event = 'email_signup' OR event = 'social_signup'",
               "event = 'purchase'"],
    ))
    rows = layer.query(
        metrics=["or_funnel"], filters=["or_events.region = 'US'"]
    ).collect()
    assert rows[0]["total_entities"] == 2  # EU users 3,4 filtered out
    assert rows[0]["step_1_count"] == 2
    assert rows[0]["step_2_count"] == 2


def test_funnel_steps_and_conversion_window_rejected():
    """steps + conversion_window is contradictory — the step chain has
    no window semantics; accepting both silently implies behavior that
    never runs (reference tests/metrics/test_advanced.py:1068-1080)."""
    import pytest as _pytest

    from sidemantic_spark.core.model import Metric

    with _pytest.raises(ValueError, match="both 'steps' and 'conversion_window'"):
        Metric(name="bad_funnel", type="conversion", entity="user_id",
               steps=["event = 'a'", "event = 'b'"],
               conversion_window="7 days")


def test_non_additive_unsafe_escape_hatch(spark):
    """allow_non_additive_unsafe skips the semi-additive rewrite and
    aggregates naively over every snapshot (reference tests/metrics/
    test_non_additive_guard.py:163 test_escape_hatch_reverts_to_naive).
    The flag must also partition the compile cache — a guarded compile
    must not serve the unsafe layer and vice versa."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    _balances_layer(spark)  # seeds the na_bal view
    def build(unsafe):
        layer = SparkSemanticLayer(spark, allow_non_additive_unsafe=unsafe)
        layer.add_model(Model(
            name="na_bal", table="na_bal", primary_key="account",
            dimensions=[
                Dimension(name="account"),
                Dimension(name="day", type="time", granularity="day"),
            ],
            metrics=[Metric(name="closing", agg="sum", sql="balance",
                            non_additive_dimension="day",
                            non_additive_window="max")],
        ))
        return layer

    guarded = build(False)
    rows = guarded.query(metrics=["na_bal.closing"],
                         dimensions=["na_bal.account"],
                         order_by=["account"]).collect()
    assert [tuple(r) for r in rows] == [("A", 110), ("B", 210)]

    unsafe = build(True)
    sql = unsafe.compile(metrics=["na_bal.closing"],
                         dimensions=["na_bal.account"])
    assert "MAX_BY" not in sql and "__snap" not in sql
    rows = unsafe.query(metrics=["na_bal.closing"],
                        dimensions=["na_bal.account"],
                        order_by=["account"]).collect()
    # naive: sums BOTH snapshots per account (over-counted by design)
    assert [tuple(r) for r in rows] == [("A", 210), ("B", 410)]

    # flag flip on one layer must not serve the cached guarded compile
    unsafe.generator.allow_non_additive_unsafe = False
    sql2 = unsafe.compile(metrics=["na_bal.closing"],
                          dimensions=["na_bal.account"])
    assert sql != sql2


def _chain_sales_layer(spark):
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="chain_sales",
        sql="""SELECT month_start,
                CASE WHEN month_start < DATE '2024-01-01' THEN 100 ELSE 200 END AS gbv,
                CASE WHEN month_start < DATE '2024-01-01' THEN 10 ELSE 20 END AS bookings
            FROM (SELECT explode(sequence(DATE '2023-01-01', DATE '2024-03-01',
                                          INTERVAL 1 MONTH)) AS month_start)""",
        primary_key="month_start",
        dimensions=[Dimension(name="month_start", type="time")],
        metrics=[Metric(name="gbv", agg="sum", sql="gbv"),
                 Metric(name="bookings", agg="sum", sql="bookings")],
    ))
    g = layer.graph
    g.add_metric(Metric(name="ch_ytd_gbv", type="cumulative",
                        sql="chain_sales.gbv", grain_to_date="year"))
    g.add_metric(Metric(name="ch_ytd_bookings", type="cumulative",
                        sql="chain_sales.bookings", grain_to_date="year"))
    return layer


def test_time_comparison_over_derived_cumulative_chain(spark):
    """time_comparison -> derived -> cumulative -> model.measure chains
    resolve owners recursively through graph-metric children (reference
    tests/metrics/test_cumulative.py:412). ABV is constant within each
    year (100/10 then 200/20), so YTD ABV is 10 everywhere and the YoY
    change is exactly 0."""
    from sidemantic_spark.core.model import Metric

    layer = _chain_sales_layer(spark)
    layer.graph.add_metric(Metric(name="ch_ytd_abv", type="derived",
                                  sql="ch_ytd_gbv / ch_ytd_bookings"))
    layer.graph.add_metric(Metric(
        name="ch_yoy_abv", type="time_comparison", base_metric="ch_ytd_abv",
        comparison_type="yoy", calculation="percent_change",
    ))
    rows = [r.asDict() for r in layer.query(
        metrics=["ch_ytd_abv", "ch_yoy_abv"],
        dimensions=["chain_sales.month_start__month"],
        order_by=["month_start__month"],
    ).collect()]
    assert len(rows) == 15
    r24 = [r for r in rows if str(r["month_start__month"]).startswith("2024")]
    assert len(r24) == 3
    assert all(abs(float(r["ch_ytd_abv"]) - 10.0) < 1e-9 for r in r24)
    assert all(abs(float(r["ch_yoy_abv"])) < 1e-9 for r in r24)


def test_time_comparison_over_ratio_cumulative_chain(spark):
    """time_comparison -> ratio -> cumulative chains (reference
    tests/metrics/test_cumulative.py:472)."""
    from sidemantic_spark.core.model import Metric

    layer = _chain_sales_layer(spark)
    layer.graph.add_metric(Metric(name="ch_abv_ratio", type="ratio",
                                  numerator="ch_ytd_gbv",
                                  denominator="ch_ytd_bookings"))
    layer.graph.add_metric(Metric(
        name="ch_yoy_ratio", type="time_comparison",
        base_metric="ch_abv_ratio",
        comparison_type="yoy", calculation="percent_change",
    ))
    rows = [r.asDict() for r in layer.query(
        metrics=["ch_abv_ratio", "ch_yoy_ratio"],
        dimensions=["chain_sales.month_start__month"],
        order_by=["month_start__month"],
    ).collect()]
    r24 = [r for r in rows if str(r["month_start__month"]).startswith("2024")]
    assert len(r24) == 3
    assert all(abs(float(r["ch_abv_ratio"]) - 10.0) < 1e-9 for r in r24)
    assert all(abs(float(r["ch_yoy_ratio"])) < 1e-9 for r in r24)


def test_dependency_free_expression_metric_with_windows(spark):
    """An untyped graph metric whose SQL carries its own aggregates
    (SUM(model.x)/NULLIF(SUM(model.y),0)) computes ONCE in the grouped
    stage as a complete-SQL measure — never re-aggregated in outer
    window stages (reference tests/metrics/test_cumulative.py:532)."""
    from sidemantic_spark.core.model import Metric

    layer = _chain_sales_layer(spark)
    g = layer.graph
    g.add_metric(Metric(name="ch_abv_inline",
                        sql="SUM(chain_sales.gbv) / NULLIF(SUM(chain_sales.bookings), 0)"))
    g.add_metric(Metric(name="ch_yoy_gbv", type="time_comparison",
                        base_metric="ch_ytd_gbv",
                        comparison_type="yoy", calculation="percent_change"))
    rows = [r.asDict() for r in layer.query(
        metrics=["ch_abv_inline", "ch_ytd_gbv", "ch_yoy_gbv"],
        dimensions=["chain_sales.month_start__month"],
        order_by=["month_start__month"],
    ).collect()]
    assert len(rows) == 15
    assert all(abs(float(r["ch_abv_inline"]) - 10.0) < 1e-9 for r in rows)
    jan24 = rows[12]
    assert float(jan24["ch_ytd_gbv"]) == 200.0
    assert abs(float(jan24["ch_yoy_gbv"]) - 100.0) < 1e-9  # 200 vs 100


def test_rolling_average_and_count(spark):
    """cumulative metrics whose agg names the WINDOW function over the
    base metric's bucket values: rolling 3-day AVG and COUNT (reference
    tests/metrics/test_cumulative.py:174,307 — agg_func selection,
    SUM stays the default)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [(1, "2024-01-01", 100.0), (2, "2024-01-02", 150.0),
         (3, "2024-01-03", 200.0), (4, "2024-01-04", 120.0),
         (5, "2024-01-05", 180.0)],
        "order_id int, d string, order_amount double",
    ).selectExpr(
        "order_id", "CAST(d AS DATE) AS order_date", "order_amount"
    ).createOrReplaceTempView("roll_orders")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="roll_o", table="roll_orders", primary_key="order_id",
        dimensions=[Dimension(name="order_date", type="time", granularity="day")],
        metrics=[Metric(name="daily_revenue", agg="sum", sql="order_amount"),
                 Metric(name="order_count", agg="count", sql="order_id")],
    ))
    layer.graph.add_metric(Metric(
        name="rolling_3day_avg", type="cumulative", agg="avg",
        sql="roll_o.daily_revenue", window="2 days"))
    layer.graph.add_metric(Metric(
        name="rolling_3day_count", type="cumulative", agg="count",
        sql="roll_o.order_count", window="2 days"))
    rows = layer.query(
        metrics=["roll_o.daily_revenue", "rolling_3day_avg", "rolling_3day_count"],
        dimensions=["roll_o.order_date"],
        order_by=["roll_o.order_date"],
    ).collect()
    avgs = [round(float(r["rolling_3day_avg"]), 2) for r in rows]
    counts = [int(r["rolling_3day_count"]) for r in rows]
    assert avgs == [100.0, 125.0, 150.0, 156.67, 166.67]
    assert counts == [1, 2, 3, 3, 3]


def test_rolling_average_parsed_from_sql(spark):
    """cumulative sql=\"AVG(model.metric)\" auto-extracts agg=avg +
    base ref at construction (reference
    tests/metrics/test_cumulative.py:223)."""
    from sidemantic_spark.core.model import Metric

    m = Metric(name="rap", type="cumulative",
               sql="AVG(roll_o.daily_revenue)", window="2 days")
    assert m.agg == "avg"
    assert m.sql == "roll_o.daily_revenue"


def test_conversion_undeclared_filter_column_is_compile_error(spark):
    """An event filter referencing a column that is neither a declared
    dimension nor projected into the model CTE must fail at COMPILE
    time with a clear engine error, not a raw Spark AnalysisException
    at run (reference raises ValueError — sql/generator.py:5316 area)."""
    import pytest

    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model
    from sidemantic_spark.sql.generator import QueryCompileError

    spark.createDataFrame(
        [(1, "signup", "2024-01-01 00:00:00")],
        "user_id long, event_type string, ts_s string",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("vc_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="vc_events",
        table="vc_events",
        primary_key="user_id",
        dimensions=[
            Dimension(name="event_type"),
            Dimension(name="ts", type="time"),
        ],
        metrics=[Metric(
            name="conv",
            type="conversion",
            entity="user_id",
            base_event="undeclared_col = 'signup'",
            conversion_event="event_type = 'purchase'",
            conversion_window="7 days",
        )],
    ))
    with pytest.raises(QueryCompileError) as exc:
        layer.compile(metrics=["vc_events.conv"])
    msg = str(exc.value)
    assert "undeclared_col" in msg
    assert "not declared dimensions" in msg
    assert "vc_events" in msg


def test_conversion_bare_event_value_python_api(spark):
    """base_event="signup" (a bare event VALUE, the reference's form —
    tests/metrics/test_advanced.py:450-458) matches against the model's
    event-type dimension; equivalent to an explicit filter expression.
    Covers the Python-API path (the YAML path normalizes in yaml_io)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [
            (1, "signup", "2024-01-01 00:00:00"),
            (1, "purchase", "2024-01-03 00:00:00"),
            (2, "signup", "2024-01-05 00:00:00"),
            (3, "signup", "2024-01-10 00:00:00"),
            (3, "purchase", "2024-01-25 00:00:00"),  # outside window
        ],
        "user_id long, event_type string, ts_s string",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("bare_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="bare_events",
        table="bare_events",
        primary_key="user_id",
        dimensions=[
            Dimension(name="event_type"),
            Dimension(name="ts", type="time"),
        ],
        metrics=[
            Metric(
                name="conv_bare", type="conversion", entity="user_id",
                base_event="signup", conversion_event="purchase",
                conversion_window="7 days",
            ),
            Metric(
                name="conv_expr", type="conversion", entity="user_id",
                base_event="event_type = 'signup'",
                conversion_event="event_type = 'purchase'",
                conversion_window="7 days",
            ),
        ],
    ))
    sql = layer.compile(metrics=["bare_events.conv_bare"])
    assert "event_type = 'signup'" in sql
    bare = layer.query(metrics=["bare_events.conv_bare"]).collect()[0]
    expr = layer.query(metrics=["bare_events.conv_expr"]).collect()[0]
    assert bare["conv_bare"] == expr["conv_expr"]
    assert abs(bare["conv_bare"] - 1.0 / 3.0) < 1e-9


def test_retention_bare_event_value_python_api(spark):
    """Retention base_event/activity_event also accept bare values."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [
            (1, "signup", "2024-01-01 00:00:00"),
            (1, "visit", "2024-01-08 00:00:00"),
            (2, "signup", "2024-01-01 00:00:00"),
        ],
        "user_id long, event_type string, ts_s string",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("ret_bare_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="ret_bare_events",
        table="ret_bare_events",
        primary_key="user_id",
        default_time_dimension="ts",
        dimensions=[
            Dimension(name="event_type"),
            Dimension(name="ts", type="time"),
        ],
        metrics=[Metric(
            name="weekly_ret", type="retention", entity="user_id",
            base_event="signup", activity_event="visit",
            retention_granularity="week", retention_periods=2,
        )],
    ))
    rows = layer.query(metrics=["ret_bare_events.weekly_ret"]).collect()
    week1 = [r for r in rows if r["weeks_since"] == 1]
    assert week1 and week1[0]["active_users"] == 1
    assert week1[0]["cohort_size"] == 2


def test_bare_event_value_without_event_type_dim_is_clear_error(spark):
    """A bare event value on a model with no event-type dimension gets
    the engine's explanatory error, not an unresolved-column crash."""
    import pytest

    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model
    from sidemantic_spark.sql.generator import QueryCompileError

    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts_s string"
    ).selectExpr(
        "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("noev_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="noev_events",
        table="noev_events",
        primary_key="user_id",
        dimensions=[Dimension(name="ts", type="time")],
        metrics=[Metric(
            name="conv", type="conversion", entity="user_id",
            base_event="signup", conversion_event="purchase",
            conversion_window="7 days",
        )],
    ))
    with pytest.raises(QueryCompileError) as exc:
        layer.compile(metrics=["noev_events.conv"])
    assert "event-type dimension" in str(exc.value)


def test_conversion_event_value_quotes_escaped(spark):
    """Event values containing single quotes are escaped into the
    literal, never treated as filter SQL (ref tests/
    test_sql_generation_security.py conversion_event_name_quotes)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.createDataFrame(
        [
            (1, "sign'up", "2024-01-01 00:00:00"),
            (1, "pur'chase", "2024-01-03 00:00:00"),
            (2, "sign'up", "2024-01-05 00:00:00"),
        ],
        "user_id long, event_type string, ts_s string",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("quote_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="quote_events",
        table="quote_events",
        primary_key="user_id",
        dimensions=[
            Dimension(name="event_type"),
            Dimension(name="ts", type="time"),
        ],
        metrics=[Metric(
            name="conv", type="conversion", entity="user_id",
            base_event="sign'up", conversion_event="pur'chase",
            conversion_window="7 days",
        )],
    ))
    sql = layer.compile(metrics=["quote_events.conv"])
    assert "sign''up" in sql and "pur''chase" in sql
    row = layer.query(metrics=["quote_events.conv"]).collect()[0]
    assert abs(row["conv"] - 0.5) < 1e-9


def test_time_comparison_auto_registered_at_graph_level(spark):
    """time_comparison/conversion metrics auto-register as graph-level
    names queryable without a model prefix; regular metrics stay
    model-scoped (ref core/semantic_graph.py:129-137, tests/
    test_semantic_graph_errors.py auto-register cases)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.sql(
        "SELECT 1 AS id, 10.0 AS amount, CAST('2024-01-01' AS TIMESTAMP) AS d "
        "UNION ALL SELECT 2, 20.0, CAST('2024-02-01' AS TIMESTAMP)"
    ).createOrReplaceTempView("ar_orders")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="ar_orders", table="ar_orders", primary_key="id",
        dimensions=[Dimension(name="d", type="time")],
        metrics=[
            Metric(name="revenue", agg="sum", sql="amount"),
            Metric(name="revenue_mom", type="time_comparison",
                   base_metric="revenue", comparison_type="mom",
                   calculation="percent_change"),
        ],
    ))
    assert "revenue_mom" in layer.graph.metrics
    assert "revenue" not in layer.graph.metrics  # regular metrics stay scoped

    rows = sorted(
        layer.query(metrics=["revenue_mom"], dimensions=["ar_orders.d__month"]).collect(),
        key=lambda r: str(r[0]),
    )
    assert rows[0]["revenue_mom"] is None
    assert abs(rows[1]["revenue_mom"] - 100.0) < 1e-9
