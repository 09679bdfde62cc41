"""Time-intelligence helper module tests.

Mined from reference ``tests/dates/test_time_intelligence.py`` and
``tests/core/test_time_intelligence_module.py`` (validation, default
offsets, SQL shapes, and executable LAG semantics — here executed on
Spark instead of DuckDB).
"""

import pytest

from sidemantic_spark.core.time_intelligence import (
    TimeComparison,
    TrailingPeriod,
    generate_time_comparison_sql,
)


def test_default_offsets_per_type():
    expected = {
        "dod": (1, "day"),
        "wow": (1, "week"),
        "mom": (1, "month"),
        "qoq": (1, "quarter"),
        "yoy": (1, "year"),
        "prior_period": (1, "day"),
    }
    for ctype, interval in expected.items():
        comp = TimeComparison(type=ctype, metric="m")
        assert comp.offset_interval == interval
        assert comp.calculation == "percent_change"


def test_custom_offset_overrides_default():
    comp = TimeComparison(type="yoy", metric="m", offset=2, offset_unit="year")
    assert comp.offset_interval == (2, "year")
    assert comp.get_sql_offset() == "INTERVAL '2 year'"
    # Negative offset = future comparison
    comp = TimeComparison(type="prior_period", metric="m", offset=-1, offset_unit="month")
    assert comp.get_sql_offset() == "INTERVAL '-1 month'"


def test_validation_errors():
    with pytest.raises(ValueError, match="Unknown time comparison type"):
        TimeComparison(type="bogus", metric="m")
    with pytest.raises(ValueError, match="Unknown calculation type"):
        TimeComparison(type="yoy", metric="m", calculation="bogus")
    with pytest.raises(ValueError, match="Unknown offset unit"):
        TimeComparison(type="prior_period", metric="m", offset=7, offset_unit="fortnight")
    with pytest.raises(ValueError, match="offset cannot be 0"):
        TimeComparison(type="prior_period", metric="m", offset=0, offset_unit="day")
    with pytest.raises(ValueError, match="base metric"):
        TimeComparison(type="yoy", metric="")


def test_trailing_period_intervals_and_validation():
    for unit in ("day", "week", "month", "quarter", "year"):
        assert TrailingPeriod(amount=3, unit=unit).get_sql_interval() == f"INTERVAL '3 {unit}'"
    assert TrailingPeriod(amount=0, unit="day").get_sql_interval() == "INTERVAL '0 day'"
    with pytest.raises(ValueError, match="Unknown trailing unit"):
        TrailingPeriod(amount=7, unit="bogus")


def test_comparison_sql_shapes():
    diff = generate_time_comparison_sql(
        TimeComparison(type="mom", metric="r", calculation="difference"),
        "SUM(amount)", "order_date")
    assert "LAG(SUM(amount)) OVER (ORDER BY order_date)" in diff
    assert "* 100" not in diff

    pct = generate_time_comparison_sql(
        TimeComparison(type="mom", metric="r", calculation="percent_change"),
        "SUM(amount)", "order_date")
    assert "NULLIF" in pct and "* 100" in pct

    ratio = generate_time_comparison_sql(
        TimeComparison(type="mom", metric="r", calculation="ratio"),
        "SUM(amount)", "order_date")
    assert "NULLIF" in ratio and "* 100" not in ratio

    # Complex metric SQL passes through verbatim
    complex_metric = "SUM(amount) / NULLIF(COUNT(DISTINCT order_id), 0)"
    sql = generate_time_comparison_sql(
        TimeComparison(type="yoy", metric="aov"), complex_metric, "d")
    assert f"LAG({complex_metric})" in sql

    # Invalid calculation injected post-construction still raises
    comp = TimeComparison(type="mom", metric="r", calculation="difference")
    comp.calculation = "bad"
    with pytest.raises(ValueError, match="Unknown calculation type"):
        generate_time_comparison_sql(comp, "SUM(x)", "d")


@pytest.fixture(scope="module")
def monthly(spark):
    rows = [
        ("2023-01-01", 3700.0), ("2023-02-01", 2550.0), ("2023-03-01", 2400.0),
        ("2023-04-01", 950.0), ("2023-05-01", 1050.0), ("2023-06-01", 1150.0),
        ("2023-07-01", 1200.0), ("2023-08-01", 1250.0), ("2023-09-01", 1100.0),
        ("2023-10-01", 1300.0), ("2023-11-01", 1400.0), ("2023-12-01", 1600.0),
        ("2024-01-01", 4400.0), ("2024-02-01", 3150.0), ("2024-03-01", 3000.0),
    ]
    df = spark.createDataFrame(rows, ["month", "revenue"]).selectExpr(
        "CAST(month AS DATE) AS month", "revenue")
    df.createOrReplaceTempView("ti_monthly")
    return df


def _fetch(spark, expr, alias):
    rows = spark.sql(
        f"SELECT month, revenue, {expr} AS {alias} FROM ti_monthly ORDER BY month"
    ).collect()
    return {str(r["month"]): r[alias] for r in rows}


def test_mom_difference_executes_on_spark(spark, monthly):
    expr = generate_time_comparison_sql(
        TimeComparison(type="mom", metric="revenue", calculation="difference"),
        "revenue", "month")
    by_month = _fetch(spark, expr, "mom_diff")
    assert by_month["2024-02-01"] == pytest.approx(3150.0 - 4400.0)
    assert by_month["2023-01-01"] is None  # first period has no prior


def test_mom_percent_change_executes_on_spark(spark, monthly):
    expr = generate_time_comparison_sql(
        TimeComparison(type="mom", metric="revenue", calculation="percent_change"),
        "revenue", "month")
    by_month = _fetch(spark, expr, "mom_pct")
    assert by_month["2024-02-01"] == pytest.approx((3150.0 - 4400.0) / 4400.0 * 100)


def test_ratio_executes_on_spark(spark, monthly):
    expr = generate_time_comparison_sql(
        TimeComparison(type="mom", metric="revenue", calculation="ratio"),
        "revenue", "month")
    by_month = _fetch(spark, expr, "mom_ratio")
    assert by_month["2024-02-01"] == pytest.approx(3150.0 / 4400.0)


def test_zero_prior_nullif_guard_on_spark(spark):
    spark.createDataFrame(
        [(1, 0.0), (2, 100.0)], ["period", "value"]
    ).createOrReplaceTempView("ti_zero")
    comp = TimeComparison(type="prior_period", metric="v", offset=1,
                          offset_unit="day", calculation="percent_change")
    expr = generate_time_comparison_sql(comp, "value", "period")
    rows = spark.sql(
        f"SELECT period, {expr} AS pct FROM ti_zero ORDER BY period").collect()
    assert rows[1]["pct"] is None  # division by NULLIF(0, 0) -> NULL


def test_trailing_range_frame_executes_on_spark(spark, monthly):
    frame = TrailingPeriod(amount=30, unit="day").range_frame_sql("month", "SUM(revenue)")
    rows = spark.sql(
        f"SELECT month, {frame} AS t30 FROM ti_monthly ORDER BY month").collect()
    by_month = {str(r["month"]): r["t30"] for r in rows}
    # Jan 1 -> only itself; Feb 1 is 31 days after Jan 1 so excludes it
    assert by_month["2023-01-01"] == pytest.approx(3700.0)
    assert by_month["2023-02-01"] == pytest.approx(2550.0)


# -- ported from reference tests/dates/test_time_comparison.py (r10) --


def test_model_level_mom_difference_exact_rows(spark):
    """Reference tests/dates/test_time_comparison.py:13-68: a
    time_comparison metric defined in model.metrics auto-registers at
    graph level and produces the exact per-month differences."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.sql(
        "SELECT CAST('2024-01-01' AS DATE) AS month, 100.0 AS revenue "
        "UNION ALL SELECT CAST('2024-02-01' AS DATE), 150.0 "
        "UNION ALL SELECT CAST('2024-03-01' AS DATE), 120.0 "
        "UNION ALL SELECT CAST('2024-04-01' AS DATE), 180.0"
    ).createOrReplaceTempView("tc_sales")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="tc_sales", table="tc_sales", primary_key="month",
        dimensions=[Dimension(name="month", sql="month", type="time")],
        metrics=[
            Metric(name="revenue", agg="sum", sql="revenue"),
            Metric(name="revenue_mom_change", type="time_comparison",
                   base_metric="tc_sales.revenue", comparison_type="mom",
                   calculation="difference"),
        ],
    ))
    assert "revenue_mom_change" in layer.graph.metrics
    rows = sorted(
        layer.query(metrics=["revenue_mom_change"],
                    dimensions=["tc_sales.month__month"]).collect(),
        key=lambda r: str(r[0]),
    )
    got = [r["revenue_mom_change"] for r in rows]
    assert got[0] is None
    assert [float(v) for v in got[1:]] == [50.0, -30.0, 60.0]


def test_model_level_conversion_metric_exact(spark):
    """Reference tests/dates/test_time_comparison.py:70-126: model-level
    conversion metric auto-registers and computes 1/3 (only user 1
    converts inside the 7-day window)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.sql(
        "SELECT 1 AS user_id, 'signup' AS event_type, CAST('2024-01-01' AS DATE) AS event_date "
        "UNION ALL SELECT 1, 'purchase', CAST('2024-01-03' AS DATE) "
        "UNION ALL SELECT 2, 'signup', CAST('2024-01-05' AS DATE) "
        "UNION ALL SELECT 2, 'purchase', CAST('2024-01-20' AS DATE) "
        "UNION ALL SELECT 3, 'signup', CAST('2024-01-10' AS DATE)"
    ).createOrReplaceTempView("tc_events")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="tc_events", table="tc_events", primary_key="user_id",
        dimensions=[
            Dimension(name="user_id", sql="user_id"),
            Dimension(name="event_type", sql="event_type"),
            Dimension(name="event_date", sql="event_date", type="time"),
        ],
        metrics=[
            Metric(name="user_count", agg="count_distinct", sql="user_id"),
            Metric(name="signup_conversion", type="conversion",
                   entity="user_id", base_event="signup",
                   conversion_event="purchase", conversion_window="7 days"),
        ],
    ))
    assert "signup_conversion" in layer.graph.metrics
    rows = layer.query(metrics=["signup_conversion"]).collect()
    assert abs(float(rows[0]["signup_conversion"]) - 1 / 3) < 0.01
    assert rows[0]["signup_conversion_base"] == 3
    assert rows[0]["signup_conversion_converted"] == 1


def test_time_comparison_requires_base_reference():
    """Reference tests/dates/test_time_comparison.py:128-138: a
    time_comparison with neither base_metric nor sql raises at
    construction."""
    from sidemantic_spark.core.model import Metric

    with pytest.raises(ValueError, match="requires 'base_metric'"):
        Metric(name="revenue_mom", type="time_comparison",
               comparison_type="mom")
    # ...but the inline agg+sql form stays legal (no base_metric)
    Metric(name="ok", type="time_comparison", agg="sum", sql="amount",
           comparison_type="dod", calculation="prior")


def test_mom_on_sparse_series_is_calendar_aware(spark, duck):
    """On a series with a MISSING month, month-over-month compares
    against the previous CALENDAR month (missing -> NULL), never the
    previous available row — the reference pins exactly this in
    tests/metrics/test_advanced.py:639 (its execution path is a
    calendar RANGE frame, not the row LAG of the standalone
    time-intelligence helper). Pinned against a DuckDB calendar
    self-join oracle."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.sql(
        "SELECT CAST('2024-01-01' AS DATE) AS month, 100.0 AS revenue "
        "UNION ALL SELECT CAST('2024-02-01' AS DATE), 150.0 "
        "UNION ALL SELECT CAST('2024-04-01' AS DATE), 180.0"
    ).createOrReplaceTempView("tc_sparse")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="tc_sparse", table="tc_sparse", primary_key="month",
        dimensions=[Dimension(name="month", sql="month", type="time")],
        metrics=[
            Metric(name="revenue", agg="sum", sql="revenue"),
            Metric(name="mom_diff", type="time_comparison",
                   base_metric="tc_sparse.revenue", comparison_type="mom",
                   calculation="difference"),
        ],
    ))
    rows = sorted(
        layer.query(metrics=["mom_diff"],
                    dimensions=["tc_sparse.month__month"]).collect(),
        key=lambda r: str(r[0]),
    )
    got = [None if r["mom_diff"] is None else float(r["mom_diff"])
           for r in rows]
    want = [r[0] for r in duck.execute("""
        WITH s(month, revenue) AS (VALUES
            (DATE '2024-01-01', 100.0),
            (DATE '2024-02-01', 150.0),
            (DATE '2024-04-01', 180.0)),
        g AS (SELECT date_trunc('month', month) AS m, SUM(revenue) AS rev
              FROM s GROUP BY 1)
        SELECT CAST(g.rev - p.rev AS DOUBLE)
        FROM g LEFT JOIN g p ON p.m = g.m - INTERVAL 1 MONTH
        ORDER BY g.m
    """).fetchall()]
    assert got == want  # April has no March: NULL, never April-February
    assert got == [None, 50.0, None]
