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
