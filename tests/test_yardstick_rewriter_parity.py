"""Ported reference Yardstick rewriter behavior tests.

Mirrors ``tests/queries/test_yardstick_query_rewriter.py`` in the
reference (round-9 mining): the behavioral surface of `SEMANTIC` /
`AGGREGATE()` / `AT (...)` queries over AS-MEASURE views beyond what the
vendored measures.test corpus exercises — visibility defaults, chained
and compound modifiers, SET arithmetic shapes, NULL dimensions,
expression arithmetic, literals, casts, and parser robustness.
"""

from __future__ import annotations

import pytest


def approx(x):
    return pytest.approx(x, rel=1e-9)


@pytest.fixture(scope="module")
def ys(spark):
    """The reference's `yardstick_layer` fixture, on Spark."""
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (2022,'US',100.0),(2022,'EU',50.0),"
        "(2023,'US',150.0),(2023,'EU',75.0) AS t(year, region, amount)"
    ).createOrReplaceTempView("yp_sales")
    spark.sql(
        "SELECT * FROM VALUES (2022,100.0,60.0),(2022,150.0,80.0),"
        "(2023,200.0,100.0),(2023,250.0,120.0) AS t(year, revenue, cost)"
    ).createOrReplaceTempView("yp_financials")
    spark.sql(
        "SELECT * FROM VALUES (DATE'2023-01-15',100.0),(DATE'2023-01-20',150.0),"
        "(DATE'2023-02-10',200.0),(DATE'2023-02-25',120.0),"
        "(DATE'2023-03-05',180.0),(DATE'2023-03-15',90.0) AS t(order_date, amount)"
    ).createOrReplaceTempView("yp_daily_orders")
    spark.sql(
        "SELECT * FROM VALUES (2022,'US',100.0),(2022,'EU',50.0),"
        "(2023,'US',150.0),(2023,'EU',75.0) AS t(year, region, amount)"
    ).createOrReplaceTempView("yp_fact_orders")
    spark.sql(
        "SELECT * FROM VALUES (2022,'US',10.0),(2022,'EU',5.0),"
        "(2023,'US',20.0),(2023,'EU',8.0) AS t(year, region, return_amount)"
    ).createOrReplaceTempView("yp_fact_returns")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW sales_p AS
SELECT year, region, SUM(amount) AS MEASURE revenue
FROM yp_sales;
CREATE VIEW sales_yearly_p AS
SELECT year, SUM(amount) AS MEASURE revenue
FROM yp_sales;
CREATE VIEW financials_p AS
SELECT year, SUM(revenue) AS MEASURE revenue, SUM(cost) AS MEASURE cost,
       revenue - cost AS MEASURE profit
FROM yp_financials;
CREATE VIEW daily_orders_p AS
SELECT order_date, SUM(amount) AS MEASURE revenue
FROM yp_daily_orders;
CREATE VIEW fact_orders_p AS
SELECT year, region, SUM(amount) AS MEASURE revenue
FROM yp_fact_orders;
CREATE VIEW fact_returns_p AS
SELECT year, region, SUM(return_amount) AS MEASURE refunds
FROM yp_fact_returns;
""")
    return lyr


def rows_of(df):
    return [r.asDict() for r in df.collect()]


def test_schema_qualified_aggregate_function(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, schema.AGGREGATE(revenue) AS revenue "
        "FROM sales_p GROUP BY year ORDER BY year"
    ))
    assert [(r["year"], float(r["revenue"])) for r in rows] == [
        (2022, 150.0), (2023, 225.0)]


def test_at_where_and_qualified_reference(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT s.year, s.region, "
        "AGGREGATE(revenue) AT (WHERE sales_p.region = 'US') AS us_revenue "
        "FROM sales_p AS s"
    ))
    assert {float(r["us_revenue"]) for r in rows} == {250.0}


def test_plain_measure_reference_with_where_context(ys):
    """Bare measure refs on a measure view IGNORE the query WHERE (the
    paper's invisible default) even with no AT anywhere in the query."""
    rows = rows_of(ys.sql(
        "SELECT year, revenue AS plain_revenue FROM sales_p "
        "WHERE region = 'US' GROUP BY year ORDER BY year"
    ))
    assert [(r["year"], float(r["plain_revenue"])) for r in rows] == [
        (2022, 150.0), (2023, 225.0)]


def test_curly_measure_reference(ys):
    rows = rows_of(ys.sql(
        "SELECT year, {revenue} AS revenue FROM sales_p "
        "WHERE region = 'US' GROUP BY year ORDER BY year"
    ))
    assert [(r["year"], float(r["revenue"])) for r in rows] == [
        (2022, 150.0), (2023, 225.0)]


def test_mixed_non_semantic_at_routing(ys):
    rows = rows_of(ys.sql(
        "SELECT year, AGGREGATE(revenue) AS agg_revenue, "
        "revenue AT (VISIBLE) AS visible_revenue, revenue AS plain_revenue "
        "FROM sales_p WHERE region = 'US' GROUP BY year ORDER BY year"
    ))
    assert [
        (r["year"], float(r["agg_revenue"]), float(r["visible_revenue"]),
         float(r["plain_revenue"])) for r in rows
    ] == [(2022, 100.0, 100.0, 150.0), (2023, 150.0, 150.0, 225.0)]


def test_chained_at_equals_single_clause_all(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, "
        "AGGREGATE(revenue) AT (ALL year region) AS single_all, "
        "AGGREGATE(revenue) AT (ALL year) AT (ALL region) AS chained_all "
        "FROM sales_p"
    ))
    for r in rows:
        assert float(r["single_all"]) == approx(375.0)
        assert float(r["single_all"]) == approx(float(r["chained_all"]))


def test_set_constant_correlates_on_remaining_dimensions(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, "
        "AGGREGATE(revenue) AT (SET year = 2022) AS fixed_2022 FROM sales_p"
    ))
    got = {(r["year"], r["region"]): float(r["fixed_2022"]) for r in rows}
    assert got == {(2022, "EU"): 50.0, (2022, "US"): 100.0,
                   (2023, "EU"): 50.0, (2023, "US"): 100.0}


def test_set_reaches_beyond_outer_where(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue) AT (SET year = year - 1) "
        "AS prior_year FROM sales_yearly_p WHERE year = 2023"
    ))
    assert [(r["year"], float(r["prior_year"])) for r in rows] == [(2023, 150.0)]


def test_set_in_predicate_form(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue) AS total_revenue, "
        "AGGREGATE(revenue) AT (SET region IN ('US')) AS us_only FROM sales_p"
    ))
    got = {r["year"]: (float(r["total_revenue"]), float(r["us_only"]))
           for r in rows}
    assert got == {2022: (150.0, 100.0), 2023: (225.0, 150.0)}


def test_set_then_all_overrides_set(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, "
        "AGGREGATE(revenue) AT (SET year = year - 1) AT (ALL year) "
        "AS prior_grand FROM sales_yearly_p"
    ))
    assert {r["year"]: float(r["prior_grand"]) for r in rows} == {
        2022: 375.0, 2023: 375.0}


def test_where_then_all_keeps_remaining_correlation(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, "
        "AGGREGATE(revenue) AT (WHERE region = 'US') AT (ALL region) "
        "AS us_year_total FROM sales_p"
    ))
    got = {(r["year"], r["region"]): float(r["us_year_total"]) for r in rows}
    assert got == {(2022, "EU"): 100.0, (2022, "US"): 100.0,
                   (2023, "EU"): 150.0, (2023, "US"): 150.0}


def test_compound_at_modifiers_set_visible(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, "
        "AGGREGATE(revenue) AT (SET year = year - 1 VISIBLE) AS prior_year "
        "FROM sales_yearly_p WHERE year = 2023"
    ))
    assert [(r["year"], float(r["prior_year"])) for r in rows] == [(2023, 150.0)]


def test_at_visible_without_where_is_identity(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AT (VISIBLE) "
        "AS same_as_base FROM sales_p"
    ))
    got = {(r["year"], r["region"]): float(r["same_as_base"]) for r in rows}
    assert got == {(2022, "EU"): 50.0, (2022, "US"): 100.0,
                   (2023, "EU"): 75.0, (2023, "US"): 150.0}


def test_order_by_expression_references_aliases(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AS revenue, "
        "AGGREGATE(revenue) AT (ALL region) AS year_total "
        "FROM sales_p ORDER BY revenue / year_total, year, region"
    ))
    assert [(r["year"], r["region"]) for r in rows] == [
        (2022, "EU"), (2023, "EU"), (2022, "US"), (2023, "US")]


def test_scalar_aggregate_without_group_by(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT AGGREGATE(revenue) AS total FROM sales_p"
    ))
    assert [float(r["total"]) for r in rows] == [375.0]


def test_doubled_aggregate_expression(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, 2 * AGGREGATE(revenue) AS doubled "
        "FROM sales_yearly_p"
    ))
    assert {r["year"]: float(r["doubled"]) for r in rows} == {
        2022: 300.0, 2023: 450.0}


def test_literal_constants_alongside_aggregate(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT 1000 AS marker, AGGREGATE(revenue) AS total "
        "FROM sales_p"
    ))
    assert [(r["marker"], float(r["total"])) for r in rows] == [(1000, 375.0)]
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT 'hello' AS marker, AGGREGATE(revenue) AS total "
        "FROM sales_p"
    ))
    assert [(r["marker"], float(r["total"])) for r in rows] == [("hello", 375.0)]
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, 1000 AS marker, AGGREGATE(revenue) AS total "
        "FROM sales_p ORDER BY year"
    ))
    assert [(r["year"], r["marker"], float(r["total"])) for r in rows] == [
        (2022, 1000, 150.0), (2023, 1000, 225.0)]


def test_aggregate_postfix_cast(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue)::INTEGER AS revenue_int "
        "FROM sales_yearly_p ORDER BY year"
    ))
    assert [(r["year"], int(r["revenue_int"])) for r in rows] == [
        (2022, 150), (2023, 225)]


def test_derived_measure_profit(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(profit) AS profit FROM financials_p"
    ))
    assert {r["year"]: float(r["profit"]) for r in rows} == {
        2022: 110.0, 2023: 230.0}


def test_multi_fact_join(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT o.year, o.region, AGGREGATE(revenue) AS revenue, "
        "AGGREGATE(refunds) AS refunds "
        "FROM fact_orders_p o JOIN fact_returns_p r "
        "ON o.year = r.year AND o.region = r.region"
    ))
    got = {(r["year"], r["region"]): (float(r["revenue"]), float(r["refunds"]))
           for r in rows}
    assert got == {(2022, "EU"): (50.0, 5.0), (2022, "US"): (100.0, 10.0),
                   (2023, "EU"): (75.0, 8.0), (2023, "US"): (150.0, 20.0)}


def test_multi_fact_join_with_at_all_dimension(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT o.year, o.region, "
        "AGGREGATE(revenue) AT (ALL region) AS year_total "
        "FROM fact_orders_p o JOIN fact_returns_p r "
        "ON o.year = r.year AND o.region = r.region"
    ))
    got = {(r["year"], r["region"]): float(r["year_total"]) for r in rows}
    assert got == {(2022, "EU"): 150.0, (2022, "US"): 150.0,
                   (2023, "EU"): 225.0, (2023, "US"): 225.0}


def test_percent_of_total(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AS revenue, "
        "100.0 * AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL) "
        "AS pct_of_total FROM sales_p"
    ))
    got = {(r["year"], r["region"]): float(r["pct_of_total"]) for r in rows}
    assert got[(2022, "EU")] == approx(100 * 50 / 375)
    assert got[(2023, "US")] == approx(40.0)


def test_yoy_change_and_growth_percent(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue) AS revenue, "
        "AGGREGATE(revenue) - AGGREGATE(revenue) AT (SET year = year - 1) "
        "AS yoy_change FROM sales_yearly_p"
    ))
    got = {r["year"]: r["yoy_change"] for r in rows}
    assert got[2022] is None and float(got[2023]) == 75.0
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, "
        "100.0 * (AGGREGATE(revenue) - AGGREGATE(revenue) AT (SET year = year - 1)) "
        "/ AGGREGATE(revenue) AT (SET year = year - 1) AS yoy_pct "
        "FROM sales_yearly_p"
    ))
    got = {r["year"]: r["yoy_pct"] for r in rows}
    assert got[2022] is None and float(got[2023]) == approx(50.0)


def test_combining_base_with_all_variants(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AS base, "
        "AGGREGATE(revenue) AT (ALL region) AS year_total, "
        "AGGREGATE(revenue) AT (ALL year) AS region_total, "
        "AGGREGATE(revenue) AT (ALL) AS grand_total FROM sales_p"
    ))
    got = {(r["year"], r["region"]): (
        float(r["base"]), float(r["year_total"]),
        float(r["region_total"]), float(r["grand_total"])) for r in rows}
    assert got == {
        (2022, "EU"): (50.0, 150.0, 125.0, 375.0),
        (2022, "US"): (100.0, 150.0, 250.0, 375.0),
        (2023, "EU"): (75.0, 225.0, 125.0, 375.0),
        (2023, "US"): (150.0, 225.0, 250.0, 375.0),
    }


def test_set_with_future_year(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue) AT (SET year = year + 1) "
        "AS next_year FROM sales_yearly_p"
    ))
    got = {r["year"]: r["next_year"] for r in rows}
    assert float(got[2022]) == 225.0 and got[2023] is None


def test_index_to_base_period(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue) AS revenue, "
        "AGGREGATE(revenue) / AGGREGATE(revenue) AT (SET year = 2022) "
        "AS index_to_2022 FROM sales_yearly_p"
    ))
    got = {r["year"]: float(r["index_to_2022"]) for r in rows}
    assert got == {2022: approx(1.0), 2023: approx(1.5)}


def test_at_where_complex_conditions(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, "
        "AGGREGATE(revenue) AT (WHERE year = 2023 AND region = 'US') "
        "AS us_2023 FROM sales_p"
    ))
    assert {float(r["us_2023"]) for r in rows} == {150.0}
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, "
        "AGGREGATE(revenue) AT (WHERE region = 'US' OR year = 2022) "
        "AS filtered FROM sales_p"
    ))
    assert {float(r["filtered"]) for r in rows} == {300.0}
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, region, "
        "AGGREGATE(revenue) AT (WHERE year > 2022) AS recent FROM sales_p"
    ))
    assert {float(r["recent"]) for r in rows} == {225.0}


def test_ad_hoc_dimension_all_and_set_expressions(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT MONTH(order_date) AS month_num, "
        "AGGREGATE(revenue) AS month_revenue, "
        "AGGREGATE(revenue) AT (ALL MONTH(order_date)) AS total "
        "FROM daily_orders_p"
    ))
    got = {int(r["month_num"]): (float(r["month_revenue"]), float(r["total"]))
           for r in rows}
    assert got == {1: (250.0, 840.0), 2: (320.0, 840.0), 3: (270.0, 840.0)}
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT MONTH(order_date) AS month_num, "
        "AGGREGATE(revenue) AS month_revenue, "
        "AGGREGATE(revenue) AT (SET MONTH(order_date) = 2) AS feb_revenue "
        "FROM daily_orders_p"
    ))
    got = {int(r["month_num"]): float(r["feb_revenue"]) for r in rows}
    assert got == {1: 320.0, 2: 320.0, 3: 320.0}


def test_from_detection_lowercase_and_comments(ys):
    for q in (
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AT (ALL region) "
        "AS year_total\nfrom\n    sales_p",
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AT (ALL region) "
        "AS year_total\n-- from sales_p\nFROM sales_p",
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AT (ALL region) "
        "AS year_total\n/* from sales_p */\nFROM sales_p",
    ):
        rows = rows_of(ys.sql(q))
        got = {(r["year"], r["region"]): float(r["year_total"]) for r in rows}
        assert got == {(2022, "EU"): 150.0, (2022, "US"): 150.0,
                       (2023, "EU"): 225.0, (2023, "US"): 225.0}


def test_group_by_positional_ordinal(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue) AS revenue FROM sales_p "
        "GROUP BY 1 ORDER BY 1"
    ))
    assert [(r["year"], float(r["revenue"])) for r in rows] == [
        (2022, 150.0), (2023, 225.0)]


def test_moving_total_with_set(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (2020,100.0),(2021,120.0),(2022,150.0),"
        "(2023,180.0) AS t(year, amount)"
    ).createOrReplaceTempView("yp_yearly_data")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW yearly_mt AS
SELECT year, SUM(amount) AS MEASURE revenue
FROM yp_yearly_data;
""")
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, AGGREGATE(revenue) AS current, "
        "AGGREGATE(revenue) + AGGREGATE(revenue) AT (SET year = year - 1) "
        "AS two_year_total FROM yearly_mt"
    ))
    got = {r["year"]: (float(r["current"]),
                       None if r["two_year_total"] is None
                       else float(r["two_year_total"])) for r in rows}
    assert got == {2020: (100.0, None), 2021: (120.0, 220.0),
                   2022: (150.0, 270.0), 2023: (180.0, 330.0)}


def test_case_expression_measure(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (2022,100.0),(2022,50.0),(2023,200.0),"
        "(2023,100.0) AS t(year, amount)"
    ).createOrReplaceTempView("yp_case_data")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE OR REPLACE VIEW case_measure_p AS
SELECT year, CASE WHEN SUM(amount) > 150 THEN 1 ELSE 0 END AS MEASURE high_value
FROM yp_case_data;
""")
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, AGGREGATE(high_value) AS high_value "
        "FROM case_measure_p ORDER BY year"
    ))
    assert [(r["year"], int(r["high_value"])) for r in rows] == [
        (2022, 0), (2023, 1)]


def test_null_dimensions_all_modifiers(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (2022,'US',100.0),(2022,CAST(NULL AS STRING),50.0),"
        "(2023,'US',150.0),(2023,CAST(NULL AS STRING),75.0),"
        "(CAST(NULL AS INT),'US',10.0),(CAST(NULL AS INT),CAST(NULL AS STRING),5.0) "
        "AS t(year, region, amount)"
    ).createOrReplaceTempView("yp_sales_nulls")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW sales_nulls_p AS
SELECT year, region, SUM(amount) AS MEASURE revenue
FROM yp_sales_nulls;
""")
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AT (ALL region) "
        "AS year_total FROM sales_nulls_p"
    ))
    got = {(r["year"], r["region"]): float(r["year_total"]) for r in rows}
    assert got == {
        (2022, "US"): 150.0, (2022, None): 150.0,
        (2023, "US"): 225.0, (2023, None): 225.0,
        (None, "US"): 15.0, (None, None): 15.0,
    }
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, region, AGGREGATE(revenue) AT (ALL year) "
        "AS region_total FROM sales_nulls_p"
    ))
    got = {(r["year"], r["region"]): float(r["region_total"]) for r in rows}
    assert got == {
        (2022, "US"): 260.0, (2022, None): 130.0,
        (2023, "US"): 260.0, (2023, None): 130.0,
        (None, "US"): 260.0, (None, None): 130.0,
    }


def test_count_measure_behavior(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (2022,100.0),(2022,50.0),(2023,150.0),"
        "(2023,75.0) AS t(year, amount)"
    ).createOrReplaceTempView("yp_count_sales")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW count_orders_p AS
SELECT year, COUNT(*) AS MEASURE order_count
FROM yp_count_sales;
""")
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, AGGREGATE(order_count) AS order_count "
        "FROM count_orders_p ORDER BY year"
    ))
    assert [(r["year"], int(r["order_count"])) for r in rows] == [
        (2022, 2), (2023, 2)]
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, AGGREGATE(order_count) AT (ALL) "
        "AS order_count FROM count_orders_p"
    ))
    assert {int(r["order_count"]) for r in rows} == {4}


def test_filtered_aggregate_measure_by_group(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (2022,'US',100.0),(2022,'EU',50.0),"
        "(2023,'US',150.0),(2023,'EU',75.0) AS t(year, region, amount)"
    ).createOrReplaceTempView("yp_filtered_sales")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW filtered_agg_p AS
SELECT year,
       SUM(amount) AS MEASURE total_revenue,
       SUM(amount) FILTER (WHERE region = 'US') AS MEASURE us_revenue
FROM yp_filtered_sales;
""")
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, AGGREGATE(total_revenue) AS total_revenue, "
        "AGGREGATE(us_revenue) AS us_revenue FROM filtered_agg_p ORDER BY year"
    ))
    assert [(r["year"], float(r["total_revenue"]), float(r["us_revenue"]))
            for r in rows] == [(2022, 150.0, 100.0), (2023, 225.0, 150.0)]


def test_three_dimensional_all_semantics(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (2022,'US','A',100.0),(2022,'US','B',50.0),"
        "(2022,'EU','A',80.0),(2022,'EU','B',40.0),(2023,'US','A',120.0),"
        "(2023,'US','B',60.0),(2023,'EU','A',100.0),(2023,'EU','B',50.0) "
        "AS t(year, region, category, amount)"
    ).createOrReplaceTempView("yp_products")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW products_p AS
SELECT year, region, category, SUM(amount) AS MEASURE revenue
FROM yp_products;
""")
    rows = rows_of(lyr.sql(
        "SEMANTIC SELECT year, region, category, "
        "AGGREGATE(revenue) AT (ALL region) AT (ALL category) AS year_total "
        "FROM products_p"
    ))
    got = {(r["year"], r["region"], r["category"]): float(r["year_total"])
           for r in rows}
    assert set(got.values()) == {270.0, 330.0}
    assert got[(2022, "EU", "A")] == 270.0 and got[(2023, "US", "B")] == 330.0


def test_ctas_and_insert_select_with_aggregate(ys, spark):
    """CREATE TABLE AS / INSERT INTO ... SELECT with AGGREGATE(): the
    DDL/DML prefix passes through, the SELECT compiles semantically."""
    spark.sql("DROP TABLE IF EXISTS ctas_result_p")
    spark.sql(ys.rewrite(
        "CREATE TABLE ctas_result_p AS "
        "SELECT year, region, AGGREGATE(revenue) AS revenue FROM sales_p"
    ))
    rows = spark.sql(
        "SELECT * FROM ctas_result_p ORDER BY year, region"
    ).collect()
    assert [(r["year"], r["region"], float(r["revenue"])) for r in rows] == [
        (2022, "EU", 50.0), (2022, "US", 100.0),
        (2023, "EU", 75.0), (2023, "US", 150.0)]

    spark.sql("DROP TABLE IF EXISTS insert_target_p")
    spark.sql(
        "CREATE TABLE insert_target_p (year INT, region STRING, revenue DOUBLE)"
    )
    spark.sql(ys.rewrite(
        "INSERT INTO insert_target_p "
        "SELECT year, region, AGGREGATE(revenue) FROM sales_p"
    ))
    rows = spark.sql(
        "SELECT * FROM insert_target_p ORDER BY year, region"
    ).collect()
    assert [(r["year"], r["region"], float(r["revenue"])) for r in rows] == [
        (2022, "EU", 50.0), (2022, "US", 100.0),
        (2023, "EU", 75.0), (2023, "US", 150.0)]
    spark.sql("DROP TABLE IF EXISTS ctas_result_p")
    spark.sql("DROP TABLE IF EXISTS insert_target_p")


def test_semantic_with_cte_wrapping_aggregate(ys):
    rows = rows_of(ys.sql(
        "SEMANTIC WITH a AS (SELECT year, region, AGGREGATE(revenue) "
        "AS revenue FROM sales_p) SELECT * FROM a"
    ))
    got = {(r["year"], r["region"]): float(r["revenue"]) for r in rows}
    assert got == {(2022, "EU"): 50.0, (2022, "US"): 100.0,
                   (2023, "EU"): 75.0, (2023, "US"): 150.0}


def test_ordered_set_and_mode_measures(spark):
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES ('A',1),('A',1),('A',2),('A',3),('A',4),"
        "('B',10),('B',10),('B',20) AS t(category, value)"
    ).createOrReplaceTempView("yp_ordered_set")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW ordered_set_p AS
SELECT category,
       PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value) AS MEASURE p50,
       QUANTILE_CONT(value, 0.5) AS MEASURE q50,
       MODE(value) AS MEASURE mode_value
FROM yp_ordered_set;
""")
    p50 = {r["category"]: float(r["p50"]) for r in lyr.sql(
        "SEMANTIC SELECT category, AGGREGATE(p50) AS p50 FROM ordered_set_p"
    ).collect()}
    assert p50 == {"A": 2.0, "B": 10.0}
    q50 = {r["category"]: float(r["q50"]) for r in lyr.sql(
        "SEMANTIC SELECT category, AGGREGATE(q50) AS q50 FROM ordered_set_p"
    ).collect()}
    assert q50 == {"A": 2.0, "B": 10.0}
    mode_v = {r["category"]: int(r["mode_value"]) for r in lyr.sql(
        "SEMANTIC SELECT category, AGGREGATE(mode_value) AS mode_value "
        "FROM ordered_set_p"
    ).collect()}
    assert mode_v == {"A": 1, "B": 10}


def test_duckdb_scalar_functions_over_views(spark):
    """Scalar-function select items group as ad-hoc expression dims
    (ref test_yardstick_duckdb_scalar_functions): YEAR/MONTH, UPPER,
    COALESCE over nullable dims, DATE_TRUNC, LEFT, ARRAY_LENGTH."""
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    spark.sql(
        "SELECT * FROM VALUES (DATE'2023-01-15',100.0),(DATE'2023-01-20',150.0),"
        "(DATE'2023-02-10',200.0),(DATE'2023-03-05',80.0),"
        "(DATE'2024-01-08',250.0),(DATE'2024-02-14',180.0) AS t(sale_date, amount)"
    ).createOrReplaceTempView("yp_dated_sales")
    spark.sql(
        "SELECT * FROM VALUES ('Electronics','Phones',500.0),"
        "('Electronics','Laptops',800.0),('Clothing','Shirts',100.0),"
        "('Clothing','Pants',150.0) AS t(category, subcategory, amount)"
    ).createOrReplaceTempView("yp_products_str")
    spark.sql(
        "SELECT * FROM VALUES ('US',100.0),(CAST(NULL AS STRING),50.0),"
        "('EU',75.0),(CAST(NULL AS STRING),25.0) AS t(region, amount)"
    ).createOrReplaceTempView("yp_nullable_sales")
    spark.sql(
        "SELECT * FROM VALUES (array('a','b'),100.0),(array('b','c'),150.0),"
        "(array('a'),80.0) AS t(tags, amount)"
    ).createOrReplaceTempView("yp_tagged")
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW dated_sales_p AS
SELECT sale_date, SUM(amount) AS MEASURE revenue FROM yp_dated_sales;
CREATE VIEW products_str_p AS
SELECT category, subcategory, SUM(amount) AS MEASURE revenue FROM yp_products_str;
CREATE VIEW nullable_sales_p AS
SELECT region, SUM(amount) AS MEASURE revenue FROM yp_nullable_sales;
CREATE VIEW tagged_items_p AS
SELECT tags, SUM(amount) AS MEASURE revenue FROM yp_tagged;
""")
    got = {(r[0], r[1], float(r[2])) for r in lyr.sql(
        "SEMANTIC SELECT YEAR(sale_date) AS yr, MONTH(sale_date) AS mo, "
        "AGGREGATE(revenue) AS revenue FROM dated_sales_p").collect()}
    assert got == {(2023, 1, 250.0), (2023, 2, 200.0), (2023, 3, 80.0),
                   (2024, 1, 250.0), (2024, 2, 180.0)}

    got = {(r[0], float(r[1])) for r in lyr.sql(
        "SEMANTIC SELECT UPPER(category) AS cat, AGGREGATE(revenue) "
        "AS revenue FROM products_str_p").collect()}
    assert got == {("CLOTHING", 250.0), ("ELECTRONICS", 1300.0)}

    got = {(r[0], float(r[1])) for r in lyr.sql(
        "SEMANTIC SELECT COALESCE(region, 'Unknown') AS region_bucket, "
        "AGGREGATE(revenue) AS revenue FROM nullable_sales_p").collect()}
    assert got == {("EU", 75.0), ("US", 100.0), ("Unknown", 75.0)}

    got = {(int(r[0]), float(r[1])) for r in lyr.sql(
        "SEMANTIC SELECT ARRAY_LENGTH(tags) AS tag_len, AGGREGATE(revenue) "
        "AS revenue FROM tagged_items_p").collect()}
    assert got == {(1, 80.0), (2, 250.0)}

    got = {(str(r[0])[:10], float(r[1])) for r in lyr.sql(
        "SEMANTIC SELECT DATE_TRUNC('year', sale_date) AS yr, "
        "AGGREGATE(revenue) AS revenue FROM dated_sales_p").collect()}
    assert got == {("2023-01-01", 530.0), ("2024-01-01", 430.0)}

    got = {(r[0], float(r[1])) for r in lyr.sql(
        "SEMANTIC SELECT LEFT(category, 4) AS cat_prefix, "
        "AGGREGATE(revenue) AS revenue FROM products_str_p").collect()}
    assert got == {("Clot", 250.0), ("Elec", 1300.0)}
