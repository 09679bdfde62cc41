"""Probe: reference semantic-SQL planner scenarios vs this engine.

Mirrors /root/reference/tests/queries/test_semantic_sql_planner.py's
fixture (3 orders / 2 customers) and runs its SCENARIOS (not its code)
through layer.sql(), comparing rows against hand-written DuckDB SQL on
the raw tables. The invariant probed: wrapped/BI-style SQL returns the
same rows whether or not a rewrite rule fires — wrong-fire = P1.
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from sidemantic_spark.core.layer import SparkSemanticLayer
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("""
    CREATE TABLE orders AS SELECT * FROM (VALUES
        (1, 1, 'completed', DATE '2024-01-01', CAST(100.00 AS DECIMAL(10,2))),
        (2, 1, 'completed', DATE '2024-01-02', CAST(150.00 AS DECIMAL(10,2))),
        (3, 2, 'pending',   DATE '2024-01-03', CAST(200.00 AS DECIMAL(10,2)))
    ) t(id, customer_id, status, order_date, amount)
""")
con.execute("""
    CREATE TABLE customers AS SELECT * FROM (VALUES
        (1, 'US', 'premium'), (2, 'EU', 'standard')
    ) t(id, region, tier)
""")
for t in ("orders", "customers"):
    spark.createDataFrame(con.table(t).arrow().to_pandas()).createOrReplaceTempView(t)

layer = SparkSemanticLayer(spark)
layer.add_model(Model(
    name="orders", table="orders", primary_key="id",
    dimensions=[
        Dimension(name="status", sql="status"),
        Dimension(name="order_date", type="time", sql="order_date", granularity="day"),
    ],
    metrics=[
        Metric(name="revenue", agg="sum", sql="amount"),
        Metric(name="order_count", agg="count"),
    ],
    relationships=[Relationship(name="customers", type="many_to_one", foreign_key="customer_id")],
))
layer.add_model(Model(
    name="customers", table="customers", primary_key="id",
    dimensions=[
        Dimension(name="region", sql="region"),
        Dimension(name="tier", sql="tier"),
    ],
    metrics=[Metric(name="customer_count", agg="count")],
    relationships=[Relationship(name="orders", type="one_to_many", foreign_key="customer_id")],
))

CASES = [
    # (name, semantic sql, duckdb oracle, ordered)
    ("safe_filter_pushdown_subquery",
     "SELECT * FROM (SELECT orders.revenue, customers.region FROM orders) sq WHERE region = 'US'",
     "SELECT SUM(amount) AS revenue, region FROM orders o JOIN customers c ON o.customer_id=c.id GROUP BY region HAVING region='US'",
     False),
    ("safe_filter_pushdown_cte",
     "WITH orders_agg AS (SELECT orders.revenue, orders.status FROM orders) SELECT * FROM orders_agg WHERE status = 'completed'",
     "SELECT SUM(amount) AS revenue, status FROM orders GROUP BY status HAVING status='completed'",
     False),
    ("order_limit_offset_pushdown",
     "SELECT * FROM (SELECT orders.revenue, orders.status FROM orders) sq ORDER BY status DESC LIMIT 1 OFFSET 1",
     "SELECT * FROM (SELECT SUM(amount) AS revenue, status FROM orders GROUP BY status) ORDER BY status DESC LIMIT 1 OFFSET 1",
     True),
    ("projection_flattening_alias",
     "SELECT status, revenue AS total_revenue FROM (SELECT orders.revenue, orders.status FROM orders) sq ORDER BY status",
     "SELECT status, SUM(amount) AS total_revenue FROM orders GROUP BY status ORDER BY status",
     True),
    ("mixed_and_row_plus_metric_filter",
     "SELECT * FROM (SELECT orders.revenue, orders.status FROM orders) sq WHERE status = 'completed' AND revenue > 100",
     "SELECT * FROM (SELECT SUM(amount) AS revenue, status FROM orders GROUP BY status) WHERE status='completed' AND revenue>100",
     False),
    ("mixed_or_filter_stays_postprocess",
     "SELECT * FROM (SELECT orders.revenue, orders.status FROM orders) sq WHERE status = 'pending' OR revenue > 100",
     "SELECT * FROM (SELECT SUM(amount) AS revenue, status FROM orders GROUP BY status) WHERE status='pending' OR revenue>100",
     False),
    ("agg_boundary_sum_rollup_drops_finer_dim",
     "SELECT status, SUM(revenue) AS revenue FROM (SELECT orders.status, orders.order_date__day AS d, orders.revenue FROM orders) sq GROUP BY status",
     "SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status",
     False),
    ("same_grain_agg_wrapper_flattens",
     "SELECT status, SUM(revenue) AS revenue FROM (SELECT orders.status, orders.revenue FROM orders) sq GROUP BY status",
     "SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status",
     False),
    ("agg_boundary_count_rollup",
     "SELECT status, SUM(order_count) AS n FROM (SELECT orders.status, orders.order_date__day AS d, orders.order_count FROM orders) sq GROUP BY status",
     "SELECT status, COUNT(*) AS n FROM orders GROUP BY status",
     False),
    ("agg_boundary_min_max_rollup",
     "SELECT MAX(revenue) AS mx FROM (SELECT orders.status, orders.revenue FROM orders) sq",
     "SELECT MAX(revenue) AS mx FROM (SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status)",
     False),
    # MIN over a SUM-per-status inner is NOT a sum rollup: must stay a
    # post-aggregation, never collapse to MIN(amount)
    ("agg_boundary_reject_min_of_sum",
     "SELECT MIN(revenue) AS mn FROM (SELECT orders.status, orders.revenue FROM orders) sq",
     "SELECT MIN(revenue) AS mn FROM (SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status)",
     False),
    ("time_grain_rollup_day_to_month",
     "SELECT DATE_TRUNC('month', d) AS m, SUM(revenue) AS revenue FROM (SELECT orders.order_date__day AS d, orders.revenue FROM orders) sq GROUP BY 1",
     "SELECT CAST(DATE_TRUNC('month', order_date) AS TIMESTAMP) AS m, SUM(amount) AS revenue FROM orders GROUP BY 1",
     False),
    ("conditional_agg_pivot",
     "SELECT SUM(CASE WHEN status = 'completed' THEN revenue END) AS completed_rev, SUM(CASE WHEN status = 'pending' THEN revenue END) AS pending_rev FROM (SELECT orders.status, orders.revenue FROM orders) sq",
     "SELECT SUM(CASE WHEN status='completed' THEN amount END) AS completed_rev, SUM(CASE WHEN status='pending' THEN amount END) AS pending_rev FROM orders",
     False),
    ("rownum_topn",
     "SELECT status, revenue FROM (SELECT status, revenue, ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn FROM (SELECT orders.status, orders.revenue FROM orders) inner_q) ranked WHERE rn <= 1",
     "SELECT status, revenue FROM (SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status) ORDER BY revenue DESC LIMIT 1",
     False),
    ("rownum_between_pagination",
     "SELECT status, revenue FROM (SELECT status, revenue, ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn FROM (SELECT orders.status, orders.revenue FROM orders) inner_q) ranked WHERE rn BETWEEN 2 AND 2",
     "SELECT status, revenue FROM (SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status) ORDER BY revenue DESC LIMIT 1 OFFSET 1",
     False),
    # RANK has tie semantics: must NOT rewrite to ORDER BY+LIMIT blindly;
    # correctness = same rows as evaluating the rank as written
    ("rank_tie_semantics_correct",
     "SELECT status, revenue FROM (SELECT status, revenue, RANK() OVER (ORDER BY revenue DESC) AS rn FROM (SELECT orders.status, orders.revenue FROM orders) inner_q) ranked WHERE rn <= 1",
     "SELECT status, revenue FROM (SELECT status, revenue, RANK() OVER (ORDER BY revenue DESC) AS rn FROM (SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status)) WHERE rn <= 1",
     False),
    # partitioned rank = per-group top-n, NOT a global limit
    ("partitioned_rank_not_global_limit",
     "SELECT status, d, revenue FROM (SELECT status, d, revenue, ROW_NUMBER() OVER (PARTITION BY status ORDER BY revenue DESC) AS rn FROM (SELECT orders.status, orders.order_date__day AS d, orders.revenue FROM orders) inner_q) ranked WHERE rn <= 1",
     "SELECT status, d, revenue FROM (SELECT status, d, revenue, ROW_NUMBER() OVER (PARTITION BY status ORDER BY revenue DESC) AS rn FROM (SELECT status, CAST(DATE_TRUNC('day', order_date) AS TIMESTAMP) AS d, SUM(amount) AS revenue FROM orders GROUP BY 1, 2)) WHERE rn <= 1",
     False),
    # outer projection of the rank column: the rn value must survive
    ("rank_column_projected",
     "SELECT status, rn FROM (SELECT status, revenue, ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn FROM (SELECT orders.status, orders.revenue FROM orders) inner_q) ranked WHERE rn <= 2",
     "SELECT status, rn FROM (SELECT status, revenue, ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rn FROM (SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status)) WHERE rn <= 2",
     False),
    ("distinct_dims_wrapper",
     "SELECT DISTINCT status FROM (SELECT orders.status, orders.revenue FROM orders) sq ORDER BY status",
     "SELECT DISTINCT status FROM orders ORDER BY status",
     True),
    ("distinct_slicer_like_search",
     "SELECT DISTINCT status FROM (SELECT orders.status, orders.revenue FROM orders) sq WHERE LOWER(status) LIKE '%comp%' ORDER BY status",
     "SELECT DISTINCT status FROM orders WHERE LOWER(status) LIKE '%comp%' ORDER BY status",
     True),
    ("union_all_semantic_branches",
     "SELECT orders.status, orders.revenue FROM orders WHERE orders.status = 'completed' UNION ALL SELECT orders.status, orders.revenue FROM orders WHERE orders.status = 'pending'",
     "SELECT status, SUM(amount) AS revenue FROM orders WHERE status='completed' GROUP BY status UNION ALL SELECT status, SUM(amount) AS revenue FROM orders WHERE status='pending' GROUP BY status",
     False),
    ("hex_style_union_preview_outer_limit",
     "WITH preview AS (SELECT orders.status, orders.revenue FROM orders) SELECT * FROM preview ORDER BY status LIMIT 1",
     "SELECT * FROM (SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status) ORDER BY status LIMIT 1",
     True),
    ("unqualified_dim_filter_qualified",
     "SELECT orders.revenue, orders.status FROM orders WHERE status = 'completed'",
     "SELECT SUM(amount) AS revenue, status FROM orders GROUP BY status HAVING status='completed'",
     False),
    ("redundant_group_by_dims",
     "SELECT orders.status, orders.revenue FROM orders GROUP BY orders.status",
     "SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status",
     False),
    ("root_having_metric_filter",
     "SELECT orders.status, orders.revenue FROM orders HAVING revenue > 150",
     "SELECT status, SUM(amount) AS revenue FROM orders GROUP BY status HAVING SUM(amount) > 150",
     False),
]


def canon(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    return v


failures = []
for name, sem_sql, oracle_sql, ordered in CASES:
    try:
        df = layer.sql(sem_sql)
        got_cols = sorted(c.lower() for c in df.columns)
        by_name = {c.lower(): c for c in df.columns}
        got = [tuple(canon(r[by_name[c]]) for c in got_cols) for r in df.collect()]
        res = con.execute(oracle_sql)
        ocols = [d[0].lower() for d in res.description]
        idx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        want_cols = [ocols[i] for i in idx]
        want = [tuple(canon(r[i]) for i in idx) for r in res.fetchall()]
        if got_cols != want_cols:
            failures.append((name, f"SCHEMA {got_cols} vs {want_cols}"))
            print(f"FAIL {name}: SCHEMA {got_cols} vs {want_cols}")
            continue
        if not ordered:
            got, want = sorted(got, key=repr), sorted(want, key=repr)
        if got != want:
            failures.append((name, f"ROWS got={got} want={want}"))
            print(f"FAIL {name}: got={got} want={want}")
        else:
            print(f"ok   {name}")
    except Exception as e:
        failures.append((name, f"{type(e).__name__}: {str(e)[:160]}"))
        print(f"ERR  {name}: {type(e).__name__}: {str(e)[:160]}")

print(f"\n{len(CASES) - len(failures)}/{len(CASES)} pass")
