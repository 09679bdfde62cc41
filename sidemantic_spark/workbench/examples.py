"""Example semantic SQL queries for the workbench (ref
workbench/examples.py, adapted to the demo TPC-H graph)."""

EXAMPLE_QUERIES = {
    "Timeseries": """-- Revenue by month and segment
SELECT
  orders.order_date__month,
  customer.mktsegment,
  orders.revenue,
  orders.order_count
FROM orders
ORDER BY order_date__month DESC, mktsegment""",
    "Top Segments": """-- Segments by revenue
SELECT
  customer.mktsegment,
  orders.revenue,
  orders.order_count
FROM orders
ORDER BY orders.revenue DESC
LIMIT 10""",
    "Aggregates": """-- Revenue metrics by status
SELECT
  orders.status,
  orders.revenue,
  orders.avg_order_value,
  orders.order_count
FROM orders
ORDER BY orders.revenue DESC""",
    "Custom": """-- Write your custom query here
SELECT

FROM """,
}
