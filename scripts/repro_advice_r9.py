"""Round-9 ADVICE reproduction/validation (run manually, not a test)."""
import os
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from sidemantic_spark.models.tpch import build_layer

layer = build_layer(spark, "/root/testdata/sf0.001")

# --- ADVICE 1: unaliased first table + aliased second -----------------
sql1 = ("SELECT customer.mktsegment, orders.revenue "
        "FROM orders JOIN customer c ON orders.custkey = c.c_custkey")
out = layer.rewrite(sql1)
print("ADVICE1a OK (unaliased-first + aliased-second compiles)")

# RIGHT JOIN must error loudly, not silently drop the keyword
try:
    layer.rewrite("SELECT orders.revenue FROM orders RIGHT JOIN customer c "
                  "ON orders.custkey = c.c_custkey")
    print("ADVICE1b FAIL: RIGHT JOIN silently accepted")
except Exception as e:
    print(f"ADVICE1b OK (RIGHT JOIN rejected: {type(e).__name__})")

# --- ADVICE 2: expr dims must not leak into later SELECT * ------------
layer.rewrite("SELECT MONTH(orders.order_date), AGGREGATE(orders.revenue) FROM orders")
star = layer.rewrite("SELECT * FROM orders")
assert "expr_dim_" not in star, "expr_dim leaked into SELECT *"
om = layer.graph.get_model("orders")
leaked = [d.name for d in om.dimensions if d.name.startswith("expr_dim_")]
assert not leaked, f"expr dims left on model: {leaked}"
print("ADVICE2 OK (no expr_dim leak into model or SELECT *)")

# --- ADVICE 3: apostrophe inside a block comment ----------------------
df = layer.sql("SELECT orders.status /* don't */ , orders.revenue FROM orders")
assert df.count() > 0
print("ADVICE3 OK (apostrophe-in-comment compiles)")

# --- ADVICE 4: yardstick view WHERE ... ORDER BY ----------------------
from sidemantic_spark.adapters.yardstick import _VIEW_HEAD_RE, _scan_view

text = ("CREATE VIEW v1 AS SELECT x, SUM(y) AS MEASURE total FROM t "
        "WHERE x > 3 ORDER BY x;")
m = _VIEW_HEAD_RE.search(text)
sel, tgt, where, _cte, _ = _scan_view(text, m.end())
assert where == "x > 3", f"where={where!r}"
text2 = ("CREATE VIEW v2 AS SELECT x, SUM(y) AS MEASURE total FROM t "
         "WHERE x = 'GROUP BY literal' GROUP BY x;")
m2 = _VIEW_HEAD_RE.search(text2)
_, _, where2, _cte2, _ = _scan_view(text2, m2.end())
assert where2 == "x = 'GROUP BY literal'", f"where2={where2!r}"
print("ADVICE4 OK (trailing clause trim is quote-aware)")

print("ALL ADVICE FIXES VERIFIED")
