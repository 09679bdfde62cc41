"""Profile fanout_symmetric_aggs components at sf0.1 (noop-timed).

Variants:
  full      - the generated symmetric SQL as-is
  joined    - the joined+symkey projection subquery alone (no distinct aggs)
  joined0   - the join alone, no symkey expression
  hashint   - symmetric SQL with xxhash64(pk) over the native bigint
              (no CAST AS STRING)
  twolevel  - result-equivalent two-level aggregation (pre-group by
              (dims, pk) then plain SUM/COUNT) for comparison
"""
import os
import sys
import time

from pyspark.sql import SparkSession

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("profile_sym_r12")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

layer = E._layer(spark, sf_dir)
gen = layer.generator
gen.fanout_strategy = "symmetric"
full_sql = layer.compile(
    metrics=["orders.revenue", "orders.order_count"],
    dimensions=["lineitem.returnflag"],
)
gen.fanout_strategy = "auto"

joined = """
SELECT lineitem_cte.returnflag AS returnflag,
       orders_cte.__pk0 AS __pkc,
       CAST(pmod(xxhash64(CAST(orders_cte.__pk0 AS STRING)), 100000000000000) AS DECIMAL(38,6)) * 10000000000 AS __symkey,
       orders_cte.revenue_raw
FROM (SELECT l_returnflag AS returnflag, l_orderkey FROM lineitem) lineitem_cte
LEFT JOIN (SELECT o_orderkey, o_orderkey AS __pk0, CAST(o_totalprice AS DECIMAL(18,2)) AS revenue_raw FROM orders) orders_cte
  ON lineitem_cte.l_orderkey = orders_cte.o_orderkey
"""

joined0 = """
SELECT lineitem_cte.returnflag AS returnflag,
       orders_cte.__pk0 AS __pkc,
       orders_cte.revenue_raw
FROM (SELECT l_returnflag AS returnflag, l_orderkey FROM lineitem) lineitem_cte
LEFT JOIN (SELECT o_orderkey, o_orderkey AS __pk0, CAST(o_totalprice AS DECIMAL(18,2)) AS revenue_raw FROM orders) orders_cte
  ON lineitem_cte.l_orderkey = orders_cte.o_orderkey
"""

hashint = f"""
WITH j AS (
  SELECT lineitem_cte.returnflag AS returnflag,
         orders_cte.__pk0 AS __pkc,
         CAST(pmod(xxhash64(orders_cte.__pk0), 100000000000000) AS DECIMAL(38,6)) * 10000000000 AS __symkey,
         orders_cte.revenue_raw
  FROM (SELECT l_returnflag AS returnflag, l_orderkey FROM lineitem) lineitem_cte
  LEFT JOIN (SELECT o_orderkey, o_orderkey AS __pk0, CAST(o_totalprice AS DECIMAL(18,2)) AS revenue_raw FROM orders) orders_cte
    ON lineitem_cte.l_orderkey = orders_cte.o_orderkey
)
SELECT returnflag,
       CAST(SUM(DISTINCT __symkey + COALESCE(CAST(revenue_raw AS DECIMAL(38,6)), 0)) - SUM(DISTINCT __symkey) AS DOUBLE) AS revenue,
       COUNT(DISTINCT __pkc) AS order_count
FROM j GROUP BY returnflag ORDER BY returnflag
"""

twolevel = """
WITH j AS (
  SELECT lineitem_cte.returnflag AS returnflag,
         orders_cte.__pk0 AS __pkc,
         orders_cte.revenue_raw
  FROM (SELECT l_returnflag AS returnflag, l_orderkey FROM lineitem) lineitem_cte
  LEFT JOIN (SELECT o_orderkey, o_orderkey AS __pk0, CAST(o_totalprice AS DECIMAL(18,2)) AS revenue_raw FROM orders) orders_cte
    ON lineitem_cte.l_orderkey = orders_cte.o_orderkey
),
g AS (
  SELECT returnflag, __pkc, MAX(revenue_raw) AS rev
  FROM j GROUP BY returnflag, __pkc
)
SELECT returnflag, CAST(SUM(rev) AS DOUBLE) AS revenue, COUNT(__pkc) AS order_count
FROM g GROUP BY returnflag ORDER BY returnflag
"""


def t(name, sql, n=3):
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(f"sym:{name}")
        t0 = time.time()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:10s} best-of-{n}: {best:.3f}s")
    return best


# warm the scans
spark.sql("SELECT COUNT(*) FROM lineitem").collect()
spark.sql("SELECT COUNT(*) FROM orders").collect()

t("joined0", joined0)
t("joined", joined)
t("full", full_sql)
t("hashint", hashint)
t("twolevel", twolevel)

# sanity: identical results
a = spark.sql(full_sql).collect()
b = spark.sql(hashint).collect()
c = spark.sql(twolevel).collect()
print("full==hashint:", sorted(map(tuple, a)) == sorted(map(tuple, b)))
print("full==twolevel:", sorted(map(tuple, a)) == sorted(map(tuple, c)))
spark.stop()
