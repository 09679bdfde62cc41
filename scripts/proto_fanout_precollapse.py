"""Prototype study (optimization round): pre-collapse the fan-out base
before the pk join in the dedup-grouped plan.

Compiles the REAL generated fanout_dedup SQL, constructs a hand-written
variant that collapses (base join key, dims) to DISTINCT *before* the
fact pk join, and times both with the noop sink (guide §1.4),
interleaved best-of-N, under bench-identical session configs. Also
strict-compares the two result sets so the measurement and the
equivalence proof come from the same session.

Usage: python scripts/proto_fanout_precollapse.py [--repeats N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("proto-fanout-precollapse")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    layer = entry_mod._layer(spark, sf_dir)
    current_sql = layer.compile(
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["lineitem.returnflag"],
    )
    print("=== CURRENT generated SQL ===")
    print(current_sql)

    # Variant: DISTINCT (l_orderkey, returnflag) BEFORE the orders pk
    # join.  Equivalence argument: orders.o_orderkey is the pk (unique),
    # so the 1:1 pk join maps distinct (l_orderkey, flag) pairs to
    # distinct (__pk0, flag) pairs except that ALL unmatched keys
    # collapse to (__pk0 NULL, flag) post-join in the current plan;
    # in the variant each unmatched key stays its own row, but every
    # such row contributes 0 to COUNT(CASE WHEN pk NOT NULL) and NULL
    # to SUM, so the aggregates are identical.
    variant_sql = """
SELECT
    returnflag,
    SUM(revenue_raw) AS revenue,
    COUNT(CASE WHEN __pk0 IS NOT NULL THEN 1 END) AS order_count
FROM (
    SELECT orders_cte.__pk0 AS __pk0, __p.returnflag, orders_cte.revenue_raw
    FROM (
        SELECT DISTINCT l_orderkey AS __jk0, l_returnflag AS returnflag
        FROM lineitem
    ) __p
    LEFT JOIN (
        SELECT o_orderkey AS __pk0,
               CAST(o_totalprice AS DECIMAL(18,2)) AS revenue_raw
        FROM orders
    ) orders_cte ON __p.__jk0 = orders_cte.__pk0
) __dedup
GROUP BY returnflag
"""

    def df_cur():
        return spark.sql(current_sql)

    def df_var():
        return spark.sql(variant_sql)

    # equivalence check inside the same session
    cur_rows = sorted(tuple(r) for r in df_cur().collect())
    var_rows = sorted(tuple(r) for r in df_var().collect())
    print("EQUIVALENT:", cur_rows == var_rows)
    if cur_rows != var_rows:
        print("cur:", cur_rows[:5])
        print("var:", var_rows[:5])
        spark.stop()
        sys.exit(1)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup both
    noop(df_cur())
    noop(df_var())

    cur_times, var_times = [], []
    for i in range(args.repeats):
        spark.sparkContext.setJobDescription(f"proto:cur:{i}")
        t = time.perf_counter(); noop(df_cur()); cur_times.append(time.perf_counter() - t)
        spark.sparkContext.setJobDescription(f"proto:var:{i}")
        t = time.perf_counter(); noop(df_var()); var_times.append(time.perf_counter() - t)

    print("current best/med:", round(min(cur_times), 4),
          round(sorted(cur_times)[len(cur_times) // 2], 4), cur_times)
    print("variant best/med:", round(min(var_times), 4),
          round(sorted(var_times)[len(var_times) // 2], 4), var_times)
    spark.stop()


if __name__ == "__main__":
    main()
