"""A/B study (optimization round): multi-fact combine shape.

Compiles multifact_split's REAL generated SQL both ways — the null-safe
FULL OUTER chain (generator.multifact_union_combine=False) and the
UNION ALL + re-aggregate combine (True) — proves the result sets
identical in-session, and times both with the noop sink (guide §1.4),
interleaved best-of-N, under bench-identical session configs.

Usage: python scripts/profile_multifact_r12.py [--repeats N] [--plans]
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
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--plans", action="store_true",
                    help="write plans/r12 after-plan for the union shape")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-multifact")
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
    kw = dict(
        metrics=["orders.revenue", "customer.total_acctbal"],
        dimensions=["nation.name AS nation_name"],
    )
    gen = layer.generator
    gen.multifact_union_combine = True
    union_sql = layer.compile(**kw)
    gen.multifact_union_combine = False
    join_sql = layer.compile(**kw)
    gen.multifact_union_combine = True
    assert "UNION ALL" in union_sql and "FULL OUTER JOIN" in join_sql

    # equivalence: canonical sorted-row compare, same session
    def rows(sql: str):
        return sorted(
            tuple(str(v) for v in r) for r in spark.sql(sql).collect()
        )

    a, b = rows(union_sql), rows(join_sql)
    assert a == b, f"result mismatch: {len(a)} vs {len(b)} rows"
    print(f"equivalence OK ({len(a)} rows)", flush=True)

    def noop(sql: str) -> float:
        t0 = time.perf_counter()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both plan shapes
    noop(union_sql), noop(join_sql)
    u_t, j_t = [], []
    for i in range(args.repeats):
        spark.sparkContext.setJobDescription(f"multifact join shape #{i}")
        j_t.append(noop(join_sql))
        spark.sparkContext.setJobDescription(f"multifact union shape #{i}")
        u_t.append(noop(union_sql))
    spark.sparkContext.setJobDescription(None)

    import statistics as st

    print(f"join  shape: best {min(j_t):.3f}  med {st.median(j_t):.3f}  {[round(t,3) for t in j_t]}")
    print(f"union shape: best {min(u_t):.3f}  med {st.median(u_t):.3f}  {[round(t,3) for t in u_t]}")

    if args.plans:
        df = spark.sql(union_sql)
        with open(os.path.join(root, "plans/r12/multifact_split_after.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print("wrote plans/r12/multifact_split_after.txt")

    spark.stop()


if __name__ == "__main__":
    main()
