"""Deterministic job/stage/task audit per bench query (noise-immune).

Runs every bench query once (after a warmup execution of the same
query, so one-time probe gates that cache per-operator are counted in
steady state = the bench's timed regime) on local[N] and records how
many Spark jobs, stages and tasks the terminal action triggers. Wall
time on a contended box is noisy; job counts are exact, and each job
is a fixed scheduler round-trip that dominates light queries at the
driver's lower-core-count bench.

Usage: python scripts/job_audit.py [--only a,b] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument("--no-warm", action="store_true",
                    help="count the FIRST execution instead (includes "
                    "one-time gate probes)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("job-audit")
        .config("spark.sql.shuffle.partitions", str(max(int(args.cpus), 8)))
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
    sc = spark.sparkContext

    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)
    queries = entry_mod.queries()

    import bench as bench_mod

    names = bench_mod.HEADLINE + bench_mod.EXTRA
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]

    from sidemantic_spark.models.tpch import register_tables

    register_tables(spark, sf_dir)
    spark.table("lineitem").count()

    out: dict[str, int] = {}
    for name in names:
        fn = queries[name]
        if not args.no_warm:
            fn(spark, sf_dir).count()   # steady-state gates cached
        sc.setJobGroup(f"audit_{name}", name)
        before = sc._jsc.sc().dagScheduler().nextJobId()
        fn(spark, sf_dir).count()
        after = sc._jsc.sc().dagScheduler().nextJobId()
        sc.setJobGroup(None, None)
        out[name] = after - before
        print(f"# {name}: {after - before} jobs", file=sys.stderr)
    print(json.dumps({"cpus": int(args.cpus), "sf_dir": sf_dir, "jobs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
