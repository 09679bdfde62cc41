"""r13 optimization-round profiler: capture .explain("formatted") and
noop-sink timings for every bench query (headline + extra).

Usage:
    python scripts/profile_r13.py [--tag before|after] [--only name1,name2]
    [--repeats N]

Writes plans to plans/r13/<query>_<tag>.txt and prints a JSON line of
noop-sink best-of-N seconds per query. The noop sink (guide §1.4)
computes every column and discards the result, so the timing measures
the computation rather than driver row collection; bench.py's .count()
timings remain the like-for-like driver numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r13-profile")
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
    queries = entry_mod.queries()

    import bench as bench_mod

    names = bench_mod.HEADLINE + bench_mod.EXTRA
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]

    plans_dir = os.path.join(root, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    # warmup (same as bench: registration + codegen/JIT settle)
    from sidemantic_spark.models.tpch import register_tables

    register_tables(spark, sf_dir)
    spark.table("lineitem").count()
    queries["basic_agg"](spark, sf_dir).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"r13:{name}")
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: BUILD FAILED {exc}", file=sys.stderr)
            continue
        if not args.no_plans:
            try:
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception:  # noqa: BLE001
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 4)
        print(f"# {name}: {out[name]:.3f}s  {[round(t,3) for t in times]}",
              file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "noop_sec": out}))
    spark.stop()


if __name__ == "__main__":
    main()
