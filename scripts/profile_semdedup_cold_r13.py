"""Cold-run profiler for sim_semantic_dedup (r13 VERDICT item 1).

The r12 broadcast-verify win was proven only with warm interleaved
A/Bs; the driver's cold bench runs read SLOWER at both core counts.
This script reproduces the driver's conditions: a FRESH JVM with the
exact bench session configs, generic warmup only (the bench warms
minhash/basic_agg/text_profile — none of them shares the semantic
dedup plan), then best-of-3 count() timings of the entry, exactly like
bench.py's time_query.

Usage:
    python scripts/profile_semdedup_cold_r13.py entry [variant]
        variant: auto (default) | long | broadcast
    python scripts/profile_semdedup_cold_r13.py phases
        per-phase breakdown (probe / pairs-collect / final count)

Each invocation is ONE fresh JVM; run it several times for independent
cold samples.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session() -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("semdedup-cold-profile")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warm(spark: SparkSession) -> None:
    from sidemantic_spark.models.tpch import register_tables

    register_tables(spark, SF_DIR)
    spark.table("lineitem").count()
    # generic JVM/Arrow warmup as in bench.py (but NOT the semantic
    # dedup plan itself: the bench never warms it either)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    qs["basic_agg"](spark, SF_DIR).count()
    qs["text_profile"](spark, SF_DIR).count()
    # one Arrow-kernel query so Python workers exist (bench warms
    # minhash, which spins them up) — use sim_cosine_topk, which does
    # not share the semantic-dedup plan
    qs["sim_cosine_topk"](spark, SF_DIR).count()
    return qs


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "entry"
    variant = sys.argv[2] if len(sys.argv) > 2 else "auto"
    spark = build_session()
    qs = warm(spark)

    from pyspark.sql import functions as F

    emb_path = os.path.join(SF_DIR, "embeddings.parquet")

    if mode == "entry":
        from sidemantic_spark.operators.similarity import semantic_dedup

        bv = {"auto": None, "long": False, "broadcast": True}[variant]

        def run():
            df = spark.read.parquet(emb_path)
            if bv is None:
                out = semantic_dedup(df, min_cosine=0.4)
            else:
                # inline semantic_dedup with a forced verify strategy
                from sidemantic_spark.operators.dedup import connected_components
                from sidemantic_spark.operators.similarity import (
                    embedding_near_dup_pairs,
                )

                pairs = embedding_near_dup_pairs(
                    df, min_cosine=0.4, broadcast_verify=bv
                )
                comps = connected_components(pairs).withColumnRenamed(
                    "doc_id", "__node"
                )
                out = (
                    df.select(F.col("vec_id"))
                    .join(comps, F.col("vec_id") == F.col("__node"), "left")
                    .select(
                        F.col("vec_id"),
                        F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias(
                            "cluster_id"
                        ),
                        (
                            F.coalesce(F.col("cluster_id"), F.col("vec_id"))
                            == F.col("vec_id")
                        ).alias("keep"),
                    )
                )
            return out.count()

        times = []
        for i in range(3):
            t0 = time.perf_counter()
            n = run()
            times.append(time.perf_counter() - t0)
        print(
            f"RESULT variant={variant} rows={n} "
            f"times={[round(t, 3) for t in times]} best={min(times):.3f}"
        )
    elif mode == "phases":
        from sidemantic_spark.operators.dedup import (
            _bounded_count,
            connected_components,
        )
        from sidemantic_spark.operators.similarity import embedding_near_dup_pairs

        for rep in range(3):
            df = spark.read.parquet(emb_path)
            t0 = time.perf_counter()
            c = _bounded_count(df, 100_000)
            t1 = time.perf_counter()
            pairs = embedding_near_dup_pairs(df, min_cosine=0.4)
            t2 = time.perf_counter()
            comps = connected_components(pairs).withColumnRenamed(
                "doc_id", "__node"
            )
            t3 = time.perf_counter()
            out = (
                df.select(F.col("vec_id"))
                .join(comps, F.col("vec_id") == F.col("__node"), "left")
                .select(
                    F.col("vec_id"),
                    F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias(
                        "cluster_id"
                    ),
                    (
                        F.coalesce(F.col("cluster_id"), F.col("vec_id"))
                        == F.col("vec_id")
                    ).alias("keep"),
                )
            )
            n = out.count()
            t4 = time.perf_counter()
            print(
                f"PHASES rep={rep} probe={t1-t0:.3f} "
                f"build_pairs_df(incl probe job)={t2-t1:.3f} "
                f"cc(pairs collect+union-find)={t3-t2:.3f} "
                f"final_count={t4-t3:.3f} total={t4-t0:.3f} rows={n}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
