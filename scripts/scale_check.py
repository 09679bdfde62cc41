"""sf0.1 -> sf1 scaling checkpoint for the heaviest operators
(VERDICT r7 ask #5).

No sf1 parquet ships in /root/testdata, so this script synthesizes one
from sf0.1 by DECORRELATED 10x replication — built so each operator's
workload SHAPE scales instead of degenerating:

- documents: per replica r, letters and digits Caesar-shift by r — a
  bijection on the alphabet, so every within-replica CHARACTER-shingle
  and word-n-gram Jaccard relationship is preserved EXACTLY while
  cross-replica shingle sets are (near-)disjoint (a naive 10x copy —
  or a word-suffix scheme, which leaves intra-word char shingles
  shared — would create 10-deep duplicate cliques, the known
  pathological minhash shape). Duplicate DENSITY stays at the sf0.1
  rate; duplicate COUNT scales 10x.
- embeddings: per replica r, dimensions are rotated by r positions
  (np.roll as slice||slice) — cosine within a replica is invariant
  under the shared permutation, cross-replica cosine of a vector vs its
  rotated copy is ~random, so the near-dup graph scales instead of
  densifying.
- TPC-H facts/dims (orders, lineitem, customer, supplier, part,
  events): join keys shift by r * 10^9 per replica, so referential
  integrity and per-key fan-out are preserved exactly; region/nation
  stay fixed (25 nations at every scale, like TPC-H itself).

Usage:
    python scripts/scale_check.py [--rebuild] [--repeats N]

Prints one JSON line with per-operator sf0.1/sf1 wall times and the
wall-time ratio per 10x rows; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPLICAS = 10
STRIDE = 10**9
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_synth_sf1"
)

# the six heaviest operators (VERDICT r7 plan audit)
OPS = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "sim_semantic_dedup",
    "pipeline_decontaminate",
    "fanout_dedup",
    # round-8 operators (VERDICT r8 ask #4): the indexed-BM25 claim
    # (vocabulary-sized index, term-pruned scan) should show a
    # near-flat ratio; sessionization is one exchange on user_id;
    # chunking is map-only
    "text_bm25_topk",
    "text_bm25_indexed",
    "events_sessionize",
    "sim_ann_quantized_topk",
    "pipeline_chunk_docs",
]

# adversarial duplicate-density run (VERDICT r8 ask #5): replicas keep
# IDENTICAL text/embeddings (only keys shift), creating 10-deep exact
# near-dup cliques — the pathological shape for LSH pair expansion.
# The bucket cap (pairs_from_bucket_keys bucket_cap=256) must bound
# the emitted pairs, so wall time should stay within ~the benign sf1
# run even though duplicate density is 10x worse.
ADVERSARIAL_OPS = ["sim_semantic_dedup", "dedup_minhash_lsh"]
SF1_ADV_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_ADV_DIR", "/tmp/spark_graft_synth_sf1_adv"
)

# key columns shifted by replica * STRIDE per table
KEY_SHIFTS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
COPY_AS_IS = ["region", "nation"]


def build_sf1(spark, rebuild: bool = False, adversarial: bool = False) -> str:
    """Benign mode decorrelates replicas (Caesar-shifted text, rotated
    embeddings); adversarial mode keeps them IDENTICAL so every
    document/vector sits in a 10-deep exact-duplicate clique."""
    out_dir = SF1_ADV_DIR if adversarial else SF1_DIR
    marker = os.path.join(out_dir, "_SYNTH_COMPLETE")
    if os.path.exists(marker) and not rebuild:
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    rep = spark.range(REPLICAS).withColumnRenamed("id", "__rep")
    for table, keys in KEY_SHIFTS.items():
        df = spark.read.parquet(f"{SF01}/{table}.parquet")
        out = df.crossJoin(F.broadcast(rep))
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(STRIDE))
        if table == "documents" and not adversarial:
            # alphabet bijection per replica: Caesar-shift letters (both
            # cases by the same r, so the operators' lowercasing keeps
            # the bijection) and digits; whitespace/punct stay fixed
            import string

            lo, up, dg = (string.ascii_lowercase, string.ascii_uppercase,
                          string.digits)
            src = lo + up + dg
            text_col = F.col("text")
            for r in range(1, REPLICAS):
                dst = (lo[r:] + lo[:r]) + (up[r:] + up[:r]) + (dg[r:] + dg[:r])
                text_col = F.when(
                    F.col("__rep") == r, F.translate(F.col("text"), src, dst)
                ).otherwise(text_col)
            out = out.withColumn("text", text_col)
        if table == "embeddings" and not adversarial:
            # rotate dims by replica: slice(v, r+1, 64-r) || slice(v, 1, r)
            dim = len(df.select("embedding").first()[0])
            out = out.withColumn(
                "embedding",
                F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(
                            F.col("embedding"),
                            F.col("__rep") + 1,
                            F.lit(dim) - F.col("__rep"),
                        ),
                        F.slice(F.col("embedding"), 1, F.col("__rep")),
                    )
                ),
            )
        out = out.drop("__rep")
        parts = 16 if table == "lineitem" else 4
        out.repartition(parts).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        print(f"# built {table} x{REPLICAS}", file=sys.stderr)
    for table in COPY_AS_IS:
        src = f"{SF01}/{table}.parquet"
        dst = f"{out_dir}/{table}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    repeats = 2
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sidemantic-spark-scale-check")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(here, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries = entry.queries()

    sf1 = build_sf1(spark, rebuild)

    # warmup: run every op once at sf0.01 so Janino codegen + JIT
    # tiering settle before any timed repeat (multi-second plan shapes
    # settle over ~3-5 executions; see bench.py warmup rationale)
    warm_dir = SF01.replace("sf0.1", "sf0.01")
    for op in OPS:
        queries[op](spark, warm_dir).count()
        queries[op](spark, warm_dir).count()

    results: dict[str, dict] = {}
    for op in OPS:
        fn = queries[op]
        rec: dict = {}
        for label, d in (("sf0.1", SF01), ("sf1", sf1)):
            times, rows = [], 0
            for _ in range(repeats):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                times.append(time.perf_counter() - t0)
            rec[label] = {"sec": round(min(times), 3), "rows": rows,
                          "repeats": [round(t, 3) for t in times]}
            print(f"# {op} @{label}: {min(times):.2f}s ({rows} rows)",
                  file=sys.stderr)
        rec["wall_ratio_per_10x_rows"] = round(
            rec["sf1"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9), 2
        )
        results[op] = rec

    # adversarial duplicate-density pass (r8 ask #5): same row count as
    # benign sf1 but 10-deep exact-duplicate cliques; the bucket cap
    # must keep wall time in the same regime as the benign run
    adv_results: dict[str, dict] = {}
    if "--skip-adversarial" not in sys.argv:
        adv = build_sf1(spark, rebuild, adversarial=True)
        for op in ADVERSARIAL_OPS:
            fn = queries[op]
            times, rows = [], 0
            for _ in range(repeats):
                t0 = time.perf_counter()
                rows = fn(spark, adv).count()
                times.append(time.perf_counter() - t0)
            benign = results.get(op, {}).get("sf1", {}).get("sec")
            adv_results[op] = {
                "sec": round(min(times), 3),
                "rows": rows,
                "benign_sf1_sec": benign,
                "adv_over_benign": round(min(times) / benign, 2) if benign else None,
            }
            print(f"# {op} @sf1-adversarial: {min(times):.2f}s ({rows} rows)",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "sf01_to_sf1_scaling",
        "replicas": REPLICAS,
        "ops": results,
        "adversarial": adv_results,
        "note": (
            "ratio < 10 = sublinear wall-clock per 10x rows (fixed "
            "overhead amortizing / parallelism headroom); ratio ~10 = "
            "linear; ratio > 10 names the next perf target. "
            "adversarial = identical-replica sf1 (10-deep duplicate "
            "cliques): adv_over_benign near 1 shows the bucket cap "
            "bounds pathological pair expansion"
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
