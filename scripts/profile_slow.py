"""Ad-hoc profiler for the SLOW contract entries: bare local[8]
session like strict_compare, warm the session first, then time each
heavy entry twice (cold plan vs warm plan)."""
import importlib.util, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

SF = "/root/testdata/sf0.01"
qs = mod.queries()

# warm: parquet footers, Python worker pool, codegen of a small Arrow UDF job
t0 = time.perf_counter()
qs["dedup_exact_stats"](spark, SF).collect()
qs["sim_cosine_topk"](spark, SF).collect()
print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

for name in sys.argv[1:] or ["dedup_simhash", "dedup_ngram_jaccard", "dedup_clusters", "sim_semantic_dedup"]:
    for run in (1, 2):
        t0 = time.perf_counter()
        n = qs[name](spark, SF).count()
        print(f"{name} run{run}: {time.perf_counter()-t0:.2f}s rows={n}", flush=True)
