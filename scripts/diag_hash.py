"""Diagnose r01 hash mismatches: raw-value diff Spark vs DuckDB, no rounding.

Prints, for each named query, the first rows whose canonical-exact values
differ, with Python types, so we can see whether mismatches are float-order
noise, type differences, or real value differences.
"""
import importlib.util, datetime, decimal, sys, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

FAILING = sys.argv[1:] or [
    "basic_agg", "time_grain_month", "with_totals", "fill_nulls_zero",
    "timezone_month", "relative_date_filter", "complete_sql_measure",
    "jinja_param_filter", "semantic_sql_cte_island", "semantic_sql_union",
    "semantic_sql_qualify_topn", "semantic_sql_time_rollup",
    "yardstick_aggregate", "table_calc_pct_of_total", "table_calc_moving_avg",
    "join_multi_hop", "fanout_dedup", "multifact_split", "join_part_brand",
    "running_total", "rolling_window_90d", "ytd", "mom_pct_change",
    "yoy_difference",
]

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    return (type(v).__name__, repr(v))

qs, oracles = mod.queries(), mod.oracle_sql()
for name in FAILING:
    if name not in qs or name not in oracles:
        print(f"== {name}: MISSING"); continue
    sdf = qs[name](spark, SF)
    scols = sorted(sdf.columns)
    srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.collect())
    res = con.execute(oracles[name])
    ocols_raw = [d[0] for d in res.description]
    idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in idx]
    orows = sorted(tuple(canon(r[i]) for i in idx) for r in res.fetchall())
    if scols != ocols:
        print(f"== {name}: SCHEMA {scols} vs {ocols}"); continue
    ndiff = sum(1 for a, b in zip(srows, orows) if a != b)
    print(f"== {name}: cols={scols} rows={len(srows)} diff_rows={ndiff}")
    shown = 0
    for a, b in zip(srows, orows):
        if a != b and shown < 2:
            shown += 1
            for c, (ta, tb) in zip(scols, zip(a, b)):
                if ta != tb:
                    print(f"   {c}: spark={ta} duck={tb}")
print("DIAG DONE")
