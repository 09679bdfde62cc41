"""Driver-mimic strict comparator (the /verify core check).

Runs every queries() entry on a BARE SparkSession at sf0.01 and
strict-compares against oracle_sql() in DuckDB: sort columns by name,
sort rows, canonical exact compare (Decimal->str, float->repr(round 6),
dates lifted to datetimes). Prints one line per no-oracle/failing query
and a final "DONE bad=N of M".

Usage: python scripts/strict_compare.py
"""
import importlib.util, datetime, decimal, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

spark = SparkSession.builder.master(__import__("os").environ.get("SC_MASTER","local[8]")).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
print(len(mod.entry(spark).collect()), "entry rows", flush=True)

SF="/root/testdata/sf0.01"
con=duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if isinstance(v, decimal.Decimal): return str(v)
    if isinstance(v, float): return repr(round(v,6))
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date): return datetime.datetime(v.year,v.month,v.day).isoformat()
    return repr(v)

qs, oracles = mod.queries(), mod.oracle_sql()
bad = 0
slow = []   # (sec, name) — entries that would strain a driver sample budget
t_all = time.perf_counter()
for name, fn in qs.items():
    t_q = time.perf_counter()
    if name not in oracles:
        print(f"{name}: NO_ORACLE (rows={fn(spark,SF).count()})", flush=True)
        el = time.perf_counter() - t_q
        if el > 5: slow.append((el, name))
        continue
    try:
        sdf = fn(spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.collect())
        res = con.execute(oracles[name])
        ocols_raw = [d[0] for d in res.description]
        orows_raw = res.fetchall()
        idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in idx]
        orows = sorted(tuple(canon(r[i]) for i in idx) for r in orows_raw)
        if scols != ocols: print(f"{name}: SCHEMA {scols} vs {ocols}", flush=True); bad+=1
        elif srows != orows:
            bad+=1
            diffs=[(a,b) for a,b in zip(srows,orows) if a!=b][:1]
            print(f"{name}: VALUES rows={len(srows)}/{len(orows)} first_diff={diffs}", flush=True)
    except Exception as e:
        bad+=1; print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)
    el = time.perf_counter() - t_q
    if el > 5: slow.append((el, name))
for el, name in sorted(slow, reverse=True):
    print(f"SLOW {el:.1f}s {name}", flush=True)
print(f"DONE bad={bad} of {len(qs)} in {time.perf_counter()-t_all:.0f}s", flush=True)
