"""Prototype study (r12): bucket-local cosine verify for
embedding_near_dup_pairs vs the current long-format join verify.

The minhash family's bucket-local verify (one kernel pass, join-free
plan) was the round's biggest win; this asks whether the same
restructure pays for the hyperplane-LSH embedding path. Arithmetic
stays ENTIRELY in the JVM (`cosine` fold on the same double arrays, in
the same argument order semantics — cosine is bit-symmetric: zip_with
products are commutative per-slot and the two norms multiply in either
order identically), so results must be bit-identical; the script
asserts sorted-row equality before timing.

Usage: python scripts/proto_emb_bucketlocal.py [--cpus 32] [--repeats 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bucket_local_pairs(df, vec_col, id_col, bands, bits_per_band,
                       min_cosine, dim, bucket_cap=256):
    from sidemantic_spark.operators.similarity import (
        _det_planes,
        _hyperplane_band_buckets_udf,
        cosine,
    )

    planes = _det_planes(dim, bands * bits_per_band)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucketed = df.select(
        F.col(id_col).alias("__id"),
        emb.alias("__emb"),
        _hyperplane_band_buckets_udf(planes, bands, bits_per_band)(
            F.col(vec_col)
        ).alias("__bands"),
    )
    banded = bucketed.select(
        "__id", "__emb", F.posexplode("__bands").alias("band", "bhash")
    )
    w = Window.partitionBy("band", "bhash").orderBy("__id")
    capped = banded.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= bucket_cap
    )
    buckets = (
        capped.groupBy("band", "bhash")
        .agg(
            F.collect_list("__id").alias("__ids"),
            F.collect_list("__emb").alias("__embs"),
        )
        .where(F.size("__ids") > 1)
    )
    z = F.arrays_zip(F.col("__ids").alias("i"), F.col("__embs").alias("e"))
    pair = F.explode(
        F.flatten(
            F.transform(
                z,
                lambda a, i: F.transform(
                    F.slice(z, i + F.lit(2), F.lit(bucket_cap)),
                    lambda b: F.struct(
                        a["i"].alias("ia"),
                        b["i"].alias("ib"),
                        a["e"].alias("va"),
                        b["e"].alias("vb"),
                    ),
                ),
            )
        )
    ).alias("p")
    return (
        buckets.select(pair)
        .select(
            F.least("p.ia", "p.ib").alias("id_a"),
            F.greatest("p.ia", "p.ib").alias("id_b"),
            F.round(cosine(F.col("p.va"), F.col("p.vb")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= min_cosine)
        .dropDuplicates(["id_a", "id_b"])
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("proto-emb-bucketlocal")
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

    from sidemantic_spark.operators.similarity import embedding_near_dup_pairs

    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    kw = dict(bands=4, bits_per_band=4, min_cosine=0.4, dim=64)

    cur = embedding_near_dup_pairs(embs, **kw)
    new = bucket_local_pairs(embs, "embedding", "vec_id", **kw)

    # equivalence first
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows; first diff: " + str(
        next((x, y) for x, y in zip(a, b) if x != y)
    )
    print(f"# equivalence OK over {len(a)} pair rows", file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm both shapes
    noop(embedding_near_dup_pairs(embs, **kw))
    noop(bucket_local_pairs(embs, "embedding", "vec_id", **kw))

    cur_t, new_t = [], []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        noop(embedding_near_dup_pairs(embs, **kw))
        cur_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(bucket_local_pairs(embs, "embedding", "vec_id", **kw))
        new_t.append(time.perf_counter() - t0)

    import statistics

    print(
        f"current : best {min(cur_t):.3f} med {statistics.median(cur_t):.3f} "
        f"{[round(t, 3) for t in cur_t]}"
    )
    print(
        f"bucketlc: best {min(new_t):.3f} med {statistics.median(new_t):.3f} "
        f"{[round(t, 3) for t in new_t]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
