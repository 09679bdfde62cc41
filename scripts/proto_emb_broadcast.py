"""Prototype study (r12): size-gated BROADCAST verify for
embedding_near_dup_pairs vs the current long-format join verify.

The bucket-local restructure lost (see proto_emb_bucketlocal.py); this
tests the other verify family the dedup operators already use: keep
candidate generation unchanged, but attach both vectors with two
map-only broadcast joins instead of the explode + id-join + pair-groupBy
(3 exchanges). Arithmetic is the same JVM `cosine` fold on the same
double arrays -> bit-identical; asserted before timing.

Usage: python scripts/proto_emb_broadcast.py [--cpus 32] [--repeats 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def broadcast_verify_pairs(df, vec_col, id_col, bands, bits_per_band,
                           min_cosine, dim):
    from sidemantic_spark.operators.dedup import pairs_from_bucket_keys
    from sidemantic_spark.operators.similarity import (
        _det_planes,
        _hyperplane_band_buckets_udf,
        cosine,
    )

    planes = _det_planes(dim, bands * bits_per_band)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucketed = df.select(
        F.col(id_col).alias("__id"),
        _hyperplane_band_buckets_udf(planes, bands, bits_per_band)(
            F.col(vec_col)
        ).alias("__bands"),
    )
    banded = bucketed.select(
        "__id", F.posexplode("__bands").alias("band", "bhash")
    )
    cand = pairs_from_bucket_keys(banded)
    vecs = df.select(F.col(id_col).alias("__id"), emb.alias("__emb"))
    side_a = vecs.select(F.col("__id").alias("id_a"), F.col("__emb").alias("va"))
    side_b = vecs.select(F.col("__id").alias("id_b"), F.col("__emb").alias("vb"))
    both = cand.join(F.broadcast(side_a), "id_a").join(
        F.broadcast(side_b), "id_b"
    )
    return (
        both.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= min_cosine)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("proto-emb-broadcast")
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
    new = broadcast_verify_pairs(embs, "embedding", "vec_id", **kw)

    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows"
    print(f"# equivalence OK over {len(a)} pair rows", file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(embedding_near_dup_pairs(embs, **kw))
    noop(broadcast_verify_pairs(embs, "embedding", "vec_id", **kw))

    cur_t, new_t = [], []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        noop(embedding_near_dup_pairs(embs, **kw))
        cur_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(broadcast_verify_pairs(embs, "embedding", "vec_id", **kw))
        new_t.append(time.perf_counter() - t0)

    import statistics

    print(
        f"current  : best {min(cur_t):.3f} med {statistics.median(cur_t):.3f} "
        f"{[round(t, 3) for t in cur_t]}"
    )
    print(
        f"broadcast: best {min(new_t):.3f} med {statistics.median(new_t):.3f} "
        f"{[round(t, 3) for t in new_t]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
