"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: one codegen'd map
  stage (zip_with dot product against a literal query vector) + a
  TakeOrderedAndProject. At 100 TB this is a full scan but with zero
  shuffle (Spark's global top-k is per-partition top-k + driver merge).
- :func:`lsh_bucket_topk` — random-hyperplane LSH variant: a vectorized
  bucket-membership filter skips the exact-cosine work for non-matching
  rows (full scan, cheap filter); materializing bucket-id columns and
  partitioning by them upgrades the same probe sets to partition
  pruning at scale (see the function docstring).
- :func:`ivf_topk` — IVF-style: coarse centroids (deterministic sample),
  vectors assigned to nearest centroid; the query probes ``nprobe``
  nearest centroid cells.
- :func:`embedding_near_dup_pairs` — pairwise near-duplicate detection
  across the corpus via LSH buckets.

Distance math runs as built-in higher-order functions (JVM) for the
single-query scoring paths and as Arrow/numpy kernels where many
plane/centroid comparisons per row would otherwise build giant
interpreted expression trees (`_multi_probe_hit_udf`,
`_argmax_cell_udf`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = _lit_vec(query_vec)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = df.select(
        F.col(id_col),
        F.round(cosine(emb, q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def quantize_query(query_vec: list[float]) -> tuple[float, list[int]]:
    """Driver-side int8 quantization of a query vector: per-vector
    symmetric scale ``max(|x|)/127``, half-up rounding via
    ``floor(x/s + 0.5)`` (an explicit formula so every engine rounds
    identically)."""
    import math

    s = max(abs(x) for x in query_vec) / 127.0
    if s == 0:
        return 0.0, [0] * len(query_vec)
    return s, [int(math.floor(x / s + 0.5)) for x in query_vec]


def quantized_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    pool: int = 200,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Int8-quantized ANN: approximate top-``pool`` by integer dot
    product over per-vector symmetric int8 codes, then exact-cosine
    rerank of the pool to the final top-``k``.

    The 100 TB story: int8 codes are 4x smaller than float32 (16x vs
    the widened float64), so the scan that dominates brute-force ANN
    moves a quarter of the bytes and the integer dot is SIMD-friendly;
    the exact rerank touches only ``pool`` full-precision vectors.
    Candidate scoring is EXACT integer arithmetic (products <= 127^2,
    sums < 2^31 — ANSI-safe), so the pool is deterministic across
    engines/partitionings and the whole operator is SQL-expressible
    (DuckDB oracle replicates the quantization bit-for-bit); the only
    floats are the per-vector scales, combined in a fixed
    multiplication order.
    """
    qscale, qq = quantize_query(query_vec)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = (
        F.aggregate(emb, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
        / F.lit(127.0)
    )
    base = df.select(F.col(id_col), emb.alias("_v"), scale.alias("_sc"))
    qv = F.transform(
        F.col("_v"),
        lambda x: F.floor(x / F.col("_sc") + F.lit(0.5)).cast("long"),
    )
    qq_lit = F.array(*[F.lit(int(v)).cast("long") for v in qq])
    int_dot = F.aggregate(
        F.zip_with(qv, qq_lit, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    approx = (F.col("_sc") * F.lit(float(qscale)) * int_dot.cast("double")).alias("_approx")
    cand = (
        base.where(F.col("_sc") > 0)
        .select(F.col(id_col), F.col("_v"), approx)
        .orderBy(F.desc("_approx"), F.asc(id_col))
        .limit(pool)
    )
    q = _lit_vec(query_vec)
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col("_v"), q), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for random-hyperplane LSH."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(_dot(vec, _lit_vec(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << i))
    return bucket


def _hyperplane_band_buckets_udf(planes: list[list[float]], bands: int, bits_per_band: int):
    """Arrow-vectorized banded hyperplane buckets: embedding ->
    array<long> of ``bands`` bucket ids.

    Bit-identical to :func:`hyperplane_bucket` over the same planes: the
    dot products accumulate dimension-by-dimension (``acc = acc +
    v[d] * p[d]``), the same operation order and IEEE rounding as the
    engine's left-to-right ``aggregate`` fold — so sign bits can never
    diverge between this kernel, the JVM expression, and the SQL
    oracles. Replaces ``bands * bits_per_band`` interpreted
    ``aggregate(zip_with(...))`` trees per row (the near-dup family's
    hottest stage; measured ~4x faster end-to-end).

    Returned ``asNondeterministic()`` (it IS deterministic — this is
    the guide §4.4 optimizer fence): the consumer explodes the result,
    and the optimizer pushes the generate's implicit
    ``size(...) > 0 AND isnotnull(...)`` filter BELOW the projection,
    planning a second ArrowEvalPython of the same kernel — every
    embedding row paid the hyperplane matmul twice (r12 plan diff:
    2 ArrowEvalPython -> 1). Nothing legitimate is lost: the kernel
    sits directly on the scan, so there are no other filters to push
    past it.
    """
    from pyspark.sql.functions import pandas_udf

    P = np.array(planes, dtype=np.float64).T  # dim x nbits
    weights = np.array([1 << i for i in range(bits_per_band)], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        acc = np.zeros((V.shape[0], P.shape[1]), dtype=np.float64)
        for d in range(P.shape[0]):
            # dimension-ordered accumulation: same rounding as the
            # sequential fold (never np.dot — pairwise summation would
            # round differently and could flip a near-zero sign)
            acc += V[:, d:d + 1] * P[d:d + 1, :]
        bits = (acc >= 0).astype(np.int64)
        out = np.empty((V.shape[0], bands), dtype=np.int64)
        for j in range(bands):
            out[:, j] = bits[:, j * bits_per_band:(j + 1) * bits_per_band] @ weights
        return pd.Series(list(out))

    return buckets.asNondeterministic()


def _det_planes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy RNG state
    so the bucketing is stable across runs/executors)."""
    planes = []
    state = seed
    for _ in range(nbits):
        p = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            p.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(p)
    return planes


def _probe_buckets(
    query_vec: list[float], planes: list[list[float]], probes: int
) -> list[int]:
    """Query-directed multi-probe sequence (Lv et al., VLDB'07 idea):
    flip sign bits in order of how close the query's hyperplane dot
    product is to zero — the buckets most likely to hold near
    neighbors.  Covers flips up to pairs: probes <= 1 + nbits +
    nbits*(nbits-1)/2."""
    nbits = len(planes)
    dots = [
        sum(float(a) * float(b) for a, b in zip(query_vec, p)) for p in planes
    ]
    qbucket = sum(1 << i for i, d in enumerate(dots) if d >= 0)
    order = sorted(range(nbits), key=lambda i: abs(dots[i]))
    flip_sets: list[int] = [0]
    flip_sets += [1 << i for i in order]
    for a in range(nbits):
        for b in range(a + 1, nbits):
            flip_sets.append((1 << order[a]) | (1 << order[b]))
    flip_sets.sort(key=lambda m: sum(abs(dots[i]) for i in range(nbits) if m & (1 << i)))
    return [qbucket ^ m for m in flip_sets[: max(probes, 1)]]


def _multi_probe_hit_udf(planes_by_table: list[list[list[float]]],
                         probe_sets: list[list[int]]):
    """Arrow-vectorized candidate filter for multi-table LSH: ONE
    numpy matmul signs all tables' hyperplanes at once, packs sign
    bits into per-table bucket ids, and tests membership against the
    probe lists.  The pure-Column form (48 interpreted
    ``aggregate``/``zip_with`` dot products per row, each with a
    64-literal plane array) made plan analysis + interpreted eval the
    dominant cost; this kernel keeps the plan a single opaque node."""
    from pyspark.sql.functions import pandas_udf

    t_count = len(planes_by_table)
    nbits = len(planes_by_table[0])
    planes = np.array(
        [p for tbl in planes_by_table for p in tbl], dtype=np.float64
    )  # (t_count*nbits, dim)
    probe_arrays = [
        np.array(sorted(s), dtype=np.int64) for s in probe_sets
    ]
    weights = (1 << np.arange(nbits)).astype(np.int64)

    @pandas_udf("boolean")
    def hit(emb: pd.Series) -> pd.Series:
        n = len(emb)
        if n == 0:
            return pd.Series([], dtype=bool)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        signs = (m @ planes.T) >= 0  # (n, t_count*nbits)
        out = np.zeros(n, dtype=bool)
        for t in range(t_count):
            buckets = signs[:, t * nbits:(t + 1) * nbits].astype(np.int64) @ weights
            out |= np.isin(buckets, probe_arrays[t])
        return pd.Series(out)

    return hit


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int = 8,
    probes: int = 16,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k scanning only the query's LSH buckets.

    Two recall levers, composable:

    - multi-probe within a table (``probes``): probe the flip-set
      buckets nearest the query (see :func:`_probe_buckets`) — more
      recall for zero extra index space.
    - multiple independent tables (``tables``): independently seeded
      hyperplane sets; a true neighbor missed by one table's bucketing
      is caught by another with prob 1-(1-p)^L.  This is the standard
      recall lever when multi-probe plateaus (flips beyond pairs chase
      exponentially many buckets for linearly more recall).

    Execution shape: the candidate filter is an Arrow ``pandas_udf``
    (one numpy matmul signs every table's hyperplanes at once), so this
    form SCANS the whole corpus and evaluates the filter vectorized —
    it saves the per-candidate exact-cosine work, not scan IO.  For a
    scan-pruning index at scale, materialize per-table bucket-id
    columns once (cheap JVM bit-packing at write time) and partition
    the index by (table, bucket); then the same probe sets become
    partition-pruning IN-list predicates and a query reads
    ``tables x probes`` bucket partitions instead of the corpus.
    probes=1, tables=1 is the classic single-bucket probe.
    """
    dim = len(query_vec)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucketed = df.select(F.col(id_col), emb.alias("__emb"))
    planes_by_table = [
        _det_planes(dim, nbits, seed=42 + 7919 * t)
        for t in range(max(tables, 1))
    ]
    probe_sets = [
        _probe_buckets(query_vec, planes, probes) for planes in planes_by_table
    ]
    hit = _multi_probe_hit_udf(planes_by_table, probe_sets)
    q = _lit_vec(query_vec)
    return (
        bucketed.where(hit(F.col("__emb")))
        .select(F.col(id_col), F.round(cosine(F.col("__emb"), q), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _argmax_cell_udf(centroid_vecs: list[list[float]], round_dp: int | None = None):
    """Arrow-vectorized max-cosine cell assignment: one matmul against
    the normalized centroid matrix, first-max argmax (same tie rule as
    ``array_position(sims, array_max(sims))``).  Returns the 1-based
    position, matching the Column form it replaces — the 16-centroid
    x 64-literal cosine array made interpreted eval + plan analysis
    the dominant cost of both k-means iterations and IVF probing.
    ``round_dp`` rounds similarities BEFORE the argmax so a ~1e-15
    dot-product ordering difference between engines cannot flip a
    near-tie (used by the oracle-compared label-purity operator)."""
    from pyspark.sql.functions import pandas_udf

    c = np.array(centroid_vecs, dtype=np.float64)
    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)

    @pandas_udf("int")
    def cell(emb: pd.Series) -> pd.Series:
        n = len(emb)
        if n == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        m_norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = m_norm @ c_norm.T
        if round_dp is not None:
            sims = np.round(sims, round_dp)
        return pd.Series((np.argmax(sims, axis=1) + 1).astype("int32"))

    return cell


def kmeans_centroids(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical k-means for IVF coarse quantization.

    Init: first ``n_cells`` vectors by id. Each Lloyd iteration is two
    Spark jobs: (1) assign every vector to its max-cosine centroid — the
    centroids ride into the plan as literals (argmax over an array, no
    join), (2) new centroids = per-cell per-position mean via posexplode
    + groupBy(cell, pos) — a shuffle of n_cells*dim tiny rows. Only the
    n_cells x dim centroid matrix is ever collected to the driver, which
    is how k-means|| behaves on a cluster too.
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    centroids = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    ]
    for _ in range(iters):
        cell = _argmax_cell_udf([cvec for _cid, cvec in centroids])
        assigned = df.select(
            cell(emb).alias("__cell"), emb.alias("__emb")
        )
        means = (
            assigned.select("__cell", F.posexplode("__emb").alias("__pos", "__val"))
            .groupBy("__cell", "__pos")
            # decimal accumulator: a double avg is partition-order-
            # dependent, which wiggles centroids run-to-run and flips
            # boundary assignments — recall would jitter across
            # sessions/core counts
            .agg(
                F.avg(F.col("__val").cast("decimal(28,12)"))
                .cast("double")
                .alias("__mean")
            )
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(int(r["__cell"]), {})[int(r["__pos"])] = float(r["__mean"])
        new = []
        for ci, (cid, old) in enumerate(centroids, start=1):
            vals = by_cell.get(ci)
            if vals:
                new.append((cid, [vals[p] for p in sorted(vals)]))
            else:  # empty cell keeps its previous centroid
                new.append((cid, old))
        centroids = new
    return centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 4,
    train_iters: int = 2,
) -> DataFrame:
    """IVF ANN: coarse centroids from :func:`kmeans_centroids`,
    assignment by max cosine, probe the ``nprobe`` cells nearest to the
    query.

    The centroid table rides the plan as literals (no join); the probe
    is a partition-prunable filter on the cell id. At scale the
    assignment is materialized once (bucketed by cell) and queries only
    read the probed cells.
    """
    centroids = kmeans_centroids(
        df, n_cells=n_cells, iters=train_iters, vec_col=vec_col, id_col=id_col
    )
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    cell = _argmax_cell_udf([cvec for _cid, cvec in centroids])
    ids = F.array(*[F.lit(cid) for cid, _cvec in centroids])
    assigned = df.select(
        F.col(id_col),
        emb.alias("__emb"),
        F.element_at(ids, cell(emb)).alias("__cell"),
    )
    sims = sorted(
        (
            (
                sum(a * b for a, b in zip(query_vec, cvec))
                / (
                    (sum(a * a for a in query_vec) ** 0.5)
                    * (sum(b * b for b in cvec) ** 0.5)
                ),
                cid,
            )
            for cid, cvec in centroids
        ),
        reverse=True,
    )
    probe_cells = [cid for _, cid in sims[:nprobe]]
    q = _lit_vec(query_vec)
    return (
        assigned.where(F.col("__cell").isin(probe_cells))
        .select(F.col(id_col), F.round(cosine(F.col("__emb"), q), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 4,
    bits_per_band: int = 4,
    min_cosine: float = 0.95,
    dim: int = 64,
    broadcast_verify: bool | None = None,
    broadcast_vec_cap: int = 100_000,
) -> DataFrame:
    """Corpus-wide near-duplicate pairs by cosine: banded
    random-hyperplane LSH candidates, exact-cosine verified.

    OR-amplification across ``bands`` bands of ``bits_per_band`` sign
    bits each: a pair is a candidate when it agrees on ALL bits of ANY
    band. For angle theta, the candidate probability is
    1 - (1 - p^r)^b with p = 1 - theta/pi, r = bits_per_band,
    b = bands — the same S-curve as MinHash banding. A single
    monolithic bucket (the nbits=8 form this replaces) has recall
    p^8, which at cosine 0.4 is ~2%; 4x4 banding lifts it to ~50%.
    Candidate generation shares :func:`pairs_from_bucket_keys` with
    MinHash — one shuffle on (band, bucket), capped in-bucket pair
    expansion, verify at full parallelism.

    ``broadcast_verify`` picks the verify strategy (same pattern as the
    minhash/ngram family): None (auto) resolves by a bounded-count
    probe — an EAGER Spark job at plan-construction time (CollectLimit,
    O(cap) rows even on a 100 TB input; pass an explicit True/False to
    skip it). Under the cap, both vector sides attach with two MAP-ONLY
    broadcast joins (r12: interleaved noop best 0.99 vs 1.17 s, the
    verify's explode + id-join + pair-groupBy exchanges drop out of the
    plan); above the cap the long-format verify stays — one vector
    scan, no broadcast assumption, the only 100 TB-safe shape.
    ``broadcast_vec_cap`` states the cap at the default dim=64 (100k x
    64 doubles ~ 51 MB per side, the dedup family's broadcast budget);
    the auto gate scales it by 64/dim so the same BYTE budget holds at
    any dimensionality (dim=1024 would otherwise force ~820 MB
    broadcasts per side). Both paths compute the identical JVM cosine
    fold on the identical double arrays, so results are bit-identical
    (equivalence pinned in tests and proven row-identical in
    scripts/proto_emb_broadcast.py) — PROVIDED ``id_col`` is unique:
    with duplicate ids the broadcast path emits one row per duplicate
    match while the long path's pair-groupBy collapses them.

    NOTE (r12 study, do not re-spend): a minhash-style BUCKET-LOCAL
    verify (vectors riding the banding shuffle, in-bucket JVM-cosine
    pair expansion, 2-3 exchanges fewer) was built, proven
    row-identical, and measured >2.5x SLOWER (best 5.6 s vs 2.0 s
    interleaved noop at sf0.1) — the interpreted nested-transform pair
    expansion re-materializes both full 64-double arrays per candidate
    pair, which dwarfs the join it removes; an Arrow-kernel expansion
    would change the cosine summation order vs the JVM fold the SQL
    oracle replicates (ROUND(x,6) knife-edge risk). See
    scripts/proto_emb_bucketlocal.py and OPTIMIZATION_r12.md §17.
    """
    from sidemantic_spark.operators.dedup import (
        _bounded_count,
        pairs_from_bucket_keys,
    )

    planes = _det_planes(dim, bands * bits_per_band)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # banded sign-bit buckets via the Arrow kernel (bit-identical to
    # hyperplane_bucket; the per-row interpreted dot-product trees it
    # replaces were this operator's hottest stage)
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

    # per-VECTOR norm, computed once on the vector side and carried to
    # the verify: cosine(va, vb) re-ran BOTH interpreted 64-element
    # norm folds per candidate pair (HOF lambdas get no codegen and no
    # CSE), so a vector in k candidate pairs paid its norm fold k
    # times. dot/(na*nb) evaluates the exact same expressions on the
    # same arrays in the same fold order, so the rounded cosine is
    # bit-identical — only the per-pair work drops from 3 folds to 1.
    vecs = df.select(
        F.col(id_col).alias("__id"), emb.alias("__emb")
    ).withColumn("__nrm", _norm(F.col("__emb")))
    if broadcast_verify is None:
        # dim-scaled row cap: broadcast_vec_cap rows is the budget at
        # the default dim=64 (~51 MB of packed doubles per side); wider
        # vectors shrink the ROW cap so the BYTE budget stays fixed
        # (ADVICE r12: dim=1024 under a flat 100k-row cap would force
        # ~820 MB broadcasts per side). At dim<=64 the cap is unchanged,
        # so bench/contract behavior is identical.
        cap = min(broadcast_vec_cap, (broadcast_vec_cap * 64) // max(dim, 1))
        # CollectLimit-bounded probe: O(cap) rows even on a 100 TB input
        broadcast_verify = _bounded_count(df, cap) <= cap
    if broadcast_verify:
        # small-corpus path: both vector sides broadcast, the verify is
        # two MAP-ONLY joins — the long-format explode + id-join +
        # pair-groupBy exchanges drop out of the plan entirely
        both = cand.join(
            F.broadcast(
                vecs.select(
                    F.col("__id").alias("id_a"),
                    F.col("__emb").alias("va"),
                    F.col("__nrm").alias("__na"),
                )
            ),
            "id_a",
        ).join(
            F.broadcast(
                vecs.select(
                    F.col("__id").alias("id_b"),
                    F.col("__emb").alias("vb"),
                    F.col("__nrm").alias("__nb"),
                )
            ),
            "id_b",
        )
    else:
        # long-format verify (one scan of the embedding column, no
        # broadcast assumption — see minhash_lsh_pairs)
        long = cand.select(
            "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("__id")
        )
        both = (
            long.join(vecs, "__id")
            .groupBy("id_a", "id_b")
            .agg(
                F.max(F.when(F.col("__id") == F.col("id_a"), F.col("__emb"))).alias("va"),
                F.max(F.when(F.col("__id") == F.col("id_b"), F.col("__emb"))).alias("vb"),
                F.max(F.when(F.col("__id") == F.col("id_a"), F.col("__nrm"))).alias("__na"),
                F.max(F.when(F.col("__id") == F.col("id_b"), F.col("__nrm"))).alias("__nb"),
            )
        )
    return (
        both.select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= min_cosine)
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_cosine: float = 0.95,
    bands: int = 4,
    bits_per_band: int = 4,
    dim: int = 64,
    max_iter: int = 20,
    broadcast_verify: bool | None = None,
    broadcast_vec_cap: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): build
    the cosine near-duplicate pair graph over the embedding column,
    collapse it into connected components, and keep the smallest-id
    representative of each semantic cluster.

    Composition of two scale-proven pieces: banded hyperplane-LSH
    candidates with exact-cosine verify (:func:`embedding_near_dup_pairs`
    — only (id, band, bucket) rows shuffle, pair expansion is
    bucket-capped) and min-label-propagation connected components
    (``operators.dedup.connected_components`` — per-round shuffles carry
    (id, label) only).  SemDeDup's k-means partitioning plays the same
    candidate-bounding role as the LSH bands here; banding needs no
    trained centroids and its recall/threshold curve is analytic
    (1 - (1 - p^r)^b), which also makes the whole pipeline — candidates,
    verify, clustering, representative choice — expressible as a SQL
    oracle for cross-engine verification.

    Returns one row per input vector: (id_col, cluster_id, keep) with
    cluster_id = min id of the vector's semantic cluster (its own id
    when it has no near-duplicates) and keep = (id == cluster_id).
    """
    from sidemantic_spark.operators.dedup import connected_components

    pairs = embedding_near_dup_pairs(
        df,
        vec_col=vec_col,
        id_col=id_col,
        bands=bands,
        bits_per_band=bits_per_band,
        min_cosine=min_cosine,
        dim=dim,
        # forwarded (ADVICE r12): callers can skip the eager auto-gate
        # probe job or tune the broadcast budget; None keeps the auto
        # probe
        broadcast_verify=broadcast_verify,
        broadcast_vec_cap=broadcast_vec_cap,
    )
    comps = connected_components(pairs, max_iter=max_iter).withColumnRenamed(
        "doc_id", "__node"
    )
    return (
        df.select(F.col(id_col))
        .join(comps, F.col(id_col) == F.col("__node"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
            (F.coalesce(F.col("cluster_id"), F.col(id_col)) == F.col(id_col)).alias(
                "keep"
            ),
        )
    )


def label_centroid_purity(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-class-mean mislabel detection over an embedding column.

    The classic curation signal (confident-learning lite): compute one
    centroid per label, assign every vector to its max-cosine centroid,
    and flag rows whose nearest class is not their own label.  Fully
    distributed: per-label per-dimension means are ONE shuffle of
    ``labels x dim`` tiny rows (DECIMAL-accumulated — a double mean is
    partition-order-dependent and would jitter assignments across core
    counts), only the ``labels x dim`` centroid matrix is collected and
    ridden into an Arrow matmul kernel as literals, and the scan stays
    embarrassingly parallel.  Similarities round to 6dp BEFORE argmax
    (first-max, i.e. lowest label wins ties) so the assignment is
    bit-reproducible across engines — the whole operator is expressible
    as a SQL oracle.

    Returns one row per vector: (id, label, nearest_label, is_pure).
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    means = (
        df.select(
            F.col(label_col).alias("__lab"),
            F.posexplode(emb).alias("__pos", "__val"),
        )
        .groupBy("__lab", "__pos")
        .agg(
            (
                F.sum(F.col("__val").cast("decimal(28,12)")) / F.count(F.lit(1))
            ).cast("double").alias("__mean")
        )
        .collect()
    )
    by_lab: dict[int, dict[int, float]] = {}
    for r in means:
        by_lab.setdefault(r["__lab"], {})[int(r["__pos"])] = float(r["__mean"])
    labs = sorted(by_lab)
    cents = [[by_lab[lab][p] for p in sorted(by_lab[lab])] for lab in labs]
    cell = _argmax_cell_udf(cents, round_dp=6)
    lab_arr = F.array(*[F.lit(lab) for lab in labs])
    return df.select(
        F.col(id_col),
        F.col(label_col),
        F.element_at(lab_arr, cell(emb)).alias("nearest_label"),
    ).withColumn(
        "is_pure", F.col(label_col) == F.col("nearest_label")
    )


def cosine_topk_join(
    df: DataFrame,
    queries: "DataFrame | list[tuple[int, list[float]]]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
) -> DataFrame:
    """Batch exact k-NN: top-k corpus neighbors for EVERY query vector.

    The training-pipeline shape (query a whole eval/dedup block against
    the corpus, not one vector): the query block is the small side and
    ships to executors in the task closure; each corpus partition
    computes one (batch x queries) float64 matmul in numpy via
    ``mapInPandas`` (Arrow batches), keeps the per-partition top-k per
    query, and only (q_id, id, sim) candidate rows — partitions x
    queries x k of them, never the vectors — ride the single shuffle
    into the global re-top-k window. At 100 TB the corpus scan is
    embarrassingly parallel and the shuffle stays tiny.

    Ties break by ascending corpus id; similarities are rounded to 6dp
    *before* ranking so rankings are reproducible across engines.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    if isinstance(queries, DataFrame):
        rows = [(r[0], list(r[1])) for r in queries.collect()]
    else:
        rows = [(int(i), list(v)) for i, v in queries]
    if not rows:
        raise ValueError("cosine_topk_join needs at least one query vector")
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.asarray([r[1] for r in rows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0.0] = 1.0
    Qn = (Q / qn).T  # d x nq

    schema = f"{q_id_col} long, {id_col} long, cosine_sim double"

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            C = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            cn[cn == 0.0] = 1.0
            sims = (C / cn) @ Qn  # batch x nq
            kk = min(k, len(ids))
            out_q, out_i, out_s = [], [], []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                if len(ids) > kk:
                    sel = np.argpartition(-col, kk - 1)[:kk]
                else:
                    sel = np.arange(len(ids))
                out_q.append(np.full(len(sel), q_ids[j]))
                out_i.append(ids[sel])
                out_s.append(col[sel])
            yield pd.DataFrame({
                q_id_col: np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "cosine_sim": np.concatenate(out_s),
            })

    cand = (
        df.select(id_col, vec_col)
        .mapInPandas(scan, schema)
        .withColumn("cosine_sim", F.round("cosine_sim", 6))
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
