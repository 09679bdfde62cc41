"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-shaped pricing
summary through the semantic layer) on sf0.001.  ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 plus the
LLM-data-pipeline operators; ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible entry.

Numeric determinism: monetary sums go through DECIMAL casts (exact,
identical across engines); divisions happen in double space on both
sides; DATE_TRUNC results are CAST to TIMESTAMP in the oracles because
DuckDB returns DATE for day-and-coarser grains.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


_LAYER_CACHE: dict[tuple[int, str], object] = {}
_ACTIVE_SF: dict[int, str] = {}


def _layer(spark: SparkSession, sf_dir: str):
    """Build (or reuse) the semantic layer for this session+scale.

    Memoized: building re-registers 10 parquet views (a pyarrow footer
    read each), which would otherwise repeat per query in bench runs.
    Temp views are session-global, so when the same session switches
    sf_dir the views are re-registered even on a layer-cache hit.
    """
    from sidemantic_spark.models.tpch import build_layer, register_tables

    if _ACTIVE_SF.get(id(spark)) != sf_dir:
        register_tables(spark, sf_dir)
        _ACTIVE_SF[id(spark)] = sf_dir
    key = (id(spark), sf_dir)
    if key not in _LAYER_CACHE:
        _LAYER_CACHE[key] = build_layer(spark, None)
    return _LAYER_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing summary by returnflag/linestatus (TPC-H Q1
    shape) compiled by the semantic layer. Delegates to the same
    callable the bench times, so the two can never drift."""
    return _tpch_q1(spark, "/root/testdata/sf0.001")


# ----------------------------------------------------------------------
# semantic-layer queries
# ----------------------------------------------------------------------

def _dbl(fn):
    """Cast DECIMAL output columns to DOUBLE at the contract boundary.

    The engine accumulates monetary sums exactly in DECIMAL; DuckDB's
    pandas fetch renders DECIMAL as float64, so ``Decimal('10.00')`` vs
    ``10.0`` hash-mismatches on trailing zeros.  One final
    decimal->double cast on BOTH sides (see matching ``CAST(... AS
    DOUBLE)`` in ``oracle_sql``) is correctly-rounded and bit-identical
    across engines.
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = fn(spark, sf_dir)
        if any(isinstance(f.dataType, T.DecimalType) for f in df.schema.fields):
            df = df.select(
                *[
                    F.col(f.name).cast("double").alias(f.name)
                    if isinstance(f.dataType, T.DecimalType)
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
        return df

    return run


def _canon(fn):
    """Contract-boundary canonicalization (round-2 hardening).

    Two cross-engine representation gaps remain after the DECIMAL-sum
    design even when every value is bit-identical:

    - Spark session-TZ timestamps surface in Arrow as
      ``timestamp[us, tz=UTC]`` while DuckDB's are zone-naive
      ``timestamp[us]`` — cast LTZ outputs to TIMESTAMP_NTZ (an
      identity on the stored instant under a UTC session).
    - Row order of an un-ORDERed aggregate is engine- and
      parallelism-dependent.  Impose a total order over every output
      column (NULLS FIRST, matching DuckDB's ``ORDER BY ALL NULLS
      FIRST`` wrapper in :func:`oracle_sql`) so both engines return
      rows in the identical sequence regardless of how the harness
      hashes them.  Outputs at the contract boundary are small
      (<= a few thousand rows), so the extra global sort is
      negligible next to the aggregation shuffles that precede it.
    - ARRAY outputs (embedding features, frame lists) crash the
      driver's pandas canonicalizer (``TypeError: unhashable type:
      'list'`` — pandas cannot factorize Python lists), so they are
      serialized to JSON strings at the boundary; float elements are
      rounded to 6 places first so the text form is stable.  The
      pytest golden tests exercise the unserialized array form
      directly against the operators.
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = fn(spark, sf_dir)
        if any(
            isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
            for f in df.schema.fields
        ):

            def _ser(f):
                if isinstance(f.dataType, (T.MapType, T.StructType)):
                    return F.to_json(F.col(f.name)).alias(f.name)
                if not isinstance(f.dataType, T.ArrayType):
                    return F.col(f.name)
                col = F.col(f.name)
                if isinstance(
                    f.dataType.elementType, (T.FloatType, T.DoubleType)
                ):
                    col = F.transform(
                        col, lambda x: F.round(x.cast("double"), 6)
                    )
                return F.to_json(col).alias(f.name)

            df = df.select(*[_ser(f) for f in df.schema.fields])
        if any(isinstance(f.dataType, T.TimestampType) for f in df.schema.fields):
            df = df.select(
                *[
                    F.col(f.name).cast("timestamp_ntz").alias(f.name)
                    if isinstance(f.dataType, T.TimestampType)
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
        sortable = [
            f.name
            for f in df.schema.fields
            if not isinstance(f.dataType, T.MapType)
        ]
        if sortable:
            df = df.orderBy(*[F.col(c).asc_nulls_first() for c in sortable])
        return df

    return run


def _oracle_canon(sql: str) -> str:
    """DuckDB-side mirror of :func:`_canon`'s total order."""
    return (
        "SELECT * FROM (" + sql.rstrip().rstrip(";") + "\n) __canon "
        "ORDER BY ALL NULLS FIRST"
    )


def _q(metrics=None, dimensions=None, **kw):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _layer(spark, sf_dir).query(
            metrics=metrics or [], dimensions=dimensions or [], **kw
        )

    return run


def _tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _layer(spark, sf_dir).query(
        metrics=[
            "lineitem.qty",
            "lineitem.gross_revenue",
            "lineitem.disc_revenue",
            "lineitem.avg_qty",
            "lineitem.line_count",
        ],
        dimensions=["lineitem.returnflag", "lineitem.linestatus"],
        filters=["lineitem.ship_date <= TIMESTAMP '1998-09-02'"],
        order_by=["returnflag", "linestatus"],
    )


def _semantic_sql_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _layer(spark, sf_dir).sql(
        "SELECT orders.status, CAST(orders.revenue AS DOUBLE) / 1000 AS rev_k "
        "FROM orders ORDER BY rev_k DESC LIMIT 2"
    )


def _semantic_sql_cte_island(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _layer(spark, sf_dir).sql(
        """
        WITH rev AS (SELECT orders.status, orders.revenue FROM orders),
        cnt AS (SELECT orders.status, orders.order_count FROM orders)
        SELECT r.status AS status, r.revenue AS revenue, c.order_count AS order_count
        FROM rev r JOIN cnt c ON r.status = c.status
        """
    )


def _table_calc_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sidemantic_spark.sql.table_calcs import TableCalculation

    return _layer(spark, sf_dir).query(
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        table_calcs=[
            TableCalculation(
                name="pct_of_total", type="percent_of_total", field="revenue"
            )
        ],
    )


def _table_calc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sidemantic_spark.sql.table_calcs import TableCalculation

    return _layer(spark, sf_dir).query(
        metrics=["orders.revenue"],
        dimensions=["orders.priority"],
        table_calcs=[
            TableCalculation(
                name="revenue_rank", type="rank", order_by=["revenue DESC"]
            )
        ],
    )


def _table_calc_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sidemantic_spark.sql.table_calcs import TableCalculation

    return _layer(spark, sf_dir).query(
        metrics=["orders.revenue"],
        dimensions=["orders.order_date__month AS order_month"],
        table_calcs=[
            TableCalculation(
                name="revenue_3mo_avg", type="moving_average",
                field="revenue", order_by=["order_month"], window_size=3,
            )
        ],
    )


def _table_calc_pct_of_previous(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sidemantic_spark.sql.table_calcs import TableCalculation

    return _layer(spark, sf_dir).query(
        metrics=["orders.revenue"],
        dimensions=["orders.order_date__month AS order_month"],
        table_calcs=[
            TableCalculation(
                name="pct_of_prev", type="percent_of_previous",
                field="revenue", order_by=["order_month"],
            )
        ],
    )


def _table_calc_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sidemantic_spark.sql.table_calcs import TableCalculation

    return _layer(spark, sf_dir).query(
        metrics=["orders.revenue", "orders.open_revenue"],
        dimensions=["orders.status"],
        table_calcs=[
            TableCalculation(
                name="closed_revenue", type="formula",
                formula="revenue - COALESCE(open_revenue, 0)",
            )
        ],
    )


def _stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROUND(…, 2) on both sides: stddev/variance accumulate float error
    # in engine-specific order, so last-ulp digits differ legitimately
    return _layer(spark, sf_dir).sql(
        "SELECT orders.status, "
        "ROUND(orders.price_stddev, 2) AS price_stddev, "
        "ROUND(orders.price_variance / 1000, 2) AS price_variance_k, "
        "ROUND(orders.price_stddev_pop, 2) AS price_stddev_pop, "
        "ROUND(orders.price_median, 2) AS price_median "
        "FROM orders"
    )


def _semantic_sql_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-status top-2 revenue years via QUALIFY (compiled to a window
    # stage + subquery filter — Spark has no QUALIFY); RANK + total
    # ordering keeps the result deterministic across engines
    return _layer(spark, sf_dir).sql(
        "SELECT orders.status, orders.order_date__year, orders.revenue FROM orders "
        "QUALIFY RANK() OVER (PARTITION BY status ORDER BY revenue DESC) <= 2"
    )


def _semantic_sql_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # outer month rollup over an inner day-grain island is pushed into
    # the semantic plan (recompiled at month grain) so it can ride a
    # coarser pre-aggregation
    return _layer(spark, sf_dir).sql(
        "SELECT DATE_TRUNC('month', order_date__day) AS order_month, "
        "SUM(revenue) AS revenue "
        "FROM (SELECT orders.order_date__day, orders.revenue FROM orders) "
        "GROUP BY 1"
    )


def _semantic_sql_from_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`FROM metrics` virtual catalog table (round-5 feature; reference
    sql/query_rewriter.py from-metrics route): cross-model fields by
    qualified name, no base model in the FROM."""
    return _layer(spark, sf_dir).sql(
        "SELECT orders.revenue, customer.mktsegment FROM metrics "
        "GROUP BY customer.mktsegment"
    )


def _semantic_sql_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _layer(spark, sf_dir).sql(
        "SELECT orders.status, orders.revenue FROM orders WHERE orders.status = 'O' "
        "UNION ALL "
        "SELECT orders.status, orders.revenue FROM orders WHERE orders.status = 'F'"
    )


def _yardstick_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _layer(spark, sf_dir).sql(
        "SEMANTIC SELECT orders.status, AGGREGATE(orders.revenue) AS revenue "
        "FROM orders"
    )


# ----------------------------------------------------------------------
# data-pipeline queries
# ----------------------------------------------------------------------

def _ensure_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata views once per (session, sf_dir) switch."""
    from sidemantic_spark.models.tpch import register_tables

    if _ACTIVE_SF.get(id(spark)) != sf_dir:
        register_tables(spark, sf_dir)
        _ACTIVE_SF[id(spark)] = sf_dir


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_tables(spark, sf_dir)
    return spark.table("documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_tables(spark, sf_dir)
    return spark.table("embeddings")


# fixed deterministic query vector for similarity search (unit-ish
# alternating pattern, 64 dims — independent of the data)
_QUERY_VEC = [(1.0 if i % 2 == 0 else -0.5) + i * 0.01 for i in range(64)]
_QUERY_VEC_SQL = "[" + ", ".join(repr(v) for v in _QUERY_VEC) + "]"


def _dedup_stats(spark, sf_dir):
    from sidemantic_spark.operators.dedup import exact_dup_stats

    return exact_dup_stats(_docs(spark, sf_dir))


def _dedup_keep_first(spark, sf_dir):
    from sidemantic_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir)).select("doc_id", "lang", "source")


def _minhash_pairs(spark, sf_dir):
    from sidemantic_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), jaccard_threshold=0.4)


def _simhash_pairs(spark, sf_dir):
    from sidemantic_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=3)


def _ngram_pairs(spark, sf_dir):
    from sidemantic_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=5, threshold=0.6)


def _source_overlap(spark, sf_dir):
    """Prefix fingerprints (first 8 normalized words) so boilerplate
    near-dups collide across sources; whole-doc fingerprints find zero
    cross-source pairs in this corpus below sf0.1."""
    from sidemantic_spark.operators.dedup import source_overlap_matrix

    return source_overlap_matrix(_docs(spark, sf_dir), prefix_words=8)


def _vocab_topk(spark, sf_dir):
    from sidemantic_spark.operators.text import vocab_topk

    return vocab_topk(_docs(spark, sf_dir), k=100)


def _text_profile(spark, sf_dir):
    from pyspark.sql import functions as F

    from sidemantic_spark.operators import text

    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        text.token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        text.fingerprint(t).alias("fp"),
    )


def _lang_id(spark, sf_dir):
    from pyspark.sql import functions as F

    from sidemantic_spark.operators import text

    return _docs(spark, sf_dir).select(
        "doc_id", text.language_id(F.col("text")).alias("detected_lang")
    )


def _quality(spark, sf_dir):
    from pyspark.sql import functions as F

    from sidemantic_spark.operators import text

    return _docs(spark, sf_dir).select(
        "doc_id", text.quality_score(F.col("text")).alias("quality_score")
    )


def _cosine_topk(spark, sf_dir):
    from sidemantic_spark.operators.similarity import cosine_topk

    return cosine_topk(_embs(spark, sf_dir), _QUERY_VEC, k=20)


def _ann_lsh_topk(spark, sf_dir):
    """Multi-table multi-probe hyperplane LSH: 8 independently seeded
    6-bit tables x 8 probes measures recall@20 ~ 0.88 vs the
    brute-force oracle at sf0.01 (regression-tested floor 0.8 in
    tests/test_operators.py)."""
    from sidemantic_spark.operators.similarity import lsh_bucket_topk

    return lsh_bucket_topk(
        _embs(spark, sf_dir), _QUERY_VEC, k=20, nbits=6, probes=8, tables=8
    )


def _ann_ivf_topk(spark, sf_dir):
    from sidemantic_spark.operators.similarity import ivf_topk

    return ivf_topk(_embs(spark, sf_dir), _QUERY_VEC, k=20)


def _ann_quantized_topk(spark, sf_dir):
    """Int8-quantized ANN: integer-dot candidate pool (exact int math,
    deterministic across engines) + exact-cosine rerank. 4x smaller
    scan bytes than float32 brute force at 100 TB; fully
    SQL-expressible, so the DuckDB oracle replicates the quantization
    bit-for-bit."""
    from sidemantic_spark.operators.similarity import quantized_topk

    return quantized_topk(_embs(spark, sf_dir), _QUERY_VEC, k=20, pool=200)


def _cosine_topk_batch(spark, sf_dir):
    """Batch exact k-NN: the whole query block (8 vectors) against the
    corpus in one pass — per-partition numpy matmul over Arrow batches,
    only (q_id, id, sim) candidates shuffle."""
    from sidemantic_spark.operators.similarity import cosine_topk_join

    embs = _embs(spark, sf_dir)
    q = embs.where("vec_id < 8").selectExpr("vec_id AS q_id", "embedding")
    return cosine_topk_join(embs, q, k=10)


def _emb_near_dups(spark, sf_dir):
    from sidemantic_spark.operators.similarity import embedding_near_dup_pairs

    # threshold calibrated to the synthetic corpus (max pairwise cosine
    # ~0.51 at sf0.01 / ~0.60 at sf0.1 — no planted near-dups), so the
    # operator demonstrably returns pairs
    return embedding_near_dup_pairs(_embs(spark, sf_dir), min_cosine=0.4)


def _multimodal_decode(spark, sf_dir):
    from sidemantic_spark.operators.multimodal import decode_features, documents_as_media

    return decode_features(documents_as_media(_docs(spark, sf_dir)), dim=16, fake=True)


def _multimodal_decode_png(spark, sf_dir):
    """REAL codec path, Pillow-free: synthesize one tiny gray PNG per
    document (stdlib encoder, pixels derived from doc_id) in a
    mapInPandas stage, then run the production fake=False decode —
    band-mean features via operators/png.py.  Deterministic end to end;
    exact feature values are golden-tested in tests/test_operators.py
    (no SQL oracle can decode PNG, so the driver records rows-only)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from sidemantic_spark.operators.multimodal import MEDIA_SCHEMA, decode_features

    ids = _docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("media_id"))

    def to_png(batches):
        from sidemantic_spark.operators.png import encode_png

        for pdf in batches:
            payloads = [
                encode_png(
                    8, 8,
                    [(int(mid) * 7 + r * 13 + c * 29) % 256
                     for r in range(8) for c in range(8)],
                    color_type=0,
                )
                for mid in pdf["media_id"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": "image",
                "payload": payloads,
                "width": 8,
                "height": 8,
                "duration_ms": None,
                "codec": "png",
            })

    media = ids.mapInPandas(to_png, schema=MEDIA_SCHEMA)
    return decode_features(media, dim=4, fake=False)


def _multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plan: JVM-side sequence+explode expands each
    video row into frame timestamps — deterministic metadata math, so
    fully oracle-checkable (the per-frame DECODE would be the stubbed
    mapInPandas stage)."""
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.multimodal import frame_sample_plan

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("video"))
        .otherwise(F.lit("image"))
        .alias("media_type"),
        F.lit(None).cast("binary").alias("payload"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        (F.col("n_chars") * 7 % 5000).cast("long").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )
    return frame_sample_plan(media, every_ms=700)


def _multimodal_resize(spark, sf_dir):
    """Aspect-preserving resize metadata path (payload stubbed): the
    width/height arithmetic runs in the same Arrow batches a real codec
    would use, and is deterministic — oracle-checked."""
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.multimodal import resize_images

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit(None).cast("binary").alias("payload"),
        (F.col("n_chars") % 1000 + 64).cast("long").alias("width"),
        (F.col("n_chars") % 700 + 48).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )
    return resize_images(media, max_side=256).select("media_id", "width", "height")


def _row_level_security(spark, sf_dir):
    """Row-level security: per-request Jinja row filter ANDed into the
    owning model's CTE pre-join (reference sql/generator.py:879-960,
    core/security.py). Dedicated layer so the policy never gates other
    contract entries."""
    from sidemantic_spark.core.model import Dimension, Metric, Model
    from sidemantic_spark.core.security import SecurityPolicy
    from sidemantic_spark.core.layer import SparkSemanticLayer

    _ensure_tables(spark, sf_dir)
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="orders",
        table="orders",
        primary_key="o_orderkey",
        dimensions=[Dimension(name="priority", sql="o_orderpriority")],
        metrics=[
            Metric(name="revenue", agg="sum", sql="CAST(o_totalprice AS DECIMAL(18,2))"),
        ],
        security=SecurityPolicy(
            access="{{ user.role in ('admin', 'analyst') }}",
            row_filters=["o_orderstatus = '{{ user.allowed_status }}'"],
        ),
    ))
    return layer.query(
        metrics=["orders.revenue"],
        dimensions=["orders.priority"],
        user={"role": "analyst", "allowed_status": "F"},
    )


def _dedup_clusters(spark, sf_dir):
    """Connected-components duplicate clusters over the exact n-gram
    Jaccard pair graph (threshold 0.6): cluster_id = min doc_id in the
    component. The edge set is SQL-expressible, so the whole pipeline —
    pairs AND clustering — is oracle-checked (recursive CTE)."""
    from sidemantic_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(_docs(spark, sf_dir), n=5, threshold=0.6)
    return connected_components(pairs)


def _text_gopher_flags(spark, sf_dir):
    """Gopher document-quality rules (Rae et al. 2021 A1.1): per-doc
    measurements, one boolean per rule, final keep conjunction — all
    built-in expressions, zero shuffle. The stopword list is tuned to
    the synthetic corpus vocabulary so both rule outcomes occur;
    defaults are the paper's."""
    from sidemantic_spark.operators.text import gopher_quality_flags

    from pyspark.sql import functions as F

    out = gopher_quality_flags(
        _docs(spark, sf_dir).select("doc_id", "text"),
        stopwords=["the", "a", "and", "of"],
    ).drop("text")
    return out.select(
        *[
            F.col(c).cast("bigint").alias(c)
            if c in ("word_count", "stopword_hits")
            else F.col(c)
            for c in out.columns
        ]
    )


def _pipeline_span_dedup(spark, sf_dir):
    """C4-style duplicate-span removal (Raffel et al. 2020 §2.2):
    fixed-width word spans, global first-occurrence-wins dedup in one
    row_number window keyed on the span digest, per-doc reassembly.
    Every document survives (possibly empty), so cardinality is
    stable."""
    from sidemantic_spark.operators.pipeline import span_dedup

    return span_dedup(
        _docs(spark, sf_dir).select("doc_id", "text"), span_words=10
    )


def _sim_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the embeddings table:
    banded-LSH cosine near-dup graph (threshold 0.4, same S-curve
    analysis as sim_embedding_near_dups) -> connected components ->
    keep the min-id representative per semantic cluster. The full
    pipeline (candidates, verify, clustering, representative) is
    SQL-expressible, so it is oracle-checked end to end."""
    from sidemantic_spark.operators.similarity import semantic_dedup

    return semantic_dedup(_embs(spark, sf_dir), min_cosine=0.4)


def _text_fingerprint(spark, sf_dir):
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.text import fingerprint

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


def _text_pii_scrub(spark, sf_dir):
    """PII redaction (emails / IPv4s / phone runs -> typed tokens).
    The synthetic corpus carries no PII, so deterministic contact lines
    derived from doc_id are appended on BOTH sides before scrubbing —
    the redaction itself is then a real multi-pattern pass."""
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.text import pii_counts, pii_scrub

    d = _docs(spark, sf_dir)
    injected = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org from 10.0.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call +1 555-000-"),
        (F.col("doc_id") % 10000).cast("string"),
    )
    counts = pii_counts(injected)
    return d.select(
        "doc_id",
        pii_scrub(injected).alias("clean_text"),
        counts["n_email"].alias("n_email"),
        counts["n_ip"].alias("n_ip"),
    )


def _text_repetition(spark, sf_dir):
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.text import repetition_score

    return _docs(spark, sf_dir).select(
        "doc_id", repetition_score(F.col("text")).alias("rep_score")
    )


def _data_profile_numeric(spark, sf_dir):
    from sidemantic_spark.operators.text import profile_numeric

    return profile_numeric(_docs(spark, sf_dir), "n_chars", by=["lang"])


# target domain mix for the contract entry: first 10 sources get 1.5x
# the share of the last 10 (6% vs 4%), so acceptance rates split into
# a binding (keep-everything) tier and a downsampled tier
_MIX_TARGET = {f"src{i}": (0.06 if i < 10 else 0.04) for i in range(20)}


def _pipeline_domain_mix(spark, sf_dir):
    from sidemantic_spark.operators.pipeline import domain_mix_plan

    return domain_mix_plan(_docs(spark, sf_dir), _MIX_TARGET)


def _token_bpe(spark, sf_dir):
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.text import bpe_token_count, token_count

    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(t).alias("ws_tokens"),
        bpe_token_count(t).alias("bpe_tokens"),
    )


def _pipeline_clean_corpus(spark, sf_dir):
    """Composed training-data pipeline: language filter + quality gate +
    exact dedup (keep lowest id per content fingerprint) + corpus
    stats. One aggregate row; every stage is the same operator exposed
    individually elsewhere in the contract."""
    from pyspark.sql import functions as F

    from sidemantic_spark.operators import text

    t = F.col("text")
    prof = _docs(spark, sf_dir).select(
        "doc_id",
        text.language_id(t).alias("lang"),
        text.quality_score(t).alias("q"),
        text.token_count(t).alias("toks"),
        text.bpe_token_count(t).alias("btoks"),
        text.fingerprint(t).alias("fp"),
    )
    clean = prof.where((F.col("lang") == "en") & (F.col("q") >= 0.5))
    keep = clean.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = clean.join(keep, ["fp", "doc_id"], "left_semi")
    return kept.agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("total_ws_tokens"),
        F.sum("btoks").alias("total_bpe_tokens"),
        # quality summed in DECIMAL: exact accumulation, so the final
        # double division is bit-identical across engines
        (
            F.sum(F.col("q").cast("decimal(10,6)")).cast("double") / F.count("*")
        ).alias("avg_quality"),
    )


def _create_view_sink(spark, sf_dir):
    """CREATE VIEW sink (reference sql/generator.py:817-858
    generate_view): a compiled semantic query registered as a view,
    then consumed by plain SQL over the view."""
    layer = _layer(spark, sf_dir)
    layer.create_view(
        "contract_rev_by_priority",
        metrics=["orders.revenue"],
        dimensions=["orders.priority"],
    )
    return spark.sql(
        "SELECT priority, CAST(revenue AS DOUBLE) AS revenue "
        "FROM contract_rev_by_priority WHERE revenue > 0"
    )


def _explore_query(spark, sf_dir):
    """Explore consumption contract (reference core/consumption.py,
    resolved at compile core/semantic_layer.py:923): curated metric/dim
    allowlist + mandatory filter + default order/limit applied to the
    user's partial query."""
    from sidemantic_spark.core.consumption import Explore

    layer = _layer(spark, sf_dir)
    if "orders_by_priority" not in layer.graph.explores:
        layer.add_explore(Explore(
            name="orders_by_priority",
            model="orders",
            allowed_dimensions=["orders.priority", "orders.status"],
            allowed_metrics=["orders.revenue", "orders.order_count"],
            filters=["orders.status != 'P'"],
            default_order_by=["priority"],
        ))
    return layer.query(
        explore="orders_by_priority",
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.priority"],
    )


def _pipeline_sequence_pack(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing (distributed prefix
    sum: per-shard window + broadcast base offsets — no global
    single-partition stage). Token weight is the chars/4 heuristic so
    the op stays a pure function of the documents table."""
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.pipeline import sequence_pack

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("greatest(n_chars div 4, 1)").alias("n_tokens"),
    )
    return sequence_pack(d, capacity=2048, n_shards=64)


_SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25}


def _pipeline_sample_stratified(spark, sf_dir):
    """Deterministic stratified downsampling keyed on md5(doc_id):
    reproducible across runs/engines/cluster sizes, no RNG state."""
    from sidemantic_spark.operators.pipeline import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        rates=_SAMPLE_RATES, default_rate=0.1,
    )


def _pipeline_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs (id >= 50) sharing any
    word 8-gram with the eval slice (id < 50). Inverted-index join on
    the gram hash; only (id, hash) pairs shuffle."""
    from sidemantic_spark.operators.pipeline import decontaminate

    docs = _docs(spark, sf_dir)
    return decontaminate(
        docs.where("doc_id >= 50"), docs.where("doc_id < 50"), n=8
    )


_BM25_QUERY = "fast hash join"


def _text_bm25_topk(spark, sf_dir):
    """Okapi BM25 lexical top-k: map-only tokenize + per-term TF, one
    map-side-combined stats aggregate re-joined via broadcast, top-k as
    TakeOrderedAndProject — no corpus shuffle at any scale."""
    from sidemantic_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), _BM25_QUERY, k=25)


_BM25_QUERY2 = "stream window sort"


def _text_bm25_indexed(spark, sf_dir):
    """BM25 over MATERIALIZED corpus statistics (build_term_stats):
    the per-query stats pass becomes a term-pruned scan of a
    vocabulary-sized table — the preagg philosophy applied to lexical
    search. Results are identical to the inline path (equivalence
    pinned in tests); the oracle recomputes from the raw corpus."""
    from sidemantic_spark.operators.search import bm25_topk, build_term_stats

    docs = _docs(spark, sf_dir)
    return bm25_topk(docs, _BM25_QUERY2, k=25, stats=build_term_stats(docs))


def _search_tfidf_topk(spark, sf_dir):
    """lnTF-IDF baseline scorer over the same plan shape as BM25."""
    from sidemantic_spark.operators.search import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), _BM25_QUERY, k=25)


def _events_sessionize(spark, sf_dir):
    """Gap-based batch sessionization (1-day gap): one exchange on
    user_id; the LAG window and the per-session rollup both run inside
    that partitioning (no second exchange). Integer-microsecond time
    math for exact cross-engine reproducibility."""
    from sidemantic_spark.operators.sessions import session_stats

    _ensure_tables(spark, sf_dir)
    return session_stats(
        spark.table("events").selectExpr(
            "user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type"
        ),
        gap_seconds=86400,
    )


def _bm25_oracle_sql(terms: list[str], k: int, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of operators/search.bm25_topk for the fixed query."""
    dfs = ",\n                   ".join(
        f"sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(terms)
    )
    contribs = []
    for i, t in enumerate(terms):
        tf = f"len(list_filter(b.toks, x -> x = '{t}'))::DOUBLE"
        idf = f"ln(1 + (s.n::DOUBLE - s.df{i}::DOUBLE + 0.5) / (s.df{i}::DOUBLE + 0.5))"
        contribs.append(
            f"{idf} * ({tf} * {k1 + 1.0}) / ({tf} + {k1} * "
            f"({1.0 - b} + {b} * b.dl::DOUBLE / (s.dl_total::DOUBLE / s.n::DOUBLE)))"
        )
    score = "\n                 + ".join(contribs)
    return f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        base AS (SELECT doc_id, toks, len(toks) AS dl FROM tok),
        stats AS (
            SELECT count(*) AS n, sum(dl) AS dl_total,
                   {dfs}
            FROM base
        )
        SELECT b.doc_id,
               round({score}, 6) AS score
        FROM base b CROSS JOIN stats s
        WHERE round({score}, 6) > 0
        ORDER BY 2 DESC, 1
        LIMIT {k}
    """


def _tfidf_oracle_sql(terms: list[str], k: int) -> str:
    """DuckDB twin of operators/search.tfidf_topk."""
    dfs = ",\n                   ".join(
        f"sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(terms)
    )
    contribs = []
    for i, t in enumerate(terms):
        tf = f"len(list_filter(b.toks, x -> x = '{t}'))::DOUBLE"
        contribs.append(
            f"CASE WHEN {tf} > 0 AND s.df{i} > 0 THEN "
            f"(1.0 + ln({tf})) * ln(s.n::DOUBLE / s.df{i}::DOUBLE) ELSE 0.0 END"
        )
    score = "\n                 + ".join(contribs)
    return f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        base AS (SELECT doc_id, toks FROM tok),
        stats AS (SELECT count(*) AS n, {dfs} FROM base)
        SELECT b.doc_id,
               round({score}, 6) AS score
        FROM base b CROSS JOIN stats s
        WHERE round({score}, 6) > 0
        ORDER BY 2 DESC, 1
        LIMIT {k}
    """


def _pipeline_chunk_docs(spark, sf_dir):
    """Fixed-size overlapping character chunking (embedding/RAG prep):
    map-only sequence+substr+posexplode, zero shuffle. Chunk text
    compares as md5 to keep the result compact."""
    from pyspark.sql import functions as F

    from sidemantic_spark.operators.pipeline import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), size=400, overlap=40
    ).select(
        "doc_id", "chunk_idx",
        F.length("chunk_text").alias("chunk_chars"),
        F.md5("chunk_text").alias("chunk_md5"),
    )


def _pipeline_shuffle_shards(spark, sf_dir):
    """Deterministic md5-keyed global shuffle into 8 shards: the
    write-ordering step of a corpus pipeline, one shard-keyed shuffle,
    no global sort stage."""
    from sidemantic_spark.operators.pipeline import shuffle_shards

    return shuffle_shards(
        _docs(spark, sf_dir).select("doc_id"), n_shards=8, seed="r8"
    )


def _source_scan_uri(spark, sf_dir):
    """Remote/file source scan (reference core/model.py:30 source_uri):
    the model binds to a parquet URI, registered as a plain scan view so
    Catalyst pushdown applies untouched."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="orders_uri",
        table="orders_uri_scan",
        source_uri=f"file://{sf_dir.rstrip('/')}/orders.parquet",
        source_format="parquet",
        primary_key="o_orderkey",
        dimensions=[Dimension(name="status", sql="o_orderstatus")],
        metrics=[
            Metric(name="revenue", agg="sum", sql="CAST(o_totalprice AS DECIMAL(18,2))"),
        ],
    ))
    return layer.query(
        metrics=["orders_uri.revenue"], dimensions=["orders_uri.status"]
    )


def _saved_query_run(spark, sf_dir):
    """Saved query (reference core/consumption): a named, stored query
    definition expanded at compile time."""
    from sidemantic_spark.core.consumption import SavedQuery

    layer = _layer(spark, sf_dir)
    if "contract_top_priorities" not in layer.graph.saved_queries:
        layer.add_saved_query(SavedQuery(
            name="contract_top_priorities",
            metrics=["orders.revenue"],
            dimensions=["orders.priority"],
            order_by=["revenue desc", "priority"],
            limit=3,
        ))
    return layer.query(saved_query="contract_top_priorities")


def _semantic_sql_intersect(spark, sf_dir):
    return _layer(spark, sf_dir).sql(
        "SELECT orders.priority FROM orders WHERE orders.status = 'O' "
        "INTERSECT "
        "SELECT orders.priority FROM orders WHERE orders.status = 'F'"
    )


def _semantic_sql_except(spark, sf_dir):
    return _layer(spark, sf_dir).sql(
        "SELECT orders.priority FROM orders "
        "EXCEPT "
        "SELECT orders.priority FROM orders WHERE orders.status = 'F'"
    )


def _preagg_route(spark, sf_dir):
    """Aggregate-aware routing: materialize a daily rollup of orders,
    then serve a coarser-grain query FROM the rollup (reference
    core/pre_aggregation.py / preagg_management.py). Uses a dedicated
    layer instance so the rollup attachment never changes other contract
    entries' plans."""
    import os

    from sidemantic_spark.models.tpch import build_layer
    from sidemantic_spark.preagg.matcher import PreAggregation

    _ensure_tables(spark, sf_dir)
    layer = build_layer(spark, None)
    orders = layer.graph.get_model("orders")
    orders.pre_aggregations = [
        PreAggregation(
            name="contract_daily",
            measures=["revenue", "order_count"],
            dimensions=["status", "priority"],
            time_dimension="order_date",
            granularity="day",
        )
    ]
    layer.preaggs.base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".preagg_cache",
        os.path.basename(sf_dir.rstrip("/")),
    )
    layer.preaggs.materialize("orders")
    sql = layer.compile(
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.status"],
    )
    assert "used_preagg=orders_preagg_contract_daily" in sql, sql[:200]
    return layer.query(
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.status"],
    )


def _detail_layer(spark, sf_dir):
    """Dedicated layer with a pk dimension on orders (detail entries
    need a unique key for a deterministic ORDER BY/LIMIT and for the
    PK-carrying rollup route)."""
    from sidemantic_spark.core.model import Dimension
    from sidemantic_spark.models.tpch import build_layer

    _ensure_tables(spark, sf_dir)
    layer = build_layer(spark, None)
    orders = layer.graph.get_model("orders")
    orders.dimensions.append(Dimension(name="okey", sql="o_orderkey"))
    orders.reindex()
    layer.graph._invalidate()
    return layer


def _ungrouped_metrics_detail(spark, sf_dir):
    """Drill-to-detail WITH metrics: per-row raw measure values, no
    GROUP BY (round-5 feature; reference sql/generator.py:3869-3872
    selects the raw column under ungrouped)."""
    return _detail_layer(spark, sf_dir).query(
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.okey", "orders.status"],
        filters=["orders.status = 'P'"],
        order_by=["okey"],
        limit=500,
        ungrouped=True,
    )


def _preagg_ungrouped_route(spark, sf_dir):
    """Ungrouped routing to a PK-carrying rollup: the stored partials
    ARE the per-row values, so drill-to-detail pages serve from the
    rollup instead of re-scanning the fact (reference
    test_ungrouped_routes_to_pk_carrying_rollup)."""
    import os

    from sidemantic_spark.preagg.matcher import PreAggregation

    layer = _detail_layer(spark, sf_dir)
    orders = layer.graph.get_model("orders")
    orders.pre_aggregations = [PreAggregation(
        name="contract_detail",
        measures=["revenue", "order_count"],
        dimensions=["okey", "status"],
    )]
    layer.preaggs.base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".preagg_cache",
        os.path.basename(sf_dir.rstrip("/")),
    )
    layer.preaggs.materialize("orders")
    kw = dict(
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.okey", "orders.status"],
        filters=["orders.status = 'P'"],
        order_by=["okey"],
        limit=500,
        ungrouped=True,
    )
    sql = layer.compile(**kw)
    assert "plan=preagg-ungrouped" in sql, sql[:200]
    return layer.query(**kw)


def _preagg_filtered_measure_route(spark, sf_dir):
    """Filtered additive measures route to rollups that bake the filter
    into the stored partial state (round-5 feature; reference
    test_total_rollup_materializes_filtered_metrics...)."""
    import os

    from sidemantic_spark.models.tpch import build_layer
    from sidemantic_spark.preagg.matcher import PreAggregation

    _ensure_tables(spark, sf_dir)
    layer = build_layer(spark, None)
    orders = layer.graph.get_model("orders")
    orders.pre_aggregations = [PreAggregation(
        name="contract_filt",
        measures=["open_revenue", "order_count"],
        dimensions=["priority"],
    )]
    layer.preaggs.base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".preagg_cache",
        os.path.basename(sf_dir.rstrip("/")),
    )
    layer.preaggs.materialize("orders")
    kw = dict(
        metrics=["orders.open_revenue", "orders.order_count"],
        dimensions=["orders.priority"],
    )
    sql = layer.compile(**kw)
    assert "used_preagg=orders_preagg_contract_filt" in sql, sql[:200]
    return layer.query(**kw)


def _preagg_approx_distinct_route(spark, sf_dir):
    """approx_count_distinct routes through stored HLL sketches at a
    COARSER grain than the rollup (hll_union_agg + hll_sketch_estimate
    re-aggregation) — the Spark-first upgrade over the reference's
    exact-grain-only count_distinct guard (core/preagg_matcher.py:
    138-143).  HLL estimates aren't DuckDB-reproducible, so the entry
    surfaces a DuckDB-checkable projection: the exact distinct count
    per bucket plus two booleans — routed-vs-raw sketch parity
    (union of daily sketches must equal the direct month sketch) and
    a 5%% accuracy bound vs the exact count."""
    import os

    from pyspark.sql import functions as F

    from sidemantic_spark.models.tpch import build_layer
    from sidemantic_spark.preagg.matcher import PreAggregation

    _ensure_tables(spark, sf_dir)
    layer = build_layer(spark, None)
    orders = layer.graph.get_model("orders")
    orders.pre_aggregations = [PreAggregation(
        name="contract_hll",
        measures=["approx_customers", "order_count"],
        dimensions=[],
        time_dimension="order_date",
        granularity="day",
    )]
    layer.preaggs.base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".preagg_cache",
        os.path.basename(sf_dir.rstrip("/")),
    )
    layer.preaggs.materialize("orders")
    kw = dict(
        metrics=["orders.approx_customers"],
        dimensions=["orders.order_date__month AS order_month"],
    )
    sql = layer.compile(**kw)
    assert "used_preagg=orders_preagg_contract_hll" in sql, sql[:200]
    assert "hll_union_agg" in sql and "hll_sketch_estimate" in sql, sql[:400]
    routed = layer.query(**kw)
    raw = spark.sql(
        "SELECT DATE_TRUNC('month', o_orderdate) AS order_month, "
        "hll_sketch_estimate(hll_sketch_agg(o_custkey)) AS est_raw, "
        "COUNT(DISTINCT o_custkey) AS exact_cd "
        "FROM orders GROUP BY 1"
    )
    return (
        routed.join(raw, "order_month")
        .select(
            "order_month",
            "exact_cd",
            (F.col("approx_customers") == F.col("est_raw")).alias("parity_ok"),
            (
                F.abs(F.col("approx_customers") - F.col("exact_cd"))
                / F.col("exact_cd")
                < F.lit(0.05)
            ).alias("est_in_bounds"),
        )
    )


def _fanout_complete_sql(spark, sf_dir):
    """Opaque complete-SQL measure under a fan-out join, evaluated over
    the deduplicated entity rows (round-5 feature; reference
    test_fanout_evaluates_complete_sql_over_deduplicated_entity_rows)."""
    layer = _layer(spark, sf_dir)
    sql = layer.compile(
        metrics=["orders.open_rate"], dimensions=["lineitem.returnflag"]
    )
    assert "plan=grouped-dedup" in sql, sql[:200]
    return layer.query(
        metrics=["orders.open_rate"], dimensions=["lineitem.returnflag"]
    )


def _events_stream(spark, sf_dir):
    """events.parquet as a streaming DataFrame, with the same
    conditional nanos->timestamp cast register_tables applies to the
    batch view (no-op when the file stores micros)."""
    import os as _os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    # Spark-written tables are DIRECTORIES of part files (the synthesized
    # scale tiers in scripts/scale_check.py); read the arrow schema from
    # any part file, and stream the directory itself
    schema_path = path
    if _os.path.isdir(path):
        parts = sorted(
            f for f in _os.listdir(path) if f.endswith(".parquet")
        )
        if parts:
            schema_path = _os.path.join(path, parts[0])
    nanos_cols = [
        f.name
        for f in pq.read_schema(schema_path)
        if str(f.type).startswith("timestamp[ns")
    ]
    if _os.path.isdir(path):
        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .parquet(path)
        )
    else:
        # the file stream source wants a directory: stream the sf dir
        # with a glob filter for this one file
        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    for c in nanos_cols:
        stream = stream.withColumn(
            # integer division: a double roundtrip has 256ns ulp at 2024
                # epochs and truncates ~1.6% of aligned values 1us low
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
        )
    # watermarks require TIMESTAMP (LTZ); the file stores NTZ micros.
    # The cast reinterprets in session time (UTC), keeping wall-clock
    # values identical to the batch view and the DuckDB oracle.
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def _stream_layer(spark, sf_dir):
    from sidemantic_spark.streaming.stream_layer import (
        StreamingModelBinding,
        StreamingSemanticLayer,
    )

    sl = StreamingSemanticLayer(_layer(spark, sf_dir))
    sl.bind(
        StreamingModelBinding(
            model="events", time_column="ts", stream=_events_stream(spark, sf_dir)
        )
    )
    return sl


def _streaming_window_agg(spark, sf_dir):
    """Tumbling 1-day windowed aggregation over the events stream,
    availableNow to completion — the final state is batch-equivalent,
    so the DuckDB oracle is the plain GROUP BY day. Watermark is set
    beyond the data horizon so no late rows are dropped mid-replay."""
    import uuid

    from pyspark.sql import functions as F

    sl = _stream_layer(spark, sf_dir)
    out = sl.stream_query(
        "events",
        metrics=["events.event_count", "events.total_value"],
        dimensions=["events.event_type"],
        window="1 day",
        watermark="36500 days",
    )
    name = "stream_win_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(out, name)
    return spark.table(name).select(
        "window_start",
        "event_type",
        "event_count",
        F.col("total_value").cast("double").alias("total_value"),
    )


def _streaming_enrich_agg(spark, sf_dir):
    """Stream-static enrichment: the events stream broadcast-joined to
    the customer dimension, then a complete-mode grouped aggregate.
    Stateless join (no watermark state); availableNow replay equals the
    batch LEFT JOIN + GROUP BY oracle."""
    import uuid

    from pyspark.sql import functions as F

    sl = _stream_layer(spark, sf_dir)
    enriched = sl.stream_enrich(
        "events", "customer", {"user_id": "c_custkey"}, columns=["c_mktsegment"]
    )
    agg = enriched.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
    name = "stream_enr_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(agg, name, output_mode="complete")
    return spark.table(name)


def _streaming_dedup_fingerprint(spark, sf_dir):
    """Streaming corpus ingestion dedup on content fingerprints: the
    documents stream computes the same md5 fingerprint the batch dedup
    family uses, dropDuplicates keeps first-arrival per fingerprint,
    availableNow replay retains exactly the batch DISTINCT fingerprint
    set (the DuckDB oracle). At scale the within-watermark variant
    bounds state; replay here is exact/global so the oracle holds."""
    import uuid

    from pyspark.sql import functions as F

    from sidemantic_spark.operators.text import fingerprint
    from sidemantic_spark.streaming.stream_layer import (
        StreamingModelBinding,
        StreamingSemanticLayer,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .withColumn("fp", fingerprint(F.col("text")))
        .withColumn("__ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    )
    sl = StreamingSemanticLayer(_layer(spark, sf_dir))
    sl.bind(
        StreamingModelBinding(model="documents", time_column="__ts", stream=stream)
    )
    out = sl.stream_dedup(
        "documents", keys=["fp"], watermark="36500 days", within_watermark=False
    ).select("fp")
    name = "stream_fp_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(out, name, output_mode="append")
    return spark.table(name)


def _streaming_ingest_dedup(spark, sf_dir):
    """Watermark-bounded streaming ingestion dedup
    (dropDuplicates[WithinWatermark]); replayed availableNow with exact
    (global) dedup on the key columns, the retained key set equals the
    batch DISTINCT — the DuckDB oracle."""
    import uuid

    sl = _stream_layer(spark, sf_dir)
    out = sl.stream_dedup(
        "events",
        keys=["user_id", "event_type"],
        watermark="36500 days",
        within_watermark=False,
    ).select("user_id", "event_type")
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(out, name, output_mode="append")
    return spark.table(name)


def _streaming_sessionize(spark, sf_dir):
    """Per-user session assembly via session_window (30 min gap),
    availableNow to completion. Sessions are gap-closure over complete
    data, so a LAG/flag-sum islands query is an exact DuckDB oracle."""
    import uuid

    sl = _stream_layer(spark, sf_dir)
    out = sl.sessionize("events", entity="user_id", gap="30 minutes",
                        watermark="36500 days")
    name = "stream_sess_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(out, name)
    return spark.table(name)


def _streaming_rollup_route(spark, sf_dir):
    """Stream-maintained rollup served by the aggregate-aware router
    (lambda architecture without the manual union): foreachBatch
    dynamic-partition-overwrites the SAME parquet layout the batch
    PreAggManager writes, then a normal routed query reads it.
    availableNow replay == batch aggregation, so the plain GROUP BY is
    an exact oracle."""
    import tempfile

    from sidemantic_spark.models.tpch import build_layer
    from sidemantic_spark.preagg.matcher import PreAggregation
    from sidemantic_spark.streaming.stream_layer import (
        StreamingModelBinding,
        StreamingSemanticLayer,
    )

    _ensure_tables(spark, sf_dir)
    layer = build_layer(spark, None)  # dedicated layer: rollup stays local
    events = layer.graph.get_model("events")
    events.pre_aggregations = [PreAggregation(
        name="contract_stream_daily",
        measures=["event_count", "total_value"],
        dimensions=["event_type"],
        time_dimension="ts",
        granularity="day",
    )]
    layer.graph._invalidate()
    sl = StreamingSemanticLayer(layer)
    sl.bind(StreamingModelBinding(
        model="events", time_column="ts", stream=_events_stream(spark, sf_dir)
    ))
    tmp = tempfile.mkdtemp(prefix="stream_rollup_route_")
    q = sl.stream_rollup(
        "events", "contract_stream_daily",
        checkpoint_dir=f"{tmp}/ckpt",
        watermark="36500 days",
        base_path=f"{tmp}/rollups",
    )
    q.awaitTermination()
    sql = layer.compile(
        metrics=["events.event_count", "events.total_value"],
        dimensions=["events.event_type"],
    )
    assert "used_preagg=events_preagg_contract_stream_daily" in sql, sql[:200]
    return layer.query(
        metrics=["events.event_count", "events.total_value"],
        dimensions=["events.event_type"],
    )


def _fanout_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric-aggregate fan-out correction (reference
    core/symmetric_aggregate.py:20-162, spark branch :91-96):
    SUM(DISTINCT key*S + v) - SUM(DISTINCT key*S) with DECIMAL-lifted
    keys (the reference's raw-bigint spark variant can overflow).
    Alternative strategy to the entity-grain dedup plan, same result."""
    layer = _layer(spark, sf_dir)
    gen = layer.generator
    gen.fanout_strategy = "symmetric"
    try:
        sql = layer.compile(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["lineitem.returnflag"],
        )
        assert "plan=grouped-symmetric" in sql, sql[:200]
        return layer.query(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["lineitem.returnflag"],
        )
    finally:
        gen.fanout_strategy = "auto"


def _fanout_dedup_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-grain DISTINCT fan-out plan, explicitly forced (auto
    routes here too; the explicit force keeps this entry pinned to the
    dedup plan even if routing changes — raw-row semantics, exact
    decimal sums)."""
    layer = _layer(spark, sf_dir)
    gen = layer.generator
    gen.fanout_strategy = "dedup"
    try:
        sql = layer.compile(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["lineitem.returnflag"],
        )
        assert "plan=grouped-dedup" in sql, sql[:200]
        return layer.query(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["lineitem.returnflag"],
        )
    finally:
        gen.fanout_strategy = "auto"


def _yardstick_at_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yardstick AT (...) context modifiers (reference
    sql/query_rewriter.py:3630-3760 parse, :4742-4904 apply): ALL
    drops context dims (grand total), SET pins a dimension, WHERE adds
    filters. Each modified context compiles to an aggregated subquery
    joined back on the surviving dims."""
    return _layer(spark, sf_dir).sql(
        "SEMANTIC SELECT orders.status, AGGREGATE(orders.revenue) AS revenue, "
        "AGGREGATE(orders.revenue) AT (ALL) AS total_revenue, "
        "AGGREGATE(orders.revenue) AT (SET status = 'O') AS open_revenue "
        "FROM orders"
    )


def _yardstick_window_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window measures (``SUM(x) OVER (ORDER BY ...)`` AS MEASURE):
    two-stage plan — row-grain window eval over the base, then a
    group-grain reduction asserting ONE distinct value per evaluation
    context (ref corpus measures.test window family; a context spanning
    several window values raises the reference's 'returned multiple
    values' runtime error). Ties share the RANGE-frame value, so
    grouping by the order key is always single-valued."""
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    _ensure_tables(spark, sf_dir)
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW win_orders AS
SELECT o_orderdate,
       SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (ORDER BY o_orderdate)
           AS MEASURE running_rev
FROM orders;
""")
    return lyr.sql(
        "SEMANTIC SELECT o_orderdate AS order_day, "
        "AGGREGATE(running_rev) AS running_rev "
        "FROM win_orders GROUP BY o_orderdate"
    )


def _yardstick_visibility_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paper Listing-8 visibility semantics (corpus block 185):
    AGGREGATE(m) sees the query WHERE, a bare measure ref ignores it,
    COUNT(*) counts visible rows, and the ROLLUP grand-total row reads
    NULL for every measure (its NULL group joins no context)."""
    from sidemantic_spark.adapters.yardstick import YardstickAdapter
    from sidemantic_spark.core.layer import SparkSemanticLayer

    _ensure_tables(spark, sf_dir)
    lyr = SparkSemanticLayer(spark)
    YardstickAdapter().parse_text(lyr, """
CREATE VIEW vis_orders AS
SELECT o_orderstatus, o_orderpriority,
       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS MEASURE sum_rev
FROM orders;
""")
    return lyr.sql(
        "SELECT o.o_orderstatus AS status, COUNT(*) AS c, "
        "AGGREGATE(o.sum_rev) AS ragg, o.sum_rev AT (VISIBLE) AS rviz, "
        "o.sum_rev AS r "
        "FROM vis_orders o WHERE o.o_orderpriority <> '1-URGENT' "
        "GROUP BY ROLLUP(o.o_orderstatus)"
    )


def _events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON field profile (operators/semistruct.py):
    get_json_object evaluates the path in the JVM (Jackson) per row —
    no UDF, no parse-to-struct materialization; DECIMAL-accumulated
    mean for cross-engine determinism."""
    from sidemantic_spark.operators.semistruct import json_field_stats

    _ensure_tables(spark, sf_dir)
    return json_field_stats(
        spark.table("events"), json_col="props", path="$.k",
        group_col="event_type",
    )


def _events_json_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON key-frequency profile (schema discovery): from_json to a
    string map + exploded keys, one shuffle bounded by the key
    vocabulary."""
    from sidemantic_spark.operators.semistruct import json_key_profile

    _ensure_tables(spark, sf_dir)
    return json_key_profile(spark.table("events"), json_col="props")


def _sim_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean mislabel detection (operators/similarity.py
    label_centroid_purity): per-label DECIMAL-mean centroids (one
    labels x dim shuffle), Arrow matmul assignment with 6dp-rounded
    first-max argmax so the whole operator is SQL-oracle-expressible."""
    from sidemantic_spark.operators.similarity import label_centroid_purity

    _ensure_tables(spark, sf_dir)
    return label_centroid_purity(spark.table("embeddings"))


def _semantic_sql_fromless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT without a top-level FROM: each scalar-subquery island
    compiles through the semantic path (ref corpus measures.test
    cardinality checks — COUNT(*) over a measure view counts detail
    rows, not groups)."""
    return _layer(spark, sf_dir).sql(
        "SELECT (SELECT COUNT(*) FROM orders) AS order_rows, "
        "(SELECT COUNT(*) FROM customer) AS customer_rows"
    )


def _streaming_json_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming aggregation over a schema-on-read JSON metric
    (get_json_object inside the incremental agg — Jackson in the JVM,
    streams exactly like a plain column): daily event windows with the
    count and the sum of the props.k field, availableNow to completion
    so the final state is batch-equivalent and the DuckDB oracle is the
    plain GROUP BY day + json_extract_string."""
    import uuid

    from pyspark.sql import functions as F

    sl = _stream_layer(spark, sf_dir)
    out = sl.stream_query(
        "events",
        metrics=["events.event_count", "events.props_k_sum"],
        dimensions=["events.event_type"],
        window="1 day",
        watermark="36500 days",
    )
    name = "stream_json_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(out, name)
    return spark.table(name).select(
        "window_start",
        "event_type",
        "event_count",
        F.col("props_k_sum").cast("double").alias("props_k_sum"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = {
        # §2.2/2.4 projection/filter/aggregation
        "basic_agg": _q(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["orders.status"],
        ),
        "time_grain_month": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        "filter_pushdown": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.priority"],
            filters=[
                "orders.status = 'F'",
                "orders.order_date__year >= TIMESTAMP '1996-01-01'",
            ],
        ),
        "metric_filter": _q(
            metrics=["orders.open_revenue", "orders.revenue"],
            dimensions=["orders.priority"],
        ),
        "ratio_metric": _q(
            metrics=["orders.aov_ratio"], dimensions=["orders.status"]
        ),
        "derived_metric": _q(
            metrics=["orders.open_share"], dimensions=["orders.status"]
        ),
        # §2.4 metric-level window total (BSL ALL): percent-of-total as
        # a metric — all(revenue) -> SUM(SUM(x)) OVER ()
        "metric_percent_of_total": _q(
            metrics=["orders.revenue", "orders.revenue_share"],
            dimensions=["orders.status"],
        ),
        "having_filter": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.priority"],
            filters=["orders.revenue > 10000000"],
        ),
        # round 10: HAVING on a metric NOT in the select list — the
        # metric's components register as hidden raw columns so the
        # aggregate evaluates in HAVING scope without widening the
        # output schema (ref tests/metrics/test_filters.py:264)
        "having_unselected_metric": _q(
            metrics=["orders.order_count"],
            dimensions=["orders.status"],
            filters=["orders.revenue > 10000000"],
        ),
        "order_limit": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.priority"],
            order_by=["revenue desc", "priority"],
            limit=3,
        ),
        "ungrouped": _q(
            dimensions=["orders.status", "orders.priority"],
            filters=["orders.status = 'P'"],
            ungrouped=True,
        ),
        "with_totals": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.status"],
            with_totals=True,
        ),
        "count_distinct_minmax": _q(
            metrics=[
                "orders.customer_count",
                "orders.max_order_value",
                "orders.min_order_value",
                "orders.avg_order_value",
            ],
            dimensions=["orders.status"],
        ),
        "dims_only_distinct": _q(dimensions=["orders.status", "orders.priority"]),
        "segment_filter": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.status"],
            segments=["orders.urgent"],
        ),
        "fill_nulls_zero": _q(
            metrics=["orders.pending_revenue"],
            dimensions=["orders.priority"],
        ),
        "timezone_month": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.order_date__month AS order_month"],
            timezone="America/New_York",
        ),
        "relative_date_filter": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.status"],
            filters=["orders.order_date >= 'last 40 years'"],
        ),
        "window_dimension": _q(
            metrics=["events.event_count"],
            dimensions=["events.next_event"],
            filters=["events.next_event IS NOT NULL"],
        ),
        "complete_sql_measure": _q(
            metrics=["orders.open_rate", "orders.revenue"],
            dimensions=["orders.status"],
        ),
        "stats_aggs": _stats_aggs,
        "jinja_param_filter": _q(
            metrics=["orders.order_count", "orders.revenue"],
            dimensions=["orders.status"],
            filters=["{% if only_open %}orders.status = 'O'{% endif %}"],
            parameters={"only_open": True},
        ),
        "semantic_sql_expression": _semantic_sql_expression,
        "semantic_sql_cte_island": _semantic_sql_cte_island,
        "semantic_sql_union": _semantic_sql_union,
        "semantic_sql_from_metrics": _semantic_sql_from_metrics,
        "semantic_sql_qualify_topn": _semantic_sql_qualify_topn,
        "semantic_sql_time_rollup": _semantic_sql_time_rollup,
        "yardstick_aggregate": _yardstick_aggregate,
        "yardstick_at_modifiers": _yardstick_at_modifiers,
        "yardstick_window_measure": _yardstick_window_measure,
        "events_json_stats": _events_json_stats,
        "events_json_keys": _events_json_keys,
        "sim_label_purity": _sim_label_purity,
        "yardstick_visibility_rollup": _yardstick_visibility_rollup,
        "semantic_sql_fromless": _semantic_sql_fromless,
        "table_calc_pct_of_total": _table_calc_pct_of_total,
        "table_calc_rank": _table_calc_rank,
        "table_calc_moving_avg": _table_calc_moving_avg,
        "table_calc_pct_of_previous": _table_calc_pct_of_previous,
        "table_calc_formula": _table_calc_formula,
        # §2.3 joins
        "join_m2o": _q(
            metrics=["orders.revenue"], dimensions=["customer.mktsegment"]
        ),
        "join_multi_hop": _q(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["nation.name AS nation_name"],
        ),
        "join_filtered_inner": _q(
            metrics=["orders.revenue"],
            dimensions=["region.name AS region_name"],
            filters=["region.name != 'EUROPE'"],
        ),
        "fanout_dedup": _q(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["lineitem.returnflag"],
        ),
        "fanout_symmetric_aggs": _fanout_symmetric,
        "fanout_dedup_plan": _fanout_dedup_plan,
        "fanout_safe_aggs": _q(
            metrics=["orders.max_order_value", "orders.customer_count"],
            dimensions=["lineitem.returnflag"],
        ),
        "multifact_split": _q(
            metrics=["orders.revenue", "customer.total_acctbal"],
            dimensions=["nation.name AS nation_name"],
        ),
        "join_part_brand": _q(
            metrics=["lineitem.disc_revenue"],
            dimensions=["part.brand"],
            filters=["lineitem.returnflag = 'R'"],
        ),
        # §2.3 many_to_many through junction: orders <-> part via
        # lineitem; fan-out neutralized by PK dedup before counting
        "join_m2m_through": _q(
            metrics=["part.part_count"],
            dimensions=["orders.priority"],
        ),
        # §2.3 relationship FK queryable as a dimension with NO join and
        # no explicit declaration (ref tests/test_foreign_key_dimensions.py)
        "fk_dimension_no_join": _q(
            metrics=["orders.revenue", "orders.order_count"],
            dimensions=["orders.o_custkey"],
        ),
        # §2.3 cross join relationship
        "join_cross": _q(
            metrics=["supplier.supplier_count"],
            dimensions=["part.brand AS brand"],
        ),
        # §2.5 window metrics
        "running_total": _q(
            metrics=["orders.revenue", "orders.cumulative_revenue"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        "rolling_window_90d": _q(
            metrics=["orders.revenue_3m"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        "ytd": _q(
            metrics=["orders.revenue_ytd"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        "mom_pct_change": _q(
            metrics=["orders.revenue", "orders.revenue_mom"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        # derived formula over a prior-value comparison child (the shape
        # MetricFlow offset_window aliases synthesize): the window plan
        # hoists the comparison as a pseudo-unit and combines it with
        # the plain aggregate in the outer select
        "derived_offset_growth": _q(
            metrics=["orders.revenue", "orders.revenue_growth_mom"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        # HAVING over a comparison metric: the window plan applies the
        # predicate as a filter stage over its output columns
        "having_on_window_metric": _q(
            metrics=["orders.revenue", "orders.revenue_mom"],
            dimensions=["orders.order_date__month AS order_month"],
            filters=["orders.revenue_mom > 0"],
        ),
        # §2.5 raw window_expression passthrough
        "window_expr_peak": _q(
            metrics=["orders.revenue", "orders.revenue_peak_to_date"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        # §2.1 derived-table scan + §2.3 composite-key one_to_one join
        "join_composite_derived": _q(
            metrics=["lineitem_x.qty2_total"],
            dimensions=["lineitem.returnflag"],
        ),
        # §2.5 time_comparison wow + ratio with offset_window
        "wow_pct_change": _q(
            metrics=["events.event_wow"],
            dimensions=["events.ts__week AS event_week"],
        ),
        "ratio_offset_share": _q(
            metrics=["orders.revenue_vs_prior_month"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        "yoy_difference": _q(
            metrics=["orders.revenue_yoy_diff"],
            dimensions=["orders.order_date__year AS order_year"],
        ),
        # §2.5 qoq with calculation=ratio at quarter grain
        "qoq_ratio": _q(
            metrics=["orders.revenue_qoq_ratio"],
            dimensions=["orders.order_date__quarter AS order_quarter"],
        ),
        # §2.5 custom time_offset (ref core/metric.py:315): vs 2 months ago
        "time_offset_custom": _q(
            metrics=["orders.revenue_vs_2mo"],
            dimensions=["orders.order_date__month AS order_month"],
        ),
        "conversion_funnel": _q(metrics=["events.signup_to_purchase"]),
        "conversion_by_dimension": _q(
            metrics=["events.signup_to_purchase"],
            dimensions=["events.user_bucket"],
        ),
        "conversion_funnel_3step": _q(metrics=["events.signup_funnel"]),
        "retention_weekly": _q(metrics=["events.weekly_retention"]),
        "cohort_avg_spend": _q(metrics=["events.avg_user_spend"]),
        "semi_additive_last": _q(
            metrics=["lineitem.last_qty_per_part"],
            dimensions=["lineitem.ship_date__month AS ship_month"],
        ),
        "tpch_q1_pricing_summary": _tpch_q1,
        # LLM-data-pipeline operators
        "dedup_exact_stats": _dedup_stats,
        "dedup_exact_keep_first": _dedup_keep_first,
        "dedup_minhash_lsh": _minhash_pairs,
        "dedup_simhash": _simhash_pairs,
        "dedup_ngram_jaccard": _ngram_pairs,
        "dedup_source_overlap": _source_overlap,
        "text_vocab_topk": _vocab_topk,
        "text_profile": _text_profile,
        "text_language_id": _lang_id,
        "text_quality_score": _quality,
        "text_pii_scrub": _text_pii_scrub,
        "text_repetition": _text_repetition,
        "data_profile_numeric": _data_profile_numeric,
        "pipeline_domain_mix": _pipeline_domain_mix,
        "sim_cosine_topk": _cosine_topk,
        "sim_ann_quantized_topk": _ann_quantized_topk,
        "sim_cosine_topk_batch": _cosine_topk_batch,
        "sim_ann_lsh_topk": _ann_lsh_topk,
        "sim_ann_ivf_topk": _ann_ivf_topk,
        "sim_embedding_near_dups": _emb_near_dups,
        "multimodal_decode_features": _multimodal_decode,
        "multimodal_decode_png": _multimodal_decode_png,
        "multimodal_frame_sample": _multimodal_frame_sample,
        "multimodal_resize_meta": _multimodal_resize,
        # §2.6 pagination
        "limit_offset_page": _q(
            metrics=["orders.revenue"],
            dimensions=["orders.priority"],
            order_by=["revenue desc", "priority"],
            limit=2,
            offset=1,
        ),
        # §2.2 row-level security
        "row_level_security": _row_level_security,
        # §2.7 set operations in semantic SQL
        "semantic_sql_intersect": _semantic_sql_intersect,
        "semantic_sql_except": _semantic_sql_except,
        # §2.1 file/remote source scan + §3 saved queries
        "source_scan_uri": _source_scan_uri,
        "saved_query_run": _saved_query_run,
        "explore_query": _explore_query,
        "create_view_sink": _create_view_sink,
        # connected-components dedup clustering over the ngram pair graph
        "dedup_clusters": _dedup_clusters,
        "text_gopher_flags": _text_gopher_flags,
        "pipeline_span_dedup": _pipeline_span_dedup,
        "sim_semantic_dedup": _sim_semantic_dedup,
        # text fingerprinting (md5 of normalized content)
        "text_fingerprint": _text_fingerprint,
        # BPE-ish tokenization + composed clean-corpus pipeline
        "text_token_bpe": _token_bpe,
        "pipeline_clean_corpus": _pipeline_clean_corpus,
        # training-pipeline ops: packing, sampling, decontamination
        "pipeline_sequence_pack": _pipeline_sequence_pack,
        "pipeline_sample_stratified": _pipeline_sample_stratified,
        "pipeline_decontaminate": _pipeline_decontaminate,
        "pipeline_shuffle_shards": _pipeline_shuffle_shards,
        "pipeline_chunk_docs": _pipeline_chunk_docs,
        # lexical retrieval (BM25/TF-IDF) + batch sessionization
        "text_bm25_topk": _text_bm25_topk,
        "text_bm25_indexed": _text_bm25_indexed,
        "search_tfidf_topk": _search_tfidf_topk,
        "events_sessionize": _events_sessionize,
        # §2.1 pre-aggregation materialization sink + aggregate-aware
        # routing
        "preagg_rollup_route": _preagg_route,
        # round-5 features: drill-to-detail metrics, pk-rollup routing,
        # filtered-measure rollups, complete-SQL under fan-out
        "ungrouped_metrics_detail": _ungrouped_metrics_detail,
        "preagg_ungrouped_route": _preagg_ungrouped_route,
        "preagg_filtered_measure_route": _preagg_filtered_measure_route,
        "fanout_complete_sql": _fanout_complete_sql,
        # round-6 feature: HLL-sketch rollup partials let approx-
        # distinct metrics re-aggregate at any coarser grain
        "preagg_approx_distinct_route": _preagg_approx_distinct_route,
        "corpus_stats_by_source": _q(
            metrics=["documents.doc_count", "documents.total_chars",
                     "documents.avg_chars"],
            dimensions=["documents.source"],
        ),
        # §2.9 Structured Streaming extension (reference has none):
        # availableNow replay == batch semantics, so both are
        # oracle-checkable
        "streaming_window_agg": _streaming_window_agg,
        "streaming_sessionize": _streaming_sessionize,
        "streaming_ingest_dedup": _streaming_ingest_dedup,
        "streaming_enrich_agg": _streaming_enrich_agg,
        "streaming_dedup_fingerprint": _streaming_dedup_fingerprint,
        "streaming_rollup_route": _streaming_rollup_route,
        "streaming_json_rollup": _streaming_json_rollup,
    }
    # Driver-sample rotation (policy encoded since round 7, replacing
    # per-round hand-picked lists): the driver oracle-checks the FIRST
    # 50 entries each round, so entries are ordered
    # never-oracle-verified-first, then stalest-verification-first,
    # computed from the CORRECTNESS_r*.json records the driver itself
    # writes to the repo root. An entry counts as "verified in round N"
    # only when that round's record hash-matched (rows-only records
    # don't count — they were the r1-r6 blind spot). basic_agg stays
    # pinned first as the session cold-start absorber (the first
    # entry's driver timing pays worker-pool/codegen spin-up, which
    # should not land on an Arrow-UDF-heavy operator). With ~119
    # entries and 50 sampled per round, every entry re-verifies at
    # least every ~3 rounds with no hand maintenance.
    ordered = {k: qs[k] for k in _sample_order(list(qs))}
    return {k: _canon(_dbl(v)) for k, v in ordered.items()}


def _sample_order(names: list[str]) -> list[str]:
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_verified = {n: -1 for n in names}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        for n, rec in data.items():
            if n in last_verified and isinstance(rec, dict) and rec.get("hash_match"):
                last_verified[n] = max(last_verified[n], rnd)
    ordered = sorted(names, key=lambda n: (last_verified[n], n))
    if "basic_agg" in ordered:
        ordered.remove("basic_agg")
        ordered.insert(0, "basic_agg")
    # sidecar: which round each entry last hash-verified in, plus this
    # call's computed rotation — so the judge reads one file instead of
    # reconstructing the rotation from every CORRECTNESS_r*.json
    # (VERDICT r7 ask #7). Written best-effort; never fails the contract.
    try:
        with open(os.path.join(here, "SAMPLE_HISTORY.json"), "w") as f:
            json.dump(
                {
                    "last_hash_verified_round": last_verified,
                    "sample_order_this_call": ordered,
                    "entries": len(ordered),
                    "note": (
                        "driver samples the first 50 of sample_order per "
                        "round; never-verified entries sort first, then "
                        "stalest; -1 = never hash-verified"
                    ),
                },
                f,
                indent=1,
                sort_keys=True,
            )
    except OSError:
        pass
    return ordered


# shared DuckDB fragments for the text-pipeline oracles
# note: doubled leading quote — the apostrophe inside a DuckDB '...'
# string literal
_BPE_PAT_SQL = r"''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"

_LANG_SCORE_SQL = """
    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% der %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% die %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% und %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% ist %' THEN 1 ELSE 0 END) AS s_de,
    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% the %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% and %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% of %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% is %' THEN 1 ELSE 0 END) AS s_en,
    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% el %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% la %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% los %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% es %' THEN 1 ELSE 0 END) AS s_es,
    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% le %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% les %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% des %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% est %' THEN 1 ELSE 0 END) AS s_fr,
    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% 的 %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% 是 %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% 了 %' THEN 1 ELSE 0 END
   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% 在 %' THEN 1 ELSE 0 END) AS s_zh
"""

_QUALITY_SQL = """
    ROUND(
        LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
      + (CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
          / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE)) * 0.4
      + (1.0 - LEAST(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
          * 10.0 / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE), 1.0)) * 0.1
      + (1.0 - LEAST(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
          * 5.0 / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE), 1.0)) * 0.1,
    6)
"""


# exact word-5-gram Jaccard via inverted-index join: pairs with zero
# shared grams cannot pass threshold >= 0.6, so the gram equi-join
# produces exactly the candidate set; |A ∩ B| is the matched-gram
# count (grams are list_distinct per doc). Verified row-identical to
# the previous all-pairs + list_intersect form, ~28x faster (the
# all-pairs form dominated the per-entry oracle budget). Grams are
# joined with the same empty separator; Spark compares xxhash64-ed
# grams, the oracle compares the gram strings — identical equivalence
# classes barring 64-bit collisions.
_NGRAM_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - 4, 1) + 1),
                   i -> array_to_string(w[i:i+4], '')
               )) AS gs
        FROM toks
    ),
    sizes AS (SELECT doc_id, len(gs) AS n FROM grams),
    exploded AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM exploded a JOIN exploded b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.6
"""


def _near_dup_oracle() -> str:
    """Banded hyperplane-LSH near-dup oracle: replicates the Spark
    operator's deterministic planes as literal arrays, per-band sign
    buckets, OR-of-bands candidate condition, exact cosine verify.
    Cross-engine cosine at 6dp verified bit-equal on all pairs."""
    from sidemantic_spark.operators.similarity import _det_planes

    bands, bits, dim = 4, 4, 64
    planes = _det_planes(dim, bands * bits)
    band_sqls = []
    for j in range(bands):
        terms = []
        for i in range(bits):
            lit = "[" + ", ".join(repr(v) for v in planes[j * bits + i]) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(v, CAST({lit} AS DOUBLE[])) >= 0"
                f" THEN {1 << i} ELSE 0 END)"
            )
        band_sqls.append("(" + " + ".join(terms) + ")")
    bsel = ", ".join(f"{b} AS b{j}" for j, b in enumerate(band_sqls))
    bmatch = " OR ".join(f"a.b{j} = b.b{j}" for j in range(bands))
    return f"""
        WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bk AS (SELECT vec_id, v, {bsel} FROM d)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
        FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND ({bmatch})
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    """


def _mix_case_sql() -> str:
    """CASE expression giving each source its _MIX_TARGET share (shared
    with the DuckDB oracle so both engines read identical literals)."""
    branches = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(_MIX_TARGET.items())
    )
    return f"CASE source {branches} ELSE NULL END"


def oracle_sql() -> dict[str, str]:
    from sidemantic_spark.operators.pipeline import sample_thresholds_sql
    from sidemantic_spark.operators.search import query_terms
    from sidemantic_spark.operators.similarity import quantize_query
    from sidemantic_spark.operators.text import PII_PATTERNS

    _qscale, _qq = quantize_query(_QUERY_VEC)
    _qq_sql = "[" + ", ".join(str(v) for v in _qq) + "]"

    fp = "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))"
    _PII_EMAIL, _PII_IP, _PII_PHONE = (p for p, _ in PII_PATTERNS)
    oracles = {
        "basic_agg": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS order_count
            FROM orders GROUP BY 1
        """,
        "time_grain_month": """
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        """,
        "filter_pushdown": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders
            WHERE o_orderstatus = 'F'
              AND DATE_TRUNC('year', o_orderdate) >= TIMESTAMP '1996-01-01'
            GROUP BY 1
        """,
        "metric_filter": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS open_revenue,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        """,
        "ratio_metric": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / NULLIF(CAST(COUNT(*) AS DOUBLE), 0) AS aov_ratio
            FROM orders GROUP BY 1
        """,
        "derived_metric": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_share
            FROM orders GROUP BY 1
        """,
        "metric_percent_of_total": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) OVER () AS DOUBLE) AS revenue_share
            FROM orders GROUP BY 1
        """,
        "having_filter": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
            HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 10000000
        """,
        "having_unselected_metric": """
            SELECT o_orderstatus AS status,
                   COUNT(*) AS order_count
            FROM orders GROUP BY 1
            HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 10000000
        """,
        "order_limit": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
            ORDER BY revenue DESC, priority LIMIT 3
        """,
        "ungrouped": """
            SELECT o_orderstatus AS status, o_orderpriority AS priority
            FROM orders WHERE o_orderstatus = 'P'
        """,
        "with_totals": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   CAST(GROUPING(o_orderstatus) AS BOOLEAN) AS _is_total
            FROM orders GROUP BY GROUPING SETS ((o_orderstatus), ())
        """,
        "count_distinct_minmax": """
            SELECT o_orderstatus AS status,
                   COUNT(DISTINCT o_custkey) AS customer_count,
                   MAX(o_totalprice) AS max_order_value,
                   MIN(o_totalprice) AS min_order_value,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(o_totalprice) AS avg_order_value
            FROM orders GROUP BY 1
        """,
        "dims_only_distinct": """
            SELECT DISTINCT o_orderstatus AS status, o_orderpriority AS priority FROM orders
        """,
        "segment_filter": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
        """,
        "fill_nulls_zero": """
            SELECT o_orderpriority AS priority,
                   CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                       THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS pending_revenue
            FROM orders GROUP BY 1
        """,
        "timezone_month": """
            SELECT CAST(DATE_TRUNC('month', CAST(o_orderdate AS TIMESTAMP)
                        AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York') AS TIMESTAMP)
                     AS order_month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        """,
        "relative_date_filter": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders
            WHERE o_orderdate >= DATE_TRUNC('year', CURRENT_DATE) - INTERVAL 40 YEAR
            GROUP BY 1
        """,
        "window_dimension": """
            WITH w AS (
                SELECT LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS next_event
                FROM events
            )
            SELECT next_event, COUNT(*) AS event_count
            FROM w WHERE next_event IS NOT NULL GROUP BY 1
        """,
        "complete_sql_measure": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O'
                       THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
                     / NULLIF(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0)
                     AS open_rate,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        """,
        "semantic_sql_expression": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / 1000 AS rev_k
            FROM orders GROUP BY 1 ORDER BY rev_k DESC LIMIT 2
        """,
        "semantic_sql_cte_island": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS order_count
            FROM orders GROUP BY 1
        """,
        "table_calc_pct_of_total": """
            WITH q AS (
                SELECT o_orderstatus AS status,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT status, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(revenue AS DOUBLE) * 100
                     / NULLIF(CAST(SUM(revenue) OVER () AS DOUBLE), 0) AS pct_of_total
            FROM q
        """,
        "table_calc_rank": """
            WITH q AS (
                SELECT o_orderpriority AS priority,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT priority, CAST(revenue AS DOUBLE) AS revenue,
                   RANK() OVER (ORDER BY revenue DESC) AS revenue_rank
            FROM q
        """,
        "table_calc_moving_avg": """
            WITH q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT order_month, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(SUM(revenue) OVER (
                       ORDER BY order_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS DOUBLE)
                   / COUNT(revenue) OVER (
                       ORDER BY order_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS revenue_3mo_avg
            FROM q
        """,
        "table_calc_pct_of_previous": """
            WITH q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT order_month, CAST(revenue AS DOUBLE) AS revenue,
                   (CAST(revenue AS DOUBLE) - LAG(revenue) OVER (ORDER BY order_month))
                   * 100 / NULLIF(CAST(LAG(revenue) OVER (ORDER BY order_month) AS DOUBLE), 0)
                       AS pct_of_prev
            FROM q
        """,
        "table_calc_formula": """
            WITH q AS (
                SELECT o_orderstatus AS status,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
                       SUM(CASE WHEN o_orderstatus = 'O'
                                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS open_revenue
                FROM orders GROUP BY 1
            )
            SELECT status, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(open_revenue AS DOUBLE) AS open_revenue,
                   CAST(revenue - COALESCE(open_revenue, 0) AS DOUBLE) AS closed_revenue
            FROM q
        """,
        "qoq_ratio": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT i.order_quarter,
                   CAST(i.revenue AS DOUBLE) / NULLIF(CAST(p.revenue AS DOUBLE), 0)
                       AS revenue_qoq_ratio
            FROM inner_q i
            LEFT JOIN inner_q p ON p.order_quarter = i.order_quarter - INTERVAL 3 MONTH
        """,
        "semantic_sql_union": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
            UNION ALL
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
        """,
        "semantic_sql_from_metrics": """
            SELECT c.c_mktsegment AS mktsegment,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "semantic_sql_qualify_topn": """
            SELECT o_orderstatus AS status,
                   CAST(DATE_TRUNC('year', o_orderdate) AS TIMESTAMP) AS order_date__year,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1, 2
            QUALIFY RANK() OVER (
                PARTITION BY o_orderstatus
                ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC
            ) <= 2
        """,
        "semantic_sql_time_rollup": """
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        """,
        "yardstick_aggregate": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        """,
        "streaming_json_rollup": """
            SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                       AS window_start,
                   event_type,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(CAST(json_extract_string(props, '$.k')
                       AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS props_k_sum
            FROM events GROUP BY 1, 2
        """,
        "events_json_stats": """
            SELECT event_type,
                   COUNT(*) AS n_rows,
                   COUNT(CAST(json_extract_string(props, '$.k') AS DOUBLE))
                       AS val_present,
                   ROUND(CAST(SUM(CAST(CAST(json_extract_string(props, '$.k')
                           AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE)
                         / COUNT(CAST(json_extract_string(props, '$.k')
                           AS DOUBLE)), 6) AS val_avg,
                   MIN(CAST(json_extract_string(props, '$.k') AS DOUBLE))
                       AS val_min,
                   MAX(CAST(json_extract_string(props, '$.k') AS DOUBLE))
                       AS val_max
            FROM events GROUP BY 1
        """,
        "events_json_keys": """
            WITH n AS (SELECT COUNT(*) AS total FROM events)
            SELECT k AS key, COUNT(*) AS n_rows,
                   ROUND(COUNT(*) / (SELECT CAST(total AS DOUBLE) FROM n), 6)
                       AS coverage
            FROM events, UNNEST(json_keys(props)) AS t(k)
            GROUP BY 1
        """,
        "sim_label_purity": """
            WITH pos AS (
                SELECT vec_id, label, unnest(embedding) AS val,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings
            ),
            cent AS (
                SELECT label AS clab, pos,
                       CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
                           / COUNT(*) AS mean
                FROM pos GROUP BY 1, 2
            ),
            dots AS (
                SELECT p.vec_id, p.label, c.clab,
                       SUM(p.val * c.mean) AS dot,
                       SUM(p.val * p.val) AS n1,
                       SUM(c.mean * c.mean) AS n2
                FROM pos p JOIN cent c USING (pos)
                GROUP BY 1, 2, 3
            ),
            best AS (
                SELECT vec_id, label, clab AS nearest_label,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                          ORDER BY ROUND(dot / (SQRT(n1)*SQRT(n2)), 6) DESC,
                                   clab ASC) AS rn
                FROM dots
            )
            SELECT vec_id, label, nearest_label,
                   (label = nearest_label) AS is_pure
            FROM best WHERE rn = 1
        """,
        "yardstick_window_measure": """
            SELECT DISTINCT o_orderdate AS order_day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       OVER (ORDER BY o_orderdate) AS DOUBLE) AS running_rev
            FROM orders
        """,
        "yardstick_visibility_rollup": """
            WITH all_rev AS (
                SELECT o_orderstatus,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
                FROM orders GROUP BY 1
            ),
            vis AS (
                SELECT o_orderstatus,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS p
                FROM orders WHERE o_orderpriority <> '1-URGENT'
            )
            SELECT v.o_orderstatus AS status,
                   COUNT(*) AS c,
                   CAST(CASE WHEN GROUPING(v.o_orderstatus) = 1 THEN NULL
                        ELSE SUM(v.p) END AS DOUBLE) AS ragg,
                   CAST(CASE WHEN GROUPING(v.o_orderstatus) = 1 THEN NULL
                        ELSE SUM(v.p) END AS DOUBLE) AS rviz,
                   CAST(CASE WHEN GROUPING(v.o_orderstatus) = 1 THEN NULL
                        ELSE MAX(a.s) END AS DOUBLE) AS r
            FROM vis v LEFT JOIN all_rev a USING (o_orderstatus)
            GROUP BY ROLLUP(v.o_orderstatus)
        """,
        "semantic_sql_fromless": """
            SELECT (SELECT COUNT(*) FROM orders) AS order_rows,
                   (SELECT COUNT(*) FROM customer) AS customer_rows
        """,
        "yardstick_at_modifiers": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) OVER () AS DOUBLE)
                     AS total_revenue,
                   CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                         FROM orders WHERE o_orderstatus = 'O') AS DOUBLE)
                     AS open_revenue
            FROM orders GROUP BY 1
        """,
        "stats_aggs": """
            SELECT o_orderstatus AS status,
                   ROUND(STDDEV_SAMP(o_totalprice), 2) AS price_stddev,
                   ROUND(VAR_SAMP(o_totalprice) / 1000, 2) AS price_variance_k,
                   ROUND(STDDEV_POP(o_totalprice), 2) AS price_stddev_pop,
                   ROUND(MEDIAN(o_totalprice), 2) AS price_median
            FROM orders GROUP BY 1
        """,
        "jinja_param_filter": """
            SELECT o_orderstatus AS status,
                   COUNT(*) AS order_count,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
        """,
        "join_m2o": """
            SELECT c.c_mktsegment AS mktsegment,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "join_multi_hop": """
            SELECT n.n_name AS nation_name,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS order_count
            FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "join_filtered_inner": """
            SELECT r.r_name AS region_name,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name != 'EUROPE'
            GROUP BY 1
        """,
        "fanout_dedup": """
            WITH joined AS (
                SELECT DISTINCT l.l_returnflag AS returnflag, o.o_orderkey,
                       CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
                FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            )
            SELECT returnflag, CAST(SUM(price) AS DOUBLE) AS revenue,
                   COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) AS order_count
            FROM joined GROUP BY 1
        """,
        "fanout_symmetric_aggs": """
            WITH joined AS (
                SELECT DISTINCT l.l_returnflag AS returnflag, o.o_orderkey,
                       CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
                FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            )
            SELECT returnflag, CAST(SUM(price) AS DOUBLE) AS revenue,
                   COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) AS order_count
            FROM joined GROUP BY 1
        """,
        "fanout_dedup_plan": """
            WITH joined AS (
                SELECT DISTINCT l.l_returnflag AS returnflag, o.o_orderkey,
                       CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
                FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            )
            SELECT returnflag, CAST(SUM(price) AS DOUBLE) AS revenue,
                   COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) AS order_count
            FROM joined GROUP BY 1
        """,
        "fanout_safe_aggs": """
            SELECT l.l_returnflag AS returnflag,
                   MAX(o.o_totalprice) AS max_order_value,
                   COUNT(DISTINCT o.o_custkey) AS customer_count
            FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "multifact_split": """
            WITH f_orders AS (
                SELECT n.n_name AS nation_name,
                       SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders o
                LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
                GROUP BY 1
            ),
            f_cust AS (
                SELECT n.n_name AS nation_name,
                       SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS total_acctbal
                FROM customer c
                LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
                GROUP BY 1
            )
            SELECT COALESCE(a.nation_name, b.nation_name) AS nation_name,
                   CAST(a.revenue AS DOUBLE) AS revenue,
                   CAST(b.total_acctbal AS DOUBLE) AS total_acctbal
            FROM f_orders a
            FULL OUTER JOIN f_cust b ON a.nation_name IS NOT DISTINCT FROM b.nation_name
        """,
        "join_part_brand": """
            SELECT p.p_brand AS brand,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS disc_revenue
            FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1
        """,
        "join_m2m_through": """
            SELECT o.o_orderpriority AS priority,
                   COUNT(DISTINCT p.p_partkey) AS part_count
            FROM orders o
            LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            LEFT JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        """,
        "fk_dimension_no_join": """
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS order_count
            FROM orders GROUP BY 1
        """,
        "join_cross": """
            SELECT p.p_brand AS brand,
                   COUNT(DISTINCT s.s_suppkey) AS supplier_count
            FROM part p CROSS JOIN supplier s
            GROUP BY 1
        """,
        "running_total": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT order_month, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(SUM(revenue) OVER (ORDER BY order_month
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumulative_revenue
            FROM inner_q
        """,
        "rolling_window_90d": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT order_month,
                   CAST(SUM(revenue) OVER (ORDER BY order_month
                       RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS revenue_3m
            FROM inner_q
        """,
        "ytd": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT order_month,
                   CAST(SUM(revenue) OVER (PARTITION BY DATE_TRUNC('year', order_month)
                       ORDER BY order_month
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS revenue_ytd
            FROM inner_q
        """,
        "mom_pct_change": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT i.order_month, CAST(i.revenue AS DOUBLE) AS revenue,
                   CAST(i.revenue - p.revenue AS DOUBLE)
                     / NULLIF(CAST(p.revenue AS DOUBLE), 0) * 100 AS revenue_mom
            FROM inner_q i
            LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 1 MONTH
        """,
        "derived_offset_growth": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT i.order_month, CAST(i.revenue AS DOUBLE) AS revenue,
                   CAST(i.revenue - p.revenue AS DOUBLE) AS revenue_growth_mom
            FROM inner_q i
            LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 1 MONTH
        """,
        "having_on_window_metric": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            ), w AS (
                SELECT i.order_month, CAST(i.revenue AS DOUBLE) AS revenue,
                       CAST(i.revenue - p.revenue AS DOUBLE)
                         / NULLIF(CAST(p.revenue AS DOUBLE), 0) * 100 AS revenue_mom
                FROM inner_q i
                LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 1 MONTH
            )
            SELECT * FROM w WHERE revenue_mom > 0
        """,
        "yoy_difference": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('year', o_orderdate) AS TIMESTAMP) AS order_year,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT i.order_year, CAST(i.revenue - p.revenue AS DOUBLE) AS revenue_yoy_diff
            FROM inner_q i
            LEFT JOIN inner_q p ON p.order_year = i.order_year - INTERVAL 1 YEAR
        """,
        "time_offset_custom": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT i.order_month, CAST(i.revenue - p.revenue AS DOUBLE) AS revenue_vs_2mo
            FROM inner_q i
            LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 2 MONTH
        """,
        "window_expr_peak": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT order_month, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(MAX(revenue) OVER (ORDER BY order_month
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     AS revenue_peak_to_date
            FROM inner_q
        """,
        "join_composite_derived": """
            SELECT l.l_returnflag AS returnflag,
                   SUM(x.qty2) AS qty2_total
            FROM lineitem l
            LEFT JOIN (SELECT l_orderkey, l_linenumber, l_quantity * 2 AS qty2
                       FROM lineitem) x
              ON l.l_orderkey = x.l_orderkey AND l.l_linenumber = x.l_linenumber
            GROUP BY 1
        """,
        "wow_pct_change": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS event_week,
                       COUNT(*) AS event_count
                FROM events GROUP BY 1
            )
            SELECT i.event_week,
                   CAST(i.event_count - p.event_count AS DOUBLE)
                     / NULLIF(CAST(p.event_count AS DOUBLE), 0) * 100 AS event_wow
            FROM inner_q i
            LEFT JOIN inner_q p ON p.event_week = i.event_week - INTERVAL 7 DAY
        """,
        "ratio_offset_share": """
            WITH inner_q AS (
                SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT i.order_month,
                   CAST(i.revenue AS DOUBLE)
                     / NULLIF(CAST(p.revenue AS DOUBLE), 0) AS revenue_vs_prior_month
            FROM inner_q i
            LEFT JOIN inner_q p ON p.order_month = i.order_month - INTERVAL 1 MONTH
        """,
        "conversion_funnel": """
            WITH base AS (
                SELECT user_id AS entity, ts FROM events WHERE event_type = 'signup'
            ),
            conv AS (
                SELECT user_id AS entity, ts FROM events WHERE event_type = 'purchase'
            ),
            flags AS (
                SELECT b.entity,
                       MAX(CASE WHEN c.entity IS NOT NULL THEN 1 ELSE 0 END) AS converted
                FROM base b
                LEFT JOIN conv c ON c.entity = b.entity
                     AND c.ts >= b.ts AND c.ts <= b.ts + INTERVAL 7 DAY
                GROUP BY b.entity
            )
            SELECT COUNT(*) AS signup_to_purchase_base,
                   CAST(SUM(converted) AS BIGINT) AS signup_to_purchase_converted,
                   CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS signup_to_purchase
            FROM flags
        """,
        "conversion_by_dimension": """
            WITH base AS (
                SELECT user_id AS entity, ts,
                       CAST(user_id % 2 AS INT) AS user_bucket
                FROM events WHERE event_type = 'signup'
            ),
            conv AS (
                SELECT user_id AS entity, ts,
                       CAST(user_id % 2 AS INT) AS user_bucket
                FROM events WHERE event_type = 'purchase'
            ),
            flags AS (
                SELECT b.entity, b.user_bucket,
                       MAX(CASE WHEN c.entity IS NOT NULL THEN 1 ELSE 0 END) AS converted
                FROM base b
                LEFT JOIN conv c ON c.entity = b.entity
                     AND c.ts >= b.ts AND c.ts <= b.ts + INTERVAL 7 DAY
                     AND c.user_bucket IS NOT DISTINCT FROM b.user_bucket
                GROUP BY 1, 2
            )
            SELECT user_bucket,
                   COUNT(*) AS signup_to_purchase_base,
                   CAST(SUM(converted) AS BIGINT) AS signup_to_purchase_converted,
                   CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS signup_to_purchase
            FROM flags GROUP BY 1
        """,
        "conversion_funnel_3step": """
            WITH s1 AS (
                SELECT user_id AS e, MIN(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ),
            s2 AS (
                SELECT ev.user_id AS e, MIN(ev.ts) AS t2
                FROM events ev JOIN s1 ON ev.user_id = s1.e AND ev.ts >= s1.t1
                WHERE ev.event_type = 'view' GROUP BY 1
            ),
            s3 AS (
                SELECT ev.user_id AS e, MIN(ev.ts) AS t3
                FROM events ev JOIN s2 ON ev.user_id = s2.e AND ev.ts >= s2.t2
                WHERE ev.event_type = 'purchase' GROUP BY 1
            )
            SELECT COUNT(DISTINCT s1.e) AS total_entities,
                   COUNT(DISTINCT s1.e) AS step_1_count,
                   COUNT(DISTINCT s2.e) AS step_2_count,
                   COUNT(DISTINCT s3.e) AS step_3_count,
                   COUNT(DISTINCT s3.e) AS signup_funnel
            FROM s1
            LEFT JOIN s2 ON s1.e = s2.e
            LEFT JOIN s3 ON s2.e = s3.e
        """,
        "retention_weekly": """
            WITH cohorts AS (
                SELECT user_id AS entity,
                       CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_date
                FROM events WHERE event_type = 'signup' GROUP BY 1
            ),
            activity AS (
                SELECT DISTINCT user_id AS entity,
                       CAST(DATE_TRUNC('week', ts) AS DATE) AS period
                FROM events
            ),
            sizes AS (SELECT cohort_date, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1),
            ret AS (
                SELECT c.cohort_date,
                       CAST(FLOOR(DATEDIFF('day', c.cohort_date, a.period) / 7) AS INT) AS weeks_since,
                       a.entity
                FROM cohorts c JOIN activity a ON a.entity = c.entity
                WHERE a.period >= c.cohort_date
                  AND CAST(FLOOR(DATEDIFF('day', c.cohort_date, a.period) / 7) AS INT) <= 5
            )
            SELECT r.cohort_date AS cohort_date, r.weeks_since AS weeks_since,
                   COUNT(DISTINCT r.entity) AS active_users,
                   s.cohort_size AS cohort_size,
                   ROUND(COUNT(DISTINCT r.entity) * 100.0 / s.cohort_size, 1) AS weekly_retention
            FROM ret r JOIN sizes s ON s.cohort_date = r.cohort_date
            GROUP BY 1, 2, s.cohort_size
        """,
        "cohort_avg_spend": """
            WITH per_entity AS (
                SELECT user_id AS entity,
                       SUM(CAST(value AS DECIMAL(18,6))) AS v
                FROM events GROUP BY 1
                HAVING SUM(CAST(value AS DECIMAL(18,6))) > 0
            )
            SELECT CAST(SUM(v) AS DOUBLE) / COUNT(v) AS avg_user_spend FROM per_entity
        """,
        "semi_additive_last": """
            WITH marked AS (
                SELECT CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS ship_month,
                       l_quantity, l_shipdate,
                       MAX(l_shipdate) OVER (
                           PARTITION BY l_partkey, DATE_TRUNC('month', l_shipdate)
                       ) AS marker
                FROM lineitem
            )
            SELECT ship_month, SUM(l_quantity) AS last_qty_per_part
            FROM marked WHERE l_shipdate = marker
            GROUP BY 1
        """,
        "tpch_q1_pricing_summary": """
            SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
                   SUM(l_quantity) AS qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS disc_revenue,
                   CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
                   COUNT(*) AS line_count
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "dedup_exact_stats": f"""
            WITH fp AS (SELECT {fp} AS f FROM documents)
            SELECT COUNT(*) AS n_docs, COUNT(DISTINCT f) AS n_unique,
                   COUNT(*) - COUNT(DISTINCT f) AS n_dup_docs
            FROM fp
        """,
        "dedup_exact_keep_first": f"""
            WITH keyed AS (
                SELECT doc_id, lang, source, {fp} AS f FROM documents
            ),
            keep AS (SELECT MIN(doc_id) AS doc_id FROM keyed GROUP BY f)
            SELECT k.doc_id, k.lang, k.source FROM keyed k JOIN keep USING (doc_id)
        """,
        "text_profile": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   length(text) AS n_chars,
                   {fp} AS fp
            FROM documents
        """,
        "sim_cosine_topk": f"""
            SELECT vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       CAST({_QUERY_VEC_SQL} AS DOUBLE[])), 6) AS cosine_sim
            FROM embeddings
            ORDER BY cosine_sim DESC, vec_id ASC
            LIMIT 20
        """,
        "sim_ann_quantized_topk": f"""
            WITH base AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ),
            s AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
                FROM base
            ),
            qd AS (
                SELECT vec_id, v, sc,
                       list_transform(v, x -> CAST(floor(x / sc + 0.5) AS BIGINT)) AS qv
                FROM s WHERE sc > 0
            ),
            approx AS (
                SELECT vec_id, v,
                       sc * {_qscale!r} * CAST(list_sum(
                           list_transform(range(1, 65), i -> qv[i] * ({_qq_sql})[i])
                       ) AS DOUBLE) AS a
                FROM qd
            ),
            pool AS (
                SELECT vec_id, v FROM approx ORDER BY a DESC, vec_id LIMIT 200
            )
            SELECT vec_id,
                   ROUND(list_cosine_similarity(
                       v, CAST({_QUERY_VEC_SQL} AS DOUBLE[])), 6) AS cosine_sim
            FROM pool ORDER BY 2 DESC, 1 LIMIT 20
        """,
        "sim_cosine_topk_batch": """
            WITH q AS (
                SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 8
            ),
            s AS (
                SELECT q.q_id, c.vec_id,
                       ROUND(list_cosine_similarity(
                           CAST(c.embedding AS DOUBLE[]), q.qv), 6) AS cosine_sim
                FROM q CROSS JOIN embeddings c
            )
            SELECT q_id, vec_id, cosine_sim FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY q_id ORDER BY cosine_sim DESC, vec_id
                ) AS rn FROM s
            ) WHERE rn <= 10
        """,
        "multimodal_frame_sample": """
            SELECT doc_id AS media_id,
                   CAST(unnest(generate_series(
                       0, CAST(n_chars * 7 % 5000 AS BIGINT), 700)) AS BIGINT)
                     AS frame_ts_ms
            FROM documents
            WHERE doc_id % 3 = 0
        """,
        "multimodal_resize_meta": """
            WITH m AS (
                SELECT doc_id AS media_id,
                       n_chars % 1000 + 64 AS w,
                       n_chars % 700 + 48 AS h
                FROM documents
            ),
            s AS (
                SELECT media_id, w, h,
                       LEAST(256.0 / GREATEST(w, h), 1.0) AS sc
                FROM m
            )
            SELECT media_id,
                   GREATEST(CAST(FLOOR(w * sc) AS BIGINT), 1) AS width,
                   GREATEST(CAST(FLOOR(h * sc) AS BIGINT), 1) AS height
            FROM s
        """,
        "text_language_id": """
            WITH s AS (
                SELECT doc_id,
                    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% der %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% die %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% und %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% ist %' THEN 1 ELSE 0 END) AS s_de,
                    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% the %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% and %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% of %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% is %' THEN 1 ELSE 0 END) AS s_en,
                    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% el %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% la %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% los %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% es %' THEN 1 ELSE 0 END) AS s_es,
                    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% le %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% les %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% des %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% est %' THEN 1 ELSE 0 END) AS s_fr,
                    (CASE WHEN ' ' || lower(text) || ' ' LIKE '% 的 %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% 是 %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% 了 %' THEN 1 ELSE 0 END
                   + CASE WHEN ' ' || lower(text) || ' ' LIKE '% 在 %' THEN 1 ELSE 0 END) AS s_zh
                FROM documents
            ),
            m AS (SELECT *, GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS best FROM s)
            SELECT doc_id,
                   CASE WHEN best = 0 THEN 'und'
                        WHEN s_de = best THEN 'de'
                        WHEN s_en = best THEN 'en'
                        WHEN s_es = best THEN 'es'
                        WHEN s_fr = best THEN 'fr'
                        ELSE 'zh' END AS detected_lang
            FROM m
        """,
        "text_pii_scrub": f"""
            WITH inj AS (
                SELECT doc_id,
                       text || ' contact u' || CAST(doc_id AS VARCHAR)
                            || '@example.org from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                            || ' call +1 555-000-' || CAST(doc_id % 10000 AS VARCHAR) AS t
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                           '{_PII_IP}', '<IP>', 'g'),
                       '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text,
                   len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
                   len(regexp_extract_all(t, '{_PII_IP}')) AS n_ip
            FROM inj
        """,
        "text_repetition": r"""
            WITH w AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
                FROM documents
            ),
            g AS (
                SELECT doc_id, len(words) - 2 AS cnt,
                       list_transform(
                           generate_series(1, GREATEST(len(words) - 2, 1)),
                           i -> array_to_string(words[i:i+2], ' ')
                       ) AS grams
                FROM w
            )
            SELECT doc_id,
                   CASE WHEN cnt < 1 THEN 0.0
                        ELSE ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                       / CAST(len(grams) AS DOUBLE), 6)
                   END AS rep_score
            FROM g
        """,
        "data_profile_numeric": """
            SELECT lang,
                   COUNT(*) AS n_rows,
                   COUNT(*) - COUNT(n_chars) AS n_null,
                   CAST(MIN(n_chars) AS DOUBLE) AS min_v,
                   CAST(MAX(n_chars) AS DOUBLE) AS max_v,
                   ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE)
                         / COUNT(n_chars), 6) AS mean_v,
                   ROUND(SQRT(
                       (CAST(SUM(CAST(n_chars AS DECIMAL(28,6))
                                 * CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE)
                        - CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE)
                          * CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE)
                          / COUNT(n_chars))
                       / COUNT(n_chars)), 6) AS stddev_pop_v,
                   quantile_cont(n_chars, 0.5) AS median_v,
                   quantile_cont(n_chars, 0.9) AS p90_v
            FROM documents GROUP BY 1
        """,
        "pipeline_domain_mix": f"""
            WITH per AS (
                SELECT source, COUNT(*) AS n_docs,
                       CAST({_mix_case_sql()} AS DOUBLE) AS target_share
                FROM documents GROUP BY 1
            ),
            sc AS (SELECT MIN(n_docs / target_share) AS s FROM per)
            SELECT source, n_docs, target_share,
                   ROUND(LEAST(1.0, target_share * s / n_docs), 6) AS accept_rate,
                   ROUND(target_share * s, 2) AS expected_out
            FROM per, sc
            WHERE target_share IS NOT NULL
        """,
        "text_quality_score": """
            WITH c AS (
                SELECT doc_id,
                       length(text) AS n,
                       length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
                       length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                       length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
                FROM documents
            )
            SELECT doc_id,
                   ROUND(
                       LEAST(CAST(n AS DOUBLE) / 500.0, 1.0) * 0.4
                     + (CAST(n_alpha AS DOUBLE) / CAST(CASE WHEN n = 0 THEN 1 ELSE n END AS DOUBLE)) * 0.4
                     + (1.0 - LEAST(CAST(n_punct AS DOUBLE) * 10.0 / CAST(CASE WHEN n = 0 THEN 1 ELSE n END AS DOUBLE), 1.0)) * 0.1
                     + (1.0 - LEAST(CAST(n_digit AS DOUBLE) * 5.0 / CAST(CASE WHEN n = 0 THEN 1 ELSE n END AS DOUBLE), 1.0)) * 0.1,
                   6) AS quality_score
            FROM c
        """,
        "dedup_ngram_jaccard": _NGRAM_ORACLE,
        "dedup_source_overlap": """
            WITH fps AS (
                SELECT DISTINCT
                       md5(array_to_string(
                           (string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))[1:8],
                           ' ')) AS fp,
                       source AS src
                FROM documents
            )
            SELECT a.src AS source_a, b.src AS source_b,
                   COUNT(*) AS shared_fingerprints
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.src < b.src
            GROUP BY 1, 2
        """,
        "text_vocab_topk": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
                FROM documents
            ),
            f AS (
                SELECT term,
                       COUNT(DISTINCT doc_id) AS doc_freq,
                       COUNT(*) AS term_freq
                FROM toks WHERE term != '' GROUP BY term
            )
            SELECT term, doc_freq, term_freq FROM f
            ORDER BY doc_freq DESC, term_freq DESC, term ASC
            LIMIT 100
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS ({_NGRAM_ORACLE}),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            cc(node, label) AS (
                SELECT node, node AS label FROM nodes
                UNION
                SELECT e.dst AS node, cc.label
                FROM cc JOIN edges e ON cc.node = e.src
                WHERE cc.label < e.dst
            )
            SELECT node AS doc_id, MIN(label) AS cluster_id
            FROM cc GROUP BY node
        """,
        "sim_embedding_near_dups": _near_dup_oracle(),
        "text_gopher_flags": r"""
            WITH w AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END AS word_count,
                       length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_word_chars,
                       length(text) - length(replace(text, '#', '')) AS n_hash,
                       len(regexp_extract_all(text, '\.\.\.|…')) AS n_ellipsis,
                       len(list_filter(string_split_regex(trim(text), '\s+'),
                                       x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
                       len(string_split(text, chr(10))) AS n_lines,
                       len(list_filter(string_split(text, chr(10)),
                                       l -> regexp_matches(ltrim(l), '^[-*•]'))) AS n_bullet,
                       len(list_filter(string_split(text, chr(10)),
                                       l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS n_ell_lines,
                       len(list_distinct(list_intersect(
                           list_transform(string_split_regex(trim(text), '\s+'),
                                          x -> regexp_replace(lower(x), '[^a-z]', '', 'g')),
                           ['the', 'a', 'and', 'of']))) AS stopword_hits
                FROM documents
            ), m AS (
                SELECT doc_id, word_count, stopword_hits,
                       ROUND(CAST(n_word_chars AS DOUBLE) / GREATEST(word_count, 1), 6) AS mean_word_len,
                       ROUND(CAST(n_hash + n_ellipsis AS DOUBLE) / GREATEST(word_count, 1), 6) AS symbol_ratio,
                       ROUND(CAST(n_alpha_words AS DOUBLE) / GREATEST(word_count, 1), 6) AS alpha_word_frac,
                       ROUND(CAST(n_bullet AS DOUBLE) / GREATEST(n_lines, 1), 6) AS bullet_line_frac,
                       ROUND(CAST(n_ell_lines AS DOUBLE) / GREATEST(n_lines, 1), 6) AS ellipsis_line_frac
                FROM w
            )
            SELECT doc_id, word_count, mean_word_len, symbol_ratio, alpha_word_frac,
                   bullet_line_frac, ellipsis_line_frac,
                   CAST(stopword_hits AS BIGINT) AS stopword_hits,
                   word_count >= 50 AND word_count <= 100000 AS rule_word_count,
                   mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS rule_mean_word_len,
                   symbol_ratio <= 0.1 AS rule_symbol_ratio,
                   bullet_line_frac <= 0.10 AS rule_bullet_lines,
                   ellipsis_line_frac <= 0.30 AS rule_ellipsis_lines,
                   alpha_word_frac >= 0.80 AS rule_alpha_words,
                   stopword_hits >= 2 AS rule_stopwords,
                   (word_count >= 50 AND word_count <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND symbol_ratio <= 0.1
                    AND bullet_line_frac <= 0.10
                    AND ellipsis_line_frac <= 0.30
                    AND alpha_word_frac >= 0.80
                    AND stopword_hits >= 2) AS keep
            FROM m
        """,
        "pipeline_span_dedup": r"""
            WITH base AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
                FROM documents
            ), spans AS (
                SELECT doc_id, CAST(t.i AS INT) AS span_idx,
                       array_to_string(words[(t.i*10+1):(t.i*10+10)], ' ') AS span
                FROM base,
                     (SELECT unnest(range(0, GREATEST(CAST(ceil(len(words)/10.0) AS BIGINT), 1)))) AS t(i)
            ), ranked AS (
                SELECT doc_id, span_idx, span,
                       row_number() OVER (PARTITION BY md5(span)
                                          ORDER BY doc_id, span_idx) AS rn
                FROM spans
            )
            SELECT doc_id,
                   COALESCE(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                                       ORDER BY span_idx), '') AS text_clean,
                   COUNT(*) AS n_spans,
                   COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept
            FROM ranked GROUP BY doc_id
        """,
        "sim_semantic_dedup": f"""
            WITH RECURSIVE pairs AS ({_near_dup_oracle()}),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            cc(node, label) AS (
                SELECT node, node AS label FROM nodes
                UNION
                SELECT e.dst AS node, cc.label
                FROM cc JOIN edges e ON cc.node = e.src
                WHERE cc.label < e.dst
            ),
            clusters AS (SELECT node, MIN(label) AS cluster_id FROM cc GROUP BY node)
            SELECT v.vec_id,
                   COALESCE(c.cluster_id, v.vec_id) AS cluster_id,
                   COALESCE(c.cluster_id, v.vec_id) = v.vec_id AS keep
            FROM embeddings v LEFT JOIN clusters c ON v.vec_id = c.node
        """,
        "corpus_stats_by_source": """
            SELECT source,
                   COUNT(*) AS doc_count,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars
            FROM documents GROUP BY 1
        """,
        "streaming_dedup_fingerprint": """
            SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "preagg_rollup_route": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS order_count
            FROM orders GROUP BY 1
        """,
        "ungrouped_metrics_detail": """
            SELECT o_orderkey AS okey, o_orderstatus AS status,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
                   CAST(1 AS BIGINT) AS order_count
            FROM orders WHERE o_orderstatus = 'P'
            ORDER BY okey LIMIT 500
        """,
        "preagg_ungrouped_route": """
            SELECT o_orderkey AS okey, o_orderstatus AS status,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
                   CAST(1 AS BIGINT) AS order_count
            FROM orders WHERE o_orderstatus = 'P'
            ORDER BY okey LIMIT 500
        """,
        "preagg_filtered_measure_route": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O'
                       THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
                       AS open_revenue,
                   COUNT(*) AS order_count
            FROM orders GROUP BY 1
        """,
        # HLL estimates aren't DuckDB-reproducible; the entry projects
        # the exact distinct count (checkable) plus booleans asserting
        # routed-vs-raw sketch parity and the 5% accuracy bound
        "preagg_approx_distinct_route": """
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)
                       AS order_month,
                   COUNT(DISTINCT o_custkey) AS exact_cd,
                   TRUE AS parity_ok,
                   TRUE AS est_in_bounds
            FROM orders GROUP BY 1
        """,
        "fanout_complete_sql": """
            WITH dedup AS (
                SELECT DISTINCT l.l_returnflag AS returnflag,
                       o.o_orderkey, o.o_orderstatus, o.o_totalprice
                FROM lineitem l
                LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            )
            SELECT returnflag,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O'
                            THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
                     / NULLIF(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0)
                     AS open_rate
            FROM dedup GROUP BY 1
        """,
        "limit_offset_page": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
            ORDER BY revenue DESC, priority
            LIMIT 2 OFFSET 1
        """,
        "row_level_security": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
        """,
        "semantic_sql_intersect": """
            SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
        """,
        "semantic_sql_except": """
            SELECT o_orderpriority AS priority FROM orders
            EXCEPT
            SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
        """,
        "source_scan_uri": """
            SELECT o_orderstatus AS status,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        """,
        "saved_query_run": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
            ORDER BY revenue DESC, priority LIMIT 3
        """,
        "text_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "text_token_bpe": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
                   len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS bpe_tokens
            FROM documents
        """,
        "pipeline_clean_corpus": f"""
            WITH s AS (
                SELECT doc_id, text, {_LANG_SCORE_SQL}
                FROM documents
            ),
            m AS (SELECT *, GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS best FROM s),
            l AS (
                SELECT doc_id, text,
                       CASE WHEN best = 0 THEN 'und'
                            WHEN s_de = best THEN 'de'
                            WHEN s_en = best THEN 'en'
                            WHEN s_es = best THEN 'es'
                            WHEN s_fr = best THEN 'fr'
                            ELSE 'zh' END AS lang
                FROM m
            ),
            tk AS (
                SELECT doc_id, lang,
                       {_QUALITY_SQL} AS q,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END AS toks,
                       len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS btoks,
                       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
                FROM l
            ),
            clean AS (SELECT * FROM tk WHERE lang = 'en' AND q >= 0.5),
            keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM clean GROUP BY fp),
            kept AS (
                SELECT c.* FROM clean c
                JOIN keep k ON c.fp = k.fp AND c.doc_id = k.doc_id
            )
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(toks) AS BIGINT) AS total_ws_tokens,
                   CAST(SUM(btoks) AS BIGINT) AS total_bpe_tokens,
                   CAST(SUM(CAST(q AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*) AS avg_quality
            FROM kept
        """,
        "create_view_sink": """
            WITH v AS (
                SELECT o_orderpriority AS priority,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT priority, revenue FROM v WHERE revenue > 0
        """,
        "explore_query": """
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS order_count
            FROM orders
            WHERE o_orderstatus != 'P'
            GROUP BY 1
        """,
        # two-level distributed prefix sum == one global cumsum ordered
        # by (shard, id); integer division on both sides
        "pipeline_sequence_pack": """
            WITH t AS (
                SELECT doc_id, GREATEST(n_chars // 4, 1) AS n_tokens,
                       doc_id % 64 AS shard
                FROM documents
            ),
            o AS (
                SELECT doc_id, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           ORDER BY shard, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS BIGINT) AS start_offset
                FROM t
            )
            SELECT doc_id,
                   CAST(start_offset // 2048 AS BIGINT) AS pack_id,
                   start_offset,
                   n_tokens,
                   (start_offset // 2048) != ((start_offset + n_tokens - 1) // 2048)
                       AS straddles
            FROM o
        """,
        "pipeline_sample_stratified": f"""
            SELECT doc_id, lang FROM documents
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  < {sample_thresholds_sql(_SAMPLE_RATES, default_rate=0.1)}
        """,
        # grams compared as strings (Spark compares xxhash64 of the same
        # strings — identical equivalence classes barring collisions,
        # same argument as the ngram-jaccard oracle)
        "pipeline_decontaminate": """
            WITH toks AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(len(w) - 7, 1) + 1),
                           i -> array_to_string(w[i:i+7], ' ')
                       )) AS gs
                FROM toks
            ),
            eg AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < 50),
            tg AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id >= 50)
            SELECT tg.doc_id, COUNT(DISTINCT tg.g) AS shared_grams
            FROM tg JOIN eg ON tg.g = eg.g
            GROUP BY 1
        """,
        "pipeline_chunk_docs": """
            WITH n AS (
                SELECT doc_id, text,
                       GREATEST(CAST(ceil((length(text) - 40) / 360.0) AS INT), 1) AS nc
                FROM documents
            )
            SELECT doc_id,
                   CAST(i AS INT) AS chunk_idx,
                   CAST(length(substring(text, i * 360 + 1, 400)) AS INT) AS chunk_chars,
                   md5(substring(text, i * 360 + 1, 400)) AS chunk_md5
            FROM n, unnest(range(0, nc)) AS t(i)
        """,
        "pipeline_shuffle_shards": """
            WITH keyed AS (
                SELECT doc_id,
                       md5('r8' || ':' || CAST(doc_id AS VARCHAR)) AS k
                FROM documents
            ),
            sharded AS (
                SELECT doc_id, k,
                       CAST(CAST(('0x' || substring(k, 1, 8)) AS BIGINT) % 8 AS INT) AS shard
                FROM keyed
            )
            SELECT doc_id, shard,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY shard ORDER BY k, doc_id) - 1 AS INT) AS pos
            FROM sharded
        """,
        "text_bm25_topk": _bm25_oracle_sql(query_terms(_BM25_QUERY), 25),
        "text_bm25_indexed": _bm25_oracle_sql(query_terms(_BM25_QUERY2), 25),
        "search_tfidf_topk": _tfidf_oracle_sql(query_terms(_BM25_QUERY), 25),
        "events_sessionize": """
            WITH o AS (
                SELECT user_id, event_id, ts, event_type,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
                FROM events
            ),
            flag AS (
                SELECT *, CASE WHEN p IS NULL
                               OR epoch_us(ts) - epoch_us(p) > 86400::BIGINT * 1000000
                          THEN 1 ELSE 0 END AS ns
                FROM o
            ),
            sess AS (
                SELECT *, CAST(SUM(ns) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
                FROM flag
            )
            SELECT user_id, session_idx,
                   COUNT(*) AS n_events,
                   CAST(MIN(ts) AS TIMESTAMP) AS started,
                   MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
                   COUNT(DISTINCT event_type) AS n_event_types
            FROM sess GROUP BY 1, 2
        """,
        "streaming_window_agg": """
            SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS window_start,
                   event_type,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
            FROM events
            GROUP BY 1, 2
        """,
        "streaming_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                    >= INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ),
            sessions AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM flagged
            )
            SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
                   CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
                   user_id,
                   COUNT(*) AS events_in_session
            FROM sessions
            GROUP BY user_id, sid
        """,
        "streaming_ingest_dedup": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "streaming_enrich_agg": """
            SELECT c.c_mktsegment AS mktsegment,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
            FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY 1
        """,
        "streaming_rollup_route": """
            SELECT event_type,
                   COUNT(*) AS event_count,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
            FROM events
            GROUP BY 1
        """,
    }
    # Golden-row oracles for the entries whose arithmetic no SQL engine
    # can replicate (xxHash64 MinHash/SimHash, hyperplane-LSH and IVF
    # probing, codec features): scripts/ref_kernels.py re-implements
    # the exact math as pure numpy/Python from the public algorithm
    # specs (no pyspark import), scripts/gen_golden_oracles.py runs
    # those kernels over the sf0.01 parquet and freezes the results as
    # VALUES statements, and tests/test_ref_kernels.py proves kernel ==
    # operator row-for-row. The frozen rows are therefore an
    # INDEPENDENT oracle (valid at sf0.01, the driver's correctness
    # scale), not an echo of the engine output.
    import json as _json
    import os as _os

    _golden_path = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "golden_oracles.json"
    )
    if _os.path.exists(_golden_path):
        with open(_golden_path) as _f:
            oracles.update(_json.load(_f)["oracles"])
    return {k: _oracle_canon(v) for k, v in oracles.items()}
