"""Streaming semantic layer: event-stream models over Structured
Streaming.

The reference has NO streaming surface (SURVEY.md §2.9) — its closest
concepts are incremental pre-aggregation refresh and lambda rollups
(``core/pre_aggregation.py:16-24``, ``sql/generator.py:7104-7135``).
This module is the Spark-native extension the north star asks for: the
same semantic models (dimensions + metrics), executed continuously.

Design:

- a ``StreamingModelBinding`` attaches a streaming source (file /
  kafka / rate / an existing streaming DataFrame) to a registered
  semantic model;
- ``stream_query`` compiles metrics/dimensions into a windowed
  streaming aggregation: ``readStream -> withWatermark -> groupBy(
  window | session_window, dims) -> agg`` — tumbling by default,
  sliding with ``slide=``, session windows with ``session_gap=``;
- simple metrics compile via the same ``Metric.agg_sql`` SQL used in
  batch, applied with ``F.expr`` — one metric definition, two runtimes;
- ``stream_rollup`` maintains a pre-aggregation continuously:
  ``foreachBatch`` + dynamic partition overwrite into the same
  partitioned layout the batch ``PreAggManager`` writes, so the
  aggregate-aware router serves from a stream-maintained rollup
  transparently (the reference's "lambda" architecture without the
  manual union);
- ``sessionize`` exposes per-entity session assembly with
  ``session_window`` (no Python state; JVM-side incremental session
  store).

Scale notes: watermarks bound the state store; the shuffle is on
(window, dims) exactly like the batch rollup's groupBy, so the same
skew/salting guidance applies. Late rows beyond the watermark are
dropped by Spark (documented contract), matching the rollup's
incremental-refresh window semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from sidemantic_spark.core.model import Model
from sidemantic_spark.sql.fragments import interval_sql


class StreamingError(Exception):
    pass


@dataclass
class StreamingModelBinding:
    """Streaming source binding for a semantic model.

    ``source_format``/``source_options`` feed ``spark.readStream`` when
    no explicit ``stream`` DataFrame is given; ``time_column`` is the
    event-time column watermarks apply to.
    """

    model: str
    time_column: str
    source_format: str | None = None  # parquet | json | csv | kafka | rate
    source_path: str | None = None
    source_options: dict = field(default_factory=dict)
    schema: object | None = None  # StructType | DDL string (file sources)
    stream: DataFrame | None = None  # pre-built streaming DataFrame


class StreamingSemanticLayer:
    """Streaming face of a :class:`SparkSemanticLayer`.

    Shares the batch layer's semantic graph; adds per-model stream
    bindings and windowed compilation.
    """

    def __init__(self, layer) -> None:
        self.layer = layer
        self.bindings: dict[str, StreamingModelBinding] = {}

    def bind(self, binding: StreamingModelBinding) -> StreamingModelBinding:
        self.layer.graph.get_model(binding.model)  # must exist
        self.bindings[binding.model] = binding
        return binding

    # -- source -------------------------------------------------------

    def _source(self, binding: StreamingModelBinding) -> DataFrame:
        if binding.stream is not None:
            return binding.stream
        if not binding.source_format:
            raise StreamingError(
                f"model {binding.model!r}: binding needs stream= or source_format="
            )
        reader = self.layer.spark.readStream.format(binding.source_format)
        if binding.schema is not None:
            reader = reader.schema(binding.schema)
        for k, v in binding.source_options.items():
            reader = reader.option(k, v)
        if binding.source_path:
            return reader.load(binding.source_path)
        return reader.load()

    # -- compile ------------------------------------------------------

    def stream_query(
        self,
        model_name: str,
        metrics: list[str],
        dimensions: list[str] | None = None,
        window: str = "1 hour",
        slide: str | None = None,
        session_gap: str | None = None,
        watermark: str = "10 minutes",
        filters: list[str] | None = None,
    ) -> DataFrame:
        """Windowed streaming aggregation over a bound model.

        Returns a streaming DataFrame with columns ``window_start``,
        ``window_end``, the dimensions, and one column per metric —
        the streaming shape of ``layer.query(metrics, dims +
        [time__grain])``.
        """
        binding = self.bindings.get(model_name)
        if binding is None:
            raise StreamingError(f"model {model_name!r} has no stream binding")
        model = self.layer.graph.get_model(model_name)
        df = self._source(binding).withWatermark(binding.time_column, watermark)

        for f in filters or []:
            df = df.where(F.expr(self._strip_model(f, model_name)))

        if session_gap is not None:
            win = F.session_window(F.col(binding.time_column), session_gap)
        elif slide is not None:
            win = F.window(F.col(binding.time_column), window, slide)
        else:
            win = F.window(F.col(binding.time_column), window)

        group_cols = [win.alias("__w")]
        out_dims = []
        for ref in dimensions or []:
            dname = ref.split(".", 1)[-1]
            dim = model.dimension(dname)
            if dim is None:
                raise StreamingError(f"unknown dimension {ref!r}")
            group_cols.append(F.expr(dim.expr).alias(dname))
            out_dims.append(dname)

        aggs = []
        for ref in metrics:
            mname = ref.split(".", 1)[-1]
            metric = model.metric(mname)
            if metric is None:
                raise StreamingError(f"unknown metric {ref!r}")
            if not metric.is_simple:
                raise StreamingError(
                    f"metric {ref!r}: only simple aggregations stream incrementally; "
                    "complex types (cumulative/comparison/...) are batch plans over "
                    "the streamed rollup"
                )
            expr_sql = metric.agg_sql(model.metric_value_sql(metric) or "1")
            if metric.filters:
                cond = " AND ".join(
                    f"({self._strip_model(c, model_name)})" for c in metric.filters
                )
                inner = model.metric_value_sql(metric) or "1"
                expr_sql = metric.agg_sql(f"CASE WHEN {cond} THEN {inner} END")
            aggs.append(F.expr(expr_sql).alias(mname))

        out = df.groupBy(*group_cols).agg(*aggs)
        return out.select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *[F.col(d) for d in out_dims],
            *[F.col(ref.split(".", 1)[-1]) for ref in metrics],
        )

    def _strip_model(self, sql: str, model_name: str) -> str:
        return sql.replace(f"{model_name}.", "").replace("{model}.", "")

    # -- sinks --------------------------------------------------------

    def to_memory_sink(
        self,
        df: DataFrame,
        name: str,
        await_done: bool = True,
        output_mode: str = "complete",
    ):
        """Test/debug sink: run the stream to completion of available
        data into an in-memory table (``availableNow`` trigger).
        ``output_mode="append"`` for non-aggregating streams (dedup,
        row transforms); ``"complete"`` for windowed aggregations.

        Stateful operators create one state store PER shuffle
        partition, fixed at first-batch planning; a replay on a bare
        session (shuffle.partitions=200) pays 200 state stores of
        setup for a single micro-batch. Pin the stream's partition
        count to the cluster parallelism for the duration of the
        replay (measured 5.1s -> 1.1s at sf0.01); production sinks
        (stream_rollup/to_parquet_sink) keep the session setting —
        at scale the state partition count is a real tuning choice."""
        spark = df.sparkSession
        key = "spark.sql.shuffle.partitions"
        old = spark.conf.get(key)
        spark.conf.set(key, str(spark.sparkContext.defaultParallelism))
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            if await_done:
                q.awaitTermination()
        finally:
            spark.conf.set(key, old)
        return q

    def stream_rollup(
        self,
        model_name: str,
        preagg_name: str,
        checkpoint_dir: str,
        watermark: str = "10 minutes",
        base_path: str | None = None,
    ):
        """Continuously maintain a pre-aggregation from the model's
        stream: every micro-batch re-aggregates at rollup grain,
        merges the partials with what is already on disk (sum/count
        add, min/max fold — which is why distinct-count measures are
        refused), and dynamic-partition-overwrites only the touched
        partitions of the same parquet layout the batch
        ``PreAggManager`` writes — the router then serves queries from
        a stream-fresh rollup.

        Note on replay: foreachBatch is at-least-once; a replayed batch
        would merge twice. For exactly-once bookkeeping, track
        ``batch_id`` high-water marks alongside the rollup (standard
        foreachBatch idempotency pattern).
        """
        from sidemantic_spark.preagg.manager import PreAggManager

        binding = self.bindings.get(model_name)
        if binding is None:
            raise StreamingError(f"model {model_name!r} has no stream binding")
        model = self.layer.graph.get_model(model_name)
        pa = next((p for p in model.pre_aggregations if p.name == preagg_name), None)
        if pa is None:
            raise StreamingError(f"unknown pre-aggregation {preagg_name!r}")
        for mname in pa.measures:
            magg = model.metric(mname).agg if model.metric(mname) else None
            if magg in ("count_distinct", "approx_count_distinct"):
                raise StreamingError(
                    f"stream_rollup cannot maintain {mname!r} ({magg}): "
                    "exact distinct partials do not merge across "
                    "micro-batches; use a batch refresh for that rollup"
                )
        mgr = PreAggManager(self.layer, **({"base_path": base_path} if base_path else {}))
        path = mgr.path_for(model, pa)
        # the batch SQL reads from the micro-batch temp view via
        # source_override — string-replacing the table name would mangle
        # same-substring column refs and silently miss sql-bound models
        view = f"__stream_batch_{model_name}_{preagg_name}"
        batch_rollup_sql = mgr.rollup_sql(model, pa, source_override=view)
        group_cols = list(pa.dimensions)
        if pa.time_dimension:
            group_cols.append(f"{pa.time_dimension}__{pa.granularity}")
        if pa.partition_granularity:
            group_cols.append("__part")

        def _merge_exprs(columns: list[str]) -> list:
            out = []
            for c in columns:
                if c in group_cols:
                    continue
                if c.endswith("__min"):
                    out.append(F.min(c).alias(c))
                elif c.endswith("__max"):
                    out.append(F.max(c).alias(c))
                else:  # __sum / __count / __row_count: additive
                    out.append(F.sum(c).alias(c))
            return out

        src = self._source(binding).withWatermark(binding.time_column, watermark)

        def _refresh(batch_df: DataFrame, batch_id: int) -> None:
            # re-aggregate THE BATCH at rollup grain, MERGE with the
            # partials already on disk (a batch-only overwrite would
            # drop earlier batches' contributions to the same
            # partition), then overwrite the touched partitions.
            sess = batch_df.sparkSession
            batch_df.createOrReplaceTempView(view)
            merged = sess.sql(batch_rollup_sql)
            try:
                existing = sess.read.parquet(path)
            except Exception:
                existing = None
            if existing is not None:
                if pa.partition_granularity:
                    touched = [
                        r[0]
                        for r in merged.select("__part").distinct().collect()
                    ]
                    existing = existing.where(F.col("__part").isin(touched))
                merged = (
                    existing.unionByName(merged)
                    .groupBy(*group_cols)
                    .agg(*_merge_exprs(merged.columns))
                )
            # materialize BEFORE the write: the merge reads the same
            # parquet path the write overwrites
            merged = merged.localCheckpoint(eager=True)
            writer = merged.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            )
            if pa.partition_granularity:
                writer = writer.partitionBy("__part")
            writer.parquet(path)
            mgr.register_one(model, pa)

        return (
            src.writeStream.foreachBatch(_refresh)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def sessionize(
        self,
        model_name: str,
        entity: str,
        gap: str = "30 minutes",
        watermark: str = "10 minutes",
        metrics: list[str] | None = None,
    ) -> DataFrame:
        """Per-entity session assembly with ``session_window`` —
        incremental JVM-side session state, no Python UDFs."""
        binding = self.bindings.get(model_name)
        if binding is None:
            raise StreamingError(f"model {model_name!r} has no stream binding")
        model = self.layer.graph.get_model(model_name)
        entity_dim = model.dimension(entity)
        entity_expr = entity_dim.expr if entity_dim else entity
        df = self._source(binding).withWatermark(binding.time_column, watermark)
        aggs = [F.count("*").alias("events_in_session")]
        for ref in metrics or []:
            mname = ref.split(".", 1)[-1]
            metric = model.metric(mname)
            if metric is not None and metric.is_simple:
                aggs.append(F.expr(metric.agg_sql(model.metric_value_sql(metric) or "1")).alias(mname))
        return (
            df.groupBy(
                F.session_window(F.col(binding.time_column), gap).alias("__s"),
                F.expr(entity_expr).alias(entity),
            )
            .agg(*aggs)
            .select(
                F.col("__s.start").alias("session_start"),
                F.col("__s.end").alias("session_end"),
                entity,
                "events_in_session",
                *[c for c in (m.split(".", 1)[-1] for m in metrics or [])],
            )
        )

    def stream_enrich(
        self,
        model_name: str,
        static_model: str,
        on: dict[str, str],
        columns: list[str] | None = None,
        how: str = "left",
    ) -> DataFrame:
        """Stream-static enrichment join: the bound stream joined to a
        registered static model's table, static side broadcast.

        Stateless (no watermark state): Spark re-plans the static side
        per micro-batch, so slowly-changing dimension updates are
        picked up at batch boundaries. At scale the static side must be
        broadcast-sized (a dimension table); stream-stream fact joins
        belong to :meth:`stream_funnel`'s watermarked self-join.
        ``on`` maps stream columns to static columns; ``columns``
        optionally prunes the static projection (always keeping the
        join keys).
        """
        binding = self.bindings.get(model_name)
        if binding is None:
            raise StreamingError(f"model {model_name!r} has no stream binding")
        self.layer.register_sources()
        sm = self.layer.graph.get_model(static_model)
        static_df = self.layer.spark.table(sm.table or static_model)
        if columns:
            keep = list(dict.fromkeys(list(on.values()) + columns))
            static_df = static_df.select(*keep)
        s = self._source(binding)
        cond = None
        for sc, tc in on.items():
            c = s[sc] == static_df[tc]
            cond = c if cond is None else cond & c
        return s.join(F.broadcast(static_df), cond, how)

    def stream_dedup(
        self,
        model_name: str,
        keys: list[str] | None = None,
        watermark: str = "10 minutes",
        within_watermark: bool = True,
    ) -> DataFrame:
        """Streaming exact dedup for ingestion pipelines.

        ``dropDuplicatesWithinWatermark`` keeps state only for the
        watermark horizon — the state store stays bounded no matter how
        long the stream runs, which is the only shape that survives a
        100 TB/day ingest. ``within_watermark=False`` falls back to
        global ``dropDuplicates`` (unbounded state; exact forever).
        """
        binding = self.bindings.get(model_name)
        if binding is None:
            raise StreamingError(f"model {model_name!r} has no stream binding")
        model = self.layer.graph.get_model(model_name)
        keys = keys or model.pk_list()
        df = self._source(binding).withWatermark(binding.time_column, watermark)
        if within_watermark:
            return df.dropDuplicatesWithinWatermark(keys)
        return df.dropDuplicates(keys)

    def stream_funnel(
        self,
        model_name: str,
        entity: str,
        base_event: str,
        conversion_event: str,
        conversion_window: str = "1 hour",
        watermark: str = "2 hours",
    ) -> DataFrame:
        """Incremental conversion funnel: a watermarked stream-stream
        LEFT OUTER self-join (base events x conversion events of the
        same entity within ``conversion_window``) — the streaming form
        of the batch conversion metric, which a windowed aggregation
        cannot express because the two legs are different event rows.

        The join's time-range predicate plus both-side watermarks bound
        the state store to the watermark horizon (Spark drops base rows
        once no in-window conversion can still arrive), so state stays
        O(events per window), not O(stream history). Emits append rows
        (entity, base_ts, conv_ts, converted): one row per MATCHING
        (base, conversion) pair as matches arrive — an entity that
        converts twice inside the window emits two converted rows, so
        conversion RATES must count DISTINCT (entity, base_ts) —
        plus one unconverted row per base event whose window expires
        with no match. Collapsing to first-conversion-only would need
        a second stateful dedup operator downstream; this operator
        keeps the raw pair stream so both semantics stay derivable.

        ``base_event``/``conversion_event`` are filter SQL over the
        source columns (e.g. "event_type = 'signup'").
        """
        binding = self.bindings.get(model_name)
        if binding is None:
            raise StreamingError(f"model {model_name!r} has no stream binding")
        t = binding.time_column
        src = self._source(binding)
        base = (
            src.where(base_event)
            .select(F.col(entity).alias("__entity"), F.col(t).alias("base_ts"))
            .withWatermark("base_ts", watermark)
        )
        conv = (
            src.where(conversion_event)
            .select(
                F.col(entity).alias("__conv_entity"),
                F.col(t).alias("conv_ts"),
            )
            .withWatermark("conv_ts", watermark)
        )
        joined = base.join(
            conv,
            F.expr(
                "__entity = __conv_entity AND "
                f"conv_ts >= base_ts AND "
                f"conv_ts <= base_ts + {interval_sql(conversion_window)}"
            ),
            "leftOuter",
        )
        return joined.select(
            F.col("__entity").alias(entity),
            "base_ts",
            "conv_ts",
            F.col("conv_ts").isNotNull().alias("converted"),
        )

    def stream_stateful_metrics(
        self,
        model_name: str,
        entity: str,
        value_col: str,
        watermark: str = "10 minutes",
        timeout_ms: int | None = None,
    ) -> DataFrame:
        """Custom stateful per-entity running aggregates via
        ``applyInPandasWithState`` (Arrow-batched Python state handler:
        the escape hatch for semantics ``groupBy().agg()`` can't
        express). Emits one row per entity per micro-batch with the
        running count / sum / max seen so far; with ``timeout_ms``
        set, state times out after that much processing-time
        inactivity, bounding the store.
        """
        import pandas as pd
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        binding = self.bindings.get(model_name)
        if binding is None:
            raise StreamingError(f"model {model_name!r} has no stream binding")
        df = self._source(binding).withWatermark(binding.time_column, watermark)
        # entity keeps its SOURCE type (a hardcoded LONG kills the query
        # at Arrow conversion for string keys)
        entity_type = df.schema[entity].dataType.simpleString()
        out_schema = (
            f"{entity} {entity_type}, running_count LONG, "
            "running_sum DOUBLE, running_max DOUBLE"
        )
        state_schema = "count LONG, sum DOUBLE, max DOUBLE"

        def update(key, pdfs, state: GroupState):
            if state.hasTimedOut:
                state.remove()
                return
            count, total, mx = (
                state.get if state.exists else (0, 0.0, float("-inf"))
            )
            for pdf in pdfs:
                vals = pdf[value_col].astype("float64")
                count += int(vals.notna().sum())
                total += float(vals.fillna(0.0).sum())
                if len(vals):
                    mx = max(mx, float(vals.max()))
            state.update((count, total, mx))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame({
                entity: [key[0]],
                "running_count": [count],
                "running_sum": [total],
                "running_max": [mx],
            })

        return (
            df.groupBy(F.col(entity))
            .applyInPandasWithState(
                update,
                outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=(
                    GroupStateTimeout.ProcessingTimeTimeout
                    if timeout_ms is not None
                    else GroupStateTimeout.NoTimeout
                ),
            )
        )
