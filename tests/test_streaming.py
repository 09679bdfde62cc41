"""Structured Streaming extension tests.

File-source streams over a temp directory with ``availableNow``
triggers so every test runs to completion deterministically; results
compare against equivalent batch aggregations over the same files.
"""

from __future__ import annotations

import pytest

from sidemantic_spark.core.layer import SparkSemanticLayer
from sidemantic_spark.core.model import Dimension, Metric, Model
from sidemantic_spark.streaming import StreamingModelBinding, StreamingSemanticLayer

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


@pytest.fixture()
def stream_setup(spark, tmp_path):
    src_dir = str(tmp_path / "events_stream")
    # CAST the value column: a bare 1.0 literal is DECIMAL(2,1), whose
    # parquet encoding the DOUBLE read schema would misread 10x
    spark.sql("""
        SELECT event_id, ts, user_id, event_type, CAST(value AS DOUBLE) AS value
        FROM VALUES
            (1L, TIMESTAMP '2026-01-01 10:00:00', 1L, 'view', 1.0),
            (2L, TIMESTAMP '2026-01-01 10:10:00', 1L, 'purchase', 20.0),
            (3L, TIMESTAMP '2026-01-01 10:20:00', 2L, 'view', 1.0),
            (4L, TIMESTAMP '2026-01-01 11:05:00', 1L, 'view', 2.0),
            (5L, TIMESTAMP '2026-01-01 11:15:00', 2L, 'purchase', 30.0),
            (6L, TIMESTAMP '2026-01-01 13:00:00', 2L, 'view', 1.0)
            AS t(event_id, ts, user_id, event_type, value)
    """).write.mode("overwrite").parquet(src_dir)

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="sevents",
        table="sevents",
        primary_key="event_id",
        dimensions=[
            Dimension(name="event_type"),
            Dimension(name="ts", type="time"),
            Dimension(name="user_id", type="numeric"),
        ],
        metrics=[
            Metric(name="event_count", agg="count"),
            Metric(name="total_value", agg="sum", sql="value"),
            Metric(name="purchase_value", agg="sum", sql="value",
                   filters=["sevents.event_type = 'purchase'"]),
        ],
    ))
    slayer = StreamingSemanticLayer(layer)
    slayer.bind(StreamingModelBinding(
        model="sevents",
        time_column="ts",
        source_format="parquet",
        source_path=src_dir,
        schema=SCHEMA,
    ))
    return slayer


def _run_to_memory(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_tumbling_window_aggregation(spark, stream_setup):
    df = stream_setup.stream_query(
        "sevents",
        metrics=["sevents.event_count", "sevents.total_value"],
        dimensions=["sevents.event_type"],
        window="1 hour",
        watermark="0 seconds",
    )
    assert df.isStreaming
    rows = _run_to_memory(spark, df, "tumbling_out")
    by_key = {(str(r[0]), r[2]): (r[3], r[4]) for r in rows}
    assert by_key[("2026-01-01 10:00:00", "view")] == (2, 2.0)
    assert by_key[("2026-01-01 10:00:00", "purchase")] == (1, 20.0)
    assert by_key[("2026-01-01 11:00:00", "purchase")] == (1, 30.0)
    assert by_key[("2026-01-01 13:00:00", "view")] == (1, 1.0)


def test_metric_filters_stream(spark, stream_setup):
    df = stream_setup.stream_query(
        "sevents",
        metrics=["sevents.purchase_value"],
        window="1 day",
        watermark="0 seconds",
    )
    rows = _run_to_memory(spark, df, "filtered_out")
    assert {(str(r[0]), r[2]) for r in rows} == {("2026-01-01 00:00:00", 50.0)}


def test_session_windows(spark, stream_setup):
    df = stream_setup.sessionize(
        "sevents", entity="user_id", gap="30 minutes", watermark="0 seconds",
        metrics=["sevents.total_value"],
    )
    rows = _run_to_memory(spark, df, "sessions_out")
    # user 1: 10:00+10:10 one session, 11:05 another; user 2: 10:20,
    # 11:15 (>30m apart -> separate), 13:00 separate
    per_user = {}
    for _start, _end, user, n, total in rows:
        per_user.setdefault(user, []).append((n, total))
    assert sorted(per_user[1]) == [(1, 2.0), (2, 21.0)]
    assert sorted(per_user[2]) == [(1, 1.0), (1, 1.0), (1, 30.0)]


def test_stream_rollup_feeds_router(spark, stream_setup, tmp_path):
    """foreachBatch-maintained rollup lands in the batch layout and the
    aggregate-aware router serves from it."""
    from sidemantic_spark.preagg.matcher import PreAggregation

    layer = stream_setup.layer
    model = layer.graph.get_model("sevents")
    model.pre_aggregations.append(PreAggregation(
        name="hourly",
        measures=["event_count", "total_value"],
        dimensions=["event_type"],
        time_dimension="ts",
        granularity="hour",
    ))
    layer.graph._invalidate()
    try:
        q = stream_setup.stream_rollup(
            "sevents", "hourly",
            checkpoint_dir=str(tmp_path / "ckpt"),
            watermark="0 seconds",
            base_path=str(tmp_path / "rollups"),
        )
        q.awaitTermination()
        sql = layer.compile(metrics=["sevents.event_count"],
                            dimensions=["sevents.event_type"])
        assert "used_preagg=sevents_preagg_hourly" in sql
        rows = {(r["event_type"], r["event_count"])
                for r in layer.query(metrics=["sevents.event_count"],
                                     dimensions=["sevents.event_type"]).collect()}
        assert rows == {("view", 4), ("purchase", 2)}

        # late-arriving micro-batch touching the SAME groups must MERGE
        # with the partials on disk, not overwrite them (regression:
        # per-batch overwrite dropped earlier batches' contributions)
        src_dir = stream_setup.bindings["sevents"].source_path
        spark.sql("""
            SELECT event_id, ts, user_id, event_type, CAST(value AS DOUBLE) AS value
            FROM VALUES
                (7L, TIMESTAMP '2026-01-01 10:30:00', 3L, 'view', 1.0),
                (8L, TIMESTAMP '2026-01-01 13:30:00', 3L, 'purchase', 5.0)
                AS t(event_id, ts, user_id, event_type, value)
        """).write.mode("append").parquet(src_dir)
        q2 = stream_setup.stream_rollup(
            "sevents", "hourly",
            checkpoint_dir=str(tmp_path / "ckpt"),
            watermark="0 seconds",
            base_path=str(tmp_path / "rollups"),
        )
        q2.awaitTermination()
        rows = {(r["event_type"], r["event_count"])
                for r in layer.query(metrics=["sevents.event_count"],
                                     dimensions=["sevents.event_type"]).collect()}
        assert rows == {("view", 5), ("purchase", 3)}

        # distinct-count partials do not merge across micro-batches
        from sidemantic_spark.core.model import Metric
        from sidemantic_spark.streaming import StreamingError as _SE

        if model.metric("uniq_users") is None:
            model.add_metric(Metric(name="uniq_users", agg="count_distinct",
                                    sql="user_id"))
        model.pre_aggregations.append(PreAggregation(
            name="cd_hourly", measures=["uniq_users"],
            dimensions=["event_type"], time_dimension="ts",
            granularity="hour",
        ))
        layer.graph._invalidate()
        with pytest.raises(_SE, match="count_distinct"):
            stream_setup.stream_rollup(
                "sevents", "cd_hourly",
                checkpoint_dir=str(tmp_path / "ckpt_cd"),
                base_path=str(tmp_path / "rollups"),
            )
    finally:
        model.pre_aggregations = [p for p in model.pre_aggregations
                                  if p.name not in ("hourly", "cd_hourly")]
        layer.graph._invalidate()


def _run_to_memory_mode(spark, df, name, mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_dedup(spark, tmp_path):
    """Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark):
    duplicate event_ids across files come out exactly once."""
    src_dir = str(tmp_path / "dedup_stream")
    spark.sql("""
        SELECT event_id, ts, user_id, event_type, CAST(value AS DOUBLE) AS value
        FROM VALUES
            (1L, TIMESTAMP '2026-01-01 10:00:00', 1L, 'view', 1.0),
            (2L, TIMESTAMP '2026-01-01 10:10:00', 1L, 'purchase', 20.0),
            (3L, TIMESTAMP '2026-01-01 10:20:00', 2L, 'view', 1.0)
            AS t(event_id, ts, user_id, event_type, value)
    """).write.mode("overwrite").parquet(src_dir)
    spark.sql("""
        SELECT event_id, ts, user_id, event_type, CAST(value AS DOUBLE) AS value
        FROM VALUES
            (1L, TIMESTAMP '2026-01-01 10:00:00', 1L, 'view', 1.0),
            (3L, TIMESTAMP '2026-01-01 10:20:00', 2L, 'view', 1.0),
            (4L, TIMESTAMP '2026-01-01 10:30:00', 3L, 'view', 5.0)
            AS t(event_id, ts, user_id, event_type, value)
    """).write.mode("append").parquet(src_dir)

    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(name="dstream", table="dstream", primary_key="event_id",
                          dimensions=[Dimension(name="ts", type="time")]))
    slayer = StreamingSemanticLayer(layer)
    slayer.bind(StreamingModelBinding(
        model="dstream", time_column="ts", source_format="parquet",
        source_path=src_dir, schema=SCHEMA,
    ))
    deduped = slayer.stream_dedup("dstream", keys=["event_id"], watermark="24 hours")
    rows = _run_to_memory_mode(spark, deduped, "dedup_sink", "append")
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3, 4]


def test_stream_stateful_metrics(spark, stream_setup):
    """applyInPandasWithState running per-entity aggregates."""
    out = stream_setup.stream_stateful_metrics(
        "sevents", entity="user_id", value_col="value", watermark="0 seconds"
    )
    rows = _run_to_memory_mode(spark, out, "state_sink", "update")
    by_user = {}
    for r in rows:  # update mode may emit several rows per key; last wins
        by_user[r["user_id"]] = r
    assert by_user[1]["running_count"] == 3
    assert abs(by_user[1]["running_sum"] - 23.0) < 1e-9
    assert abs(by_user[1]["running_max"] - 20.0) < 1e-9
    assert by_user[2]["running_count"] == 3
    assert abs(by_user[2]["running_sum"] - 32.0) < 1e-9


def test_stream_funnel_join(spark, stream_setup, tmp_path):
    """Watermarked stream-stream LEFT OUTER self-join funnel: each
    'view' either converts to a same-user purchase within the window
    or emits unconverted once the watermark passes its join window.
    Outer-join null rows emit one trigger AFTER the watermark passes
    (the engine uses the previous batch's watermark), so the test
    drains twice through a checkpoint with a heartbeat event advancing
    the clock — exactly how a production stream behaves."""
    df = stream_setup.stream_funnel(
        "sevents",
        entity="user_id",
        base_event="event_type = 'view'",
        conversion_event="event_type = 'purchase'",
        conversion_window="30 minutes",
        watermark="10 minutes",
    )
    ckpt = str(tmp_path / "funnel_ckpt")
    out_dir = str(tmp_path / "funnel_out")

    def drain():
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and the restart is the point of this test
        q = (df.writeStream.format("parquet")
             .option("checkpointLocation", ckpt)
             .option("path", out_dir)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    # heartbeats far past every open window advance the watermark so
    # the expired unconverted rows flush on the restart. The global
    # watermark is the MIN across BOTH sides' watermark operators, and
    # filtered-out rows advance nothing — so one 'view' and one
    # 'purchase' heartbeat are needed (in production both sides see
    # the same live traffic)
    src_dir = str(tmp_path / "events_stream")
    spark.sql("""
        SELECT event_id, ts, user_id, event_type, CAST(value AS DOUBLE) AS value
        FROM VALUES
            (98L, TIMESTAMP '2026-01-01 18:00:00', 9L, 'view', 0.0),
            (99L, TIMESTAMP '2026-01-01 18:00:00', 9L, 'purchase', 0.0)
            AS t(event_id, ts, user_id, event_type, value)
    """).write.mode("append").parquet(src_dir)
    drain()
    drain()  # one more empty drain flushes state expired by the heartbeat

    rows = {
        (r.user_id, str(r.base_ts)[11:16], r.converted)
        for r in spark.read.parquet(out_dir).collect()
    }
    # user 1: view@10:00 -> purchase@10:10 (converted);
    #         view@11:05 -> no purchase within 30m
    # user 2: view@10:20 -> no purchase within 30m (11:15 is 55m later);
    #         view@13:00 -> nothing after
    # user 9: the heartbeat pair converts instantly
    assert (1, "10:00", True) in rows
    assert (1, "11:05", False) in rows
    assert (2, "10:20", False) in rows
    assert (2, "13:00", False) in rows
    assert (9, "18:00", True) in rows
    assert len(rows) == 5


def test_stream_enrich_broadcast_join(spark, stream_setup):
    """Stream-static enrichment joins the bound stream to a static
    dimension with a broadcast (stateless) join; availableNow replay
    equals the batch LEFT JOIN aggregate."""
    import uuid

    from pyspark.sql import functions as F

    from sidemantic_spark.core.model import Dimension, Model
    from sidemantic_spark.streaming.stream_layer import StreamingError

    sl = stream_setup
    spark.sql("""
        SELECT * FROM VALUES (1L, 'gold'), (2L, 'basic')
        AS t(cust_id, tier)
    """).createOrReplaceTempView("stream_custs")
    sl.layer.add_model(Model(
        name="stream_custs", table="stream_custs", primary_key="cust_id",
        dimensions=[Dimension(name="tier")],
    ))

    enriched = sl.stream_enrich(
        "sevents", "stream_custs", {"user_id": "cust_id"}, columns=["tier"])
    assert enriched.isStreaming
    agg = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("v"),
    )
    name = "enr_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(agg, name, output_mode="complete")
    got = {r["tier"]: (r["n"], r["v"]) for r in spark.table(name).collect()}
    # user 1 (gold): events 1,2,4 -> 23.0; user 2 (basic): events 3,5,6 -> 32.0
    assert got == {"gold": (3, 23.0), "basic": (3, 32.0)}

    import pytest as _pytest
    with _pytest.raises(StreamingError, match="no stream binding"):
        sl.stream_enrich("stream_custs", "sevents", {"x": "y"})


def test_batch_and_streaming_sessionize_agree(spark, stream_setup):
    """Batch gap sessionization (operators/sessions.py) and the
    streaming session_window twin partition events identically on
    non-boundary data. (Exact-boundary semantics differ by design:
    batch starts a new session at delta > gap, session_window's
    half-open [start, last+gap) already excludes delta == gap.)"""
    import uuid

    from sidemantic_spark.operators.sessions import session_stats

    sl = stream_setup
    out = sl.sessionize("sevents", entity="user_id", gap="30 minutes",
                        watermark="365 days")
    name = "sess_par_" + uuid.uuid4().hex[:8]
    sl.to_memory_sink(out, name, output_mode="complete")
    streaming = sorted(
        (r["user_id"], r["events_in_session"])
        for r in spark.table(name).collect())

    batch_df = spark.read.parquet(sl.bindings["sevents"].source_path)
    batch = sorted(
        (r["user_id"], r["n_events"])
        for r in session_stats(batch_df, gap_seconds=1800).collect())
    assert streaming == batch


def test_streaming_json_metric_rollup(spark, sf_dir):
    """A schema-on-read JSON metric (get_json_object inside the
    incremental agg) streams exactly like a plain column: the
    availableNow replay's final state equals the batch GROUP BY
    (round-9 semistruct x streaming crossover)."""
    import importlib.util
    import os

    here = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", here)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    streamed = mod.queries()["streaming_json_rollup"](spark, sf_dir)
    got = {(r["window_start"], r["event_type"]):
           (r["event_count"], round(float(r["props_k_sum"]), 6))
           for r in streamed.collect()}
    from pyspark.sql import functions as F

    batch = (
        spark.table("events")
        .groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.expr(
                "CAST(get_json_object(props, '$.k') AS DECIMAL(18,2))"
            )).cast("double").alias("s"),
        )
    )
    want = {(r["d"], r["event_type"]): (r["c"], round(float(r["s"]), 6))
            for r in batch.collect()}
    assert got == want
