"""Batch sessionization over event streams.

Gap-based session assembly as pure DataFrame window expressions: one
shuffle on the entity key, then per-partition LAG + running-sum — the
canonical sessionization plan. At 100 TB the cost is a single hash
exchange on ``user_col``; the window and the per-session rollup both
run inside that partitioning (Spark's HashPartitioning(user) satisfies
the clustered distribution of the (user, session) group-by, so the
rollup adds **no second exchange**). Hot users skew the exchange —
pair with ``operators.skew`` salting if one user dominates.

The streaming twin lives in ``streaming/stream_layer.py`` (JVM
``session_window`` with watermark state); this is the batch/backfill
path over historical parquet. All timestamp math is integer
microseconds (``unix_micros``) so results are exactly reproducible
across engines (no float epoch rounding).

Beyond the reference's surface (sidemantic has no event ops); part of
the LLM-data-pipeline operator set (session-grouped interaction logs
are a standard conversational-training corpus shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-user session index to every event.

    A new session starts at the first event per user and whenever the
    gap to the previous event exceeds ``gap_seconds``. ``order_cols``
    breaks timestamp ties deterministically. Adds ``session_idx``
    (1-based within user) and keeps all input columns.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((us - prev_us) > F.lit(int(gap_seconds) * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(new_session).over(run))


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 1800,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-session rollup: event count, span, distinct event types.

    ``duration_us`` is an exact integer (last-minus-first event in
    microseconds) — intra-session span, 0 for single-event sessions.
    """
    sess = sessionize(
        df, user_col=user_col, ts_col=ts_col,
        order_cols=order_cols, gap_seconds=gap_seconds,
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.col(ts_col).cast("timestamp")).alias("started"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    ]
    if "event_type" in df.columns:
        aggs.append(F.countDistinct("event_type").alias("n_event_types"))
    if extra_aggs:
        aggs.extend(extra_aggs)
    return sess.groupBy(user_col, "session_idx").agg(*aggs)
