"""Compile-latency regression ceiling.

Mirror of the reference's headline performance test
(``tests/optimizations/test_compile_benchmark.py:56-84``): a warmed
2-model join query (2 metrics, month-grain + categorical dims, filter,
order, limit) must compile to SQL text in under the same 40 ms median
budget. Our measured median is ~0.2 ms (no sqlglot in the hot path —
the compiler is string assembly over pre-resolved fragments), so the
ceiling catches >100x regressions without flaking.

Compile-only: no SparkSession needed (the generator emits SQL text).
"""

from __future__ import annotations

import statistics
import time

from sidemantic_spark.models.tpch import build_layer
from sidemantic_spark.sql.generator import QuerySpec


def _compile_once(layer) -> str:
    return layer.generator.generate(QuerySpec(
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.order_date__month AS order_month", "customer.mktsegment"],
        filters=["orders.status = 'O'"],
        order_by=["order_month"],
        limit=100,
    ))


def test_compile_median_under_40ms():
    layer = build_layer(None, None)

    sql = _compile_once(layer)
    assert "orders" in sql and "customer" in sql and "GROUP BY" in sql

    for _ in range(5):  # warm caches
        _compile_once(layer)

    timings = []
    for _ in range(50):
        t0 = time.perf_counter()
        _compile_once(layer)
        timings.append((time.perf_counter() - t0) * 1000.0)

    median = statistics.median(timings)
    assert median < 40.0, f"compile median {median:.3f}ms exceeded 40ms ceiling"
