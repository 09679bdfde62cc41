"""Metrics-explorer widget engine (headless; ref sidemantic/widget/).

The anywidget UI class needs optional deps; everything it computes is
exercised here through ExplorerEngine."""

from __future__ import annotations

import base64
import datetime
import io

import pytest

from sidemantic_spark.widget import ExplorerEngine, build_auto_model, table_to_ipc


@pytest.fixture(scope="module")
def sales_df(spark):
    rows = []
    for i in range(60):
        rows.append((
            i,
            "ab"[i % 2],
            ["north", "south", "east"][i % 3],
            float(100 + i),
            datetime.datetime(2026, 1, 1) + datetime.timedelta(days=i % 30),
        ))
    return spark.createDataFrame(
        rows, "sale_id long, cat string, region string, amount double, sold_at timestamp"
    )


def test_auto_model_from_schema(sales_df):
    model, time_dim = build_auto_model(sales_df.schema, table_name="t")
    assert time_dim == "sold_at"
    names = {d.name: d.type for d in model.dimensions}
    assert names["cat"] == "categorical"
    assert names["amount"] == "numeric"
    assert names["sold_at"] == "time"
    mets = {m.name for m in model.metrics}
    assert {"row_count", "sum_amount", "avg_amount"} <= mets
    # numeric id column also gets implied metrics (matches reference)
    assert "sum_sale_id" in mets


def test_auto_model_cardinality_skip(sales_df):
    model, _ = build_auto_model(
        sales_df.schema,
        max_dimension_cardinality=2,
        cardinality_map={"cat": 2, "region": 3, "sale_id": 60, "amount": 60},
    )
    names = {d.name for d in model.dimensions}
    assert "cat" in names and "region" not in names
    assert "sold_at" in names  # time dims are never skipped


def test_engine_configs_and_series(sales_df):
    eng = ExplorerEngine(sales_df, metrics=None, dimensions=None)
    keys = {m["key"] for m in eng.metrics_config()}
    assert "widget_data.row_count" in keys and "widget_data.sum_amount" in keys
    dims = {d["key"] for d in eng.dimensions_config()}
    assert dims == {"widget_data.cat", "widget_data.region"}
    assert eng.time_grain_options()[0] == "day"
    series = eng.metric_series_df().collect()
    assert len(series) == 30  # 30 distinct days
    assert sum(r["row_count"] for r in series) == 60


def test_engine_breakdown_filters_and_totals(sales_df):
    eng = ExplorerEngine(sales_df)
    eng.selected_metric = "widget_data.sum_amount"
    bd = eng.dimension_breakdown_df("widget_data.region").collect()
    assert {r["region"] for r in bd} == {"north", "south", "east"}
    # own-dimension filter is excluded from its breakdown
    eng.filters = {"widget_data.region": ["north"]}
    bd2 = eng.dimension_breakdown_df("widget_data.region").collect()
    assert {r["region"] for r in bd2} == {"north", "south", "east"}
    other = eng.dimension_breakdown_df("widget_data.cat").collect()
    assert sum(r["row_count"] for r in other) == 20  # region-filtered

    eng.filters = {}
    eng.date_range = ["2026-01-08", "2026-01-14"]
    eng.comparison_mode = "wow"
    totals = eng.metric_totals()
    cur = totals["widget_data.row_count"]["current"]
    prev = totals["widget_data.row_count"]["previous"]
    assert cur == 14 and prev == 14  # uniform 2/day in both weeks
    assert totals["widget_data.row_count"]["pct_change"] == 0.0


def test_comparison_window_keeps_range_length(sales_df):
    """The previous-period window is the CURRENT range shifted back by
    the offset (same length), not a window of the offset's length —
    a 14-day range vs wow must compare 14 days to 14 days."""
    eng = ExplorerEngine(sales_df)
    eng.date_range = ["2026-01-15", "2026-01-28"]  # 14 days, 2 rows/day
    eng.comparison_mode = "wow"
    totals = eng.metric_totals()
    assert totals["widget_data.row_count"]["current"] == 28
    # shifted window 2026-01-08..2026-01-21: also 14 full days
    assert totals["widget_data.row_count"]["previous"] == 28


def test_refresh_all_payload_ipc_roundtrip(sales_df):
    import pyarrow as pa

    eng = ExplorerEngine(sales_df)
    payload = eng.refresh_all()
    assert payload["status"] == "ready", payload.get("error")
    raw = base64.b64decode(payload["metric_series_data"])
    table = pa.ipc.open_file(io.BytesIO(raw)).read_all()
    assert table.num_rows == 30
    assert "row_count" in table.schema.names
    assert set(payload["dimension_data"]) == {
        "widget_data.cat", "widget_data.region",
    }


def test_table_to_ipc_decimal_modes():
    import decimal

    import pyarrow as pa

    t = pa.table({
        "d": pa.array(
            [decimal.Decimal("1.25"), decimal.Decimal("2.50")],
            type=pa.decimal128(10, 2),
        )
    })
    f = pa.ipc.open_file(
        io.BytesIO(base64.b64decode(table_to_ipc(t)))
    ).read_all()
    assert f.schema.field("d").type == pa.float64()
    s = pa.ipc.open_file(
        io.BytesIO(base64.b64decode(table_to_ipc(t, decimal_mode="string")))
    ).read_all()
    assert s.schema.field("d").type == pa.string()


def test_widget_lazy_import_error():
    try:
        import anywidget  # noqa: F401
        pytest.skip("anywidget installed; lazy error path not reachable")
    except ModuleNotFoundError:
        pass
    with pytest.raises(ModuleNotFoundError, match="optional widget dependencies"):
        from sidemantic_spark.widget import MetricsExplorer  # noqa: F401


def test_engine_with_semantic_layer(spark, sf_dir):
    """Mode 2: existing layer + explicit refs (ref widget mode 2)."""
    from sidemantic_spark.models.tpch import build_layer

    layer = build_layer(spark, sf_dir)
    eng = ExplorerEngine(
        layer=layer,
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.status"],
        time_dimension="orders.order_date",
    )
    eng.time_grain = "month"
    series = eng.metric_series_df().collect()
    assert len(series) > 0
    totals = eng.metric_totals()
    assert totals["orders.revenue"]["current"] is not None
