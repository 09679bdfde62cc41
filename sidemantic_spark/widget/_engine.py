"""Headless metrics-explorer engine.

Everything the notebook widget does except traitlet sync: auto-model
inference from a raw DataFrame (ref ``widget/_auto_model.py:23``
build_auto_model), filter/date-range assembly (ref
``widget/_widget.py:538`` _build_filters), metric time series,
per-dimension breakdowns, totals with period comparison, and Arrow IPC
serialization for transport (ref ``widget/_widget.py:19``
_table_to_ipc).  All query execution routes through the semantic layer,
so preagg routing, caching and security apply to widget traffic too.
"""

from __future__ import annotations

import base64
import io
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_GRAIN_ORDER = ["hour", "day", "week", "month", "quarter", "year"]


def table_to_ipc(table, *, decimal_mode: str = "float", b64: bool = True):
    """Arrow table -> IPC file bytes (base64 text by default) for widget
    transport; decimal columns cast to float64 (or strings when
    ``decimal_mode='string'``) since the JS Arrow reader has no decimal
    support (ref widget/_widget.py:19-79)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if any(pa.types.is_decimal(f.type) for f in table.schema):
        arrays, fields = [], []
        for field in table.schema:
            col = table[field.name]
            if pa.types.is_decimal(field.type):
                target = pa.string() if decimal_mode == "string" else pa.float64()
                arrays.append(pc.cast(col, target))
                fields.append(pa.field(field.name, target))
            else:
                arrays.append(col)
                fields.append(field)
        table = pa.table(arrays, schema=pa.schema(fields))
    sink = io.BytesIO()
    with pa.ipc.new_file(sink, table.schema) as writer:
        writer.write_table(table)
    raw = sink.getvalue()
    return base64.b64encode(raw).decode("ascii") if b64 else raw


def build_auto_model(
    schema: T.StructType,
    table_name: str = "widget_data",
    max_dimension_cardinality: int | None = None,
    cardinality_map: dict[str, int] | None = None,
):
    """Spark schema -> auto model: every column a dimension (typed off
    the Spark DataType), row_count always, sum_/avg_ per numeric column
    (ref widget/_auto_model.py:23-128)."""
    from sidemantic_spark.core.model import Dimension, Metric, Model

    dims: list[Dimension] = []
    mets: list[Metric] = [Metric(name="row_count", agg="count")]
    time_dim: str | None = None
    numeric = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    temporal = (T.DateType, T.TimestampType, T.TimestampNTZType)
    for f in schema.fields:
        if isinstance(f.dataType, temporal):
            dtype = "time"
            if time_dim is None:
                time_dim = f.name
        elif isinstance(f.dataType, numeric):
            dtype = "numeric"
        elif isinstance(f.dataType, T.BooleanType):
            dtype = "boolean"
        else:
            dtype = "categorical"
        if (
            dtype != "time"
            and max_dimension_cardinality is not None
            and cardinality_map
            and cardinality_map.get(f.name, 0) > max_dimension_cardinality
        ):
            continue
        dims.append(Dimension(
            name=f.name,
            sql=f.name,
            type=dtype,
            granularity="day" if dtype == "time" else None,
        ))
        if dtype == "numeric":
            mets.append(Metric(name=f"sum_{f.name}", agg="sum", sql=f.name))
            mets.append(Metric(name=f"avg_{f.name}", agg="avg", sql=f.name))
    model = Model(
        name=table_name,
        table=table_name,
        primary_key=schema.fields[0].name if schema.fields else "id",
        dimensions=dims,
        metrics=mets,
    )
    return model, time_dim


_COMPARISON_OFFSETS = {
    "dod": "1 day",
    "wow": "7 day",
    "mom": "1 month",
    "qoq": "3 month",
    "yoy": "1 year",
}


class ExplorerEngine:
    """Query/transport engine behind the metrics explorer.

    Two modes (ref widget/_widget.py:131-145): pass a raw Spark
    DataFrame (auto-model) or a layer + metric/dimension refs.
    """

    def __init__(
        self,
        data: DataFrame | None = None,
        *,
        layer=None,
        metrics: list[str] | None = None,
        dimensions: list[str] | None = None,
        time_dimension: str | None = None,
        max_dimension_cardinality: int | None = None,
        top_n: int = 20,
    ) -> None:
        from sidemantic_spark.core.layer import SparkSemanticLayer

        self.top_n = top_n
        self.filters: dict[str, list] = {}
        self.date_range: list[str] = []
        self.comparison_mode = "wow"
        if layer is None:
            if data is None:
                raise ValueError("pass a Spark DataFrame or a layer")
            spark = data.sparkSession
            cardinality_map = None
            if max_dimension_cardinality is not None:
                from pyspark.sql import functions as F

                cardinality_map = {
                    f.name: row[0]
                    for f, row in zip(
                        data.schema.fields,
                        zip(*data.agg(*[
                            F.countDistinct(f.name) for f in data.schema.fields
                        ]).collect()),
                    )
                }
            model, detected_time = build_auto_model(
                data.schema,
                max_dimension_cardinality=max_dimension_cardinality,
                cardinality_map=cardinality_map,
            )
            data.createOrReplaceTempView(model.table)
            layer = SparkSemanticLayer(spark)
            layer.add_model(model)
            self.model_name = model.name
            metrics = metrics or [
                f"{model.name}.{m.name}" for m in model.metrics
            ]
            dimensions = dimensions or [
                f"{model.name}.{d.name}"
                for d in model.dimensions
                if d.type in ("categorical", "boolean")
            ]
            time_dimension = time_dimension or (
                f"{model.name}.{detected_time}" if detected_time else None
            )
        self.layer = layer
        self.metrics = list(metrics or [])
        self.dimensions = list(dimensions or [])
        self.time_dimension = time_dimension
        self.time_grain = "day"
        self.selected_metric = self.metrics[0] if self.metrics else ""

    # -- config payloads (Python -> JS) --------------------------------
    def metrics_config(self) -> list[dict]:
        out = []
        for ref in self.metrics:
            model_name, name = ref.split(".", 1)
            m = self.layer.graph.get_model(model_name).metric(name)
            out.append({
                "key": ref,
                "label": (m.label if m and m.label else name),
                "agg": (m.agg if m else None),
                "type": (m.type if m else None),
                "description": (m.description if m else None),
            })
        return out

    def dimensions_config(self) -> list[dict]:
        out = []
        for ref in self.dimensions:
            model_name, name = ref.split(".", 1)
            d = self.layer.graph.get_model(model_name).dimension(name)
            out.append({
                "key": ref,
                "label": (d.label if d and d.label else name),
                "type": (d.type if d else "categorical"),
            })
        return out

    def time_grain_options(self) -> list[str]:
        if not self.time_dimension:
            return []
        model_name, name = self.time_dimension.split(".", 1)
        d = self.layer.graph.get_model(model_name).dimension(name)
        base = d.granularity if d and d.granularity else "day"
        if base in _GRAIN_ORDER:
            return _GRAIN_ORDER[_GRAIN_ORDER.index(base):]
        return _GRAIN_ORDER[1:]

    # -- filter assembly (ref widget/_widget.py:538) -------------------
    def _build_filters(self, exclude_dimension: str | None = None) -> list[str]:
        out: list[str] = []
        for dim_key, values in self.filters.items():
            if not values or dim_key == exclude_dimension:
                continue
            lits = ", ".join(_sql_literal(v) for v in values)
            out.append(f"{dim_key} IN ({lits})")
        if self.date_range and self.time_dimension:
            start, end = self.date_range[0], self.date_range[-1]
            out.append(
                f"{self.time_dimension} >= {_time_literal(start)}"
            )
            out.append(
                f"{self.time_dimension} <= {_time_literal(end)}"
            )
        return out

    # -- data payloads --------------------------------------------------
    def metric_series_df(self) -> DataFrame | None:
        """All metrics per time bucket at the current grain."""
        if not self.time_dimension:
            return None
        return self.layer.query(
            metrics=self.metrics,
            dimensions=[f"{self.time_dimension}__{self.time_grain} AS __t"],
            filters=self._build_filters(),
            order_by=["__t"],
        )

    def dimension_breakdown_df(self, dim_key: str) -> DataFrame:
        """Per-value metric breakdown for one dimension, top-N by the
        selected metric; the dimension's own filter is excluded so its
        chart shows the unfiltered distribution (ref refresh logic)."""
        metric = self.selected_metric or self.metrics[0]
        out = metric.split(".", 1)[1] if "." in metric else metric
        return self.layer.query(
            metrics=self.metrics,
            dimensions=[dim_key],
            filters=self._build_filters(exclude_dimension=dim_key),
            order_by=[f"{out} desc"],
            limit=self.top_n,
        )

    def metric_totals(self) -> dict[str, dict[str, Any]]:
        """Grand totals for the current window plus the comparison
        window shifted one period back (wow/mom/yoy...)."""
        totals: dict[str, dict[str, Any]] = {}
        cur = self._totals_row(self._build_filters())
        prev = None
        if self.date_range and self.time_dimension:
            offset = _COMPARISON_OFFSETS.get(self.comparison_mode, "7 day")
            flt = [
                f
                for f in self._build_filters()
                if not f.startswith(self.time_dimension + " ")
            ]
            # the comparison window is the CURRENT range shifted back by
            # the offset — same length, so totals are comparable even
            # when the range length differs from the offset
            start, end = self.date_range[0], self.date_range[-1]
            flt.append(
                f"{self.time_dimension} >= {_time_literal(start)} - INTERVAL {offset}"
            )
            flt.append(
                f"{self.time_dimension} <= {_time_literal(end)} - INTERVAL {offset}"
            )
            prev = self._totals_row(flt)
        for ref in self.metrics:
            out = ref.split(".", 1)[1]
            current = cur.get(out) if cur else None
            previous = prev.get(out) if prev else None
            pct = None
            if current is not None and previous not in (None, 0):
                pct = (float(current) - float(previous)) / abs(float(previous))
            totals[ref] = {
                "current": current,
                "previous": previous,
                "pct_change": pct,
            }
        return totals

    def _totals_row(self, filters: list[str]) -> dict | None:
        rows = self.layer.query(metrics=self.metrics, filters=filters).collect()
        return rows[0].asDict() if rows else None

    def refresh_all(self, transport: str = "base64") -> dict:
        """One payload with everything the front-end renders."""
        b64 = transport == "base64"
        payload: dict[str, Any] = {"status": "ready", "error": ""}
        try:
            series = self.metric_series_df()
            payload["metric_series_data"] = (
                table_to_ipc(series.toArrow(), b64=b64) if series is not None else ""
            )
            payload["dimension_data"] = {
                dim: table_to_ipc(self.dimension_breakdown_df(dim).toArrow(), b64=b64)
                for dim in self.dimensions
            }
            payload["metric_totals"] = self.metric_totals()
        except Exception as exc:  # surface, don't crash the notebook
            payload["status"] = "error"
            payload["error"] = str(exc)
        return payload


def _sql_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    return "'" + str(value).replace("'", "''") + "'"


def _time_literal(value: str) -> str:
    v = str(value)
    if len(v) == 10:  # date-only
        return f"DATE '{v}'"
    return f"TIMESTAMP '{v.replace('T', ' ')}'"
