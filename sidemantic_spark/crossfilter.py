"""Crossfilter sessions: coordinated interactive views over one
semantic query.

Re-expression of the reference's crossfilter engine
(``viz.py`` ``CrossfilterSession`` / ``CrossfilterPlanner`` /
``InteractionPreaggCache``, ~5k LoC): a session wraps ONE semantic
query (metrics + dimensions); every interaction request carries a list
of filters and gets back a set of COORDINATED views computed under
crossfilter semantics — each view ignores the filter it itself renders
(``viz.py:1466-1489`` bars ignore ``category:<field>``, the trend
ignores the time brush ``xRange``, the scatter ignores
``metricRange``), so brushing one chart filters all the others but
never collapses itself.

Spark-first execution — the interaction pre-aggregation
(``viz.py:1107`` InteractionPreaggCache) maps onto a CACHED ROLLUP
DataFrame: the session runs the semantic query once at the chart's
full grain, persists the result (rollup-sized, not source-sized), and
answers every interaction by re-aggregating that rollup with
DataFrame groupBy/agg — sum/count re-add, min/max re-fold — so a brush
never rescans the 100 TB source. Sessions whose metrics are not
additive-decomposable (count_distinct, median, complex types) fall
back to per-interaction semantic queries against the source, exactly
like the reference's ``_unsupported_reason`` path.

Filter payload shapes (``viz.py`` DimensionEquals / TimeRange /
MetricRange):

    {"type": "dimension",   "field": <dim alias>, "values": [...]}
    {"type": "timeRange",   "field": <dim alias>, "start": s, "end": e}
    {"type": "metricRange", "field": <metric alias>, "min": a, "max": b}
"""

from __future__ import annotations

import datetime
import json
import re
import threading
import time
from typing import Any

from pyspark.sql import DataFrame, functions as F


class CrossfilterError(ValueError):
    pass


# reference viz.py to_spec: protocol marker consumed by JS clients
PROTOCOL = "sidemantic-crossfilter-v1"

# how a rollup metric column re-aggregates under coarser grouping
_REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

_AS_RE = re.compile(r"\s+AS\s+", re.IGNORECASE)


def _split_field(field: str) -> tuple[str, str]:
    """``model.dim__grain AS alias`` -> (ref, alias)."""
    parts = _AS_RE.split(field.strip(), maxsplit=1)
    ref = parts[0].strip()
    if len(parts) == 2:
        return ref, parts[1].strip()
    name = ref.split(".", 1)[1] if "." in ref else ref
    return ref, name


def _sql_quote(v: Any) -> str:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _norm_filter(f: dict[str, Any]) -> dict[str, Any]:
    if not isinstance(f, dict) or "type" not in f:
        raise CrossfilterError(f"invalid crossfilter filter: {f!r}")
    t = f["type"]
    if t in ("dimension", "category"):
        if not f.get("field") or "values" not in f:
            raise CrossfilterError("dimension filter needs field + values")
        return {"type": "dimension", "field": f["field"],
                "values": list(f["values"])}
    if t in ("timeRange", "xRange"):
        if not f.get("field"):
            raise CrossfilterError("timeRange filter needs field")
        return {"type": "timeRange", "field": f["field"],
                "start": f.get("start"), "end": f.get("end")}
    if t == "metricRange":
        if not f.get("field"):
            raise CrossfilterError("metricRange filter needs field")
        return {"type": "metricRange", "field": f["field"],
                "min": f.get("min"), "max": f.get("max")}
    raise CrossfilterError(f"unknown crossfilter filter type {t!r}")


def _ignore_key(f: dict[str, Any]) -> str:
    """The key a view passes to drop this filter (crossfilter
    ignore-own-filter semantics; reference viz.py ``ignore_key``)."""
    if f["type"] == "dimension":
        return f"category:{f['field']}"
    if f["type"] == "timeRange":
        return "xRange"
    return "metricRange"


# -- freshness / source watermark (ref viz.py:410-438, :712-779,
#    :2988-3131) ---------------------------------------------------------

_WATERMARK_PREFERRED_NAMES = [
    "_ingested_at", "ingested_at", "_loaded_at", "loaded_at",
    "_updated_at", "updated_at", "synced_at", "refreshed_at",
]
_WATERMARK_ROLES = {
    "freshness", "watermark", "source_watermark", "ingestion_time",
    "updated_at",
}


class ResolvedFreshnessPolicy:
    """Freshness policy resolved from session overrides or model
    metadata (ref viz.py:410 ``ResolvedFreshnessPolicy``)."""

    def __init__(self, *, source_watermark_sql=None, ttl_seconds=None,
                 source="none", source_model=None, watermark=None,
                 reason=None):
        self.source_watermark_sql = source_watermark_sql
        self.ttl_seconds = ttl_seconds
        self.source = source
        self.source_model = source_model
        self.watermark = watermark
        self.reason = reason

    @property
    def configured(self) -> bool:
        return bool(self.source_watermark_sql or self.ttl_seconds is not None)

    def to_dict(self) -> dict[str, Any]:
        return {
            "protocol": "sidemantic-freshness-policy-v1",
            "configured": self.configured,
            "source": self.source,
            "source_model": self.source_model,
            "watermark": self.watermark,
            "source_watermark_configured": bool(self.source_watermark_sql),
            "source_watermark_sql": self.source_watermark_sql,
            "ttl_seconds": self.ttl_seconds,
            "reason": self.reason,
        }


def _metadata_role(dim) -> str | None:
    for attr in ("meta", "metadata"):
        md = getattr(dim, attr, None)
        if isinstance(md, dict):
            role = md.get("role") or md.get("semantic_role")
            if role:
                return str(role).lower()
    return None


def _infer_model_watermark(model) -> str | None:
    """A time dimension tagged with a freshness-ish metadata role, else
    one of the conventional ingestion-timestamp names (ref
    viz.py:3054)."""
    dims = list(getattr(model, "dimensions", []) or [])
    for d in dims:
        if getattr(d, "type", None) == "time" and _metadata_role(d) in _WATERMARK_ROLES:
            return str(d.name)
    by_name = {
        str(d.name).lower(): d for d in dims
        if getattr(d, "type", None) == "time"
    }
    for name in _WATERMARK_PREFERRED_NAMES:
        if name in by_name:
            return str(by_name[name].name)
    return None


def _model_watermark_sql(model, watermark: str) -> str | None:
    # the ONE marker-query builder, shared with
    # SparkSemanticLayer.check_freshness (r11 review #7: two freshness
    # surfaces must not compute different markers for the same model)
    from sidemantic_spark.core.governance import freshness_marker_sql

    return freshness_marker_sql(model, watermark)


def _model_freshness_policy(layer, refs: list[str]) -> ResolvedFreshnessPolicy:
    """Resolve the freshness policy for a set of semantic refs — single
    source model only, ambiguous multi-model charts report why (ref
    viz.py:2988)."""
    models = sorted({
        r.split(".", 1)[0] for r in refs if "." in r
    })
    if not models:
        return ResolvedFreshnessPolicy(
            reason="semantic fields do not identify a source model"
        )
    if len(models) != 1:
        return ResolvedFreshnessPolicy(
            source="ambiguous_models",
            reason=(
                "chart references multiple models without a combined "
                "freshness policy: " + ", ".join(models)
            ),
        )
    name = models[0]
    try:
        model = layer.graph.get_model(name)
    except Exception as exc:
        return ResolvedFreshnessPolicy(
            source_model=name,
            reason=f"model freshness could not be resolved: {exc}",
        )
    fr = getattr(model, "freshness", None)
    if fr is not None:
        if fr.sql:
            return ResolvedFreshnessPolicy(
                source_watermark_sql=fr.sql, ttl_seconds=fr.ttl_seconds,
                source="model_freshness_sql", source_model=name,
                reason="model freshness sql",
            )
        if fr.watermark:
            wm = fr.watermark if "." in fr.watermark else f"{name}.{fr.watermark}"
            sql = _model_watermark_sql(model, fr.watermark)
            if sql:
                return ResolvedFreshnessPolicy(
                    source_watermark_sql=sql, ttl_seconds=fr.ttl_seconds,
                    source="model_freshness", source_model=name,
                    watermark=wm, reason="model freshness watermark",
                )
            return ResolvedFreshnessPolicy(
                ttl_seconds=fr.ttl_seconds, source="model_freshness",
                source_model=name, watermark=wm,
                reason="model freshness watermark could not be compiled",
            )
        return ResolvedFreshnessPolicy(
            ttl_seconds=fr.ttl_seconds, source="model_freshness",
            source_model=name,
            reason="model freshness ttl without source watermark",
        )
    inferred = _infer_model_watermark(model)
    if inferred:
        sql = _model_watermark_sql(model, inferred)
        if sql:
            return ResolvedFreshnessPolicy(
                source_watermark_sql=sql,
                source="model_inferred_watermark", source_model=name,
                watermark=f"{name}.{inferred}",
                reason=(
                    "inferred model freshness watermark from time "
                    "dimension metadata/name"
                ),
            )
    return ResolvedFreshnessPolicy(
        source_model=name, reason="model has no freshness policy"
    )


def _tab_label(tab_id: str) -> str:
    return tab_id.replace("_", " ").replace("-", " ").title()


def _json_compatible(value):
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat()
    if value is None or isinstance(value, (str, int, float, bool)):
        return value
    return str(value)


class CrossfilterSession:
    """One semantic query + its interaction rollup.

    ``dimensions`` order matters: the FIRST dimension is the x axis
    (the trend view groups by it; a ``timeRange`` brush is assumed to
    target it, matching the reference's single-x-axis charts).
    """

    def __init__(
        self,
        layer,
        metrics: list[str],
        dimensions: list[str],
        *,
        base_filters: list[str] | None = None,
        limit: int | None = None,
        table_limit: int = 75,
        interaction_preaggregations: bool = True,
        title: str | None = None,
        source_watermark_sql: str | None = None,
        freshness_ttl_seconds: int | None = None,
    ) -> None:
        if not metrics or not dimensions:
            raise CrossfilterError("crossfilter needs >=1 metric and >=1 dimension")
        self.layer = layer
        self.metrics = list(metrics)
        self.dimensions = list(dimensions)
        self.base_filters = list(base_filters or [])
        self.limit = limit
        self.table_limit = table_limit
        self.title = title or " / ".join(self.metric_aliases())
        self.interaction_preaggregations = interaction_preaggregations
        self._rollup: DataFrame | None = None
        self._rollup_lock = threading.Lock()
        self._reagg = self._metric_reagg_map()
        # freshness: resolve the model policy FIRST, then layer explicit
        # session overrides on top — a ttl-only override must not
        # discard the model's watermark the TTL is measured against
        # (ref viz.py:499-531 chart-level overrides; r11 review #4)
        refs = [_split_field(f)[0] for f in self.metrics + self.dimensions]
        policy = _model_freshness_policy(layer, refs)
        if source_watermark_sql:
            policy = ResolvedFreshnessPolicy(
                source_watermark_sql=source_watermark_sql,
                ttl_seconds=(
                    freshness_ttl_seconds
                    if freshness_ttl_seconds is not None
                    else policy.ttl_seconds
                ),
                source="chart_override",
                reason="session override",
            )
        elif freshness_ttl_seconds is not None:
            policy = ResolvedFreshnessPolicy(
                source_watermark_sql=policy.source_watermark_sql,
                ttl_seconds=freshness_ttl_seconds,
                source="chart_override",
                source_model=policy.source_model,
                watermark=policy.watermark,
                reason="session ttl override over model watermark",
            )
        self._freshness_policy = policy
        self.source_watermark_sql = self._freshness_policy.source_watermark_sql
        self.freshness_ttl_seconds = self._freshness_policy.ttl_seconds

    # -- field bookkeeping -------------------------------------------

    def dim_aliases(self) -> list[str]:
        return [_split_field(d)[1] for d in self.dimensions]

    def dim_refs(self) -> dict[str, str]:
        return {a: r for r, a in (_split_field(d) for d in self.dimensions)}

    def metric_aliases(self) -> list[str]:
        return [m.split(".", 1)[1] if "." in m else m for m in self.metrics]

    def _metric_reagg_map(self) -> dict[str, str] | None:
        """alias -> rollup re-aggregation, or None when any metric is
        not additive-decomposable (falls back to source queries)."""
        out: dict[str, str] = {}
        for ref, alias in zip(self.metrics, self.metric_aliases()):
            if "." not in ref:
                return None
            model_name, mname = ref.split(".", 1)
            model = self.layer.graph.models.get(model_name)
            metric = model.metric(mname) if model is not None else None
            if metric is None or not metric.is_simple:
                return None
            agg = metric.agg or "sum"
            if agg not in _REAGG or metric.fill_nulls_with is not None:
                return None
            out[alias] = _REAGG[agg]
        return out

    # -- interaction rollup ------------------------------------------

    @property
    def uses_rollup(self) -> bool:
        return self.interaction_preaggregations and self._reagg is not None

    def ensure_rollup(self) -> DataFrame | None:
        """Materialize + persist the full-grain rollup (the interaction
        pre-aggregation). Rollup-sized: |distinct dim combos| rows.
        Lock-guarded: concurrent first requests on a threaded server
        must not each persist their own copy (the loser's would leak in
        the block manager)."""
        if not self.uses_rollup:
            return None
        if self._rollup is None:
            with self._rollup_lock:
                if not self.uses_rollup:
                    # a concurrent set_interaction_preaggregations(False)
                    # won the lock between our gate check and here —
                    # building now would persist a rollup the disabled
                    # session never releases
                    return None
                if self._rollup is None:
                    t0 = time.perf_counter()
                    df = self.layer.query(
                        metrics=self.metrics,
                        dimensions=self.dimensions,
                        filters=self.base_filters or None,
                    ).persist()
                    n = df.count()  # materialize once, eagerly
                    self._rollup = df
                    self._rollup_diag = {
                        "row_count": n,
                        "build_ms": round(
                            (time.perf_counter() - t0) * 1000, 2
                        ),
                        "built_at": datetime.datetime.now(
                            datetime.timezone.utc
                        ).isoformat(),
                    }
        return self._rollup

    # -- interaction-preagg control surface (ref viz.py:653-711) ------

    def ensure_interaction_preaggregation(self) -> dict[str, Any]:
        """Build the rollup now and return its diagnostics payload
        (ref viz.py:653 ``ensure_interaction_preaggregation`` /
        ``InteractionPreaggTable.to_dict``)."""
        if not self.uses_rollup:
            reason = (
                "interaction preaggregations are not enabled for this "
                "session"
                if not self.interaction_preaggregations
                else "metrics are not additive-decomposable"
            )
            self._last_preagg_diag = {
                "enabled": False, "used": False, "reason": reason,
            }
            return self._last_preagg_diag
        reused = self._rollup is not None
        self.ensure_rollup()
        diag = dict(getattr(self, "_rollup_diag", {}) or {})
        self._last_preagg_diag = {
            "enabled": True,
            "used": True,
            "reused": reused,
            "model": sorted({
                _split_field(f)[0].split(".", 1)[0]
                for f in self.metrics + self.dimensions if "." in f
            }),
            "dimensions": self.dim_aliases(),
            "metrics": self.metric_aliases(),
            "source_watermark": self._freshness_policy.watermark,
            **diag,
        }
        return self._last_preagg_diag

    def set_interaction_preaggregations(self, enabled: bool) -> None:
        """Toggle the rollup fast path at runtime (ref viz.py:666);
        disabling releases the persisted rollup so the executor block
        manager drops its storage. The whole toggle runs under the
        rollup lock: a concurrent first build must not assign a
        persisted rollup AFTER the disable released it (r11 review #5
        — that leak would live until close())."""
        enabled = bool(enabled) and self._reagg is not None
        with self._rollup_lock:
            self.interaction_preaggregations = enabled
            if not enabled and self._rollup is not None:
                self._rollup.unpersist()
                self._rollup = None

    @property
    def interaction_preagg_diagnostics(self) -> dict[str, Any] | None:
        return getattr(self, "_last_preagg_diag", None)

    def close(self) -> None:
        if self._rollup is not None:
            self._rollup.unpersist()
            self._rollup = None

    # -- filters ------------------------------------------------------

    def _dim_ref(self, field: str) -> str:
        """Resolve a client-supplied filter field to the session's own
        dimension reference.  Unknown fields are REJECTED rather than
        interpolated verbatim: on the non-rollup fallback path these
        strings reach ``layer.query(filters=[...])`` as raw SQL, so a
        passthrough would let an HTTP client inject arbitrary WHERE
        clauses (round-5 ADVICE, crossfilter.py:210)."""
        refs = self.dim_refs()
        ref = refs.get(field)
        if ref is None:
            raise CrossfilterError(
                f"unknown crossfilter field {field!r}; expected one of "
                f"{sorted(refs)}"
            )
        return ref

    def _semantic_filters(self, filters: list[dict]) -> list[str]:
        """Pre-aggregation filters as semantic filter strings (source
        fallback path + the response's filter_expressions)."""
        out = []
        for f in filters:
            if f["type"] == "dimension":
                ref = self._dim_ref(f["field"])
                vals = ", ".join(_sql_quote(v) for v in f["values"])
                out.append(f"{ref} IN ({vals})")
            elif f["type"] == "timeRange":
                ref = self._dim_ref(f["field"])
                if f.get("start") is not None:
                    out.append(f"{ref} >= {_sql_quote(f['start'])}")
                if f.get("end") is not None:
                    out.append(f"{ref} <= {_sql_quote(f['end'])}")
        return out

    def _apply_pre_filters(self, df: DataFrame, filters: list[dict]) -> DataFrame:
        dtypes = dict(df.dtypes)
        for f in filters:
            if f["type"] == "dimension":
                df = df.where(F.col(f["field"]).isin(f["values"]))
            elif f["type"] == "timeRange":
                col = F.col(f["field"])
                is_time = dtypes.get(f["field"], "").startswith(
                    ("timestamp", "date")
                )
                for key, op in (("start", "__ge__"), ("end", "__le__")):
                    v = f.get(key)
                    if v is None:
                        continue
                    lit = F.to_timestamp(F.lit(v)) if is_time else F.lit(v)
                    if is_time and dtypes.get(f["field"], "") == "date":
                        lit = F.to_date(F.lit(v))
                    df = df.where(getattr(col, op)(lit))
        return df

    @staticmethod
    def _apply_metric_ranges(rows: list[dict], filters: list[dict]) -> list[dict]:
        """Metric-range brushes filter AGGREGATED values at the view's
        own grain — evaluated on the result rows (grid-level filter,
        reference MetricRange.to_expressions)."""
        for f in filters:
            if f["type"] != "metricRange":
                continue
            field, lo, hi = f["field"], f.get("min"), f.get("max")

            def keep(r, field=field, lo=lo, hi=hi):
                v = r.get(field)
                if v is None:
                    return False
                return (lo is None or v >= lo) and (hi is None or v <= hi)

            rows = [r for r in rows if keep(r)]
        return rows

    # -- views --------------------------------------------------------

    def _rollup_view(self, dims: list[str], filters: list[dict]) -> list[dict]:
        df = self._apply_pre_filters(self.ensure_rollup(), filters)
        all_dims = self.dim_aliases()
        if dims == all_dims:
            grid = df
        elif dims:
            grid = df.groupBy(*dims).agg(
                *[getattr(F, fn)(a).alias(a) for a, fn in self._reagg.items()]
            )
        else:
            grid = df.agg(
                *[getattr(F, fn)(a).alias(a) for a, fn in self._reagg.items()]
            )
        if dims:
            grid = grid.orderBy(*dims)
        return [r.asDict(recursive=True) for r in grid.collect()]

    def _source_view(self, dims: list[str], filters: list[dict]) -> list[dict]:
        dim_args = [
            d for d in self.dimensions if _split_field(d)[1] in dims
        ] or None
        sem = self.base_filters + self._semantic_filters(filters)
        df = self.layer.query(
            metrics=self.metrics,
            dimensions=dim_args,
            filters=sem or None,
            order_by=dims or None,
        )
        return [r.asDict(recursive=True) for r in df.collect()]

    def _view(self, dims, filters) -> list[dict]:
        """One view's FULL grid under the pre-aggregation filters
        (dimension/timeRange). Metric-range brushes and the row cap are
        applied by the caller — ranges must filter BEFORE the limit, or
        matching groups past the cap silently vanish."""
        pre = [f for f in filters if f["type"] != "metricRange"]
        if self.uses_rollup:
            return self._rollup_view(dims, pre)
        return self._source_view(dims, pre)

    def _cap(self, rows: list[dict]) -> list[dict]:
        return rows[: self.limit] if self.limit else rows

    # -- the coordinated query ---------------------------------------

    def query(self, filters: list[dict[str, Any]] | None = None) -> dict[str, Any]:
        """One interaction round: all coordinated views under
        crossfilter semantics. Filter dicts per the module docstring.
        Metric-range brushes filter each view's grid AT ITS OWN GRAIN
        before the row cap; KPIs ignore metric brushes (a grand total
        filtered by a grid-grain range is not meaningful, and keeping
        them range-free makes the rollup and source paths agree)."""
        t0 = time.perf_counter()
        timings: dict[str, float] = {}

        def mark(name: str) -> None:
            timings[name] = round((time.perf_counter() - t0) * 1000, 2)

        sel = [_norm_filter(f) for f in (filters or [])]
        metric_aliases = set(self.metric_aliases())
        for f in sel:
            if f["type"] in ("dimension", "timeRange"):
                self._dim_ref(f["field"])  # raises on unknown fields
            elif f["field"] not in metric_aliases:
                raise CrossfilterError(
                    f"unknown metricRange field {f['field']!r}; expected "
                    f"one of {sorted(metric_aliases)}"
                )
        ranges = [f for f in sel if f["type"] == "metricRange"]

        def minus(ignore: str) -> list[dict]:
            return [f for f in sel if _ignore_key(f) != ignore]

        all_dims = self.dim_aliases()
        x = all_dims[0]

        grid = self._view(all_dims, sel)
        matched = self._apply_metric_ranges(grid, ranges)
        current = self._cap(matched)
        mark("current")
        trend = self._cap(
            self._apply_metric_ranges(self._view([x], minus("xRange")), ranges)
        )
        mark("trend")
        # the scatter ignores the metric brush: the unranged grid
        scatter = self._cap(grid) if ranges else current
        mark("scatter")
        # KPI grand totals (metric brushes ignored): with additive
        # metrics the full grid re-aggregates in-process — derive,
        # don't rescan (reference viz.py:1440)
        if self.uses_rollup:
            kpis = self._derive_kpis(grid)
        else:
            rows = self._view([], sel)
            kpis = rows[0] if rows else {}
        mark("kpis")
        bars: dict[str, list[dict]] = {}
        for field in all_dims[1:] or all_dims[:1]:
            bars[field] = self._cap(
                self._apply_metric_ranges(
                    self._view([field], minus(f"category:{field}")), ranges
                )
            )
        mark("bars")
        return {
            "protocol": PROTOCOL,
            "rows": current,
            "total_groups": len(matched),
            "filter_expressions": self._semantic_filters(sel),
            "views": {
                "trend": trend,
                "scatter": scatter,
                "table": current[: self.table_limit],
                "kpis": kpis,
                "bars": bars,
            },
            "used_interaction_preagg": self.uses_rollup,
            "timings_ms": timings,
            "updated_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }

    def _derive_kpis(self, rows: list[dict]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for alias, fn in (self._reagg or {}).items():
            vals = [r[alias] for r in rows if r.get(alias) is not None]
            if not vals:
                out[alias] = None
            elif fn == "sum":
                out[alias] = sum(vals)
            elif fn == "min":
                out[alias] = min(vals)
            else:
                out[alias] = max(vals)
        return out

    def handle_request(self, payload: dict[str, Any]) -> dict[str, Any]:
        return self.query(payload.get("filters"))

    # -- client spec / HTML ------------------------------------------

    def freshness_policy(self) -> dict[str, Any]:
        """The resolved freshness policy payload (ref viz.py:712)."""
        return self._freshness_policy.to_dict()

    def source_watermark_payload(
        self, *, checked_at: str | None = None
    ) -> dict[str, Any]:
        """Run the source-watermark probe and wrap it in the
        reference's payload protocol (ref viz.py:715-779). On Spark the
        MAX(watermark) over a parquet source answers from footer
        statistics — the probe never scans the 100 TB table."""
        checked_at = checked_at or datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat()
        base = {
            "protocol": "sidemantic-source-watermark-v1",
            "checked_at": checked_at,
            "source": self._freshness_policy.source,
            "watermark": self._freshness_policy.watermark,
        }
        if not self.source_watermark_sql:
            return {
                **base, "configured": False, "status": "not_configured",
                "sql": None, "value": None,
                "reason": self._freshness_policy.reason,
            }
        try:
            self.layer.register_sources()
            rows = self.layer.spark.sql(self.source_watermark_sql).collect()
            value = _json_compatible(rows[0][0]) if rows else None
            if not rows:
                return {
                    **base, "configured": True, "status": "unavailable",
                    "sql": self.source_watermark_sql, "value": None,
                    "error": "query returned no rows",
                }
            if value is None:
                return {
                    **base, "configured": True, "status": "unavailable",
                    "sql": self.source_watermark_sql, "value": None,
                    "error": "query returned NULL",
                }
        except Exception as exc:
            return {
                **base, "configured": True, "status": "unavailable",
                "sql": self.source_watermark_sql, "value": None,
                "error": str(exc),
            }
        return {
            **base, "configured": True, "status": "available",
            "sql": self.source_watermark_sql, "value": value,
        }

    def to_spec(
        self,
        *,
        query_endpoint: str | None = None,
        include_data: bool = True,
    ) -> dict[str, Any]:
        """The session spec; ``include_data=False`` skips the initial
        Spark query (one payload shape for both — r11 review #8)."""
        from sidemantic_spark.charts import create_chart

        initial = (
            self._cap(self._view(self.dim_aliases(), []))
            if include_data else None
        )
        spec: dict[str, Any] = {
            "protocol": PROTOCOL,
            "title": self.title,
            "fields": {
                "x": self.dim_aliases()[0],
                "dimensions": self.dim_aliases(),
                "metrics": self.metric_aliases(),
            },
            "interaction_preaggregations": self.uses_rollup,
            "table_limit": self.table_limit,
            "freshness_policy": self.freshness_policy(),
            "data": initial,
        }
        if initial:
            spec["vega_lite"] = create_chart(initial)
        if query_endpoint:
            spec["query_endpoint"] = query_endpoint
        return spec

    def to_metadata_spec(
        self, *, query_endpoint: str | None = None
    ) -> dict[str, Any]:
        """The spec WITHOUT data — no Spark query runs (ref viz.py:551
        ``to_metadata_spec``): clients bootstrap the shell and fetch
        data through the query endpoint on first focus."""
        return self.to_spec(
            query_endpoint=query_endpoint, include_data=False
        )

    def to_tab(
        self,
        tab_id: str,
        *,
        label: str | None = None,
        query_endpoint: str | None = "/crossfilter/query",
    ) -> dict[str, Any]:
        return {
            "id": tab_id,
            "label": label or _tab_label(tab_id),
            "spec": self.to_spec(query_endpoint=query_endpoint),
            "query_endpoint": query_endpoint,
        }

    def to_html(self, *, title: str | None = None) -> str:
        return crossfilter_html(title or self.title, [self.to_tab("default")])


class CrossfilterDashboard:
    """Named sessions served as tabs (reference CrossfilterDashboard)."""

    def __init__(self, sessions: dict[str, CrossfilterSession]) -> None:
        if not sessions:
            raise CrossfilterError("dashboard needs >=1 session")
        self.sessions = dict(sessions)

    def to_spec(self) -> dict[str, Any]:
        return {
            "protocol": PROTOCOL,
            "tabs": [s.to_tab(tab_id) for tab_id, s in self.sessions.items()],
        }

    def tab_spec(
        self,
        tab_id: str,
        *,
        include_data: bool = True,
        query_endpoint: str | None = "/crossfilter/query",
    ) -> dict[str, Any]:
        """Fully materialized spec for ONE tab (ref viz.py:860): the
        lazy-dashboard endpoint body. Carries the query endpoint so a
        metadata-only shell knows where to fetch data (r11 review #3)."""
        session = self.sessions.get(tab_id)
        if session is None:
            expected = ", ".join(self.sessions)
            raise CrossfilterError(
                f"Unknown crossfilter tab {tab_id!r}. Expected one of: "
                f"{expected}"
            )
        spec = session.to_spec(
            query_endpoint=query_endpoint, include_data=include_data
        )
        out = {"id": tab_id, "label": _tab_label(tab_id), "spec": spec}
        if query_endpoint:
            out["query_endpoint"] = query_endpoint
        return out

    def to_lazy_spec(
        self,
        *,
        initial_tab: str | None = None,
        spec_endpoint: str = "/crossfilter/spec",
        query_endpoint: str | None = "/crossfilter/query",
    ) -> dict[str, Any]:
        """Tab metadata plus ONLY the initial tab's data (ref
        viz.py:884 ``to_lazy_spec``): a hosted dashboard shell loads
        without running every tab's initial Spark query — at 100 TB a
        ten-tab dashboard boots on one query instead of ten."""
        from urllib.parse import quote

        initial = initial_tab or next(iter(self.sessions))
        if initial not in self.sessions:
            raise CrossfilterError(f"unknown crossfilter tab {initial!r}")
        tabs: list[dict[str, Any]] = []
        for tab_id, session in self.sessions.items():
            payload: dict[str, Any] = {
                "id": tab_id,
                "label": _tab_label(tab_id),
                "spec_endpoint": (
                    f"{spec_endpoint}?tab={quote(tab_id, safe='')}"
                ),
            }
            if query_endpoint:
                payload["query_endpoint"] = query_endpoint
            if tab_id == initial:
                payload["spec"] = session.to_spec(
                    query_endpoint=query_endpoint
                )
            tabs.append(payload)
        return {
            "protocol": PROTOCOL,
            "spec_endpoint": spec_endpoint,
            "tabs": tabs,
        }

    def handle_request(self, payload: dict[str, Any]) -> dict[str, Any]:
        tab = payload.get("tab") or next(iter(self.sessions))
        session = self.sessions.get(tab)
        if session is None:
            raise CrossfilterError(f"unknown crossfilter tab {tab!r}")
        return session.handle_request(payload)

    def to_html(self, *, title: str = "Crossfilter") -> str:
        return crossfilter_html(
            title, [s.to_tab(tab_id) for tab_id, s in self.sessions.items()]
        )

    def close(self) -> None:
        for s in self.sessions.values():
            s.close()


def crossfilter_html(title: str, tabs: list[dict[str, Any]]) -> str:
    """Standalone HTML shell: tab bar + per-view tables + Vega-Embed
    chart (CDN; the tables work offline), POSTing filter interactions
    to the tab's query_endpoint when one is configured."""
    payload = json.dumps({"title": title, "tabs": tabs}, default=str)
    return (
        "<!doctype html>\n<html><head><meta charset=\"utf-8\"><title>"
        + title.replace("<", "&lt;")
        + "</title>\n<style>body{font:14px system-ui;margin:16px}"
        ".tabbar button{margin-right:6px}.kpi{display:inline-block;margin:8px;"
        "padding:8px 14px;border:1px solid #ddd;border-radius:6px}"
        "table{border-collapse:collapse}td,th{border:1px solid #ddd;"
        "padding:2px 8px}</style>\n"
        "<script src=\"https://cdn.jsdelivr.net/npm/vega@5\"></script>\n"
        "<script src=\"https://cdn.jsdelivr.net/npm/vega-lite@5\"></script>\n"
        "<script src=\"https://cdn.jsdelivr.net/npm/vega-embed@6\"></script>\n"
        "</head><body>\n<h1>" + title.replace("<", "&lt;") + "</h1>\n"
        "<div class=\"tabbar\" id=\"tabs\"></div><div id=\"kpis\"></div>"
        "<div id=\"chart\"></div><div id=\"table\"></div>\n"
        "<script id=\"cf-spec\" type=\"application/json\">" + payload
        + "</script>\n<script>\n"
        "const CF = JSON.parse(document.getElementById('cf-spec').textContent);\n"
        "let active = 0;\n"
        "function renderTab(i){\n"
        "  active = i; const tab = CF.tabs[i]; const spec = tab.spec;\n"
        "  document.getElementById('tabs').innerHTML = CF.tabs.map((t,j)=>\n"
        "    `<button onclick=\\\"renderTab(${j})\\\" ${j===i?'disabled':''}>${t.label}</button>`).join('');\n"
        "  if (spec.vega_lite && window.vegaEmbed)\n"
        "    vegaEmbed('#chart', Object.assign({}, spec.vega_lite, {data:{values: spec.data}}));\n"
        "  const rows = spec.data || [];\n"
        "  const cols = rows.length ? Object.keys(rows[0]) : [];\n"
        "  document.getElementById('table').innerHTML = '<table><tr>' +\n"
        "    cols.map(c=>`<th>${c}</th>`).join('') + '</tr>' +\n"
        "    rows.slice(0, spec.table_limit||75).map(r=>'<tr>'+cols.map(c=>`<td>${r[c]}</td>`).join('')+'</tr>').join('') + '</table>';\n"
        "}\n"
        "async function applyFilters(filters){\n"
        "  const tab = CF.tabs[active];\n"
        "  if (!tab.query_endpoint) return;\n"
        "  const res = await fetch(tab.query_endpoint, {method:'POST',\n"
        "    headers:{'Content-Type':'application/json'},\n"
        "    body: JSON.stringify({tab: tab.id, filters})});\n"
        "  const out = await res.json();\n"
        "  tab.spec.data = out.rows; renderTab(active);\n"
        "  document.getElementById('kpis').innerHTML = Object.entries(out.views.kpis||{})\n"
        "    .map(([k,v])=>`<span class=\\\"kpi\\\"><b>${k}</b> ${v}</span>`).join('');\n"
        "}\n"
        "renderTab(0);\n"
        "</script></body></html>\n"
    )
