"""Crossfilter session semantics (reference viz.py CrossfilterSession /
CrossfilterPlanner): coordinated views, ignore-own-filter, the cached
rollup fast path vs the source fallback, and the HTTP endpoints."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from sidemantic_spark.crossfilter import (
    CrossfilterDashboard,
    CrossfilterError,
    CrossfilterSession,
)
from sidemantic_spark.models.tpch import build_layer


@pytest.fixture(scope="module")
def layer(spark, sf_dir):
    return build_layer(spark, sf_dir)


@pytest.fixture(scope="module")
def session(layer):
    s = CrossfilterSession(
        layer,
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.status", "orders.priority"],
    )
    yield s
    s.close()


def _by(rows, *keys):
    return {tuple(r[k] for k in keys): r for r in rows}


def test_rollup_fast_path_enabled(session):
    assert session.uses_rollup
    assert session.ensure_rollup() is not None


def test_unfiltered_matches_direct_query(session, layer):
    out = session.query()
    direct = layer.query(
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.status", "orders.priority"],
    ).collect()
    got = _by(out["rows"], "status", "priority")
    assert len(got) == len(direct)
    for r in direct:
        row = got[(r["status"], r["priority"])]
        assert row["revenue"] == r["revenue"]
        assert row["order_count"] == r["order_count"]
    assert out["used_interaction_preagg"] is True
    assert out["total_groups"] == len(direct)


def test_unknown_filter_field_rejected(session, layer):
    """Round-5 ADVICE hardening: a filter whose field is not a known
    dim/metric alias must raise, never be interpolated verbatim into
    the generated WHERE clause (SQL injection on the source-fallback
    path)."""
    for bad in (
        {"type": "dimension", "field": "1=1) OR (1=1", "values": ["x"]},
        {"type": "timeRange", "field": "status'; DROP TABLE t; --",
         "start": "1990-01-01"},
        {"type": "metricRange", "field": "not_a_metric", "min": 0},
    ):
        with pytest.raises(CrossfilterError, match="unknown"):
            session.query(filters=[bad])
    # the source-fallback path (no rollup) must reject too
    src = CrossfilterSession(
        layer,
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        interaction_preaggregations=False,
    )
    with pytest.raises(CrossfilterError, match="unknown"):
        src.query(filters=[
            {"type": "dimension", "field": "x) OR (1=1", "values": ["v"]}
        ])


def test_dimension_filter_and_kpis(session, layer):
    out = session.query([{"type": "dimension", "field": "status", "values": ["O"]}])
    assert all(r["status"] == "O" for r in out["rows"])
    # KPIs = grand totals under the same filters
    direct = layer.query(
        metrics=["orders.revenue", "orders.order_count"],
        filters=["orders.status = 'O'"],
    ).collect()[0]
    assert out["views"]["kpis"]["revenue"] == direct["revenue"]
    assert out["views"]["kpis"]["order_count"] == direct["order_count"]
    assert out["filter_expressions"] == ["orders.status IN ('O')"]


def test_bars_ignore_own_filter(session):
    """The bar for a dimension ignores that dimension's own filter
    (classic crossfilter: selecting a bar must not collapse its own
    chart) but applies the others'."""
    out = session.query(
        [{"type": "dimension", "field": "priority", "values": ["1-URGENT"]}]
    )
    bars = out["views"]["bars"]["priority"]
    # own filter ignored: every priority still present
    unfiltered = session.query()["views"]["bars"]["priority"]
    assert {r["priority"] for r in bars} == {r["priority"] for r in unfiltered}
    # ... but the current grid IS filtered
    assert all(r["priority"] == "1-URGENT" for r in out["rows"])


def test_trend_ignores_time_brush(session):
    out = session.query(
        [{"type": "timeRange", "field": "status", "start": "F", "end": "O"}]
    )
    # current respects the range (lexicographic on this categorical)
    assert {r["status"] for r in out["rows"]} <= {"F", "O"}
    # trend (grouped by x = status) ignores the x brush
    trend_status = {r["status"] for r in out["views"]["trend"]}
    assert "P" in trend_status


def test_metric_range_filters_grid_not_scatter(session):
    base = session.query()
    cut = max(r["revenue"] for r in base["rows"]) - 1
    out = session.query([{"type": "metricRange", "field": "revenue", "min": cut}])
    assert 0 < len(out["rows"]) < len(base["rows"])
    assert all(r["revenue"] >= cut for r in out["rows"])
    # scatter ignores the metric brush: full grid survives there
    assert len(out["views"]["scatter"]) == len(base["rows"])
    # KPIs ignore metric brushes (both execution paths agree on this)
    assert out["views"]["kpis"] == base["views"]["kpis"]


def test_metric_range_applies_before_row_cap(layer):
    """A metric-range brush must filter the grid BEFORE the row cap:
    matching groups past the cap must not silently vanish."""
    full = CrossfilterSession(
        layer,
        metrics=["orders.revenue"],
        dimensions=["orders.status", "orders.priority"],
    )
    capped = CrossfilterSession(
        layer,
        metrics=["orders.revenue"],
        dimensions=["orders.status", "orders.priority"],
        limit=1,
    )
    try:
        grid = full.query()["rows"]
        # choose a cut matching ONLY the metrically-largest group, which
        # sorts last by dims in this dataset with high likelihood — take
        # the max-revenue row explicitly
        top = max(grid, key=lambda r: r["revenue"])
        flt = [{"type": "metricRange", "field": "revenue", "min": top["revenue"]}]
        out = capped.query(flt)
        assert len(out["rows"]) == 1
        assert out["rows"][0]["revenue"] == top["revenue"]
        assert out["total_groups"] == len(
            [r for r in grid if r["revenue"] >= top["revenue"]]
        )
    finally:
        full.close()
        capped.close()


def test_rollup_matches_source_fallback(layer):
    """The cached-rollup re-aggregation path must produce exactly the
    source-query path's answers (additivity check end-to-end)."""
    filters = [
        {"type": "dimension", "field": "priority", "values": ["1-URGENT", "2-HIGH"]}
    ]
    fast = CrossfilterSession(
        layer,
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.status", "orders.priority"],
    )
    slow = CrossfilterSession(
        layer,
        metrics=["orders.revenue", "orders.order_count"],
        dimensions=["orders.status", "orders.priority"],
        interaction_preaggregations=False,
    )
    try:
        a, b = fast.query(filters), slow.query(filters)
        assert a["used_interaction_preagg"] and not b["used_interaction_preagg"]
        for view in ("rows",):
            assert _by(a[view], "status", "priority") == _by(b[view], "status", "priority")
        assert _by(a["views"]["trend"], "status") == _by(b["views"]["trend"], "status")
        assert a["views"]["kpis"] == b["views"]["kpis"]
        assert _by(a["views"]["bars"]["priority"], "priority") == _by(
            b["views"]["bars"]["priority"], "priority"
        )
    finally:
        fast.close()
        slow.close()


def test_non_additive_metric_uses_source_path(layer):
    s = CrossfilterSession(
        layer,
        metrics=["orders.customer_count"],  # count_distinct: not re-aggregable
        dimensions=["orders.status"],
    )
    try:
        assert not s.uses_rollup
        out = s.query([{"type": "dimension", "field": "status", "values": ["O"]}])
        direct = layer.query(
            metrics=["orders.customer_count"],
            dimensions=["orders.status"],
            filters=["orders.status = 'O'"],
        ).collect()
        assert _by(out["rows"], "status") == _by(
            [r.asDict() for r in direct], "status"
        )
    finally:
        s.close()


def test_spec_tab_html_and_validation(session, layer):
    spec = session.to_spec(query_endpoint="/crossfilter/query")
    assert spec["protocol"] == "sidemantic-crossfilter-v1"
    assert spec["fields"]["x"] == "status"
    assert spec["data"] and spec["vega_lite"]["mark"]
    html = session.to_html()
    assert "sidemantic-crossfilter-v1" in html or "Crossfilter" in html or "<table" in html
    with pytest.raises(CrossfilterError):
        CrossfilterSession(layer, metrics=[], dimensions=["orders.status"])
    with pytest.raises(CrossfilterError):
        session.query([{"type": "nope"}])


def test_time_range_on_temporal_rollup_column(layer):
    """A timeRange brush against a temporal x column filters the cached
    rollup with proper timestamp casts, and trend still ignores it."""
    s = CrossfilterSession(
        layer,
        metrics=["events.event_count"],
        dimensions=["events.ts__day AS day", "events.event_type"],
    )
    try:
        assert s.uses_rollup
        base = s.query()
        days = sorted({r["day"] for r in base["rows"]})
        assert len(days) > 3
        lo, hi = str(days[1]), str(days[2])
        out = s.query([{"type": "timeRange", "field": "day",
                        "start": lo, "end": hi}])
        got_days = {r["day"] for r in out["rows"]}
        assert got_days == {days[1], days[2]}
        # trend groups by x=day and ignores the x brush
        trend_days = {r["day"] for r in out["views"]["trend"]}
        assert trend_days == set(days)
        # counts under the brush match a direct filtered query
        direct = layer.query(
            metrics=["events.event_count"],
            dimensions=["events.ts__day AS day", "events.event_type"],
            filters=[f"events.ts >= '{lo}'", f"events.ts < '{hi}' + INTERVAL '1' DAY"],
        ).collect()
        assert sum(r["event_count"] for r in out["rows"]) == sum(
            r["event_count"] for r in direct
        )
    finally:
        s.close()


def test_crossfilter_denied_under_row_policies(layer, session):
    """Crossfilter sessions run without per-request user attributes, so
    a server requiring them must refuse the endpoints instead of
    serving unscoped data."""
    from sidemantic_spark.server.http_api import SemanticHttpServer

    dash = CrossfilterDashboard({"orders": session})
    srv = SemanticHttpServer(layer, require_user_attrs=True, crossfilter=dash).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        for path, method in (("/crossfilter/spec", "GET"),
                             ("/crossfilter", "GET"),
                             ("/crossfilter/query", "POST")):
            req = urllib.request.Request(
                base + path,
                data=b"{}" if method == "POST" else None,
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req)
                raise AssertionError(f"{path} should have been denied")
            except urllib.error.HTTPError as e:
                assert e.code == 403, (path, e.code)
    finally:
        srv.stop()


def test_dashboard_and_http_endpoints(layer, session):
    from sidemantic_spark.server.http_api import SemanticHttpServer

    dash = CrossfilterDashboard({"orders": session})
    srv = SemanticHttpServer(layer, crossfilter=dash).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        spec = json.loads(urllib.request.urlopen(base + "/crossfilter/spec").read())
        assert spec["tabs"][0]["id"] == "orders"
        req = urllib.request.Request(
            base + "/crossfilter/query",
            data=json.dumps({
                "tab": "orders",
                "filters": [
                    {"type": "dimension", "field": "status", "values": ["O"]}
                ],
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.loads(urllib.request.urlopen(req).read())
        assert out["used_interaction_preagg"] is True
        assert all(r["status"] == "O" for r in out["rows"])
        html = urllib.request.urlopen(base + "/crossfilter").read().decode()
        assert "cf-spec" in html
    finally:
        srv.stop()


def test_freshness_policy_resolution_and_watermark_probe(layer):
    """ref viz.py:410-438, :712-779, :2988-3131 — freshness policy
    resolves from the single source model (configured watermark,
    inferred conventional names, ambiguous multi-model reason), embeds
    in to_spec, and the watermark probe runs MAX() with the payload
    protocol."""
    from sidemantic_spark.core.governance import Freshness

    orders = layer.graph.get_model("orders")
    old = orders.freshness
    orders.freshness = Freshness(watermark="order_date", ttl_seconds=86400)
    try:
        s = CrossfilterSession(
            layer, metrics=["orders.revenue"], dimensions=["orders.status"],
        )
        pol = s.freshness_policy()
        assert pol["protocol"] == "sidemantic-freshness-policy-v1"
        assert pol["configured"] is True
        assert pol["source"] == "model_freshness"
        assert pol["watermark"] == "orders.order_date"
        assert pol["ttl_seconds"] == 86400
        assert "MAX(" in pol["source_watermark_sql"]
        spec = s.to_spec()
        assert spec["freshness_policy"]["configured"] is True

        wm = s.source_watermark_payload()
        assert wm["protocol"] == "sidemantic-source-watermark-v1"
        assert wm["status"] == "available" and wm["value"] is not None
        s.close()
    finally:
        orders.freshness = old

    # no policy, no conventional watermark dim -> not configured
    s2 = CrossfilterSession(
        layer, metrics=["orders.revenue"], dimensions=["orders.status"],
    )
    pol2 = s2.freshness_policy()
    # orders has a time dim but not a conventional ingestion name; the
    # session may infer nothing -> unconfigured with a reason
    assert pol2["protocol"] == "sidemantic-freshness-policy-v1"
    wm2 = s2.source_watermark_payload()
    assert wm2["status"] in ("not_configured", "available")
    s2.close()

    # multi-model chart -> ambiguous reason
    s3 = CrossfilterSession(
        layer, metrics=["orders.revenue"],
        dimensions=["customer.mktsegment"],
    )
    pol3 = s3.freshness_policy()
    assert pol3["source"] == "ambiguous_models"
    assert "multiple models" in pol3["reason"]
    s3.close()

    # session override wins
    s4 = CrossfilterSession(
        layer, metrics=["orders.revenue"], dimensions=["orders.status"],
        source_watermark_sql="SELECT TIMESTAMP '2026-01-01 00:00:00'",
        freshness_ttl_seconds=60,
    )
    pol4 = s4.freshness_policy()
    assert pol4["source"] == "chart_override" and pol4["ttl_seconds"] == 60
    wm4 = s4.source_watermark_payload()
    assert wm4["status"] == "available" and "2026-01-01" in str(wm4["value"])
    s4.close()


def test_inferred_watermark_from_conventional_dimension(spark):
    """A time dimension named `updated_at` (or tagged meta role) infers
    the watermark without an explicit policy (ref viz.py:3054)."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.sql(
        "CREATE OR REPLACE TEMP VIEW xf_events AS SELECT * FROM VALUES "
        "(1, 'a', TIMESTAMP '2026-03-01 10:00:00'), "
        "(2, 'b', TIMESTAMP '2026-03-02 11:00:00') "
        "AS t(id, kind, updated_at)"
    )
    lyr = SparkSemanticLayer(spark)
    lyr.add_model(Model(
        name="xf_events", table="xf_events", primary_key="id",
        dimensions=[
            Dimension(name="kind"),
            Dimension(name="updated_at", type="time"),
        ],
        metrics=[Metric(name="n", agg="count")],
    ))
    s = CrossfilterSession(
        lyr, metrics=["xf_events.n"], dimensions=["xf_events.kind"],
    )
    pol = s.freshness_policy()
    assert pol["source"] == "model_inferred_watermark"
    assert pol["watermark"] == "xf_events.updated_at"
    wm = s.source_watermark_payload()
    assert wm["status"] == "available"
    assert str(wm["value"]).startswith("2026-03-02")
    s.close()


def test_interaction_preagg_control_surface(layer):
    """ref viz.py:653-711 — ensure/diagnostics/toggle: the diagnostics
    payload carries build stats and the reused flag; disabling the
    toggle releases the rollup and routes queries to the source."""
    s = CrossfilterSession(
        layer, metrics=["orders.revenue"], dimensions=["orders.status"],
    )
    d1 = s.ensure_interaction_preaggregation()
    assert d1["enabled"] and d1["used"] and d1["reused"] is False
    assert d1["row_count"] > 0 and d1["build_ms"] > 0 and d1["built_at"]
    d2 = s.ensure_interaction_preaggregation()
    assert d2["reused"] is True
    assert s.interaction_preagg_diagnostics == d2

    s.set_interaction_preaggregations(False)
    assert not s.uses_rollup
    out = s.query()
    assert out["used_interaction_preagg"] is False
    d3 = s.ensure_interaction_preaggregation()
    assert d3["enabled"] is False and "not enabled" in d3["reason"]

    s.set_interaction_preaggregations(True)
    assert s.uses_rollup
    out2 = s.query()
    assert out2["used_interaction_preagg"] is True
    s.close()


def test_non_additive_session_preagg_reason(layer):
    """count_distinct metrics cannot ride the rollup; the diagnostics
    name the reason and the toggle cannot force it on."""
    s = CrossfilterSession(
        layer, metrics=["orders.customer_count"],
        dimensions=["orders.status"],
    )
    assert not s.uses_rollup
    d = s.ensure_interaction_preaggregation()
    assert d["enabled"] is False
    assert "additive" in d["reason"]
    s.set_interaction_preaggregations(True)
    assert not s.uses_rollup  # reagg-impossible stays off
    s.close()


def test_lazy_dashboard_spec_and_metadata(layer):
    """ref viz.py:551/:860/:884 — a lazy dashboard carries data only
    for the initial tab; other tabs expose per-tab spec endpoints;
    tab_spec(include_data=False) never runs the tab's query."""
    s1 = CrossfilterSession(
        layer, metrics=["orders.revenue"], dimensions=["orders.status"],
    )
    s2 = CrossfilterSession(
        layer, metrics=["orders.order_count"],
        dimensions=["orders.priority"],
    )
    dash = CrossfilterDashboard({"by_status": s1, "by_priority": s2})
    lazy = dash.to_lazy_spec()
    assert lazy["spec_endpoint"] == "/crossfilter/spec"
    by_id = {t["id"]: t for t in lazy["tabs"]}
    assert "spec" in by_id["by_status"]          # initial tab has data
    assert "spec" not in by_id["by_priority"]    # others are lazy
    assert by_id["by_priority"]["spec_endpoint"] == (
        "/crossfilter/spec?tab=by_priority"
    )
    assert by_id["by_priority"]["label"] == "By Priority"

    meta = dash.tab_spec("by_priority", include_data=False)
    assert meta["spec"]["data"] is None
    assert meta["spec"]["fields"]["metrics"] == ["order_count"]
    full = dash.tab_spec("by_priority")
    assert full["spec"]["data"]
    with pytest.raises(CrossfilterError, match="Expected one of"):
        dash.tab_spec("nope")
    with pytest.raises(CrossfilterError):
        dash.to_lazy_spec(initial_tab="nope")
    dash.close()


def test_ttl_only_override_keeps_model_watermark(layer):
    """r11 review #4: a ttl-only session override must keep the model's
    resolved watermark — the TTL is measured against it."""
    from sidemantic_spark.core.governance import Freshness

    orders = layer.graph.get_model("orders")
    old = orders.freshness
    orders.freshness = Freshness(watermark="order_date", ttl_seconds=86400)
    try:
        s = CrossfilterSession(
            layer, metrics=["orders.revenue"], dimensions=["orders.status"],
            freshness_ttl_seconds=60,
        )
        pol = s.freshness_policy()
        assert pol["ttl_seconds"] == 60
        assert pol["source"] == "chart_override"
        assert pol["watermark"] == "orders.order_date"
        assert pol["source_watermark_sql"]  # model watermark survives
        assert s.source_watermark_payload()["status"] == "available"
        s.close()
    finally:
        orders.freshness = old


def test_lazy_tab_http_endpoints(layer):
    """r11 review #1/#3: the URLs to_lazy_spec advertises are
    servable — /crossfilter/lazy, /crossfilter/spec?tab=X and the
    data=0 metadata shell, each carrying the query endpoint."""
    from sidemantic_spark.server.http_api import SemanticHttpServer

    s1 = CrossfilterSession(
        layer, metrics=["orders.revenue"], dimensions=["orders.status"],
    )
    s2 = CrossfilterSession(
        layer, metrics=["orders.order_count"],
        dimensions=["orders.priority"],
    )
    dash = CrossfilterDashboard({"t1": s1, "t2": s2})
    srv = SemanticHttpServer(layer, crossfilter=dash).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        lazy = json.loads(
            urllib.request.urlopen(base + "/crossfilter/lazy").read()
        )
        by_id = {t["id"]: t for t in lazy["tabs"]}
        assert "spec" in by_id["t1"] and "spec" not in by_id["t2"]
        assert by_id["t2"]["query_endpoint"] == "/crossfilter/query"
        # the advertised lazy endpoint resolves
        tab = json.loads(urllib.request.urlopen(
            base + by_id["t2"]["spec_endpoint"]
        ).read())
        assert tab["id"] == "t2" and tab["spec"]["data"]
        assert tab["query_endpoint"] == "/crossfilter/query"
        # metadata-only shell: no query runs, endpoint still present
        meta = json.loads(urllib.request.urlopen(
            base + "/crossfilter/spec?tab=t2&data=0"
        ).read())
        assert meta["spec"]["data"] is None
        assert meta["spec"]["query_endpoint"] == "/crossfilter/query"
        # unknown tab -> 404
        try:
            urllib.request.urlopen(base + "/crossfilter/spec?tab=nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
        dash.close()
