"""Dashboard documents (ref sidemantic/dashboard.py + tests/test_dashboard.py):
spec loading, validation against the graph, TS type generation, and the
Spark-native Vega-Lite HTML renderer."""

from __future__ import annotations

import json

import pytest

from sidemantic_spark.dashboard import (
    DASHBOARD_SCHEMA,
    DashboardDocument,
    DashboardSpecError,
    build_semantic_types_schema,
    generate_dashboard_typescript,
    load_dashboard,
    render_dashboard_html,
)
from sidemantic_spark.models.tpch import build_layer

SPEC = {
    "schema": DASHBOARD_SCHEMA,
    "title": "Revenue Overview",
    "tabs": [
        {
            "id": "overview",
            "label": "Overview",
            "charts": [
                {
                    "id": "rev-by-status",
                    "type": "bar",
                    "metrics": ["orders.revenue"],
                    "dimensions": ["orders.status"],
                },
                {
                    "id": "rev-by-month",
                    "type": "line",
                    "metrics": ["orders.revenue"],
                    "dimensions": ["orders.order_date__month"],
                },
            ],
        }
    ],
}


@pytest.fixture(scope="module")
def layer(spark, sf_dir):
    return build_layer(spark, sf_dir)


def test_from_dict_and_file_roundtrip(tmp_path):
    doc = DashboardDocument.from_dict(SPEC)
    assert doc.title == "Revenue Overview"
    assert len(doc.tabs) == 1
    p = tmp_path / "dash.json"
    p.write_text(json.dumps(SPEC))
    assert load_dashboard(p).to_dict() == SPEC
    y = tmp_path / "dash.yaml"
    import yaml

    y.write_text(yaml.safe_dump(SPEC))
    assert load_dashboard(y).to_dict() == SPEC
    with pytest.raises(DashboardSpecError):
        DashboardDocument.from_file(tmp_path / "missing.yaml")
    with pytest.raises(DashboardSpecError):
        DashboardDocument.from_dict(["not", "a", "mapping"])


def test_validate_clean_spec(layer):
    assert DashboardDocument.from_dict(SPEC).validate(layer) == []


def test_validate_catches_errors(layer):
    bad = {
        "schema": "wrong.v9",
        "title": "",
        "tabs": [
            {
                "id": "t1",
                "charts": [
                    {"id": "c1", "type": "pie", "metrics": ["orders.nope"]},
                    {"id": "c1", "metrics": ["orders.revenue"],
                     "renderer": "excel"},
                ],
            },
            {"id": "t1", "charts": [{"metrics": ["orders.revenue"]}]},
        ],
    }
    errors = DashboardDocument.from_dict(bad).validate(layer)
    joined = "\n".join(errors)
    assert "schema must be" in joined
    assert "title is required" in joined
    assert "type must be one of" in joined
    assert "unknown metric 'orders.nope'" in joined
    assert "renderer must be one of" in joined
    assert "duplicates 'c1'" in joined
    assert "duplicates 't1'" in joined
    assert "charts[0].id is required" in joined


def test_semantic_types_schema(layer):
    schema = build_semantic_types_schema(layer)
    assert "orders.revenue" in schema["metrics"]
    assert "orders.status" in schema["dimensions"]
    # time dimensions expand to grain fields
    assert "orders.order_date__month" in schema["dimensions"]
    assert schema["fieldTypes"]["orders.revenue"] == "number"
    assert schema["fieldTypes"]["orders.order_date"] == "date"


def test_generate_typescript(layer):
    ts = generate_dashboard_typescript(layer)
    assert "export const sidemanticSchema" in ts
    assert "export type SemanticField" in ts
    assert '"orders.revenue": number;' in ts


def test_render_html(layer):
    html = render_dashboard_html(layer, DashboardDocument.from_dict(SPEC))
    assert "<title>Revenue Overview</title>" in html
    assert "vegaEmbed('#view_overview_rev_by_status'" in html.replace("-", "_")
    # chart data is inlined (executed through the layer)
    assert '"values"' in html
    bad = DashboardDocument.from_dict({"title": "x", "tabs": []})
    with pytest.raises(DashboardSpecError):
        render_dashboard_html(layer, bad)


def test_chart_builder_fluent(spark):
    """layer.chart() fluent builder: chainable marks, where/select,
    brush params, lazy execution, vega-lite + html outputs, crossfilter
    handoff (reference viz.py:1903 ChartBuilder,
    core/semantic_layer.py:860)."""
    from sidemantic_spark.models.tpch import build_layer

    layer = build_layer(spark, None)
    cb = (layer.chart("orders.revenue", by="orders.status",
                      title="Revenue by Status")
          .bar()
          .where("orders.status != 'X'")
          .brush("x"))
    # lazy: no rows yet
    assert cb._rows is None
    spec = cb.to_vegalite()
    assert spec["mark"]["type"] == "bar"
    assert spec["title"] == "Revenue by Status"
    assert spec["params"][0]["select"]["type"] == "interval"
    assert spec["usermeta"]["sidemantic_spark"]["metrics"] == ["orders.revenue"]
    rows = spec["data"]["values"]
    assert rows and {"status", "revenue"} <= set(rows[0])
    assert "SELECT" in cb.sql
    html = cb.to_html()
    assert "vegaEmbed" in html and "Revenue by Status" in html

    # select() adds dimensions; line() over a time grain
    cb2 = (layer.chart(["orders.revenue", "orders.order_count"],
                       by="orders.order_date__month").line())
    spec2 = cb2.to_vegalite()
    assert spec2["mark"]["type"] == "line"
    assert any(t.get("fold") for t in spec2.get("transform", []))

    # crossfilter handoff inherits fields
    sess = (layer.chart("orders.revenue", by="orders.status")
            .crossfilter(interaction_preaggregations=False))
    out = sess.query()
    assert out["rows"] and "views" in out
    sess.close()


def test_chart_axis_format_from_metric_metadata(spark, sf_dir):
    """Metric format/value_format_name metadata reaches the Vega axis
    (reference viz.py applies number formats to quantitative
    encodings)."""
    from sidemantic_spark.charts import axis_format_for, chart_for_query, create_chart
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model

    spark.sql(
        "SELECT * FROM VALUES ('a', 10.0), ('b', 20.0) AS t(cat, amount)"
    ).createOrReplaceTempView("fmt_chart")
    layer = SparkSemanticLayer(spark)
    layer.add_model(Model(
        name="fmt_chart", table="fmt_chart", primary_key="cat",
        dimensions=[Dimension(name="cat")],
        metrics=[
            Metric(name="rev", agg="sum", sql="amount", value_format_name="usd"),
            Metric(name="share", agg="sum", sql="amount", format="0.0%"),
            Metric(name="plain", agg="sum", sql="amount"),
        ],
    ))
    spec = chart_for_query(layer, metrics=["fmt_chart.rev"], dimensions=["fmt_chart.cat"])
    assert spec["encoding"]["y"]["axis"]["format"] == "$,.2f"

    assert axis_format_for(layer.graph.get_model("fmt_chart").metric("share")) == ".1%"
    assert axis_format_for(layer.graph.get_model("fmt_chart").metric("plain")) is None

    # explicit y_format wins; folded multi-metric charts carry it too
    spec = create_chart(
        [{"cat": "a", "m1": 1.0, "m2": 2.0}], x="cat", y=["m1", "m2"],
        y_format=",.0f")
    assert spec["encoding"]["y"]["axis"]["format"] == ",.0f"


def test_chart_label_formatting_and_palette():
    """Reference tests/test_charts.py:16-39: label formatting (grain
    suffix parenthesized, model prefix dropped) and the semantic COLORS
    palette shape."""
    from sidemantic_spark.charts import COLORS, _format_label

    assert _format_label("order_count") == "Order Count"
    assert _format_label("total_revenue") == "Total Revenue"
    assert _format_label("created_at__month") == "Created At (Month)"
    assert _format_label("orders.revenue") == "Revenue"
    assert "primary" in COLORS
    assert "categorical" in COLORS
    assert len(COLORS["categorical"]) >= 8
    assert all(c.startswith("#") for c in COLORS["categorical"])


def test_chart_builder_renderer_outputs(spark, sf_dir):
    """Renderer-neutral outputs (reference viz.py to_plotly /
    to_observable_plot / to_d3 / to_renderer): every renderer returns a
    JSON-able spec over the SAME executed rows, and the dispatcher
    accepts aliases / rejects unknowns."""
    import json

    import pytest as _pytest

    from sidemantic_spark.charts import ChartError
    from sidemantic_spark.models.tpch import build_layer

    layer = build_layer(spark, sf_dir)
    b = layer.chart("orders.revenue", by="orders.status").bar()

    pl = b.to_plotly()
    assert pl["data"][0]["type"] == "bar"
    assert len(pl["data"][0]["x"]) == len(b.data())
    assert pl["layout"]["template"] == "plotly_white"
    assert pl["sidemantic_spark"]["metrics"] == ["orders.revenue"]

    ob = b.to_observable_plot()
    assert ob["renderer"] == "observable-plot"
    assert ob["marks"][0]["type"] == "barY"
    assert ob["marks"][0]["options"]["y"] == "revenue"

    d3 = b.to_d3()
    assert d3["renderer"] == "d3" and d3["fields"]["y"] == ["revenue"]

    # dispatcher + aliases; vega-lite output unchanged
    assert b.to_renderer("plotly")["data"][0]["type"] == "bar"
    assert b.to_renderer("vegalite") == b.to_vegalite()
    assert b.to_renderer("observable")["renderer"] == "observable-plot"
    with _pytest.raises(ChartError, match="unknown renderer"):
        b.to_renderer("matplotlib")

    # every spec is JSON-serializable (Decimal/date normalized)
    for spec in (pl, ob, d3):
        json.dumps(spec)

    # auto-mark: temporal x resolves to line
    line = layer.chart(
        "orders.revenue", by="orders.order_date__month"
    )
    assert line.to_plotly()["data"][0].get("mode") == "lines"


def test_chart_second_dimension_becomes_series_channel(spark, sf_dir):
    """r12 ref-parity (viz.py to_vegalite/_series_column/_group_rows/
    _observable_options): a SECOND grouping dimension drives the color
    series in every renderer — vega-lite color encoding (+ strokeDash
    when metrics are also folded), one plotly trace per series value
    with selection states, observable z/stroke channels + legend, d3
    fields.series — and the brush adds the conditional-opacity dim."""
    from sidemantic_spark.models.tpch import build_layer

    layer = build_layer(spark, sf_dir)
    b = layer.chart(
        "orders.revenue",
        by=["orders.order_date__month", "orders.status"],
    ).line()

    vl = b.to_vegalite()
    assert vl["encoding"]["color"]["field"] == "status"
    series_vals = {r.get("status") for r in b.data()}
    pl = b.to_plotly()
    assert len(pl["data"]) == len(series_vals)
    assert {t["name"] for t in pl["data"]} == {str(v) for v in series_vals}
    assert pl["data"][0]["unselected"]["marker"]["opacity"] < 1
    # single metric + series: default title names metric and x dim
    assert "Revenue" in pl["layout"]["title"]["text"]

    ob = b.to_observable_plot()
    assert ob["marks"][0]["options"]["z"] == "status"
    assert ob["options"]["color"]["legend"] is True
    assert b.to_d3()["fields"]["series"] == "status"

    # two metrics + series: vega-lite folds metrics into strokeDash
    # and keeps color for the series dimension
    b2 = layer.chart(
        ["orders.revenue", "orders.order_count"],
        by=["orders.order_date__month", "orders.status"],
    ).line()
    vl2 = b2.to_vegalite()
    assert vl2["encoding"]["color"]["field"] == "status"
    assert vl2["encoding"]["strokeDash"]["field"] == "series"
    pl2 = b2.to_plotly()
    assert len(pl2["data"]) == 2 * len(series_vals)
    assert any(" - " in t["name"] for t in pl2["data"])

    # brush: params + conditional opacity (ref selection dimming)
    vb = layer.chart(
        "orders.revenue", by="orders.order_date__month"
    ).line().brush().to_vegalite()
    assert vb["params"][0]["select"]["type"] == "interval"
    assert vb["encoding"]["opacity"]["condition"]["param"] == "brush"
    assert vb["encoding"]["opacity"]["value"] == 0.25


def test_chart_same_tail_metrics_render_distinct_traces(spark, sf_dir):
    """Review finding: two metrics sharing a tail (orders.revenue +
    l2.revenue) must resolve to the generator's deduped output names,
    not collapse into duplicate traces."""
    from sidemantic_spark.core.layer import SparkSemanticLayer
    from sidemantic_spark.core.model import Dimension, Metric, Model
    from sidemantic_spark.models.tpch import register_tables

    register_tables(spark, sf_dir)
    lyr = SparkSemanticLayer(spark)
    lyr.add_model(Model(
        name="c_orders", table="orders", primary_key="o_orderkey",
        dimensions=[Dimension(name="status", sql="o_orderstatus")],
        metrics=[Metric(name="revenue", agg="sum",
                        sql="CAST(o_totalprice AS DECIMAL(18,2))")],
    ))
    lyr.add_model(Model(
        name="c_line", table="lineitem", primary_key="l_orderkey",
        dimensions=[Dimension(name="status", sql="l_linestatus")],
        metrics=[Metric(name="revenue", agg="sum",
                        sql="CAST(l_extendedprice AS DECIMAL(18,2))")],
    ))
    b = lyr.chart(["c_orders.revenue", "c_line.revenue"],
                  by="c_orders.status").bar()
    dim_outs, met_outs = b._out_names()
    assert met_outs == ["revenue", "c_line_revenue"]
    pl = b.to_plotly()
    names = [t["name"] for t in pl["data"]]
    assert len(set(names)) == 2
    ys = [[v for v in t["y"]] for t in pl["data"]]
    assert ys[0] != ys[1]  # genuinely different series


def test_compiled_chart_plan_fields_encodings_fingerprint(layer):
    """ref viz.py:99 CompiledChartPlan — field lineage (roles, source
    model, metric agg), encodings, brush/select interaction plans,
    legacy payload, and a stable fingerprint."""
    c = (layer.chart("orders.revenue",
                     by=["orders.order_date__month", "orders.status"])
         .line().interactive().categories())
    plan = c.compiled_plan()

    fp1 = plan.field_plan()
    assert fp1["protocol"] == "sidemantic-field-plan-v1"
    by_alias = {f["alias"]: f for f in fp1["fields"]}
    x = by_alias["order_date__month"]
    assert x["kind"] == "dimension" and "x" in x["roles"]
    s = by_alias["status"]
    assert "series" in s["roles"] and "breakdown" in s["roles"]
    m = by_alias["revenue"]
    assert m["kind"] == "metric" and m["metric_agg"] == "sum"
    assert m["source_model"] == "orders" and "y" in m["roles"]
    assert fp1["aliases"]["revenue"] == "orders.revenue"
    assert fp1["encodings"]["x"]["alias"] == "order_date__month"
    assert [y["alias"] for y in fp1["encodings"]["y"]] == ["revenue"]
    assert fp1["encodings"]["series"]["alias"] == "status"

    ip = plan.interaction_plan()
    assert ip["protocol"] == "sidemantic-interaction-plan-v1"
    assert ip["brush"]["supported"] is True
    assert ip["brush"]["fields"][0]["alias"] == "order_date__month"
    assert ip["select"]["fields"][0]["alias"] == "status"
    legacy = plan.legacy_interactions()
    assert legacy["brush"]["fields"] == ["order_date__month"]
    assert legacy["select"]["fields"] == ["status"]

    # fingerprint: stable for the same definition, changes with fields
    again = (layer.chart("orders.revenue",
                         by=["orders.order_date__month", "orders.status"])
             .line().interactive().categories()).compiled_plan()
    assert again.fingerprint == plan.fingerprint
    other = layer.chart("orders.revenue",
                        by=["orders.status"]).compiled_plan()
    assert other.fingerprint != plan.fingerprint

    # a brush over a metric is compiled but flagged unsupported
    c2 = (layer.chart("orders.revenue", by=["orders.status"])
          .bar().brush(fields=["orders.revenue"]))
    ip2 = c2.compiled_plan().interaction_plan()
    assert ip2["brush"]["supported"] is False
    assert "dimension ranges" in ip2["brush"]["unsupported_reason"]

    # unknown interaction field names every valid candidate
    import pytest as _pytest

    from sidemantic_spark.charts import ChartError

    with _pytest.raises(ChartError, match="Unknown chart interaction"):
        (layer.chart("orders.revenue", by=["orders.status"])
         .brush(fields=["orders.nope"]).compiled_plan())


def test_brush_without_dimensions_unsupported(layer):
    """r11 review #6: a dimensionless chart's brush compiles to
    supported=False (all([]) must not be vacuously supported)."""
    plan = layer.chart("orders.revenue").interactive().compiled_plan()
    brush = plan.interaction_plan()["brush"]
    assert brush["supported"] is False
    assert brush["fields"] == []
    assert brush["unsupported_reason"]
