"""Multi-format auto-detecting directory loader (mirrors reference
``tests/core/test_directory_loaders.py``): a mixed project directory
loads every recognized semantic file through the right adapter with no
format flags."""

from __future__ import annotations

import json

import pytest

from sidemantic_spark.authoring import detect_yaml_format, load_from_directory
from sidemantic_spark.core.graph import SemanticGraph


class _BareLayer:
    def __init__(self) -> None:
        self.graph = SemanticGraph()

    def add_model(self, m):
        self.graph.add_model(m)

    def add_metric(self, m):
        self.graph.add_metric(m)

    def add_explore(self, e):
        self.graph.add_explore(e)

    def __enter__(self):
        from sidemantic_spark.core.registry import push

        push(self)
        return self

    def __exit__(self, *exc):
        from sidemantic_spark.core.registry import pop

        pop(self)
        return False


def test_detect_yaml_format_heuristics():
    assert detect_yaml_format("cubes:\n  - name: orders\n    sql_table: t\n") == "cube"
    assert detect_yaml_format(
        "semantic_models:\n  - name: orders\n    model: ref('o')\n"
    ) == "metricflow"
    assert detect_yaml_format(
        "type: metrics_view\nmodel: src\nmeasures: []\n"
    ) == "rill"
    assert detect_yaml_format(
        "tables:\n  - name: orders\n    base_table:\n      table: o\n"
    ) == "snowflake"
    assert detect_yaml_format("ldm:\n  datasets: []\n") == "gooddata"
    assert detect_yaml_format(
        "table_name: orders\nmetrics:\n  - metric_name: n\n"
    ) == "superset"
    assert detect_yaml_format(
        "object_type: dataset\nunique_name: orders\n"
    ) == "atscale"
    assert detect_yaml_format(
        "models:\n  - name: orders\n    table: t\n    primary_key: id\n"
    ) == "native"


def test_mixed_directory_loads_every_format(tmp_path):
    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "native.yml").write_text(
        "models:\n"
        "  - name: native_orders\n"
        "    table: orders\n"
        "    primary_key: id\n"
        "    dimensions:\n      - name: status\n"
        "    metrics:\n      - name: n\n        agg: count\n"
    )
    (proj / "cube_models.yml").write_text(
        "cubes:\n"
        "  - name: cube_sales\n"
        "    sql_table: sales\n"
        "    dimensions:\n      - name: region\n        sql: region\n"
        "        type: string\n"
        "    measures:\n      - name: total\n        sql: amount\n"
        "        type: sum\n"
    )
    (proj / "mf_models.yml").write_text(
        "semantic_models:\n"
        "  - name: mf_events\n"
        "    model: ref('events')\n"
        "    defaults: {agg_time_dimension: d}\n"
        "    entities:\n      - {name: id, type: primary}\n"
        "    dimensions:\n      - {name: d, type: time}\n"
        "    measures:\n      - {name: cnt, agg: count, expr: '1'}\n"
    )
    (proj / "rill_view.yaml").write_text(
        "type: metrics_view\nname: rill_kpis\nmodel: kpis\n"
        "timeseries: ts\n"
        "dimensions:\n  - {name: city, column: city}\n"
        "measures:\n  - {name: total, expression: SUM(v)}\n"
    )
    (proj / "defs.sql").write_text(
        "MODEL (name sql_orders, table orders, primary_key id);\n"
        "DIMENSION (model sql_orders, name status);\n"
        "METRIC (model sql_orders, name order_count, agg count);\n"
    )
    (proj / "yardstick.sql").write_text(
        "CREATE VIEW ys_orders AS SELECT status, SUM(amount) AS MEASURE"
        " total_amount FROM orders;"
    )
    (proj / "pydefs.py").write_text(
        "Model(name='py_orders', table='orders', primary_key='id',\n"
        "      metrics=[Metric(name='cnt', agg='count')])\n"
    )
    (proj / "interface.json").write_text(json.dumps({
        "osi": "1.0",
        "datasets": [{"name": "osi_orders", "source": "orders",
                      "fields": [{"name": "id"}]}],
    }))
    # generated artifacts must be skipped
    (proj / "target").mkdir()
    (proj / "target" / "manifest.yml").write_text("cubes: [broken")
    # random JSON is never guessed at
    (proj / "random.json").write_text('{"just": "data"}')

    layer = _BareLayer()
    load_from_directory(layer, str(proj))
    models = set(layer.graph.models)
    assert {"native_orders", "cube_sales", "mf_events", "rill_kpis",
            "sql_orders", "ys_orders", "py_orders"} <= models, models


def test_strict_mode_names_the_failing_file(tmp_path):
    proj = tmp_path / "bad"
    proj.mkdir()
    (proj / "broken.yml").write_text("models:\n  - name: [unclosed\n")
    with pytest.raises(Exception) as exc:
        load_from_directory(_BareLayer(), str(proj))
    assert "broken.yml" in str(exc.value)


def test_lenient_mode_warns_and_continues(tmp_path):
    proj = tmp_path / "mixedbad"
    proj.mkdir()
    (proj / "a_broken.yml").write_text("models:\n  - name: [unclosed\n")
    (proj / "good.yml").write_text(
        "models:\n  - name: ok\n    table: t\n    primary_key: id\n"
    )
    layer = _BareLayer()
    with pytest.warns(UserWarning):
        load_from_directory(layer, str(proj), strict=False)
    assert "ok" in layer.graph.models


def test_lookml_project_handed_whole_to_adapter(tmp_path):
    proj = tmp_path / "lkproj"
    (proj / "views").mkdir(parents=True)
    (proj / "views" / "orders.view.lkml").write_text(
        'view: orders {\n  sql_table_name: live.orders ;;\n'
        '  dimension: id { primary_key: yes }\n}\n'
    )
    (proj / "main.model.lkml").write_text('include: "/views/*.view"\n')
    layer = _BareLayer()
    load_from_directory(layer, str(proj))
    assert layer.graph.models["orders"].table == "live.orders"
