"""VIEW-generation DDL surface.

Mined from reference ``tests/queries/test_view_generation.py``: valid
CREATE VIEW text, injection-guarded view names, and views that execute
and join against arbitrary SQL — here executed on Spark's session
catalog via CREATE TEMPORARY VIEW.
"""

from __future__ import annotations

import pytest

from sidemantic_spark.models.tpch import build_layer


@pytest.fixture(scope="module")
def layer(spark, sf_dir):
    return build_layer(spark, sf_dir)


def test_generate_view_creates_valid_sql(layer):
    view_sql = layer.generator.generate_view(
        view_name="customer_metrics",
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
    )
    assert view_sql.startswith("CREATE VIEW customer_metrics AS\n")
    assert "SELECT" in view_sql and "FROM" in view_sql


@pytest.mark.parametrize("bad", ["my_view; DROP TABLE users--", "my view", "", "1abc", "a.b"])
def test_view_name_injection_rejected(layer, bad):
    with pytest.raises(ValueError, match="Invalid view name"):
        layer.generator.generate_view(
            view_name=bad, metrics=["orders.revenue"], dimensions=["orders.status"])


def test_view_executes_and_joins_on_spark(layer, spark, duck):
    layer.register_sources()
    view_sql = layer.generator.generate_view(
        view_name="revenue_by_status",
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        temporary=True,
    )
    assert view_sql.startswith("CREATE TEMPORARY VIEW revenue_by_status AS\n")
    spark.sql(view_sql)

    rows = spark.sql(
        "SELECT status, revenue FROM revenue_by_status ORDER BY status").collect()
    oracle = duck.execute(
        "SELECT o_orderstatus AS status, SUM(o_totalprice) AS revenue "
        "FROM orders GROUP BY 1 ORDER BY 1").fetchall()
    assert [(r["status"], float(r["revenue"])) for r in rows] == [
        (s, pytest.approx(float(v))) for s, v in oracle]

    # Views are first-class relations: join against arbitrary SQL
    joined = spark.sql(
        """
        SELECT v.status, v.revenue, x.tag
        FROM revenue_by_status v
        JOIN VALUES ('F', 'final'), ('O', 'open') AS x(status, tag)
          ON v.status = x.status
        ORDER BY v.status
        """
    ).collect()
    assert [r["tag"] for r in joined] == ["final", "open"]


def test_view_with_filter(layer, spark, duck):
    layer.register_sources()
    view_sql = layer.generator.generate_view(
        view_name="filtered_rev",
        metrics=["orders.revenue"],
        dimensions=["orders.status"],
        filters=["orders.status = 'F'"],
        temporary=True,
    )
    spark.sql(view_sql)
    rows = spark.sql("SELECT * FROM filtered_rev").collect()
    assert len(rows) == 1 and rows[0]["status"] == "F"
