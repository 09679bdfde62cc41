"""Parameter / ParameterSet surface — mirrors the reference's
``tests/templates/test_parameters.py`` (round-9 mining). Typed literal
formatting is the injection barrier; ParameterSet adds the
get/format/interpolate convenience surface over declared params."""

from __future__ import annotations

import pytest

from sidemantic_spark.core.model import Parameter, ParameterSet


def test_parameter_string_type():
    p = Parameter(name="region", type="string", default_value="US")
    assert p.format_value("EMEA") == "'EMEA'"
    assert p.format_value("O'Brien") == "'O''Brien'"


def test_parameter_number_type():
    p = Parameter(name="min_amount", type="number", default_value=0)
    assert p.format_value(100) == "100"
    assert p.format_value(99.5) == "99.5"
    with pytest.raises(ValueError):
        p.format_value("1; DROP TABLE x")


def test_parameter_date_type():
    import datetime

    p = Parameter(name="start", type="date")
    assert p.format_value("2024-01-15") == "'2024-01-15'"
    assert p.format_value(datetime.date(2024, 1, 15)) == "'2024-01-15'"
    with pytest.raises(ValueError):
        p.format_value("not-a-date")


def test_parameter_unquoted_type():
    p = Parameter(name="table_name", type="unquoted", default_value="orders")
    assert p.format_value("customers") == "customers"
    assert p.format_value("s.orders") == "s.orders"
    with pytest.raises(ValueError):
        p.format_value("orders; DROP")


def test_parameter_yesno_type():
    p = Parameter(name="include_tax", type="yesno", default_value=False)
    assert p.format_value(True) == "TRUE"
    assert p.format_value(False) == "FALSE"


def test_parameter_default_value():
    p = Parameter(name="region", type="string", default_value="US")
    assert p.format_value(None) == "'US'"


def test_parameter_allowed_values():
    p = Parameter(
        name="status", type="string", default_value="pending",
        allowed_values=["pending", "completed", "cancelled"],
    )
    assert p.allowed_values == ["pending", "completed", "cancelled"]
    assert p.format_value("completed") == "'completed'"
    with pytest.raises(ValueError):
        p.format_value("hacked")


@pytest.fixture
def params():
    return {
        "status": Parameter(name="status", type="string",
                            default_value="pending"),
        "min_amount": Parameter(name="min_amount", type="number",
                                default_value=0),
    }


def test_parameter_set_get(params):
    ps = ParameterSet(params, {"status": "completed", "min_amount": 100})
    assert ps.get("status") == "completed"
    assert ps.get("min_amount") == 100


def test_parameter_set_defaults(params):
    ps = ParameterSet(params, {})
    assert ps.get("status") == "pending"
    assert ps.get("min_amount") == 0


def test_parameter_set_format(params):
    ps = ParameterSet(params, {"status": "completed", "min_amount": 100})
    assert ps.format("status") == "'completed'"
    assert ps.format("min_amount") == "100"


def test_parameter_set_interpolate(params):
    ps = ParameterSet(params, {"status": "completed", "min_amount": 100})
    sql = ("SELECT * FROM orders WHERE status = {{ status }} "
           "AND amount >= {{ min_amount }}")
    assert ps.interpolate(sql) == (
        "SELECT * FROM orders WHERE status = 'completed' AND amount >= 100"
    )


def test_parameter_set_interpolate_with_spaces(params):
    ps = ParameterSet(params, {"status": "completed"})
    assert ps.interpolate("{{ status }}") == "'completed'"
    assert ps.interpolate("{{status}}") == "'completed'"
    assert ps.interpolate("{{  status  }}") == "'completed'"


def test_parameter_set_interpolate_unknown_param(params):
    ps = ParameterSet(params, {"status": "completed"})
    sql = ("SELECT * FROM orders WHERE status = {{ status }} "
           "AND region = {{ region }}")
    assert ps.interpolate(sql) == (
        "SELECT * FROM orders WHERE status = 'completed' "
        "AND region = {{ region }}"
    )


def test_parameter_set_interpolation_blocks_injection(params):
    """A string value interpolates as ONE quoted literal even when it
    carries quote characters (ref test_parameter_interpolation_with_
    sql_injection)."""
    ps = ParameterSet(params, {"status": "x' OR '1'='1"})
    out = ps.interpolate("WHERE status = {{ status }}")
    assert out == "WHERE status = 'x'' OR ''1''=''1'"


def test_semantic_graph_parameters():
    from sidemantic_spark.core.graph import SemanticGraph

    g = SemanticGraph()
    g.add_parameter(Parameter(name="p1", type="string", default_value="a"))
    assert "p1" in g.parameters
    with pytest.raises(Exception):
        g.add_parameter(Parameter(name="p1", type="string"))
