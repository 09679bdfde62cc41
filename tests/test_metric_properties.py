"""Property-based tests (hypothesis) for Metric agg auto-extraction
and the single-call guard — the parsing surface that decides whether
``sql="SUM(amount)"`` becomes (agg=sum, sql=amount) or stays an opaque
expression (reference core/metric.py:101-226)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sidemantic_spark.core.model import SIMPLE_AGGS as AGGS
from sidemantic_spark.core.model import Metric, _is_single_call

IDENT = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
EXTRACTABLE = sorted(a for a in AGGS if a not in ("count_distinct", "approx_count_distinct"))


@settings(max_examples=200, deadline=None)
@given(agg=st.sampled_from(EXTRACTABLE), col=IDENT, spaces=st.integers(0, 3))
def test_single_agg_call_extracts(agg, col, spaces):
    pad = " " * spaces
    m = Metric(name="m", sql=f"{pad}{agg.upper()}({pad}{col}{pad}){pad}")
    assert m.agg == agg
    assert m.sql == col


@settings(max_examples=200, deadline=None)
@given(col=IDENT)
def test_count_distinct_extracts(col):
    m = Metric(name="m", sql=f"COUNT(DISTINCT {col})")
    assert m.agg == "count_distinct"
    assert m.sql == col


@settings(max_examples=200, deadline=None)
@given(a=IDENT, b=IDENT, op=st.sampled_from(["/", "+", "-", "*"]))
def test_formula_sql_left_intact(a, b, op):
    sql = f"SUM({a}) {op} SUM({b})"
    m = Metric(name="m", sql=sql)
    # composite formulas must NOT be mis-extracted as a single agg
    assert m.agg is None
    assert m.sql == sql


@settings(max_examples=300, deadline=None)
@given(inner=IDENT, extra=st.sampled_from(["", " + 1", " / SUM(y)", " || 'x'"]))
def test_is_single_call_guard(inner, extra):
    sql = f"SUM({inner}){extra}"
    assert _is_single_call(sql) == (extra == "")


def test_nested_call_is_single():
    # nested parens inside ONE call are still a single call
    assert _is_single_call("SUM(COALESCE(a, 0))")
    assert not _is_single_call("SUM(a) / NULLIF(SUM(b), 0)")


def test_plain_column_not_extracted():
    m = Metric(name="m", agg="sum", sql="amount")
    assert m.agg == "sum" and m.sql == "amount"
