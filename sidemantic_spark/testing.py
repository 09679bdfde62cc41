"""Golden-query test runner (reference ``sidemantic/testing.py:1-60``,
CLI ``sidemantic test`` ``cli.py:719``).

YAML testcases::

    tests:
      - name: revenue_by_status
        query:
          metrics: [orders.revenue]
          dimensions: [orders.status]
          order_by: [orders.status]
        expect:
          rows:
            - {status: F, revenue: 100.5}
          row_count: 3
          columns: [status, revenue]
          tolerance: 1e-6

``expect.value`` asserts a single-cell result. All comparisons run on
collected driver-side rows — golden suites are tiny by design; scale
testing belongs to the benchmark harness.
"""

from __future__ import annotations

import datetime
import decimal
from dataclasses import dataclass, field

import yaml


@dataclass
class TestResult:
    name: str
    passed: bool
    failures: list[str] = field(default_factory=list)


def run_golden_tests(layer, path_or_text: str) -> list[TestResult]:
    """Run every testcase; returns per-case results (no raising) so the
    caller can report all failures at once."""
    if "\n" in path_or_text or path_or_text.strip().startswith("tests:"):
        text = path_or_text
    else:
        with open(path_or_text) as fh:
            text = fh.read()
    doc = yaml.safe_load(text)
    cases = doc.get("tests") or []
    results: list[TestResult] = []
    for case in cases:
        results.append(_run_case(layer, case))
    return results


def _run_case(layer, case: dict) -> TestResult:
    name = case.get("name", "<unnamed>")
    expect = case.get("expect") or {}
    tol = float(expect.get("tolerance", 1e-9))
    failures: list[str] = []
    try:
        q = dict(case.get("query") or {})
        df = layer.query(**q)
        columns = list(df.columns)
        rows = [r.asDict() for r in df.collect()]
    except Exception as exc:
        if expect.get("error_contains"):
            token = expect["error_contains"]
            if token not in str(exc):
                failures.append(f"error {exc!r} does not contain {token!r}")
            return TestResult(name, not failures, failures)
        return TestResult(name, False, [f"query failed: {exc}"])

    if expect.get("error_contains"):
        failures.append("expected an error but query succeeded")
    if "row_count" in expect and len(rows) != expect["row_count"]:
        failures.append(f"row_count {len(rows)} != {expect['row_count']}")
    if "columns" in expect:
        # schema columns, not the first row's keys: a correct
        # zero-row result must still pass the columns check
        if sorted(columns) != sorted(expect["columns"]):
            failures.append(f"columns {columns} != {expect['columns']}")
    if "value" in expect:
        if not rows or len(rows[0]) == 0:
            failures.append("no value returned")
        else:
            got = next(iter(rows[0].values()))
            if not _value_eq(got, expect["value"], tol):
                failures.append(f"value {got!r} != {expect['value']!r}")
    if "rows" in expect:
        want = expect["rows"]
        if len(want) != len(rows):
            failures.append(f"{len(rows)} rows, expected {len(want)}")
        else:
            for i, (w, g) in enumerate(zip(want, rows)):
                for col, wv in w.items():
                    if col not in g:
                        failures.append(f"row {i}: missing column {col!r}")
                    elif not _value_eq(g[col], wv, tol):
                        failures.append(f"row {i} col {col}: {g[col]!r} != {wv!r}")
    return TestResult(name, not failures, failures)


def _value_eq(got, want, tol: float) -> bool:
    if isinstance(got, decimal.Decimal):
        got = float(got)
    if isinstance(got, (datetime.date, datetime.datetime)):
        got = str(got)
        want = str(want)
    if isinstance(got, float) or isinstance(want, float):
        try:
            return abs(float(got) - float(want)) <= tol * max(1.0, abs(float(want)))
        except (TypeError, ValueError):
            return False
    return got == want
