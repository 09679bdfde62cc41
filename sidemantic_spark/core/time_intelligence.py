"""Standalone time-intelligence helpers.

Mirrors the reference's public helper module (sidemantic
``core/time_intelligence.py:19`` ``TimeComparison``, ``:86``
``TrailingPeriod``, ``:101`` ``generate_time_comparison_sql``; exercised
by reference ``tests/dates/test_time_intelligence.py`` and
``tests/core/test_time_intelligence_module.py``) re-expressed as plain
dataclasses. The generated expressions are standard SQL that Spark SQL
executes directly (LAG window + NULLIF guard), so they can be dropped
into a ``spark.sql`` projection or a metric ``sql:`` field unchanged.

Note this is the *helper* surface only — the engine's full
time-comparison metrics (calendar-exact offsets on sparse series) live
in ``sql/generator.py``; this module is the lightweight expression
builder the reference also exposes for ad-hoc use.
"""

from __future__ import annotations

from dataclasses import dataclass

TIME_COMPARISON_TYPES = ("yoy", "mom", "wow", "dod", "qoq", "prior_period")
TIME_OFFSET_UNITS = ("day", "week", "month", "quarter", "year")
CALCULATION_TYPES = ("difference", "percent_change", "ratio")

_DEFAULT_OFFSETS = {
    "dod": (1, "day"),
    "wow": (1, "week"),
    "mom": (1, "month"),
    "qoq": (1, "quarter"),
    "yoy": (1, "year"),
    "prior_period": (1, "day"),
}


@dataclass
class TimeComparison:
    """Time-comparison configuration for a metric.

    Examples::

        TimeComparison(type="yoy", metric="revenue")
        TimeComparison(type="prior_period", metric="orders",
                       offset=7, offset_unit="day")
    """

    type: str
    metric: str
    offset: int | None = None
    offset_unit: str | None = None
    calculation: str = "percent_change"

    def __post_init__(self) -> None:
        if not self.type or self.type not in TIME_COMPARISON_TYPES:
            raise ValueError(
                f"Unknown time comparison type {self.type!r}; "
                f"expected one of {TIME_COMPARISON_TYPES}"
            )
        if not self.metric:
            raise ValueError("TimeComparison requires a base metric name")
        if self.calculation not in CALCULATION_TYPES:
            raise ValueError(
                f"Unknown calculation type {self.calculation!r}; "
                f"expected one of {CALCULATION_TYPES}"
            )
        if self.offset == 0:
            raise ValueError(
                "offset cannot be 0. Time comparisons require a non-zero "
                "offset to compare against a different time period. Use "
                "offset >= 1 for past comparisons or offset <= -1 for "
                "future comparisons."
            )
        if self.offset_unit is not None and self.offset_unit not in TIME_OFFSET_UNITS:
            raise ValueError(
                f"Unknown offset unit {self.offset_unit!r}; "
                f"expected one of {TIME_OFFSET_UNITS}"
            )

    @property
    def offset_interval(self) -> tuple[int, str]:
        """(amount, unit) for the comparison's SQL INTERVAL."""
        if self.offset is not None and self.offset_unit is not None:
            return (self.offset, self.offset_unit)
        return _DEFAULT_OFFSETS[self.type]

    def get_sql_offset(self) -> str:
        """SQL INTERVAL literal for this comparison's offset."""
        amount, unit = self.offset_interval
        return f"INTERVAL '{amount} {unit}'"


@dataclass
class TrailingPeriod:
    """Trailing/rolling period configuration (e.g. last 7 days)."""

    amount: int
    unit: str

    def __post_init__(self) -> None:
        if self.amount is None:
            raise ValueError("TrailingPeriod requires an amount")
        if self.unit not in TIME_OFFSET_UNITS:
            raise ValueError(
                f"Unknown trailing unit {self.unit!r}; "
                f"expected one of {TIME_OFFSET_UNITS}"
            )

    def get_sql_interval(self) -> str:
        """SQL INTERVAL literal for the trailing range frame."""
        return f"INTERVAL '{self.amount} {self.unit}'"

    def range_frame_sql(self, order_by: str, agg_sql: str) -> str:
        """Full windowed trailing aggregate over ``order_by``.

        Spark-executable RANGE frame, e.g.
        ``SUM(x) OVER (ORDER BY d RANGE BETWEEN INTERVAL '7 day'
        PRECEDING AND CURRENT ROW)``.
        """
        return (
            f"{agg_sql} OVER (ORDER BY {order_by} RANGE BETWEEN "
            f"{self.get_sql_interval()} PRECEDING AND CURRENT ROW)"
        )


def generate_time_comparison_sql(
    comparison: TimeComparison,
    current_metric_sql: str,
    time_dimension: str,
) -> str:
    """Build the comparison expression for a time-comparison metric.

    Uses a LAG window (prior-row semantics — callers with sparse series
    should use the engine's calendar-exact time_comparison metrics in
    ``sql/generator.py`` instead). NULLIF guards every division.
    """
    prior = f"LAG({current_metric_sql}) OVER (ORDER BY {time_dimension})"
    if comparison.calculation == "difference":
        return f"({current_metric_sql} - {prior})"
    if comparison.calculation == "percent_change":
        return f"(({current_metric_sql} - {prior}) / NULLIF({prior}, 0) * 100)"
    if comparison.calculation == "ratio":
        return f"({current_metric_sql} / NULLIF({prior}, 0))"
    raise ValueError(f"Unknown calculation type: {comparison.calculation}")
