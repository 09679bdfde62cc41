"""Table calculations: post-query result-shaping stage.

The reference evaluates these client-side in Python over fetched rows
(``core/table_calculation.py:14``, ``sql/table_calc_processor.py:12`` —
the only "executed" operator in the repo).  On Spark we instead push
them into the engine as a second window-function stage wrapped around
the compiled query — distributed, codegen'd, and they compose with
LIMIT/ORDER afterwards.

Types (ref ``core/table_calculation.py:23-33``): formula,
percent_of_total, percent_of_previous, percent_of_column_total,
running_total, rank, row_number, percentile, moving_average.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


class TableCalcError(Exception):
    pass


@dataclass
class TableCalculation:
    name: str
    type: str = "formula"
    field: str | None = None  # result column the calc operates on
    formula: str | None = None  # for type=formula: SQL over result cols
    partition_by: list[str] = dc_field(default_factory=list)
    order_by: list[str] = dc_field(default_factory=list)
    window_size: int = 3  # moving_average row window

    def to_sql(self) -> str:
        part = (
            "PARTITION BY " + ", ".join(self.partition_by) if self.partition_by else ""
        )
        order = "ORDER BY " + ", ".join(self.order_by) if self.order_by else ""

        def over(*parts: str) -> str:
            inner = " ".join(p for p in parts if p)
            return f"OVER ({inner})"

        t = self.type
        if t == "formula":
            if not self.formula:
                raise TableCalcError(f"table calc {self.name!r} needs formula")
            # the reference's `${col}` placeholder form treats NULL
            # result cells as 0 (ref table_calc_processor.py
            # test_formula_with_null_becomes_zero); raw SQL formulas
            # keep SQL NULL semantics
            import re as _re

            expr = _re.sub(
                r"\$\{(\w+)\}", r"COALESCE(\1, 0)", self.formula
            )
            return f"{expr} AS {self.name}"
        if t in ("rank", "row_number"):
            if not order and self.field:
                # reference ranks by the field DESCENDING by default,
                # NULL as 0 (ref test_rank_descending_by_default)
                order = f"ORDER BY COALESCE({self.field}, 0) DESC"
            if not order:
                raise TableCalcError(f"{self.name!r}: {t} needs order_by")
            fn = "RANK()" if t == "rank" else "ROW_NUMBER()"
            return f"{fn} {over(part, order)} AS {self.name}"
        if self.field is None:
            raise TableCalcError(f"table calc {self.name!r} needs field")
        f = self.field
        if t in ("percent_of_total", "percent_of_column_total"):
            # percentages, not fractions (ref table_calc_processor.py:184);
            # a NULL cell contributes 0% rather than NULL (ref
            # test_null_in_percent_of_total)
            scope = part if t == "percent_of_total" else ""
            return (
                f"CAST(COALESCE({f}, 0) AS DOUBLE) * 100 / NULLIF(CAST(SUM({f}) {over(scope)} AS DOUBLE), 0)"
                f" AS {self.name}"
            )
        if t == "percent_of_previous":
            if not order:
                raise TableCalcError(f"{self.name!r}: percent_of_previous needs order_by")
            return (
                f"(CAST({f} AS DOUBLE) - LAG({f}) {over(part, order)})"
                f" * 100 / NULLIF(CAST(LAG({f}) {over(part, order)} AS DOUBLE), 0)"
                f" AS {self.name}"
            )
        if t == "running_total":
            if not order:
                raise TableCalcError(f"{self.name!r}: running_total needs order_by")
            # COALESCE keeps an all-NULL column at 0, matching the
            # reference's NULL-as-0 accumulation
            return (
                f"SUM(COALESCE({f}, 0)) {over(part, order, 'ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW')}"
                f" AS {self.name}"
            )
        if t == "percentile":
            return f"PERCENT_RANK() {over(part, 'ORDER BY ' + f)} AS {self.name}"
        if t == "moving_average":
            if not order:
                raise TableCalcError(f"{self.name!r}: moving_average needs order_by")
            # NULL cells average as 0 over the FULL frame width (ref
            # test_null_in_moving_average: (10 + NULL) / 2 = 5)
            frame = f"ROWS BETWEEN {self.window_size - 1} PRECEDING AND CURRENT ROW"
            return (
                f"CAST(SUM(COALESCE({f}, 0)) {over(part, order, frame)} AS DOUBLE)"
                f" / COUNT(*) {over(part, order, frame)} AS {self.name}"
            )
        raise TableCalcError(f"unknown table calc type {t!r}")


def apply_table_calcs(compiled_sql: str, calcs: list[TableCalculation]) -> str:
    """Wrap compiled query SQL in a window stage adding each calc."""
    if not calcs:
        return compiled_sql
    exprs = ",\n    ".join(c.to_sql() for c in calcs)
    return (
        f"-- sidemantic_spark table_calcs={','.join(c.name for c in calcs)}\n"
        f"SELECT *,\n    {exprs}\nFROM (\n{compiled_sql}\n)"
    )
