"""Governance metadata: freshness policies and lifecycle/deprecation.

Re-expression of the reference's ``core/freshness.py`` and
``core/governance.py``: trust and lifecycle fields that describe
semantic objects without enforcing authorization (security policies
remain the access-control boundary).

- :class:`Freshness` declares how to measure source staleness — a
  ``watermark`` dimension/column whose MAX is the freshness marker, or
  an advanced ``sql`` escape hatch returning one scalar — plus the
  allowed ``ttl_seconds``. ``SparkSemanticLayer.check_freshness`` runs
  the marker query (one tiny aggregate; at scale the MAX pushes into
  the parquet footer statistics) and reports age vs TTL.
- :class:`Deprecation` marks an object as deprecated; querying a
  deprecated model/metric emits a ``DeprecationWarning`` with the
  migration guidance — non-fatal, the reference's behavior.
"""

from __future__ import annotations

from dataclasses import dataclass


class GovernanceError(Exception):
    pass


@dataclass
class Freshness:
    """Freshness expectation (reference ``core/freshness.py``)."""

    watermark: str | None = None  # dimension/column whose MAX is the marker
    sql: str | None = None  # advanced: scalar freshness query
    ttl_seconds: int | None = None  # max allowed age

    def __post_init__(self) -> None:
        if not (self.watermark or self.sql):
            raise GovernanceError("freshness needs watermark or sql")
        if self.watermark and self.sql:
            raise GovernanceError("freshness takes watermark OR sql, not both")
        if self.ttl_seconds is not None and self.ttl_seconds <= 0:
            raise GovernanceError("ttl_seconds must be positive")


@dataclass
class Deprecation:
    """Lifecycle details (reference ``core/governance.py``)."""

    message: str | None = None
    deprecated_at: str | None = None  # ISO date
    sunset_at: str | None = None
    replaced_by: str | None = None

    def notice(self, ref: str) -> str:
        out = f"{ref} is deprecated"
        if self.sunset_at:
            out += f" (sunset {self.sunset_at})"
        if self.replaced_by:
            out += f"; use {self.replaced_by}"
        if self.message:
            out += f" — {self.message}"
        return out


def freshness_marker_sql(model, watermark: str) -> str | None:
    """The canonical ``SELECT MAX(<watermark expr>)`` marker query for a
    model — the ONE builder shared by ``SparkSemanticLayer.
    check_freshness`` and the crossfilter freshness surface (two copies
    previously disagreed on {model} substitution and table-vs-sql
    precedence). ``table`` takes precedence when both are set (matching
    the layer's scan source choice); a SQL-bodied model aliases the
    subquery as ``t`` and binds ``{model}`` to it."""
    field_name = watermark.split(".", 1)[1] if "." in watermark else watermark
    dim = model.dimension(field_name) if hasattr(model, "dimension") else None
    expr = dim.expr if dim is not None else field_name
    if getattr(model, "table", None):
        src = str(model.table)
        expr = expr.replace("{model}.", "").replace("{model}", "")
    elif getattr(model, "sql", None):
        src = f"({model.sql}) AS t"
        expr = expr.replace("{model}", "t")
    else:
        return None
    return f"SELECT MAX({expr}) FROM {src}"
