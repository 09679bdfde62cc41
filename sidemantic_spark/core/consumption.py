"""Consumption contracts: Explore (curated entrypoint) and SavedQuery.

Re-expression of the reference's ``core/consumption.py:100,168``:
an Explore constrains callers to field allowlists, injects defaults and
mandatory filters, and caps limits; a SavedQuery is a named immutable
structured query, optionally governed by an Explore. Both resolve at
compile time (``core/semantic_layer.py:923``) — pure metadata, no
execution-side cost.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ContractError(Exception):
    pass


def _qualify(value: str, model: str) -> str:
    base = value.split(" ", 1)[0]
    return value if "." in base else f"{model}.{value}"


@dataclass
class Explore:
    name: str
    model: str
    label: str | None = None
    description: str | None = None
    allowed_dimensions: list[str] | None = None  # None = unrestricted
    allowed_metrics: list[str] | None = None
    default_dimensions: list[str] = field(default_factory=list)
    default_metrics: list[str] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)  # mandatory
    default_filters: list[str] = field(default_factory=list)
    default_order_by: list[str] = field(default_factory=list)
    default_limit: int | None = None
    max_limit: int | None = None

    def __post_init__(self) -> None:
        if (
            self.default_limit is not None
            and self.max_limit is not None
            and self.default_limit > self.max_limit
        ):
            raise ContractError(f"explore {self.name!r}: default_limit exceeds max_limit")
        for kind, allowed, defaults in (
            ("dimensions", self.allowed_dimensions, self.default_dimensions),
            ("metrics", self.allowed_metrics, self.default_metrics),
        ):
            if allowed is not None:
                allow = {_qualify(v, self.model) for v in allowed}
                bad = [v for v in defaults if _qualify(v, self.model) not in allow]
                if bad:
                    raise ContractError(
                        f"explore {self.name!r}: default_{kind} not allowed: {bad}"
                    )

    def resolve(self, kwargs: dict) -> dict:
        """Apply the contract to query kwargs; returns updated kwargs."""
        out = dict(kwargs)
        metrics = [_qualify(m, self.model) for m in (out.get("metrics") or [])]
        dims = [_qualify(d, self.model) for d in (out.get("dimensions") or [])]
        if not metrics and not dims:
            metrics = [_qualify(m, self.model) for m in self.default_metrics]
            dims = [_qualify(d, self.model) for d in self.default_dimensions]
        if self.allowed_metrics is not None:
            allow = {_qualify(v, self.model) for v in self.allowed_metrics}
            bad = [m for m in metrics if m not in allow]
            if bad:
                raise ContractError(f"explore {self.name!r}: metrics not allowed: {bad}")
        if self.allowed_dimensions is not None:
            allow = {_qualify(v, self.model) for v in self.allowed_dimensions}
            bad = [d for d in dims if d not in allow]
            if bad:
                raise ContractError(f"explore {self.name!r}: dimensions not allowed: {bad}")
        filters = list(out.get("filters") or []) or [
            _qualify(f, self.model) for f in self.default_filters
        ]
        filters = [_qualify(f, self.model) for f in self.filters] + filters
        order_by = out.get("order_by") or [
            _qualify(o, self.model) for o in self.default_order_by
        ]
        limit = out.get("limit")
        if limit is None:
            limit = self.default_limit
        if self.max_limit is not None:
            limit = self.max_limit if limit is None else min(limit, self.max_limit)
        out.update(
            metrics=metrics, dimensions=dims, filters=filters,
            order_by=order_by, limit=limit,
        )
        return out


@dataclass
class SavedQuery:
    name: str
    metrics: list[str] = field(default_factory=list)
    dimensions: list[str] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)
    segments: list[str] = field(default_factory=list)
    order_by: list[str] = field(default_factory=list)
    limit: int | None = None
    parameters: dict | None = None
    explore: str | None = None
    label: str | None = None
    description: str | None = None

    def as_kwargs(self) -> dict:
        out: dict = {
            "metrics": list(self.metrics),
            "dimensions": list(self.dimensions),
            "filters": list(self.filters),
            "segments": list(self.segments),
            "order_by": list(self.order_by),
        }
        if self.limit is not None:
            out["limit"] = self.limit
        if self.parameters:
            out["parameters"] = dict(self.parameters)
        return out
