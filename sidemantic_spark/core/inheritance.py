"""Model / metric inheritance via ``extends``.

Mirrors the reference's ``core/inheritance.py:11`` (``merge_model``) and
``:96`` (``merge_metric``): the child inherits every parent field, child
values win, and list fields (dimensions, metrics, relationships,
segments, pre_aggregations, filters) merge by name with child items
overriding same-named parent items.
"""

from __future__ import annotations

import dataclasses

from .model import Metric, Model

_MODEL_LIST_FIELDS = ("dimensions", "metrics", "relationships", "segments", "pre_aggregations")


def _merge_named_lists(parent_items: list, child_items: list) -> list:
    by_name: dict[str, object] = {}
    for it in parent_items:
        by_name[getattr(it, "name", str(it))] = it
    for it in child_items:
        by_name[getattr(it, "name", str(it))] = it
    return list(by_name.values())


def merge_model(child: Model, parent: Model) -> Model:
    """Return a new Model = parent overridden by child (child name kept).

    A child field overrides the parent only when it differs from the
    dataclass DEFAULT — otherwise an extends-only child would silently
    reset inherited non-None defaults (primary_key='id',
    source_format='parquet', auto_dimensions=False) back to them.
    """
    data = {f.name: getattr(parent, f.name) for f in dataclasses.fields(parent)}
    child_defaults = Model(name="__probe__")
    for f in dataclasses.fields(child):
        if f.name in ("name", "extends"):
            continue
        child_val = getattr(child, f.name)
        if f.name in _MODEL_LIST_FIELDS:
            data[f.name] = _merge_named_lists(data.get(f.name) or [], child_val or [])
        elif child_val != getattr(child_defaults, f.name):
            data[f.name] = child_val
    data["name"] = child.name
    data["extends"] = None
    return Model(**data)


def merge_metric(child: Metric, parent: Metric) -> Metric:
    """Return a new Metric = parent overridden by child (filters append)."""
    data = {f.name: getattr(parent, f.name) for f in dataclasses.fields(parent)}
    child_defaults = Metric(name="__probe__")
    for f in dataclasses.fields(child):
        if f.name in ("name", "extends"):
            continue
        child_val = getattr(child, f.name)
        if f.name == "filters":
            # reference merges filter lists (parent's + child's)
            merged = list(data.get("filters") or [])
            for flt in child_val or []:
                if flt not in merged:
                    merged.append(flt)
            data["filters"] = merged
        elif child_val != getattr(child_defaults, f.name):
            data[f.name] = child_val
    data["name"] = child.name
    data["extends"] = None
    return Metric(**data)


def resolve_model_inheritance(models: dict[str, Model]) -> dict[str, Model]:
    """Resolve ``extends`` chains across a model registry (topological,
    cycle-safe). Returns a new dict with all chains flattened."""
    resolved: dict[str, Model] = {}

    def resolve(name: str, seen: tuple[str, ...] = ()) -> Model:
        if name in resolved:
            return resolved[name]
        m = models[name]
        if m.extends:
            if m.extends in seen:
                raise ValueError(f"inheritance cycle: {' -> '.join(seen + (name, m.extends))}")
            if m.extends not in models:
                raise ValueError(f"model {name!r} extends unknown model {m.extends!r}")
            parent = resolve(m.extends, seen + (name,))
            m = merge_model(m, parent)
        resolved[name] = m
        return m

    for name in models:
        resolve(name)
    return resolved


def resolve_metric_inheritance(metrics: dict[str, Metric]) -> dict[str, Metric]:
    """Resolve ``extends`` chains across graph-level metrics."""
    resolved: dict[str, Metric] = {}

    def resolve(name: str, seen: tuple[str, ...] = ()) -> Metric:
        if name in resolved:
            return resolved[name]
        m = metrics[name]
        if m.extends:
            if m.extends in seen:
                raise ValueError(f"inheritance cycle: {' -> '.join(seen + (name, m.extends))}")
            if m.extends not in metrics:
                raise ValueError(f"metric {name!r} extends unknown metric {m.extends!r}")
            parent = resolve(m.extends, seen + (name,))
            m = merge_metric(m, parent)
        resolved[name] = m
        return m

    for name in metrics:
        resolve(name)
    return resolved
