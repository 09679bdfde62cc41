"""Shared adapter plumbing."""

from __future__ import annotations

import re

import yaml


class AdapterError(Exception):
    pass


class BaseAdapter:
    """parse/parse_file contract (ref ``adapters/base.py:9``)."""

    def parse(self, layer, data: dict) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def parse_file(self, layer, path: str) -> None:
        with open(path) as fh:
            text = fh.read()
        docs = [d for d in yaml.safe_load_all(text) if d]
        for doc in docs:
            self.parse(layer, doc)


_REF_RE = re.compile(r"ref\(\s*['\"]([\w.]+)['\"]\s*\)")


def resolve_dbt_ref(model: str | None) -> str | None:
    """``ref('fct_orders')`` -> ``fct_orders``; plain names pass through."""
    if model is None:
        return None
    m = _REF_RE.search(model)
    return m.group(1) if m else model


def strip_cube_placeholders(sql: str | None, cube_name: str) -> str | None:
    """``{CUBE}.col`` / ``{CUBE.col}`` / ``{other.col}`` -> plain refs.

    ``{CUBE}`` refers to the declaring cube; in our CTE-scoped SQL the
    bare column name is correct. Cross-cube refs become model.column.
    """
    if sql is None:
        return None
    out = sql.replace("{CUBE}.", "").replace(f"{{{cube_name}}}.", "")
    out = re.sub(r"\{CUBE\.(\w+)\}", r"\1", out)
    out = re.sub(r"\{(\w+)\.(\w+)\}", r"\1.\2", out)
    out = out.replace("{CUBE}", cube_name)
    return out


AGG_TYPES = {
    "count": "count",
    "sum": "sum",
    "avg": "avg",
    "min": "min",
    "max": "max",
    "count_distinct": "count_distinct",
    "countDistinct": "count_distinct",
    "count_distinct_approx": "approx_count_distinct",
    "countDistinctApprox": "approx_count_distinct",
    "median": "median",
    "stddev": "stddev",
}
