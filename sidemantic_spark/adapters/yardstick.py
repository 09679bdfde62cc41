"""Yardstick semantic-view SQL importer.

Re-expression of the reference's Yardstick adapter
(``adapters/yardstick.py:108``): ``.sql`` files with
``CREATE VIEW name AS SELECT ... FROM table`` where select items
marked ``AS MEASURE name`` become metrics (aggregate auto-extraction)
and the rest become dimensions; the first dimension is the primary
key. Formula measures over other measures become derived metrics.
"""

from __future__ import annotations

import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model

_VIEW_RE = re.compile(
    r"CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s*(?:WHERE\s+(.*?))?\s*(?:;|$)",
    re.I | re.S,
)
_MEASURE_RE = re.compile(r"^(.*?)\s+AS\s+MEASURE\s+(?:\"([^\"]+)\"|(\w+))\s*$", re.I | re.S)
_ALIAS_RE = re.compile(r"^(.*?)\s+AS\s+(?:\"([^\"]+)\"|(\w+))\s*$", re.I | re.S)


def _split_select(items: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in items:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


class YardstickAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        import os

        if os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                if f.endswith(".sql"):
                    self.parse_file(layer, os.path.join(path, f))
            return
        with open(path) as fh:
            self.parse_text(layer, fh.read())

    def parse(self, layer, data) -> None:
        raise NotImplementedError("Yardstick models are SQL text, use parse_file/parse_text")

    def parse_text(self, layer, text: str) -> None:
        text = re.sub(r"--[^\n]*", "", text)
        for m in _VIEW_RE.finditer(text):
            name, select_list, table, where = m.group(1), m.group(2), m.group(3), m.group(4)
            dims: list[Dimension] = []
            mets: list[Metric] = []
            measure_names: set[str] = set()
            items = _split_select(select_list)
            for item in items:
                mm = _MEASURE_RE.match(item)
                if mm:
                    measure_names.add((mm.group(2) or mm.group(3)).replace(" ", "_"))
            for item in items:
                mm = _MEASURE_RE.match(item)
                if mm:
                    expr = mm.group(1).strip()
                    mname = (mm.group(2) or mm.group(3)).replace(" ", "_")
                    refs = set(re.findall(r"\b\w+\b", expr))
                    if not re.search(r"\w+\s*\(", expr) and refs & measure_names:
                        mets.append(Metric(name=mname, type="derived", expr=expr))
                    else:
                        mets.append(Metric(name=mname, sql=expr))
                    continue
                am = _ALIAS_RE.match(item)
                if am and not re.search(r"\(", am.group(1)):
                    dname = (am.group(2) or am.group(3)).replace(" ", "_")
                    expr = am.group(1).strip()
                    dims.append(Dimension(name=dname, sql=None if expr == dname else expr))
                elif re.match(r"^[\w.]+$", item):
                    dims.append(Dimension(name=item.split(".")[-1],
                                          sql=item if "." in item else None))
                else:
                    am2 = _ALIAS_RE.match(item)
                    if am2:
                        dname = (am2.group(2) or am2.group(3)).replace(" ", "_")
                        dims.append(Dimension(name=dname, sql=am2.group(1).strip()))
            try:
                layer.add_model(Model(
                    name=name, table=table,
                    primary_key=dims[0].name if dims else "id",
                    dimensions=dims, metrics=mets,
                    row_filters=[where.strip()] if where else [],
                ))
            except Exception:
                pass
