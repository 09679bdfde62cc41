"""Tableau data source (.tds/.twb XML) importer.

Re-expression of the reference's Tableau adapter surface
(``adapters/tableau.py:1021`` TableauAdapter.parse): each
``<datasource>`` becomes one model per ``<relation type='table'>``;
``<column>`` elements map by role (dimension/measure) with Tableau
datatypes folded onto our 4 semantic types; join relations become
relationship edges; calculated fields keep their formula with
``[col]`` refs rewritten to plain column names.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from sidemantic_spark.adapters.base import AdapterError, BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_TYPE_MAP = {
    "date": "time",
    "datetime": "time",
    "boolean": "boolean",
    "integer": "numeric",
    "real": "numeric",
    "number": "numeric",
    "string": "categorical",
}

_AGG_MAP = {
    "sum": "sum",
    "avg": "avg",
    "average": "avg",
    "count": "count",
    "countd": "count_distinct",
    "min": "min",
    "max": "max",
    "median": "median",
    "stdev": "stddev",
    "var": "variance",
}

_BRACKET_RE = re.compile(r"\[([^\]]+)\]")


def _strip_brackets(name: str) -> str:
    """``[amount]`` -> ``amount``; ``[orders].[id]`` -> ``orders.id``."""
    return ".".join(_BRACKET_RE.findall(name)) or name


def _formula_to_sql(formula: str) -> str:
    """Rewrite ``[Col Name]`` refs to plain identifiers."""
    return _BRACKET_RE.sub(lambda m: _sanitize(m.group(1)), formula)


def _sanitize(name: str) -> str:
    return re.sub(r"\W+", "_", name.strip()).strip("_").lower()


class TableauAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        try:
            root = ET.parse(path).getroot()
        except ET.ParseError as e:
            raise AdapterError(f"invalid Tableau XML {path!r}: {e}") from e
        if root.tag == "datasource":
            self._parse_datasource(layer, root)
        else:  # .twb workbook wraps <datasources>
            for ds in root.iter("datasource"):
                if ds.find(".//relation") is not None:
                    self._parse_datasource(layer, ds)

    # -- datasource --------------------------------------------------

    def _parse_datasource(self, layer, ds: ET.Element) -> None:
        tables, joins = [], []
        conn = ds.find("connection")
        scope = conn if conn is not None else ds
        self._walk_relation(scope.find("relation"), tables, joins)
        if not tables:
            # newer object-model TDS (the `_.fcp.ObjectModelEncapsulateLegacy`
            # feature, Tableau 2020.2+) nests relation trees inside
            # feature-flag wrappers / object graphs instead of a direct
            # connection child — walk every OUTERMOST relation tree so
            # join relations (and their clauses) survive, then dedup
            # (object-model XML repeats the same relations per wrapper)
            all_rels = list(ds.iter("relation"))
            nested = {
                id(child)
                for r in all_rels
                for child in r.iter("relation")
                if child is not r
            }
            raw_tables: list = []
            raw_joins: list = []
            for r in all_rels:
                if id(r) not in nested:
                    self._walk_relation(r, raw_tables, raw_joins)
            seen_rel = set()
            for name, physical in raw_tables:
                if name in seen_rel:
                    continue
                seen_rel.add(name)
                tables.append((name, physical))
            seen_join = set()
            for j in raw_joins:
                key = repr(j)
                if key not in seen_join:
                    seen_join.add(key)
                    joins.append(j)
        if not tables:
            return
        ds_name = _sanitize(ds.get("formatted-name") or ds.get("name") or tables[0][0])

        # column -> owning table via metadata-records (ref tableau.py:1229)
        owner: dict[str, str] = {}
        for rec in ds.iter("metadata-record"):
            if rec.get("class") != "column":
                continue
            local = rec.findtext("local-name") or ""
            parts = _BRACKET_RE.findall(local)
            if len(parts) == 2:
                owner[_sanitize(parts[1])] = _sanitize(parts[0])

        base_table = _sanitize(tables[0][0])
        dims: dict[str, list[Dimension]] = {}
        mets: dict[str, list[Metric]] = {}
        for col in ds.findall("column"):
            cname = _sanitize(_strip_brackets(col.get("name", "")))
            if not cname:
                continue
            table = owner.get(cname, base_table)
            calc = col.find("calculation")
            formula = _formula_to_sql(calc.get("formula")) if calc is not None and calc.get("formula") else None
            role = col.get("role", "dimension")
            if role == "measure":
                agg = _AGG_MAP.get((col.get("aggregation") or "sum").lower())
                if agg is None:
                    continue
                mets.setdefault(table, []).append(Metric(
                    name=cname,
                    agg=agg,
                    sql=formula if formula else (None if agg == "count" else cname),
                    label=col.get("caption"),
                ))
            else:
                dims.setdefault(table, []).append(Dimension(
                    name=cname,
                    type=_TYPE_MAP.get((col.get("datatype") or "string").lower(), "categorical"),
                    sql=formula,
                    label=col.get("caption"),
                ))

        # relationships from join clauses: left table -> right table
        rels: dict[str, list[Relationship]] = {}
        for left_tbl, left_col, right_tbl, right_col, _join in joins:
            rels.setdefault(left_tbl, []).append(Relationship(
                name=right_tbl,
                type="many_to_one",
                foreign_key=left_col,
                primary_key=right_col,
            ))

        single = len(tables) == 1
        for tbl_name, physical in tables:
            t = _sanitize(tbl_name)
            model_name = ds_name if single and ds_name else t
            layer.add_model(Model(
                name=model_name,
                table=physical or t,
                primary_key=_first_key(dims.get(t, [])),
                dimensions=dims.get(t, []),
                metrics=mets.get(t, []),
                relationships=rels.get(t, []),
            ))

    def _walk_relation(self, rel: ET.Element | None, tables: list, joins: list) -> None:
        """Collect (name, physical_table) leaves + join clauses
        (ref ``adapters/tableau.py:1794`` _parse_relation_tree)."""
        if rel is None:
            return
        rtype = rel.get("type")
        if rtype in ("table", "view"):
            physical = rel.get("table")
            if physical:
                physical = ".".join(_BRACKET_RE.findall(physical)) or physical
            tables.append((rel.get("name") or physical, physical))
            return
        if rtype == "subquery" and rel.text and rel.text.strip():
            # inline SQL relation -> derived-table binding
            tables.append((rel.get("name") or "subquery", f"({rel.text.strip()})"))
            return
        if rtype == "stored-proc":
            # no Spark-side equivalent for a warehouse proc call; bind the
            # proc name so columns still import (ref keeps the model too)
            tables.append((rel.get("name") or rel.get("stored-proc") or "stored_proc", rel.get("name")))
            return
        # join/union/pivot/collection/text/union-all wrappers: collect any
        # equality join clauses, then recurse into nested relations
        for clause in rel.findall("clause"):
            expr = clause.find("expression")
            if expr is not None and expr.get("op") == "=":
                sides = expr.findall("expression")
                if len(sides) == 2:
                    l = _BRACKET_RE.findall(sides[0].get("op", ""))
                    r = _BRACKET_RE.findall(sides[1].get("op", ""))
                    if len(l) == 2 and len(r) == 2:
                        joins.append((
                            _sanitize(l[0]), _sanitize(l[1]),
                            _sanitize(r[0]), _sanitize(r[1]),
                            rel.get("join", "left"),
                        ))
        for child in rel.findall("relation") + rel.findall("./*/relation"):
            self._walk_relation(child, tables, joins)
        if rtype == "text" and rel.text and rel.text.strip():
            # custom-SQL relation: bind as derived SQL "table"
            tables.append((rel.get("name") or "custom_sql", f"({rel.text.strip()})"))


def _first_key(dims: list[Dimension]) -> str:
    for d in dims:
        if d.name in ("id", "key") or d.name.endswith("_id") or d.name.endswith("_key"):
            return d.name
    return "id"
