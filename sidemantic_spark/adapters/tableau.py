"""Tableau data source (.tds/.twb XML) importer.

Re-expression of the reference's Tableau adapter surface
(``adapters/tableau.py:1021`` TableauAdapter.parse):

- each ``<datasource>`` becomes one model per ``<relation
  type='table'>`` (subquery/custom-SQL relations bind as derived
  tables; the 2020.2+ object-model wrappers are unwrapped)
- ``<column>`` elements map by role (dimension/measure) with Tableau
  datatypes folded onto our 4 semantic types; ``hidden`` columns stay
  non-public; ``<metadata-records>`` supply type/aggregation fallbacks
  and physical columns never customized in the UI ("orphans",
  ref ``:1404-1460``)
- calculated-field formulas TRANSLATE to Spark SQL: ``//`` comments and
  double-quoted strings normalize, ``[Field]`` refs become columns,
  ``ZN``/``IFNULL``/``ISNULL``/``IIF``/``IF..THEN..ELSEIF..END``/
  ``CONTAINS``/``DATETRUNC``/``COUNTD``/``LEN``/``INT``/``FLOAT``/
  ``STR``/``DATEADD``/``MID``/``FIND``/string ``+`` concat all rewrite
  (ref ``:139-634``); LOD expressions, table calcs, and
  Tableau-only functions are untranslatable — those fields import
  hidden with a NULL body and the raw formula retained in metadata
- ``Number of Records`` (formula ``1``, no aggregation) -> COUNT(*)
- join relations become relationship edges
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
_TYPE_GRAIN = {"date": "day", "datetime": "hour"}

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
# aggregations that pass the row value through (no SQL aggregate)
_PASSTHROUGH_AGGS = {"none", "attr", "attribute", "year", "qtr", "month", "day"}

_BRACKET_RE = re.compile(r"\[([^\]]+)\]")

# --- formula translation (ref adapters/tableau.py:139-634) -----------

_LOD_RE = re.compile(r"\{\s*(?:FIXED|INCLUDE|EXCLUDE)\b", re.I)
_FUNC_CALL_RE = re.compile(r"\b([A-Za-z_]+)\s*\(")
_TABLE_CALC_FUNCS = {
    "RUNNING_SUM", "RUNNING_AVG", "RUNNING_COUNT", "RUNNING_MIN",
    "RUNNING_MAX", "LOOKUP", "INDEX", "FIRST", "LAST", "SIZE",
    "WINDOW_SUM", "WINDOW_AVG", "WINDOW_MIN", "WINDOW_MAX", "WINDOW_COUNT",
    "WINDOW_MEDIAN", "WINDOW_STDEV", "WINDOW_VAR", "PREVIOUS_VALUE",
    "RANK", "RANK_DENSE", "RANK_MODIFIED", "RANK_PERCENTILE", "RANK_UNIQUE",
}
_TABLEAU_ONLY_FUNCS = {
    "ISMEMBEROF", "USERNAME", "USERDOMAIN", "FULLNAME", "ISFULLDATETIME",
    "RAWSQLAGG_REAL", "RAWSQLAGG_STR", "RAWSQL_REAL", "RAWSQL_STR",
    "RAWSQL_INT", "RAWSQL_BOOL", "RAWSQL_DATE", "RAWSQL_DATETIME",
}
_IF_THEN_RE = re.compile(
    r"\bIF\s+(.+?)\s+THEN\s+(.+?)(?:\s+ELSEIF\s+(.+?)\s+THEN\s+(.+?))*"
    r"\s+(?:ELSE\s+(.+?)\s+)?END\b",
    re.I | re.S,
)
_SIMPLE_RENAMES = [
    (re.compile(r"\bIFNULL\s*\(", re.I), "COALESCE("),
    (re.compile(r"\bDATETRUNC\s*\(", re.I), "DATE_TRUNC("),
    (re.compile(r"\bLEN\s*\(", re.I), "LENGTH("),
    (re.compile(r"\bMID\s*\(", re.I), "SUBSTRING("),
    (re.compile(r"\bFIND\s*\(", re.I), "INSTR("),
    (re.compile(r"\bCHAR\s*\(", re.I), "CHR("),
    (re.compile(r"\bMAKEDATE\s*\(", re.I), "MAKE_DATE("),
    (re.compile(r"\bMAKEDATETIME\s*\(", re.I), "MAKE_TIMESTAMP("),
]
_CAST_FUNCS = {
    "INT": "CAST({arg} AS INT)",
    "FLOAT": "CAST({arg} AS DOUBLE)",
    "STR": "CAST({arg} AS STRING)",
}


def _strip_brackets(name: str) -> str:
    """``[amount]`` -> ``amount``; ``[orders].[id]`` -> ``orders.id``."""
    return ".".join(_BRACKET_RE.findall(name)) or name


def _sanitize(name: str) -> str:
    return re.sub(r"\W+", "_", name.strip()).strip("_").lower()


def _protect(formula: str) -> tuple[str, list[tuple[str, str]]]:
    """Replace ``[Field]`` refs and string literals with sentinels and
    drop ``//`` comments, so later rewrites never fire inside them."""
    out: list[str] = []
    repl: list[tuple[str, str]] = []
    i, n = 0, len(formula)
    while i < n:
        if formula.startswith("//", i):
            end = formula.find("\n", i)
            if end < 0:
                break
            out.append("\n")
            i = end + 1
            continue
        c = formula[i]
        if c == "[":
            end = formula.find("]", i + 1)
            if end >= 0:
                field = formula[i + 1:end]
                # qualified [tbl].[col] -> col
                if formula[end + 1:end + 3] == ".[":
                    qend = formula.find("]", end + 3)
                    if qend >= 0:
                        field = formula[end + 3:qend]
                        end = qend
                sentinel = f"__tbf_{len(repl)}__"
                repl.append((sentinel, _sanitize(field)))
                out.append(sentinel)
                i = end + 1
                continue
        if c in ("'", '"'):
            j = i + 1
            buf: list[str] = []
            while j < n:
                if formula[j] == c:
                    if formula[j + 1:j + 2] == c:
                        buf.append(c)
                        j += 2
                        continue
                    j += 1
                    break
                buf.append(formula[j])
                j += 1
            lit = "'" + "".join(buf).replace("'", "''") + "'"
            sentinel = f"'__tbl_{len(repl)}__'"
            repl.append((sentinel, lit))
            out.append(sentinel)
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out), repl


def _matching_paren(s: str, open_pos: int) -> int:
    depth = 0
    for i in range(open_pos, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _split_args(s: str) -> list[str]:
    args: list[str] = []
    depth = 0
    last = 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(s[last:i].strip())
            last = i + 1
    args.append(s[last:].strip())
    return args


def _replace_call(text: str, func_re: re.Pattern, builder) -> str:
    """Rewrite every ``FUNC(...)`` match via ``builder(args) -> str | None``
    (balanced parens; builder returning None skips that call and later
    matches still rewrite)."""
    pos = 0
    while True:
        m = func_re.search(text, pos)
        if not m:
            return text
        close = _matching_paren(text, m.end() - 1)
        if close < 0:
            return text
        args = _split_args(text[m.end():close])
        built = builder(args)
        if built is None:
            pos = m.end()
            continue
        text = text[:m.start()] + built + text[close + 1:]
        pos = m.start() + len(built)


def _if_to_case(match: re.Match) -> str:
    out = re.sub(r"\bIF\b", "CASE WHEN", match.group(0), count=1, flags=re.I)
    return re.sub(r"\bELSEIF\b", "WHEN", out, flags=re.I)


def translate_formula(formula: str | None) -> tuple[str | None, bool]:
    """Tableau calc formula -> Spark SQL. Returns (sql, translatable);
    untranslatable formulas (LOD / table calc / Tableau-only functions)
    come back raw with False."""
    if formula is None:
        return None, True
    protected, repl = _protect(formula)
    if _LOD_RE.search(protected):
        return formula, False
    for m in _FUNC_CALL_RE.finditer(protected):
        fn = m.group(1).upper()
        if fn in _TABLE_CALC_FUNCS or fn in _TABLEAU_ONLY_FUNCS:
            return formula, False

    result = protected.strip()
    result = _replace_call(result, re.compile(r"\bZN\s*\(", re.I),
                           lambda a: f"COALESCE({a[0]}, 0)" if len(a) == 1 else None)
    result = _replace_call(result, re.compile(r"\bISNULL\s*\(", re.I),
                           lambda a: f"({a[0]} IS NULL)" if len(a) == 1 else None)
    result = _replace_call(
        result, re.compile(r"\bIIF\s*\(", re.I),
        lambda a: f"CASE WHEN {a[0]} THEN {a[1]} ELSE {a[2]} END"
        if len(a) >= 3 else None)
    prev = None
    while prev != result:
        prev = result
        result = _IF_THEN_RE.sub(_if_to_case, result)
    result = _replace_call(
        result, re.compile(r"\bCONTAINS\s*\(", re.I),
        lambda a: f"{a[0]} LIKE '%' || {a[1]} || '%'" if len(a) >= 2 else None)
    result = _replace_call(
        result, re.compile(r"\bCOUNTD\s*\(", re.I),
        lambda a: f"COUNT(DISTINCT {a[0]})" if len(a) == 1 else None)
    for fn, template in _CAST_FUNCS.items():
        result = _replace_call(
            result, re.compile(rf"\b{fn}\s*\(", re.I),
            lambda a, t=template: t.format(arg=a[0]) if len(a) == 1 else None)
    # DATEADD('unit', n, d) -> TIMESTAMPADD(UNIT, n, d); the unit literal
    # is a sentinel at this point, so resolve it before upcasing
    repl_map = dict(repl)

    def dateadd(a: list[str]):
        if len(a) < 3:
            return None
        unit = repl_map.get(a[0], a[0]).strip().strip("'\"").upper()
        return f"TIMESTAMPADD({unit}, {a[1]}, {a[2]})"

    result = _replace_call(result, re.compile(r"\bDATEADD\s*\(", re.I), dateadd)
    for pattern, replacement in _SIMPLE_RENAMES:
        result = pattern.sub(replacement, result)
    # string concatenation: + adjacent to a string literal/cast -> ||
    prev = None
    while prev != result:
        prev = result
        result = re.sub(r"('\s*)\+(\s*)", r"\1||\2", result)
        result = re.sub(r"(\s*)\+(\s*')", r"\1||\2", result)
        result = re.sub(r"(AS\s+STRING\)\s*)\+(\s*)", r"\1||\2", result,
                        flags=re.I)
    for sentinel, replacement in repl:
        result = result.replace(sentinel, replacement)
        # DATEADD consumed the quotes around a protected unit literal
        if sentinel.startswith("'"):
            result = result.replace(sentinel[1:-1], replacement[1:-1])
    return result, True


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

    def parse(self, layer, data) -> None:
        raise NotImplementedError("Tableau sources are XML, use parse_file")

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

        # metadata-records: column -> owning table, plus local-type /
        # aggregation fallbacks and the physical "orphan" columns Tableau
        # auto-discovered but the user never customized (ref :1360-1460)
        owner: dict[str, str] = {}
        meta_info: dict[str, dict] = {}
        for rec in ds.iter("metadata-record"):
            if rec.get("class") != "column":
                continue
            local = rec.findtext("local-name") or ""
            parts = _BRACKET_RE.findall(local)
            cname = _sanitize(parts[-1]) if parts else _sanitize(local)
            if not cname:
                continue
            info: dict = {}
            if rec.findtext("local-type"):
                info["local_type"] = rec.findtext("local-type").strip()
            if rec.findtext("aggregation"):
                info["aggregation"] = rec.findtext("aggregation").strip()
            parent = rec.findtext("parent-name")
            if parent:
                owner[cname] = _sanitize(_strip_brackets(parent))
            meta_info[cname] = info

        base_table = _sanitize(tables[0][0])
        dims: dict[str, list[Dimension]] = {}
        mets: dict[str, list[Metric]] = {}
        seen_cols: set[str] = set()
        for col in ds.findall("column"):
            cname = _sanitize(_strip_brackets(col.get("name", "")))
            if not cname:
                continue
            seen_cols.add(cname)
            table = owner.get(cname, base_table)
            info = meta_info.get(cname, {})
            hidden = str(col.get("hidden") or "").lower() == "true"
            calc = col.find("calculation")
            formula = calc.get("formula") if calc is not None else None
            sql, translatable = translate_formula(formula)
            meta = None
            if not translatable:
                # LOD/table-calc/Tableau-only: import hidden with a NULL
                # body so raw Tableau syntax never reaches generated SQL
                meta = {"tableau": {"formula": formula}}
                hidden = True
                sql = "NULL"
            role = col.get("role", "dimension")
            agg_raw = (col.get("aggregation") or info.get("aggregation") or "").lower()
            if role == "measure":
                # "Number of Records": formula '1' with no aggregation
                if formula and formula.strip() == "1" and not _AGG_MAP.get(agg_raw):
                    mets.setdefault(table, []).append(Metric(
                        name=cname, agg="count", sql=None,
                        label=col.get("caption"), public=not hidden))
                    continue
                agg = _AGG_MAP.get(agg_raw or "sum")
                if agg is None or agg_raw in _PASSTHROUGH_AGGS:
                    if not translatable:
                        continue
                    # passthrough measures become derived formulas
                    mets.setdefault(table, []).append(Metric(
                        name=cname, type="derived",
                        expr=sql or cname, label=col.get("caption"),
                        public=not hidden, meta=meta))
                    continue
                mets.setdefault(table, []).append(Metric(
                    name=cname,
                    agg=agg,
                    sql=sql if sql else (None if agg == "count" else cname),
                    label=col.get("caption"),
                    public=not hidden,
                    meta=meta,
                ))
            else:
                datatype = (col.get("datatype") or info.get("local_type")
                            or "string").lower()
                dims.setdefault(table, []).append(Dimension(
                    name=cname,
                    type=_TYPE_MAP.get(datatype, "categorical"),
                    granularity=_TYPE_GRAIN.get(datatype),
                    sql=sql,
                    label=col.get("caption"),
                    public=not hidden,
                    meta=meta,
                ))

        # orphan metadata columns: physical fields with no <column> element
        for cname, info in meta_info.items():
            if cname in seen_cols:
                continue
            table = owner.get(cname, base_table)
            datatype = (info.get("local_type") or "string").lower()
            agg = _AGG_MAP.get((info.get("aggregation") or "").lower())
            if agg in ("sum", "avg", "min", "max", "median") \
                    and datatype in ("integer", "real", "number"):
                mets.setdefault(table, []).append(Metric(name=cname, agg=agg, sql=cname))
            else:
                dims.setdefault(table, []).append(Dimension(
                    name=cname,
                    type=_TYPE_MAP.get(datatype, "categorical"),
                    granularity=_TYPE_GRAIN.get(datatype),
                ))

        # drill paths -> dimension hierarchies (each field's parent is
        # the previous drill level)
        parent_of: dict[str, str] = {}
        for dp in ds.iter("drill-path"):
            fields = [_sanitize(_strip_brackets(f.text or ""))
                      for f in dp.findall("field")]
            for up, down in zip(fields, fields[1:]):
                if up and down:
                    parent_of[down] = up
        if parent_of:
            for dlist in dims.values():
                for d in dlist:
                    if d.name in parent_of:
                        d.parent = parent_of[d.name]

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
