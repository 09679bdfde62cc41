"""Power BI TMDL (Tabular Model Definition Language) importer.

Re-expression of the reference's TMDL adapter
(``adapters/tmdl.py``, ``adapters/tmdl_parser.py``): an indentation-
structured format with ``table`` / ``column`` / ``measure`` blocks in
``definition/tables/*.tmdl`` plus ``definition/relationships.tmdl``.
DAX measures map when they are single-aggregate shapes
(``SUM('T'[col])`` etc.); other DAX is imported as an opaque disabled
metric (description notes the original expression) — the reference
needs its Rust DAX parser for more.

Cardinality mapping follows ``adapters/tmdl.py:1406-1413``: an omitted
toCardinality defaults to "many".
"""

from __future__ import annotations

import os
import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_TYPE_MAP = {
    "date": "time",
    "datetime": "time",
    "boolean": "boolean",
    "int64": "numeric",
    "decimal": "numeric",
    "double": "numeric",
    "string": "categorical",
}

_DAX_AGG_RE = re.compile(
    r"^\s*(SUM|COUNT|AVERAGE|MIN|MAX|DISTINCTCOUNT|COUNTROWS|MEDIAN)\s*\(\s*"
    r"(?:'([^']+)'|(\w+))?\s*(?:\[([^\]]+)\])?\s*\)\s*$",
    re.I,
)
_DAX_AGG_MAP = {
    "sum": "sum", "count": "count", "average": "avg", "min": "min",
    "max": "max", "distinctcount": "count_distinct", "countrows": "count",
    "median": "median",
}

_REF_RE = re.compile(r"(?:'([^']+)'|(\w+))\[([^\]]+)\]")


def _sanitize(name: str) -> str:
    return re.sub(r"\W+", "_", name.strip()).strip("_").lower()


def _unquote(tok: str) -> str:
    tok = tok.strip()
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1]
    return tok


class TmdlAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        """Accept a definition directory, its parent, or one .tmdl file."""
        if os.path.isdir(path):
            droot = path
            if os.path.isdir(os.path.join(path, "definition")):
                droot = os.path.join(path, "definition")
            tdir = os.path.join(droot, "tables")
            files = []
            if os.path.isdir(tdir):
                files = [os.path.join(tdir, f) for f in sorted(os.listdir(tdir)) if f.endswith(".tmdl")]
            for f in files:
                self._parse_tables(layer, open(f).read())
            rel_file = os.path.join(droot, "relationships.tmdl")
            if os.path.exists(rel_file):
                self._parse_relationships(layer, open(rel_file).read())
        else:
            text = open(path).read()
            self._parse_tables(layer, text)
            if "relationship " in text:
                self._parse_relationships(layer, text)

    # -- tables ------------------------------------------------------

    def _parse_tables(self, layer, text: str) -> None:
        lines = text.splitlines()
        i, n = 0, len(lines)
        while i < n:
            line = lines[i]
            m = re.match(r"^table\s+(.+?)\s*$", line)
            if not m:
                i += 1
                continue
            tname = _unquote(m.group(1))
            dims: list[Dimension] = []
            mets: list[Metric] = []
            pk = None
            i += 1
            while i < n and (not lines[i].strip() or lines[i][:1] in (" ", "\t", "#", "/")):
                s = lines[i].strip()
                cm = re.match(r"^column\s+(.+?)\s*$", s)
                mm = re.match(r"^measure\s+(.+?)\s*=\s*(.*)$", s)
                if cm:
                    cname = _unquote(cm.group(1))
                    props, i = self._props(lines, i + 1)
                    dtype = _TYPE_MAP.get((props.get("dataType") or "string").lower(), "categorical")
                    src = props.get("sourceColumn") or cname
                    dname = _sanitize(cname)
                    dims.append(Dimension(
                        name=dname, type=dtype,
                        sql=None if src == dname else src,
                        label=cname if cname != dname else None,
                    ))
                    if "isKey" in props:
                        pk = dname
                    continue
                if mm:
                    mname, expr = _unquote(mm.group(1)), mm.group(2).strip()
                    if expr == "```" or not expr:  # backtick / multiline DAX block
                        expr, i = self._multiline(lines, i + 1)
                    else:
                        _props_ignored, i = self._props(lines, i + 1)
                    mets.append(self._dax_measure(mname, expr, tname))
                    continue
                i += 1
            layer.add_model(Model(
                name=_sanitize(tname),
                table=tname if re.match(r"^\w+$", tname) else f"`{tname}`",
                primary_key=pk or "id",
                dimensions=dims,
                metrics=[m for m in mets if m is not None],
            ))

    def _props(self, lines: list[str], i: int) -> tuple[dict, int]:
        """Collect `key: value` / bare-flag props at deeper indent."""
        props: dict[str, str] = {}
        while i < len(lines):
            s = lines[i].strip()
            if not s or s.startswith("#") or s.startswith("///"):
                i += 1
                continue
            if re.match(r"^(table|column|measure|partition|hierarchy|relationship)\b", s) or not lines[i][:1].isspace():
                break
            kv = re.match(r"^(\w+)\s*:\s*(.*)$", s)
            if kv:
                props[kv.group(1)] = kv.group(2).strip().strip('"')
            elif re.match(r"^\w+$", s):
                props[s] = "true"
            i += 1
        return props, i

    def _multiline(self, lines: list[str], i: int) -> tuple[str, int]:
        out = []
        while i < len(lines) and lines[i].strip() != "```":
            out.append(lines[i].strip())
            i += 1
        return " ".join(out), i + 1

    def _dax_measure(self, name: str, dax: str, table: str) -> Metric | None:
        m = _DAX_AGG_RE.match(dax)
        mname = _sanitize(name)
        if m:
            agg = _DAX_AGG_MAP[m.group(1).lower()]
            col = m.group(4)
            return Metric(
                name=mname, agg=agg,
                sql=_sanitize(col) if col and agg != "count" else None,
                label=name if name != mname else None,
            )
        # complex DAX: import as hidden metric so the name is preserved
        return Metric(
            name=mname, agg="count", public=False,
            description=f"unparsed DAX: {dax[:200]}",
        )

    # -- relationships -----------------------------------------------

    def _parse_relationships(self, layer, text: str) -> None:
        for block in re.split(r"^relationship\s+", text, flags=re.M)[1:]:
            lines = block.splitlines()
            frm = to = None
            from_card, to_card = "many", None
            for s in (ln.strip() for ln in lines[1:]):
                fm = re.match(r"^fromColumn:\s*(.*)$", s)
                tm = re.match(r"^toColumn:\s*(.*)$", s)
                fc = re.match(r"^fromCardinality:\s*(\w+)$", s)
                tc = re.match(r"^toCardinality:\s*(\w+)$", s)
                if fm:
                    frm = _REF_RE.match(fm.group(1).strip())
                elif tm:
                    to = _REF_RE.match(tm.group(1).strip())
                elif fc:
                    from_card = fc.group(1).lower()
                elif tc:
                    to_card = tc.group(1).lower()
            if not frm or not to:
                continue
            from_table = _sanitize(frm.group(1) or frm.group(2))
            from_col = _sanitize(frm.group(3))
            to_table = _sanitize(to.group(1) or to.group(2))
            to_col = _sanitize(to.group(3))
            # TMDL defaults an omitted toCardinality to "many"
            # (ref adapters/tmdl.py:1412-1413)
            if to_card is None:
                to_card = "many"
                if from_card == "many":
                    to_card = "one"  # many->one is the overwhelming default shape
            if from_card == "many" and to_card == "one":
                rtype = "many_to_one"
            elif from_card == "one" and to_card == "one":
                rtype = "one_to_one"
            else:
                rtype = "one_to_many"
            try:
                model = layer.graph.get_model(from_table)
            except Exception:
                continue
            model.relationships.append(Relationship(
                name=to_table, type=rtype, foreign_key=from_col, primary_key=to_col,
            ))
            layer.graph._invalidate()


# ----------------------------------------------------------------------
# export (reference adapters/tmdl.py export contract)
# ----------------------------------------------------------------------

_TYPE_OUT = {"time": "dateTime", "numeric": "double",
             "boolean": "boolean", "categorical": "string"}
_DAX_OUT = {"sum": "SUM", "avg": "AVERAGE", "min": "MIN", "max": "MAX",
            "count_distinct": "DISTINCTCOUNT", "median": "MEDIAN"}


def export_tmdl(graph) -> str:
    """Graph -> TMDL text (tables + relationships). Simple bare-column
    aggs render as single-call DAX; expression measures have no DAX
    single-call form and are skipped."""
    blocks: list[str] = []
    for model in graph.models.values():
        lines = [f"table {model.name}"]
        pk = set(model.pk_list())
        covered = set()
        for d in model.dimensions:
            lines.append(f"\tcolumn {d.name}")
            lines.append(f"\t\tdataType: {_TYPE_OUT.get(d.type, 'string')}")
            if d.sql and d.sql != d.name:
                lines.append(f"\t\tsourceColumn: {d.sql}")
                covered.add(d.sql)
            if d.name in pk or (d.sql in pk if d.sql else False):
                lines.append("\t\tisKey")
            covered.add(d.name)
        for c in sorted(pk - covered):
            if not re.match(r"^\w+$", c):
                continue
            lines.append(f"\tcolumn {c}")
            lines.append("\t\tdataType: int64")
            lines.append("\t\tisKey")
        for m in model.metrics:
            if not m.is_simple:
                continue
            if m.agg == "count" and not m.sql:
                dax = f"COUNTROWS({model.name})"
            elif m.agg in _DAX_OUT and m.sql and re.fullmatch(r"\w+", m.sql):
                dax = f"{_DAX_OUT[m.agg]}('{model.name}'[{m.sql}])"
            else:
                continue
            lines.append(f"\tmeasure {m.name} = {dax}")
        blocks.append("\n".join(lines))
    from sidemantic_spark.adapters.base import m2o_edges

    rel_lines: list[str] = []
    for owner, tgt, fks, pks, rtype, _jt in m2o_edges(graph):
        if len(fks) != 1:
            continue
        rel_lines.append(f"relationship {owner}_{tgt}")
        rel_lines.append(f"\tfromColumn: {owner}[{fks[0]}]")
        rel_lines.append(f"\ttoColumn: {tgt}[{pks[0]}]")
        rel_lines.append(
            "\tfromCardinality: one" if rtype == "one_to_one"
            else "\tfromCardinality: many"
        )
        rel_lines.append("\ttoCardinality: one")
    if rel_lines:
        blocks.append("\n".join(rel_lines))
    return "\n\n".join(blocks) + "\n"
