"""Malloy source-file importer.

The reference ships a vendored ANTLR Malloy parser
(``adapters/malloy.py``, ~2k LoC + grammar). We re-express the semantic
subset with a brace-aware line parser covering the published Malloy
modeling surface: ``source: X is <conn>.table('t') extend { ... }``
blocks with ``primary_key:``, ``dimension:``, ``measure:``,
``join_one/join_many/join_cross:``, and source-level ``where:``.
Measures map via aggregate auto-extraction; ``{ where: ... }`` measure
filters become per-metric filters (ref ``adapters/malloy.py:738``
_parse_aggregation, ``:1368`` model assembly).
"""

from __future__ import annotations

import re

from sidemantic_spark.adapters.base import BaseAdapter
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship

_SOURCE_RE = re.compile(
    r"^source:\s*(\w+)(?:\s*\([^)]*\))?\s+is\s+([^\n{]+?)\s*(?:(extend\s*)?\{|$)", re.M
)
_TABLE_RE = re.compile(r"\w+\.table\(\s*['\"]([^'\"]+)['\"]\s*\)")
_SQL_RE = re.compile(r"\w+\.sql\(\s*(?:\"\"\"|'''|\"|')(.*?)(?:\"\"\"|'''|\"|')\s*\)", re.S)
_FIELD_RE = re.compile(r"^\s*`?([\w ]+?)`?\s+is\s+(.+)$")
_JOIN_WITH_RE = re.compile(r"^\s*(\w+)\s+with\s+(\w+)\s*$")
_JOIN_ON_RE = re.compile(r"^\s*(\w+)\s+on\s+(.+)$")
_AGG_CALL_RE = re.compile(r"^(count|sum|avg|min|max|stddev|median)\s*\((.*)\)\s*(\{.*\})?\s*$", re.S)
_COUNT_DISTINCT_RE = re.compile(r"^count\s*\(\s*distinct\s+(.+?)\s*\)\s*(\{.*\})?\s*$", re.S)
_CD_FUNC_RE = re.compile(r"^count_distinct\s*\(\s*(.+?)\s*\)\s*(\{.*\})?\s*$", re.S)
_WHERE_SUFFIX_RE = re.compile(r"\{\s*where:\s*(.+?)\s*\}\s*$", re.S)


def _strip_comments(text: str) -> str:
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    return text


def _block(text: str, open_idx: int) -> tuple[str, int]:
    """Return (body, end_index) of the brace block opening at open_idx."""
    depth = 0
    for i in range(open_idx, len(text)):
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[open_idx + 1 : i], i
    return text[open_idx + 1 :], len(text)


_SQL_KEYWORDS = {"and", "or", "not", "in", "is", "null", "true", "false",
                 "like", "between", "case", "when", "then", "else", "end"}


def _qualify_bare(text: str, model: str) -> str:
    """Prefix bare identifiers (not already dotted, not literals/keywords/
    function calls) with ``model.``."""
    out = []
    i = 0
    for m in re.finditer(r"'[^']*'|\"[^\"]*\"|[A-Za-z_]\w*(?:\s*\()?|[^A-Za-z_']+", text):
        tok = m.group(0)
        if (tok and tok[0].isalpha() or tok.startswith("_")) and not tok.endswith("("):
            prev_end = m.start()
            prev = text[prev_end - 1] if prev_end else ""
            if prev != "." and tok.lower() not in _SQL_KEYWORDS:
                out.append(f"{model}.{tok}")
                continue
        out.append(tok)
        i = m.end()
    return "".join(out)


def _malloy_expr_to_sql(expr: str) -> str:
    """Malloy scalar expr -> Spark SQL (the common shapes)."""
    expr = expr.strip()
    # x::date / x::timestamp casts
    expr = re.sub(r"(\w+)::(\w+)", r"CAST(\1 AS \2)", expr)
    return expr


class MalloyAdapter(BaseAdapter):
    def parse_file(self, layer, path: str) -> None:
        with open(path) as fh:
            text = fh.read()
        self.parse_text(layer, text)

    def parse(self, layer, data) -> None:  # dict contract not used for malloy
        raise NotImplementedError("Malloy is text, use parse_file/parse_text")

    def parse_text(self, layer, text: str) -> None:
        text = _strip_comments(text)
        for m in _SOURCE_RE.finditer(text):
            name, binding = m.group(1), m.group(2)
            if m.group(0).rstrip().endswith("{"):
                body, _end = _block(text, m.start() + m.group(0).rindex("{"))
            else:
                body = ""  # bare source: no extend block
            model = self._parse_source(name, binding, body)
            if model is not None:
                try:
                    layer.add_model(model)
                except Exception:
                    pass  # duplicate across imports: first wins

    def _parse_source(self, name: str, binding: str, body: str) -> Model | None:
        table = sql = None
        tm = _TABLE_RE.search(binding)
        if tm:
            table = tm.group(1)
            # 'orders.parquet' style: bind to bare table name
            if table.endswith((".parquet", ".csv", ".json")):
                table = table.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        else:
            sm = _SQL_RE.search(binding)
            if sm:
                sql = sm.group(1).strip()
            elif re.match(r"^\w+$", binding.strip()):
                table = binding.strip()  # source extension: reuse table name
            else:
                return None

        pk = "id"
        dims: list[Dimension] = []
        mets: list[Metric] = []
        rels: list[Relationship] = []
        row_filters: list[str] = []

        section = None
        for raw in body.splitlines():
            line = raw.rstrip()
            if not line.strip():
                continue
            header = re.match(r"^\s*(dimension|measure|join_one|join_many|join_cross|where|primary_key|declare)\s*:\s*(.*)$", line)
            if header:
                section = header.group(1)
                rest = header.group(2).strip()
                if section == "primary_key":
                    pk = rest
                    section = None
                    continue
                if section == "where":
                    if rest:
                        row_filters.append(_malloy_expr_to_sql(rest))
                    section = None
                    continue
                if not rest:
                    continue
                line = rest
            else:
                line = line.strip()
            if section in ("dimension", "declare"):
                self._add_field(line, dims, mets)
            elif section == "measure":
                self._add_measure(line, mets)
            elif section in ("join_one", "join_many", "join_cross"):
                self._add_join(section, line, rels)
        # qualify bare column refs in measure filters with the model name so
        # the generator projects them into the model CTE
        for met in mets:
            met.filters = [_qualify_bare(f, name) for f in met.filters]
        return Model(
            name=name, table=table, sql=sql, primary_key=pk,
            dimensions=dims, metrics=mets, relationships=rels,
            row_filters=row_filters,
        )

    def _add_field(self, line: str, dims: list[Dimension], mets: list[Metric]) -> None:
        fm = _FIELD_RE.match(line)
        if not fm:
            return
        fname, expr = fm.group(1).strip().replace(" ", "_"), fm.group(2).strip()
        if _AGG_CALL_RE.match(expr) or _COUNT_DISTINCT_RE.match(expr) or _CD_FUNC_RE.match(expr):
            self._add_measure(line, mets)  # declare: can hold measures
            return
        sql = _malloy_expr_to_sql(expr)
        dtype = "categorical"
        low = sql.lower()
        if "date_trunc" in low or "as date" in low or "as timestamp" in low:
            dtype = "time"
        elif re.search(r"[<>=]|\bis\b", low) and "_is_" not in low:
            dtype = "boolean"
        dims.append(Dimension(name=fname, sql=None if sql == fname else sql, type=dtype))

    def _add_measure(self, line: str, mets: list[Metric]) -> None:
        fm = _FIELD_RE.match(line)
        if not fm:
            return
        fname, expr = fm.group(1).strip().replace(" ", "_"), fm.group(2).strip()
        filters: list[str] = []
        wm = _WHERE_SUFFIX_RE.search(expr)
        if wm:
            filters = [_malloy_expr_to_sql(wm.group(1))]
            expr = expr[: wm.start()].strip()
        cd = _COUNT_DISTINCT_RE.match(expr) or _CD_FUNC_RE.match(expr)
        if cd:
            mets.append(Metric(name=fname, agg="count_distinct",
                               sql=_malloy_expr_to_sql(cd.group(1)), filters=filters))
            return
        am = _AGG_CALL_RE.match(expr)
        if am:
            agg, inner = am.group(1), am.group(2).strip()
            mets.append(Metric(
                name=fname, agg=agg,
                sql=None if not inner or agg == "count" else _malloy_expr_to_sql(inner),
                filters=filters,
            ))
            return
        # formula over other measures -> derived
        mets.append(Metric(name=fname, type="derived", expr=_malloy_expr_to_sql(expr), filters=filters))

    def _add_join(self, kind: str, line: str, rels: list[Relationship]) -> None:
        wm = _JOIN_WITH_RE.match(line)
        if wm:
            target, fk = wm.group(1), wm.group(2)
            rels.append(Relationship(name=target, type="many_to_one", foreign_key=fk))
            return
        om = _JOIN_ON_RE.match(line)
        if om:
            target, cond = om.group(1), om.group(2).strip()
            rtype = "one_to_many" if kind == "join_many" else "many_to_one"
            # `target.col = col` equi-join -> key pair; else custom SQL
            em = re.match(rf"^{target}\.(\w+)\s*=\s*(\w+)$", cond)
            if em:
                if kind == "join_many":
                    rels.append(Relationship(name=target, type="one_to_many",
                                             foreign_key=em.group(1)))
                else:
                    rels.append(Relationship(name=target, type="many_to_one",
                                             foreign_key=em.group(2), primary_key=em.group(1)))
            else:
                cond_sql = re.sub(rf"\b{target}\.", "{to}.", cond)
                cond_sql = re.sub(r"(?<![\w.{])(\w+)(?=\s*=)", r"{from}.\1", cond_sql, count=0)
                rels.append(Relationship(name=target, type=rtype, sql=cond_sql))
        elif kind == "join_cross" and re.match(r"^\w+$", line.strip()):
            rels.append(Relationship(name=line.strip(), type="cross"))


# ----------------------------------------------------------------------
# export (reference adapters/malloy.py export contract)
# ----------------------------------------------------------------------

def export_malloy(graph, connection: str = "spark") -> str:
    """Graph -> Malloy source text. Time dimensions are emitted as
    ``col::timestamp`` casts so the import re-derives the time type;
    simple aggs render as ``sum(expr)`` etc.; one metric filter rides
    the ``{ where: ... }`` suffix."""
    out: list[str] = []
    for model in graph.models.values():
        if model.sql:
            binding = f'{connection}.sql("""{model.sql}""")'
        else:
            binding = f"{connection}.table('{model.table or model.name}')"
        lines = [f"source: {model.name} is {binding} extend {{"]
        pk = model.pk_list()
        if len(pk) == 1 and pk != ["id"]:
            lines.append(f"  primary_key: {pk[0]}")
        dims = [d for d in model.dimensions if not d.window]
        if dims:
            lines.append("  dimension:")
            for d in dims:
                expr = d.sql or d.name
                if d.type == "time" and re.fullmatch(r"\w+", expr):
                    expr = f"{expr}::timestamp"
                if expr == d.name:
                    # malloy needs `x is <expr>`; a self-ref is fine
                    expr = d.name
                lines.append(f"    {d.name} is {expr}")
        mets = []
        for m in model.metrics:
            if m.is_simple and m.agg in ("sum", "avg", "min", "max",
                                         "stddev", "median", "count",
                                         "count_distinct"):
                if m.agg == "count" and not m.sql:
                    body = "count()"
                elif m.agg == "count_distinct":
                    body = f"count(distinct {m.sql or '*'})"
                else:
                    body = f"{m.agg}({m.sql or ''})"
                if m.filters:
                    body += " { where: " + " and ".join(m.filters) + " }"
                mets.append(f"    {m.name} is {body}")
            elif m.type == "derived" and m.expr:
                mets.append(f"    {m.name} is {m.expr}")
            elif m.type == "ratio" and m.numerator and m.denominator:
                mets.append(
                    f"    {m.name} is {m.numerator} / nullif({m.denominator}, 0)"
                )
        if mets:
            lines.append("  measure:")
            lines.extend(mets)
        for r in model.relationships:
            if r.through:
                continue
            if r.type == "cross":
                lines.append(f"  join_cross: {r.name}")
                continue
            target = graph.models.get(r.name)
            tpk = target.pk_list() if target else ["id"]
            if r.type == "one_to_many":
                fks = r.fk_list() or tpk
                lpk = r.pk_list(model.pk_list())
                if len(fks) == 1:
                    lines.append(
                        f"  join_many: {r.name} on {r.name}.{fks[0]} = {lpk[0]}"
                    )
            elif r.type in ("many_to_one", "one_to_one"):
                fks = r.fk_list()
                pks = r.pk_list(tpk)
                if len(fks) == 1 and pks == tpk:
                    lines.append(f"  join_one: {r.name} with {fks[0]}")
                elif len(fks) == 1:
                    lines.append(
                        f"  join_one: {r.name} on {r.name}.{pks[0]} = {fks[0]}"
                    )
        lines.append("}")
        out.append("\n".join(lines))
    return "\n\n".join(out) + "\n"
