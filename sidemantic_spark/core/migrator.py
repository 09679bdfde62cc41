"""SQL-corpus migration analyzer (reference ``core/migrator.py:195``).

Takes raw warehouse SQL queries and determines, against a semantic
layer:

- which queries the layer can already answer (``can_rewrite``), with
  the equivalent semantic-SQL rewrite,
- which tables have no model and which aggregates/columns have no
  metric/dimension (the coverage gaps), and
- for uncovered tables, generated model definitions (``generate``)
  bootstrapped from how the corpus actually queries them.

The reference parses with sqlglot; this environment has none, so the
analyzer uses the same regex/recursive approach as our semantic-SQL
rewriter — deliberately scoped to the warehouse-SQL shapes a metrics
migration actually encounters (aggregate GROUP BY queries over one or
two equi-joined tables, WHERE conjunctions, ORDER/LIMIT). Anything it
cannot classify is reported as not-rewritable with a reason, never
silently mis-migrated.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sidemantic_spark.core.model import Dimension, Metric, Model

_AGG_RE = re.compile(
    r"\b(SUM|COUNT|AVG|MIN|MAX|MEDIAN|STDDEV|VARIANCE)\s*\(\s*"
    r"(DISTINCT\s+)?([^()]*?|\*)\s*\)(?:\s+AS\s+(\w+))?",
    re.I,
)
_FROM_RE = re.compile(r"\bFROM\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?", re.I)
_JOIN_RE = re.compile(
    r"\bJOIN\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+([^()]+?)(?=\bJOIN\b|\bWHERE\b|\bGROUP\b|\bORDER\b|\bLIMIT\b|$)",
    re.I | re.S,
)
_GROUP_RE = re.compile(r"\bGROUP\s+BY\s+(.+?)(?:\bHAVING\b|\bORDER\b|\bLIMIT\b|$)", re.I | re.S)
_WHERE_RE = re.compile(r"\bWHERE\s+(.+?)(?:\bGROUP\b|\bORDER\b|\bLIMIT\b|$)", re.I | re.S)
_SELECT_RE = re.compile(r"\bSELECT\s+(.+?)\bFROM\b", re.I | re.S)
_LIMIT_RE = re.compile(r"\bLIMIT\s+(\d+)", re.I)
_ORDER_RE = re.compile(r"\bORDER\s+BY\s+(.+?)(?:\bLIMIT\b|$)", re.I | re.S)

_AGG_NAME = {
    "sum": "sum", "count": "count", "avg": "avg", "min": "min",
    "max": "max", "median": "median", "stddev": "stddev",
    "variance": "variance",
}


@dataclass
class QueryAnalysis:
    """Per-query coverage verdict (reference ``core/migrator.py:60``
    QueryAnalysis)."""

    sql: str
    tables: list[str] = field(default_factory=list)
    matched_models: dict[str, str] = field(default_factory=dict)  # table -> model
    missing_tables: list[str] = field(default_factory=list)
    matched_metrics: list[str] = field(default_factory=list)  # model.metric
    missing_metrics: list[tuple[str, str, str | None]] = field(default_factory=list)
    matched_dimensions: list[str] = field(default_factory=list)
    missing_dimensions: list[tuple[str, str]] = field(default_factory=list)
    can_rewrite: bool = False
    rewritten: str | None = None
    reasons: list[str] = field(default_factory=list)


class Migrator:
    """Coverage analyzer + model generator over a SQL query corpus."""

    def __init__(self, layer) -> None:
        self.layer = layer
        self.table_to_model: dict[str, str] = {}
        for name, model in layer.graph.models.items():
            if model.table:
                self.table_to_model[model.table.lower()] = name
                # schema-qualified tables also match on the bare name
                if "." in model.table:
                    self.table_to_model[model.table.rsplit(".", 1)[-1].lower()] = name
            self.table_to_model[name.lower()] = name

    # -- analysis -----------------------------------------------------

    def analyze(self, sql: str) -> QueryAnalysis:
        qa = QueryAnalysis(sql=sql.strip())
        text = _strip_comments(sql)
        if re.search(r"\b(UNION|INTERSECT|EXCEPT|WITH)\b", text, re.I):
            qa.reasons.append("set operations / CTEs: migrate branches separately")
            return qa
        fm = _FROM_RE.search(text)
        if not fm:
            qa.reasons.append("no FROM clause found")
            return qa
        alias_to_table: dict[str, str] = {}
        base_table = fm.group(1)
        alias_to_table[(fm.group(2) or base_table.rsplit(".", 1)[-1]).lower()] = base_table
        qa.tables.append(base_table)
        for jm in _JOIN_RE.finditer(text):
            qa.tables.append(jm.group(1))
            alias_to_table[(jm.group(2) or jm.group(1).rsplit(".", 1)[-1]).lower()] = jm.group(1)

        for t in qa.tables:
            model = self.table_to_model.get(t.lower()) or self.table_to_model.get(
                t.rsplit(".", 1)[-1].lower()
            )
            if model:
                qa.matched_models[t] = model
            else:
                qa.missing_tables.append(t)
        if qa.missing_tables:
            qa.reasons.append(
                f"no model for table(s): {', '.join(qa.missing_tables)}"
            )

        def resolve_col(ref: str) -> tuple[str | None, str]:
            """alias-qualified or bare column -> (model, column)."""
            ref = ref.strip().strip("`\"")
            if "." in ref:
                alias, col = ref.rsplit(".", 1)
                table = alias_to_table.get(alias.lower(), alias)
                return qa.matched_models.get(table), col
            # bare column: attribute to the single matched model, else first
            models = list(dict.fromkeys(qa.matched_models.values()))
            for mname in models:
                model = self.layer.graph.models[mname]
                if _model_has_column(model, ref):
                    return mname, ref
            return (models[0] if models else None), ref

        select_m = _SELECT_RE.search(text)
        select_body = select_m.group(1) if select_m else ""
        sel_metrics: list[str] = []
        for am in _AGG_RE.finditer(select_body):
            fn, distinct, inner, alias = (
                am.group(1).lower(), am.group(2), am.group(3).strip(), am.group(4),
            )
            agg = "count_distinct" if (fn == "count" and distinct) else _AGG_NAME[fn]
            col = None if inner in ("*", "") else inner
            mname, bare = resolve_col(col) if col else (None, None)
            if col is None:
                models = list(dict.fromkeys(qa.matched_models.values()))
                mname = models[0] if models else None
            if mname is None:
                qa.missing_metrics.append(("?", agg, col))
                continue
            metric = self._find_metric(mname, agg, bare)
            if metric:
                qa.matched_metrics.append(f"{mname}.{metric}")
                sel_metrics.append(f"{mname}.{metric}")
            else:
                qa.missing_metrics.append((mname, agg, bare))

        sel_dims: list[str] = []
        gm = _GROUP_RE.search(text)
        if gm:
            for ref in _split_commas(gm.group(1)):
                ref = ref.strip()
                if re.fullmatch(r"\d+", ref):
                    qa.reasons.append("positional GROUP BY: resolve manually")
                    continue
                mname, col = resolve_col(ref)
                if mname is None:
                    qa.missing_dimensions.append(("?", col))
                    continue
                dim = self._find_dimension(mname, col)
                if dim:
                    qa.matched_dimensions.append(f"{mname}.{dim}")
                    sel_dims.append(f"{mname}.{dim}")
                else:
                    qa.missing_dimensions.append((mname, col))

        if qa.missing_metrics:
            qa.reasons.append(
                "no metric for: " + ", ".join(
                    f"{m}.{a}({c or '*'})" for m, a, c in qa.missing_metrics
                )
            )
        if qa.missing_dimensions:
            qa.reasons.append(
                "no dimension for: " + ", ".join(
                    f"{m}.{c}" for m, c in qa.missing_dimensions
                )
            )
        # joins must be representable by declared relationship paths
        if not qa.missing_tables and len(set(qa.matched_models.values())) > 1:
            models = list(dict.fromkeys(qa.matched_models.values()))
            for other in models[1:]:
                try:
                    self.layer.graph.find_path(models[0], other)
                except Exception as exc:
                    qa.reasons.append(f"no join path {models[0]} -> {other}: {exc}")

        where_sql = None
        wm = _WHERE_RE.search(text)
        if wm and not qa.missing_tables:
            cond = " ".join(wm.group(1).split())
            where_sql, unresolved = self._qualify_filter(cond, qa, alias_to_table)
            if unresolved:
                qa.missing_dimensions.extend(
                    (m or "?", c) for m, c in unresolved
                )
                qa.reasons.append(
                    "filter columns without dimensions: "
                    + ", ".join(c for _m, c in unresolved)
                )

        qa.can_rewrite = not qa.reasons and bool(sel_metrics or sel_dims)
        if not qa.can_rewrite:
            if not qa.reasons:
                qa.reasons.append("no aggregates or group-by columns recognized")
            return qa

        parts = [f"SELECT {', '.join(sel_dims + sel_metrics)}"]
        parts.append(f"FROM {next(iter(qa.matched_models.values()))}")
        if where_sql:
            parts.append(f"WHERE {where_sql}")
        om = _ORDER_RE.search(text)
        if om:
            parts.append(f"ORDER BY {' '.join(om.group(1).split()).rstrip(',')}")
        lm = _LIMIT_RE.search(text)
        if lm:
            parts.append(f"LIMIT {lm.group(1)}")
        qa.rewritten = " ".join(parts)
        return qa

    def _find_metric(self, model_name: str, agg: str, col: str | None) -> str | None:
        model = self.layer.graph.models[model_name]
        for m in model.metrics:
            if not m.is_simple or m.agg != agg:
                continue
            msql = (m.sql or "").lower()
            if col is None and m.sql is None:
                return m.name
            if col is not None and (
                msql == col.lower()
                # decimal-exactness casts still cover the raw column
                or re.fullmatch(
                    rf"cast\s*\(\s*{re.escape(col.lower())}\s+as\s+[\w(), ]+\)", msql
                )
            ):
                return m.name
        return None

    def _find_dimension(self, model_name: str, col: str) -> str | None:
        model = self.layer.graph.models[model_name]
        for d in model.dimensions:
            if d.name.lower() == col.lower() or (d.sql or "").lower() == col.lower():
                return d.name
        return None

    _FILTER_KEYWORDS = {
        "and", "or", "not", "in", "is", "null", "like", "between",
        "true", "false", "case", "when", "then", "else", "end",
        "interval", "date", "timestamp", "current_date", "current_timestamp",
    }

    def _qualify_filter(
        self, cond: str, qa: QueryAnalysis, alias_to_table: dict
    ) -> tuple[str, list[tuple[str | None, str]]]:
        """Rewrite physical column refs in a WHERE conjunction to
        model.dimension refs. String literals, numbers, keywords and
        function calls pass through; a column no dimension covers is
        returned as unresolved (the query then cannot be auto-migrated
        — never emit SQL that silently references a raw column)."""
        unresolved: list[tuple[str | None, str]] = []

        def repl(m: re.Match) -> str:
            ref = m.group(0)
            if ref[0] in "'\"" or ref.rstrip().endswith("("):
                return ref
            if ref.lower() in self._FILTER_KEYWORDS:
                return ref
            if "." in ref:
                alias, col = ref.rsplit(".", 1)
                mname = qa.matched_models.get(alias_to_table.get(alias.lower(), alias))
            else:
                mname, col = None, ref
                for cand in dict.fromkeys(qa.matched_models.values()):
                    if self._find_dimension(cand, col):
                        mname = cand
                        break
                if mname is None:
                    mname = next(iter(qa.matched_models.values()), None)
            dim = self._find_dimension(mname, col) if mname else None
            if dim:
                return f"{mname}.{dim}"
            unresolved.append((mname, col))
            return ref

        out = re.sub(
            r"'[^']*'|\"[^\"]*\"|[a-zA-Z_]\w*\s*\(|[a-zA-Z_]\w*(?:\.\w+)?",
            repl, cond,
        )
        return out, unresolved

    def check(self, sqls: list[str]) -> dict:
        """Corpus coverage report (``migrate check``)."""
        analyses = [self.analyze(s) for s in sqls if s.strip()]
        rewritable = [a for a in analyses if a.can_rewrite]
        missing_tables: dict[str, int] = {}
        missing_metrics: dict[str, int] = {}
        for a in analyses:
            for t in a.missing_tables:
                missing_tables[t] = missing_tables.get(t, 0) + 1
            for mname, agg, col in a.missing_metrics:
                key = f"{mname}.{agg}({col or '*'})"
                missing_metrics[key] = missing_metrics.get(key, 0) + 1
        return {
            "total": len(analyses),
            "rewritable": len(rewritable),
            "coverage": round(len(rewritable) / len(analyses), 4) if analyses else 1.0,
            "missing_tables": missing_tables,
            "missing_metrics": missing_metrics,
            "analyses": analyses,
        }

    # -- generation ---------------------------------------------------

    def generate(self, sqls: list[str]) -> dict[str, Model]:
        """Bootstrap Model definitions for uncovered tables from how the
        corpus queries them: GROUP BY columns become dimensions,
        aggregate calls become metrics (``migrate generate``)."""
        proposed: dict[str, Model] = {}
        for sql in sqls:
            if not sql.strip():
                continue
            text = _strip_comments(sql)
            fm = _FROM_RE.search(text)
            if not fm:
                continue
            tables = [fm.group(1)] + [j.group(1) for j in _JOIN_RE.finditer(text)]
            for table in tables:
                if self.table_to_model.get(table.lower()):
                    continue
                name = table.rsplit(".", 1)[-1]
                model = proposed.get(name) or Model(
                    name=name, table=table, primary_key="id",
                    dimensions=[], metrics=[],
                )
                proposed[name] = model
                select_m = _SELECT_RE.search(text)
                body = select_m.group(1) if select_m else ""
                for am in _AGG_RE.finditer(body):
                    fn, distinct, inner, alias = (
                        am.group(1).lower(), am.group(2),
                        am.group(3).strip(), am.group(4),
                    )
                    agg = "count_distinct" if (fn == "count" and distinct) else _AGG_NAME[fn]
                    col = None if inner in ("*", "") else inner.rsplit(".", 1)[-1]
                    mname = alias or (f"{agg}_{col}" if col else "row_count")
                    mname = re.sub(r"\W+", "_", mname).lower()
                    if model.metric(mname) is None:
                        # add_metric keeps the name-lookup cache in sync
                        # (a bare list append would let repeated corpus
                        # queries re-add the same metric)
                        model.add_metric(Metric(name=mname, agg=agg, sql=col))
                gm = _GROUP_RE.search(text)
                if gm:
                    for ref in _split_commas(gm.group(1)):
                        col = ref.strip().rsplit(".", 1)[-1]
                        if re.fullmatch(r"\w+", col) and model.dimension(col) is None:
                            model.add_dimension(Dimension(name=col))
        return proposed

    def generate_yaml(self, sqls: list[str]) -> str:
        """Generated models as native YAML (the ``--output`` payload)."""
        from sidemantic_spark.authoring.yaml_io import export_yaml
        from sidemantic_spark.core.graph import SemanticGraph

        graph = SemanticGraph()
        for model in self.generate(sqls).values():
            graph.add_model(model)
        return export_yaml(graph)


def _strip_comments(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", "", sql)
    return re.sub(r"/\*.*?\*/", "", sql, flags=re.S)


def _split_commas(s: str) -> list[str]:
    """Top-level comma split (parens-aware)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _model_has_column(model: Model, col: str) -> bool:
    low = col.lower()
    if any(d.name.lower() == low or (d.sql or "").lower() == low for d in model.dimensions):
        return True
    if any((m.sql or "").lower() == low for m in model.metrics):
        return True
    return low in [c.lower() for c in model.pk_list()]
