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
        from sidemantic_spark.authoring.yaml_io import yaml_safe_load_all

        with open(path) as fh:
            text = fh.read()
        docs = [d for d in yaml_safe_load_all(text) if d]
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


# ----------------------------------------------------------------------
# shared export helpers (reference adapters/base.py:9 export contract)
# ----------------------------------------------------------------------

_AGG_FN = {
    "sum": "SUM", "avg": "AVG", "min": "MIN", "max": "MAX",
    "median": "MEDIAN", "stddev": "STDDEV", "stddev_pop": "STDDEV_POP",
    "variance": "VARIANCE", "variance_pop": "VAR_POP",
}


_AGG_SPLIT_RE = re.compile(
    r"^\s*(sum|count|count_distinct|approx_count_distinct|avg|average|min|max|"
    r"median|stddev)\s*\(\s*(distinct\s+)?(.*?)\s*\)\s*$",
    re.I | re.S,
)


def split_simple_aggregate(expr: str) -> tuple[str, str] | None:
    """``SUM(amount)`` -> ("sum", "amount"); None for anything more
    complex (nested parens inside the argument are fine, a second
    top-level call or a wrapping operator is not)."""
    m = _AGG_SPLIT_RE.match(expr or "")
    if not m:
        return None
    # the whole expression must be ONE call: the paren opened after the
    # function name must close at the very end (a count-equality check
    # would wrongly accept close-then-open shapes like SUM(a) + SUM(b))
    s = expr.strip()
    open_i = s.index("(")
    depth = 0
    close_i = -1
    for i in range(open_i, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                close_i = i
                break
    if close_i != len(s) - 1:
        return None
    inner = m.group(3)
    agg = {"average": "avg"}.get(m.group(1).lower(), m.group(1).lower())
    if m.group(2):
        if agg != "count":
            return None
        agg = "count_distinct"
    return agg, inner.strip()


def simple_agg_sql(metric) -> str | None:
    """Render a simple-agg metric as a plain SQL aggregate call
    (``SUM(x)`` / ``COUNT(*)`` / ``COUNT(DISTINCT x)``), the lingua
    franca of expression-based formats (Rill, Superset, BSL, OSI).
    Returns None for non-simple metrics."""
    if not metric.is_simple:
        return None
    if metric.agg == "count":
        return f"COUNT({metric.sql})" if metric.sql else "COUNT(*)"
    if metric.agg == "count_distinct":
        return f"COUNT(DISTINCT {metric.sql or '*'})"
    if metric.agg == "approx_count_distinct":
        return f"APPROX_COUNT_DISTINCT({metric.sql or '*'})"
    fn = _AGG_FN.get(metric.agg)
    return f"{fn}({metric.sql or '*'})" if fn else None


def m2o_edges(graph):
    """Canonical equi-join edges for export: yields
    ``(owner_name, target_name, fk_cols_on_owner, pk_cols_on_target,
    rel_type, join_type)``.

    Formats that declare joins as "fk on the owning table = pk on the
    joined table" (Hex, Omni, Snowflake, ThoughtSpot, TMDL, Holistics,
    OSI, ...) cannot express our graph's one_to_many orientation, where
    ``foreign_key`` names the *child* column — so one_to_many edges are
    re-emitted as the equivalent many_to_one on the child model (the
    graph adds the reverse edge on import, preserving connectivity and
    join keys exactly). Cross joins, junction (through) edges, and
    custom-SQL conditions are skipped — callers with a native construct
    for those handle them separately.
    """
    seen = set()
    out = []
    for model in graph.models.values():
        for rel in model.relationships:
            if rel.type == "cross" or rel.through or rel.sql:
                continue
            target = graph.models.get(rel.name)
            tpk = target.pk_list() if target else ["id"]
            if rel.type == "one_to_many":
                owner, tgt = rel.name, model.name
                fks = rel.fk_list() or tpk
                pks = rel.pk_list(model.pk_list())
                rtype = "many_to_one"
            else:
                owner, tgt = model.name, rel.name
                if rel.type in ("one_to_one",):
                    fks = rel.pk_list(model.pk_list())
                    pks = rel.fk_list() or tpk
                else:
                    fks = rel.fk_list() or model.pk_list()
                    pks = rel.pk_list(tpk)
                rtype = rel.type
            if not fks or len(fks) != len(pks):
                continue
            key = (owner, tgt, tuple(fks))
            if key in seen:
                continue
            seen.add(key)
            out.append((owner, tgt, list(fks), list(pks), rtype,
                        getattr(rel, "join_type", None)))
    return out


_SQL_KEYWORD_TOKENS = {
    "and", "or", "not", "in", "is", "null", "true", "false", "like",
    "between", "case", "when", "then", "else", "end", "as", "distinct",
    "interval", "day", "month", "year", "decimal", "double", "bigint",
    "int", "integer", "string", "varchar", "boolean", "date", "timestamp",
}


def qualify_columns(sql: str, model_name: str) -> str:
    """Prefix bare column identifiers with ``model_name.`` — inverse of
    the per-adapter "strip owner qualification" import step. Function
    calls, dotted refs, quoted literals, keywords and type names are
    left alone."""

    def repl(m: re.Match) -> str:
        tok = m.group(0)
        if tok[0] in "'\"" or tok.endswith("("):
            return tok
        prev = sql[m.start() - 1] if m.start() else ""
        if prev == "." or tok.lower() in _SQL_KEYWORD_TOKENS:
            return tok
        nxt = sql[m.end():m.end() + 1]
        if nxt == ".":
            return tok  # already a qualifier itself
        return f"{model_name}.{tok}"

    return re.sub(r"'[^']*'|\"[^\"]*\"|[A-Za-z_]\w*\s*\(|[A-Za-z_]\w*", repl, sql)
