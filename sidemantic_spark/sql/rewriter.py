"""Semantic-SQL rewriter: plain SELECT text over models -> compiled
Spark SQL.

Re-expression of the reference's second compiler
(``sql/query_rewriter.py:170`` ``QueryRewriter.rewrite``): users write
``SELECT orders.revenue, orders.status FROM orders WHERE ...`` treating
models as tables and metrics/dimensions as columns; the rewriter
extracts metrics/dims/filters/order/limit (ref ``:5898-6008``,
``:6009-6185``), handles top-level set operations per branch (ref
``:5330-5392``), and hands a structured query to the generator.

sqlglot is unavailable here, so parsing is a quote/paren-aware clause
splitter over the supported semantic-SQL surface. Unsupported SQL
raises with a pointer to the structured API; arbitrary warehouse SQL
should go straight to ``spark.sql``.
"""

from __future__ import annotations

import re

from sidemantic_spark.sql.generator import QueryCompileError, QuerySpec

_CLAUSES = ["WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT", "OFFSET"]
_SET_OPS = ["UNION ALL", "UNION", "INTERSECT", "EXCEPT"]


def _strip(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", "", sql)
    return sql.strip().rstrip(";").strip()


def _top_level_split(sql: str, keyword: str) -> list[str]:
    """Split on a keyword at paren/quote depth 0 (case-insensitive,
    word-bounded)."""
    parts = []
    depth = 0
    in_quote = False
    i = 0
    last = 0
    upper = sql.upper()
    kw = keyword.upper()
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (
                depth == 0
                and upper.startswith(kw, i)
                and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
                and (
                    i + len(kw) >= len(sql)
                    or not (sql[i + len(kw)].isalnum() or sql[i + len(kw)] == "_")
                )
            ):
                parts.append(sql[last:i])
                last = i + len(kw)
                i += len(kw)
                continue
        i += 1
    parts.append(sql[last:])
    return parts


def _split_items(text: str) -> list[str]:
    """Split a select/order list on top-level commas."""
    items = []
    depth = 0
    in_quote = False
    buf = []
    for ch in text:
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                items.append("".join(buf).strip())
                buf = []
                continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        items.append(tail)
    return items


class SemanticSqlRewriter:
    def __init__(self, layer) -> None:
        self.layer = layer
        self._cache: dict = {}

    # -- public -------------------------------------------------------

    def rewrite(self, sql: str) -> str:
        """Semantic SQL text -> executable Spark SQL."""
        key = (self.layer.graph.generation, sql)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        out = self._rewrite_node(_strip(sql))
        self._cache[key] = out
        return out

    def explain(self, sql: str) -> dict:
        """Rewrite plan summary (reference's RewriteExplanation)."""
        compiled = self.rewrite(sql)
        first = compiled.splitlines()[0] if compiled else ""
        plan = "unknown"
        models = ""
        m = re.search(r"plan=(\S+)", first)
        if m:
            plan = m.group(1)
        m = re.search(r"models=(\S+)", first)
        if m:
            models = m.group(1)
        return {
            "input_sql": sql,
            "compiled_sql": compiled,
            "plan": plan,
            "models": models.split(",") if models else [],
            "used_preagg": "used_preagg=" in first,
        }

    # -- internals ----------------------------------------------------

    def _rewrite_node(self, sql: str) -> str:
        # top-level set operations: rewrite each branch independently
        # (ref sql/query_rewriter.py:4974-4983, :5330-5392)
        for op in _SET_OPS:
            parts = _top_level_split(sql, op)
            if len(parts) > 1:
                branches = [self._rewrite_node(p.strip()) for p in parts]
                joined = f"\n{op}\n".join(f"({b})" for b in branches)
                return joined
        return self._rewrite_select(sql)

    def _rewrite_select(self, sql: str) -> str:
        m = re.match(r"^\s*SELECT\s+(?:DISTINCT\s+)?(.*)$", sql, re.IGNORECASE | re.DOTALL)
        if not m:
            raise QueryCompileError(f"semantic SQL must start with SELECT: {sql[:80]!r}")
        rest = m.group(1)
        from_parts = _top_level_split(rest, "FROM")
        if len(from_parts) < 2:
            raise QueryCompileError("semantic SQL needs a FROM clause")
        select_list = from_parts[0].strip()
        tail = "FROM".join(from_parts[1:]) if False else from_parts[1]

        clause_vals: dict[str, str] = {}
        cur = tail
        # peel clauses right-to-left so earlier splits don't eat later
        # keywords
        for kw in reversed(_CLAUSES):
            parts = _top_level_split(cur, kw)
            if len(parts) > 1:
                clause_vals[kw] = parts[-1].strip()
                cur = parts[0]
        from_clause = cur.strip()

        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", from_clause):
            raise QueryCompileError(
                f"semantic FROM must name a single model (joins come from the "
                f"relationship graph): {from_clause!r}"
            )
        base_model = from_clause
        graph = self.layer.graph
        model = graph.get_model(base_model)

        metrics: list[str] = []
        dimensions: list[str] = []
        for item in _split_items(select_list):
            ref, alias = _split_item_alias(item)
            target = self._classify_ref(ref, base_model)
            if target is None:
                raise QueryCompileError(
                    f"unsupported select item {item!r}: semantic SQL items must "
                    "be model.metric or model.dimension[__grain] references "
                    "(use the structured query() API for expressions)"
                )
            kind, full = target
            rendered = f"{full} AS {alias}" if alias else full
            (metrics if kind == "metric" else dimensions).append(rendered)

        filters = []
        if "WHERE" in clause_vals:
            filters.append(self._qualify_bare(clause_vals["WHERE"], base_model))
        order_by = []
        if "ORDER BY" in clause_vals:
            order_by = [
                self._qualify_bare(o, base_model) for o in _split_items(clause_vals["ORDER BY"])
            ]
        limit = int(clause_vals["LIMIT"]) if "LIMIT" in clause_vals else None
        offset = int(clause_vals["OFFSET"]) if "OFFSET" in clause_vals else None
        if "HAVING" in clause_vals:
            filters.append(self._qualify_bare(clause_vals["HAVING"], base_model))
        # GROUP BY is accepted and validated implicitly: grouping is
        # derived from the dimension set (reference behavior)

        spec = QuerySpec(
            metrics=metrics,
            dimensions=dimensions,
            filters=filters,
            order_by=order_by,
            limit=limit,
            offset=offset,
            ungrouped=not metrics and _wants_ungrouped(sql),
        )
        return self.layer.generator.generate(spec)

    def _classify_ref(self, ref: str, base_model: str) -> tuple[str, str] | None:
        ref = ref.strip()
        graph = self.layer.graph
        m = re.fullmatch(
            r"([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*?)(?:__([a-z]+))?",
            ref,
        )
        if m:
            model_name, field, grain = m.group(1), m.group(2), m.group(3)
            if model_name not in graph.models:
                return None
            model = graph.get_model(model_name)
            if model.metric(field) is not None and grain is None:
                return ("metric", ref)
            if model.dimension(field) is not None:
                return ("dim", ref)
            return None
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*(?:__[a-z]+)?", ref):
            # bare column: resolve against the base model
            base = ref.split("__", 1)[0]
            model = graph.get_model(base_model)
            if model.metric(base) is not None:
                return ("metric", f"{base_model}.{ref}")
            if model.dimension(base) is not None:
                return ("dim", f"{base_model}.{ref}")
        return None

    def _qualify_bare(self, text: str, base_model: str) -> str:
        """Qualify bare field names with the base model so the
        generator's reference machinery sees them."""
        model = self.layer.graph.get_model(base_model)
        known_fields = {d.name for d in model.dimensions} | {m.name for m in model.metrics}

        def sub(m: re.Match) -> str:
            tok = m.group(0)
            base = tok.split("__", 1)[0]
            if base in known_fields:
                return f"{base_model}.{tok}"
            return tok

        out = []
        depth_quote = False
        for seg in re.split(r"('(?:[^']|'')*')", text):
            if seg.startswith("'"):
                out.append(seg)
                continue
            # don't double-qualify model.field references
            seg = re.sub(
                r"(?<![\w.])[A-Za-z_][A-Za-z0-9_]*(?:__[a-z]+)?(?!\s*\()(?![\w.])",
                sub,
                seg,
            )
            out.append(seg)
        return "".join(out)


def _split_item_alias(item: str) -> tuple[str, str | None]:
    m = re.match(r"^(.*?)\s+[Aa][Ss]\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", item.strip())
    if m:
        return m.group(1).strip(), m.group(2)
    return item.strip(), None


def _wants_ungrouped(sql: str) -> bool:
    # dims-only semantic SELECT without DISTINCT keeps raw rows
    return not re.match(r"^\s*SELECT\s+DISTINCT\b", sql, re.IGNORECASE)
