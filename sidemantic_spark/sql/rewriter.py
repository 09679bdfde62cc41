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


_AGGREGATE_REF_RE = re.compile(r"\bAGGREGATE\s*\(\s*(\"[^\"]+\"|[\w.]+)\s*\)", re.I)


def _yardstick_normalize(sql: str) -> str:
    """Yardstick flavor (reference ``sql/query_rewriter.py:3007-3043``):
    ``SEMANTIC SELECT ...`` prefix and ``AGGREGATE(measure)`` refs.
    ``AGGREGATE(x)`` unwraps to the bare measure ref — the semantic
    planner supplies the aggregation from the metric definition."""
    sql = re.sub(r"^\s*SEMANTIC\s+", "", sql, flags=re.I)
    return _AGGREGATE_REF_RE.sub(
        lambda m: m.group(1).strip('"').replace(" ", "_"), sql
    )


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
        out = self._rewrite_node(_yardstick_normalize(_strip(sql)))
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
        # CTE islands: rewrite each WITH body that is a semantic query,
        # leave plain-SQL bodies and the outer statement intact
        # (ref sql/query_rewriter.py:4913-4973, :5299-5461)
        if re.match(r"^\s*WITH\b", sql, re.IGNORECASE):
            return self._rewrite_with(sql)
        # top-level set operations: rewrite each branch independently
        # (ref sql/query_rewriter.py:4974-4983, :5330-5392)
        for op in _SET_OPS:
            parts = _top_level_split(sql, op)
            if len(parts) > 1:
                branches = [self._rewrite_node(p.strip()) for p in parts]
                joined = f"\n{op}\n".join(f"({b})" for b in branches)
                return joined
        # FROM-subquery island: SELECT ... FROM (<semantic select>) alias
        sub = self._rewrite_from_subquery(sql)
        if sub is not None:
            return sub
        return self._rewrite_select(sql)

    def _is_semantic(self, sql: str) -> bool:
        """Does this SELECT's FROM name a registered model?"""
        m = re.match(r"^\s*SELECT\b", sql, re.IGNORECASE)
        if not m:
            return False
        parts = _top_level_split(sql, "FROM")
        if len(parts) < 2:
            return False
        tail = parts[1].strip()
        m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)", tail)
        return bool(m) and m.group(1) in self.layer.graph.models

    def _rewrite_with(self, sql: str) -> str:
        body = re.sub(r"^\s*WITH\b", "", sql, count=1, flags=re.IGNORECASE)
        # scan `name AS ( ... )` items sequentially: a top-level comma
        # continues the CTE list, anything else starts the outer SELECT
        ctes: list[tuple[str, str]] = []
        pos = 0
        while True:
            m = re.match(
                r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", body[pos:], re.IGNORECASE
            )
            if not m:
                raise QueryCompileError(
                    f"unsupported CTE item: {body[pos:pos + 60]!r}"
                )
            start = pos + m.end() - 1
            depth = 0
            in_q = False
            end = None
            for j in range(start, len(body)):
                ch = body[j]
                if ch == "'":
                    in_q = not in_q
                elif not in_q:
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth == 0:
                            end = j
                            break
            if end is None:
                raise QueryCompileError("unbalanced parens in WITH clause")
            ctes.append((m.group(1), body[start + 1 : end].strip()))
            after = end + 1
            nxt = re.match(r"\s*,", body[after:])
            if nxt:
                pos = after + nxt.end()
                continue
            outer = body[after:].strip()
            break
        if not outer:
            raise QueryCompileError("WITH clause has no outer SELECT")
        rendered = []
        for name, cte_body in ctes:
            if self._is_semantic(cte_body):
                cte_body = self._rewrite_node(cte_body)
            rendered.append(f"{name} AS (\n{cte_body}\n)")
        if self._is_semantic(outer):
            outer = self._rewrite_node(outer)
        return "WITH " + ",\n".join(rendered) + "\n" + outer

    def _rewrite_from_subquery(self, sql: str) -> str | None:
        """SELECT ... FROM (<semantic select>) alias ... — rewrite the
        island, keep the wrapper verbatim (Catalyst optimizes the
        wrapper; ref keeps wrapper micro-opts we delegate, SURVEY §4)."""
        parts = _top_level_split(sql, "FROM")
        if len(parts) < 2:
            return None
        tail = parts[1].lstrip()
        if not tail.startswith("("):
            return None
        depth = 0
        in_q = False
        end = None
        for j, ch in enumerate(tail):
            if ch == "'":
                in_q = not in_q
            elif not in_q:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = j
                        break
        if end is None:
            return None
        inner = tail[1:end].strip()
        if not self._is_semantic(inner):
            return None
        compiled = self._rewrite_node(inner)
        return f"{parts[0]}FROM (\n{compiled}\n){tail[end + 1:]}"

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

        if re.search(r"\bJOIN\b", from_clause, re.I):
            # explicit JOINs are accepted but must match declared
            # relationship keys (ref sql/query_rewriter.py:5568-5707);
            # compilation still goes through the relationship graph
            base_model = self._validate_explicit_joins(from_clause)
        elif not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", from_clause):
            raise QueryCompileError(
                f"semantic FROM must name a single model (joins come from the "
                f"relationship graph): {from_clause!r}"
            )
        else:
            base_model = from_clause
        graph = self.layer.graph
        model = graph.get_model(base_model)

        metrics: list[str] = []
        dimensions: list[str] = []
        items = _split_items(select_list)
        classified: list[tuple[str, str, str | None]] = []
        has_expression = False
        for item in items:
            ref, alias = _split_item_alias(item)
            target = self._classify_ref(ref, base_model)
            if target is None:
                has_expression = True
                break
            classified.append((*target, alias))
        if has_expression:
            return self._rewrite_expression_select(items, clause_vals, base_model)
        for kind, full, alias in classified:
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

    def _rewrite_expression_select(
        self, items: list[str], clause_vals: dict[str, str], base_model: str
    ) -> str:
        """Ad-hoc expressions over metrics/dims (ref
        ``sql/query_rewriter.py:5708-5897`` ``_rewrite_expression_query``):
        compile an inner semantic query projecting every referenced
        field, then evaluate the expressions in a wrapper SELECT.
        Catalyst collapses the wrapper projection, so no further
        micro-optimization is needed (SURVEY §4)."""
        graph = self.layer.graph
        inner_metrics: list[str] = []
        inner_dims: list[str] = []
        seen: set[str] = set()

        def note(kind: str, full: str) -> str:
            # output column name the generator produces for a bare ref
            _, field = full.split(".", 1)
            if full not in seen:
                seen.add(full)
                (inner_metrics if kind == "metric" else inner_dims).append(full)
            return field

        token_re = re.compile(
            r"(?<![\w.'])([A-Za-z_][A-Za-z0-9_]*)(?:\.([A-Za-z_][A-Za-z0-9_]*))?"
            r"(?:__([a-z]+))?(?![\w.])"
        )

        def sub_refs(text: str) -> str:
            out = []
            for seg in re.split(r"('(?:[^']|'')*')", text):
                if seg.startswith("'"):
                    out.append(seg)
                    continue

                def repl(m: re.Match) -> str:
                    tok = m.group(0)
                    target = self._classify_ref(tok, base_model)
                    if target is None:
                        return tok
                    return note(*target)

                out.append(token_re.sub(repl, seg))
            return "".join(out)

        outer_items = []
        for i, item in enumerate(items):
            ref, alias = _split_item_alias(item)
            target = self._classify_ref(ref, base_model)
            if target is not None:
                name = note(*target)
                outer_items.append(f"{name} AS {alias}" if alias else name)
                continue
            rewritten = sub_refs(ref)
            if rewritten == ref:
                raise QueryCompileError(
                    f"unsupported select item {item!r}: references no known "
                    "metric or dimension"
                )
            outer_items.append(f"{rewritten} AS {alias or f'expr_{i}'}")

        filters = []
        if "WHERE" in clause_vals:
            filters.append(self._qualify_bare(clause_vals["WHERE"], base_model))
        having = (
            sub_refs(clause_vals["HAVING"]) if "HAVING" in clause_vals else None
        )
        order_raw = (
            _split_items(clause_vals["ORDER BY"]) if "ORDER BY" in clause_vals else []
        )
        order = [sub_refs(o) for o in order_raw]

        spec = QuerySpec(metrics=inner_metrics, dimensions=inner_dims, filters=filters)
        inner_sql = self.layer.generator.generate(spec)
        out = f"SELECT {', '.join(outer_items)}\nFROM (\n{inner_sql}\n) _expr"
        if having:
            # the HAVING may reference expression aliases, so filter a
            # wrapper above the projection (Catalyst collapses it)
            out = f"SELECT * FROM (\n{out}\n) _h\nWHERE {having}"
        if order:
            out += f"\nORDER BY {', '.join(order)}"
        if "LIMIT" in clause_vals:
            out += f"\nLIMIT {int(clause_vals['LIMIT'])}"
        if "OFFSET" in clause_vals:
            out += f"\nOFFSET {int(clause_vals['OFFSET'])}"
        return out

    def _validate_explicit_joins(self, from_clause: str) -> str:
        """``model [LEFT|INNER] JOIN other ON a.x = b.y [...]`` — every ON
        pair must match a declared relationship's fk/pk (reference
        explicit-join validation ``sql/query_rewriter.py:5568-5707``).
        Returns the base model name; the generator rebuilds the joins
        from the graph, so validation is the only job here."""
        graph = self.layer.graph
        parts = re.split(r"\b(?:LEFT\s+(?:OUTER\s+)?|INNER\s+|FULL\s+(?:OUTER\s+)?)?JOIN\b",
                         from_clause, flags=re.I)
        base_model = parts[0].strip()
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", base_model):
            raise QueryCompileError(f"invalid join base: {base_model!r}")
        graph.get_model(base_model)
        seen = {base_model}
        for seg in parts[1:]:
            m = re.match(r"^\s*([A-Za-z_]\w*)\s+ON\s+(.+)$", seg.strip(), re.I | re.S)
            if not m:
                raise QueryCompileError(f"unparseable JOIN segment: {seg.strip()[:80]!r}")
            target, cond = m.group(1), m.group(2).strip()
            graph.get_model(target)
            pairs = []
            for conj in re.split(r"\bAND\b", cond, flags=re.I):
                em = re.match(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", conj.strip())
                if not em:
                    raise QueryCompileError(
                        f"explicit JOIN condition must be model.col = model.col: {conj.strip()!r}")
                pairs.append((em.group(1), em.group(2), em.group(3), em.group(4)))
            if not self._join_matches_graph(seen, target, pairs):
                raise QueryCompileError(
                    f"explicit JOIN to {target!r} does not match any declared "
                    f"relationship keys: {cond!r}")
            seen.add(target)
        return base_model

    def _join_matches_graph(self, seen: set, target: str, pairs: list) -> bool:
        graph = self.layer.graph
        for src in seen:
            src_model = graph.get_model(src)
            tgt_model = graph.get_model(target)
            for rel, owner in (
                [(r, src) for r in src_model.relationships if r.name == target]
                + [(r, target) for r in tgt_model.relationships if r.name == src]
            ):
                fks = rel.fk_list()
                if not fks:
                    continue
                pks = rel.pk_list(graph.get_model(rel.name).pk_list())
                # the fk lives on the declaring model, the pk on rel.name;
                # user SQL may write either the physical column or a
                # dimension whose expression is that column
                def names_for(model_name: str, physical: str) -> set:
                    mdl = graph.get_model(model_name)
                    out = {physical}
                    out.update(d.name for d in mdl.dimensions if d.expr == physical)
                    return out

                def pair_ok(declared, got_pair) -> bool:
                    (m1, c1), (m2, c2) = declared
                    gd = dict(got_pair)
                    return (
                        set(gd) == {m1, m2}
                        and gd[m1] in names_for(m1, c1)
                        and gd[m2] in names_for(m2, c2)
                    )

                want = [((owner, fk), (rel.name, pk)) for fk, pk in zip(fks, pks)]
                got = [((a, b), (c, d)) for a, b, c, d in pairs]
                if len(want) == len(got) and all(
                    any(pair_ok(w, g) for g in got) for w in want
                ):
                    return True
        return False

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
