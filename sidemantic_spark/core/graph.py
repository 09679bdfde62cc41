"""Semantic graph: model registry + join-path discovery.

Re-expression of the reference's ``core/semantic_graph.py:91`` (registry,
adjacency list at ``:310``, BFS shortest path with ambiguity detection at
``:439-561``, path cache at ``:111``).
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass

from sidemantic_spark.core.model import Metric, Model, Relationship


class SemanticGraphError(Exception):
    pass


class AmbiguousJoinPathError(SemanticGraphError):
    pass


class NoJoinPathError(SemanticGraphError):
    pass


@dataclass(frozen=True)
class JoinHop:
    """One directed join step ``from_model -> to_model``.

    ``rel_type`` is normalized to the direction of travel: traversing a
    ``one_to_many`` edge forward keeps one_to_many; traversing a
    ``many_to_one`` edge backwards becomes one_to_many, etc.
    ``fk_side``/``pk_side`` give the equi-join columns on each side
    (parallel lists, possibly composite).
    """

    from_model: str
    to_model: str
    rel_type: str
    fk_side: tuple[str, ...]  # columns on from_model
    pk_side: tuple[str, ...]  # columns on to_model
    custom_sql: str | None = None

    def duplicates_left(self) -> bool:
        """Joining ``to_model`` multiplies rows already in the tree."""
        return self.rel_type in ("one_to_many", "many_to_many", "cross")

    def duplicates_right(self) -> bool:
        """Rows of ``to_model`` appear multiple times in the join."""
        return self.rel_type in ("many_to_one", "many_to_many", "cross")


_REVERSE = {
    "many_to_one": "one_to_many",
    "one_to_many": "many_to_one",
    "one_to_one": "one_to_one",
    "many_to_many": "many_to_many",
    "cross": "cross",
}


class SemanticGraph:
    """Registry of models + graph-level metrics, with BFS join paths."""

    def __init__(self) -> None:
        self.models: dict[str, Model] = {}
        self.metrics: dict[str, Metric] = {}  # graph-level metrics
        self.parameters: dict[str, object] = {}  # name -> Parameter
        self.explores: dict[str, object] = {}  # name -> Explore
        self.saved_queries: dict[str, object] = {}  # name -> SavedQuery
        # adapter-retained specs with no queryable equivalent (e.g.
        # MetricFlow conversion metrics, ref adapters/metricflow.py:879)
        self.metadata: dict[str, object] = {}
        self._adjacency: dict[str, list[JoinHop]] | None = None
        self._path_cache: dict[tuple[str, str, frozenset[str]], list[JoinHop]] = {}
        self.generation = 0  # bumped on mutation; keys compile caches

    def add_parameter(self, param) -> None:
        if param.name in self.parameters:
            # silent overwrite would let a second loader redefine a
            # parameter's type/allowed_values (reference
            # test_semantic_graph_duplicate_parameter raises too)
            raise SemanticGraphError(
                f"parameter {param.name!r} already registered"
            )
        self.parameters[param.name] = param
        self._invalidate()

    def add_explore(self, explore) -> None:
        self.explores[explore.name] = explore
        self._invalidate()

    def add_saved_query(self, sq) -> None:
        self.saved_queries[sq.name] = sq
        self._invalidate()

    def add_model(self, model: Model) -> None:
        if model.name in self.models:
            raise SemanticGraphError(f"duplicate model {model.name!r}")
        self.models[model.name] = model
        # graph-level metric types are addressable without a model prefix
        # (ref core/semantic_graph.py:129-137: time_comparison and
        # conversion auto-register; regular metrics stay model-scoped)
        for metric in model.metrics:
            if metric.type in ("time_comparison", "conversion") and metric.name not in self.metrics:
                self.metrics[metric.name] = metric
        self._invalidate()

    def add_metric(self, metric: Metric) -> None:
        self.metrics[metric.name] = metric
        self._invalidate()

    def get_model(self, name: str) -> Model:
        try:
            return self.models[name]
        except KeyError:
            raise SemanticGraphError(f"unknown model {name!r}") from None

    def _invalidate(self) -> None:
        self._adjacency = None
        self._path_cache.clear()
        self.generation += 1

    def resolve_inheritance(self) -> None:
        """Flatten ``extends`` chains on Python-registered models and
        graph-level metrics (reference ``loaders.py:1205-1306``). No-op
        when nothing extends."""
        if any(m.extends for m in self.models.values()):
            from .inheritance import resolve_model_inheritance

            self.models = resolve_model_inheritance(self.models)
            self._invalidate()
        if any(m.extends for m in self.metrics.values()):
            from .inheritance import resolve_metric_inheritance

            self.metrics = resolve_metric_inheritance(self.metrics)
            self._invalidate()

    # -- adjacency ---------------------------------------------------

    def adjacency(self) -> dict[str, list[JoinHop]]:
        """Bidirectional adjacency; many_to_many via ``through`` expands
        to two hops through the junction model (reference
        ``core/semantic_graph.py:364-410``)."""
        if self._adjacency is not None:
            return self._adjacency
        adj: dict[str, list[JoinHop]] = {name: [] for name in self.models}
        for model in self.models.values():
            for rel in model.relationships:
                if rel.name not in self.models:
                    continue
                if not rel.active:
                    # preserved metadata only (ref core/semantic_graph.py:
                    # inactive edges never participate in default pathing)
                    continue
                if rel.type == "many_to_many" and rel.through:
                    self._add_junction_hops(adj, model, rel)
                    continue
                target = self.models[rel.name]
                custom = _custom_join_condition(rel.sql)
                # key convention (reference core/semantic_graph.py:415-427,
                # core/relationship.py:27-31): many_to_one carries the FK
                # locally and joins the target's PK; one_to_many/one_to_one
                # join the local PK to the FK on the related model. An
                # OMITTED foreign key is never invented from primary keys —
                # the edge is simply not joinable (ref
                # tests/test_relationships.py omitted-key cases; a guessed
                # pk=pk join would silently produce wrong rows). Custom-SQL
                # and cross edges carry their own condition.
                if not rel.fk_list() and not custom and rel.type != "cross":
                    continue
                if rel.type in ("one_to_many", "one_to_one"):
                    fk = tuple(rel.pk_list(model.pk_list()))  # local key
                    pk = tuple(rel.fk_list() or target.pk_list())  # related FK
                else:
                    fk = tuple(rel.fk_list() or model.pk_list())
                    pk = tuple(rel.pk_list(target.pk_list()))
                if len(fk) != len(pk) and not custom and rel.type != "cross":
                    # composite-key arity mismatch: not joinable (ref
                    # tests/test_relationships.py mismatched-arity case)
                    continue
                fwd = JoinHop(model.name, rel.name, rel.type, fk, pk, custom)
                rev = JoinHop(
                    rel.name,
                    model.name,
                    _REVERSE[rel.type],
                    pk,
                    fk,
                    _reverse_custom_sql(custom),
                )
                adj[model.name].append(fwd)
                adj[rel.name].append(rev)
        # reciprocal declarations on both models produce the same hop —
        # once directly and once as the generated reverse.  Custom join
        # SQL arrives as `{from}.x = {to}.x` from one side and the
        # {from}/{to}-swapped form from the other; equality and AND are
        # commutative, so collapse on the normalized condition (reference
        # core/semantic_graph.py `_normalized_join_condition`) without
        # hiding genuinely different predicates.
        for name, hops in adj.items():
            seen: dict = {}
            for h in hops:
                key = (
                    h.to_model, h.rel_type, h.fk_side, h.pk_side,
                    _normalized_join_condition(h.custom_sql),
                )
                if key not in seen:
                    seen[key] = h
            adj[name] = sorted(
                seen.values(), key=lambda h: (h.to_model, h.rel_type)
            )
        self._adjacency = adj
        return adj

    def _add_junction_hops(self, adj: dict, model: Model, rel: Relationship) -> None:
        junction = self.models.get(rel.through)
        target = self.models.get(rel.name)
        if junction is None or target is None:
            return

        def keys(v, default: str) -> tuple[str, ...]:
            if v is None:
                return (default,)
            return tuple(v) if isinstance(v, (list, tuple)) else (v,)

        from_key = keys(rel.through_from_key, f"{model.name}_id")
        to_key = keys(rel.through_to_key, f"{rel.name}_id")
        mpk = tuple(model.pk_list())
        tpk = tuple(target.pk_list())
        adj[model.name].append(
            JoinHop(model.name, junction.name, "one_to_many", mpk, from_key)
        )
        adj[junction.name].append(
            JoinHop(junction.name, model.name, "many_to_one", from_key, mpk)
        )
        adj[junction.name].append(
            JoinHop(junction.name, target.name, "many_to_one", to_key, tpk)
        )
        adj[target.name].append(
            JoinHop(target.name, junction.name, "one_to_many", tpk, to_key)
        )

    # -- path discovery ----------------------------------------------

    def find_path(
        self, start: str, end: str, prefer_models: frozenset[str] = frozenset()
    ) -> list[JoinHop]:
        """BFS shortest hop path ``start -> end``.

        Requires a unique shortest path; among equal-length candidates,
        paths whose intermediate models stay inside ``prefer_models``
        win; remaining ties raise AmbiguousJoinPathError with a
        deterministic, sorted message (reference
        ``core/semantic_graph.py:439-561``).
        """
        if start == end:
            return []
        key = (start, end, prefer_models)
        cached = self._path_cache.get(key)
        if cached is not None:
            return cached
        adj = self.adjacency()
        if start not in adj or end not in adj:
            raise SemanticGraphError(f"unknown model in path {start!r}->{end!r}")

        # BFS collecting all shortest paths
        best_len: int | None = None
        found: list[list[JoinHop]] = []
        queue: deque[tuple[str, list[JoinHop]]] = deque([(start, [])])
        while queue:
            node, path = queue.popleft()
            if best_len is not None and len(path) >= best_len:
                continue
            for hop in adj[node]:
                if any(h.from_model == hop.to_model or h.to_model == hop.to_model for h in path):
                    continue
                if hop.to_model == start:
                    continue
                new_path = path + [hop]
                if hop.to_model == end:
                    if best_len is None or len(new_path) < best_len:
                        best_len = len(new_path)
                        found = [new_path]
                    elif len(new_path) == best_len:
                        found.append(new_path)
                else:
                    queue.append((hop.to_model, new_path))
        if not found:
            raise NoJoinPathError(f"no join path from {start!r} to {end!r}")
        if len(found) > 1:
            inside = [
                p
                for p in found
                if all(h.to_model in prefer_models or h.to_model == end for h in p)
            ]
            if len(inside) == 1:
                found = inside
            else:
                routes = sorted(" -> ".join([start] + [h.to_model for h in p]) for p in found)
                raise AmbiguousJoinPathError(
                    f"ambiguous join path from {start!r} to {end!r}: " + "; ".join(routes)
                )
        self._path_cache[key] = found[0]
        return found[0]

    def join_tree(self, base: str, targets: list[str]) -> list[JoinHop]:
        """Ordered unique hops joining every target to ``base``; each
        model joined at most once (reference
        ``sql/generator.py:2922-2969``)."""
        prefer = frozenset([base, *targets])
        hops: list[JoinHop] = []
        joined = {base}
        for target in targets:
            if target in joined:
                continue
            for hop in self.find_path(base, target, prefer):
                if hop.to_model not in joined:
                    hops.append(hop)
                    joined.add(hop.to_model)
        return hops


def _reverse_custom_sql(sql: str | None) -> str | None:
    if sql is None:
        return None
    return (
        sql.replace("{from}", "\0")
        .replace("{to}", "{from}")
        .replace("\0", "{to}")
    )


def _custom_join_condition(sql: str | None) -> str | None:
    """Custom join SQL only for the placeholder-based contract: a bare
    expression without ``{from}``/``{to}`` is a key annotation, not a
    join predicate (reference ``core/semantic_graph.py:33-38`` — their
    own fixtures pass ``sql="id"`` alongside ``foreign_key=...``)."""
    if not sql:
        return None
    if "{from}" in sql or "{to}" in sql:
        return sql
    return None


_EQ_SPLIT_RE = re.compile(r"\s+AND\s+", re.IGNORECASE)


def _normalized_join_condition(sql: str | None) -> str | None:
    """Canonicalize simple equality conjunctions for hop de-duplication:
    ``{from}.x = {to}.x`` and its reciprocal swap compare equal, while
    opaque predicates stay distinct (reference
    ``core/semantic_graph.py:40-60``)."""
    if sql is None:
        return None
    normalized: list[str] = []
    for conj in _EQ_SPLIT_RE.split(sql.strip()):
        m = re.fullmatch(r"\s*(.+?)\s*=\s*(.+?)\s*", conj)
        if m and not any(op in conj for op in ("!=", "<=", ">=", "<>")):
            sides = sorted(re.sub(r"\s+", "", s) for s in m.groups())
            normalized.append("=".join(sides))
        else:
            normalized.append(re.sub(r"\s+", " ", conj.strip()))
    return " AND ".join(sorted(normalized))
