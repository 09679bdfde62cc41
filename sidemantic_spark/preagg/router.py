"""Transparent rollup routing: rewrite a semantic query to scan a
materialized pre-aggregation instead of the base table.

Re-expression of the reference's aggregate-awareness path
(``sql/generator.py:6988-7217`` query-from-rollup generation with
re-aggregation: ``SUM({m}__sum)``, avg = SUM(sum)/SUM(count),
count_distinct exact-grain passthrough).  Nothing in OSS Spark does
this natively (SURVEY.md §4), so it lives pre-compile, as in the
reference.
"""

from __future__ import annotations

import re

from sidemantic_spark.core.model import Metric
from sidemantic_spark.preagg.matcher import PreAggMatch, match_preagg
from sidemantic_spark.sql.fragments import find_refs, replace_refs, split_conjuncts


def try_route(gen, r) -> str | None:
    """Serve the resolved query from a rollup if one matches."""
    if r.hops or r.spec.ungrouped or r.spec.with_totals:
        return None
    model = gen.graph.get_model(r.base)
    if not getattr(model, "pre_aggregations", None):
        return None

    # expand ratio/derived metrics into their simple components; any
    # metric-level filter disqualifies (partials are pre-filter)
    comp_names: list[str] = []
    for rm in r.metrics:
        if rm.metric.type in ("cumulative", "time_comparison", "conversion", "retention", "cohort"):
            return None
        if rm.metric.non_additive_dimension:
            return None
        for _out, comp in gen._expand_components(rm):
            if comp.filters:
                return None
            if comp.name not in comp_names:
                comp_names.append(comp.name)

    dims = [(rd.name, rd.grain) for rd in r.dims]
    filter_dims: list[str] = []
    known = set(gen.graph.models)
    for f in r.spec.filters:
        for m, fld, _g in find_refs(f, known):
            if m == r.base and model.metric(fld) is None:
                filter_dims.append(fld)
            elif m != r.base:
                return None
    match = match_preagg(model, comp_names, dims, filter_dims)
    if match is None:
        return None
    return _build_sql(gen, r, match)


def _reagg(metric: Metric, exact_single_row: bool) -> str:
    m = metric.name
    if metric.agg == "sum":
        return f"SUM({m}__sum)"
    if metric.agg == "count":
        return f"SUM({m}__count)"
    if metric.agg == "avg":
        return f"CAST(SUM({m}__sum) AS DOUBLE) / SUM({m}__count)"
    if metric.agg == "min":
        return f"MIN({m}__min)"
    if metric.agg == "max":
        return f"MAX({m}__max)"
    if metric.agg == "count_distinct":
        # matcher only admits this at exact grain: one rollup row per
        # output group, so the stored value passes through
        return f"MAX({m}__cd)"
    if metric.agg == "approx_count_distinct":
        if exact_single_row:
            return f"MAX({m}__cd)"  # exact value available at exact grain
        # coarser grain: merge the stored HLL sketches
        return f"hll_sketch_estimate(hll_union_agg({m}__hll))"
    raise ValueError(f"metric {m!r} not derivable from rollup partials")


def _metric_reagg_sql(gen, model_name: str, metric: Metric, exact: bool, depth: int = 0) -> str:
    from sidemantic_spark.sql.generator import _identifiers, _qualify

    if depth > 10:
        raise ValueError(f"metric recursion at {metric.name!r}")
    if metric.is_simple:
        sql = _reagg(metric, exact)
    elif metric.type == "ratio":
        _, num = gen._lookup_metric(_qualify(metric.numerator, model_name))
        _, den = gen._lookup_metric(_qualify(metric.denominator, model_name))
        num_sql = _metric_reagg_sql(gen, model_name, num, exact, depth + 1)
        den_sql = _metric_reagg_sql(gen, model_name, den, exact, depth + 1)
        sql = f"CAST(({num_sql}) AS DOUBLE) / NULLIF(CAST(({den_sql}) AS DOUBLE), 0)"
    elif metric.type == "derived":
        sql = metric.expr
        for name in _identifiers(metric.expr):
            try:
                _, child = gen._lookup_metric(_qualify(name, model_name))
            except Exception:
                continue
            child_sql = _metric_reagg_sql(gen, model_name, child, exact, depth + 1)
            sql = re.sub(rf"\b{re.escape(name)}\b", f"({child_sql})", sql)
    else:
        raise ValueError(f"metric {metric.name!r} not servable from rollup")
    if metric.fill_nulls_with is not None:
        sql = f"COALESCE({sql}, {metric.fill_nulls_with})"
    return sql


def _build_sql(gen, r, match: PreAggMatch) -> str:
    model = gen.graph.get_model(r.base)
    pa = match.preagg
    physical = pa.physical_name(model.name)
    physical_name = physical
    if pa.type == "lambda" and pa.time_dimension:
        # lambda rollup: serve history from the materialized table and
        # everything at-or-after the boundary bucket fresh from the base
        # table, unioned at the rollup grain (reference
        # sql/generator.py:7104-7135 union-with-fresh)
        from sidemantic_spark.preagg.manager import rollup_select_sql

        tdim = model.dimension(pa.time_dimension)
        texpr = tdim.expr if tdim else pa.time_dimension
        grain = pa.lambda_boundary_grain or pa.granularity
        boundary = pa.lambda_boundary_sql or f"DATE_TRUNC('{grain}', CURRENT_TIMESTAMP)"
        tcol = f"{pa.time_dimension}__{pa.granularity}"
        fresh = rollup_select_sql(model, pa, extra_where=f"{texpr} >= {boundary}")
        physical = (
            f"(SELECT * FROM {pa.physical_name(model.name)} WHERE {tcol} < {boundary}\n"
            f" UNION ALL\n{fresh})"
        )
    exact = all(regrain is None for _col, regrain in match.dim_map.values()) and (
        len(match.dim_map) == len(pa.dimensions) + (1 if pa.time_dimension else 0)
    )

    select: list[str] = []
    group: list[str] = []
    for rd in r.dims:
        col, regrain = match.dim_map[rd.name]
        expr = f"DATE_TRUNC('{regrain}', {col})" if regrain else col
        select.append(f"{expr} AS {rd.out}")
        group.append(expr)
    for rm in r.metrics:
        select.append(f"{_metric_reagg_sql(gen, r.base, rm.metric, exact)} AS {rm.out}")

    known = set(gen.graph.models)

    def rollup_col(m: str, fld: str, grain: str | None) -> str:
        col, _ = match.dim_map.get(fld, (None, None))
        if col is None:
            dim = model.dimension(fld)
            if dim is not None and dim.type == "time" and pa.time_dimension == fld:
                col = f"{fld}__{pa.granularity}"
            else:
                col = fld
        return f"DATE_TRUNC('{grain}', {col})" if grain else col

    where: list[str] = []
    having: list[str] = []
    for f in r.spec.filters:
        for conj in split_conjuncts(f):
            refs = find_refs(conj, known)
            if any(model.metric(fld) is not None for _m, fld, _g in refs):
                having.append(
                    replace_refs(
                        conj,
                        known,
                        lambda m, fld, g: f"({_metric_reagg_sql(gen, r.base, model.metric(fld), exact)})"
                        if model.metric(fld)
                        else rollup_col(m, fld, g),
                    )
                )
            else:
                where.append(replace_refs(conj, known, rollup_col))

    sql = "SELECT\n    " + ",\n    ".join(select) + f"\nFROM {physical}"
    if where:
        sql += "\nWHERE " + "\n  AND ".join(f"({w})" for w in where)
    if group:
        sql += "\nGROUP BY " + ", ".join(group)
    if having:
        sql += "\nHAVING " + "\n  AND ".join(f"({h})" for h in having)
    sql += gen._order_limit(r)
    header = (
        f"-- sidemantic_spark models={r.base} plan=preagg used_preagg={physical_name}"
        + (" lambda=true" if pa.type == "lambda" else "")
    )
    return f"{header}\n{sql}"
