"""Native YAML authoring format: parse, validate, export.

Mirrors the reference's native adapter (``adapters/sidemantic.py``) and
validation behavior over its native-fixture corpus
(``tests/native-fixtures/``): strict version check, unknown-field
rejection, duplicate-field rejection, reference checks for
``default_time_dimension`` and pre-aggregation measures/dimensions.

Spark-specific notes: all SQL fragments are Spark SQL; ``source_uri``
models register as ``spark.read`` temp views at query time.
"""

from __future__ import annotations

import os
import re

import yaml

# libyaml's C loader is ~10x the pure-Python one on big projects (ref
# tests/test_loading_validation_performance.py safe_c_loader case);
# fall back transparently where the wheel lacks it
_YAML_LOADER = getattr(yaml, "CSafeLoader", yaml.SafeLoader)


def yaml_safe_load(text: str):
    return yaml.load(text, Loader=_YAML_LOADER)


def yaml_safe_load_all(text: str):
    return yaml.load_all(text, Loader=_YAML_LOADER)


from sidemantic_spark.core.model import (
    SIMPLE_AGGS,
    Dimension,
    Metric,
    Model,
    Parameter,
    Relationship,
    Segment,
)
from sidemantic_spark.preagg.matcher import PreAggregation


class AuthoringError(Exception):
    """Raised for any invalid model definition; message list mirrors
    the reference's validation errors."""

    def __init__(self, errors):
        if isinstance(errors, str):
            errors = [errors]
        self.errors = list(errors)
        super().__init__("; ".join(self.errors))


SUPPORTED_VERSION = 1

_TOP_KEYS = {"version", "models", "metrics", "parameters", "name", "table", "sql",
             "source_uri", "primary_key", "dimensions", "segments", "relationships"}
_MODEL_KEYS = {
    "name", "table", "sql", "source_uri", "source_format", "primary_key",
    "primary_key_columns",
    "dimensions", "metrics", "measures", "relationships", "segments",
    "default_time_dimension", "default_grain", "description", "label",
    "sql_metrics", "sql_segments", "sql_dimensions", "pre_aggregations",
    "extends", "auto_dimensions", "row_filters", "security", "version",
    "source_options",
    "owner", "domain", "tier", "deprecation", "freshness", "meta",
}
_FRESHNESS_KEYS = {"watermark", "sql", "ttl_seconds"}
_DEPRECATION_KEYS = {"message", "deprecated_at", "sunset_at", "replaced_by"}
_SECURITY_KEYS = {"access", "row_filters"}
_EXPLORE_KEYS = {
    "name", "model", "label", "description", "allowed_dimensions",
    "allowed_metrics", "default_dimensions", "default_metrics", "filters",
    "default_filters", "default_order_by", "default_limit", "max_limit",
}
_SAVED_QUERY_KEYS = {
    "name", "explore", "label", "description", "dimensions", "metrics",
    "filters", "segments", "order_by", "limit", "parameters",
}
_DIM_KEYS = {
    "name", "type", "sql", "expr", "granularity", "supported_granularities",
    "label", "description", "parent", "window", "public", "hidden", "format",
    "value_format_name", "synonyms", "meta",
}
_METRIC_KEYS = {
    "name", "agg", "sql", "expr", "measure", "type", "description", "label",
    "filters", "fill_nulls_with", "public", "hidden", "format",
    "numerator", "denominator",
    "window", "grain_to_date", "base_metric",
    "comparison_type", "calculation", "time_offset",
    "entity", "base_event", "conversion_event", "conversion_window", "steps",
    "cohort_event", "activity_event", "periods", "retention_granularity",
    "inner_metrics", "entity_dimensions", "having",
    "non_additive_dimension", "non_additive_window",
    "non_additive_window_groupings", "extends",
    "owner", "deprecation", "drill_fields",
    "value_format_name", "synonyms", "meta",
}
_REL_KEYS = {
    "name", "type", "foreign_key", "primary_key", "foreign_key_columns",
    "primary_key_columns", "through", "through_foreign_key",
    "related_foreign_key", "through_foreign_key_columns",
    "related_foreign_key_columns", "sql", "join_type", "description",
    "active",
}
_SEG_KEYS = {"name", "sql", "description", "label", "public"}
_PARAM_KEYS = {"name", "type", "default_value", "description", "label"}
_PREAGG_KEYS = {
    "name", "type", "measures", "dimensions", "time_dimension", "granularity",
    "partition_granularity", "lambda_boundary_grain", "lambda_boundary_sql",
    "refresh_key", "indexes",
}

_GRAINS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


def _check_keys(data: dict, allowed: set, ctx: str, errors: list) -> None:
    for k in data:
        if k not in allowed:
            errors.append(f"{ctx}: unknown field {k!r}")


def _listify(v) -> list:
    if v is None:
        return []
    return list(v) if isinstance(v, (list, tuple)) else [v]


# ---------------------------------------------------------------------
# parse
# ---------------------------------------------------------------------

def substitute_env_vars(content: str) -> str:
    """Environment-variable substitution in YAML content (reference
    ``adapters/sidemantic.py:209``): ``${VAR}``, ``${VAR:-default}``,
    and the brace-less UPPERCASE ``$VAR`` form.  Missing variables
    without a default keep the original text (never fail the load)."""
    import os as _os

    def replace_var(match: "re.Match") -> str:
        var_expr = match.group(1)
        if ":-" in var_expr:
            var_name, default = var_expr.split(":-", 1)
            return _os.environ.get(var_name, default)
        value = _os.environ.get(var_expr)
        return match.group(0) if value is None else value

    content = re.sub(r"\$\{([^}]+)\}", replace_var, content)

    def replace_simple(match: "re.Match") -> str:
        value = _os.environ.get(match.group(1))
        return match.group(0) if value is None else value

    return re.sub(r"\$([A-Z_][A-Z0-9_]*)", replace_simple, content)


def load_yaml(layer, text: str, *, source: str = "<yaml>") -> None:
    """Parse native YAML text and register its models/metrics/parameters
    on ``layer``. Raises AuthoringError with the full error list."""
    text = substitute_env_vars(text)
    try:
        data = yaml_safe_load(text)
    except yaml.YAMLError as exc:
        raise AuthoringError(f"{source}: YAML parse error: {exc}") from exc
    if not isinstance(data, dict):
        raise AuthoringError(f"{source}: top level must be a mapping")

    version = data.get("version", SUPPORTED_VERSION)
    if version != SUPPORTED_VERSION:
        raise AuthoringError(
            f"Unsupported native Sidemantic format version: {version} "
            f"(supported: {SUPPORTED_VERSION})"
        )

    errors: list[str] = []
    # single-model document (frontmatter style): model keys at top level
    if "name" in data and "models" not in data:
        model_datas = [dict(data)]
        model_datas[0].pop("version", None)
    else:
        _check_keys(
            data,
            {"version", "models", "metrics", "parameters", "explores", "saved_queries"},
            source,
            errors,
        )
        model_datas = data.get("models") or []

    models: list[Model] = []
    raw_by_name: dict[str, dict] = {}
    for md in model_datas:
        raw_by_name[md.get("name", "?")] = md
    for md in model_datas:
        md = _resolve_model_extends(md, raw_by_name, errors)
        model = _build_model(md, errors)
        if model is not None:
            models.append(model)

    graph_metrics: list[Metric] = []
    for mdata in data.get("metrics") or []:
        m = _build_metric(mdata, ctx=f"metric {mdata.get('name', '?')!r}", errors=errors)
        if m is not None:
            graph_metrics.append(m)

    params: list[Parameter] = []
    for pdata in data.get("parameters") or []:
        _check_keys(pdata, _PARAM_KEYS, f"parameter {pdata.get('name', '?')!r}", errors)
        if "name" not in pdata:
            errors.append("parameter missing name")
            continue
        params.append(Parameter(
            name=pdata["name"],
            type=pdata.get("type", "string"),
            default_value=pdata.get("default_value"),
            description=pdata.get("description"),
        ))

    explores = []
    for edata in data.get("explores") or []:
        _check_keys(edata, _EXPLORE_KEYS, f"explore {edata.get('name', '?')!r}", errors)
        if not edata.get("name") or not edata.get("model"):
            errors.append("explore needs name and model")
            continue
        from sidemantic_spark.core.consumption import ContractError, Explore

        try:
            explores.append(Explore(**{k: v for k, v in edata.items() if k in _EXPLORE_KEYS}))
        except (ContractError, TypeError) as exc:
            errors.append(str(exc))

    saved_queries = []
    for sdata in data.get("saved_queries") or []:
        _check_keys(sdata, _SAVED_QUERY_KEYS, f"saved_query {sdata.get('name', '?')!r}", errors)
        if not sdata.get("name"):
            errors.append("saved_query needs name")
            continue
        from sidemantic_spark.core.consumption import SavedQuery

        saved_queries.append(
            SavedQuery(**{k: v for k, v in sdata.items() if k in _SAVED_QUERY_KEYS})
        )

    if errors:
        raise AuthoringError(errors)

    for model in models:
        _post_process_model(model, errors)
    for model in models:
        errors.extend(_validate_model(model))
    if errors:
        raise AuthoringError(errors)

    for model in models:
        if model.name in layer.graph.models:
            raise AuthoringError(f"duplicate model {model.name!r}")
        layer.graph.add_model(model)
    for gm in graph_metrics:
        layer.graph.add_metric(gm)
    for p in params:
        layer.graph.add_parameter(p)
    for e in explores:
        layer.graph.add_explore(e)
    for sq in saved_queries:
        layer.graph.add_saved_query(sq)


def _resolve_model_extends(md: dict, by_name: dict, errors: list,
                           _seen: tuple = ()) -> dict:
    """Model inheritance (reference ``core/inheritance.py:11``): child
    scalar fields win; list fields append parent entries the child
    doesn't redefine."""
    parent_name = md.get("extends")
    if not parent_name:
        return md
    name = md.get("name", "?")
    if name in _seen:
        errors.append(
            f"model {name!r}: extends cycle "
            f"{' -> '.join((*_seen, name))}"
        )
        return md
    parent = by_name.get(parent_name)
    if parent is None:
        errors.append(f"model {md.get('name', '?')!r}: extends unknown model {parent_name!r}")
        return md
    parent = _resolve_model_extends(parent, by_name, errors, _seen + (name,))
    merged = dict(parent)
    merged.pop("extends", None)
    for k, v in md.items():
        if k == "extends":
            continue
        if k in ("dimensions", "metrics", "measures", "relationships", "segments"):
            child_names = {e.get("name") for e in v or []}
            inherited = [e for e in (parent.get(k) or []) if e.get("name") not in child_names]
            merged[k] = inherited + list(v or [])
        else:
            merged[k] = v
    return merged


def _build_model(md: dict, errors: list) -> Model | None:
    name = md.get("name")
    ctx = f"model {name!r}"
    if not name:
        errors.append("model missing name")
        return None
    _check_keys(md, _MODEL_KEYS, ctx, errors)

    dims: list[Dimension] = []
    seen_dims: set[str] = set()
    for ddata in md.get("dimensions") or []:
        dctx = f"{ctx} dimension {ddata.get('name', '?')!r}"
        _check_keys(ddata, _DIM_KEYS, dctx, errors)
        dname = ddata.get("name")
        if not dname:
            errors.append(f"{ctx}: dimension missing name")
            continue
        if dname in seen_dims:
            errors.append(f"{ctx}: duplicate dimension {dname!r}")
            continue
        seen_dims.add(dname)
        gran = ddata.get("granularity")
        if gran and gran not in _GRAINS:
            errors.append(f"{dctx}: unknown granularity {gran!r}")
        dims.append(Dimension(
            name=dname,
            type=ddata.get("type", "categorical"),
            sql=ddata.get("sql") or ddata.get("expr"),
            granularity=gran,
            label=ddata.get("label"),
            description=ddata.get("description"),
            parent=ddata.get("parent"),
            window=ddata.get("window"),
            public=ddata.get("public", not ddata.get("hidden", False)),
            supported_granularities=_listify(ddata.get("supported_granularities")),
            format=ddata.get("format"),
            value_format_name=ddata.get("value_format_name"),
            synonyms=_listify(ddata.get("synonyms")),
            meta=ddata.get("meta"),
        ))

    metrics: list[Metric] = []
    seen_metrics: set[str] = set()
    for mdata in (md.get("metrics") or []) + (md.get("measures") or []):
        mctx = f"{ctx} metric {mdata.get('name', '?')!r}"
        m = _build_metric(mdata, ctx=mctx, errors=errors)
        if m is None:
            continue
        if m.name in seen_metrics:
            errors.append(f"{ctx}: duplicate metric {m.name!r}")
            continue
        seen_metrics.add(m.name)
        metrics.append(m)

    rels: list[Relationship] = []
    for rdata in md.get("relationships") or []:
        rctx = f"{ctx} relationship {rdata.get('name', '?')!r}"
        _check_keys(rdata, _REL_KEYS, rctx, errors)
        rname = rdata.get("name")
        if not rname:
            errors.append(f"{ctx}: relationship missing name")
            continue
        fk = rdata.get("foreign_key_columns") or rdata.get("foreign_key")
        pk = rdata.get("primary_key_columns") or rdata.get("primary_key")
        through_fk = rdata.get("through_foreign_key_columns") or rdata.get("through_foreign_key")
        related_fk = rdata.get("related_foreign_key_columns") or rdata.get("related_foreign_key")
        rels.append(Relationship(
            name=rname,
            type=rdata.get("type", "many_to_one"),
            foreign_key=fk,
            primary_key=pk,
            sql=rdata.get("sql"),
            through=rdata.get("through"),
            through_from_key=through_fk,
            through_to_key=related_fk,
            join_type=rdata.get("join_type"),
            active=rdata.get("active", True) is not False,
        ))

    segs: list[Segment] = []
    for sdata in md.get("segments") or []:
        sctx = f"{ctx} segment {sdata.get('name', '?')!r}"
        _check_keys(sdata, _SEG_KEYS, sctx, errors)
        if not sdata.get("name") or not sdata.get("sql"):
            errors.append(f"{sctx}: segment needs name and sql")
            continue
        segs.append(Segment(name=sdata["name"], sql=sdata["sql"],
                            description=sdata.get("description"),
                            public=bool(sdata.get("public", True))))

    preaggs: list[PreAggregation] = []
    for pdata in md.get("pre_aggregations") or []:
        pctx = f"{ctx} pre_aggregation {pdata.get('name', '?')!r}"
        _check_keys(pdata, _PREAGG_KEYS, pctx, errors)
        if not pdata.get("name"):
            errors.append(f"{pctx}: missing name")
            continue
        preaggs.append(PreAggregation(
            name=pdata["name"],
            measures=_listify(pdata.get("measures")),
            dimensions=_listify(pdata.get("dimensions")),
            time_dimension=pdata.get("time_dimension"),
            granularity=pdata.get("granularity", "day"),
            partition_granularity=pdata.get("partition_granularity"),
            type=pdata.get("type", "rollup"),
            sql=pdata.get("sql"),
            lambda_boundary_grain=pdata.get("lambda_boundary_grain"),
            lambda_boundary_sql=pdata.get("lambda_boundary_sql"),
        ))

    security = None
    sdata = md.get("security")
    if sdata is not None:
        _check_keys(sdata, _SECURITY_KEYS, f"{ctx} security", errors)
        from sidemantic_spark.core.security import SecurityPolicy

        security = SecurityPolicy(
            access=sdata.get("access", True),
            row_filters=_listify(sdata.get("row_filters")),
        )

    deprecation = freshness = None
    if md.get("deprecation") is not None:
        ddata = md["deprecation"]
        if isinstance(ddata, str):
            ddata = {"message": ddata}
        _check_keys(ddata, _DEPRECATION_KEYS, f"{ctx} deprecation", errors)
        from sidemantic_spark.core.governance import Deprecation

        deprecation = Deprecation(**{
            k: v for k, v in ddata.items() if k in _DEPRECATION_KEYS
        })
    if md.get("freshness") is not None:
        fdata = md["freshness"]
        _check_keys(fdata, _FRESHNESS_KEYS, f"{ctx} freshness", errors)
        from sidemantic_spark.core.governance import Freshness, GovernanceError

        try:
            freshness = Freshness(**{
                k: v for k, v in fdata.items() if k in _FRESHNESS_KEYS
            })
        except GovernanceError as exc:
            errors.append(f"{ctx} freshness: {exc}")

    model = Model(
        name=name,
        table=md.get("table"),
        sql=md.get("sql"),
        source_uri=md.get("source_uri"),
        source_format=md.get("source_format", "parquet"),
        source_options=dict(md.get("source_options") or {}),
        primary_key=md.get("primary_key_columns") or md.get("primary_key", "id"),
        dimensions=dims,
        metrics=metrics,
        relationships=rels,
        segments=segs,
        default_time_dimension=md.get("default_time_dimension"),
        default_grain=md.get("default_grain"),
        description=md.get("description"),
        row_filters=_listify(md.get("row_filters")),
        security=security,
        pre_aggregations=preaggs,
        owner=md.get("owner"),
        domain=md.get("domain"),
        tier=md.get("tier"),
        deprecation=deprecation,
        freshness=freshness,
        label=md.get("label"),
        meta=md.get("meta"),
    )

    # embedded semantic-SQL blocks (ref embedded_sql_blocks fixture)
    for block_key in ("sql_metrics", "sql_segments", "sql_dimensions"):
        block = md.get(block_key)
        if block:
            from sidemantic_spark.authoring.sql_defs import parse_statements

            try:
                parse_statements(block, into_model=model)
            except AuthoringError as exc:
                errors.extend(f"{ctx} {block_key}: {e}" for e in exc.errors)
    return model


def _build_metric(mdata: dict, *, ctx: str, errors: list) -> Metric | None:
    _check_keys(mdata, _METRIC_KEYS, ctx, errors)
    name = mdata.get("name")
    if not name:
        errors.append(f"{ctx}: metric missing name")
        return None
    mtype = mdata.get("type")
    sql = mdata.get("sql") or mdata.get("expr") or mdata.get("measure")
    expr = None
    if mtype == "derived":
        expr = mdata.get("expr") or mdata.get("measure") or mdata.get("sql")
        sql = None
    agg = mdata.get("agg")
    if mtype in (None, "") and agg is not None and agg not in SIMPLE_AGGS:
        errors.append(f"{ctx}: unknown agg {agg!r}")
        return None

    # cohort: fixture shape carries outer agg in `agg`, inner metric in
    # `inner_metrics`, having over the inner metric's name
    cohort_agg = None
    having = mdata.get("having")
    inner_metrics_native: list[dict] = []
    if mtype == "cohort":
        inner_list = _listify(mdata.get("inner_metrics"))
        outer_sql = mdata.get("sql")
        if len(inner_list) > 1 or (
            outer_sql and "cohort_sub." in str(outer_sql)
        ):
            # the reference's native multi-inner form: keep it whole
            # (agg is the OUTER aggregation, sql references cohort_sub)
            inner_metrics_native = [dict(im) for im in inner_list]
            agg = mdata.get("agg")
            sql = outer_sql
        else:
            cohort_agg = mdata.get("agg") or "count"
            agg = None
            inner = (inner_list or [{}])[0]
            agg = inner.get("agg", "count")
            sql = inner.get("sql") or inner.get("expr")
            if having and inner.get("name"):
                import re as _re

                having = _re.sub(
                    rf"\b{_re.escape(inner['name'])}\b", "value", having
                )

    base_event = mdata.get("base_event") or mdata.get("cohort_event")

    m = Metric(
        name=name,
        agg=agg,
        sql=sql,
        type=mtype,
        description=mdata.get("description"),
        label=mdata.get("label"),
        filters=_listify(mdata.get("filters")),
        fill_nulls_with=mdata.get("fill_nulls_with"),
        public=mdata.get("public", not mdata.get("hidden", False)),
        numerator=mdata.get("numerator"),
        denominator=mdata.get("denominator"),
        expr=expr,
        window=mdata.get("window"),
        grain_to_date=mdata.get("grain_to_date"),
        base_metric=mdata.get("base_metric"),
        comparison_type=mdata.get("comparison_type"),
        calculation=mdata.get("calculation", "percent_change"),
        time_offset=mdata.get("time_offset"),
        entity=mdata.get("entity"),
        base_event=base_event,
        conversion_event=mdata.get("conversion_event"),
        conversion_window=mdata.get("conversion_window"),
        steps=_listify(mdata.get("steps")),
        activity_event=mdata.get("activity_event"),
        retention_granularity=mdata.get("retention_granularity", "month"),
        retention_periods=mdata.get("periods", 12),
        cohort_aggregation=cohort_agg,
        having=having,
        entity_dimensions=_listify(mdata.get("entity_dimensions")),
        inner_metrics=inner_metrics_native,
        non_additive_dimension=mdata.get("non_additive_dimension"),
        non_additive_window=mdata.get("non_additive_window", "max"),
        non_additive_window_groupings=_listify(mdata.get("non_additive_window_groupings")),
        drill_fields=_listify(mdata.get("drill_fields")),
        owner=mdata.get("owner"),
        format=mdata.get("format"),
        value_format_name=mdata.get("value_format_name"),
        synonyms=_listify(mdata.get("synonyms")),
        meta=mdata.get("meta"),
    )
    if mdata.get("deprecation") is not None:
        ddata = mdata["deprecation"]
        if isinstance(ddata, str):
            ddata = {"message": ddata}
        from sidemantic_spark.core.governance import Deprecation

        m.deprecation = Deprecation(**{
            k: v for k, v in ddata.items() if k in _DEPRECATION_KEYS
        })
    return m


def _post_process_model(model: Model, errors: list) -> None:
    """Cross-field fixes that need the finished model: cumulative
    ``sql`` naming a sibling metric means base_metric; bare conversion
    event names become event-type filters (reference heuristics at
    ``sql/generator.py:5306-5316``)."""
    for m in model.metrics:
        m.filters = [f.replace("{model}", model.name) for f in m.filters]
        if m.sql:
            m.sql = m.sql.replace("{model}", model.name)
    metric_names = {m.name for m in model.metrics}
    event_type_dim = None
    for d in model.dimensions:
        if "event" in d.name.lower() and "type" in d.name.lower():
            event_type_dim = d.name
    for m in model.metrics:
        if m.type in ("cumulative", "time_comparison") and m.sql in metric_names:
            m.base_metric = m.base_metric or m.sql
            m.sql = None
        if m.type in ("conversion", "retention"):
            def resolve_bare(v: str) -> str | None:
                if not _is_bare_event_name(v):
                    return v
                if event_type_dim is None:
                    errors.append(
                        f"model {model.name!r} metric {m.name!r}: bare event "
                        f"{v!r} needs an event-type dimension"
                    )
                    return v
                return f"{event_type_dim} = '{v.strip().replace(chr(39), chr(39) * 2)}'"

            for attr in ("base_event", "conversion_event", "activity_event"):
                v = getattr(m, attr)
                if v:
                    setattr(m, attr, resolve_bare(v))
            if m.steps:
                m.steps = [resolve_bare(s) for s in m.steps]


def _is_bare_event_name(v: str) -> bool:
    import re as _re

    # embedded single quotes stay on the bare-value path (an unbalanced
    # quote is never valid filter SQL); escaped at the interpolation site.
    # Niladic SQL literals are complete predicates, not event names —
    # `activity_event: TRUE` (the reference's default spelled out) must
    # roundtrip without demanding an event-type dimension.
    if v.strip().upper() in ("TRUE", "FALSE", "NULL"):
        return False
    return bool(_re.fullmatch(r"[A-Za-z_][A-Za-z0-9_']*", v.strip()))


# ---------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------

def _validate_model(model: Model) -> list[str]:
    errors: list[str] = []
    ctx = f"model {model.name!r}"
    if not (model.table or model.sql or model.source_uri):
        errors.append(f"{ctx}: needs one of table / sql / source_uri")
    if model.default_time_dimension:
        d = model.dimension(model.default_time_dimension)
        if d is None:
            errors.append(f"{ctx}: default_time_dimension "
                          f"{model.default_time_dimension!r} is not a dimension")
        elif d.type != "time":
            # message wording matches the reference's validation output
            # (native-fixtures manifest error_contains tokens)
            errors.append(f"{ctx}: default_time_dimension "
                          f"{model.default_time_dimension!r} must reference "
                          "a time dimension")
    for pa in model.pre_aggregations:
        pctx = f"{ctx} pre_aggregation {pa.name!r}"
        for mname in pa.measures:
            if model.metric(mname) is None:
                errors.append(
                    f"{pctx}: references unknown measure {mname!r}"
                )
        for dname in pa.dimensions:
            if model.dimension(dname) is None:
                errors.append(f"{pctx}: unknown dimension {dname!r}")
        if pa.time_dimension and model.dimension(pa.time_dimension) is None:
            errors.append(f"{pctx}: unknown time_dimension {pa.time_dimension!r}")
    for d in model.dimensions:
        if d.type not in ("categorical", "time", "boolean", "numeric"):
            errors.append(f"{ctx}: dimension {d.name!r} has unknown type {d.type!r}")
        if d.parent and model.dimension(d.parent) is None:
            errors.append(f"{ctx}: dimension {d.name!r} parent {d.parent!r} unknown")
    return errors


def validate_graph(graph) -> list[str]:
    """Whole-graph validation for ``layer.validate()``."""
    errors: list[str] = []
    for model in graph.models.values():
        errors.extend(_validate_model(model))
        for rel in model.relationships:
            if rel.type not in ("many_to_one", "one_to_one", "one_to_many",
                                "many_to_many", "cross"):
                errors.append(f"model {model.name!r} relationship {rel.name!r}: "
                              f"unknown type {rel.type!r}")
            if rel.name not in graph.models and (rel.through or rel.type != "cross"):
                errors.append(f"model {model.name!r} relationship {rel.name!r}: "
                              f"unknown target model")
    return errors


# ---------------------------------------------------------------------
# filesystem entry points
# ---------------------------------------------------------------------

def load_path(layer, path: str, strict: bool = True) -> None:
    """Load one file or every ``*.yml``/``*.yaml``/``*.sql``/``*.py``
    under a directory (mixed directories are the reference's
    ``mixed_yaml_sql_directory`` fixture; ``.py`` files are Python
    semantic definition files executed inside ``with layer:`` so
    constructed Models auto-register — reference ``loaders.py`` +
    ``core/registry.py:62``).

    ``strict=True`` (default) fails WITHOUT leaving a partial graph:
    YAML parse errors are detected up front, before any file loads
    (reference test_load_from_directory_strict_raises_on_detected_
    parse_error).  ``strict=False`` skips unloadable files with a
    warning (explicit lenient opt-in)."""
    from sidemantic_spark.authoring.sql_defs import load_sql_definitions

    if os.path.isdir(path):
        entries = sorted(os.listdir(path))
        files = [os.path.join(path, e) for e in entries
                 if e.endswith((".yml", ".yaml", ".sql", ".py"))]
        if not files:
            raise AuthoringError(f"no model files under {path!r}")
    else:
        files = [path]
    if strict:
        for f in files:
            if not f.endswith((".yml", ".yaml")):
                continue
            try:
                with open(f) as fh:
                    yaml_safe_load(fh.read())
            except yaml.YAMLError as exc:
                raise AuthoringError(
                    f"Could not parse {f}: {exc}"
                ) from exc
    for f in files:
        with open(f) as fh:
            text = fh.read()
        try:
            if f.endswith(".sql"):
                load_sql_definitions(layer, text, source=f)
            elif f.endswith(".py"):
                load_python_definitions(layer, text, source=f)
            else:
                load_yaml(layer, text, source=f)
        except Exception as exc:
            if strict:
                raise
            import warnings as _warnings

            _warnings.warn(f"skipped {f}: {exc}")


def load_python_definitions(layer, source_text: str, *, source: str = "<py>") -> None:
    """Execute a Python semantic definition file: Models constructed in
    the file body register on ``layer`` via the authoring registry.
    The namespace is pre-seeded with the model classes so definition
    files need no imports."""
    from sidemantic_spark.core.governance import Deprecation, Freshness
    from sidemantic_spark.core.model import (
        Dimension,
        Metric,
        Model,
        Relationship,
        Segment,
    )

    ns = {
        "Model": Model, "Dimension": Dimension, "Metric": Metric,
        "Relationship": Relationship, "Segment": Segment,
        "Freshness": Freshness, "Deprecation": Deprecation,
        "layer": layer,
    }
    code = compile(source_text, source, "exec")
    with layer:
        exec(code, ns)  # noqa: S102 — authoring files are user code by design


# ---------------------------------------------------------------------
# export
# ---------------------------------------------------------------------

def export_yaml(graph) -> str:
    """Serialize the graph back to native YAML (round-trip surface)."""
    out: dict = {"version": SUPPORTED_VERSION, "models": []}
    for model in graph.models.values():
        md: dict = {"name": model.name}
        for k in ("table", "sql", "source_uri", "description", "label",
                  "default_time_dimension", "default_grain",
                  "owner", "domain", "tier", "meta"):
            v = getattr(model, k)
            if v is not None:
                md[k] = v
        if model.deprecation is not None:
            md["deprecation"] = {k: v for k, v in vars(model.deprecation).items()
                                 if v is not None}
        if model.freshness is not None:
            md["freshness"] = {k: v for k, v in vars(model.freshness).items()
                               if v is not None}
        if getattr(model, "security", None) is not None:
            sec = {k: v for k, v in vars(model.security).items() if v}
            if sec:
                md["security"] = sec
        if getattr(model, "row_filters", None):
            md["row_filters"] = list(model.row_filters)
        if model.source_uri is not None and model.source_format != "parquet":
            md["source_format"] = model.source_format
        if getattr(model, "source_options", None):
            md["source_options"] = dict(model.source_options)
        md["primary_key"] = model.primary_key
        if model.dimensions:
            md["dimensions"] = [_dim_to_yaml(d) for d in model.dimensions]
        if model.metrics:
            md["metrics"] = [_metric_to_yaml(m) for m in model.metrics]
        if model.relationships:
            md["relationships"] = [_rel_to_yaml(r) for r in model.relationships]
        if model.segments:
            md["segments"] = [{k: v for k, v in
                               (("name", s.name), ("sql", s.sql),
                                ("description", s.description),
                                ("public",
                                 False if not getattr(s, "public", True)
                                 else None))
                               if v is not None}
                              for s in model.segments]
        if model.pre_aggregations:
            md["pre_aggregations"] = [_preagg_to_yaml(p) for p in model.pre_aggregations]
        out["models"].append(md)
    if graph.metrics:
        out["metrics"] = [_metric_to_yaml(m) for m in graph.metrics.values()]
    if graph.parameters:
        out["parameters"] = [
            {k: v for k, v in (("name", p.name), ("type", p.type),
                               ("default_value", p.default_value)) if v is not None}
            for p in graph.parameters.values()
        ]
    return yaml.safe_dump(out, sort_keys=False, default_flow_style=False)


def _dim_to_yaml(d: Dimension) -> dict:
    out = {"name": d.name, "type": d.type}
    for k in ("sql", "granularity", "label", "description", "parent", "window",
              "format", "value_format_name", "meta"):
        v = getattr(d, k)
        if v is not None:
            out[k] = v
    if d.supported_granularities:
        out["supported_granularities"] = list(d.supported_granularities)
    if d.synonyms:
        out["synonyms"] = list(d.synonyms)
    if not d.public:
        out["public"] = False
    return out


def _metric_to_yaml(m: Metric) -> dict:
    out: dict = {"name": m.name}
    if m.type:
        out["type"] = m.type
    if m.agg and m.type != "cohort":
        out["agg"] = m.agg
    for k in ("sql", "expr", "numerator", "denominator", "window",
              "grain_to_date", "base_metric", "comparison_type",
              "time_offset", "entity",
              "base_event", "conversion_event", "conversion_window",
              "activity_event", "having", "non_additive_dimension",
              "fill_nulls_with", "description", "label", "owner",
              "format", "value_format_name", "meta"):
        v = getattr(m, k)
        if v is not None:
            out[k] = v
    if m.drill_fields:
        out["drill_fields"] = list(m.drill_fields)
    if m.deprecation is not None:
        out["deprecation"] = {k: v for k, v in vars(m.deprecation).items()
                              if v is not None}
    if m.type == "cohort":
        if m.inner_metrics:
            # native multi-inner form round-trips verbatim
            out["agg"] = m.agg
            out["sql"] = m.sql
            out["inner_metrics"] = [dict(im) for im in m.inner_metrics]
        else:
            out["agg"] = m.cohort_aggregation or "count"
            out["inner_metrics"] = [{"name": "value", "agg": m.agg, "sql": m.sql}]
        if m.entity_dimensions:
            out["entity_dimensions"] = list(m.entity_dimensions)
    if m.type == "retention":
        out["periods"] = m.retention_periods
        out["retention_granularity"] = m.retention_granularity
    if m.filters:
        out["filters"] = list(m.filters)
    if m.synonyms:
        out["synonyms"] = list(m.synonyms)
    if not m.public:
        out["public"] = False
    return out


def _rel_to_yaml(r: Relationship) -> dict:
    out = {"name": r.name, "type": r.type}
    for k in ("foreign_key", "primary_key", "sql", "through", "join_type"):
        v = getattr(r, k)
        if v is not None:
            out[k] = v
    if r.through_from_key:
        out["through_foreign_key"] = r.through_from_key
    if r.through_to_key:
        out["related_foreign_key"] = r.through_to_key
    if not r.active:
        out["active"] = False
    return out


def _preagg_to_yaml(p) -> dict:
    out = {"name": p.name, "type": p.type, "measures": list(p.measures)}
    if p.dimensions:
        out["dimensions"] = list(p.dimensions)
    for k in ("sql", "time_dimension", "granularity", "partition_granularity",
              "lambda_boundary_grain", "lambda_boundary_sql"):
        v = getattr(p, k)
        if v is not None:
            out[k] = v
    return out
