"""Per-adapter key-coverage diff vs the reference's adapters.

For each adapter, extract the string keys the reference implementation
reads (``.get("k")`` / ``["k"]``) and report the ones the repo's
adapter never mentions. Raw output needs triage — the reference also
*writes* many keys (export-side metadata like ``bsl_*``), and several
parsers normalize case — so every remaining key carries a row in the
TRIAGE map below (enforced empty-diff by tests/test_adapter_coverage.py);
ADAPTER_COVERAGE.md keeps the narrative record.

Usage: python scripts/adapter_key_coverage.py
"""
import re

PAIRS = {
    "atscale_sml.py": "atscale.py", "bsl.py": "bsl.py", "cube.py": "cube.py",
    "gooddata.py": "gooddata.py", "graphene.py": "graphene.py", "hex.py": "hex.py",
    "holistics.py": "holistics.py", "lookml.py": "lookml.py", "malloy.py": "malloy.py",
    "metricflow.py": "metricflow.py", "omni.py": "omni.py", "osi.py": "osi.py",
    "rill.py": "rill.py", "snowflake.py": "snowflake.py", "superset.py": "superset.py",
    "tableau.py": "tableau.py", "thoughtspot.py": "thoughtspot.py",
    "tmdl.py": "tmdl.py", "yardstick.py": "yardstick.py",
}
KEY_RE = re.compile(r'(?:\.get\(\s*|\[)["\']([a-zA-Z_][a-zA-Z0-9_]*)["\']')
GENERIC = {"name", "type", "sql", "label", "description", "title", "model",
           "table", "primary_key", "dimensions", "measures", "metrics",
           "filters", "meta", "value", "key", "field", "fields", "id",
           "kind", "format", "default", "expr", "expression", "alias",
           "column", "columns", "tables", "views", "models"}


# ---------------------------------------------------------------------
# triage: every raw-diff key is either implemented under another
# spelling/mechanism (fp-*), an export-side write the reference makes
# into its own meta namespace (write-side), a reference-internal marker
# (internal), or deliberately out of scope with the reason (oos-*).
# tests/test_adapter_coverage.py enforces diff() - TRIAGE == {} and
# flags stale triage rows, so this map tracks the real diff exactly.
# ---------------------------------------------------------------------
TRIAGE: dict[str, dict[str, str]] = {
    "atscale.py": {
        "__global__": "internal: reference's global-settings sentinel key",
        "aliases": "oos-ui: AtScale attribute alias display list, no query semantics",
        "compression": "oos-conn: warehouse storage hint, Spark session owns storage",
        "connection": "oos-conn: warehouse connection plumbing (SURVEY §0: session is the engine)",
        "connection_id": "oos-conn: warehouse connection plumbing",
        "database": "oos-conn: warehouse catalog binding",
        "drillthroughs": "oos-ui: AtScale drillthrough UI affordance, preserved as meta by ref too",
        "m2m": "fp-mechanism: many-to-many declared via junction relationships in our graph",
        "named_quantiles": "oos-ui: AtScale quantile display presets",
        "package": "oos-conn: SML package deployment metadata",
        "packages": "oos-conn: SML package deployment metadata",
        "schema": "oos-conn: warehouse schema binding",
        "secondary_attributes": "oos-ui: AtScale UI affordance, meta-only in ref",
        "url": "oos-conn: deployment URL",
    },
    "bsl.py": {
        **{k: "write-side: ref writes its own bsl_* meta namespace on import; we preserve the same constructs under meta without the prefix scheme" for k in (
            "bsl_alias", "bsl_alias_of", "bsl_alias_source_model",
            "bsl_database", "bsl_derived_dimensions", "bsl_filter",
            "bsl_generated_from", "bsl_how", "bsl_is_calculated_measure",
            "bsl_is_entity", "bsl_is_event_timestamp", "bsl_join_type",
            "bsl_metadata", "bsl_model", "bsl_profile", "bsl_scoped_alias",
            "bsl_table", "bsl_with",
        )},
        "calculated_measures": "fp-mechanism: calculated measures import via expression-metric parse",
        "database": "oos-conn: warehouse catalog binding",
        "derived_dimensions": "fp-mechanism: derived dimensions import via dimension sql expressions",
        "how": "write-side: ref meta field on its own import notes",
        "is_event_timestamp": "fp-mechanism: event timestamp marked via default_time_dimension",
        "metadata": "write-side: ref generic meta envelope",
        "profile": "oos-conn: BSL connection profile",
    },
    "cube.py": {
        "add_group_by": "oos-multistage: Cube multi-stage measure framework; ref stubs to meta, we express as window/derived metrics natively",
        "group_by": "oos-multistage: Cube multi-stage measure framework",
        "cube_internal": "write-side: ref's own meta namespace key",
        "cube_type": "write-side: ref meta marker distinguishing cube vs view on its import",
        "cube_view_groups": "oos-ui: BI-catalog folder organization, display only",
        "view_groups": "oos-ui: BI-catalog folder organization",
        "folders": "oos-ui: BI-catalog folder organization",
        "top_level": "oos-ui: folder display flag",
        "default_ui_filters": "oos-ui: view UI filter presets (default_filters — the applied form — IS imported as Explore default_filters)",
        "prefix": "oos-naming: view member name prefixing is naming cosmetics; our Explore surface exposes qualified names natively (includes/excludes/alias members ARE imported)",
        "rolling_window_leading": "write-side: ref's meta key spelling for leading, which we compile to a real RANGE frame (adapters/cube.py leading handling)",
        "rolling_window_offset": "write-side: ref's meta key spelling for offset, preserved in our cube_rolling_window meta",
        "rollups": "fp-mechanism: view-level rollup references covered by the lambda-rollup spec (type: lambda)",
        "unionWithSourceData": "oos-lambda: Cube lambda-union runtime toggle; the preagg lambda spec covers the semantics",
        "union_with_source_data": "oos-lambda: same as unionWithSourceData",
    },
    "gooddata.py": {
        "data_source_id": "oos-conn: workspace/data-source deployment identifiers",
        "sql_data_source_id": "oos-conn: workspace/data-source deployment identifiers",
        "data_source_table_id": "fp-spelling: read as dataSourceTableId (camelCase) in _table_path call sites",
        "extra": "write-side: ref meta envelope for unrecognized keys",
        "granularitiesFormatting": "oos-ui: date format display metadata",
        "granularities_formatting": "oos-ui: date format display metadata",
        "schema": "oos-conn: warehouse schema binding",
        "sql_is_object": "write-side: ref meta marker recording that sql was an object",
        "workspaceDataFilterColumns": "oos-conn: workspace data-filter deployment config",
        "workspace_data_filter_columns": "oos-conn: workspace data-filter deployment config",
    },
    "graphene.py": {
        "target_table": "write-side: ref meta key recording relation targets on its import",
        "unit": "fp-mechanism: the grain unit is extracted from date_trunc('unit') expression text (adapters/graphene.py:303), matching the ref's sqlglot unit-arg read",
    },
    "hex.py": {
        "hex_resource_type": "internal: ref wrapper-class meta marker",
        "second": "fp-spelling: granularity literal handled by the shared grain tables",
    },
    "holistics.py": {
        "AmlValue": "internal: ref AML wrapper-class name, not a format key",
    },
    "lookml.py": {
        "_lookml_implicit_group": "internal: ref's own meta marker",
        "_unsupported_derived_table_raw": "internal: ref's own meta marker",
        "unsupported_derived_table": "internal: ref meta marker; our NDTs compile for real through layer.compile",
        "lookml_template": "internal: ref meta marker for extension-required views (we track extension == required directly)",
        "lookml_timeframe": "internal: ref meta marker; timeframes materialize as real dimensions here",
        "base_a": "internal: ref test-helper key inside lookml.py, not a LookML construct",
        "base_b": "internal: ref test-helper key",
        "extends__all": "fp-spelling: the lkml library's repeated-key spelling; our scanner parser emits extends directly",
        "filters__all": "fp-spelling: lkml library spelling; our parser emits filters directly",
        "extension_required": "fp-spelling: we read the raw `extension: required` declaration (adapters/lookml.py _apply_extends region); the ref key is its meta respelling",
    },
    "malloy.py": {
        "on_condition": "fp-mechanism: non-equi join conditions import as executable {from}/{to} custom join SQL (the ref stores the same text as metadata)",
        "persist_name": "write-side: annotation-only key ref preserves as meta without semantics",
        "source_type_constraints": "write-side: annotation-only key",
    },
    "metricflow.py": {
        "exports": "oos-dbt: dbt-side materialization config on saved_query (export table names for `dbt sl export`); the saved query itself imports fully, our materialization surface is preaggs",
    },
    "osi.py": {
        "osi_name": "internal: ref meta-marker name, not a format key",
    },
    "rill.py": {
        "rill_parent": "write-side: ref's meta-preservation namespace for its lossy import; we materialize derived views for real",
        "rill_parent_dimensions": "write-side: ref meta namespace (selectors ARE applied via _field_selector)",
        "rill_parent_measures": "write-side: ref meta namespace (selectors ARE applied)",
        "rill_smallest_time_grain": "write-side: ref meta spelling; smallest_time_grain is read and applied",
        "uri": "oos-conn: rill source URI deployment binding (model/table keys carry the semantics)",
    },
    "superset.py": {
        "filterable": "oos-ui: chart-builder column toggle",
        "groupby": "oos-ui: chart-builder column toggle",
        "is_active": "oos-ui: dataset lifecycle flag",
        "version": "oos-ui: dataset version display",
    },
    "tableau.py": {
        "function": "oos-federated: .tds federated-connection internals",
        "member": "oos-federated: .tds federated-connection internals",
        "parent_name": "oos-federated: .tds federated-connection internals",
        "remote_alias": "oos-federated: .tds federated-connection internals",
        "source_column_name": "oos-federated: .tds federated-connection internals",
        "source_table_name": "oos-federated: .tds federated-connection internals",
        "tableau_is_legacy": "internal: ref meta marker",
        "tableau_semantic_layer": "internal: ref meta marker",
    },
    "thoughtspot.py": {
        "__type": "internal: TML envelope discriminator the ref's generic loader reads",
        "cardinality": "oos-physical: ThoughtSpot engine modeling hint",
        "db": "oos-conn: physical database binding",
        "db_column_properties": "oos-physical: ThoughtSpot engine column hints (data_type is read from the column itself)",
    },
    "tmdl.py": {
        **{k: "fp-spelling: the ref's TMDL tokenizer lowercases property names before lookup; our parser matches the original spellings case-insensitively" for k in (
            "caption", "formatstring", "fromcardinality", "fromcolumn",
            "isactive", "ishidden", "tocardinality", "tocolumn",
        )},
        "createOrReplace": "fp-mechanism: TMDL statement wrapper handled by the block scanner",
        "from_model": "write-side: ref meta key on its relationship import",
        "to_model": "write-side: ref meta key",
        "raw": "write-side: ref meta envelope for unparsed blocks",
    },
    "yardstick.py": {
        **{k: "fp-mechanism: read via the shared rewriter (sql/rewriter.py AT-modifier path), not the adapter module the script compares" for k in (
            "agg", "base_relation_sql", "base_table", "from_", "joins",
            "with_", "yardstick_measure",
        )},
    },
}


def diff() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for ref, repo in sorted(PAIRS.items()):
        ref_src = open(f"/root/reference/sidemantic/adapters/{ref}").read()
        repo_src = open(f"/root/repo/sidemantic_spark/adapters/{repo}").read()
        ref_keys = set(KEY_RE.findall(ref_src))
        missing = sorted(
            k for k in ref_keys
            if k not in GENERIC
            and not re.search(rf'["\']({k})["\']|\b{k}\b', repo_src)
        )
        if missing:
            out[repo] = missing
    return out


def untriaged() -> dict[str, list[str]]:
    """Raw diff minus triage rows — the enforced-empty set."""
    out = {}
    for repo, missing in diff().items():
        rows = TRIAGE.get(repo, {})
        left = [k for k in missing if k not in rows]
        if left:
            out[repo] = left
    return out


def stale_triage() -> dict[str, list[str]]:
    """Triage rows whose key no longer appears in the raw diff (the key
    got implemented or the reference dropped it) — prune these."""
    d = diff()
    out = {}
    for repo, rows in TRIAGE.items():
        gone = [k for k in rows if k not in d.get(repo, [])]
        if gone:
            out[repo] = gone
    return out


if __name__ == "__main__":
    for repo, missing in diff().items():
        rows = TRIAGE.get(repo, {})
        tr = sum(1 for k in missing if k in rows)
        print(f"{repo}: {len(missing)} unread reference keys ({tr} triaged): {missing}")
    u, s = untriaged(), stale_triage()
    print(f"UNTRIAGED: {sum(map(len, u.values()))} {u or ''}")
    print(f"STALE TRIAGE ROWS: {sum(map(len, s.values()))} {s or ''}")
