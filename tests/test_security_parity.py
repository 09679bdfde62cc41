"""Ported reference security regression suites (r11 VERDICT ask #1).

Sources — every test cites its reference counterpart file:line:
- ``tests/core/test_security_policy.py`` (10 fns): ALL ported here.
- ``tests/core/test_security_enforcement.py`` (9 fns): 8 ported here;
  the preagg-bypass case (:239) is already
  ``tests/test_preagg.py::test_security_policy_bypasses_preagg_routing``.
- ``tests/core/test_security_advisor_regressions.py`` (16 fns): 14
  ported here; the pgwire-auth case (:251) is already
  ``tests/test_pgwire.py::test_user_attrs_require_auth``; the
  ``_query_touches_secured_model`` internal probe (:264) ports as its
  observable behavior (segment-only query still denies).
- ``tests/test_sql_generation_security.py`` (17 fns): 15 ported here
  (dialect-specific spellings adapted to Spark, see divergences).
- ``tests/test_mcp_security.py`` (4 fns): already ported at
  ``tests/test_mcp_server.py:113-180`` (default-None denies, static
  attrs scope rows, run_sql scopes rows, run_sql denies non-semantic).

Divergences from the reference, by design:
- ``enforce_visibility`` defaults ON in this engine (the reference
  defaults off); the reference's "default off leaves users unaffected"
  case sets the flag off explicitly here.
- Table calculations compile to Spark SQL projection/window stages —
  there is no Python ``eval`` at all, so the reference's safe-eval
  regressions (its ``_safe_eval`` rejected ``__import__``/attribute
  access) assert the stronger property here: no ``eval``/``exec``
  anywhere in the module source, plus value parity for the formulas.
- Single Spark dialect: the reference's postgres/bigquery
  ``_build_interval`` variants and postgres identifier-quoting cases
  (ref test_sql_generation_security.py:503-531, :204-249) pin the
  Spark spelling instead (``INTERVAL '7' DAY``, backtick quoting).
- Spark runs ANSI mode: the injection-neutralized-end-to-end case's
  "fail closed with a conversion error" arm is the Spark outcome
  (string literal vs int column), which the reference explicitly
  accepts as the safe result.
"""

from __future__ import annotations

import pytest

from sidemantic_spark.core.layer import SparkSemanticLayer
from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship, Segment
from sidemantic_spark.core.security import (
    SecurityError,
    SecurityPolicy,
    render_row_filter,
)

_VIEWS_READY = False


@pytest.fixture()
def secp_db(spark):
    """The reference's customers/orders fixture as Spark temp views
    (ref tests/core/test_security_enforcement.py:22-61)."""
    global _VIEWS_READY
    if not _VIEWS_READY:
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_customers AS SELECT * FROM VALUES
            (1,'US','a@us.com'),(2,'US','b@us.com'),(3,'EU','c@eu.com')
            AS t(id,region,email)"""
        )
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_orders AS SELECT * FROM VALUES
            (10,1,CAST(100.0 AS DECIMAL(10,2))),(11,1,CAST(50.0 AS DECIMAL(10,2))),
            (12,2,CAST(25.0 AS DECIMAL(10,2))),(13,3,CAST(200.0 AS DECIMAL(10,2))),
            (14,3,CAST(300.0 AS DECIMAL(10,2)))
            AS t(id,customer_id,amount)"""
        )
        # ref test_security_advisor_regressions.py:76-97 balance fixture
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_bal AS SELECT * FROM VALUES
            ('A',DATE'2026-01-10',100),('A',DATE'2026-01-31',110),
            ('B',DATE'2026-01-10',200),('B',DATE'2026-01-31',210)
            AS t(account,day,balance)"""
        )
        # ref :45-70 tenant fixture and :290-306 subquery-allowlist fixture
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_t AS SELECT * FROM VALUES
            (1,10),(2,50) AS t(tenant,v)"""
        )
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_t3 AS SELECT * FROM VALUES
            (1,10),(2,20),(3,30) AS t(id,v)"""
        )
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW secp_allowed AS SELECT * FROM VALUES (1),(3) AS t(id)"
        )
        # ref :133-150 visibility fixture
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_vis AS SELECT * FROM VALUES
            (1,'US',50),(2,'EU',150) AS t(id,region,margin)"""
        )
        # ref test_sql_generation_security.py:448-500 conversion fixture
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_events AS SELECT * FROM VALUES
            (1,1,'signup',TIMESTAMP'2024-01-01'),(2,1,'purchase',TIMESTAMP'2024-01-05'),
            (3,2,'signup',TIMESTAMP'2024-01-02'),(4,3,'signup',TIMESTAMP'2024-01-03'),
            (5,3,'purchase',TIMESTAMP'2024-02-20')
            AS t(event_id,user_id,event_type,ts)"""
        )
        # ref :174-201 derived-metric fixture
        spark.sql(
            """CREATE OR REPLACE TEMP VIEW secp_rev AS SELECT * FROM VALUES
            ('US',CAST(100.0 AS DECIMAL(10,2)),CAST(140.0 AS DECIMAL(10,2))),
            ('EU',CAST(50.0 AS DECIMAL(10,2)),CAST(90.0 AS DECIMAL(10,2)))
            AS t(region,amount,gross_amount)"""
        )
        _VIEWS_READY = True
    return spark


def _customers_model(**security_kwargs):
    """ref test_security_enforcement.py:72-84."""
    return Model(
        name="customers",
        table="secp_customers",
        primary_key="id",
        dimensions=[
            Dimension(name="id", type="numeric"),
            Dimension(name="region", type="categorical"),
            Dimension(name="email", type="categorical"),
        ],
        metrics=[Metric(name="customer_count", agg="count")],
        security=SecurityPolicy(**security_kwargs) if security_kwargs else None,
    )


def _orders_model():
    """ref test_security_enforcement.py:87-98."""
    return Model(
        name="sorders",
        table="secp_orders",
        primary_key="id",
        relationships=[
            Relationship(name="customers", type="many_to_one", foreign_key="customer_id")
        ],
        dimensions=[
            Dimension(name="id", type="numeric"),
            Dimension(name="customer_id", type="numeric"),
        ],
        metrics=[
            Metric(name="order_count", agg="count"),
            Metric(name="total_amount", agg="sum", sql="amount"),
        ],
    )


# ===========================================================================
# §1 ref tests/core/test_security_policy.py — data model + rendering helper
# ===========================================================================


def test_security_policy_defaults():
    """ref test_security_policy.py:16."""
    policy = SecurityPolicy()
    assert policy.access is True
    assert policy.row_filters == []


def test_security_policy_construction():
    """ref test_security_policy.py:23."""
    policy = SecurityPolicy(
        access="user.role in ['analyst', 'admin']",
        row_filters=["region = '{{ user.region }}'", "team_id = {{ user.team_id }}"],
    )
    assert policy.access == "user.role in ['analyst', 'admin']"
    assert policy.row_filters == [
        "region = '{{ user.region }}'",
        "team_id = {{ user.team_id }}",
    ]


def test_security_policy_access_bool():
    """ref test_security_policy.py:33."""
    assert SecurityPolicy(access=False).access is False


def test_model_security_defaults_none():
    """ref test_security_policy.py:38."""
    assert Model(name="orders", table="public.orders").security is None


def test_model_with_security_policy():
    """ref test_security_policy.py:43."""
    model = Model(
        name="orders",
        table="public.orders",
        security=SecurityPolicy(
            access="user.role == 'admin'",
            row_filters=["region = '{{ user.region }}'"],
        ),
    )
    assert model.security is not None
    assert model.security.access == "user.role == 'admin'"
    assert model.security.row_filters == ["region = '{{ user.region }}'"]


def test_security_policy_yaml_round_trip(spark):
    """ref test_security_policy.py:55 — access expr + 2 row filters
    survive native YAML dump/load."""
    from sidemantic_spark.authoring.yaml_io import export_yaml, load_yaml

    layer = SparkSemanticLayer(spark)
    layer.add_model(
        Model(
            name="yrt_orders",
            table="public.orders",
            primary_key="order_id",
            security=SecurityPolicy(
                access="user.role in ['analyst', 'admin']",
                row_filters=[
                    "region = '{{ user.region }}'",
                    "team_id = {{ user.team_id }}",
                ],
            ),
        )
    )
    text = export_yaml(layer.graph)
    reloaded = SparkSemanticLayer(spark)
    load_yaml(reloaded, text)
    security = reloaded.graph.get_model("yrt_orders").security
    assert security is not None
    assert security.access == "user.role in ['analyst', 'admin']"
    assert security.row_filters == [
        "region = '{{ user.region }}'",
        "team_id = {{ user.team_id }}",
    ]


def test_security_policy_yaml_round_trip_default_access(spark):
    """ref test_security_policy.py:87 — row filters survive with
    default access=True."""
    from sidemantic_spark.authoring.yaml_io import export_yaml, load_yaml

    layer = SparkSemanticLayer(spark)
    layer.add_model(
        Model(
            name="yrt_default",
            table="public.orders",
            primary_key="order_id",
            security=SecurityPolicy(row_filters=["region = '{{ user.region }}'"]),
        )
    )
    reloaded = SparkSemanticLayer(spark)
    load_yaml(reloaded, export_yaml(layer.graph))
    security = reloaded.graph.get_model("yrt_default").security
    assert security is not None
    assert security.access is True
    assert security.row_filters == ["region = '{{ user.region }}'"]


def test_render_row_filter_happy_path():
    """ref test_security_policy.py:110."""
    rendered = render_row_filter(
        "region = '{{ user.region }}'", {"region": "us-east"}, ctx="t"
    )
    assert rendered == "region = 'us-east'"


def test_render_row_filter_undefined_attr_raises():
    """ref test_security_policy.py:116 — StrictUndefined."""
    with pytest.raises(SecurityError):
        render_row_filter("region = '{{ user.region }}'", {}, ctx="t")


def test_render_row_filter_renders_quote_containing_value():
    """ref test_security_policy.py:122 — O'Brien renders as one escaped
    literal, never terminating the string early."""
    rendered = render_row_filter("name = '{{ user.name }}'", {"name": "O'Brien"}, ctx="t")
    assert rendered == "name = 'O''Brien'"


# ===========================================================================
# §2 ref tests/core/test_security_enforcement.py — compile/query path
# ===========================================================================


def test_row_filter_on_joined_model_lands_in_that_models_cte(secp_db):
    """ref test_security_enforcement.py:101 — a row filter on a joined
    (non-base) model must be injected inside that model's own CTE,
    before the join/aggregation (on Spark this is also what lets
    Catalyst push it into the scan)."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        _customers_model(access=True, row_filters=["region = '{{ user.region }}'"])
    )
    layer.add_model(_orders_model())

    sql = layer.compile(
        metrics=["sorders.order_count"],
        dimensions=["customers.region"],
        user={"region": "US"},
    )
    assert "customers_cte AS (" in sql
    customers_cte = sql.split("customers_cte AS (", 1)[1].split("\n)", 1)[0]
    assert "region = 'US'" in customers_cte, f"row filter not scoped inside customers CTE:\n{sql}"
    assert "WHERE" in customers_cte


def test_access_false_raises_before_sql(secp_db):
    """ref test_security_enforcement.py:122 — access evaluating falsy
    raises SecurityError naming the model; literal False also denies."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(_customers_model(access="{{ user.role == 'admin' }}"))
    with pytest.raises(SecurityError, match="customers"):
        layer.compile(metrics=["customers.customer_count"], user={"role": "viewer"})

    layer2 = SparkSemanticLayer(secp_db)
    layer2.add_model(_customers_model(access=False))
    with pytest.raises(SecurityError, match="customers"):
        layer2.compile(metrics=["customers.customer_count"], user={})


def test_bare_access_expression_is_evaluated_not_rendered(secp_db):
    """ref core/security.py:243-283 evaluate_access — the reference
    accepts the BARE expression form; rendering it as a template would
    yield a non-empty string and fail open for every caller."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(_customers_model(access="user.role == 'admin'"))
    with pytest.raises(SecurityError, match="customers"):
        layer.compile(metrics=["customers.customer_count"], user={"role": "viewer"})
    # the authorized role compiles fine
    assert "customers_cte" in layer.compile(
        metrics=["customers.customer_count"], user={"role": "admin"}
    )
    # missing attribute denies (StrictUndefined), never defaults truthy
    with pytest.raises(SecurityError):
        layer.compile(metrics=["customers.customer_count"], user={})


def test_security_block_with_none_attributes_denies(secp_db):
    """ref test_security_enforcement.py:137 — user=None is
    deny-by-default; an EMPTY dict is 'provided but empty' and trips
    the undefined-attribute guard from the row filter instead."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        _customers_model(access=True, row_filters=["region = '{{ user.region }}'"])
    )
    with pytest.raises(SecurityError, match="user_attributes|security policy"):
        layer.compile(metrics=["customers.customer_count"], user=None)
    with pytest.raises(SecurityError, match="template error|undefined|attribute"):
        layer.compile(metrics=["customers.customer_count"], user={})


def test_injection_value_is_neutralized(secp_db):
    """ref test_security_enforcement.py:151 — a dangerous attribute
    value must stay a single quoted literal, not a boolean condition."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        _customers_model(access=True, row_filters=["email = '{{ user.email }}'"])
    )
    injection = "x' OR '1'='1"
    sql = layer.compile(metrics=["customers.customer_count"], user={"email": injection})
    # the escaped single literal is present…
    assert "email = 'x'' OR ''1''=''1'" in sql, sql
    # …and the raw breakout form is not
    assert "email = 'x' OR " not in sql
    # executing it returns zero matches (no customer has that email),
    # never the unscoped total
    assert layer.query(
        metrics=["customers.customer_count"], user={"email": injection}
    ).collect()[0][0] == 0


def test_enforce_visibility_hides_and_rejects_non_public_fields(secp_db):
    """ref test_security_enforcement.py:166 — requesting a non-public
    field raises; public fields compile; catalog listings omit it."""
    layer = SparkSemanticLayer(secp_db)
    layer.enforce_visibility = True
    layer.add_model(
        Model(
            name="vis_orders",
            table="secp_orders",
            primary_key="id",
            dimensions=[
                Dimension(name="id", type="numeric"),
                Dimension(name="customer_id", type="numeric"),
            ],
            metrics=[
                Metric(name="order_count", agg="count"),
                Metric(name="margin", agg="sum", sql="amount", public=False),
            ],
        )
    )
    with pytest.raises(SecurityError, match="margin"):
        layer.compile(metrics=["vis_orders.margin"])
    layer.compile(metrics=["vis_orders.order_count"])  # public still compiles

    # catalog listing omits the hidden metric (the reference also checks
    # describe_models(); this engine's introspection surface is the
    # information_schema-shaped catalog)
    catalog = layer.get_catalog_metadata()
    cols = {(c["table_name"], c["column_name"]) for c in catalog["columns"]}
    assert ("vis_orders", "order_count") in cols
    assert ("vis_orders", "margin") not in cols


def test_enforce_visibility_off_allows_non_public(secp_db):
    """ref test_security_enforcement.py:204 — with enforcement off,
    non-public fields compile fine. DIVERGENCE: the reference defaults
    the flag off; this engine defaults it ON, so the flag is set off
    explicitly here."""
    layer = SparkSemanticLayer(secp_db)
    layer.enforce_visibility = False
    layer.add_model(
        Model(
            name="vis_off",
            table="secp_orders",
            primary_key="id",
            dimensions=[Dimension(name="id", type="numeric")],
            metrics=[Metric(name="margin", agg="sum", sql="amount", public=False)],
        )
    )
    layer.compile(metrics=["vis_off.margin"])


def test_enforce_visibility_rejects_hidden_default_time_dimension(secp_db):
    """ref test_security_enforcement.py:219 — the auto-included
    default_time_dimension must not leak a hidden field's values."""
    layer = SparkSemanticLayer(secp_db)
    layer.enforce_visibility = True
    layer.add_model(
        Model(
            name="vis_time",
            table="secp_orders",
            primary_key="id",
            default_time_dimension="created_at",
            default_grain="day",
            dimensions=[
                Dimension(name="id", type="numeric"),
                Dimension(
                    name="created_at", sql="id", type="time",
                    granularity="day", public=False,
                ),
            ],
            metrics=[Metric(name="order_count", agg="count")],
        )
    )
    with pytest.raises(SecurityError, match="created_at"):
        layer.compile(metrics=["vis_time.order_count"])


def test_row_filter_scopes_rows_end_to_end(secp_db):
    """ref test_security_enforcement.py:272 — executed: a scoped query
    returns strictly fewer rows than unscoped; a filter on the JOINED
    model scopes the fact through the join (US customers 1,2 own orders
    10,11,12 -> 3 of 5)."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        _customers_model(access=True, row_filters=["region = '{{ user.region }}'"])
    )
    layer.add_model(_orders_model())

    plain = SparkSemanticLayer(secp_db)
    plain.add_model(_customers_model())
    unscoped_total = plain.query(metrics=["customers.customer_count"]).collect()[0][0]
    assert unscoped_total == 3

    scoped = layer.query(
        metrics=["customers.customer_count"], user={"region": "US"}
    ).collect()[0][0]
    assert scoped == 2
    assert scoped < unscoped_total

    order_rows = layer.query(
        metrics=["sorders.order_count"],
        dimensions=["customers.region"],
        user={"region": "US"},
    ).collect()
    assert sum(row[-1] for row in order_rows) == 3, order_rows


# ===========================================================================
# §3 ref tests/core/test_security_advisor_regressions.py
# ===========================================================================


def test_unquoted_row_filter_neutralizes_string_injection():
    """ref test_security_advisor_regressions.py:18 — the canonical
    unquoted form must still not break out."""
    rendered = render_row_filter(
        "tenant_id = {{ user.tenant_id }}", {"tenant_id": "1 OR 1=1"}, ctx="t"
    )
    assert rendered == "tenant_id = '1 OR 1=1'"
    assert " OR " not in rendered.replace("'1 OR 1=1'", "")


def test_quoted_row_filter_still_works_and_is_safe():
    """ref test_security_advisor_regressions.py:26."""
    assert render_row_filter(
        "region = '{{ user.region }}'", {"region": "US"}, ctx="t"
    ) == "region = 'US'"
    out = render_row_filter(
        "email = '{{ user.email }}'", {"email": "x' OR '1'='1"}, ctx="t"
    )
    assert out == "email = 'x'' OR ''1''=''1'"


def test_row_filter_typed_literals():
    """ref test_security_advisor_regressions.py:33."""
    assert render_row_filter("n = {{ user.n }}", {"n": 42}, ctx="t") == "n = 42"
    assert render_row_filter("f = {{ user.f }}", {"f": 1.5}, ctx="t") == "f = 1.5"
    assert render_row_filter("b = {{ user.b }}", {"b": True}, ctx="t") == "b = TRUE"
    assert render_row_filter("x = {{ user.x }}", {"x": None}, ctx="t") == "x = NULL"


def test_row_filter_rejects_unsupported_attribute_type():
    """ref test_security_advisor_regressions.py:40 — an object's
    attacker-controlled repr never reaches SQL."""
    with pytest.raises(SecurityError):
        render_row_filter("x = {{ user.x }}", {"x": object()}, ctx="t")


def test_row_filter_injection_is_enforced_end_to_end(secp_db):
    """ref test_security_advisor_regressions.py:45 — a malicious
    attribute value cannot widen a scoped query's result: it renders as
    a quoted literal compared to the int column, so the query fails
    closed (Spark ANSI conversion error) or returns no all-tenants row
    — never the naive unscoped total of 60."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="tsec",
            table="secp_t",
            primary_key="tenant",
            dimensions=[Dimension(name="tenant", type="numeric")],
            metrics=[Metric(name="total", agg="sum", sql="v")],
            security=SecurityPolicy(row_filters=["tenant = {{ user.tenant }}"]),
        )
    )
    assert [tuple(r) for r in layer.query(
        metrics=["tsec.total"], user={"tenant": 1}
    ).collect()] == [(10,)]
    try:
        rows = [tuple(r) for r in layer.query(
            metrics=["tsec.total"], user={"tenant": "1 OR 1=1"}
        ).collect()]
    except Exception:
        rows = None  # fail-closed (conversion error) is the safe outcome
    assert rows != [(60,)]


def _balance_layer(spark):
    """ref test_security_advisor_regressions.py:76."""
    layer = SparkSemanticLayer(spark)
    layer.add_model(
        Model(
            name="bal",
            table="secp_bal",
            primary_key="account",
            dimensions=[
                Dimension(name="account", type="categorical"),
                Dimension(name="day", type="time", granularity="day"),
            ],
            metrics=[
                Metric(name="total_balance", agg="sum", sql="balance",
                       non_additive_dimension="day"),
            ],
        )
    )
    return layer


def test_semi_additive_month_grain_uses_last_snapshot(secp_db):
    """ref test_security_advisor_regressions.py:100 — last day-of-month
    per account, summed = 110 + 210 = 320 (NOT the naive 620). The
    reference rewrites via a MAX window + CASE NULL-out; this engine
    plans the same semantics as a grouped MAX_BY pipeline (one shuffle,
    no per-row window) — the structural assertion pins that plan and
    the values pin the parity."""
    layer = _balance_layer(secp_db)
    sql = " ".join(layer.compile(
        metrics=["bal.total_balance"], dimensions=["bal.day__month"]
    ).split())
    assert "plan=semi-additive" in sql
    assert "MAX_BY(" in sql
    assert "GROUP BY day__month" in sql
    rows = layer.query(
        metrics=["bal.total_balance"], dimensions=["bal.day__month"]
    ).collect()
    assert len(rows) == 1
    month, total = rows[0]
    assert (month.year, month.month, month.day, int(total)) == (2026, 1, 1, 320)


def test_semi_additive_raw_grain_is_additive(secp_db):
    """ref test_security_advisor_regressions.py:117 — grouping by the
    raw grain is already one snapshot per bucket: no QUALIFY stage (the
    reference asserts no QUALIFY keyword; here the values pin it)."""
    layer = _balance_layer(secp_db)
    sql = layer.compile(metrics=["bal.total_balance"], dimensions=["bal.day"])
    assert "QUALIFY" not in sql
    rows = {r[0].strftime("%Y-%m-%d"): int(r[1]) for r in layer.query(
        metrics=["bal.total_balance"], dimensions=["bal.day"]
    ).collect()}
    assert rows == {"2026-01-10": 300, "2026-01-31": 320}


def test_semi_additive_by_entity_last_value(secp_db):
    """ref test_security_advisor_regressions.py:124."""
    layer = _balance_layer(secp_db)
    rows = {r[0]: int(r[1]) for r in layer.query(
        metrics=["bal.total_balance"], dimensions=["bal.account"]
    ).collect()}
    assert rows == {"A": 110, "B": 210}


def _visibility_layer(spark):
    """ref test_security_advisor_regressions.py:133."""
    layer = SparkSemanticLayer(spark)
    layer.enforce_visibility = True
    layer.add_model(
        Model(
            name="vord",
            table="secp_vis",
            primary_key="id",
            dimensions=[
                Dimension(name="region", type="categorical"),
                Dimension(name="margin", type="numeric", public=False),
            ],
            metrics=[Metric(name="cnt", agg="count")],
        )
    )
    return layer


def test_visibility_blocks_hidden_field_in_filter(secp_db):
    """ref test_security_advisor_regressions.py:153."""
    layer = _visibility_layer(secp_db)
    with pytest.raises(SecurityError, match="margin"):
        layer.compile(metrics=["vord.cnt"], filters=["vord.margin > 100"])


def test_visibility_blocks_bare_hidden_field_in_filter(secp_db):
    """ref test_security_advisor_regressions.py:159."""
    layer = _visibility_layer(secp_db)
    with pytest.raises(SecurityError, match="margin"):
        layer.compile(metrics=["vord.cnt"], filters=["margin > 100"])


def test_visibility_blocks_quoted_hidden_field_in_filter(secp_db):
    """ref test_security_advisor_regressions.py:165 — quoted spellings
    must not blind the scan."""
    layer = _visibility_layer(secp_db)
    with pytest.raises(SecurityError, match="margin"):
        layer.compile(metrics=["vord.cnt"], filters=['"vord"."margin" > 100'])


def test_visibility_blocks_hidden_field_in_order_by(secp_db):
    """ref test_security_advisor_regressions.py:171."""
    layer = _visibility_layer(secp_db)
    with pytest.raises(SecurityError, match="margin"):
        layer.compile(
            metrics=["vord.cnt"], dimensions=["vord.region"],
            order_by=["vord.margin"],
        )


def test_visibility_blocks_bare_hidden_field_in_order_by(secp_db):
    """ref test_security_advisor_regressions.py:177."""
    layer = _visibility_layer(secp_db)
    with pytest.raises(SecurityError, match="margin"):
        layer.compile(
            metrics=["vord.cnt"], dimensions=["vord.region"], order_by=["margin"],
        )


def test_visibility_bare_token_scoped_to_resolved_models(secp_db):
    """r11 ADVICE repro (VERDICT ask #4): a bare 'region' filter on
    model A must NOT be rejected because an UNRELATED model B hides a
    'region' — but still fails closed when B is in the query."""
    layer = _visibility_layer(secp_db)  # vord: public region, hidden margin
    layer.add_model(
        Model(
            name="vother",
            table="secp_customers",
            primary_key="id",
            dimensions=[Dimension(name="region", type="categorical", public=False)],
            metrics=[Metric(name="other_cnt", agg="count")],
        )
    )
    # B (vother) not in the query: bare region binds to vord only
    layer.compile(metrics=["vord.cnt"], filters=["region = 'US'"])
    # B in the query: its hidden region rejects, qualified or bare
    with pytest.raises(SecurityError, match="region"):
        layer.compile(metrics=["vother.other_cnt"], filters=["region = 'US'"])
    with pytest.raises(SecurityError, match="region"):
        layer.compile(metrics=["vord.cnt"], filters=["vother.region = 'US'"])


def test_visibility_allows_public_fields(secp_db):
    """ref test_security_advisor_regressions.py:183."""
    layer = _visibility_layer(secp_db)
    rows = dict(
        tuple(r) for r in layer.query(
            metrics=["vord.cnt"], dimensions=["vord.region"]
        ).collect()
    )
    assert rows == {"US": 1, "EU": 1}


def test_sql_first_path_denied_for_secured_model(secp_db):
    """ref test_security_advisor_regressions.py:190 — layer.sql()
    denies missing context and scopes rows when context is supplied."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="tsec2",
            table="secp_t",
            primary_key="tenant",
            dimensions=[Dimension(name="tenant", type="numeric")],
            metrics=[Metric(name="total", agg="sum", sql="v")],
            security=SecurityPolicy(row_filters=["tenant = {{ user.tenant }}"]),
        )
    )
    with pytest.raises(SecurityError, match="user_attributes"):
        layer.sql("SELECT tsec2.total FROM tsec2")
    result = layer.sql("SELECT tsec2.total FROM tsec2", user={"tenant": 1})
    assert tuple(result.collect()[0]) == (10,)


def test_row_filter_boolean_control_flow_preserves_truthiness():
    """ref test_security_advisor_regressions.py:213 — a false boolean
    attribute must not render the admin/bypass branch; control flow
    sees raw values while {{ }} output is still literal-quoted."""
    tmpl = "{% if user.is_admin %}1=1{% else %}tenant_id = {{ user.tenant_id }}{% endif %}"
    assert render_row_filter(tmpl, {"is_admin": False, "tenant_id": 7}, ctx="t") == "tenant_id = 7"
    assert render_row_filter(tmpl, {"is_admin": True, "tenant_id": 7}, ctx="t") == "1=1"
    cmp_tmpl = "{% if user.role == 'admin' %}1=1{% else %}region = {{ user.region }}{% endif %}"
    assert render_row_filter(cmp_tmpl, {"role": "analyst", "region": "US"}, ctx="t") == "region = 'US'"
    assert render_row_filter("tid = {{ user.tid }}", {"tid": "1 OR 1=1"}, ctx="t") == "tid = '1 OR 1=1'"


def test_visibility_blocks_non_public_segment(secp_db):
    """ref test_security_advisor_regressions.py:229."""
    layer = SparkSemanticLayer(secp_db)
    layer.enforce_visibility = True
    layer.add_model(
        Model(
            name="segord",
            table="secp_vis",
            primary_key="id",
            dimensions=[Dimension(name="region", type="categorical")],
            metrics=[Metric(name="cnt", agg="count")],
            segments=[Segment(name="internal", sql="region = 'US'", public=False)],
        )
    )
    with pytest.raises(SecurityError, match="internal"):
        layer.compile(metrics=["segord.cnt"], segments=["segord.internal"])


def test_segment_only_secured_query_denies_without_attributes(secp_db):
    """ref test_security_advisor_regressions.py:264 — a secured model
    referenced via a segment must not bypass enforcement; the
    deny-by-default still fires for a segment query with no attributes.
    (The reference also probes its `_query_touches_secured_model`
    helper; this engine resolves the model through the query spec, so
    the observable deny is the ported behavior.)"""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="segsec",
            table="secp_vis",
            primary_key="id",
            dimensions=[Dimension(name="region", type="categorical")],
            metrics=[Metric(name="cnt", agg="count")],
            segments=[Segment(name="us_only", sql="region = 'US'")],
            security=SecurityPolicy(row_filters=["region = '{{ user.region }}'"]),
        )
    )
    with pytest.raises(SecurityError):
        layer.compile(metrics=["segsec.cnt"], segments=["segsec.us_only"])


def test_row_filter_subquery_scopes_correctly(secp_db):
    """ref test_security_advisor_regressions.py:290 — a row filter with
    a subquery keeps the inner columns unqualified; user={} (no
    attributes referenced) executes it."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="tsub",
            table="secp_t3",
            primary_key="id",
            dimensions=[Dimension(name="id", type="numeric")],
            metrics=[Metric(name="tot", agg="sum", sql="v")],
            security=SecurityPolicy(
                row_filters=["id IN (SELECT id FROM secp_allowed)"]
            ),
        )
    )
    assert [tuple(r) for r in layer.query(
        metrics=["tsub.tot"], user={}
    ).collect()] == [(40,)]


def test_rewriter_threads_user_attributes(secp_db):
    """ref test_security_advisor_regressions.py:309 — the SQL-first
    rewrite evaluates the access gate against the caller's attributes:
    no attributes -> deny-by-default; authorized -> rewrites;
    unauthorized -> denied."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="gated",
            table="secp_t",
            primary_key="tenant",
            metrics=[Metric(name="total", agg="sum", sql="v")],
            security=SecurityPolicy(access="user.role == 'analyst'"),
        )
    )
    with pytest.raises(SecurityError):
        layer.rewrite("SELECT gated.total FROM gated")
    sql = layer.rewrite("SELECT gated.total FROM gated", user={"role": "analyst"})
    assert "secp_t" in sql
    with pytest.raises(SecurityError):
        layer.rewrite("SELECT gated.total FROM gated", user={"role": "guest"})


# ===========================================================================
# §4 ref tests/test_sql_generation_security.py — generation regressions
# ===========================================================================


def test_count_without_sql_generates_valid_cte(secp_db):
    """ref test_sql_generation_security.py:13 — COUNT metrics without
    an explicit sql must not emit invalid '* AS metric_raw' projections
    (this engine counts the CTE rows / pk directly)."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="cnt_orders",
            table="secp_orders",
            primary_key="id",
            dimensions=[Dimension(name="customer_id", type="numeric")],
            metrics=[Metric(name="order_count", agg="count")],
        )
    )
    sql = layer.compile(
        metrics=["cnt_orders.order_count"], dimensions=["cnt_orders.customer_id"]
    )
    assert "* AS order_count_raw" not in sql
    rows = dict(tuple(r) for r in layer.query(
        metrics=["cnt_orders.order_count"], dimensions=["cnt_orders.customer_id"]
    ).collect())
    assert rows == {1: 2, 2: 1, 3: 2}


def test_table_calculation_formula_has_no_python_eval(secp_db):
    """ref test_sql_generation_security.py:43,70 — the reference
    replaced eval() with an AST safe-evaluator. This engine compiles
    formulas to Spark SQL: there is NO Python evaluation at all (the
    stronger property), and a malicious 'formula' is just invalid SQL
    that fails to parse instead of executing."""
    import inspect

    from sidemantic_spark.sql import table_calcs

    src = inspect.getsource(table_calcs)
    assert "eval(" not in src.replace("_safe_eval(", "")
    assert "exec(" not in src

    from sidemantic_spark.sql.table_calcs import TableCalculation, apply_table_calcs

    sql = apply_table_calcs(
        "SELECT 100 AS revenue, 60 AS cost",
        [TableCalculation(name="profit_margin", type="formula",
                          formula="${revenue} - ${cost}")],
    )
    row = secp_db.sql(sql).collect()[0]
    assert row["profit_margin"] == 40

    evil = apply_table_calcs(
        "SELECT 1 AS x",
        [TableCalculation(name="bad", type="formula",
                          formula="__import__('os').system('id')")],
    )
    with pytest.raises(Exception):
        secp_db.sql(evil).collect()


def test_table_calculation_with_division(secp_db):
    """ref test_sql_generation_security.py:282 — (100-60)/100*100 = 40%."""
    from sidemantic_spark.sql.table_calcs import TableCalculation, apply_table_calcs

    sql = apply_table_calcs(
        "SELECT 100 AS revenue, 60 AS cost",
        [TableCalculation(name="margin_pct", type="formula",
                          formula="(${revenue} - ${cost}) / ${revenue} * 100")],
    )
    assert float(secp_db.sql(sql).collect()[0]["margin_pct"]) == 40.0


def test_table_calculation_handles_null_values(secp_db):
    """ref test_sql_generation_security.py:296 — NULL coalesces to 0 in
    formulas: 0 - 60 = -60."""
    from sidemantic_spark.sql.table_calcs import TableCalculation, apply_table_calcs

    sql = apply_table_calcs(
        "SELECT CAST(NULL AS INT) AS revenue, 60 AS cost",
        [TableCalculation(name="profit", type="formula",
                          formula="${revenue} - ${cost}")],
    )
    assert secp_db.sql(sql).collect()[0]["profit"] == -60


def _conversion_events_model(**metric_overrides):
    """ref test_sql_generation_security.py:98-124 (ts column carries
    the reference's `timestamp`)."""
    mkw = dict(
        name="conversion_rate",
        type="conversion",
        entity="user_id",
        base_event="signup",
        conversion_event="purchase",
        conversion_window="30 days",
    )
    mkw.update(metric_overrides)
    return Model(
        name="cevents",
        table="secp_events",
        primary_key="event_id",
        dimensions=[
            Dimension(name="event_id", type="numeric"),
            Dimension(name="user_id", type="numeric"),
            Dimension(name="event_type", type="categorical"),
            Dimension(name="timestamp", sql="ts", type="time", granularity="day"),
        ],
        metrics=[Metric(**mkw)],
    )


def test_conversion_metrics_use_correct_model(secp_db):
    """ref test_sql_generation_security.py:88 — conversion SQL must
    come from the model owning the metric, not the first model added."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="cusers",
            table="secp_customers",
            primary_key="id",
            dimensions=[Dimension(name="id", type="numeric")],
        )
    )
    layer.add_model(_conversion_events_model())
    sql = layer.compile(
        metrics=["cevents.conversion_rate"],
        dimensions=["cevents.timestamp__month"],
    )
    assert "FROM secp_events" in sql
    assert "secp_customers" not in sql


def test_conversion_metrics_handle_table_backed_models(secp_db):
    """ref test_sql_generation_security.py:138 — table= models must not
    inject a None FROM clause."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(_conversion_events_model())
    sql = layer.compile(
        metrics=["cevents.conversion_rate"],
        dimensions=["cevents.timestamp__month"],
    )
    assert "FROM secp_events" in sql
    assert "FROM (None)" not in sql


def test_conversion_metric_executes_with_expected_rate(secp_db):
    """ref test_sql_generation_security.py:448 — deterministic monthly
    rate: January signups 1,2,3; only user 1 converts inside 30 days
    (user 3's purchase lands outside the window) -> 1/3."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(_conversion_events_model())
    rows = layer.query(
        metrics=["cevents.conversion_rate"],
        dimensions=["cevents.timestamp__month"],
    ).collect()
    assert len(rows) == 1
    # this engine also surfaces the base/converted counts alongside the
    # rate — read by name
    month_value = rows[0]["timestamp__month"]
    assert month_value is not None
    assert rows[0]["conversion_rate"] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert rows[0]["conversion_rate_base"] == 3
    assert rows[0]["conversion_rate_converted"] == 1


def test_conversion_invalid_entity_rejected(secp_db):
    """ref test_sql_generation_security.py:324 — entity names with SQL
    injection are rejected."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(_conversion_events_model(entity="user_id; DROP TABLE--"))
    with pytest.raises(Exception, match="Invalid entity|invalid entity"):
        layer.compile(
            metrics=["cevents.conversion_rate"],
            dimensions=["cevents.timestamp__month"],
        )


def test_conversion_invalid_window_rejected(secp_db):
    """ref test_sql_generation_security.py:358 — window values with SQL
    injection are rejected (this engine's interval parser refuses)."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(_conversion_events_model(conversion_window="7;DROP days"))
    with pytest.raises(Exception, match="interval|Invalid window"):
        layer.compile(
            metrics=["cevents.conversion_rate"],
            dimensions=["cevents.timestamp__month"],
        )


def test_conversion_event_name_quotes_escaped(secp_db):
    """ref test_sql_generation_security.py:392 — single quotes in event
    names are escaped into the literal."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        _conversion_events_model(base_event="sign'up", conversion_event="pur'chase")
    )
    sql = layer.compile(
        metrics=["cevents.conversion_rate"],
        dimensions=["cevents.timestamp__month"],
    )
    assert "sign''up" in sql
    assert "pur''chase" in sql


def test_derived_metric_substitution_uses_word_boundaries(secp_db):
    """ref test_sql_generation_security.py:174 — substituting 'revenue'
    must not mangle 'gross_revenue'."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="drev",
            table="secp_rev",
            primary_key="region",
            dimensions=[Dimension(name="region", type="categorical")],
            metrics=[
                Metric(name="revenue", agg="sum", sql="amount"),
                Metric(name="gross_revenue", agg="sum", sql="gross_amount"),
                Metric(name="net_revenue", type="derived",
                       sql="drev.gross_revenue - drev.revenue"),
            ],
        )
    )
    rows = {r["region"]: float(r["net_revenue"]) for r in layer.query(
        metrics=["drev.net_revenue"], dimensions=["drev.region"]
    ).collect()}
    # gross - revenue per region: US 140-100=40, EU 90-50=40
    assert rows == {"US": 40.0, "EU": 40.0}


def test_count_metrics_with_filters(secp_db):
    """ref test_sql_generation_security.py:252 — metric-level filters
    apply via CASE WHEN inside the aggregation, not the WHERE clause."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="fstat",
            table="secp_vis",
            primary_key="id",
            dimensions=[Dimension(name="region", type="categorical")],
            metrics=[
                Metric(name="us_rows", agg="count",
                       filters=["{model}.region = 'US'"]),
            ],
        )
    )
    sql = layer.compile(metrics=["fstat.us_rows"], dimensions=["fstat.region"])
    assert "CASE WHEN" in sql
    assert "region = 'US'" in sql
    assert "* AS us_rows_raw" not in sql
    rows = dict(tuple(r) for r in layer.query(
        metrics=["fstat.us_rows"], dimensions=["fstat.region"]
    ).collect())
    assert rows == {"US": 1, "EU": 0}


def test_count_fanout_uses_column_reference(secp_db):
    """ref test_sql_generation_security.py:427 — a COUNT with an
    explicit column must count that column, not COUNT(*) (fan-out
    safety across LEFT joins)."""
    layer = SparkSemanticLayer(secp_db)
    layer.add_model(
        Model(
            name="cfan",
            table="secp_orders",
            primary_key="id",
            dimensions=[Dimension(name="customer_id", type="numeric")],
            metrics=[Metric(name="order_count", agg="count", sql="id")],
        )
    )
    sql = layer.compile(
        metrics=["cfan.order_count"], dimensions=["cfan.customer_id"]
    )
    assert "COUNT(*)" not in sql
    assert "COUNT(cfan_cte.order_count_raw) AS order_count" in sql


def test_build_interval_spark():
    """ref test_sql_generation_security.py:503-531 pins the DuckDB /
    BigQuery / Postgres INTERVAL spellings — single-dialect engine, so
    the Spark spelling pins instead (quarter folds to months because
    Spark has no QUARTER interval qualifier)."""
    from sidemantic_spark.sql.fragments import interval_sql

    assert interval_sql("7 days") == "INTERVAL '7' DAY"
    assert interval_sql("3 months") == "INTERVAL '3' MONTH"
    assert interval_sql("2 quarters") == "INTERVAL '6' MONTH"
