"""SQL-fragment parser unit tests: quote-state tracking across the SQL
``''`` escape (close+reopen), ref ``sql/fragment.py`` delegates this to
sqlglot."""

from __future__ import annotations

from sidemantic_spark.sql.fragments import (
    _toplevel_or,
    find_refs,
    split_conjuncts,
)


def test_doubled_quote_keeps_state_for_toplevel_or():
    # 'a''b' is ONE literal (a'b); the OR after it IS top-level
    assert _toplevel_or("x = 'a''b' OR y = 1")
    # ... and an OR *inside* a literal containing '' is NOT
    assert not _toplevel_or("x = 'a'' OR ''b' AND y = 1")


def test_split_conjuncts_after_doubled_quote_literal():
    assert split_conjuncts("x = 'it''s fine' AND y = 2") == [
        "x = 'it''s fine'",
        "y = 2",
    ]
    # AND inside the escaped literal must not split
    assert split_conjuncts("x = 'it''s AND more' AND y = 2") == [
        "x = 'it''s AND more'",
        "y = 2",
    ]


def test_find_refs_ignores_refs_inside_escaped_literal():
    refs = find_refs(
        "orders.status = 'it''s orders.fake' AND orders.priority = 1",
        {"orders"},
    )
    assert ("orders", "status", None) in refs
    assert ("orders", "priority", None) in refs
    assert not any(f == "fake" for _m, f, _g in refs)


def test_select_list_alias_equal_to_model_does_not_shadow_fragment():
    # ADVICE r10: `CAST(x AS INT) AS orders` (or any top-level select-list
    # alias equal to a model name) must NOT suppress classification of
    # genuine orders.* refs in the same fragment — only a derived-table
    # alias `(SELECT ...) AS orders` shadows whole-fragment.
    refs = find_refs(
        "CAST(orders.amount AS INT) AS orders", {"orders"},
    )
    assert ("orders", "amount", None) in refs
    # a real derived-table alias still shadows the whole fragment
    refs2 = find_refs(
        "(SELECT max(x) FROM audit) AS orders WHERE orders.amount > 0",
        {"orders"},
    )
    assert ("orders", "amount", None) not in refs2
    # ...but shadowing=False (security scans) still sees everything
    refs3 = find_refs(
        "(SELECT max(x) FROM audit) AS orders WHERE orders.amount > 0",
        {"orders"}, shadowing=False,
    )
    assert ("orders", "amount", None) in refs3


def test_double_paren_derived_table_alias_still_shadows():
    # Review #7: extra wrapping parens around the derived table must
    # not defeat whole-fragment shadowing
    refs = find_refs(
        "((SELECT id FROM audit)) AS orders WHERE orders.revenue > 10",
        {"orders"},
    )
    assert ("orders", "revenue", None) not in refs
    # a function call alias is still NOT a derived table
    refs2 = find_refs(
        "CAST(f(x) AS INT) AS orders WHERE orders.revenue > 10", {"orders"}
    )
    assert ("orders", "revenue", None) in refs2
