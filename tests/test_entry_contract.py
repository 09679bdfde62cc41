"""Driver-contract validation: every queries() entry runs, and every
oracle_sql() entry matches the Spark result (mimics the driver's t2
check at the test scale factor)."""

from __future__ import annotations

import importlib.util
import sys

import pytest

from tests.conftest import SF_DIR, assert_df_matches_oracle_strict


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


entry_mod = _load_entry()
QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _golden():
    """Entries whose oracle is frozen golden rows (valid only at the
    scale they were generated for — the driver's sf0.01)."""
    import json
    import os

    path = "/root/repo/golden_oracles.json"
    if not os.path.exists(path):
        return set(), None
    with open(path) as f:
        data = json.load(f)
    return set(data["oracles"]), data["sf_dir"]


GOLDEN_ENTRIES, GOLDEN_SF_DIR = _golden()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_contract(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    oracle = ORACLES.get(name)
    if name in GOLDEN_ENTRIES and GOLDEN_SF_DIR != SF_DIR:
        # golden-row oracles are frozen at the driver's sf0.01; at the
        # test scale the same arithmetic is verified row-for-row
        # against the pure-numpy kernels in tests/test_ref_kernels.py,
        # so this parametrization only smoke-runs the entry
        assert df.collect() is not None
        assert df.columns
    elif oracle is None:
        # rows-only check for non-SQL-expressible ops
        rows = df.collect()
        assert rows is not None
        assert df.columns
    else:
        # order-preserving, full-float-precision compare: the r01
        # correctness snapshot hash-mismatched 24 queries purely on
        # row order / timestamp zone; this guards the _canon fix
        assert_df_matches_oracle_strict(df, duck, oracle)


def test_readme_contract_count_in_sync():
    """One source of truth for the contract size: the README must state
    the number that len(queries()) actually is (VERDICT r9 ask #7)."""
    import re

    n = len(_load_entry().queries())
    with open("/root/repo/README.md") as fh:
        readme = fh.read()
    m = re.search(r"\((\d+) queries as of round", readme)
    assert m, "README no longer states the contract count"
    assert int(m.group(1)) == n, (
        f"README says {m.group(1)} contract queries, len(queries()) == {n}"
    )
