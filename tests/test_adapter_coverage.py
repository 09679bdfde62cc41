"""Adapter key-coverage triage gate (VERDICT r7 ask #2).

Every key the reference adapters read that this repo's adapters never
mention must carry a triage row in scripts/adapter_key_coverage.py's
TRIAGE map (implemented-under-other-spelling, write-side, internal, or
out-of-scope with the reason). The gate keeps the triage exact in both
directions: no untriaged keys, no stale rows for keys that got
implemented.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/sidemantic/adapters"),
    reason="reference checkout not available",
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _mod():
    import adapter_key_coverage

    return adapter_key_coverage


def test_no_untriaged_adapter_keys():
    m = _mod()
    u = m.untriaged()
    assert not u, f"untriaged reference adapter keys: {u}"


def test_no_stale_triage_rows():
    m = _mod()
    s = m.stale_triage()
    assert not s, (
        f"triage rows for keys no longer in the raw diff (implemented or "
        f"dropped — prune them): {s}"
    )


def test_every_triage_row_has_a_category_and_reason():
    m = _mod()
    cats = ("fp-", "write-side", "internal", "oos-")
    for repo, rows in m.TRIAGE.items():
        for key, reason in rows.items():
            assert reason.startswith(cats) and ":" in reason, (
                f"{repo}:{key} triage row needs 'category: reason', got {reason!r}"
            )
