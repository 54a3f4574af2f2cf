"""Whole-registry plan-smell audit as a regression test.

Complements tests/test_plan_shapes.py (which pins POSITIVE invariants on
chosen queries — pushdown, broadcast, partial agg) with the NEGATIVE
sweep over every registered query: no CartesianProduct, no row-at-a-time
Python eval, and no global serial Sort/Window outside the documented
whitelist of exact small-data anchors.
"""

from __future__ import annotations


def test_no_plan_smells_anywhere(spark):
    from tools.plan_audit import audit

    # pass the shared session: audit would otherwise getOrCreate (and then
    # stop) this very session
    rows, violations = audit("/root/testdata/sf0.001", spark=spark)
    assert len(rows) >= 120
    assert violations == []
