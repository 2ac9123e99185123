"""Registry-wide plan-audit CI gate (r7 VERDICT #7 / r8 #7).

``tools/plan_audit.py`` sweeps every registry query's executed plan for the
anti-pattern classes that kill 100 TB jobs (CartesianProduct,
BroadcastNestedLoopJoin, row-at-a-time Python UDFs, SinglePartition
exchanges) against a per-query boundedness whitelist. Until now it only ran
manually at round close — a new query could ship an unwhitelisted cartesian
product and sit unnoticed until the artifact regen. This test runs the SAME
audit (shared ``audit_registry``) inside pytest, so `pytest tests/` fails
the moment one appears.

Marked ``planaudit`` (registered in pytest.ini): deselect with
``-m 'not planaudit'`` for quick iteration; the full suite runs it.
~60 s — analysis only, nothing executes.
"""

from __future__ import annotations

import pytest

from tools.plan_audit import audit_registry

pytestmark = pytest.mark.slow  # r17 fast-tier: see conftest/pytest.ini


@pytest.mark.planaudit
def test_no_unexplained_plan_antipatterns(spark, sf_dir):
    results, bad = audit_registry(spark, sf_dir)
    flagged = {
        name: entry["UNEXPLAINED"]
        for name, entry in results.items()
        if "UNEXPLAINED" in entry
    }
    errors = {
        name: entry["error"] for name, entry in results.items() if "error" in entry
    }
    assert bad == 0, (
        f"plan audit: {len(flagged)} unexplained anti-patterns {flagged}; "
        f"{len(errors)} analysis errors {errors} — fix the plan or add a "
        "WHITELIST entry with its boundedness argument (tools/plan_audit.py)"
    )
