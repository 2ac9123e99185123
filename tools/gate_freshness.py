"""Gate-artifact freshness guard (r14, VERDICT r13 #1).

Two rounds running, one per-round gate artifact lagged the final query
registration (r12: the full sweep; r13: the plan audit) because the gates
were refreshed and THEN one more query was registered. Each tool is
internally consistent — plan_audit and selfcheck both iterate
``load_all()`` — so the skew is purely sequencing: the committed artifact
describes an older registry.

This module makes that structurally impossible to miss: it compares the
LATEST committed ``PLANAUDIT_r*.json`` and ``CORRECTNESS_full_r*.json``
against the live registry count, and ``tools/smoke_gate.py`` (the
mandatory pre-commit gate) fails on any mismatch with the exact re-run
command. The check logic is pure (paths + counts in, problems out) so
``tests/test_gate_freshness.py`` pins it on synthetic artifacts.
"""

from __future__ import annotations

import json
import os
import re


def latest_artifact(root: str, prefix: str) -> str | None:
    """Path of the newest per-round artifact ``{prefix}_r{N}[a-z].json``
    under ``root`` (highest round number; letter suffix breaks ties —
    'r9c' > 'r9b' > 'r9'), or None if none exist."""
    pat = re.compile(rf"^{re.escape(prefix)}_r(\d+)([a-z]?)\.json$")
    best: tuple[int, str] | None = None
    best_path = None
    for name in os.listdir(root):
        m = pat.match(name)
        if not m:
            continue
        key = (int(m.group(1)), m.group(2))
        if best is None or key > best:
            best = key
            best_path = os.path.join(root, name)
    return best_path


def check_gate_artifacts(root: str, registry_count: int) -> list[str]:
    """Problems (empty = fresh) comparing the latest plan-audit and
    full-sweep artifacts under ``root`` against ``registry_count``."""
    problems: list[str] = []

    pa = latest_artifact(root, "PLANAUDIT")
    if pa is None:
        problems.append("no PLANAUDIT_r*.json artifact found")
    else:
        n = json.load(open(pa)).get("summary", {}).get("n_queries")
        if n != registry_count:
            problems.append(
                f"{os.path.basename(pa)} audited {n} queries but the registry "
                f"has {registry_count} — a query was registered after the "
                "audit ran. Re-run: python tools/plan_audit.py --json "
                "PLANAUDIT_r<N>.json"
            )

    cf = latest_artifact(root, "CORRECTNESS_full")
    if cf is None:
        problems.append("no CORRECTNESS_full_r*.json artifact found")
    else:
        payload = json.load(open(cf))
        covered = len(payload.get("queries", {})) + len(payload.get("excluded", []))
        not_run = payload.get("not_run", [])
        if not_run:
            problems.append(
                f"{os.path.basename(cf)} is a partial sweep "
                f"({len(not_run)} queries in not_run) — top it up: "
                "python tools/selfcheck.py --only <names> --resume --json "
                f"{os.path.basename(cf)}"
            )
        elif covered != registry_count:
            problems.append(
                f"{os.path.basename(cf)} covers {covered} queries "
                f"(recorded + excluded) but the registry has "
                f"{registry_count} — a query was registered after the sweep. "
                "Top it up: python tools/selfcheck.py --only <new names> "
                f"--resume --json {os.path.basename(cf)}"
            )
    return problems
