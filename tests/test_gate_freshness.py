"""Gate-artifact freshness guard (tools/gate_freshness.py, r14).

VERDICT r13 #1: two rounds running, one per-round gate artifact lagged
the final query registration. The guard compares the latest committed
plan-audit / full-sweep artifacts against the live registry count and is
wired into tools/smoke_gate.py (the mandatory pre-commit gate). These
tests pin the pure check logic on synthetic artifacts — no Spark.
"""

from __future__ import annotations

import json

from tools.gate_freshness import check_gate_artifacts, latest_artifact


def _write(root, name, payload):
    p = root / name
    p.write_text(json.dumps(payload))
    return str(p)


def _audit(n):
    return {"summary": {"n_queries": n, "n_flagged": 0}, "queries": {}}


def _sweep(n, excluded=(), not_run=None):
    payload = {
        "summary": {"pass": n, "fail": 0, "rows_only": 0},
        "queries": {f"q{i}": {"status": "pass"} for i in range(n)},
    }
    if excluded:
        payload["excluded"] = list(excluded)
    if not_run is not None:
        payload["not_run"] = not_run
        payload["only"] = ["qx"]
    return payload


def test_latest_artifact_picks_highest_round_with_letter_tiebreak(tmp_path):
    _write(tmp_path, "PLANAUDIT_r7.json", _audit(1))
    _write(tmp_path, "PLANAUDIT_r9.json", _audit(2))
    _write(tmp_path, "PLANAUDIT_r9b.json", _audit(3))
    _write(tmp_path, "PLANAUDIT_r10.json", _audit(4))
    _write(tmp_path, "PLANAUDIT_rXX.json", _audit(99))  # non-matching
    assert latest_artifact(str(tmp_path), "PLANAUDIT").endswith("_r10.json")
    (tmp_path / "PLANAUDIT_r10.json").unlink()
    assert latest_artifact(str(tmp_path), "PLANAUDIT").endswith("_r9b.json")


def test_fresh_artifacts_pass(tmp_path):
    _write(tmp_path, "PLANAUDIT_r14.json", _audit(180))
    _write(tmp_path, "CORRECTNESS_full_r14.json", _sweep(178, excluded=["a", "b"]))
    assert check_gate_artifacts(str(tmp_path), 180) == []


def test_stale_plan_audit_flagged_with_rerun_command(tmp_path):
    # the exact r13 skew: audit ran at 178, registry finished at 179
    _write(tmp_path, "PLANAUDIT_r13.json", _audit(178))
    _write(tmp_path, "CORRECTNESS_full_r13.json", _sweep(179))
    probs = check_gate_artifacts(str(tmp_path), 179)
    assert len(probs) == 1
    assert "PLANAUDIT_r13.json" in probs[0]
    assert "178" in probs[0] and "179" in probs[0]
    assert "plan_audit.py" in probs[0]


def test_stale_full_sweep_flagged_with_topup_command(tmp_path):
    # the r12 skew: one query registered after the sweep
    _write(tmp_path, "PLANAUDIT_r12.json", _audit(175))
    _write(tmp_path, "CORRECTNESS_full_r12.json", _sweep(174))
    probs = check_gate_artifacts(str(tmp_path), 175)
    assert len(probs) == 1
    assert "CORRECTNESS_full_r12.json" in probs[0]
    assert "--resume" in probs[0]


def test_partial_sweep_flagged_even_when_counts_align(tmp_path):
    # an --only sweep records not_run: partial regardless of arithmetic
    _write(tmp_path, "PLANAUDIT_r14.json", _audit(10))
    _write(
        tmp_path,
        "CORRECTNESS_full_r14.json",
        _sweep(8, not_run=["q8", "q9"]),
    )
    probs = check_gate_artifacts(str(tmp_path), 10)
    assert len(probs) == 1
    assert "partial sweep" in probs[0]


def test_missing_artifacts_reported(tmp_path):
    probs = check_gate_artifacts(str(tmp_path), 5)
    assert len(probs) == 2
    assert any("PLANAUDIT" in p for p in probs)
    assert any("CORRECTNESS_full" in p for p in probs)


def test_live_repo_artifacts_shape_readable():
    # sanity on the real repo: the newest committed artifacts parse and
    # carry the fields the guard reads (NOT a freshness assertion — that
    # is smoke_gate's job at commit time; mid-round the registry may
    # legitimately be ahead of the artifacts)
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pa = latest_artifact(root, "PLANAUDIT")
    cf = latest_artifact(root, "CORRECTNESS_full")
    assert pa and cf
    assert isinstance(
        json.load(open(pa))["summary"]["n_queries"], int
    )
    assert isinstance(json.load(open(cf))["queries"], dict)
