"""tools/bench_trend.py over the repo's own committed bench artifacts."""

from __future__ import annotations

from tools.bench_trend import build_report, family_of, load_rounds, newest_anchor


def test_load_rounds_handles_driver_and_quiet_formats():
    rounds = load_rounds()
    # driver rounds with timings (r4 crashed: rc=1, no parsed queries)
    assert "r1" in rounds and "r4" not in rounds
    # quiet anchors flatten {query: {median: ...}} to {query: sec}
    anchor = newest_anchor(rounds)
    assert anchor is not None
    assert all(isinstance(v, float) for v in rounds[anchor].values())


def test_families_come_from_registry_tags():
    fam = family_of()
    assert fam["q_dedup_exact"] == "dedup"
    assert fam["q01_pricing_summary"] in ("agg", "tpch", "scan")


def test_report_renders_both_formats(tmp_path):
    text = build_report(md=False)
    assert "TOTAL" in text and "family" in text
    md = build_report(md=True)
    assert md.startswith("##") and "| --- |" in md
