"""The bench's FINAL stdout line must fit the driver's 2000-char tail
window in one piece AND carry the per-query map (r16 VERDICT #1: without
it the driver compares epoch-polluted totals; r13: an oversized last line
clips at the head and parses as null, losing even the total)."""

import importlib.util
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(ROOT, "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _result(values):
    return {
        "metric": "headline_total",
        "value": round(sum(values.values()), 3),
        "unit": "sec",
        "queries": values,
        "sf": 0.1,
        "cpus": 32,
    }


def test_tail_line_fits_and_carries_every_headline_query():
    # worst realistic case: every query in the 4-char-per-value band
    values = {name: 0.43 for name in bench.HEADLINE}
    line = bench.tail_line(_result(values), "/x/BENCH_FULL_c32.json")
    assert len(line) <= bench.TAIL_BUDGET < 2000
    parsed = json.loads(line)
    assert parsed["unit"] == "sec" and parsed["metric"] == "headline_total"
    assert set(parsed["queries"]) == set(bench.HEADLINE)


@pytest.mark.parametrize("scale", [0.4, 1.0, 17.3])
def test_tail_line_never_overflows_and_never_emits_zero(scale):
    # ladder invariant across arbitrary distributions: the line always fits
    # the tail budget, and whenever the map IS emitted every entry is
    # positive (a quantized 0 would blow up the driver's ratio math) with
    # at worst the terminal 1-sig-fig error (~33%). The REAL distribution
    # is pinned to the 2sf rung (<=5%) by the dedicated test below.
    values = {
        name: round(scale * (0.8 + (i % 17) / 10.0), 3)
        for i, name in enumerate(bench.HEADLINE)
    }
    line = bench.tail_line(_result(values), None)
    parsed = json.loads(line)
    assert len(line) <= bench.TAIL_BUDGET
    for name, v in parsed.get("queries", {}).items():
        assert v > 0
        assert abs(v - values[name]) / values[name] <= 0.334


def test_tail_line_uses_2sf_on_the_real_round_start_distribution():
    # the committed round-start run: 2sf must fit (margin test — if a new
    # headline query pushes this over, the squeeze rung absorbs it, but we
    # want to KNOW, because 2sf is what keeps every query <=5%)
    import os

    path = os.path.join(ROOT, "BENCH_before_r17.json")
    values = json.load(open(path))["queries"]
    line = bench.tail_line(_result(values), None)
    parsed = json.loads(line)
    worst = max(abs(parsed["queries"][n] - v) / v for n, v in values.items())
    assert worst <= 0.055
    assert len(line) <= bench.TAIL_BUDGET


def test_tail_line_falls_back_to_summary_rather_than_overflow():
    # 400 synthetic queries cannot fit at any precision: the fallback drops
    # the map but keeps the parseable headline total (never worse than r16)
    values = {f"q_synthetic_name_padding_{i:04d}": 1.234 for i in range(400)}
    line = bench.tail_line(_result(values), "/x/full.json")
    assert len(line) <= bench.TAIL_BUDGET
    parsed = json.loads(line)
    assert "queries" not in parsed
    assert parsed["value"] == _result(values)["value"]
    assert parsed["full"] == "/x/full.json"
