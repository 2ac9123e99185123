"""Pre-flight decision cache (r14, VERDICT r13 #8).

A pre-flight's decision depends only on the corpus bytes and the knobs,
so calibrated queries memoize it by stat-based corpus fingerprint:
repeat runs on an unchanged table skip the measurement shuffle, a
rewritten table changes the fingerprint (structural staleness, no TTL),
and refusals re-raise from the cache without re-measuring.
"""

from __future__ import annotations

import shutil

import pytest

from video_data_pipeline_spark import calibrate
from video_data_pipeline_spark.calibrate import (
    CapBoundError,
    cached_plan,
    clear_plan_cache,
    corpus_fingerprint,
)
from video_data_pipeline_spark.queries.dedup import (
    q_minhash_lsh_pairs,
    q_simhash_near_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def fresh_cache():
    clear_plan_cache()
    yield
    clear_plan_cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cached_plan_memoizes_and_bypasses_on_none_key():
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return "decision"

    assert cached_plan(("k",), compute) == "decision"
    assert cached_plan(("k",), compute) == "decision"
    assert calls["n"] == 1
    assert cached_plan(None, compute) == "decision"  # bypass
    assert calls["n"] == 2


def test_cached_plan_reraises_stored_refusal():
    calls = {"n": 0}

    def refuse():
        calls["n"] += 1
        raise CapBoundError("no exact plan fits", {})

    with pytest.raises(CapBoundError):
        cached_plan(("r",), refuse)
    with pytest.raises(CapBoundError, match="no exact plan"):
        cached_plan(("r",), refuse)
    assert calls["n"] == 1, "a cached refusal must not re-measure"


def test_fingerprint_changes_when_table_rewritten(tmp_path):
    src = f"{SF_DIR}/documents.parquet"
    dst = tmp_path / "documents.parquet"
    shutil.copy(src, dst)
    a = corpus_fingerprint(str(tmp_path))
    assert a is not None
    dst.write_bytes(dst.read_bytes() + b"x")
    b = corpus_fingerprint(str(tmp_path))
    assert a != b
    assert corpus_fingerprint("/nonexistent") is None


def test_fingerprint_sees_nested_part_rewrite(tmp_path):
    # ADVICE r14: a partitioned layout (key=val subdirs) can have a nested
    # part file rewritten IN PLACE — same top-level names, same subdir
    # size, and the subdir mtime does not change on child-content
    # modification — so the fingerprint must walk to the leaves
    import os

    table_dir = tmp_path / "documents.parquet" / "year=2026"
    table_dir.mkdir(parents=True)
    part = table_dir / "part-00000.parquet"
    part.write_bytes(b"AAAA")
    a = corpus_fingerprint(str(tmp_path))
    assert a is not None
    # in-place rewrite: same path, same size, different mtime
    part.write_bytes(b"BBBB")
    os.utime(part, ns=(1, 1))
    os.utime(table_dir, ns=(2, 2))  # pin dir mtimes so only the leaf moved
    b = corpus_fingerprint(str(tmp_path))
    assert a != b


def test_registered_calibrated_queries_hit_cache_on_repeat(spark, monkeypatch):
    # count actual front measurements through the real query surface
    calls = {"n": 0}
    real = calibrate.measure_front

    def counting(keys, cap, name="front"):
        calls["n"] += 1
        return real(keys, cap, name)

    monkeypatch.setattr(calibrate, "measure_front", counting)
    first = _rows(q_simhash_near_pairs(spark, SF_DIR, calibrate=True))
    n_first = calls["n"]
    assert n_first >= 1
    second = _rows(q_simhash_near_pairs(spark, SF_DIR, calibrate=True))
    assert calls["n"] == n_first, "repeat run must skip the measurement"
    assert second == first

    calls["n"] = 0
    _rows(q_minhash_lsh_pairs(spark, SF_DIR, calibrate=True))
    assert calls["n"] == 1
    _rows(q_minhash_lsh_pairs(spark, SF_DIR, calibrate=True))
    assert calls["n"] == 1


# ----------------------------------- cross-process persistence (r15,
# VERDICT r14 #2): with $SPARK_GRAFT_PLAN_CACHE set, decisions round-trip
# a JSON sidecar so a NEW process on the unchanged corpus skips the
# measurement shuffle; staleness stays structural (fingerprint keys)


def _toy_stats():
    from video_data_pipeline_spark.calibrate import FrontStats

    return {"toy": FrontStats("toy", 4, 2, 10, 10, 1, 46, 7)}


def test_persisted_frontplan_roundtrip_across_processes(tmp_path, monkeypatch):
    from video_data_pipeline_spark.calibrate import FrontPlan

    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", str(tmp_path / "pc.json"))
    clear_plan_cache()
    key = ("prefix_buckets", ("/corpus", 123, 456), 64, 50_000_000)
    plan = FrontPlan("exact_uncapped", None, "measured fits budget", _toy_stats())
    assert cached_plan(key, lambda: plan) is plan
    clear_plan_cache()  # simulate a NEW process: memory gone, sidecar stays
    calls = {"n": 0}

    def recompute():
        calls["n"] += 1
        return plan

    got = cached_plan(key, recompute)
    assert calls["n"] == 0, "persisted decision must skip the measurement"
    assert got.decision == "exact_uncapped" and got.max_bucket_size is None
    assert got.stats["toy"].uncapped_pairs == 46


def test_persisted_refusal_reraises_in_new_process(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", str(tmp_path / "pc.json"))
    clear_plan_cache()
    key = ("containment_postings", ("/corpus", 1, 2), 64, 10)

    def refuse():
        raise CapBoundError("no exact plan fits pair_budget=10", _toy_stats())

    with pytest.raises(CapBoundError):
        cached_plan(key, refuse)
    clear_plan_cache()
    calls = {"n": 0}

    def recompute():
        calls["n"] += 1
        raise CapBoundError("fresh", {})

    with pytest.raises(CapBoundError, match="no exact plan"):
        cached_plan(key, recompute)
    assert calls["n"] == 0, "a persisted refusal must re-raise without re-measuring"


def test_simhash_plan_persists_decision_not_signatures(tmp_path, monkeypatch):
    from video_data_pipeline_spark.calibrate import SimhashPlan

    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", str(tmp_path / "pc.json"))
    clear_plan_cache()
    key = ("simhash", ("/corpus", 9, 9), 64, 200_000_000)
    plan = SimhashPlan(
        "exact_uncapped", "combos", None, "combos fits", _toy_stats(),
        signatures=object(),  # stands in for the session-bound DataFrame
    )
    cached_plan(key, lambda: plan)
    clear_plan_cache()
    got = cached_plan(key, lambda: pytest.fail("must hit sidecar"))
    assert got.geometry == "combos" and got.signatures is None


def test_corrupt_or_mismatched_sidecar_is_ignored(tmp_path, monkeypatch):
    side = tmp_path / "pc.json"
    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", str(side))
    side.write_text("{not json")
    clear_plan_cache()
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return "fresh"

    assert cached_plan(("k",), compute) == "fresh"
    assert calls["n"] == 1
    # and a future-format file is skipped, not crashed on
    side.write_text('{"format": 99, "entries": []}')
    clear_plan_cache()
    assert cached_plan(("k2",), compute) == "fresh"


def test_sidecar_caps_entries_dropping_oldest(tmp_path, monkeypatch):
    from video_data_pipeline_spark import calibrate
    from video_data_pipeline_spark.calibrate import FrontPlan

    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", str(tmp_path / "pc.json"))
    monkeypatch.setattr(calibrate, "_CACHE_MAX_ENTRIES", 3)
    clear_plan_cache()
    plan = FrontPlan("default", 64, "headroom", _toy_stats())
    for i in range(5):
        cached_plan(("front", f"corpus{i}"), lambda: plan)
    clear_plan_cache()
    # only the NEWEST 3 survive; the 2 oldest re-measure
    calls = {"n": 0}

    def recompute():
        calls["n"] += 1
        return plan

    for i in range(5):
        cached_plan(("front", f"corpus{i}"), recompute)
    assert calls["n"] == 2


def test_unset_env_keeps_cache_process_local(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PLAN_CACHE", raising=False)
    clear_plan_cache()
    cached_plan(("k",), lambda: "decision")
    clear_plan_cache()
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return "decision"

    cached_plan(("k",), compute)
    assert calls["n"] == 1, "no sidecar without the env var"


def test_cache_key_includes_knobs(spark, monkeypatch):
    # a different cap or budget is a different decision problem
    calls = {"n": 0}
    real = calibrate.measure_front

    def counting(keys, cap, name="front"):
        calls["n"] += 1
        return real(keys, cap, name)

    monkeypatch.setattr(calibrate, "measure_front", counting)
    q_minhash_lsh_pairs(spark, SF_DIR, calibrate=True).count()
    q_minhash_lsh_pairs(
        spark, SF_DIR, calibrate=True, max_bucket_size=128
    ).count()
    assert calls["n"] == 2
