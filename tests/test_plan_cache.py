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
