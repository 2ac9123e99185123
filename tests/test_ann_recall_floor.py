"""Accuracy floor for the ANN ladder (r7 VERDICT #1 / r8 #3).

``q_ann_recall`` measures IVF-probe recall@10 against brute force; until now
nothing DEFENDED the measurement — a plan change could silently crater
accuracy while every oracle stayed green (the oracle mirrors the same
approximation, so it agrees with a bad answer). These tests put a calibrated
floor under it.

Everything here is deterministic: centroids/queries are fixed vec_id ranges
and the hyperplanes are md5-derived, so recall on the shipped sf0.001
corpus is a constant. Measured calibration (this corpus, 2026-08):

    nprobe=1  mean recall@10 = 0.300
    nprobe=2  mean recall@10 = 0.525
    nprobe=4  mean recall@10 = 0.700
    nprobe=8  (all lists)    = 1.000 exactly

The floor asserts nprobe=2 >= 0.50 (calibrated 0.525 minus epsilon for
future corpus regeneration drift); the sweep asserts strict monotonicity
in nprobe; the exactness anchor asserts probing ALL lists reproduces brute
force bit-exactly (recall 1.0 for every query) — the property that pins the
IVF arm to the ground-truth arm independent of corpus statistics.
"""

from __future__ import annotations

import pytest

from video_data_pipeline_spark.queries.similarity import (
    _N_CENTROIDS,
    _RECALL_PROBES,
    ann_recall_frame,
    q_ann_recall,
)

_FLOOR_AT_2 = 0.50  # calibrated 0.525 − ε


def _mean_recall(spark, sf_dir, nprobe):
    rows = ann_recall_frame(spark, sf_dir, nprobe).collect()
    assert len(rows) == 8, "query set drifted — recalibrate the floor"
    return sum(r["recall"] for r in rows) / len(rows)


def test_recall_floor_at_default_nprobe(spark, sf_dir):
    assert _RECALL_PROBES == 2, "default nprobe changed — recalibrate floor"
    mean = _mean_recall(spark, sf_dir, 2)
    assert mean >= _FLOOR_AT_2, (
        f"IVF recall@10 at nprobe=2 fell to {mean:.3f} < {_FLOOR_AT_2} — "
        "the probe path lost accuracy"
    )


def test_recall_monotone_in_nprobe(spark, sf_dir):
    """More probed lists can only add candidates, so recall must be
    non-decreasing (strictly increasing on this corpus)."""
    m1, m2, m4 = (_mean_recall(spark, sf_dir, n) for n in (1, 2, 4))
    assert m1 < m2 < m4, f"recall not monotone: {m1:.3f}, {m2:.3f}, {m4:.3f}"


def test_probing_all_lists_is_exact(spark, sf_dir):
    """nprobe = #centroids scans the whole corpus → the IVF arm IS brute
    force; every query must hit recall 1.0 regardless of corpus shape."""
    rows = ann_recall_frame(spark, sf_dir, _N_CENTROIDS).collect()
    assert all(r["recall"] == 1.0 for r in rows), [
        (r["qid"], r["recall"]) for r in rows if r["recall"] != 1.0
    ]


def test_registered_query_matches_helper(spark, sf_dir):
    """q_ann_recall must stay a thin wrapper over the swept helper, or the
    gate would defend a different plan than the one users run."""
    got = {r["qid"]: r["recall"] for r in q_ann_recall(spark, sf_dir).collect()}
    want = {
        r["qid"]: r["recall"]
        for r in ann_recall_frame(spark, sf_dir, _RECALL_PROBES).collect()
    }
    assert got == want
    assert got, "empty recall frame"
    assert sum(got.values()) / len(got) == pytest.approx(0.525), (
        "calibration drifted — update the documented sweep values"
    )
