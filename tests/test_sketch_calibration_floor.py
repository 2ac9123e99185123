"""Calibration floors for the sketch-audit queries (r9 VERDICT #7).

q_minhash_estimate and q_simhash_calibration MEASURE sketch error, but —
like q_ann_recall before round 9 — nothing defended the measurement itself:
a broken join or a swapped column would still produce plausible-looking
rows. These tests pin the audits' statistical content on the sf0.001
corpus (deterministic: fixed corpus, md5 hashing, keyed sampling), with
bounds calibrated from measurement (r10: minhash mean |est/k − J| = 0.147
at sf0.001, 0.074 at sf0.01; simhash mean J = 0.003 at hamming 0 vs 0.001
at hamming 3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.audit import (
    q_minhash_estimate,
    q_simhash_calibration,
)
from video_data_pipeline_spark.queries.dedup import _N_HASHES

SF_DIR = "/root/testdata/sf0.001"


def test_minhash_estimate_mean_error_within_floor(spark):
    rows = q_minhash_estimate(spark, SF_DIR).collect()
    assert rows, "vacuous audit: no LSH candidate pairs"
    errs = [abs(r["est_matches"] / _N_HASHES - r["jaccard"]) for r in rows]
    # E[est/k] = J per pair with std sqrt(J(1-J)/k) <= 0.177 at k=8; the
    # corpus-measured mean abs error is 0.147 — 2x margin, but far below
    # the ~0.5 a swapped column or broken join would produce
    assert sum(errs) / len(errs) <= 0.30, sum(errs) / len(errs)
    for r in rows:
        assert 0 <= r["est_matches"] <= _N_HASHES
        assert 0.0 <= r["jaccard"] <= 1.0


def test_minhash_estimate_tracks_true_jaccard(spark):
    # the audit's whole point: est correlates with truth. Split candidate
    # pairs at the J median; the high half's mean estimate must exceed the
    # low half's (deterministic on this corpus; a decalibrated sketch or a
    # mis-joined audit table would equalize them)
    rows = q_minhash_estimate(spark, SF_DIR).collect()
    ordered = sorted(rows, key=lambda r: r["jaccard"])
    lo, hi = ordered[: len(ordered) // 2], ordered[len(ordered) // 2 :]
    mean = lambda xs: sum(x["est_matches"] for x in xs) / len(xs)  # noqa: E731
    assert mean(hi) > mean(lo), (mean(lo), mean(hi))


def test_simhash_calibration_orders_hamming_by_similarity(spark):
    rows = q_simhash_calibration(spark, SF_DIR).collect()
    assert rows, "vacuous audit: no pigeonhole candidates sampled"
    by_h = {}
    for r in rows:
        assert 0 <= r["hamming"] <= 3  # the pigeonhole family threshold
        assert 0.0 <= r["jaccard"] <= 1.0
        by_h.setdefault(r["hamming"], []).append(r["jaccard"])
    assert 0 in by_h and 3 in by_h, sorted(by_h)
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # identical-signature pairs must measure more similar than the
    # threshold-edge pairs (measured 0.003 vs 0.001 — small on this
    # unigram-dense corpus, but strictly ordered and deterministic)
    assert mean(by_h[0]) > mean(by_h[3]), (mean(by_h[0]), mean(by_h[3]))
