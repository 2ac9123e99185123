"""r17 restructure pin for q_hard_negatives (VERDICT r16 #4): the output
is provably the top-8 rows per anchor (positives ranks 1-4; the band
re-rank keeps a contiguous rank prefix starting at 5), so the query now
runs as ONE WindowGroupLimit-pruned pass instead of checkpointing the
full panel x corpus ranked frame. These tests pin the two places the
equivalence argument could break — exact cosine TIES at the positive /
band boundaries, and anchors with no rank-4 row — on a synthetic corpus
built to hit them (the oracle fixtures have no exact ties)."""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(tmp_path, rows):
    d = os.path.join(str(tmp_path), "embeddings.parquet")
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(t, d)
    return str(tmp_path)


def _vec(angle):
    # unit 2-d vectors: cosine vs anchor (1, 0) is exactly cos(angle)
    return [math.cos(angle), math.sin(angle)]


def test_tie_at_threshold_and_band_boundary(tmp_path, spark, monkeypatch):
    from video_data_pipeline_spark.queries import similarity as S

    monkeypatch.setattr(S, "_HN_QUERIES", 1)
    # anchor 0 at angle 0; candidates engineered so that:
    #  - vec 3 and vec 4 TIE exactly (identical vectors) across the
    #    rank-4 threshold: vec_id tiebreak puts 3 in positives, 4 as the
    #    first negative with cosine == t (boundary of the band filter)
    #  - vecs 5, 6 tie with each other inside the band
    #  - vec 7 sits far below t - 0.15 (excluded)
    a = _vec(0.0)
    tie_t = _vec(0.5)
    tie_band = _vec(0.6)
    rows = [
        (0, a, 0),
        (1, _vec(0.1), 0),
        (2, _vec(0.2), 0),
        (3, tie_t, 0),
        (4, tie_t, 0),
        (5, tie_band, 0),
        (6, tie_band, 0),
        (7, _vec(1.5), 0),
    ]
    sf_dir = _write_embeddings(tmp_path, rows)
    out = {
        (r.vec_id, r.role, r["rank"]): r.cosine
        for r in S.q_hard_negatives(spark, sf_dir).collect()
    }
    assert set(out) == {
        (1, "pos", 1),
        (2, "pos", 2),
        (3, "pos", 3),  # vec_id tiebreak: 3 before 4 at equal cosine
        (4, "pos", 4),
        (5, "neg", 1),
        (6, "neg", 2),
    }
    # threshold row and first band rows carry the engineered cosines
    assert out[(3, "pos", 3)] == out[(4, "pos", 4)]
    assert out[(5, "neg", 1)] == out[(6, "neg", 2)]


def test_anchor_without_rank4_emits_positives_only(tmp_path, spark, monkeypatch):
    # fewer than _HN_POS candidates: the oracle's thresholds CTE is empty,
    # so the band must vanish while positives survive — the r17 windowed
    # threshold yields NULL and the band predicate must not pass on it
    from video_data_pipeline_spark.queries import similarity as S

    monkeypatch.setattr(S, "_HN_QUERIES", 1)
    rows = [
        (0, _vec(0.0), 0),
        (1, _vec(0.1), 0),
        (2, _vec(0.2), 0),
        (3, _vec(0.3), 0),
    ]
    sf_dir = _write_embeddings(tmp_path, rows)
    got = [
        (r.vec_id, r.role, r["rank"])
        for r in S.q_hard_negatives(spark, sf_dir).collect()
    ]
    assert sorted(got) == [(1, "pos", 1), (2, "pos", 2), (3, "pos", 3)]


def test_plan_is_group_limited_without_checkpoint(spark, sf_dir):
    # the restructure's point: no ExistingRDD (checkpoint) leaf, and the
    # rank window is WindowGroupLimit-pruned so scan tasks emit <= 8 rows
    # per anchor instead of shuffling the full panel x corpus frame
    from video_data_pipeline_spark.queries.similarity import q_hard_negatives

    df = q_hard_negatives(spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in physical, physical[:2000]
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" not in optimized and "LogicalRDD" not in optimized
