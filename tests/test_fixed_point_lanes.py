"""1e13-scale sweep of every fixed-point scoring lane (r11 VERDICT #7).

tests/test_token_budget_lane.py proved the token-budget recipe's
DECIMAL(38,0) lane exact at 100 TB token counts after the narrow BIGINT
product silently overflowed. This file applies the same discipline to the
remaining fixed-point families — DSIR log-ratio (curation.py), CCNet
xent-centinat quantization and the Jelinek-Mercer bigram/backoff/OOV
log-probs (curation2.py) — by driving the FACTORED production expressions
with synthetic aggregates at real 100 TB scale (counts ~2.5e13, per-doc
logprob sums ~1e18) and pinning every output against Python math, which is
exact (int) or evaluates the identical IEEE double ops (log lanes).

No overflow, no sign flip, no engine-side wraparound: each case asserts
the exact expected value, not just a range.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.curation import (
    _FIXED_POINT,
    _N_BUCKETS,
    dsir_lr_micro_col,
)
from video_data_pipeline_spark.queries.curation2 import (
    _FP,
    BACKOFF_LP_MICRO_SQL,
    BIGRAM_LP_MICRO_SQL,
    OOV_LP_MICRO_SQL,
    XENT_CENTI_SQL,
)

# a plausible 100 TB corpus: 2.5e13 raw bigrams, 4.9e12 of them target
_R_TOT = 25_000_000_000_000
_T_TOT = 4_900_000_000_000

#: (t_cnt, r_cnt) per-bucket cases: hot boilerplate bucket, a target-heavy
#: bucket, an empty-target bucket, a singleton
_DSIR_CASES = [
    (3_100_000_000_000, 9_800_000_000_000),
    (1_200_000_000_000, 1_300_000_000_000),
    (0, 7_000_000_000_000),
    (1, 1),
]


def _py_lr_micro(t_cnt: int, r_cnt: int) -> int:
    # the identical IEEE double ops the factored column runs
    num = (float(t_cnt) + 1.0) * (float(_R_TOT) + _N_BUCKETS)
    den = (float(r_cnt) + 1.0) * (float(_T_TOT) + _N_BUCKETS)
    v = math.log(num / den) * _FIXED_POINT
    # Spark ROUND is half-up on the double; Python round() is banker's —
    # use floor(x + 0.5) semantics on the magnitude like Spark's
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_dsir_lr_lane_at_100tb(spark):
    df = spark.createDataFrame(
        [(t, r, _T_TOT, _R_TOT) for t, r in _DSIR_CASES],
        "t_cnt bigint, r_cnt bigint, t_tot bigint, r_tot bigint",
    )
    got = [r[0] for r in df.select(dsir_lr_micro_col()).collect()]
    want = [_py_lr_micro(t, r) for t, r in _DSIR_CASES]
    assert got == want
    assert all(abs(v) < 10**6 for v in got), "lr lane left its ±60-nat band"


#: (logprob_micro, n_tokens): a 9e12-token mega-document at ~20 nats/token
#: pushes the numerator to ~1.8e18 — within one decimal order of BIGINT
#: max, exactly the headroom the lane claims
_XENT_CASES = [
    (-1_800_000_000_000_000_000, 9_000_000_000_000),
    (-123_456_789_012_345, 10_000_000_000),
    (-200_000, 1),
    (0, 5),
]


def test_xent_centinat_lane_at_100tb(spark):
    df = spark.createDataFrame(
        _XENT_CASES, "logprob_micro bigint, n_tokens bigint"
    )
    got = [r[0] for r in df.select(F.expr(XENT_CENTI_SQL)).collect()]
    want = [(-lp) // (nt * 100) for lp, nt in _XENT_CASES]
    assert got == want
    assert all(v >= 0 for v in got), "cross entropy went negative"


# (c, pc, uc) bigram-lane cases over n=2.5e13 total tokens, v=5e7 vocab:
# a dominant transition, a rare one, a hapax following a hot prev
_N_TOK, _V = 25_000_000_000_000, 50_000_000
_BIGRAM_CASES = [
    (4_000_000_000_000, 9_000_000_000_000, 9_500_000_000_000),
    (1, 9_000_000_000_000, 3),
    (7, 12, 1),
]


def _py_round(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _py_p_uni(uc: int) -> float:
    return 0.3 * (float(uc) + 1.0) / (float(_N_TOK) + float(_V))


def test_bigram_lanes_at_100tb(spark):
    df = spark.createDataFrame(
        [(c, pc, uc, _N_TOK, _V) for c, pc, uc in _BIGRAM_CASES],
        "c bigint, pc bigint, uc bigint, n bigint, v bigint",
    )
    got = df.select(
        F.expr(BIGRAM_LP_MICRO_SQL).alias("bi"),
        F.expr(BACKOFF_LP_MICRO_SQL).alias("bo"),
        F.expr(OOV_LP_MICRO_SQL).alias("oov"),
    ).collect()
    for row, (c, pc, uc) in zip(got, _BIGRAM_CASES):
        assert row["bi"] == _py_round(
            math.log(0.7 * float(c) / float(pc) + _py_p_uni(uc)) * _FP
        )
        assert row["bo"] == _py_round(math.log(_py_p_uni(uc)) * _FP)
        assert row["oov"] == _py_round(
            math.log(0.3 * 1.0 / (float(_N_TOK) + float(_V))) * _FP
        )
        # every lane stays inside the ±60-nat band the per-doc BIGINT
        # fold's headroom argument assumes
        assert all(abs(row[k]) < 60 * _FP for k in ("bi", "bo", "oov"))


def test_per_doc_fold_headroom():
    """The per-document Σ cnt·lp_micro BIGINT fold: with every lane pinned
    inside ±60·1e4, overflow needs ~1.5e13 transitions in ONE document —
    3 orders beyond any real document, and the corpus-level sums never
    enter a BIGINT lane (xent_nats divides in double)."""
    lane_bound = 60 * _FP
    assert (2**63 - 1) // lane_bound > 1.5e13
