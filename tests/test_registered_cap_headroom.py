"""Registered-default cap headroom gate (r12, VERDICT r11 #3).

The registered pair-join queries now carry PRODUCTION default hot-bucket /
hot-posting caps (q_prefix_filter_join, q_containment_pairs,
q_simhash_near_pairs — and q_simhash_calibration through its front). The
correctness contract is two-sided:

- the cap must BIND on clone-degenerate corpora (PROBE_CAPPED_SFP30 — the
  whole point of the guard), and
- the cap must NOT bind on the standard fixtures, or the registered query
  would silently diverge from its uncapped DuckDB oracle and every
  hash-match gate would start failing for a reason no one changed.

This gate pins the second side: on the shipped sf0.01 fixture (the
driver's correctness scale, and the largest standard corpus in-container),
every bucket/posting stays UNDER the default cap — with telemetry-measured
headroom — and the capped default output equals the uncapped output
row-for-row. A fixture regeneration or a cap reduction that makes the cap
bind fails HERE, by name, instead of as an opaque oracle mismatch.
"""

from __future__ import annotations

import pytest
from pyspark.sql.observation import Observation

from video_data_pipeline_spark.queries.audit import (
    q_simhash_calibration,
    q_simhash_calibration_combo,
)
from video_data_pipeline_spark.queries.dedup import (
    DEFAULT_LSH_MAX_BUCKET_SIZE,
    DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
    q_minhash_lsh_pairs,
    q_simhash_near_pairs,
    q_simhash_near_pairs_combo,
)
from video_data_pipeline_spark.queries.simjoin import (
    DEFAULT_MAX_BUCKET_SIZE,
    DEFAULT_MAX_POSTING_SIZE,
    q_containment_pairs,
    q_prefix_filter_join,
)

pytestmark = pytest.mark.slow  # r17 fast-tier: see conftest/pytest.ini

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    ("fn", "cap", "cap_kw", "seen_key"),
    [
        (q_prefix_filter_join, DEFAULT_MAX_BUCKET_SIZE, "max_bucket_size",
         "max_bucket_size_seen"),
        (q_containment_pairs, DEFAULT_MAX_POSTING_SIZE, "max_posting_size",
         "max_posting_size_seen"),
        (q_simhash_near_pairs, DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
         "max_bucket_size", "max_bucket_size_seen"),
        (q_simhash_calibration, DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
         "max_bucket_size", "max_bucket_size_seen"),
        (q_minhash_lsh_pairs, DEFAULT_LSH_MAX_BUCKET_SIZE,
         "max_bucket_size", "max_bucket_size_seen"),
        (q_simhash_near_pairs_combo, DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
         "max_bucket_size", "max_bucket_size_seen"),
        (q_simhash_calibration_combo, DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
         "max_bucket_size", "max_bucket_size_seen"),
    ],
    ids=["prefix_filter", "containment", "simhash_near", "simhash_calibration",
         "minhash_lsh", "simhash_combo", "simhash_calibration_combo"],
)
def test_default_cap_does_not_bind_on_standard_fixture(
    spark, fn, cap, cap_kw, seen_key
):
    obs = Observation(f"headroom_{fn.__name__}")
    capped = _rows(fn(spark, SF_DIR, observation=obs))
    uncapped = _rows(fn(spark, SF_DIR, **{cap_kw: None}))
    assert capped == uncapped, (
        f"{fn.__name__}: registered default cap changed the answer on the "
        "standard fixture — the oracle gate is now silently broken"
    )
    m = obs.get
    assert m["oversized" + ("_postings" if "posting" in seen_key else "_buckets")] == 0
    assert m[seen_key] < cap, (
        f"{fn.__name__}: {seen_key}={m[seen_key]} has reached the default "
        f"cap {cap}; raise the default or shrink the fixture"
    )
