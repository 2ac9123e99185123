"""Hot-bucket guard for the SimHash pigeonhole join (r9).

The r9 sfp30 probe showed a unigram-dense corpus makes q_simhash_near_pairs'
true output quadratic in the clone factor (~10⁸ pairs at 500k docs) — the
same failure mode lsh_pairs_from_bands already guards with max_bucket_size.
simhash_near_pairs_capped is the production knob; these tests pin its
contract against the registered (oracle-checked) query.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from video_data_pipeline_spark.queries.dedup import (
    q_simhash_near_pairs,
    simhash_near_pairs_capped,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["hamming"]) for r in df.collect()}


def test_uncapped_equals_registered_query(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _pairs(simhash_near_pairs_capped(docs))
    want = _pairs(q_simhash_near_pairs(spark, SF_DIR))
    assert got == want


def test_cap_bounds_degenerate_corpus_and_keeps_connectivity(spark):
    # degenerate: 200 DISTINCT docs (unique trailing word, so rep-collapse
    # keeps them all) sharing 200 unigrams -> simhashes within hamming 3 of
    # each other -> one giant bucket per chunk, C(200,2)=19,900 true pairs
    base = " ".join(f"w{i}" for i in range(200))
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base + " u"), F.col("id").cast("string")).alias("text"),
    )
    obs = Observation("simhash_guard")
    capped = simhash_near_pairs_capped(docs, max_bucket_size=8, observation=obs)
    got = _pairs(capped)
    full = _pairs(simhash_near_pairs_capped(docs))
    assert got <= full
    assert len(got) < len(full), "cap did not reduce the degenerate blow-up"
    m = obs.get
    assert m["oversized_buckets"] > 0 and m["max_bucket_size_seen"] > 8
    # transitivity anchor: within each capped bucket every kept doc pairs
    # with the bucket minimum, so connected components still merge the
    # group — check the global min doc participates in pairs
    nodes = {a for a, _, _ in got} | {b for _, b, _ in got}
    assert min(nodes) == min({a for a, _, _ in full} | {b for _, b, _ in full})


def test_cap_above_bucket_sizes_is_lossless(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _pairs(simhash_near_pairs_capped(docs, max_bucket_size=1 << 20))
    want = _pairs(simhash_near_pairs_capped(docs))
    assert got == want


def test_combo_geometry_is_output_invariant(spark):
    """The Manku-style 20×30-bit combo decomposition and the 4×15-bit
    chunk split are both complete pigeonholes for hamming ≤ 3, so the
    uncapped output must be identical — the geometry is a pure
    performance knob (see DEFAULT_SIMHASH_MAX_BUCKET_SIZE's docstring
    for when each wins)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _pairs(simhash_near_pairs_capped(docs, geometry="combos"))
    want = _pairs(simhash_near_pairs_capped(docs))
    assert got == want


def test_combo_geometry_rejects_incomplete_hamming(spark):
    import pytest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs_capped(docs, geometry="combos", max_hamming=4)
