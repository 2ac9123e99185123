"""Hot-bucket / hot-posting guards for the prefix-filter family (r10).

r9 VERDICT #1: q_containment_pairs joined the smaller side's prefix against
FULL postings with no cap — one corpus-wide boilerplate shingle (license
headers, nav chrome) makes the candidate expansion quadratic at 100 TB —
and q_prefix_filter_join's bucket stage carried no hard cap either (rarity
ordering is a heuristic, not a bound). prefix_filter_pairs(max_bucket_size)
and containment_pairs_capped(max_posting_size) are the production knobs,
copying the lsh_pairs_from_bands / simhash_near_pairs_capped pattern; these
tests pin their contract against the registered (oracle-checked) queries
and show bounded pair counts on a crafted hot-shingle corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from video_data_pipeline_spark.queries.simjoin import (
    containment_pairs_capped,
    prefix_filter_pairs,
    q_containment_pairs,
    q_prefix_filter_join,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def _hot_shingle_corpus(spark, n_docs=50):
    """n_docs DISTINCT documents (unique 3-word tails, so rep-collapse keeps
    them all) sharing a 29-word base: 27 common shingles (df = n_docs, the
    hot postings/buckets) + 3 unique shingles each. Every pair has
    J = 27/33 ≈ 0.82 ≥ 0.6 and C = 27/30 = 0.9 ≥ 0.8, so the TRUE output is
    the full C(n,2) clique — exactly the boilerplate blow-up the caps exist
    to bound."""
    base = " ".join(f"w{i}" for i in range(29))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(base + " u"),
            F.col("id").cast("string"),
            F.lit("a u"),
            F.col("id").cast("string"),
            F.lit("b u"),
            F.col("id").cast("string"),
            F.lit("c"),
        ).alias("text"),
    )


# ---------------------------------------------------- q_prefix_filter_join


def test_prefix_cap_above_bucket_sizes_is_lossless(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _pairs(prefix_filter_pairs(docs, max_bucket_size=1 << 20))
    want = _pairs(q_prefix_filter_join(spark, SF_DIR))
    assert got == want


def test_prefix_cap_bounds_hot_shingle_corpus(spark):
    docs = _hot_shingle_corpus(spark)
    obs = Observation("prefix_guard")
    got = _pairs(prefix_filter_pairs(docs, max_bucket_size=8, observation=obs))
    full = _pairs(prefix_filter_pairs(docs))
    assert len(full) == 50 * 49 // 2, "fixture is not the full true clique"
    assert got <= full
    assert len(got) < len(full), "cap did not reduce the hot-shingle blow-up"
    m = obs.get
    assert m["oversized_buckets"] > 0 and m["max_bucket_size_seen"] > 8
    # transitivity anchor: kept members of each capped bucket (the (n,
    # doc_id)-smallest) still pair among themselves, so connected
    # components merge the capped clique through them — the global min doc
    # must still participate
    nodes = {a for a, _ in got} | {b for _, b in got}
    assert min(nodes) == min({a for a, _ in full} | {b for _, b in full})


# ----------------------------------------------------- q_containment_pairs


def test_containment_uncapped_equals_registered_query(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _pairs(containment_pairs_capped(docs))
    want = _pairs(q_containment_pairs(spark, SF_DIR))
    assert got == want


def test_containment_cap_bounds_hot_posting_corpus(spark):
    docs = _hot_shingle_corpus(spark)
    obs = Observation("containment_guard")
    capped = containment_pairs_capped(docs, max_posting_size=8, observation=obs)
    got = _pairs(capped)
    full = _pairs(containment_pairs_capped(docs))
    assert len(full) == 50 * 49 // 2, "fixture is not the full true clique"
    assert got <= full
    assert len(got) < len(full), "cap did not reduce the hot-posting blow-up"
    # posting lists are capped to the 8 (n, doc_id)-smallest docs, and the
    # asymmetric predicate keeps s before b, so surviving pairs live among
    # those kept members: bounded by C(cap, 2) regardless of corpus size
    assert len(got) <= 8 * 7 // 2
    m = obs.get
    assert m["oversized_postings"] > 0 and m["max_posting_size_seen"] > 8


def test_containment_cap_above_posting_sizes_is_lossless(spark):
    docs = _hot_shingle_corpus(spark)
    got = _pairs(containment_pairs_capped(docs, max_posting_size=1 << 20))
    want = _pairs(containment_pairs_capped(docs))
    assert got == want
