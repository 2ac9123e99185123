"""Pin tools/scale_up.py --perturb's corpus structure (r9).

The perturbed corpora are the scale-correctness evidence for the near-dup
family, so their SHAPE is load-bearing: since r9 they must contain
case-variant exact duplicates (same fingerprint, different bytes — the
class the pre-r9 engine silently mishandled) alongside marker near-dups and
scrambled-unique copies. This test runs the generator (factor 3, sf0.001)
and asserts each branch produced what the sweep notes claim.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # r17 fast-tier: see conftest/pytest.ini


@pytest.fixture(scope="module")
def perturbed_dir(tmp_path_factory):
    # subprocess: scale_up owns (and stops) its SparkSession; running it
    # in-process would stop the shared test session
    import os
    import subprocess

    dst = str(tmp_path_factory.mktemp("sfp"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "scale_up.py"),
            "--src", "/root/testdata/sf0.001", "--dst", dst,
            "--factor", "3", "--perturb",
        ],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8", "SPARK_DRIVER_MEMORY": "2g"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return dst


def test_perturb_produces_case_variant_cliques(spark, perturbed_dir):
    docs = spark.read.parquet(f"{perturbed_dir}/documents.parquet")
    orig = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = orig.count()
    assert docs.count() == 3 * n0

    fp = F.md5(F.lower(F.trim("text")))
    per_fp = docs.groupBy(fp.alias("f")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("text").alias("n_texts"),
    )
    # case-variant cliques: same fingerprint, >1 distinct byte strings
    case_cliques = per_fp.where((F.col("n") > 1) & (F.col("n_texts") > 1)).count()
    assert case_cliques > 0, "--perturb emitted no case-variant exact dups"

    # the casevar branch is initcap(text): byte-different from the original
    # but fingerprint-identical — verify one concrete pair exists
    span = 1
    while span <= orig.agg(F.max("doc_id")).first()[0]:
        span *= 10
    joined = (
        docs.alias("c")
        .join(
            orig.alias("o"),
            (F.col("c.doc_id") % span) == F.col("o.doc_id"),
        )
        .where(F.col("c.doc_id") >= span)  # copies only
        .select(
            F.col("c.text").alias("ct"),
            F.col("o.text").alias("ot"),
        )
    )
    casevar = joined.where(
        (F.col("ct") != F.col("ot"))
        & (F.lower(F.trim("ct")) == F.lower(F.trim("ot")))
    ).count()
    assert casevar > 0, "no initcap exact-dup copies found"
    # marker near-dups: normalized copy extends the normalized original
    near = joined.where(
        (F.lower(F.trim("ct")) != F.lower(F.trim("ot")))
        & F.lower(F.trim("ct")).startswith(F.lower(F.trim("ot")))
    )
    assert near.count() > 0, "no near-dup copies extend the original text"
    # ...and specifically CASE-variant near-dups (the r8-VERDICT repro
    # shape): the extended copy's prefix is byte-different (initcap'd)
    casenear = near.where(~F.col("ct").startswith(F.col("ot"))).count()
    assert casenear > 0, "no initcap near-dup copies found"


def test_perturb_produces_quote_inclusions(spark, perturbed_dir):
    # r16 (VERDICT r15 #2): the subset class — short copies that are a
    # word-prefix of the original, so C(quote→orig) = 1.0 but J < 0.6
    docs = spark.read.parquet(f"{perturbed_dir}/documents.parquet")
    orig = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    span = 1
    while span <= orig.agg(F.max("doc_id")).first()[0]:
        span *= 10
    joined = (
        docs.alias("c")
        .join(orig.alias("o"), (F.col("c.doc_id") % span) == F.col("o.doc_id"))
        .where(F.col("c.doc_id") >= span)
        .select(F.col("c.text").alias("ct"), F.col("o.text").alias("ot"))
    )
    quotes = joined.where(
        (F.length("ct") < F.length("ot"))
        & F.col("ot").startswith(F.col("ct"))
        # short enough that Jaccard over shingles stays under 0.6 while
        # containment is 1.0 by construction
        & (F.length("ct") * 2 < F.length("ot"))
    )
    assert quotes.count() > 0, "--perturb emitted no quote-inclusion copies"


def test_perturb_corpus_discriminates_containment_from_jaccard(
    spark, perturbed_dir
):
    """The r15 VERDICT's gate blind spot: on every pre-r16 corpus class
    C ≥ 0.8 ⟺ J ≥ 0.6, so q_containment_pairs and q_prefix_filter_join
    returned IDENTICAL pair sets at every scale pin. The quote-inclusion
    class must make containment a strict superset — pairs with C = 1.0
    and J < 0.6 that the Jaccard join provably cannot emit."""
    from video_data_pipeline_spark.queries.simjoin import (
        containment_pairs_capped,
        prefix_filter_pairs,
    )

    docs = spark.read.parquet(f"{perturbed_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_pairs(docs, max_bucket_size=None)
        .select("doc_a", "doc_b").collect()
    }
    cont = {
        (r["doc_a"], r["doc_b"])
        for r in containment_pairs_capped(docs, max_posting_size=None)
        .select("doc_a", "doc_b").collect()
    }
    only_containment = cont - jac
    assert only_containment, (
        "containment and Jaccard pair sets are identical — the corpus "
        "still cannot discriminate the two families"
    )


def test_perturb_near_dups_survive_rep_collapse(spark, perturbed_dir):
    """End-to-end on the generated corpus: rep-level banding must surface
    near-dup pairs that connect a copy to its original's clique — the exact
    failure mode of the pre-r9 engine on case-variant members."""
    from video_data_pipeline_spark.queries.dedup import (
        exact_dup_representatives,
        lsh_pairs_from_bands,
        minhash_bands,
    )

    docs = spark.read.parquet(f"{perturbed_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = exact_dup_representatives(docs)
    assert reps.count() < docs.count(), "no exact-dup cliques to collapse"
    pairs = lsh_pairs_from_bands(minhash_bands(reps))
    assert pairs.count() > 0, "rep-level banding found no near-dup pairs"
