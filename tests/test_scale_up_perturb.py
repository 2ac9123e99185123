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
