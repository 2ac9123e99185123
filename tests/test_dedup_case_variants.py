"""Round-9 regression: case-variant duplicates must not lose near-dup edges.

r8 VERDICT "What's wrong #1": the exact-dup fingerprint is
``md5(lower(trim(text)))`` but shingles/word-hashes were built from the RAW
case-sensitive text, so a clique member whose casing differs from its
min-doc_id representative had a different MinHash/SimHash signature that was
never banded — every rep-collapsed near-dup query silently dropped true
near-dup edges, and ``q_jaccard_pairs_expanded`` labeled case-variant pairs
jaccard=1.0 whose case-sensitive shingle Jaccard was ~0. Fixed by building
``_SPARK_WORDS`` / ``_DUCK_WORDS`` from ``lower(trim(text))`` (the same
normalization as the fingerprint). These tests pin the minimal 3-doc repro
from the verdict so it can never regress:

- doc 1: lowercase base text
- doc 2: Title-Case variant of doc 1 (exact dup BY FINGERPRINT, different bytes)
- doc 3: a true near-dup of doc 2's Title-Case text

Pre-fix behavior: rep-level banding (reps = {1, 3}; doc 2 collapses into 1)
returned ZERO pairs because doc 3's signature was built from Title-Case words
while rep 1's came from lowercase words; member-level banding found (2, 3).
Post-fix: both levels agree and the (1, 3) edge survives the collapse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.dedup import (
    exact_dup_representatives,
    lsh_pairs_from_bands,
    minhash_bands,
    signatures,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles carry heavy stones across the wide muddy river before sunset "
    "every single day"
)
_TITLE = " ".join(w.capitalize() for w in _BASE.split())
# near-dup of the Title-Case member: one word substituted mid-text
_NEAR = _TITLE.replace("Heavy Stones", "Heavy Bricks")


@pytest.fixture()
def docs(spark):
    rows = [(1, _BASE), (2, _TITLE), (3, _NEAR)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def fixture_dir(spark, docs, tmp_path):
    """Materialize the 3-doc corpus as an sf-style directory so the
    registered (spark, sf_dir) query callables run on it unmodified."""
    d = docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("fixture")
    ).withColumn("n_chars", F.length("text").cast("long"))
    d.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_signature_is_function_of_fingerprint(spark, docs):
    """Case variants share one fingerprint ⇒ they MUST share one signature —
    the invariant that makes rep-collapse-then-band lossless."""
    sig = {r["doc_id"]: r for r in signatures(docs).collect()}
    mh_cols = [c for c in signatures(docs).columns if c.startswith("mh")]
    assert mh_cols, "signature columns missing"
    for c in mh_cols:
        assert sig[1][c] == sig[2][c], (
            f"{c}: Title-Case exact-dup diverged from its lowercase twin"
        )


def test_rep_level_banding_keeps_case_variant_near_dup_edge(spark, docs):
    """The verdict's live repro: rep-level LSH must surface (1, 3) — the
    near-dup edge reachable only through the Title-Case clique member."""
    reps = exact_dup_representatives(docs)
    assert {r["doc_id"] for r in reps.collect()} == {1, 3}
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_pairs_from_bands(minhash_bands(reps)).collect()
    }
    assert (1, 3) in pairs, "case-variant near-dup edge lost by rep collapse"


def test_member_and_rep_level_banding_agree(spark, docs):
    """Star-edge equivalence (q_minhash_lsh_pairs docstring): member-level
    candidate pairs, projected to rep space, equal rep-level pairs exactly."""
    member = lsh_pairs_from_bands(minhash_bands(docs))
    rep_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_pairs_from_bands(
            minhash_bands(exact_dup_representatives(docs))
        ).collect()
    }
    fp = F.md5(F.lower(F.trim("text")))
    m = docs.select(fp.alias("f"), "doc_id")
    rep_of = m.join(
        m.groupBy("f").agg(F.min("doc_id").alias("rep")), "f"
    ).select("doc_id", "rep")
    ra = rep_of.select(F.col("doc_id").alias("doc_a"), F.col("rep").alias("rep_a"))
    rb = rep_of.select(F.col("doc_id").alias("doc_b"), F.col("rep").alias("rep_b"))
    projected = {
        (min(r["rep_a"], r["rep_b"]), max(r["rep_a"], r["rep_b"]))
        for r in member.join(ra, "doc_a").join(rb, "doc_b").collect()
        if r["rep_a"] != r["rep_b"]
    }
    assert projected == rep_pairs


def test_expanded_pairs_report_true_normalized_jaccard(spark, fixture_dir):
    """q_jaccard_pairs_expanded on the repro corpus: the within-clique pair
    (1,2) is jaccard=1.0 AND that value is now TRUE under the engine's
    normalized-shingle semantics (pre-fix it was a fabrication — the raw
    shingle Jaccard of a lowercase/Title-Case pair is 0); the cross-clique
    member pair (2,3) inherits its rep pair's verified value, which must
    equal the directly-computed normalized shingle Jaccard."""
    from video_data_pipeline_spark.queries.dedup import (
        _SPARK_WORDS,
        q_jaccard_pairs_expanded,
    )

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q_jaccard_pairs_expanded(spark, fixture_dir).collect()
    }
    assert got.get((1, 2)) == 1.0, "within-clique case-variant pair missing"
    assert (2, 3) in got, "cross-clique member pair not recovered"
    assert (1, 3) in got, "rep-level verified pair missing"

    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    sets = docs.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, size({_SPARK_WORDS}) - 3), "
                f"i -> concat_ws(' ', {_SPARK_WORDS}[i], {_SPARK_WORDS}[i+1], "
                f"{_SPARK_WORDS}[i+2]))"
            )
        ).alias("sh"),
    )
    sh = {r["doc_id"]: set(r["sh"]) for r in sets.collect()}
    true_jac = len(sh[2] & sh[3]) / len(sh[2] | sh[3])
    assert got[(2, 3)] == pytest.approx(true_jac)
    assert got[(1, 3)] == pytest.approx(true_jac)
    assert 0.0 < true_jac < 1.0, "fixture degenerated — near-dup not partial"


def test_simhash_is_function_of_fingerprint(spark, docs):
    """Same invariant for the SimHash path: the 60-bit signature of a
    Title-Case exact-dup equals its lowercase twin's."""
    from video_data_pipeline_spark.queries.dedup import (
        _SPARK_WORD_HASHES,
        _simhash_from_hashes,
    )

    sims = {
        r["doc_id"]: r["sim"]
        for r in docs.select(
            "doc_id",
            F.expr(
                _simhash_from_hashes("spark", _SPARK_WORD_HASHES)
            ).alias("sim"),
        ).collect()
    }
    assert sims[1] == sims[2]
