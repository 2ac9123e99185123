"""Property tests for the analysis family (queries/analysis.py).

The DuckDB oracles pin engine parity; these pin the *semantics*:
KMV exactness/one-sidedness, median-from-counts vs a direct recompute,
and phrase adjacency vs a pure-Python scan.
"""

from __future__ import annotations

import hashlib
import statistics

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.analysis import (
    _KMV_K,
    _PHRASE,
    _median_from_counts,
)
from video_data_pipeline_spark.queries.registry import load_all

REGISTRY = load_all()


def test_kmv_exact_when_under_k(spark, sf_dir):
    """k_eff < K means the sketch saw every distinct hash — the estimate
    must then BE the exact count; and the estimate is never absurd when
    saturated (within 3x of truth for k=32 on this corpus)."""
    rows = REGISTRY["q_kmv_distinct"].spark_fn(spark, sf_dir).collect()
    assert rows, "no languages?"
    for r in rows:
        if r.k_eff < _KMV_K:
            assert r.est_distinct == r.true_distinct == r.k_eff
        else:
            assert r.k_eff == _KMV_K
            assert r.true_distinct / 3 <= r.est_distinct <= r.true_distinct * 3


def test_median_from_counts_matches_direct(spark):
    """The cumulative-count median selection equals the lower median of
    the expanded multiset (statistics.median_low) for odd/even/ties."""
    data = [
        ("a", 5, 3),  # a: [5,5,5,9] -> median_low 5
        ("a", 9, 1),
        ("b", 1, 1),  # b: [1,2,2,8,8] -> 2
        ("b", 2, 2),
        ("b", 8, 2),
        ("c", 7, 1),  # c: [7] -> 7
    ]
    counts = spark.createDataFrame(data, ["lang", "v", "cnt"])
    got = {
        r.lang: r.v for r in _median_from_counts(counts, "v").collect()
    }
    for lang in ("a", "b", "c"):
        expanded = [v for (l, v, c) in data if l == lang for _ in range(c)]
        assert got[lang] == statistics.median_low(expanded), lang


def test_phrase_match_equals_python_scan(spark, sf_dir):
    """Spark's positional-join hit counts equal a pure-Python adjacency
    scan over the same tokenization."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    w1, w2 = _PHRASE
    expected = {}
    for r in docs:
        toks = r.text.strip().split()
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == w1 and toks[i + 1] == w2
        )
        if n:
            expected[r.doc_id] = n
    got = {
        r.doc_id: r.n_hits
        for r in REGISTRY["q_phrase_match"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_quality_classifier_score_is_sum_of_bucket_weights(spark, sf_dir):
    """Recompute one document's score from the md5 definitions."""
    df = REGISTRY["q_quality_classifier"].spark_fn(spark, sf_dir)
    row = df.orderBy("doc_id").first()
    text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") == row.doc_id)
        .first()
        .text
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    score = sum(
        (h60(f"w#{h60(tok) % 4096}") % 2001) - 1000
        for tok in text.strip().split()
    )
    assert score == row.score_micro
    assert row.keep == (score > 0)


def test_cdc_insertion_moves_one_boundary_region(spark):
    """The CDC property: inserting text into one document perturbs only
    the chunks overlapping the edit — chunks outside the 4-gram window
    around the insertion point re-align identically (fixed-width blocks
    would all shift)."""
    import hashlib

    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = base[:300] + "INSERTED TEXT HERE " + base[300:]

    def chunks_of(text):
        bounds = [
            i
            for i in range(4, len(text) + 1)
            if int(hashlib.md5(text[i - 4 : i].encode()).hexdigest()[:15], 16)
            % 64
            == 0
        ]
        out, prev = [], 0
        for b in bounds + [len(text)]:
            if b > prev:
                out.append(text[prev:b])
            prev = b
        return out

    c1, c2 = chunks_of(base), chunks_of(edited)
    shared = set(c1) & set(c2)
    # most chunk CONTENT survives the edit (re-synchronization)
    assert len(shared) >= len(c1) - 3, (len(c1), len(c2), len(shared))

    # and the Spark expression agrees with the pure-Python chunker
    from pyspark.sql import functions as F

    from video_data_pipeline_spark.queries.analysis import _bound_expr

    df = spark.createDataFrame([(0, base), (1, edited)], ["doc_id", "text"])
    got = (
        df.select("doc_id", "text", F.expr(_bound_expr("spark")).alias("b"))
        .orderBy("doc_id")
        .collect()
    )
    for row, text in ((got[0], base), (got[1], edited)):
        want = [
            i
            for i in range(4, len(text) + 1)
            if int(hashlib.md5(text[i - 4 : i].encode()).hexdigest()[:15], 16)
            % 64
            == 0
        ]
        assert row.b == want
