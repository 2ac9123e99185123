"""Engine parity + banded semantics for the Levenshtein verifier
(q_levenshtein_verified_pairs).

Pins the cross-engine caveat documented in queries/dedup.py: Spark's
``levenshtein`` counts CODEPOINTS while DuckDB's counts UTF-8 BYTES. On
ASCII text (this repo's corpora) they agree exactly; on multibyte text
they diverge by design — both behaviors are asserted here so a silent
change in either engine shows up as a test failure, not an oracle
mystery.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

ASCII_CASES = [
    ("kitten", "sitting", 3),
    ("", "abc", 3),
    ("", "", 0),
    ("abc", "abc", 0),
    ("a" * 50, "b" * 50, 50),
    ("flaw", "lawn", 2),
]


def _duck_lev(a: str, b: str) -> int:
    return duckdb.connect().execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]


def test_ascii_parity_spark_vs_duckdb(spark):
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in ASCII_CASES], ["a", "b"]
    ).select("a", "b", F.levenshtein("a", "b").alias("lev"))
    got = {(r.a, r.b): r.lev for r in df.collect()}
    for a, b, want in ASCII_CASES:
        assert got[(a, b)] == want == _duck_lev(a, b)


def test_non_ascii_divergence_is_the_documented_one(spark):
    """'héllo' vs 'hello': one codepoint substitution, but é is 2 UTF-8
    bytes — Spark says 1, DuckDB says 2. The query's docstring caveat
    rests on exactly this; if either engine changes, revisit it."""
    row = (
        spark.createDataFrame([("héllo", "hello")], ["a", "b"])
        .select(F.levenshtein("a", "b").alias("lev"))
        .first()
    )
    assert row.lev == 1  # codepoints
    assert _duck_lev("héllo", "hello") == 2  # UTF-8 bytes


def test_banded_levenshtein_sentinel_and_exactness(spark):
    """3-arg levenshtein is the banded DP: exact at/below the cutoff,
    -1 above it — the filter `>= 0` in the query applies the cutoff AND
    drops the sentinel in one predicate."""
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("aaaa", "zzzz")], ["a", "b"]
    ).select(
        F.levenshtein("a", "b", 3).alias("k3"),
        F.levenshtein("a", "b").alias("full"),
    )
    rows = df.collect()
    assert rows[0].k3 == rows[0].full == 3  # at the cutoff: exact
    assert rows[1].full == 4 and rows[1].k3 == -1  # above: sentinel


def test_q_levenshtein_verified_pairs_matches_oracle(spark, sf_dir):
    from video_data_pipeline_spark.queries.dedup import (
        _duck_levenshtein_sql,
        q_levenshtein_verified_pairs,
    )

    got = sorted(
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in q_levenshtein_verified_pairs(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(_duck_levenshtein_sql()).fetchall()))
    assert got == want
    if not got:
        pytest.skip("no LSH candidates at this sf — parity vacuous")
