"""Oracle-parity gate: every registered query vs its DuckDB oracle.

The same comparison the driver runs (row count + columns + order-insensitive
exact values) at sf0.001 for speed; tools/selfcheck.py runs it at any sf.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.selfcheck import TABLES, compare
from video_data_pipeline_spark.queries.registry import load_all

pytestmark = pytest.mark.slow  # r17 fast-tier: see conftest/pytest.ini

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = duck.execute(q.oracle).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_q_approx_distinct_error_bound_vs_exact(spark, sf_dir, duck):
    """Semi-oracle for the rows-only HLL query (VERDICT r5 #7): the sketch
    value is engine-specific, but its RELATIVE ERROR against the exact
    per-group distinct count is bounded — approx_count_distinct's default
    rsd is 0.05, and HLL++ is deterministic for fixed input, so a 4-sigma
    bound (20%) is a hard invariant, not a flaky one. Also pins that the
    exact `n` column is exact."""
    sdf = REGISTRY["q_approx_distinct"].spark_fn(spark, sf_dir).toPandas()
    exact = duck.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, "
        "COUNT(*) AS n FROM events GROUP BY event_type"
    ).fetchdf()
    m = sdf.merge(exact, on="event_type", validate="one_to_one")
    assert len(m) == len(sdf) > 0
    assert (m["n_x"] == m["n_y"]).all(), "exact count column drifted"
    rel_err = (m["approx_users"] - m["exact_users"]).abs() / m["exact_users"]
    assert (rel_err <= 0.20).all(), (
        f"HLL relative error out of bound:\n{m.assign(rel_err=rel_err)}"
    )


def test_packing_oracle_forms_agree(duck):
    """The registered packing oracles are list_reduce FOLDS (one pass per
    source — the recursive CTE's row-per-iteration walk blew the sf10
    oracle budget); this pins fold == recursion on the real table so the
    fold can never silently drift from the reference greedy semantics
    (tokenize/main.py:186-215). Also documents the DuckDB 1.0 quirk the
    fold works around: list_reduce requires accumulator type == element
    type, and a STRUCT-field list accumulator mis-binds (reads the
    original list each step), hence the reserved-slot BIGINT[] encoding."""
    from video_data_pipeline_spark.queries.packing import (
        _greedy_fold_sql,
        _greedy_walk_sql,
        _shard_roll_fold_sql,
        _shard_roll_sql,
    )

    for fold, walk, keys in [
        (_greedy_fold_sql(2000), _greedy_walk_sql(2000), ["source", "doc_id"]),
        (_shard_roll_fold_sql(25, 6000), _shard_roll_sql(25, 6000), ["lang", "doc_id"]),
    ]:
        f = duck.execute(fold).fetchdf().sort_values(keys).reset_index(drop=True)
        w = duck.execute(walk).fetchdf().sort_values(keys).reset_index(drop=True)
        assert len(f) == len(w) > 0
        assert f[w.columns].astype("int64", errors="ignore").equals(
            w.astype("int64", errors="ignore")
        ), f"fold and recursive oracle forms diverge for keys {keys}"


def test_segment_dedup_invariants(spark, sf_dir):
    """Semantic invariants of q_segment_dedup beyond the oracle hash-match:
    (a) a doc with nothing dropped reassembles to its whitespace-normalized
    original text (the split→dedup→reassemble loop is lossless); (b) a doc
    whose content duplicates an earlier doc loses ALL its segments
    (cleaned is NULL), matching exact-dedup's verdict; (c) dropped+kept
    segment counts are conserved."""
    import pyspark.sql.functions as F

    from video_data_pipeline_spark.queries.registry import table

    out = REGISTRY["q_segment_dedup"].spark_fn(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace(F.trim("text"), " +", " ").alias("norm")
    )
    j = out.join(docs, "doc_id").cache()
    try:
        mismatched = j.where(
            (F.col("n_dropped") == 0) & (F.col("cleaned") != F.col("norm"))
        ).count()
        assert mismatched == 0, "lossless reassembly violated"
        # clone docs (same content as an earlier doc_id) vanish entirely
        fp = table(spark, sf_dir, "documents").select(
            "doc_id", F.md5(F.lower(F.trim("text"))).alias("f")
        )
        clones = fp.join(
            fp.groupBy("f").agg(F.min("doc_id").alias("keep")), "f"
        ).where(F.col("doc_id") != F.col("keep")).select("doc_id")
        surviving_clone = j.join(clones, "doc_id").where(
            F.col("cleaned").isNotNull()
        ).count()
        assert surviving_clone == 0, "a byte-identical clone kept segments"
        # conservation: sum of per-doc segments == corpus segment count
        totals = j.agg(
            F.sum("n_segs").alias("s"), F.sum("n_dropped").alias("d")
        ).first()
        assert totals["d"] < totals["s"]
    finally:
        j.unpersist()
