"""Triangle counting operator: known counts, orientation invariance."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from video_data_pipeline_spark.operators.graph import count_triangles


def _df(spark, edges):
    return spark.createDataFrame([(x, y) for x, y in edges], "a long, b long")


def _exact(edges):
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    n = 0
    for x, y in edges:
        n += len(adj[x] & adj[y])
    return n // 3  # each triangle counted once per edge


def test_clique_and_star(spark):
    clique = list(itertools.combinations(range(6), 2))  # C(6,3) = 20 triangles
    star = [(100, 100 + i) for i in range(1, 8)]  # 0 triangles
    df = _df(spark, clique + star)
    assert count_triangles(df).collect()[0]["n_triangles"] == 20
    assert (
        count_triangles(df, degree_order=False).collect()[0]["n_triangles"] == 20
    )


def test_random_graph_matches_reference_all_strategies(spark):
    """The intersect default (r13), the wedge twin, and both vertex
    orders all count the same triangles — strategy and orientation are
    physical choices, never semantic ones."""
    rng = random.Random(7)
    edges = sorted(
        {tuple(sorted(rng.sample(range(30), 2))) for _ in range(150)}
    )
    want = _exact(edges)
    df = _df(spark, edges)
    for method in ("intersect", "wedge"):
        for order in (True, False):
            got = count_triangles(df, degree_order=order, method=method)
            assert got.collect()[0]["n_triangles"] == want, (method, order)


def test_checkpointed_edge_list_same_count(spark):
    rng = random.Random(11)
    edges = sorted(
        {tuple(sorted(rng.sample(range(25), 2))) for _ in range(120)}
    )
    df = _df(spark, edges)
    want = _exact(edges)
    assert (
        count_triangles(df, checkpoint=True).collect()[0]["n_triangles"] == want
    )


def test_empty_graph_counts_zero(spark):
    df = spark.createDataFrame([], "a long, b long")
    row = count_triangles(df).collect()[0]
    assert row["n_triangles"] == 0


def test_reversed_edge_orientation_is_irrelevant(spark):
    tri = [(1, 2), (3, 2), (3, 1)]  # mixed orientations of one triangle
    assert count_triangles(_df(spark, tri)).collect()[0]["n_triangles"] == 1


def test_kcore_fixpoint_reached(spark, sf_dir):
    """q_kcore runs a FIXED 6 peeling rounds for oracle parity; this pins
    that 6 rounds reach the fixpoint on the test corpus — a 7th peel of
    the returned 2-core removes nothing (every node keeps degree >= 2),
    so the fixed-round result IS the true 2-core."""
    from pyspark.sql import functions as F

    from video_data_pipeline_spark.queries.dedup import (
        _KCORE_K,
        q_kcore,
        q_minhash_lsh_pairs,
    )

    core = q_kcore(spark, sf_dir)
    nodes = core.select(F.col("doc_id").alias("u"))
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
    )
    deg = (
        sym.join(nodes, "u", "left_semi")
        .join(nodes.withColumnRenamed("u", "v"), "v", "left_semi")
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    degs = {r.u: r.deg for r in deg.collect()}
    core_rows = core.collect()
    assert core_rows, "empty 2-core — fixture lost its cycles"
    for r in core_rows:
        assert degs.get(r.doc_id, 0) >= _KCORE_K, f"node {r.doc_id} would peel"
        assert degs[r.doc_id] == r.core_deg
