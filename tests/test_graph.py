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


def test_random_graph_matches_reference_both_orders(spark):
    rng = random.Random(7)
    edges = sorted(
        {tuple(sorted(rng.sample(range(30), 2))) for _ in range(150)}
    )
    want = _exact(edges)
    df = _df(spark, edges)
    assert count_triangles(df, degree_order=True).collect()[0]["n_triangles"] == want
    assert count_triangles(df, degree_order=False).collect()[0]["n_triangles"] == want


def test_reversed_edge_orientation_is_irrelevant(spark):
    tri = [(1, 2), (3, 2), (3, 1)]  # mixed orientations of one triangle
    assert count_triangles(_df(spark, tri)).collect()[0]["n_triangles"] == 1
