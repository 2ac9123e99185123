"""Graph-shape tests for label propagation (queries/communities.py).

The registered query's oracle parity is covered by test_oracle_parity.py;
these drive the LPA core on crafted edge lists to pin the property that
distinguishes it from connected components: splitting along weak bridges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.communities import (
    _LPA_ROUNDS,
    label_propagation_pairs,
)


def _labels(spark, edges, rounds=_LPA_ROUNDS):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = label_propagation_pairs(df, rounds=rounds).collect()
    return {r["node"]: r["lbl"] for r in out}


def _clique(nodes):
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]


def test_lpa_splits_bridged_cliques(spark):
    """Two 5-cliques joined by ONE bridge edge: CC merges them into one
    component; LPA must keep two communities — the exact failure mode of
    transitive near-dup clustering on an LSH collision bridge."""
    left, right = [1, 2, 3, 4, 5], [10, 11, 12, 13, 14]
    edges = _clique(left) + _clique(right) + [(5, 10)]
    lbl = _labels(spark, edges)
    left_lbls = {lbl[n] for n in left}
    right_lbls = {lbl[n] for n in right}
    assert len(left_lbls) == 1 and len(right_lbls) == 1
    assert left_lbls != right_lbls, "bridge edge must not merge the cliques"


def test_lpa_single_clique_converges_to_one_label(spark):
    nodes = [3, 7, 9, 21]
    lbl = _labels(spark, _clique(nodes))
    assert len(set(lbl.values())) == 1
    # deterministic tie-break: consensus label is a member id
    assert set(lbl.values()) <= set(nodes)


def test_lpa_isolated_edge_pairs_stay_separate(spark):
    lbl = _labels(spark, [(1, 2), (10, 11)])
    assert lbl[1] == lbl[2]
    assert lbl[10] == lbl[11]
    assert lbl[1] != lbl[10]


def test_lpa_deterministic_across_runs(spark):
    edges = _clique([1, 2, 3, 4, 5]) + _clique([10, 11, 12, 13, 14]) + [(5, 10)]
    a = _labels(spark, edges)
    # shuffled input order must not change the result (order-free aggregates)
    df = (
        spark.createDataFrame(edges, "doc_a long, doc_b long")
        .orderBy(F.rand(seed=7))
    )
    out = label_propagation_pairs(df).collect()
    b = {r["node"]: r["lbl"] for r in out}
    assert a == b
