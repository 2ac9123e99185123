"""Connected components over a pair list (dedup cluster formation).

After near-dup candidate generation (MinHash-LSH / SimHash), duplicates
form *clusters* via transitivity: A~B, B~C ⇒ {A,B,C} dedup together with
one survivor. That closure is an iterative algorithm — the one shape in
this engine that loops over actions (like PageRank/label propagation).

Implementation: iterative min-label propagation. Each node starts labeled
with itself; every round each node takes the min label among itself and
its neighbors; plain propagation converges in O(diameter) rounds (bounded
by ``max_iter`` — for adversarial path-shaped graphs switch to the
large-star/small-star contraction, which is O(log n) with the same join
primitives). Each round is one join + one groupBy; intermediates are
persisted for the round and explicitly unpersisted when superseded, so a
run leaves exactly one (GC-managed) checkpoint behind — the result.

At 100 TB scale the edge list (near-dup pairs) is tiny relative to the
corpus, so rounds are cheap.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Edges (undirected, any orientation) → (node, component) where
    component = min node id reachable. Node set = all endpoint ids.

    Warns (``RuntimeWarning``) if ``max_iter`` rounds pass without
    convergence — labels are then a valid partial propagation but NOT the
    true components; raise ``max_iter`` or use star-contraction for graphs
    with diameter > ``max_iter``.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("component")).persist()

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components: no convergence after {max_iter} rounds; "
            "labels are a partial propagation (graph diameter exceeds "
            "max_iter)",
            RuntimeWarning,
            stacklevel=2,
        )
    # one final lineage truncation so the caller doesn't recompute the whole
    # iterative chain; its blocks are freed by the ContextCleaner on GC
    result = labels.localCheckpoint(eager=True)
    labels.unpersist()
    sym.unpersist()
    return result
