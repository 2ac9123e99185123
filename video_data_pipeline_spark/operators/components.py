"""Connected components over a pair list (dedup cluster formation).

After near-dup candidate generation (MinHash-LSH / SimHash), duplicates
form *clusters* via transitivity: A~B, B~C ⇒ {A,B,C} dedup together with
one survivor. That closure is an iterative algorithm — the one shape in
this engine that loops over actions (like PageRank/label propagation).

Implementation: iterative min-label propagation. Each node starts labeled
with itself; every round each node takes the min label among itself and
its neighbors; converges in O(diameter) rounds (≤ log n with doubling
graphs; bounded by ``max_iter``). Each round is one join + one groupBy;
``localCheckpoint`` truncates lineage so plans don't grow per round —
the standard Spark iterative-algorithm pattern.

At 100 TB scale the edge list (near-dup pairs) is tiny relative to the
corpus, so rounds are cheap; for adversarial diameters switch to the
large-star/small-star variant (same primitives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Edges (undirected, any orientation) → (node, component) where
    component = min node id reachable. Node set = all endpoint ids."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("component")).localCheckpoint()

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
            .localCheckpoint()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels
