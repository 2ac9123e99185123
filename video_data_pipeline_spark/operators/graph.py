"""Triangle counting over an undirected edge list, with degree ordering.

Wedge-close triangle counting enumerates, for every vertex, the pairs of
its neighbors (wedges) and probes whether each pair is itself an edge. The
wedge count — the whole cost — is Σ_v deg⁺(v)², where deg⁺ is the
OUT-degree under whatever orientation the edges are given. Orienting each
edge from its lower to its higher endpoint under an arbitrary total order
makes every triangle appear exactly once, but the id order can be terrible:
a hub with degree d oriented "low" emits d² wedges.

The classic fix [Ortmann & Brandes 2014; Chiba & Nishizeki 1985] is to
order vertices by DEGREE (ties by id): every vertex's out-degree is then
bounded by O(sqrt(|E|)) on arbitrary graphs (arboricity bound), so wedge
work drops from Σ deg² to O(|E|^1.5) — on a clique of size c, id order
builds ~c³/6 wedges and degree order builds exactly the same (cliques are
the worst case for everyone), but on the hub-and-spoke graphs real
near-dup data produces, the hub orders LAST and emits zero wedges.

The count itself is orientation-invariant, so the degree-ordered operator
is drop-in testable against the id-ordered form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_triangles(
    edges: DataFrame, a: str = "a", b: str = "b", degree_order: bool = True
) -> DataFrame:
    """Count triangles in an undirected simple graph given as a DataFrame
    of distinct edges (``a`` != ``b``; either orientation, no duplicates in
    the canonical a<b sense). Returns a 1-row DataFrame ``(n_triangles)``.

    ``degree_order=True`` re-orients every edge from its (degree, id)-
    smaller endpoint to its larger one before the wedge-close joins —
    two extra vertex-keyed joins against the (|V|-row) degree table buy
    the O(|E|^1.5) wedge bound. ``False`` orients by id alone (no degree
    join; fine for sparse, skew-free graphs)."""
    e = edges.select(F.col(a).alias("x"), F.col(b).alias("y"))

    if degree_order:
        deg = (
            e.select(F.col("x").alias("v"))
            .unionAll(e.select(F.col("y").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        e = (
            e.join(deg.withColumnsRenamed({"v": "x", "deg": "dx"}), "x")
            .join(deg.withColumnsRenamed({"v": "y", "deg": "dy"}), "y")
        )
        x_first = (F.col("dx") < F.col("dy")) | (
            (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
        )
    else:
        x_first = F.col("x") < F.col("y")

    oriented = e.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("lo"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("hi"),
    )
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    # wedge u->v->w (u,w both ordered after... u<v<w in the chosen order);
    # close with the oriented edge (u,w) — each triangle counted once
    e3 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = e1.join(e2, "v")
    return wedges.join(e3, ["u", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
