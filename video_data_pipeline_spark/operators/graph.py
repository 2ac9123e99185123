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

r13 (VERDICT r12 #5): the default pair-generation strategy is now
EDGE-ITERATOR WITH ADJACENCY INTERSECTION rather than the wedge
materialize-then-close join. The wedge form shuffles Σ deg⁺² wedge ROWS
into a third join — on the sfp30 clone corpus that exchange was the one
remaining heavy-spill cell in the probe matrix (5.37 GB memory + 197 MB
disk). The intersection form builds each vertex's out-neighbor array once
(one groupBy — |E| total array elements), joins it back to the |E| edge
rows, and counts each edge's common out-neighbors with a per-row
``array_intersect``: triangles close INSIDE the row, so the wedge set is
never shuffled, and per-row memory is bounded by the degree-ordered
out-degree, O(sqrt |E|). Both strategies are orientation-invariant and
count each triangle exactly once (at its (lo, mid) edge), so the
id-ordered SQL oracle stays bit-exact; equality is pytest-pinned.

Measured at sfp30 (PROBE_TRI_SFP30_r13.json vs PROBE_LSH_SFP30_r12.json):
the q_dedup_triangles cell drops from 69.9 s / 5.37 GB memory spill to
seconds-scale with spill under the probe threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from video_data_pipeline_spark.checkpoint import checkpoint_frame


def count_triangles(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    degree_order: bool = True,
    method: str = "intersect",
    checkpoint: bool = False,
) -> DataFrame:
    """Count triangles in an undirected simple graph given as a DataFrame
    of distinct edges (``a`` != ``b``; either orientation, no duplicates in
    the canonical a<b sense). Returns a 1-row DataFrame ``(n_triangles)``.

    ``degree_order=True`` re-orients every edge from its (degree, id)-
    smaller endpoint to its larger one before pair generation — two extra
    vertex-keyed joins against the (|V|-row) degree table buy the
    O(|E|^1.5) work bound. ``False`` orients by id alone (no degree join;
    fine for sparse, skew-free graphs).

    ``method``: ``"intersect"`` (default — adjacency arrays + per-edge
    ``array_intersect``; the wedge set never shuffles) or ``"wedge"``
    (materialize wedges, close with a third join — kept as the
    cross-check twin; both counts are pinned equal in tests).

    ``checkpoint=True`` lazily ``localCheckpoint``s the oriented edge
    list: the orientation subtree (and everything beneath it — for
    q_dedup_triangles that is the whole LSH pair generation) computes
    once instead of once per consuming branch. Pass it whenever ``edges``
    is itself expensive."""
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
    if checkpoint:
        oriented = checkpoint_frame(oriented)

    if method == "wedge":
        e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        e2 = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
        # wedge u->v->w; close with the oriented edge (u,w) — each
        # triangle counted once
        e3 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
        wedges = e1.join(e2, "v")
        return wedges.join(e3, ["u", "w"]).agg(
            F.count(F.lit(1)).alias("n_triangles")
        )

    # intersect: each triangle {u<v<w} (in the chosen order) closes at its
    # (u, v) edge — w is a common OUT-neighbor of u and v. One groupBy
    # builds the out-adjacency arrays; two vertex-keyed joins attach them
    # to the edge rows; the close is per-row array math, no wedge shuffle.
    adj = oriented.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    tri = (
        oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        .join(adj.select(F.col("lo").alias("u"), F.col("nbrs").alias("nu")), "u")
        .join(adj.select(F.col("lo").alias("v"), F.col("nbrs").alias("nv")), "v")
        .select(F.size(F.array_intersect("nu", "nv")).alias("k"))
    )
    return tri.agg(
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("n_triangles")
    )
