"""Iterative k-means (Lloyd's) over an embedding column.

The iterative-algorithm shape (like operators/components.py): each round
is assign (broadcast centroids, per-row cosine argmax) → recompute means
(one shuffle on centroid id), with persist/unpersist bookkeeping and a
single final checkpoint. One round of this loop is exactly the
oracle-checked ``q_kmeans_step`` (queries/similarity.py) — the query
proves the round's math, this operator proves the loop.

Determinism: means are computed over 2^20-quantized integer sums (exact,
order-free) divided back in double, so a fit is bit-identical across
partitionings; init = the k lowest ``id_col`` vectors (deterministic).

Scale: centroids (k × dim doubles) always broadcast; the corpus shuffles
once per round keyed by centroid id (k-bounded, salting unnecessary —
the mean is an algebraic aggregate with map-side partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1048576  # 2^20 quantization for order-free exact mean sums


def _cos(a: str, b: str) -> str:
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    na = f"sqrt(aggregate(zip_with({a}, {a}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    nb = f"sqrt(aggregate(zip_with({b}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    return f"({dot} / ({na} * {nb}))"


def assign_step(df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, vec) × centroids(cid, cv) → (id, vec, cid): nearest by cosine,
    ties to the lowest cid.

    Argmax shape (r11 VERDICT #3): ``groupBy(id).agg(max_by(...))``, NOT a
    ``row_number()`` window over the broadcast-expanded frame — max_by is
    an algebraic aggregate with MAP-SIDE PARTIAL aggregation, and the
    broadcast join leaves each vector's k scored rows in one input
    partition, so the per-vector argmax completes map-side and any
    exchange moves ~corpus rows; the window shape exchanged and sorted
    centroids×corpus rows, which is the wrong plan at the k≈11k centroids
    a D4-scale run uses. Tie-break: ``max_by`` on the orderable struct
    (cos, -cid) — lexicographic, so equal cosines go to the LOWEST cid,
    matching the oracles' ``ROW_NUMBER(... ORDER BY cos DESC, cid)``."""
    best = F.max_by(
        F.struct(F.col(vec_col).alias("v"), F.col("cid").alias("cid")),
        F.struct(F.col("cos").alias("cos"), (-F.col("cid")).alias("nc")),
    )
    return (
        df.crossJoin(F.broadcast(centroids))
        .select(
            id_col, vec_col, "cid",
            F.expr(_cos(vec_col, "cv")).alias("cos"),
        )
        .groupBy(id_col)
        .agg(best.alias("b"))
        .select(id_col, F.col("b.v").alias(vec_col), F.col("b.cid").alias("cid"))
    )


def update_step(assigned: DataFrame, vec_col: str) -> DataFrame:
    """(.., vec, cid) → centroids (cid, cv): per-dimension quantized mean,
    re-assembled into an ordered array column."""
    exploded = assigned.select("cid", F.posexplode(vec_col).alias("dim", "val"))
    quant = F.floor(F.col("val").cast("double") * _Q + 0.5).cast("bigint")
    means = exploded.groupBy("cid", "dim").agg(
        (F.sum(quant).cast("double") / (F.count(F.lit(1)) * F.lit(float(_Q)))).alias(
            "m"
        )
    )
    return (
        means.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
        .select(
            "cid",
            F.expr("transform(pairs, p -> CAST(p.m AS FLOAT))").alias("cv"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
) -> DataFrame:
    """Fit k centroids; returns (cid, cv). Converges when no vector changes
    assignment; init = the k lowest ``id_col`` rows (deterministic)."""
    centroids = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .localCheckpoint(eager=True)
    )
    prev_assign: DataFrame | None = None
    for _ in range(max_iter):
        assigned = assign_step(df, centroids, vec_col, id_col).persist()
        if prev_assign is not None:
            changed = (
                assigned.alias("a")
                .join(prev_assign.alias("p"), id_col)
                .where(F.col("a.cid") != F.col("p.cid"))
                .count()
            )
            if changed == 0:
                assigned.unpersist()
                break
        new_centroids = update_step(assigned, vec_col).localCheckpoint(eager=True)
        if prev_assign is not None:
            prev_assign.unpersist()
        prev_assign = assigned
        centroids = new_centroids
    if prev_assign is not None:
        prev_assign.unpersist()
    return centroids
