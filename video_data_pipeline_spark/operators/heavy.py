"""Scalable exact heavy hitters: Misra-Gries candidates + exact recount.

The naive way to find items with frequency > phi*N is a full
``groupBy(item).count()`` — one shuffle whose width is the item
CARDINALITY, which at 100 TB (token streams, URL logs) can be billions of
distinct keys, almost all of which are irrelevant cold tail. The classic
two-phase alternative keeps the shuffle proportional to the number of
*candidates* instead:

1. **Candidate phase** (``mapInPandas``, no shuffle): each partition runs a
   Misra-Gries summary with ``k`` counters. MG's merge guarantee [Misra &
   Gries 1982; Agarwal et al., "Mergeable Summaries", PODS'12] is that any
   item with global frequency > N/(k+1) appears in at least one partition's
   summary output, because per-partition undercount is at most
   n_p/(k+1) and the bounds are additive under merging. Choosing
   ``k >= ceil(1/phi)`` therefore makes the union of per-partition outputs
   a SUPERSET of the true heavy hitters. Output size is at most
   ``k * num_partitions`` rows — tiny, independent of cardinality.
2. **Recount phase** (one narrow shuffle): the candidate set (deduplicated,
   broadcast) filters the stream; only candidate rows are counted exactly,
   and the exact counts are filtered against the exact total ``N``
   (computed as a broadcast scalar, not a driver action).

The result is EXACT — MG's approximation error only ever enlarges the
candidate set; the recount removes false positives and the superset
guarantee means there are no false negatives.

Reference parity: the reference's pipelines count token/key frequencies by
full materialized dicts on one node (e.g. the index stage's per-shard count
maps, /root/reference/index/index_tar.py); this operator is the
distributed-exact form of the same question.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries(values: Iterator, k: int) -> dict:
    """Classic k-counter Misra-Gries summary of an iterable (pure Python,
    unit-testable without Spark). Guarantees: every item with frequency
    > n/(k+1) is present, and present counts undercount true frequency by
    at most n/(k+1)."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            # decrement-all step; drop zeros
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(
    items: DataFrame,
    col: str = "item",
    phi: float = 0.01,
    k: int | None = None,
) -> DataFrame:
    """Items occurring in more than ``phi`` fraction of ``items`` rows, with
    their EXACT counts: columns ``(item, cnt)``.

    ``k`` (Misra-Gries counters per partition) defaults to ``ceil(2/phi)``
    — the guarantee only needs ``1/phi``; the factor 2 halves the
    undercount so the candidate set stays close to the true answer and the
    recount join stays small.
    """
    if k is None:
        k = math.ceil(2.0 / phi)
    if k < math.ceil(1.0 / phi):
        raise ValueError(f"k={k} breaks the superset guarantee for phi={phi}")

    # nulls are excluded up front: None IS a countable dict key in the MG
    # candidate phase, but the exact-recount equi-join drops null keys —
    # without this filter a null-valued heavy hitter would be silently
    # lost between the two phases instead of consistently excluded
    src = items.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )

    out_schema = T.StructType([T.StructField("item", T.StringType())])

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one MG summary across ALL batches of the partition (a per-batch
        # summary would weaken the error bound to per-batch n)
        counters = misra_gries(
            (v for pdf in batches for v in pdf["item"].tolist()), k
        )
        yield pd.DataFrame({"item": sorted(counters)})

    candidates = src.mapInPandas(_mg, schema=out_schema).distinct()
    total = src.agg(F.count(F.lit(1)).alias("total"))
    return (
        src.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt").cast("double") > F.col("total").cast("double") * phi)
        .select("item", "cnt")
    )


def heavy_hitters_by_group(
    items: DataFrame,
    group_col: str,
    col: str = "item",
    phi: float = 0.01,
    k: int | None = None,
) -> DataFrame:
    """Per-GROUP exact heavy hitters: items exceeding ``phi`` of their own
    group's row count, with exact counts — ``(group, item, cnt, group_n)``.

    Same two-phase scheme as :func:`heavy_hitters`, but the candidate
    phase keeps one Misra-Gries summary PER (partition, group): the MG
    bound applies per group (undercount ≤ n_pg/(k+1), additive over
    partitions), so with ``k >= 1/phi`` the union is a superset of every
    group's heavy hitters. No shuffle is needed to form candidates — the
    stream is NOT re-partitioned by group, which is the point: a skewed
    group column (one giant language, say) would make a groupBy-first
    approach a straggler. Candidate memory is O(groups_per_partition * k);
    suitable for dimension-cardinality groups (languages, event types),
    not for per-user groups — those want the plain groupBy, which is
    already keyed fine.

    Recount joins broadcast candidates on (group, item) and compares
    against per-group exact totals (an aggregate join, not a driver
    action)."""
    if k is None:
        k = math.ceil(2.0 / phi)
    if k < math.ceil(1.0 / phi):
        raise ValueError(f"k={k} breaks the superset guarantee for phi={phi}")

    # null items/groups excluded up front for the same reason as in
    # heavy_hitters: they'd survive the MG phase but silently vanish in
    # the recount equi-join (and None breaks the candidate rows.sort())
    src = items.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(col).cast("string").alias("item"),
    ).where(F.col("grp").isNotNull() & F.col("item").isNotNull())
    out_schema = T.StructType(
        [T.StructField("grp", T.StringType()), T.StructField("item", T.StringType())]
    )

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict[str, dict] = {}
        for pdf in batches:
            for g, v in zip(pdf["grp"].tolist(), pdf["item"].tolist()):
                counters = summaries.get(g)
                if counters is None:
                    counters = summaries[g] = {}
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for key_ in counters:
                        counters[key_] -= 1
                        if counters[key_] == 0:
                            dead.append(key_)
                    for key_ in dead:
                        del counters[key_]
        rows = [(g, it) for g, counters in summaries.items() for it in counters]
        rows.sort()
        yield pd.DataFrame(rows, columns=["grp", "item"])

    candidates = src.mapInPandas(_mg, schema=out_schema).distinct()
    group_n = src.groupBy("grp").agg(F.count(F.lit(1)).alias("group_n"))
    return (
        src.join(F.broadcast(candidates), ["grp", "item"])
        .groupBy("grp", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(group_n), "grp")
        .where(F.col("cnt").cast("double") > F.col("group_n").cast("double") * phi)
        .select(
            F.col("grp").alias(group_col), F.col("item").alias(col), "cnt", "group_n"
        )
    )
