"""Community structure over the near-dup representative graph.

``q_label_propagation`` — semi-synchronous Label Propagation (Raghavan et
al. 2007) over the MinHash-LSH near-dup pair graph of distinct-content
representatives. Connected components (operators/components.py,
q_dedup_clusters) answer "which docs are transitively similar at all";
LPA answers the finer question a curation pass actually needs on large
mixed clusters: which DENSELY-linked community inside a sprawling component
does each document belong to — LSH chains can bridge unrelated clusters
through a single collision edge, and LPA splits along such weak bridges
while CC cannot.

Determinism: classic LPA is tie-broken randomly per node per round; here
each node casts ONE self-vote alongside its neighbor votes (the standard
damping for synchronous LPA — without it an isolated edge label-swaps
forever), and each round's label is the lexicographic max over the votes
``(count, smaller-label-wins)``, packed into one BIGINT
``cnt · 2^33 + (2^33 − 1 − label)`` so the whole update is a plain MAX
aggregate — order-free, partial-aggregatable, and bit-identical in Spark
and DuckDB (labels are doc_ids < 2^33; counts < 2^21 at sf30; the pack
stays < 2^55). Rounds are FIXED (3, like q_pagerank) so the unrolled-CTE
oracle is exact rather than a fixpoint race.

Scale shape: per round, one node-keyed equi-join (labels ⋈ edges on the
uniform doc_id key) + one (node, label)-keyed partial-agg count + one
node-keyed MAX — the same topology as distributed PageRank; nothing is
ever windowed per component (hot components would serialize). The graph is
rep-collapsed first (queries/dedup.py rationale), so byte/case-identical
clones ride with their representative's community by construction. The
edge list is localCheckpointed once and the label frame once per round
(both lazy), exactly as operators/components.py does for the open-ended
CC loop — without them the multi-consumer references re-instantiate the
LSH subtree ~2^rounds times (r9 VERDICT #2); plan growth in ``rounds`` is
pinned linear by tests/test_lpa_checkpoint.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.dedup import (
    _DUCK_REPS,
    DEFAULT_LSH_MAX_BUCKET_SIZE,
    _duck_lsh_pairs_sql,
    exact_dup_representatives,
    lsh_pairs_from_bands,
    minhash_bands,
)
from video_data_pipeline_spark.checkpoint import checkpoint_frame
from video_data_pipeline_spark.queries.registry import query, table

_LPA_ROUNDS = 3
_PACK = 1 << 33  # > any doc_id through sf30; cnt·2^33 + 2^33 stays < 2^55


def _duck_lpa_sql() -> str:
    # sym is referenced by every propagation round: MATERIALIZED stops
    # DuckDB from re-inlining the whole LSH pipeline per round (the q_kcore
    # lesson — 164 s -> seconds at sf1)
    ctes = [
        f"WITH reps AS MATERIALIZED ({_DUCK_REPS})",
        f"lsh AS MATERIALIZED ({_duck_lsh_pairs_sql('reps')})",
        "sym AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM lsh"
        " UNION SELECT doc_b AS u, doc_a AS v FROM lsh)",
        "l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM sym)",
    ]
    for i in range(_LPA_ROUNDS):
        ctes.append(
            f"c{i} AS (SELECT node, lbl, COUNT(*) AS cnt FROM ("
            f"SELECT s.v AS node, l.lbl FROM sym s JOIN l{i} l ON l.node = s.u"
            f" UNION ALL SELECT node, lbl FROM l{i}"
            f") GROUP BY node, lbl)"
        )
        ctes.append(
            f"l{i + 1} AS (SELECT node, "
            f"{_PACK} - 1 - (MAX(cnt * {_PACK} + ({_PACK} - 1 - lbl)) % {_PACK})"
            f" AS lbl FROM c{i} GROUP BY node)"
        )
    return (
        ",\n".join(ctes)
        + f"\nSELECT node AS doc_id, lbl AS community FROM l{_LPA_ROUNDS}"
    )


def label_propagation_pairs(pairs, rounds: int = _LPA_ROUNDS):
    """LPA core over an undirected pair list ``(doc_a, doc_b)`` → one
    (node, lbl) row per endpoint after ``rounds`` synchronous updates.
    Deterministic mode tie-break via the packed-MAX trick (module
    docstring). Exposed separately so graph-shape tests can drive it on
    crafted edge lists without manufacturing a text corpus."""
    fwd = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    rev = pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    # sym is consumed by every round's neighbor join (plus the seed-label
    # scan) and labels by two consumers per round (neighbor join +
    # self-vote); Catalyst does not CSE across DataFrame references, so
    # without the checkpoints the final plan re-instantiates the upstream
    # (LSH) subtree ~2^rounds times — lazy localCheckpoint is the repo
    # pattern (operators/components.py does the same for the CC loop).
    # Plan growth is pinned linear by tests/test_lpa_checkpoint.py.
    sym = checkpoint_frame(fwd.union(rev).distinct())
    # the packed-MAX trick needs every label (= doc_id) < 2^33: a wider id
    # would alias under the % 2^33 unpack and SILENTLY corrupt communities,
    # so violation raises inside the seed expression (an assert column
    # would be pruned away; this one is the data).
    guarded = F.when(F.col("node") < _PACK, F.col("node")).otherwise(
        F.expr(
            "raise_error(concat('label_propagation_pairs: doc_id ', "
            f"CAST(node AS STRING), ' >= 2^33 would corrupt packed labels'))"
        ).cast("long")
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", guarded.alias("lbl")
    )
    for _ in range(rounds):
        labels = labels.localCheckpoint(eager=False)
        nb = sym.join(labels, sym["u"] == labels["node"]).select(
            F.col("v"), F.col("lbl")
        )
        self_vote = labels.select(F.col("node").alias("v"), "lbl")
        votes = (
            nb.unionAll(self_vote)
            .groupBy("v", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("v")
            .agg(
                F.max(
                    F.col("cnt") * _PACK + (F.lit(_PACK - 1) - F.col("lbl"))
                ).alias("packed")
            )
            .select(
                F.col("v").alias("node"),
                (F.lit(_PACK - 1) - F.col("packed") % _PACK).alias("lbl"),
            )
        )
    return labels


@query(
    "q_label_propagation",
    oracle=_duck_lpa_sql(),
    tags=("dedup", "graph", "iterative", "community"),
)
def q_label_propagation(spark, sf_dir):
    """Label-propagation communities over the rep-level near-dup graph:
    labels start as the node's own doc_id; for 3 synchronous rounds every
    node adopts the most frequent label among its neighbors, ties to the
    SMALLEST label (deterministic surrogate for classic LPA's random
    tie-break — see module docstring for the MAX-packing that keeps the
    update a plain aggregate). Output: (doc_id, community) for every node
    of the pair graph; community ids are the doc_ids of local consensus
    seeds, so survivors can be picked per community exactly as
    q_dedup_survivors does per component."""
    pairs = lsh_pairs_from_bands(
        minhash_bands(exact_dup_representatives(table(spark, sf_dir, "documents"))),
        max_bucket_size=DEFAULT_LSH_MAX_BUCKET_SIZE,
    )
    return label_propagation_pairs(pairs).select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("community")
    )
