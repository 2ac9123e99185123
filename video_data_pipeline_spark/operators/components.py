"""Connected components over a pair list (dedup cluster formation).

After near-dup candidate generation (MinHash-LSH / SimHash), duplicates
form *clusters* via transitivity: A~B, B~C ⇒ {A,B,C} dedup together with
one survivor. That closure is an iterative algorithm — the one shape in
this engine that loops over actions (like PageRank/label propagation).

Implementation: min-label propagation with pointer doubling. Each node
starts labeled with itself; every round each node takes the min label
among (a) itself, (b) its neighbors' labels, and (c) the label of the
node its own label points at (the path-shortcut / pointer-jumping step
from Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14). The shortcut typically collapses convergence to a handful of
rounds on the dense cliquish graphs near-dup pairs form — but it is NOT
a worst-case O(log diameter) guarantee (see the corrected bound on
:func:`connected_components`; :func:`connected_components_alternating`
is the topology-robust engine).
Each round is two joins + one groupBy; the round result is truncated
with ``localCheckpoint(eager=True)`` (``persist`` alone keeps the full
logical plan, which embeds ~3 copies of the previous round's plan and
grows ~3^rounds — the driver would OOM compiling round ~6's query).
Superseded rounds' checkpoint blocks are unpersisted explicitly the
moment the next round materializes, so executor storage stays at one
round's footprint instead of waiting on driver GC + ContextCleaner.

At 100 TB scale the edge list (near-dup pairs) is tiny relative to the
corpus, so rounds are cheap; the log-round bound keeps the driver loop
short even on degenerate chain-of-near-dups graphs. As labels converge,
most nodes' candidate label equals the component minimum, so the hop
join concentrates on one key per large component; AQE's skew-join
splitting (enabled in our session defaults) absorbs that hot partition.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _free_checkpoint_blocks(df: DataFrame) -> None:
    """Immediately release a *superseded* localCheckpoint's storage blocks.

    ``DataFrame.unpersist()`` only touches CacheManager entries, not the
    RDD a localCheckpoint persisted; those blocks are otherwise freed only
    when the driver GCs the DataFrame and the ContextCleaner drains its
    queue. Over many rounds on a large cluster that lag pins executor
    storage needlessly, so reach the LogicalRDD's underlying RDD and
    unpersist it now. Best-effort: any internals drift degrades silently
    to the GC path.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    strict: bool = False,
) -> DataFrame:
    """Edges (undirected, any orientation) → (node, component) where
    component = min node id reachable. Node set = all endpoint ids.

    Round bound (corrected in r7 — the parity suite against the
    alternating engine caught the old claim): the label-of-label jump
    doubles coverage only when the currently-known min node's OWN
    knowledge extends away from the querying node — true on id-sorted
    paths and on the dense cliquish graphs near-dup pairs form, where
    convergence is a handful of rounds, but on tree-shaped components
    with adversarial id placement the jump adds nothing and propagation
    is O(diameter): a random 200-node / 150-edge graph (largest
    component 111 nodes, tree-like) needs 21 rounds, NOT log₂. Hence
    max_iter=50 (was 20), and for topology-robust O(log²) behavior use
    :func:`connected_components_alternating`. If the loop exhausts:
    ``strict=True`` raises ``RuntimeError``; otherwise a
    ``RuntimeWarning`` is emitted and the labels are a valid partial
    propagation but NOT the true components.
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
        cand = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("cand"),
        )
        # pointer doubling: follow the candidate label one hop through the
        # current labeling (label[label[node]]) and keep the smaller — this
        # is what turns O(diameter) propagation into O(log diameter)
        hop = labels.select(
            F.col("node").alias("cnode"), F.col("component").alias("ccomp")
        )
        # eager localCheckpoint truncates lineage each round — persist()
        # alone would leave a logical plan that grows ~3^rounds and OOMs
        # the driver at plan-compilation time after ~5-6 rounds
        updated = (
            cand.join(hop, cand.cand == hop.cnode, "left")
            .select(
                "node",
                F.least(
                    F.col("cand"), F.coalesce(F.col("ccomp"), F.col("cand"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels.unpersist()
        _free_checkpoint_blocks(labels)  # no-op for the round-0 cached labels
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components: no convergence after {max_iter} rounds; "
            "labels are a partial propagation (graph diameter exceeds "
            f"~2**{max_iter})"
        )
        if strict:
            sym.unpersist()
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    sym.unpersist()
    # labels is already an eager localCheckpoint (or, with max_iter=0, the
    # trivial node->node labeling), so the caller never recomputes the chain
    return labels


def _star_phase(e: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round (Kiveris et al., SoCC'14 §3).

    ``e`` holds each undirected edge once as (u, v) with u < v. Per node n,
    m(n) = min(N(n) ∪ {n}). Large-star links every neighbor LARGER than n
    to m(n); small-star links every neighbor smaller-or-equal (and n
    itself) to m(n). Both emit (parent=m, child) with m < child, so the
    canonical u<v orientation is preserved by construction."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("nm"))
    m = m.select("u", F.least("u", "nm").alias("m"))
    j = sym.join(m, "u")
    if large:
        out = j.where(F.col("v") > F.col("u")).select(
            F.col("m").alias("u"), F.col("v").alias("v")
        )
    else:
        out = j.where(F.col("v") < F.col("u")).select(
            F.col("m").alias("u"), F.col("v").alias("v")
        ).unionByName(m.select(F.col("m").alias("u"), F.col("u").alias("v")))
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components_alternating(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    strict: bool = False,
) -> DataFrame:
    """Connected components via the ALTERNATING large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — same contract as :func:`connected_components`:
    (node, component) with component = min reachable id.

    Why a second engine: pointer doubling keeps a corpus-sized LABEL table
    and joins it against the edge list twice per round; the alternating
    algorithm carries only the EDGE list, which monotonically bends toward
    star shape (every intermediate edge set spans the same components,
    total edge count never grows beyond the symmetric closure), so its
    per-round shuffle shrinks as it converges. On graphs whose edge count
    is far below the node count's worth of label rows — exactly the
    near-dup pair lists this engine feeds it — each round moves less data.
    Convergence is O(log² n) rounds worst-case, a handful in practice;
    each phase is one groupBy + one self-join on the uniform node-id key.
    Rounds are truncated with eager ``localCheckpoint`` exactly like the
    pointer-doubling loop (same 3^rounds plan-growth hazard).

    Termination: a round that changes nothing means every edge is already
    (component-min, member) — the star forest IS the answer. Nodes missing
    from the final edge list (isolated after self-loop removal) label
    themselves."""
    orig_nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        nxt = _star_phase(_star_phase(e, large=True), large=False).localCheckpoint(
            eager=True
        )
        same_count = nxt.count() == e.count()
        unchanged = same_count and nxt.exceptAll(e).isEmpty()
        _free_checkpoint_blocks(e)
        e = nxt
        if unchanged:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components_alternating: no convergence after "
            f"{max_iter} rounds; labels are a partial contraction"
        )
        if strict:
            orig_nodes.unpersist()
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    labels = (
        orig_nodes.join(
            e.select(F.col("v").alias("node"), F.col("u").alias("component")),
            "node",
            "left",
        )
        .select("node", F.coalesce("component", "node").alias("component"))
        .localCheckpoint(eager=True)
    )
    orig_nodes.unpersist()
    _free_checkpoint_blocks(e)
    return labels
