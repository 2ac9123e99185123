"""Lineage truncation with a cluster-durability switch (r17, VERDICT r16
"what's wrong" #4).

The engine truncates multi-consumer subtrees with ``localCheckpoint``:
fast (executor-local blocks, no filesystem round trip) and correct on a
single machine, but the blocks are NOT replicated — on a real cluster,
losing one executor makes every consumer of the truncated lineage fail
unrecoverably instead of recomputing, and the r16 simjoin front-sharing
revert showed the related block-manager-pressure failure mode.

``checkpoint_frame`` keeps localCheckpoint as the default (bench plans
and timings unchanged) and routes through a RELIABLE ``checkpoint()``
into ``$SPARK_GRAFT_CHECKPOINT_DIR`` when a cluster profile sets it —
replicated, recomputable, at the cost of a write+read of the frame.

Scope: only the LAZY single-shot query-path checkpoints route through
here. The iterative operators (connected components, k-means, LPA,
k-core) keep eager ``localCheckpoint`` per round on purpose: each
round's frame is superseded within the same job and freed immediately
(``_free_checkpoint_blocks``); a reliable checkpoint would write every
round to the directory with no in-job reclamation, and an executor loss
mid-iteration restarts the round loop anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

ENV_VAR = "SPARK_GRAFT_CHECKPOINT_DIR"


def checkpoint_frame(df: DataFrame, eager: bool = False) -> DataFrame:
    """localCheckpoint by default; reliable checkpoint into
    ``$SPARK_GRAFT_CHECKPOINT_DIR`` when set. Same rows either way
    (pytest-pinned); the reliable path sets the context's checkpoint dir
    idempotently on first use."""
    ckpt_dir = os.environ.get(ENV_VAR)
    if not ckpt_dir:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(ckpt_dir)
    return df.checkpoint(eager=eager)
