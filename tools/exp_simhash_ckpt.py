"""r16 focused experiment: q_simhash_calibration's front computes the
simhash signature (the heaviest per-doc lambda in the repo) on both sides
of the chunk-key self-join, and the CollectMetrics observe node defeats
exchange canonicalization (the q_pagerank finding). Variants:

  current    — the registered query's exact shape
  ckpt_sig   — lazy localCheckpoint on the (doc_id, simhash) frame
  ckpt_pairs — lazy localCheckpoint on the candidate-pair frame
  ckpt_reps  — lazy localCheckpoint on the rep table (feeds sig AND sets)

Same-session ABBA over the variants; identical rows asserted first.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _build(spark, sf_dir, ckpt_sig=False, ckpt_pairs=False, ckpt_reps=False):
    from video_data_pipeline_spark.queries.audit import _calibration_from_pairs
    from video_data_pipeline_spark.queries.dedup import (
        DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
        exact_dup_representatives,
        simhash_near_pairs_capped,
        simhash_signatures,
    )
    from video_data_pipeline_spark.queries.registry import table

    docs = table(spark, sf_dir, "documents")
    reps = exact_dup_representatives(docs)
    if ckpt_reps:
        reps = reps.localCheckpoint(eager=False)
    sig = simhash_signatures(reps)
    if ckpt_sig:
        sig = sig.localCheckpoint(eager=False)
    pairs = simhash_near_pairs_capped(
        docs,
        max_bucket_size=DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
        signatures=sig,
    )
    if ckpt_pairs:
        pairs = pairs.localCheckpoint(eager=False)
    return _calibration_from_pairs(spark, sf_dir, pairs)


VARIANTS = {
    "current": {},
    "ckpt_sig": {"ckpt_sig": True},
    "ckpt_pairs": {"ckpt_pairs": True},
    "ckpt_reps": {"ckpt_reps": True},
}


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "4"))
    spark = get_spark("exp_simhash_ckpt")

    from video_data_pipeline_spark.queries.audit import q_simhash_calibration

    base = {tuple(r) for r in q_simhash_calibration(spark, sf_dir).collect()}
    for name, kw in VARIANTS.items():
        got = {tuple(r) for r in _build(spark, sf_dir, **kw).collect()}
        assert got == base, f"{name} differs: {len(got)} vs {len(base)}"
    print(f"identity OK ({len(base)} rows, all variants)", flush=True)

    times = {k: [] for k in VARIANTS}
    order_fwd = list(VARIANTS.items())
    for i in range(rounds):
        order = order_fwd if i % 2 == 0 else order_fwd[::-1]
        for name, kw in order:
            t0 = time.time()
            _build(spark, sf_dir, **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(time.time() - t0)
        print(
            "round %d: " % (i + 1)
            + " ".join(f"{k}={times[k][-1]:.2f}s" for k in VARIANTS),
            flush=True,
        )
    res = {
        k: {"median": round(statistics.median(v), 3),
            "all": [round(x, 2) for x in v]}
        for k, v in times.items()
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
