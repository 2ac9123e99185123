"""r17 focused experiment (VERDICT r16 #6): the calibrated prefix join's
pre-flight measurement and its pair join each instantiated the rarity
subtree (token explode -> global df groupBy -> join -> per-doc window)
over the shared set checkpoint. The r17 shape checkpoints the flat
(doc_id, n, h) prefix frame and feeds BOTH from it. (The r16 attempt
shared the grouped-bucket ARRAY frame and was reverted on block-manager
eviction; flat rows don't have that failure shape.)

  old — the exact r16 composition (fresh rarity subtree per consumer)
  new — the registered r17 q_prefix_filter_join_calibrated

The in-process plan-decision cache is cleared before every construction
so both variants really pay their measurement. Identical rows asserted.

OUTCOME: REJECTED (r17). The shared form won at sf0.1 (0.82x) but at the
sfp10 cap-binding scale two same-epoch interleaved pairs measured it
deterministically ~2x the task time (10.3-10.7k core-seconds vs
5.0-8.1k core-seconds) and 1.3-2.1x the wall, with LESS shuffle written
and identical spill — real extra compute in the uncapped staged join
downstream of the checkpoint scan. The registered query keeps the
unshared form; PROBE_PREFIX_SHARE_SFP10_r17.json records all four cells.
This tool is retained as the reproduction harness (its "new" variant now
reconstructs the rejected composition inline).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _old(spark, sf_dir):
    from video_data_pipeline_spark.calibrate import (
        STAGED_CANDIDATE_BYTES,
        front_plan_from_stats,
        measure_front,
        resolve_byte_budget,
    )
    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.queries.simjoin import (
        DEFAULT_MAX_BUCKET_SIZE,
        hashed_shingle_sets,
        prefix_filter_pairs,
        rarity_prefix_rows,
    )

    docs = table(spark, sf_dir, "documents")
    sets = hashed_shingle_sets(docs)
    front = rarity_prefix_rows(sets).select(F.col("h").alias("key"))
    stats = measure_front(front, DEFAULT_MAX_BUCKET_SIZE, "prefix_buckets")
    bb = resolve_byte_budget(spark)
    plan = front_plan_from_stats(
        stats,
        bytes_per_candidate=STAGED_CANDIDATE_BYTES,
        byte_budget=bb.total,
        budget_note=bb.provenance,
    )
    return prefix_filter_pairs(
        docs, max_bucket_size=plan.max_bucket_size, sets=sets
    )


def _new(spark, sf_dir):
    # the REJECTED shared-prefix composition, reconstructed inline (the
    # registered query reverted to the unshared form — see OUTCOME above)
    from video_data_pipeline_spark.calibrate import (
        STAGED_CANDIDATE_BYTES,
        front_plan_from_stats,
        measure_front,
        resolve_byte_budget,
    )
    from video_data_pipeline_spark.checkpoint import checkpoint_frame
    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.queries.simjoin import (
        DEFAULT_MAX_BUCKET_SIZE,
        hashed_shingle_sets,
        prefix_filter_pairs,
        rarity_prefix_rows,
    )

    docs = table(spark, sf_dir, "documents")
    sets = hashed_shingle_sets(docs)
    prefix = checkpoint_frame(rarity_prefix_rows(sets))
    front = prefix.select(F.col("h").alias("key"))
    stats = measure_front(front, DEFAULT_MAX_BUCKET_SIZE, "prefix_buckets")
    bb = resolve_byte_budget(spark)
    plan = front_plan_from_stats(
        stats,
        bytes_per_candidate=STAGED_CANDIDATE_BYTES,
        byte_budget=bb.total,
        budget_note=bb.provenance,
    )
    return prefix_filter_pairs(
        docs, max_bucket_size=plan.max_bucket_size, sets=sets, prefix=prefix
    )


def main() -> None:
    from video_data_pipeline_spark.calibrate import clear_plan_cache
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "4"))
    spark = get_spark("exp_prefix_cal_share")

    clear_plan_cache()
    base = {tuple(r) for r in _old(spark, sf_dir).collect()}
    clear_plan_cache()
    got = {tuple(r) for r in _new(spark, sf_dir).collect()}
    assert got == base, f"differs: {len(got)} vs {len(base)}"
    print(f"identity OK ({len(base)} rows)", flush=True)

    variants = {"old": _old, "new": _new}
    times = {k: [] for k in variants}
    order_fwd = list(variants.items())
    for i in range(rounds):
        order = order_fwd if i % 2 == 0 else order_fwd[::-1]
        for name, fn in order:
            clear_plan_cache()  # both variants pay their measurement
            t0 = time.time()  # before construction: pre-flight + ckpts count
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
        print(
            "round %d: " % (i + 1)
            + " ".join(f"{k}={times[k][-1]:.2f}s" for k in variants),
            flush=True,
        )
    res = {
        k: {"median": round(statistics.median(v), 3),
            "all": [round(x, 2) for x in v]}
        for k, v in times.items()
    }
    res["ratio"] = round(res["new"]["median"] / res["old"]["median"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
