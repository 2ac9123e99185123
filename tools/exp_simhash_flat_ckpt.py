"""r16 focused experiment: lazy-localCheckpoint the exploded bucket-member
frame of simhash_near_pairs_capped before its self-join.

Why it might win (guide §1.2 "fewer passes"): the cap-telemetry observe
node (CollectMetrics) defeats exchange canonicalization, so the self-join
instantiates the scan → rep-collapse → signature-md5 → bucket subtree on
BOTH sides (the before-plan shows 2 parquet scans and the signature fold
— the repo's heaviest per-doc expression — twice, one side under a
BroadcastExchange). Checkpointing `flat` (4 fixed-width columns over
reps — tiny) makes both sides read one materialization, the same
discipline the pagerank / simhash-calibration fronts adopted this round.

OLD arm = an inline replica of the pre-change simhash_near_pairs_capped
tail (no checkpoint, auto-attached cap observation, default cap); NEW arm
= the package function. Same-session ABBA interleave, palindromic order,
identical rows asserted before timing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_old(spark, sf_dir):
    from video_data_pipeline_spark.queries import dedup as dd
    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.telemetry import cap_observation_name

    docs = table(spark, sf_dir, "documents")
    cap = dd.DEFAULT_SIMHASH_MAX_BUCKET_SIZE
    signatures = dd.simhash_signatures(dd.exact_dup_representatives(docs))
    chunks = dd.chunk_keys(signatures)
    buckets = (
        chunks.groupBy("c", "chunk")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias(
                "members"
            )
        )
        .where(F.size("members") > 1)
    )
    observation = cap_observation_name("simhash_chunks")
    buckets = buckets.observe(
        observation,
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.size("members") > cap).cast("long")).alias("oversized_buckets"),
        F.max(F.size("members")).alias("max_bucket_size_seen"),
        F.expr("sum(size(members) * (size(members) - 1) div 2)").alias(
            "uncapped_candidate_pairs"
        ),
        F.expr(
            f"sum(least(size(members), {cap}) * (least(size(members), {cap}) - 1) div 2)"
        ).alias("capped_candidate_pairs"),
    )
    buckets = buckets.select(
        "c", "chunk", F.slice("members", 1, cap).alias("members")
    )
    flat = buckets.select(
        "c", "chunk", F.explode("members").alias("m")
    ).select(
        "c",
        "chunk",
        F.col("m.doc_id").alias("doc_id"),
        F.col("m.simhash").alias("simhash"),
    )
    a, b = flat.alias("a"), flat.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .distinct()
    )


def build_new(spark, sf_dir):
    from video_data_pipeline_spark.queries.dedup import q_simhash_near_pairs

    return q_simhash_near_pairs(spark, sf_dir)


def build_new_calibrated(spark, sf_dir):
    from video_data_pipeline_spark.queries.dedup import (
        q_simhash_near_pairs_calibrated,
    )

    return q_simhash_near_pairs_calibrated(spark, sf_dir)


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "6"))
    spark = get_spark("exp_simhash_flat_ckpt")

    a = sorted(tuple(r) for r in build_old(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in build_new(spark, sf_dir).collect())
    assert a == b, f"variant results differ: {len(a)} vs {len(b)} rows"
    print(f"identity OK ({len(a)} rows)", flush=True)

    def run(builder) -> float:
        t0 = time.time()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out = {}
    for name, old_b, new_b in [
        ("near_pairs", build_old, build_new),
        ("near_pairs_calibrated", build_old, build_new_calibrated),
    ]:
        times = {"old": [], "new": []}
        for i in range(rounds):
            order = (
                [("old", old_b), ("new", new_b)]
                if i % 2 == 0
                else [("new", new_b), ("old", old_b)]
            )
            for arm, b_ in order:
                times[arm].append(run(b_))
            print(
                f"{name} round {i + 1}: old={times['old'][-1]:.2f}s "
                f"new={times['new'][-1]:.2f}s",
                flush=True,
            )
        out[name] = {
            arm: {
                "median": round(statistics.median(v), 3),
                "all": [round(x, 2) for x in v],
            }
            for arm, v in times.items()
        }
        out[name]["ratio_new_over_old"] = round(
            out[name]["new"]["median"] / out[name]["old"]["median"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
