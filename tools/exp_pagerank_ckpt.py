"""r16 focused experiment: does a lazy localCheckpoint on the pagerank
graph (sym/deg, the LPA pattern) beat the current 3-iteration unrolled
plan whose static form re-instantiates the LSH subtree 28x (AQE reuses
some exchanges at runtime, so the answer is not obvious — measure)?

Same-session ABBA interleave: variant A (unrolled, as registered) and
variant B (checkpointed) alternate noop-sink runs in one SparkSession.
Results must be identical rows (asserted on the first round).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_unrolled(spark, sf_dir):
    from video_data_pipeline_spark.queries.dedup import q_pagerank

    return q_pagerank(spark, sf_dir)


def build_ckpt(spark, sf_dir):
    from video_data_pipeline_spark.queries.dedup import (
        _PR_DAMP_DEN,
        _PR_DAMP_NUM,
        _PR_ITERS,
        _PR_ONE,
        _PR_TELEPORT,
        q_minhash_lsh_pairs,
    )

    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    fwd = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    rev = pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    sym = fwd.union(rev).distinct().localCheckpoint(eager=False)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    ranks = deg.select(
        F.col("u").alias("node"), F.lit(_PR_ONE).cast("bigint").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            sym.join(ranks, sym["u"] == ranks["node"])
            .join(deg, "u")
            .select(
                "v",
                F.expr(
                    f"(r * {_PR_DAMP_NUM}) div (deg * {_PR_DAMP_DEN})"
                ).alias("c"),
            )
        )
        ranks = contrib.groupBy("v").agg(
            (F.lit(_PR_TELEPORT) + F.sum("c")).cast("bigint").alias("r")
        ).select(F.col("v").alias("node"), "r")
    return ranks.select(F.col("node").alias("doc_id"), F.col("r").alias("rank_micro"))


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "6"))
    spark = get_spark("exp_pagerank_ckpt")

    def run(builder) -> float:
        t0 = time.time()
        df = builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # identity check once
    a = {tuple(r) for r in build_unrolled(spark, sf_dir).collect()}
    b = {tuple(r) for r in build_ckpt(spark, sf_dir).collect()}
    assert a == b, f"variant results differ: {len(a)} vs {len(b)} rows"
    print(f"identity OK ({len(a)} rows)", flush=True)

    times = {"unrolled": [], "ckpt": []}
    for i in range(rounds):
        order = (
            [("unrolled", build_unrolled), ("ckpt", build_ckpt)]
            if i % 2 == 0
            else [("ckpt", build_ckpt), ("unrolled", build_unrolled)]
        )
        for name, b_ in order:
            times[name].append(run(b_))
        print(
            f"round {i + 1}: unrolled={times['unrolled'][-1]:.2f}s "
            f"ckpt={times['ckpt'][-1]:.2f}s",
            flush=True,
        )
    res = {
        k: {"median": round(statistics.median(v), 3),
            "all": [round(x, 2) for x in v]}
        for k, v in times.items()
    }
    res["ratio_ckpt_over_unrolled"] = round(
        res["ckpt"]["median"] / res["unrolled"]["median"], 3
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
