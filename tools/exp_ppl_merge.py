"""r16 focused experiment: compute the CCNet tercile thresholds (t1, t2)
of q_perplexity_buckets as ONE conditional aggregation over the cumulative
histogram instead of two filter+groupBy branches joined on lang.

Why it might win: Catalyst does not CSE across DataFrame references, so
the two-branch form re-instantiates the whole docs -> unigram-LM subtree
under each branch (static plan: 177 nodes, 30 parquet scans, 76
Exchanges, 0 ReusedExchange). The merged form consumes `cum` exactly once
-- min(xent_centi | cum >= ceil(k*n/3)) for k = 1, 2 as two conditional
mins in one groupBy -- deleting a full copy of that subtree plus the
t1-join-t2 exchange. Equivalence: the last bin of every lang has
cum = n >= ceil(k*n/3), so both mins are non-null for every lang and the
old inner join never dropped a lang either.

Same-session ABBA interleave (the round's standard): variants alternate
noop-sink runs in one SparkSession, palindromic order per round pair.
Results asserted identical on the first round. The OLD (two-branch) shape
is rebuilt inline here; the registered query carries the candidate.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def build_merged(spark, sf_dir):
    from video_data_pipeline_spark.queries.curation2 import q_perplexity_buckets

    return q_perplexity_buckets(spark, sf_dir)


def build_two_branch(spark, sf_dir):
    """The pre-r16 shape: t1/t2 as separate filter+agg branches."""
    from video_data_pipeline_spark.queries.curation import unigram_scored
    from video_data_pipeline_spark.queries.curation2 import XENT_CENTI_SQL
    from video_data_pipeline_spark.queries.registry import table

    d = table(spark, sf_dir, "documents")
    docs = unigram_scored(spark, sf_dir).join(
        d.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", F.expr(XENT_CENTI_SQL).alias("xent_centi"))
    hist = docs.groupBy("lang", "xent_centi").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("xent_centi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "xent_centi",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    t1 = (
        cum.where(F.col("cum") >= F.expr("(n + 2) div 3"))
        .groupBy("lang")
        .agg(F.min("xent_centi").alias("t1"))
    )
    t2 = (
        cum.where(F.col("cum") >= F.expr("(2 * n + 2) div 3"))
        .groupBy("lang")
        .agg(F.min("xent_centi").alias("t2"))
    )
    thresholds = t1.join(t2, "lang")
    return docs.join(F.broadcast(thresholds), "lang").select(
        "doc_id",
        "lang",
        "xent_centi",
        F.when(F.col("xent_centi") <= F.col("t1"), F.lit("head"))
        .when(F.col("xent_centi") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "6"))
    spark = get_spark("exp_ppl_merge")

    def run(builder) -> float:
        t0 = time.time()
        df = builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    a = {tuple(r) for r in build_two_branch(spark, sf_dir).collect()}
    b = {tuple(r) for r in build_merged(spark, sf_dir).collect()}
    assert a == b, f"variant results differ: {len(a)} vs {len(b)} rows"
    print(f"identity OK ({len(a)} rows)", flush=True)

    times = {"two_branch": [], "merged": []}
    for i in range(rounds):
        order = (
            [("two_branch", build_two_branch), ("merged", build_merged)]
            if i % 2 == 0
            else [("merged", build_merged), ("two_branch", build_two_branch)]
        )
        for name, b_ in order:
            times[name].append(run(b_))
        print(
            f"round {i + 1}: two_branch={times['two_branch'][-1]:.2f}s "
            f"merged={times['merged'][-1]:.2f}s",
            flush=True,
        )
    res = {
        k: {"median": round(statistics.median(v), 3),
            "all": [round(x, 2) for x in v]}
        for k, v in times.items()
    }
    res["ratio_merged_over_two_branch"] = round(
        res["merged"]["median"] / res["two_branch"]["median"], 3
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
