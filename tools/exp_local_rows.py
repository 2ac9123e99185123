"""r16 opt experiment: literal probe frame via Python-RDD createDataFrame
vs the pure-JVM inline_rows plan (localframe.py), measured on the full
q_countmin_freq body in one session with ABBA ordering.

Motivation (guide §4): the createDataFrame form's exchange ran as a
32-task stage blocked on Python worker forks — 52 s summed
executorRunTime against 0.7 s executorCpuTime on an 8-row frame.

Usage: python tools/exp_local_rows.py   [ROUNDS=6] [SPARK_GRAFT_SF_DIR=...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _build(spark, sf_dir, py_rdd_probes: bool):
    from video_data_pipeline_spark.localframe import inline_rows
    from video_data_pipeline_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )
    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.queries.sketch import (
        _CM_DEPTH,
        _CM_PROBES,
        _CM_WIDTH,
        _SPARK_TOKENS,
    )

    d = table(spark, sf_dir, "documents")
    tokens = d.select(F.expr(_SPARK_TOKENS).alias("k"))
    grid = countmin_build(tokens, "k", _CM_DEPTH, _CM_WIDTH)
    if py_rdd_probes:
        probes = spark.createDataFrame([(w,) for w in _CM_PROBES], ["k"])
    else:
        probes = inline_rows(spark, ["k"], [(w,) for w in _CM_PROBES])
    est = countmin_estimate(grid, probes, "k", _CM_DEPTH, _CM_WIDTH)
    truth = (
        tokens.where(F.col("k").isin(*_CM_PROBES))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    return (
        est.join(F.broadcast(truth), "k", "left")
        .select(
            F.col("k").alias("word"),
            "est_cnt",
            F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
        )
    )


VARIANTS = {"py_rdd": True, "inline": False}


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "6"))
    spark = get_spark("exp_local_rows")

    base = {tuple(r) for r in _build(spark, sf_dir, True).collect()}
    got = {tuple(r) for r in _build(spark, sf_dir, False).collect()}
    assert got == base, f"variants differ: {len(got)} vs {len(base)}"
    print(f"identity OK ({len(base)} rows)", flush=True)

    times = {k: [] for k in VARIANTS}
    order_fwd = list(VARIANTS.items())
    for i in range(rounds):
        order = order_fwd if i % 2 == 0 else order_fwd[::-1]
        for name, flag in order:
            t0 = time.time()
            _build(spark, sf_dir, flag).write.format("noop").mode(
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
