"""r17 focused experiment (VERDICT r16 #4): q_hard_negatives used to rank
EVERY corpus row per anchor and checkpoint the full 8xN frame; the r17
shape prunes both windows with top-k filters (map-side WindowGroupLimit)
and checkpoints only the 32-row top-4 frame, at the cost of streaming the
cosine projection twice.

  old — the exact r16 composition (full ranked frame checkpointed)
  new — the registered r17 query

Same-session ABBA; identical rows asserted first.
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
    from pyspark.sql import Window

    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.queries.similarity import (
        _HN_MARGIN,
        _HN_NEG,
        _HN_POS,
        _HN_QUERIES,
        _cosine,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        "label",
        F.expr(_cosine("spark", "embedding", "qv")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    ranked = scored.withColumn("rnk", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    thresholds = ranked.where(F.col("rnk") == _HN_POS).select(
        "q_id", F.col("cosine").alias("t")
    )
    positives = ranked.where(F.col("rnk") <= _HN_POS).select(
        "q_id", "vec_id", "label", "cosine",
        F.lit("pos").alias("role"),
        F.col("rnk").cast("bigint").alias("rank"),
    )
    band = (
        ranked.where(F.col("rnk") > _HN_POS)
        .join(F.broadcast(thresholds), "q_id")
        .where(F.col("cosine") >= F.col("t") - F.expr(_HN_MARGIN))
        .withColumn(
            "nrk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
            ),
        )
        .where(F.col("nrk") <= _HN_NEG)
        .select(
            "q_id", "vec_id", "label", "cosine",
            F.lit("neg").alias("role"),
            F.col("nrk").cast("bigint").alias("rank"),
        )
    )
    return positives.unionAll(band)


def _new(spark, sf_dir):
    from video_data_pipeline_spark.queries.similarity import q_hard_negatives

    return q_hard_negatives(spark, sf_dir)


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "4"))
    spark = get_spark("exp_hard_negatives")

    base = {tuple(r) for r in _old(spark, sf_dir).collect()}
    got = {tuple(r) for r in _new(spark, sf_dir).collect()}
    assert got == base, f"differs: {len(got)} vs {len(base)}"
    print(f"identity OK ({len(base)} rows)", flush=True)

    variants = {"old": _old, "new": _new}
    times = {k: [] for k in variants}
    order_fwd = list(variants.items())
    for i in range(rounds):
        order = order_fwd if i % 2 == 0 else order_fwd[::-1]
        for name, fn in order:
            t0 = time.time()  # before construction: checkpoints count
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
