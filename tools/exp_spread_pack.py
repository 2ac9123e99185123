"""r17 focused experiment (VERDICT r16 #5): q_chunk_fixed does two full
passes over the single-row-group lineitem scan (the global-index
pre-action and the main pass), each with a ~32-term range-bucket
predicate per row — serialized onto ONE core by row-group-granular scan
parallelism. q_pack_merge folds documents (5k rows) per source. Measure
``spread()`` (round-robin repartition after the read, a no-op at
production scan widths) on both; keep only on a win.

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


def _chunk(spark, sf_dir, use_spread):
    from video_data_pipeline_spark.operators.batching import batched
    from video_data_pipeline_spark.queries.registry import spread, table

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    if use_spread:
        li = spread(li)
    return (
        li.transform(batched(["l_orderkey", "l_linenumber"], n=500, batch_col="chunk_id"))
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("first_key"),
            F.max("l_orderkey").alias("last_key"),
        )
    )


def _pack(spark, sf_dir, use_spread):
    from video_data_pipeline_spark.operators.packing import greedy_bin_pack
    from video_data_pipeline_spark.queries.packing import _BUDGET
    from video_data_pipeline_spark.queries.registry import spread, table

    d = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    if use_spread:
        d = spread(d)
    packed = d.transform(
        greedy_bin_pack(
            group_cols=["source"], order_col="doc_id", size_col="n_chars",
            budget=_BUDGET,
        )
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("packed_chars"),
        F.min("doc_id").alias("first_doc"),
    )


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "4"))
    spark = get_spark("exp_spread_pack")

    for fn in (_chunk, _pack):
        a = {tuple(r) for r in fn(spark, sf_dir, False).collect()}
        b = {tuple(r) for r in fn(spark, sf_dir, True).collect()}
        assert a == b, f"{fn.__name__} differs: {len(a)} vs {len(b)}"
    print("identity OK (both queries)", flush=True)

    variants = {
        "chunk_old": lambda s, d: _chunk(s, d, False),
        "chunk_spread": lambda s, d: _chunk(s, d, True),
        "pack_old": lambda s, d: _pack(s, d, False),
        "pack_spread": lambda s, d: _pack(s, d, True),
    }
    times = {k: [] for k in variants}
    order_fwd = list(variants.items())
    for i in range(rounds):
        order = order_fwd if i % 2 == 0 else order_fwd[::-1]
        for name, fn in order:
            t0 = time.time()
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
    res["ratio_chunk"] = round(
        res["chunk_spread"]["median"] / res["chunk_old"]["median"], 3
    )
    res["ratio_pack"] = round(
        res["pack_spread"]["median"] / res["pack_old"]["median"], 3
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
