"""r16 focused experiment: q_minhash_estimate attaches signatures and
shingle sets to the LSH pairs via 4 doc_id joins — sig and sets are each
instantiated twice (doc_a / doc_b side) and reps feeds everything, so the
reps+shingle subtree appears ~5x in the static plan. Does a lazy
localCheckpoint on (a) reps only or (b) sig+sets beat the current form?
Same-session ABBA over the three variants; identical rows asserted.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _build(spark, sf_dir, ckpt_reps=False, ckpt_tabs=False, ckpt_pairs=False):
    from video_data_pipeline_spark.queries.audit import _SPARK_SHINGLE_SET
    from video_data_pipeline_spark.queries.dedup import (
        DEFAULT_LSH_MAX_BUCKET_SIZE,
        _N_HASHES,
        exact_dup_representatives,
        lsh_pairs_from_bands,
        minhash_bands,
        signatures,
    )
    from video_data_pipeline_spark.queries.registry import table

    reps = exact_dup_representatives(table(spark, sf_dir, "documents"))
    if ckpt_reps:
        reps = reps.localCheckpoint(eager=False)
    pairs = lsh_pairs_from_bands(
        minhash_bands(reps), max_bucket_size=DEFAULT_LSH_MAX_BUCKET_SIZE
    )
    if ckpt_pairs:
        pairs = pairs.localCheckpoint(eager=False)
    sig = signatures(reps)
    sets = (
        reps.select("doc_id", F.expr("split(lower(trim(text)), ' +')").alias("w"))
        .where(F.expr("size(w) >= 3"))
        .select("doc_id", F.expr(_SPARK_SHINGLE_SET).alias("sh"))
    )
    if ckpt_tabs:
        sig = sig.localCheckpoint(eager=False)
        sets = sets.localCheckpoint(eager=False)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(_N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(_N_HASHES)],
    )
    ta = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    tb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    est = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(_N_HASHES)
    ).cast("bigint")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_matches"), jac.alias("jaccard"))
    )


VARIANTS = {
    "current": {},
    "ckpt_reps": {"ckpt_reps": True},
    "ckpt_sig_sets": {"ckpt_tabs": True},
    "ckpt_pairs": {"ckpt_pairs": True},
}


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "4"))
    spark = get_spark("exp_audit_ckpt")

    # identity across variants, plus vs the registered query
    from video_data_pipeline_spark.queries.audit import q_minhash_estimate

    base = {tuple(r) for r in q_minhash_estimate(spark, sf_dir).collect()}
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
