"""r17 focused experiment (VERDICT r16 #3): the calibration audits used
to instantiate the scan -> rep-collapse corpus subtree three times per
query — once in the pigeonhole front (signature md5 fold) and once per
Jaccard join side (shingle split). The r17 shared-corpus path computes
signature AND shingle set in ONE checkpointed pass.

  old — pairs via q_simhash_near_pairs + _calibration_from_pairs(sets=None)
        (the exact r16 registered composition, still expressible)
  new — the r17 registered q_simhash_calibration (shared corpus frame)

Same-session ABBA; identical rows asserted first. NEW_TIMED constructs
the frame inside the timed region (matching bench.py's t0-before-plan
methodology, which charges lazy checkpoint materialization to the query).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _old(spark, sf_dir):
    from video_data_pipeline_spark.queries.audit import _calibration_from_pairs
    from video_data_pipeline_spark.queries.dedup import q_simhash_near_pairs

    pairs = q_simhash_near_pairs(spark, sf_dir)
    return _calibration_from_pairs(spark, sf_dir, pairs)


def _new(spark, sf_dir):
    from video_data_pipeline_spark.queries.audit import q_simhash_calibration

    return q_simhash_calibration(spark, sf_dir)


def _old_combo(spark, sf_dir):
    from video_data_pipeline_spark.queries.audit import _calibration_from_pairs
    from video_data_pipeline_spark.queries.dedup import q_simhash_near_pairs_combo

    pairs = q_simhash_near_pairs_combo(spark, sf_dir)
    return _calibration_from_pairs(spark, sf_dir, pairs)


def _new_combo(spark, sf_dir):
    from video_data_pipeline_spark.queries.audit import q_simhash_calibration_combo

    return q_simhash_calibration_combo(spark, sf_dir)


VARIANTS = {
    "old": _old,
    "new": _new,
    "old_combo": _old_combo,
    "new_combo": _new_combo,
}


def main() -> None:
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "4"))
    spark = get_spark("exp_cal_corpus")

    base = {tuple(r) for r in _old(spark, sf_dir).collect()}
    for name, fn in VARIANTS.items():
        got = {tuple(r) for r in fn(spark, sf_dir).collect()}
        assert got == base, f"{name} differs: {len(got)} vs {len(base)}"
    print(f"identity OK ({len(base)} rows, all variants)", flush=True)

    times = {k: [] for k in VARIANTS}
    order_fwd = list(VARIANTS.items())
    for i in range(rounds):
        order = order_fwd if i % 2 == 0 else order_fwd[::-1]
        for name, fn in order:
            t0 = time.time()  # before construction: checkpoints count
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
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
    res["ratio_default"] = round(
        res["new"]["median"] / res["old"]["median"], 3
    )
    res["ratio_combo"] = round(
        res["new_combo"]["median"] / res["old_combo"]["median"], 3
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
