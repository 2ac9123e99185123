"""Bloom / Count-Min sketch operators and HRW shard placement.

Invariants pinned here (the oracle parity itself is selfcheck's job):
- Bloom: NO false negatives (the load-bearing guarantee — a ``false``
  probe is a proof of novelty), build determinism, and a sane
  false-positive rate at the designed load factor.
- Count-Min: one-sided error (``est >= true`` for every probe) and a grid
  bounded by depth*width rows regardless of vocabulary.
- Rendezvous: minimal disruption — removing a shard relocates ONLY that
  shard's keys (the property that distinguishes HRW from ``hash % n``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.operators.sketch import (
    bloom_build,
    bloom_probe,
    countmin_build,
    countmin_estimate,
)
from video_data_pipeline_spark.queries.sketch import rendezvous_shard

M_BITS = 1 << 14
K = 4


@pytest.fixture(scope="module")
def member_df(spark):
    return spark.range(0, 400).select(
        F.concat(F.lit("member-"), F.col("id")).alias("k")
    )


@pytest.fixture(scope="module")
def bitmap(member_df):
    return bloom_build(member_df, "k", M_BITS, K)


def test_bloom_no_false_negatives(member_df, bitmap):
    probed = bloom_probe(member_df, "k", bitmap, M_BITS, K)
    n_true = probed.where("maybe_seen").count()
    assert n_true == 400  # every inserted key must probe true


def test_bloom_build_deterministic(member_df, bitmap):
    again = bloom_build(member_df.repartition(7), "k", M_BITS, K)
    assert again == bitmap  # OR-fold is order-free; partitioning-invariant


def test_bloom_false_positive_rate_sane(spark, bitmap):
    # 400 keys in 2^14 bits at k=4 -> theoretical FP ~ (1-e^{-0.0977})^4
    # ~ 7.5e-5; 2000 non-members should essentially never collide, and a
    # 5% ceiling leaves ~3 orders of magnitude of slack against unlucky
    # hashing without making the test flaky.
    non_members = spark.range(0, 2000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("k")
    )
    fp = (
        bloom_probe(non_members, "k", bitmap, M_BITS, K)
        .where("maybe_seen")
        .count()
    )
    assert fp / 2000 < 0.05


def test_bloom_probe_null_key_is_false_not_crash(spark, bitmap):
    """r8 VERDICT "What's wrong #2": a single NULL key used to kill the whole
    job (np.asarray(None) inside the pandas UDF). NULL is definitely absent
    — mirror build's isNotNull by short-circuiting to False."""
    rows = [("member-1",), (None,), ("member-2",), (None,)]
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["k"]: r["maybe_seen"]
        for r in bloom_probe(df, "k", bitmap, M_BITS, K).collect()
    }
    assert got["member-1"] is True and got["member-2"] is True
    assert got[None] is False


def test_bloom_probe_plan_has_no_exchange(member_df, bitmap):
    probed = bloom_probe(member_df, "k", bitmap, M_BITS, K)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # probe composes into the scan stage


def test_countmin_never_undercounts(spark):
    # skewed corpus: token t_i appears (i+1)*3 times, tiny width forces
    # collisions so the estimate must ABSORB them, never subtract
    rows = [(f"t{i}",) for i in range(40) for _ in range((i + 1) * 3)]
    items = spark.createDataFrame(rows, ["k"])
    grid = countmin_build(items, "k", depth=3, width=8)
    assert grid.count() <= 3 * 8
    probes = spark.createDataFrame([(f"t{i}",) for i in range(40)], ["k"])
    est = {r["k"]: r["est_cnt"] for r in countmin_estimate(grid, probes, "k", 3, 8).collect()}
    true = {f"t{i}": (i + 1) * 3 for i in range(40)}
    assert all(est[w] >= c for w, c in true.items())
    # absent key: estimate is whatever collided there, still >= true (0)
    ghost = countmin_estimate(
        grid, spark.createDataFrame([("ghost",)], ["k"]), "k", 3, 8
    ).collect()[0]["est_cnt"]
    assert ghost >= 0


def test_rendezvous_minimal_disruption(spark):
    """Shrinking 8 -> 7 shards relocates ONLY shard 7's keys."""
    keys = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    assigned = keys.select(
        "k",
        F.expr(rendezvous_shard("k", 8, "spark")).alias("s8"),
        F.expr(rendezvous_shard("k", 7, "spark")).alias("s7"),
    )
    moved_wrongly = assigned.where("s8 <> 7 AND s7 <> s8").count()
    assert moved_wrongly == 0
    # and shard 7's keys actually land somewhere valid
    relocated = assigned.where("s8 = 7").select("s7").distinct().collect()
    assert all(0 <= r["s7"] <= 6 for r in relocated)


def test_rendezvous_balance(spark):
    """HRW spreads keys roughly uniformly (each shard within 2x of fair)."""
    keys = spark.range(0, 4000).select(F.col("id").cast("string").alias("k"))
    counts = (
        keys.groupBy(F.expr(rendezvous_shard("k", 8, "spark")).alias("s"))
        .count()
        .collect()
    )
    assert len(counts) == 8
    assert all(250 <= r["count"] <= 1000 for r in counts)


def test_countmin_count_first_grid_is_cell_identical(spark):
    # r16 optimization: countmin_build counts per DISTINCT key first and
    # SUMs counts into the grid (hashing vocab x depth times instead of
    # occurrences x depth). The grid is a sum of per-key counts either
    # way — pin cell-for-cell equality against a per-occurrence reference
    # built with the SAME hash expression (countmin_bucket).
    from video_data_pipeline_spark.operators.sketch import countmin_bucket

    rows = [(f"t{i}",) for i in range(17) for _ in range((i + 1) * 2)]
    items = spark.createDataFrame(rows, ["k"])
    depth, width = 4, 16
    grid = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in countmin_build(items, "k", depth, width).collect()
    }
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(countmin_bucket("k", j, width, "spark")).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    ref = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in items.select(F.col("k").cast("string").alias("k"))
        .select(F.explode(cells).alias("r"))
        .groupBy(F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert grid == ref


def test_countmin_probe_frame_is_jvm_local_single_partition(spark, sf_dir):
    # r16 opt (guide §4): the probe-word literal frame must not be a
    # Python-RDD scan (createDataFrame pickles rows into an ExistingRDD
    # over defaultParallelism slices — cores-1 empty tasks per consumer
    # stage, each dragging the Python boundary). inline_rows builds it as
    # a single-partition range+inline plan.
    from video_data_pipeline_spark.queries.registry import load_all

    df = load_all()["q_countmin_freq"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" not in plan and "LogicalRDD" not in plan, plan[:2000]
    assert "Range (0, 1, step=1" in plan, plan[:2000]
