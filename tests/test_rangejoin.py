"""Bucketed range join: equivalence, no-dup guarantee, plan shape, guards."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.operators.rangejoin import interval_join


def _naive(points, intervals, pc, lo, hi):
    return points.join(
        intervals, F.col(pc).between(F.col(lo), F.col(hi))
    )


def test_matches_naive_between_join(spark):
    # deterministic pseudo-random points/intervals, including NEGATIVE axis
    # values (floor-div correctness) and intervals spanning 0..3 buckets
    pts = spark.range(0, 500).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 7919) % 1000 - 500).alias("x"),
    )
    ivs = spark.range(0, 60).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 104729) % 900 - 450).alias("lo"),
    ).select("iid", "lo", (F.col("lo") + (F.col("iid") * 13) % 70).alias("hi"))
    got = (
        interval_join(pts, ivs, "x", "lo", "hi", width=25)
        .select("pid", "iid")
        .collect()
    )
    want = _naive(pts, ivs, "x", "lo", "hi").select("pid", "iid").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # no-dup guarantee: each (point, interval) pair exactly once
    assert len(got) == len(set(map(tuple, got)))


def test_point_on_boundaries_included(spark):
    pts = spark.createDataFrame([(1, 10), (2, 20), (3, 9), (4, 21)], "pid int, x long")
    ivs = spark.createDataFrame([(100, 10, 20)], "iid int, lo long, hi long")
    got = sorted(
        r["pid"]
        for r in interval_join(pts, ivs, "x", "lo", "hi", width=7).collect()
    )
    assert got == [1, 2]


def test_plan_is_equi_join_not_nested_loop(spark):
    pts = spark.range(0, 100).select(F.col("id").alias("x"))
    ivs = spark.range(0, 10).select(
        (F.col("id") * 10).alias("lo"), (F.col("id") * 10 + 5).alias("hi")
    )
    plan = (
        interval_join(pts, ivs, "x", "lo", "hi", width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    # the naive form really does plan as a nested loop — the thing we avoid
    naive_plan = (
        _naive(pts, ivs, "x", "lo", "hi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan


def test_degenerate_interval_raises_at_runtime(spark):
    pts = spark.range(0, 10).select(F.col("id").alias("x"))
    ivs = spark.createDataFrame([(0, 10_000_000_000)], "lo long, hi long")
    out = interval_join(pts, ivs, "x", "lo", "hi", width=10, max_span=100)
    with pytest.raises(Exception, match="max_span"):
        out.collect()


def test_bad_width_rejected(spark):
    pts = spark.range(0, 1).select(F.col("id").alias("x"))
    with pytest.raises(ValueError):
        interval_join(pts, pts, "x", "x", "x", width=0)
