"""Stage-metrics telemetry (video_data_pipeline_spark/telemetry.py, r12).

Pins the contract tools/scale_probe.py and tools/bench_e2e.py rely on:
cumulative counters are readable from a plain driver session, a
StageMetricsDelta around a shuffle job sees that job's shuffle bytes, the
delta also lands when the body raises (a dying query's spill is the datum
the probe wants), and the spill warning fires on threshold crossing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.telemetry import (
    StageMetricsDelta,
    cumulative_stage_metrics,
)

_KEYS = {
    "disk_spill_bytes",
    "memory_spill_bytes",
    "shuffle_write_bytes",
    "shuffle_read_bytes",
}


def test_cumulative_metrics_shape(spark):
    m = cumulative_stage_metrics(spark)
    assert set(m) == _KEYS
    assert all(isinstance(v, int) and v >= 0 for v in m.values())


def test_delta_sees_shuffle_bytes(spark):
    df = spark.range(200_000).select((F.col("id") % 97).alias("k"))
    with StageMetricsDelta(spark) as m:
        df.groupBy("k").count().write.format("noop").mode("overwrite").save()
    assert set(m.delta) == _KEYS
    assert m.delta["shuffle_write_bytes"] > 0, "groupBy wrote no shuffle bytes?"
    assert m.warning is None, "healthy job must not warn"


def test_delta_counts_only_window_stages(spark):
    # deltas sum stages NEWER than the window start (r13: immune to the
    # status store evicting pre-window stages mid-window, which zeroed
    # the old cumulative-diff form on long sessions) — so work done
    # BEFORE the window must not leak in, and an empty window reads zero
    df = spark.range(50_000).select((F.col("id") % 13).alias("k"))
    df.groupBy("k").count().write.format("noop").mode("overwrite").save()
    with StageMetricsDelta(spark) as m:
        pass
    assert all(v == 0 for v in m.delta.values()), m.delta


def test_delta_lands_on_exception(spark):
    with pytest.raises(Exception, match="boom"):
        with StageMetricsDelta(spark) as m:
            spark.range(10).count()
            raise RuntimeError("boom")
    assert m.delta, "delta must be populated even when the body raises"


def test_spill_warning_threshold(spark):
    df = spark.range(100_000).select((F.col("id") % 7).alias("k"))
    # warn_bytes=-1: ANY job crosses — exercises the warning path without
    # having to force a real multi-GiB spill in CI
    with StageMetricsDelta(spark, warn_bytes=-1) as m:
        df.groupBy("k").count().write.format("noop").mode("overwrite").save()
    assert m.warning is not None and "SPILL WARNING" in m.warning
