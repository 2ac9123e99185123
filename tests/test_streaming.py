"""Streaming twins produce the same results as their batch queries."""

from __future__ import annotations

from video_data_pipeline_spark.queries.registry import load_all
from video_data_pipeline_spark.streaming.jobs import (
    read_events_stream,
    run_to_completion,
    stream_sessionize,
    stream_windowed_counts,
)

REGISTRY = load_all()


def test_stream_windowed_counts_matches_batch(spark, sf_dir, tmp_path):
    events = read_events_stream(spark, sf_dir)
    out = run_to_completion(
        stream_windowed_counts(events), "win_counts", str(tmp_path / "ck1")
    ).toPandas()
    batch = REGISTRY["q_window_tumbling"].spark_fn(spark, sf_dir).toPandas()
    key = ["window_start", "event_type"]
    a = out.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["n_events"].values == b["n_events"].values).all()
    assert (a["total_value"].values == b["total_value"].values).all()


def test_stream_sessionize_total(spark, sf_dir, tmp_path):
    events = read_events_stream(spark, sf_dir)
    out = run_to_completion(
        stream_sessionize(events), "sessions", str(tmp_path / "ck2")
    ).toPandas()
    batch = REGISTRY["q_sessionize"].spark_fn(spark, sf_dir).toPandas()
    # same session structure: equal session count and equal total events
    assert len(out) == len(batch)
    assert out["n_events"].sum() == batch["n_events"].sum()


def test_stream_sliding_matches_batch(spark, sf_dir, tmp_path):
    from video_data_pipeline_spark.streaming.jobs import stream_sliding_counts

    events = read_events_stream(spark, sf_dir)
    out = run_to_completion(
        stream_sliding_counts(events), "slide_counts", str(tmp_path / "ck3")
    ).toPandas()
    batch = REGISTRY["q_window_sliding"].spark_fn(spark, sf_dir).toPandas()
    a = out.sort_values("window_start_ms").reset_index(drop=True)
    b = batch.sort_values("window_start_ms").reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["window_start_ms"].values == b["window_start_ms"].values).all()
    assert (a["n_events"].values == b["n_events"].values).all()


def test_watermark_drops_late_data(spark, tmp_path):
    """Late events beyond the watermark are excluded from finalized windows
    (append mode): batch 1 advances event time far ahead; batch 2's stale
    event falls behind the watermark and must not resurrect its window."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "late_src"
    src.mkdir()
    base = 1_700_000_000_000_000_000  # ns epoch
    hour = 3_600 * 1_000_000_000
    # batch 1: events in hour 0 and hour 10 (watermark advances to h10 - 1h)
    pd.DataFrame({
        "event_id": [1, 2], "ts": [base, base + 10 * hour],
        "user_id": [1, 1], "event_type": ["click", "click"],
        "value": [1.0, 1.0], "props": ["{}", "{}"],
    }).to_parquet(src / "b1.parquet")
    # batch 2: another on-time event (lets the watermark from batch 1 take
    # effect — Spark applies the watermark computed after batch N-1)
    pd.DataFrame({
        "event_id": [3], "ts": [base + 10 * hour + 1_000_000],
        "user_id": [1], "event_type": ["click"],
        "value": [1.0], "props": ["{}"],
    }).to_parquet(src / "b2.parquet")
    # batch 3: a late event back in hour 0 — now firmly behind the watermark
    pd.DataFrame({
        "event_id": [4], "ts": [base + 2_000_000],
        "user_id": [1], "event_type": ["click"],
        "value": [1.0], "props": ["{}"],
    }).to_parquet(src / "b3.parquet")
    # the file source triggers micro-batches in modification-time order —
    # pin mtimes so the late file genuinely arrives last
    import os
    import time as _time

    now = _time.time()
    os.utime(src / "b1.parquet", (now - 120, now - 120))
    os.utime(src / "b2.parquet", (now - 60, now - 60))
    os.utime(src / "b3.parquet", (now, now))

    from video_data_pipeline_spark.streaming.jobs import EVENTS_SCHEMA

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.ws: r.n for r in spark.sql("SELECT * FROM late_out").collect()}
    # hour-0 window finalized with ONLY the on-time event; the late event
    # (event_id 4) was dropped by the watermark (h10 window still pending)
    assert sorted(rows.values()) == [1], rows
