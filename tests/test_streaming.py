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
