"""Structured Streaming wrappers over the engine's operators."""

from video_data_pipeline_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    stream_sessionize,
    stream_windowed_counts,
)
