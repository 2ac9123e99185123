"""Structured Streaming twins of the batch event queries.

The reference has no true streams (SURVEY.md §2.9) — but every operator in
this engine is incremental-friendly, so the streaming surface comes almost
for free: same expressions, ``readStream`` source, watermarks for late
data. These jobs are the canonical shapes a 100 TB ingestion pipeline
runs continuously; tests drive them to completion with
``trigger(availableNow)`` over the parquet test tables.

Stateful beyond windows: ``stream_sessionize`` uses ``session_window`` —
the built-in state store operator — rather than hand-rolled
``applyInPandasWithState`` (built-ins get RocksDB state + exactly-once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# nanos-as-long layout; kept importable for tests that write int64 ts columns
EVENTS_SCHEMA = _events_schema(LongType())


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet table (in production:
    kafka/kinesis source with the same downstream plan).

    The file streaming source requires a *directory* to monitor; the test
    layout is one file per table, so we stage a symlink directory (no data
    copy) — production layouts already are directories of arriving files.

    The ``ts`` column's physical type has drifted between TIMESTAMP(NANOS)
    and TIMESTAMP(MICROS) across testdata regenerations (see
    ``queries.registry._read_events``); streaming requires a user-supplied
    schema, so probe the footer with pyarrow and pick the matching one.
    """
    import glob
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType, TimestampType

    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        watch_dir = src
        probe = sorted(glob.glob(os.path.join(src, "*.parquet")))[0]
    else:
        tag = hashlib.md5(src.encode()).hexdigest()[:12]
        watch_dir = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
        os.makedirs(watch_dir, exist_ok=True)
        link = os.path.join(watch_dir, "events.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
        probe = src

    ts_field = pq.read_schema(probe).field("ts")
    if getattr(ts_field.type, "unit", None) == "ns":
        # NANOS parquet: Spark's reader only accepts it as long
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(_events_schema(LongType()))
            .format("parquet")
            .load(watch_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ts_spark = TimestampType() if ts_field.type.tz else TimestampNTZType()
    raw = (
        spark.readStream.schema(_events_schema(ts_spark))
        .format("parquet")
        .load(watch_dir)
    )
    # session tz is UTC, so relabeling NTZ as an instant keeps the wall clock
    return raw.withColumn("ts", F.col("ts").cast(TimestampType()))


def stream_windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of q_window_tumbling: watermarked tumbling counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).cast("double") / 100.0)
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of q_sessionize via the built-in session_window
    state-store operator (gap-based, watermark-evicted)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_view_click_join(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream INNER join: attribute each click to the
    views by the same user in the preceding ``within`` interval.

    Both sides carry a watermark and the join condition bounds event time
    on both ends, so Spark can size the join state and evict rows older
    than watermark + interval — the canonical bounded-state shape for
    stream-stream correlation at 100 TB/day (state is keyed by user_id,
    uniform; no unbounded buffering on either side)."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("v_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("c_ts", watermark)
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        F.unix_millis("v_ts").alias("view_ts_ms"),
        F.unix_millis("c_ts").alias("click_ts_ms"),
    )


def run_to_completion(
    df: DataFrame, name: str, checkpoint: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming query over all available input and return the
    result table (availableNow → terminates when the backlog drains).
    Stream-stream joins require ``output_mode="append"``."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def stream_sliding_counts(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of q_window_sliding: watermarked sliding-window
    counts via the built-in window(duration, slide) expansion."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "n_events",
        )
    )


def stream_interval_assign(
    events: DataFrame,
    intervals: DataFrame,
    width: int,
    id_col: str = "w",
) -> DataFrame:
    """Stream-static RANGE join: assign each incoming event to every
    interval of a static table containing it (maintenance windows, flagged
    spans, campaign windows), then count per interval.

    Uses the same bucketed :func:`operators.rangejoin.interval_join` as the
    batch query — the interval side is static so its bucket explosion is
    planned once, and the stream side only adds a per-row bucket id before
    a plain stream-static equi-join (fully stateless: no watermark or join
    state needed, unlike stream-stream). Counting per interval is a
    streaming aggregation; drive it in ``complete`` mode (or add a
    watermark upstream for append sinks).

    ``id_col`` names the interval-id column of the static table (mirrors
    the lo/hi parameterization — previously hard-coded to ``'w'``, which
    made any other static schema fail despite the generic signature)."""
    from video_data_pipeline_spark.operators.rangejoin import interval_join

    pts = events.select(F.unix_millis("ts").alias("pt_ms"))
    joined = interval_join(pts, intervals, "pt_ms", "lo", "hi", width=width)
    return joined.groupBy(F.col(id_col).alias("hot_window")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
