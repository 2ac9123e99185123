"""Streaming twins produce the same results as their batch queries."""

from __future__ import annotations

from pyspark.sql import functions as F

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
    try:
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
    finally:
        # leaked nanosAsLong changes how OTHER tests' batch reads decode
        # parquet footers — restore unconditionally
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream view->click attribution equals the batch
    join over the same events (the availableNow drain processes everything,
    so no rows are watermark-dropped and the sets must match exactly)."""
    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.streaming.jobs import stream_view_click_join

    views = read_events_stream(spark, sf_dir).where(F.col("event_type") == "view")
    clicks = read_events_stream(spark, sf_dir).where(F.col("event_type") == "click")
    out = run_to_completion(
        stream_view_click_join(views, clicks),
        "vc_join",
        str(tmp_path / "ck_ssj"),
        output_mode="append",
    ).toPandas()

    e = table(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    batch = (
        v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select("view_id", "click_id")
        .toPandas()
    )
    assert len(out) == len(batch) > 0
    got = set(zip(out["view_id"], out["click_id"]))
    want = set(zip(batch["view_id"], batch["click_id"]))
    assert got == want


def test_streaming_dedup_restart_recovery(spark, tmp_path):
    """State survives a restart: batch 1 marks fingerprints seen; after the
    query stops, batch 2 arrives with overlapping fingerprints and a restart
    from the SAME checkpoint must emit only the genuinely novel ones."""
    import pandas as pd

    from video_data_pipeline_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "in"
    sink = tmp_path / "out"
    src.mkdir()
    ck = str(tmp_path / "ck_dedup")

    pd.DataFrame(
        {"fingerprint": ["a", "a", "b"], "__key__": ["k1", "k2", "k3"]}
    ).to_parquet(src / "b1.parquet")

    schema = "fingerprint string, __key__ string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_dedup(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(sink)).toPandas()

    first = drain()
    assert sorted(first["fingerprint"]) == ["a", "b"]

    # batch 2: 'a' and 'b' are dupes of recovered state; 'c' is novel
    pd.DataFrame(
        {"fingerprint": ["a", "b", "c", "c"], "__key__": ["k4", "k5", "k6", "k7"]}
    ).to_parquet(src / "b2.parquet")
    second = drain()
    assert sorted(second["fingerprint"]) == ["a", "b", "c"]
    novel = second[~second["fingerprint"].isin(first["fingerprint"])]
    assert list(novel["fingerprint"]) == ["c"]
    assert int(novel["n_new"].iloc[0]) == 2


def test_stream_interval_assign_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static bucketed range join: streaming assignment of events to
    static hot windows equals the batch interval_join aggregate."""
    from video_data_pipeline_spark.operators.rangejoin import interval_join
    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.streaming.jobs import stream_interval_assign

    width = 6 * 3600 * 1000
    e = table(spark, sf_dir, "events").select(F.unix_millis("ts").alias("pt_ms"))
    intervals = (
        e.groupBy(F.expr(f"pt_ms div {width}").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(5)
        .select(
            "w",
            (F.col("w") * width - 1800000).alias("lo"),
            ((F.col("w") + 1) * width + 1799999).alias("hi"),
        )
    )
    intervals.persist().count()  # static side: materialize once
    stream = read_events_stream(spark, sf_dir)
    out = run_to_completion(
        stream_interval_assign(stream, intervals, width),
        "interval_assign",
        str(tmp_path / "ck_ivj"),
    ).toPandas()
    batch = (
        interval_join(e, intervals, "pt_ms", "lo", "hi", width=width)
        .groupBy(F.col("w").alias("hot_window"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    intervals.unpersist()
    a = out.sort_values("hot_window").reset_index(drop=True)
    b = batch.sort_values("hot_window").reset_index(drop=True)
    assert (a["hot_window"].values == b["hot_window"].values).all()
    assert (a["n_events"].values == b["n_events"].values).all()
