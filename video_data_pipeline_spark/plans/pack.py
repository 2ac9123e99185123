"""The pack pipeline (reference ``pack/pack.py``) as one Spark plan.

Reference shape (pack/pack.py:230-310 ``job`` + 59-227 ``process_tars``):
driver materializes the whole metadata list in RAM, stripes it across
machines/processes by hand, then each worker fetches media, builds the
conversation struct, and writes 500-sample tars.

Spark shape: metadata is a DataFrame (never driver-materialized); striping
/padding/joblib vanish into partitioning; media fetch + frame sampling are
one Arrow-batched ``mapInPandas``; the sink is the rolling tar writer. The
whole pipeline is lazy until the manifest is acted on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from video_data_pipeline_spark.functions.media import fetch_media, sample_frames_batch
from video_data_pipeline_spark.sinks.webdataset import write_webdataset


def build_conversations(meta: DataFrame, value_col: str = "value") -> DataFrame:
    """Caption → [human(<video>...), gpt(caption)] turn pair
    (pack/pack.py:28-38 ``video_text_pair`` constructors)."""
    conv = F.array(
        F.struct(F.lit("human").alias("from"), F.lit("<video>").alias("value")),
        F.struct(F.lit("gpt").alias("from"), F.col(value_col).alias("value")),
    )
    return meta.withColumn("conversations", conv)


def _fetch_batch(
    it: Iterator[pd.DataFrame], hermetic: bool = False
) -> Iterator[pd.DataFrame]:
    """Media fetch with ``process_videos``→``videos`` path fallback
    (pack/dataset.py:65-80 coalesce-over-two-probes)."""
    for pdf in it:
        fallback = pdf["video_fallback"] if "video_fallback" in pdf else [None] * len(pdf)
        pdf = pdf.copy()
        pdf["video"] = [
            fetch_media(p, q, hermetic=hermetic)
            for p, q in zip(pdf["video_path"], fallback)
        ]
        yield pdf


def pack_dataset(
    meta: DataFrame,
    out_path: str,
    samples_per_shard: int = 500,
    sample_type: str = "video_text_pair",
    n_frames: int = 16,
    hermetic: bool = False,
) -> DataFrame:
    """Pack a normalized caption table ``(video_path, value)`` into tar
    shards; returns the writer manifest (act on it to execute).

    ``sample_type`` mirrors the --type sampler dispatch (pack/pack.py:69-85):
    ``video_text_pair`` stores whole video bytes; ``uniform`` stores sampled
    frames as jpg members keyed ``{key}-{i}`` (pack/samplers.py:112-117).

    ``hermetic=True`` lets unreachable media paths fall back to
    deterministic stand-in bytes (offline tests); in production a bad path
    fails the task, matching the reference's FileNotFoundError.
    """
    from video_data_pipeline_spark.session import ensure_shipped

    ensure_shipped(meta.sparkSession)
    meta = build_conversations(meta)
    # zero-padded sample keys, the reference's f"{idx:09d}" (pack/pack.py:155).
    # Keys come from a STABLE global index over the deterministic video_path
    # order — not monotonically_increasing_id, whose values depend on
    # partition layout and exceed 9 digits past partition 0.
    from video_data_pipeline_spark.operators.batching import global_index

    keyed = meta.transform(global_index(["video_path"], idx_col="__idx__")).withColumn(
        "__key__", F.format_string("%09d", F.col("__idx__"))
    ).drop("__idx__")

    fetch_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    with_video = keyed.mapInPandas(
        lambda it: _fetch_batch(it, hermetic=hermetic),
        schema=f"{fetch_schema}, video binary",
    )

    json_payload = F.to_json(
        F.struct(
            F.col("conversations"),
            F.array(F.col("video_path")).alias("videos"),
        )
    )

    if sample_type == "video_text_pair":
        samples = with_video.select(
            "__key__",
            F.create_map(
                F.lit("json"), json_payload.cast("binary"),
                F.lit("mp4"), F.col("video"),
            ).alias("sample"),
        )
    elif sample_type == "uniform":
        frame_schema = (
            ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in with_video.schema.fields
                if f.name != "video"
            )
            + ", frame_indices array<int>, frames array<binary>"
        )
        sampled = with_video.mapInPandas(
            lambda it: sample_frames_batch(it, n_frames=n_frames), schema=frame_schema
        )
        # reference layout (pack/pack.py:214-224 + samplers.py:112-117): one
        # json sample keyed {idx:09d} carrying image_name_list, plus one
        # SEPARATE sample per frame keyed {idx:09d}-{i} with suffix `jpg` —
        # standard to_dict('jpg;png;jpeg') pipelines then decode each frame.
        image_names = F.transform(
            F.sequence(F.lit(0), F.size("frames") - 1),
            lambda i: F.concat(F.col("__key__"), F.lit("-"), i.cast("string")),
        )
        uniform_json = F.to_json(
            F.struct(
                F.col("conversations"),
                F.array(F.col("video_path")).alias("videos"),
                image_names.alias("image_name_list"),
            )
        )
        json_samples = sampled.select(
            "__key__",
            F.create_map(F.lit("json"), uniform_json.cast("binary")).alias("sample"),
        )
        frame_samples = sampled.select(
            F.col("__key__").alias("__base__"),
            F.posexplode("frames").alias("pos", "frame"),
        ).select(
            F.concat(F.col("__base__"), F.lit("-"), F.col("pos").cast("string")).alias(
                "__key__"
            ),
            F.create_map(F.lit("jpg"), F.col("frame")).alias("sample"),
        )
        samples = json_samples.unionByName(frame_samples)
    else:
        raise ValueError(f"unknown sample_type {sample_type!r}")

    return write_webdataset(samples, out_path, maxcount=samples_per_shard)
