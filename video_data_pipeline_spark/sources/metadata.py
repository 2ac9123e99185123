"""Per-dataset metadata loaders (reference ``pack/dataset_loader.py``).

Each reference loader materializes a list[dict] on the driver with
normalized keys ``{video_path, value}`` (dataset_loader.py:52-218). Here
each is a ~5-line DataFrame expression: Spark reads the JSON/JSONL/parquet
lazily, and normalization is a projection Catalyst prunes into the scan.
Nothing is driver-materialized — the 932k-record how2link scan that needed
ijson streaming (dataset_loader.py:131-147) is just a distributed read.

All loaders return the normalized schema:
    video_path string, value string        (caption datasets)
    video_path string, value array<struct<from,value>>   (SFT datasets)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

CONV_TYPE = ArrayType(
    StructType([StructField("from", StringType()), StructField("value", StringType())])
)


def load_webvid(spark: SparkSession, path: str) -> DataFrame:
    """WebVid: columnar JSON ``{videos: {0: path, ...}, captions: {0: ...}}``
    pivoted to rows (dataset_loader.py:52-64). The dict-of-columns pivot is
    an explode over map entries joined on the index key."""
    raw = spark.read.option("multiLine", True).json(path)
    vids = raw.select(F.explode(_as_map("videos")).alias("idx", "video_path"))
    caps = raw.select(F.explode(_as_map("captions")).alias("idx", "value"))
    return vids.join(caps, "idx").select("video_path", "value")


def _as_map(col: str):
    """JSON object column → map (schema-free pivot helper)."""
    return F.from_json(F.to_json(F.col(col)), "map<string,string>")


def load_jsonl_pairs(
    spark: SparkSession,
    path: str,
    video_col: str = "video_path",
    caption_col: str = "caption",
) -> DataFrame:
    """Generic JSONL loader (hd3m/ego4d/merlin family,
    dataset_loader.py:66-90): one record per line, renamed to the
    normalized schema."""
    return spark.read.json(path).select(
        F.col(video_col).alias("video_path"), F.col(caption_col).alias("value")
    )


def load_how2link(spark: SparkSession, path: str) -> DataFrame:
    """How2Link: records carry a ``clips`` array — each clip becomes a row
    (dataset_loader.py:131-147 explodes clips while streaming ijson; here
    ``explode`` is distributed and lazy)."""
    raw = spark.read.json(path)
    clip = F.explode("clips").alias("clip")
    return raw.select(clip).select(
        F.col("clip.video_path").alias("video_path"),
        F.col("clip.caption").alias("value"),
    )


def load_internvid(spark: SparkSession, path: str) -> DataFrame:
    """InternVid: JSONL with filename constructed from fields
    ``{YoutubeID}_{Start}_{End}.mp4`` (dataset_loader.py:149-166)."""
    raw = spark.read.json(path)
    return raw.select(
        F.concat_ws("_", F.col("YoutubeID"), F.col("Start"), F.col("End"))
        .alias("_stem"),
        F.col("Caption").alias("value"),
    ).select(F.concat(F.col("_stem"), F.lit(".mp4")).alias("video_path"), "value")


def load_sft(spark: SparkSession, path: str) -> DataFrame:
    """SFT/LLaVA-style: ``value`` is the conversations array
    (dataset_loader.py:178-186); schema enforced so downstream struct ops
    are typed."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        F.coalesce(F.col("video"), F.col("image")).alias("video_path"),
        F.col("conversations").cast(CONV_TYPE).alias("value"),
    )


def load_unicontrol(spark: SparkSession, path: str) -> DataFrame:
    """Unicontrol: (source, target, prompt) triples
    (dataset_loader.py:92-116)."""
    raw = spark.read.json(path)
    return raw.select(
        F.col("source").alias("source"),
        F.col("target").alias("target"),
        F.col("prompt").alias("value"),
    )


def load_hf_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Parquet scan with column pruning (dataset_loader.py:37-50
    ``load_hf_dataset(columns=..., num_proc=64)``): pruning and parallelism
    are native — the select reaches the parquet reader as ReadSchema."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


#: dispatch table mirroring the --dataset CLI switch (pack/pack.py:234-256)
LOADERS = {
    "webvid": load_webvid,
    "how2link": load_how2link,
    "internvid": load_internvid,
    "sft": load_sft,
    "unicontrol": load_unicontrol,
}


def load_dataset(spark: SparkSession, kind: str, path: str, **kw) -> DataFrame:
    if kind in LOADERS:
        return LOADERS[kind](spark, path, **kw)
    if kind == "jsonl":
        return load_jsonl_pairs(spark, path, **kw)
    if kind == "parquet":
        return load_hf_parquet(spark, path, **kw)
    raise ValueError(f"unknown dataset kind {kind!r}")
