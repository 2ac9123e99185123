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


def load_how2link(spark: SparkSession, path: str, prefix: str = "") -> DataFrame:
    """How2Link: records carry a ``clips`` array — each clip becomes a row
    (dataset_loader.py:131-147 explodes clips while streaming ijson; here
    ``explode`` is distributed and lazy). Reference quirk: the stored
    ``clip_path`` is truncated to its LAST THREE path segments and given a
    ``.mp4`` suffix before the prefix join (dataset_loader.py:139)."""
    raw = spark.read.json(path)
    clip = F.explode("clips").alias("clip")
    exploded = raw.select(clip)
    fields = exploded.select("clip.*").columns
    if "clip_path" in fields:
        segs = F.split(F.col("clip.clip_path"), "/")
        last3 = F.slice(segs, F.greatest(F.size(segs) - 2, F.lit(1)), 3)
        rel = F.concat(F.array_join(last3, "/"), F.lit(".mp4"))
        return exploded.select(
            _prefixed(rel, prefix).alias("video_path"),
            F.col("clip.caption").alias("value"),
        )
    return exploded.select(
        _prefixed(F.col("clip.video_path"), prefix).alias("video_path"),
        F.col("clip.caption").alias("value"),
    )


def _prefixed(col, prefix: str):
    """``os.path.join(get_prefix(ds), p)`` equivalent (no double slash)."""
    if not prefix:
        return col
    return F.concat(F.lit(prefix.rstrip("/") + "/"), col)


def load_hd3m(spark: SparkSession, path: str, prefix: str = "") -> DataFrame:
    """HD-3M: JSON array of ``{video, caption}`` with the dataset prefix
    joined onto the relative video path (dataset_loader.py:118-129)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        _prefixed(F.col("video"), prefix).alias("video_path"),
        F.col("caption").alias("value"),
    )


def load_ego4d(spark: SparkSession, path: str) -> DataFrame:
    """Ego4D: JSON array of ``{video_path, caption}`` — paths are already
    absolute, no prefix join (dataset_loader.py:80-90)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        F.col("video_path").alias("video_path"), F.col("caption").alias("value")
    )


def load_cambrain(spark: SparkSession, path: str, prefix: str = "") -> DataFrame:
    """Cambrian: columnar JSON ``{image: {idx: path}, value: {idx: cap}}``
    pivoted to rows with the prefix join (dataset_loader.py:66-78 — the
    webvid-style dict-of-columns shape under different key names)."""
    raw = spark.read.option("multiLine", True).json(path)
    imgs = raw.select(F.explode(_as_map("image")).alias("idx", "rel_path"))
    caps = raw.select(F.explode(_as_map("value")).alias("idx", "value"))
    return imgs.join(caps, "idx").select(
        _prefixed(F.col("rel_path"), prefix).alias("video_path"), "value"
    )


def load_merlin(spark: SparkSession, path: str) -> DataFrame:
    """Merlin-S interleave: each record pairs an ``image_info`` list with a
    ``text_list`` (dataset_loader.py:188-199); both stay arrays — the
    interleave structure is the sample."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        F.col("image_info").alias("video_path"), F.col("text_list").alias("value")
    )


def load_videochat2(spark: SparkSession, path: str) -> DataFrame:
    """VideoChat2: multi-image multi-QA records ``{images, conversations}``
    (dataset_loader.py:209-218); conversations keep the typed turn schema."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        F.col("images").alias("images"),
        F.col("conversations").cast(CONV_TYPE).alias("conversations"),
    )


def load_llava(spark: SparkSession, path: str, prefix: str = "") -> DataFrame:
    """LLaVA pretrain: ``{image, conversations}`` with prefix join
    (dataset_loader.py:178-186)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        _prefixed(F.col("image"), prefix).alias("video_path"),
        F.col("conversations").cast(CONV_TYPE).alias("value"),
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
    "hd3m": load_hd3m,
    "ego4d": load_ego4d,
    "cambrain": load_cambrain,
    "merlin": load_merlin,
    "videochat2": load_videochat2,
    "llava": load_llava,
}


def load_dataset(spark: SparkSession, kind: str, path: str, **kw) -> DataFrame:
    if kind in LOADERS:
        return LOADERS[kind](spark, path, **kw)
    if kind == "jsonl":
        return load_jsonl_pairs(spark, path, **kw)
    if kind == "parquet":
        return load_hf_parquet(spark, path, **kw)
    raise ValueError(f"unknown dataset kind {kind!r}")
