"""MultiShardSample: multi-source YAML shard spec (reference
``shardlists.py:192-271``).

The reference spec format::

    datasets:
      - name: datasetA
        buckets: /data/a          # base path (single bucket supported)
        shards: shard-{000..099}.tar
        resample: 20              # draw 20 shards WITH replacement, or
        choose: 30                # draw 30 shards WITHOUT replacement
        perepoch: ...             # alias used by some specs

Spark form: each source expands to its shard list; per-source sampling is
the deterministic keyed draw (with replacement: hash(draw) → shard;
without: top-k by keyed hash); the result is one combined DataFrame of
``(source, url)`` rows fed to ``read_webdataset`` — the reference's
epoch-wise global shuffle is the scheduler's task ordering.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from video_data_pipeline_spark.functions.hashing import stable_hash64
from video_data_pipeline_spark.localframe import inline_rows
from video_data_pipeline_spark.sources.shardlists import expand_urls


def parse_spec(text: str) -> list[dict]:
    import yaml

    spec = yaml.safe_load(text)
    out = []
    for ds in spec["datasets"]:
        base = ds.get("buckets", "")
        if isinstance(base, list):
            base = base[0]
        urls = [
            os.path.join(base, u) if base else u for u in expand_urls(ds["shards"])
        ]
        out.append(
            {
                "name": ds.get("name", base or "source"),
                "urls": urls,
                "resample": ds.get("resample") or ds.get("perepoch"),
                "choose": ds.get("choose"),
            }
        )
    return out


def multi_shard_sample(
    spark: SparkSession, spec_text: str, epoch: int = 0
) -> DataFrame:
    """Spec → DataFrame of (source, url) after per-source sampling
    (deterministic in (spec, epoch), reproducing MultiShardSample's
    per-epoch re-draw without driver RNG state)."""
    from functools import reduce

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    parts = []
    for ds in parse_spec(spec_text):
        # inline_rows, not createDataFrame: a pure-JVM literal frame — the
        # Python-RDD form forks a worker per partition just to unpickle
        # the url literals (localframe.py; r16 opt, guide §4)
        urls = inline_rows(spark, ["source", "url"], [(ds["name"], u) for u in ds["urls"]])
        n = len(ds["urls"])
        if ds["resample"]:  # with replacement: k independent keyed draws
            draws = spark.range(int(ds["resample"])).select(
                F.lit(ds["name"]).alias("source"),
                (stable_hash64(F.col("id"), f"msw:{ds['name']}:{epoch}:") % n).alias(
                    "_pick"
                ),
            )
            ranked = urls.withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy("source").orderBy("url")) - 1,
            )
            parts.append(
                draws.join(ranked, ["source"])
                .where(F.col("_rn") == F.col("_pick"))
                .select("source", "url")
            )
        elif ds["choose"]:  # without replacement: top-k by keyed hash
            k = min(int(ds["choose"]), n)
            ordered = urls.orderBy(stable_hash64(F.col("url"), f"msc:{epoch}:")).limit(k)
            parts.append(ordered.select("source", "url"))
        else:
            parts.append(urls)
    return reduce(lambda a, b: a.unionByName(b), parts)
