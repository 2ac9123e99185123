"""Tests: observe metrics, cached persist, MultiShardSample spec."""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.operators.observe import cached, log_keys_cols, observed
from video_data_pipeline_spark.sources.multishard import multi_shard_sample, parse_spec

SPEC = """
datasets:
  - name: a
    buckets: /data/a
    shards: shard-{00..09}.tar
    choose: 4
  - name: b
    shards: /abs/b-{000..004}.tar
    resample: 8
  - name: c
    shards: c-{0..2}.tar
"""


def test_parse_spec():
    ds = parse_spec(SPEC)
    assert [d["name"] for d in ds] == ["a", "b", "c"]
    assert len(ds[0]["urls"]) == 10 and ds[0]["urls"][0] == "/data/a/shard-00.tar"
    assert ds[1]["resample"] == 8 and len(ds[1]["urls"]) == 5


def test_multi_shard_sample_deterministic(spark):
    out1 = multi_shard_sample(spark, SPEC, epoch=0).collect()
    out2 = multi_shard_sample(spark, SPEC, epoch=0).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_source = {}
    for r in out1:
        by_source.setdefault(r.source, []).append(r.url)
    assert len(by_source["a"]) == 4  # choose: without replacement, distinct
    assert len(set(by_source["a"])) == 4
    assert len(by_source["b"]) == 8  # resample: with replacement, repeats allowed
    assert len(by_source["c"]) == 3  # no sampling: all
    out_e1 = multi_shard_sample(spark, SPEC, epoch=1).collect()
    assert sorted(map(tuple, out_e1)) != sorted(map(tuple, out1))  # epoch re-draw


def test_observed_metrics(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized, obs = observed(df)
    n = sized.count()
    assert obs.get["n_rows"] == n
    assert obs.get["approx_bytes"] > 0


def test_log_keys_and_cached(spark):
    df = log_keys_cols(spark.range(10).withColumn("__key__", F.col("id").cast("string")))
    assert "__worker__" in df.columns
    c = cached(df)
    assert c.count() == 10
    assert c.storageLevel.useMemory
    c.unpersist()
