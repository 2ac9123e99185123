"""End-to-end pipeline tests: pack → tokenize → index on real test tables.

The reference's pipeline lifecycle (SURVEY.md §3) exercised hermetically:
documents rows stand in for caption metadata; media fetch/decode are the
deterministic fakes from functions.media.
"""

from __future__ import annotations

import glob
import json
import re
import tarfile

from pyspark.sql import functions as F

from video_data_pipeline_spark.plans.index import index_shards
from video_data_pipeline_spark.plans.pack import pack_dataset
from video_data_pipeline_spark.plans.tokenize import tokenize_shards
from video_data_pipeline_spark.sinks.webdataset import write_webdataset
from video_data_pipeline_spark.sources.webdataset import read_webdataset


def _meta(spark, sf_dir, n=60):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n)
    return docs.select(
        F.concat(F.lit("s3://bucket/videos/"), F.col("doc_id").cast("string"), F.lit(".mp4"))
        .alias("video_path"),
        F.col("text").alias("value"),
    )


def test_pack_video_text_pair(spark, sf_dir, tmp_path):
    out = str(tmp_path / "packed")
    manifest = pack_dataset(
        _meta(spark, sf_dir).repartition(2), out, samples_per_shard=25, hermetic=True
    ).collect()
    assert sum(m.nsamples for m in manifest) == 60
    # re-scan: every sample has json + mp4 members (pack/pack.py:171-179 shape)
    back = read_webdataset(spark, out)
    keys = back.select(F.explode(F.map_keys("sample")).alias("k")).distinct().collect()
    assert {r.k for r in keys} == {"json", "mp4"}
    one = back.first()
    payload = json.loads(bytes(one.sample["json"]))
    assert payload["conversations"][0]["from"] == "human"
    assert payload["conversations"][1]["from"] == "gpt"
    assert payload["videos"][0].startswith("s3://bucket/videos/")


def test_pack_uniform_frames(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frames")
    manifest = pack_dataset(
        _meta(spark, sf_dir, n=10).repartition(1),
        out,
        samples_per_shard=10,
        sample_type="uniform",
        n_frames=4,
        hermetic=True,
    ).collect()
    # reference layout: one json sample per video + one jpg sample per frame
    assert sum(m.nsamples for m in manifest) == 50
    names, payloads = [], {}
    for path in glob.glob(out + "/*.tar"):
        with tarfile.open(path) as tar:
            for n in tar.getnames():
                names.append(n)
                if n.endswith(".json"):
                    payloads[n] = json.loads(tar.extractfile(n).read())
    json_names = [n for n in names if n.endswith(".json")]
    jpg_names = [n for n in names if n.endswith(".jpg")]
    assert len(jpg_names) == 40
    # keys: stable sequential 9-digit base ({idx:09d}), frames {idx:09d}-{i}
    assert sorted(json_names) == [f"{i:09d}.json" for i in range(10)]
    assert re.fullmatch(r"\d{9}-\d+\.jpg", sorted(jpg_names)[0])
    # json sample records its frame keys (pack/pack.py:214-224)
    first = sorted(json_names)[0]
    base = first[:-5]
    assert payloads[first]["image_name_list"] == [f"{base}-{i}" for i in range(4)]


def test_tokenize_and_index_roundtrip(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(40)
        .select(
            F.format_string("%09d", "doc_id").alias("__key__"),
            F.create_map(F.lit("txt"), F.col("text").cast("binary")).alias("sample"),
        )
    )
    write_webdataset(docs.repartition(2), src, maxcount=10).collect()

    out = str(tmp_path / "tok")
    manifest = tokenize_shards(spark, src, out, budget=600, samples_per_shard=50).collect()
    assert sum(m.nsamples for m in manifest) > 0

    back = read_webdataset(spark, out)
    rec = json.loads(bytes(back.first().sample["json"]))
    assert len(rec["input_ids"]) == len(rec["loss_mask"])
    assert len(rec["input_ids"]) <= 600
    assert rec["input_ids"][0] == 1  # BOS once, non-first BOS dropped
    assert rec["input_ids"].count(1) == 1

    index, violations, golden = index_shards(spark, out, golden_fraction=0.5)
    idx_rows = index.collect()
    assert sum(r.nsamples for r in idx_rows) == back.count()
    assert violations.count() == 0
    assert golden.count() >= 0


def test_index_catches_violations(spark, tmp_path):
    bad = str(tmp_path / "bad")
    rows = [
        ("000000001", {"json": json.dumps(
            {"input_ids": [1, 5, 6], "loss_mask": [0, 1], "image": []}
        ).encode()}),
        ("000000002", {"json": json.dumps(
            {"input_ids": [1, 5, 6], "loss_mask": [0, 0, 1], "image": []}
        ).encode()}),
    ]
    df = spark.createDataFrame(rows, "`__key__` string, sample map<string,binary>")
    write_webdataset(df.repartition(1), bad).collect()
    index, violations, _ = index_shards(spark, bad)
    v = violations.collect()
    assert len(v) == 1 and "len(input_ids)" in v[0].violation
    assert index.collect()[0].nsamples == 1


def test_sample_index_end_to_end_with_zorder_sink(spark, sf_dir, tmp_path):
    """sample_index exposes per-sample (key, url, n_tokens, n_images) for
    valid samples, consistent with the shard manifest; write_index with
    zorder_by round-trips it clustered."""
    from video_data_pipeline_spark.plans.index import sample_index, write_index

    src = str(tmp_path / "src")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(30)
        .select(
            F.format_string("%09d", "doc_id").alias("__key__"),
            F.create_map(F.lit("txt"), F.col("text").cast("binary")).alias("sample"),
        )
    )
    write_webdataset(docs.repartition(2), src, maxcount=10).collect()
    out = str(tmp_path / "tok")
    tokenize_shards(spark, src, out, budget=600, samples_per_shard=50).collect()

    smeta = sample_index(spark, out)
    rows = smeta.collect()
    index, violations, _ = index_shards(spark, out)
    assert len(rows) == sum(r.nsamples for r in index.collect())
    assert violations.count() == 0
    assert all(0 < r.n_tokens <= 600 for r in rows)
    assert all(r.n_images == 0 for r in rows)  # text-only corpus

    zdir = str(tmp_path / "zidx")
    write_index(smeta, zdir, zorder_by=("n_tokens", "n_images"), num_files=2)
    back = spark.read.parquet(zdir)
    assert back.count() == len(rows)
    assert set(back.columns) == {"key", "url", "n_tokens", "n_images"}
