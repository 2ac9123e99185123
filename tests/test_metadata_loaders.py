"""Metadata loader tests with synthetic fixtures matching the reference's
input shapes (pack/dataset_loader.py)."""

from __future__ import annotations

import json


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_load_webvid_pivot(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_webvid

    path = _write(
        tmp_path,
        "webvid.json",
        json.dumps(
            {
                "videos": {"0": "v0.mp4", "1": "v1.mp4"},
                "captions": {"0": "cap zero", "1": "cap one"},
            }
        ),
    )
    rows = {r.video_path: r.value for r in load_webvid(spark, path).collect()}
    assert rows == {"v0.mp4": "cap zero", "v1.mp4": "cap one"}


def test_load_how2link_explodes_clips(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_how2link

    recs = [
        {"vid": "a", "clips": [
            {"video_path": "a_0.mp4", "caption": "c0"},
            {"video_path": "a_1.mp4", "caption": "c1"},
        ]},
        {"vid": "b", "clips": [{"video_path": "b_0.mp4", "caption": "c2"}]},
    ]
    path = _write(tmp_path, "h2l.jsonl", "\n".join(json.dumps(r) for r in recs))
    out = load_how2link(spark, path).collect()
    assert len(out) == 3
    assert {r.video_path for r in out} == {"a_0.mp4", "a_1.mp4", "b_0.mp4"}


def test_load_internvid_filename(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_internvid

    recs = [{"YoutubeID": "abc", "Start": "00:01", "End": "00:09", "Caption": "x"}]
    path = _write(tmp_path, "iv.jsonl", "\n".join(json.dumps(r) for r in recs))
    row = load_internvid(spark, path).first()
    assert row.video_path == "abc_00:01_00:09.mp4"
    assert row.value == "x"


def test_load_sft_conversations(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_sft

    recs = [
        {
            "video": "v.mp4",
            "image": None,
            "conversations": [
                {"from": "human", "value": "<video>\nWhat?"},
                {"from": "gpt", "value": "A cat."},
            ],
        }
    ]
    path = _write(tmp_path, "sft.json", json.dumps(recs))
    row = load_sft(spark, path).first()
    assert row.video_path == "v.mp4"
    assert [t["from"] for t in row.value] == ["human", "gpt"]


def test_load_hf_parquet_prunes(spark, sf_dir):
    from video_data_pipeline_spark.sources.metadata import load_hf_parquet

    df = load_hf_parquet(spark, f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    assert df.columns == ["doc_id", "lang"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_dispatch(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_dataset

    path = _write(
        tmp_path, "p.jsonl", json.dumps({"video_path": "v.mp4", "caption": "c"})
    )
    assert load_dataset(spark, "jsonl", path).first().value == "c"


def test_load_hd3m_prefix_join(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_hd3m

    path = _write(
        tmp_path,
        "hd3m.json",
        json.dumps([
            {"video": "clips/a.mp4", "caption": "ca"},
            {"video": "clips/b.mp4", "caption": "cb"},
        ]),
    )
    rows = {r.video_path: r.value for r in load_hd3m(spark, path, prefix="s3://hd3m/").collect()}
    assert rows == {"s3://hd3m/clips/a.mp4": "ca", "s3://hd3m/clips/b.mp4": "cb"}


def test_load_ego4d_absolute_paths(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_ego4d

    path = _write(
        tmp_path,
        "ego4d.json",
        json.dumps([{"video_path": "/abs/e0.mp4", "caption": "c0"}]),
    )
    row = load_ego4d(spark, path).first()
    assert row.video_path == "/abs/e0.mp4" and row.value == "c0"


def test_load_cambrain_columnar_pivot(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_cambrain

    path = _write(
        tmp_path,
        "cambrain.json",
        json.dumps({
            "image": {"0": "im0.jpg", "1": "im1.jpg"},
            "value": {"0": "v0", "1": "v1"},
        }),
    )
    rows = {r.video_path: r.value for r in load_cambrain(spark, path, prefix="pfx").collect()}
    assert rows == {"pfx/im0.jpg": "v0", "pfx/im1.jpg": "v1"}


def test_load_merlin_interleave(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_merlin

    path = _write(
        tmp_path,
        "merlin.json",
        json.dumps([
            {"image_info": ["i0.jpg", "i1.jpg"], "text_list": ["t0", "t1", "t2"]},
        ]),
    )
    row = load_merlin(spark, path).first()
    assert list(row.video_path) == ["i0.jpg", "i1.jpg"]
    assert list(row.value) == ["t0", "t1", "t2"]


def test_load_videochat2_multi_qa(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_videochat2

    path = _write(
        tmp_path,
        "vc2.json",
        json.dumps([
            {
                "images": ["a.jpg", "b.jpg"],
                "conversations": [
                    {"from": "human", "value": "q1"},
                    {"from": "gpt", "value": "a1"},
                    {"from": "human", "value": "q2"},
                    {"from": "gpt", "value": "a2"},
                ],
            }
        ]),
    )
    row = load_videochat2(spark, path).first()
    assert list(row.images) == ["a.jpg", "b.jpg"]
    assert [c["from"] for c in row.conversations] == ["human", "gpt", "human", "gpt"]


def test_load_how2link_clip_path_quirk(spark, tmp_path):
    """Reference keeps only the LAST THREE path segments of clip_path and
    appends .mp4 (dataset_loader.py:139)."""
    from video_data_pipeline_spark.sources.metadata import load_how2link

    recs = [{"clips": [
        {"clip_path": "/deep/nested/dir/x/y/z", "caption": "c"},
        {"clip_path": "a/b", "caption": "d"},
    ]}]
    path = _write(tmp_path, "h2l2.jsonl", "\n".join(json.dumps(r) for r in recs))
    rows = {r.video_path: r.value for r in load_how2link(spark, path, prefix="p").collect()}
    assert rows == {"p/x/y/z.mp4": "c", "p/a/b.mp4": "d"}


def test_load_llava_prefix(spark, tmp_path):
    from video_data_pipeline_spark.sources.metadata import load_llava

    path = _write(
        tmp_path,
        "llava.json",
        json.dumps([
            {"image": "00/im.jpg", "conversations": [
                {"from": "human", "value": "<image>\nwhat"},
                {"from": "gpt", "value": "ans"},
            ]}
        ]),
    )
    row = load_llava(spark, path, prefix="/mnt/llava").first()
    assert row.video_path == "/mnt/llava/00/im.jpg"
    assert row.value[1]["value"] == "ans"
