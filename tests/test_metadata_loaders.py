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
