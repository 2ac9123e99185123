"""checkpoint_frame (r17, VERDICT r16 "what's wrong" #4): localCheckpoint
by default, reliable checkpoint into $SPARK_GRAFT_CHECKPOINT_DIR when a
cluster profile sets it. Same rows either way; local mode must keep the
exact pre-r17 plan shape (a LogicalRDD leaf from localCheckpoint)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from video_data_pipeline_spark.checkpoint import ENV_VAR, checkpoint_frame


def _frame(spark):
    return spark.range(100).select(
        "id", (F.col("id") % 7).alias("k")
    )


def test_local_mode_is_localcheckpoint(spark, monkeypatch):
    monkeypatch.delenv(ENV_VAR, raising=False)
    df = checkpoint_frame(_frame(spark))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    assert df.count() == 100
    # no reliable checkpoint dir was configured as a side effect
    assert spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()


def test_reliable_mode_writes_to_the_configured_dir(spark, tmp_path, monkeypatch):
    ckpt_dir = str(tmp_path / "ckpt")
    monkeypatch.setenv(ENV_VAR, ckpt_dir)
    df = checkpoint_frame(_frame(spark))
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == sorted((i, i % 7) for i in range(100))
    # the reliable checkpoint materialized files under the configured dir
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckpt_dir)
        for f in fs
    ]
    assert found, f"no checkpoint files under {ckpt_dir}"


def test_both_modes_agree_on_a_query_path(spark, sf_dir, tmp_path, monkeypatch):
    # drive one real checkpointed query through both modes
    from video_data_pipeline_spark.queries.audit import q_simhash_calibration

    monkeypatch.delenv(ENV_VAR, raising=False)
    local_rows = sorted(tuple(r) for r in q_simhash_calibration(spark, sf_dir).collect())
    monkeypatch.setenv(ENV_VAR, str(tmp_path / "ckpt2"))
    reliable_rows = sorted(
        tuple(r) for r in q_simhash_calibration(spark, sf_dir).collect()
    )
    assert local_rows == reliable_rows
