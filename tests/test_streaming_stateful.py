"""Cross-micro-batch stateful dedup: state must persist between batches."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from video_data_pipeline_spark.streaming.stateful import streaming_dedup


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: fingerprints A, B ; batch 2: B (dup), C — written as two files,
    # maxFilesPerTrigger=1 forces two micro-batches
    pd.DataFrame({"__key__": ["k1", "k2"], "fingerprint": ["A", "B"]}).to_parquet(
        src / "b1.parquet"
    )
    pd.DataFrame({"__key__": ["k3", "k4"], "fingerprint": ["B", "C"]}).to_parquet(
        src / "b2.parquet"
    )

    stream = (
        spark.readStream.schema("`__key__` string, fingerprint string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.fingerprint: r for r in spark.sql("SELECT * FROM dedup_out").collect()}
    # every fingerprint surfaces exactly once; B's duplicate batch emits nothing
    assert set(rows) == {"A", "B", "C"}
    assert rows["B"].first_key == "k2"  # first occurrence won, k3 dropped
    assert rows["A"].n_new == 1 and rows["C"].n_new == 1


def test_streaming_dedup_rocksdb_state_restart(spark, tmp_path):
    """The dedup state machine is provider-agnostic: under the RocksDB
    state store (the 100 TB configuration — disk-backed state, bounded
    executor memory) first-seen suppression works and state survives a
    restart from the checkpoint, exactly as with the default heap store."""
    import pandas as pd

    from video_data_pipeline_spark.streaming.stateful import (
        streaming_dedup,
        use_rocksdb_state,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    try:
        src, sink, ck = tmp_path / "in", tmp_path / "out", str(tmp_path / "ck")
        src.mkdir()
        pd.DataFrame(
            {"fingerprint": ["a", "a", "b"], "__key__": ["k1", "k2", "k3"]}
        ).to_parquet(src / "b1.parquet")

        def drain():
            stream = spark.readStream.schema(
                "fingerprint string, __key__ string"
            ).parquet(str(src))
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

        assert sorted(drain()["fingerprint"]) == ["a", "b"]
        pd.DataFrame(
            {"fingerprint": ["b", "c"], "__key__": ["k4", "k5"]}
        ).to_parquet(src / "b2.parquet")
        out = drain()
        assert sorted(out["fingerprint"]) == ["a", "b", "c"]  # only 'c' new
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage")
