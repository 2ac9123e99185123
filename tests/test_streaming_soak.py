"""RocksDB-state streaming soak at sf1 scale (VERDICT r5 #8).

streaming_dedup and streaming_lsh_pairs driven over a 50k-document feed
(sf0.1 replicated 10x with scale_up's key-offset scheme — the same
byte-identical-duplicate shape /tmp/sf1 has) under the RocksDB state store,
in MULTIPLE drains from one checkpoint: files land incrementally and each
drain is a fresh availableNow query — a genuine checkpoint restart between
every pair of batches. Assertions are exactly-once emission equal to the
batch twin (dedup) and component-equality with cross-restart anchor
persistence (LSH).
"""

from __future__ import annotations

from functools import reduce

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # r17 fast-tier: see conftest/pytest.ini

SF01_DOCS = "/root/testdata/sf0.1/documents.parquet"


def _sf1_corpus(spark) -> DataFrame:
    """sf0.1 documents x10 with disjoint key ranges; text byte-identical
    across copies (the realistic duplicate shape at scale)."""
    base = spark.read.parquet(SF01_DOCS).select("doc_id", "text")
    copies = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000))
        for i in range(10)
    ]
    return reduce(DataFrame.unionAll, copies)


@pytest.fixture()
def rocksdb_state(spark):
    from video_data_pipeline_spark.streaming.stateful import use_rocksdb_state

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    yield
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage")


def test_rocksdb_soak_streaming_dedup_sf1(spark, tmp_path, rocksdb_state):
    """4 batches / 3 checkpoint restarts over 50k rows: every fingerprint
    is emitted EXACTLY once across the whole run, and the emitted set
    equals the batch-side distinct fingerprints."""
    from video_data_pipeline_spark.streaming.stateful import streaming_dedup

    corpus = _sf1_corpus(spark).select(
        F.md5(F.lower(F.trim("text"))).alias("fingerprint"),
        F.format_string("k%09d", "doc_id").alias("__key__"),
        "doc_id",
    )
    src, sink, ck = tmp_path / "in", tmp_path / "out", str(tmp_path / "ck")
    src.mkdir()

    def feed(i: int, cond) -> None:
        corpus.where(cond).drop("doc_id").toPandas().to_parquet(src / f"b{i}.parquet")

    def drain() -> None:
        stream = spark.readStream.schema("fingerprint string, __key__ string").parquet(
            str(src)
        )
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

    # batches split by replica index: later batches are ~pure duplicates
    # of earlier ones — maximal pressure on cross-restart state
    feed(1, F.col("doc_id") < 10_000)
    drain()
    feed(2, (F.col("doc_id") >= 10_000) & (F.col("doc_id") < 30_000))
    drain()  # restart 1
    feed(3, (F.col("doc_id") >= 30_000) & (F.col("doc_id") < 40_000))
    feed(4, F.col("doc_id") >= 40_000)
    drain()  # restart 2 (two files -> two micro-batches inside)

    out = spark.read.parquet(str(sink))
    emitted = out.groupBy("fingerprint").count()
    assert emitted.where(F.col("count") > 1).count() == 0, (
        "a fingerprint was emitted more than once across restarts"
    )
    n_expected = corpus.select("fingerprint").distinct().count()
    assert emitted.count() == n_expected
    # replicas 2..10 of the base corpus add zero new fingerprints, so every
    # emission happened in batch 1 — state genuinely suppressed 45k rows
    assert out.count() == n_expected


def test_rocksdb_soak_streaming_lsh_pairs_sf1(spark, tmp_path, rocksdb_state):
    """3 batches / 2 checkpoint restarts of streaming LSH over the 50k-row
    corpus: connected components over the emitted anchor-star pairs equal
    the batch clique operator's clusters, and pairs span restarts (anchor
    state survived RocksDB checkpointing)."""
    from video_data_pipeline_spark.operators.components import connected_components
    from video_data_pipeline_spark.queries.dedup import (
        lsh_pairs_from_bands,
        minhash_bands,
    )
    from video_data_pipeline_spark.streaming.stateful import streaming_lsh_pairs

    corpus = _sf1_corpus(spark)
    src, sink, ck = tmp_path / "in", tmp_path / "out", str(tmp_path / "ck")
    src.mkdir()

    def feed(i: int, cond) -> None:
        corpus.where(cond).toPandas().to_parquet(src / f"b{i}.parquet")

    def drain() -> None:
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(
            str(src)
        )
        q = (
            streaming_lsh_pairs(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    feed(1, F.col("doc_id") < 10_000)
    drain()
    feed(2, (F.col("doc_id") >= 10_000) & (F.col("doc_id") < 30_000))
    drain()  # restart 1
    feed(3, F.col("doc_id") >= 30_000)
    drain()  # restart 2

    streamed = spark.read.parquet(str(sink)).select("doc_a", "doc_b").distinct()
    batch = lsh_pairs_from_bands(minhash_bands(corpus))

    def labels(pairs):
        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        return {r.node: r.component for r in comp.collect()}

    assert labels(streamed) == labels(batch), (
        "streaming star-components diverge from batch clusters after restarts"
    )
    # anchors from batch 1 must pair with docs arriving after a restart
    spans = streamed.where(
        (F.col("doc_a") < 10_000) & (F.col("doc_b") >= 10_000)
    ).count()
    assert spans > 0, "no cross-restart pair — anchor state did not survive"


def test_rocksdb_soak_streaming_kmv_sf1(spark, tmp_path, rocksdb_state):
    """KMV sketch state across 3 drains / 2 checkpoint restarts over the
    50k-row corpus: the final max-version snapshot per lang must equal a
    direct bottom-k recompute over everything fed — i.e. the ≤k-row
    RocksDB state survives restarts and keeps merging correctly."""
    from video_data_pipeline_spark.queries.analysis import _HASH48_SPARK, _KMV_K
    from video_data_pipeline_spark.streaming.stateful import streaming_kmv_distinct

    base = spark.read.parquet(SF01_DOCS).select("doc_id", "lang", "text")
    copies = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000))
        for i in range(10)
    ]
    corpus = reduce(DataFrame.unionAll, copies).select(
        "doc_id",
        "lang",
        F.expr(_HASH48_SPARK.format(x="lower(trim(text))")).alias("h"),
    )
    src, sink, ck = tmp_path / "in", str(tmp_path / "out"), str(tmp_path / "ck")
    src.mkdir()

    def feed(i: int, cond) -> None:
        corpus.where(cond).drop("doc_id").toPandas().to_parquet(
            src / f"b{i}.parquet"
        )

    def drain() -> None:
        stream = spark.readStream.schema("lang string, h bigint").parquet(
            str(src)
        )
        # memory sink cannot recover from a checkpoint; foreachBatch is the
        # fault-tolerant update-mode sink
        q = (
            streaming_kmv_distinct(stream, k=_KMV_K)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    feed(1, F.col("doc_id") < 10_000)
    drain()
    feed(2, (F.col("doc_id") >= 10_000) & (F.col("doc_id") < 30_000))
    drain()  # restart 1
    feed(3, (F.col("doc_id") >= 30_000) & (F.col("doc_id") < 40_000))
    feed(4, F.col("doc_id") >= 40_000)
    drain()  # restart 2

    rows = spark.read.parquet(sink).collect()
    latest = {}
    for r in rows:
        if r.lang not in latest or r.version > latest[r.lang].version:
            latest[r.lang] = r
    # replicas add no new hashes, so versions tick but sketches freeze
    # after batch 1's content; expected = bottom-k over distinct hashes
    per_lang: dict[str, set] = {}
    for r in corpus.select("lang", "h").distinct().collect():
        per_lang.setdefault(r.lang, set()).add(r.h)
    assert latest, "no snapshots emitted"
    for lang, hs in per_lang.items():
        ks = sorted(hs)[:_KMV_K]
        k_eff, h_k = len(ks), ks[-1]
        est = k_eff if k_eff < _KMV_K else (_KMV_K - 1) * (1 << 48) // h_k
        got = latest[lang]
        assert (got.k_eff, got.h_k, got.est_distinct) == (k_eff, h_k, est), lang
