"""Streaming prefix-filter candidates: star-components == batch, recall 1.0.

Twin of test_streaming_lsh_pairs_components_match_batch for the prefix-
filter family, plus the completeness property that distinguishes prefix
filtering from LSH: every true Jaccard-≥-τ pair must be CONNECTED by the
emitted candidate pairs — guaranteed, not probabilistic.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from video_data_pipeline_spark.operators.components import connected_components
from video_data_pipeline_spark.queries.dedup import lsh_pairs_from_bands
from video_data_pipeline_spark.queries.simjoin import (
    _TAU_DEN,
    _TAU_NUM,
    hash_ordered_prefix,
)
from video_data_pipeline_spark.streaming.stateful import streaming_prefix_candidates


def _labels(pairs):
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return {r.node: r.component for r in comp.collect()}


def test_streaming_prefix_components_match_batch_and_recall(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    half = docs.count() // 2
    src = tmp_path / "src"
    src.mkdir()
    docs.where(F.col("doc_id") < half).toPandas().to_parquet(src / "b1.parquet")
    docs.where(F.col("doc_id") >= half).toPandas().to_parquet(src / "b2.parquet")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_prefix_candidates(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("prefix_cand_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT DISTINCT doc_a, doc_b FROM prefix_cand_out")
    batch = lsh_pairs_from_bands(hash_ordered_prefix(docs))

    sl, bl = _labels(streamed), _labels(batch)
    assert sl == bl, "streaming star-components diverge from batch prefix buckets"

    # cross-batch anchor persistence: some pair spans the two micro-batches
    spans = streamed.where(
        (F.col("doc_a") < half) & (F.col("doc_b") >= half)
    ).count()
    assert spans > 0, "no cross-batch pair — anchor state did not persist"

    # completeness: every TRUE J >= tau pair is connected by the candidates
    tau = _TAU_NUM / _TAU_DEN
    texts = {r.doc_id: r.text for r in docs.collect()}

    def sh(t):
        w = t.lower().strip().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh(t) for i, t in texts.items() if len(t.split()) >= 3}
    true_pairs = [
        (a, b)
        for a, b in itertools.combinations(sorted(sets), 2)
        if len(sets[a] | sets[b])
        and len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= tau
    ]
    assert true_pairs, "fixture produced no true near-dup pairs; test is vacuous"
    for a, b in true_pairs:
        assert sl.get(a) is not None and sl.get(a) == sl.get(b), (
            f"true pair ({a}, {b}) not connected by streamed candidates"
        )
