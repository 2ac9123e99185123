"""Streaming parity MATRIX (r7 VERDICT #6 / r8 #9).

One harness drives EVERY stateful streaming twin over the same seeded
3-micro-batch feed of the sf0.001 documents corpus — with a genuine RESTART
between micro-batch 2 and 3 (the first query drains and stops, a brand-new
query object resumes from the checkpoint) — and asserts equality against the
twin's batch counterpart. The per-twin tests elsewhere pin individual
semantics; this matrix pins the property they all share and that a 100 TB
continuous pipeline actually relies on: state round-trips through the
checkpoint across process boundaries, and the final answer equals the batch
recompute no matter how the corpus was sliced into batches.

Feed: all cases derive their columns from ONE seeded shuffle of the
documents table (segment-dedup uses the doc_id-ordered variant — its parity
contract requires ordered arrival, mirroring continuous ingestion). Sink:
``foreachBatch`` appending to parquet with a ``run`` tag, which works
uniformly for append- and update-mode twins and survives the restart
(a memory sink would lose run-1 rows).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # r17 fast-tier: see conftest/pytest.ini

SF_DIR = "/root/testdata/sf0.001"


def _docs_pdf(spark, ordered: bool) -> pd.DataFrame:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pdf = docs.toPandas()
    if ordered:
        return pdf.sort_values("doc_id").reset_index(drop=True)
    return pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)


def _run_with_restart(spark, tmp_path, pdf, cols, schema, twin, mode):
    """Write pdf[cols] as 3 files; run the twin over files 1-2, stop, add
    file 3, resume from the same checkpoint with a NEW query. Returns the
    full emitted output with a ``run`` column (1 = pre-restart, 2 = post)."""
    src, out, ck = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ck")
    src.mkdir()
    third = max(1, len(pdf) // 3)
    chunks = [
        pdf.iloc[i * third : (i + 1) * third if i < 2 else len(pdf)][cols]
        for i in range(3)
    ]

    def start(run):
        def sink(batch_df, _bid):
            batch_df.withColumn("run", F.lit(run)).write.mode("append").parquet(out)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return (
            twin(stream)
            .writeStream.outputMode(mode)
            .foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    chunks[0].to_parquet(src / "b0.parquet")
    chunks[1].to_parquet(src / "b1.parquet")
    start(1).awaitTermination()  # drains files 0-1, then the query STOPS
    chunks[2].to_parquet(src / "b2.parquet")
    start(2).awaitTermination()  # NEW query: state recovered from checkpoint
    return spark.read.parquet(out), chunks


def test_dedup_parity_across_restart(spark, tmp_path):
    from video_data_pipeline_spark.streaming.stateful import streaming_dedup

    pdf = _docs_pdf(spark, ordered=False)
    pdf["__key__"] = pdf["doc_id"].astype(str)
    import hashlib

    pdf["fingerprint"] = pdf["text"].map(
        lambda t: hashlib.md5(t.strip().lower().encode()).hexdigest()
    )
    got, chunks = _run_with_restart(
        spark, tmp_path, pdf,
        ["__key__", "fingerprint"], "`__key__` string, fingerprint string",
        streaming_dedup, "append",
    )
    rows = got.collect()
    emitted = [r["fingerprint"] for r in rows]
    # every distinct fingerprint exactly once — a lost checkpoint would
    # re-emit chunk-1/2 fingerprints in run 2
    assert sorted(emitted) == sorted(set(pdf["fingerprint"]))
    seen_before = set(chunks[0]["fingerprint"]) | set(chunks[1]["fingerprint"])
    run2 = {r["fingerprint"] for r in rows if r["run"] == 2}
    assert run2 == set(chunks[2]["fingerprint"]) - seen_before


def test_lsh_pairs_parity_across_restart(spark, tmp_path):
    from video_data_pipeline_spark.operators.components import connected_components
    from video_data_pipeline_spark.queries.dedup import q_minhash_lsh_pairs
    from video_data_pipeline_spark.streaming.stateful import streaming_lsh_pairs

    pdf = _docs_pdf(spark, ordered=False)
    got, chunks = _run_with_restart(
        spark, tmp_path, pdf,
        ["doc_id", "text"], "doc_id bigint, text string",
        streaming_lsh_pairs, "append",
    )

    def labels(pairs):
        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        return {r.node: r.component for r in comp.collect()}

    sl = labels(got.select("doc_a", "doc_b").distinct())
    bl = labels(q_minhash_lsh_pairs(spark, SF_DIR))
    assert sl == bl, "star components over the restarted stream != batch clusters"
    # anchor state must persist across the restart: some run-2 pair's
    # anchor doc must have arrived before the restart
    pre = set(chunks[0]["doc_id"]) | set(chunks[1]["doc_id"])
    spans = [
        r for r in got.where("run = 2").collect() if r["doc_a"] in pre
    ]
    assert spans, "no post-restart pair anchored pre-restart — state lost"


def test_segment_dedup_parity_across_restart(spark, tmp_path):
    from video_data_pipeline_spark.queries.dedup import _SEG_WORDS, _SPARK_WORDS
    from video_data_pipeline_spark.streaming.stateful import streaming_segment_dedup

    pdf = _docs_pdf(spark, ordered=True)  # parity contract: ordered arrival
    got, _ = _run_with_restart(
        spark, tmp_path, pdf,
        ["doc_id", "text"], "doc_id bigint, text string",
        streaming_segment_dedup, "append",
    )
    emitted = {
        (r["fingerprint"], r["doc_id"], r["seg_idx"]) for r in got.collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    words = docs.select("doc_id", F.expr(_SPARK_WORDS).alias("w"))
    segs = words.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(w) / {_SEG_WORDS}.0) AS INT) - 1), "
                f"i -> concat_ws(' ', slice(w, i * {_SEG_WORDS} + 1, {_SEG_WORDS})))"
            )
        ).alias("seg_idx", "seg"),
    )
    want = {
        (r["fp"], r["doc_id"], r["seg_idx"])
        for r in segs.groupBy("seg")
        .agg(F.min(F.struct("doc_id", "seg_idx")).alias("f"))
        .select(
            F.md5("seg").alias("fp"),
            F.col("f.doc_id").alias("doc_id"),
            F.col("f.seg_idx").cast("long").alias("seg_idx"),
        )
        .collect()
    }
    assert emitted == want
    assert got.count() == len(emitted), "a segment re-emitted after restart"


def test_domain_cap_parity_across_restart(spark, tmp_path):
    from video_data_pipeline_spark.queries.registry import load_all
    from video_data_pipeline_spark.streaming.stateful import streaming_domain_cap

    pdf = _docs_pdf(spark, ordered=False)
    got, _ = _run_with_restart(
        spark, tmp_path, pdf,
        ["doc_id", "source", "n_chars"],
        "doc_id bigint, source string, n_chars bigint",
        streaming_domain_cap, "update",
    )
    rows = got.collect()
    latest = {}
    for r in rows:
        latest[r["source"]] = max(latest.get(r["source"], 0), r["version"])
    snapshot = {
        (r["source"], r["doc_id"], r["score"], r["rnk"])
        for r in rows
        if r["version"] == latest[r["source"]]
    }
    batch = {
        (r["source"], r["doc_id"], r["score"], r["rnk"])
        for r in load_all()["q_domain_cap"].spark_fn(spark, SF_DIR).collect()
    }
    assert snapshot == batch
    # versions must keep climbing after the restart (state not reset to v1)
    assert max(latest.values()) >= 3


def test_kmv_parity_across_restart(spark, tmp_path):
    from video_data_pipeline_spark.queries.analysis import _HASH48_SPARK, _KMV_K
    from video_data_pipeline_spark.queries.registry import load_all
    from video_data_pipeline_spark.streaming.stateful import streaming_kmv_distinct

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hashed = docs.select(
        "lang", F.expr(_HASH48_SPARK.format(x="lower(trim(text))")).alias("h")
    ).toPandas().sample(frac=1.0, random_state=7).reset_index(drop=True)
    got, _ = _run_with_restart(
        spark, tmp_path, hashed,
        ["lang", "h"], "lang string, h bigint",
        lambda s: streaming_kmv_distinct(s, k=_KMV_K), "update",
    )
    rows = got.collect()
    latest = {}
    for r in rows:
        if r["lang"] not in latest or r["version"] > latest[r["lang"]]["version"]:
            latest[r["lang"]] = r
    batch = load_all()["q_kmv_distinct"].spark_fn(spark, SF_DIR).collect()
    assert {r.lang: (r.k_eff, r.est_distinct) for r in batch} == {
        lang: (r["k_eff"], r["est_distinct"]) for lang, r in latest.items()
    }


def test_heavy_hitters_parity_across_restart(spark, tmp_path):
    from video_data_pipeline_spark.streaming.stateful import streaming_heavy_hitters

    pdf = _docs_pdf(spark, ordered=False)[["source"]].rename(
        columns={"source": "item"}
    )
    totals = pdf["item"].value_counts().to_dict()
    # threshold sits above any 2-chunk prefix so every source crosses in
    # the POST-RESTART batch — counts must have accumulated through the
    # checkpoint or nothing (or the wrong count) emits
    min_count = int(max(0.9 * min(totals.values()), 2))
    got, chunks = _run_with_restart(
        spark, tmp_path, pdf,
        ["item"], "item string",
        lambda s: streaming_heavy_hitters(s, min_count=min_count), "append",
    )
    rows = got.collect()
    emitted = {r["item"]: r for r in rows}
    assert len(rows) == len(emitted), "an item emitted more than once"
    assert set(emitted) == {i for i, t in totals.items() if t >= min_count}
    pre = pd.concat([chunks[0], chunks[1]])["item"].value_counts().to_dict()
    for item, r in emitted.items():
        assert r["cnt"] >= min_count
        if pre.get(item, 0) < min_count:  # crossed only after the restart
            assert r["run"] == 2 and r["cnt"] > chunks[2]["item"].eq(item).sum(), (
                f"{item}: post-restart count ignores pre-restart state"
            )


def test_prefix_candidates_parity_across_restart(spark, tmp_path):
    from video_data_pipeline_spark.operators.components import connected_components
    from video_data_pipeline_spark.queries.dedup import lsh_pairs_from_bands
    from video_data_pipeline_spark.queries.simjoin import hash_ordered_prefix
    from video_data_pipeline_spark.streaming.stateful import (
        streaming_prefix_candidates,
    )

    pdf = _docs_pdf(spark, ordered=False)
    got, chunks = _run_with_restart(
        spark, tmp_path, pdf,
        ["doc_id", "text"], "doc_id bigint, text string",
        streaming_prefix_candidates, "append",
    )

    def labels(pairs):
        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        return {r.node: r.component for r in comp.collect()}

    sl = labels(got.select("doc_a", "doc_b").distinct())
    batch = lsh_pairs_from_bands(
        hash_ordered_prefix(
            spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
                "doc_id", "text"
            )
        )
    )
    bl = labels(batch)
    assert sl == bl, (
        "prefix-candidate star components over the restarted stream != batch"
    )
    pre = set(chunks[0]["doc_id"]) | set(chunks[1]["doc_id"])
    spans = [r for r in got.where("run = 2").collect() if r["doc_a"] in pre]
    assert spans, "no post-restart pair anchored pre-restart — state lost"


def _python_containment(spark, pairs):
    """Independent oracle for the containment verify stage: recompute
    (n_common, cont_a_in_b, cont_b_in_a) per pair from raw corpus text with
    plain Python sets (rep collapse, lower/trim/regex-split, distinct
    3-gram shingles — the queries/simjoin.py semantics, reimplemented, not
    reused), keeping pairs that pass 5·I >= 4·min(n_a, n_b)."""
    import re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    reps = {}
    for r in docs:
        fp = r["text"].strip().lower()
        if fp not in reps or r["doc_id"] < reps[fp]:
            reps[fp] = r["doc_id"]
    rep_ids = set(reps.values())
    sets = {}
    for r in docs:
        if r["doc_id"] not in rep_ids:
            continue
        w = re.split(" +", r["text"].strip().lower())
        if len(w) >= 3:
            sets[r["doc_id"]] = {
                " ".join(w[i : i + 3]) for i in range(len(w) - 2)
            }
    out = set()
    for a, b in pairs:
        if a not in sets or b not in sets:
            continue  # non-representative or <3 words: inner join drops it
        inter = len(sets[a] & sets[b])
        if 5 * inter >= 4 * min(len(sets[a]), len(sets[b])):
            out.add((a, b, inter, inter / len(sets[a]), inter / len(sets[b])))
    return out


def test_containment_verify_parity_across_restart(spark, tmp_path):
    """Batch equality for the stateless verify stage: batch-computed
    candidate pairs stream through streaming_containment_verify (with a
    restart between micro-batches) and the emitted rows must equal the
    Python-recomputed containment verification of those same pairs —
    row-for-row, float-for-float."""
    from video_data_pipeline_spark.queries.dedup import lsh_pairs_from_bands
    from video_data_pipeline_spark.queries.simjoin import (
        hash_ordered_prefix,
        hashed_shingle_sets,
    )
    from video_data_pipeline_spark.streaming.stateful import (
        streaming_containment_verify,
    )

    static_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    cand_pdf = (
        lsh_pairs_from_bands(hash_ordered_prefix(static_docs))
        .toPandas()
        .sample(frac=1.0, random_state=11)
        .reset_index(drop=True)
    )
    sets = hashed_shingle_sets(static_docs)
    got, _ = _run_with_restart(
        spark, tmp_path, cand_pdf,
        ["doc_a", "doc_b"], "doc_a bigint, doc_b bigint",
        lambda s: streaming_containment_verify(s, sets), "append",
    )
    emitted = {
        (r["doc_a"], r["doc_b"], r["n_common"], r["cont_a_in_b"], r["cont_b_in_a"])
        for r in got.collect()
    }
    want = _python_containment(
        spark, {(r["doc_a"], r["doc_b"]) for _, r in cand_pdf.iterrows()}
    )
    assert emitted == want
    assert emitted, "vacuous parity: no candidate verified"


def test_chained_prefix_candidates_then_verify(spark, tmp_path):
    """The full streaming LSH-then-verify chain (stateful candidate front →
    stateless stream-static verify) composes in ONE query, survives the
    restart, and every emitted row is exact vs the Python oracle and sound
    vs the all-pairs containment truth (star candidates ⊆ all pairs)."""
    from video_data_pipeline_spark.queries.simjoin import hashed_shingle_sets
    from video_data_pipeline_spark.streaming.stateful import (
        streaming_containment_verify,
        streaming_prefix_candidates,
    )

    pdf = _docs_pdf(spark, ordered=False)
    static_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    sets = hashed_shingle_sets(static_docs)
    got, chunks = _run_with_restart(
        spark, tmp_path, pdf,
        ["doc_id", "text"], "doc_id bigint, text string",
        lambda s: streaming_containment_verify(
            streaming_prefix_candidates(s), sets
        ),
        "append",
    )
    rows = got.collect()
    assert rows, "chain emitted nothing"
    truth = _python_containment(
        spark,
        {
            (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
            for r in rows
        },
    )
    by_pair = {(a, b): (i, ca, cb) for a, b, i, ca, cb in truth}
    for r in rows:
        key = (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        assert key in by_pair, f"{key} emitted but fails the Python verify"
        i, ca, cb = by_pair[key]
        assert r["n_common"] == i
        if r["doc_a"] < r["doc_b"]:
            assert (r["cont_a_in_b"], r["cont_b_in_a"]) == (ca, cb)
        else:
            assert (r["cont_a_in_b"], r["cont_b_in_a"]) == (cb, ca)
    pre = set(chunks[0]["doc_id"]) | set(chunks[1]["doc_id"])
    spans = [r for r in got.where("run = 2").collect() if r["doc_a"] in pre or r["doc_b"] in pre]
    assert spans, "no post-restart verified pair anchored pre-restart — state lost"
