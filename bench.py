"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints the full result JSON line
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
then a SHORT summary JSON line (same shape minus the per-query map, plus
``"full"`` naming the artifact file) as the LAST line of stdout, and
writes the full result to a file (``--out`` / $SPARK_GRAFT_BENCH_OUT,
default ``BENCH_FULL.json`` beside this script).

Why three spellings of one result (r13 VERDICT #2): the driver records
only the TAIL of stdout, and the full line (~2.3 KB at 68 queries)
overflows that tail, clipping its head — BENCH_r13.json carried
``"parsed": null`` with the first queries missing. The trailing summary
line always fits any tail window, so the per-round artifact is parseable
again, and the on-disk file carries every per-query number self-contained.

Each query executes fully via a noop sink (no driver collect skew); timings
are per-query wall clock after a session warm-up. Mirrors the reference's
bench.py samples/sec harness (webdataset-private/webdataset/bench.py:33-62)
at whole-query granularity.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HEADLINE = [
    # TPC-H-style analytics
    "q01_pricing_summary",
    "q03_top_orders",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q10_returned_revenue",
    "q18_large_orders",
    "q04_priority_count",
    "q11_important_parts",
    "q_topk_per_group",
    "q_running_revenue",
    # dedup family
    "q_dedup_exact",
    "q_minhash_lsh_pairs",
    "q_minhash_lsh_pairs_calibrated",
    "q_simhash",
    "q_simhash_near_pairs",
    "q_simhash_near_pairs_calibrated",
    "q_jaccard_verified_pairs",
    "q_levenshtein_verified_pairs",
    "q_pagerank",
    "q_segment_dedup",
    "q_fuzzy_join_lsh",
    # similarity search
    "q_ann_bruteforce",
    "q_lsh_buckets",
    "q_ann_lsh_topk",
    "q_embedding_near_dup",
    "q_pq_adc_topk",
    "q_prototype_prune",
    # stateful packing / chunking (the reference pipelines' core)
    "q_bin_packing",
    "q_shard_rolling",
    "q_chunk_fixed",
    "q_pack_merge",
    # text analysis
    "q_token_count",
    "q_quality_score",
    "q_hash_tokenize",
    "q_lang_id",
    "q_bm25",
    # events
    "q_sessionize",
    "q_window_tumbling",
    "q_asof_join",
    "q_interval_join",
    "q_funnel",
    "q_retention",
    # curation (round 5+: splits + exact-substring spans + scoring)
    "q_stable_split",
    "q_duplicate_ngrams",
    "q_substring_dedup_spans",
    "q_domain_cap",
    "q_lang_temperature_mix",
    "q_dsir_weights",
    "q_unigram_logprob",
    "q_dedup_incremental",
    "q_zorder_span",
    "q_heavy_hitters",
    # exact statistics
    "q_corr_price_qty",
    "q_source_entropy",
    # sketches / placement (round 7)
    "q_bloom_probe",
    "q_countmin_freq",
    "q_rendezvous_shards",
    # analysis (round 7; q_kcore stays out — its 6 eager checkpoint
    # rounds are fixed session overhead that would swamp the signal)
    "q_kmv_distinct",
    "q_quality_classifier",
    "q_mad_outliers",
    "q_phrase_match",
    "q_cdc_chunks",
    # curation stage 2 + communities (round 9)
    "q_perplexity_buckets",
    "q_gopher_rules",
    "q_token_budget_mix",
    "q_label_propagation",
    # similarity join + audits + IR (round 9, late session)
    "q_prefix_filter_join",
    "q_prefix_filter_join_calibrated",
    "q_prefix_filter_join_exact",
    "q_minhash_estimate",
    "q_boolean_and_search",
    "q_bigram_logprob",
    "q_containment_pairs",
    "q_containment_pairs_calibrated",
    "q_containment_pairs_exact",
    # r16: containment over documents + synthesized quote inclusions —
    # the driver-gate discrimination leg (VERDICT r15 #2)
    "q_containment_quote_pairs",
    "q_modern_curation_pipeline",
    "q_simhash_calibration",
    "q_hard_negatives",
]


def main() -> None:
    # argparse (ADVICE r14): the hand-rolled argv scan recognized --out
    # only in position 1 and silently ignored everything else, so a typo
    # wrote the default BENCH_FULL.json without any error
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--out",
        default=None,
        help="result file (default: $SPARK_GRAFT_BENCH_OUT or BENCH_FULL.json"
        " beside this script)",
    )
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from video_data_pipeline_spark.queries.registry import load_all
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()

    spark = get_spark("bench")

    def run(name: str) -> float:
        # t0 BEFORE plan construction (r10 fix): under AQE, the lazy
        # localCheckpoints that multi-consumer queries carry materialize
        # their subtree DURING DataFrame construction, so timing only the
        # final action understated checkpointed queries (measured: LPA 8.6 s
        # construct + 0.3 s action). scale_probe already timed this way.
        t0 = time.time()
        df = registry[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm-up: JVM/codegen path, then the Python-worker daemon (one-time
    # startup otherwise lands on the first applyInPandas query's number)
    run("q01_pricing_summary")
    run("q_shard_rolling")

    # scale probes (e.g. 100x replication) can skip queries whose OUTPUT is
    # quadratic in the synthetic copy count (near-pair cliques) — a data
    # artifact, not an engine property. The skip list is recorded in the
    # JSON so a partial total is never mistaken for a full one.
    skip = {
        s
        for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",")
        if s.strip()
    }

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name in skip:
            continue
        sec = run(name)
        timings[name] = round(sec, 3)
        total += sec

    # pipeline throughput in the reference's own unit (samples/sec —
    # webdataset-private/webdataset/bench.py:59-61): pack the documents
    # table as caption metadata end-to-end through the tar sink. Reported
    # alongside, NOT in the headline total (cross-round comparability).
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from video_data_pipeline_spark.plans.pack import pack_dataset

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    meta = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("video_path"),
        F.col("text").alias("value"),
    )
    n_samples = meta.count()
    pack_out = tempfile.mkdtemp(prefix="bench_pack_")
    try:
        t0 = time.time()
        pack_dataset(meta, pack_out, samples_per_shard=500, hermetic=True).collect()
        pack_sec = time.time() - t0
    finally:
        shutil.rmtree(pack_out, ignore_errors=True)

    lineitem_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    result = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "n_queries": len(timings),
        **({"skipped": sorted(skip)} if skip else {}),
        "lineitem_rows": lineitem_rows,
        "rows_per_sec_q01": round(lineitem_rows / timings["q01_pricing_summary"]),
        "pack_samples": n_samples,
        "pack_sec": round(pack_sec, 3),
        "pack_samples_per_sec": round(n_samples / pack_sec),
    }
    out_path = args.out or os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    try:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    except OSError as e:  # a read-only checkout must not fail the bench
        print(f"bench: could not write {out_path}: {e}", file=sys.stderr)
        out_path = None
    # full line first (self-contained when the whole stdout is kept),
    # compact summary LAST so any tail window ends with parseable JSON
    print(json.dumps(result))
    summary = {
        k: v for k, v in result.items() if k != "queries"
    }
    summary["full"] = out_path
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
