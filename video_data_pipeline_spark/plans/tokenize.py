"""The tokenize pipeline (reference ``tokenize/main.py``) as one Spark plan.

Reference shape (tokenize/main.py:149-267): list tars, slice ranges by
hand, joblib workers each re-scan 5 tars, validate, tokenize with
SentencePiece, greedily pack to 8k tokens, merge with BOS-dedup, write new
tars.

Spark shape: ``read_webdataset`` scan → validity filter → Arrow-batched
tokenize → per-shard greedy pack (``applyInPandas``, ordered by the scan's
``__member_idx__`` — the carried order column SURVEY.md §7 (2) calls for)
→ merged records → rolling tar sink.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_data_pipeline_spark.functions.text import merge_packed, tokenize_batch
from video_data_pipeline_spark.operators.packing import greedy_bin_pack
from video_data_pipeline_spark.sinks.webdataset import write_webdataset
from video_data_pipeline_spark.sources.webdataset import read_webdataset

TOKEN_BUDGET = 8000  # tokens per packed sample (tokenize/main.py:186,193)


def tokenize_shards(
    spark: SparkSession,
    in_paths: str | list[str],
    out_path: str,
    budget: int = TOKEN_BUDGET,
    samples_per_shard: int = 500,
) -> DataFrame:
    """Scan packed shards → tokenize → 8k-pack → write; returns manifest."""
    from video_data_pipeline_spark.session import ensure_shipped

    ensure_shipped(spark)
    raw = read_webdataset(spark, in_paths)
    # decode: txt payload from the sample map (decode stage, filters.py:283)
    docs = raw.select(
        "__key__",
        "__url__",
        "__member_idx__",
        F.coalesce(F.col("sample")["txt"], F.col("sample")["json"])
        .cast("string")
        .alias("text"),
    ).where(F.col("text").isNotNull())

    schema = (
        "`__key__` string, `__url__` string, `__member_idx__` bigint, text string, "
        "input_ids array<int>, loss_mask array<int>, n_tokens int"
    )
    tokenized = docs.mapInPandas(lambda it: tokenize_batch(it), schema=schema)

    packed = tokenized.transform(
        greedy_bin_pack(
            group_cols=["__url__"],
            order_col="__member_idx__",
            size_col="n_tokens",
            budget=budget,
            drop_partial=True,
        )
    )
    merged = merge_bins(packed)
    samples = merged.select(
        F.col("__key__"),
        F.create_map(
            F.lit("json"),
            F.to_json(
                F.struct(
                    F.col("input_ids"), F.col("loss_mask"), F.col("text").alias("text")
                )
            ).cast("binary"),
        ).alias("sample"),
    )
    return write_webdataset(samples, out_path, maxcount=samples_per_shard)


def merge_bins(packed: DataFrame) -> DataFrame:
    """Collapse each (shard, bin) to one record: concat input_ids/loss_mask
    dropping each non-first BOS, concat texts (``save_to_tar``,
    tokenize/main.py:73-85); key = first member's key."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__member_idx__", kind="mergesort")
        ids, mask = merge_packed(
            [(list(i), list(m)) for i, m in zip(pdf["input_ids"], pdf["loss_mask"])]
        )
        return pd.DataFrame(
            {
                "__key__": [pdf["__key__"].iloc[0]],
                "__url__": [pdf["__url__"].iloc[0]],
                "bin_id": [pdf["bin_id"].iloc[0]],
                "n_samples": [len(pdf)],
                "input_ids": [ids],
                "loss_mask": [mask],
                "text": [" ".join(map(str, pdf["text"]))],
            }
        )

    out_schema = (
        "`__key__` string, `__url__` string, bin_id bigint, n_samples int, "
        "input_ids array<int>, loss_mask array<int>, text string"
    )
    return packed.groupBy("__url__", "bin_id").applyInPandas(_merge, schema=out_schema)
