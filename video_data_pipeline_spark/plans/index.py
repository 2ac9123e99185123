"""The index/check pipeline (reference ``index/check_pair.py``) as a plan.

Reference shape (index/check_pair.py:28-68): re-scan every tokenized tar,
assert per-sample invariants, dump a 1% golden sample for human review,
pickle ``[{url, nsamples}]`` and print the grand total.

Spark shape: scan → invariant filters (declarative, with a violation
column instead of asserts — the row-level error-policy pattern, SURVEY.md
§7 (3)) → deterministic 1% golden sample → ``groupBy(url).count()``
manifest written as Parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_data_pipeline_spark.functions.text import check_sample
from video_data_pipeline_spark.operators.sampling import rsample
from video_data_pipeline_spark.sources.webdataset import read_webdataset


def _check_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import json

    for pdf in it:
        violations = []
        for payload in pdf["json_raw"]:
            try:
                rec = json.loads(payload)
                violations.append(
                    check_sample(
                        rec.get("input_ids", []),
                        rec.get("loss_mask", []),
                        len(rec.get("image", [])),
                    )
                )
            except Exception as e:  # noqa: BLE001 — row-level tolerance
                violations.append(f"decode error: {e}")
        out = pdf.copy()
        out["violation"] = violations
        yield out


def index_shards(
    spark: SparkSession,
    paths: str | list[str],
    golden_fraction: float = 0.01,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (index, violations, golden):
    index = (url, nsamples) for valid samples — the reference's pickle
    payload (check_pair.py:46,59-66); violations = failed invariants with
    reasons; golden = deterministic ~1% sample for inspection
    (check_pair.py:16-26,41-42 dump_sample_for_checking)."""
    raw = read_webdataset(spark, paths)
    decoded = raw.select(
        "__key__", "__url__", F.col("sample")["json"].cast("string").alias("json_raw")
    )
    schema = "`__key__` string, `__url__` string, json_raw string, violation string"
    checked = decoded.mapInPandas(_check_batch, schema=schema)

    valid = checked.where(F.col("violation").isNull())
    violations = checked.where(F.col("violation").isNotNull()).select(
        "__key__", "__url__", "violation"
    )
    index = valid.groupBy(F.col("__url__").alias("url")).agg(
        F.count(F.lit(1)).alias("nsamples")
    )
    golden = valid.transform(rsample("__key__", golden_fraction, seed="golden")).select(
        "__key__", "__url__", "json_raw"
    )
    return index, violations, golden
