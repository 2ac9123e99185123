"""Product-quantization invariants and plan gates."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.registry import load_all

REGISTRY = load_all()


def test_pq_codebook_seeds_self_encode(spark, sf_dir):
    """Vectors that ARE codebook entries (vec_id < K) must quantize to
    themselves in every subspace with exactly zero error — argmin and the
    k-tie-break both have to hold for that to come out."""
    codes = REGISTRY["q_pq_encode"].spark_fn(spark, sf_dir)
    seeds = codes.where(F.col("vec_id") < 8)
    bad = seeds.where(
        (F.col("code") != F.col("vec_id")) | (F.col("qerr") != 0.0)
    ).count()
    assert bad == 0, "codebook seed vectors must self-encode with qerr=0"
    assert seeds.count() == 8 * 4  # K vectors x M subspaces


def test_q_pq_adc_topk_codes_scored_via_broadcast_lut(spark, sf_dir):
    """ADC scoring must join the corpus-sized code table against the
    32-row LUT as a BROADCAST (shuffling the corpus on a 32-value key
    would be the scale failure), and the final top-k must tree-reduce."""
    df = REGISTRY["q_pq_adc_topk"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "LUT join lost its broadcast"
    assert "TakeOrderedAndProject" in plan, "top-k lost its TakeOrdered tree-reduce"
    assert "CartesianProduct" not in plan
    assert not re.search(r"BatchEvalPython|ArrowEvalPython", plan)
