"""Direction-sanity tests for the curation scoring queries.

Bit-exact value parity is proven by the DuckDB oracles (selfcheck/driver);
these tests pin the *semantics direction* instead: a scorer whose sign
convention silently flipped would still hash-match its (equally flipped)
oracle, so parity alone cannot catch it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.registry import load_all

REGISTRY = load_all()


def _mean_by_en(spark, sf_dir, qname, value_col):
    """Return (mean over lang='en' docs, mean over lang='zh' docs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    scored = REGISTRY[qname].spark_fn(spark, sf_dir)
    rows = (
        scored.join(docs, "doc_id")
        .where(F.col("lang").isin("en", "zh"))
        .groupBy("lang")
        .agg(F.avg(value_col).alias("m"))
        .collect()
    )
    by_lang = {r["lang"]: r["m"] for r in rows}
    return by_lang["en"], by_lang["zh"]


def test_dsir_weights_prefer_target_language(spark, sf_dir):
    """DSIR with target = en must, on average, weight en docs above zh docs
    — the importance ratio is the whole point of the estimator."""
    en, zh = _mean_by_en(spark, sf_dir, "q_dsir_weights", "weight_micro")
    assert en > zh, f"mean weight en={en} not above zh={zh}"


def test_unigram_xent_lower_for_lm_language(spark, sf_dir):
    """A unigram LM trained on the en slice must assign lower per-token
    cross-entropy to en docs than to zh docs (CCNet keeps the low-ppl
    head; a flipped sign would invert the kept set)."""
    en, zh = _mean_by_en(spark, sf_dir, "q_unigram_logprob", "xent_nats")
    assert en < zh, f"mean xent en={en} not below zh={zh}"


def test_dsir_short_docs_kept_at_zero(spark, sf_dir):
    """Docs with <2 tokens have no bigram features; they must survive the
    left join with weight exactly 0 and keep=false, not drop out."""
    scored = REGISTRY["q_dsir_weights"].spark_fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert scored.count() == docs.count(), "DSIR output lost documents"
    zero = scored.where(F.col("n_bigrams") == 0)
    bad = zero.where((F.col("weight_micro") != 0) | F.col("keep")).count()
    assert bad == 0, "featureless docs must score 0 / keep=false"
