"""Semantic tests for the stage-2 curation queries (queries/curation2.py).

Oracle parity (test_oracle_parity.py) proves Spark == DuckDB; these prove
both equal the PUBLISHED semantics — tercile balance and ordering for the
CCNet split, per-rule firing on crafted documents for the Gopher set, and
the budget/epoch algebra for the recipe mix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.curation2 import (
    _MICRO,
    q_gopher_rules,
    q_perplexity_buckets,
    q_token_budget_mix,
)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """Crafted corpus: 12 'en' docs on a clean→garbage quality gradient
    (increasing OOV mass ⇒ strictly increasing unigram cross entropy), one
    tiny 'de' slice, plus one doc per Gopher failure mode."""
    common = "the quick brown fox jumps over the lazy dog and runs to town "
    rows = []
    # quality gradient: doc i replaces i of its 12 trailing words with
    # unique gibberish -> xent strictly increases with i
    for i in range(12):
        words = (common * 3).split()
        for j in range(i):
            words[-(j + 1)] = f"zzqx{i}g{j}"
        rows.append((i, " ".join(words), "en", "srcA"))
    # a second language whose terciles are computed independently
    for i in range(6):
        words = (common * 2).split()
        for j in range(i):
            words[-(j + 1)] = f"derqx{i}g{j}"
        rows.append((100 + i, " ".join(words), "de", "srcB"))
    # Gopher failure-mode docs (own lang so they don't disturb the en
    # tercile gradient above)
    rows += [
        (200, "too short", "xx", "srcC"),  # word count < 50
        (201, " ".join(["a"] * 60), "xx", "srcC"),  # mean word len < 3
        (202, " ".join(["superlongwordxx"] * 60), "xx", "srcC"),  # mean len > 10, no stopwords
        (203, " ".join(["123"] * 30 + ["the", "a"] + ["word"] * 30), "xx", "srcC"),  # alpha frac < 0.8
        (204, "- " + common * 5, "xx", "srcC"),  # bullet-led
        (205, (common * 5).strip() + "...", "xx", "srcC"),  # ellipsis-terminated
        (206, " ".join(["#"] * 20) + " " + common * 5, "xx", "srcC"),  # symbol ratio > 0.1
        (207, (common * 5).strip(), "xx", "srcC"),  # passes everything
    ]
    # a tiny curated source: small enough that the sqrt recipe allocates it
    # MORE tokens than it has (epochs > 1)
    rows += [
        (300, common.strip(), "yy", "srcD"),
        (301, common.strip() + " extra tail words here", "yy", "srcD"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    d = d.withColumn("n_chars", F.length("text").cast("long"))
    path = tmp_path_factory.mktemp("curation2")
    d.write.parquet(str(path / "documents.parquet"))
    return str(path)


# ------------------------------------------------------ perplexity buckets


def test_perplexity_buckets_are_per_lang_terciles(spark, docs_dir):
    out = q_perplexity_buckets(spark, docs_dir).toPandas()
    assert set(out["bucket"]) == {"head", "middle", "tail"}
    out = out[out["lang"].isin(["en", "de"])]  # the distinct-bin gradient slices
    for lang, grp in out.groupby("lang"):
        n = len(grp)
        sizes = grp["bucket"].value_counts()
        # bin-granular terciles: each bucket within 1 bin of n/3 on this
        # corpus (every doc has a distinct xent_centi by construction)
        for b in ("head", "middle", "tail"):
            assert abs(sizes.get(b, 0) - n / 3) <= 1.5, (lang, dict(sizes))


def test_perplexity_bucket_order_follows_xent(spark, docs_dir):
    """Every head doc has xent <= every middle doc <= every tail doc,
    within a language — the defining property of the CCNet split."""
    out = q_perplexity_buckets(spark, docs_dir).toPandas()
    for lang, grp in out.groupby("lang"):
        h = grp[grp.bucket == "head"]["xent_centi"]
        m = grp[grp.bucket == "middle"]["xent_centi"]
        t = grp[grp.bucket == "tail"]["xent_centi"]
        if len(h) and len(m):
            assert h.max() <= m.min()
        if len(m) and len(t):
            assert m.max() <= t.min()


def test_perplexity_gradient_doc_ordering(spark, docs_dir):
    """The crafted gibberish gradient: doc 0 (clean) lands in head, doc 11
    (most OOV words) lands in tail."""
    out = q_perplexity_buckets(spark, docs_dir).toPandas().set_index("doc_id")
    assert out.loc[0, "bucket"] == "head"
    assert out.loc[11, "bucket"] == "tail"
    xs = out.loc[list(range(12))]["xent_centi"].tolist()
    assert xs == sorted(xs), "xent must increase along the gibberish gradient"


# ------------------------------------------------------------ gopher rules


def test_gopher_each_rule_fires_on_its_crafted_doc(spark, docs_dir):
    out = (
        q_gopher_rules(spark, docs_dir)
        .where(F.col("doc_id") >= 200)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[200, "r_word_count"] == 0
    assert out.loc[201, "r_mean_len"] == 0  # mean word length 1 < 3
    assert out.loc[202, "r_mean_len"] == 0  # mean word length 15 > 10
    assert out.loc[202, "r_stopwords"] == 0
    assert out.loc[203, "r_alpha"] == 0
    assert out.loc[204, "r_line_shape"] == 0  # bullet-led
    assert out.loc[205, "r_line_shape"] == 0  # ellipsis-terminated
    assert out.loc[206, "r_symbol"] == 0
    # the clean control passes every rule
    clean = out.loc[207]
    rule_cols = [c for c in out.columns if c.startswith("r_")] + ["keep"]
    assert all(clean[c] == 1 for c in rule_cols), dict(clean)
    # keep is exactly the conjunction
    rules = [c for c in out.columns if c.startswith("r_")]
    assert (out[rules].min(axis=1) == out["keep"]).all()


# -------------------------------------------------------- token budget mix


def test_token_budget_mix_algebra(spark, docs_dir):
    out = q_token_budget_mix(spark, docs_dir).toPandas().set_index("source")
    total_tok = int(out["n_tokens"].sum())
    budget = total_tok // 2
    # weights are a (floor-division) partition of unity
    assert 0 <= _MICRO - int(out["weight_micro"].sum()) < len(out)
    # allocation realizes the budget: sum over sources of
    # epochs * n_tokens ~= budget (floor error < #sources tokens)
    planned = int((out["epochs_micro"] * out["n_tokens"]).sum()) / _MICRO
    assert abs(planned - budget) / budget < 0.01
    # realized selection tracks the plan per source: the fractional pass is
    # a hash Bernoulli over ~60-doc sources, so allow wide-but-bounded slack
    for src, row in out.iterrows():
        floor_docs = row["n_docs"] * (row["epochs_micro"] // _MICRO)
        assert row["sel_docs"] >= floor_docs
        assert row["sel_docs"] <= row["n_docs"] * (row["epochs_micro"] // _MICRO + 1)


def test_token_budget_mix_upsamples_small_source(spark, docs_dir):
    """sqrt weighting must allocate the small curated source (srcB) MORE
    than its proportional share — the recipe mechanic keep-rate mixes
    cannot express is epochs > 1."""
    out = q_token_budget_mix(spark, docs_dir).toPandas().set_index("source")
    shares = out["n_tokens"] / out["n_tokens"].sum()
    small, big = shares.idxmin(), shares.idxmax()
    assert small == "srcD"
    eps = out["epochs_micro"]
    assert eps[small] > eps[big]
    # srcD holds ~2% of tokens but sqrt weighting hands it ~8% of the
    # half-corpus budget: allocated tokens exceed its own -> epochs > 1
    assert eps[small] > _MICRO, f"expected epochs > 1 for {small}: {eps[small]}"


# ------------------------------------------------------- bigram LM scoring


def test_bigram_lm_penalizes_scrambled_word_order(spark, tmp_path):
    """Two docs with IDENTICAL bags of words — one in natural corpus order,
    one deterministically scrambled — must tie under the unigram LM and
    diverge under the bigram LM (scrambled transitions are unseen, so its
    cross entropy is strictly higher). This is the property that justifies
    the bigram step: word-order quality is invisible to unigram scoring."""
    import random

    from video_data_pipeline_spark.queries.curation import q_unigram_logprob
    from video_data_pipeline_spark.queries.curation2 import q_bigram_logprob

    phrase = "the quick brown fox jumps over the lazy dog near the old stone bridge "
    natural = (phrase * 4).strip()
    words = natural.split()
    rng = random.Random(42)
    scrambled_words = words[:]
    rng.shuffle(scrambled_words)
    scrambled = " ".join(scrambled_words)
    rows = [(i, natural, "en", "s") for i in range(8)]  # training mass
    rows += [(100, natural, "en", "s"), (101, scrambled, "en", "s")]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    d = d.withColumn("n_chars", F.length("text").cast("long"))
    d.write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    uni = q_unigram_logprob(spark, sf).toPandas().set_index("doc_id")
    assert uni.loc[100, "logprob_micro"] == uni.loc[101, "logprob_micro"], (
        "identical bags must tie under the unigram LM"
    )
    bi = q_bigram_logprob(spark, sf).toPandas().set_index("doc_id")
    assert bi.loc[101, "xent_nats"] > bi.loc[100, "xent_nats"] + 0.5, (
        f"scrambled order must cost under the bigram LM: "
        f"natural={bi.loc[100, 'xent_nats']:.3f} scrambled={bi.loc[101, 'xent_nats']:.3f}"
    )
    # per-doc transition count is n_tokens - 1
    n_tokens = len(words)
    assert bi.loc[100, "n_bigrams"] == n_tokens - 1


def test_perplexity_thresholds_are_one_pass(spark, docs_dir):
    # r16 opt (guide §1.2 "fewer passes"): both tercile thresholds come from
    # ONE conditional aggregation over the cumulative histogram. The old
    # two-branch form (filter+groupBy per threshold, joined on lang)
    # instantiated the cum-window subtree twice — Catalyst does not CSE
    # across DataFrame references — re-running the whole docs→unigram-LM
    # chain per branch (30 parquet scans in the physical plan vs 20 merged).
    plan = (
        q_perplexity_buckets(spark, docs_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    n_window = plan.count("Window [")
    assert n_window == 2, (
        f"expected exactly one cum-histogram instantiation (2 stacked Window "
        f"nodes: running sum + per-lang total), got {n_window} Window nodes — "
        f"the t1/t2 single-pass merge regressed"
    )
