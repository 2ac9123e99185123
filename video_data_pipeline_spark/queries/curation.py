"""Corpus-curation scoring queries: DSIR importance weights + LM scoring.

Two pretraining-data selection stages from the curation literature that the
reference's pack/tokenize pipeline feeds into but does not itself provide:

- ``q_dsir_weights``: Data Selection via Importance Resampling (Xie et al.
  2023) — hashed-bigram bag-of-features importance weights
  ``log p_target(doc) - log p_raw(doc)`` under two smoothed categorical
  models over a fixed bucket space.
- ``q_unigram_logprob``: CCNet-style (Wenzek et al. 2020) language-model
  scoring — train a unigram LM on a trusted slice, score every document's
  per-token cross-entropy; low-perplexity docs are "clean" keepers.

Determinism contract (registry header): the only transcendental (``ln``) is
evaluated on a *small, bounded* table (1024 DSIR buckets / the LM vocab),
rounded to 1e-4-nat fixed point, and CAST to BIGINT; per-document scores are
then exact integer sums, so Spark and DuckDB agree bit-for-bit regardless of
aggregation order. A raw float fold over per-doc features would be
order-sensitive; an integer fold is not.

Scale design (100 TB):
- DSIR bucket stats are capacity-bounded (1024 rows no matter the corpus) —
  the one force-broadcast in this module, and the only safe kind.
- The unigram LM is vocabulary-sized (scale-growing) — it is NEVER
  broadcast; scoring is a term-keyed shuffle join, same shape as
  ``q_tfidf_top_terms``.
- Everything else is explode → partial-agg'd groupBy — map-side combine
  keeps the shuffle proportional to distinct (doc, feature), not tokens.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.common import SPARK_HASH
from video_data_pipeline_spark.queries.registry import query, table

_SPARK_TOKENS = "split(trim(text), ' +')"
_DUCK_TOKENS = "string_split_regex(trim(text), ' +')"

# Word bigrams from the token array. Spark's transform() lambda index is
# 0-based (pair = toks[i+1], toks[i+2] in 1-based element_at terms); DuckDB's
# list_transform index is 1-based (pair = l[i], l[i+1]).
# The Spark form operates on a pre-materialized `toks` COLUMN, never inline
# `split(...)`: Catalyst does not CSE a split referenced inside a lambda, so
# an inline form re-splits the document once per element — O(tokens^2) per
# doc (the q_hash_tokenize lesson, queries/text.py:72-92; fixing it here cut
# q_dsir_weights ~4.5s -> see test/bench notes).
_SPARK_BIGRAMS_OVER_TOKS = (
    "CASE WHEN size(toks) < 2 THEN array() "
    "ELSE transform(slice(toks, 1, size(toks) - 1), "
    "(w, i) -> concat(w, ' ', element_at(toks, i + 2))) END"
)
_DUCK_BIGRAMS = (
    f"CASE WHEN len({_DUCK_TOKENS}) < 2 THEN [] "
    f"ELSE list_transform(list_slice({_DUCK_TOKENS}, 1, len({_DUCK_TOKENS}) - 1), "
    f"(w, i) -> concat(w, ' ', ({_DUCK_TOKENS})[i + 1])) END"
)

_N_BUCKETS = 1024
_FIXED_POINT = 10000  # 1e-4-nat resolution; see module docstring


def dsir_lr_micro_col():
    """The DSIR per-bucket log-ratio lane, over columns (t_cnt, r_cnt,
    r_tot, t_tot): ``round(ln(((t+1)·(R+B)) / ((r+1)·(T+B))) · 1e4)`` as
    BIGINT. The ratio is computed in the DOUBLE lane — at 100 TB counts
    (~2.5e13 bigrams) the cross products reach ~1e26, far past double's
    2^53 exact-integer range, but both engines (and the pytest bignum
    pin, tests/test_fixed_point_lanes.py) evaluate the identical IEEE
    ops, and ln of a 1e26 double is ulp-accurate, so the rounded
    fixed-point value cannot overflow (|ln| ≤ ~60 nats ⇒ |lr_micro| ≤
    6e5) or diverge between engines. Factored so the 1e13-scale lane
    sweep drives exactly this expression."""
    return (
        F.round(
            F.log(
                ((F.col("t_cnt") + 1.0) * (F.col("r_tot") + _N_BUCKETS))
                / ((F.col("r_cnt") + 1.0) * (F.col("t_tot") + _N_BUCKETS))
            )
            * _FIXED_POINT
        )
        .cast("bigint")
    )


_DUCK_HASH = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

# Shared oracle CTE chain: every document scored (sub-2-token docs at 0).
_DUCK_DSIR_SCORED = f"""
WITH feats AS (
  SELECT doc_id, lang = 'en' AS is_tgt,
         ({_DUCK_HASH.format(x="bg")}) % {_N_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, unnest({_DUCK_BIGRAMS}) AS bg FROM documents)
),
bucket_stats AS (
  SELECT bucket,
         COUNT(*) AS r_cnt,
         COUNT(*) FILTER (is_tgt) AS t_cnt
  FROM feats GROUP BY bucket
),
bucket_totals AS (
  SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot FROM bucket_stats
),
bucket_lr AS (
  SELECT bucket,
         CAST(ROUND(ln(((t_cnt + 1.0) * (bt.r_tot + {_N_BUCKETS}))
                       / ((r_cnt + 1.0) * (bt.t_tot + {_N_BUCKETS})))
                    * {_FIXED_POINT}) AS BIGINT) AS lr_micro
  FROM bucket_stats, bucket_totals bt
),
doc_bucket AS (
  SELECT doc_id, bucket, COUNT(*) AS cnt FROM feats GROUP BY doc_id, bucket
),
scored AS (
  SELECT d.doc_id,
         CAST(SUM(d.cnt) AS BIGINT) AS n_bigrams,
         CAST(SUM(d.cnt * b.lr_micro) AS BIGINT) AS weight_micro
  FROM doc_bucket d JOIN bucket_lr b ON d.bucket = b.bucket
  GROUP BY d.doc_id
),
scored_full AS (
  SELECT doc_id,
         COALESCE(n_bigrams, 0) AS n_bigrams,
         COALESCE(weight_micro, 0) AS weight_micro
  FROM (SELECT doc_id FROM documents) LEFT JOIN scored USING (doc_id)
)
"""

_RESAMPLE_K = 100


def _dsir_scored_full(spark, sf_dir):
    """Every document scored: (doc_id, n_bigrams, weight_micro) — the
    Spark twin of the ``scored_full`` oracle CTE. See q_dsir_weights.

    Aggregation topology, chosen by measurement: a (doc_id, bucket)
    pre-aggregate is an anti-optimization here — real bigrams rarely
    repeat a bucket within one document (≈6% reduction at sf0.1), so that
    "combine" step is a full-width high-cardinality shuffle paid several
    times over. Instead every consumer aggregates the exploded stream
    straight to its OWN low-cardinality key, where map-side combine
    actually bites:

    - bucket stats: groupBy(bucket) — ≤1024 groups, shuffle is ~1024 rows
      per task regardless of corpus size;
    - per-doc scores: broadcast the 1024-row ratio table onto the stream,
      groupBy(doc_id) — |docs| groups, tokens-per-doc-fold reduction;
    - scalar totals: computed from `documents` WITHOUT exploding —
      total bigrams per doc is just greatest(size(toks)-1, 0) — so the
      1-row broadcast never re-derives the explode+md5 subtree.

    Net: the corpus is exploded+md5-hashed twice (stats pass, scoring
    pass) and every shuffle after partial aggregation is tiny. This
    replaced the shared-pre-aggregate form (3 evaluations of a ~no-op
    combine): ~4.5s -> ~1.3s at sf0.1."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_tgt"),
        F.expr(_SPARK_TOKENS).alias("toks"),
    )
    feats = toks.select(
        "doc_id",
        "is_tgt",
        F.explode(F.expr(_SPARK_BIGRAMS_OVER_TOKS)).alias("bg"),
    ).select(
        "doc_id",
        "is_tgt",
        (F.expr(SPARK_HASH.format(x="bg")) % _N_BUCKETS).alias("bucket"),
    )
    stats = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r_cnt"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("t_cnt"),
    )
    n_bg = F.greatest(F.size("toks") - 1, F.lit(0)).cast("bigint")
    tot = toks.agg(
        F.sum(n_bg).alias("r_tot"),
        F.sum(F.when(F.col("is_tgt"), n_bg).otherwise(0)).alias("t_tot"),
    )
    lr = stats.join(F.broadcast(tot)).select(
        "bucket", dsir_lr_micro_col().alias("lr_micro")
    )
    scored = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lr_micro").alias("weight_micro"),
        )
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("weight_micro", F.lit(0)).alias("weight_micro"),
        )
    )


@query(
    "q_dsir_weights",
    oracle=_DUCK_DSIR_SCORED
    + """
SELECT doc_id, n_bigrams, weight_micro, weight_micro > 0 AS keep
FROM scored_full
""",
    tags=("curation", "dsir", "dedup-adjacent"),
)
def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights over hashed bigram features.

    Target distribution = the ``lang = 'en'`` slice; raw = the whole pool
    (target included, as in the paper). Features are word bigrams hashed
    into a fixed 1024-bucket space; the per-bucket log-ratio
    ``ln((t+1)/(T+B)) - ln((r+1)/(R+B))`` is precomputed on the bounded
    bucket table in 1e-4-nat fixed point, so each document's weight is an
    exact BIGINT dot product. ``keep`` marks docs more target-like than the
    pool (weight > 0) — the resampling step then samples keepers.

    Plan: one explode, two partial-agg'd groupBys sharing the exploded
    child, a FORCE-broadcast of the 1024-row ratio table (capacity-bounded
    — the only class of table we ever force), and a doc_id-keyed left join
    back to documents to keep sub-2-token docs at weight 0.
    """
    return _dsir_scored_full(spark, sf_dir).withColumn(
        "keep", F.col("weight_micro") > 0
    )


@query(
    "q_dsir_resample",
    oracle=_DUCK_DSIR_SCORED
    + f"""
SELECT doc_id, weight_micro,
       CAST(ROUND(-ln(-ln(({_DUCK_HASH.format(
           x="concat('dsir:', CAST(doc_id AS VARCHAR))")} + 0.5)
           / 1152921504606846976.0)) * {_FIXED_POINT}) AS BIGINT) AS gumbel_micro,
       weight_micro + CAST(ROUND(-ln(-ln(({_DUCK_HASH.format(
           x="concat('dsir:', CAST(doc_id AS VARCHAR))")} + 0.5)
           / 1152921504606846976.0)) * {_FIXED_POINT}) AS BIGINT) AS key_micro
FROM scored_full
ORDER BY key_micro DESC, doc_id
LIMIT {_RESAMPLE_K}
""",
    tags=("curation", "dsir", "sampling"),
)
def q_dsir_resample(spark, sf_dir):
    """DSIR step 2 — Gumbel top-k importance *resampling* (Xie et al. 2023
    §2; Gumbel-max gives exact sampling-without-replacement ∝ softmax of
    the weights). The Gumbel noise is deterministic — ``-ln(-ln(u))`` with
    ``u = (stable_hash64('dsir:', doc_id) + 0.5) / 2^60`` — so selection
    survives retries and re-runs; like every log here it is rounded to
    1e-4-nat fixed point, making the sort key an exact BIGINT sum
    (temperature τ = 1: key = weight + τ·gumbel).

    Plan: the scored pipeline (see q_dsir_weights) plus pure per-row
    column math and a global top-k via TakeOrderedAndProject — a
    tree-reduce, never a single-partition sort of the corpus.
    """
    scored = _dsir_scored_full(spark, sf_dir)
    u = (
        F.expr(SPARK_HASH.format(x="concat('dsir:', CAST(doc_id AS STRING))")) + 0.5
    ) / float(1 << 60)
    g = F.round(-F.log(-F.log(u)) * _FIXED_POINT).cast("bigint")
    return (
        scored.select(
            "doc_id",
            "weight_micro",
            g.alias("gumbel_micro"),
            (F.col("weight_micro") + g).alias("key_micro"),
        )
        .orderBy(F.col("key_micro").desc(), "doc_id")
        .limit(_RESAMPLE_K)
    )


#: Shared oracle CTE chain for the unigram LM (WITHOUT the leading WITH):
#: every non-empty document scored as an exact-integer (n_tokens,
#: logprob_micro) pair. Reused by q_unigram_logprob here and by the CCNet
#: perplexity-bucket stage in queries/curation2.py — keeping the LM math in
#: ONE string is what guarantees the two queries score identically.
DUCK_UNIGRAM_SCORED = f"""words AS (
  SELECT doc_id, lang, unnest({_DUCK_TOKENS}) AS term
  FROM documents WHERE length(trim(text)) > 0
),
lm AS (
  SELECT term, COUNT(*) AS c FROM words WHERE lang = 'en' GROUP BY term
),
totals AS (
  SELECT SUM(c) AS n, COUNT(*) AS v FROM lm
),
lm_lp AS (
  SELECT term,
         CAST(ROUND(ln((c + 1.0) / (t.n + t.v)) * {_FIXED_POINT}) AS BIGINT) AS lp_micro
  FROM lm, totals t
),
doc_terms AS (
  SELECT doc_id, term, COUNT(*) AS cnt FROM words GROUP BY doc_id, term
),
scored AS (
  SELECT d.doc_id,
         CAST(SUM(d.cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(d.cnt * COALESCE(l.lp_micro,
             CAST(ROUND(ln(1.0 / (t.n + t.v)) * {_FIXED_POINT}) AS BIGINT))) AS BIGINT)
           AS logprob_micro
  FROM doc_terms d LEFT JOIN lm_lp l ON d.term = l.term, totals t
  GROUP BY d.doc_id
)"""


def unigram_scored(spark, sf_dir):
    """Spark twin of :data:`DUCK_UNIGRAM_SCORED`: one row per non-empty
    document with exact-integer ``(n_tokens, logprob_micro)`` under the
    add-one-smoothed unigram LM trained on the ``lang='en'`` slice. See
    :func:`q_unigram_logprob` for the determinism and scale rationale."""
    d = table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    words = d.select("doc_id", "lang", F.explode(F.expr(_SPARK_TOKENS)).alias("term"))
    # NOT checkpointed (r16 opt note): a lazy localCheckpoint on lm was
    # tried and measured a regression in the interleaved A/B (the
    # re-executed en-slice count is cheap; the checkpoint's extra job +
    # block materialization was not) — re-execution is the right trade
    # for this subtree at every scale where the vocab agg is map-side
    # combined.
    lm = words.where(F.col("lang") == "en").groupBy("term").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = lm.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    lp = F.round(F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))) * _FIXED_POINT)
    lm_lp = (
        lm.join(F.broadcast(totals))
        .select("term", lp.cast("bigint").alias("lp_micro"))
    )
    oov = F.round(F.log(1.0 / (F.col("n") + F.col("v"))) * _FIXED_POINT).cast("bigint")
    doc_terms = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        doc_terms.join(lm_lp, "term", "left")
        .join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.coalesce("lp_micro", oov)).alias("logprob_micro"),
        )
    )


@query(
    "q_unigram_logprob",
    oracle=f"""
WITH {DUCK_UNIGRAM_SCORED}
SELECT doc_id, n_tokens, logprob_micro,
       CAST(-logprob_micro AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * {_FIXED_POINT}) AS xent_nats
FROM scored
""",
    tags=("curation", "lm", "quality"),
)
def q_unigram_logprob(spark, sf_dir):
    """CCNet-style LM scoring: unigram model on the trusted ``lang='en'``
    slice, add-one smoothing over (N + V), every non-empty doc scored.

    ``lp_micro`` per vocab term is fixed-point (1e-4 nat) BIGINT, computed
    once on the vocabulary table; out-of-vocabulary terms get the floor
    probability ``1/(N+V)``. Each doc's log-prob is then an exact integer
    sum; ``xent_nats`` (the CCNet filter statistic) is one deterministic
    double division at the end.

    Plan: the LM is vocabulary-sized — scale-growing — so scoring is a
    term-keyed SHUFFLE join (never broadcast; same policy as
    ``q_tfidf_top_terms``); the 1-row totals are a broadcast nested-loop
    cross, which is a constant, not a cartesian.
    """
    scored = unigram_scored(spark, sf_dir)
    return scored.select(
        "doc_id",
        "n_tokens",
        "logprob_micro",
        (
            (-F.col("logprob_micro")).cast("double")
            / (F.col("n_tokens").cast("double") * _FIXED_POINT)
        ).alias("xent_nats"),
    )


@query(
    "q_heavy_hitters",
    oracle=f"""
WITH t AS (SELECT unnest({_DUCK_TOKENS}) AS item FROM documents),
c AS (SELECT item, COUNT(*) AS cnt FROM t GROUP BY item)
SELECT item, cnt
FROM c, (SELECT SUM(cnt) AS total FROM c)
WHERE CAST(cnt AS DOUBLE) > CAST(total AS DOUBLE) * 0.01
ORDER BY cnt DESC, item
""",
    tags=("text", "heavy-hitters", "sketch"),
)
def q_heavy_hitters(spark, sf_dir):
    """EXACT corpus heavy hitters (tokens with > 1% frequency) via the
    Misra-Gries candidate + recount operator (:mod:`operators.heavy`).

    The oracle is the naive full groupBy — correct but cardinality-wide.
    The Spark plan instead shuffles only MG candidates (<= k rows per
    partition, independent of vocabulary size) plus the exact recount of
    those candidates; at 100 TB with a billion-key vocabulary the naive
    form shuffles every distinct token, this form shuffles the survivors.
    Results are identical: MG with k >= 1/phi counters per partition is a
    guaranteed superset of the true heavy hitters, and the recount is
    exact."""
    from video_data_pipeline_spark.operators.heavy import heavy_hitters

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.expr(_SPARK_TOKENS)).alias("item"))
    return heavy_hitters(toks, col="item", phi=0.01).orderBy(
        F.col("cnt").desc(), "item"
    )


@query(
    "q_heavy_hitters_by_lang",
    oracle=f"""
WITH t AS (
  SELECT lang, unnest({_DUCK_TOKENS}) AS item FROM documents
),
c AS (SELECT lang, item, COUNT(*) AS cnt FROM t GROUP BY lang, item),
g AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS group_n FROM c GROUP BY lang)
SELECT c.lang, c.item, c.cnt, g.group_n
FROM c JOIN g ON g.lang = c.lang
WHERE CAST(c.cnt AS DOUBLE) > CAST(g.group_n AS DOUBLE) * 0.02
ORDER BY c.lang, c.cnt DESC, c.item
""",
    tags=("text", "heavy-hitters", "per-group"),
)
def q_heavy_hitters_by_lang(spark, sf_dir):
    """Per-LANGUAGE exact heavy hitters (tokens above 2% of their own
    language's token count) via the grouped Misra-Gries operator.

    Unlike the global q_heavy_hitters, the candidate phase here keeps one
    MG summary per (partition, language) WITHOUT re-partitioning by
    language — a skewed language mix (one dominant language is the norm
    in web corpora) would make a groupBy-first pass a straggler, while
    per-partition summaries stay balanced no matter the mix. Exactness
    argument is per group: undercount ≤ n_(partition,lang)/(k+1), additive
    across partitions, so k ≥ 1/φ keeps every language's true heavy
    hitters in the candidate set; the recount is exact."""
    from video_data_pipeline_spark.operators.heavy import heavy_hitters_by_group

    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.expr(_SPARK_TOKENS)).alias("item"))
    return heavy_hitters_by_group(
        toks, group_col="lang", col="item", phi=0.02
    ).orderBy("lang", F.col("cnt").desc(), "item")


# ------------------------------------------------- per-domain quality cap

#: max documents kept per source (domain). RefinedWeb/C4-style: unbounded
#: per-domain intake lets a single boilerplate-heavy site dominate the mix.
_CAP_N = 20
#: phase-1 salt fan-out. Each (source, salt) partition holds ~1/_CAP_SALTS of
#: the hottest domain; raise with observed skew (cost is _CAP_N x salts rows
#: per source into phase 2 -- still tiny).
_CAP_SALTS = 8


def _duck_domain_cap_sql() -> str:
    return f"""
SELECT doc_id, source, score, rnk FROM (
  SELECT doc_id, source, n_chars AS score,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents
) WHERE rnk <= {_CAP_N}
"""


@query("q_domain_cap", oracle=_duck_domain_cap_sql(), tags=("curation", "per-group"))
def q_domain_cap(spark, sf_dir):
    """Per-domain intake cap (RefinedWeb section 3.3 / C4-style host
    balancing): keep the top ``_CAP_N`` documents of every source by a
    quality score (here ``n_chars``; ties broken by doc_id so ranks are
    deterministic), with the rank emitted.

    Scale shape -- the skew problem with the obvious plan: a single
    ``row_number() OVER (PARTITION BY source)`` shuffles EVERY document of
    the hottest domain into one partition and sorts it there; at web scale
    one host can be 1e8 rows. This plan is the two-phase salted top-N
    instead: phase 1 ranks within (source, salt=stable_hash64(doc_id) %
    ``_CAP_SALTS``) -- each salt slice holds ~1/salts of any hot domain --
    and keeps <= _CAP_N per slice; phase 2 re-ranks the <= _CAP_N x salts
    survivors per source. Correct because every global top-N member is in
    its own slice's top-N (a slice's members are a subset of the domain).
    The oracle is the single-window form -- identical output, infeasible
    shape at scale."""
    from video_data_pipeline_spark.functions.hashing import stable_hash64
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("score")
    )
    salted = d.withColumn("salt", stable_hash64("doc_id", "capsalt:") % _CAP_SALTS)
    order = [F.col("score").desc(), F.col("doc_id")]
    local = (
        salted.withColumn(
            "lr", F.row_number().over(Window.partitionBy("source", "salt").orderBy(*order))
        )
        .where(F.col("lr") <= _CAP_N)
        .drop("lr", "salt")
    )
    return (
        local.withColumn(
            "rnk", F.row_number().over(Window.partitionBy("source").orderBy(*order))
        )
        .where(F.col("rnk") <= _CAP_N)
    )


# ------------------------------- temperature-balanced language resampling

#: temperature alpha = 0.5 (tau = 2), i.e. q_l proportional to sqrt(p_l). Chosen over the
#: mT5 default 0.3 because sqrt is IEEE-754 correctly-rounded in BOTH
#: engines (pow(x, 0.3) is libm-dependent -- a last-ulp hazard the ADVICE
#: r6 bm25 note flagged for decimal literals; same class of bug).
_MIX_FRAC = 0.5  #: target corpus fraction after resampling


def _duck_lang_mix_sql() -> str:
    from video_data_pipeline_spark.functions.hashing import duckdb_unit_uniform_sql

    u = duckdb_unit_uniform_sql("doc_id", "langmix:")
    return f"""
WITH c AS (
  SELECT lang, COUNT(*) AS n,
         CAST(ROUND(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT) AS sm
  FROM documents GROUP BY lang
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n, CAST(SUM(sm) AS BIGINT) AS total_sm FROM c),
r AS (
  SELECT c.lang,
         least(CAST(1.0 AS DOUBLE),
               ((CAST({_MIX_FRAC} AS DOUBLE) * CAST(t.total_n AS DOUBLE)) * CAST(c.sm AS DOUBLE))
               / (CAST(t.total_sm AS DOUBLE) * CAST(c.n AS DOUBLE))) AS rate
  FROM c CROSS JOIN t
)
SELECT d.doc_id, d.lang,
       CAST(ROUND(r.rate * 1000000) AS BIGINT) AS rate_micro
FROM documents d JOIN r ON r.lang = d.lang
WHERE {u} < r.rate
"""


@query("q_lang_temperature_mix", oracle=_duck_lang_mix_sql(), tags=("curation", "sampling"))
def q_lang_temperature_mix(spark, sf_dir):
    """Temperature-balanced language resampling (mT5 / XLM-R: sample
    languages with probability proportional to p_l^alpha, alpha < 1, so low-resource
    languages are up-weighted relative to their corpus share). Computes
    per-language keep-rates r_l = min(1, frac * N * q_l / n_l) with
    q_l proportional to sqrt(n_l), then keeps a document iff its deterministic unit
    uniform (stable_hash64 -- retry-safe, engine-portable) falls under its
    language's rate. Output: kept documents + the language rate in
    micro-units.

    Engine-exactness: sqrt is correctly-rounded per IEEE 754 in both Spark
    (StrictMath) and DuckDB (libm) so per-language sqrt(n) agrees bitwise;
    the cross-language SUM is over ROUND(sqrt*1e6) BIGINT micro-units --
    exact, order-free; the final rate is one fixed-shape double expression
    tree evaluated identically in both engines (all literals CAST to
    DOUBLE -- DuckDB parses bare 0.5 as DECIMAL, the ADVICE r6 bm25
    divergence class).

    Scale shape: one full scan for the per-lang counts (map-side partial
    agg: #langs rows per task), a #langs-row rate table derived driver-free
    and joined back BROADCAST (plan-gated), filter evaluated in-scan -- the
    corpus itself never shuffles."""
    from video_data_pipeline_spark.functions.hashing import stable_unit_uniform

    d = table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sqrt(F.count(F.lit(1)).cast("double")) * F.lit(1000000))
        .cast("bigint")
        .alias("sm"),
    )
    from pyspark.sql import Window

    # totals come from a single-partition window over the #langs-row table
    # (NOT a second corpus scan + crossJoin: Catalyst does not CSE a reused
    # aggregate across DataFrame references, so `c.agg(...)` here would scan
    # the corpus lang column twice).
    allw = Window.partitionBy()
    rate = (
        (F.lit(_MIX_FRAC).cast("double") * F.col("total_n").cast("double"))
        * F.col("sm").cast("double")
    ) / (F.col("total_sm").cast("double") * F.col("n").cast("double"))
    r = c.select(
        "lang",
        "n",
        "sm",
        F.sum("n").over(allw).cast("bigint").alias("total_n"),
        F.sum("sm").over(allw).cast("bigint").alias("total_sm"),
    ).select("lang", F.least(F.lit(1.0).cast("double"), rate).alias("rate"))
    return (
        d.join(F.broadcast(r), "lang")
        .where(stable_unit_uniform("doc_id", "langmix:") < F.col("rate"))
        .select(
            "doc_id",
            "lang",
            F.round(F.col("rate") * 1000000).cast("bigint").alias("rate_micro"),
        )
    )
