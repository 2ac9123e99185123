"""Curation stage 2: CCNet bucketing, Gopher rules, token-budget recipes.

Three pretraining-data curation operators that sit immediately downstream of
the stage-1 scoring queries (queries/curation.py) in a real 100 TB pipeline:

- ``q_perplexity_buckets``: the CCNet head/middle/tail split (Wenzek et al.
  2020 §4.3) — per-language perplexity terciles over the unigram-LM
  cross-entropy of queries/curation.py. CCNet trains downstream models on
  the ``head`` bucket; this is the query that actually produces it.
- ``q_gopher_rules``: the Gopher document-quality ruleset (Rae et al. 2021,
  Table A1) as pure column math — word-count bounds, mean-word-length
  bounds, alphabetic-word fraction, stopword floor, symbol-to-word ratio,
  bullet/ellipsis line shape — each rule an auditable 0/1 column plus the
  conjunction verdict. Complements ``q_repetition_filter`` (the Gopher
  REPETITION rules, queries/text.py) — together they cover the full ruleset.
- ``q_token_budget_mix``: data-recipe execution (the LLaMA-style "epochs
  per source" table): allocate a global token budget across sources with
  weights proportional to sqrt(source token count), yielding a possibly
  GREATER-than-1 epoch count per source — integer full passes plus a
  deterministic hash-thresholded fractional pass. Differs from
  ``q_lang_temperature_mix`` (keep-rates <= 1, per-language) in exactly the
  mechanic that matters for recipes: upsampling (epochs > 1).

Determinism contract (registry header): the only transcendentals are ``ln``
on the bounded LM vocabulary (inherited from curation.py, fixed-point BIGINT
before any per-doc math) and ``sqrt`` on per-source token counts (correctly
rounded per IEEE-754 in both engines — the q_lang_temperature_mix
precedent); everything per-document is BIGINT arithmetic with floor
division on non-negative operands (Spark ``div`` == DuckDB ``//`` there).

Scale design (100 TB):
- The CCNet tercile thresholds come from a CENTINAT HISTOGRAM — cross
  entropy lives in ~[0, 20] nats, so the (lang, xent_centi) aggregate is
  capacity-bounded (≤ ~2000 rows per language regardless of corpus size);
  the corpus is never ranked per language (the naive per-lang ntile window
  puts an entire language — 20 TB+ — on one reducer). Same selection idiom
  as q_mad_outliers' median-from-value-counts.
- Gopher rules are a single in-scan projection: zero shuffles, zero joins.
- The recipe table is #sources rows, derived with one map-side-combined
  aggregate and joined back BROADCAST; the corpus never shuffles.

Reference parity: the reference has no curation tier (closest: blacklist
word filters, filters.py); these are the distributed forms of the published
pipeline stages its pack/tokenize output feeds.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from video_data_pipeline_spark.functions.hashing import (
    duckdb_hash64_sql,
    stable_hash64,
)
from video_data_pipeline_spark.queries.curation import (
    _DUCK_TOKENS,
    _SPARK_TOKENS,
    DUCK_UNIGRAM_SCORED,
    unigram_scored,
)
from video_data_pipeline_spark.queries.registry import query, table

# ------------------------------------------------- CCNet perplexity buckets

#: xent_centi = floor(xent_nats * 100): 1e-2-nat resolution. The histogram
#: bin count is bounded by the LM's worst-case cross entropy (~ln(N+V) ≈ 20
#: nats → ≤ ~2000 bins), which is what makes the threshold table broadcast-
#: safe at any corpus size.
_CENTI_DIV = 100  # logprob_micro is 1e-4 nat ⇒ div by (n_tokens · 100)

#: the CCNet quantization lane, over columns (logprob_micro, n_tokens):
#: integer centinats via BIGINT floor division. Headroom at 100 TB doc
#: sizes: n_tokens·100 overflows only past ~9.2e16 tokens IN ONE DOCUMENT;
#: the 1e13-scale lane sweep (tests/test_fixed_point_lanes.py) drives
#: exactly this string.
XENT_CENTI_SQL = f"(-logprob_micro) div (n_tokens * {_CENTI_DIV})"


#: Full CCNet-split oracle — also reused by the composite pipeline query
#: (q_modern_curation_pipeline), which nests it as a derived table.
DUCK_PPL_SQL = f"""
WITH {DUCK_UNIGRAM_SCORED},
docs AS (
  SELECT s.doc_id, d.lang,
         (-s.logprob_micro) // (s.n_tokens * {_CENTI_DIV}) AS xent_centi
  FROM scored s JOIN documents d USING (doc_id)
),
hist AS (
  SELECT lang, xent_centi, COUNT(*) AS cnt FROM docs GROUP BY lang, xent_centi
),
cum AS (
  SELECT lang, xent_centi,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY xent_centi) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS n
  FROM hist
),
t1 AS (
  SELECT lang, MIN(xent_centi) AS t1 FROM cum
  WHERE cum >= (n + 2) // 3 GROUP BY lang
),
t2 AS (
  SELECT lang, MIN(xent_centi) AS t2 FROM cum
  WHERE cum >= (2 * n + 2) // 3 GROUP BY lang
)
SELECT d.doc_id, d.lang, d.xent_centi,
       CASE WHEN d.xent_centi <= t1.t1 THEN 'head'
            WHEN d.xent_centi <= t2.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM docs d JOIN t1 USING (lang) JOIN t2 USING (lang)
"""


@query(
    "q_perplexity_buckets",
    oracle=DUCK_PPL_SQL,
    tags=("curation", "lm", "quality"),
)
def q_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity split, per language: every
    non-empty document is assigned the tercile bucket of its unigram-LM
    cross entropy within its own language (CCNet's central design point —
    a fixed global threshold would just re-rank languages by how well the
    English-slice LM fits them).

    Exactness: per-doc cross entropy is quantized to integer centinats
    ``xent_centi = (-logprob_micro) div (n_tokens·100)`` (floor division on
    non-negative BIGINTs — identical in Spark and DuckDB), and terciles are
    defined ON THE QUANTIZED value: threshold t_k = smallest bin whose
    cumulative count reaches ceil(k·n/3). Bucket boundaries therefore fall
    between bins, never inside one — the assignment is a pure function of
    (lang, xent_centi) with no per-doc tie-breaking to keep in sync across
    engines.

    Scale shape: the corpus aggregates once into the bounded (lang,
    xent_centi) histogram (map-side combine; ≤ ~2000 rows/lang at ANY
    corpus size — xent is bounded by the LM's OOV floor ~ln(N+V)); the
    cumulative windows sort bins, never documents; thresholds join back
    broadcast and the bucket label is evaluated in-scan. The naive
    per-language ntile window — 20 TB of one language through a single
    reducer at 100 TB — never appears. Same histogram-selection idiom as
    q_mad_outliers."""
    d = table(spark, sf_dir, "documents")
    # docs is consumed twice (histogram build + final bucket join); a lazy
    # localCheckpoint here was tried in the r16 optimization round and
    # MEASURED SLOWER in the interleaved A/B (ratio ~1.5) — the extra
    # materialization job cost more than re-running the LM chain, whose
    # heavy parts are map-side-combined aggregates. Left re-executing.
    docs = unigram_scored(spark, sf_dir).join(
        d.select("doc_id", "lang"), "doc_id"
    ).select(
        "doc_id",
        "lang",
        F.expr(XENT_CENTI_SQL).alias("xent_centi"),
    )
    hist = docs.groupBy("lang", "xent_centi").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("xent_centi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "xent_centi",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    # Both tercile thresholds come from ONE conditional aggregation over
    # `cum` (min(xent_centi | cum >= ceil(k*n/3)) for k = 1, 2). The earlier
    # two-branch form (separate filter+groupBy per threshold joined on lang)
    # re-instantiated the whole docs->unigram-LM subtree under each branch —
    # Catalyst does not CSE across DataFrame references. Equivalent because
    # the last bin of every lang has cum = n >= ceil(k*n/3), so both
    # conditional mins are non-null for every lang, exactly the rows the old
    # inner join kept.
    thresholds = cum.groupBy("lang").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 2) div 3"), F.col("xent_centi"))
        ).alias("t1"),
        F.min(
            F.when(F.col("cum") >= F.expr("(2 * n + 2) div 3"), F.col("xent_centi"))
        ).alias("t2"),
    )
    return docs.join(F.broadcast(thresholds), "lang").select(
        "doc_id",
        "lang",
        "xent_centi",
        F.when(F.col("xent_centi") <= F.col("t1"), F.lit("head"))
        .when(F.col("xent_centi") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# ------------------------------------------------------------- Gopher rules

#: The published cutoffs (Rae et al. 2021 Table A1), integer-rearranged so
#: no per-document float is ever computed: mean word length in [3, 10]
#: becomes 3·n_words ≤ char_sum ≤ 10·n_words, alpha fraction ≥ 0.8 becomes
#: 5·alpha_words ≥ 4·n_words, symbol ratio ≤ 0.1 becomes 10·symbols ≤
#: n_words.
_STOPWORDS = ("the", "a", "of", "to", "and", "in")
_MIN_WORDS, _MAX_WORDS = 50, 100_000

_DUCK_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
_SPARK_STOP_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


#: Full Gopher-ruleset oracle — reused by the composite pipeline query.
DUCK_GOPHER_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) AS char_sum,
         len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]'))) AS alpha_words,
         len(list_filter(toks, w -> list_contains({_DUCK_STOP_LIST}, w))) AS stop_count,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS symbol_count,
         CASE WHEN text LIKE '- %' OR text LIKE '* %' THEN 1 ELSE 0 END AS bullet_start,
         CASE WHEN text LIKE '%...' THEN 1 ELSE 0 END AS ellipsis_end
  FROM (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
        FROM documents)
)
SELECT doc_id, n_words, char_sum, alpha_words, stop_count, symbol_count,
       CASE WHEN n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS} THEN 1 ELSE 0 END AS r_word_count,
       CASE WHEN char_sum >= 3 * n_words AND char_sum <= 10 * n_words THEN 1 ELSE 0 END AS r_mean_len,
       CASE WHEN 5 * alpha_words >= 4 * n_words THEN 1 ELSE 0 END AS r_alpha,
       CASE WHEN stop_count >= 2 THEN 1 ELSE 0 END AS r_stopwords,
       CASE WHEN 10 * symbol_count <= n_words THEN 1 ELSE 0 END AS r_symbol,
       CASE WHEN bullet_start = 0 AND ellipsis_end = 0 THEN 1 ELSE 0 END AS r_line_shape,
       CASE WHEN n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
             AND char_sum >= 3 * n_words AND char_sum <= 10 * n_words
             AND 5 * alpha_words >= 4 * n_words
             AND stop_count >= 2
             AND 10 * symbol_count <= n_words
             AND bullet_start = 0 AND ellipsis_end = 0
            THEN 1 ELSE 0 END AS keep
FROM feats
"""


@query(
    "q_gopher_rules",
    oracle=DUCK_GOPHER_SQL,
    tags=("curation", "quality"),
)
def q_gopher_rules(spark, sf_dir):
    """Gopher quality-filter ruleset (Rae et al. 2021, Table A1) as one
    in-scan projection: per document, the raw feature counts, one 0/1
    column per rule (auditable — a curation run reports per-rule rejection
    rates, not just a verdict), and the conjunction ``keep``.

    Rules, integer-rearranged (no per-doc float anywhere): word count in
    [50, 100k]; mean word length in [3, 10] (as 3n ≤ Σlen ≤ 10n);
    ≥ 80% of words contain an alphabetic character (as 5·alpha ≥ 4·n);
    ≥ 2 stopwords; symbol('#'/'...')-to-word ratio ≤ 0.1 (as 10·sym ≤ n);
    document not bullet-led / ellipsis-terminated (the single-line form of
    Gopher's line-shape rules — this corpus is one line per doc). The
    REPETITION half of Gopher's ruleset is q_repetition_filter
    (queries/text.py), which this intentionally does not duplicate.

    Scale shape: pure column math over one scan — no shuffle, no join, no
    UDF; every expression stays inside whole-stage codegen, so the filter
    runs at scan throughput on any corpus size. Engine parity: token
    splitting is the shared ``split(trim(text), ' +')``; the regex class
    ``[a-zA-Z]`` and LIKE anchors behave identically in both engines;
    everything else is BIGINT compares."""
    d = table(spark, sf_dir, "documents")
    toks = F.expr(_SPARK_TOKENS)
    feats = d.select(
        "doc_id",
        "text",
        F.size(toks).cast("bigint").alias("n_words"),
        F.expr(
            f"aggregate({_SPARK_TOKENS}, 0L, (acc, w) -> acc + length(w))"
        ).alias("char_sum"),
        F.expr(
            f"CAST(size(filter({_SPARK_TOKENS}, w -> w rlike '[a-zA-Z]')) AS BIGINT)"
        ).alias("alpha_words"),
        F.expr(
            f"CAST(size(filter({_SPARK_TOKENS},"
            f" w -> w in ({_SPARK_STOP_LIST}))) AS BIGINT)"
        ).alias("stop_count"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"))))
            + F.expr(
                "(length(text) - length(replace(text, '...', ''))) div 3"
            )
        ).cast("bigint").alias("symbol_count"),
        F.when(
            F.col("text").startswith("- ") | F.col("text").startswith("* "),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("bullet_start"),
        F.when(F.col("text").endswith("..."), F.lit(1))
        .otherwise(F.lit(0))
        .alias("ellipsis_end"),
    )
    r_word_count = F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
    r_mean_len = (F.col("char_sum") >= 3 * F.col("n_words")) & (
        F.col("char_sum") <= 10 * F.col("n_words")
    )
    r_alpha = 5 * F.col("alpha_words") >= 4 * F.col("n_words")
    r_stopwords = F.col("stop_count") >= 2
    r_symbol = 10 * F.col("symbol_count") <= F.col("n_words")
    r_line_shape = (F.col("bullet_start") == 0) & (F.col("ellipsis_end") == 0)
    as01 = lambda c, name: F.when(c, F.lit(1)).otherwise(F.lit(0)).alias(name)  # noqa: E731
    return feats.select(
        "doc_id",
        "n_words",
        "char_sum",
        "alpha_words",
        "stop_count",
        "symbol_count",
        as01(r_word_count, "r_word_count"),
        as01(r_mean_len, "r_mean_len"),
        as01(r_alpha, "r_alpha"),
        as01(r_stopwords, "r_stopwords"),
        as01(r_symbol, "r_symbol"),
        as01(r_line_shape, "r_line_shape"),
        as01(
            r_word_count
            & r_mean_len
            & r_alpha
            & r_stopwords
            & r_symbol
            & r_line_shape,
            "keep",
        ),
    )


# ------------------------------------------------------- token-budget recipe

_BUDGET_DIV = 2  # global budget = total corpus tokens / 2
_MICRO = 1_000_000
_MIX_SEED = "budgetmix:"


def token_budget_recipe(c):
    """Per-source recipe table: (source, n_docs, n_tokens, sm) →
    (source, n_docs, n_tokens, weight_micro, epochs_micro).

    The epochs numerator ``budget · sm · 1e6`` reaches ~1e25 at real
    100 TB token counts (~1e13 tokens/source → sm ~3e6), far past BIGINT,
    so the multiply-then-divide runs in a DECIMAL(38,0) lane: Spark decimal
    multiplication is exact up to 38 digits and ``div`` on decimals
    performs exact integral division returning BIGINT — same values as the
    narrow lane wherever that one didn't overflow, exact where it would
    have (r9 VERDICT #3; the DuckDB oracle widens identically via HUGEINT).
    Pinned against Python bignum math at 100 TB-scale token counts in
    tests/test_token_budget_lane.py. Exposed separately from
    q_token_budget_mix so that test can feed synthetic aggregates without
    manufacturing 10^13 tokens of corpus."""
    allw = Window.partitionBy()
    return c.select(
        "source",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(allw).alias("total_tok"),
        F.sum("sm").over(allw).alias("total_sm"),
        "sm",
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(f"(sm * {_MICRO}) div total_sm").alias("weight_micro"),
        F.expr(
            f"(CAST(total_tok div {_BUDGET_DIV} AS DECIMAL(38,0))"
            f" * sm * {_MICRO})"
            f" div (CAST(total_sm AS DECIMAL(38,0)) * n_tokens)"
        ).alias("epochs_micro"),
    )


@query(
    "q_token_budget_mix",
    oracle=f"""
WITH per_doc AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok,
         ({duckdb_hash64_sql("doc_id", _MIX_SEED)}) % {_MICRO} AS u_micro
  FROM documents
),
c AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         CAST(ROUND(sqrt(CAST(SUM(n_tok) AS DOUBLE))) AS BIGINT) AS sm
  FROM per_doc GROUP BY source
),
t AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tok,
         CAST(SUM(sm) AS BIGINT) AS total_sm
  FROM c
),
r AS (
  SELECT c.source, c.n_docs, c.n_tokens,
         (c.sm * {_MICRO}) // t.total_sm AS weight_micro,
         CAST((CAST(t.total_tok // {_BUDGET_DIV} AS HUGEINT) * c.sm * {_MICRO})
           // (CAST(t.total_sm AS HUGEINT) * c.n_tokens) AS BIGINT) AS epochs_micro
  FROM c CROSS JOIN t
),
frac AS (
  SELECT d.source,
         COUNT(*) FILTER (WHERE d.u_micro < r.epochs_micro % {_MICRO}) AS hit_docs,
         COALESCE(CAST(SUM(d.n_tok)
           FILTER (WHERE d.u_micro < r.epochs_micro % {_MICRO}) AS BIGINT), 0)
           AS hit_tokens
  FROM per_doc d JOIN r ON r.source = d.source
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.n_tokens, r.weight_micro, r.epochs_micro,
       r.n_docs * (r.epochs_micro // {_MICRO}) + f.hit_docs AS sel_docs,
       r.n_tokens * (r.epochs_micro // {_MICRO}) + f.hit_tokens AS sel_tokens
FROM r JOIN frac f ON f.source = r.source
""",
    tags=("curation", "sampling", "recipe"),
)
def q_token_budget_mix(spark, sf_dir):
    """Data-recipe execution, LLaMA-style: split a global token budget
    (half the corpus) across sources with weights proportional to
    sqrt(source tokens) — the balanced recipe that upsamples small curated
    sources — and emit each source's allocation as EPOCHS: an integer
    number of full passes plus a deterministic fractional pass
    (``stable_hash64(doc_id) % 1e6 < epochs_micro % 1e6``). Small sources
    get epochs > 1 (repetition — the mechanic q_lang_temperature_mix's
    keep-rates ≤ 1 cannot express); large ones get a fractional subsample.
    Output is the recipe audit table: per source, corpus counts, the
    micro-unit weight and epoch allocation, and the exact selected
    doc/token counts the allocation realizes.

    Exactness: sqrt only on #sources aggregate values (correctly rounded
    per IEEE-754 in both engines — the q_lang_temperature_mix precedent),
    then everything is exact integer floor division on non-negative
    operands (Spark ``div`` == DuckDB ``//``); the fractional-pass
    membership is the shared md5 hash. The epochs product (budget · sm ·
    1e6) would overflow BIGINT past ~sf30, so it runs in a DECIMAL(38,0)
    lane (HUGEINT in the oracle) — exact integer math to ~1e38, i.e. the
    expression is correct at real 100 TB token counts, not merely at the
    tested scale factors (see :func:`token_budget_recipe` and
    tests/test_token_budget_lane.py).

    Scale shape: one map-side-combined aggregate to the #sources recipe
    table, totals via a single-partition window over that tiny table (not
    a second corpus scan — the q_lang_temperature_mix CSE note), recipe
    joined back BROADCAST, fractional-pass counts partial-aggregated
    in-scan. The corpus never shuffles."""
    d = table(spark, sf_dir, "documents")
    per_doc = d.select(
        "doc_id",
        "source",
        F.size(F.expr(_SPARK_TOKENS)).cast("bigint").alias("n_tok"),
        (stable_hash64("doc_id", _MIX_SEED) % _MICRO).alias("u_micro"),
    )
    c = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.sqrt(F.sum("n_tok").cast("double"))).cast("bigint").alias("sm"),
    )
    r = token_budget_recipe(c)
    frac = (
        per_doc.join(F.broadcast(r.select("source", "epochs_micro")), "source")
        .groupBy("source")
        .agg(
            F.count(
                F.when(F.col("u_micro") < F.col("epochs_micro") % _MICRO, 1)
            ).alias("hit_docs"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("u_micro") < F.col("epochs_micro") % _MICRO,
                        F.col("n_tok"),
                    )
                ),
                F.lit(0),
            ).alias("hit_tokens"),
        )
    )
    return r.join(frac, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "weight_micro",
        "epochs_micro",
        (
            F.col("n_docs") * F.expr(f"epochs_micro div {_MICRO}")
            + F.col("hit_docs")
        ).alias("sel_docs"),
        (
            F.col("n_tokens") * F.expr(f"epochs_micro div {_MICRO}")
            + F.col("hit_tokens")
        ).alias("sel_tokens"),
    )


# ------------------------------------------------- interpolated bigram LM

#: Jelinek-Mercer interpolation weight λ = 0.7: p(w|prev) = λ·p_ml(w|prev)
#: + (1−λ)·p_add1(w). Both engines evaluate the SAME fixed-shape double
#: expression (every operand explicitly CAST to DOUBLE — the bm25 ADVICE
#: class: DuckDB parses bare 0.7 as DECIMAL) on the BOUNDED bigram vocab
#: table, then ROUND to 1e-4-nat BIGINT; per-document scores are exact
#: integer sums, so engine parity survives any aggregation order.
_LAMBDA = "CAST(0.7 AS DOUBLE)"
_ONE_MINUS_LAMBDA = "CAST(0.3 AS DOUBLE)"
_FP = 10000

#: Jelinek-Mercer lane expressions over the TRAINING-AGGREGATE columns —
#: smoothed unigram term over (uc, n, v); interpolated bigram over
#: (c, pc, uc, n, v); OOV floor over (n, v). All probability math runs in
#: the DOUBLE lane (counts at 2.5e13 are exact doubles — < 2^53) and lands
#: as 1e-4-nat BIGINT micro-units, |lp_micro| ≤ ~60·1e4, so the per-doc
#: integer fold Σ cnt·lp_micro stays under 2^63 until a single document
#: holds ~1.5e13 transitions. The 1e13-scale lane sweep
#: (tests/test_fixed_point_lanes.py) drives exactly these strings.
P_UNI_SQL = (
    f"({_ONE_MINUS_LAMBDA} * (CAST(uc AS DOUBLE) + CAST(1 AS DOUBLE))"
    f" / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE)))"
)
P_BI_SQL = f"({_LAMBDA} * CAST(c AS DOUBLE) / CAST(pc AS DOUBLE))"
BIGRAM_LP_MICRO_SQL = f"CAST(ROUND(ln({P_BI_SQL} + {P_UNI_SQL}) * {_FP}) AS BIGINT)"
BACKOFF_LP_MICRO_SQL = f"CAST(ROUND(ln({P_UNI_SQL}) * {_FP}) AS BIGINT)"
OOV_LP_MICRO_SQL = (
    f"CAST(ROUND(ln({_ONE_MINUS_LAMBDA} * CAST(1 AS DOUBLE)"
    f" / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE))) * {_FP}) AS BIGINT)"
)


def _duck_bigram_lm_sql() -> str:
    p_uni = "({OML} * (CAST(u.c AS DOUBLE) + CAST(1 AS DOUBLE)) / (CAST(t.n AS DOUBLE) + CAST(t.v AS DOUBLE)))".format(
        OML=_ONE_MINUS_LAMBDA
    )
    p_bi = (
        f"({_LAMBDA} * CAST(b.c AS DOUBLE) / CAST(p.c AS DOUBLE))"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, lang, {_DUCK_TOKENS} AS toks
  FROM documents WHERE length(trim(text)) > 0
),
idx AS (
  SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i FROM tok
),
pairs AS (
  SELECT doc_id, lang, toks[i] AS prev, toks[i + 1] AS w FROM idx
),
uni AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest(toks) AS term FROM tok WHERE lang = 'en')
  GROUP BY term
),
totals AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM uni),
bg AS (
  SELECT prev, w, COUNT(*) AS c FROM pairs WHERE lang = 'en' GROUP BY prev, w
),
prevc AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS c FROM bg GROUP BY prev),
bg_lp AS (
  SELECT b.prev, b.w,
         CAST(ROUND(ln({p_bi} + {p_uni}) * {_FP}) AS BIGINT) AS lp_micro
  FROM bg b JOIN prevc p ON p.prev = b.prev
  JOIN uni u ON u.term = b.w, totals t
),
backoff AS (
  SELECT u.term AS w,
         CAST(ROUND(ln({p_uni}) * {_FP}) AS BIGINT) AS lp_micro
  FROM uni u, totals t
),
doc_pairs AS (
  SELECT doc_id, prev, w, COUNT(*) AS cnt FROM pairs GROUP BY doc_id, prev, w
),
scored AS (
  SELECT d.doc_id,
         CAST(SUM(d.cnt) AS BIGINT) AS n_bigrams,
         CAST(SUM(d.cnt * COALESCE(b.lp_micro, k.lp_micro,
             CAST(ROUND(ln({_ONE_MINUS_LAMBDA} * CAST(1 AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) + CAST(t.v AS DOUBLE))) * {_FP}) AS BIGINT)))
           AS BIGINT) AS logprob_micro
  FROM doc_pairs d
  LEFT JOIN bg_lp b ON b.prev = d.prev AND b.w = d.w
  LEFT JOIN backoff k ON k.w = d.w, totals t
  GROUP BY d.doc_id
)
SELECT doc_id, n_bigrams, logprob_micro,
       CAST(-logprob_micro AS DOUBLE)
         / (CAST(n_bigrams AS DOUBLE) * {_FP}) AS xent_nats
FROM scored
"""


@query(
    "q_bigram_logprob",
    oracle=_duck_bigram_lm_sql(),
    tags=("curation", "lm", "quality"),
)
def q_bigram_logprob(spark, sf_dir):
    """Interpolated bigram LM scoring — the step from q_unigram_logprob
    toward CCNet's real n-gram LM: per-transition log-probability
    ``ln(λ·p_ml(w|prev) + (1−λ)·p_add1(w))`` under a model trained on the
    trusted ``lang='en'`` slice, Jelinek-Mercer λ = 0.7. A seen bigram
    scores near its corpus transition frequency; an unseen bigram of a
    known word backs off to (1−λ)·its smoothed unigram; an OOV word gets
    the floor. Documents with ≥ 2 tokens are scored over their n−1
    transitions; ``xent_nats`` is the filter statistic.

    Determinism: all three log-prob tables are BOUNDED (bigram vocab,
    unigram vocab, 1-row floor) — ln is evaluated there, rounded to
    1e-4-nat BIGINT micro-units, and per-document scores are exact
    integer folds (the module's standard contract).

    Scale shape: training aggregates are map-side-combined groupBys on
    uniform (prev, w)/(term) keys; the bigram LM is vocab²-scale so
    scoring is a (prev, w)-keyed SHUFFLE join (never broadcast), with the
    unigram-backoff join on w and the 1-row totals broadcast — the same
    topology as q_unigram_logprob one order up. The doc side aggregates
    (doc, prev, w) occurrences first, so the join input carries distinct
    transitions, not the token stream."""
    d = table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    tok = d.select("doc_id", "lang", F.expr(_SPARK_TOKENS).alias("toks"))
    # (prev, w) transition pairs: posexplode over the materialized toks
    # column (inline split inside a lambda is the O(tokens^2) class)
    pairs = tok.select(
        "doc_id",
        "lang",
        "toks",
        F.posexplode(
            F.expr("CASE WHEN size(toks) < 2 THEN array() "
                   "ELSE slice(toks, 1, size(toks) - 1) END")
        ).alias("i", "prev"),
    ).select(
        "doc_id", "lang", "prev", F.expr("element_at(toks, i + 2)").alias("w")
    )
    words = tok.where(F.col("lang") == "en").select(
        F.explode("toks").alias("term")
    )
    # uni/bg stay un-checkpointed: lazy localCheckpoints here were tried
    # in the r16 optimization round and measured slower in the interleaved
    # A/B — the re-executed subtrees are map-side-combined aggregates,
    # cheaper than the checkpoints' extra materialization jobs
    uni = words.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = uni.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    bg = (
        pairs.where(F.col("lang") == "en")
        .groupBy("prev", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    prevc = bg.groupBy("prev").agg(F.sum("c").alias("pc"))
    bg_lp = (
        bg.join(prevc, "prev")
        .join(uni.select(F.col("term").alias("w"), F.col("c").alias("uc")), "w")
        .join(F.broadcast(totals))
        .select("prev", "w", F.expr(BIGRAM_LP_MICRO_SQL).alias("lp_micro"))
    )
    backoff = (
        uni.select(F.col("term").alias("w"), F.col("c").alias("uc"))
        .join(F.broadcast(totals))
        .select("w", F.expr(BACKOFF_LP_MICRO_SQL).alias("lp_micro"))
    )
    oov = F.expr(OOV_LP_MICRO_SQL)
    doc_pairs = pairs.groupBy("doc_id", "prev", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    scored = (
        doc_pairs.join(bg_lp, ["prev", "w"], "left")
        .join(
            backoff.withColumnRenamed("lp_micro", "lp_bo"), "w", "left"
        )
        .join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(
                F.col("cnt")
                * F.coalesce("lp_micro", "lp_bo", oov)
            ).alias("logprob_micro"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "logprob_micro",
        (
            (-F.col("logprob_micro")).cast("double")
            / (F.col("n_bigrams").cast("double") * _FP)
        ).alias("xent_nats"),
    )


# --------------------------------------------------- composite: modern stack


def _duck_modern_pipeline_sql() -> str:
    from video_data_pipeline_spark.queries.dedup import _DUCK_REPS

    return f"""
WITH gopher AS (
  SELECT doc_id FROM ({DUCK_GOPHER_SQL}) WHERE keep = 1
),
ppl AS (
  SELECT doc_id, lang, bucket FROM ({DUCK_PPL_SQL}) WHERE bucket <> 'tail'
),
reps AS ({_DUCK_REPS}),
kept AS (
  SELECT p.doc_id, p.lang, p.bucket
  FROM ppl p
  JOIN gopher g USING (doc_id)
  JOIN reps r ON r.doc_id = p.doc_id
),
toks AS (
  SELECT k.lang, k.bucket,
         CAST(len(string_split_regex(trim(d.text), ' +')) AS BIGINT) AS n_tok
  FROM kept k JOIN documents d USING (doc_id)
)
SELECT lang, bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM toks GROUP BY lang, bucket
"""


@query(
    "q_modern_curation_pipeline",
    oracle=_duck_modern_pipeline_sql(),
    tags=("curation", "pipeline", "quality", "dedup"),
)
def q_modern_curation_pipeline(spark, sf_dir):
    """The MODERN pretraining-data curation stack as ONE lazy plan —
    Gopher ruleset (keep) → CCNet perplexity split (drop the tail third
    per language) → exact-dup survivorship (min-doc_id representative per
    content fingerprint) → per-(lang, bucket) intake audit with doc and
    token counts. This composes the round-9 operators the way
    q_curation_pipeline composes the round-4 ones: each stage is the
    operator its standalone query proves; chained, Catalyst pipelines the
    Gopher projection into the scan, the perplexity path adds its bounded
    histogram + broadcast thresholds, and the rep semi-join shuffles on
    the uniform content md5 — three doc_id-keyed equi-joins stitch the
    verdicts, no stage re-reads text except the final token count.

    At 100 TB this is the nightly "what made it into the training set"
    report: rejection happens in the cheap in-scan stages first (Gopher),
    the LM stage touches only survivors' term streams, and the output is
    a #langs×2-row audit table."""
    g = q_gopher_rules(spark, sf_dir).where(F.col("keep") == 1).select("doc_id")
    p = q_perplexity_buckets(spark, sf_dir).where(F.col("bucket") != "tail")
    from video_data_pipeline_spark.queries.dedup import exact_dup_representatives

    reps = exact_dup_representatives(table(spark, sf_dir, "documents")).select(
        "doc_id"
    )
    d = table(spark, sf_dir, "documents")
    kept = (
        p.select("doc_id", "lang", "bucket")
        .join(g, "doc_id")
        .join(reps, "doc_id")
    )
    toks = kept.join(
        d.select(
            "doc_id", F.size(F.expr(_SPARK_TOKENS)).cast("bigint").alias("n_tok")
        ),
        "doc_id",
    )
    return toks.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
