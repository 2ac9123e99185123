"""Corpus-analysis queries: KMV distinct sketch, hashed linear classifier,
MAD outlier detection, positional phrase match.

Beyond-reference extensions a 100 TB curation pipeline needs:

- ``q_kmv_distinct`` — per-language distinct-content cardinality from a
  KMV (bottom-k minimum values) sketch (Bar-Yossef et al. 2002): keep the
  k smallest distinct 48-bit content hashes, estimate ``(k-1)·2^48 / h_k``.
  The sketch is a bounded (≤ k-row) mergeable state per group, so the
  shuffle carries at most ``salts·k`` rows per language no matter the
  corpus size — the distinct-count analogue of what Count-Min is to
  frequency. The exact count rides along so the estimation error is
  audit-visible (same contract as ``q_countmin_freq``).
- ``q_quality_classifier`` — fastText-shaped quality scoring (Joulin et
  al. 2016): tokens hash into 2^12 feature buckets, a 4096-row weight
  table joins by broadcast, and the per-document score is one map-side
  partial-aggregated sum. This is the serving plan for ANY hashed linear
  model at 100 TB: the corpus shuffles once on doc_id, the model never
  shuffles at all. Weights here are a seeded pure function of the bucket
  id (deterministic stand-in for trained parameters — swapping in a real
  model changes the table contents, not the plan).
- ``q_mad_outliers`` — robust per-language length outliers: discrete
  median + median-absolute-deviation via exact order-statistic SELECTION
  (the q_grouped_quantiles rank math — no interpolation, no floats), flag
  documents with ``dev > 1.5·MAD`` (integer form ``2·dev > 3·MAD``).
  Unlike mean/stddev screens, a heavy tail cannot drag the threshold.
- ``q_phrase_match`` — exact phrase search over a positional postings
  list: posexplode → filter to the phrase's terms AT THE SCAN (the
  postings for a 2-term phrase are a sliver of the token stream) →
  self-equi-join on (doc_id, pos+1). The join-on-adjacency form is how a
  distributed engine answers phrase queries without re-scanning text —
  n-gram containment (q_decontaminate) tells you THAT a phrase occurs,
  this yields per-document hit counts from index-shaped inputs.

Determinism: every hash is an md5-prefix with identical text in both
dialects; all scores/ranks are BIGINT; ties in order statistics are broken
by doc_id. Reference parity: the reference has no analysis tier (its
closest is the tokenize stage's ad-hoc Python Counters, tokenize/main.py);
these are the distributed forms.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.common import DUCK_HASH, SPARK_HASH
from video_data_pipeline_spark.queries.registry import query, spread, table

# 48-bit md5-prefix hash: (k-1)·2^48 stays far inside BIGINT so the KMV
# estimate is pure integer floor division in both engines. Hash collisions
# merge keys identically in both engines, so parity is width-independent.
_HASH48_SPARK = "CAST(conv(substr(md5({x}), 1, 12), 16, 10) AS BIGINT)"
_HASH48_DUCK = "(('0x' || substr(md5({x}), 1, 12))::BIGINT)"

# ------------------------------------------------------------------- kmv

_KMV_K = 32
_KMV_SALTS = 64
_M48 = 1 << 48
_FP = "lower(trim(text))"  # q_dedup_exact's content fingerprint text


@query(
    "q_kmv_distinct",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT lang, {_HASH48_DUCK.format(x=_FP)} AS h FROM documents
),
ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM h
),
sk AS (
  SELECT lang, COUNT(*) AS k_eff, MAX(h) AS h_k
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY lang
),
truth AS (SELECT lang, COUNT(*) AS true_distinct FROM h GROUP BY lang)
SELECT s.lang, s.k_eff,
       CASE WHEN s.k_eff < {_KMV_K} THEN s.k_eff
            ELSE ({_KMV_K - 1} * {_M48}) // s.h_k END AS est_distinct,
       t.true_distinct
FROM sk s JOIN truth t USING (lang)
""",
    tags=("sketch", "dedup"),
)
def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-content estimate per language. Bottom-k is merge-
    associative, so it runs as two rank-limited windows: per (lang, salt)
    slice first — Spark's WindowGroupLimit pushes the ``rank <= k`` filter
    BELOW the exchange, so each map task emits at most k rows per slice —
    then per lang over the ≤ salts·k survivors. ``k_eff < k`` means the
    sketch saw every distinct value and the estimate is exact by
    construction. The oracle computes the same bottom-k directly (the salt
    decomposition is invisible to the result). The exact distinct count
    rides along as the audit column — that branch is the harness's
    error-visibility contract, not part of the sketch: production drops
    it, and with it the plan's only corpus-wide exchange."""
    d = table(spark, sf_dir, "documents")
    h = F.expr(_HASH48_SPARK.format(x=_FP)).alias("h")
    hashed = d.select("lang", h, (F.col("doc_id") % _KMV_SALTS).alias("salt"))
    w1 = Window.partitionBy("lang", "salt").orderBy("h")
    cand = (
        hashed.withColumn("dr", F.dense_rank().over(w1))
        .where(F.col("dr") <= _KMV_K)
        .select("lang", "h")
        .distinct()
    )
    w2 = Window.partitionBy("lang").orderBy("h")
    bottom = cand.withColumn("rn", F.row_number().over(w2)).where(
        F.col("rn") <= _KMV_K
    )
    sketch = bottom.groupBy("lang").agg(
        F.count(F.lit(1)).alias("k_eff"), F.max("h").alias("h_k")
    )
    truth = (
        d.select("lang", F.expr(_HASH48_SPARK.format(x=_FP)).alias("h"))
        .distinct()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("true_distinct"))
    )
    est = F.expr(
        f"CASE WHEN k_eff < {_KMV_K} THEN k_eff"
        f" ELSE CAST({_KMV_K - 1} AS BIGINT) * {_M48} div h_k END"
    )
    return sketch.join(truth, "lang").select(
        "lang", "k_eff", est.alias("est_distinct"), "true_distinct"
    )


# ------------------------------------------------------- quality classifier

_QC_BUCKETS = 4096
# weight(bucket) = hash60('w#' || bucket) % 2001 - 1000 micro-units: a
# seeded, deterministic stand-in for trained parameters.


@query(
    "q_quality_classifier",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         {DUCK_HASH.format(x='k')} % {_QC_BUCKETS} AS bucket
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS k
        FROM documents)
),
weights AS (
  SELECT r AS bucket,
         ({DUCK_HASH.format(x="'w#' || CAST(r AS VARCHAR)")} % 2001) - 1000 AS w
  FROM range({_QC_BUCKETS}) t(r)
)
SELECT t.doc_id, CAST(SUM(w.w) AS BIGINT) AS score_micro,
       SUM(w.w) > 0 AS keep
FROM toks t JOIN weights w USING (bucket)
GROUP BY t.doc_id
""",
    tags=("text", "curation"),
)
def q_quality_classifier(spark, sf_dir):
    """Hashed-feature linear classifier serving plan: explode tokens,
    hash into 2^12 buckets, broadcast-join the 4096-row weight table, sum
    per document (map-side partial agg — the only exchange is the final
    doc_id hash agg). BIGINT micro-unit weights keep the score an exact
    order-free sum. At 100 TB the model side is O(buckets) regardless of
    corpus size; a trained fastText/logreg swaps the weight table contents
    without touching the plan."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("k")
    )
    bucketed = toks.select(
        "doc_id",
        (F.expr(SPARK_HASH.format(x="k")) % _QC_BUCKETS).alias("bucket"),
    )
    weights = spark.range(_QC_BUCKETS).select(
        F.col("id").alias("bucket"),
        F.expr(
            f"({SPARK_HASH.format(x=chr(34))} % 2001) - 1000".replace(
                chr(34), "concat('w#', CAST(id AS STRING))"
            )
        ).alias("w"),
    )
    return (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("score_micro"))
        .select(
            "doc_id", "score_micro", (F.col("score_micro") > 0).alias("keep")
        )
    )


# ------------------------------------------------------------ mad outliers


def _median_from_counts(counts, value_col: str):
    """Discrete median per lang from a (lang, value, cnt) table: the first
    value whose cumulative count reaches ceil(n/2). Windows run over the
    ≤ |langs|·|distinct values| aggregate, never the corpus."""
    w = Window.partitionBy("lang").orderBy(value_col)
    wl = Window.partitionBy("lang")
    cum = counts.select(
        "lang",
        value_col,
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(wl).alias("n"),
    )
    r = F.expr("(50 * n + 99) div 100")
    return cum.where((F.col("cum_prev") < r) & (r <= F.col("cum"))).select(
        "lang", F.col(value_col)
    )


@query(
    "q_mad_outliers",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
med AS (
  SELECT lang, n_chars AS med FROM ranked WHERE rn = (50 * n + 99) // 100
),
dev AS (
  SELECT d.doc_id, d.lang, d.n_chars, m.med,
         abs(d.n_chars - m.med) AS dev
  FROM documents d JOIN med m USING (lang)
),
ranked2 AS (
  SELECT lang, dev,
         row_number() OVER (PARTITION BY lang ORDER BY dev, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM dev
),
mad AS (
  SELECT lang, dev AS mad FROM ranked2 WHERE rn = (50 * n + 99) // 100
)
SELECT d.doc_id, d.lang, d.n_chars, d.med, m.mad
FROM dev d JOIN mad m USING (lang)
WHERE 2 * d.dev > 3 * m.mad
""",
    tags=("curation", "stats"),
)
def q_mad_outliers(spark, sf_dir):
    """Robust per-language length outliers via median-from-value-counts:
    ``n_chars`` is a bounded-range measure, so the exact median needs only
    the (lang, n_chars) -> count aggregate — a map-side-combined groupBy
    whose exchange carries ≤ |langs|·|distinct lengths| rows no matter the
    corpus size. Median = first value whose cumulative count reaches
    ceil(n/2); MAD re-aggregates the SAME tiny table by |value − med| and
    cumulates again; both windows sort hundreds of rows, never documents.
    The corpus is touched exactly twice: once for the counts (AQE's
    exchange reuse dedupes the counts subtree across the med/MAD branches
    — 2 ReusedExchange nodes in the final plan), once streaming through
    the broadcast (lang, med, mad) filter — no corpus shuffle at all (the
    naive form ranks all documents per lang — 20 TB onto one reducer at
    100 TB). Flag ``dev > 1.5·MAD`` in the integer
    form ``2·dev > 3·MAD``; median/MAD resist the heavy tails that wreck
    mean/stddev screens on crawl data. Oracle uses the rank-selection
    form — value-identical by definition of the discrete median."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    counts = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    med = _median_from_counts(counts, "n_chars").withColumnRenamed(
        "n_chars", "med"
    )
    dev_counts = (
        counts.join(F.broadcast(med), "lang")
        .groupBy("lang", F.abs(F.col("n_chars") - F.col("med")).alias("dev"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = _median_from_counts(dev_counts, "dev").withColumnRenamed(
        "dev", "mad"
    )
    stats = med.join(mad, "lang")
    return (
        d.join(F.broadcast(stats), "lang")
        .withColumn("dev", F.abs(F.col("n_chars") - F.col("med")))
        .where(2 * F.col("dev") > 3 * F.col("mad"))
        .select("doc_id", "lang", "n_chars", "med", "mad")
    )


# ------------------------------------------------------------ phrase match

_PHRASE = ("agg", "join")


@query(
    "q_phrase_match",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents
),
hits AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks)),
             i -> toks[i] = '{_PHRASE[0]}' AND toks[i + 1] = '{_PHRASE[1]}'))
           AS n_hits
  FROM t
)
SELECT doc_id, n_hits FROM hits WHERE n_hits > 0
""",
    tags=("text",),
)
def q_phrase_match(spark, sf_dir):
    """Exact phrase query ('agg join') via positional postings: posexplode
    the token stream, keep ONLY the phrase's two terms (the filter sits
    directly on the generator output, so the postings that shuffle are a
    sliver of the corpus), then equi-join first-term postings to
    second-term postings on (doc_id, pos+1) and count adjacencies per
    document. This is the index-shaped phrase plan — at 100 TB the
    positional join touches |postings(w1)| + |postings(w2)| rows, not the
    corpus. The oracle recomputes adjacency per document with a list
    lambda."""
    d = table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " +")).alias("pos", "term"),
    ).where(F.col("term").isin(*_PHRASE))
    p1 = postings.where(F.col("term") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = postings.where(F.col("term") == _PHRASE[1]).select(
        "doc_id", F.col("pos").alias("pos2")
    )
    return (
        p1.join(
            p2,
            (p1.doc_id == p2.doc_id) & (p2.pos2 == p1.pos1 + 1),
        )
        .groupBy(p1.doc_id.alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# --------------------------------------------------- content-defined chunks

_CDC_MOD = 64  # expected chunk length ~64 chars
_CDC_W = 4  # boundary decided by the 4-gram ending at each position


def _bound_expr(dialect: str) -> str:
    """Positions i where hash60(4-gram ending at i) % 64 == 0."""
    if dialect == "spark":
        h = SPARK_HASH.format(x=f"substring(text, i - {_CDC_W - 1}, {_CDC_W})")
        return (
            f"filter(IF(length(text) >= {_CDC_W}, "
            f"sequence({_CDC_W}, length(text)), array()), "
            f"i -> {h} % {_CDC_MOD} = 0)"
        )
    h = DUCK_HASH.format(x=f"substr(text, i - {_CDC_W - 1}, {_CDC_W})")
    return (
        f"list_filter(range({_CDC_W}, len(text) + 1), "
        f"i -> {h} % {_CDC_MOD} = 0)"
    )


@query(
    "q_cdc_chunks",
    oracle=f"""
WITH b AS (
  SELECT doc_id, text, len(text) AS n, {_bound_expr('duck')} AS bounds
  FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(bounds) + 2), j ->
           substr(text,
             CASE WHEN j = 1 THEN 1 ELSE bounds[j - 1] + 1 END,
             (CASE WHEN j = len(bounds) + 1 THEN n ELSE bounds[j] END)
               - (CASE WHEN j = 1 THEN 1 ELSE bounds[j - 1] + 1 END) + 1)))
           AS chunk
  FROM b
)
SELECT md5(chunk) AS chunk_hash, COUNT(*) AS n_occ,
       COUNT(DISTINCT doc_id) AS n_docs
FROM chunks WHERE chunk <> ''
GROUP BY 1 HAVING COUNT(*) > 1
""",
    tags=("dedup",),
)
def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (Rabin/LBFS lineage — Muthitacharoen et
    al. 2001): a chunk boundary falls wherever the hash of the 4-gram
    ENDING at a position is ≡ 0 (mod 64), so boundaries move with the
    content — an insertion reshuffles one chunk, not every fixed-width
    block after it (the property that makes CDC the storage-dedup
    standard for blobs). Shared chunks across documents then surface with
    one hash groupBy.

    The no-size-constraint Rabin form is embarrassingly parallel, so the
    whole operator is per-row JVM column math — filter/transform/substring
    lambdas, no UDF, no sequential scan — and the ONLY shuffle is the
    map-side-combined chunk-hash aggregate. At 100 TB: chunking cost is
    one codegen'd pass over bytes; the dedup exchange carries (hash,
    count) partials, never chunk text... the md5 groupBy key here keeps
    the demo self-auditing. (FastCDC's min/max-size rules re-introduce a
    sequential dependence — that variant would be a mapInPandas kernel;
    the boundary-hash math stays identical.)"""
    # spread before chunking (r16): the boundary expression computes one
    # md5 per CHARACTER position, and the bench corpus scans as a single
    # row-group — without the spread all of it ran in one task (measured
    # ~3.7 s of single-core time; guide §2.5 input skew)
    d = spread(table(spark, sf_dir, "documents"))
    b = d.select("doc_id", "text", F.expr(_bound_expr("spark")).alias("bounds"))
    chunk = F.expr(
        """
        transform(sequence(1, size(bounds) + 1), j ->
          substring(text,
            IF(j = 1, 1, element_at(bounds, j - 1) + 1),
            IF(j = size(bounds) + 1, length(text), element_at(bounds, j))
              - IF(j = 1, 1, element_at(bounds, j - 1) + 1) + 1))
        """
    )
    chunks = b.select("doc_id", F.explode(chunk).alias("chunk")).where(
        F.col("chunk") != ""
    )
    return (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occ") > 1)
    )


# ------------------------------------------------------ conjunctive search

_SPARK_TOKENS_ANALYSIS = "split(trim(text), ' +')"
_DUCK_TOKENS_ANALYSIS = "string_split_regex(trim(text), ' +')"
_AND_TERMS = ("window", "scan", "merge")


@query(
    "q_boolean_and_search",
    oracle=f"""
WITH postings AS (
  SELECT doc_id, unnest({_DUCK_TOKENS_ANALYSIS}) AS term FROM documents
),
hits AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM postings
  WHERE term IN {_AND_TERMS!r} GROUP BY doc_id, term
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       CAST(MIN(tf) AS BIGINT) AS min_tf
FROM hits GROUP BY doc_id
HAVING COUNT(*) = {len(_AND_TERMS)}
""",
    tags=("text", "search"),
)
def q_boolean_and_search(spark, sf_dir):
    """Conjunctive boolean search ('window AND scan AND merge') over an
    index-shaped postings plan: explode tokens, keep ONLY the query's
    terms at the generator (the postings that shuffle are a sliver of the
    token stream), aggregate per (doc, term), and intersect the postings
    lists with a count-of-terms HAVING — the distributed form of a k-way
    postings intersection, no self-joins. Output carries the tf evidence
    an IR ranker consumes (total tf + the rarest-term tf that bounds any
    AND-semantics score). Completes the IR trio: q_phrase_match (position
    adjacency), q_bm25 (ranked relevance), this (boolean retrieval).

    At 100 TB: filter-at-the-generator means the exchange carries
    |postings(t1)| + |postings(t2)| + |postings(t3)| partial-agg'd rows
    (map-side combine collapses per-task repeats), never the corpus; the
    HAVING count is evaluated in the same aggregate. One shuffle total."""
    d = table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id", F.explode(F.expr(_SPARK_TOKENS_ANALYSIS)).alias("term")
    ).where(F.col("term").isin(*_AND_TERMS))
    per_term = postings.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("total_tf"),
            F.min("tf").alias("min_tf"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .where(F.col("n_terms") == len(_AND_TERMS))
        .select("doc_id", "total_tf", "min_tf")
    )
