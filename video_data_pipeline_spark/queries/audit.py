"""Sketch-accuracy audits: measured error of the approximate operators.

``q_ann_recall`` (queries/similarity.py) established the harness policy
that every approximation ships with a query that MEASURES it. This module
extends that policy to the dedup sketches:

- ``q_minhash_estimate``: per LSH candidate pair, the MinHash similarity
  estimate (matching signature components / k) side-by-side with the EXACT
  shingle Jaccard — the calibration table that tells an operator whether
  k=8 signatures are tight enough for their dedup threshold, measured on
  their own corpus rather than assumed from E[match] = J theory.

Scale shape: estimates are computed only on LSH CANDIDATE pairs (the
output of the production banding plan), so the audit costs O(|candidates|)
joins by uniform doc_id keys — it never rescans or re-pairs the corpus.
At 100 TB you'd run it on a sampled partition of pairs; the plan is
unchanged by sampling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.dedup import (
    _DUCK_REPS,
    _DUCK_SHINGLES,
    _DUCK_WORDS,
    _N_HASHES,
    DEFAULT_LSH_MAX_BUCKET_SIZE,
    _duck_lsh_pairs_sql,
    _duck_signatures_sql,
    exact_dup_representatives,
    lsh_pairs_from_bands,
    minhash_bands,
    signatures,
)
from video_data_pipeline_spark.checkpoint import checkpoint_frame
from video_data_pipeline_spark.queries.registry import query, table

_SPARK_SHINGLE_SET = (
    "array_distinct(transform(sequence(0, size(w) - 3), "
    "i -> concat_ws(' ', w[i], w[i+1], w[i+2])))"
)


def _duck_minhash_estimate_sql() -> str:
    matches = " + ".join(
        f"(CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END)"
        for j in range(_N_HASHES)
    )
    inter = "len(list_intersect(ta.sh, tb.sh))"
    jac = f"CAST({inter} AS DOUBLE) / (len(ta.sh) + len(tb.sh) - {inter})"
    return f"""
WITH reps AS ({_DUCK_REPS}),
pairs AS ({_duck_lsh_pairs_sql("reps")}),
sig AS ({_duck_signatures_sql("reps")}),
sets AS (
  SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS sh
  FROM reps WHERE len({_DUCK_WORDS}) >= 3
)
SELECT p.doc_a, p.doc_b,
       CAST({matches} AS BIGINT) AS est_matches,
       {jac} AS jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_a
JOIN sig sb ON sb.doc_id = p.doc_b
JOIN sets ta ON ta.doc_id = p.doc_a
JOIN sets tb ON tb.doc_id = p.doc_b
"""


@query(
    "q_minhash_estimate",
    oracle=_duck_minhash_estimate_sql(),
    tags=("dedup", "minhash", "audit"),
)
def q_minhash_estimate(spark, sf_dir):
    """MinHash estimate calibration: for every rep-level LSH candidate
    pair, the sketch's similarity estimate (``est_matches`` of k=8
    signature components agreeing; E[est/k] = true Jaccard) next to the
    EXACT shingle Jaccard. This is the table behind every k/band/τ tuning
    decision: it shows, on the operator's own corpus, how often banding
    surfaces pairs whose true similarity is below their intended dedup
    threshold (LSH false positives are expected and cheap — they cost one
    verification; what the audit guards is the estimate's calibration, the
    thing q_jaccard_verified_pairs trusts to order its work).

    Plan: the production banding plan produces the pairs; signatures and
    shingle sets attach via four uniform doc_id equi-joins over the
    REP-sized tables (never the raw corpus). No new corpus scan, no new
    pairing — the audit piggybacks on exactly what production computes.
    Exactness: est_matches is an integer CASE sum; jaccard is one double
    division of exact integer set sizes (array_intersect on distinct
    arrays == DuckDB list_intersect)."""
    reps = exact_dup_representatives(table(spark, sf_dir, "documents"))
    pairs = lsh_pairs_from_bands(
        minhash_bands(reps), max_bucket_size=DEFAULT_LSH_MAX_BUCKET_SIZE
    )
    sig = signatures(reps)
    sets = (
        reps.select("doc_id", F.expr("split(lower(trim(text)), ' +')").alias("w"))
        .where(F.expr("size(w) >= 3"))
        .select("doc_id", F.expr(_SPARK_SHINGLE_SET).alias("sh"))
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(_N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(_N_HASHES)],
    )
    ta = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    tb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    est = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(_N_HASHES)
    ).cast("bigint")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_matches"),
            jac.alias("jaccard"),
        )
    )


# --------------------------------------------------- simhash calibration

#: deterministic 1-in-16 pair sample for the calibration table: the
#: pigeonhole candidate set is dense on low-entropy corpora (271k pairs at
#: sf1 here; ~10^9 at sfp30 — see the sfp10 exclusion note), and a
#: calibration only needs a representative sample, keyed so both engines
#: and every retry pick the same pairs. Production would tune the modulus.
_CAL_SAMPLE_MOD = 16


def _duck_simhash_calibration_sql() -> str:
    from video_data_pipeline_spark.queries.dedup import (
        _CHUNK_BITS,
        _CHUNK_MASK,
        _DUCK_WORD_HASHES,
        _simhash_from_hashes,
    )

    inter = "len(list_intersect(ta.sh, tb.sh))"
    jac = f"CAST({inter} AS DOUBLE) / (len(ta.sh) + len(tb.sh) - {inter})"
    return f"""
WITH reps AS MATERIALIZED ({_DUCK_REPS}),
wh AS (SELECT doc_id, {_DUCK_WORD_HASHES} AS hs FROM reps),
sh AS (SELECT doc_id, CAST({_simhash_from_hashes("duck", "hs")} AS BIGINT) AS simhash FROM wh),
chunks AS (
  SELECT doc_id, simhash, c, (simhash >> ({_CHUNK_BITS} * c)) & {_CHUNK_MASK} AS chunk
  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS c)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM chunks a JOIN chunks b
    ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
sets AS (
  SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS sh
  FROM reps WHERE len({_DUCK_WORDS}) >= 3
)
SELECT p.doc_a, p.doc_b, CAST(p.hamming AS BIGINT) AS hamming,
       {jac} AS jaccard
FROM pairs p
JOIN sets ta ON ta.doc_id = p.doc_a
JOIN sets tb ON tb.doc_id = p.doc_b
WHERE (('0x' || substr(md5(CAST(p.doc_a AS VARCHAR) || ':' || CAST(p.doc_b AS VARCHAR)), 1, 15))::BIGINT) % {_CAL_SAMPLE_MOD} = 0
"""


def _calibration_corpus(spark, sf_dir):
    """(doc_id, simhash, sh): the 60-bit signature AND the shingle set in
    ONE pass over the rep-collapsed corpus, lazily localCheckpointed
    (r17, VERDICT r16 #3). Before this the calibration audits instantiated
    the scan → rep-collapse subtree three times per query — once inside
    the pigeonhole front for the signature md5 fold (the repo's heaviest
    per-doc expression) and once per Jaccard join side for the shingle
    split (the r16 after-plan shows 2 parquet scans + 2 rep-collapse
    exchanges surviving the pair checkpoint). Now the front consumes
    (doc_id, simhash) and both join sides consume (doc_id, sh) from the
    same materialization: 1 corpus pass, 1 rep-collapse shuffle.

    ``sh`` is NULL for docs with fewer than 3 words — the Jaccard sides
    filter on it, reproducing the old ``size(w) >= 3`` row filter exactly
    (shingles of a >=3-word array are never NULL)."""
    from video_data_pipeline_spark.queries.dedup import (
        _SPARK_WORD_HASHES,
        _SPARK_WORDS,
        _simhash_from_hashes,
    )

    reps = exact_dup_representatives(table(spark, sf_dir, "documents"))
    return checkpoint_frame(
        reps.select(
            "doc_id",
            F.expr(_SPARK_WORD_HASHES).alias("hs"),
            F.expr(_SPARK_WORDS).alias("w"),
        )
        .select(
            "doc_id",
            F.expr(_simhash_from_hashes("spark", "hs")).alias("simhash"),
            F.when(F.expr("size(w) >= 3"), F.expr(_SPARK_SHINGLE_SET)).alias("sh"),
        )
    )


@query(
    "q_simhash_calibration",
    oracle=_duck_simhash_calibration_sql(),
    tags=("dedup", "simhash", "audit"),
)
def q_simhash_calibration(
    spark, sf_dir, max_bucket_size=..., observation=None, calibrate=False,
    pair_budget=None,
):
    """SimHash calibration: for every pigeonhole candidate pair
    (hamming ≤ 3), the signature's hamming distance next to the EXACT
    shingle Jaccard — completing the sketch-audit family policy
    (q_minhash_estimate for MinHash, q_ann_recall for the ANN ladder,
    exact audit columns for KMV/Bloom/Count-Min): an operator choosing a
    hamming threshold reads this table to see what similarity each
    distance actually corresponds to ON THEIR CORPUS, instead of trusting
    the bit-independence assumption the cosine-hamming theory needs.

    Plan: rides the production pigeonhole plan (q_simhash_near_pairs —
    which since r12 carries ``DEFAULT_SIMHASH_MAX_BUCKET_SIZE`` as its
    default hot-bucket cap, so this audit's candidate expansion is bounded
    on clone-degenerate corpora too; the cap is calibrated never to bind
    on non-degenerate data, keeping the uncapped oracle SQL exact) and
    attaches rep-level shingle sets by uniform doc_id joins — no new
    corpus scan or pairing, the q_minhash_estimate shape. Pass
    ``max_bucket_size=None`` for an exactness study; an ``Observation``
    lands the front's cap-engagement telemetry; ``calibrate=True`` (r13)
    forwards to the front's pre-flight — the audit proceeds only on an
    exact plan or raises ``CapBoundError`` by name — and ``pair_budget``
    (ADVICE r13) forwards the pre-flight's acceptance budget with it.

    Default (non-calibrate) path since r17: signature and shingle set come
    from ONE checkpointed corpus pass (:func:`_calibration_corpus`) feeding
    the front and both Jaccard sides — the calibrate path keeps its own
    pre-flight-owned signature frame and is unchanged."""
    from video_data_pipeline_spark.queries.dedup import (
        DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
        q_simhash_near_pairs,
        simhash_near_pairs_capped,
    )

    if calibrate:
        kw = {} if max_bucket_size is ... else {"max_bucket_size": max_bucket_size}
        pairs = q_simhash_near_pairs(
            spark, sf_dir, observation=observation, calibrate=True,
            pair_budget=pair_budget, **kw
        )
        return _calibration_from_pairs(spark, sf_dir, pairs)
    corpus = _calibration_corpus(spark, sf_dir)
    mbs = (
        DEFAULT_SIMHASH_MAX_BUCKET_SIZE if max_bucket_size is ... else max_bucket_size
    )
    pairs = simhash_near_pairs_capped(
        None,
        max_bucket_size=mbs,
        observation=observation,
        signatures=corpus.select("doc_id", "simhash"),
    )
    return _calibration_from_pairs(
        spark, sf_dir, pairs,
        sets=corpus.where(F.col("sh").isNotNull()).select("doc_id", "sh"),
    )


@query(
    "q_simhash_calibration_combo",
    oracle=_duck_simhash_calibration_sql(),
    tags=("dedup", "simhash", "audit"),
)
def q_simhash_calibration_combo(spark, sf_dir, max_bucket_size=..., observation=None):
    """q_simhash_calibration riding the Manku-style WIDE-KEY front
    (q_simhash_near_pairs_combo: 20 three-of-six ten-bit chunk
    combinations). Both pigeonhole geometries are complete for
    hamming ≤ 3, so the oracle is the SAME SQL — registering the twin
    (VERDICT r12 #4) puts the geometry knob under the driver's hash gate
    on the AUDIT surface too, not just the pair surface. Choose this on
    diverse/high-entropy corpora (see q_simhash_near_pairs_combo for the
    measured trade). Rides the same shared checkpointed corpus pass as the
    default twin (r17, :func:`_calibration_corpus`)."""
    from video_data_pipeline_spark.queries.dedup import (
        DEFAULT_SIMHASH_MAX_BUCKET_SIZE,
        simhash_near_pairs_capped,
    )

    corpus = _calibration_corpus(spark, sf_dir)
    mbs = (
        DEFAULT_SIMHASH_MAX_BUCKET_SIZE if max_bucket_size is ... else max_bucket_size
    )
    pairs = simhash_near_pairs_capped(
        None,
        max_bucket_size=mbs,
        observation=observation,
        geometry="combos",
        signatures=corpus.select("doc_id", "simhash"),
    )
    return _calibration_from_pairs(
        spark, sf_dir, pairs,
        sets=corpus.where(F.col("sh").isNotNull()).select("doc_id", "sh"),
    )


def _calibration_from_pairs(spark, sf_dir, pairs, sets=None):
    """Shared back half of the calibration audits: attach rep-level
    shingle sets to a candidate-pair frame by uniform doc_id joins and
    compute the exact Jaccard next to the hamming distance. ``sets``
    short-circuits the shingle-set computation with a precomputed
    (doc_id, sh) frame — the r17 shared-corpus path passes a slice of its
    checkpointed frame here so BOTH join sides read one materialization
    instead of instantiating scan → rep-collapse → shingle-split twice.

    The candidate frame is lazily localCheckpointed first (r16 opt): the
    simhash fronts carry no internal checkpoint on the default path and
    their CollectMetrics observe node defeats exchange canonicalization,
    so planning the signature self-join inside this audit's join chain
    re-ran the signature lambda — the repo's heaviest per-doc expression.
    Measured same-session ABBA (tools/exp_simhash_ckpt.py, 6 rounds,
    identical rows asserted): ckpt on the PAIR frame 0.78x vs current;
    ckpt on signatures or reps instead: no win. The q_minhash_estimate
    sibling is deliberately NOT checkpointed — its LSH front already
    checkpoints bands internally, and the same experiment measured an
    extra pair checkpoint there as pure overhead (1.19x,
    tools/exp_audit_ckpt.py)."""
    pairs = checkpoint_frame(pairs)
    if sets is None:
        reps = exact_dup_representatives(table(spark, sf_dir, "documents"))
        sets = (
            reps.select("doc_id", F.expr("split(lower(trim(text)), ' +')").alias("w"))
            .where(F.expr("size(w) >= 3"))
            .select("doc_id", F.expr(_SPARK_SHINGLE_SET).alias("sh"))
        )
    ta = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    tb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    sample = (
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(doc_a AS STRING), ':',"
            " CAST(doc_b AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        % _CAL_SAMPLE_MOD
        == 0
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(sample)
        .select(
            "doc_a",
            "doc_b",
            F.col("hamming").cast("bigint").alias("hamming"),
            jac.alias("jaccard"),
        )
    )
