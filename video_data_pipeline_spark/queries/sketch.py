"""Sketch + placement queries: Bloom probe, Count-Min frequency, HRW shards.

Beyond-reference extensions a 100 TB continuous-ingestion pipeline needs:

- ``q_bloom_probe`` — "has this fingerprint been ingested before?" against a
  historical corpus WITHOUT joining the history: the history is one
  shuffle-free pass folded into an m-bit Bloom bitmap, and the incoming
  batch probes the broadcast bitmap in a vectorized Arrow UDF (the batch
  never shuffles). False-negative-free: ``maybe_seen = false`` is a proof
  of novelty, so only the (tunable-rate) ``maybe_seen`` sliver needs the
  exact q_dedup_incremental path. Complements q_dedup_incremental the way
  a bouncer complements a guest list.
- ``q_countmin_freq`` — token frequencies from a d×w Count-Min grid whose
  shuffle width is d·w regardless of vocabulary size (the exact
  operators/heavy.py path needs a candidate recount; the sketch needs
  nothing). Estimates NEVER undercount; the oracle reproduces the grid
  bit-for-bit, and the output carries the exact count next to the estimate
  so the overcount is visible.
- ``q_rendezvous_shards`` — Highest-Random-Weight (Thaler & Ravishankar
  1996) shard placement: ``shard(key) = argmax_s hash(key '@' s)``. Unlike
  ``hash(key) % n``, removing a shard relocates ONLY that shard's keys
  (minimal disruption — property-tested), which is what you want for
  sticky cache/bucket placement of 100 TB of shards.

Determinism: every hash is the repo-standard 60-bit md5 prefix with
identical text in both dialects (queries/common.py); the Bloom bitmap is a
pure function of the position multiset, so the DuckDB position-set
semi-join oracle is exact, not approximate.

Reference parity: the reference's tokenize stage guards repeat ingestion
with in-memory Python set membership on one node (tokenize/main.py); the
Bloom/CM forms are the bounded-memory distributed equivalents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from video_data_pipeline_spark.operators.sketch import (
    bloom_build,
    bloom_positions,
    bloom_probe,
    countmin_bucket,
    countmin_build,
    countmin_estimate,
)
from video_data_pipeline_spark.localframe import inline_rows
from video_data_pipeline_spark.queries.registry import query, table

_HASH60_SPARK = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
_HASH60_DUCK = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"

# ---------------------------------------------------------------- bloom

_M_BITS = 1 << 23  # 1 MiB bitmap: ~0.2% FP at the sf10 history (~450k keys)
_K = 4
_FP = "md5(lower(trim(text)))"  # q_dedup_exact's content fingerprint


@query(
    "q_bloom_probe",
    oracle=f"""
WITH hist_pos AS (
  SELECT DISTINCT unnest({bloom_positions('fp', _M_BITS, _K, 'duck')}) AS pos
  FROM (SELECT {_FP} AS fp FROM documents WHERE doc_id % 10 <> 0)
),
batch AS (
  SELECT doc_id, {_FP} AS fp FROM documents WHERE doc_id % 10 = 0
),
bpos AS (
  SELECT doc_id, unnest({bloom_positions('fp', _M_BITS, _K, 'duck')}) AS pos
  FROM batch
)
SELECT b.doc_id,
       (COUNT(*) FILTER (WHERE h.pos IS NOT NULL) = {_K}) AS maybe_seen
FROM bpos b LEFT JOIN hist_pos h USING (pos)
GROUP BY b.doc_id
""",
    tags=("dedup",),
)
def q_bloom_probe(spark, sf_dir):
    """Bloom-filter novelty screen: fold the history slice (doc_id%10 != 0)
    into a 2^23-bit bitmap (one shuffle-free pass, per-partition partials
    OR-reduced), then probe the incoming slice (doc_id%10 == 0) against the
    broadcast bitmap. ``maybe_seen=false`` rows are PROVABLY novel; only
    ``true`` rows need the exact incremental-dedup join. The probe plan has
    zero exchanges. The oracle replays the same k positions as a
    position-set semi-join — bit-exact because the bitmap is a pure
    function of the position set."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim("text")))
    history = d.where(F.col("doc_id") % 10 != 0).select(fp.alias("fp"))
    batch = d.where(F.col("doc_id") % 10 == 0).select("doc_id", fp.alias("fp"))
    bitmap = bloom_build(history, "fp", _M_BITS, _K)
    return bloom_probe(batch, "fp", bitmap, _M_BITS, _K).select(
        "doc_id", "maybe_seen"
    )


# ------------------------------------------------------------- count-min

_CM_DEPTH = 4
_CM_WIDTH = 64
# present tokens (skewed head + the rare 'dup' marker) and absent probes
# whose nonzero estimates expose the sketch's one-sided overcount
_CM_PROBES = ("join", "hash", "row", "customer", "the", "dup", "zebra", "quasar")

_DUCK_TOKENS = (
    "SELECT unnest(string_split_regex(trim(text), ' +')) AS k FROM documents"
)
_SPARK_TOKENS = "explode(split(trim(text), ' +'))"


def _duck_probe_rows() -> str:
    vals = ", ".join(f"('{w}')" for w in _CM_PROBES)
    return f"SELECT * FROM (VALUES {vals}) p(k)"


@query(
    "q_countmin_freq",
    oracle=f"""
WITH tokens AS ({_DUCK_TOKENS}),
grid AS (
  SELECT j, bucket, COUNT(*) AS cnt FROM (
    SELECT unnest(list_transform(range({_CM_DEPTH}),
                  j -> {_HASH60_DUCK.format(x="k || '#' || CAST(j AS VARCHAR)")}
                       % {_CM_WIDTH})) AS bucket,
           unnest(range({_CM_DEPTH})) AS j
    FROM tokens
  ) GROUP BY j, bucket
),
probes AS ({_duck_probe_rows()}),
est AS (
  SELECT p.k, MIN(COALESCE(g.cnt, 0)) AS est_cnt
  FROM (
    SELECT k, unnest(range({_CM_DEPTH})) AS j,
           unnest(list_transform(range({_CM_DEPTH}),
                  j -> {_HASH60_DUCK.format(x="k || '#' || CAST(j AS VARCHAR)")}
                       % {_CM_WIDTH})) AS bucket
    FROM probes
  ) p LEFT JOIN grid g USING (j, bucket)
  GROUP BY p.k
),
truth AS (
  SELECT k, COUNT(*) AS true_cnt FROM tokens
  WHERE k IN {tuple(_CM_PROBES)!r}
  GROUP BY k
)
SELECT e.k AS word, e.est_cnt, COALESCE(t.true_cnt, 0) AS true_cnt
FROM est e LEFT JOIN truth t USING (k)
""",
    tags=("text",),
)
def q_countmin_freq(spark, sf_dir):
    """Count-Min token frequencies: the d×w grid is built by ONE
    map-combined groupBy whose shuffle carries at most d·w keys (here 256)
    no matter the vocabulary; probes join the broadcast grid and take the
    row-wise min. ``est_cnt >= true_cnt`` always (one-sided error); the
    exact count rides along so the overcount is audit-visible. At 100 TB
    this replaces a vocabulary-wide shuffle with a constant-size one."""
    # no spread here (r16 opt note): after countmin_build's count-first
    # rewrite the scan-stage work is a plain tokenize + 31-key partial
    # count — a repartition was tried and measured net-negative (the
    # extra exchange outweighed the parallelism)
    d = table(spark, sf_dir, "documents")
    tokens = d.select(F.expr(_SPARK_TOKENS).alias("k"))
    grid = countmin_build(tokens, "k", _CM_DEPTH, _CM_WIDTH)
    # inline_rows, not createDataFrame (r16 opt, guide §4): the Python-RDD
    # literal frame ran its exchange as a 32-task stage blocked on Python
    # worker forks (52 s executorRunTime vs 0.7 s executorCpuTime measured)
    probes = inline_rows(spark, ["k"], [(w,) for w in _CM_PROBES])
    est = countmin_estimate(grid, probes, "k", _CM_DEPTH, _CM_WIDTH)
    truth = (
        tokens.where(F.col("k").isin(*_CM_PROBES))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    return (
        est.join(F.broadcast(truth), "k", "left")
        .select(
            F.col("k").alias("word"),
            "est_cnt",
            F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
        )
    )


# ------------------------------------------------------------ rendezvous

_N_SHARDS = 8


def rendezvous_shard(key_sql: str, n_shards: int, dialect: str) -> str:
    """SQL expression: HRW shard of ``key`` among ``n_shards`` (0-based).

    ``argmax_s hash60(key || '@' || s)`` — first max wins (60-bit hash
    collisions are the only possible tie). Removing shard s relocates only
    s's keys: every other key's argmax is untouched.
    """
    if dialect == "spark":
        h = _HASH60_SPARK.format(x=f"concat({key_sql}, '@', CAST(s AS STRING))")
        scores = f"transform(sequence(0, {n_shards - 1}), s -> {h})"
        return f"(array_position({scores}, array_max({scores})) - 1)"
    h = _HASH60_DUCK.format(x=f"{key_sql} || '@' || CAST(s AS VARCHAR)")
    scores = f"list_transform(range({n_shards}), s -> {h})"
    return f"(list_position({scores}, list_max({scores})) - 1)"


@query(
    "q_rendezvous_shards",
    oracle=f"""
SELECT {rendezvous_shard('CAST(doc_id AS VARCHAR)', _N_SHARDS, 'duck')} AS shard,
       COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
""",
    tags=("layout",),
)
def q_rendezvous_shards(spark, sf_dir):
    """Rendezvous (HRW) shard placement audit: assign every document to
    ``argmax_s hash(doc_id '@' s)`` of 8 shards and report per-shard
    occupancy. Pure per-row column math (no join against a shard table) +
    one 8-key groupBy. Unlike ``hash % n``, shrinking the shard set
    relocates only the removed shard's keys — the property that makes HRW
    the right placement function for sticky shard/cache assignment at
    100 TB (tested in tests/test_sketch.py)."""
    d = table(spark, sf_dir, "documents")
    shard = F.expr(
        rendezvous_shard("CAST(doc_id AS STRING)", _N_SHARDS, "spark")
    )
    return (
        d.groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
