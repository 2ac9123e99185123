"""Packing/chunking queries — the reference's stateful sequential operators.

These are the operators Catalyst can't express relationally (SURVEY.md §7
"What's hard" (2)): greedy token packing and size-based shard rolling carry
order-dependent running state. Spark-native form: ``applyInPandas`` per
group with an explicit intra-group order column; the DuckDB oracle replays
the same loop as a recursive CTE, proving the semantics match row-for-row.

Scale note: the group is the parallelism unit (reference: one input tar ≈
500 samples, tokenize/main.py:186). State is a few counters per group;
thousands of groups pack concurrently with no shuffle beyond the initial
hash partition by group key.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from video_data_pipeline_spark.operators.batching import batched
from video_data_pipeline_spark.operators.packing import greedy_bin_pack, shard_roll
from video_data_pipeline_spark.queries.registry import query, table

_BUDGET = 2000  # chars per packed bin (the 8k-token budget scaled to testdata)


def _greedy_fold_ctes(budget: int) -> str:
    """Closed-fold replay of the greedy first-fit loop: ONE list_reduce
    pass per source instead of a row-at-a-time recursive CTE (whose
    iteration count = max rows per source blew the sf10 oracle budget —
    r6 VERDICT #3). State is encoded in reserved list slots — acc[1]=
    running size, acc[2]=current bin, acc[3:]=emitted bin ids — because
    DuckDB 1.0's list_reduce requires accumulator type == element type
    and mis-binds struct-field list accumulators (each step would read
    the original empty list; pinned by test_packing_oracle_forms_agree).
    Measured: 32 s over 500k rows / 20 sources where the recursion never
    finished. Emits CTEs ordered/folded/kept; compose the final SELECT."""
    return f"""
ordered AS (
  SELECT source,
         list(doc_id ORDER BY doc_id) AS ids,
         list(CAST(n_chars AS BIGINT) ORDER BY doc_id) AS sizes
  FROM documents GROUP BY source
),
folded AS (
  SELECT source, ids, sizes,
    list_reduce(
      list_prepend(CAST([0, 0] AS BIGINT[]),
                   list_transform(sizes, s -> [s])),
      (acc, x) -> CASE
        WHEN x[1] >= {budget}
          THEN list_concat([acc[1], acc[2]], list_append(acc[3:], CAST(-1 AS BIGINT)))
        WHEN acc[1] + x[1] >= {budget}
          THEN list_concat([x[1], acc[2] + 1], list_append(acc[3:], acc[2] + 1))
        ELSE list_concat([acc[1] + x[1], acc[2]], list_append(acc[3:], acc[2]))
      END) AS st
  FROM ordered
),
kept AS (
  SELECT source, unnest(ids) AS doc_id, unnest(sizes) AS n_chars,
         unnest(st[3:]) AS bin_id
  FROM folded
)"""


def _greedy_fold_sql(budget: int) -> str:
    return f"""
WITH {_greedy_fold_ctes(budget)}
SELECT source, doc_id, bin_id FROM kept
WHERE bin_id >= 0
  AND bin_id < (SELECT MAX(k2.bin_id) FROM kept k2 WHERE k2.source = kept.source)
"""


def _greedy_walk_sql(budget: int) -> str:
    """Recursive-CTE replay of the greedy first-fit loop
    (tokenize/main.py:186-215): skip oversize, flush-on-overflow, drop the
    trailing partial bin. Retained as the independent second formulation
    that test_packing_oracle_forms_agree pins against the fold form (the
    registered oracle)."""
    return f"""
WITH RECURSIVE ordered AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, doc_id, n_chars, rn,
         CASE WHEN n_chars >= {budget} THEN -1 ELSE 0 END AS bin_id,
         CASE WHEN n_chars >= {budget} THEN 0 ELSE n_chars END AS acc,
         0 AS cur_bin
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.doc_id, o.n_chars, o.rn,
         CASE WHEN o.n_chars >= {budget} THEN -1
              WHEN w.acc + o.n_chars >= {budget} THEN w.cur_bin + 1
              ELSE w.cur_bin END,
         CASE WHEN o.n_chars >= {budget} THEN w.acc
              WHEN w.acc + o.n_chars >= {budget} THEN o.n_chars
              ELSE w.acc + o.n_chars END,
         CASE WHEN o.n_chars >= {budget} THEN w.cur_bin
              WHEN w.acc + o.n_chars >= {budget} THEN w.cur_bin + 1
              ELSE w.cur_bin END
  FROM walk w JOIN ordered o ON o.source = w.source AND o.rn = w.rn + 1
), kept AS (SELECT source, doc_id, n_chars, bin_id FROM walk WHERE bin_id >= 0)
SELECT k.source, k.doc_id, CAST(k.bin_id AS BIGINT) AS bin_id
FROM kept k
WHERE k.bin_id < (SELECT MAX(k2.bin_id) FROM kept k2 WHERE k2.source = k.source)
"""


@query("q_bin_packing", oracle=_greedy_fold_sql(_BUDGET), tags=("packing", "stateful"))
def q_bin_packing(spark, sf_dir):
    """Greedy 8k-style bin packing (tokenize/main.py:149-218) via
    applyInPandas per source group: accumulate docs while the char budget
    holds, flush on overflow, skip oversize docs, drop the trailing partial
    bin (main.py:212-215)."""
    d = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    packed = d.transform(
        greedy_bin_pack(
            group_cols=["source"],
            order_col="doc_id",
            size_col="n_chars",
            budget=_BUDGET,
        )
    )
    return packed.select("source", "doc_id", "bin_id")


def _shard_roll_fold_sql(maxcount: int, maxsize: int) -> str:
    """Closed-fold replay of ShardWriter count/size rolling — same
    list-slot encoding as :func:`_greedy_fold_ctes`: acc[1]=count,
    acc[2]=size, acc[3]=current shard, acc[4:]=emitted shard ids."""
    return f"""
WITH ordered AS (
  SELECT lang,
         list(doc_id ORDER BY doc_id) AS ids,
         list(CAST(n_chars AS BIGINT) ORDER BY doc_id) AS sizes
  FROM documents GROUP BY lang
),
folded AS (
  SELECT lang, ids,
    list_reduce(
      list_prepend(CAST([0, 0, 0] AS BIGINT[]),
                   list_transform(sizes, s -> [s])),
      (acc, x) -> CASE
        WHEN acc[1] >= {maxcount} OR acc[2] >= {maxsize}
          THEN list_concat([CAST(1 AS BIGINT), x[1], acc[3] + 1],
                           list_append(acc[4:], acc[3] + 1))
        ELSE list_concat([acc[1] + 1, acc[2] + x[1], acc[3]],
                         list_append(acc[4:], acc[3]))
      END) AS st
  FROM ordered
)
SELECT lang, unnest(ids) AS doc_id, unnest(st[4:]) AS shard_id FROM folded
"""


def _shard_roll_sql(maxcount: int, maxsize: int) -> str:
    """Recursive-CTE form, retained for test_packing_oracle_forms_agree."""
    return f"""
WITH RECURSIVE ordered AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT lang, doc_id, rn, 0 AS shard_id, 1 AS cnt, n_chars AS sz
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.lang, o.doc_id, o.rn,
         CASE WHEN w.cnt >= {maxcount} OR w.sz >= {maxsize}
              THEN w.shard_id + 1 ELSE w.shard_id END,
         CASE WHEN w.cnt >= {maxcount} OR w.sz >= {maxsize}
              THEN 1 ELSE w.cnt + 1 END,
         CASE WHEN w.cnt >= {maxcount} OR w.sz >= {maxsize}
              THEN o.n_chars ELSE w.sz + o.n_chars END
  FROM walk w JOIN ordered o ON o.lang = w.lang AND o.rn = w.rn + 1
)
SELECT lang, doc_id, CAST(shard_id AS BIGINT) AS shard_id FROM walk
"""


@query(
    "q_shard_rolling",
    oracle=_shard_roll_fold_sql(25, 6000),
    tags=("packing", "stateful", "sink"),
)
def q_shard_rolling(spark, sf_dir):
    """``ShardWriter`` count/size rolling (writer.py:362-449, caps 100k
    records / 3 GB): roll before writing when either cap is reached. Drives
    the tar sink's shard layout (sinks/webdataset.py)."""
    d = table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    rolled = d.transform(
        shard_roll(
            group_cols=["lang"],
            order_col="doc_id",
            size_col="n_chars",
            maxcount=25,
            maxsize=6000,
        )
    )
    return rolled.select("lang", "doc_id", "shard_id")


@query(
    "q_chunk_fixed",
    oracle="""
WITH pos AS (
  SELECT l_orderkey, l_linenumber,
         CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1) / 500) AS BIGINT)
           AS chunk_id
  FROM lineitem
)
SELECT chunk_id, COUNT(*) AS n_rows,
       MIN(l_orderkey) AS first_key, MAX(l_orderkey) AS last_key
FROM pos GROUP BY chunk_id
""",
    tags=("packing", "chunking"),
)
def q_chunk_fixed(spark, sf_dir):
    """Fixed-500 tar chunking (pack/pack.py:17,61-63): batch assignment
    under total order, summarized per chunk. In the real sink this is
    ``maxRecordsPerFile`` — no window needed (sinks/webdataset.py).

    NOT spread() (r17, VERDICT r16 #5 measured keep-or-reject):
    round-robin repartitioning the single-row-group scan measured 1.80x
    SLOWER same-session ABBA (tools/exp_spread_pack.py) — both
    global-index passes would pay a keyless repartition (which sorts its
    input first, SPARK-23207) of 600k rows to parallelize a predicate
    chain that one core finishes faster than the exchange. q_pack_merge
    measured flat (0.96x, 5k rows) — also left alone."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return (
        li.transform(batched(["l_orderkey", "l_linenumber"], n=500, batch_col="chunk_id"))
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("first_key"),
            F.max("l_orderkey").alias("last_key"),
        )
    )


@query(
    "q_pack_merge",
    oracle=f"""
WITH {_greedy_fold_ctes(_BUDGET).strip()},
flushed AS (
  SELECT k.* FROM kept k
  WHERE k.bin_id >= 0
    AND k.bin_id < (SELECT MAX(k2.bin_id) FROM kept k2 WHERE k2.source = k.source)
)
SELECT source, CAST(bin_id AS BIGINT) AS bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS packed_chars, MIN(doc_id) AS first_doc
FROM flushed GROUP BY source, bin_id
""",
    tags=("packing", "stateful", "agg"),
)
def q_pack_merge(spark, sf_dir):
    """The packed-record merge (tokenize/main.py:73-85 ``save_to_tar``):
    after bin assignment, collapse each bin to one merged sample (counts +
    concatenated sizes; in plans/tokenize.py the same groupBy flattens
    input_ids with BOS dedup)."""
    d = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    packed = d.transform(
        greedy_bin_pack(
            group_cols=["source"], order_col="doc_id", size_col="n_chars", budget=_BUDGET
        )
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("packed_chars"),
        F.min("doc_id").alias("first_doc"),
    )
