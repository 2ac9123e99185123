"""Relational coverage, part 2: set ops, grouping sets, correlated shapes,
running windows, order statistics, histograms, with-replacement sampling.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_data_pipeline_spark.queries.common import DUCK_HASH, SPARK_HASH, dec
from video_data_pipeline_spark.queries.registry import query, table


@query(
    "q_min_cost_supplier",
    oracle="""
SELECT n.n_name, s.s_name, s.s_acctbal FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                     WHERE s2.s_nationkey = s.s_nationkey)
""",
    tags=("window", "correlated"),
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2's correlated-min shape: supplier(s) at the per-nation
    minimum. The correlated subquery decorrelates to a window min — one
    pass, no self-join."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("_min", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("_min"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("n_name", "s_name", "s_acctbal")
    )


@query(
    "q_cube_lineitem",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("agg", "cube"),
)
def q_cube_lineitem(spark, sf_dir):
    """CUBE grouping sets (all 4 subtotal combinations in one pass)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
    )


@query(
    "q_intersect_customers",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                               AND o_orderdate <  TIMESTAMP '1998-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
                               AND o_orderdate <  TIMESTAMP '1999-01-01'
""",
    tags=("setop",),
)
def q_intersect_customers(spark, sf_dir):
    """INTERSECT (distinct): customers active in both years."""
    o = table(spark, sf_dir, "orders")

    def year(y):
        return o.where(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return year(1997).intersect(year(1998))


@query(
    "q_except_parts",
    oracle="""
SELECT p_partkey FROM part
EXCEPT
SELECT l_partkey AS p_partkey FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-01-01'
""",
    tags=("setop",),
)
def q_except_parts(spark, sf_dir):
    """EXCEPT (distinct): parts with no 2001+ shipments."""
    p = table(spark, sf_dir, "part").select("p_partkey")
    l = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    return p.subtract(l)


@query(
    "q_running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
""",
    tags=("window", "running"),
)
def q_running_revenue(spark, sf_dir):
    """Running per-customer revenue: cumulative window over exact decimals
    (decimal running sums stay exact at every prefix)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@query(
    "q_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 LAG(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
""",
    tags=("window", "datetime"),
)
def q_order_gaps(spark, sf_dir):
    """Inter-order gap in days per customer (lag + datediff)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).alias("days_since_prev"),
    )


@query(
    "q_median_price",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, o_totalprice AS median_price
FROM ranked WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
""",
    tags=("window", "orderstat"),
)
def q_median_price(spark, sf_dir):
    """Discrete median per group via ranking (engine-portable order
    statistic — interpolating percentiles differ across engines, element
    selection doesn't)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    return ranked.where(
        F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint")
    ).select("o_orderpriority", F.col("o_totalprice").alias("median_price"))


@query(
    "q_price_histogram",
    oracle="""
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS bucket_total
FROM orders GROUP BY 1
""",
    tags=("agg", "histogram"),
)
def q_price_histogram(spark, sf_dir):
    """Fixed-width histogram (the token-length-histogram idiom from
    SURVEY.md §7 Phase 5, over order totals)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("bucket_total"),
    )


_DRAWS = 200


@query(
    "q_resampled",
    oracle=f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
draws AS (SELECT unnest(range({_DRAWS})) AS draw_id)
SELECT d.draw_id,
       {DUCK_HASH.format(x="concat('rs:', CAST(d.draw_id AS VARCHAR))")} % n.cnt AS doc_id,
       doc.source
FROM draws d, n
JOIN documents doc
  ON doc.doc_id = {DUCK_HASH.format(x="concat('rs:', CAST(d.draw_id AS VARCHAR))")} % n.cnt
""",
    tags=("sampling", "resample"),
)
def q_resampled(spark, sf_dir):
    """``ResampledShards`` sampling *with replacement*, deterministic seed
    (shardlists.py:281-324): k independent draws, each mapped to a document
    by keyed hash mod N. The draw table is generated (no data scan) and the
    pick is an equi-join — the DRAW side broadcasts (k rows, corpus-size
    independent); the corpus itself never broadcasts or shuffles."""
    d = table(spark, sf_dir, "documents")
    n = d.count()  # dimension-sized action; at scale pass the known count
    draws = spark.range(_DRAWS).select(F.col("id").alias("draw_id"))
    hash_expr = SPARK_HASH.format(x="concat('rs:', CAST(draw_id AS STRING))")
    pick = F.expr(f"{hash_expr} % {n}")
    chosen = draws.select("draw_id", pick.alias("doc_id"))
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(chosen), "doc_id")
        .select("draw_id", "doc_id", "source")
    )


#: HLL++ relative-error acceptance for the q_approx_distinct semi-oracle:
#: approx_count_distinct's default maximumEstimationError is 5% rsd; 4
#: sigma covers every deterministic register layout Spark can produce
#: while still failing hard on a wrong column, group, or a broken sketch
#: (the same bound tests/test_oracleless_semantics.py has pinned since r10)
_HLL_REL_TOL = 0.20


def _approx_distinct_check(spark_pdf, oracle_pdf):
    """Bound check (r16, VERDICT r15 #6): every group present in both
    frames, exact row counts equal, and the HLL estimate within
    ``_HLL_REL_TOL`` of DuckDB's exact COUNT(DISTINCT). Pure pandas — no
    Spark/DuckDB handles — so the harness can run it anywhere."""
    problems = []
    s = spark_pdf.set_index("event_type").sort_index()
    o = oracle_pdf.set_index("event_type").sort_index()
    if list(s.index) != list(o.index):
        return [f"groups differ: spark={list(s.index)} oracle={list(o.index)}"]
    for et in s.index:
        approx, n = int(s.loc[et, "approx_users"]), int(s.loc[et, "n"])
        exact, n_exact = int(o.loc[et, "exact_users"]), int(o.loc[et, "n"])
        if n != n_exact:
            problems.append(f"{et}: row count spark={n} oracle={n_exact}")
        rel = abs(approx - exact) / max(exact, 1)
        if rel > _HLL_REL_TOL:
            problems.append(
                f"{et}: HLL estimate {approx} vs exact {exact} "
                f"(rel err {rel:.3f} > {_HLL_REL_TOL})"
            )
        if approx > n:
            problems.append(f"{et}: distinct estimate {approx} exceeds rows {n}")
    return problems


@query(
    "q_approx_distinct",
    oracle=None,  # HLL sketch VALUES are engine-specific — no hash oracle
    tags=("agg", "approx"),
    # ... but the estimate is still checkable against the exact answer:
    # the semi-oracle upgrades this cell from rows-only to pass/fail in
    # the full sweep (r16, VERDICT r15 #6)
    semi_oracle=(
        "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, "
        "COUNT(*) AS n FROM events GROUP BY event_type"
    ),
    semi_check=_approx_distinct_check,
)
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): the constant-memory distinct
    for 100 TB cardinality profiling. Sketch values are engine-specific,
    so there is no value-hash oracle; the registered semi-oracle instead
    asserts the estimate lies within the sketch's documented error of the
    exact DuckDB COUNT(DISTINCT) per group (and that the exact ``n``
    column matches bit-for-bit). The exact twin is q_distinct_suppliers."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )
