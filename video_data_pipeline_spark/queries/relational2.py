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


@query(
    "q_approx_distinct",
    oracle=None,  # HLL sketches are engine-specific — rows-only check
    tags=("agg", "approx"),
)
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): the constant-memory distinct
    for 100 TB cardinality profiling. Sketch values are engine-specific,
    so this is a rows-only entry; the exact twin is q_distinct_suppliers."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )
