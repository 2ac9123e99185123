"""Relational/analytic queries: aggregation, joins, windows, set ops.

These are the engine's headline analytics surface. The reference has no SQL
layer — its "queries" are the three pipelines — but its index/bench stages
are count/sum aggregations (index/check_pair.py:46,68; bench.py:59-61). This
module proves the DataFrame engine covers the full analytic operator space
the reference's users would need at 100 TB, with plans that broadcast small
dims and push filters to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_data_pipeline_spark.queries.common import dec, one
from video_data_pipeline_spark.queries.registry import query, table


@query(
    "q01_pricing_summary",
    oracle="""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS _sq,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS _sp,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS _sdp,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS _sc,
    SUM(CAST(l_discount AS DECIMAL(12,2))) AS _sd,
    COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
  CAST(CAST(_sq AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(_sp AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(_sdp AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(_sc AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(_sq AS VARCHAR) AS DOUBLE) / count_order AS avg_qty,
  CAST(CAST(_sp AS VARCHAR) AS DOUBLE) / count_order AS avg_price,
  CAST(CAST(_sd AS VARCHAR) AS DOUBLE) / count_order AS avg_disc,
  count_order
FROM agg
""",
    tags=("agg", "tpch"),
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: groupBy + 8 aggregates.

    Scan reads 7 of 11 lineitem columns (pruned); the shipdate predicate is
    pushed to parquet; partial aggregation is map-side (hash agg) so the
    shuffle carries only 4 groups × 8 cells.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (one() - dec("l_discount"))
    agg = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("_sq"),
            F.sum(dec("l_extendedprice")).alias("_sp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(disc_price * (one() + dec("l_tax"))).alias("_sc"),
            F.sum(dec("l_discount")).alias("_sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    # decimal -> double goes THROUGH A STRING on both engines: above ~2^53
    # the engines' direct decimal->double casts round differently (seen at
    # sf>=1 on the scale-6 sum_charge), while exact-decimal-string +
    # correctly-rounded strtod is bit-identical everywhere
    d2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        d2d("_sq").alias("sum_qty"),
        d2d("_sp").alias("sum_base_price"),
        d2d("_sdp").alias("sum_disc_price"),
        d2d("_sc").alias("sum_charge"),
        (d2d("_sq") / F.col("count_order")).alias("avg_qty"),
        (d2d("_sp") / F.col("count_order")).alias("avg_price"),
        (d2d("_sd") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@query(
    "q03_top_orders",
    oracle="""
SELECT o.o_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
""",
    tags=("join", "topk", "tpch"),
)
def q03_top_orders(spark, sf_dir):
    """TPC-H Q3-style: 3-way join + agg + deterministic top-k.

    No forced broadcast hints: customer grows with scale, so the join
    strategy is left to size statistics / AQE (hints are reserved for the
    static region/nation dims). Locally the small sides still broadcast.
    """
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(dec("l_extendedprice") * (one() - dec("l_discount"))).alias("_rev"))
        .select(
            "o_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q05_region_revenue",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    tags=("join", "tpch"),
)
def q05_region_revenue(spark, sf_dir):
    """TPC-H Q5-style 6-way star join: revenue by nation for one region.

    All dimension tables (region/nation/customer/supplier) broadcast; the
    only shuffle is lineitem↔orders on orderkey. The local-supplier
    condition (s_nationkey = n_nationkey) rides the broadcast join.
    """
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            s,
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(dec("l_extendedprice") * (one() - dec("l_discount"))).alias("_rev"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
    )


@query(
    "q06_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
       * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
""",
    tags=("agg", "pushdown", "tpch"),
)
def q06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-style selective scan-aggregate.

    All four predicates push down to the parquet scan (min/max row-group
    skipping at scale); no shuffle at all — a single partial+final agg.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).alias("_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(F.col("_rev").cast("double").alias("revenue"), "n_items")
    )


@query(
    "q_orders_per_month",
    oracle="""
SELECT date_trunc('month', o_orderdate) AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY 1
""",
    tags=("agg", "datetime"),
)
def q_orders_per_month(spark, sf_dir):
    """Calendar rollup: date_trunc grouping (reference has no date functions;
    this covers the datetime surface a pipeline catalog needs)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


@query(
    "q_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
) WHERE rk <= 3
""",
    tags=("window", "topk"),
)
def q_topk_per_group(spark, sf_dir):
    """Top-k per group via ranking window (deterministic tie-break)."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


@query(
    "q_distinct_suppliers",
    oracle="""
SELECT n.n_name, COUNT(DISTINCT s.s_suppkey) AS n_suppliers,
       COUNT(*) AS n_rows
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("agg", "distinct"),
)
def q_distinct_suppliers(spark, sf_dir):
    """Exact distinct aggregation (reference has none; SURVEY.md §2.6)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate < TIMESTAMP '1996-01-01')
""",
    tags=("join", "anti"),
)
def q_customers_without_orders(spark, sf_dir):
    """Left-anti join (NOT EXISTS): customers with no early orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_active_suppliers",
    oracle="""
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey
                AND l.l_shipdate > TIMESTAMP '2001-06-01')
""",
    tags=("join", "semi"),
)
def q_active_suppliers(spark, sf_dir):
    """Left-semi join (EXISTS) with a pushed-down date predicate."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("2001-06-01").cast("timestamp")
    )
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@query(
    "q_status_breakdown",
    oracle="""
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2))
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total_open,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2))
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total_finished,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2))
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total_pending
FROM orders GROUP BY o_orderpriority
""",
    tags=("agg", "pivot"),
)
def q_status_breakdown(spark, sf_dir):
    """Conditional aggregation (pivot-shaped): one pass, no per-status scans."""
    o = table(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(12,2)")

    def bucket(status):
        return F.sum(F.when(F.col("o_orderstatus") == status, dec("o_totalprice")).otherwise(zero))

    return o.groupBy("o_orderpriority").agg(
        bucket("O").cast("double").alias("total_open"),
        bucket("F").cast("double").alias("total_finished"),
        bucket("P").cast("double").alias("total_pending"),
    )


@query(
    "q_rollup_customers",
    oracle="""
SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    tags=("agg", "rollup"),
)
def q_rollup_customers(spark, sf_dir):
    """ROLLUP grouping sets over the region→nation hierarchy."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )
