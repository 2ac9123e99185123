"""Relational coverage, part 3: more TPC-H-shaped analytics."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_data_pipeline_spark.queries.common import dec, one
from video_data_pipeline_spark.queries.registry import query, table


@query(
    "q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
    tags=("join", "topk", "tpch"),
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10-style: top customers by returned-item revenue."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(dec("l_extendedprice") * (one() - dec("l_discount"))).alias("_rev"))
        .select("c_custkey", "c_name", "n_name", F.col("_rev").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_ratio",
    oracle="""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
              THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
    tags=("join", "agg", "tpch"),
)
def q14_promo_ratio(spark, sf_dir):
    """TPC-H Q14-style: promo revenue share (conditional ratio, exact
    decimal numerator/denominator, one double division)."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(12,2)")
    rev = dec("l_extendedprice") * (one() - dec("l_discount"))
    joined = l.join(p, l.l_partkey == p.p_partkey)
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("_promo"),
        F.sum(rev).alias("_all"),
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.col("_promo").cast("double")
            / F.col("_all").cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "q18_large_orders",
    oracle="""
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 150
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    tags=("join", "having", "tpch"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18-style: large-volume orders (HAVING on grouped sum)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .where(F.col("_qty") > 150)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@query(
    "q04_priority_count",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("semi", "agg", "tpch"),
)
def q04_priority_count(spark, sf_dir):
    """TPC-H Q4-style: orders with any late-shipping line (correlated
    EXISTS → left-semi join with a non-equi condition)."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_custkey, c.c_acctbal
FROM customer c, threshold t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate < TIMESTAMP '1996-01-01')
""",
    tags=("anti", "scalar-subquery", "tpch"),
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22-style: above-average-balance customers with no early
    orders (scalar aggregate broadcast + anti join)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    thr = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


@query(
    "q_yearly_growth",
    oracle="""
WITH yearly AS (
  SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT yr, revenue,
       revenue - LAG(revenue) OVER (ORDER BY yr) AS yoy_delta
FROM yearly
""",
    tags=("window", "datetime"),
)
def q_yearly_growth(spark, sf_dir):
    """Year-over-year revenue delta (agg → ordered window lag)."""
    o = table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("revenue"))
    w = Window.orderBy("yr")
    return yearly.select(
        "yr", "revenue", (F.col("revenue") - F.lag("revenue").over(w)).alias("yoy_delta")
    )


@query(
    "q07_volume_shipping",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(date_part('year', l.l_shipdate) AS BIGINT) AS l_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
            AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_name IN ('NATION_1', 'NATION_2') AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
GROUP BY ns.n_name, nc.n_name, CAST(date_part('year', l.l_shipdate) AS BIGINT)
""",
    tags=("join", "tpch", "agg"),
)
def q07_volume_shipping(spark, sf_dir):
    """TPC-H Q7-style volume shipping: revenue between two nations by year.

    Plan shape: nation (25 rows, static) carries the only broadcast hints;
    supplier/customer are scale-growing, so their join strategy is left to
    size statistics / AQE. The nation filters prune BEFORE the fact join;
    one shuffle on the 3-column group key."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ns = n.where(F.col("n_name").isin("NATION_1", "NATION_2")).alias("ns")
    nc = n.where(F.col("n_name").isin("NATION_1", "NATION_2")).alias("nc")
    rev = dec("l_extendedprice") * (one() - dec("l_discount"))
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .where(F.col("ns.n_name") != F.col("nc.n_name"))
    )
    return (
        joined.groupBy(
            F.col("ns.n_name").alias("supp_nation"),
            F.col("nc.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(rev).alias("_r"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.col("_r").cast("string").cast("double").alias("revenue"),
        )
    )


@query(
    "q08_market_share",
    oracle="""
WITH volumes AS (
  SELECT CAST(date_part('year', o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM volumes GROUP BY o_year
""",
    tags=("join", "tpch", "agg"),
)
def q08_market_share(spark, sf_dir):
    """TPC-H Q8-style market share: NATION_1's fraction of PROMO-part
    revenue sold into ASIA customers, by order year. Only the static dims
    (nation, region) carry broadcast hints — part/supplier/customer grow
    with scale and are left to size statistics / AQE. The two decimal sums
    stay exact and convert to double via string (the >2^53-safe path) only
    for the final ratio."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    ns = n.alias("ns")
    nc = n.alias("nc")
    vol = dec("l_extendedprice") * (one() - dec("l_discount"))
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(r), F.col("nc.n_regionkey") == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            F.col("ns.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(12,2)")
    agg = base.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero)).alias("_n"),
        F.sum("volume").alias("_d"),
    )
    d2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    return agg.select("o_year", (d2d("_n") / d2d("_d")).alias("mkt_share"))


@query(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
             ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE) * 100.0
       / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
              AS VARCHAR) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1996-02-01'
""",
    tags=("join", "tpch", "agg"),
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14-style promo revenue share in one ship month: the part
    join strategy is left to size statistics / AQE (part grows with scale —
    no forced hint) over the date-pruned lineitem scan; single global aggregate
    (two exact decimal sums -> one double division at output)."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec("l_extendedprice") * (one() - dec("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    agg = li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("_p"),
        F.sum(rev).alias("_t"),
    )
    d2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    return agg.select(((d2d("_p") * 100.0) / d2d("_t")).alias("promo_revenue_pct"))


@query(
    "q_merge_upsert",
    oracle="""
WITH changes AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) + CAST(100 AS DECIMAL(12,2)) AS DOUBLE)
           AS c_acctbal,
         'CDC_SEG' AS c_mktsegment
  FROM customer WHERE c_custkey % 11 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW_' || CAST(c_custkey AS VARCHAR), c_nationkey,
         CAST(0.0 AS DOUBLE), 'CDC_SEG'
  FROM customer WHERE c_custkey % 503 = 0
),
merged AS (
  SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
         CASE WHEN t.c_custkey IS NULL THEN s.c_name ELSE t.c_name END AS c_name,
         CASE WHEN t.c_custkey IS NULL THEN s.c_nationkey ELSE t.c_nationkey END
           AS c_nationkey,
         CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END
           AS c_acctbal,
         CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END
           AS c_mktsegment
  FROM customer t FULL OUTER JOIN changes s ON t.c_custkey = s.c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
       MIN(c_custkey) AS first_key, MAX(c_custkey) AS last_key
FROM merged GROUP BY c_mktsegment
""",
    tags=("merge", "cdc", "join"),
)
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO emulation (operators/merge.py — the lakehouse verb as a
    full-outer join, ROADMAP r1 #8): a CDC batch updates segment+balance
    for every 11th customer and inserts synthetic new customers, then the
    merged relation is summarized per segment. The change set broadcasts
    (CDC batches are small); one shuffle on the merge key."""
    from video_data_pipeline_spark.operators.merge import merge_into

    cust = table(spark, sf_dir, "customer")
    updates = cust.where(F.col("c_custkey") % 11 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (dec("c_acctbal") + F.lit(100).cast("decimal(12,2)"))
        .cast("double")
        .alias("c_acctbal"),
        F.lit("CDC_SEG").alias("c_mktsegment"),
    )
    inserts = cust.where(F.col("c_custkey") % 503 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW_"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("CDC_SEG").alias("c_mktsegment"),
    )
    merged = merge_into(
        cust,
        updates.unionByName(inserts),
        on="c_custkey",
        update_cols=["c_acctbal", "c_mktsegment"],
    )
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        F.min("c_custkey").alias("first_key"),
        F.max("c_custkey").alias("last_key"),
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
              AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("join", "tpch", "agg", "subquery"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15-style top supplier: quarterly revenue per supplier, keep
    the max. The scalar-max subquery is a broadcast of a 1-row aggregate
    (always safe); the supplier join is left to size statistics / AQE; one
    shuffle on suppkey."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = dec("l_extendedprice") * (one() - dec("l_discount"))
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("_r"))
        .select("supplier_no", F.col("_r").cast("string").cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == F.col("m"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey,
         0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
                / COUNT(*)) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1' AND CAST(l.l_quantity AS DOUBLE) < a.threshold
""",
    tags=("join", "tpch", "agg", "subquery"),
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17-style small-quantity revenue: lineitems under 20% of their
    part's average quantity, for one brand. The per-part average is a
    self-aggregation joined back on partkey — co-partitioned with the fact
    scan (same key both sides, single shuffle); the brand-subset part join
    is AQE-chosen (still scale-proportional, so no forced hint)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select("p_partkey")
    avg_qty = (
        li.groupBy("l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("_sq"), F.count(F.lit(1)).alias("_n"))
        .select(
            F.col("l_partkey").alias("ap_partkey"),
            (F.lit(0.2) * (F.col("_sq").cast("string").cast("double") / F.col("_n"))).alias(
                "threshold"
            ),
        )
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity").cast("double") < F.col("threshold"))
    )
    return joined.agg(
        (F.sum(dec("l_extendedprice")).cast("string").cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
       * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
       AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND CAST(l.l_quantity AS DOUBLE) BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND CAST(l.l_quantity AS DOUBLE) BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND CAST(l.l_quantity AS DOUBLE) BETWEEN 20 AND 30)
""",
    tags=("join", "tpch", "agg"),
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19-style disjunctive predicate revenue: three OR-ed
    brand/size/quantity branches across the part join. Catalyst pushes the
    common partkey equi-join and evaluates the disjunction post-join;
    the part join is AQE-chosen (no forced hint), single global aggregate."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity").cast("double")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & qty.between(20, 30))
    )
    rev = dec("l_extendedprice") * (one() - dec("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(F.sum(rev).cast("string").cast("double").alias("revenue"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
""",
    tags=("join", "tpch", "left-join", "distribution"),
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13-style customer order-count distribution: LEFT join so
    customers with zero (non-urgent) orders survive with c_count = 0, then
    a second aggregation over the counts. Two shuffles (custkey, then
    c_count — the second is tiny); the join condition's order filter rides
    the join, not a WHERE (a WHERE would turn the left join inner). No
    broadcast hint: customer is scale-growing."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q21_waiting_suppliers",
    oracle="""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS BOOLEAN) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(*) AS numwait
FROM lo l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name LIMIT 25
""",
    tags=("join", "tpch", "semi", "anti"),
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21-style waiting suppliers: suppliers whose line was late on a
    finished multi-supplier order where NO other supplier was late (the
    reduced schema has no commit/receipt dates, so late := shipped more
    than 90 days after the order date).

    Plan shape: the exists/not-exists chain is a left-SEMI then left-ANTI
    join, both keyed on orderkey with the supplier inequality as a
    residual condition — never a count-based subquery re-aggregation. The
    lineitem-orders join and both semi/anti probes all shuffle on the SAME
    key (orderkey), so the exchange is reusable; supplier resolution joins
    last on the ~25-row survivor set (AQE picks the strategy)."""
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "late"
        ),
    )
    l1 = lo.where(F.col("late")).alias("l1")
    l2 = lo.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    l3 = lo.where(F.col("late")).select(
        F.col("l_orderkey").alias("a_orderkey"), F.col("l_suppkey").alias("a_suppkey")
    )
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("r_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("r_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("a_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("a_suppkey")),
        "left_anti",
    )
    return (
        cand.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@query(
    "q09_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(date_part('year', o.o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
            - CAST(p.p_retailprice AS DECIMAL(12,2))
              * CAST(l.l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, CAST(date_part('year', o.o_orderdate) AS BIGINT)
""",
    tags=("join", "tpch", "agg"),
)
def q09_product_profit(spark, sf_dir):
    """TPC-H Q9-style product-type profit rollup by supplier nation and
    order year (the reduced schema has no partsupp, so unit cost :=
    p_retailprice; profit = revenue - retail cost, both exact
    DECIMAL(25,4) per row before the difference and sum).

    Plan shape: the five-way join keeps the two fact joins (part-filtered
    lineitem->orders on orderkey) as shuffle joins; nation (static, 25
    rows) carries the only broadcast hint; part/supplier strategy is left
    to size statistics / AQE. One shuffle on the 2-column group key."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = dec("l_extendedprice") * (one() - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).alias("_p"))
        .select(
            "nation", "o_year", F.col("_p").cast("string").cast("double").alias("profit")
        )
    )
