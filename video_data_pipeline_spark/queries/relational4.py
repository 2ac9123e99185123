"""Relational coverage, part 4: the remaining TPC-H plan shapes.

The reduced test schema has no partsupp table and no l_shipmode /
commit-date columns, so these analogs re-target the same PLAN SHAPES onto
the columns that exist:

- Q11 "important stock" -> ``q11_important_parts``: per-group aggregate
  filtered against a GLOBAL scalar aggregate (broadcast scalar subquery).
- Q12 "shipmode priority" -> ``q12_priority_lateness``: fact-fact join with
  conditional (CASE) aggregation into parallel counters.
- Q16 "parts/supplier relationship" -> ``q16_supplier_part_counts``:
  COUNT(DISTINCT) grouping over a fact-derived relationship pair set.
- Q20 "excess availability" -> ``q20_dominant_shippers``: two-level
  aggregation (pair totals re-aggregated to group totals) joined back to
  flag dominant contributors.

Scale notes are per-query; every shape here avoids driver actions and
keeps its shuffles keyed on uniform TPC-H keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_data_pipeline_spark.queries.common import DEC, SQL_ONE, dec, one, sql_dec
from video_data_pipeline_spark.queries.registry import query, table


@query(
    "q11_important_parts",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey,
         SUM({sql_dec('l_extendedprice')} * ({SQL_ONE} - {sql_dec('l_discount')}))
           AS value_dec
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM pv, (SELECT SUM(value_dec) AS total_dec, COUNT(*) AS n_parts FROM pv)
WHERE CAST(value_dec AS DOUBLE) * n_parts > CAST(total_dec AS DOUBLE) * 1.5
ORDER BY part_value DESC, l_partkey LIMIT 100
""",
    tags=("agg", "tpch", "scalar-subquery"),
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11-style important parts: parts whose discounted revenue
    exceeds 1.5x the mean per-part revenue. (Q11's fixed global fraction
    returns the empty set as the part table grows — a mean-relative
    threshold is the scale-invariant form of the same shape.)

    Plan shape: ONE aggregation subtree (per-part decimal sums) reused for
    both the rows and the global total — the total re-aggregates the
    per-part result (tiny: |parts| rows), never rescans lineitem, and
    reaches the filter as a broadcast 1-row cross join, Spark's scalar-
    subquery shape. The threshold compare is division-free (value*n >
    1.5*total) on exact-decimal-derived doubles — decimal AVG rounding
    differs across engines, double multiply does not. 100 TB: one
    uniform-key shuffle on l_partkey + a 1-row broadcast; the second agg
    is proportional to distinct parts."""
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice") * (one() - dec("l_discount"))).alias("value_dec")
    )
    total = per_part.agg(
        F.sum("value_dec").alias("total_dec"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec").cast("double") * F.col("n_parts")
            > F.col("total_dec").cast("double") * 1.5
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
        .limit(100)
    )


@query(
    "q12_priority_lateness",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_returnflag
""",
    tags=("join", "tpch", "conditional-agg"),
)
def q12_priority_lateness(spark, sf_dir):
    """TPC-H Q12-style: among LATE lines (shipped >60 days after the order
    date — the reduced schema's lateness signal, as in q21), how many came
    from high- vs low-priority orders, per return flag.

    Plan shape: fact-fact equi-join on orderkey with the lateness predicate
    as a join residual, then conditional aggregation — two CASE counters in
    ONE pass, never two filtered sub-aggregations union'd. Both inputs
    project to 2-3 columns before the join (ReadSchema stays narrow); the
    3-group result makes the final agg a map-side-combine near-no-op."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    tags=("join", "tpch", "count-distinct"),
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16-style supplier/part relationship counts. The schema has no
    partsupp table, so the relationship set is derived from the fact table
    (DISTINCT (l_partkey, l_suppkey)) — on real data that derived pair set
    is exactly what partsupp materializes.

    Plan shape: the DISTINCT and the part join both hash on l_partkey, so
    the pair-set exchange is reusable into the join; the dimension filters
    (brand/type/size) prune part BEFORE the join. COUNT(DISTINCT suppkey)
    is Spark's expand-based two-phase distinct aggregate — no driver-side
    set. part is scale-growing: no broadcast hint, AQE decides."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = li.distinct()
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_dominant_shippers",
    oracle=f"""
WITH sq AS (
  SELECT l_partkey, l_suppkey, SUM({sql_dec('l_quantity')}) AS supp_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), pt AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty, COUNT(*) AS n_supp
  FROM sq GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS dominated_parts
FROM sq
JOIN pt ON pt.l_partkey = sq.l_partkey
JOIN supplier s ON s.s_suppkey = sq.l_suppkey
WHERE CAST(supp_qty AS DOUBLE) * n_supp > 4 * CAST(part_qty AS DOUBLE)
GROUP BY s.s_suppkey, s.s_name
ORDER BY dominated_parts DESC, s.s_suppkey LIMIT 20
""",
    tags=("agg", "tpch", "two-level-agg"),
)
def q20_dominant_shippers(spark, sf_dir):
    """TPC-H Q20-style excess-share detection: suppliers who shipped more
    than 4x their FAIR SHARE of some part's total shipped quantity, ranked
    by how many parts they dominate (availqty doesn't exist in the reduced
    schema; shipped-quantity share is the analogous dominance signal, and
    the fair-share-relative threshold stays non-degenerate as the
    supplier-per-part fan-in grows with scale). The compare is
    division-free on exact-decimal-derived doubles.

    Plan shape: two-LEVEL aggregation — exact decimal pair sums
    (l_partkey, l_suppkey), re-aggregated per part, then a self-join of
    the two levels on l_partkey. The pair agg's exchange hash-partitions
    on (partkey, suppkey); the per-part re-agg and the join re-key on
    partkey — the re-agg input is |distinct pairs|, not |lineitem|, so the
    second shuffle is already reduced. Supplier names resolve last on the
    tiny dominant set (AQE broadcast)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("supp_qty")
    )
    pt = sq.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    return (
        sq.join(pt, "l_partkey")
        .where(
            F.col("supp_qty").cast("double") * F.col("n_supp")
            > 4 * F.col("part_qty").cast("double")
        )
        .join(s, sq.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("dominated_parts"))
        .orderBy(F.col("dominated_parts").desc(), "s_suppkey")
        .limit(20)
    )


@query(
    "q_grouped_quantiles",
    oracle="""
WITH ranked AS (
  SELECT p_brand, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice, p_partkey) AS rn,
         COUNT(*) OVER (PARTITION BY p_brand) AS n
  FROM part
)
SELECT p_brand, pct, p_retailprice AS price
FROM ranked, (SELECT unnest([25, 50, 75]) AS pct)
WHERE rn = (pct * n + 99) // 100
""",
    tags=("window", "orderstat", "quantile"),
)
def q_grouped_quantiles(spark, sf_dir):
    """Exact p25/p50/p75 retail price per brand in ONE ranking pass.

    Order-statistic SELECTION (row at rank ceil(q*n)) instead of
    interpolating percentiles: interpolation arithmetic differs across
    engines, element selection cannot. The rank comparison is pure integer
    math — ``(pct*n + 99) div 100`` is ceil without touching doubles. One
    shuffle on p_brand (the window), then a 3-row explode and a codegen'd
    filter; nothing global. The discrete-median query (q_median_price) is
    the k=1 special case; this is the general multi-quantile form."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    ranked = p.select(
        "p_brand",
        "p_retailprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("p_brand")).alias("n"),
    )
    return (
        ranked.select(
            "p_brand",
            "p_retailprice",
            "rn",
            "n",
            F.explode(F.array(F.lit(25), F.lit(50), F.lit(75))).alias("pct"),
        )
        .where(F.col("rn") == F.expr("(pct * n + 99) div 100"))
        .select("p_brand", "pct", F.col("p_retailprice").alias("price"))
    )


_SCD2_T0 = "1990-01-01 00:00:00"
_SCD2_CHANGE_TS = "1998-01-01 00:00:00"


@query(
    "q_scd2_lookup",
    oracle=f"""
WITH changed AS (
  SELECT c_custkey, c_acctbal + 100.0 AS new_bal
  FROM customer WHERE c_custkey % 7 = 0
),
versions AS (
  SELECT c.c_custkey, c.c_acctbal AS bal,
         TIMESTAMP '{_SCD2_T0}' AS valid_from,
         CASE WHEN ch.c_custkey IS NOT NULL
              THEN TIMESTAMP '{_SCD2_CHANGE_TS}' END AS valid_to,
         ch.c_custkey IS NULL AS is_current
  FROM customer c LEFT JOIN changed ch ON ch.c_custkey = c.c_custkey
  UNION ALL
  SELECT c_custkey, new_bal, TIMESTAMP '{_SCD2_CHANGE_TS}', NULL, TRUE
  FROM changed
)
SELECT v.is_current AS matched_current_version,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN versions v
  ON v.c_custkey = o.o_custkey
 AND v.valid_from <= o.o_orderdate
 AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
GROUP BY v.is_current
""",
    tags=("join", "scd2", "temporal"),
)
def q_scd2_lookup(spark, sf_dir):
    """Point-in-time lookup against an SCD2 dimension: each order joins the
    customer VERSION that was valid on its order date (not today's row).

    The dimension history is built by :func:`operators.merge.scd2_apply`
    (a deterministic synthetic change set: every 7th customer's balance
    bumped at 1998-01-01); the oracle hand-writes the same version table in SQL,
    so this row doubles as the operator's correctness gate. The temporal
    probe is an equi-join on the surrogate key with the validity window as
    a RESIDUAL predicate — per-key version counts are small (2 here, a few
    dozen in real dimensions), so no interval bucketing is needed; the
    bucketed :func:`operators.rangejoin.interval_join` is the fallback
    when a "dimension" is keyless windows. One shuffle keyed on custkey;
    versions are dim-sized, AQE broadcasts them."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    from video_data_pipeline_spark.operators.merge import scd2_apply

    dim = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("bal"),
        F.lit(_SCD2_T0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = c.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100.0).alias("bal")
    )
    versions = scd2_apply(
        dim, changes, on="c_custkey", change_ts=_SCD2_CHANGE_TS, tracked_cols=["bal"]
    )
    probe = o.join(
        versions,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("valid_from") <= F.col("o_orderdate"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))),
    )
    return probe.groupBy(
        F.col("is_current").alias("matched_current_version")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
    )


@query(
    "q_skyline",
    oracle="""
WITH ranked AS (
  SELECT p_partkey, p_retailprice, p_size,
         MIN(p_size) OVER (ORDER BY p_retailprice, p_partkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_size_so_far
  FROM part
)
SELECT p_partkey, p_retailprice, p_size
FROM ranked
WHERE best_size_so_far IS NULL OR p_size < best_size_so_far
ORDER BY p_retailprice, p_partkey
""",
    tags=("window", "skyline"),
)
def q_skyline(spark, sf_dir):
    """2-D skyline (Pareto front): parts where no other part is both
    cheaper-or-equal AND smaller (minimize price and size).

    The textbook formulation is a quadratic NOT EXISTS self-join; the 2-D
    case collapses to ONE ordered window pass — sort by price (partkey
    tie-break), keep a row iff its size beats the running minimum of all
    earlier rows. O(n log n) as a single range-partitioned sort instead of
    O(n^2) probing; the same sort-based reduction Börzsönyi et al.'s BNL
    skyline degenerates to in 2-D. The global ORDER window is a range
    exchange (parallel sort), not a single partition: Spark windows with
    an ORDER BY but no PARTITION BY do coalesce to one partition, so at
    scale this query would pre-bucket by a price range split — here the
    part table is dimension-sized and the single-sort is the honest plan;
    the docstring records the 100 TB variant."""
    p = table(spark, sf_dir, "part")
    w = (
        Window.orderBy("p_retailprice", "p_partkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = p.select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.min("p_size").over(w).alias("best_size_so_far"),
    )
    return (
        ranked.where(
            F.col("best_size_so_far").isNull()
            | (F.col("p_size") < F.col("best_size_so_far"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


@query(
    "q_delta_rollup",
    oracle="""
SELECT date_trunc('month', o_orderdate) AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
""",
    tags=("agg", "incremental"),
)
def q_delta_rollup(spark, sf_dir):
    """Incremental aggregate maintenance: the monthly rollup is kept as a
    MERGE of partial aggregates — base partition (o_orderkey % 10 != 0,
    standing in for the stored materialized rollup) full-outer-joined with
    the delta batch's own aggregate, counters coalesced-and-added — and
    must equal the full recompute (the oracle) exactly, because count/sum
    over exact DECIMAL are associative and commutative. This is the
    100 TB contract for continuous ingestion: the delta's aggregation
    touches only delta rows, the stored rollup is never rebuilt, and the
    merge joins two month-keyed aggregate tables (AQE broadcasts the
    delta side when it is small). Sums stay DECIMAL through the merge and
    cast to double only at the output boundary, so merged == recomputed
    bit-for-bit."""
    o = table(spark, sf_dir, "orders")

    def monthly(df):
        return df.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).alias("rev"),
        )

    base = monthly(o.where(F.col("o_orderkey") % 10 != 0))
    delta = monthly(o.where(F.col("o_orderkey") % 10 == 0))
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, "month", "full")
        .select(
            "month",
            (
                F.coalesce(F.col("b.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("b.rev"), F.lit(0).cast(DEC))
                + F.coalesce(F.col("d.rev"), F.lit(0).cast(DEC))
            )
            .cast("double")
            .alias("revenue"),
        )
    )
