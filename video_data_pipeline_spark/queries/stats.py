"""Statistical aggregates with engine-portable determinism.

Spark's ``corr``/``covar_samp``/``regr_slope`` and DuckDB's equivalents use
different accumulation algorithms (pairwise/Welford updates in different
orders), so their float outputs differ in the last ulps — unusable against
a bit-exact oracle. The portable form is the textbook sufficient-statistics
decomposition: accumulate n, Σx, Σy, Σxy, Σx², Σy² as EXACT integers
(cents / unit counts), convert once to double, and evaluate the closed
form with a fixed expression tree — every operation after the exact sums
is a deterministic IEEE op identical in both engines.

Overflow discipline: per-row products of cent-scaled values reach ~2.5e13;
int64 sums of those overflow near 4e5 rows, so the Σ(y²)-class sums
accumulate in DECIMAL(38,0) (exact integers with headroom to 1e38) and
only the final scalar converts to double.

Cross-libm caveat (transcendental fixed-point columns): the 1e-4-nat
``*_micro`` discipline used by the entropy/Gini/DSIR/unigram queries rounds
``log`` outputs to BIGINT units, assuming the JVM's ``Math.log`` and
DuckDB's libm ``log`` agree on the compared inputs. Both are
correctly-rounded-to-sub-ulp on every platform tested and all artifacts
pass bit-exact, but a value landing within an ulp of a 0.5e-4 rounding
boundary COULD flip one BIGINT unit under a different libm. That residual
risk is accepted and documented rather than papered over with a tolerance:
a tolerance in the comparator would also mask genuine aggregation-order
bugs, which the fixed-point design exists to catch.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_data_pipeline_spark.queries.registry import query, table

_D38 = "decimal(38,0)"


@query(
    "q_corr_price_qty",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(CAST(round(l_quantity) AS BIGINT)
              * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(CAST(round(l_quantity) AS BIGINT)
              * CAST(round(l_quantity) AS BIGINT) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
              * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price
FROM s
""",
    tags=("stats", "agg"),
)
def q_corr_price_qty(spark, sf_dir):
    """Pearson correlation of quantity vs extended price per return flag,
    via exact integer sufficient statistics.

    NOT ``F.corr`` — built-in correlation accumulates floats in
    engine-specific order (non-portable ulps). Here every aggregate is an
    exact integer (quantities as units, prices as cents; the squared-cents
    sums in DECIMAL(38,0) because they overflow int64 past ~4e5 rows), and
    the closed form runs on doubles converted once from exact values —
    both engines then execute the identical IEEE expression tree. One
    map-side-combined shuffle; 3 groups."""
    li = table(spark, sf_dir, "lineitem")
    x = F.round("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast(_D38)).alias("sxy"),
        F.sum((x * x).cast(_D38)).alias("sxx"),
        F.sum((y * y).cast(_D38)).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        (
            (n_d * sxy - sx * sy)
            / (F.sqrt(n_d * sxx - sx * sx) * F.sqrt(n_d * syy - sy * sy))
        ).alias("corr_qty_price"),
    )


@query(
    "q_ols_trend",
    oracle="""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
base AS (SELECT CAST(MIN(day) AS BIGINT) AS day0 FROM daily),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(day - day0) AS BIGINT) AS sx,
         CAST(SUM(cents) AS BIGINT) AS sy,
         CAST(SUM(CAST((day - day0) * cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM((day - day0) * (day - day0)) AS BIGINT) AS sxx
  FROM daily, base GROUP BY event_type
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0
         AS slope_per_day
FROM s
""",
    tags=("stats", "timeseries", "regression"),
)
def q_ols_trend(spark, sf_dir):
    """Per-event-type revenue trend: ordinary-least-squares slope of daily
    value (in currency units/day) over the day index — "is this stream
    growing?" as a closed-form aggregate, no ML library.

    Two-level cascade: exact daily cent totals first (the shuffle that
    matters, keyed (type, day)), then OLS sufficient statistics over the
    tiny daily table with the day index rebased to MIN(day) (a broadcast
    1-row scalar) so Σx² stays small. Same exact-integer-then-double
    discipline as q_corr_price_qty."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    base = daily.agg(F.min("day").alias("day0"))
    d = daily.crossJoin(F.broadcast(base)).withColumn(
        "x", F.col("day") - F.col("day0")
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum((F.col("x") * F.col("cents")).cast(_D38)).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    return s.select(
        "event_type",
        "n",
        ((n_d * sxy - sx * sy) / (n_d * sxx - sx * sx) / 100.0).alias(
            "slope_per_day"
        ),
    )


_FIXED_POINT = 10000  # 1e-4-nat fixed point, as in queries/curation.py


@query(
    "q_source_entropy",
    oracle=f"""
WITH t AS (
  SELECT source, unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
),
c AS (SELECT source, w, COUNT(*) AS cnt FROM t GROUP BY source, w),
n AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total FROM c GROUP BY source),
s AS (
  SELECT c.source,
         CAST(SUM(c.cnt * CAST(ROUND(ln(c.cnt) * {_FIXED_POINT}) AS BIGINT))
              AS BIGINT) AS sum_clnc_micro
  FROM c GROUP BY c.source
)
SELECT n.source, n.total,
       CAST(ROUND(ln(n.total) * {_FIXED_POINT}) AS BIGINT) / {_FIXED_POINT}.0
         - CAST(s.sum_clnc_micro AS DOUBLE)
           / (CAST(n.total AS DOUBLE) * {_FIXED_POINT}.0) AS entropy_nats
FROM n JOIN s ON s.source = n.source
""",
    tags=("stats", "text", "entropy"),
)
def q_source_entropy(spark, sf_dir):
    """Token-distribution Shannon entropy per document source — the
    diversity diagnostic curation pipelines use to catch collapsed or
    boilerplate-dominated sources (low entropy = one template repeated).

    H = ln(N) - (1/N)·Σ c·ln(c), with every ln evaluated per DISTINCT
    (source, token) count, rounded to 1e-4-nat fixed point, and folded as
    an exact BIGINT sum (the curation-module discipline: transcendentals
    only on bounded-cardinality tables, never inside a float fold). The
    per-(source, token) table is vocabulary-sized — shuffle-aggregated,
    never broadcast."""
    d = table(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(F.expr("split(trim(text), ' +')")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lnc = F.round(F.log("cnt") * _FIXED_POINT).cast("bigint")
    s = c.groupBy("source").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * lnc).alias("sum_clnc_micro"),
    )
    lnn = F.round(F.log("total") * _FIXED_POINT).cast("bigint")
    return s.select(
        "source",
        "total",
        (
            lnn / float(_FIXED_POINT)
            - F.col("sum_clnc_micro").cast("double")
            / (F.col("total").cast("double") * _FIXED_POINT)
        ).alias("entropy_nats"),
    )


@query(
    "q_revenue_gini",
    oracle="""
WITH cust AS (
  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i FROM cust
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sy,
         CAST(SUM(CAST(i * cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS siy
  FROM ranked
)
SELECT n,
       2.0 * CAST(siy AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE))
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM s
""",
    tags=("stats", "window", "inequality"),
)
def q_revenue_gini(spark, sf_dir):
    """Gini coefficient of per-customer revenue — the concentration
    diagnostic for "is this corpus/revenue dominated by a few
    contributors" (in curation: a few domains contributing most
    documents). G = 2·Σ(i·yᵢ)/(n·Σy) − (n+1)/n over ascending-sorted
    exact cent totals with a deterministic rank tie-break.

    The global rank is a two-pass range-partitioned sort, NOT a
    single-partition ORDER window (which Spark would coalesce to one
    task): rows range-shuffle on (cents, o_custkey) — a total order, so
    ranks are boundary-independent — each partition ranks locally, and
    Σ(i·y) folds per partition as Σ(local_i·y) + offset·Σy where offset
    is the cumulative row count of lower ranges (computed on the
    ≤shuffle-partitions-row per-partition summary). One extra tiny
    window over ~32 rows buys a rank that scales to billions of
    customers. Σ(i·y) accumulates in DECIMAL(38,0): rank × cents
    products overflow int64 past ~10^6 well-heeled customers."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    ranged = cust.repartitionByRange("cents", "o_custkey").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("pid").orderBy("cents", "o_custkey")
    ranked = ranged.select(
        "pid", "cents", F.row_number().over(w_local).alias("li")
    )
    per = ranked.groupBy("pid").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("cents").alias("sy_p"),
        F.sum((F.col("li") * F.col("cents")).cast(_D38)).alias("sliy_p"),
    )
    # per has at most spark.sql.shuffle.partitions rows — the ordered
    # window here is bounded, not data-sized
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(
        "cnt",
        "sy_p",
        "sliy_p",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
    )
    s = offs.agg(
        F.sum("cnt").alias("n"),
        F.sum("sy_p").alias("sy"),
        F.sum(
            F.col("sliy_p") + F.col("off").cast(_D38) * F.col("sy_p").cast(_D38)
        ).cast(_D38).alias("siy"),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        "n",
        (
            2.0 * F.col("siy").cast("double") / (n_d * F.col("sy").cast("double"))
            - (n_d + 1.0) / n_d
        ).alias("gini"),
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _duck_profile_sql() -> str:
    parts = [
        f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
        f"COUNT(*) - COUNT({c}) AS n_null, "
        f"COUNT(DISTINCT {c}) AS n_distinct, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_val, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_val FROM documents"
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


@query("q_profile", oracle=_duck_profile_sql(), tags=("stats", "profile"))
def q_profile(spark, sf_dir):
    """Column profiler — the per-column health report (row/null/distinct
    counts, min/max) a pipeline runs before and after every curation
    stage to catch schema rot, null floods, and collapsed domains.

    ONE corpus pass: all 5×4 metrics fold in a single aggregate (the
    multiple COUNT DISTINCTs plan as one Expand — a 5× row fan-out in the
    map stage, still one scan and one shuffle of 1 row per metric group),
    then a ``stack`` pivots the 1-row result to the per-column report.
    min/max are computed on the NATIVE type and cast to string afterwards,
    so numeric columns report numeric extrema, not lexicographic ones.
    The oracle scans once per column (5 scans) — fine for an oracle,
    wrong for 100 TB; the one-pass shape is the point of the Spark plan."""
    d = table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    one = d.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
