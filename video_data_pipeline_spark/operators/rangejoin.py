"""Bucketed range join: point-in-interval matching WITHOUT an equi key.

Spark executes a bare ``ON p.x BETWEEN i.lo AND i.hi`` join as a
BroadcastNestedLoopJoin (or a cartesian product when neither side fits in
memory) — per-row probing that is O(|points| * |intervals|) and the classic
100-TB cliff for telemetry-vs-window joins. The standard fix is to
discretize the axis into fixed-width buckets:

- each POINT belongs to exactly one bucket: ``floor(x / width)``
- each INTERVAL is exploded to every bucket it overlaps:
  ``sequence(floor(lo / width), floor(hi / width))``

and the join becomes a plain hash EQUI-join on the bucket id, with the
exact ``BETWEEN`` kept as a residual filter. Every matching (point,
interval) pair meets in exactly ONE bucket — the point's — so the result
needs no dedup. This is the same strategy Databricks ships as "range join
optimization" bin hints and Flink uses for interval joins; here it is
composed from public DataFrame ops (explode + sequence + join).

Cost model: interval replication factor is ``len(interval)/width + 1``, and
bucket fan-in is the number of intervals overlapping a width-sized slice —
pick ``width`` near the TYPICAL interval length so both stay O(1). A
degenerate interval spanning the whole axis would explode; ``max_span``
guards that (raise, don't silently truncate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    width: int,
    max_span: int = 1 << 20,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them:
    ``lo <= point <= hi`` over integer-valued columns (epoch millis, byte
    offsets, ...). Returns the joined rows with all columns of both inputs.

    ``width`` is the bucket size in the column's own unit; ``max_span``
    bounds per-interval bucket replication (an interval wider than
    ``max_span * width`` raises at plan-build time via a runtime check
    column rather than exploding the cluster).
    """
    if width <= 0:
        raise ValueError("width must be positive")

    def bucket_of(col: str) -> Column:
        # exact floor division in pure bigint arithmetic: double-based
        # floor(a/b) silently loses ulps past 2^53, and `div` alone
        # truncates toward zero for negative axes (pre-epoch timestamps,
        # signed offsets); a - pmod(a, b) is the exact floor multiple.
        return F.expr(f"(({col}) - pmod(({col}), {width})) div {width}")

    p = points.withColumn(_BUCKET, bucket_of(point_col))
    lo_b = bucket_of(lo_col)
    hi_b = bucket_of(hi_col)
    guarded_hi = F.when(
        hi_b - lo_b <= F.lit(max_span), hi_b
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"interval spans more than max_span={max_span} buckets: ["),
                F.col(lo_col).cast("string"),
                F.lit(", "),
                F.col(hi_col).cast("string"),
                F.lit("]"),
            )
        ).cast("bigint")
    )
    i = intervals.withColumn(_BUCKET, F.explode(F.sequence(lo_b, guarded_hi)))
    return (
        p.join(i, _BUCKET)
        .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop(_BUCKET)
    )
