"""Skew-mitigation operators.

The reference never shuffles data (SURVEY.md §4: modulo shard striping
only), so skew was the operator's problem — e.g. one giant tar. In Spark,
hot grouping keys concentrate on one reducer. Two standard mitigations
live here; the third (AQE skew-join splitting) is enabled in the session
factory (`spark.sql.adaptive.skewJoin.enabled`).

``salted_agg`` implements two-phase aggregation: a deterministic salt
spreads each hot key over ``n_salt`` reducers for the partial aggregate,
then a second (tiny) exchange combines partials.

Honesty note: for sum/count/min/max, Spark's hash aggregate already does
map-side partials, so reducer skew is rare — those are supported mainly so
mixed agg lists can ride along. The case that genuinely needs salting is
**holistic-ish state that partials can't shrink**: ``collect_list`` (and
by extension collect-heavy reshaping), where one hot key otherwise drags
its entire value set through a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial → final combiner for algebraic aggregates
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    # collect_list: the skew-prone one (no map-side shrink); final output
    # order is nondeterministic across salts — sort downstream if needed
    "collect_list": (F.collect_list, lambda c: F.flatten(F.collect_list(c))),
}


def salted_agg(
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
    salt_source: str | None = None,
):
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (function, input column) with function in
    {sum, count, min, max}. ``salt_source`` (default: the first non-key
    column) feeds the deterministic salt hash — pick a high-cardinality
    column so the salt actually spreads rows.

    Example::

        df.transform(salted_agg(["l_returnflag"],
                                {"sum_qty": ("sum", "l_quantity"),
                                 "n": ("count", "l_orderkey")}))
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _COMBINERS:
            raise ValueError(f"{name}: {fn!r} is not algebraic; use plain groupBy")

    def _op(df: DataFrame) -> DataFrame:
        src = salt_source or next(c for c in df.columns if c not in key_cols)
        salt = F.pmod(F.xxhash64(F.col(src)), F.lit(n_salt)).alias("__salt__")
        partial = df.groupBy(*key_cols, salt).agg(
            *[
                _COMBINERS[fn][0](F.col(col)).alias(f"__p_{name}")
                for name, (fn, col) in aggs.items()
            ]
        )
        return partial.groupBy(*key_cols).agg(
            *[
                _COMBINERS[fn][1](F.col(f"__p_{name}")).alias(name)
                for name, (fn, col) in aggs.items()
            ]
        )

    return _op
