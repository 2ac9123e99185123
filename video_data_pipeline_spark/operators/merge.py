"""MERGE INTO / SCD2 emulation as plain DataFrame programs.

No Delta/Iceberg jars ship in this environment, so the lakehouse verbs are
expressed relationally (ROADMAP r1 #8): a MERGE is a full-outer join with
per-branch column selection; SCD2 versioning closes current rows and
appends new versions. Both are deterministic, shuffle once on the merge
key, and write back as a plain parquet overwrite — the transactional
guarantees (conflict detection, snapshot isolation) are exactly what the
table format would add; the *semantics* below are format-agnostic.

At 100 TB: the join is key-partitioned (broadcast the change set when
small — the common case for CDC batches); SCD2 appends are blind unions,
no rewrite of closed history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str,
    update_cols: list[str] | None = None,
    insert: bool = True,
    delete_condition=None,
    broadcast_source: bool = True,
) -> DataFrame:
    """MERGE semantics: matched rows take ``update_cols`` from the source
    (others keep target values), unmatched source rows insert (when
    ``insert``), unmatched target rows persist, and matched rows meeting
    ``delete_condition`` (evaluated on the joined row) are dropped.

    Column set = target's columns; the source must provide ``on`` +
    ``update_cols`` (+ all target columns when ``insert``)."""
    cols = target.columns
    update_cols = update_cols if update_cols is not None else [c for c in cols if c != on]
    t = target.alias("t")
    s = (F.broadcast(source) if broadcast_source else source).alias("s")
    joined = t.join(s, F.col(f"t.{on}") == F.col(f"s.{on}"), "full_outer")
    matched = F.col(f"t.{on}").isNotNull() & F.col(f"s.{on}").isNotNull()
    source_only = F.col(f"t.{on}").isNull()
    if delete_condition is not None:
        joined = joined.where(~(matched & delete_condition))
    if not insert:
        joined = joined.where(~source_only)
    out_cols = []
    for c in cols:
        if c == on:
            expr = F.coalesce(F.col(f"t.{on}"), F.col(f"s.{on}"))
        elif c in source.columns:
            # inserts take every source column; matched rows take source
            # values only for the update set
            take_source = source_only | (matched if c in update_cols else F.lit(False))
            expr = F.when(take_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            expr = F.col(f"t.{c}")
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    on: str,
    change_ts,
    tracked_cols: list[str] | None = None,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type 2: for keys present in ``changes``
    with a DIFFERENT tracked-attribute tuple, close the current version
    (``valid_to`` = change_ts, ``is_current`` = false) and append the new
    version (``valid_from`` = change_ts, open-ended). Unchanged keys and
    closed history pass through untouched.

    ``dim`` must carry (on, tracked..., valid_from, valid_to, is_current);
    ``changes`` carries (on, tracked...). ``broadcast_changes`` defaults to
    True — CDC batches are usually dim-fraction-sized — but MUST be False
    when the change set is fact-sized (e.g. a full-snapshot diff): a forced
    broadcast of a scale-growing side is a 100×-scale killer (VERDICT r3
    #3); AQE then picks the strategy from actual sizes."""
    attrs = tracked_cols if tracked_cols is not None else [
        c for c in changes.columns if c != on
    ]
    ts = F.lit(change_ts).cast("timestamp")
    d = dim.alias("d")
    c = (F.broadcast(changes) if broadcast_changes else changes).alias("c")
    joined = d.join(c, F.col(f"d.{on}") == F.col(f"c.{on}"), "left")
    # pairwise null-safe column compare — never serialize the tuple to one
    # string: concat_ws skips NULLs, so (x, NULL, y) vs (x, y, NULL) would
    # collide and a real change would silently not be versioned
    any_attr_differs = None
    for a in attrs:
        diff = ~F.col(f"d.{a}").eqNullSafe(F.col(f"c.{a}"))
        any_attr_differs = diff if any_attr_differs is None else (any_attr_differs | diff)
    differs = F.col(f"c.{on}").isNotNull() & (
        any_attr_differs if any_attr_differs is not None else F.lit(False)
    )
    closing = F.col(f"d.{current_col}") & differs
    # existing rows: close the superseded current versions
    kept = joined.select(
        *[F.col(f"d.{x}").alias(x) for x in dim.columns if x not in (to_col, current_col)],
        F.when(closing, ts).otherwise(F.col(f"d.{to_col}")).alias(to_col),
        F.when(closing, F.lit(False)).otherwise(F.col(f"d.{current_col}")).alias(
            current_col
        ),
    )
    # new versions for changed keys (one per key — changes are a keyed set)
    new_versions = (
        d.where(F.col(current_col))
        .join(c, F.col(f"d.{on}") == F.col(f"c.{on}"))
        .where(differs)
        .select(
            F.col(f"d.{on}").alias(on),
            *[F.col(f"c.{a}").alias(a) for a in attrs],
            *[
                F.col(f"d.{x}").alias(x)
                for x in dim.columns
                if x not in (on, *attrs, from_col, to_col, current_col)
            ],
            ts.alias(from_col),
            F.lit(None).cast("timestamp").alias(to_col),
            F.lit(True).alias(current_col),
        )
    )
    return kept.unionByName(new_versions.select(*kept.columns))
