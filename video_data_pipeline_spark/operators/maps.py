"""Map-family operators with row-level error policies.

The reference applies per-sample functions with a pluggable error handler
(``filters.py:305-322`` ``_map``; ``handlers.py:21-47`` policies: reraise /
ignore_and_continue / warn_and_continue / ignore_and_stop / warn_and_stop).
Spark's fault model is task-retry, not row-skip — so "continue" semantics are
implemented by UDF wrappers that never throw: failures yield null plus an
error column, and the policy becomes a filter + observable metric.

SURVEY.md §7 "What's hard" (3): this is the engine-wide error-tolerance
pattern; any UDF in the hot path should go through ``map_with_policy``.
"""

from __future__ import annotations

import warnings
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Reference handler policy names (handlers.py:21-47).
POLICIES = ("reraise", "ignore_and_continue", "warn_and_continue")


def map_with_policy(
    fn: Callable,
    input_cols: list[str],
    output_col: str,
    output_type: str,
    policy: str = "ignore_and_continue",
    error_col: str = "__error__",
):
    """Apply a Python function per row batch (Arrow-vectorized) with
    reference-style error tolerance.

    ``fn`` receives one pandas Series per input column and must return a
    Series; per-element exceptions are caught element-wise: the output is
    null and ``error_col`` records the message. Policy:

    - ``reraise``: any error fails the job (reference default).
    - ``ignore_and_continue``: failed rows are dropped.
    - ``warn_and_continue``: failed rows dropped with a Python warning.
    """
    if policy not in POLICIES:
        raise ValueError(f"unknown policy {policy!r}; expected one of {POLICIES}")

    out_schema = f"`{output_col}` {output_type}, `{error_col}` string"

    def _batch(iterator):
        for pdf in iterator:
            vals, errs = [], []
            for row in pdf.itertuples(index=False):
                try:
                    vals.append(fn(*row))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — row-level tolerance by design
                    vals.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({output_col: vals, error_col: errs})

    def _op(df: DataFrame) -> DataFrame:
        cols = df.columns
        mapped = df.select(*cols).mapInPandas(
            _make_passthrough(_batch, cols), schema=_full_schema(df, out_schema)
        )
        if policy == "reraise":
            # fail fast if any row errored
            bad = mapped.filter(F.col(error_col).isNotNull())
            first = bad.select(error_col).first()
            if first is not None:
                raise RuntimeError(f"map_with_policy(reraise): {first[0]}")
            return mapped.drop(error_col)
        if policy == "warn_and_continue":
            n_bad = mapped.filter(F.col(error_col).isNotNull()).count()
            if n_bad:
                warnings.warn(f"map_with_policy: dropped {n_bad} failed rows", stacklevel=2)
        return mapped.filter(F.col(error_col).isNull()).drop(error_col)

    return _op


def _full_schema(df: DataFrame, out_schema: str) -> str:
    base = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    return f"{base}, {out_schema}"


def _make_passthrough(batch_fn, cols):
    def _fn(iterator):
        for pdf in iterator:
            out = next(batch_fn(iter([pdf[list(cols)]])))
            yield pd.concat([pdf.reset_index(drop=True), out.reset_index(drop=True)], axis=1)

    return _fn
