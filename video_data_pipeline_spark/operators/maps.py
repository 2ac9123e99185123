"""Map-family operators with row-level error policies.

The reference applies per-sample functions with a pluggable error handler
(``filters.py:305-322`` ``_map``; ``handlers.py:21-47`` policies: reraise /
ignore_and_continue / warn_and_continue / ignore_and_stop / warn_and_stop).
Spark's fault model is task-retry, not row-skip — so "continue" semantics are
implemented by UDF wrappers that never throw: failures yield null plus an
error column, and the policy becomes a filter + observable metric.

"Stop" semantics: in the reference each worker's stream terminates at its
first error (``handlers.py``: the handler returns False and the pipeline
loop breaks). The Spark analog of a worker stream is a partition, so
``*_and_stop`` keeps each partition's successful prefix and drops everything
from the first failed row onward — the job itself succeeds, mirroring the
reference's graceful stop (``reraise`` is the fail-the-job policy).

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
POLICIES = (
    "reraise",
    "ignore_and_continue",
    "warn_and_continue",
    "ignore_and_stop",
    "warn_and_stop",
)


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

    ``fn`` receives the input-column values of one row and must return the
    output value; per-element exceptions are caught element-wise. Policy:

    - ``reraise``: any error fails the job (reference default).
    - ``ignore_and_continue``: failed rows are dropped.
    - ``warn_and_continue``: failed rows dropped with a Python warning.
    - ``ignore_and_stop``: each partition keeps its successful prefix and
      stops at its first error (worker-stream stop semantics).
    - ``warn_and_stop``: as above, with a warning at the stop site.
    """
    if policy not in POLICIES:
        raise ValueError(f"unknown policy {policy!r}; expected one of {POLICIES}")
    stop_on_error = policy in ("ignore_and_stop", "warn_and_stop")

    def _op(df: DataFrame) -> DataFrame:
        cols = df.columns
        out_schema = f"`{output_col}` {output_type}, `{error_col}` string"

        def _part(iterator):
            for pdf in iterator:
                vals: list = []
                errs: list = []
                stopped = False
                for row in pdf[list(input_cols)].itertuples(index=False):
                    try:
                        vals.append(fn(*row))
                        errs.append(None)
                    except Exception as e:  # noqa: BLE001 — row-level tolerance by design
                        if stop_on_error:
                            if policy == "warn_and_stop":
                                warnings.warn(
                                    f"map_with_policy(warn_and_stop): stopping "
                                    f"partition stream: {type(e).__name__}: {e}",
                                    stacklevel=2,
                                )
                            stopped = True
                            break
                        vals.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                out = pd.DataFrame({output_col: vals, error_col: errs})
                kept = pdf.iloc[: len(vals)].reset_index(drop=True)
                yield pd.concat([kept, out], axis=1)
                if stopped:
                    return

        mapped = df.mapInPandas(_part, schema=_full_schema(df, out_schema))
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
