"""Projection-family operators.

Reference semantics (``webdataset-private/webdataset/filters.py``):
- ``to_tuple(*specs)`` — each spec ``"a;b;c"`` projects the first present
  field among alternatives (``getfirst``, filters.py:105-118, 386-406).
- ``rename(**kw)`` — rename with ``;``-alternatives, optional keep of
  unrenamed fields (filters.py:325-347).
- ``extract_keys(*globs)`` — glob-pattern projection (filters.py:567-585).

Spark mapping: alternatives become ``coalesce`` (evaluated JVM-side); glob
projection resolves at *plan time* against ``df.columns`` so Catalyst still
sees a plain column-pruned select (the pruning reaches the parquet scan).
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_tuple(*specs: str, missing_is_error: bool = True):
    """Project first-present alternatives: ``to_tuple("jpg;png", "txt;json")``.

    Each ``;``-separated spec becomes ``coalesce(jpg, png)`` aliased to the
    first name. With ``missing_is_error=False``, specs whose columns are all
    absent are skipped (reference getfirst missing_is_error, filters.py:105).
    """

    def _op(df: DataFrame) -> DataFrame:
        cols = []
        for spec in specs:
            alts = [a for a in spec.split(";") if a]
            present = [a for a in alts if a in df.columns]
            if not present:
                if missing_is_error:
                    raise KeyError(f"to_tuple: no alternative of {spec!r} in {df.columns}")
                continue
            cols.append(F.coalesce(*[F.col(a) for a in present]).alias(alts[0]))
        return df.select(*cols)

    return _op


def rename(keep: bool = True, **kw: str):
    """``rename(image="jpg;png")`` — new name ← first present alternative.

    ``keep=True`` preserves unrenamed columns (filters.py:332).
    """

    def _op(df: DataFrame) -> DataFrame:
        consumed: set[str] = set()
        cols = []
        for new, spec in kw.items():
            alts = [a for a in spec.split(";") if a in df.columns]
            if not alts:
                raise KeyError(f"rename: no alternative of {spec!r} in {df.columns}")
            consumed.update(alts)
            cols.append(F.coalesce(*[F.col(a) for a in alts]).alias(new))
        if keep:
            cols = [F.col(c) for c in df.columns if c not in consumed] + cols
        return df.select(*cols)

    return _op


def extract_keys(*globs: str, duplicate_is_error: bool = True):
    """Glob-projection: ``extract_keys("l_*", "*key")`` (filters.py:567-585).

    Resolved at plan time so the result is an ordinary pruned select.
    """

    def _op(df: DataFrame) -> DataFrame:
        out: list[str] = []
        for g in globs:
            matches = fnmatch.filter(df.columns, g)
            if not matches:
                raise KeyError(f"extract_keys: {g!r} matched nothing in {df.columns}")
            for m in matches:
                if m in out:
                    if duplicate_is_error:
                        raise KeyError(f"extract_keys: duplicate column {m!r}")
                    continue
                out.append(m)
        return df.select(*out)

    return _op
