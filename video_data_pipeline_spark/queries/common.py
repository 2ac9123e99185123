"""Shared helpers keeping Spark programs and DuckDB oracles bit-identical.

Determinism rules (see queries/registry.py docstring):
- Money math: cast to DECIMAL(12,2) operands → exact decimal products/sums
  (scale ≤ 6, fits precision 38 in both engines) → CAST AS DOUBLE only at
  the output boundary. At sf≤0.1 the scaled integer representation stays
  < 2^53, so decimal→double conversion is exact in both engines.
- Ratios: double division of exact components (IEEE-identical both sides).
- Randomness/hashing: stable_hash64 (functions/hashing.py), identical text
  in both dialects.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def one() -> Column:
    """Decimal literal 1.00 (lazy: building literals needs a live session)."""
    return F.lit(1).cast(DEC)

# SQL snippets for DuckDB oracles
def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


SQL_ONE = "CAST(1 AS DECIMAL(12,2))"

#: Spark-side and DuckDB-side 60-bit md5 hash with identical output.
SPARK_HASH = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
DUCK_HASH = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
