"""Batching / collation operators (reference ``filters.py:464-551``).

In Spark, columnar batching is *internal* (Tungsten/Arrow) — ``batched`` +
``default_collation_fn`` map to "do nothing" for performance purposes
(SURVEY.md §1.2). These operators exist for semantic parity where a batch
must be a first-class row (e.g. writing fixed-size shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def batched(order_by: list[str], n: int, partial: bool = True, batch_col: str = "batch_id"):
    """Assign each row a batch id = floor(position / n) under an explicit
    total order (reference ``batched``, filters.py:497-528).

    ``partial=False`` drops the trailing incomplete batch (partial= flag).
    Note the global row_number window is a single-reducer pattern — fine for
    shard assignment of file-sized rows, not for per-record hot paths (those
    use ``maxRecordsPerFile`` instead; see sinks/webdataset.py).
    """

    def _op(df: DataFrame) -> DataFrame:
        w = Window.orderBy(*order_by)
        out = df.withColumn(batch_col, F.floor((F.row_number().over(w) - 1) / n))
        if not partial:
            total = Window.partitionBy()
            out = (
                out.withColumn("__n__", F.count("*").over(total))
                .filter((F.col(batch_col) + 1) * n <= F.col("__n__"))
                .drop("__n__")
            )
        return out

    return _op


def unbatched(array_col: str, out_col: str | None = None, keep_pos: bool = False):
    """Explode a batch/array column back to rows (filters.py:531-551)."""

    def _op(df: DataFrame) -> DataFrame:
        out_name = out_col or array_col
        others = [c for c in df.columns if c != array_col]
        if keep_pos:
            return df.select(*others, F.posexplode(array_col).alias("pos", out_name))
        return df.select(*others, F.explode(array_col).alias(out_name))

    return _op
