"""Batching / collation operators (reference ``filters.py:464-551``).

In Spark, columnar batching is *internal* (Tungsten/Arrow) — ``batched`` +
``default_collation_fn`` map to "do nothing" for performance purposes
(SURVEY.md §1.2). These operators exist for semantic parity where a batch
must be a first-class row (e.g. writing fixed-size shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_index(order_by: list[str], idx_col: str = "__idx__", num_partitions: int | None = None):
    """0-based global position under a total order, WITHOUT the
    single-reducer global window: range-partitioned distributed sort, then
    per-partition row_number plus the (tiny, driver-collected) partition
    offsets — the scalable zipWithIndex pattern.

    The partition-count pre-pass recomputes the sorted input, so it is
    persisted for the duration of the plan; range boundaries are
    deterministic for identical input.
    """

    def _op(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        n = num_partitions or spark.sparkContext.defaultParallelism
        with_pid = (
            df.repartitionByRange(n, *order_by)
            .sortWithinPartitions(*order_by)
            .withColumn("__pid__", F.spark_partition_id())
            .persist()
        )
        counts = with_pid.groupBy("__pid__").count().collect()
        offsets: dict[int, int] = {}
        acc = 0
        for r in sorted(counts, key=lambda r: r["__pid__"]):
            offsets[r["__pid__"]] = acc
            acc += r["count"]
        mapping = F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        ) if offsets else F.create_map()
        w = Window.partitionBy("__pid__").orderBy(*order_by)
        return (
            with_pid.withColumn(
                idx_col,
                F.row_number().over(w) - 1 + F.coalesce(
                    mapping[F.col("__pid__")], F.lit(0)
                ),
            )
            .drop("__pid__")
        )

    return _op


def batched(order_by: list[str], n: int, partial: bool = True, batch_col: str = "batch_id"):
    """Assign each row a batch id = floor(position / n) under an explicit
    total order (reference ``batched``, filters.py:497-528).

    ``partial=False`` drops the trailing incomplete batch (partial= flag).
    Built on :func:`global_index` — a distributed range sort, never a
    single-partition global window. (Record-level output chunking in the
    sink uses ``maxRecordsPerFile`` instead; see sinks/webdataset.py.)
    """

    def _op(df: DataFrame) -> DataFrame:
        indexed = df.transform(global_index(order_by, idx_col="__idx__"))
        out = indexed.withColumn(batch_col, F.floor(F.col("__idx__") / n))
        if not partial:
            total = out.count()
            out = out.filter((F.col(batch_col) + 1) * n <= F.lit(total))
        return out.drop("__idx__")

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
