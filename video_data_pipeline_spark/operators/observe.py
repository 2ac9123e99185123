"""Observability operators (reference ``info``/``log_keys``/bench prints).

The reference debugged pipelines by printing the first n samples
(filters.py:168-190) and appending (worker, rank, key) lines to a flock'd
logfile (filters.py:262-280), and measured throughput by wrapping the
iterator (bench.py:33-62). The Spark-native forms:

- ``observed``: named accumulator metrics riding the existing job —
  ``df.observe`` adds zero extra passes; read them after the action.
- ``log_keys_cols``: lineage columns (partition id ≙ ``__worker__``).
- ``Cached``/``LMDBCached`` (filters.py:683-736) collapse to
  ``cached`` below — Spark's storage levels subsume both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def observed(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach row-count + byte-estimate metrics to the flow (the
    ``TotalSize`` bench aggregation, bench.py:15-61, without a second scan).

    Returns (df, observation); after any action on df,
    ``observation.get`` holds {n_rows, approx_bytes}.
    """
    obs = Observation(name)
    sized = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.aggregate(
                F.array(*[F.length(F.col(c).cast("string")) for c in df.columns]),
                F.lit(0),
                lambda a, x: a + F.coalesce(x, F.lit(0)),
            )
        ).alias("approx_bytes"),
    )
    return sized, obs


def log_keys_cols(df: DataFrame, key_col: str = "__key__") -> DataFrame:
    """``_log_keys`` metadata (filters.py:271): attach worker/partition
    lineage columns."""
    return df.withColumn("__worker__", F.spark_partition_id()).withColumn(
        "__rank__", F.lit(0)  # single-app rank; cluster managers set this
    )


def cached(df: DataFrame, disk: bool = False) -> DataFrame:
    """``Cached`` (memory tee) / ``LMDBCached`` (disk KV) →
    ``persist(MEMORY)`` / ``persist(DISK_ONLY)`` (filters.py:683-736)."""
    return df.persist(StorageLevel.DISK_ONLY if disk else StorageLevel.MEMORY_AND_DISK)
