"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only stateful shapes are bounded-buffer shuffle and the
greedy packer (SURVEY.md §2.9) — batch concerns here. What a *continuous*
ingestion pipeline needs and Spark's built-in windows don't give directly:

- ``streaming_dedup``: exact dedup across micro-batches — the streaming
  twin of ``q_dedup_exact``. State = "seen" marker per key in the state
  store (RocksDB-backed on a real cluster), with a processing-time TTL so
  state is bounded: at 100 TB/day you keep e.g. 24 h of fingerprints, and
  the batch dedup job handles the long tail.

Keys should be content fingerprints (md5) — uniform, so state shards
evenly across partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("first_key", StringType()),
        StructField("n_new", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        n = 0
        first = None
        for pdf in pdfs:
            n += len(pdf)
            if first is None and len(pdf):
                first = str(pdf["__key__"].iloc[0])
        if not already and n > 0:
            state.update((1,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {"fingerprint": [key[0]], "first_key": [first], "n_new": [n]}
            )
        # duplicates of an already-seen fingerprint emit nothing

    return _dedup_fn


def streaming_dedup(
    samples: DataFrame,
    fingerprint_col: str = "fingerprint",
    ttl_ms: int | None = None,
) -> DataFrame:
    """First-seen filter over a stream: one output row per novel
    fingerprint (first occurrence wins, later micro-batches drop it).

    ``ttl_ms`` bounds state in continuous deployments (e.g. 24 h of
    fingerprints; the nightly batch dedup handles the long tail). Leave
    None for drain-style runs: processing-time timeouts keep an
    ``availableNow`` trigger alive with state-cleanup batches, so bounded
    backfills should run without TTL.
    """
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return samples.groupBy(fingerprint_col).applyInPandasWithState(
        _make_dedup_fn(ttl_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def use_rocksdb_state(spark) -> None:
    """Switch stateful streaming queries to the RocksDB state store
    (vs the default in-heap HDFSBackedStateStoreProvider).

    The 100 TB rationale: dedup/session state grows with the key space,
    and the heap-backed store keeps EVERY key of every active version in
    executor memory — at billions of fingerprints that evicts the
    executors long before the watermark evicts the state. RocksDB keeps
    the working set on local SSD with incremental (changelog) version
    checkpoints, bounding executor memory regardless of key cardinality.
    Applies to queries STARTED after this call (the provider is read at
    query start from the session conf)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # bound RocksDB memory usage across all state store instances on an
    # executor (single shared block cache); modest cap — state lives on disk
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true"
    )
