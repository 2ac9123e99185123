"""Probabilistic sketches: Bloom-filter membership and Count-Min frequency.

Why sketches at 100 TB: the exact alternatives key a shuffle by the item
CARDINALITY (billions of URLs / fingerprints / tokens), and an exact
membership check against a historical corpus is a join against the full
history. A sketch replaces both with a fixed-size summary:

- **Bloom filter** (Bloom 1970): m-bit bitmap, k hash probes. Build is one
  corpus pass with NO shuffle (per-partition partial bitmaps OR-reduced on
  the driver — at most one m/8-byte row per partition, same bounded-collect
  pattern as operators/heavy.py's Misra-Gries phase); probe is a broadcast
  of the bitmap into a vectorized Arrow UDF — the probed corpus NEVER
  shuffles. No false negatives; false positives at the standard
  (1 - e^{-kn/m})^k rate.
- **Count-Min** (Cormode & Muthukrishnan 2005): d×w counter grid.
  ``est(x) = min_j grid[j][h_j(x)]`` NEVER undercounts; overcount is
  bounded by ceil(e·N/w) with prob 1-e^{-d}. The grid is a (row, bucket)
  DataFrame of at most d·w rows — built by one map-combined groupBy whose
  shuffle width is d·w, independent of vocabulary size (contrast
  operators/heavy.py, which is exact but needs a candidate recount pass).

Determinism: all hash probes are the repo-standard 60-bit md5 prefix
(queries/common.py SPARK_HASH/DUCK_HASH) over ``key || sep || j`` — always
non-negative, so ``% m`` agrees between Spark, numpy, and DuckDB, and every
sketch is bit-reproducible and oracle-checkable in SQL.

Reference parity: the reference deduplicates/filters via in-memory Python
dict/set membership on one node (e.g. tokenize/main.py's seen-key guards);
these sketches are the bounded-memory distributed form of the same
questions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HASH60_SPARK = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
_HASH60_DUCK = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def bloom_positions(key_sql: str, m_bits: int, k: int, dialect: str) -> str:
    """SQL array expression: the ``k`` bit positions a key sets/probes.

    Position j is ``hash60(key || ':' || j) % m_bits`` — identical text in
    both dialects so the Spark bitmap and the DuckDB position-set oracle
    cannot drift.
    """
    if dialect == "spark":
        h = _HASH60_SPARK.format(x=f"concat({key_sql}, ':', CAST(j AS STRING))")
        return f"transform(sequence(0, {k - 1}), j -> {h} % {m_bits})"
    h = _HASH60_DUCK.format(x=f"{key_sql} || ':' || CAST(j AS VARCHAR)")
    return f"list_transform(range({k}), j -> {h} % {m_bits})"


def bloom_build(df: DataFrame, key: str | Column, m_bits: int, k: int) -> bytes:
    """One corpus pass -> m_bits-wide Bloom bitmap (little-endian bit order
    within each byte: bit p lives at ``byte p>>3, mask 1<<(p&7)``).

    Zero shuffles: each partition emits ONE partial bitmap row (m_bits/8
    bytes) from mapInPandas; the driver ORs the <= numPartitions partials.
    This is a bounded driver reduce (like heavy_hitters' candidate collect),
    not a data-sized collect.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    key_col = F.col(key) if isinstance(key, str) else key
    pos = df.select(key_col.cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    pos = pos.select(
        F.expr(bloom_positions("k", m_bits, k, "spark")).alias("pos")
    )
    nbytes = m_bits // 8

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            for arr in pdf["pos"]:
                p = np.asarray(arr, dtype=np.int64)
                np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    schema = T.StructType([T.StructField("bitmap", T.BinaryType())])
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in pos.mapInPandas(_partial, schema=schema).collect():
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes()


def bloom_probe(
    df: DataFrame,
    key: str | Column,
    bitmap: bytes,
    m_bits: int,
    k: int,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col``: True iff all k probe bits are set (i.e. the key
    is possibly in the built set; False is DEFINITELY absent).

    The bitmap ships as a TorrentBroadcast (once per executor, not once per
    task — at production m this is megabytes); the probed DataFrame itself
    never shuffles, so this composes with any upstream scan without a stage
    break.
    """
    if len(bitmap) != m_bits // 8:
        raise ValueError("bitmap length does not match m_bits")
    bc = df.sparkSession.sparkContext.broadcast(bitmap)
    key_col = F.col(key) if isinstance(key, str) else key
    pos = F.expr(
        bloom_positions("__bloom_key", m_bits, k, "spark")
    )

    @F.pandas_udf(T.BooleanType())
    def _probe(pos_s: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        out = []
        for arr in pos_s:
            # NULL key -> NULL positions (None, or NaN elements after the
            # Arrow transfer). Definitely absent: mirror build's isNotNull.
            if arr is None or pd.isna(np.asarray(arr)).any():
                out.append(False)
                continue
            p = np.asarray(arr, dtype=np.int64)
            out.append(bool(np.all(bm[p >> 3] & (1 << (p & 7)).astype(np.uint8))))
        return pd.Series(out)

    return (
        df.withColumn("__bloom_key", key_col.cast("string"))
        .withColumn(out_col, _probe(pos))
        .drop("__bloom_key")
    )


def countmin_bucket(key_sql: str, j: int, width: int, dialect: str) -> str:
    """Row-j bucket of ``key``: hash60(key || '#' || j) % width."""
    if dialect == "spark":
        return _HASH60_SPARK.format(x=f"concat({key_sql}, '#{j}')") + f" % {width}"
    return _HASH60_DUCK.format(x=f"{key_sql} || '#{j}'") + f" % {width}"


def countmin_build(
    items: DataFrame, col: str, depth: int, width: int
) -> DataFrame:
    """Count-Min grid over ``items[col]``: columns ``(j, bucket, cnt)``.

    Count first, hash once per DISTINCT key (r16, guide §2.3 "aggregate
    before you shuffle" applied to CPU): the naive form computed ``depth``
    md5 hashes per item OCCURRENCE, which the perf probe measured as the
    single most compute-bound query in the bench (~90 s of task time at
    sf0.1 — token streams are Zipfian, so occurrences ≫ vocabulary). A
    map-combined count by key collapses the stream to the vocabulary
    first; each distinct key is then hashed ``depth`` times and its count
    SUMMED into the grid — cell-for-cell identical (the grid is a sum of
    per-key counts either way), with the hashing bill cut from
    occurrences×depth to vocab×depth. The (k, partial-count) exchange
    this adds carries at most one row per distinct key per task; the
    final shuffle still carries at most depth*width keys.
    """
    src = items.select(F.col(col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    counts = src.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(countmin_bucket("k", j, width, "spark")).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"), "c")
        .groupBy(F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket"))
        .agg(F.sum("c").alias("cnt"))
    )


def countmin_estimate(
    grid: DataFrame, probes: DataFrame, col: str, depth: int, width: int
) -> DataFrame:
    """Estimate frequencies of ``probes[col]`` from a countmin grid:
    columns ``(col, est_cnt)`` with ``est = min_j grid[j][h_j(key)]``.

    The grid is depth*width rows -> broadcast onto the probe set; an empty
    bucket coalesces to 0 (only possible when nothing hashed there, in
    which case 0 is exact).
    """
    keyed = probes.select(F.col(col).cast("string").alias("k")).distinct()
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(countmin_bucket("k", j, width, "spark")).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probe_rows = keyed.select("k", F.explode(rows).alias("r")).select(
        "k", "r.j", "r.bucket"
    )
    return (
        probe_rows.join(F.broadcast(grid), ["j", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
        .select(F.col("k").alias(col), "est_cnt")
    )
