"""Z-order (Morton) clustering: multi-column data skipping for 100 TB scans.

A sort on one column gives parquet row-group min/max stats that prune scans
on THAT column only; a filter on any other column reads everything. Morton
interleaving maps k columns onto one integer whose ordering keeps every
dimension locally bounded, so a range-sorted write produces row groups whose
min/max rectangles are tight in ALL interleaved columns — the engine-side
equivalent of Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything is integer bit math in Catalyst expressions (whole-stage codegen;
no UDF), and the same arithmetic is emittable as portable SQL for the DuckDB
oracle (``zvalue_sql``).

Scale notes:
- ``write_zordered`` is ONE range exchange on the z-value (the same shuffle
  a plain global sort would cost) — the skipping benefit is free thereafter
  for every reader.
- Range boundaries come from Spark's reservoir sampling of the z column; no
  driver-side collect of data.
- The z computation itself is ~4 ops/bit/row of pure codegen'd int math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints.

    Bit ``i`` of ``a`` lands at position ``2i``, bit ``i`` of ``b`` at
    ``2i+1``; the result fits in ``2*bits`` bits (BIGINT up to bits=31).
    Callers normalize each column into ``[0, 2^bits)`` first — out-of-range
    high bits are ignored by construction (only the low ``bits`` are read).
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The same Morton interleave as portable SQL text (Spark and DuckDB
    both parse it: only ``>> << & |`` on integers)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    a: Column | str,
    b: Column | str,
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of (a, b).

    Each column is first range-normalized into ``[0, 2^bits)`` from its
    actual min/max — Morton only mixes dimensions of comparable bit width,
    and raw columns rarely are (a 0..14 id next to a 0..43200 minute would
    leave the id contributing 1 useful bit and the layout degenerating to
    a single-column sort). The min/max probe is one bounded driver action
    on 4 scalars — the same per-column stats pass Delta's OPTIMIZE ZORDER
    does.

    Then: one range exchange on the z value (reservoir-sampled boundaries,
    no driver collect of data) + an in-partition sort, so each output file
    — and each row group inside it — covers a contiguous z range, i.e. a
    small rectangle in (a, b) space. The helper column is dropped before
    write; projection after sort preserves row order within each
    partition.
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(ca), F.max(ca), F.min(cb), F.max(cb)
    ).first()
    if lo_a is None or lo_b is None:
        # empty input (or all-null cluster columns): there is nothing to
        # cluster — write the (empty) frame as-is instead of crashing on
        # NoneType arithmetic in the range normalization
        df.write.mode("overwrite").parquet(path)
        return
    top = (1 << bits) - 1

    def norm(c: Column, lo: int, hi: int) -> Column:
        span = max(1, hi - lo)
        return ((c - F.lit(lo)) * top / F.lit(span)).cast("bigint")

    z = zvalue(norm(ca, lo_a, hi_a), norm(cb, lo_b, hi_b), bits).alias("_zorder")
    cols = df.columns
    (
        df.select("*", z)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .select(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str] | str,
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a persistent BUCKETED table: rows are hash-assigned to
    ``n_buckets`` files per partition by ``keys`` at WRITE time, and the
    bucket spec is recorded in the catalog.

    Why this matters at 100 TB — write-time co-location buys two things every
    subsequent reader gets for free:

    - **Exchange-free joins**: two tables bucketed by the same keys into the
      same bucket count join with ZERO shuffle — the scan itself reports the
      hash distribution, so SortMergeJoin's Exchange requirement is already
      satisfied on both sides. For a fact table joined on the same key by
      every nightly job, this converts the biggest per-job shuffle into a
      one-time write cost (the classic "bucket both sides at write time"
      pattern; see ARCHITECTURE.md). One-sided bucketing still halves the
      shuffle.
    - **Bucket pruning**: an equality filter on the bucket key scans 1 of
      ``n_buckets`` buckets (`SelectedBucketsCount` in the scan node) — the
      hash-key analogue of partition pruning, without the small-files
      explosion a high-cardinality ``partitionBy`` would cause.

    Sizing: pick ``n_buckets`` so one bucket of the LARGEST co-bucketed
    table fits an executor's memory at the target scale (bucket count, like
    shuffle partitions, should scale with data volume — it cannot be changed
    without a rewrite). ``sort_cols`` additionally sorts within each bucket
    file (min/max row-group skipping + faster merge-join).

    ``path=None`` writes a managed table under ``spark.sql.warehouse.dir``;
    tests pass an explicit path (external table) to keep artifacts in tmp.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)
