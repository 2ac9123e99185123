"""Multi-batch incremental-maintenance harness (r7 VERDICT #4 / r8 #6).

``q_delta_rollup`` and ``q_dedup_incremental`` prove the MERGE ALGEBRA
(one delta merged into one base equals the recompute) but not multi-batch
OPERATION: state persisted to disk between rounds, each round merging a new
batch into what the previous round wrote. These tests run 3 sequential
persisted rounds of each and assert exact equality against a full recompute
after EVERY round — the contract a continuously-ingesting 100 TB pipeline
actually relies on (associativity across an arbitrary batch history, with
the state round-tripping through parquet, not a cached DataFrame lineage).

Exactness: rollup revenue stays DECIMAL through merge and storage (cast to
double only when comparing at the boundary, same as the query); band keys
are md5 strings. Both are bit-stable across write/read cycles, so equality
is ==, no tolerance.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.common import DEC, dec
from video_data_pipeline_spark.queries.dedup import minhash_bands
from video_data_pipeline_spark.queries.registry import table

#: base ingests keys % 10 in 0..6; three delta batches follow
_BATCH_MODS = (7, 8, 9)


def _monthly(df):
    return df.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast(DEC).alias("rev"),
    )


def _rollup_rows(df):
    return sorted(
        (r["month"], r["n"], Decimal(r["rev"])) for r in df.collect()
    )


def test_delta_rollup_three_persisted_batches(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders")
    state_path = str(tmp_path / "rollup_state")

    base = o.where(~(F.col("o_orderkey") % 10).isin(*_BATCH_MODS))
    _monthly(base).write.parquet(state_path + "_0")

    ingested = base
    for i, mod in enumerate(_BATCH_MODS):
        batch = o.where(F.col("o_orderkey") % 10 == mod)
        state = spark.read.parquet(f"{state_path}_{i}")  # prior round's DISK state
        delta = _monthly(batch)
        b, d = state.alias("b"), delta.alias("d")
        merged = b.join(d, "month", "full").select(
            "month",
            (
                F.coalesce(F.col("b.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n"),
            (
                F.coalesce(F.col("b.rev"), F.lit(0).cast(DEC))
                + F.coalesce(F.col("d.rev"), F.lit(0).cast(DEC))
            )
            .cast(DEC)
            .alias("rev"),
        )
        merged.write.parquet(f"{state_path}_{i + 1}")

        ingested = ingested.unionByName(batch)
        got = _rollup_rows(spark.read.parquet(f"{state_path}_{i + 1}"))
        want = _rollup_rows(_monthly(ingested))
        assert got == want, f"round {i + 1} (batch mod={mod}) diverged"

    # after all batches, the maintained rollup covers the WHOLE table
    assert _rollup_rows(spark.read.parquet(f"{state_path}_3")) == _rollup_rows(
        _monthly(o)
    )


def _probe(new_bands, index):
    old = index.withColumnRenamed("doc_id", "old_id")
    return (
        new_bands.join(old, ["band_idx", "band_key"])
        .groupBy("doc_id")
        .agg(
            F.min("old_id").alias("first_match"),
            F.countDistinct("old_id").alias("n_candidates"),
        )
    )


def _probe_rows(df):
    return sorted(
        (r["doc_id"], r["first_match"], r["n_candidates"]) for r in df.collect()
    )


def test_band_index_three_persisted_batches(spark, sf_dir, tmp_path):
    d = table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "band_index")

    base = d.where(~(F.col("doc_id") % 10).isin(*_BATCH_MODS))
    minhash_bands(base).write.parquet(index_path)

    ingested = base
    n_probed = 0
    for mod in _BATCH_MODS:
        batch = d.where(F.col("doc_id") % 10 == mod)
        batch_bands = minhash_bands(batch)
        index = spark.read.parquet(index_path)  # persisted, never re-hashed

        got = _probe_rows(_probe(batch_bands, index))
        # reference: identical probe computed from a FULL re-hash of the
        # ingested corpus (what the persisted index claims to equal)
        ref_index = minhash_bands(ingested)
        want = _probe_rows(_probe(minhash_bands(batch), ref_index))
        assert got == want, f"batch mod={mod}: persisted index diverged"
        n_probed += len(got)

        # ingest the batch: append its bands to the index on disk
        batch_bands.write.mode("append").parquet(index_path)
        ingested = ingested.unionByName(batch)

    assert n_probed > 0, "no probe ever matched — fixture degenerated"
    # final index on disk == full re-hash of everything (order-insensitive)
    final = spark.read.parquet(index_path)
    full = minhash_bands(d)
    key = ["doc_id", "band_idx", "band_key"]
    assert final.count() == full.count()
    assert final.exceptAll(full).isEmpty() and full.exceptAll(final).isEmpty(), (
        "persisted band index != full re-hash"
    )
    assert sorted(final.columns) == sorted(key)
