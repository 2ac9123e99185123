"""Misra-Gries heavy hitters: algorithm guarantees + distributed exactness."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from video_data_pipeline_spark.operators.heavy import heavy_hitters, misra_gries


@given(
    st.lists(st.integers(min_value=0, max_value=50), max_size=400),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_mg_superset_and_undercount_bounds(xs, k):
    """Every item with freq > n/(k+1) is present, and present counts
    undercount by at most n/(k+1) — the two textbook MG invariants."""
    summary = misra_gries(iter(xs), k)
    true = Counter(xs)
    bound = len(xs) / (k + 1)
    for item, freq in true.items():
        if freq > bound:
            assert item in summary
    for item, est in summary.items():
        assert 0 < est <= true[item]
        assert true[item] - est <= bound


def test_mg_keeps_at_most_k_counters():
    s = misra_gries(iter(range(1000)), k=7)
    assert len(s) <= 7


def test_heavy_hitters_exact_on_skewed_large_vocab(spark):
    """A Zipf-ish corpus with a large cold tail: the MG path must return
    exactly the naive groupBy answer, while shuffling only candidates."""
    from pyspark.sql import functions as F

    # 3 hot items (~20%, ~10%, ~5%) over a 5000-key uniform tail
    df = spark.range(0, 20000, numPartitions=8).select(
        F.when(F.col("id") % 5 == 0, F.lit("hot_a"))
        .when(F.col("id") % 10 == 1, F.lit("hot_b"))
        .when(F.col("id") % 20 == 2, F.lit("hot_c"))
        .otherwise(F.concat(F.lit("tail_"), (F.col("id") % 5000).cast("string")))
        .alias("item")
    )
    phi = 0.04
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(df, col="item", phi=phi).collect()
    }
    total = df.count()
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] > total * phi
    }
    assert got == exact
    assert set(got) == {"hot_a", "hot_b", "hot_c"}


def test_heavy_hitters_candidate_set_is_small(spark):
    """The candidate phase must prune: far fewer candidates than vocabulary
    (that pruning IS the scale win over the naive full groupBy)."""
    from pyspark.sql import functions as F

    from video_data_pipeline_spark.operators import heavy

    df = spark.range(0, 20000, numPartitions=8).select(
        F.when(F.col("id") % 4 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("tail_"), (F.col("id") % 6000).cast("string")))
        .alias("item")
    )
    k = 20  # ceil(2/phi) for phi = 0.1
    # reproduce the candidate phase alone
    import pandas as pd

    src = df.select(F.col("item").cast("string").alias("item"))

    parts = src.rdd.getNumPartitions()
    cands = (
        src.mapInPandas(
            lambda batches: iter(
                [
                    pd.DataFrame(
                        {
                            "item": sorted(
                                heavy.misra_gries(
                                    (v for b in batches for v in b["item"]), k
                                )
                            )
                        }
                    )
                ]
            ),
            schema="item string",
        )
        .distinct()
        .count()
    )
    vocab = src.distinct().count()
    assert cands <= k * parts
    assert cands < vocab / 10


def test_heavy_hitters_rejects_guarantee_breaking_k():
    import pytest

    with pytest.raises(ValueError):
        # k below 1/phi voids the superset guarantee (checked before any
        # DataFrame work, so no session is needed)
        heavy_hitters(None, col="item", phi=0.01, k=10)  # needs >= 100


def test_heavy_hitters_by_group_exact_on_skewed_groups(spark):
    """Grouped variant: exact per-group answer on a heavily skewed group
    mix (one group 20x the other), including group-local heavy hitters
    that are globally rare."""
    from pyspark.sql import functions as F

    from video_data_pipeline_spark.operators.heavy import heavy_hitters_by_group

    big = spark.range(0, 20000, numPartitions=8).select(
        F.lit("en").alias("g"),
        F.when(F.col("id") % 5 == 0, F.lit("en_hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 4000).cast("string")))
        .alias("item"),
    )
    small = spark.range(0, 1000, numPartitions=8).select(
        F.lit("zh").alias("g"),
        F.when(F.col("id") % 3 == 0, F.lit("zh_hot"))
        .otherwise(F.concat(F.lit("z"), (F.col("id") % 500).cast("string")))
        .alias("item"),
    )
    df = big.unionAll(small)
    phi = 0.1
    got = {
        (r["g"], r["item"]): (r["cnt"], r["group_n"])
        for r in heavy_hitters_by_group(df, "g", "item", phi=phi).collect()
    }
    exact = {}
    totals = {r["g"]: r["n"] for r in df.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in df.groupBy("g", "item").agg(F.count(F.lit(1)).alias("cnt")).collect():
        if r["cnt"] > totals[r["g"]] * phi:
            exact[(r["g"], r["item"])] = (r["cnt"], totals[r["g"]])
    assert got == exact
    # zh_hot is ~1.6% of the GLOBAL stream but 33% of zh — a global-phi
    # detector would have missed it
    assert ("zh", "zh_hot") in got


def test_heavy_hitters_null_items_consistently_excluded(spark):
    """ADVICE r5: nulls used to survive the MG candidate phase (None is a
    countable dict key) but vanish in the exact-recount equi-join — now
    they are excluded up front, so a null-majority stream still reports
    the correct non-null heavy hitters with exact counts."""
    from video_data_pipeline_spark.operators.heavy import (
        heavy_hitters,
        heavy_hitters_by_group,
    )

    rows = [(None,)] * 400 + [("a",)] * 90 + [("b",)] * 10
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, phi=0.2).collect()}
    # denominator is the 100 non-null rows: a (90%) qualifies, b (10%) not
    assert got == {"a": 90}

    grows = [("g1", None)] * 50 + [("g1", "x")] * 20 + [(None, "y")] * 30
    gdf = spark.createDataFrame(grows, "grp string, item string").repartition(4)
    out = heavy_hitters_by_group(gdf, "grp", col="item", phi=0.5).collect()
    assert [(r["grp"], r["item"], r["cnt"]) for r in out] == [("g1", "x", 20)]
