"""Staged verification for the verified-join families (r15, VERDICT r14 #5).

The exact joins used to move both candidates' full BIGINT shingle arrays
through the attach shuffles (94 GB spill at sfp10 uncapped). The staged
path attaches a compact packed-histogram summary first and prunes on a
provably-safe intersection UPPER BOUND; only survivors attach arrays.
These tests pin (a) the bound really is an upper bound, (b) saturation
bypasses the filter instead of breaking the inequality, and (c) staged
output is bit-identical to the single-stage form on real fixtures.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from video_data_pipeline_spark.queries.simjoin import (
    _INTER_UPPER_BOUND_SQL,
    _SUMMARY_LANES,
    containment_pairs_capped,
    prefix_filter_pairs,
    summary_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _sets_df(spark, sets: dict[int, list[int]]):
    return spark.createDataFrame(
        [(i, len(hs), hs) for i, hs in sets.items()],
        "doc_id long, n int, hs array<bigint>",
    )


def test_bound_dominates_true_intersection_random_sets(spark):
    rng = random.Random(7)
    universe = [rng.randint(-(2**62), 2**62) for _ in range(4000)]
    sets = {
        i: sorted(rng.sample(universe, rng.randint(1, 300))) for i in range(40)
    }
    summ = summary_table(_sets_df(spark, sets))
    got = {
        r["doc_id"]: (list(r["cnt"]), r["sat"], r["n"]) for r in summ.collect()
    }
    assert set(got) == set(sets)
    # cross-check every pair: packed-lane min-sum >= |A ∩ B|, via the SAME
    # SQL expression the join uses
    pairs = [
        (a, b, got[a][0], got[b][0], len(set(sets[a]) & set(sets[b])))
        for a in sets
        for b in sets
        if a < b
    ]
    df = spark.createDataFrame(
        pairs,
        "doc_a long, doc_b long, cnt_a array<bigint>, cnt_b array<bigint>,"
        " inter long",
    ).select("doc_a", "doc_b", "inter", F.expr(_INTER_UPPER_BOUND_SQL).alias("ub"))
    bad = df.where(F.col("ub") < F.col("inter")).collect()
    assert not bad, f"bound violated: {bad[:5]}"


def test_summary_counts_and_saturation(spark):
    # 20 hashes all in lane 0 (multiples of _SUMMARY_LANES): count 20 > 15
    # must set sat; a small doc must not
    sets = {
        1: [k * _SUMMARY_LANES for k in range(1, 21)],
        2: [5, 7, 133],
    }
    got = {r["doc_id"]: r for r in summary_table(_sets_df(spark, sets)).collect()}
    assert got[1]["sat"] is True
    assert got[2]["sat"] is False
    # doc 2: lanes 5 and 7 hold counts 1 and 2 (133 = 128 + 5 shares lane 5)
    w0 = got[2]["cnt"][0]
    assert (w0 >> (5 * 4)) & 15 == 2
    assert (w0 >> (7 * 4)) & 15 == 1
    assert got[2]["n"] == 3


def test_null_hash_elements_force_saturation_bypass(spark):
    # ADVICE r16: a NULL element used to yield sat = (false OR NULL) = NULL,
    # and a NULL sat in the staged WHERE silently DROPS the pair — the one
    # direction the never-prune-a-true-pair contract forbids. Unreachable
    # with md5-derived hashes, but the fold must fail SAFE: an unknown lane
    # forces sat=true (bypass to exact verification), never NULL. A fully
    # NULL array must bypass too.
    df = spark.createDataFrame(
        [(1, 3, [5, None, 133]), (2, 1, None), (3, 2, [5, 7])],
        "doc_id long, n int, hs array<bigint>",
    )
    got = {r["doc_id"]: r for r in summary_table(df).collect()}
    assert got[1]["sat"] is True  # unknown lane -> bypass
    assert got[2]["sat"] is True  # unknown summary -> bypass
    assert got[3]["sat"] is False  # clean rows unaffected
    # the known lanes of the partially-null row still count normally
    w0 = got[1]["cnt"][0]
    assert (w0 >> (5 * 4)) & 15 == 2  # 5 and 133 share lane 5
    assert (w0 >> (7 * 4)) & 15 == 0


def test_staged_equals_direct_prefix_join(spark):
    from video_data_pipeline_spark.queries.registry import table

    docs = table(spark, SF_DIR, "documents")
    direct = _rows(
        prefix_filter_pairs(docs, max_bucket_size=None, staged_verify=False)
    )
    staged = _rows(
        prefix_filter_pairs(docs, max_bucket_size=None, staged_verify=True)
    )
    assert staged == direct
    assert len(direct) > 0


def test_staged_equals_direct_containment(spark):
    from video_data_pipeline_spark.queries.registry import table

    docs = table(spark, SF_DIR, "documents")
    direct = _rows(
        containment_pairs_capped(docs, max_posting_size=None, staged_verify=False)
    )
    staged = _rows(
        containment_pairs_capped(docs, max_posting_size=None, staged_verify=True)
    )
    assert staged == direct
    assert len(direct) > 0


def _reference_summary_table(sets):
    """The r15 explode+groupBy summary build, kept as the cell-for-cell
    reference for the r16 per-row aggregate() fold (same discipline as
    test_countmin_grid_identical_to_per_occurrence_reference)."""
    lanes = (
        sets.select("doc_id", "n", F.explode("hs").alias("h"))
        .groupBy("doc_id", "n", F.pmod("h", F.lit(_SUMMARY_LANES)).alias("lane"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    words = [
        F.sum(
            F.expr(
                f"CASE WHEN lane div 16 = {w} "
                "THEN shiftleft(least(cnt, 15), (lane % 16) * 4) ELSE 0 END"
            )
        ).alias(f"w{w}")
        for w in range(_SUMMARY_LANES // 16)
    ]
    return (
        lanes.groupBy("doc_id", "n")
        .agg(*words, F.max("cnt").alias("maxc"))
        .select(
            "doc_id",
            "n",
            F.array(
                *[F.col(f"w{w}") for w in range(_SUMMARY_LANES // 16)]
            ).alias("cnt"),
            (F.col("maxc") > 15).alias("sat"),
        )
    )


def test_summary_fold_identical_to_explode_groupby_reference(spark):
    rng = random.Random(23)
    sets = {
        i: sorted(
            rng.sample(
                [rng.randint(-(2**62), 2**62) for _ in range(3000)],
                rng.randint(1, 400),
            )
        )
        for i in range(60)
    }
    # plus a saturating doc: 30 hashes in one lane
    sets[999] = [k * _SUMMARY_LANES for k in range(1, 31)]
    df = _sets_df(spark, sets)
    want = {
        r["doc_id"]: (r["n"], tuple(r["cnt"]), r["sat"])
        for r in _reference_summary_table(df).collect()
    }
    got = {
        r["doc_id"]: (r["n"], tuple(r["cnt"]), r["sat"])
        for r in summary_table(df).collect()
    }
    assert got == want
    assert got[999][2] is True


def test_summary_table_is_exchange_free(spark):
    # r16: the packed histogram is per-row column math over the set
    # table — no shuffle may reappear in its plan
    df = summary_table(_sets_df(spark, {1: [5, 7, 133], 2: [1]}))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_uncapped_unobserved_containment_skips_posting_grouping(spark):
    # r16: with no cap and no telemetry the posting-list groupBy round
    # trip is a no-op and must be absent; with an Observation it stays,
    # and both shapes emit identical rows
    from pyspark.sql import Observation

    from video_data_pipeline_spark.queries.registry import table

    docs = table(spark, SF_DIR, "documents")
    fast = containment_pairs_capped(docs, max_posting_size=None)
    plan = fast._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    grouped = containment_pairs_capped(
        docs, max_posting_size=None, observation=Observation("cont_ref")
    )
    assert "collect_list" in (
        grouped._jdf.queryExecution().optimizedPlan().toString()
    )
    assert _rows(fast) == _rows(grouped)


def test_saturated_docs_survive_staged_filter(spark):
    # two byte-distinct docs sharing a HUGE token mass concentrated enough
    # to saturate lanes: the staged filter must keep their pair (bypass),
    # and the final output must still equal the direct form
    base = [f"w{i:04d}" for i in range(2500)]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base[:-1] + ["unique"])),
        (3, "totally different content here now " * 3),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    direct = _rows(prefix_filter_pairs(docs, staged_verify=False))
    staged = _rows(prefix_filter_pairs(docs, staged_verify=True))
    assert staged == direct
    assert any(r[0] == 1 and r[1] == 2 for r in staged)
