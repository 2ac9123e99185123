"""r16 focused experiment: build the staged-verify packed summary PER ROW
with one aggregate() over the already-checkpointed hash array, instead of
explode -> groupBy(doc,lane) -> groupBy(doc) (two exchanges over every
token); and, for the UNCAPPED/unobserved containment path, skip the
postings groupBy(h)+collect_list+sort_array+explode round trip (it exists
only for the cap/telemetry, which that path does not use) and explode the
set table straight into the asymmetric join.

Why they might win (guide 2.4 "remove shuffles outright"): summary_table
is 2 Exchanges + an ObjectHashAggregate pair over the full token stream,
all to compute a value that is a pure function of each row's hs array;
the per-row form computes the identical packed words and sat flag inside
the scan of the localCheckpointed sets table -- zero exchanges. The
containment postings round trip ships every (n, doc_id) token through an
object aggregate, sorts each posting list, and explodes it right back;
dropping it removes the agg + sort work (the exchange itself is shared
with the join either way).

Equivalence: cell-for-cell summary identity is asserted here (and pinned
by tests once shipped); the postings shortcut feeds the same rows to the
same join (list order was irrelevant: downstream is join + distinct).

Same-session ABBA interleave (the round's standard), palindromic order,
results asserted identical on the first round.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# ---------------------------------------------------------------- new form

_LANE = "CAST(pmod(h, 128) AS INT)"
_SHIFT = f"({_LANE} % 16) * 4"
_WORD = f"CAST({_LANE} div 16 AS INT)"

#: per-row packed 128-lane saturating histogram: fold the hash array into
#: (8 packed words, sat flag) in one aggregate() -- no explode, no shuffle
INLINE_SUMMARY_SQL = f"""aggregate(
  hs,
  named_struct('w', array_repeat(0L, 8), 'sat', false),
  (acc, h) -> named_struct(
    'w', transform(acc.w, (x, i) ->
        IF(i = {_WORD}
           AND (shiftright(x, {_SHIFT}) & 15) < 15,
           x + shiftleft(1L, {_SHIFT}),
           x)),
    'sat', acc.sat OR
        (shiftright(element_at(acc.w, {_WORD} + 1), {_SHIFT}) & 15) = 15
  )
)"""


def inline_summary_table(sets):
    """(doc_id, n, hs) -> (doc_id, n, cnt, sat) — per-row, exchange-free."""
    return sets.select(
        "doc_id",
        "n",
        F.expr(INLINE_SUMMARY_SQL).alias("s"),
    ).select("doc_id", "n", F.col("s.w").alias("cnt"), F.col("s.sat").alias("sat"))


# ------------------------------------------------------- containment variant


def containment_direct_post(docs, inline_summary: bool):
    """containment_pairs_capped(max_posting_size=None, observation=None)
    with the postings groupBy round trip removed (and optionally the
    inline summary)."""
    from video_data_pipeline_spark.queries import simjoin as sj

    sets = sj.hashed_shingle_sets(docs)
    prefix = sets.select(
        F.col("doc_id").alias("s_id"),
        F.col("n").alias("sn"),
        F.explode(
            F.expr(
                "slice(sort_array(hs), 1,"
                f" n - (({sj._CONT_NUM} * n + {sj._CONT_DEN - 1})"
                f" div {sj._CONT_DEN}) + 1)"
            )
        ).alias("h"),
    )
    post = sets.select(
        F.col("doc_id").alias("b_id"),
        F.col("n").alias("bn"),
        F.explode("hs").alias("h"),
    )
    pairs = (
        prefix.join(post, "h")
        .where(
            (F.col("sn") < F.col("bn"))
            | ((F.col("sn") == F.col("bn")) & (F.col("s_id") < F.col("b_id")))
        )
        .select(
            F.least("s_id", "b_id").alias("doc_a"),
            F.greatest("s_id", "b_id").alias("doc_b"),
        )
        .distinct()
    )
    mk = inline_summary_table if inline_summary else sj.summary_table
    summaries = mk(sets).localCheckpoint(eager=False)
    pairs = sj._staged_candidate_filter(
        pairs,
        summaries,
        lambda ub, na, nb: sj._CONT_DEN * ub >= sj._CONT_NUM * F.least(na, nb),
    )
    ta = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("hs_a"),
        F.col("n").alias("na"),
    )
    tb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("hs_b"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("bigint")
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(sj._CONT_DEN * inter >= sj._CONT_NUM * F.least("na", "nb"))
        .select(
            "doc_a",
            "doc_b",
            inter.alias("n_common"),
            (inter.cast("double") / F.col("na")).alias("cont_a_in_b"),
            (inter.cast("double") / F.col("nb")).alias("cont_b_in_a"),
        )
    )


# ------------------------------------------------------------------ harness


def main() -> None:
    from video_data_pipeline_spark.queries import simjoin as sj
    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "6"))
    spark = get_spark("exp_staged_inline")
    docs = table(spark, sf_dir, "documents")

    # 1. summary identity, cell for cell, on the real corpus
    sets = sj.hashed_shingle_sets(docs)
    old_s = {
        r["doc_id"]: (r["n"], tuple(r["cnt"]), r["sat"])
        for r in sj.summary_table(sets).collect()
    }
    new_s = {
        r["doc_id"]: (r["n"], tuple(r["cnt"]), r["sat"])
        for r in inline_summary_table(sets).collect()
    }
    assert old_s == new_s, "summary tables differ"
    print(f"summary identity OK ({len(old_s)} docs)", flush=True)

    # variant builders -----------------------------------------------------
    def prefix_old(spark, sf_dir):
        return sj.prefix_filter_pairs(
            table(spark, sf_dir, "documents"), max_bucket_size=None
        )

    def prefix_new(spark, sf_dir):
        orig = sj.summary_table
        sj.summary_table = inline_summary_table
        try:
            return sj.prefix_filter_pairs(
                table(spark, sf_dir, "documents"), max_bucket_size=None
            )
        finally:
            sj.summary_table = orig

    def cont_old(spark, sf_dir):
        return sj.containment_pairs_capped(
            table(spark, sf_dir, "documents"), max_posting_size=None
        )

    def cont_new(spark, sf_dir):
        return containment_direct_post(
            table(spark, sf_dir, "documents"), inline_summary=True
        )

    def quote_old(spark, sf_dir):
        return sj.containment_pairs_capped(
            sj.with_synthetic_quotes(table(spark, sf_dir, "documents")),
            max_posting_size=None,
        )

    def quote_new(spark, sf_dir):
        return containment_direct_post(
            sj.with_synthetic_quotes(table(spark, sf_dir, "documents")),
            inline_summary=True,
        )

    fronts = [
        ("prefix_exact", prefix_old, prefix_new),
        ("containment_exact", cont_old, cont_new),
        ("quote_pairs", quote_old, quote_new),
    ]

    # 2. output identity per front
    for name, old_b, new_b in fronts:
        a = sorted(tuple(r) for r in old_b(spark, sf_dir).collect())
        b = sorted(tuple(r) for r in new_b(spark, sf_dir).collect())
        assert a == b, f"{name}: results differ ({len(a)} vs {len(b)} rows)"
        print(f"{name} identity OK ({len(a)} rows)", flush=True)

    # 3. ABBA interleave
    def run(builder) -> float:
        t0 = time.time()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out = {}
    for name, old_b, new_b in fronts:
        times = {"old": [], "new": []}
        for i in range(rounds):
            order = (
                [("old", old_b), ("new", new_b)]
                if i % 2 == 0
                else [("new", new_b), ("old", old_b)]
            )
            for arm, b_ in order:
                times[arm].append(run(b_))
            print(
                f"{name} round {i + 1}: old={times['old'][-1]:.2f}s "
                f"new={times['new'][-1]:.2f}s",
                flush=True,
            )
        out[name] = {
            arm: {
                "median": round(statistics.median(v), 3),
                "all": [round(x, 2) for x in v],
            }
            for arm, v in times.items()
        }
        out[name]["ratio_new_over_old"] = round(
            out[name]["new"]["median"] / out[name]["old"]["median"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
