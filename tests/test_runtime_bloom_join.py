"""Runtime bloom-filter join pruning: prove the dormant optimization fires.

Spark's runtime bloom-filter join pruning
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default since
3.5) injects a ``might_contain`` semi-filter on the large (application)
side of a shuffle join, built from the small (creation) side's join keys —
at 100 TB this is the difference between shuffling the full fact table and
shuffling only rows whose keys can possibly match a selective dimension.

In this container the default thresholds (creation side ≥ 10 MB plan size,
application side ≥ 10 GB scan) keep it dormant at every test SF — so the
ARCHITECTURE.md claim that "AQE + runtime filtering handle the fact-dim
joins" was, until this test, unexercised. Here the thresholds are lowered
to force the planner down the 100 TB path and we assert (a) the bloom
filter actually appears in the final plan, and (b) the join result is
IDENTICAL with and without it — pruning is a pure optimization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bloom_conf(spark):
    keys = [
        # creation threshold is a MAX (build side must be smaller): raise it;
        # application threshold is a MIN (probe scan must be bigger): lower it
        ("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB"),
        ("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),  # force shuffle join
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {}
    for k, v in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _fact_dim_join(spark, sf_dir):
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey", "l_extendedprice", "o_orderpriority"
    )


def test_runtime_bloom_filter_fires_and_preserves_results(spark, sf_dir, bloom_conf):
    df = _fact_dim_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan or "BloomFilter" in plan, (
        "runtime bloom-filter join pruning did not inject below its "
        f"lowered thresholds; plan:\n{plan[:2000]}"
    )
    pruned = sorted(map(tuple, df.collect()))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        plain = sorted(map(tuple, _fact_dim_join(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert pruned == plain, "bloom pruning changed the join result"
    assert len(pruned) > 0
