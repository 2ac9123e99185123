"""Regression: ``table(spark, sf_dir, "events")`` must survive physical-type
drift of the ``ts`` column.

Round 4 lost its entire bench because the driver regenerated events.parquet
as TIMESTAMP(MICROS) while ``table()`` hard-assumed TIMESTAMP(NANOS); one
analysis-time type error took down 12 queries. These tests pin both physical
encodings (plus nanos-after-conf-already-set) so the next drift fails here,
loudly, instead of at round end.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from video_data_pipeline_spark.queries.registry import table

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0, 123456), 10, "view", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 1, 654321), 11, "click", 2.5, "{}"),
]


def _write_events(dirpath, unit: str) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    # version>=2.6 is required for parquet to store TIMESTAMP(NANOS)
    pq.write_table(tbl, f"{dirpath}/events.parquet", version="2.6")
    return str(dirpath)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_read_survives_physical_type(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    df = table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    # both encodings decode to the same microsecond wall-clock instants
    assert got[1] == ROWS[0][1]
    assert got[2] == ROWS[1][1]


def test_events_read_micros_with_nanos_conf_already_set(spark, tmp_path):
    # a prior nanos read leaves nanosAsLong=true in the session; a subsequent
    # micros read must still come back as a proper timestamp
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        sf_dir = _write_events(tmp_path, "us")
        df = table(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert df.count() == 2
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
