"""`registry.table()` must normalize every shipped events.ts encoding.

The driver's testdata generator has shipped events.ts as parquet INT64
TIMESTAMP(NANOS) and as plain timestamp[us] (no timezone) across
generations.  Both must surface as a session-TZ TIMESTAMP holding the
wall-clock-as-UTC instant; anything else must fail loudly rather than
silently cast (ADVICE round 2).
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glamira_batch_processing_spark.plans.registry import table

WALL = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
EPOCH_MICROS_AS_UTC = 1709296245123456  # 2024-03-01T12:30:45.123456Z


def _write_events(tmp_path, arrow_type, values):
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(values, arrow_type),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_events_ts_timestamp_us_ntz(spark, tmp_path):
    sf = _write_events(tmp_path, pa.timestamp("us"), [WALL])
    df = table(spark, sf, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    [row] = df.select(F.unix_micros("ts").alias("us")).collect()
    assert row.us == EPOCH_MICROS_AS_UTC


def test_events_ts_nanos_as_long(spark, tmp_path):
    sf = _write_events(tmp_path, pa.timestamp("ns"), [WALL])
    df = table(spark, sf, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    [row] = df.select(F.unix_micros("ts").alias("us")).collect()
    assert row.us == EPOCH_MICROS_AS_UTC


def test_events_ts_unexpected_encoding_raises(spark, tmp_path):
    sf = _write_events(tmp_path, pa.string(), ["2024-03-01 12:30:45"])
    with pytest.raises(TypeError, match="unexpected parquet encoding"):
        table(spark, sf, "events")
