"""TIMESTAMP vs TIMESTAMP_NTZ robustness.

Spark 4.1 infers TIMESTAMP_NTZ from naive parquet timestamps when
``spark.sql.parquet.inferTimestampNTZ.enabled`` is on; QuestDB has a single
timestamp type (``ColumnType.java:112``). Round 2 regressed because
``F.unix_micros`` rejects NTZ. Guard: every time-arithmetic operator must
produce IDENTICAL results whether its input column is TIMESTAMP or
TIMESTAMP_NTZ (session pinned UTC makes the two wall-clock-equal).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from questdb_spark.functions import nanos as N
from questdb_spark.functions.finance import twap
from questdb_spark.operators.sample_by import bucket_col, sample_by
from questdb_spark.operators.window_join import window_join
from questdb_spark.tsutil import to_micros

from .conftest import SF_DIR


def _events(spark, ntz: bool):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = "timestamp_ntz" if ntz else "timestamp"
    return df.withColumn("ts", F.col("ts").cast(want))


@pytest.fixture(params=[False, True], ids=["ltz", "ntz"])
def events_any_tz(request, spark):
    return _events(spark, request.param)


def test_to_micros_both_types(spark):
    a = _events(spark, False).select(to_micros("ts").alias("us"))
    b = _events(spark, True).select(to_micros("ts").alias("us"))
    assert a.collect() == b.collect()


def test_bucket_col_any_tz(events_any_tz):
    out = events_any_tz.select(
        bucket_col(F.col("ts"), "1d").alias("d"),
        bucket_col(F.col("ts"), "2h").alias("h2"),
        bucket_col(F.col("ts"), "1d", tz="Europe/Berlin").alias("d_tz"),
    )
    assert out.count() > 0  # analysis + execution both succeed


def test_sample_by_any_tz(spark):
    frames = [
        sample_by(
            _events(spark, ntz), "ts", "1h", {"n": F.count("*"), "v": F.sum("value")}
        )
        .orderBy("ts_bucket")
        .collect()
        for ntz in (False, True)
    ]
    assert frames[0] == frames[1]


def test_twap_any_tz(spark):
    frames = [
        twap(_events(spark, ntz), "ts", "value", keys=["event_type"])
        .orderBy("event_type")
        .collect()
        for ntz in (False, True)
    ]
    assert frames[0] == frames[1]


def test_window_join_any_tz(spark):
    frames = []
    for ntz in (False, True):
        ev = _events(spark, ntz)
        m = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
        s = ev.select("user_id", "ts", "value")
        out = window_join(
            m, s, ts_col="ts", keys=["user_id"], lo="-5 minutes", hi="5 minutes",
            aggs={"n": F.count(F.col("s.value")), "v": F.sum(F.col("s.value"))},
            master_id="event_id",
        )
        frames.append(sorted(out.collect()))
    assert frames[0] == frames[1]


def test_lead_lag_micros_any_tz(events_any_tz):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = events_any_tz.select(
        (to_micros("ts") - to_micros(F.lag("ts", 1).over(w))).alias("d")
    )
    assert out.filter(F.col("d") < 0).count() == 0


def test_ns_of_any_tz(events_any_tz):
    got = events_any_tz.select(N.ns_of(F.col("ts")).alias("ns")).agg(
        F.min("ns"), F.max("ns")
    ).collect()
    assert got[0][0] is not None
