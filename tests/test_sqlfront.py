"""QuestDB-dialect SQL front-end: parse + lower + execute, verified
against equivalent DataFrame-operator results or DuckDB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from questdb_spark.sqlfront.engine import QdbEngine
from questdb_spark.sources.parquet import load_table

from .conftest import SF_DIR, assert_df_matches_oracle


@pytest.fixture(scope="module")
def eng(spark):
    e = QdbEngine(spark)
    for t, ts in [("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")]:
        e.register(t, load_table(spark, SF_DIR, t), designated_ts=ts)
    return e


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_passthrough_plain_sql(eng):
    df = eng.sql("SELECT event_type, count(*) AS n FROM events GROUP BY event_type")
    assert df.count() == 5


def test_interval_string_rewrite(eng, spark):
    df = eng.sql("SELECT event_id FROM events WHERE ts IN '2024-01-15'")
    ev = load_table(spark, SF_DIR, "events")
    expected = ev.filter(
        (F.col("ts") >= "2024-01-15") & (F.col("ts") < F.lit("2024-01-16"))
    ).select("event_id")
    assert rows(df) == rows(expected)


def test_sample_by_sql(eng, ddb):
    df = eng.sql(
        "SELECT ts, event_type, count(*) AS n, sum(cast(value AS decimal(12,2))) AS sv "
        "FROM events SAMPLE BY 1d"
    )
    assert_df_matches_oracle(
        df.withColumn("sv", F.col("sv").cast("decimal(20,2)").cast("double")),
        ddb,
        """SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts, event_type, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sv
           FROM events GROUP BY 1, 2""",
    )


def test_sample_by_fill_sql(eng):
    df = eng.sql(
        "SELECT ts, event_type, count(*) AS n FROM events SAMPLE BY 1d FILL(0)"
    )
    pdf = df.toPandas()
    # full spine × keys, zero-filled
    assert pdf["n"].notna().all()
    assert (pdf.groupby("event_type").size() == pdf["ts"].nunique()).all()


def test_latest_on_sql(eng, spark):
    df = eng.sql("SELECT * FROM events LATEST ON ts PARTITION BY user_id")
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    assert df.count() == n_users
    # per-user max ts
    expected = ev.groupBy("user_id").agg(F.max("ts").alias("ts"))
    got = df.select("user_id", "ts")
    assert rows(got) == rows(expected)


def test_asof_join_sql(eng, spark):
    # register a deduped slave stream, then ASOF join through SQL
    ev = load_table(spark, SF_DIR, "events")
    master = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    slave = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    eng.register("clicks", master, designated_ts="ts")
    eng.register("purchases", slave, designated_ts="ts")
    out = eng.sql("SELECT * FROM clicks ASOF JOIN purchases ON (user_id)")
    from questdb_spark.operators.asof import asof_join

    expected = asof_join(master, slave, "ts", keys=["user_id"])
    assert rows(out) == rows(expected)


def test_lt_join_tolerance_sql(eng, spark):
    out = eng.sql("SELECT * FROM clicks LT JOIN purchases ON (user_id) TOLERANCE 2h")
    from questdb_spark.operators.asof import lt_join

    ev = load_table(spark, SF_DIR, "events")
    master = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    slave = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    expected = lt_join(master, slave, "ts", keys=["user_id"], tolerance="2 HOUR")
    assert rows(out) == rows(expected)


def test_negative_limit_sql(eng, spark):
    df = eng.sql("SELECT event_id, ts FROM events LIMIT -5")
    ev = load_table(spark, SF_DIR, "events")
    expected = (
        ev.orderBy(F.col("ts").desc()).limit(5).orderBy("ts").select("event_id", "ts")
    )
    assert rows(df) == rows(expected)


def test_order_limit_sql(eng):
    df = eng.sql("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 3")
    vals = [r["o_totalprice"] for r in df.collect()]
    assert vals == sorted(vals, reverse=True) and len(vals) == 3


def test_sample_by_align_tz_sql(eng):
    df = eng.sql(
        "SELECT ts, count(*) AS n FROM events SAMPLE BY 1d "
        "ALIGN TO CALENDAR TIME ZONE 'America/New_York'"
    )
    buckets = sorted(str(r["ts"]) for r in df.collect())
    # NY-aligned day buckets surface as 05:00 UTC starts in January (EST)
    assert all(b.endswith("05:00:00") for b in buckets)


def test_sample_by_offset_sql(eng):
    df = eng.sql(
        "SELECT ts, count(*) AS n FROM events SAMPLE BY 1h "
        "ALIGN TO CALENDAR WITH OFFSET '00:30'"
    )
    assert all(str(r["ts"]).endswith("30:00") for r in df.collect())


def test_sample_by_from_to_sql(eng):
    df = eng.sql(
        "SELECT ts, count(*) AS n FROM events "
        "SAMPLE BY 1d FILL(0) FROM '2024-01-10' TO '2024-01-13'"
    )
    buckets = sorted(str(r["ts"]) for r in df.collect())
    assert buckets == [
        "2024-01-10 00:00:00", "2024-01-11 00:00:00", "2024-01-12 00:00:00"
    ]
    assert all(r["n"] is not None for r in df.collect())


def test_combined_asof_where_sample_by(eng, spark):
    """Composability: ASOF JOIN + WHERE + SAMPLE BY in one dialect query."""
    ev0 = load_table(spark, SF_DIR, "events")
    eng.register(
        "clicks",
        ev0.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", F.col("value").alias("click_value")
        ),
        designated_ts="ts",
    )
    eng.register(
        "purchases",
        ev0.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value")),
        designated_ts="ts",
    )
    df = eng.sql(
        "SELECT ts, count(*) AS n, max(purchase_value) AS max_pv "
        "FROM clicks ASOF JOIN purchases ON (user_id) "
        "WHERE purchase_value > 50 SAMPLE BY 1d"
    )
    rows_ = df.collect()
    assert len(rows_) > 0
    from questdb_spark.operators.asof import asof_join

    ev = load_table(spark, SF_DIR, "events")
    master = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    slave = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    joined = asof_join(master, slave, "ts", keys=["user_id"]).filter(
        F.col("purchase_value") > 50
    )
    expected = joined.groupBy(F.date_trunc("day", "ts").alias("ts")).agg(
        F.count(F.lit(1)).alias("n"), F.max("purchase_value").alias("max_pv")
    )
    assert rows(df.select("ts", "n", "max_pv")) == rows(expected)
