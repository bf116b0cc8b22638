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


# ---------------------------------------------------------------------------
# round 2: WINDOW/HORIZON JOIN syntax, ALIGN TO FIRST OBSERVATION, subqueries,
# multi-join, PIVOT passthrough, DECLARE, depth-0 clause robustness
# ---------------------------------------------------------------------------

def _register_streams(eng, spark):
    from questdb_spark.queries_timeseries import _master_slave

    master, slave = _master_slave(spark, SF_DIR)
    eng.register("clicks", master, designated_ts="ts")
    eng.register("purchases", slave, designated_ts="ts")
    return master, slave


def test_window_join_sql(eng, spark):
    from questdb_spark.operators.window_join import window_join

    master, slave = _register_streams(eng, spark)
    # bare syntax = INCLUDE PREVAILING (the reference default,
    # WindowJoinContext.java:39)
    out = eng.sql(
        "SELECT event_id, user_id, ts, click_value, "
        "count(p.purchase_value) AS n_purchases "
        "FROM clicks WINDOW JOIN purchases p ON (user_id) "
        "RANGE BETWEEN 1 hour PRECEDING AND 1 hour FOLLOWING"
    )
    expected = window_join(
        master.select("event_id", "user_id", "ts", "click_value"),
        slave, "ts", ["user_id"], "-1 hour", "1 hour",
        {"n_purchases": F.count(F.col("s.purchase_value"))},
        master_id="event_id",
        include_prevailing=True,
    )
    assert rows(out) == rows(expected)

    out_excl = eng.sql(
        "SELECT event_id, user_id, ts, click_value, "
        "count(p.purchase_value) AS n_purchases "
        "FROM clicks WINDOW JOIN purchases p ON (user_id) "
        "RANGE BETWEEN 1 hour PRECEDING AND 1 hour FOLLOWING EXCLUDE PREVAILING"
    )
    expected_excl = window_join(
        master.select("event_id", "user_id", "ts", "click_value"),
        slave, "ts", ["user_id"], "-1 hour", "1 hour",
        {"n_purchases": F.count(F.col("s.purchase_value"))},
        master_id="event_id",
    )
    assert rows(out_excl) == rows(expected_excl)
    # prevailing adds rows for masters whose window missed an earlier quote
    n_incl = sum(r["n_purchases"] for r in out.collect())
    n_excl = sum(r["n_purchases"] for r in out_excl.collect())
    assert n_incl > n_excl


def test_horizon_join_markout_sql(eng, spark):
    from questdb_spark.operators.window_join import markout_agg

    _, slave = _register_streams(eng, spark)
    ev = load_table(spark, SF_DIR, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    eng.register("signups", signups, designated_ts="ts")
    out = eng.sql(
        "SELECT h.offset, count(*) AS n_masters, count(p.ts) AS n_matched "
        "FROM signups HORIZON JOIN purchases p ON (user_id) "
        "RANGE FROM 0s TO 30m STEP 10m AS h GROUP BY h.offset"
    )
    expected = markout_agg(
        signups, slave, "ts", ["user_id"],
        "0 second", "30 minute", "10 minute",
        {"n_masters": F.count(F.lit(1)), "n_matched": F.count("slave_ts")},
    )
    assert rows(out) == rows(expected)


def test_sample_by_first_observation_sql(eng, spark):
    from questdb_spark.operators.sample_by import sample_by

    df = eng.sql(
        "SELECT ts, count(*) AS n FROM events SAMPLE BY 1h ALIGN TO FIRST OBSERVATION"
    )
    ev = load_table(spark, SF_DIR, "events")
    expected = sample_by(
        ev, "ts", "1h", {"n": F.count(F.lit(1))},
        align="first_observation", bucket_name="ts",
    )
    assert rows(df) == rows(expected)


def test_subquery_from_dialect_sql(eng, spark):
    # inner plain-SQL subquery, outer SAMPLE BY
    df = eng.sql(
        "SELECT ts, count(*) AS n "
        "FROM (SELECT * FROM events WHERE event_type = 'click') SAMPLE BY 1d"
    )
    ev = load_table(spark, SF_DIR, "events")
    expected = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("day", "ts").alias("ts"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert rows(df) == rows(expected)


def test_subquery_with_dialect_inside(eng, spark):
    # dialect clause INSIDE the subquery, plain outer aggregation
    df = eng.sql(
        "SELECT count(*) AS n "
        "FROM (SELECT * FROM events LATEST ON ts PARTITION BY user_id)"
    )
    ev = load_table(spark, SF_DIR, "events")
    assert df.collect()[0]["n"] == ev.select("user_id").distinct().count()


def test_multi_join_sample_by_sql(eng, spark):
    from questdb_spark.operators.sample_by import sample_by

    for t in ("customer",):
        eng.register(t, load_table(spark, SF_DIR, t))
    df = eng.sql(
        "SELECT o_orderdate, count(*) AS n FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_mktsegment = 'BUILDING' SAMPLE BY 1d"
    )
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    expected = sample_by(
        joined, "o_orderdate", "1d", {"n": F.count(F.lit(1))},
        bucket_name="o_orderdate",
    )
    assert rows(df) == rows(expected)


def test_pivot_passthrough_sql(eng):
    # QuestDB PIVOT (SqlParser.java:4260) ≈ Spark SQL PIVOT: pure passthrough
    df = eng.sql(
        "SELECT * FROM (SELECT event_type, user_id FROM events) "
        "PIVOT (count(user_id) FOR event_type IN ('click', 'purchase'))"
    )
    assert {"click", "purchase"}.issubset(set(df.columns))
    assert df.count() > 0


def test_declare_sql(eng, spark):
    # DECLARE bindings (SqlParser.java:3604), incl. inside a dialect query
    df = eng.sql(
        "DECLARE @et := 'click', @n := 5 "
        "SELECT event_id, ts FROM events WHERE event_type = @et LIMIT -@n"
    )
    ev = load_table(spark, SF_DIR, "events")
    expected = (
        ev.filter(F.col("event_type") == "click")
        .orderBy(F.col("ts").desc()).limit(5).orderBy("ts")
        .select("event_id", "ts")
    )
    assert rows(df) == rows(expected)


def test_depth0_string_literal_keywords(eng):
    # clause keywords inside string literals must not split the skeleton
    df = eng.sql(
        "SELECT event_id FROM events "
        "WHERE event_type = ' from where limit sample by ' LIMIT -3"
    )
    assert df.count() == 0


def test_parser_depth0_units():
    from questdb_spark.sqlfront.parser import parse

    q = parse(
        "SELECT substring(event_type FROM 1 FOR 3) AS t3, count(*) AS n "
        "FROM events SAMPLE BY 1d"
    )
    assert q.table == "events"
    assert q.select_items[0].expr.lower().startswith("substring")
    assert q.sample_by.interval == "1d"

    q2 = parse(
        "SELECT * FROM t WINDOW JOIN s ON (a, b) "
        "RANGE BETWEEN 30 seconds PRECEDING AND 10 seconds FOLLOWING"
    )
    assert q2.window_join.keys == ["a", "b"]
    assert q2.window_join.lo == "-30 second"
    assert q2.window_join.hi == "10 second"

    q3 = parse(
        "SELECT h.offset, count(*) AS n FROM m "
        "HORIZON JOIN s ON (k) RANGE FROM -10s TO 20s STEP 10s AS h "
        "GROUP BY h.offset"
    )
    assert (q3.horizon_join.frm, q3.horizon_join.to, q3.horizon_join.step) == (
        "-10 second", "20 second", "10 second"
    )
    assert q3.horizon_join.range_alias == "h"

    # subquery in FROM + ANSI join captured as table/spec
    q4 = parse(
        "SELECT a FROM (SELECT a FROM x WHERE b IN (1, 2)) t "
        "LEFT JOIN y ON t.a = y.a SAMPLE BY 1h"
    )
    assert q4.table.startswith("(") and q4.table_alias == "t"
    assert q4.sql_joins[0].how == "left" and q4.sql_joins[0].on == "t.a = y.a"


def test_having_clause(eng, spark):
    from questdb_spark.sources.parquet import load_table
    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    eng.register("events_h", ev, designated_ts="ts")
    out = eng.sql(
        "SELECT ts, event_type, count(*) AS n "
        "FROM events_h SAMPLE BY 6h HAVING count(*) > 3"
    )
    assert out.filter(F.col("n") <= 3).count() == 0
    assert out.count() > 0
    # alias-reference form
    out2 = eng.sql(
        "SELECT ts, event_type, count(*) AS n FROM events_h SAMPLE BY 6h HAVING n > 3"
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_interval_repetition(spark):
    from datetime import datetime

    from questdb_spark.operators.intervals import parse_interval_ranges

    rs = parse_interval_ranges("2018-01-10T10:30;30m;2d;2")
    # base: [10:30, 10:31+30m) per the granularity-advance + duration rule
    assert rs[0] == (datetime(2018, 1, 10, 10, 30), datetime(2018, 1, 10, 11, 1))
    assert rs[1] == (datetime(2018, 1, 12, 10, 30), datetime(2018, 1, 12, 11, 1))
    # plain forms still single-range
    assert len(parse_interval_ranges("2024-01")) == 1
    assert len(parse_interval_ranges("2024-01-15;2d")) == 1
    # reference rejects the 3-part form (parseIntervalSuffix: 2 semis = error)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_interval_ranges("2024-01-10;2d;2")


def test_interval_repetition_in_sql(eng, spark):
    from questdb_spark.sources.parquet import load_table
    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    eng.register("events_r", ev, designated_ts="ts")
    out = eng.sql(
        "SELECT count(*) AS n FROM events_r WHERE ts IN '2024-01-10T09;4h;1d;3'"
    )
    expected = ev.filter(
        "(ts >= TIMESTAMP '2024-01-10 09:00:00' AND ts < TIMESTAMP '2024-01-10 14:00:00')"
        " OR (ts >= TIMESTAMP '2024-01-11 09:00:00' AND ts < TIMESTAMP '2024-01-11 14:00:00')"
        " OR (ts >= TIMESTAMP '2024-01-12 09:00:00' AND ts < TIMESTAMP '2024-01-12 14:00:00')"
    ).count()
    assert out.collect()[0]["n"] == expected


def test_having_overlapping_aggregate_exprs(eng, spark):
    """HAVING rewrite must replace longer aggregate expressions first:
    sum(value) inside sum(value * 2) must not be corrupted."""
    from questdb_spark.sources.parquet import load_table
    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    eng.register("events_h2", ev, designated_ts="ts")
    out = eng.sql(
        "SELECT ts, sum(value) AS a, sum(value * 2) AS b "
        "FROM events_h2 SAMPLE BY 6h HAVING sum(value * 2) > 1000 AND sum(value) > 400"
    )
    rows_ = out.collect()
    assert len(rows_) > 0
    for r in rows_:
        assert r["b"] > 1000 and r["a"] > 400


def test_setops_over_dialect_queries(eng, spark):
    """UNION/INTERSECT/EXCEPT between SAMPLE BY queries: before the
    depth-0 set-op split the clause parser silently swallowed the tail."""
    from questdb_spark.sources.parquet import load_table
    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    eng.register("events_u", ev, designated_ts="ts")
    single = eng.sql("SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d")
    n1 = single.count()
    u_all = eng.sql(
        "SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d "
        "UNION ALL SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d"
    )
    assert u_all.count() == 2 * n1
    u = eng.sql(
        "SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d "
        "UNION SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d"
    )
    assert u.count() == n1
    ex = eng.sql(
        "SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d "
        "EXCEPT SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d"
    )
    assert ex.count() == 0
    # mixed: dialect LHS, plain ANSI RHS
    mixed = eng.sql(
        "SELECT ts, count(*) AS n FROM events_u SAMPLE BY 1d "
        "UNION ALL SELECT date_trunc('day', ts) AS ts, count(*) AS n "
        "FROM events_u GROUP BY 1"
    )
    assert mixed.count() == 2 * n1


def test_positional_binds_ansi_and_dialect(spark):
    """$1/$2 positional + :name named binds on both engine paths, with a
    literal '$1' untouched (IndexedParameterLinkFunction semantics)."""
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    df = spark.createDataFrame(
        [("2024-01-01 00:00:10", "a", 1.0), ("2024-01-01 00:01:10", "b", 5.0)],
        "at string, k string, v double",
    ).selectExpr("CAST(at AS TIMESTAMP) AS at", "k", "v")
    eng.register("tb", df, designated_ts="at")
    # ANSI path
    got = eng.sql("SELECT k FROM tb WHERE v > $1 AND k != $2", [0.5, "zzz"]).collect()
    assert sorted(r["k"] for r in got) == ["a", "b"]
    # dialect path (sample by)
    got = eng.sql(
        "select at, sum(v) s from tb where k = $1 sample by 1m", ["b"]
    ).collect()
    assert [r["s"] for r in got] == [5.0]
    # named markers still work; a '$1' inside a literal is not a marker
    got = eng.sql(
        "SELECT k FROM tb WHERE v > :lo AND k != '$1'", {"lo": 2.0}
    ).collect()
    assert [r["k"] for r in got] == ["b"]
    # out-of-range positional
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.sql("SELECT * FROM tb WHERE v > $3", [1.0])


def test_query_activity_and_cancel_errors(spark):
    """QueryRegistry error surface: CANCEL of an unknown id and of an
    already-finished query both error (QueryRegistryTest), touch() reports
    files+rows, hydrate_table_metadata() acks."""
    eng = QdbEngine(spark)  # fresh registry: ids must start at 1
    eng.sql("SELECT 1 AS one")
    eng.sql("SELECT 2 AS two")  # completes query 1
    with pytest.raises(ValueError, match="cannot be found"):
        eng.sql("CANCEL QUERY 99")
    with pytest.raises(ValueError, match="not active"):
        eng.sql("CANCEL QUERY 1")
    # cancel the active one, then verify state transitions in activity()
    eng.sql("CANCEL QUERY 2")
    rows = {
        r["query_id"]: r["state"]
        for r in eng.sql(
            "SELECT query_id, state FROM query_activity()"
        ).collect()
    }
    assert rows[1] == "completed" and rows[2] == "cancelled"


def test_touch_and_hydrate(eng, spark):
    n = load_table(spark, SF_DIR, "events").count()
    row = eng.sql("SELECT * FROM touch('events')").collect()[0]
    assert row["touched_rows"] == n and row["touched_files"] >= 1
    ok = eng.sql("SELECT hydrate_table_metadata('events') AS s").collect()[0]["s"]
    assert ok == "ok"


# -- today()/tomorrow()/yesterday(), interval() surface (r6) ----------------

def test_day_interval_functions(spark):
    from datetime import datetime, timedelta, timezone

    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    today = datetime.now(timezone.utc).date()
    ev = spark.createDataFrame(
        [(1, datetime.combine(today, datetime.min.time()) + timedelta(hours=3)),
         (2, datetime.combine(today - timedelta(days=1), datetime.min.time())),
         (3, datetime.combine(today + timedelta(days=1), datetime.min.time()))],
        "id long, ts timestamp",
    )
    eng.register("ev", ev, designated_ts="ts")
    got = {r["id"] for r in eng.sql("SELECT id FROM ev WHERE ts IN today()").collect()}
    assert got == {1}
    got = {r["id"] for r in eng.sql("SELECT id FROM ev WHERE ts IN yesterday()").collect()}
    assert got == {2}
    got = {r["id"] for r in eng.sql("SELECT id FROM ev WHERE ts IN tomorrow()").collect()}
    assert got == {3}
    # NOT IN + timezone-arg form parse and run
    n = eng.sql("SELECT count(*) c FROM ev WHERE ts NOT IN today()").collect()[0][0]
    assert n == 2
    assert eng.sql(
        "SELECT count(*) c FROM ev WHERE ts IN today('UTC')"
    ).collect()[0][0] == 1


def test_interval_constructor_and_accessors(spark):
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    r = eng.sql(
        "SELECT interval_start(interval('2024-01-01', '2024-01-02')) AS lo, "
        "interval_end(interval('2024-01-01', '2024-01-02')) AS hi, "
        "interval_start('2024-03') AS mlo, interval_end('2024-03') AS mhi"
    ).collect()[0]
    assert str(r["lo"]) == "2024-01-01 00:00:00"
    assert str(r["hi"]) == "2024-01-02 00:00:00"
    assert str(r["mlo"]) == "2024-03-01 00:00:00"
    assert str(r["mhi"]) == "2024-03-31 23:59:59.999999"
    ev = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00"), (2, "2024-02-01 00:00:00")],
        "id long, tss string",
    ).selectExpr("id", "cast(tss as timestamp) as ts")
    eng.register("ev2", ev, designated_ts="ts")
    got = {r["id"] for r in eng.sql(
        "SELECT id FROM ev2 WHERE ts IN interval('2024-01-01', '2024-01-15')"
    ).collect()}
    assert got == {1}


def test_timestamp_shuffle_bounds(spark):
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    rows = eng.sql(
        "SELECT timestamp_shuffle('2024-01-01', '2024-01-02') AS t "
        "FROM long_sequence(200)"
    ).collect()
    ts = [r["t"] for r in rows]
    assert all(str(t) >= "2024-01-01 00:00:00" and str(t) < "2024-01-02" for t in ts)
    assert len(set(ts)) > 150  # draws actually vary
    # deterministic: same statement, same draws
    again = [r["t"] for r in eng.sql(
        "SELECT timestamp_shuffle('2024-01-01', '2024-01-02') AS t "
        "FROM long_sequence(200)"
    ).collect()]
    assert ts == again


def test_make_geohash_and_within(spark):
    """make_geohash SQL macro equals the column-API encoder; within()
    is the geohash prefix predicate."""
    from pyspark.sql import functions as F

    from questdb_spark.functions.geohash import geohash_encode
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    pts = spark.createDataFrame(
        [(1, 48.20, 16.37), (2, -33.86, 151.21), (3, 40.71, -74.00)],
        "id long, lat double, lon double",
    )
    eng.register("pts", pts)
    got = eng.sql(
        "SELECT id, make_geohash(lon, lat, 40) AS gh FROM pts"
    ).collect()
    ref = {
        r["id"]: r["gh"]
        for r in pts.select(
            "id", geohash_encode(F.col("lat"), F.col("lon"), 8).alias("gh")
        ).collect()
    }
    assert {r["id"]: r["gh"] for r in got} == ref
    # vienna is in 'u2'; sydney in 'r3'; new york in 'dr'
    ids = {r["id"] for r in eng.sql(
        "SELECT id FROM pts WHERE within(make_geohash(lon, lat, 40), 'u2', 'dr')"
    ).collect()}
    assert ids == {1, 3}


def test_range_frame_unit_rewrite():
    from questdb_spark.sqlfront.engine import _rewrite_range_frame_units as rw

    # unit keyword -> Spark calendar interval
    assert (
        rw("select avg(v) over (order by ts range between 5 minutes preceding and current row) from t")
        == "select avg(v) over (order by ts range between INTERVAL '5' MINUTE PRECEDING and current row) from t"
    )
    # quoted value + unit; both bounds
    out = rw("select max(ts) over (order by ts range between '2' hour preceding and '1' hour preceding) from t")
    assert "INTERVAL '2' HOUR PRECEDING" in out and "INTERVAL '1' HOUR PRECEDING" in out
    # quoted unitless = native micros
    assert "INTERVAL '7' MICROSECOND PRECEDING" in rw(
        "select max(v) over (order by ts range between '7' preceding and current row) from t"
    )
    # bare unitless number = numeric range frame, untouched
    s = "select sum(v) over (order by x range between 5 preceding and current row) from t"
    assert rw(s) == s
    # WINDOW JOIN's RANGE clause is not an OVER span — untouched
    s2 = "select a from t window join q on (s) range between 30 seconds preceding and 30 seconds following"
    assert rw(s2) == s2
    # nanoseconds fold to whole micros; reject sub-micro remainders
    assert "INTERVAL '2' MICROSECOND" in rw(
        "select max(v) over (order by ts range 2000 nanoseconds preceding) from t"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rw("select max(v) over (order by ts range 1500 nanoseconds preceding) from t")
    # string literals elsewhere in the statement don't confuse the span
    s3 = "select 'range between 5 minutes preceding and current row', max(v) over (order by x rows between 1 preceding and current row) from t"
    assert rw(s3) == s3


def test_frame_exclude_rewrite():
    from questdb_spark.sqlfront.engine import (
        _rewrite_frame_exclude as rw,
        _rewrite_range_frame_units as ru,
    )

    # ROWS ending at CURRENT ROW: end shrinks to 1 PRECEDING
    assert rw(
        "select sum(x) over (order by ts rows between 2 preceding and current row exclude current row) from t"
    ) == "select sum(x) over (order by ts rows between 2 preceding and 1 PRECEDING) from t"
    # frame entirely in the past: EXCLUDE is a no-op (reference
    # rows_plain == rows_excluded)
    assert rw(
        "select sum(x) over (order by ts rows between 2 preceding and 1 preceding exclude current row) from t"
    ) == "select sum(x) over (order by ts rows between 2 preceding and 1 preceding) from t"
    # RANGE: one microsecond tick — the current row's PEERS leave too.
    # Mixed-unit bounds are unified to fractional SECOND (Spark rejects
    # RANGE frames whose two interval bounds carry different unit types).
    out = ru(rw(
        "select sum(x) over (order by ts range between 2 second preceding and current row exclude current row) from t"
    ))
    assert "INTERVAL '2' SECOND PRECEDING" in out
    assert "INTERVAL '0.000001' SECOND PRECEDING" in out
    # UNBOUNDED PRECEDING start keeps the timestamp tick
    assert "INTERVAL '1' MICROSECOND PRECEDING" in ru(rw(
        "select sum(x) over (order by ts range between unbounded preceding and current row exclude current row) from t"
    ))
    # bare-numeric RANGE (Spark numeric-ordering extension): numeric tick
    assert rw(
        "select sum(v) over (order by x range between 5 preceding and current row exclude current row) from t"
    ).endswith("range between 5 preceding and 1 PRECEDING) from t")
    # shorthand frame gains an explicit BETWEEN
    assert rw(
        "select sum(x) over (order by ts rows 3 preceding exclude current row) from t"
    ) == "select sum(x) over (order by ts rows BETWEEN 3 preceding AND 1 PRECEDING) from t"
    # EXCLUDE NO OTHERS is the no-op default: stripped
    assert rw(
        "select sum(x) over (order by ts rows unbounded preceding exclude no others) from t"
    ) == "select sum(x) over (order by ts rows unbounded preceding) from t"
    # named WINDOW definitions are window specs too
    assert rw(
        "select v, sum(v) over w s from t window w as (order by ts rows between 2 preceding and current row exclude current row)"
    ).endswith("window w as (order by ts rows between 2 preceding and 1 PRECEDING)")
    # reference error surface
    import pytest as _pytest

    with _pytest.raises(ValueError, match="only EXCLUDE NO OTHERS"):
        rw("select sum(x) over (order by ts rows between 2 preceding and current row exclude ties) from t")
    with _pytest.raises(ValueError, match="only EXCLUDE NO OTHERS"):
        rw("select sum(x) over (order by ts rows unbounded preceding exclude group) from t")
    with _pytest.raises(ValueError, match="UNBOUNDED FOLLOWING"):
        rw("select sum(x) over (order by ts rows between unbounded preceding and unbounded following exclude current row) from t")
    with _pytest.raises(ValueError, match="empty frame"):
        rw("select sum(x) over (order by ts rows between current row and current row exclude current row) from t")
    # EXCLUDE inside a string literal is untouched
    s = "select 'rows 1 preceding exclude current row', max(v) over (order by x) from t"
    assert rw(s) == s


def test_range_units_in_named_window_defs():
    from questdb_spark.sqlfront.engine import _rewrite_range_frame_units as ru

    out = ru(
        "select sum(v) over w from t "
        "window w as (order by ts range between 2 second preceding and current row), "
        "v as (order by ts range '30' minute preceding)"
    )
    assert "INTERVAL '2' SECOND PRECEDING" in out
    assert "INTERVAL '30' MINUTE PRECEDING" in out


def test_bare_table_queries(eng, spark):
    # a statement may start at the table expression (SqlParser.java
    # parseDml: optional SELECT)
    assert eng.sql("events LIMIT 3").count() == 3
    ev = load_table(spark, SF_DIR, "events")
    n1 = ev.filter(F.col("user_id") == 1).count()
    assert eng.sql("events WHERE user_id = 1").count() == n1
    # bare LATEST ON: one row per key
    lt = eng.sql("events LATEST ON ts PARTITION BY user_id")
    assert lt.count() == ev.select("user_id").distinct().count()
    # set-op operands may be bare too
    n2 = ev.filter(F.col("user_id") == 2).count()
    assert (
        eng.sql(
            "events WHERE user_id = 1 UNION ALL events WHERE user_id = 2"
        ).count()
        == n1 + n2
    )
    # parenthesized bare subquery in statement and FROM position
    assert eng.sql("(events WHERE user_id = 1) LIMIT 2").count() == 2
    assert (
        eng.sql("SELECT count(*) AS n FROM (events WHERE user_id = 1)").first().n
        == n1
    )
    # table functions are statements (`long_sequence(5)` is a query)
    assert eng.sql("long_sequence(5)").count() == 5
    assert eng.sql("tables()").count() >= 1
    # alias form
    assert eng.sql("events e WHERE e.user_id = 1").count() == n1
    # a column wrapped in parens must NOT be mistaken for a subquery
    assert eng.sql("SELECT (value) AS v FROM events LIMIT 1").count() == 1
    # string literals never trigger the shorthand
    assert (
        eng.sql("SELECT 'events WHERE 1' AS s FROM events LIMIT 1").first().s
        == "events WHERE 1"
    )


def test_with_cte_dialect(eng, spark):
    ev = load_table(spark, SF_DIR, "events")
    # dialect body (SAMPLE BY) + plain main
    n_hours = (
        ev.select(F.date_trunc("hour", "ts").alias("h")).distinct().count()
    )
    r = eng.sql(
        "WITH s AS (SELECT ts, count(*) AS c FROM events SAMPLE BY 1h) "
        "SELECT count(*) AS n FROM s"
    ).first()
    assert r.n == n_hours
    # chained CTEs: later bodies see earlier names; main is dialect again
    df = eng.sql(
        "WITH s AS (SELECT ts, count(*) AS c FROM events SAMPLE BY 1h), "
        "t AS (SELECT ts, c FROM s WHERE c > 0) "
        "SELECT ts, max(c) AS m FROM t SAMPLE BY 1d"
    )
    assert df.count() == ev.select(F.to_date("ts")).distinct().count()
    # bare-table main query (`WITH q AS (...) q`)
    assert eng.sql("WITH q AS (SELECT user_id FROM events LIMIT 5) q").count() == 5
    # CTE name shadows a registered table for the statement only
    n1 = ev.filter(F.col("user_id") == 1).count()
    r = eng.sql(
        "WITH events AS (SELECT * FROM events WHERE user_id = 1) "
        "SELECT count(*) AS n FROM events"
    ).first()
    assert r.n == n1
    assert eng.sql("SELECT count(*) AS n FROM events").first().n == ev.count()
    # CTE binds in ASOF JOIN slave position (designated ts propagated)
    df = eng.sql(
        "WITH px AS (SELECT ts, user_id, value FROM events WHERE value > 90) "
        "SELECT count(*) AS n FROM events ASOF JOIN px ON user_id"
    )
    assert df.first().n == ev.count()
    # malformed WITH over a dialect statement errors cleanly
    with pytest.raises(ValueError, match="malformed WITH"):
        eng.sql("WITH x(a) AS (SELECT 1) SELECT ts FROM events SAMPLE BY 1h")


def test_implicit_group_by(eng, spark):
    ev = load_table(spark, SF_DIR, "events")
    # plain column + aggregate, no GROUP BY: key inferred
    got = eng.sql("SELECT event_type, count() AS n FROM events")
    exp = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert rows(got) == rows(exp)
    # expression key with bare alias; HAVING and ORDER BY still attach
    got = eng.sql(
        "SELECT user_id % 10 bucket, max(value) mx FROM events "
        "HAVING mx > 0 ORDER BY bucket"
    )
    exp = (
        ev.groupBy((F.col("user_id") % 10).alias("bucket"))
        .agg(F.max("value").alias("mx"))
        .filter(F.col("mx") > 0)
    )
    assert rows(got.select("bucket", "mx")) == rows(exp)
    # inference reaches subqueries and set-op operands
    assert (
        eng.sql(
            "SELECT max(n) AS m FROM (SELECT user_id, count() n FROM events)"
        ).first().m
        == ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    # scalar aggregates stay scalar
    assert eng.sql("SELECT count() n, max(value) m FROM events").count() == 1
    # window expressions don't trigger inference
    assert (
        eng.sql(
            "SELECT user_id, sum(value) OVER (PARTITION BY user_id ORDER BY ts) s "
            "FROM events"
        ).count()
        == ev.count()
    )
    # explicit GROUP BY and SAMPLE BY blocks are untouched
    assert (
        eng.sql("SELECT event_type, count() n FROM events GROUP BY event_type").count()
        == 5
    )


def test_limit_negative_ranges(eng):
    # LIMIT lo, hi with negative bounds counts from the END of the result
    # set (LimitRecordCursorFactory.java:43)
    all_ids = [
        r.event_id
        for r in eng.sql("SELECT event_id FROM events ORDER BY ts, event_id").collect()
    ]
    n = len(all_ids)

    def got(q):
        return [r.event_id for r in eng.sql(q).collect()]

    base = "SELECT event_id FROM events ORDER BY ts, event_id LIMIT "
    assert got(base + "5, 12") == all_ids[5:12]
    assert got(base + "-10, -5") == all_ids[n - 10 : n - 5]
    assert got(base + "4, -4") == all_ids[4 : n - 4]
    assert got(base + f"-10, {n - 2}") == all_ids[n - 10 : n - 2]
    assert got(base + "-5, -10") == []


def test_implicit_group_by_subquery_items(eng):
    # an aggregate inside a scalar subquery runs per row — the item is
    # NOT an aggregate and must not trigger inference
    df = eng.sql(
        "SELECT o_custkey, (SELECT count(*) FROM orders) t, o_totalprice "
        "FROM orders LIMIT 3"
    )
    assert df.count() == 3
    # ...but one nested in a scalar call is (coalesce(sum(x), 0))
    df = eng.sql(
        "SELECT o_orderstatus, coalesce(sum(o_totalprice), 0.0) s FROM orders"
    )
    assert df.count() == df.select("o_orderstatus").distinct().count()


def test_latest_by_legacy(eng, spark):
    # v6 shorthand: LATEST BY keys == LATEST ON <designated ts> PARTITION
    # BY keys (SqlParser parseLatestBy, still accepted by the reference)
    new = eng.sql("SELECT * FROM events LATEST ON ts PARTITION BY user_id")
    old = eng.sql("SELECT * FROM events LATEST BY user_id")
    assert rows(old) == rows(new)
    # bare-table + multi-key + WHERE-first filtering forms
    ev = load_table(spark, SF_DIR, "events")
    assert (
        eng.sql("events LATEST BY user_id, event_type").count()
        == ev.select("user_id", "event_type").distinct().count()
    )
    got = eng.sql("SELECT * FROM events LATEST BY user_id WHERE event_type = 'click'")
    exp = eng.sql(
        "SELECT * FROM events WHERE event_type = 'click' "
        "LATEST ON ts PARTITION BY user_id"
    )
    assert rows(got) == rows(exp)


def test_insert_modifiers_and_symbol_cast(eng, spark):
    e2 = QdbEngine(spark)
    e2.sql("CREATE TABLE m1 (x INT, ts TIMESTAMP) TIMESTAMP(ts)")
    e2.sql("INSERT ATOMIC INTO m1 VALUES (1, '2024-01-01T00:00:00Z')")
    e2.sql("INSERT BATCH 1000 INTO m1 VALUES (2, '2024-01-02T00:00:00Z')")
    e2.sql(
        "INSERT BATCH 500 o3MaxLag 180s INTO m1 VALUES (3, '2024-01-03T00:00:00Z')"
    )
    assert e2.sql("SELECT count(*) AS n FROM m1").first().n == 3
    r = eng.sql(
        "SELECT cast(event_type AS symbol) a, event_type::symbol b "
        "FROM events LIMIT 1"
    ).first()
    assert r.a == r.b


def test_null_comparison_semantics(eng):
    # QuestDB `x = null` / `x != null` ARE null tests (WhereClauseParser;
    # the reference's tests filter with `where lo != null`)
    base = (
        "SELECT count(*) AS c FROM "
        "(SELECT CASE WHEN x > 2 THEN NULL ELSE x END v FROM long_sequence(5)) "
    )
    assert eng.sql(base + "WHERE v = NULL").first().c == 3
    assert eng.sql(base + "WHERE v != NULL").first().c == 2
    assert eng.sql(base + "WHERE v <> NULL").first().c == 2
    # literals and >=/<= comparisons stay untouched
    assert eng.sql("SELECT 'v = null' AS s").first().s == "v = null"
    # seeded long_sequence(n, s1, s2) parses (seeds drop: rnd_* streams
    # here are deterministic by row index)
    assert eng.sql("SELECT count(*) AS n FROM long_sequence(7, 33, 44)").first().n == 7


def test_distinct_and_setops_in_dialect(eng, spark):
    ev = load_table(spark, SF_DIR, "events")
    # SELECT DISTINCT through the dialect parse path
    assert (
        eng.sql(
            "SELECT DISTINCT event_type FROM (events LATEST ON ts PARTITION BY user_id)"
        ).count()
        == 5
    )
    # parenthesized dialect operands around a set op (the keyword sits at
    # a depth-0 span edge)
    n_users = ev.select("user_id").distinct().count()
    assert (
        eng.sql(
            "(events LATEST ON ts PARTITION BY user_id) UNION ALL "
            "(events LATEST ON ts PARTITION BY user_id)"
        ).count()
        == 2 * n_users
    )
    # aggregate-free SAMPLE BY gets the reference's error
    with pytest.raises(ValueError, match="at least one aggregation"):
        eng.sql("SELECT DISTINCT user_id FROM events SAMPLE BY 1d")


def test_dialect_subqueries_in_expressions(eng, spark):
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    # IN (dialect subquery)
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM events WHERE event_id IN "
            "(SELECT event_id FROM events LATEST ON ts PARTITION BY user_id)"
        ).first().n
        == n_users
    )
    # scalar dialect subquery in a comparison
    r = eng.sql(
        "SELECT count(*) AS n FROM events WHERE value > "
        "(SELECT avg(c) FROM (SELECT ts, count(*) c FROM events SAMPLE BY 1h))"
    ).first()
    assert r.n > 0
    # plain ANSI subqueries stay on Spark's native path
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM events WHERE user_id IN "
            "(SELECT user_id FROM events WHERE value > 99)"
        ).first().n
        > 0
    )


def test_between_timestamp_symmetry(eng):
    # timestamp BETWEEN is symmetric in the reference
    # (BetweenTimestampFunctionFactory: min/max of the operands)
    fwd = eng.sql(
        "SELECT count(*) AS n FROM events WHERE ts BETWEEN '2024-01-14' AND '2024-01-16'"
    ).first().n
    rev = eng.sql(
        "SELECT count(*) AS n FROM events WHERE ts BETWEEN '2024-01-16' AND '2024-01-14'"
    ).first().n
    assert fwd == rev > 0
    # plain string literals are not ISO bounds: untouched (ANSI order)
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM events WHERE event_type BETWEEN 'view' AND 'click'"
        ).first().n
        == 0
    )


def test_timestamp_equality_interval(eng, spark):
    # `ts = '<interval string>'` is the IN intrinsic
    # (WhereClauseParser analyzeEquals -> model.intersectTimestamp):
    # partial precision selects the whole period, != the complement
    n_in = eng.sql(
        "SELECT count(*) AS n FROM events WHERE ts IN '2024-01-15'"
    ).first().n
    assert (
        eng.sql("SELECT count(*) AS n FROM events WHERE ts = '2024-01-15'").first().n
        == n_in
    )
    total = load_table(spark, SF_DIR, "events").count()
    assert (
        eng.sql("SELECT count(*) AS n FROM events WHERE ts != '2024-01-15'").first().n
        == total - n_in
    )
    # string-column equality is untouched (the reference guards the
    # intrinsic with isTimestamp on the column)
    assert (
        eng.sql(
            "SELECT count(*) AS n FROM events WHERE event_type = 'view'"
        ).first().n
        > 0
    )


def test_expression_keys_and_qualified_latest(eng, spark):
    ev = load_table(spark, SF_DIR, "events")
    # expression key with a bare alias in SAMPLE BY
    df = eng.sql("SELECT ts, user_id % 3 grp, count() n FROM events SAMPLE BY 1d")
    assert df.columns == ["ts", "grp", "n"]
    exp = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("ts"),
            (F.col("user_id") % 3).alias("grp"),
        ).count()
    )
    assert df.count() == exp.count()
    # numeric-ending expressions take bare aliases; interval-unit tails
    # are still literals, not aliases
    assert eng.sql("SELECT count(*) * 100.0 pct FROM events").columns == ["pct"]
    assert eng.sql(
        "SELECT ts + interval 1 day d1 FROM events LIMIT 1"
    ).columns == ["d1"]
    # alias-qualified select items + PARTITION BY keys after LATEST ON
    df = eng.sql("SELECT e.value FROM events e LATEST ON ts PARTITION BY e.user_id")
    assert df.count() == ev.select("user_id").distinct().count()


def test_rewrite_predicate_text(eng):
    rp = eng.rewrite_predicate
    out = rp("ts IN '2024-01-15'")
    assert "ts >= TIMESTAMP '2024-01-15" in out and "<" in out
    out = rp("ts = '2024-01-15'")
    assert ">=" in out and "<" in out
    assert rp("x != null").strip().endswith("IS NOT NULL")
    assert "IS NULL" in rp("x = null")
    assert rp("s ~ '^ab'") != "s ~ '^ab'"  # match operator lowered
    # non-timestamp predicates pass through
    assert rp("x > 5 AND s = 'abc'") == "x > 5 AND s = 'abc'"


def test_with_cte_shadowing_ddl_table(spark):
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    eng.sql("CREATE TABLE sdw (x INT, ts TIMESTAMP) TIMESTAMP(ts)")
    eng.sql(
        "INSERT INTO sdw VALUES (1, '2024-01-01T00:00:00Z'), (2, '2024-01-02T00:00:00Z')"
    )
    n = eng.sql(
        "WITH sdw AS (SELECT ts, count() c FROM sdw SAMPLE BY 1d) "
        "SELECT count() AS n FROM sdw"
    ).first().n
    assert n == 2
    # the DDL table's temp view is restored after the statement
    assert eng.sql("SELECT count(*) AS n FROM sdw").first().n == 2


def test_bare_shorthand_not_in_call_position(spark):
    # r8 advice (high): a table sharing a name with a column must not
    # turn `max(ts)` into `max(SELECT * FROM ts)` — identifiers resolve
    # to tables only in table positions (SqlParser.java parseDml)
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    ev = load_table(spark, SF_DIR, "events")
    eng.register("trades", ev, designated_ts="ts")
    # a table literally named after common column names
    eng.register("ts", ev.limit(5))
    eng.register("value", ev.limit(5))
    r = eng.sql("SELECT max(ts) AS m, avg(value) AS a FROM trades").first()
    assert r.m is not None and r.a is not None
    # nested call positions too
    assert (
        eng.sql("SELECT count(*) AS n FROM trades WHERE abs(value) >= 0").first().n
        == ev.count()
    )
    # ...while true table positions keep the shorthand
    assert eng.sql("SELECT count(*) AS n FROM (ts)").first().n == 5
    assert eng.sql("(value) LIMIT 3").count() == 3
    # `x IN (c)` stays a value list even when c names a table
    assert (
        eng.sql("SELECT count(*) AS n FROM trades WHERE event_id IN (event_id)")
        .first()
        .n
        == ev.count()
    )
    # set-op operands inside parens stay table positions
    assert eng.sql("SELECT * FROM ((ts) UNION ALL (value))").count() == 10


def test_interval_eq_scoped_to_referenced_tables(spark):
    # r8 advice (medium): `col = '<date>'` must rewrite to a day range
    # ONLY when col is a designated ts of a table this statement
    # references — not when a string column shares the name with some
    # OTHER table's designated ts
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    ev = load_table(spark, SF_DIR, "events")
    # sensors: designated ts named "time"
    eng.register("sensors", ev.withColumnRenamed("ts", "time"), designated_ts="time")
    # readings: a STRING column named "time" holding date-like values
    readings = spark.createDataFrame(
        [("2024-01-15", 1), ("2024-01-15 00:30:00", 2), ("2024-01-16", 3)],
        "time string, v int",
    )
    eng.register("readings", readings)
    # string equality must stay equality (1 exact match, not the whole day)
    assert (
        eng.sql("SELECT count(*) AS n FROM readings WHERE time = '2024-01-15'")
        .first()
        .n
        == 1
    )
    # the intrinsic still fires on the actual designated ts
    n_day = eng.sql(
        "SELECT count(*) AS n FROM sensors WHERE time = '2024-01-15'"
    ).first().n
    n_in = eng.sql(
        "SELECT count(*) AS n FROM sensors WHERE time IN '2024-01-15'"
    ).first().n
    assert n_day == n_in > 1


def test_dialect_subquery_views_dropped(spark):
    # r8 advice (low): `__qdb_sub_N` temp views are statement-scoped
    from questdb_spark.sqlfront.engine import QdbEngine

    eng = QdbEngine(spark)
    ev = load_table(spark, SF_DIR, "events")
    eng.register("ev9", ev, designated_ts="ts")
    df = eng.sql(
        "SELECT count(*) AS n FROM ev9 WHERE event_id IN "
        "(SELECT event_id FROM ev9 LATEST ON ts PARTITION BY user_id)"
    )
    leftover = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("__qdb_sub_")
    ]
    assert leftover == []
    # the returned DataFrame stays executable after the views are gone
    assert df.first().n > 0
