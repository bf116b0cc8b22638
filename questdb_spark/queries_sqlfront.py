"""Registry queries routed through the QuestDB-dialect SQL front-end
(``QdbEngine.sql``) instead of hand-built DataFrames, so the parser +
lowering layer itself is oracle-verified by the driver.

Each query here is the SQL-text twin of an operator elsewhere in the
registry; the DuckDB oracle is written independently in ANSI SQL. Covers
the dialect surface of ``griffin/SqlParser.java``: SAMPLE BY (:4284,
calendar and FIRST OBSERVATION alignment), LATEST ON (:4246), ASOF JOIN
(:5069), WINDOW JOIN (:4754), HORIZON JOIN (:4895), PIVOT (:4260),
DECLARE (:3604), negative LIMIT, multi-join FROM clauses and subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.parquet import load_table
from .sqlfront.engine import QdbEngine

_MASTER_SQL = """
SELECT event_id, user_id, ts, value AS click_value FROM events WHERE event_type = 'click'
"""
_SLAVE_SQL = """
SELECT user_id, ts, FIRST(value ORDER BY event_id DESC) AS purchase_value
FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
"""


def _engine(spark: SparkSession, sf: str, tables: dict[str, str]) -> QdbEngine:
    """QdbEngine with the named parquet tables registered
    (table → designated timestamp column, '' for none)."""
    eng = QdbEngine(spark)
    for t, ts_col in tables.items():
        eng.register(
            t,
            load_table(spark, sf, t),
            designated_ts=ts_col or None,
            # LATEST ON tie-break: QuestDB resolves equal timestamps by
            # physical row order; event_id is this table's total order
            tiebreak="event_id" if t == "events" else None,
        )
    return eng


def _register_streams(eng: QdbEngine, spark: SparkSession, sf: str) -> None:
    """clicks (master) / purchases (slave, deduped per (user_id, ts)) —
    same carve-out as ``queries_timeseries._master_slave``."""
    ev = load_table(spark, sf, "events")
    master = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    slave = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by(F.col("value"), F.col("event_id")).alias("purchase_value"))
    )
    eng.register("clicks", master, designated_ts="ts")
    eng.register("purchases", slave, designated_ts="ts")


# --------------------------------------------------------------------------
# SAMPLE BY through SQL text
# --------------------------------------------------------------------------

def sql_matview(spark: SparkSession, sf: str) -> DataFrame:
    """CREATE MATERIALIZED VIEW + incremental REFRESH + read-back
    (SqlCompilerImpl.java:3338 CREATE_MAT_VIEW dispatch,
    cairo/mv/MatViewRefreshJob.java:77 interval refresh). The view is built
    over the first ~2/3 of events, the rest is appended, and an INCREMENTAL
    refresh brings it current — so the oracle equality proves the
    bucket-merge path, not just create."""
    eng = _engine(spark, sf, {})
    ev = load_table(spark, sf, "events")
    # fixed cut ≈ 2/3 of the events span (2024-01-01..31). The oracle
    # recomputes over ALL events, so the cut only shapes the incremental
    # scenario — a literal avoids a driver-side percentile collect inside
    # the benched path (VERDICT r3 finding 5)
    eng.register(
        "ev_head",
        ev.filter(F.col("ts") < F.lit("2024-01-21").cast("timestamp")),
        designated_ts="ts",
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_hourly AS ("
        "SELECT ts, event_type, "
        "cast(cast(sum(cast(value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_value, "
        "count(*) AS n "
        "FROM ev_head SAMPLE BY 1h)"
    )
    eng.register("ev_head", ev, designated_ts="ts")  # append the tail
    eng.sql("REFRESH MATERIALIZED VIEW mv_hourly INCREMENTAL")
    return eng.sql("SELECT * FROM mv_hourly")


SQL_MATVIEW_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts, event_type,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def sql_sample_by(spark: SparkSession, sf: str) -> DataFrame:
    """``SAMPLE BY 1h`` parsed from SQL text (SqlParser.java:4284)."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT ts, event_type, "
        "cast(cast(sum(cast(value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_value, "
        "count(*) AS n "
        "FROM events SAMPLE BY 1h"
    )


SQL_SAMPLE_BY_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts, event_type,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def sql_sample_by_having(spark: SparkSession, sf: str) -> DataFrame:
    """``SAMPLE BY ... HAVING`` — post-aggregate filter in the dialect
    parser (round-2 advice: HAVING previously misparsed in dialect
    queries; ANSI HAVING semantics, applied after the bucket aggregate)."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT ts, event_type, count(*) AS n "
        "FROM events SAMPLE BY 2h HAVING count(*) > 8"
    )


SQL_SAMPLE_BY_HAVING_SQL = """
SELECT time_bucket(INTERVAL 2 HOUR, ts) AS ts, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2 HAVING COUNT(*) > 8
"""


def sql_sample_by_first_obs(spark: SparkSession, sf: str) -> DataFrame:
    """``SAMPLE BY 90m ALIGN TO FIRST OBSERVATION`` from SQL text
    (SqlParser.java:4284-4366)."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.register(
        "clicks_all",
        load_table(spark, sf, "events").filter(F.col("event_type") == "click"),
        designated_ts="ts",
    )
    return eng.sql(
        "SELECT ts, count(*) AS n, max(value) AS max_value "
        "FROM clicks_all SAMPLE BY 90m ALIGN TO FIRST OBSERVATION"
    )


SQL_SAMPLE_BY_FIRST_OBS_SQL = """
WITH e AS (SELECT * FROM events WHERE event_type = 'click'),
o AS (SELECT MIN(ts) AS origin FROM e)
SELECT
  o.origin + to_microseconds(
    CAST(FLOOR(date_diff('microsecond', o.origin, e.ts) / 5400000000) * 5400000000 AS BIGINT)
  ) AS ts,
  COUNT(*) AS n, MAX(e.value) AS max_value
FROM e, o GROUP BY 1
"""


# --------------------------------------------------------------------------
# LATEST ON / negative LIMIT / DECLARE
# --------------------------------------------------------------------------

def sql_latest_on(spark: SparkSession, sf: str) -> DataFrame:
    """``LATEST ON ts PARTITION BY user_id, event_type`` from SQL text
    (SqlParser.java:4246)."""
    eng = _engine(spark, sf, {"events": "ts"})
    df = eng.sql("SELECT * FROM events LATEST ON ts PARTITION BY user_id, event_type")
    return df.select("user_id", "event_type", "event_id", "ts", "value")


SQL_LATEST_ON_SQL = """
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def sql_declare_neg_limit(spark: SparkSession, sf: str) -> DataFrame:
    """``DECLARE @et := 'click', @n := 25 SELECT ... LIMIT -@n`` — variable
    bindings (SqlParser.java:3604) + negative-limit tail rewrite."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "DECLARE @et := 'click', @n := 25 "
        "SELECT event_id, ts, value FROM events WHERE event_type = @et LIMIT -@n"
    )


SQL_DECLARE_NEG_LIMIT_SQL = """
SELECT event_id, ts, value FROM events WHERE event_type = 'click'
ORDER BY ts DESC LIMIT 25
"""


# --------------------------------------------------------------------------
# Time-series joins through SQL text
# --------------------------------------------------------------------------

def sql_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """``ASOF JOIN ... ON (user_id)`` from SQL text (SqlParser.java:5069)."""
    eng = _engine(spark, sf, {})
    _register_streams(eng, spark, sf)
    df = eng.sql("SELECT * FROM clicks ASOF JOIN purchases ON (user_id)")
    return df.select(
        "event_id", "user_id", "ts", "click_value",
        F.col("slave_ts").alias("purchase_ts"), "purchase_value",
    )


SQL_ASOF_JOIN_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL})
SELECT m.event_id, m.user_id, m.ts, m.click_value,
  (SELECT s.ts FROM s WHERE s.user_id = m.user_id AND s.ts <= m.ts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_ts,
  (SELECT s.purchase_value FROM s WHERE s.user_id = m.user_id AND s.ts <= m.ts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_value
FROM m
"""


def sql_window_join(spark: SparkSession, sf: str) -> DataFrame:
    """``WINDOW JOIN ... RANGE BETWEEN 1 hour PRECEDING AND 1 hour
    FOLLOWING EXCLUDE PREVAILING`` from SQL text (SqlParser.java:4754;
    EXCLUDE is explicit because the reference defaults to INCLUDE
    PREVAILING, WindowJoinContext.java:39)."""
    eng = _engine(spark, sf, {})
    _register_streams(eng, spark, sf)
    return eng.sql(
        "SELECT event_id, user_id, ts, click_value, "
        "count(p.purchase_value) AS n_purchases, "
        "cast(cast(sum(cast(p.purchase_value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_purchases "
        "FROM clicks WINDOW JOIN purchases p ON (user_id) "
        "RANGE BETWEEN 1 hour PRECEDING AND 1 hour FOLLOWING EXCLUDE PREVAILING"
    )


SQL_WINDOW_JOIN_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL})
SELECT m.event_id, m.user_id, m.ts, m.click_value,
  COUNT(s.purchase_value) AS n_purchases,
  CAST(CAST(SUM(CAST(s.purchase_value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_purchases
FROM m LEFT JOIN s ON s.user_id = m.user_id
  AND s.ts >= m.ts - INTERVAL 1 HOUR AND s.ts <= m.ts + INTERVAL 1 HOUR
GROUP BY m.event_id, m.user_id, m.ts, m.click_value
"""


def sql_window_join_dynamic(spark: SparkSession, sf: str) -> DataFrame:
    """WINDOW JOIN with DYNAMIC per-row bounds (r5;
    ``WindowJoinTest.testDynamicWindow*`` — the plan's ``window lo:
    dynamic`` path): the look-back stretches per master row with
    ``user_id % 3 + 1`` minutes while the look-ahead stays constant. The
    bucketed lowering keeps its scale shape by sizing buckets to the
    MAXIMUM window width (one scalar plan-time aggregate)."""
    eng = _engine(spark, sf, {})
    _register_streams(eng, spark, sf)
    return eng.sql(
        "SELECT event_id, user_id, ts, click_value, "
        "count(p.purchase_value) AS n_purchases, "
        "cast(cast(sum(cast(p.purchase_value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_purchases "
        "FROM clicks WINDOW JOIN purchases p ON (user_id) "
        "RANGE BETWEEN (user_id % 3 + 1) * 20 minutes PRECEDING "
        "AND 10 minutes FOLLOWING EXCLUDE PREVAILING"
    )


SQL_WINDOW_JOIN_DYNAMIC_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL})
SELECT m.event_id, m.user_id, m.ts, m.click_value,
  COUNT(s.purchase_value) AS n_purchases,
  CAST(CAST(SUM(CAST(s.purchase_value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_purchases
FROM m LEFT JOIN s ON s.user_id = m.user_id
  AND s.ts >= m.ts - (m.user_id % 3 + 1) * 20 * INTERVAL 1 MINUTE
  AND s.ts <= m.ts + INTERVAL 10 MINUTE
GROUP BY m.event_id, m.user_id, m.ts, m.click_value
"""


def sql_window_join_prevailing(spark: SparkSession, sf: str) -> DataFrame:
    """``WINDOW JOIN ... INCLUDE PREVAILING`` (SqlParser.java:4967,
    WindowJoinContext.java:39 — the reference DEFAULT): besides the slave
    rows inside [ts-30m, ts+30m], the latest key-matching slave row BEFORE
    the window start joins the aggregate
    (AsyncWindowJoinRecordCursorFactory.findPrevailingForMasterRow)."""
    eng = _engine(spark, sf, {})
    _register_streams(eng, spark, sf)
    return eng.sql(
        "SELECT event_id, user_id, ts, click_value, "
        "count(p.purchase_value) AS n_purchases, "
        "cast(cast(sum(cast(p.purchase_value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_purchases "
        "FROM clicks WINDOW JOIN purchases p ON (user_id) "
        "RANGE BETWEEN 30 minute PRECEDING AND 30 minute FOLLOWING INCLUDE PREVAILING"
    )


# prevailing emulation: per-master MAX(s.ts) strictly before window start,
# UNION ALL'd into the in-window pair stream before the shared aggregate
SQL_WINDOW_JOIN_PREVAILING_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL}),
prev AS (
  SELECT m.event_id AS mid, MAX(s.ts) AS pts
  FROM m JOIN s ON s.user_id = m.user_id AND s.ts < m.ts - INTERVAL 30 MINUTE
  GROUP BY m.event_id
),
pairs AS (
  SELECT m.event_id, m.user_id, m.ts, m.click_value, s.purchase_value
  FROM m LEFT JOIN s ON s.user_id = m.user_id
    AND s.ts >= m.ts - INTERVAL 30 MINUTE AND s.ts <= m.ts + INTERVAL 30 MINUTE
  UNION ALL
  SELECT m.event_id, m.user_id, m.ts, m.click_value, s.purchase_value
  FROM m
  JOIN prev ON prev.mid = m.event_id
  JOIN s ON s.user_id = m.user_id AND s.ts = prev.pts
)
SELECT event_id, user_id, ts, click_value,
  COUNT(purchase_value) AS n_purchases,
  CAST(CAST(SUM(CAST(purchase_value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_purchases
FROM pairs GROUP BY event_id, user_id, ts, click_value
"""


def sql_horizon_markout(spark: SparkSession, sf: str) -> DataFrame:
    """``HORIZON JOIN ... RANGE FROM 0s TO 30m STEP 10m AS h GROUP BY
    h.offset`` — markout aggregate form from SQL text
    (SqlParser.java:4895, MarkoutHorizonRecordCursorFactory.java:95)."""
    eng = _engine(spark, sf, {})
    _register_streams(eng, spark, sf)
    ev = load_table(spark, sf, "events")
    eng.register(
        "signups",
        ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts"),
        designated_ts="ts",
    )
    return eng.sql(
        "SELECT h.offset, count(*) AS n_masters, count(p.ts) AS n_matched "
        "FROM signups HORIZON JOIN purchases p ON (user_id) "
        "RANGE FROM 0s TO 30m STEP 10m AS h GROUP BY h.offset"
    )


SQL_HORIZON_MARKOUT_SQL = f"""
WITH m0 AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
s AS ({_SLAVE_SQL}),
m AS (
  SELECT m0.*, CAST(o."offset" AS BIGINT) AS "offset",
    m0.ts + to_microseconds(o."offset") AS hts
  FROM m0 CROSS JOIN (VALUES (0), (600000000), (1200000000), (1800000000)) AS o("offset")
)
SELECT m."offset", COUNT(*) AS n_masters,
  COUNT((SELECT s.ts FROM s WHERE s.user_id = m.user_id AND s.ts <= m.hts
         ORDER BY s.ts DESC LIMIT 1)) AS n_matched
FROM m GROUP BY 1
"""


# --------------------------------------------------------------------------
# Multi-join / subquery / PIVOT
# --------------------------------------------------------------------------

def sql_multi_join_sample_by(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI ``JOIN`` inside a dialect query: orders x customer, filtered,
    daily SAMPLE BY — multi-join FROM clauses in the clause parser."""
    eng = _engine(spark, sf, {"orders": "o_orderdate", "customer": ""})
    return eng.sql(
        "SELECT o_orderdate, count(*) AS n, "
        "cast(cast(sum(cast(o_totalprice AS decimal(14,2))) AS decimal(24,2)) AS double) AS rev "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_mktsegment = 'BUILDING' SAMPLE BY 1d"
    )


SQL_MULTI_JOIN_SQL = """
SELECT time_bucket(INTERVAL 1 DAY, CAST(o.o_orderdate AS TIMESTAMP)) AS o_orderdate,
  COUNT(*) AS n,
  CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DECIMAL(24,2)) AS DOUBLE) AS rev
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1
"""


def sql_ddl_dml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """The DDL/DML statement lifecycle under the driver oracle
    (SqlCompilerImpl.java:3281 dispatch): CREATE TABLE AS over events,
    INSERT SELECT appends, UPDATE rewrites touched partitions, ALTER ADD
    COLUMN overlays metadata — then a SAMPLE BY readback. The oracle
    recomputes the post-mutation state relationally, so any statement
    corrupting storage breaks the hash."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.sql(
        "CREATE TABLE tx AS (SELECT event_id, ts, user_id, value FROM events "
        "WHERE event_type = 'click') TIMESTAMP(ts) PARTITION BY DAY"
    )
    eng.sql(
        "INSERT INTO tx SELECT event_id + 1000000 AS event_id, ts, user_id, "
        "value * 2 AS value FROM events WHERE event_type = 'purchase'"
    )
    eng.sql("UPDATE tx SET value = value + 100 WHERE value < 10")
    eng.sql("ALTER TABLE tx ADD COLUMN note STRING")
    # detach/attach round-trip (AlterOperation DETACH/ATTACH_PARTITION):
    # Jan-05 must come back bit-identical; Jan-06 stays archived and must
    # be invisible to the readback (the oracle filters it out relationally)
    eng.sql("ALTER TABLE tx DETACH PARTITION LIST '2024-01-05'")
    eng.sql("ALTER TABLE tx ATTACH PARTITION LIST '2024-01-05'")
    eng.sql("ALTER TABLE tx DETACH PARTITION LIST '2024-01-06'")
    return eng.sql(
        "SELECT ts, count(*) AS n, "
        "cast(cast(sum(cast(value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_value, "
        "count(note) AS n_notes "
        "FROM tx SAMPLE BY 1d"
    )


SQL_DDL_DML_SQL = """
WITH tx AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_id + 1000000, ts, user_id, value * 2 FROM events WHERE event_type = 'purchase'
),
upd AS (
  SELECT ts, CASE WHEN value < 10 THEN value + 100 ELSE value END AS value,
         CAST(NULL AS VARCHAR) AS note
  FROM tx
)
SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts, COUNT(*) AS n,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value,
  COUNT(note) AS n_notes
FROM upd
WHERE time_bucket(INTERVAL 1 DAY, ts) != TIMESTAMP '2024-01-06'
GROUP BY 1
"""


def sql_dedup_upsert_sample_by(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP UPSERT KEYS end-to-end under the driver oracle
    (``SqlParser.java:3081``, ``dedup.cpp``; scenario family
    ``sqllogictest/test/dedup/``): CREATE with dedup keys, a second
    commit that overlaps half the key space (those rows must take the
    NEW values in place — last-write-wins) and extends it (appended),
    then a SAMPLE BY readback over the merged state.  Sources are
    pre-aggregated per key so the winning value is deterministic for
    the oracle."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.sql(
        "CREATE TABLE ddup AS (SELECT ts, user_id, max(value) AS value "
        "FROM events WHERE event_type = 'click' GROUP BY ts, user_id) "
        "TIMESTAMP(ts) PARTITION BY DAY WAL DEDUP UPSERT KEYS(ts, user_id)"
    )
    eng.sql(
        "INSERT INTO ddup SELECT ts, user_id, max(value) * 2 AS value "
        "FROM events WHERE event_type IN ('click', 'view') AND value < 50 "
        "GROUP BY ts, user_id"
    )
    return eng.sql(
        "SELECT ts, count(*) AS n, "
        "cast(cast(sum(cast(value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_value "
        "FROM ddup SAMPLE BY 1d"
    )


SQL_DEDUP_UPSERT_SQL = """
WITH base AS (
  SELECT ts, user_id, max(value) AS value FROM events
  WHERE event_type = 'click' GROUP BY ts, user_id
),
inc AS (
  SELECT ts, user_id, max(value) * 2 AS value FROM events
  WHERE event_type IN ('click', 'view') AND value < 50 GROUP BY ts, user_id
),
merged AS (
  SELECT b.ts, b.user_id, COALESCE(i.value, b.value) AS value
  FROM base b LEFT JOIN inc i ON b.ts = i.ts AND b.user_id = i.user_id
  UNION ALL
  SELECT i.ts, i.user_id, i.value FROM inc i
  WHERE NOT EXISTS (
    SELECT 1 FROM base b WHERE b.ts = i.ts AND b.user_id = i.user_id
  )
)
SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts, COUNT(*) AS n,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value
FROM merged GROUP BY 1
"""


def sql_live_view_latest(spark: SparkSession, sf: str) -> DataFrame:
    """General live view (``cairo/lv/``, r5): a LATEST ON query as a
    checkpointed LIVE VIEW — created, then the base receives a second
    commit that advances a third of the keys; reading the view triggers
    the incremental per-key state merge (refresh-on-read,
    REFRESH_TYPE_IMMEDIATE's batch analogue). The oracle recomputes the
    final latest-per-key state relationally."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.sql(
        "CREATE TABLE lvbase AS (SELECT ts, user_id, value FROM events "
        "WHERE event_type = 'click') TIMESTAMP(ts) PARTITION BY DAY"
    )
    eng.sql(
        "CREATE LIVE VIEW lvq AS (SELECT ts, user_id, value FROM lvbase "
        "LATEST ON ts PARTITION BY user_id)"
    )
    eng.sql(
        "INSERT INTO lvbase SELECT dateadd('h', 1, ts) AS ts, user_id, "
        "value * 3 AS value FROM events "
        "WHERE event_type = 'click' AND user_id % 3 = 0"
    )
    return eng.sql("SELECT user_id, ts, value FROM lvq")


SQL_LIVE_VIEW_SQL = """
WITH base0 AS (
  SELECT ts, user_id, value FROM events WHERE event_type = 'click'
),
inc AS (
  SELECT ts + INTERVAL 1 HOUR AS ts, user_id, value * 3 AS value
  FROM events WHERE event_type = 'click' AND user_id % 3 = 0
),
allr AS (SELECT * FROM base0 UNION ALL SELECT * FROM inc)
SELECT user_id, ts, value FROM (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
  FROM allr
) WHERE rn = 1
"""


def sql_setop_sample_by(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL between two SAMPLE BY queries through the dialect
    front-end (depth-0 set-op split; each operand lowers independently)."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT ts, count(*) AS n FROM events SAMPLE BY 1d "
        "UNION ALL "
        "SELECT ts, count(*) AS n FROM events SAMPLE BY 1w"
    )


# week buckets floor on the epoch-micros grid (1970-01-01 anchor) like the
# engine; DuckDB's time_bucket(INTERVAL 1 WEEK) anchors on Mondays instead
SQL_SETOP_SQL = """
SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts, COUNT(*) AS n
FROM events GROUP BY 1
UNION ALL
SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 604800000000) AS ts,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


def sql_subquery_dialect(spark: SparkSession, sf: str) -> DataFrame:
    """Dialect clause INSIDE a FROM subquery: LATEST ON per user, outer
    plain aggregation over the latest rows."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_type, count(*) AS n_users, "
        "cast(cast(sum(cast(value AS decimal(12,2))) AS decimal(20,2)) AS double) AS sum_latest "
        "FROM (SELECT * FROM events LATEST ON ts PARTITION BY user_id) "
        "GROUP BY event_type"
    )


SQL_SUBQUERY_DIALECT_SQL = """
WITH latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT event_type, COUNT(*) AS n_users,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_latest
FROM latest GROUP BY event_type
"""


def sql_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """``PIVOT (agg FOR col IN (...))`` (SqlParser.java:4260) — Spark SQL
    PIVOT is a direct passthrough; counts per user bucketed by type."""
    eng = _engine(spark, sf, {"events": "ts"})
    df = eng.sql(
        "SELECT * FROM (SELECT event_type, user_id FROM events) "
        "PIVOT (count(event_type) FOR event_type IN "
        "('click', 'purchase', 'signup', 'logout', 'view'))"
    )
    return df.select(
        "user_id",
        F.coalesce("click", F.lit(0)).alias("n_click"),
        F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
        F.coalesce("signup", F.lit(0)).alias("n_signup"),
        F.coalesce("logout", F.lit(0)).alias("n_logout"),
        F.coalesce("view", F.lit(0)).alias("n_view"),
    )


SQL_PIVOT_SQL = """
SELECT user_id,
  COUNT(*) FILTER (event_type = 'click') AS n_click,
  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (event_type = 'signup') AS n_signup,
  COUNT(*) FILTER (event_type = 'logout') AS n_logout,
  COUNT(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def sql_read_parquet(spark: SparkSession, sf: str) -> DataFrame:
    """``read_parquet('path')`` table function in the dialect
    (``griffin/engine/functions/table/ReadParquetFunctionFactory.java:50``):
    lowered onto Spark's native ``parquet.`path``` source — scan, pushdown
    and pruning are the engine's own parquet path."""
    eng = QdbEngine(spark)
    return eng.sql(
        f"SELECT o_orderpriority, count() AS n, "
        f"cast(cast(sum(cast(o_totalprice AS decimal(12,2))) AS decimal(20,2)) AS double) AS total "
        f"FROM read_parquet('{sf}/orders.parquet') "
        f"GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )


SQL_READ_PARQUET_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def sql_plain_view(spark: SparkSession, sf: str) -> DataFrame:
    """Plain (non-materialized) ``CREATE VIEW`` DDL over a dialect query
    (``griffin/model/CompileViewModel.java``; VERDICT r3 gap 4): the view
    body — a keyed SAMPLE BY — is re-lowered on every read, then aggregated
    through the view by a second query."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.sql(
        "CREATE VIEW daily_ev AS "
        "select ts, event_type, count() cnt, "
        "cast(cast(sum(cast(value as decimal(12,2))) as decimal(20,2)) as double) total "
        "from events sample by 1d"
    )
    return eng.sql(
        "SELECT event_type, max(cnt) AS max_cnt, "
        "cast(cast(sum(cast(total AS decimal(14,2))) AS decimal(22,2)) AS double) AS sum_total "
        "FROM daily_ev GROUP BY event_type ORDER BY event_type"
    )


SQL_PLAIN_VIEW_SQL = """
WITH daily_ev AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts, event_type, COUNT(*) AS cnt,
    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
)
SELECT event_type, MAX(cnt) AS max_cnt,
  CAST(CAST(SUM(CAST(total AS DECIMAL(14,2))) AS DECIMAL(22,2)) AS DOUBLE) AS sum_total
FROM daily_ev GROUP BY event_type ORDER BY event_type
"""


def sql_bind_positional(spark: SparkSession, sf: str) -> DataFrame:
    """PG-style positional bind variables ``$1 $2``
    (``griffin/engine/functions/bind/IndexedParameterLinkFunction``) bound
    through the dialect path: the markers are rewritten to literals before
    lowering, here feeding a keyed SAMPLE BY filter."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "select ts, count() as n, "
        "cast(cast(sum(cast(value as decimal(12,2))) as decimal(20,2)) as double) as total "
        "from events where event_type = $1 and value >= $2 sample by 1d",
        ["click", 1.5],
    )


SQL_BIND_POSITIONAL_SQL = """
SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts, COUNT(*) AS n,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS total
FROM events WHERE event_type = 'click' AND value >= 1.5
GROUP BY 1 ORDER BY 1
"""


def sql_query_activity(spark: SparkSession, sf: str) -> DataFrame:
    """Query registry + CANCEL QUERY (griffin/QueryRegistry.java,
    functions/activity/QueryActivityFunctionFactory): a 4-statement
    session — plain query, second query (completes the first), CANCEL of
    the still-active second, then a query_activity() read. States are
    deterministic because the registry is driven purely by the statement
    sequence (timestamps are deliberately not exposed)."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.sql("SELECT count(*) AS n FROM events")
    eng.sql("SELECT user_id, max(value) AS mx FROM events GROUP BY user_id")
    eng.sql("CANCEL QUERY 2")
    return eng.sql(
        "SELECT query_id, query, state FROM query_activity() ORDER BY query_id"
    )


SQL_QUERY_ACTIVITY_SQL = """
SELECT * FROM (VALUES
  (1::BIGINT, 'SELECT count(*) AS n FROM events', 'completed'),
  (2::BIGINT, 'SELECT user_id, max(value) AS mx FROM events GROUP BY user_id',
   'cancelled'),
  (3::BIGINT, 'CANCEL QUERY 2', 'active'),
  (4::BIGINT,
   'SELECT query_id, query, state FROM query_activity() ORDER BY query_id',
   'active')
) AS t(query_id, query, state)
ORDER BY query_id
"""


def sql_wal_suspend_resume(spark: SparkSession, sf: str) -> DataFrame:
    """WAL suspend/resume lifecycle (alterTableSuspend/alterTableResume,
    TableSequencerAPI; AlterOperation SUSPEND/RESUME): CREATE + base
    data; SUSPEND WAL; two INSERT commits that park in the pending queue
    (reads must keep serving the pre-suspend state — the mid-suspend
    count/sum/flag are captured live and embedded, so a leak breaks the
    hash); RESUME WAL FROM TXN 2 discards the first parked txn (the
    poisoned commit) and applies the second; the final row reads the
    merged table back through SQL. The oracle recomputes every number
    from `events` directly."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.sql(
        "CREATE TABLE walt AS (SELECT ts, user_id, value FROM events "
        "WHERE event_type = 'click' AND user_id % 4 = 0) "
        "TIMESTAMP(ts) PARTITION BY DAY WAL"
    )
    eng.sql("ALTER TABLE walt SUSPEND WAL")
    # txn 1: parked, later skipped (values shifted +1000 would poison sums)
    eng.sql(
        "INSERT INTO walt SELECT ts, user_id, value + 1000 AS value FROM events "
        "WHERE event_type = 'view' AND user_id % 4 = 1"
    )
    # txn 2: parked, later applied
    eng.sql(
        "INSERT INTO walt SELECT ts, user_id, value FROM events "
        "WHERE event_type = 'click' AND user_id % 4 = 2"
    )
    mid = eng.sql(
        "SELECT count(*) AS n, "
        "cast(sum(cast(value AS decimal(12,2))) AS decimal(20,2)) AS s FROM walt"
    ).collect()[0]
    susp_mid = eng.sql(
        "SELECT suspended FROM tables() WHERE table_name = 'walt'"
    ).collect()[0][0]
    eng.sql("ALTER TABLE walt RESUME WAL FROM TXN 2")
    susp_fin = eng.sql(
        "SELECT suspended FROM tables() WHERE table_name = 'walt'"
    ).collect()[0][0]
    return eng.sql(
        f"SELECT 'mid_suspend' AS stage, CAST({mid['n']} AS BIGINT) AS n_visible, "
        f"CAST(CAST('{mid['s']}' AS DECIMAL(20,2)) AS DOUBLE) AS sum_value, "
        f"{str(bool(susp_mid)).lower()} AS suspended "
        "UNION ALL "
        "SELECT 'final' AS stage, count(*) AS n_visible, "
        "CAST(cast(sum(cast(value AS decimal(12,2))) AS decimal(20,2)) AS DOUBLE) "
        f"AS sum_value, {str(bool(susp_fin)).lower()} AS suspended FROM walt "
        "ORDER BY stage"
    )


SQL_WAL_SUSPEND_RESUME_SQL = """
WITH base AS (
  SELECT value FROM events WHERE event_type = 'click' AND user_id % 4 = 0
),
t2 AS (
  SELECT value FROM events WHERE event_type = 'click' AND user_id % 4 = 2
)
SELECT * FROM (
  SELECT 'mid_suspend' AS stage,
    (SELECT count(*) FROM base) AS n_visible,
    CAST((SELECT CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) FROM base)
      AS DOUBLE) AS sum_value,
    true AS suspended
  UNION ALL
  SELECT 'final',
    (SELECT count(*) FROM base) + (SELECT count(*) FROM t2),
    CAST((SELECT CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2))
          FROM (SELECT value FROM base UNION ALL SELECT value FROM t2)) AS DOUBLE),
    false
) ORDER BY stage
"""


def sql_geo_date_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """geo/ + date/ + encoding scalar families through the dialect parser
    (GeoDistanceMetersFunctionFactory equirectangular 111320 m/deg with
    midpoint-latitude cos; WithinBox/WithinRadius/GeoWithinRadiusLatLon
    inclusive predicates; IsLeapYear/DaysPerMonth; Base64/Sha1/Sha256 over
    binary; str/ToCharBinFunctionFactory hex dump of BINARY — 16 bytes
    per line, 8-hex-digit offset prefix, Chars.java:1334 toSink format —
    exercised single- and multi-line on a deterministic 1-in-8 row subset:
    the dump is the query's only regexp-per-row expression and the subset
    keeps its cost bounded without narrowing the surface). Lat/lon are
    derived deterministically from events columns; distances round through
    DECIMAL(18,4) so a last-ulp libm divergence between engines cannot
    flip the hash."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_id, "
        "cast(cast(geo_distance_meters(lat, lon, 48.2, 16.37) AS DECIMAL(18,4)) AS DOUBLE) AS dist_m, "
        "within_box(lon, lat, 10.0, 40.0, 20.0, 50.0) AS in_box, "
        "within_radius(lon, lat, 16.0, 48.0, 5.0) AS in_radius, "
        "geo_within_radius_latlon(lat, lon, 48.2, 16.37, 500000.0) AS in_geo_radius, "
        "is_leap_year(ts) AS leap, "
        "days_in_month(ts) AS dim, "
        "base64(sha256(event_type), 8) AS b64_8, "
        "cast(base64_decode(base64(event_type)) AS STRING) AS roundtrip, "
        "sha1(event_type) AS h1, "
        "CASE WHEN event_id % 8 = 0 THEN "
        "to_char(base64_decode(base64(event_type))) END AS bin_dump, "
        "CASE WHEN event_id % 8 = 0 THEN "
        "to_char(base64_decode(base64(concat(event_type, ':', event_type, "
        "':', event_type, ':', event_type)))) END AS bin_dump_multi "
        "FROM (SELECT event_id, ts, event_type, "
        "  cast(user_id % 90 AS DOUBLE) AS lat, "
        "  cast(event_id % 180 AS DOUBLE) - 90.0 AS lon FROM events)"
    )


def _sha1_case_sql(values: list[str]) -> str:
    """DuckDB ships no sha1 — hash the (fixed) event_type domain with
    Python hashlib instead, which keeps the oracle INDEPENDENT of the
    JVM's sha1 rather than skipping the column."""
    import hashlib

    arms = " ".join(
        f"WHEN event_type = '{v}' THEN '{hashlib.sha1(v.encode()).hexdigest()}'"
        for v in values
    )
    return f"(CASE {arms} END)"


def _hexdump(bs: bytes) -> str:
    """Reference to_char(bin) format (std/Chars.java:1334 toSink): 16
    bytes per line, 8-hex-digit offset prefix, ' xx' per byte."""
    return "\n".join(
        f"{off:08x}" + "".join(f" {b:02x}" for b in bs[off : off + 16])
        for off in range(0, len(bs), 16)
    )


def _hexdump_case_sql(values: list[str], expr) -> str:
    """Independent oracle for to_char(bin): the (fixed) event_type domain
    hex-dumped by Python, newlines spliced via chr(10)."""
    arms = " ".join(
        "WHEN event_type = '{v}' THEN '{d}'".format(
            v=v, d=_hexdump(expr(v).encode()).replace("\n", "' || chr(10) || '")
        )
        for v in values
    )
    return f"(CASE {arms} END)"


SQL_GEO_DATE_ENCODING_SQL = """
WITH b AS (
  SELECT event_id, ts, event_type,
    CAST(user_id % 90 AS DOUBLE) AS lat,
    CAST(event_id % 180 AS DOUBLE) - 90.0 AS lon
  FROM events
)
SELECT event_id,
  CAST(CAST(SQRT(POW((16.37 - lon) * 111320.0 * COS(RADIANS((lat + 48.2) * 0.5)), 2)
       + POW((48.2 - lat) * 111320.0, 2)) AS DECIMAL(18,4)) AS DOUBLE) AS dist_m,
  (10.0 <= 20.0 AND 40.0 <= 50.0
   AND lon BETWEEN 10.0 AND 20.0 AND lat BETWEEN 40.0 AND 50.0) AS in_box,
  (POW(lon - 16.0, 2) + POW(lat - 48.0, 2) <= POW(5.0, 2)) AS in_radius,
  (POW((lon - 16.37) * 111320.0 * COS(RADIANS(48.2)), 2)
   + POW((lat - 48.2) * 111320.0, 2) <= POW(500000.0, 2)) AS in_geo_radius,
  (year(ts) % 4 = 0 AND (year(ts) % 100 != 0 OR year(ts) % 400 = 0)) AS leap,
  CAST(day(last_day(ts)) AS INT) AS dim,
  to_base64(ENCODE(substring(sha256(event_type), 1, 8))) AS b64_8,
  event_type AS roundtrip,
  __SHA1_CASE__ AS h1,
  CASE WHEN event_id % 8 = 0 THEN __DUMP1__ END AS bin_dump,
  CASE WHEN event_id % 8 = 0 THEN __DUMP4__ END AS bin_dump_multi
FROM b
""".replace(
    "__SHA1_CASE__", _sha1_case_sql(["click", "error", "purchase", "signup", "view"])
).replace(
    "__DUMP1__",
    _hexdump_case_sql(
        ["click", "error", "purchase", "signup", "view"], lambda v: v
    ),
).replace(
    "__DUMP4__",
    _hexdump_case_sql(
        ["click", "error", "purchase", "signup", "view"],
        lambda v: ":".join([v] * 4),
    ),
)


def sql_scalar_batch2(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar long-tail batch 2 through the dialect parser: finance trio
    (FinanceUtils mid/spread, WeightedMidPriceFunctionFactory wmid),
    day_of_week Mon=1 / day_of_week_sunday_first Sun=1, is_end_of_month,
    millis/micros/nanos components (MillisOfSecondFunctionFactory,
    MicrosOfMillsFunctionFactory, NanosOfMicrosFunctionFactory — floor-mod
    0-999 incl. pre-1970 timestamps; nanos over the int64 nano shadow),
    position (1-based, 0-absent), and to_uuid/to_long256 canonical
    lowercase-hex builders (LongsToUuid/LongsToLong256FunctionFactory)."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_id, "
        "mid(bid, ask) AS mid_px, "
        "spread(bid, ask) AS spr, "
        "wmid(bsz, bid, ask, asz) AS wmid_px, "
        "day_of_week(ts2) AS dow, "
        "day_of_week_sunday_first(ts2) AS dow_sun, "
        "is_end_of_month(ts2) AS eom, "
        "millis(ts2) AS ms, "
        "micros(ts2) AS us, "
        "millis(ts_neg) AS ms_neg, "
        "micros(ts_neg) AS us_neg, "
        "nanos(unix_micros(ts2) * 1000 + event_id % 1000) AS ns, "
        "nanos(0 - (event_id % 1000) - 1) AS ns_neg, "
        "position(event_type, 'ic') AS pos, "
        "to_uuid(event_id, user_id) AS uid, "
        "to_long256(event_id, user_id, 7, 0) AS l256 "
        "FROM (SELECT event_id, user_id, event_type, "
        "  timestamp_micros(unix_micros(ts) + event_id % 1000000) AS ts2, "
        "  timestamp_micros(unix_micros(ts) + event_id % 1000000 "
        "    - 3470000000000000) AS ts_neg, "
        "  value AS bid, value + 1.5 AS ask, "
        "  cast(user_id % 50 + 1 AS DOUBLE) AS bsz, "
        "  cast(event_id % 30 + 1 AS DOUBLE) AS asz FROM events)"
    )


SQL_SCALAR_BATCH2_SQL = """
WITH b AS (
  SELECT event_id, user_id, event_type,
    ts + to_microseconds(event_id % 1000000) AS ts2,
    ts + to_microseconds(event_id % 1000000 - 3470000000000000) AS ts_neg,
    value AS bid, value + 1.5 AS ask,
    CAST(user_id % 50 + 1 AS DOUBLE) AS bsz,
    CAST(event_id % 30 + 1 AS DOUBLE) AS asz
  FROM events
)
SELECT event_id,
  (bid + ask) / 2.0 AS mid_px,
  ask - bid AS spr,
  ask * (bsz / (bsz + asz)) + bid * (1 - bsz / (bsz + asz)) AS wmid_px,
  CAST(isodow(ts2) AS INT) AS dow,
  CAST(dayofweek(ts2) + 1 AS INT) AS dow_sun,
  (day(ts2) = day(last_day(ts2))) AS eom,
  CAST((epoch_us(ts2) % 1000000) // 1000 AS INT) AS ms,
  CAST(epoch_us(ts2) % 1000 AS INT) AS us,
  -- integer // truncates toward zero in DuckDB: make the division exact
  -- first (subtract the floor-mod remainder), then floor-mod the quotient
  CAST(((((epoch_us(ts_neg) - ((epoch_us(ts_neg) % 1000 + 1000) % 1000))
      // 1000) % 1000) + 1000) % 1000 AS INT) AS ms_neg,
  CAST(((epoch_us(ts_neg) % 1000) + 1000) % 1000 AS INT) AS us_neg,
  CAST(event_id % 1000 AS INT) AS ns,
  CAST((((0 - (event_id % 1000) - 1) % 1000) + 1000) % 1000 AS INT) AS ns_neg,
  CAST(strpos(event_type, 'ic') AS INT) AS pos,
  concat_ws('-',
    substring(concat(lpad(lower(to_hex(user_id)), 16, '0'),
                     lpad(lower(to_hex(event_id)), 16, '0')), 1, 8),
    substring(concat(lpad(lower(to_hex(user_id)), 16, '0'),
                     lpad(lower(to_hex(event_id)), 16, '0')), 9, 4),
    substring(concat(lpad(lower(to_hex(user_id)), 16, '0'),
                     lpad(lower(to_hex(event_id)), 16, '0')), 13, 4),
    substring(concat(lpad(lower(to_hex(user_id)), 16, '0'),
                     lpad(lower(to_hex(event_id)), 16, '0')), 17, 4),
    substring(concat(lpad(lower(to_hex(user_id)), 16, '0'),
                     lpad(lower(to_hex(event_id)), 16, '0')), 21, 12)) AS uid,
  concat(lpad(lower(to_hex(0)), 16, '0'), lpad(lower(to_hex(7)), 16, '0'),
         lpad(lower(to_hex(user_id)), 16, '0'),
         lpad(lower(to_hex(event_id)), 16, '0')) AS l256
FROM b
"""


def sql_regex_match(spark: SparkSession, sf: str) -> DataFrame:
    """QuestDB string-match operators through the dialect parser:
    ``~`` (MatchStrFunctionFactory.java — Matcher.find substring
    semantics), ``!~`` (NotMatchStrFunctionFactory.java), and SQLite-style
    ``GLOB`` (GlobStrFunctionFactory: anchored case-sensitive match with
    ``*``/``?``/``[...]``).  The predicates run in WHERE position and in
    SELECT position (boolean projection), over documents text/source."""
    eng = _engine(spark, sf, {})
    eng.register("documents", load_table(spark, sf, "documents"))
    return eng.sql(
        "SELECT doc_id, source, "
        "text ~ 'agg.*join' AS has_agg_join, "
        "text !~ 'window' AS no_window, "
        "source GLOB 'src[0-4]?' AS src_lo "
        "FROM documents "
        "WHERE text ~ 'hash (join|value)' AND source !~ '^src9' "
        "AND source GLOB 'src*'"
    )


SQL_REGEX_MATCH_SQL = """
SELECT doc_id, source,
  regexp_matches(text, 'agg.*join') AS has_agg_join,
  NOT regexp_matches(text, 'window') AS no_window,
  source GLOB 'src[0-4]?' AS src_lo
FROM documents
WHERE regexp_matches(text, 'hash (join|value)')
  AND NOT regexp_matches(source, '^src9')
  AND source GLOB 'src*'
"""


def sql_json_unnest(spark: SparkSession, sf: str) -> DataFrame:
    """JSON UNNEST source + typed json_extract through the dialect
    (griffin/engine/join/JsonUnnestSource.java, JsonUnnestTest;
    JsonExtractTypedFunctionFactory ``json_extract(j,p)::type``).
    The payload mixes scalar, object, and null elements in one JSON array
    so the per-element scalar-vs-object detection is exercised; the WHERE
    uses a typed extraction predicate."""
    eng = _engine(spark, sf, {})
    ev = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    payload = F.concat(
        F.lit("["),
        k.cast("string"),
        F.lit(', {"val": '),
        (k * 2).cast("string"),
        F.lit("}, null]"),
    )
    eng.register(
        "ev_payload",
        ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "props", payload.alias("payload")
        ),
    )
    return eng.sql(
        "SELECT e.user_id, count(*) AS n_el, count(u.val) AS n_val, "
        "sum(u.val) AS sv, min(json_extract(e.props, '$.k')::int) AS min_k "
        "FROM ev_payload e, UNNEST(e.payload COLUMNS(val LONG)) u "
        "WHERE json_extract(e.props, '$.k')::long % 2 = 1 "
        "GROUP BY e.user_id"
    )


SQL_JSON_UNNEST_SQL = """
WITH e AS (
  SELECT event_id, user_id,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events WHERE event_type = 'click'
), u AS (
  SELECT user_id, k, k AS val FROM e
  UNION ALL SELECT user_id, k, 2 * k FROM e
  UNION ALL SELECT user_id, k, NULL FROM e
)
SELECT user_id, count(*) AS n_el, count(val) AS n_val,
  CAST(sum(val) AS BIGINT) AS sv, CAST(min(k) AS INT) AS min_k
FROM u WHERE k % 2 = 1 GROUP BY user_id
"""


def sql_fn_surface_scalars(spark: SparkSession, sf: str) -> DataFrame:
    """Round-8 scalar-surface completion through the dialect: scaled
    rounding (math/RoundDown/RoundUp/Numbers.roundHalfEven), strpos/
    starts_with/length_bytes (str/), week_of_year + to_str (date/),
    netmask (math/IPv4StrNetmaskFunctionFactory), spread_bps (finance/),
    to_long128 (long128/LongsToLong128FunctionFactory) and
    current_setting (catalogue/). All formulas expand to engine-neutral
    double/int arithmetic, so DuckDB evaluates the identical expressions."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_id, "
        "round_down(value, 2) AS rd, round_up(value, 2) AS ru, "
        "CAST(round_half_even(CAST(event_id % 100 AS DOUBLE) / 4, 1) AS DOUBLE) AS rhe, "
        "strpos(event_type, 'ic') AS pos1, "
        "starts_with(event_type, 'cl') AS sw, "
        "length_bytes(event_type) AS lb, "
        "week_of_year(ts) AS woy, "
        "netmask(concat('10.0.0.1/', CAST(event_id % 33 AS STRING))) AS nm, "
        "spread_bps(value, value + 0.5) AS sbps, "
        "to_long128(user_id, event_id) AS l128, "
        "to_str(ts, 'yyyy-MM-dd HH') AS tstr, "
        "current_setting('server_version_num') AS csv "
        "FROM events WHERE event_id % 7 = 0"
    )


SQL_FN_SURFACE_SCALARS_SQL = """
SELECT event_id,
  CASE WHEN value IS NOT NULL THEN
    (CASE WHEN value < 0 THEN -1.0 ELSE 1.0 END)
    * FLOOR((ABS(value) + 1e-15) * POW(10, 2)) / POW(10, 2) END AS rd,
  CASE WHEN value IS NOT NULL THEN
    (CASE WHEN value < 0 THEN -1.0 ELSE 1.0 END)
    * FLOOR(ABS(value) * POW(10, 2) + 1 - 1e-15) / POW(10, 2) END AS ru,
  CAST(ROUND_EVEN(CAST(event_id % 100 AS DOUBLE) / 4, 1) AS DOUBLE) AS rhe,
  CAST(strpos(event_type, 'ic') AS INT) AS pos1,
  starts_with(event_type, 'cl') AS sw,
  CAST(octet_length(CAST(event_type AS BLOB)) AS INT) AS lb,
  CAST(weekofyear(ts) AS INT) AS woy,
  CASE WHEN (event_id % 33) BETWEEN 0 AND 32 THEN
    concat_ws('.',
      CAST((CASE WHEN event_id % 33 = 0 THEN 0
            ELSE 4294967296 - CAST(POW(2, 32 - event_id % 33) AS BIGINT) END)
           // 16777216 % 256 AS VARCHAR),
      CAST((CASE WHEN event_id % 33 = 0 THEN 0
            ELSE 4294967296 - CAST(POW(2, 32 - event_id % 33) AS BIGINT) END)
           // 65536 % 256 AS VARCHAR),
      CAST((CASE WHEN event_id % 33 = 0 THEN 0
            ELSE 4294967296 - CAST(POW(2, 32 - event_id % 33) AS BIGINT) END)
           // 256 % 256 AS VARCHAR),
      CAST((CASE WHEN event_id % 33 = 0 THEN 0
            ELSE 4294967296 - CAST(POW(2, 32 - event_id % 33) AS BIGINT) END)
           % 256 AS VARCHAR)) END AS nm,
  ((value + 0.5) - value) / ((value + (value + 0.5)) / 2.0) * 10000.0 AS sbps,
  concat(lpad(lower(to_hex(event_id)), 16, '0'),
         lpad(lower(to_hex(user_id)), 16, '0')) AS l128,
  strftime(ts, '%Y-%m-%d %H') AS tstr,
  '123000' AS csv
FROM events WHERE event_id % 7 = 0
"""


def sql_fn_surface_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """Round-8 aggregate-surface completion: arg_max/arg_min (max_by),
    count_distinct, vwap/weighted_avg/weighted_stddev (pairwise-skip),
    the skewness/kurtosis family (bare = SAMPLE, groupby/Kurtosis
    GroupByFunctionFactory extends KurtosisSample...), and twap
    (TwapGroupByFunction: duration-to-next weighting over ts order).
    Inputs are integer-valued doubles so every power/weight sum is exact
    in a double and the DuckDB oracle matches bit-for-bit."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT user_id % 8 AS g, "
        "arg_max(event_type, event_id) AS last_type, "
        "arg_min(event_type, event_id) AS first_type, "
        "CAST(count_distinct(event_type) AS INT) AS n_types, "
        "vwap(CAST(user_id % 50 AS DOUBLE), CAST(event_id % 20 + 1 AS DOUBLE)) AS vw, "
        "weighted_avg(CAST(user_id % 50 AS DOUBLE), CAST(event_id % 20 + 1 AS DOUBLE)) AS wa, "
        "weighted_stddev(CAST(user_id % 50 AS DOUBLE), CAST(event_id % 20 + 1 AS DOUBLE)) AS ws, "
        "skewness(CAST(user_id % 50 AS DOUBLE)) AS sk, "
        "skewness_pop(CAST(user_id % 50 AS DOUBLE)) AS skp, "
        "kurtosis(CAST(user_id % 50 AS DOUBLE)) AS ku, "
        "kurtosis_pop(CAST(user_id % 50 AS DOUBLE)) AS kup, "
        "twap(CAST(user_id % 50 AS DOUBLE), ts) AS tw "
        "FROM events GROUP BY user_id % 8"
    )


SQL_FN_SURFACE_AGGS_SQL = """
WITH b AS (
  SELECT user_id % 8 AS g, event_id, event_type, ts,
    CAST(user_id % 50 AS DOUBLE) AS x,
    CAST(event_id % 20 + 1 AS DOUBLE) AS w
  FROM events
),
m AS (
  SELECT g,
    arg_max(event_type, event_id) AS last_type,
    arg_min(event_type, event_id) AS first_type,
    CAST(COUNT(DISTINCT event_type) AS INT) AS n_types,
    SUM(x * w) / SUM(w) AS vw,
    SUM(x * w) / SUM(w) AS wa,
    SQRT((SUM(w * x * x) - SUM(w * x) * SUM(w * x) / SUM(w))
         / (SUM(w) - SUM(w * w) / SUM(w))) AS ws,
    CAST(COUNT(x) AS DOUBLE) AS n,
    SUM(x) AS s1, SUM(x * x) AS s2,
    SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4
  FROM b GROUP BY g
),
c AS (
  SELECT *,
    (s1 / n) AS mu,
    (s2 - s1 * (s1 / n)) AS m2,
    (s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n) * (s1 / n)) AS m3,
    (s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2
       - 3 * n * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) AS m4
  FROM m
),
tw AS (
  SELECT g, SUM(p * d) / SUM(d) AS tw FROM (
    SELECT g, x AS p,
      CAST(epoch_us(lead(ts) OVER (PARTITION BY g ORDER BY ts, x))
           - epoch_us(ts) AS DOUBLE) AS d
    FROM b
  ) WHERE d IS NOT NULL GROUP BY g
)
SELECT c.g, last_type, first_type, n_types, vw, wa, ws,
  CASE WHEN n >= 3 AND m2 > 0
    THEN (n * SQRT(n - 1.0) / (n - 2.0)) * m3 / (m2 * SQRT(m2)) END AS sk,
  CASE WHEN n >= 1 AND m2 > 0 THEN SQRT(n) * m3 / (m2 * SQRT(m2)) END AS skp,
  CASE WHEN n >= 4 AND m2 > 0
    THEN ((n - 1) / ((n - 2) * (n - 3)))
         * ((n + 1) * (n * m4 / (m2 * m2) - 3.0) + 6) END AS ku,
  CASE WHEN n >= 1 AND m2 > 0 THEN n * m4 / (m2 * m2) - 3.0 END AS kup,
  tw.tw
FROM c JOIN tw ON c.g = tw.g
"""


def sql_fn_surface_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """Round-8 array-surface completion: ARRAY[...] literals (cairo/arr
    constructor syntax), 1-based dereference (DoubleArrayAccess
    FunctionFactory — index 1 = first element), the array_elem_* N-ary
    element-wise family, matmul/transpose SQL forms, and the l2price
    scalar pair form (finance/LevelTwoPriceFunctionFactory). Derived
    columns are integer-valued so every dot product is exact."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_id, "
        "array_elem_sum(ARRAY[v1, v2], ARRAY[v3, v4])[1] AS es1, "
        "array_elem_sum(ARRAY[v1, v2], ARRAY[v3, v4])[2] AS es2, "
        "array_elem_avg(ARRAY[v1, v2], ARRAY[v3, v4])[2] AS ea2, "
        "array_elem_min(ARRAY[v1, v2], ARRAY[v3, v4])[1] AS emn, "
        "array_elem_max(ARRAY[v1, v2], ARRAY[v3, v4])[2] AS emx, "
        "matmul(ARRAY[ARRAY[v1, v2]], ARRAY[ARRAY[v3], ARRAY[v4]])[1][1] AS mm, "
        "transpose(ARRAY[ARRAY[v1, v2], ARRAY[v3, v4]])[2][1] AS t21, "
        "ARRAY[v1, v2, v3][2] AS sub2, "
        "l2price(25.0, v1 + 1.0, v3, v2 + 30.0, v4) AS l2 "
        "FROM (SELECT event_id, "
        "CAST(event_id % 13 AS DOUBLE) AS v1, CAST(user_id % 17 AS DOUBLE) AS v2, "
        "CAST(event_id % 7 + 1 AS DOUBLE) AS v3, CAST(user_id % 5 + 1 AS DOUBLE) AS v4 "
        "FROM events WHERE event_id % 11 = 0)"
    )


SQL_FN_SURFACE_ARRAYS_SQL = """
WITH b AS (
  SELECT event_id,
    CAST(event_id % 13 AS DOUBLE) AS v1, CAST(user_id % 17 AS DOUBLE) AS v2,
    CAST(event_id % 7 + 1 AS DOUBLE) AS v3, CAST(user_id % 5 + 1 AS DOUBLE) AS v4
  FROM events WHERE event_id % 11 = 0
)
SELECT event_id,
  v1 + v3 AS es1,
  v2 + v4 AS es2,
  (v2 + v4) / 2.0 AS ea2,
  LEAST(v1, v3) AS emn,
  GREATEST(v2, v4) AS emx,
  v1 * v3 + v2 * v4 AS mm,
  v2 AS t21,
  v2 AS sub2,
  CASE WHEN (v1 + 1.0) + (v2 + 30.0) >= 25.0 THEN
    (LEAST(25.0, v1 + 1.0) * v3
     + LEAST(GREATEST(25.0 - LEAST(25.0, v1 + 1.0), 0.0), v2 + 30.0) * v4)
    / 25.0 END AS l2
FROM b
"""


def sql_window_range_units(spark: SparkSession, sf: str) -> DataFrame:
    """Time-unit RANGE frame bounds in OVER position
    (``ExpressionParser.parseTimeUnit``; ``WindowFunctionTest.java:7911,
    7939,8100`` — ``'1' HOUR PRECEDING``, bounded two-PRECEDING frames,
    ``150 MICROSECOND PRECEDING``; unitless QUOTED bounds are native
    timestamp resolution = microseconds).  Lowered to Spark calendar-
    interval range frames — stays one window exchange per PARTITION BY,
    no self-join."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_id, user_id, ts, "
        "max(value) OVER (PARTITION BY user_id ORDER BY ts "
        "  RANGE BETWEEN '30' MINUTE PRECEDING AND CURRENT ROW) AS max_30m, "
        "count(*) OVER (PARTITION BY user_id ORDER BY ts "
        "  RANGE BETWEEN '2' HOUR PRECEDING AND '1' HOUR PRECEDING) AS n_prev_hour, "
        "cast(cast(sum(cast(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts "
        "  RANGE BETWEEN '300000000' PRECEDING AND CURRENT ROW) AS DECIMAL(20,2)) AS DOUBLE) AS sum_5m, "
        "min(value) OVER (PARTITION BY user_id ORDER BY ts "
        "  RANGE 45 minutes PRECEDING) AS min_45m "
        "FROM events"
    )


SQL_WINDOW_RANGE_UNITS_SQL = """
SELECT event_id, user_id, ts,
  MAX(value) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW) AS max_30m,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND INTERVAL 1 HOUR PRECEDING) AS n_prev_hour,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING AND CURRENT ROW) AS DECIMAL(20,2)) AS DOUBLE) AS sum_5m,
  MIN(value) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 45 MINUTE PRECEDING AND CURRENT ROW) AS min_45m
FROM events
"""


def sql_window_exclude(spark: SparkSession, sf: str) -> DataFrame:
    """Frame EXCLUDE clauses in OVER / named-WINDOW position
    (``WindowExpression.java:47-55``; ``WindowExcludeCurrentRowTest.java``
    — the reference supports NO OTHERS + CURRENT ROW and lowers the
    latter by shrinking the frame end: ROWS → ``1 PRECEDING``, RANGE →
    one native-resolution microsecond tick, so timestamp PEERS leave the
    frame too).  One window exchange per PARTITION BY — the lowering
    only edits frame bounds, it adds no self-join or extra pass."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_id, user_id, ts, "
        "cast(cast(sum(cast(value AS DECIMAL(12,2))) OVER "
        "  (PARTITION BY user_id ORDER BY ts, event_id "
        "   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) "
        "  AS DECIMAL(20,2)) AS DOUBLE) AS sum_prev3, "
        "count(*) OVER (PARTITION BY user_id ORDER BY ts "
        "  RANGE BETWEEN '1' HOUR PRECEDING AND CURRENT ROW "
        "  EXCLUDE CURRENT ROW) AS n_hour_excl, "
        "count(*) OVER w_noop AS n_past, "
        "min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS UNBOUNDED PRECEDING EXCLUDE NO OTHERS) AS min_run "
        "FROM events "
        "WINDOW w_noop AS (PARTITION BY user_id ORDER BY ts "
        "  RANGE BETWEEN '2' HOUR PRECEDING AND '1' HOUR PRECEDING "
        "  EXCLUDE CURRENT ROW)"
    )


SQL_WINDOW_EXCLUDE_SQL = """
SELECT event_id, user_id, ts,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    AS DECIMAL(20,2)) AS DOUBLE) AS sum_prev3,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
              AND INTERVAL 1 MICROSECOND PRECEDING) AS n_hour_excl,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 2 HOUR PRECEDING
              AND INTERVAL 1 HOUR PRECEDING) AS n_past,
  MIN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS min_run
FROM events
"""


def sql_with_cte_bare(spark: SparkSession, sf: str) -> DataFrame:
    """Top-level WITH over dialect bodies plus the optional-SELECT
    grammar (``SqlParser.java`` parseWith / parseDml: a statement may
    start at the table expression — ``trades WHERE x > 0`` is a complete
    query, and CTE names bind in every table position including the
    bare-main shorthand).  The CTE body is a SAMPLE BY — a dialect
    clause Spark's native CTE path can't see — and the main query is the
    bare ``hourly WHERE ...`` form."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "WITH hourly AS ("
        "  SELECT ts, user_id, count(*) AS n_ev, "
        "         min(value) AS min_v, max(value) AS max_v "
        "  FROM events SAMPLE BY 1h) "
        "hourly WHERE n_ev > 2"
    )


SQL_WITH_CTE_BARE_SQL = """
WITH hourly AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts, user_id,
         count(*) AS n_ev, min(value) AS min_v, max(value) AS max_v
  FROM events GROUP BY 1, 2)
SELECT * FROM hourly WHERE n_ev > 2
"""


def sql_implicit_group_by(spark: SparkSession, sf: str) -> DataFrame:
    """QuestDB's implicit GROUP BY (``GroupByUtils.java``
    ``SqlOptimiser.rewriteSelectClause``): plain select columns next to
    aggregates become group keys without a GROUP BY clause — the
    dialect's idiomatic aggregation form.  Exercises a plain key, an
    expression key with a bare alias, HAVING over an inferred group, and
    ORDER BY an aggregate alias."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_type, user_id % 7 cohort, count() AS n_ev, "
        "       min(value) AS min_v, max(value) AS max_v "
        "FROM events WHERE user_id < 900 "
        "HAVING n_ev > 1"
    )


SQL_IMPLICIT_GROUP_BY_SQL = """
SELECT event_type, user_id % 7 AS cohort, count(*) AS n_ev,
       min(value) AS min_v, max(value) AS max_v
FROM events WHERE user_id < 900
GROUP BY event_type, cohort
HAVING count(*) > 1
"""


def sql_limit_neg_range(spark: SparkSession, sf: str) -> DataFrame:
    """Negative LIMIT ranges (``LimitRecordCursorFactory.java:43``:
    negative bounds count from the END of the result set) — ``LIMIT
    -40, -15`` returns rows [n-40, n-15) in order, through a reversed
    top-k pass with no full materialization or row count."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_id, user_id, ts FROM events "
        "ORDER BY ts, event_id LIMIT -40, -15"
    )


SQL_LIMIT_NEG_RANGE_SQL = """
WITH o AS (
  SELECT event_id, user_id, ts,
         row_number() OVER (ORDER BY ts, event_id) AS rn,
         count(*) OVER () AS n
  FROM events)
SELECT event_id, user_id, ts FROM o WHERE rn > n - 40 AND rn <= n - 15
"""


def sql_grammar_r8(spark: SparkSession, sf: str) -> DataFrame:
    """Round-8 grammar consolidation: legacy ``LATEST BY`` (SqlParser
    parseLatestBy), DISTINCT through the dialect parse path, a dialect
    subquery in expression (IN) position, and the ``!= null`` comparison
    (WhereClauseParser null-test semantics) in one oracle-checked
    query."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT DISTINCT user_id, event_type FROM events "
        "WHERE event_type != null AND event_id IN "
        "(SELECT event_id FROM events LATEST BY user_id)"
    )


SQL_GRAMMAR_R8_SQL = """
SELECT DISTINCT user_id, event_type FROM events
WHERE event_type IS NOT NULL AND event_id IN (
  SELECT event_id FROM (
    SELECT event_id, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1)
"""


def sql_interval_eq(spark: SparkSession, sf: str) -> DataFrame:
    """Timestamp-predicate intrinsics (``WhereClauseParser``):
    ``ts = '<partial literal>'`` selects the whole period
    (analyzeEquals → intersectTimestamp), ``!=`` the complement, and
    timestamp BETWEEN takes min/max of its operands
    (``BetweenTimestampFunctionFactory``) so reversed bounds select the
    same inclusive range."""
    eng = _engine(spark, sf, {"events": "ts"})
    return eng.sql(
        "SELECT event_type, count() AS n_day, "
        "count(CASE WHEN ts BETWEEN '2024-01-20' AND '2024-01-18' "
        "  THEN 1 END) AS n_rev_btw "
        "FROM events WHERE ts != '2024-01-15'"
    )


SQL_INTERVAL_EQ_SQL = """
SELECT event_type, count(*) AS n_day,
       count(CASE WHEN ts >= '2024-01-18' AND ts <= '2024-01-20'
         THEN 1 END) AS n_rev_btw
FROM events
WHERE NOT (ts >= '2024-01-15' AND ts < '2024-01-16')
GROUP BY event_type
"""


def sql_matview_alter(spark: SparkSession, sf: str) -> DataFrame:
    """ALTER MATERIALIZED VIEW statement surface (r10,
    SqlCompilerImpl.java:2145 compileAlterMatView): SUSPEND WAL parks a
    refresh so the view serves its stored prefix (stale stage), RESUME WAL
    applies the backlog (resumed stage), and SET TTL evicts buckets older
    than the TTL from the newest bucket (ttl stage).  Each stage is
    emitted as tagged rows so the oracle checks all three states
    relationally; SET REFRESH / ALTER COLUMN forms are pytest-covered."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.register(
        "ev_alter10",
        load_table(spark, sf, "events").filter(
            F.col("ts") < F.lit("2024-01-15").cast("timestamp")
        ),
        designated_ts="ts",
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_alter10 WITH BASE ev_alter10 AS ("
        "SELECT ts, count(*) AS n FROM ev_alter10 SAMPLE BY 1h)"
    )
    # base append parked behind SUSPEND WAL: the view serves its stored
    # prefix (reference: refresh txns queue until an operator RESUMEs)
    eng.register("ev_alter10", load_table(spark, sf, "events"), designated_ts="ts")
    eng.sql("ALTER MATERIALIZED VIEW mv_alter10 SUSPEND WAL")
    eng.sql("REFRESH MATERIALIZED VIEW mv_alter10 INCREMENTAL")  # parks
    # materialize the suspended snapshot: RESUME below rewrites partitions
    suspended = eng.sql(
        "SELECT 'suspended' AS stage, ts, n FROM mv_alter10"
    ).localCheckpoint(eager=True)
    eng.sql("ALTER MATERIALIZED VIEW mv_alter10 RESUME WAL")  # catch-up
    resumed = eng.sql(
        "SELECT 'resumed' AS stage, ts, n FROM mv_alter10"
    ).localCheckpoint(eager=True)
    # TTL eviction: buckets whose date partition is 4+ days older than
    # the newest bucket date drop (enforceTtl boundary: newest - 72h,
    # partitions evict once their ceiling passes it)
    eng.sql("ALTER MATERIALIZED VIEW mv_alter10 SET TTL 3 DAYS")
    ttl = eng.sql("SELECT 'ttl' AS stage, ts, n FROM mv_alter10")
    return suspended.unionByName(resumed).unionByName(ttl)


SQL_MATVIEW_ALTER_SQL = """
WITH hourly AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts, COUNT(*) AS n
  FROM events GROUP BY 1
)
SELECT 'suspended' AS stage, ts, n FROM hourly
  WHERE ts < TIMESTAMP '2024-01-15'
UNION ALL
SELECT 'resumed' AS stage, ts, n FROM hourly
UNION ALL
SELECT 'ttl' AS stage, ts, n FROM hourly
  WHERE CAST(ts AS DATE) > (SELECT max(CAST(ts AS DATE)) - 4 FROM hourly)
"""


def sql_pipeline_table_fns(spark: SparkSession, sf: str) -> DataFrame:
    """LLM-pipeline operators callable as SQL table functions (r10):
    dedup_pairs('t', thr) / minhash_candidates('t') / top_terms('t', k)
    in FROM position — the dialect twin of the Python pipeline API, so a
    SQL-only user reaches the production near-dup/keyword operators.  The
    lowering IS the production operator (bucketed joins, two aggs +
    window); each branch aggregates to an integer checksum the oracle
    recomputes from the equivalent relational form."""
    eng = _engine(spark, sf, {})
    eng.register("documents", load_table(spark, sf, "documents"))
    return eng.sql(
        "SELECT 'jaccard' AS fn, count(*) AS n, "
        "  CAST(sum(doc_a + doc_b) AS BIGINT) AS chk "
        "  FROM dedup_pairs('documents', 0.12) "
        "UNION ALL "
        "SELECT 'minhash' AS fn, count(*) AS n, "
        "  CAST(sum(doc_a + doc_b) AS BIGINT) AS chk "
        "  FROM minhash_candidates('documents') "
        "UNION ALL "
        "SELECT 'terms' AS fn, count(*) AS n, "
        "  CAST(sum(tf * 1000 + df) AS BIGINT) AS chk "
        "  FROM top_terms('documents', 3)"
    )


def _pipeline_table_fns_sql() -> str:
    from .queries_pipeline import (
        DOC_TOP_TERMS_SQL,
        MINHASH_LSH_SQL,
        _jaccard_sql,
    )

    return f"""
SELECT 'jaccard' AS fn, count(*) AS n, CAST(sum(doc_a + doc_b) AS BIGINT) AS chk
FROM ({_jaccard_sql(0.12, None)})
UNION ALL
SELECT 'minhash' AS fn, count(*) AS n, CAST(sum(doc_a + doc_b) AS BIGINT) AS chk
FROM ({MINHASH_LSH_SQL})
UNION ALL
SELECT 'terms' AS fn, count(*) AS n, CAST(sum(tf * 1000 + df) AS BIGINT) AS chk
FROM ({DOC_TOP_TERMS_SQL})
"""


SQL_PIPELINE_TABLE_FNS_SQL = _pipeline_table_fns_sql()


def sql_retrieval_table_fns(spark: SparkSession, sf: str) -> DataFrame:
    """The r13 retrieval/classifier operators callable as SQL table
    functions: ``bm25_topk('t', 'terms'[, k])`` ranks documents with
    Okapi BM25 and ``classify_nb('t', 'poslang')`` returns the trained
    Naive Bayes model relation — the dialect twins of
    retrieval_bm25_topk / classifier_nb_train, so a SQL-only user
    reaches the trained-filter and ranking operators.  The lowerings ARE
    the production operators (1-row stats broadcast + map scoring;
    one-pass conditional-count aggregate), exercised here with a
    DIFFERENT query string and positive class than the Python-route
    registry entries so the parameterization is what's checked."""
    eng = _engine(spark, sf, {})
    eng.register("documents", load_table(spark, sf, "documents"))
    # the masses sum DECIMAL(18,6) values (scores/weights are exact at
    # that scale), so distributed summation order cannot perturb a bit
    return eng.sql(
        "SELECT 'bm25' AS fn, count(*) AS n, "
        "  CAST(sum(doc_id) AS BIGINT) AS chk, "
        "  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS mass "
        "  FROM bm25_topk('documents', 'merge sort window', 15) "
        "UNION ALL "
        "SELECT 'nb' AS fn, count(*) AS n, "
        "  CAST(sum(feature * (n_pos + n_neg)) AS BIGINT) AS chk, "
        "  CAST(sum(CAST(weight AS DECIMAL(18,6))) AS DOUBLE) AS mass "
        "  FROM classify_nb('documents', 'fr')"
    )


def _retrieval_table_fns_sql() -> str:
    from .queries_pipeline import _bm25_sql, _nb_cte

    terms = tuple(sorted(set("merge sort window".split())))
    return f"""
SELECT 'bm25' AS fn, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS chk,
  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS mass
FROM (
  WITH {_bm25_sql(terms)}
  SELECT doc_id, score FROM bsc WHERE score > 0
  ORDER BY score DESC, doc_id LIMIT 15)
UNION ALL
SELECT 'nb' AS fn, count(*) AS n,
  CAST(sum(feature * (n_pos + n_neg)) AS BIGINT) AS chk,
  CAST(sum(weight) AS DOUBLE) AS mass
FROM (
  WITH {_nb_cte(pos="fr")}
  SELECT feature, n_pos, n_neg, weight FROM model)
"""


SQL_RETRIEVAL_TABLE_FNS_SQL = _retrieval_table_fns_sql()


def sql_matview_timer(spark: SparkSession, sf: str) -> DataFrame:
    """Mat-view TIMER + PERIOD refresh scheduling (r9,
    SqlParser.java:2590-2717 REFRESH_TYPE_TIMER/PERIOD,
    MatViewTimerJob): a REFRESH EVERY view whose next-due tick is in the
    far future serves its STORED state after a base append (stale read —
    the timer hasn't fired), a manual REFRESH brings it current, and a
    PERIOD(LENGTH 1h) view over 2024 data sees every period complete.
    The three stages are emitted as tagged rows so the oracle checks all
    of stale/fresh/period states relationally."""
    eng = _engine(spark, sf, {"events": "ts"})
    eng.register(
        "ev_head9",
        load_table(spark, sf, "events").filter(
            F.col("ts") < F.lit("2024-01-21").cast("timestamp")
        ),
        designated_ts="ts",
    )
    # the two views are independent — create them concurrently (two Spark
    # jobs in flight; local[32] and any real cluster schedule both), which
    # halves the lifecycle's dominant fixed cost: sequential agg+write jobs
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(
                eng.sql,
                "CREATE MATERIALIZED VIEW mv_timer9 WITH BASE ev_head9 "
                "REFRESH EVERY 1d START '2999-01-01' AS ("
                "SELECT ts, event_type, count(*) AS n FROM ev_head9 SAMPLE BY 1h)",
            ),
            pool.submit(
                eng.sql,
                "CREATE MATERIALIZED VIEW mv_period9 WITH BASE ev_head9 "
                "REFRESH IMMEDIATE PERIOD (LENGTH 1h DELAY 5m) AS ("
                "SELECT ts, event_type, count(*) AS n FROM ev_head9 SAMPLE BY 1h)",
            ),
        ]
        for f in futs:
            f.result()
    # base append: the timer view must NOT see it (next due = year 2999)
    eng.register("ev_head9", load_table(spark, sf, "events"), designated_ts="ts")
    # materialize the stale snapshot: the manual refresh below rewrites
    # the view's partitions, so the lazy scan would read deleted files
    stale = eng.sql(
        "SELECT 'stale' AS stage, ts, event_type, n FROM mv_timer9"
    ).localCheckpoint(eager=True)
    # manual refresh works regardless of the timer
    eng.sql("REFRESH MATERIALIZED VIEW mv_timer9 INCREMENTAL")
    fresh = eng.sql("SELECT 'fresh' AS stage, ts, event_type, n FROM mv_timer9")
    period = eng.sql("SELECT 'period' AS stage, ts, event_type, n FROM mv_period9")
    return stale.unionByName(fresh).unionByName(period)


SQL_MATVIEW_TIMER_SQL = """
WITH hourly AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT 'stale' AS stage, ts, event_type, n FROM hourly
  WHERE ts < TIMESTAMP '2024-01-21'
UNION ALL
SELECT 'fresh' AS stage, ts, event_type, n FROM hourly
UNION ALL
SELECT 'period' AS stage, ts, event_type, n FROM hourly
  WHERE ts < TIMESTAMP '2024-01-21'
"""


def sql_in_volume(spark: SparkSession, sf: str) -> DataFrame:
    """CREATE TABLE ... IN VOLUME lifecycle (r9, SqlParser.java:4608
    parseInVolume; SqlCompilerImpl.java:4706 unknown-alias error): a table
    created in a registered secondary volume takes inserts, detaches and
    re-attaches a partition inside the volume, survives RENAME (stays
    in-volume), and SHOW CREATE TABLE round-trips the clause. All data is
    literal so the oracle is pure constants; storage-location facts are
    surfaced as boolean columns the hash check pins."""
    import os as _os
    import tempfile as _tempfile

    vol = _tempfile.mkdtemp(prefix="qdb_vol_")
    eng = QdbEngine(spark, volumes={"fast": vol})
    eng.sql(
        "CREATE TABLE vtab (v DOUBLE, ts TIMESTAMP) TIMESTAMP(ts) "
        "PARTITION BY DAY IN VOLUME 'fast'"
    )
    eng.sql(
        "INSERT INTO vtab VALUES (1.5,'2024-02-01T00:10:00Z'),"
        "(2.5,'2024-02-02T01:10:00Z'),(4.0,'2024-02-02T02:10:00Z')"
    )
    eng.sql("ALTER TABLE vtab DETACH PARTITION LIST '2024-02-01'")
    n_detached = eng.sql("SELECT count(*) AS n FROM vtab").collect()[0]["n"]
    eng.sql("ALTER TABLE vtab ATTACH PARTITION LIST '2024-02-01'")
    eng.sql("RENAME TABLE vtab TO vtab2")
    ddl = eng.sql("SHOW CREATE TABLE vtab2").collect()[0]["ddl"]
    in_vol_dir = _os.path.isdir(_os.path.join(vol, "vtab2"))
    bad_alias_rejected = False
    try:
        eng.sql("CREATE TABLE vbad (v DOUBLE, ts TIMESTAMP) IN VOLUME 'nope'")
    except ValueError as e:
        bad_alias_rejected = "volume alias is not allowed" in str(e)
    return eng.sql(
        f"SELECT ts, v, CAST({n_detached} AS BIGINT) AS n_while_detached, "
        f"{str('IN VOLUME ' + chr(39) + 'fast' + chr(39) in ddl).lower()} AS ddl_roundtrip, "
        f"{str(in_vol_dir).lower()} AS stored_in_volume, "
        f"{str(bad_alias_rejected).lower()} AS bad_alias_rejected "
        "FROM vtab2 ORDER BY ts"
    )


SQL_IN_VOLUME_SQL = """
SELECT * FROM (VALUES
  (TIMESTAMP '2024-02-01 00:10:00', 1.5, CAST(2 AS BIGINT), TRUE, TRUE, TRUE),
  (TIMESTAMP '2024-02-02 01:10:00', 2.5, CAST(2 AS BIGINT), TRUE, TRUE, TRUE),
  (TIMESTAMP '2024-02-02 02:10:00', 4.0, CAST(2 AS BIGINT), TRUE, TRUE, TRUE)
) AS t(ts, v, n_while_detached, ddl_roundtrip, stored_in_volume, bad_alias_rejected)
"""


def sql_catalogue_introspection(spark: SparkSession, sf: str) -> DataFrame:
    """Engine introspection surface (r10): table_writer_metrics() counters
    driven by a deterministic statement sequence (functions/table/
    TableWriterMetricsFunctionFactory KEYS), reader_pool()/writer_pool()
    listings, memory_metrics() sanity, and the catalogue scalar batch —
    typeOf (TypeOfFunctionFactory ColumnType names), array_build,
    version()/current_database()/current_schema()/current_data_id()
    (catalogue/Constants.java), plus the r11 stragglers — table_storage()
    (TableStorageFunctionFactory: per-table partition/row/disk listing;
    wall-clock-free fields asserted exactly, diskSize as a >0 sanity bit)
    and wait_wal_table('t', seqTxn)
    (WaitWalTableSeqTxnFunctionFactory: boolean, true once the applied
    writer txn reaches seqTxn).  Everything lands as (name, value BIGINT)
    rows so the oracle is a literal table."""
    eng = _engine(spark, sf, {})
    eng.sql(
        "CREATE TABLE cat_t (ts TIMESTAMP, x INT) "
        "TIMESTAMP(ts) PARTITION BY DAY"
    )
    eng.sql(
        "INSERT INTO cat_t VALUES ('2024-01-01T00:00:00', 1), "
        "('2024-01-01T01:00:00', 2), ('2024-01-02T00:00:00', 3)"
    )
    eng.sql(
        "INSERT INTO cat_t VALUES ('2024-01-02T01:00:00', 4), "
        "('2024-01-03T00:00:00', 5)"
    )
    eng.sql("UPDATE cat_t SET x = 9 WHERE x = 1")
    return eng.sql("""
SELECT name, value FROM table_writer_metrics()
UNION ALL SELECT 'version_ok',
  CASE WHEN version() LIKE 'PostgreSQL 12.3%QuestDB' THEN 1 ELSE 0 END
UNION ALL SELECT 'db_ok',
  CASE WHEN current_database() = 'qdb' AND current_schema() = 'public'
            AND current_data_id() = 0 THEN 1 ELSE 0 END
UNION ALL SELECT 'typeof_ok',
  CASE WHEN typeOf(CAST(1 AS INT)) = 'INT' AND typeOf(1e0) = 'DOUBLE'
            AND typeOf('s') = 'STRING' AND typeOf(true) = 'BOOLEAN'
            AND typeOf(CAST(1 AS BIGINT)) = 'LONG' THEN 1 ELSE 0 END
UNION ALL SELECT 'array_build_ok',
  CASE WHEN array_build(7, 8, 9)[2] = 8 THEN 1 ELSE 0 END
UNION ALL SELECT 'writer_pool_rows', (SELECT count(*) FROM writer_pool())
UNION ALL SELECT 'reader_pool_txn',
  (SELECT max(current_txn) FROM reader_pool())
UNION ALL SELECT 'memory_pos',
  (SELECT CASE WHEN min(bytes) > 0 THEN 1 ELSE 0 END FROM memory_metrics())
UNION ALL SELECT 'storage_ok',
  (SELECT CASE WHEN partitionCount = 3 AND rowCount = 5 AND walEnabled
               AND partitionBy = 'DAY' AND diskSize > 0 THEN 1 ELSE 0 END
   FROM table_storage() WHERE tableName = 'cat_t')
UNION ALL SELECT 'wal_wait_ok',
  CASE WHEN wait_wal_table('cat_t', 1) THEN 1 ELSE 0 END
ORDER BY name
""")


# the statement sequence fixes every counter: INSERT#1 = 3 rows (first
# commit, write path), INSERT#2 = 2 rows (append path, txn 1), UPDATE =
# commit 3 (row counts not re-counted — see engine.writer_metrics note)
SQL_CATALOGUE_INTROSPECTION_SQL = """
SELECT * FROM (VALUES
  ('array_build_ok', CAST(1 AS BIGINT)),
  ('committed_rows', 5),
  ('db_ok', 1),
  ('memory_pos', 1),
  ('o3commits', 0),
  ('physically_written_rows', 5),
  ('reader_pool_txn', 1),
  ('rollbacks', 0),
  ('storage_ok', 1),
  ('total_commits', 3),
  ('typeof_ok', 1),
  ('version_ok', 1),
  ('wal_wait_ok', 1),
  ('writer_pool_rows', 1)
) AS t(name, value)
ORDER BY name
"""
