"""Time-series queries: SAMPLE BY (+ all fills), LATEST ON, ASOF/LT/SPLICE
joins, WINDOW join, HORIZON/markout join.

Master/slave event streams are carved out of the `events` table by
event_type. Slave streams are pre-deduplicated to one row per (key, ts)
(max event_id wins) so ASOF tie-breaking is total and the DuckDB oracle —
written with correlated subqueries — is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.asof import asof_join, lt_join, splice_join
from .operators.sessions import sessionize
from .operators.latest import latest_on
from .operators.sample_by import sample_by
from .operators.window_join import horizon_join, markout_agg, window_join
from .sources.parquet import load_table

D2 = "decimal(12,2)"


# --------------------------------------------------------------------------
# SAMPLE BY
# --------------------------------------------------------------------------

def sample_by_3M_2y(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-month and multi-year SAMPLE BY buckets over lineitem
    (TimestampSamplerFactory month/year arms) — the n≠1 calendar
    arithmetic paths (months-since-epoch floor, year-multiple floor) that
    date_trunc cannot express. The oracle mirrors the epoch-anchored floor
    explicitly (time_bucket's origin differs)."""
    li = load_table(spark, sf, "lineitem")
    q = sample_by(
        li, "l_shipdate", "3M",
        {
            "sum_qty": F.sum(F.col("l_quantity").cast(D2)).cast("decimal(20,2)").cast("double"),
            "n": F.count(F.lit(1)),
        },
        bucket_name="bucket_3m",
    )
    y = sample_by(
        li, "l_shipdate", "2y",
        {"n2": F.count(F.lit(1))},
        bucket_name="bucket_2y",
    )
    return q.crossJoin(F.broadcast(y.agg(F.count(F.lit(1)).alias("n_year_buckets"))))


SAMPLE_BY_3M_2Y_SQL = """
WITH m AS (
  SELECT make_timestamp(
           1970 + ((EXTRACT(year FROM l_shipdate) - 1970) * 12
                   + EXTRACT(month FROM l_shipdate) - 1) // 3 * 3 // 12,
           ((EXTRACT(year FROM l_shipdate) - 1970) * 12
                   + EXTRACT(month FROM l_shipdate) - 1) // 3 * 3 % 12 + 1,
           1, 0, 0, 0) AS bucket_3m,
         l_quantity
  FROM lineitem
),
ybuckets AS (
  SELECT DISTINCT (EXTRACT(year FROM l_shipdate) - 1970) // 2 AS yb FROM lineitem
)
SELECT bucket_3m,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n,
  (SELECT COUNT(*) FROM ybuckets) AS n_year_buckets
FROM m GROUP BY bucket_3m
"""


def sample_by_1h(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE BY 1h, keyed, FILL(none) — plain bucketed aggregation."""
    ev = load_table(spark, sf, "events")
    return sample_by(
        ev,
        "ts",
        "1h",
        {
            "sum_value": F.sum(F.col("value").cast(D2)).cast("decimal(20,2)").cast("double"),
            "n": F.count(F.lit(1)),
        },
        keys=["event_type"],
    )


SAMPLE_BY_1H_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts_bucket, event_type,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def ohlc_1h(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC candles (r12) — the canonical QuestDB demo query: SAMPLE BY
    1h with first/last/min/max per symbol, the exact shape the
    reference's first/last fast path targets
    (``SampleByFirstLastRecordCursorFactory.java:71``,
    ``SqlOptimiser.rewriteSingleFirstLastGroupBy:10993``).  first/last
    take the (ts, event_id) order so ties are total in both engines
    (event timestamps are micro-aligned nanos — lossless under the
    loader's truncation); turnover sums through DECIMAL so the float is
    order-independent.  One bucketed hash aggregate — the plan every
    candlestick dashboard wants at 100 TB."""
    ev = load_table(spark, sf, "events")
    pri = F.struct(F.col("ts"), F.col("event_id"))
    return sample_by(
        ev,
        "ts",
        "1h",
        {
            "open": F.min_by("value", pri),
            "high": F.max("value"),
            "low": F.min("value"),
            "close": F.max_by("value", pri),
            "n_trades": F.count(F.lit(1)).cast("bigint"),
            "turnover": F.sum(F.col("value").cast(D2)).cast("decimal(20,2)").cast("double"),
        },
        keys=["event_type"],
    )


OHLC_1H_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts_bucket, event_type,
  FIRST(value ORDER BY ts, event_id) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  FIRST(value ORDER BY ts DESC, event_id DESC) AS close,
  CAST(COUNT(*) AS BIGINT) AS n_trades,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS turnover
FROM events GROUP BY 1, 2
"""


def sample_by_first_obs(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE BY 90m ALIGN TO FIRST OBSERVATION: buckets originate at the
    stream's first timestamp, not calendar boundaries
    (``AbstractNoRecordSampleByCursor.java:233``, ``SqlParser.java:4284``).
    90m is deliberately non-divisor-of-day so first-obs and calendar
    alignment provably differ."""
    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "click")
    return sample_by(
        ev,
        "ts",
        "90m",
        {
            "sum_value": F.sum(F.col("value").cast(D2)).cast("decimal(20,2)").cast("double"),
            "n": F.count(F.lit(1)),
        },
        keys=["user_id"],
        align="first_observation",
    )


SAMPLE_BY_FIRST_OBS_SQL = """
WITH e AS (SELECT * FROM events WHERE event_type = 'click'),
o AS (SELECT MIN(ts) AS origin FROM e)
SELECT
  o.origin + to_microseconds(
    CAST(FLOOR(date_diff('microsecond', o.origin, e.ts) / 5400000000) * 5400000000 AS BIGINT)
  ) AS ts_bucket,
  e.user_id,
  CAST(CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value,
  COUNT(*) AS n
FROM e, o GROUP BY 1, 2
"""


def sample_by_tz_day(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE BY 1d ALIGN TO CALENDAR TIME ZONE 'America/New_York'
    (``SqlParser.java:4284``, ``TimestampSamplerFactory``): buckets align
    to LOCAL calendar days and surface as the UTC instant of local
    midnight (05:00 UTC under EST). Lowered as
    convert_timezone(UTC→tz) → date_trunc → convert_timezone(tz→UTC); the
    tz math is a projection, so the aggregation is still one shuffle."""
    ev = load_table(spark, sf, "events")
    return sample_by(
        ev,
        "ts",
        "1d",
        {
            "sum_value": F.sum(F.col("value").cast(D2)).cast("decimal(20,2)").cast("double"),
            "n": F.count(F.lit(1)),
        },
        keys=["event_type"],
        tz="America/New_York",
    )


# DuckDB tz composition mirrors the Spark lowering exactly:
# timezone('UTC', ts)   naive-UTC -> instant
# timezone(tz, instant) instant   -> naive local      (= convert_timezone)
# then truncate, and apply the inverse pair to return to naive UTC.
SAMPLE_BY_TZ_SQL = """
SELECT
  CAST(timezone('UTC', timezone('America/New_York',
       date_trunc('day', timezone('America/New_York', timezone('UTC', ts)))))
       AS TIMESTAMP) AS ts_bucket,
  event_type,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def sample_by_fill_null(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE BY 6h FILL(null) with FROM/TO spine bounds."""
    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    return sample_by(
        ev,
        "ts",
        "6h",
        {"n": F.count(F.lit(1)), "max_value": F.max("value")},
        keys=["user_id"],
        fill="null",
        from_ts="2024-01-05",
        to_ts="2024-01-12",
    )


SAMPLE_BY_FILL_NULL_SQL = """
WITH spine AS (
  SELECT UNNEST(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-11 23:59:59.999999',
                 INTERVAL 6 HOUR)) AS ts_bucket
),
keys AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
          AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'),
agg AS (
  SELECT time_bucket(INTERVAL 6 HOUR, ts) AS ts_bucket, user_id,
    COUNT(*) AS n, MAX(value) AS max_value
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
  GROUP BY 1, 2
)
SELECT s.ts_bucket, k.user_id, a.n, a.max_value
FROM spine s CROSS JOIN keys k
LEFT JOIN agg a ON a.ts_bucket = s.ts_bucket AND a.user_id = k.user_id
"""


def sample_by_fill_prev(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE BY 1d FILL(prev), keyed by event_type."""
    ev = load_table(spark, sf, "events")
    return sample_by(
        ev,
        "ts",
        "1d",
        {"sum_value": F.sum(F.col("value").cast(D2)).cast("decimal(20,2)").cast("double")},
        keys=["event_type"],
        fill="prev",
    )


SAMPLE_BY_FILL_PREV_SQL = """
WITH agg AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts_bucket, event_type,
    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(ts_bucket) lo, MAX(ts_bucket) hi FROM agg),
spine AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS ts_bucket FROM bounds),
keys AS (SELECT DISTINCT event_type FROM events),
grid AS (
  SELECT s.ts_bucket, k.event_type, a.sum_value
  FROM spine s CROSS JOIN keys k
  LEFT JOIN agg a ON a.ts_bucket = s.ts_bucket AND a.event_type = k.event_type
)
SELECT ts_bucket, event_type,
  LAST_VALUE(sum_value IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY ts_bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value
FROM grid
"""


def sample_by_fill_value(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE BY 12h FILL(value): missing buckets get a constant."""
    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "error")
    return sample_by(
        ev,
        "ts",
        "12h",
        {"n": F.count(F.lit(1))},
        keys=["user_id"],
        fill="value",
        fill_values={"n": 0},
    )


SAMPLE_BY_FILL_VALUE_SQL = """
WITH agg AS (
  SELECT time_bucket(INTERVAL 12 HOUR, ts) AS ts_bucket, user_id, COUNT(*) AS n
  FROM events WHERE event_type = 'error' GROUP BY 1, 2
),
bounds AS (SELECT MIN(ts_bucket) lo, MAX(ts_bucket) hi FROM agg),
spine AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 12 HOUR)) AS ts_bucket FROM bounds),
keys AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT s.ts_bucket, k.user_id, COALESCE(a.n, 0) AS n
FROM spine s CROSS JOIN keys k
LEFT JOIN agg a ON a.ts_bucket = s.ts_bucket AND a.user_id = k.user_id
"""


def sample_by_fill_linear(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE BY 1d FILL(linear) — interpolate missing buckets
    (SampleByInterpolateRecordCursorFactory.java:67)."""
    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "signup")
    return sample_by(
        ev,
        "ts",
        "1d",
        {"avg_value": (F.sum(F.col("value").cast(D2)).cast("decimal(20,2)").cast("double") / F.count(F.lit(1)))},
        keys=["user_id"],
        fill="linear",
    )


SAMPLE_BY_FILL_LINEAR_SQL = """
WITH agg AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS ts_bucket, user_id,
    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) / COUNT(*) AS avg_value
  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
),
bounds AS (SELECT MIN(ts_bucket) lo, MAX(ts_bucket) hi FROM agg),
spine AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS ts_bucket FROM bounds),
keys AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
grid AS (
  SELECT s.ts_bucket, k.user_id, a.avg_value
  FROM spine s CROSS JOIN keys k
  LEFT JOIN agg a ON a.ts_bucket = s.ts_bucket AND a.user_id = k.user_id
),
marked AS (
  SELECT ts_bucket, user_id, avg_value,
    LAST_VALUE(avg_value IGNORE NULLS) OVER wp AS pv,
    LAST_VALUE(CASE WHEN avg_value IS NOT NULL THEN epoch_us(ts_bucket) END IGNORE NULLS) OVER wp AS pt,
    FIRST_VALUE(avg_value IGNORE NULLS) OVER wn AS nv,
    FIRST_VALUE(CASE WHEN avg_value IS NOT NULL THEN epoch_us(ts_bucket) END IGNORE NULLS) OVER wn AS nt
  FROM grid
  WINDOW
    wp AS (PARTITION BY user_id ORDER BY ts_bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wn AS (PARTITION BY user_id ORDER BY ts_bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT ts_bucket, user_id,
  CASE WHEN avg_value IS NOT NULL THEN avg_value
       WHEN pt IS NOT NULL AND nt IS NOT NULL
       THEN pv + (nv - pv) * (epoch_us(ts_bucket) - pt) / (nt - pt)
  END AS avg_value
FROM marked
"""


# --------------------------------------------------------------------------
# LATEST ON
# --------------------------------------------------------------------------

def latest_on_user(spark: SparkSession, sf: str) -> DataFrame:
    """LATEST ON ts PARTITION BY user_id, event_type."""
    ev = load_table(spark, sf, "events")
    return latest_on(ev, "ts", ["user_id", "event_type"], tiebreak="event_id")


LATEST_ON_SQL = """
SELECT user_id, event_type, event_id, ts, value, props FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# ASOF / LT / SPLICE
# --------------------------------------------------------------------------

def _master_slave(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    ev = load_table(spark, sf, "events")
    master = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    # one slave row per (user_id, ts): max event_id wins (deterministic)
    slave = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by(F.col("value"), F.col("event_id")).alias("purchase_value"))
    )
    return master, slave


_MASTER_SQL = """
SELECT event_id, user_id, ts, value AS click_value FROM events WHERE event_type = 'click'
"""
_SLAVE_SQL = """
SELECT user_id, ts, FIRST(value ORDER BY event_id DESC) AS purchase_value
FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
"""


def asof_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """ASOF JOIN keyed by user_id: latest purchase at or before each click."""
    master, slave = _master_slave(spark, sf)
    return asof_join(master, slave, "ts", keys=["user_id"], slave_ts_out="purchase_ts")


ASOF_JOIN_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL})
SELECT m.event_id, m.user_id, m.ts, m.click_value,
  (SELECT s.ts FROM s WHERE s.user_id = m.user_id AND s.ts <= m.ts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_ts,
  (SELECT s.purchase_value FROM s WHERE s.user_id = m.user_id AND s.ts <= m.ts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_value
FROM m
"""


def asof_join_keyless(spark: SparkSession, sf: str) -> DataFrame:
    """KEYLESS ASOF JOIN through the chunked-carry path (the two-pass
    parallel lowering — without it a keyless ASOF is one global window
    task). Driver-verifies the chunk-boundary carry logic: a prevailing
    slave row must flow across chunk edges exactly."""
    ev = load_table(spark, sf, "events")
    master = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", F.col("value").alias("click_value")
    )
    slave = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    return asof_join(master, slave, "ts", keys=[], slave_ts_out="purchase_ts",
                     chunk="1 day")


ASOF_KEYLESS_SQL = """
WITH m AS (
  SELECT event_id, ts, value AS click_value FROM events WHERE event_type = 'click'
), s AS (
  SELECT ts, FIRST(value ORDER BY event_id DESC) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY ts
)
SELECT m.event_id, m.ts, m.click_value,
  (SELECT s.ts FROM s WHERE s.ts <= m.ts ORDER BY s.ts DESC LIMIT 1) AS purchase_ts,
  (SELECT s.purchase_value FROM s WHERE s.ts <= m.ts ORDER BY s.ts DESC LIMIT 1) AS purchase_value
FROM m
"""


def asof_join_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """ASOF JOIN ... TOLERANCE 2h (SqlParser.java:5069): stale matches null."""
    master, slave = _master_slave(spark, sf)
    return asof_join(
        master, slave, "ts", keys=["user_id"], tolerance="2 HOUR", slave_ts_out="purchase_ts"
    )


ASOF_TOLERANCE_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL})
SELECT m.event_id, m.user_id, m.ts, m.click_value,
  (SELECT s.ts FROM s WHERE s.user_id = m.user_id AND s.ts <= m.ts
    AND s.ts >= m.ts - INTERVAL 2 HOUR ORDER BY s.ts DESC LIMIT 1) AS purchase_ts,
  (SELECT s.purchase_value FROM s WHERE s.user_id = m.user_id AND s.ts <= m.ts
    AND s.ts >= m.ts - INTERVAL 2 HOUR ORDER BY s.ts DESC LIMIT 1) AS purchase_value
FROM m
"""


def lt_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """LT JOIN: strictly-before semantics."""
    master, slave = _master_slave(spark, sf)
    return lt_join(master, slave, "ts", keys=["user_id"], slave_ts_out="purchase_ts")


LT_JOIN_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL})
SELECT m.event_id, m.user_id, m.ts, m.click_value,
  (SELECT s.ts FROM s WHERE s.user_id = m.user_id AND s.ts < m.ts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_ts,
  (SELECT s.purchase_value FROM s WHERE s.user_id = m.user_id AND s.ts < m.ts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_value
FROM m
"""


def splice_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """SPLICE JOIN: time-ordered full-outer merge of click and purchase
    streams per user, both payloads carried forward."""
    ev = load_table(spark, sf, "events")
    master = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    slave = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    return splice_join(master, slave, "ts", keys=["user_id"])


SPLICE_JOIN_SQL = """
WITH m AS (
  SELECT user_id, ts, FIRST(value ORDER BY event_id DESC) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), s AS (
  SELECT user_id, ts, FIRST(value ORDER BY event_id DESC) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), u AS (
  SELECT user_id, ts FROM m UNION ALL SELECT user_id, ts FROM s
)
SELECT u.user_id, u.ts,
  (SELECT m.ts FROM m WHERE m.user_id = u.user_id AND m.ts <= u.ts ORDER BY m.ts DESC LIMIT 1) AS master_ts,
  (SELECT m.click_value FROM m WHERE m.user_id = u.user_id AND m.ts <= u.ts ORDER BY m.ts DESC LIMIT 1) AS click_value,
  (SELECT s.ts FROM s WHERE s.user_id = u.user_id AND s.ts <= u.ts ORDER BY s.ts DESC LIMIT 1) AS slave_ts,
  (SELECT s.purchase_value FROM s WHERE s.user_id = u.user_id AND s.ts <= u.ts ORDER BY s.ts DESC LIMIT 1) AS purchase_value
FROM u
"""


# --------------------------------------------------------------------------
# WINDOW JOIN / HORIZON (markout)
# --------------------------------------------------------------------------

def window_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """WINDOW JOIN: for each click, purchase count/sum within ±1h, per user."""
    master, slave = _master_slave(spark, sf)
    return window_join(
        master,
        slave,
        "ts",
        keys=["user_id"],
        lo="-1 HOUR",
        hi="1 HOUR",
        aggs={
            "n_purchases": F.count(F.col("s.purchase_value")),
            "sum_purchases": F.sum(F.col("s.purchase_value").cast(D2)).cast("decimal(20,2)").cast("double"),
        },
        master_id="event_id",
    )


WINDOW_JOIN_SQL = f"""
WITH m AS ({_MASTER_SQL}), s AS ({_SLAVE_SQL})
SELECT m.event_id, m.user_id, m.ts, m.click_value,
  COUNT(s.purchase_value) AS n_purchases,
  CAST(CAST(SUM(CAST(s.purchase_value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_purchases
FROM m LEFT JOIN s ON s.user_id = m.user_id
  AND s.ts >= m.ts - INTERVAL 1 HOUR AND s.ts <= m.ts + INTERVAL 1 HOUR
GROUP BY m.event_id, m.user_id, m.ts, m.click_value
"""


def horizon_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """HORIZON/markout join: value of the purchase stream as of signup time
    + {10m, 1h, 6h} per user."""
    ev = load_table(spark, sf, "events")
    master = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    _, slave = _master_slave(spark, sf)
    out = horizon_join(
        master, slave, "ts", keys=["user_id"], horizons=["10 MINUTE", "1 HOUR", "6 HOUR"]
    )
    return out.select(
        "event_id", "user_id", "ts", "horizon", F.col("slave_ts").alias("purchase_ts"),
        "purchase_value",
    )


HORIZON_JOIN_SQL = f"""
WITH m0 AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
s AS ({_SLAVE_SQL}),
m AS (
  SELECT m0.*, h.horizon,
    m0.ts + CASE h.horizon WHEN '10 MINUTE' THEN INTERVAL 10 MINUTE
                           WHEN '1 HOUR' THEN INTERVAL 1 HOUR
                           ELSE INTERVAL 6 HOUR END AS hts
  FROM m0 CROSS JOIN (VALUES ('10 MINUTE'), ('1 HOUR'), ('6 HOUR')) AS h(horizon)
)
SELECT m.event_id, m.user_id, m.ts, m.horizon,
  (SELECT s.ts FROM s WHERE s.user_id = m.user_id AND s.ts <= m.hts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_ts,
  (SELECT s.purchase_value FROM s WHERE s.user_id = m.user_id AND s.ts <= m.hts
   ORDER BY s.ts DESC LIMIT 1) AS purchase_value
FROM m
"""


def markout_horizon_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Markout AGGREGATE form of HORIZON JOIN (GROUP BY over horizons):
    ``SELECT h.offset, count(*), count(matched), avg(value) ... HORIZON
    JOIN purchases ON (user_id) RANGE FROM 0s TO 30m STEP 10m AS h`` —
    ``MarkoutHorizonRecordCursorFactory.java:95``, ``HorizonJoinTest.java:123``.
    Decimal-exact value sums keep avg bit-identical to the oracle."""
    ev = load_table(spark, sf, "events")
    master = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    _, slave = _master_slave(spark, sf)
    dec = F.col("purchase_value").cast("decimal(12,2)")
    out = markout_agg(
        master, slave, "ts", keys=["user_id"],
        frm="0 second", to="30 minute", step="10 minute",
        aggs={
            "n_masters": F.count(F.lit(1)),
            "n_matched": F.count("slave_ts"),
            "__sum": F.sum(dec),
        },
    )
    avg = (
        F.round("__sum", 2).cast("decimal(20,2)").cast("double") / F.col("n_matched")
    )
    return out.select(
        "offset", "n_masters", "n_matched", avg.alias("avg_markout_value")
    )


MARKOUT_HORIZON_AGG_SQL = f"""
WITH m0 AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
s AS ({_SLAVE_SQL}),
m AS (
  SELECT m0.*, CAST(o."offset" AS BIGINT) AS "offset",
    m0.ts + to_microseconds(o."offset") AS hts
  FROM m0 CROSS JOIN (VALUES (0), (600000000), (1200000000), (1800000000)) AS o("offset")
),
j AS (
  SELECT m."offset",
    (SELECT s.ts FROM s WHERE s.user_id = m.user_id AND s.ts <= m.hts
     ORDER BY s.ts DESC LIMIT 1) AS purchase_ts,
    (SELECT s.purchase_value FROM s WHERE s.user_id = m.user_id AND s.ts <= m.hts
     ORDER BY s.ts DESC LIMIT 1) AS purchase_value
  FROM m
)
SELECT "offset", COUNT(*) AS n_masters, COUNT(purchase_ts) AS n_matched,
  CAST(CAST(ROUND(SUM(CAST(purchase_value AS DECIMAL(12,2))), 2) AS DECIMAL(20,2)) AS DOUBLE)
    / COUNT(purchase_ts) AS avg_markout_value
FROM j GROUP BY "offset"
"""


def sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (r10, operators/sessions.py): per-user
    sessions over the events stream with a 30-minute inactivity gap —
    session id, bounds, and event count.  One shuffle: the lag flag and
    the cumulative session id share a single Window sort.  Oracle builds
    the identical lag + running-sum construction in SQL."""
    ev = load_table(spark, sf, "events")
    return sessionize(ev, "ts", "user_id", gap_seconds=1800, tiebreak_col="event_id")


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""
