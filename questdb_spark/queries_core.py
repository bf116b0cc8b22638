"""Core analytics queries: scan/filter/project, group-by aggregation,
joins, top-k, set ops, window functions, scalar-function surface.

Each entry mirrors a SURVEY.md §2 operator family. Every query has a DuckDB
oracle; to make double-typed aggregates hash-identical across engines we:

- cast the 2-decimal BASE columns to DECIMAL(12,2) (that conversion is
  unambiguous in both engines because value*100 is far below 2^53),
- do products/sums entirely in decimal (exact in both engines regardless of
  partition/merge order),
- convert to DOUBLE only at the end, after rounding to <= 15 significant
  digits (DuckDB converts decimal→double via scaled-int division, which
  double-rounds past 2^53; below it both engines produce the same double).

Divisions/products of identical double operands are IEEE-deterministic, so
final doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.parquet import load_table
from .tsutil import to_micros

D2 = "decimal(12,2)"  # base columns carry 2 decimal digits — exact in both engines


def dec2(col):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(D2)


def to_dbl(col, scale=2):
    """Exact decimal → double with <= 15 significant digits (see module doc)."""
    return F.round(col, scale).cast(f"decimal(20,{scale})").cast("double")


def _d(col):  # exact-sum helper for 2-decimal base columns
    return F.sum(dec2(col))


# SQL-side equivalents (textual macros)
def _sql_dbl(expr: str, scale: int = 2) -> str:
    return f"CAST(CAST(ROUND({expr}, {scale}) AS DECIMAL(20,{scale})) AS DOUBLE)"


_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))"
)

# --------------------------------------------------------------------------
# Scans / filters / projections / group-by
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan → hash aggregation.

    Exercises: predicate pushdown on l_shipdate, column pruning, partial+final
    agg (QuestDB: AsyncGroupByRecordCursorFactory.java:75 / vec_agg.cpp).
    """
    li = load_table(spark, sf, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = dec2("l_extendedprice") * (one - dec2("l_discount"))  # (16,4)
    charge = disc_price.cast("decimal(20,4)") * (one + dec2("l_tax")).cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _d("l_quantity").alias("__sq"),
            _d("l_extendedprice").alias("__sbp"),
            F.sum(disc_price).alias("__sdp"),
            F.sum(charge).alias("__sc"),
            F.count(F.lit(1)).alias("count_order"),
            _d("l_discount").alias("__sd"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            to_dbl("__sq").alias("sum_qty"),
            to_dbl("__sbp").alias("sum_base_price"),
            to_dbl("__sdp").alias("sum_disc_price"),
            to_dbl("__sc").alias("sum_charge"),
            (to_dbl("__sq") / F.col("count_order")).alias("avg_qty"),
            (to_dbl("__sbp") / F.col("count_order")).alias("avg_price"),
            (to_dbl("__sd") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {_sql_dbl("SUM(CAST(l_quantity AS DECIMAL(12,2)))")} AS sum_qty,
  {_sql_dbl("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))")} AS sum_base_price,
  {_sql_dbl(f"SUM({_DISC_PRICE})")} AS sum_disc_price,
  {_sql_dbl(f"SUM(CAST({_DISC_PRICE} AS DECIMAL(20,4)) * CAST(CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(4,2)))")} AS sum_charge,
  {_sql_dbl("SUM(CAST(l_quantity AS DECIMAL(12,2)))")} / COUNT(*) AS avg_qty,
  {_sql_dbl("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))")} / COUNT(*) AS avg_price,
  {_sql_dbl("SUM(CAST(l_discount AS DECIMAL(12,2)))")} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join + agg + top-k. Small dims broadcast; top-k is
    TakeOrderedAndProject (QuestDB AsyncTopKRecordCursorFactory.java:73)."""
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("__r"))
        .select("l_orderkey", "o_orderdate", to_dbl("__r").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
  {_sql_dbl(f"SUM({_DISC_PRICE})")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """5-way star join: all dimension joins broadcast."""
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("__r"), F.count(F.lit(1)).alias("n_items"))
        .select("r_name", "n_name", to_dbl("__r").alias("revenue"), "n_items")
    )


Q5_SQL = f"""
SELECT r_name, n_name,
  {_sql_dbl(f"SUM({_DISC_PRICE})")} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def time_filter_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Interval scan: ts-range predicate reaches the parquet reader
    (QuestDB IntervalFwdPartitionFrameCursor; Spark: PushedFilters)."""
    ev = load_table(spark, sf, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
        & (F.col("event_type") == "purchase")
    ).select("event_id", "ts", "user_id", "value")


TIME_FILTER_SQL = """
SELECT event_id, ts, user_id, value FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
  AND event_type = 'purchase'
"""


def topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
"""


def tail_limit_events(spark: SparkSession, sf: str) -> DataFrame:
    """QuestDB `LIMIT -10`: last 10 rows in ts order (SqlOptimiser
    rewriteNegativeLimit)."""
    from .operators.limits import limit_signed

    ev = load_table(spark, sf, "events").select("event_id", "ts", "event_type", "value")
    return limit_signed(ev, -10, ["ts", "event_id"])


TAIL_LIMIT_SQL = """
SELECT * FROM (
  SELECT event_id, ts, event_type, value FROM events
  ORDER BY ts DESC, event_id DESC LIMIT 10
) ORDER BY ts ASC, event_id ASC
"""


def distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) rewrite (SqlOptimiser.java:8133) — built-in in Spark."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def setops_nations(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (§2.7). Nations that have customers but no
    suppliers, plus those with both, tagged."""
    cust_n = load_table(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    supp_n = load_table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cust_n.intersect(supp_n).withColumn("tag", F.lit("both"))
    only_c = cust_n.distinct().exceptAll(supp_n.distinct()).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(only_c)


SETOPS_SQL = """
SELECT nk, 'both' AS tag FROM
  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier)
UNION ALL
SELECT nk, 'cust_only' AS tag FROM
  (SELECT DISTINCT c_nationkey AS nk FROM customer EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier)
"""


def semi_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Semi/anti join (QuestDB: IN (subquery) → FilterOnSubQuery)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    with_big = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return with_big.select("c_custkey").withColumn("has_big_order", F.lit(True)).unionByName(
        without.select("c_custkey").withColumn("has_big_order", F.lit(False))
    )


SEMI_ANTI_SQL = """
SELECT c_custkey, TRUE AS has_big_order FROM customer
 WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
UNION ALL
SELECT c_custkey, FALSE AS has_big_order FROM customer
 WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
"""


def theta_join_nested_loop(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi join (QuestDB NestedLoopLeftJoin...): broadcast
    nested-loop with a range predicate."""
    part = load_table(spark, sf, "part")
    supp = load_table(spark, sf, "supplier")
    return (
        part.join(F.broadcast(supp), part.p_retailprice > supp.s_acctbal, "inner")
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_cheaper_suppliers"))
    )


THETA_JOIN_SQL = """
SELECT p_partkey, COUNT(*) AS n_cheaper_suppliers
FROM part JOIN supplier ON p_retailprice > s_acctbal
GROUP BY p_partkey
"""


# --------------------------------------------------------------------------
# Window functions (§2.5)
# --------------------------------------------------------------------------

def window_rank(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).filter(F.col("rn") <= 3)


WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
"""


def window_running(spark: SparkSession, sf: str) -> DataFrame:
    """Running sum/count per user in ts order — exact decimal running sum."""
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec2("value")).over(w).cast("decimal(20,2)").cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


WINDOW_RUNNING_SQL = """
SELECT event_id, user_id, ts,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DECIMAL(20,2)) AS DOUBLE) AS running_value,
  COUNT(*) OVER w AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def window_lead_lag(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        (to_micros("ts") - to_micros(F.lag("ts", 1).over(w))).alias("micros_since_prev"),
    )


WINDOW_LEAD_LAG_SQL = """
SELECT event_id, user_id, ts,
  LAG(value, 1) OVER w AS prev_value,
  LEAD(value, 1) OVER w AS next_value,
  epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS micros_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Moving 5-row mean via exact decimal sum / count."""
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(dec2("value")).over(w).cast("decimal(20,2)").cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mavg5"),
    )


WINDOW_MOVING_AVG_SQL = """
SELECT event_id, user_id, ts,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DECIMAL(20,2)) AS DOUBLE)
    / COUNT(*) OVER w AS mavg5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def window_first_last_nth(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w).alias("last_value"),
        F.nth_value("value", 2).over(w).alias("second_value"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT event_id, user_id,
  FIRST_VALUE(value) OVER w AS first_value,
  LAST_VALUE(value) OVER w AS last_value,
  NTH_VALUE(value, 2) OVER w AS second_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def window_distribution(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT o_orderkey, o_orderpriority,
  NTILE(4) OVER w AS quartile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


# --------------------------------------------------------------------------
# Aggregate long tail (§2.4)
# --------------------------------------------------------------------------

def agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    """stddev/variance/corr/covar via exact decimal sums (deterministic
    across partition orders; textbook sum-of-squares identities — QuestDB
    computes these with SIMD kernels, vec_agg.cpp)."""
    li = load_table(spark, sf, "lineitem")
    x = dec2("l_extendedprice")
    y = dec2("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum((x * x).cast("decimal(25,4)")).alias("_sxx"),
        F.sum(y).alias("_sy"),
        F.sum((y * y).cast("decimal(25,4)")).alias("_syy"),
        F.sum((x * y).cast("decimal(25,4)")).alias("_sxy"),
    )
    n = F.col("n")
    sx = to_dbl("_sx", 2)
    sxx = to_dbl("_sxx", 0)
    sy = to_dbl("_sy", 2)
    syy = to_dbl("_syy", 2)
    sxy = to_dbl("_sxy", 0)
    var_pop = (sxx - sx * sx / n) / n
    var_samp = (sxx - sx * sx / n) / (n - 1)
    covar_pop = (sxy - sx * sy / n) / n
    corr = (sxy - sx * sy / n) / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return g.select(
        "l_returnflag",
        "n",
        var_pop.alias("var_pop_price"),
        var_samp.alias("var_samp_price"),
        F.sqrt(var_samp).alias("stddev_price"),
        covar_pop.alias("covar_pop_pq"),
        corr.alias("corr_pq"),
    )


AGG_STATS_SQL = f"""
WITH g AS (
  SELECT l_returnflag, COUNT(*) AS n,
    {_sql_dbl("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))", 2)} AS sx,
    {_sql_dbl("SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(25,4)))", 0)} AS sxx,
    {_sql_dbl("SUM(CAST(l_quantity AS DECIMAL(12,2)))", 2)} AS sy,
    {_sql_dbl("SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4)))", 2)} AS syy,
    {_sql_dbl("SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4)))", 0)} AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  (sxx - sx * sx / n) / n AS var_pop_price,
  (sxx - sx * sx / n) / (n - 1) AS var_samp_price,
  SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_price,
  (sxy - sx * sy / n) / n AS covar_pop_pq,
  (sxy - sx * sy / n) / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_pq
FROM g
"""


def vwap_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """QuestDB vwap() (functions/groupby/VwapDouble...): sum(p*q)/sum(q)."""
    li = load_table(spark, sf, "lineitem")
    pq = (dec2("l_extendedprice") * dec2("l_quantity")).cast("decimal(25,4)")
    return (
        li.groupBy("l_returnflag")
        .agg(F.sum(pq).alias("__pq"), _d("l_quantity").alias("__q"))
        .select(
            "l_returnflag",
            (to_dbl("__pq", 2) / to_dbl("__q", 2)).alias("vwap_price"),
        )
    )


VWAP_SQL = f"""
SELECT l_returnflag,
  {_sql_dbl("SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4)))", 2)}
  / {_sql_dbl("SUM(CAST(l_quantity AS DECIMAL(12,2)))", 2)} AS vwap_price
FROM lineitem GROUP BY l_returnflag
"""


def arg_min_max(spark: SparkSession, sf: str) -> DataFrame:
    """arg_min/arg_max family (QuestDB functions/groupby/ArgMax*). Tie-broken
    by (value, event_id) so the result is total-ordered and deterministic."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", F.struct("value", "event_id")).alias("max_value_event"),
        F.min_by("event_id", F.struct("value", "event_id")).alias("min_value_event"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )


ARG_MIN_MAX_SQL = """
SELECT event_type,
  FIRST(event_id ORDER BY value DESC, event_id DESC) AS max_value_event,
  FIRST(event_id ORDER BY value ASC, event_id ASC) AS min_value_event,
  MAX(value) AS max_value,
  MIN(value) AS min_value
FROM events GROUP BY event_type
"""


def string_agg_names(spark: SparkSession, sf: str) -> DataFrame:
    """string_agg / array_agg (QuestDB StringAgg/ArrayAgg groupby fns) with
    deterministic ordering."""
    cust = load_table(spark, sf, "customer").filter(F.col("c_custkey") <= 30)
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


STRING_AGG_SQL = """
SELECT c_nationkey,
  STRING_AGG(c_name, ',' ORDER BY c_name) AS names,
  COUNT(*) AS n
FROM customer WHERE c_custkey <= 30 GROUP BY c_nationkey
"""


def geomean_bool_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """geomean = exp(avg(ln x)); bool_and/bool_or; count_if. ln(x) is an
    arbitrary double, so it's cast at scale 6 (magnitude ~10 → exact-enough
    grid agreement between engines) and summed exactly."""
    li = load_table(spark, sf, "lineitem")
    lnp = F.log(F.col("l_extendedprice")).cast("decimal(20,6)")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.sum(lnp).alias("__slnp"),
            F.count(F.lit(1)).alias("n"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
            F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        )
        .select(
            "l_linestatus",
            F.exp(to_dbl("__slnp", 6) / F.col("n")).alias("geomean_price"),
            "n",
            "all_positive_qty",
            "any_big_discount",
            "n_returned",
        )
    )


GEOMEAN_SQL = f"""
SELECT l_linestatus,
  EXP({_sql_dbl("SUM(CAST(LN(l_extendedprice) AS DECIMAL(20,6)))", 6)} / COUNT(*)) AS geomean_price,
  COUNT(*) AS n,
  BOOL_AND(l_quantity > 0) AS all_positive_qty,
  BOOL_OR(l_discount > 0.09) AS any_big_discount,
  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned
FROM lineitem GROUP BY l_linestatus
"""


def first_last_not_null(spark: SparkSession, sf: str) -> DataFrame:
    """first/last/first_not_null/last_not_null (QuestDB groupby fns) via
    min_by/max_by on the designated timestamp."""
    ev = load_table(spark, sf, "events")
    ordc = F.struct("ts", "event_id")
    all_agg = ev.groupBy("user_id").agg(
        F.min_by("value", ordc).alias("first_value"),
        F.max_by("value", ordc).alias("last_value"),
    )
    nn_agg = (
        ev.filter(F.col("value") > 50)
        .groupBy("user_id")
        .agg(
            F.min_by("value", ordc).alias("first_not_null_v50"),
            F.max_by("value", ordc).alias("last_not_null_v50"),
        )
    )
    return all_agg.join(nn_agg, "user_id", "left")


FIRST_LAST_SQL = """
SELECT user_id,
  FIRST(value ORDER BY ts, event_id) AS first_value,
  FIRST(value ORDER BY ts DESC, event_id DESC) AS last_value,
  FIRST(value ORDER BY ts, event_id) FILTER (WHERE value > 50) AS first_not_null_v50,
  FIRST(value ORDER BY ts DESC, event_id DESC) FILTER (WHERE value > 50) AS last_not_null_v50
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Scalar function surface (§2.8)
# --------------------------------------------------------------------------

def datetime_functions(spark: SparkSession, sf: str) -> DataFrame:
    """date_trunc/dateadd/datediff/extract family (QuestDB functions/date/,
    78 files)."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") <= 200)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", ts).alias("month_start"),
        F.date_trunc("week", ts).alias("week_start"),
        (ts + F.expr("INTERVAL 3 DAY")).alias("plus_3d"),
        F.year(ts).alias("yr"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("dom"),
        F.dayofweek(ts).alias("dow"),
        F.hour(ts).alias("hr"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), ts).alias("days_to_y2k"),
        F.last_day(ts).cast("string").alias("month_end"),
        (F.dayofmonth(F.last_day(ts))).alias("days_in_month"),
    )


DATETIME_SQL = """
SELECT o_orderkey,
  DATE_TRUNC('month', o_orderdate) AS month_start,
  DATE_TRUNC('week', o_orderdate) AS week_start,
  o_orderdate + INTERVAL 3 DAY AS plus_3d,
  EXTRACT(year FROM o_orderdate) AS yr,
  EXTRACT(month FROM o_orderdate) AS mo,
  EXTRACT(day FROM o_orderdate) AS dom,
  EXTRACT(dow FROM o_orderdate) + 1 AS dow,
  EXTRACT(hour FROM o_orderdate) AS hr,
  DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
  CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
  EXTRACT(day FROM LAST_DAY(CAST(o_orderdate AS DATE))) AS days_in_month
FROM orders WHERE o_orderkey <= 200
"""


def string_functions(spark: SparkSession, sf: str) -> DataFrame:
    """str/ package surface: concat, pads, trims, case, substring,
    split_part, position, replace, md5."""
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") <= 50)
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.lower(name).alias("lower_name"),
        F.length(name).alias("name_len"),
        F.lpad(name, 25, "*").alias("lpadded"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.split(name, "#").getItem(1).alias("num_part"),
        F.concat_ws("-", name, F.col("c_mktsegment")).alias("joined"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.instr(name, "#").alias("hash_pos"),
        F.md5(name).alias("name_md5"),
        F.reverse(name).alias("reversed"),
        name.like("Customer%").alias("is_customer"),
        F.regexp_replace(name, "[0-9]+", "N").alias("digits_masked"),
    )


STRING_FN_SQL = """
SELECT c_custkey,
  UPPER(c_name) AS upper_name,
  LOWER(c_name) AS lower_name,
  LENGTH(c_name) AS name_len,
  LPAD(c_name, 25, '*') AS lpadded,
  SUBSTRING(c_name, 1, 8) AS prefix8,
  SPLIT_PART(c_name, '#', 2) AS num_part,
  c_name || '-' || c_mktsegment AS joined,
  REPLACE(c_name, 'Customer', 'Cust') AS replaced,
  POSITION('#' IN c_name) AS hash_pos,
  MD5(c_name) AS name_md5,
  REVERSE(c_name) AS reversed,
  c_name LIKE 'Customer%' AS is_customer,
  REGEXP_REPLACE(c_name, '[0-9]+', 'N', 'g') AS digits_masked
FROM customer WHERE c_custkey <= 50
"""


def json_functions(spark: SparkSession, sf: str) -> DataFrame:
    """json_extract (QuestDB functions/json/, simdjson-backed) →
    get_json_object."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod10"),
    )


JSON_FN_SQL = """
SELECT event_id,
  CAST(props->>'k' AS BIGINT) AS k_value,
  CAST(props->>'k' AS BIGINT) % 10 AS k_mod10
FROM events WHERE event_id < 500
"""


def conditional_cast(spark: SparkSession, sf: str) -> DataFrame:
    """CASE/coalesce/nullif + cast matrix sample (§2.8 conditional/, cast/)."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("disc_band"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_or_null"),
        F.coalesce(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(-1.0)).alias("tax_coalesced"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
        F.round(F.col("l_extendedprice"), 1).alias("price_round1"),
        F.floor(F.col("l_extendedprice")).alias("price_floor"),
        F.ceil(F.col("l_extendedprice")).alias("price_ceil"),
        F.abs(F.col("l_extendedprice") * -1).alias("price_abs"),
    )


CONDITIONAL_CAST_SQL = """
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_discount > 0.05 THEN 'high' WHEN l_discount > 0.02 THEN 'mid' ELSE 'low' END AS disc_band,
  NULLIF(l_tax, 0.0) AS tax_or_null,
  COALESCE(NULLIF(l_tax, 0.0), -1.0) AS tax_coalesced,
  CAST(l_quantity AS INTEGER) AS qty_int,
  CAST(CAST(l_quantity AS DOUBLE) AS VARCHAR) AS qty_str,
  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
  ROUND(l_extendedprice, 1) AS price_round1,
  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
  ABS(l_extendedprice * -1) AS price_abs
FROM lineitem WHERE l_orderkey <= 100
"""


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan → ungrouped agg
    (QuestDB GroupByNotKeyedRecordCursorFactory + JIT filter)."""
    li = load_table(spark, sf, "lineitem")
    rev = (dec2("l_extendedprice") * dec2("l_discount")).cast("decimal(25,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).alias("__r"), F.count(F.lit(1)).alias("n_items"))
        .select(to_dbl("__r").alias("revenue"), "n_items")
    )


Q6_SQL = f"""
SELECT
  {_sql_dbl("SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(25,4)))")} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q4_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated semi join + grouped count."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q7_nation_trade(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation × customer-nation revenue flows."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.snk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.cnk)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev).alias("__r"), F.count(F.lit(1)).alias("n_items"))
        .select("supp_nation", "cust_nation", to_dbl("__r").alias("revenue"), "n_items")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  {_sql_dbl(f"SUM({_DISC_PRICE})")} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).alias("__r"))
        .select("c_custkey", "c_name", to_dbl("__r").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name,
  {_sql_dbl(f"SUM({_DISC_PRICE})")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of PROMO-part revenue among ASIA
    customers, per order year (adapted to the reduced testdata schema —
    no partsupp). Numerator and denominator stay exact decimals; the share
    divides the rounded doubles so both engines do the identical IEEE op."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    part = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    asia_nations = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("cnk"))
    )
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(asia_nations), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
    )
    agg = base.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0).cast(D2))).alias("__n"),
        F.sum(rev).alias("__d"),
    )
    return agg.select(
        "o_year",
        to_dbl(F.col("__n")).alias("nation_rev"),
        to_dbl(F.col("__d")).alias("total_rev"),
        (to_dbl(F.col("__n")) / to_dbl(F.col("__d"))).alias("mkt_share"),
    )


Q8_SQL = f"""
WITH base AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         n2.n_name AS supp_nation,
         {_DISC_PRICE} AS rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
)
SELECT o_year,
  {_sql_dbl("SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END)")} AS nation_rev,
  {_sql_dbl("SUM(rev)")} AS total_rev,
  {_sql_dbl("SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END)")}
    / {_sql_dbl("SUM(rev)")} AS mkt_share
FROM base GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: revenue by supplier nation × order year for parts
    whose name matches a token (no partsupp in the testdata, so profit =
    discounted revenue; the join/group shape is Q9's)."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("%bolt%"))
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(rev).alias("__p"), F.count(F.lit(1)).alias("n_items"))
        .select("nation", "o_year", to_dbl(F.col("__p")).alias("profit"), "n_items")
    )


Q9_SQL = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
  {_sql_dbl(f"SUM({_DISC_PRICE})")} AS profit, COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO-type share of revenue in one ship month."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-02-01")
    )
    part = load_table(spark, sf, "part")
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(D2))).alias("__p"),
            F.sum(rev).alias("__t"),
        )
    )
    return agg.select(
        to_dbl(F.col("__p")).alias("promo_rev"),
        to_dbl(F.col("__t")).alias("total_rev"),
        (F.lit(100.0) * to_dbl(F.col("__p")) / to_dbl(F.col("__t"))).alias("promo_pct"),
    )


Q14_SQL = f"""
WITH base AS (
  SELECT p_type, {_DISC_PRICE} AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-02-01'
)
SELECT
  {_sql_dbl("SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END)")} AS promo_rev,
  {_sql_dbl("SUM(rev)")} AS total_rev,
  100.0 * {_sql_dbl("SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END)")}
    / {_sql_dbl("SUM(rev)")} AS promo_pct
FROM base
"""


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (sum qty above threshold) with
    their customers, top 20 by total price."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("__q"))
        .filter(F.col("__q") > F.lit(150).cast("decimal(12,2)"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            to_dbl(F.col("o_totalprice")).alias("total_price"),
            to_dbl(F.col("__q")).alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
  {_sql_dbl("o_totalprice")} AS total_price,
  {_sql_dbl("sq")} AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
"""


def q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across brand / size / quantity
    bands — the disjunctive-pushdown stress query."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 45))
        )
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).alias("__r"), F.count(F.lit(1)).alias("n_items"))
    )
    return agg.select(to_dbl(F.col("__r")).alias("revenue"), "n_items")


Q19_SQL = f"""
SELECT {_sql_dbl(f"SUM({_DISC_PRICE})")} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 45)
"""


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly revenue
    — the revenue view + scalar-subquery-on-max pattern."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf, "supplier")
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(F.sum(rev).alias("__r"))
    top = revenue.agg(F.max("__r").alias("__m"))
    return (
        revenue.join(F.broadcast(top), revenue.__r == top.__m)
        .join(F.broadcast(supp), revenue.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", to_dbl(F.col("__r")).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_DISC_PRICE}) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {_sql_dbl("r")} AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM revenue)
ORDER BY s_suppkey
"""


def q16_parts_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute group,
    excluding a supplier set via NOT IN (anti-join lowering)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_type") != "PROMO")
    excl = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(30)
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 30
"""


def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no orders (scalar subquery + anti-join), grouped by nation."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    # threshold as exact-decimal sum → rounded double ÷ count: engines
    # diverge on AVG(decimal) result types, identical on this formulation
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (to_dbl(F.sum(dec2("c_acctbal"))) / F.count(F.lit(1))).alias("__a")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__a")
    )
    # testdata has no order-less customers at all — anti-join against the
    # URGENT subset so the shape actually produces rows at every SF
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    no_orders = rich.join(
        urgent.select("o_custkey"), rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec2("c_acctbal")).alias("__b"),
        )
        .select("c_nationkey", "numcust", to_dbl(F.col("__b")).alias("totacctbal"))
    )


Q22_SQL = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
  {_sql_dbl("SUM(CAST(c_acctbal AS DECIMAL(12,2)))")} AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT {_sql_dbl("SUM(CAST(c_acctbal AS DECIMAL(12,2)))")} / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def mode_skew_kurtosis(spark: SparkSession, sf: str) -> DataFrame:
    """mode (deterministic: ties → smallest value) + skewness/kurtosis via
    exact decimal moment sums (QuestDB Mode*/Skewness*/Kurtosis* groupby
    functions; vec_agg kernels)."""
    li = load_table(spark, sf, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("c"))
    mode = counts.groupBy("l_returnflag").agg(
        F.max_by("l_quantity", F.struct(F.col("c"), -F.col("l_quantity"))).alias("mode_qty")
    )
    q = dec2("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("_s1"),
        F.sum((q * q).cast("decimal(25,4)")).alias("_s2"),
        F.sum((q * q * q).cast("decimal(30,6)")).alias("_s3"),
        F.sum((q * q * q * q).cast("decimal(35,8)")).alias("_s4"),
    )
    n = F.col("n").cast("double")
    s1 = to_dbl("_s1", 2)
    s2 = to_dbl("_s2", 2)
    s3 = to_dbl("_s3", 2)
    s4 = to_dbl("_s4", 2)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu
    m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu * mu * mu * mu
    skew = m3 / F.sqrt(m2 * m2 * m2)
    kurt = m4 / (m2 * m2) - 3
    stats = m.select("l_returnflag", "n", skew.alias("skewness_qty"), kurt.alias("kurtosis_qty"))
    return stats.join(mode, "l_returnflag")


MODE_SKEW_SQL = f"""
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS c FROM lineitem GROUP BY 1, 2
),
mode_t AS (
  SELECT l_returnflag, FIRST(l_quantity ORDER BY c DESC, l_quantity ASC) AS mode_qty
  FROM counts GROUP BY l_returnflag
),
m AS (
  SELECT l_returnflag, COUNT(*) AS n,
    {_sql_dbl("SUM(CAST(l_quantity AS DECIMAL(12,2)))", 2)} AS s1,
    {_sql_dbl("SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4)))", 2)} AS s2,
    {_sql_dbl("SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(30,6)))", 2)} AS s3,
    {_sql_dbl("SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(35,8)))", 2)} AS s4
  FROM lineitem GROUP BY l_returnflag
),
moments AS (
  SELECT l_returnflag, n,
    s1 / CAST(n AS DOUBLE) AS mu,
    s2 / CAST(n AS DOUBLE) AS e2,
    s3 / CAST(n AS DOUBLE) AS e3,
    s4 / CAST(n AS DOUBLE) AS e4,
    s2, s3, s4
  FROM m
),
stats AS (
  -- formulas mirror the Spark Column expressions operation-for-operation
  -- (x*x*x, not POW: POW differs in the last ulp)
  SELECT l_returnflag, n,
    (s3 / CAST(n AS DOUBLE) - 3 * mu * s2 / CAST(n AS DOUBLE) + 2 * mu * mu * mu)
      / SQRT(m2 * m2 * m2) AS skewness_qty,
    (s4 / CAST(n AS DOUBLE) - 4 * mu * s3 / CAST(n AS DOUBLE)
       + 6 * mu * mu * s2 / CAST(n AS DOUBLE) - 3 * mu * mu * mu * mu)
      / (m2 * m2) - 3 AS kurtosis_qty
  FROM (
    SELECT *, s2 / CAST(n AS DOUBLE) AS s3_term,
      e2 - mu * mu AS m2
    FROM moments
  )
)
SELECT s.l_returnflag, s.n, s.skewness_qty, s.kurtosis_qty, mt.mode_qty
FROM stats s JOIN mode_t mt ON s.l_returnflag = mt.l_returnflag
"""


def wide_aggregation(spark: SparkSession, sf: str) -> DataFrame:
    """ClickBench-style wide aggregation: many aggregates in one pass
    (QuestDB asserts plans for all ClickBench queries,
    test/griffin/ClickBenchTest.java:42)."""
    ev = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("__k", k)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum(dec2("value")).alias("__sv"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count_if(F.col("event_type") == "click").alias("n_clicks"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
            F.sum("__k").alias("sum_k"),
            F.countDistinct("__k").alias("n_distinct_k"),
        )
        .select(
            "user_id", "n", "n_types", "first_ts", "last_ts",
            to_dbl("__sv").alias("sum_value"),
            (to_dbl("__sv") / F.col("n")).alias("avg_value"),
            "min_value", "max_value", "n_clicks", "n_purchases", "n_errors",
            "sum_k", "n_distinct_k",
        )
    )


WIDE_AGG_SQL = f"""
SELECT user_id, COUNT(*) AS n,
  COUNT(DISTINCT event_type) AS n_types,
  MIN(ts) AS first_ts, MAX(ts) AS last_ts,
  {_sql_dbl("SUM(CAST(value AS DECIMAL(12,2)))")} AS sum_value,
  {_sql_dbl("SUM(CAST(value AS DECIMAL(12,2)))")} / COUNT(*) AS avg_value,
  MIN(value) AS min_value, MAX(value) AS max_value,
  COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
  COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
  COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS n_distinct_k
FROM events GROUP BY user_id
"""


def q12_priority_lines(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (adapted to the schema: priority-class conditional
    counts per line status over a one-year window; the reference schema's
    shipmode/commit/receipt columns aren't in the testdata)."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram via LEFT OUTER join
    (customers with zero orders land in the c_count=0 bucket; the comment
    anti-filter is stood in by an order-priority exclusion)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated avg-quantity subquery — revenue from
    small-quantity lines of one brand, as a fraction of yearly average.
    l_quantity is integer-valued so the double AVG threshold is exact in
    both engines (order-independent)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#13")
    limits = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(limits, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            to_dbl(_d("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            (F.col("total_price") / F.lit(7.0)).alias("avg_yearly"),
            "n_lines",
        )
    )


Q17_SQL = """
WITH limits AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DECIMAL(20,2)) AS DOUBLE)
    / 7.0 AS avg_yearly,
  COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
JOIN limits USING (l_partkey)
WHERE l_quantity < qty_limit
"""


def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS / NOT-EXISTS pair over the same relation —
    suppliers who were the ONLY late supplier on a multi-supplier finished
    order ("late" stood in by ship-lag > 60 days; the schema has no
    commit/receipt dates). Lowered as semi + anti joins."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    lag = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # single-pass per-order shape: the EXISTS / NOT-EXISTS pair collapses
    # into one join + one aggregation that REUSES the join's l_orderkey
    # partitioning (one lineitem shuffle instead of three — the semi and
    # anti legs each re-shuffled the full relation at 10x)
    per_order = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.size(F.collect_set("l_suppkey")).alias("n_supp"),
            F.size(
                F.collect_set(F.when(lag, F.col("l_suppkey")))
            ).alias("n_late_supp"),
            F.first(F.when(lag, F.col("l_suppkey")), ignorenulls=True).alias(
                "the_supp"
            ),
            F.sum(F.when(lag, 1).otherwise(0)).alias("n_late_items"),
        )
        # multi-supplier order whose ONLY late supplier is the_supp; the
        # contribution is its late lineitem count (Q21 counts l1 rows)
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(F.broadcast(s), per_order.the_supp == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_items").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


Q21_SQL = """
WITH l1 AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name IN ('NATION_3', 'NATION_7')
WHERE EXISTS (
  SELECT 1 FROM lineitem l2
  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey
) AND NOT EXISTS (
  SELECT 1 FROM l1 l3
  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey != l1.l_suppkey
)
GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 20
"""


def window_stat_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed statistical aggregates (reference functions/window/
    StdDev*/Var*/Corr/CovarPop/CovarSamp window classes): moving
    variance / stddev / covariance / correlation over a 10-row frame.
    Same exact-decimal moment identities as `agg_stats`, just OVER a
    frame — the decimal window SUMs are order-exact in both engines, and
    the final double arithmetic is textually identical, so values match
    bit-for-bit.  Degenerate frames resolve explicitly (n=1 -> NULL
    sample stats; zero variance -> NULL corr) instead of leaning on
    engine-specific NaN behavior."""
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") < 300)
    x = dec2("l_extendedprice")
    y = dec2("l_quantity")
    # the driver's synthetic lineitem has duplicate (orderkey, linenumber)
    # keys — extend the sort to every column entering the arithmetic so
    # remaining ties are interchangeable rows (frame multisets identical)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .rowsBetween(-9, 0)
    )
    n = F.count(F.lit(1)).over(w)
    sx = to_dbl(F.sum(x).over(w), 2)
    sxx = to_dbl(F.sum((x * x).cast("decimal(25,4)")).over(w), 0)
    sy = to_dbl(F.sum(y).over(w), 2)
    syy = to_dbl(F.sum((y * y).cast("decimal(25,4)")).over(w), 2)
    sxy = to_dbl(F.sum((x * y).cast("decimal(25,4)")).over(w), 0)
    var_pop = (sxx - sx * sx / n) / n
    var_samp = (sxx - sx * sx / n) / (n - 1)
    covar_samp = (sxy - sx * sy / n) / (n - 1)
    denom = (sxx - sx * sx / n) * (syy - sy * sy / n)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        # n=1 frames would otherwise leak moment-rounding residue (sxx is
        # rounded at scale 0, sx*sx is not), so a partition's first row
        # must resolve to exactly 0 / NULL, not the rounding artifact
        F.when(n > 1, var_pop).otherwise(F.lit(0.0)).alias("var_pop_w"),
        F.when(n > 1, var_samp).alias("var_samp_w"),
        F.when((n > 1) & (var_samp >= 0), F.sqrt(var_samp)).alias("stddev_w"),
        F.when(n > 1, covar_samp).alias("covar_samp_w"),
        F.when((n > 1) & (denom > 0), (sxy - sx * sy / n) / F.sqrt(denom))
        .alias("corr_w"),
    )


_WS_N = "COUNT(*) OVER w"
_WS_SX = _sql_dbl("SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER w", 2)
_WS_SXX = _sql_dbl(
    "SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(25,4))) OVER w", 0
)
_WS_SY = _sql_dbl("SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w", 2)
_WS_SYY = _sql_dbl(
    "SUM(CAST(CAST(l_quantity AS DECIMAL(12,2))"
    " * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4))) OVER w", 2
)
_WS_SXY = _sql_dbl(
    "SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4))) OVER w", 0
)

WINDOW_STAT_AGGS_SQL = f"""
WITH m AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
    {_WS_N} AS n, {_WS_SX} AS sx, {_WS_SXX} AS sxx,
    {_WS_SY} AS sy, {_WS_SYY} AS syy, {_WS_SXY} AS sxy
  FROM lineitem
  WHERE l_orderkey < 300
  WINDOW w AS (PARTITION BY l_returnflag
               ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT l_orderkey, l_linenumber, l_returnflag,
  CASE WHEN n > 1 THEN (sxx - sx * sx / n) / n ELSE 0.0 END AS var_pop_w,
  CASE WHEN n > 1 THEN (sxx - sx * sx / n) / (n - 1) END AS var_samp_w,
  CASE WHEN n > 1 AND (sxx - sx * sx / n) / (n - 1) >= 0
       THEN SQRT((sxx - sx * sx / n) / (n - 1)) END AS stddev_w,
  CASE WHEN n > 1 THEN (sxy - sx * sy / n) / (n - 1) END AS covar_samp_w,
  CASE WHEN n > 1 AND (sxx - sx * sx / n) * (syy - sy * sy / n) > 0
       THEN (sxy - sx * sy / n)
            / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)) END AS corr_w
FROM m
"""
