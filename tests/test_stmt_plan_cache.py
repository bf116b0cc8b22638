"""Invalidation pins for the r14 statement-plan cache (VERDICT r13 item
8): lowered SELECT plans are reused only while the catalog state they
were built under is provably unchanged — any DDL/DML or register() must
force a re-lower, and state-reading lowerings must never cache."""

from __future__ import annotations

from questdb_spark.sqlfront.engine import QdbEngine
from questdb_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_pristine_cross_instance_plan_reuse(spark):
    e1 = QdbEngine(spark)
    e1.register("documents", load_table(spark, SF_DIR, "documents"))
    d1 = e1.sql("SELECT count(*) AS n FROM top_terms('documents', 3)")
    e2 = QdbEngine(spark)
    e2.register("documents", load_table(spark, SF_DIR, "documents"))
    d2 = e2.sql("SELECT count(*) AS n FROM top_terms('documents', 3)")
    assert d2 is d1  # the lowered plan itself is shared
    assert d2.collect() == d1.collect()


def test_dml_invalidates_cached_plan(spark):
    e = QdbEngine(spark)
    e.sql("CREATE TABLE cache_tt (x INT, ts TIMESTAMP) TIMESTAMP(ts) PARTITION BY DAY")
    e.sql("INSERT INTO cache_tt VALUES (1, '2024-01-01T00:00:00.000000Z')")
    assert e.sql("SELECT sum(x) AS s FROM cache_tt").collect()[0]["s"] == 1
    # repeat: served from the per-engine cache, same result
    assert e.sql("SELECT sum(x) AS s FROM cache_tt").collect()[0]["s"] == 1
    e.sql("INSERT INTO cache_tt VALUES (41, '2024-01-02T00:00:00.000000Z')")
    assert e.sql("SELECT sum(x) AS s FROM cache_tt").collect()[0]["s"] == 42


def test_register_invalidates_cached_plan(spark):
    e = QdbEngine(spark)
    e.register("cache_t", spark.range(5).selectExpr("id AS x"))
    assert e.sql("SELECT count(*) AS n FROM cache_t").collect()[0]["n"] == 5
    e.register("cache_t", spark.range(9).selectExpr("id AS x"))
    assert e.sql("SELECT count(*) AS n FROM cache_t").collect()[0]["n"] == 9


def test_introspection_never_cached(spark):
    e = QdbEngine(spark)
    n1 = e.sql("SELECT count(*) AS n FROM query_activity()").collect()[0]["n"]
    n2 = e.sql("SELECT count(*) AS n FROM query_activity()").collect()[0]["n"]
    assert n2 == n1 + 1  # each call sees the previous one logged


def test_ddl_engine_never_uses_global_cache(spark):
    """Two engines create the SAME table name in their own warehouses;
    each must read its own rows (a naive cross-instance cache would leak
    the first engine's plan into the second)."""
    vals = []
    for v in (7, 8):
        e = QdbEngine(spark)
        e.sql(
            "CREATE TABLE cache_iso (x INT, ts TIMESTAMP) "
            "TIMESTAMP(ts) PARTITION BY DAY"
        )
        e.sql(f"INSERT INTO cache_iso VALUES ({v}, '2024-01-01T00:00:00.000000Z')")
        vals.append(e.sql("SELECT sum(x) AS s FROM cache_iso").collect()[0]["s"])
    assert vals == [7, 8]
