"""DDL/DML statement surface (sqlfront/ddl.py) — the QuestDB statement
lifecycle routed onto TimeTable.

Reference: ``griffin/SqlCompilerImpl.java:3281`` keyword dispatch,
``griffin/engine/ops/AlterOperation.java``, ``UpdateOperatorImpl.java``,
``SqlParser.java:3081`` DEDUP UPSERT KEYS.
"""

from __future__ import annotations

import pytest

from questdb_spark.sqlfront.engine import QdbEngine


@pytest.fixture()
def eng(spark, tmp_path):
    return QdbEngine(spark, warehouse=str(tmp_path / "wh"))


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_create_insert_select_roundtrip(eng):
    eng.sql(
        "CREATE TABLE trades (ts TIMESTAMP, sym SYMBOL, price DOUBLE, qty LONG) "
        "TIMESTAMP(ts) PARTITION BY DAY"
    )
    st = eng.sql("SHOW TABLES").collect()
    assert [(r["table"], r["designated_ts"]) for r in st] == [("trades", "ts")]

    # empty table is queryable with declared schema
    empty = eng.ddl_read("trades")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["ts", "sym", "price", "qty"]

    eng.sql(
        "INSERT INTO trades VALUES "
        "(TIMESTAMP '2024-01-01 00:00:00', 'AAPL', 10.0, 100), "
        "(TIMESTAMP '2024-01-02 01:00:00', 'MSFT', 20.0, 200)"
    )
    out = eng.sql("SELECT sym, price FROM trades ORDER BY sym")
    assert rows(out) == [("AAPL", 10.0), ("MSFT", 20.0)]

    parts = eng.sql("SHOW PARTITIONS FROM trades").collect()
    assert [r["partition"] for r in parts] == ["2024-01-01", "2024-01-02"]


def test_insert_select_and_column_subset(eng):
    eng.sql("CREATE TABLE a (ts TIMESTAMP, v DOUBLE) TIMESTAMP(ts)")
    eng.sql("INSERT INTO a VALUES (TIMESTAMP '2024-01-01 00:00:00', 1.5)")
    eng.sql("CREATE TABLE b (ts TIMESTAMP, v DOUBLE, tag STRING) TIMESTAMP(ts)")
    eng.sql("INSERT INTO b (ts, v) SELECT ts, v * 2 FROM a")
    assert rows(eng.sql("SELECT v, tag FROM b")) == [(3.0, None)]


def test_create_as_select_with_dedup(eng):
    eng.sql(
        "CREATE TABLE src AS ("
        "SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts, 'x' AS k, 1.0 AS v"
        ") TIMESTAMP(ts) PARTITION BY DAY DEDUP UPSERT KEYS(ts, k)"
    )
    # same (ts, k) again: upsert keeps the last write
    eng.sql("INSERT INTO src VALUES (TIMESTAMP '2024-01-01 00:00:00', 'x', 9.0)")
    eng.sql("INSERT INTO src VALUES (TIMESTAMP '2024-01-01 00:00:00', 'y', 2.0)")
    assert sorted(rows(eng.sql("SELECT k, v FROM src"))) == [("x", 9.0), ("y", 2.0)]


def test_update_and_where(eng):
    eng.sql("CREATE TABLE t (ts TIMESTAMP, v LONG) TIMESTAMP(ts)")
    eng.sql(
        "INSERT INTO t VALUES (TIMESTAMP '2024-01-01 00:00:00', 1), "
        "(TIMESTAMP '2024-01-02 00:00:00', 2)"
    )
    eng.sql("UPDATE t SET v = v * 10 WHERE v > 1")
    assert sorted(rows(eng.sql("SELECT v FROM t"))) == [(1,), (20,)]


def test_alter_column_surface(eng):
    eng.sql("CREATE TABLE t (ts TIMESTAMP, v LONG) TIMESTAMP(ts)")
    eng.sql("INSERT INTO t VALUES (TIMESTAMP '2024-01-01 00:00:00', 7)")
    eng.sql("ALTER TABLE t ADD COLUMN note STRING")
    eng.sql("INSERT INTO t VALUES (TIMESTAMP '2024-01-02 00:00:00', 8, 'hi')")
    got = sorted(rows(eng.sql("SELECT v, note FROM t")))
    assert got == [(7, None), (8, "hi")]

    eng.sql("ALTER TABLE t RENAME COLUMN note TO comment")
    cols = [r["column"] for r in eng.sql("SHOW COLUMNS FROM t").collect()]
    assert cols == ["ts", "v", "comment"]

    eng.sql("ALTER TABLE t ALTER COLUMN v TYPE DOUBLE")
    types = {r["column"]: r["type"] for r in eng.sql("SHOW COLUMNS FROM t").collect()}
    assert types["v"] == "double"
    assert sorted(rows(eng.sql("SELECT v FROM t"))) == [(7.0,), (8.0,)]

    eng.sql("ALTER TABLE t DROP COLUMN comment")
    cols = [r["column"] for r in eng.sql("SHOW COLUMNS FROM t").collect()]
    assert cols == ["ts", "v"]


def test_drop_partition_truncate_rename_drop(eng):
    eng.sql("CREATE TABLE t (ts TIMESTAMP, v LONG) TIMESTAMP(ts) PARTITION BY DAY")
    eng.sql(
        "INSERT INTO t VALUES (TIMESTAMP '2024-01-01 05:00:00', 1), "
        "(TIMESTAMP '2024-01-02 05:00:00', 2)"
    )
    eng.sql("ALTER TABLE t DROP PARTITION LIST '2024-01-01'")
    assert rows(eng.sql("SELECT v FROM t")) == [(2,)]

    eng.sql("RENAME TABLE t TO t2")
    assert rows(eng.sql("SELECT v FROM t2")) == [(2,)]

    eng.sql("TRUNCATE TABLE t2")
    assert eng.sql("SELECT * FROM t2").count() == 0
    # schema survives truncation
    assert [f.name for f in eng.ddl_read("t2").schema.fields] == ["ts", "v"]

    eng.sql("DROP TABLE t2")
    assert "t2" not in eng.ddl_tables
    eng.sql("DROP TABLE IF EXISTS t2")  # no error


def test_dialect_query_over_ddl_table(eng):
    """A DDL-created table participates in dialect queries (SAMPLE BY)."""
    eng.sql("CREATE TABLE m (ts TIMESTAMP, v DOUBLE) TIMESTAMP(ts) PARTITION BY DAY")
    eng.sql(
        "INSERT INTO m VALUES (TIMESTAMP '2024-01-01 00:10:00', 1.0), "
        "(TIMESTAMP '2024-01-01 00:20:00', 3.0), "
        "(TIMESTAMP '2024-01-01 01:10:00', 5.0)"
    )
    out = eng.sql("SELECT ts, avg(v) AS a FROM m SAMPLE BY 1h").orderBy("ts")
    assert [r["a"] for r in out.collect()] == [2.0, 5.0]


def test_hour_partitioning(eng):
    eng.sql("CREATE TABLE h (ts TIMESTAMP, v LONG) TIMESTAMP(ts) PARTITION BY HOUR")
    eng.sql(
        "INSERT INTO h VALUES (TIMESTAMP '2024-01-01 00:10:00', 1), "
        "(TIMESTAMP '2024-01-01 01:10:00', 2)"
    )
    parts = [r["partition"] for r in eng.sql("SHOW PARTITIONS FROM h").collect()]
    assert parts == ["2024-01-01-00", "2024-01-01-01"]
    eng.sql("ALTER TABLE h DROP PARTITION LIST '2024-01-01T00'")
    assert rows(eng.sql("SELECT v FROM h")) == [(2,)]
