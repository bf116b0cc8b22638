"""LATEST ON matrix vs a DuckDB row_number oracle.

Combos: one and two partition keys, with and without a WHERE pre-filter
(the reference filters BEFORE resolving latest), and duplicate
timestamps within a key resolved by the explicit tiebreak column (the
batch stand-in for the reference's physical row order).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from questdb_spark.operators.latest import latest_on


def _table() -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    rid = 0
    for sym, grp, offs in (
        ("a", "x", [10, 50, 50]),   # duplicate latest ts within the key
        ("a", "y", [20, 70]),
        ("b", "x", [5]),
        ("b", "y", [90, 30]),
    ):
        for off in offs:
            rows.append((rid, sym, grp, base + pd.Timedelta(seconds=off), float(rid)))
            rid += 1
    return pd.DataFrame(rows, columns=["rid", "sym", "grp", "ts", "v"])


@pytest.fixture(scope="module")
def ltab(spark):
    pdf = _table()
    con = duckdb.connect()
    con.register("t", pdf)
    yield spark.createDataFrame(pdf), con
    con.close()


def _oracle(con, keys, where):
    k = ", ".join(keys)
    w = f"WHERE {where}" if where else ""
    sql = f"""
    SELECT rid FROM (
      SELECT rid, row_number() OVER (
        PARTITION BY {k} ORDER BY ts DESC, rid DESC) AS rn
      FROM t {w}
    ) WHERE rn = 1
    """
    return sorted(r[0] for r in con.execute(sql).fetchall())


def test_latest_on_matrix(ltab):
    df, con = ltab
    for keys in (["sym"], ["sym", "grp"]):
        for where in (None, "v >= 2"):
            src = df.filter(where) if where else df
            got = sorted(
                r.rid
                for r in latest_on(src, "ts", keys, tiebreak="rid").collect()
            )
            assert got == _oracle(con, keys, where), (keys, where)
