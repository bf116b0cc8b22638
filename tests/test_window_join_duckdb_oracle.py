"""WINDOW JOIN matrix vs DuckDB correlated-subquery oracles.

For each master row the operator aggregates slave rows in
``[ts+lo, ts+hi]`` per key, optionally folding in the PREVAILING row
(latest slave strictly before the window start).  The oracle spells
each aggregate as a correlated scalar subquery — a completely different
plan shape from the bucketed equi-join lowering, so agreement checks
the semantics, not the implementation.

Combos: {keyed, keyless} x three window placements (past, strictly
past, future) x {plain, INCLUDE PREVAILING}.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from questdb_spark.operators.window_join import window_join

BOUNDS = [
    ("-2 minute", "0 second", "INTERVAL 2 MINUTE", "INTERVAL 0 SECOND"),
    ("-90 second", "-30 second", "INTERVAL 90 SECOND", "INTERVAL 30 SECOND"),
    ("0 second", "1 minute", "INTERVAL 0 SECOND", "- INTERVAL 1 MINUTE"),
]


def _tables():
    base = pd.Timestamp("2024-01-01 00:00:00")
    m_rows, s_rows = [], []
    for i, (sym, off) in enumerate(
        [("a", 10), ("a", 70), ("a", 200), ("b", 40), ("b", 400), ("c", 95)]
    ):
        m_rows.append((i, sym, base + pd.Timedelta(seconds=off), float(i)))
    for j, (sym, off) in enumerate(
        [("a", 5), ("a", 50), ("a", 65), ("a", 199), ("b", 35), ("b", 100),
         ("b", 390), ("d", 20)]
    ):
        s_rows.append((sym, base + pd.Timedelta(seconds=off), 0.25 * (j + 1)))
    return (
        pd.DataFrame(m_rows, columns=["mid", "sym", "ts", "mv"]),
        pd.DataFrame(s_rows, columns=["sym", "ts", "sv"]),
    )


@pytest.fixture(scope="module")
def wjtab(spark):
    mp, sp = _tables()
    con = duckdb.connect()
    con.register("m", mp)
    con.register("sl", sp)
    yield spark.createDataFrame(mp), spark.createDataFrame(sp), con
    con.close()


def _oracle(con, keyed: bool, lo_sql: str, hi_sql: str, prevailing: bool):
    eq = "s.sym = m.sym AND " if keyed else ""
    eq2 = "s2.sym = m.sym AND " if keyed else ""
    window = (
        f"SELECT s.sv AS sv FROM sl s WHERE {eq}"
        f"s.ts >= m.ts - {lo_sql} AND s.ts <= m.ts - ({hi_sql})"
    )
    if prevailing:
        prev = (
            f"SELECT * FROM (SELECT s2.sv AS sv FROM sl s2 WHERE {eq2}"
            f"s2.ts < m.ts - {lo_sql} ORDER BY s2.ts DESC LIMIT 1)"
        )
        src = f"SELECT sv FROM ({window} UNION ALL {prev})"
    else:
        src = window
    sql = f"""
    SELECT m.mid AS mid,
           (SELECT sum(sv) FROM ({src})) AS s_sum,
           (SELECT count(sv) FROM ({src})) AS s_n
    FROM m ORDER BY m.mid
    """
    return [
        tuple(None if pd.isna(v) else float(v) for v in r)
        for r in con.execute(sql).fetchdf().itertuples(index=False)
    ]


def test_window_join_matrix_vs_duckdb(wjtab):
    mdf, sdf, con = wjtab
    failures = []
    for lo, hi, lo_sql, hi_sql in BOUNDS:
        for keyed in (True, False):
            for prevailing in (False, True):
                got_df = window_join(
                    mdf,
                    sdf,
                    "ts",
                    keys=["sym"] if keyed else [],
                    lo=lo,
                    hi=hi,
                    aggs={
                        "s_sum": F.sum("s.sv"),
                        "s_n": F.count("s.sv"),
                    },
                    master_id="mid",
                    include_prevailing=prevailing,
                )
                got = [
                    tuple(None if pd.isna(v) else float(v) for v in r)
                    for r in got_df.select("mid", "s_sum", "s_n")
                    .orderBy("mid")
                    .toPandas()
                    .itertuples(index=False)
                ]
                exp = _oracle(con, keyed, lo_sql, hi_sql, prevailing)
                if got != exp:
                    diff = next(
                        (f"{a} != {b}" for a, b in zip(got, exp) if a != b),
                        f"lengths {len(got)} vs {len(exp)}",
                    )
                    failures.append(
                        f"[{lo},{hi}] keyed={keyed} prevailing={prevailing}: {diff}"
                    )
    assert not failures, "\n".join(failures)
