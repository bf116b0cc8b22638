"""SPLICE JOIN vs a DuckDB window-carry oracle.

Splice = full-outer time-ordered merge: one output row per timestamp
from either side, carrying the latest payload of BOTH sides as of that
timestamp (``SpliceJoinLightRecordCursorFactory.java:62``).  The oracle
rebuilds it in DuckDB from first principles: union both sides' events,
then ``last_value(... IGNORE NULLS)`` per key over a RANGE frame (rows
sharing a timestamp see each other — the reference's at-or-before
semantics).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from questdb_spark.operators.asof import splice_join


def _tables():
    base = pd.Timestamp("2024-01-01 00:00:00")
    m_rows, s_rows = [], []
    # include a shared timestamp (60) and keys unique to each side
    for sym, offs in (("a", [10, 60, 120]), ("b", [30]), ("mo", [45])):
        for i, off in enumerate(offs):
            m_rows.append((sym, base + pd.Timedelta(seconds=off), float(i + 1)))
    for sym, offs in (("a", [5, 60, 90]), ("b", [100]), ("so", [50])):
        for i, off in enumerate(offs):
            s_rows.append((sym, base + pd.Timedelta(seconds=off), 10.0 + i))
    return (
        pd.DataFrame(m_rows, columns=["sym", "ts", "mv"]),
        pd.DataFrame(s_rows, columns=["sym", "ts", "sv"]),
    )


@pytest.fixture(scope="module")
def sptab(spark):
    mp, sp = _tables()
    con = duckdb.connect()
    con.register("m", mp)
    con.register("sl", sp)
    yield spark.createDataFrame(mp), spark.createDataFrame(sp), con
    con.close()


def test_splice_join_vs_duckdb(sptab):
    mdf, sdf, con = sptab
    got_df = splice_join(mdf, sdf, "ts", keys=["sym"])
    cols = sorted(got_df.columns)
    got = sorted(
        (
            tuple(None if pd.isna(v) else v for v in r)
            for r in got_df.select(*cols).toPandas().itertuples(index=False)
        ),
        key=repr,
    )
    exp_rows = con.execute(
        """
        WITH u AS (
          SELECT sym, ts, ts AS m_ts_e, mv AS mv_e,
                 NULL::TIMESTAMP AS s_ts_e, NULL::DOUBLE AS sv_e FROM m
          UNION ALL
          SELECT sym, ts, NULL, NULL, ts, sv FROM sl
        )
        SELECT sym, ts,
          last_value(m_ts_e IGNORE NULLS) OVER w AS master_ts,
          last_value(mv_e   IGNORE NULLS) OVER w AS mv,
          last_value(s_ts_e IGNORE NULLS) OVER w AS slave_ts,
          last_value(sv_e   IGNORE NULLS) OVER w AS sv
        FROM u
        WINDOW w AS (PARTITION BY sym ORDER BY ts
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    ).fetchdf()
    exp = sorted(
        (
            tuple(None if pd.isna(v) else v for v in r)
            for r in exp_rows[cols].itertuples(index=False)
        ),
        key=repr,
    )
    assert got == exp
