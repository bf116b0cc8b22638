"""HORIZON (markout) JOIN vs a DuckDB oracle.

``horizon_join``: per master row and horizon h, the latest slave row as
of ``master.ts + h``.  The oracle builds the exploded master x horizons
set in DuckDB and runs its native ASOF JOIN on the shifted timestamps —
an independent engine resolving the same lookups.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from questdb_spark.operators.window_join import horizon_join

HORIZONS = ["0 seconds", "30 seconds", "2 minutes"]
H_SQL = {"0 seconds": 0, "30 seconds": 30, "2 minutes": 120}


def _tables():
    base = pd.Timestamp("2024-01-01 00:00:00")
    m_rows, s_rows = [], []
    for i, (sym, off) in enumerate(
        [("a", 10), ("a", 100), ("b", 40), ("b", 350), ("c", 90)]
    ):
        m_rows.append((i, sym, base + pd.Timedelta(seconds=off), float(i)))
    for j, (sym, off) in enumerate(
        [("a", 8), ("a", 45), ("a", 130), ("b", 60), ("b", 345), ("d", 5)]
    ):
        s_rows.append((sym, base + pd.Timedelta(seconds=off), 0.25 * (j + 1)))
    return (
        pd.DataFrame(m_rows, columns=["mid", "sym", "ts", "mv"]),
        pd.DataFrame(s_rows, columns=["sym", "ts", "sv"]),
    )


@pytest.fixture(scope="module")
def htab(spark):
    mp, sp = _tables()
    con = duckdb.connect()
    con.register("m", mp)
    con.register("sl", sp)
    yield spark.createDataFrame(mp), spark.createDataFrame(sp), con
    con.close()


def test_horizon_join_vs_duckdb(htab):
    mdf, sdf, con = htab
    got_df = horizon_join(mdf, sdf, "ts", keys=["sym"], horizons=HORIZONS)
    got = sorted(
        (int(r.mid), H_SQL[r.horizon], None if pd.isna(r.sv) else float(r.sv))
        for r in got_df.select("mid", "horizon", "sv").toPandas().itertuples()
    )
    hvals = ", ".join(f"({v})" for v in H_SQL.values())
    exp_rows = con.execute(
        f"""
        WITH x AS (
          SELECT m.mid, h.off, m.sym,
                 m.ts + to_seconds(h.off) AS shifted
          FROM m CROSS JOIN (VALUES {hvals}) h(off)
        )
        SELECT x.mid, x.off, s.sv
        FROM x ASOF LEFT JOIN sl s
          ON x.sym = s.sym AND x.shifted >= s.ts
        """
    ).fetchdf()
    exp = sorted(
        (int(r.mid), int(r.off), None if pd.isna(r.sv) else float(r.sv))
        for r in exp_rows.itertuples()
    )
    assert got == exp
