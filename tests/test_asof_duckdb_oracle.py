"""ASOF/LT join matrix vs DuckDB's native ASOF JOIN — a third
independent oracle next to the pandas merge_asof property tests and the
registry's window-SQL oracles.

Combos: {ASOF, LT} x {keyed, keyless} x {no tolerance, 2m tolerance}.
Tolerance lowers in the oracle as a post-filter nulling matches older
than the window — equivalent to the reference's candidate filter, since
the matched row is the latest eligible one either way.  Slave rows have
unique timestamps per key (tie resolution is covered by the property
tests; DuckDB's pick among equal slave timestamps is unspecified).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from questdb_spark.operators.asof import asof_join, lt_join


def _tables():
    base = pd.Timestamp("2024-01-01 00:00:00")
    m_rows, s_rows = [], []
    for sym, offs in (("a", [5, 61, 62, 200, 500]), ("b", [30, 150, 420]), ("c", [90])):
        for i, off in enumerate(offs):
            m_rows.append((sym, base + pd.Timedelta(seconds=off), float(i)))
    for sym, offs in (("a", [4, 61, 180]), ("b", [100, 400]), ("d", [10])):
        for i, off in enumerate(offs):
            s_rows.append((sym, base + pd.Timedelta(seconds=off), 10.0 + i))
    return (
        pd.DataFrame(m_rows, columns=["sym", "ts", "mv"]),
        pd.DataFrame(s_rows, columns=["sym", "ts", "sv"]),
    )


@pytest.fixture(scope="module")
def atab(spark):
    mp, sp = _tables()
    con = duckdb.connect()
    con.register("m", mp)
    con.register("s", sp)
    yield spark.createDataFrame(mp), spark.createDataFrame(sp), con
    con.close()


def _oracle(con, kind: str, keyed: bool, tol: bool):
    op = ">=" if kind == "asof" else ">"
    eq = "m.sym = s.sym AND " if keyed else ""
    tol_case = (
        "CASE WHEN s.ts >= m.ts - INTERVAL 2 MINUTE THEN {c} END"
        if tol
        else "{c}"
    )
    sql = f"""
    SELECT m.sym AS sym, m.ts AS ts, m.mv AS mv,
           {tol_case.format(c='s.sv')} AS sv
    FROM m ASOF LEFT JOIN s ON {eq}m.ts {op} s.ts
    """
    return sorted(
        tuple(None if pd.isna(v) else v for v in r)
        for r in con.execute(sql).fetchdf().itertuples(index=False)
    )


def test_asof_matrix_vs_duckdb(atab):
    mdf, sdf, con = atab
    failures = []
    for kind in ("asof", "lt"):
        fn = asof_join if kind == "asof" else lt_join
        for keyed in (True, False):
            for tol in (False, True):
                got_df = fn(
                    mdf,
                    sdf.withColumnRenamed("ts", "s_ts").withColumnRenamed(
                        "sym", "s_sym"
                    ).withColumnRenamed("s_ts", "ts").withColumnRenamed(
                        "s_sym", "sym"
                    ),
                    "ts",
                    keys=["sym"] if keyed else [],
                    tolerance="2 MINUTE" if tol else None,
                )
                got = sorted(
                    tuple(None if pd.isna(v) else v for v in r)
                    for r in got_df.select("sym", "ts", "mv", "sv")
                    .toPandas()
                    .itertuples(index=False)
                )
                exp = _oracle(con, kind, keyed, tol)
                if got != exp:
                    diff = next(
                        (f"{a} != {b}" for a, b in zip(got, exp) if a != b),
                        f"lengths {len(got)} vs {len(exp)}",
                    )
                    failures.append(f"{kind} keyed={keyed} tol={tol}: {diff}")
    assert not failures, "\n".join(failures)
