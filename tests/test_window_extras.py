"""GROUPS-frame / EXCLUDE emulation verified against DuckDB (which
supports both natively) — the sqllogictest-style check for SURVEY §2.5's
gap fillers."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from questdb_spark.functions.window_extras import groups_frame_sum, sum_exclude, vwema

ROWS = [
    # (id, k, ord, v) with deliberate peer groups in `ord`
    (1, "a", 1, 10.0), (2, "a", 1, 20.0), (3, "a", 2, 30.0),
    (4, "a", 3, 40.0), (5, "a", 3, 50.0), (6, "a", 5, 60.0),
    (7, "b", 1, 1.0), (8, "b", 2, 2.0),
]


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame(ROWS, columns=["id", "k", "o", "v"])


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("t", pdf)
    return {r[0]: r[1] for r in con.execute(sql).fetchall()}


def test_groups_frame(spark, pdf):
    # DuckDB doesn't implement GROUPS frames either — hand-computed oracle.
    # peer groups (k=a): o=1 {10,20}, o=2 {30}, o=3 {40,50}, o=5 {60}
    df = spark.createDataFrame(ROWS, ["id", "k", "o", "v"])
    got = {
        r["id"]: r["gs"]
        for r in groups_frame_sum(df, "v", "o", ["k"], 1, 0, out_col="gs").collect()
    }
    assert got == {
        1: 30.0, 2: 30.0,          # group o=1, no preceding group
        3: 60.0,                   # o=1 + o=2
        4: 120.0, 5: 120.0,        # o=2 + o=3
        6: 150.0,                  # o=3 + o=5 (GROUPS counts groups, not o-distance)
        7: 1.0, 8: 3.0,
    }


@pytest.mark.parametrize("exclude", ["current row", "group", "ties", "no others"])
def test_exclude_vs_duckdb(spark, pdf, exclude):
    df = spark.createDataFrame(ROWS, ["id", "k", "o", "v"])
    got = {
        r["id"]: r["se"]
        for r in sum_exclude(df, "v", "o", ["k"], exclude, out_col="se").collect()
    }
    want = _duck(
        pdf,
        f"""SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY o
              RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
              EXCLUDE {exclude.upper()}) FROM t""",
    )
    # DuckDB returns NULL for an empty frame; our subtraction yields 0/NULL
    norm = lambda d: {k: (None if v is None else round(v, 9)) for k, v in d.items()}  # noqa: E731
    assert norm(got) == norm(want)


def test_vwema_runs(spark):
    from datetime import datetime, timedelta

    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=i), 10.0 + i, 1.0 + (i % 3))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["i", "ts", "px", "vol"])
    out = vwema(df, "ts", "px", "vol", alpha=0.2).toPandas().sort_values("i")
    assert out["vwema"].notna().all()
    # vwema of a rising series stays within the observed price range
    assert (out["vwema"] >= 10.0).all() and (out["vwema"] <= 60.0).all()


@pytest.mark.parametrize("agg", ["min", "max", "count", "avg", "sum"])
@pytest.mark.parametrize("exclude", ["current row", "group", "ties"])
def test_agg_exclude_vs_duckdb(spark, pdf, agg, exclude):
    """Generalized EXCLUDE (r4): every agg × clause vs DuckDB's native
    EXCLUDE window clause."""
    from questdb_spark.functions.window_extras import agg_exclude

    df = spark.createDataFrame(ROWS, ["id", "k", "o", "v"])
    got = {
        r["id"]: r["x"]
        for r in agg_exclude(df, "v", "o", ["k"], exclude, agg, out_col="x").collect()
    }
    want = _duck(
        pdf,
        f"SELECT id, {agg}(v) OVER (PARTITION BY k ORDER BY o "
        f"RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING "
        f"EXCLUDE {exclude.upper()}) FROM t",
    )
    for i in want:
        g, w = got[i], want[i]
        assert (g is None and w is None) or abs(g - w) < 1e-9, (agg, exclude, i, g, w)


def test_groups_frame_agg_min_avg(spark):
    """GROUPS frames for min/avg — hand-computed oracle (DuckDB lacks
    GROUPS). peer groups (k=a): o=1 {10,20}, o=2 {30}, o=3 {40,50}, o=5 {60}."""
    from questdb_spark.functions.window_extras import groups_frame_agg

    df = spark.createDataFrame(ROWS, ["id", "k", "o", "v"])
    got = {
        r["id"]: r["x"]
        for r in groups_frame_agg(df, "v", "o", ["k"], 1, 0, "min", "x").collect()
    }
    assert got == {1: 10.0, 2: 10.0, 3: 10.0, 4: 30.0, 5: 30.0, 6: 40.0, 7: 1.0, 8: 1.0}
    got = {
        r["id"]: r["x"]
        for r in groups_frame_agg(df, "v", "o", ["k"], 1, 0, "avg", "x").collect()
    }
    assert got == {1: 15.0, 2: 15.0, 3: 20.0, 4: 40.0, 5: 40.0, 6: 50.0, 7: 1.0, 8: 1.5}
