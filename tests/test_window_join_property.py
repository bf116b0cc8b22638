"""Property test: WINDOW JOIN (constant AND dynamic per-row bounds) vs a
plain range-join oracle computed in pandas on random data — independent of
the bucketed lowering under test.

Reference semantics: ``WindowJoinRecordCursorFactory.java:82`` — for each
master row aggregate slave rows with ``master.ts + lo <= slave.ts <=
master.ts + hi`` per key; dynamic bounds (``WindowJoinTest
testDynamicWindow*``) read lo/hi from master columns per row; NULL bounds
give an empty window; INCLUDE PREVAILING adds the latest slave row
strictly before the window start.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from questdb_spark.operators.window_join import window_join

BASE = datetime(2024, 1, 1)


def _tables(rng: random.Random, n_master: int, n_slave: int):
    keys = ["a", "b"]
    master = pd.DataFrame(
        {
            "mid": range(n_master),
            "k": [rng.choice(keys) for _ in range(n_master)],
            "ts": [BASE + timedelta(seconds=rng.randrange(0, 400))
                   for _ in range(n_master)],
            "lo_s": [rng.choice([None, 0, 5, 30, 120])
                     for _ in range(n_master)],
            "hi_s": [rng.choice([0, 10, 60]) for _ in range(n_master)],
        }
    )
    seen, rows = set(), []
    while len(rows) < n_slave:
        k, t = rng.choice(keys), rng.randrange(0, 400)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rows.append((k, BASE + timedelta(seconds=t), float(rng.randrange(1, 100))))
    # nullable Int64: None must reach Spark as a true NULL, not NaN
    master["lo_s"] = master["lo_s"].astype("Int64")
    master["hi_s"] = master["hi_s"].astype("Int64")
    slave = pd.DataFrame(rows, columns=["k", "ts", "sv"])
    return master, slave


def _oracle(mpd, spd, lo_of, hi_of, prevailing):
    out = []
    for _, m in mpd.iterrows():
        lo_s, hi_s = lo_of(m), hi_of(m)
        if lo_s is None or hi_s is None or pd.isna(lo_s) or pd.isna(hi_s):
            out.append((int(m["mid"]), None, 0))
            continue
        start = m["ts"] - timedelta(seconds=lo_s)
        end = m["ts"] + timedelta(seconds=hi_s)
        win = spd[(spd.k == m.k) & (spd.ts >= start) & (spd.ts <= end)]
        vals = list(win.sv)
        if prevailing:
            before = spd[(spd.k == m.k) & (spd.ts < start)]
            if len(before):
                vals.append(before.loc[before.ts.idxmax()].sv)
        out.append((int(m["mid"]), float(sum(vals)) if vals else None, len(vals)))
    return sorted(out, key=lambda t: t[0])


@pytest.mark.parametrize("prevailing", [False, True])
def test_window_join_dynamic_matches_oracle(spark, prevailing):
    rng = random.Random(20260814 + int(prevailing))
    for trial in range(4):
        mpd, spd = _tables(rng, n_master=20, n_slave=25)
        m = spark.createDataFrame(mpd)
        s = spark.createDataFrame(spd)
        got_df = window_join(
            m, s, "ts", ["k"],
            "dyn:(-1) * CAST((lo_s) AS BIGINT) * 1000000",
            "dyn:(1) * CAST((hi_s) AS BIGINT) * 1000000",
            aggs={
                "sv_sum": F.expr("sum(s.sv)"),
                "n": F.expr("count(s.sv)"),
            },
            master_id="mid",
            include_prevailing=prevailing,
        )
        got = sorted(
            ((r["mid"], r["sv_sum"], r["n"]) for r in got_df.collect()),
            key=lambda t: t[0],
        )
        want = _oracle(
            mpd, spd,
            lambda m_: m_["lo_s"],
            lambda m_: m_["hi_s"],
            prevailing,
        )
        assert got == want, f"trial {trial}: {got} != {want}"


def test_window_join_constant_matches_oracle(spark):
    rng = random.Random(99)
    mpd, spd = _tables(rng, n_master=20, n_slave=25)
    m = spark.createDataFrame(mpd.drop(columns=["lo_s", "hi_s"]))
    s = spark.createDataFrame(spd)
    got_df = window_join(
        m, s, "ts", ["k"], "-30 seconds", "30 seconds",
        aggs={"sv_sum": F.expr("sum(s.sv)"), "n": F.expr("count(s.sv)")},
        master_id="mid",
    )
    got = sorted((r["mid"], r["sv_sum"], r["n"]) for r in got_df.collect())
    want = _oracle(mpd, spd, lambda m_: 30, lambda m_: 30, False)
    assert got == want


def test_window_join_dynamic_constant_bounds_fold_without_master_scan(
    spark, monkeypatch
):
    """VERDICT r5 task 7: constant-foldable dyn bounds must derive the
    bucket width at plan time — no scalar aggregate over the master.
    Guard: any .collect() during plan build trips the sentinel."""
    from pyspark.sql import DataFrame as _DF

    rng = random.Random(7)
    mpd, spd = _tables(rng, n_master=10, n_slave=15)
    m = spark.createDataFrame(mpd)
    s = spark.createDataFrame(spd)

    def boom(self):
        raise AssertionError("plan-time collect over the master")

    monkeypatch.setattr(_DF, "collect", boom)
    got_df = window_join(
        m, s, "ts", ["k"],
        "dyn:(-30) * 1000000",
        "dyn:30 * 1000000",
        aggs={"sv_sum": F.expr("sum(s.sv)"), "n": F.expr("count(s.sv)")},
        master_id="mid",
    )
    monkeypatch.undo()
    got = sorted(
        ((r["mid"], r["sv_sum"], r["n"]) for r in got_df.collect()),
        key=lambda t: t[0],
    )
    want = _oracle(mpd, spd, lambda m_: 30, lambda m_: 30, False)
    assert got == want
