"""Property test: ASOF / LT join vs DuckDB's NATIVE ASOF JOIN on random
data — an oracle independent of both our implementation and the fixed
testdata (the registry oracles express ASOF as correlated subqueries; this
cross-checks against a second engine's built-in operator).

Reference semantics: `AsOfJoinRecordCursorFactory.java` — for each master
row, the latest slave row with slave.ts <= master.ts (strictly < for LT),
per key group; unmatched masters survive with nulls.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest

from questdb_spark.operators.asof import asof_join, lt_join

BASE = datetime(2024, 1, 1)


def _random_tables(rng: random.Random, n_master: int, n_slave: int):
    keys = ["a", "b", "c"]
    master = pd.DataFrame(
        {
            "mid": range(n_master),
            "k": [rng.choice(keys) for _ in range(n_master)],
            "ts": [BASE + timedelta(seconds=rng.randrange(0, 500)) for _ in range(n_master)],
            "mv": [rng.randrange(0, 1000) for _ in range(n_master)],
        }
    )
    # slave must be unique per (k, ts) — the documented determinism contract
    seen, rows = set(), []
    while len(rows) < n_slave:
        k = rng.choice(keys)
        t = rng.randrange(0, 500)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rows.append((k, BASE + timedelta(seconds=t), rng.randrange(0, 1000)))
    slave = pd.DataFrame(rows, columns=["k", "ts", "sv"])
    return master, slave


@pytest.mark.parametrize("strict", [False, True])
def test_asof_lt_match_duckdb_native(spark, strict):
    rng = random.Random(20260813 + int(strict))
    for trial in range(6):
        mpd, spd = _random_tables(rng, n_master=25, n_slave=20)
        m = spark.createDataFrame(mpd)
        s = spark.createDataFrame(spd)
        fn = lt_join if strict else asof_join
        got = (
            fn(m, s, "ts", keys=["k"])
            .select("mid", "k", "ts", "mv", "sv", "slave_ts")
            .toPandas()
            .sort_values("mid")
            .reset_index(drop=True)
        )

        con = duckdb.connect()
        con.register("m", mpd)
        con.register("s", spd)
        op = ">" if strict else ">="
        exp = con.execute(
            f"""
            SELECT m.mid, m.k, m.ts, m.mv, s.sv AS sv, s.ts AS slave_ts
            FROM m ASOF LEFT JOIN s ON m.k = s.k AND m.ts {op} s.ts
            ORDER BY m.mid
            """
        ).fetchdf()

        assert len(got) == len(mpd), f"trial {trial}: row count"
        for col in ["mid", "k", "ts", "mv", "sv", "slave_ts"]:
            a = got[col].tolist()
            b = exp[col].tolist()
            norm = lambda v: None if pd.isna(v) else v  # noqa: E731
            assert [norm(x) for x in a] == [norm(x) for x in b], (
                f"trial {trial} strict={strict} col {col}"
            )
