"""Grammar-equivalence fuzz: every dialect shorthand must return exactly
the rows of its explicit spelling.  Pairs generated deterministically and
compared engine-vs-engine (the explicit forms are themselves oracle-checked
elsewhere — registry + corpus — so equality transfers).

Shorthands exercised: optional-SELECT bare tables, legacy LATEST BY,
implicit GROUP BY, ``= '<interval>'`` vs ``IN``, reversed timestamp
BETWEEN, EXCLUDE CURRENT ROW vs the explicitly shrunk frame, WITH
bindings vs inlined subqueries, negative LIMIT vs the window spelling.
"""

from __future__ import annotations

import random

import pytest

from questdb_spark.sources.parquet import load_table
from questdb_spark.sqlfront.engine import QdbEngine

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def geng(spark):
    e = QdbEngine(spark)
    e.register(
        "events",
        load_table(spark, SF_DIR, "events"),
        designated_ts="ts",
        tiebreak="event_id",
    )
    return e


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _pairs(rng: random.Random):
    days = [f"2024-01-{d:02d}" for d in range(10, 20)]
    for _ in range(6):
        d = rng.choice(days)
        u = rng.randrange(2, 9)
        yield (
            f"events WHERE ts = '{d}' AND user_id % {u} = 1",
            f"SELECT * FROM events WHERE ts IN '{d}' AND user_id % {u} = 1",
        )
    for _ in range(4):
        lo, hi = sorted(rng.sample(days, 2))
        yield (
            f"SELECT count() n FROM events WHERE ts BETWEEN '{hi}' AND '{lo}'",
            f"SELECT count(*) AS n FROM events WHERE ts >= '{lo}' "
            f"AND ts <= '{hi}'",
        )
    for _ in range(4):
        v = rng.randrange(5, 95)
        yield (
            f"events WHERE value > {v} LATEST BY user_id",
            f"SELECT * FROM events WHERE value > {v} "
            "LATEST ON ts PARTITION BY user_id",
        )
    for _ in range(4):
        m = rng.randrange(2, 7)
        yield (
            f"SELECT user_id % {m} g, count() n, min(value) mn FROM events",
            f"SELECT user_id % {m} AS g, count(*) AS n, min(value) AS mn "
            "FROM events GROUP BY g",
        )
    for _ in range(4):
        k = rng.randrange(2, 6)
        yield (
            "SELECT event_id, cast(sum(cast(value AS DECIMAL(12,2))) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW "
            "EXCLUDE CURRENT ROW) AS DOUBLE) w FROM events",
            "SELECT event_id, cast(sum(cast(value AS DECIMAL(12,2))) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING) AS DOUBLE) AS w "
            "FROM events",
        )
    for _ in range(3):
        n1, n2 = sorted(rng.sample(range(5, 60), 2))
        yield (
            f"SELECT event_id FROM events ORDER BY ts, event_id "
            f"LIMIT -{n2}, -{n1}",
            "SELECT event_id FROM (SELECT event_id, "
            "row_number() OVER (ORDER BY ts, event_id) rn, "
            "count(*) OVER () cnt FROM events) "
            f"WHERE rn > cnt - {n2} AND rn <= cnt - {n1}",
        )
    for _ in range(3):
        u = rng.randrange(2, 9)
        yield (
            f"WITH s AS (SELECT ts, count() c FROM events "
            f"WHERE user_id % {u} = 0 SAMPLE BY 1d) "
            "SELECT max(c) m FROM s",
            f"SELECT max(c) AS m FROM (SELECT ts, count(*) AS c FROM events "
            f"WHERE user_id % {u} = 0 SAMPLE BY 1d)",
        )


def test_grammar_equivalence(geng):
    rng = random.Random(0xE9)
    failures = []
    for i, (short, explicit) in enumerate(_pairs(rng)):
        a = rows(geng.sql(short))
        b = rows(geng.sql(explicit))
        if a != b:
            failures.append(
                f"pair {i}: {short!r}\n  vs {explicit!r}\n"
                f"  rows {len(a)} vs {len(b)}; first diff: "
                f"{next((x for x, y in zip(a, b) if x != y), (a or b)[:1])}"
            )
            if len(failures) >= 3:
                break
    assert not failures, "\n".join(failures)
