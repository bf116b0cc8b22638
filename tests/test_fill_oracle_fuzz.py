"""SAMPLE BY FILL matrix vs a DuckDB gap-fill oracle.

Every combination of {interval} x {keyed, unkeyed} x {FILL null/0/prev}
x {bare, FROM/TO spine} is compared row-for-row against an
independently-constructed DuckDB query: generate_series spine (cross
keys when keyed), left-join of the bucketed aggregates, and the fill —
COALESCE for value fill, ``last_value(x IGNORE NULLS) OVER`` for prev.

Semantics pinned (SampleByFill*RecordCursorFactory): the spine spans the
observed global bucket range (or [FROM, TO) when given), keyed fills
produce the full spine per observed key, FILL(prev) before a key's
first observation stays NULL, and every aggregate column fills
uniformly.  Values are exactly-representable quarters so min/max/sum
compare bit-for-bit.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from questdb_spark.sources.parquet import load_table  # noqa: F401 (fixture parity)
from questdb_spark.sqlfront.engine import QdbEngine

INTERVALS = [("30s", "INTERVAL 30 SECOND"), ("2m", "INTERVAL 2 MINUTE")]
FILLS = ["null", "0", "prev"]
FROM_TO = [None, ("2024-03-01T00:02:00Z", "2024-03-01T00:14:00Z")]


def _table() -> pd.DataFrame:
    rows = []
    base = pd.Timestamp("2024-03-01 00:00:00")
    # two keys with different densities and a long shared gap
    for sym, offsets in (
        ("a", [5, 35, 65, 100, 410, 430, 700]),
        ("b", [10, 80, 420]),
    ):
        for i, off in enumerate(offsets):
            v = None if i % 4 == 3 else 0.25 * ((i + 1) * 3 % 17)
            rows.append((sym, base + pd.Timedelta(seconds=off), v))
    return pd.DataFrame(rows, columns=["sym", "ts", "v"])


@pytest.fixture(scope="module")
def ftab(spark):
    pdf = _table()
    eng = QdbEngine(spark)
    eng.register("ftab", spark.createDataFrame(pdf), designated_ts="ts")
    con = duckdb.connect()
    con.register("ftab", pdf)
    yield eng, con
    con.close()


def _oracle_sql(iv_sql: str, keyed: bool, fill: str, fromto) -> str:
    keycols = "sym," if keyed else ""
    keysel = "k.sym," if keyed else ""
    keyjoin = " AND b.sym = k.sym" if keyed else ""
    if fromto:
        lo, hi = fromto
        span = (
            f"SELECT unnest(generate_series(TIMESTAMP '{lo.replace('T', ' ').rstrip('Z')}',"
            f" TIMESTAMP '{hi.replace('T', ' ').rstrip('Z')}' - {iv_sql}, {iv_sql})) AS ts"
        )
    else:
        span = (
            f"SELECT unnest(generate_series(min_b, max_b, {iv_sql})) AS ts FROM "
            f"(SELECT min(time_bucket({iv_sql}, ts)) min_b,"
            f" max(time_bucket({iv_sql}, ts)) max_b FROM ftab)"
        )
    keys_src = (
        "CROSS JOIN (SELECT DISTINCT sym FROM ftab) k" if keyed else ""
    )
    if fill == "null":
        f = "b.{c}"
    elif fill == "prev":
        f = (
            "last_value(b.{c} IGNORE NULLS) OVER ("
            + ("PARTITION BY " + ("k.sym" if keyed else "1") + " ")
            + "ORDER BY s.ts)"
        )
    else:
        f = f"coalesce(b.{{c}}, {fill})"
    cols = ", ".join(
        f.format(c=c) + f" AS {c}" for c in ("n_v", "mn", "mx")
    )
    return f"""
    SELECT s.ts AS ts, {keysel} {cols}
    FROM ({span}) s {keys_src}
    LEFT JOIN (
      SELECT time_bucket({iv_sql}, ts) AS b, {keycols} count(v) AS n_v,
             min(v) AS mn, max(v) AS mx
      FROM ftab GROUP BY ALL
    ) b ON b.b = s.ts{keyjoin}
    """


def _norm(df: pd.DataFrame, keyed: bool) -> list[tuple]:
    cols = ["ts"] + (["sym"] if keyed else []) + ["n_v", "mn", "mx"]
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(
            tuple(None if pd.isna(v) else (float(v) if isinstance(v, (int, float)) else v) for v in row)
        )
    return sorted(out, key=repr)


def test_fill_matrix_vs_duckdb(ftab):
    eng, con = ftab
    failures = []
    for iv_q, iv_sql in INTERVALS:
        for keyed in (False, True):
            for fill in FILLS:
                for fromto in FROM_TO:
                    keysel = "sym, " if keyed else ""
                    ft = (
                        f" FROM '{fromto[0]}' TO '{fromto[1]}'" if fromto else ""
                    )
                    q = (
                        f"SELECT ts, {keysel}count(v) AS n_v, min(v) AS mn, "
                        f"max(v) AS mx FROM ftab SAMPLE BY {iv_q} "
                        f"FILL({fill}){ft}"
                    )
                    got = _norm(eng.sql(q).toPandas(), keyed)
                    exp = _norm(
                        con.execute(
                            _oracle_sql(iv_sql, keyed, fill, fromto)
                        ).fetchdf(),
                        keyed,
                    )
                    if got != exp:
                        diff = next(
                            (f"{a} != {b}" for a, b in zip(got, exp) if a != b),
                            f"lengths {len(got)} vs {len(exp)}",
                        )
                        failures.append(f"{q!r}: {diff}")
                        if len(failures) >= 3:
                            break
    assert not failures, "\n".join(failures)
