"""Window-frame fuzz: random OVER specifications through the dialect
front-end (time-unit RANGE bounds, frame EXCLUDE lowering, named WINDOW
definitions, shorthand frames) cross-checked against DuckDB running the
independently-derived ANSI frame on the same rows.

The oracle translation re-derives the reference's EXCLUDE semantics in
the *test*, not through engine code: ROWS frames ending at CURRENT ROW
use DuckDB's native ``EXCLUDE CURRENT ROW``; time-RANGE frames shrink
the end by one microsecond tick (``WindowExcludeCurrentRowTest.java`` —
the reference's lowering drops the current row's timestamp PEERS too,
which native EXCLUDE would keep).

Values are quarters (exactly representable binary fractions) so window
sums are exact regardless of accumulation order and float comparison is
bit-for-bit.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from questdb_spark.sqlfront.engine import QdbEngine

N_CASES = 130
SEED = 0x9D8


def _table() -> pd.DataFrame:
    rng = random.Random(7)
    rows = []
    x = 0
    base = pd.Timestamp("2024-03-01 00:00:00")
    for sym in ("a", "b", "c"):
        t = 0
        for _ in range(14):
            # duplicate timestamps within and across symbols; gaps up to
            # minutes so second/minute RANGE bounds bite differently
            t += rng.choice([0, 0, 1, 1, 2, 5, 30, 61, 240])
            v = rng.choice([None, 0.25, 0.5, 1.25, 2.0, 3.75, -1.5, 2.0])
            rows.append((sym, x, base + pd.Timedelta(seconds=t), v))
            x += 1
    return pd.DataFrame(rows, columns=["sym", "x", "ts", "v"])


@pytest.fixture(scope="module")
def wtab(spark):
    pdf = _table()
    eng = QdbEngine(spark)
    eng.register("wtab", spark.createDataFrame(pdf), designated_ts="ts")
    con = duckdb.connect()
    con.register("wtab", pdf)
    yield eng, con
    con.close()


# (questdb_text, duckdb_text) renderers for a RANGE bound of n units
def _tbound(rng: random.Random, n: int, unit: str) -> tuple[str, str]:
    style = rng.randrange(3)
    if unit == "microsecond":
        # unitless QUOTED bound = designated-timestamp native resolution
        return f"'{n}'", f"INTERVAL {n} MICROSECOND"
    u = unit.upper()
    if style == 0:
        return f"'{n}' {u}", f"INTERVAL {n} {u}"
    if style == 1:
        return f"{n} {unit}", f"INTERVAL {n} {u}"
    return f"'{n}' {u.lower()}", f"INTERVAL {n} {u}"


def _gen_case(rng: random.Random) -> tuple[str, str]:
    """One random window spec → (dialect SELECT, DuckDB SELECT)."""
    part = rng.choice(["", "PARTITION BY sym "])
    kind = rng.choice(["rows", "rows", "range", "range", "rank", "value", "default"])

    if kind == "rank":
        fn = rng.choice(["rank()", "dense_rank()", "row_number()", "cume_dist()"])
        order = "ORDER BY ts" if fn in ("rank()", "dense_rank()") else "ORDER BY ts, x"
        spec = f"{part}{order}"
        expr_q = expr_d = f"{fn} OVER ({spec})"
        cast = "double"
        q = f"SELECT sym, x, cast({expr_q} AS {cast}) AS w FROM wtab"
        d = f"SELECT sym, x, cast({expr_d} AS {cast}) AS w FROM wtab"
        return q, d

    if kind == "value":
        fn = rng.choice(
            ["lead(v)", "lag(v)", "lead(v, 2)", "lag(v, 3)",
             "first_value(v)", "last_value(v)", "nth_value(v, 2)"]
        )
        frame_q = frame_d = ""
        if "value" in fn:
            lo = rng.choice(["UNBOUNDED PRECEDING", "3 PRECEDING", "1 PRECEDING"])
            hi = rng.choice(["CURRENT ROW", "1 FOLLOWING"])
            frame_q = frame_d = f" ROWS BETWEEN {lo} AND {hi}"
        spec_q = f"{part}ORDER BY ts, x{frame_q}"
        q = f"SELECT sym, x, cast({fn} OVER ({spec_q}) AS double) AS w FROM wtab"
        d = f"SELECT sym, x, cast({fn} OVER ({part}ORDER BY ts, x{frame_d}) AS double) AS w FROM wtab"
        return q, d

    agg = rng.choice(["sum(v)", "min(v)", "max(v)", "count(v)", "avg(v)", "count(*)"])

    if kind == "default":
        spec = f"{part}ORDER BY ts"
        q = f"SELECT sym, x, cast({agg} OVER ({spec}) AS double) AS w FROM wtab"
        return q, q.replace("FROM wtab", "FROM wtab", 1)

    if kind == "rows":
        # descending ordering flips which neighbors a frame sees; both
        # engines share the semantics, so DESC cases ride the same oracle
        direction = " DESC" if rng.random() < 0.25 else ""
        lo = rng.choice(
            ["UNBOUNDED PRECEDING", "5 PRECEDING", "2 PRECEDING", "1 PRECEDING",
             "CURRENT ROW"]
        )
        hi = rng.choice(
            ["CURRENT ROW", "CURRENT ROW", "1 PRECEDING", "2 FOLLOWING",
             "UNBOUNDED FOLLOWING"]
        )
        if lo == "CURRENT ROW" and hi == "1 PRECEDING":
            hi = "CURRENT ROW"
        frame_q = f"ROWS BETWEEN {lo} AND {hi}"
        frame_d = frame_q
        if hi == "CURRENT ROW" and lo != "CURRENT ROW" and rng.random() < 0.5:
            # EXCLUDE CURRENT ROW: dialect lowering vs DuckDB native
            frame_q += " EXCLUDE CURRENT ROW"
            frame_d += " EXCLUDE CURRENT ROW"
        elif rng.random() < 0.2:
            frame_q += " EXCLUDE NO OTHERS"  # no-op, stripped
        spec_q = f"{part}ORDER BY ts{direction}, x{direction} {frame_q}"
        spec_d = f"{part}ORDER BY ts{direction}, x{direction} {frame_d}"
    else:  # range
        micros = {"microsecond": 1, "second": 1_000_000, "minute": 60_000_000}
        lo = (rng.choice([1, 2, 5, 45, 90]),
              rng.choice(["second", "second", "minute", "microsecond"]))
        unbounded_lo = rng.random() < 0.25
        exclude = rng.random() < 0.4
        hi = None
        if rng.random() < 0.3 and not exclude:
            hi = (rng.choice([1, 2, 30]), rng.choice(["second", "microsecond"]))
            if not unbounded_lo and (
                hi[0] * micros[hi[1]] > lo[0] * micros[lo[1]]
            ):
                lo, hi = hi, lo  # frame start must not be after its end
        if unbounded_lo:
            lo_q = lo_d = "UNBOUNDED PRECEDING"
        else:
            lo_q, lo_d = _tbound(rng, *lo)
            lo_q, lo_d = f"{lo_q} PRECEDING", f"{lo_d} PRECEDING"
        if hi is None:
            hi_q = hi_d = "CURRENT ROW"
        else:
            hi_q, hi_d = _tbound(rng, *hi)
            hi_q, hi_d = f"{hi_q} PRECEDING", f"{hi_d} PRECEDING"
        frame_q = f"RANGE BETWEEN {lo_q} AND {hi_q}"
        frame_d = f"RANGE BETWEEN {lo_d} AND {hi_d}"
        direction = ""
        if exclude:
            frame_q += " EXCLUDE CURRENT ROW"
            # the reference's tick-shrink semantics: the end moves one
            # microsecond earlier, so the current row AND its timestamp
            # peers leave the frame (native EXCLUDE would keep peers)
            frame_d = (
                f"RANGE BETWEEN {lo_d} AND INTERVAL 1 MICROSECOND PRECEDING"
            )
        elif rng.random() < 0.25:
            # DESC time ordering: PRECEDING walks toward LATER timestamps
            direction = " DESC"
        spec_q = f"{part}ORDER BY ts{direction} {frame_q}"
        spec_d = f"{part}ORDER BY ts{direction} {frame_d}"

    if rng.random() < 0.25:
        # named WINDOW definition form
        q = (
            f"SELECT sym, x, cast({agg} OVER wdef AS double) AS w FROM wtab "
            f"WINDOW wdef AS ({spec_q})"
        )
    else:
        q = f"SELECT sym, x, cast({agg} OVER ({spec_q}) AS double) AS w FROM wtab"
    d = f"SELECT sym, x, cast({agg} OVER ({spec_d}) AS double) AS w FROM wtab"
    return q, d


def test_window_frame_fuzz(wtab):
    eng, con = wtab
    rng = random.Random(SEED)
    failures = []
    for i in range(N_CASES):
        q, d = _gen_case(rng)
        got = eng.sql(q).toPandas().sort_values(["sym", "x"]).reset_index(drop=True)
        exp = con.execute(d).fetchdf().sort_values(["sym", "x"]).reset_index(drop=True)
        gw = [None if pd.isna(v) else float(v) for v in got["w"]]
        ew = [None if pd.isna(v) else float(v) for v in exp["w"]]
        if gw != ew:
            diffs = [
                (int(got["x"][j]), gw[j], ew[j])
                for j in range(len(gw))
                if gw[j] != ew[j]
            ][:4]
            failures.append(f"case {i}: {q!r}\n  (x, got, want): {diffs}")
            if len(failures) >= 3:
                break
    assert not failures, "\n".join(failures)
