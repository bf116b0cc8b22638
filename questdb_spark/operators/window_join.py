"""WINDOW JOIN and HORIZON (markout) JOIN.

Reference semantics:
- WINDOW JOIN: for each master row, aggregate slave rows whose timestamp
  falls in ``[master.ts + lo, master.ts + hi]``, per equi-key —
  ``griffin/engine/join/WindowJoinRecordCursorFactory.java:82``, parse
  ``griffin/SqlParser.java:4754``.
- HORIZON JOIN / MARKOUT: evaluate an ASOF-style lookup at several future
  horizons per master row, then aggregate per horizon —
  ``griffin/engine/table/HorizonJoinRecordCursorFactory.java:73-95``,
  ``griffin/engine/join/MarkoutHorizonRecordCursorFactory.java:95``.

Spark-first lowering:
- WINDOW JOIN = equi-join on keys + range predicate on ts, then re-aggregate
  on the master row id. With equi-keys Catalyst picks a hash join and the
  range predicate stays a cheap post-filter; AQE handles skew.
- HORIZON JOIN = ``explode(horizons)`` over the master (cheap row
  multiplication), shift ts, one ASOF join, aggregate per horizon. The
  explode-then-asof shape keeps everything in one shuffle per stage and
  scales linearly in |horizons|.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .asof import asof_join


def window_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    lo: str,
    hi: str,
    aggs: Mapping[str, Column],
    master_id: str,
) -> DataFrame:
    """For each master row, aggregate slave rows in [ts+lo, ts+hi] per key.

    ``lo``/``hi`` are SQL interval strings (lo may be negative, e.g.
    ``'-1 hour'``). ``aggs`` reference slave columns as ``s.<col>`` via the
    provided aliases; ``master_id`` must uniquely identify master rows.
    """
    keys = list(keys)
    m = master.alias("m")
    s = slave.alias("s")
    # interval strings may be negative ('-1 hour') — Spark accepts INTERVAL -1 HOUR
    cond = F.expr(
        " AND ".join(
            [f"m.{k} <=> s.{k}" for k in keys]
            + [
                f"s.{ts_col} >= m.{ts_col} + INTERVAL {lo}",
                f"s.{ts_col} <= m.{ts_col} + INTERVAL {hi}",
            ]
        )
    )
    joined = m.join(s, cond, "left")
    mcols = [f"m.{c}" for c in master.columns]
    return joined.groupBy(*[F.col(c) for c in mcols]).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def horizon_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    horizons: Sequence[str],
    horizon_col: str = "horizon",
) -> DataFrame:
    """Markout: for each master row and each horizon interval, the latest
    slave row as of ``master.ts + horizon``. Returns master columns +
    ``horizon_col`` (the interval string) + slave payload columns.
    """
    arr = F.array(*[F.lit(h) for h in horizons])
    exploded = master.withColumn(horizon_col, F.explode(arr))
    shifted = exploded.withColumn("__orig_ts", F.col(ts_col)).withColumn(
        ts_col,
        F.col(ts_col)
        + F.expr(f"CASE {horizon_col} "
                 + " ".join(f"WHEN '{h}' THEN INTERVAL {h}" for h in horizons)
                 + " END"),
    )
    joined = asof_join(shifted, slave, ts_col, keys)
    return joined.withColumn(ts_col, F.col("__orig_ts")).drop("__orig_ts")
