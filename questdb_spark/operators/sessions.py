"""Gap-based sessionization: assign events to sessions that close after
``gap`` of inactivity per key, and aggregate per session.

Not a reference operator (QuestDB users build this with window functions
— the same construction used here); it is first-class in this engine
because event sessionization is a standard step in training-data
pipelines over interaction logs.

Scale design: ONE shuffle on the key — the session-start flag (lag) and
the session id (cumulative sum of flags) are two window expressions over
the same (key, ts) sort, so Catalyst evaluates them in a single Window
operator; the per-session aggregate then groups on (key, session_id),
which AQE can often ride on the same exchange. No iteration, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (key, session): session_id (1-based per key, in time
    order), session_start/session_end timestamps, n_events.

    A session STARTS at any event whose distance from the key's previous
    event exceeds ``gap_seconds`` (strictly), and at the key's first
    event.  ``tiebreak_col`` makes the ordering total when timestamps
    collide (pass the event id); the session assignment itself is
    tie-stable either way since equal timestamps have gap 0.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_start = F.when(
        prev.isNull()
        | (
            F.col(ts_col).cast("double") - prev.cast("double")
            > F.lit(float(gap_seconds))
        ),
        1,
    ).otherwise(0)
    sessioned = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    return sessioned.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
