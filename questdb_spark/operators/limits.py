"""LIMIT variants.

QuestDB `LIMIT -n` returns the LAST n rows in timestamp order (time-series
idiom), and `LIMIT lo, hi` a row range —
``griffin/engine/LimitRecordCursorFactory.java:43``, negative-limit rewrite
``griffin/SqlOptimiser.java`` (`rewriteNegativeLimit`).

Spark lowering: `LIMIT -n` = sort DESC → limit n → re-sort ASC. Both sorts
are top-k (`TakeOrderedAndProject`), so nothing materializes the full table.
`LIMIT lo, hi` = offset/limit (Spark has `.offset()` since 3.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def limit_signed(df: DataFrame, n: int, order_by: Sequence[str]) -> DataFrame:
    """QuestDB LIMIT n: head when n >= 0, tail (last |n| rows) when n < 0."""
    if n >= 0:
        return df.orderBy(*[F.col(c).asc() for c in order_by]).limit(n)
    tail = df.orderBy(*[F.col(c).desc() for c in order_by]).limit(-n)
    return tail.orderBy(*[F.col(c).asc() for c in order_by])


def limit_range(df: DataFrame, lo: int, hi: int, order_by: Sequence[str]) -> DataFrame:
    """QuestDB LIMIT lo, hi → rows [lo, hi) in the given order."""
    return (
        df.orderBy(*[F.col(c).asc() for c in order_by]).offset(lo).limit(hi - lo)
    )
