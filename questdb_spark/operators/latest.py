"""LATEST ON ts PARTITION BY keys — latest row per key series.

Reference: ``griffin/SqlParser.java:4246`` (parse),
``griffin/engine/table/LatestByAllIndexedRecordCursorFactory.java:40`` and
~20 sibling factories. QuestDB walks partitions backwards and short-circuits
per key; the Spark-native equivalent is a single hash aggregation with
``max_by(struct(*cols), (ts, tiebreak))`` — one shuffle, map-side partial
aggregation, no sort, no window. That beats the row_number() formulation
(which needs a full sort per key) at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_on(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest row per key combination, ordered by ``ts_col``.

    ``tiebreak``: column that makes ordering total when several rows share a
    timestamp within a key (QuestDB uses physical row order; we require an
    explicit deterministic ordering column — e.g. a row id).
    """
    keys = list(keys)
    payload = [c for c in df.columns if c not in keys]
    ord_expr = (
        F.struct(F.col(ts_col), F.col(tiebreak)) if tiebreak else F.col(ts_col)
    )
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ord_expr).alias("__row")
    )
    return agg.select(*keys, *[F.col("__row")[c].alias(c) for c in payload])
