"""Timestamp-type hygiene helpers.

QuestDB has a single timestamp type (epoch micros, UTC wall clock —
``ColumnType.java:112`` TIMESTAMP); Spark has two (``TIMESTAMP`` /
``TIMESTAMP_NTZ``) and Spark 4.1 infers ``TIMESTAMP_NTZ`` from naive
parquet ``timestamp[us]`` columns when
``spark.sql.parquet.inferTimestampNTZ.enabled`` is on.  ``F.unix_micros``
accepts only ``TIMESTAMP``, so every time-arithmetic site must be robust
to both.  The session is pinned to UTC (``session.py``), which makes the
NTZ→TIMESTAMP cast an exact wall-clock reinterpretation; Catalyst's
SimplifyCasts removes the cast when the input is already ``TIMESTAMP``,
so the helper is free on the happy path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_micros(c: Column | str) -> Column:
    """Epoch-micros long from TIMESTAMP **or** TIMESTAMP_NTZ input."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def to_nanos(c: Column | str) -> Column:
    """Epoch-nanos long from TIMESTAMP or TIMESTAMP_NTZ input (micros ×1000)."""
    return to_micros(c) * F.lit(1_000)


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (exact under UTC session).

    Applied once at the loader so downstream operators see one timestamp
    type, mirroring the reference's single-type model.
    """
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    for name in ntz:
        df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df
