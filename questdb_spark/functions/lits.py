"""Literal-array builders (r14): one py4j round trip per array.

Import-safe without an active SparkSession (unlike arrays.py, whose
module-level pandas_udf type strings need a context to parse)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_array(vals: list[int]) -> Column:
    """Literal integer array in ONE py4j round trip.

    ``F.array(*[F.lit(v) for v in vals])`` costs 1+N round trips (~0.4 ms
    each — r14 profiling: the IVF centroid / PQ LUT literal arrays alone
    were ~1000 round-trips per ANN query build).  A Spark-SQL integral
    literal infers INT when it fits and BIGINT otherwise — the same rule
    ``F.lit`` applies to a Python int — so ``F.expr("array(...)")`` builds
    the identical expression tree."""
    return F.expr("array(" + ",".join(str(int(v)) for v in vals) + ")")


def lit_array_long(vals: list[int]) -> Column:
    """Literal BIGINT array in one round trip — the twin of
    ``F.array(*[F.lit(v).cast('long') for v in vals])`` (L-suffixed SQL
    literals are BIGINT directly; the Column form's int-literal + cast
    analyzes to the same long literal)."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")
