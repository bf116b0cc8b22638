"""Row generators: generate_series / long_sequence / rnd_* equivalents.

Reference: ``functions/rnd/`` (47 factories: rnd_double, rnd_symbol,
rnd_symbol_zipf, …), ``functions/rnd/LongSequenceFunctionFactory``,
``functions/date/GenerateSeriesTimestampLongRecordCursorFactory``.
QuestDB uses these to build test fixtures; we reproduce the capability
with ``spark.range`` + deterministic mixing arithmetic so generated data
is reproducible across engines and runs (no JVM RNG).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MIX = 2654435761  # Knuth multiplicative hash constant


def long_sequence(spark: SparkSession, n: int) -> DataFrame:
    """QuestDB long_sequence(n): x = 1..n."""
    return spark.range(1, n + 1).select(F.col("id").alias("x"))


def rnd_double(x: Column, seed: int = 0) -> Column:
    """Deterministic pseudo-random double in [0,1) from a row index."""
    return ((x + seed) * _MIX % 1_000_000) / 1_000_000.0


def rnd_int(x: Column, lo: int, hi: int, seed: int = 0) -> Column:
    """Deterministic pseudo-random int in [lo, hi]."""
    return ((x + seed) * _MIX % (hi - lo + 1) + lo).cast("int")


def rnd_symbol(x: Column, symbols: list[str], seed: int = 0) -> Column:
    """Deterministic symbol pick (uniform)."""
    arr = F.array(*[F.lit(s) for s in symbols])
    return F.element_at(arr, (((x + seed) * _MIX % len(symbols)) + 1).cast("int"))


def rnd_symbol_zipf(x: Column, symbols: list[str], seed: int = 0) -> Column:
    """Zipf-ish skewed pick: P(symbol_k) ∝ 1/(k+1) (QuestDB RndSymbolZipf)."""
    n = len(symbols)
    weights = [1.0 / (k + 1) for k in range(n)]
    total = sum(weights)
    cum = []
    acc = 0.0
    for wt in weights:
        acc += wt
        cum.append(acc / total)
    u = rnd_double(x, seed)
    expr = F.lit(symbols[-1])
    for k in range(n - 2, -1, -1):
        expr = F.when(u < cum[k], symbols[k]).otherwise(expr)
    return expr


def generate_series_ts(
    spark: SparkSession, start: str, end: str, step: str
) -> DataFrame:
    """Timestamp series [start, end] inclusive with SQL-interval step."""
    return spark.range(1).select(
        F.explode(
            F.expr(
                f"sequence(TIMESTAMP '{start}', TIMESTAMP '{end}', INTERVAL {step})"
            )
        ).alias("ts")
    )
