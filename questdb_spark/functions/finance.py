"""Finance functions — QuestDB's distinctive domain surface.

Reference: ``griffin/engine/functions/finance/`` (l2price, mid, spread_bps,
vwab/wmid), ``functions/groupby/Vwap*``, ``functions/window/EmaDouble*``,
TWAP helpers. All are expressed as column expressions / window compositions
— no UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mid(bid: Column, ask: Column) -> Column:
    """Midpoint price (functions/finance/MidPriceFunctionFactory)."""
    return (bid + ask) / 2


def spread_bps(bid: Column, ask: Column) -> Column:
    """Bid/ask spread in basis points (functions/finance/SpreadBpsFunctionFactory)."""
    return (ask - bid) / mid(bid, ask) * 10000


def vwap(price: Column, volume: Column) -> Column:
    """Aggregate: volume-weighted average price (functions/groupby/VwapDouble...)."""
    return F.sum(price * volume) / F.sum(volume)


def wavg(value: Column, weight: Column) -> Column:
    """Aggregate: weighted average (functions/groupby/WeightedAvg...)."""
    return F.sum(value * weight) / F.sum(weight)


def l2price(target_qty: Column, sizes: Column, prices: Column) -> Column:
    """Order-book sweep price: average execution price of buying
    ``target_qty`` by walking levels (size_i, price_i) in order.
    Reference: ``functions/finance/LevelTwoPriceFunctionFactory`` (array
    variant included). NULL when the book can't fill the quantity.

    Implemented with array HOFs: a running scan accumulates (filled, cost)
    over levels — O(levels) per row, JVM-side.
    """
    # state: struct(filled, cost); fold over zip(sizes, prices)
    levels = F.zip_with(sizes, prices, lambda s, p: F.struct(s.alias("s"), p.alias("p")))
    init = F.struct(
        F.lit(0.0).alias("filled"), F.lit(0.0).alias("cost"), target_qty.alias("want")
    )
    step = lambda acc, lvl: F.struct(  # noqa: E731
        F.least(acc["want"], acc["filled"] + lvl["s"]).alias("filled"),
        (
            acc["cost"]
            + F.least(F.greatest(acc["want"] - acc["filled"], F.lit(0.0)), lvl["s"]) * lvl["p"]
        ).alias("cost"),
        acc["want"].alias("want"),
    )
    fin = F.aggregate(levels, init, step)
    return F.when(fin["filled"] >= target_qty, fin["cost"] / target_qty)


def twap(df: DataFrame, ts_col: str, price_col: str, keys: Sequence[str] = ()) -> DataFrame:
    """Time-weighted average price per key: each observation weighted by its
    holding time (until the next observation). Reference:
    ``functions/groupby/TwapDouble...``. Lowering: lead(ts) per key →
    duration weights → weighted mean; rows with no successor are excluded
    (zero holding time), matching interval-weighted semantics."""
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    dur = (F.unix_micros(F.lead(ts_col, 1).over(w)) - F.unix_micros(F.col(ts_col))).cast(
        "double"
    )
    weighted = df.withColumn("__dur", dur).filter(F.col("__dur").isNotNull())
    return weighted.groupBy(*keys).agg(
        (F.sum(F.col(price_col) * F.col("__dur")) / F.sum("__dur")).alias("twap")
    )


def ema(df: DataFrame, ts_col: str, value_col: str, alpha: float,
        keys: Sequence[str] = (), out_col: str = "ema",
        method: str = "pandas") -> DataFrame:
    """Exponential moving average per key (functions/window/EmaDouble...).

    EMA is a linear recurrence (y_i = a*x_i + (1-a)*y_{i-1}) — the one
    shape Spark windows can't express. Two lowerings:

    - ``method='pandas'`` (default): grouped ``applyInPandas`` running the
      exact recurrence via ``Series.ewm(adjust=False)`` — Arrow-batched,
      O(n) per key, exact. This is the documented "UDFs are the slow path"
      exception: a true recurrence.
    - ``method='closed_form'``: pure-JVM closed form over a bounded
      lookback L where (1-a)^L < 1e-18 (below double resolution) —
      window collect + aggregate HOF; < 1e-12 relative error, no Python.
    """
    if method == "pandas":
        return _ema_pandas(df, ts_col, value_col, alpha, keys, out_col)
    import math

    # smallest L with (1-a)^L < 1e-18 (below double resolution of the sum)
    lookback = min(int(math.ceil(math.log(1e-18) / math.log(1.0 - alpha))), 10_000)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-lookback, Window.currentRow)
    )
    xs = F.collect_list(F.col(value_col)).over(w)  # oldest → newest
    n = F.size(xs)
    decay = F.lit(1.0 - alpha)
    # weights: alpha*(1-a)^(n-1-i) for i>0; full (1-a)^(n-1) for the seed x_0
    idx = F.sequence(F.lit(1), n)
    weighted = F.zip_with(
        xs,
        idx,
        lambda x, i: F.when(
            i == 1, x * F.pow(decay, (n - 1).cast("double"))
        ).otherwise(x * F.lit(alpha) * F.pow(decay, (n - i).cast("double"))),
    )
    ema_col = F.aggregate(weighted, F.lit(0.0), lambda acc, v: acc + v)
    return df.withColumn(out_col, ema_col)


def _ema_pandas(df: DataFrame, ts_col: str, value_col: str, alpha: float,
                keys: Sequence[str], out_col: str) -> DataFrame:
    import pandas as pd

    keys = list(keys)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"
    sort_cols = [ts_col]

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    if keys:
        return df.groupBy(*keys).applyInPandas(apply, schema=schema)
    return df.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(
        lambda pdf: apply(pdf.drop(columns="__g")), schema=schema
    )
