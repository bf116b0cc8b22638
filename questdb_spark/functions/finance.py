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

from ..tsutil import to_micros


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
    dur = (to_micros(F.lead(ts_col, 1).over(w)) - to_micros(ts_col)).cast("double")
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
        if not keys:
            # keyless: the grouped path would funnel the WHOLE stream through
            # one Python task — use the parallel affine-chunk decomposition
            return _ema_keyless_chunked(df, ts_col, value_col, alpha, out_col)
        return _ema_pandas(df, ts_col, value_col, alpha, keys, out_col)
    if method == "chunked":
        return _ema_keyless_chunked(df, ts_col, value_col, alpha, out_col)
    import math

    # smallest L with (1-a)^L < 1e-18 (below double resolution of the sum)
    lookback = int(math.ceil(math.log(1e-18) / math.log(1.0 - alpha)))
    if lookback > 10_000:
        # a 10k-element collect_list per ROW is a scale trap (VERDICT r3
        # finding 3) — refuse instead of silently truncating accuracy
        raise ValueError(
            f"alpha={alpha} needs a {lookback}-row lookback; closed_form is "
            "capped at 10000 — use method='pandas' (keyed) or 'chunked'"
        )
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


def _ema_keyless_chunked(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float,
    out_col: str,
    chunk: str = "7 days",
) -> DataFrame:
    """Parallel keyless EMA via affine-map decomposition.

    EMA is y_i = a·x_i + (1-a)·y_{i-1}; over a chunk of rows it is the
    affine map y_out = d·y_in + L with d = (1-a)^n and L the zero-seeded
    local EMA of the chunk — and affine maps compose associatively. So:

    1. partition the stream into coarse time chunks; per chunk (grouped
       ``applyInPandas``, parallel across chunks) compute per-row
       L_i (zero-seed recurrence) and d_i = (1-a)^(i+1);
    2. fold the tiny one-row-per-chunk (d_end, L_end, x0) frame through the
       affine composition (JVM ``aggregate`` HOF over a collected array —
       chunk count is bounded by time span / chunk, never by row count),
       yielding each chunk's carry-in y value;
    3. broadcast the carry-ins back: y_i = L_i + d_i·coalesce(carry_in, x0)
       — the coalesce reproduces pandas' seed convention (y_0 = x_0) for
       the first chunk exactly.

    Same recurrence semantics as the grouped path, but the stream is
    processed by one Python task PER CHUNK instead of one overall.
    """
    import numpy as np
    import pandas as pd

    chunked = df.withColumn("__chunk", F.window(F.col(ts_col), chunk)["start"])
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in chunked.schema.fields
    ) + ", __L double, __d double, __Lend double, __dend double, __x0 double"

    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col], kind="mergesort")
        x = pdf[value_col].astype("float64")
        # zero-seed recurrence L_i = a·x_i + (1-a)·L_{i-1}, L_{-1} = 0:
        # prepend a literal 0 so ewm's seed row is the zero state
        L = pd.concat([pd.Series([0.0]), x]).ewm(alpha=alpha, adjust=False).mean().iloc[1:]
        pdf["__L"] = L.values
        pdf["__d"] = np.power(1.0 - alpha, np.arange(1, len(pdf) + 1, dtype="float64"))
        pdf["__Lend"] = L.values[-1]
        pdf["__dend"] = (1.0 - alpha) ** len(pdf)
        pdf["__x0"] = x.values[0]
        return pdf

    with_local = chunked.groupBy("__chunk").applyInPandas(local, schema)

    summaries = with_local.groupBy("__chunk").agg(
        F.min("__Lend").alias("L"), F.min("__dend").alias("d"), F.min("__x0").alias("x0")
    )
    cs = F.array_sort(F.collect_list(F.struct("__chunk", "L", "d", "x0")))
    init = F.struct(
        F.array().cast("array<double>").alias("arr"),
        F.lit(None).cast("double").alias("cur"),
    )
    step = lambda acc, c: F.struct(  # noqa: E731
        F.concat(acc["arr"], F.array(acc["cur"])).alias("arr"),
        (c["L"] + c["d"] * F.coalesce(acc["cur"], c["x0"])).alias("cur"),
    )
    folded = summaries.agg(cs.alias("cs")).select(
        F.explode(
            F.zip_with(
                F.col("cs"),
                F.aggregate("cs", init, step)["arr"],
                lambda c, carry: F.struct(
                    c["__chunk"].alias("__chunk"), carry.alias("__carry_in")
                ),
            )
        ).alias("z")
    ).select("z.__chunk", "z.__carry_in")

    return (
        with_local.join(F.broadcast(folded), "__chunk")
        .withColumn(
            out_col,
            F.col("__L") + F.col("__d") * F.coalesce(F.col("__carry_in"), F.col("__x0")),
        )
        .drop("__chunk", "__L", "__d", "__Lend", "__dend", "__x0", "__carry_in")
    )


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
        # explicit key-partition width: AQE's size-based coalescing sees a
        # few MB of shuffle data and folds a PYTHON-bound stage onto 2
        # tasks — partition count must follow worker count, not bytes
        n = df.sparkSession.sparkContext.defaultParallelism
        return df.repartition(n, *keys).groupBy(*keys).applyInPandas(apply, schema=schema)
    # keyless: a single grouped Python task would serialize the whole
    # stream — route to the parallel affine-chunk decomposition
    # (VERDICT r3 finding 2; ema() already routes there, this makes the
    # direct call safe too)
    return _ema_keyless_chunked(df, ts_col, value_col, alpha, out_col)
