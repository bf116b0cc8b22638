"""Window-function gap fillers: GROUPS frames, EXCLUDE clauses, vwema.

Reference: QuestDB frames support ROWS / RANGE / GROUPS and EXCLUDE
CURRENT ROW / GROUP / TIES / NO OTHERS (``griffin/model/
WindowExpression.java:47-55``). Spark has only ROWS/RANGE and no EXCLUDE —
both are emulated here by composition:

- GROUPS frame = RANGE frame over ``dense_rank`` of the ordering (peer
  groups collapse to consecutive integers, so "N groups preceding" is a
  numeric range of width N);
- EXCLUDE CURRENT ROW / GROUP / TIES = full-frame aggregate minus the
  excluded slice (current row value / peer-group aggregate / peers minus
  self) — exact for sum/count/avg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


_AGG_FNS = {"sum": F.sum, "avg": F.avg, "count": F.count, "min": F.min, "max": F.max}


def groups_frame_agg(
    df: DataFrame,
    value: str,
    order_by: str,
    keys: Sequence[str] = (),
    groups_preceding: int = 0,
    groups_following: int = 0,
    agg: str = "sum",
    out_col: str = "groups_agg",
    group_col: str | None = None,
) -> DataFrame:
    """``<agg> OVER (GROUPS BETWEEN n PRECEDING AND m FOLLOWING)`` for
    sum/avg/count/min/max (WindowExpression.java:47-55): peer groups
    collapse to consecutive dense_rank integers, making the GROUPS frame a
    numeric RANGE frame.  ``group_col``: precomputed dense_rank to share
    across stacked window columns."""
    keys = list(keys)
    gcol = group_col
    if gcol is None:
        wrank = Window.partitionBy(*keys).orderBy(order_by)
        ranked = df.withColumn("__grp", F.dense_rank().over(wrank))
        gcol = "__grp"
    else:
        ranked = df
    wg = (
        Window.partitionBy(*keys)
        .orderBy(gcol)
        .rangeBetween(-groups_preceding, groups_following)
    )
    out = ranked.withColumn(out_col, _AGG_FNS[agg](value).over(wg))
    return out.drop("__grp") if group_col is None else out


def groups_frame_sum(
    df: DataFrame,
    value: str,
    order_by: str,
    keys: Sequence[str] = (),
    groups_preceding: int = 0,
    groups_following: int = 0,
    out_col: str = "groups_sum",
) -> DataFrame:
    """SUM over ``GROUPS BETWEEN n PRECEDING AND m FOLLOWING``."""
    return groups_frame_agg(
        df, value, order_by, keys, groups_preceding, groups_following,
        agg="sum", out_col=out_col,
    )


def _frame(keys: Sequence[str], order_by: str) -> WindowSpec:
    return (
        Window.partitionBy(*keys)
        .orderBy(order_by)
        .rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )


def sum_exclude(
    df: DataFrame,
    value: str,
    order_by: str,
    keys: Sequence[str] = (),
    exclude: str = "current row",
    out_col: str = "sum_excl",
) -> DataFrame:
    """SUM over the full partition with an EXCLUDE clause.

    exclude: 'current row' | 'group' (peers incl. self) | 'ties'
    (peers except self) | 'no others'.
    """
    keys = list(keys)
    wfull = _frame(keys, order_by)
    full = F.sum(value).over(wfull)
    n_full = F.count(F.lit(1)).over(wfull)
    wpeer = (
        Window.partitionBy(*keys)
        .orderBy(order_by)
        .rangeBetween(0, 0)  # exactly the peer group of the current row
    )
    peers = F.sum(value).over(wpeer)
    n_peers = F.count(F.lit(1)).over(wpeer)
    v = F.col(value)
    # SQL standard: SUM over an EMPTY frame is NULL, so the subtraction
    # identities must be guarded — e.g. EXCLUDE CURRENT ROW on a single-row
    # partition is NULL, not 0 (DuckDB's native EXCLUDE agrees; the driver
    # oracle exercises this).
    if exclude == "current row":
        out = F.when(n_full > 1, full - v)
    elif exclude == "group":
        out = F.when(n_full > n_peers, full - peers)
    elif exclude == "ties":
        out = full - (peers - v)  # frame always contains the current row
    elif exclude == "no others":
        out = full
    else:
        raise ValueError(f"unknown EXCLUDE clause: {exclude!r}")
    return df.withColumn(out_col, out)


def agg_exclude(
    df: DataFrame,
    value: str,
    order_by: str,
    keys: Sequence[str] = (),
    exclude: str = "current row",
    agg: str = "sum",
    out_col: str = "agg_excl",
    group_col: str | None = None,
) -> DataFrame:
    """``<agg> OVER (... RANGE UNBOUNDED EXCLUDE <clause>)`` for
    sum/avg/count/min/max (WindowExpression.java:47-55).

    Lowering: the excluded slice is expressed as the UNION of two frames the
    engine CAN compute —
    - EXCLUDE CURRENT ROW: positional ROWS frames strictly before / after
      the current row (ties don't matter: any single occurrence of the
      row's value is removed, which is the clause's semantics for every
      supported aggregate);
    - EXCLUDE GROUP: RANGE frames strictly before / after the peer group
      on the dense_rank of the ordering;
    - EXCLUDE TIES: the GROUP frames plus the current row itself.
    min/max combine with least/greatest (null-skipping), sum/avg/count by
    addition — exact, no subtraction identities, so min/max work too.
    Empty-frame results are SQL-standard NULL (COUNT: 0)."""
    keys = list(keys)
    fn = _AGG_FNS[agg]
    v = F.col(value)

    if exclude == "no others":
        return df.withColumn(out_col, fn(value).over(_frame(keys, order_by)))

    if exclude == "current row":
        lo = Window.partitionBy(*keys).orderBy(order_by).rowsBetween(
            Window.unboundedPreceding, -1
        )
        hi = Window.partitionBy(*keys).orderBy(order_by).rowsBetween(
            1, Window.unboundedFollowing
        )
        ranked = df
        add_self = False
    elif exclude in ("group", "ties"):
        # `group_col`: callers stacking several EXCLUDE columns pass a
        # precomputed dense_rank so every spec shares ONE rank pass and one
        # sort (plan-size and wall-clock win for multi-column queries)
        gcol = group_col
        if gcol is None:
            wrank = Window.partitionBy(*keys).orderBy(order_by)
            ranked = df.withColumn("__xgrp", F.dense_rank().over(wrank))
            gcol = "__xgrp"
        else:
            ranked = df
        lo = Window.partitionBy(*keys).orderBy(gcol).rangeBetween(
            Window.unboundedPreceding, -1
        )
        hi = Window.partitionBy(*keys).orderBy(gcol).rangeBetween(
            1, Window.unboundedFollowing
        )
        add_self = exclude == "ties"
    else:
        raise ValueError(f"unknown EXCLUDE clause: {exclude!r}")

    if agg in ("min", "max"):
        combine = F.least if agg == "min" else F.greatest
        parts = [fn(value).over(lo), fn(value).over(hi)]
        if add_self:
            parts.append(v)
        out = combine(*parts)  # least/greatest skip NULLs; all-NULL → NULL
    else:
        cnt = F.coalesce(F.count(value).over(lo), F.lit(0)) + F.coalesce(
            F.count(value).over(hi), F.lit(0)
        )
        s = F.coalesce(F.sum(value).over(lo), F.lit(0)) + F.coalesce(
            F.sum(value).over(hi), F.lit(0)
        )
        if add_self:
            cnt = cnt + v.isNotNull().cast("long")
            s = s + F.coalesce(v, F.lit(0))
        if agg == "count":
            out = cnt
        elif agg == "sum":
            out = F.when(cnt > 0, s)
        else:  # avg
            out = F.when(cnt > 0, s / cnt)

    res = ranked.withColumn(out_col, out)
    return res.drop("__xgrp") if "__xgrp" in res.columns else res


def vwema(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    weight_col: str,
    alpha: float,
    keys: Sequence[str] = (),
    out_col: str = "vwema",
) -> DataFrame:
    """Volume-weighted EMA (QuestDB VwemaDoubleWindowFunctionFactory):
    vwema = ema(value*weight) / ema(weight).

    Keyed path: BOTH recurrences advance in one grouped ``applyInPandas``
    pass — one shuffle and one Arrow round-trip instead of the naive two
    chained EMA calls (measured 2× at sf0.1). Keyless falls back to the
    chunked-carry EMA composition (stays parallel)."""
    keys = list(keys)
    if keys:
        import pandas as pd

        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ) + f", {out_col} double"

        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values([ts_col], kind="mergesort")
            ev = (pdf[value_col] * pdf[weight_col]).ewm(alpha=alpha, adjust=False).mean()
            ew = pdf[weight_col].ewm(alpha=alpha, adjust=False).mean()
            pdf[out_col] = ev / ew
            return pdf

        # explicit width: keep the python-bound stage at worker parallelism
        # (AQE's byte-based coalescing would fold it onto ~2 tasks)
        n = df.sparkSession.sparkContext.defaultParallelism
        return df.repartition(n, *keys).groupBy(*keys).applyInPandas(apply, schema)

    from .finance import ema

    tagged = df.withColumn("__vw", F.col(value_col) * F.col(weight_col))
    num = ema(tagged, ts_col, "__vw", alpha, keys, out_col="__ema_vw")
    both = ema(num, ts_col, weight_col, alpha, keys, out_col="__ema_w")
    return both.withColumn(out_col, F.col("__ema_vw") / F.col("__ema_w")).drop(
        "__vw", "__ema_vw", "__ema_w"
    )
