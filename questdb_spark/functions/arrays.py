"""Array functions over ARRAY(DOUBLE) columns.

Reference: QuestDB n-dim DOUBLE arrays (``cairo/arr/``,
``functions/array/`` — 49 files: slice/flatten/transpose, elementwise ops,
dot product, matmul, cumsum, insertion_point, per-array aggregations).
Spark-side: 1-D ops are higher-order functions (codegen); matmul/transpose
on nested arrays use a vectorized Pandas UDF (numpy) — the documented
slow path, used only where HOFs genuinely can't express the op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def array_sum(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)


def array_avg(a: Column) -> Column:
    return array_sum(a) / F.size(a)


def array_min_(a: Column) -> Column:
    return F.array_min(a)


def array_max_(a: Column) -> Column:
    return F.array_max(a)


def array_cum_sum(a: Column) -> Column:
    """Running-sum array (QuestDB array_cum_sum)."""
    idx = F.sequence(F.lit(1), F.size(a))
    return F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(a, F.lit(1), i.cast("int")), F.lit(0.0), lambda acc, x: acc + x
        ),
    )


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def scale(a: Column, k: Column | float) -> Column:
    kk = F.lit(k) if isinstance(k, (int, float)) else k
    return F.transform(a, lambda x: x * kk)


def elementwise_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def insertion_point(a: Column, v: Column) -> Column:
    """Index (1-based) where v would insert into ascending-sorted a
    (QuestDB insertion_point)."""
    return F.size(F.filter(a, lambda x: x < v)) + 1


def array_slice(a: Column, start: int, length: int) -> Column:
    return F.slice(a, start, length)


@pandas_udf("array<array<double>>")
def transpose_udf(m: pd.Series) -> pd.Series:
    """2-D transpose (QuestDB transpose()) — numpy-backed Pandas UDF."""
    return m.map(lambda rows: np.asarray(list(rows), dtype=float).T.tolist())


@pandas_udf("array<array<double>>")
def matmul_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """2-D matrix multiply (QuestDB matmul()) — numpy-backed Pandas UDF."""
    out = []
    for ma, mb in zip(a, b):
        out.append(
            (np.asarray(list(ma), dtype=float) @ np.asarray(list(mb), dtype=float)).tolist()
        )
    return pd.Series(out)
