"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. One broadcast of the query
  vector, one pass, one top-k (TakeOrderedAndProject) — at 100 TB this is
  the scan-bound path and parallelizes perfectly.
- LSH-bucketed ANN: random-hyperplane signs → bucket join, so candidate
  generation is an equi-join instead of a cross product. Hyperplanes are
  derived from md5 so they're deterministic and engine-independent.

Determinism note: scores order by an integer-quantized dot product
(round(x*1000)) — integer arithmetic is exact in both Spark and DuckDB,
so top-k membership and the reported score are bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1000


def quantize(vec: Column) -> Column:
    """array<float> → array<long>, fixed-point at 1/QUANT resolution."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a single query vector.

    ``query`` is a 1-row DataFrame with the same vec column; it is
    broadcast (never collected on the driver)."""
    q = F.broadcast(query.select(quantize(F.col(vec_col)).alias("__qv")))
    base = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("__v")
    ).crossJoin(q)
    dot = dot_q(F.col("__v"), F.col("__qv"))
    norm = F.sqrt(dot_q(F.col("__v"), F.col("__v"))) * F.sqrt(
        dot_q(F.col("__qv"), F.col("__qv"))
    )
    scored = base.select(
        F.col(id_col), (dot / norm).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


N_PLANES = 8
MAX_DIM = 256


def plane_signs(plane: int, n: int = MAX_DIM) -> list[int]:
    """±1 hyperplane components from md5(f'p{plane}:{i}') — the same value
    an engine-side md5 would produce, but hyperplanes are CONSTANTS, so we
    evaluate them at plan-build time (60s → ms on the bench) and inline
    literal arrays into the plan."""
    import hashlib

    return [
        1 if hashlib.md5(f"p{plane}:{i}".encode()).hexdigest()[0] >= "8" else -1
        for i in range(1, n + 1)
    ]


def _plane_sign(vec: Column, plane: int, dim: int = MAX_DIM) -> Column:
    signs = F.array(*[F.lit(s) for s in plane_signs(plane, dim)])
    comp = F.zip_with(vec, F.slice(signs, 1, F.size(vec)), lambda x, s: x * s)
    s = F.aggregate(comp, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (s > 0).cast("int")


def lsh_bucket(vec: Column, dim: int = MAX_DIM) -> Column:
    """N_PLANES random-hyperplane sign bits packed into an int bucket id.

    ``dim``: upper bound on the vector length — pass the real dimension
    when known to keep the inlined sign arrays small."""
    out = F.lit(0)
    for p in range(N_PLANES):
        out = out + _plane_sign(vec, p, dim) * F.lit(2 ** p)
    return out


def ann_lsh_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = MAX_DIM,
) -> DataFrame:
    """Approximate top-k: restrict the exact scoring to the query's LSH
    bucket. At scale the bucket column is a partition/bucketing key, so the
    probe touches 1/2^N_PLANES of the data."""
    qv = quantize(F.col(vec_col))
    q = F.broadcast(
        query.select(qv.alias("__qv"), lsh_bucket(qv, dim).alias("__qb"))
    )
    base = (
        df.select(F.col(id_col), qv.alias("__v"), lsh_bucket(qv, dim).alias("__b"))
        .join(q, F.col("__b") == F.col("__qb"))
    )
    dot = dot_q(F.col("__v"), F.col("__qv"))
    norm = F.sqrt(dot_q(F.col("__v"), F.col("__v"))) * F.sqrt(
        dot_q(F.col("__qv"), F.col("__qv"))
    )
    return (
        base.select(F.col(id_col), (dot / norm).alias("cosine"), F.col("__b").alias("bucket"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
