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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.storagelevel import StorageLevel

from ..functions.lits import lit_array, lit_array_long

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
    keep_vec: bool = False,
) -> DataFrame:
    """Exact top-k by cosine similarity to a single query vector.

    ``query`` is a 1-row DataFrame with the same vec column; it is
    broadcast (never collected on the driver).  ``keep_vec=True`` carries
    the vector through the top-k as a payload column (TakeOrderedAndProject
    holds k rows either way), so a consumer that needs the shortlist's
    vectors — MMR — avoids a second corpus scan to re-attach them.  The
    ordering key and tie-break are identical with or without the payload."""
    pair, n2 = _pair_dot_udf(), _norm2_udf()
    q = F.broadcast(query.select(F.col(vec_col).alias("__qv")))
    base = df.select(F.col(id_col), F.col(vec_col).alias("__v")).crossJoin(q)
    dot = pair(F.col("__v"), F.col("__qv"))
    norm = F.sqrt(n2(F.col("__v"))) * F.sqrt(n2(F.col("__qv")))
    cols = [F.col(id_col), (dot / norm).alias("cosine")]
    if keep_vec:
        cols.append(F.col("__v").alias(vec_col))
    scored = base.select(*cols)
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


N_PLANES = 8
MAX_DIM = 256


# -- Arrow-vectorized integer kernels ----------------------------------------
#
# The HOF forms above (transform/zip_with/aggregate) are the REFERENCE
# implementations — exact, engine-independent, and what the oracle SQL
# mirrors. But Spark evaluates HOF lambdas interpreted (CodegenFallback),
# ~10µs per element call, so a 64-dim dot costs ~1ms/row of interpreter
# dispatch — CPU-bound long before I/O at 100 TB. Dense fixed-dim vector
# math is the one place Arrow-batched numpy beats the JVM expression
# engine by orders of magnitude (one BLAS matmul per batch), so the hot
# kernels below move ONLY the integer arithmetic to pandas UDFs:
# every returned value is an int64 dot/bucket/cell — bit-identical to the
# HOF forms (test_dedup_scale asserts equality on real data) — and all
# floating-point math (sqrt, division) stays in JVM expressions so oracle
# determinism is untouched.


def _quant_np(s: pd.Series) -> np.ndarray:
    """float32 vectors → n×dim int64, matching round(cast(x as double) *
    QUANT) HALF_UP semantics (sign · floor(|x·Q| + ½) = round half away
    from zero, the Spark/DuckDB tie rule)."""
    a = np.vstack(s.to_numpy()).astype(np.float64) * float(QUANT)
    return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)


def _sign_matrix(n_planes: int, dim: int) -> np.ndarray:
    return np.array([plane_signs(p, dim) for p in range(n_planes)], dtype=np.int64)


def _bucket_udf(dim: int):
    """vec → packed N_PLANES-bit LSH bucket id (int, = lsh_bucket)."""
    m = _sign_matrix(N_PLANES, dim)
    pows = (1 << np.arange(N_PLANES)).astype(np.int64)

    @pandas_udf("int")
    def f(v: pd.Series) -> pd.Series:
        q = _quant_np(v)
        d = q @ m[:, : q.shape[1]].T
        return pd.Series(((d > 0) @ pows).astype(np.int32))

    return f


def _band_keys_udf(n_bands: int, planes_per_band: int, dim: int):
    """vec → array<int> of band keys (element b = band_key(vec, b, ppb))."""
    m = _sign_matrix(n_bands * planes_per_band, dim)
    pows = (1 << np.arange(planes_per_band)).astype(np.int64)

    @pandas_udf("array<int>")
    def f(v: pd.Series) -> pd.Series:
        q = _quant_np(v)
        bits = (q @ m[:, : q.shape[1]].T) > 0  # n × (n_bands·ppb)
        keys = [
            (bits[:, b * planes_per_band : (b + 1) * planes_per_band] @ pows).astype(
                np.int32
            )
            for b in range(n_bands)
        ]
        return pd.Series(list(np.stack(keys, axis=1)))

    return f


def _pair_dot_udf():
    """(vec_a, vec_b) → quantized int64 dot (= dot_q(quantize, quantize))."""

    @pandas_udf("long")
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        qa, qb = _quant_np(a), _quant_np(b)
        return pd.Series(np.einsum("ij,ij->i", qa, qb))

    return f


def _norm2_udf():
    """vec → int64 self-dot (‖quantize(vec)‖²)."""

    @pandas_udf("long")
    def f(v: pd.Series) -> pd.Series:
        q = _quant_np(v)
        return pd.Series(np.einsum("ij,ij->i", q, q))

    return f


def _cell_udf(centroids: list[list[int]]):
    """vec → nearest IVF cell id (ties → lower cid, = _nearest_cells n=1)."""
    c = np.array(centroids, dtype=np.int64)  # K×dim
    cnorm = np.einsum("ij,ij->i", c, c)

    @pandas_udf("int")
    def f(v: pd.Series) -> pd.Series:
        q = _quant_np(v)
        # ‖q−c‖² = ‖q‖² − 2q·c + ‖c‖²; ‖q‖² constant per row → argmin over
        # (−2q·c + ‖c‖²). np.argmin takes the FIRST minimum = lowest cid.
        d = -2 * (q @ c[:, : q.shape[1]].T) + cnorm
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return f


def _cells_udf(centroids: list[list[int]], n: int):
    """vec → array<int> of the n nearest cell ids (ties → lower cid)."""
    c = np.array(centroids, dtype=np.int64)
    cnorm = np.einsum("ij,ij->i", c, c)

    @pandas_udf("array<int>")
    def f(v: pd.Series) -> pd.Series:
        q = _quant_np(v)
        d = -2 * (q @ c[:, : q.shape[1]].T) + cnorm
        # stable argsort on distance = ties resolved by lower cid
        idx = np.argsort(d, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series(list(idx))

    return f


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
    signs = lit_array(plane_signs(plane, dim))
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
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the exact scoring to the query's LSH
    bucket. At scale the bucket column is a partition/bucketing key, so the
    probe touches 1/2^N_PLANES of the data.

    ``n_probes`` > 1 is classic multi-probe LSH: also search the buckets at
    Hamming distance 1 from the query's bucket (flip plane 0, 1, ... in
    order), trading n_probes× candidate volume for recall — near neighbors
    that fall on the wrong side of ONE hyperplane are recovered. Probing
    stays an equi-join (query side explodes to n_probes bucket keys; the
    corpus is never re-bucketed), so the scale shape is unchanged."""
    if not 1 <= n_probes <= N_PLANES + 1:
        raise ValueError(f"n_probes must be in [1, {N_PLANES + 1}]")
    bud, pair, n2 = _bucket_udf(dim), _pair_dot_udf(), _norm2_udf()
    rv = F.col(vec_col)
    q0 = query.select(rv.alias("__qv"), bud(rv).alias("__qb0"))
    probes = F.array(
        F.col("__qb0"),
        *[F.col("__qb0").bitwiseXOR(F.lit(1 << p)) for p in range(n_probes - 1)],
    )
    q = F.broadcast(q0.select("__qv", F.explode(probes).alias("__qb")))
    base = (
        df.select(F.col(id_col), rv.alias("__v"), bud(rv).alias("__b"))
        .join(q, F.col("__b") == F.col("__qb"))
    )
    dot = pair(F.col("__v"), F.col("__qv"))
    norm = F.sqrt(n2(F.col("__v"))) * F.sqrt(n2(F.col("__qv")))
    return (
        base.select(F.col(id_col), (dot / norm).alias("cosine"), F.col("__b").alias("bucket"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# -- embedding-cosine near-dup (banded LSH pairs) ----------------------------

def band_key(vec: Column, band: int, planes_per_band: int, dim: int = MAX_DIM) -> Column:
    """Pack ``planes_per_band`` hyperplane sign bits (planes
    band*ppb .. band*ppb+ppb-1) into one band key — the classic LSH-OR
    construction: a pair is a candidate if it collides in ANY band."""
    out = F.lit(0)
    for j in range(planes_per_band):
        out = out + _plane_sign(vec, band * planes_per_band + j, dim) * F.lit(2**j)
    return out


# Per-(band, key) candidate-degree cap for cosine_near_dup_pairs: a bucket
# of b vectors generates b²/2 candidate pairs, so a corpus with popular
# near-identical vectors (all landing in one bucket) blows up quadratically
# (16× at the 10× scale check on the replica-heavy derived set). 512 keeps
# the worst bucket at ≤131k pairs while never binding at test scale.
NEAR_DUP_MAX_BUCKET = 512


def near_dup_bucket_audit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = MAX_DIM,
    n_bands: int = 2,
    planes_per_band: int = 4,
    max_bucket_size: int = NEAR_DUP_MAX_BUCKET,
) -> DataFrame:
    """Audit of what the bucket-degree cap drops: one row per oversized
    (band, key) bucket with its size and how many vectors the cap sheds.
    Materialize alongside a capped `cosine_near_dup_pairs` run so the
    recall loss is LOGGED, never silent."""
    bku = _band_keys_udf(n_bands, planes_per_band, dim)
    keyed = df.select(F.col(id_col), bku(F.col(vec_col)).alias("__keys")).select(
        F.posexplode("__keys").alias("band", "key")
    )
    return (
        keyed.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
        .select(
            "band",
            "key",
            "bucket_size",
            (F.col("bucket_size") - max_bucket_size).alias("n_dropped"),
        )
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = MAX_DIM,
    n_bands: int = 2,
    planes_per_band: int = 4,
    max_bucket_size: int | None = NEAR_DUP_MAX_BUCKET,
    sort: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: banded random-hyperplane LSH
    for candidate generation (equi-join on (band, key) — NEVER all-pairs),
    exact integer-quantized cosine on candidates, ``>= threshold`` filter.

    Scale shape: each row explodes to ``n_bands`` keys; the self-join
    shuffles on (band, key), so per-bucket work is (n/2^planes_per_band)²
    per band. Size ``planes_per_band`` ~ log2(corpus)/2 so buckets stay
    bounded as the corpus grows; raise ``n_bands`` to recover recall lost
    to the finer buckets. Same recipe as minhash_lsh_candidates
    (pipeline/dedup.py) with hyperplanes instead of minhash rows.

    Cost shape: band keys and norms come from the Arrow kernels (one numpy
    matmul per batch); self-norms are computed once per ROW before the
    explode (not once per candidate). A pair colliding in several bands is
    kept only at its FIRST matching band (both sides carry the full key
    array, so 'no earlier band also collided' is a cheap post-join filter)
    — exactly-once scoring with NO extra dedup shuffle.

    ``max_bucket_size`` caps the candidate degree per (band, key) bucket:
    oversized buckets are deterministically down-sampled (md5-ordered
    row_number — an unbiased fixed sample) BEFORE the self-join, bounding
    worst-case pair count at cap²/2 per bucket regardless of how many
    replicas share a bucket. The cap trades recall inside pathological
    buckets for a bounded plan; pair ``near_dup_bucket_audit`` with any
    capped run to log exactly what was dropped. ``None`` disables."""
    bku, pair, n2 = (
        _band_keys_udf(n_bands, planes_per_band, dim),
        _pair_dot_udf(),
        _norm2_udf(),
    )
    rv = F.col(vec_col)
    keyed = (
        df.select(
            F.col(id_col),
            rv.alias("__v"),
            F.sqrt(n2(rv)).alias("__n"),
            bku(rv).alias("__keys"),
        )
        .select(
            id_col, "__v", "__n", "__keys", F.posexplode("__keys").alias("__bi", "__bk")
        )
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        # Single-phase cap, deliberately (r9 adjudication of the r8
        # "two-phase it" directive): the self-join below ALREADY shuffles
        # and sorts on (__bi, __bk), so the md5-ordered row_number window
        # rides that exchange for the cost of an extended sort key — the
        # measured r8 "+43% from the cap" was in fact the downstream
        # cluster-resolution loop (fixed separately). A two-phase variant
        # (bucket-count agg + broadcast + window only the oversized leg)
        # was built and MEASURED SLOWER at sf0.1 and 10x alike: it
        # re-executes the Arrow band-key kernels three times and its
        # union breaks the exchange reuse.
        w = Window.partitionBy("__bi", "__bk").orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
        # (r13 opt note: an explicit defaultParallelism-wide repartition
        # on (__bi, __bk) was measured here and REVERTED — task count
        # rose 11 -> 101 with identical wall time, i.e. the residual cost
        # of this operator is per-stage fixed overhead, not divisible
        # pair-scoring work.)
        keyed = (
            keyed.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= max_bucket_size)
            .drop("__r")
        )
    left = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.col("__keys").alias("__ka"),
        "__bi",
        "__bk",
    )
    right = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.col("__keys").alias("__kb"),
        F.col("__bi").alias("__bi2"),
        F.col("__bk").alias("__bk2"),
    )
    cand = (
        # shuffle_hash: the self-join must co-partition both sides on the
        # band key — at corpus scale neither side is broadcastable, and
        # locally a broadcast build of the UDF-bearing side measures 2.4×
        # slower than the shuffle plan this hint pins.
        left.hint("shuffle_hash").join(
            right,
            (F.col("__bi") == F.col("__bi2"))
            & (F.col("__bk") == F.col("__bk2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        # first-collision-band filter: drop the match if any EARLIER band
        # already collided — each unique pair survives exactly once, with no
        # dedup shuffle of the (wide) candidate payload
        .filter(
            ~F.exists(
                F.zip_with(
                    F.slice(F.col("__ka"), 1, F.col("__bi")),
                    F.slice(F.col("__kb"), 1, F.col("__bi")),
                    lambda x, y: x == y,
                ),
                lambda e: e,
            )
        )
    )
    dot = pair(F.col("__va"), F.col("__vb"))
    scored = cand.select(
        "id_a", "id_b", (dot / (F.col("__na") * F.col("__nb"))).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
    if not sort:
        # set-consumers (cluster resolution's union-find collect) are
        # order-insensitive: skip the global sort AND its barrier
        return scored
    return (
        scored
        # materialization barrier before the global sort (r14, guide §2.4):
        # RangePartitioning samples its child and then shuffles it — with
        # the join+dot stage directly underneath, that stage executed
        # TWICE more (sample pass + sort-shuffle pass).  An exchange over
        # the thresholded (id, id, cosine) rows — narrow, post-filter —
        # bounds both passes to a re-read of these shuffle files
        # (1.79 -> 1.17 s at sf0.1).  No width pin: AQE coalesces the
        # barrier to advisory size at any scale.
        .repartition(F.col("id_a"))
        .orderBy("id_a", "id_b")
    )


# -- IVF (inverted-file) ANN -------------------------------------------------

def ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Coarse-quantizer centroids: the `n_cells` lowest-id vectors,
    quantized. Deterministic sampling instead of k-means iterations keeps
    the quantizer engine-reproducible (an oracle can name the same rows).

    This IS a collect — of n_cells·dim ints, the coarse quantizer itself,
    never data-proportional. Every IVF system ships its centroids to every
    worker (FAISS trains them centrally); inlining them as plan literals
    makes cell assignment a pure projection: no join, no shuffle, no
    16×-row expansion through an aggregate."""
    rows = (
        df.select(F.col(id_col).alias("__id"), quantize(F.col(vec_col)).alias("__v"))
        .orderBy("__id")
        .limit(n_cells)
        .collect()
    )
    return [list(r["__v"]) for r in rows]


def _cell_dists(vec: Column, centroids: list[list[int]]) -> list[Column]:
    """Squared-L2 distance (exact integer arithmetic) to each centroid."""
    out = []
    for cent in centroids:
        lit = lit_array(cent)
        d = F.aggregate(
            F.zip_with(vec, lit, lambda x, c: (x - c) * (x - c)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        out.append(d)
    return out


def _nearest_cells(vec: Column, centroids: list[list[int]], n: int) -> Column:
    """Array of the n nearest cell ids (ties → lower cell id; array_sort on
    (dist, cid) structs is deterministic in both engines)."""
    pairs = F.array(
        *[
            F.struct(d.alias("d"), F.lit(c).alias("cid"))
            for c, d in enumerate(_cell_dists(vec, centroids))
        ]
    )
    return F.transform(F.slice(F.array_sort(pairs), 1, n), lambda s: s["cid"])


def ann_ivf_topk(
    df: DataFrame,
    query: DataFrame,
    centroids: list[list[int]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest coarse centroid (pure
    projection — centroids are plan literals), then score exactly ONLY the
    vectors whose cell is among the query's `n_probe` nearest cells.

    At scale the cell id is the partition/bucketing key of the stored
    index: a probe reads n_probe/n_cells of the corpus, and the probe join
    is a broadcast of n_probe cell ids — no shuffle of the corpus."""
    cu, csu = _cell_udf(centroids), _cells_udf(centroids, n_probe)
    pair, n2 = _pair_dot_udf(), _norm2_udf()
    rv = F.col(vec_col)
    q = F.broadcast(
        query.select(rv.alias("__qv"), F.explode(csu(rv)).alias("__qc"))
    )
    base = (
        df.select(F.col(id_col), rv.alias("__v"), cu(rv).alias("__cell"))
        .join(q, F.col("__cell") == F.col("__qc"))
    )
    dot = pair(F.col("__v"), F.col("__qv"))
    norm = F.sqrt(n2(F.col("__v"))) * F.sqrt(n2(F.col("__qv")))
    return (
        base.select(F.col(id_col), (dot / norm).alias("cosine"), F.col("__cell").alias("cell"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# -- int8 symmetric quantization (r6) ----------------------------------------
#
# The 8x-compression storage format ANN systems ship: per-vector scale
# s = max|x|/127, codes q_i = floor(x_i/s + ½) ∈ [-127, 127]. Cosine over
# the codes is scale-free, so quantized top-k needs no dequantization.
# All arithmetic below is IEEE float64 mult/div + floor — bit-identical
# between numpy, Spark expressions, and the DuckDB oracle.


def int8_vec(vec: Column) -> Column:
    """Reference HOF form of the int8 code vector (what the oracle SQL
    mirrors; `_int8_np` is the Arrow fast path, asserted equal in tests).
    All-zero vectors quantize to zeros (divisor guarded to 1)."""
    v = F.transform(vec, lambda x: x.cast("double"))
    m = F.array_max(F.transform(v, F.abs))
    den = F.when(m == 0.0, F.lit(1.0)).otherwise(m)
    return F.transform(v, lambda x: F.floor(x * 127.0 / den + 0.5))


def _int8_np(s: pd.Series) -> np.ndarray:
    """float32 vectors → n×dim int64 int8 codes (= int8_vec)."""
    a = np.vstack(s.to_numpy()).astype(np.float64)
    m = np.abs(a).max(axis=1, keepdims=True)
    m = np.where(m == 0.0, 1.0, m)
    return np.floor(a * 127.0 / m + 0.5).astype(np.int64)


def _pair_dot8_udf():
    """(vec_a, vec_b) → int64 dot of the int8 codes."""

    @pandas_udf("long")
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        qa, qb = _int8_np(a), _int8_np(b)
        return pd.Series(np.einsum("ij,ij->i", qa, qb))

    return f


def _norm28_udf():
    """vec → int64 self-dot of the int8 codes."""

    @pandas_udf("long")
    def f(v: pd.Series) -> pd.Series:
        q = _int8_np(v)
        return pd.Series(np.einsum("ij,ij->i", q, q))

    return f


def int8_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine over int8-quantized codes — the scorer a
    quantized vector store runs. Same shape as `cosine_topk` (broadcast
    1-row query, one scan, TakeOrderedAndProject); the integer dot is 8x
    less memory traffic per vector than float32, which is the point of
    quantized storage at 100 TB. Emits the integer dot and the scale-free
    quantized cosine."""
    pair, n2 = _pair_dot8_udf(), _norm28_udf()
    q = F.broadcast(query.select(F.col(vec_col).alias("__qv")))
    base = df.select(F.col(id_col), F.col(vec_col).alias("__v")).crossJoin(q)
    dot = pair(F.col("__v"), F.col("__qv"))
    n2a, n2b = n2(F.col("__v")), n2(F.col("__qv"))
    cos = F.when((n2a == 0) | (n2b == 0), F.lit(0.0)).otherwise(
        dot / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double")))
    )
    scored = base.select(F.col(id_col), dot.alias("dot_q8"), cos.alias("cosine_q8"))
    return scored.orderBy(F.col("cosine_q8").desc(), F.col(id_col).asc()).limit(k)


# -- k-NN JOIN (r9) -----------------------------------------------------------
#
# Top-k corpus neighbors for EVERY row of a query SET — the batch form a
# retrieval/dedup pipeline actually runs (single-query top-k is the degenerate
# |Q|=1 case). Reference parity: QuestDB has no vector ops; this is part of
# the LLM-pipeline extension alongside SURVEY.md §2.


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact k-NN join by quantized cosine: every query row gets its k
    nearest corpus rows.

    Scale shape: queries are BROADCAST (|Q| small by assumption — the
    batch of probes, not a second corpus); scoring is one corpus pass
    producing |corpus|·|Q| scored rows, and the per-query top-k is a
    window on q_id (one shuffle whose width is |Q| keys). At 100 TB this
    is the scan-bound exact baseline; `knn_join_ivf` is the pruned path.
    Scores are integer-quantized dots (bit-stable across engines); ties
    resolve by corpus id ascending."""
    from pyspark.sql import Window

    q_id = q_id_col or id_col
    q = F.broadcast(
        queries.select(
            F.col(q_id).alias("q_id"), quantize(F.col(vec_col)).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col), quantize(F.col(vec_col)).alias("__v"))
    dot = dot_q(F.col("__v"), F.col("__qv"))
    n2a, n2b = dot_q(F.col("__v"), F.col("__v")), dot_q(F.col("__qv"), F.col("__qv"))
    scored = c.crossJoin(q).select(
        "q_id",
        id_col,
        dot.alias("dot_q"),
        F.when((n2a == 0) | (n2b == 0), F.lit(0.0))
        .otherwise(
            dot / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double")))
        )
        .alias("cosine"),
    )
    if exclude_self:
        # queries drawn from the corpus match themselves at cosine 1 —
        # drop the self pair BEFORE ranking so k true neighbors survive
        scored = scored.filter(F.col("q_id") != F.col(id_col))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_join_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
) -> DataFrame:
    """IVF-pruned k-NN join: corpus rows carry their coarse cell (pure
    projection over plan-literal centroids — the stored index's
    partitioning key), each query probes its `n_probe` nearest cells, and
    scoring runs ONLY inside probed cells via a broadcast equi-join on
    cell id. Recall is bounded by the probe set; raise n_probe to trade
    scan fraction for recall."""
    from pyspark.sql import Window

    q_id = q_id_col or id_col
    cu, csu = _cell_udf(centroids), _cells_udf(centroids, n_probe)
    rv = F.col(vec_col)
    q = F.broadcast(
        queries.select(
            F.col(q_id).alias("q_id"),
            quantize(rv).alias("__qv"),
            F.explode(csu(rv)).alias("__qc"),
        )
    )
    c = corpus.select(
        F.col(id_col), quantize(rv).alias("__v"), cu(rv).alias("__cell")
    )
    dot = dot_q(F.col("__v"), F.col("__qv"))
    n2a, n2b = dot_q(F.col("__v"), F.col("__v")), dot_q(F.col("__qv"), F.col("__qv"))
    scored = c.join(q, F.col("__cell") == F.col("__qc")).select(
        "q_id",
        id_col,
        F.when((n2a == 0) | (n2b == 0), F.lit(0.0))
        .otherwise(
            dot / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double")))
        )
        .alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- Product quantization (IVF-PQ's compression half, r10) ------------------
# The standard 100 TB ANN layout: corpus vectors compress to m sub-codes
# (here 8 bytes instead of 64 floats — 32x), and a query scans CODES with
# per-subvector lookup tables (asymmetric distance computation) instead of
# touching raw vectors.  Codebooks are deterministic (sub-slices of the k
# lowest-id vectors, same convention as ivf_centroids) so a SQL oracle can
# name the identical codewords; distances are exact integer arithmetic on
# the fixed-point grid.

PQ_M = 8  # subvectors (dim 64 -> 8 dims each)
PQ_K = 16  # codewords per subvector


def pq_codebooks(
    df: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """codebooks[s][j] = sub-slice s of the j-th lowest-id vector,
    quantized.  A bounded collect of k vectors (k·dim ints) — the trained
    index every PQ system ships to workers; never data-proportional."""
    rows = (
        df.select(F.col(id_col).alias("__id"), quantize(F.col(vec_col)).alias("__v"))
        .orderBy("__id")
        .limit(k)
        .collect()
    )
    vecs = [list(r["__v"]) for r in rows]
    d_sub = len(vecs[0]) // m
    return [
        [v[s * d_sub : (s + 1) * d_sub] for v in vecs] for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra: list | None = None,
) -> DataFrame:
    """Encode each vector into its m nearest sub-codewords (ties -> lowest
    code).  Map-only: one vectorized Arrow kernel over plan-shipped
    codebooks — no join, no shuffle, the shape a 100 TB encode job wants.
    (A first cut unrolled the m*K*d_sub distance arithmetic into Catalyst
    expressions; exact and shuffle-free too, but the driver paid ~13s
    compiling 1024 expression nodes PER QUERY — a scale-invariant fixed
    cost the numpy kernel doesn't have.  argmin's first-minimum is the
    same lowest-code tie-break the oracle mirrors.)
    ``extra``: additional Columns to carry through the same projection
    (e.g. the IVF cell id, so the whole stored index is ONE encode pass)."""
    cb = np.array(codebooks, dtype=np.int64)  # m x K x d_sub
    m, _K, d_sub = cb.shape
    cnorms = [np.einsum("ij,ij->i", cb[s], cb[s]) for s in range(m)]

    @pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        q = _quant_np(v)
        out = np.empty((q.shape[0], m), dtype=np.int32)
        for s in range(m):
            sub = q[:, s * d_sub : (s + 1) * d_sub]
            # ||sub-c||² = ||sub||² − 2 sub·c + ||c||²; ||sub||² is
            # row-constant -> argmin over (−2 sub·c + ||c||²)
            d = -2 * (sub @ cb[s].T) + cnorms[s]
            out[:, s] = np.argmin(d, axis=1)  # first min = lowest code
        return pd.Series(list(out))

    return df.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"), *(extra or []))


def pq_adc_topk(
    codes_df: DataFrame,
    query_vec: list[int],
    codebooks: list[list[list[int]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric distance scan: LUT[s][j] = L2²(query sub-slice s,
    codeword j) computed once from the (bounded, |q|=1) query vector, then
    every corpus row costs m array lookups + adds over its CODES — raw
    vectors are never read.  Global top-k is the only ordering step."""
    d_sub = len(codebooks[0][0])
    luts = [
        [
            sum(
                (int(query_vec[s * d_sub + i]) - int(cw[i])) ** 2
                for i in range(d_sub)
            )
            for cw in cb
        ]
        for s, cb in enumerate(codebooks)
    ]
    adc = None
    for s, lut in enumerate(luts):
        term = F.element_at(
            lit_array_long(lut),
            F.element_at(F.col("codes"), s + 1) + 1,
        )
        adc = term if adc is None else adc + term
    return (
        codes_df.select(F.col(id_col), adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_topk(
    corpus: DataFrame,
    query_vec: list[int],
    centroids: list[list[int]],
    codebooks: list[list[list[int]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The composed IVF-PQ index — the production 100 TB ANN layout end to
    end: corpus rows carry a coarse cell (plan-literal centroids) AND
    their PQ codes; the query probes its `n_probe` nearest cells (exact
    integer L2² on the driver — the query is one bounded vector) and the
    asymmetric-distance scan touches ONLY probed cells' codes.  The cell
    filter is a pushable `isin` predicate, so a cell-partitioned layout
    prunes at the scan; raw vectors are never read at query time."""
    dists = [
        (
            sum((int(query_vec[i]) - int(c[i])) ** 2 for i in range(len(c))),
            cid,
        )
        for cid, c in enumerate(centroids)
    ]
    probe = [cid for _, cid in sorted(dists)[:n_probe]]
    cu = _cell_udf(centroids)
    # cell + codes in ONE map-only projection — the stored-index encode
    # pass; query-time work is then filter(cell isin probes) + ADC only
    coded = pq_encode(
        corpus, codebooks, id_col=id_col, vec_col=vec_col,
        extra=[cu(F.col(vec_col)).alias("__cell")],
    )
    pruned = coded.filter(F.col("__cell").isin(*probe)).select(id_col, "codes")
    return pq_adc_topk(pruned, query_vec, codebooks, k=k, id_col=id_col)


# -- distributed k-means training (r10) ---------------------------------------
#
# The missing piece of the IVF story: `ivf_centroids` deterministically
# SAMPLES a coarse quantizer; `kmeans_train` actually TRAINS one with
# Lloyd's iterations, the way FAISS/MLlib build the index that a 100 TB
# ANN deployment ships.  Everything is exact int64 arithmetic on the
# fixed-point grid so a SQL oracle can replay the identical iterations:
#
#   init       centroids = quantized vectors of the k lowest ids
#                          (the ivf_centroids convention)
#   assign     cell = argmin over centroids of exact squared-L2
#                          (ties -> lower cell id)
#   update     centroid[j] = floor(mean of assigned q[j])), computed as
#                          (sum + count*KM_OFF) // count - KM_OFF with
#                          positive operands so truncation == floor in
#                          every engine; empty cells keep their centroid
#
# Scale shape (the same one MLlib's KMeans uses): each iteration is ONE
# map pass (vectorized Arrow argmin over plan-shipped centroids) + ONE
# partial-aggregated groupBy of k*dim cells — the shuffle moves k*dim
# longs per map task, never data.  The per-iteration collect is the
# k x dim model update (bounded, never data-proportional).

KM_OFF = 1 << 20  # |q| <= ~1e4 << KM_OFF, count*KM_OFF << 2^63


def _cell_dist_udf(centroids: list[list[int]]):
    """vec -> (nearest cell id, exact int64 squared-L2 to it)."""
    cents = np.array(centroids, dtype=np.int64)
    cn = np.einsum("ij,ij->i", cents, cents)

    @pandas_udf("cell int, dist bigint")
    def f(v: pd.Series) -> pd.DataFrame:
        q = _quant_np(v)
        # ||q-c||^2 = ||q||^2 - 2 q.c + ||c||^2, all int64-exact
        d = -2 * (q @ cents.T) + cn
        cell = np.argmin(d, axis=1)  # first min = lowest cell id
        dist = d[np.arange(len(cell)), cell] + np.einsum("ij,ij->i", q, q)
        return pd.DataFrame({"cell": cell.astype(np.int32), "dist": dist})

    return f


# -- fused ANN score table (r14 opt) ------------------------------------------
#
# The recall report probes FIVE indexes over the same corpus; run as five
# independent route plans that is five Arrow kernel passes + five scans.
# Every per-vector quantity each route ranks on is a pure function of the
# quantized vector and the (bounded) query/centroid/codebook literals, so
# ONE kernel pass can emit them all: the exact dot and self-norm (cosine
# ranks exact/lsh/ivf routes; the sqrt/division stays a JVM expression so
# float semantics are untouched), the LSH bucket, the sampled and trained
# IVF cell ids, and the PQ asymmetric distance.  Each value reuses the
# identical numpy arithmetic of the single-purpose kernels it replaces
# (_bucket_udf / _cell_udf / _pq_encode_udf + the JVM LUT lookup), all
# int64-exact — route membership is bit-identical by construction and
# pinned by test_ann_score_table_matches_route_kernels.


def query_lsh_bucket(query_vec: list[int], dim: int = MAX_DIM) -> int:
    """The query's LSH bucket from its QUANTIZED vector — same ints, same
    matmul as _bucket_udf on the raw query row."""
    m = _sign_matrix(N_PLANES, dim)
    pows = (1 << np.arange(N_PLANES)).astype(np.int64)
    q = np.array(query_vec, dtype=np.int64)
    d = m[:, : len(q)] @ q
    return int((d > 0) @ pows)


def query_probe_cells(
    query_vec: list[int], centroids: list[list[int]], n: int
) -> list[int]:
    """The query's n nearest cells — same stable argsort as _cells_udf."""
    c = np.array(centroids, dtype=np.int64)
    q = np.array(query_vec, dtype=np.int64)
    d = -2 * (c[:, : len(q)] @ q) + np.einsum("ij,ij->i", c, c)
    return [int(x) for x in np.argsort(d, kind="stable")[:n]]


def ann_score_table(
    df: DataFrame,
    query_vec: list[int],
    centroids: list[list[int]],
    trained_centroids: list[list[int]],
    codebooks: list[list[list[int]]],
    dim: int = MAX_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow pass per corpus row -> (id, dot, n2, bucket, cell, tcell,
    adc).  ``query_vec`` is the QUANTIZED query (the same ints quantize()
    yields), so dot == _pair_dot_udf(v, raw_query) exactly."""
    qq = np.array(query_vec, dtype=np.int64)
    c = np.array(centroids, dtype=np.int64)
    cn = np.einsum("ij,ij->i", c, c)
    t = np.array(trained_centroids, dtype=np.int64)
    tn = np.einsum("ij,ij->i", t, t)
    cb = np.array(codebooks, dtype=np.int64)  # m x K x d_sub
    m, _K, d_sub = cb.shape
    cnorms = [np.einsum("ij,ij->i", cb[s], cb[s]) for s in range(m)]
    # ADC LUT[s][j] = exact int L2^2 of (query sub-slice s, codeword j) —
    # the same table pq_adc_topk ships as plan literals
    luts = np.stack(
        [
            np.einsum(
                "ij,ij->i",
                cb[s] - qq[s * d_sub : (s + 1) * d_sub],
                cb[s] - qq[s * d_sub : (s + 1) * d_sub],
            )
            for s in range(m)
        ]
    )
    sm = _sign_matrix(N_PLANES, dim)
    pows = (1 << np.arange(N_PLANES)).astype(np.int64)

    @pandas_udf("dot long, n2 long, bucket int, cell int, tcell int, adc long")
    def f(v: pd.Series) -> pd.DataFrame:
        q = _quant_np(v)
        w = q.shape[1]
        dot = q @ qq[:w]
        n2 = np.einsum("ij,ij->i", q, q)
        bucket = (((q @ sm[:, :w].T) > 0) @ pows).astype(np.int32)
        cell = np.argmin(-2 * (q @ c[:, :w].T) + cn, axis=1).astype(np.int32)
        tcell = np.argmin(-2 * (q @ t[:, :w].T) + tn, axis=1).astype(np.int32)
        adc = np.zeros(len(q), dtype=np.int64)
        for s in range(m):
            sub = q[:, s * d_sub : (s + 1) * d_sub]
            code = np.argmin(-2 * (sub @ cb[s].T) + cnorms[s], axis=1)
            adc += luts[s][code]
        return pd.DataFrame(
            {"dot": dot, "n2": n2, "bucket": bucket, "cell": cell,
             "tcell": tcell, "adc": adc}
        )

    out = df.select(F.col(id_col), f(F.col(vec_col)).alias("__s"))
    return out.select(
        id_col,
        F.col("__s.dot").alias("dot"),
        F.col("__s.n2").alias("n2"),
        F.col("__s.bucket").alias("bucket"),
        F.col("__s.cell").alias("cell"),
        F.col("__s.tcell").alias("tcell"),
        F.col("__s.adc").alias("adc"),
    )


def quant_frame(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """The projected (__id, __q) training frame every trainer pass reads:
    id + quantized vector, width-spread, persisted by the caller.  At
    cluster scale this is the standard trainer discipline — the projected
    quantized column is what fits executor storage, not the source table;
    MEMORY_AND_DISK so a spill degrades, not dies.  Width follows cores
    (r13 opt): the embeddings parquet is one sub-MB split, so an un-spread
    persist pins every iteration's map stage on ONE task; the spread
    no-ops on a properly-partitioned production scan."""
    from .text import spread_by_cores

    return spread_by_cores(df).select(
        F.col(id_col).alias("__id"), quantize(F.col(vec_col)).alias("__q")
    )


def _km_update_stats(q: DataFrame, centroids: list[list[int]]):
    """One Lloyd's round's model-update rows from the cached (__id, __q)
    frame: per-batch mapInArrow partials (assign each vector to its argmin
    cell, accumulate exact int64 per-(cell, pos) sums/counts in numpy),
    then one tiny groupBy over k*dim-bounded partial rows.  Replaces the
    posexplode(dim x rows)->groupBy shape: the shuffle now moves
    k*dim longs per batch instead of dim rows per vector (guide §2.4/§4);
    integer sum re-association is exact, so the collected stats are
    bit-identical to the exploded form."""
    import pyarrow as pa

    cents = np.array(centroids, dtype=np.int64)
    cn = np.einsum("ij,ij->i", cents, cents)
    k, dim = cents.shape

    def part(it):
        for batch in it:
            qm = np.stack(
                batch.column("__q").to_numpy(zero_copy_only=False)
            ).astype(np.int64, copy=False)
            cell = np.argmin(-2 * (qm @ cents.T) + cn, axis=1)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, cell, qm)
            cnts = np.bincount(cell, minlength=k)
            present = np.nonzero(cnts > 0)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.repeat(present, dim).astype(np.int32), pa.int32()
                    ),
                    pa.array(
                        np.tile(np.arange(dim, dtype=np.int32), len(present)),
                        pa.int32(),
                    ),
                    pa.array(sums[present].ravel(), pa.int64()),
                    pa.array(
                        np.repeat(cnts[present], dim).astype(np.int64),
                        pa.int64(),
                    ),
                ],
                names=["cell", "pos", "s", "cnt"],
            )

    return (
        q.mapInArrow(part, "cell int, pos int, s long, cnt long")
        .groupBy("cell", "pos")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()  # k*dim model-update rows — bounded, documented
    )


def kmeans_train_frame(
    q: DataFrame, k: int, iters: int
) -> list[list[int]]:
    """Lloyd's rounds over an already-persisted (__id, __q) frame.  Init =
    the ivf_centroids convention (k lowest-id vectors, quantized) read
    from the SAME cached frame, so the init collect is also the action
    that materializes the cache — one corpus scan for init + all rounds."""
    rows = q.orderBy("__id").limit(k).collect()
    cents = [list(r["__q"]) for r in rows]
    for _ in range(iters):
        stats = _km_update_stats(q, cents)
        nxt = [list(c) for c in cents]
        for r in stats:
            nxt[r["cell"]][r["pos"]] = (
                r["s"] + r["cnt"] * KM_OFF
            ) // r["cnt"] - KM_OFF
        cents = nxt
    return cents


def kmeans_train(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Lloyd's k-means over the quantized embedding column; returns the
    trained centroids (k x dim ints).  `iters` assignment+update rounds."""
    q = quant_frame(df, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return kmeans_train_frame(q, k, iters)
    finally:
        q.unpersist()


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector cell assignment for a trained model: ONE Arrow map pass
    with the centroids shipped as plan literals (the IVF encode shape) —
    no join, no shuffle; downstream ops group on the cell column."""
    cd = _cell_dist_udf(centroids)
    return df.select(
        F.col(id_col), cd(F.col(vec_col)).alias("__a")
    ).select(id_col, F.col("__a.cell").alias("cell"))


def kmeans_report(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final-assignment report for a trained model: one row per
    (cell, pos) carrying the centroid value plus the cell's size and
    exact integer inertia (sum of squared-L2 of its members) — the
    everything-checkable training summary."""
    spark = df.sparkSession
    cd = _cell_dist_udf(centroids)
    agg = (
        df.select(cd(F.col(vec_col)).alias("__a"))
        .groupBy(F.col("__a.cell").alias("cell"))
        .agg(F.count("*").alias("size"), F.sum("__a.dist").alias("inertia"))
    )
    cent_rows = [
        (ci, pos, int(val))
        for ci, cent in enumerate(centroids)
        for pos, val in enumerate(cent)
    ]
    cents_df = spark.createDataFrame(cent_rows, "cell int, pos int, cval bigint")
    return (
        cents_df.join(F.broadcast(agg), "cell", "left")
        .select(
            "cell", "pos", "cval",
            F.coalesce("size", F.lit(0)).alias("size"),
            F.coalesce("inertia", F.lit(0)).alias("inertia"),
        )
        .orderBy("cell", "pos")
    )


def kmeans_report_rows(
    q: DataFrame, centroids: list[list[int]]
) -> list[tuple[int, int, int, int, int]]:
    """Final-assignment report rows (cell, pos, cval, size, inertia) for a
    trained model, computed from the cached (__id, __q) frame: one
    mapInArrow pass emits per-batch (cell, size, inertia) partials with
    the same exact int64 squared-L2 arithmetic as _cell_dist_udf, one tiny
    groupBy sums them (integer re-association — exact), and the k-bounded
    result merges with the centroid literals driver-side.  Model-scale
    rows only (k*dim), never data-proportional."""
    import pyarrow as pa

    cents = np.array(centroids, dtype=np.int64)
    cn = np.einsum("ij,ij->i", cents, cents)
    k = cents.shape[0]

    def part(it):
        for batch in it:
            qm = np.stack(
                batch.column("__q").to_numpy(zero_copy_only=False)
            ).astype(np.int64, copy=False)
            d = -2 * (qm @ cents.T) + cn
            cell = np.argmin(d, axis=1)
            dist = d[np.arange(len(cell)), cell] + np.einsum(
                "ij,ij->i", qm, qm
            )
            cnts = np.bincount(cell, minlength=k)
            inertia = np.zeros(k, dtype=np.int64)
            np.add.at(inertia, cell, dist)
            present = np.nonzero(cnts > 0)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(present.astype(np.int32), pa.int32()),
                    pa.array(cnts[present].astype(np.int64), pa.int64()),
                    pa.array(inertia[present], pa.int64()),
                ],
                names=["cell", "size", "inertia"],
            )

    agg = {
        int(r["cell"]): (int(r["size"]), int(r["inertia"]))
        for r in (
            q.mapInArrow(part, "cell int, size long, inertia long")
            .groupBy("cell")
            .agg(F.sum("size").alias("size"), F.sum("inertia").alias("inertia"))
            .collect()  # k model rows — bounded, documented
        )
    }
    return [
        (ci, pos, int(val), agg.get(ci, (0, 0))[0], agg.get(ci, (0, 0))[1])
        for ci, cent in enumerate(centroids)
        for pos, val in enumerate(cent)
    ]


def pq_train(
    df: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """TRAIN the PQ codebooks with per-subspace k-means (the FAISS recipe;
    `pq_codebooks` is the sampled init).  All m subspaces train in ONE
    job per iteration: the encode kernel assigns every subspace's code in
    one Arrow pass, and the update is a single groupBy over
    (subspace, code, subpos) — m*k*d_sub model rows, never data.  Same
    exact-integer contract as `kmeans_train` (argmin ties -> lowest code,
    floor-mean via the positive-offset trick, empty codewords persist),
    so a SQL oracle can replay training subspace-by-subspace."""
    q = quant_frame(df, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return pq_train_frame(q, m, k, iters)
    finally:
        q.unpersist()


def pq_train_frame(
    q: DataFrame, m: int, k: int, iters: int
) -> list[list[list[int]]]:
    """Per-subspace Lloyd's rounds over an already-persisted (__id, __q)
    frame.  Init = the pq_codebooks convention (k lowest-id vectors,
    quantized, sliced into m subspaces) read from the SAME cached frame,
    so the init collect is also the cache-materializing action — one
    corpus scan covers init + every round (same discipline as
    kmeans_train_frame)."""
    rows = q.orderBy("__id").limit(k).collect()
    vecs = [list(r["__q"]) for r in rows]
    d_sub = len(vecs[0]) // m
    cbs = [[v[s * d_sub : (s + 1) * d_sub] for v in vecs] for s in range(m)]
    for _ in range(iters):
        stats = _pq_update_stats(q, cbs)
        nxt = [[list(cw) for cw in cb] for cb in cbs]
        for r in stats:
            nxt[r["sub"]][r["code"]][r["subpos"]] = (
                r["s"] + r["cnt"] * KM_OFF
            ) // r["cnt"] - KM_OFF
        cbs = nxt
    return cbs


def _pq_update_stats(q: DataFrame, codebooks: list[list[list[int]]]):
    """One PQ round's model-update rows from the cached frame: per-batch
    mapInArrow partials assign each (vector, subspace) its argmin code with
    the exact _pq_encode_udf arithmetic and accumulate int64 per-(sub,
    code, subpos) sums/counts in numpy; one tiny groupBy over the
    m*k*d_sub-bounded partial rows replaces the posexplode(dim x rows)
    shuffle.  Integer sum re-association is exact — the collected stats
    are bit-identical to the exploded form."""
    import pyarrow as pa

    cb = np.array(codebooks, dtype=np.int64)  # m x K x d_sub
    m, K, d_sub = cb.shape
    cnorms = [np.einsum("ij,ij->i", cb[s], cb[s]) for s in range(m)]

    def part(it):
        for batch in it:
            qm = np.stack(
                batch.column("__q").to_numpy(zero_copy_only=False)
            ).astype(np.int64, copy=False)
            subs, codes, subposs, ss, cnts = [], [], [], [], []
            for s in range(m):
                sub = qm[:, s * d_sub : (s + 1) * d_sub]
                code = np.argmin(-2 * (sub @ cb[s].T) + cnorms[s], axis=1)
                sums = np.zeros((K, d_sub), dtype=np.int64)
                np.add.at(sums, code, sub)
                cnt = np.bincount(code, minlength=K)
                present = np.nonzero(cnt > 0)[0]
                subs.append(np.full(len(present) * d_sub, s, dtype=np.int32))
                codes.append(np.repeat(present, d_sub).astype(np.int32))
                subposs.append(
                    np.tile(np.arange(d_sub, dtype=np.int32), len(present))
                )
                ss.append(sums[present].ravel())
                cnts.append(np.repeat(cnt[present], d_sub).astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(subs), pa.int32()),
                    pa.array(np.concatenate(codes), pa.int32()),
                    pa.array(np.concatenate(subposs), pa.int32()),
                    pa.array(np.concatenate(ss), pa.int64()),
                    pa.array(np.concatenate(cnts), pa.int64()),
                ],
                names=["sub", "code", "subpos", "s", "cnt"],
            )

    return (
        q.mapInArrow(part, "sub int, code int, subpos int, s long, cnt long")
        .groupBy("sub", "code", "subpos")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()  # m*k*d_sub model rows — bounded, documented
    )


def pq_usage_rows(
    q: DataFrame, codebooks: list[list[list[int]]]
) -> dict[tuple[int, int], int]:
    """Final per-(sub, code) usage counts of a trained codebook over the
    cached (__id, __q) frame — the encode assignment of _pq_encode_udf
    reduced to per-batch bincount partials and one tiny groupBy (m*k
    model rows, bounded).  Exact: counts are integers."""
    import pyarrow as pa

    cb = np.array(codebooks, dtype=np.int64)
    m, K, d_sub = cb.shape
    cnorms = [np.einsum("ij,ij->i", cb[s], cb[s]) for s in range(m)]

    def part(it):
        for batch in it:
            qm = np.stack(
                batch.column("__q").to_numpy(zero_copy_only=False)
            ).astype(np.int64, copy=False)
            subs, codes, useds = [], [], []
            for s in range(m):
                sub = qm[:, s * d_sub : (s + 1) * d_sub]
                code = np.argmin(-2 * (sub @ cb[s].T) + cnorms[s], axis=1)
                cnt = np.bincount(code, minlength=K)
                present = np.nonzero(cnt > 0)[0]
                subs.append(np.full(len(present), s, dtype=np.int32))
                codes.append(present.astype(np.int32))
                useds.append(cnt[present].astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(subs), pa.int32()),
                    pa.array(np.concatenate(codes), pa.int32()),
                    pa.array(np.concatenate(useds), pa.int64()),
                ],
                names=["sub", "code", "used"],
            )

    return {
        (int(r["sub"]), int(r["code"])): int(r["used"])
        for r in (
            q.mapInArrow(part, "sub int, code int, used long")
            .groupBy("sub", "code")
            .agg(F.sum("used").alias("used"))
            .collect()  # m*k model rows — bounded, documented
        )
    }


def _pq_encode_udf(codebooks: list[list[list[int]]]):
    """vec -> array of m nearest sub-codewords (the pq_encode kernel,
    exposed for reuse by training)."""
    cb = np.array(codebooks, dtype=np.int64)  # m x K x d_sub
    m, _K, d_sub = cb.shape
    cnorms = [np.einsum("ij,ij->i", cb[s], cb[s]) for s in range(m)]

    @pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        q = _quant_np(v)
        out = np.empty((q.shape[0], m), dtype=np.int32)
        for s in range(m):
            sub = q[:, s * d_sub : (s + 1) * d_sub]
            d = -2 * (sub @ cb[s].T) + cnorms[s]
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return enc


def mmr_rerank(
    df: DataFrame,
    query: DataFrame,
    k_candidates: int = 20,
    k_select: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversity re-rank (Carbonell &
    Goldstein 1998) — the standard retrieval-serving step between a
    relevance cut and the final context window: greedily pick documents
    maximizing rel(d) - max_{s in picked} sim(d, s) (lambda = 0.5, both
    halves scaled x2 so the score stays subtraction-exact).

    Stage 1: exact cosine top-`k_candidates` shortlist — a
    TakeOrderedAndProject over the corpus; the only stage that touches
    every vector.  Stage 2: pairwise candidate cosines via a broadcast
    self-join (k^2 rows, corpus-size-independent).  Stage 3: the greedy
    loop runs on the COLLECTED k-bounded score table (k + k^2 rows — a
    model-scale collect per the kmeans/PQ discipline; at 100 TB stages 1
    and 2 are the distributed work and stage 3 touches <= a few hundred
    numbers).  Determinism: relevance and pairwise cosines quantize to
    DECIMAL(18,6) before the greedy compare (sqrt and division are
    IEEE-correctly-rounded in both engines), ties break on lowest id, so
    an oracle can replay pick by pick.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    spark = df.sparkSession
    # ONE corpus pass (r14 opt): the top-k carries the shortlist's vectors
    # as TakeOrderedAndProject payload, so neither a re-attach join (a
    # second corpus scan) nor a Spark job for the k x k pairwise cosines
    # is needed — the pairwise table is k-bounded by construction and is
    # computed on the driver from the SAME quantized integers with the
    # SAME IEEE double ops (int64 dot and norms are exact; sqrt and the
    # division are correctly rounded in numpy and the JVM alike; the
    # decimal(18,6) quantization below replays Cast's
    # Double.toString -> HALF_UP setScale, which Decimal(repr) matches
    # because both sides print the shortest round-trip decimal).
    # Pinned by test_mmr_driver_sims_match_spark_expressions.
    cand = cosine_topk(
        df, query, k=k_candidates, id_col=id_col, vec_col=vec_col, keep_vec=True
    )
    rows = cand.select(
        F.col(id_col).alias("__i"),
        F.col("cosine").cast("decimal(18,6)").alias("__rel"),
        F.col(vec_col).alias("__v"),
    ).collect()
    rels = {r["__i"]: Decimal(str(r["__rel"])) for r in rows}
    qvecs = {
        r["__i"]: _quant_np(pd.Series([np.array(r["__v"], dtype=np.float64)]))[0]
        for r in rows
    }
    six = Decimal("0.000001")
    sims: dict[tuple[int, int], Decimal] = {}
    for ia, va in qvecs.items():
        na = math.sqrt(int(va @ va))
        for ib, vb in qvecs.items():
            if ia == ib:
                continue
            s = int(va @ vb) / (na * math.sqrt(int(vb @ vb)))
            sims[(ia, ib)] = Decimal(repr(s)).quantize(six, rounding=ROUND_HALF_UP)
    picked: list[tuple[int, Decimal]] = []
    remaining = set(rels)
    while remaining and len(picked) < k_select:
        best_id, best_m = None, None
        for d in sorted(remaining):
            if picked:
                m = rels[d] - max(sims[(d, s)] for s, _ in picked)
            else:
                m = rels[d]
            if best_m is None or m > best_m:
                best_id, best_m = d, m
        picked.append((best_id, best_m))
        remaining.discard(best_id)
    rows = [
        (rank + 1, did, float(m)) for rank, (did, m) in enumerate(picked)
    ]
    # Arrow-backed local relation (r14 session 4, guide §4): the
    # list-of-tuples route pickles + parallelizes 32 slices (~0.5-0.9 s
    # per action warm); one Arrow batch ships the same rows in ~0.15 s.
    # Arrow carries the float64 BITS, so the mmr doubles stay bit-exact
    # (the reason this final was excluded from the VALUES-text pass).
    import pandas as _pd

    return spark.createDataFrame(
        _pd.DataFrame(rows, columns=["rank", id_col, "mmr"]),
        schema=f"rank int, {id_col} bigint, mmr double",
    )
