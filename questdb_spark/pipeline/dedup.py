"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of this module):
- exact dedup = hash + groupBy — one shuffle on a 32-char key;
- near-dup candidate generation NEVER does an all-pairs cross join: both
  the Jaccard and MinHash paths go shingle→explode→equi-join, so cost is
  proportional to shared-shingle pairs, and LSH banding caps the join key
  cardinality. Skewed "stop-shingles" (shared by thousands of docs) are
  the classic blow-up; `max_shingle_df` drops them (off by default so the
  DuckDB oracle stays expressible).
- hashes are md5-based so results are engine-independent and
  deterministic (no JVM hash seeding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles_col, tokens_col


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content hash: md5 → groupBy. Returns one
    row per duplicated hash with the canonical (min) id and the dup count."""
    h = F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def _shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    sh = shingles_col(tokens_col(F.col(text_col)), n)
    return df.select(F.col(id_col).alias("doc"), F.explode(sh).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    shingle-join candidate generation: |common shingles| per pair, then
    jaccard = common / (|a| + |b| - common). Exact (within the shingle
    representation) — no approximation.
    """
    sh = _shingle_table(df, id_col, text_col, n)
    if max_shingle_df is not None:  # stop-shingle removal (skew guard)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count_distinct("doc").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


N_HASHES = 8
BAND_SIZE = 4  # → 2 bands


def minhash_signature(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """MinHash signature: one pass over exploded shingles, N_HASHES
    min-aggregations of seeded md5 (single shuffle; no per-seed explode)."""
    sh = _shingle_table(df, id_col, text_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """LSH banding over the MinHash signature: band value = concat of
    BAND_SIZE signature slots; docs sharing any band are candidates.
    Returns distinct candidate pairs (doc_a < doc_b, with the matching
    band id)."""
    sig = minhash_signature(df, id_col, text_col, n)
    n_bands = N_HASHES // BAND_SIZE
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(*[F.col(f"h{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]).alias("val"),
            )
            for b in range(n_bands)
        ]
    )
    bt = sig.select(F.col("doc"), F.explode(bands).alias("b")).select(
        "doc", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    a = bt.alias("a")
    b = bt.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), F.col("a.band").alias("band"))
        .distinct()
    )


SIMHASH_BITS = 16


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """SimHash over tokens: bit b of the hash of token t = (hex nibble b of
    md5(t) >= '8'); document bit = sign of the per-bit vote sum. 16 bits
    (one md5 nibble per bit) keeps it engine-portable; the aggregation is a
    single groupBy with SIMHASH_BITS conditional sums."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).withColumn("__md5", F.md5(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.substring(F.col("__md5"), b + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sim = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc", sim.cast("long").alias("simhash16"))


def dedup_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into clusters: connected components via
    min-label propagation (each doc converges to the smallest doc id in its
    component — the canonical document).

    Input: (doc_a, doc_b) candidate pairs (from `ngram_jaccard_pairs` or
    `minhash_lsh_candidates`). Output: (doc, cluster) for every doc that
    appears in a pair.

    Scale notes: label propagation is O(diameter) iterative joins; dedup
    graphs are overwhelmingly star-shaped (diameter ≤ ~3), so this
    converges in 2-3 rounds. Each round is one shuffle on doc id;
    convergence is checked with a cheap count of changed labels.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .persist()  # iterated over — never recompute the candidate-pair lineage
    )
    labels = edges.groupBy("u").agg(F.least(F.min("v"), F.min("u")).alias("label")).persist()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("u").alias("doc"), F.col("label").alias("cluster"))
