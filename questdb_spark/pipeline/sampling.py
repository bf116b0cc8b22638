"""Corpus-construction operators for training-data pipelines: deterministic
stratified sampling, sequence packing (context-window binning), and
domain-mixture weighting.

These extend the engine for LLM-data work (no QuestDB analogue; built as
first-class operators alongside the dedup/similarity families). Design
rules for 100 TB:

- Sampling decisions are **hash-deterministic** (first 8 hex chars of an
  md5 mod a Mersenne prime — the same anchor the MinHash family uses), so
  a sample is reproducible across runs, engines, and re-partitions, and
  the keep/drop decision is a narrow per-row projection with NO shuffle
  and no RNG state.
- Sequence packing is the concat-then-chunk layout real pre-training
  pipelines use: documents are streamed in id order and a document belongs
  to the context window where its first token lands. The stream is
  sharded by a deterministic hash so the window pass parallelizes — one
  window + one aggregation, both partitioned on (stratum, shard).
- Mixture weighting is a tiny aggregate (one row per domain) — the heavy
  input side is one scan with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import MERSENNE_P
from .text import tokens_col


def hash_unit(id_col: Column) -> Column:
    """Deterministic uniform hash of an id into [0, P), P = 2^31-1: first
    8 hex chars of md5 → unsigned int → mod P. md5-anchored (like the
    MinHash slots) so Spark and any oracle engine agree bit-for-bit —
    no JVM hash seeding, no RNG."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return h.cast("long") % MERSENNE_P


def rate_threshold(rate: float) -> int:
    """Integer keep-threshold for a sampling rate: keep iff hash < this.
    Computed once in Python so the Spark plan and the oracle SQL embed
    the SAME integer literal — no float-comparison drift."""
    return int(rate * MERSENNE_P)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.1,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: row kept iff
    hash_unit(id) < floor(rate[stratum] · P). Adds `__u` (the hash draw)
    and `kept`. The decision is a pure per-row expression — at 100 TB
    this is a single scan with the filter pushed into the projection; the
    only shuffle in a sampling job is whatever the caller aggregates
    afterwards."""
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(stratum_col) == value, F.lit(rate_threshold(rate))).otherwise(thr)
    u = hash_unit(F.col(id_col))
    return df.withColumn("__u", u).withColumn("kept", F.col("__u") < thr)


def pack_sequences(
    df: DataFrame,
    *,
    budget: int = 256,
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """Greedy contiguous sequence packing ("concat-then-chunk"): within
    each (stratum, shard), documents are laid out in id order and a
    document is assigned to the context window where its FIRST token
    lands — bin = floor(exclusive-cumsum(tokens) / budget). Documents may
    straddle window boundaries, matching how pre-training pipelines chunk
    a concatenated token stream.

    Shards (deterministic: hash_unit(id) % n_shards) bound the
    per-partition stream so the cumulative-sum window parallelizes — at
    100 TB n_shards is sized to executor count and each shard is one
    independent sorted stream. Returns one row per packed window:
    (stratum, shard, bin_id, n_docs, n_tokens, first_doc)."""
    n_tok = F.size(tokens_col(F.col(text_col)))
    shard = hash_unit(F.col(id_col)) % n_shards
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        shard.alias("shard"),
        F.col(id_col).alias("doc"),
        n_tok.alias("n_tok"),
    )
    w = (
        Window.partitionBy("stratum", "shard")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    binned = base.withColumn("bin_id", F.floor(start / budget))
    return binned.groupBy("stratum", "shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc").alias("first_doc"),
    )


def _temp_power(x, alpha: float):
    """x^alpha for the quarter-grid alphas via IEEE-exact sqrt
    compositions (sqrt is correctly rounded and engine-identical; libm
    pow() is NOT, so arbitrary exponents would break oracle bit-equality):
    1 -> x, 0.5 -> sqrt(x), 0.25 -> sqrt(sqrt(x)),
    0.75 -> sqrt(x)*sqrt(sqrt(x)) — products of exact-rounded ops are
    deterministic across engines."""
    if alpha == 1.0:
        return x
    if alpha == 0.5:
        return F.sqrt(x)
    if alpha == 0.25:
        return F.sqrt(F.sqrt(x))
    if alpha == 0.75:
        return F.sqrt(x) * F.sqrt(F.sqrt(x))
    raise NotImplementedError(
        "alpha must be one of 1, 0.75, 0.5, 0.25 (sqrt-composable — libm "
        "pow() is not bit-deterministic across engines)"
    )


def mixture_weights(
    df: DataFrame,
    *,
    alpha: float = 0.5,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture weighting (temperature-scaled sampling): per domain
    s, weight w_s ∝ tokens_s^alpha, normalized. alpha < 1 upsamples small
    domains (alpha = 0.5 → sqrt temperature, the common multilingual
    choice). `boost` is w_s divided by the domain's natural token share —
    the up/down-sampling factor a loader applies.

    The per-domain aggregate is one scan + map-side combine; the
    normalization runs over one row per domain (tiny), so the empty-frame
    window below is NOT a scale hazard."""
    per = df.groupBy(F.col(group_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col(F.col(text_col)))).alias("n_tokens"),
    )
    pw = _temp_power(F.col("n_tokens").cast("double"), alpha)
    wall = Window.partitionBy()
    d6 = lambda c: c.cast("decimal(18,6)").cast("double")  # noqa: E731
    return (
        per.withColumn("__pw", pw)
        .withColumn("__share", F.col("n_tokens") / F.sum("n_tokens").over(wall))
        .withColumn("weight", F.col("__pw") / F.sum("__pw").over(wall))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            d6(F.col("weight")).alias("weight"),
            d6(F.col("weight") / F.col("__share")).alias("boost"),
        )
    )
