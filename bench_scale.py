#!/usr/bin/env python
"""Scale-curve check (VERDICT r5 task 10): run the heaviest registry
queries at sf0.1 and at a derived 10x scale-up, and flag superlinear
growth.

No sf1.0 testdata exists (and /root/testdata is read-only), so the 10x
dataset is DERIVED from sf0.1: each table is unioned R=10 times with a
per-replica offset added to every entity key (FK consistency preserved —
the same offset shifts both sides of every join key), while region/nation
stay single-copy (their keys are unshifted FK targets).  Timestamps are
NOT shifted: the time range stays fixed and densifies, which is the right
stress for SAMPLE BY / window / ASOF paths (more rows per bucket, not
more buckets).

Emits ONE JSON line {query: {t_sf01, t_sf1, ratio}, ...} and writes
BENCH_SF1_r06.json.  Ideal linear scaling is ratio ~10 for scan-bound
queries; <10 indicates fixed overhead amortizing (fine); >>10 flags a
superlinear plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from questdb_spark.registry import REGISTRY  # noqa: E402
from questdb_spark.session import get_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/qdb_sf1")
REPLICAS = 10
OFFSET = 10**9

# key columns shifted per replica (FK pairs share the same offset)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE = ["region", "nation"]

# the heaviest registry queries by BENCH_r05 (lifecycle DDL queries are
# fixed-cost and excluded; this is the scan/join/window scale surface)
HEAVY = [
    "dedup_cluster_canonical",
    "window_groups_exclude",
    "dedup_jaccard",
    "dedup_jaccard_guarded",
    "minhash_lsh",
    "minhash_signatures",
    "embedding_near_dup",
    "contamination_check",
    "training_corpus_filter",
    "q1_pricing_summary",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "sql_window_join_dynamic",
    "sql_asof_join",
    "sample_by_1h",
    "latest_on_user",
    "twap_vwap_events",
    "decimal256_div",
    # r6 corpus-construction additions
    "stratified_sample",
    "sequence_packing",
    "mixture_weights",
    "embedding_int8_topk",
    "pii_scrub",
    "text_repetition",
    "embedding_dedup_canonical",
    # r8 function-surface additions (sql_fn_surface_aggs exercises the
    # collect-fold twap; arrays = HOF-heavy per-row path)
    "sql_fn_surface_aggs",
    "sql_fn_surface_arrays",
    "sql_fn_surface_scalars",
    "array_ops2",
    # r8 grammar additions (windows + reversed top-k + inferred group agg)
    "sql_window_range_units",
    "sql_window_exclude",
    "sql_with_cte_bare",
    "sql_implicit_group_by",
    "sql_limit_neg_range",
    "sql_grammar_r8",
    "sql_interval_eq",
    # r9 additions: rank-3 arrays + batch k-NN join
    "array_ops3",
    "embedding_knn_join",
    # r10 additions: trained quantizer + windowed moment stats
    "embedding_kmeans",
    "embedding_ann_ivf_trained",
    "window_stat_aggs",
    # r10 session 2: trained PQ, ingest gate, BPE trainer
    "embedding_pq_train",
    "embedding_ann_pq_trained",
    "incremental_dedup",
    "bpe_train_merges",
    "bpe_merge_candidates",
    "mixture_temperature_sweep",
    # r11: corpus-relative guard + staged production near-dup
    "dedup_jaccard_prod_staged",
    # r12 additions: retrieval fusion, diversity/selection cuts, audits,
    # two-stage ANN, OHLC candles
    "retrieval_hybrid_rrf",
    "cluster_balanced_sample",
    "dedup_keep_best",
    "dsir_importance_weights",
    "dedup_containment",
    "corpus_split_leakage",
    "embedding_ann_pq_rerank",
    "ohlc_1h",
    # r13 additions: staged promotions + verbatim-span dedup
    "dedup_containment_staged",
    "dedup_keep_best_staged",
    "dedup_verbatim_spans",
    # r13 session 2: trained-classifier family + BM25 ranking + serving
    "classifier_perceptron_train",
    "classifier_nb_train",
    "classifier_nb_confusion",
    "retrieval_bm25_topk",
    "retrieval_prf_expand",
    "retrieval_mmr_rerank",
    # r13 session 2: the dedup x multimodal bridge (distinct-image hash
    # cost is constant under replication; duplicate groups grow)
    "multimodal_dhash_neardup",
    "multimodal_dhash_hamming",
    # r13 session 2: bigram-LM perplexity filter + per-source data card
    "corpus_perplexity_topk",
    "corpus_quality_report",
]

# optional subset filter: SPARK_GRAFT_SCALE_ONLY="a,b,c"
_ALL_HEAVY = set(HEAVY)  # pre-filter list — the merge keeps these rows
_only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
if _only:
    _want = {w.strip() for w in _only.split(",") if w.strip()}
    HEAVY = [h for h in HEAVY if h in _want]


def build(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    os.makedirs(DST, exist_ok=True)
    for t in SINGLE:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    for t, keys in KEYS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for r in range(REPLICAS):
            d = src
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(r * OFFSET))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    open(os.path.join(DST, "_DONE"), "w").write("ok")


def run(spark, name: str, sf_dir: str, reps: int = 2) -> tuple[float, int]:
    fn, _ = REGISTRY[name]
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    # output-rows normalization (VERDICT r13 task 6, r14): a >10x time
    # ratio is only superlinear relative to what the query PRODUCES —
    # key-shifted replication grows duplicate groups, so pair-emitting
    # dedup output grows quadratically in the replica count by
    # construction.  The count action is separate and untimed.
    rows = fn(spark, sf_dir).count()
    return round(best, 2), rows


# Output-growth adjudications for the pair-emitting dedup family (the
# rows whose raw time ratios exceed the 10x input growth).
NOTES = {
    "dedup_jaccard_guarded": (
        "output = jaccard pairs over corpus-relative-guarded shingles; "
        "10 replicas make every duplicate group 10x larger, so the pair "
        "count grows ~replicas^2 within the guard, and the guard itself "
        "(ceil(1e-4*count)) admits 10x-hotter shingles"
    ),
    "dedup_containment": (
        "containment metric over the same guarded pair enumeration as "
        "dedup_jaccard_guarded — identical quadratic output growth in "
        "the replica count"
    ),
    "dedup_jaccard": (
        "static-guard jaccard pairs; duplicate-group growth drives "
        "pair output quadratically in replicas"
    ),
    "minhash_lsh": (
        "LSH banding candidates; every replica pair of a banded group "
        "collides, output grows with group size squared"
    ),
    "dedup_verbatim_spans": (
        "runs on the exact-deduped canonical corpus, which collapses "
        "the replicas back to ~sf0.1 scale — ratio ~=1 is the staged-"
        "pipeline design working, not a measurement artifact"
    ),
}


def main() -> None:
    spark = get_session("questdb-spark-scale")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    out = {}
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.environ.get("SPARK_GRAFT_SF1_OUT", "BENCH_SF1_r09.json"),
    )
    if _only and os.path.exists(path):  # subset rerun: merge over previous
        with open(path) as f:
            prev = json.load(f).get("queries", {})
        # keep only names still in the FULL case list (not the subset —
        # a subset rerun must preserve the other cases' rows): a stale
        # row for a REMOVED query would otherwise be silently re-stamped
        # with the new host loadavg/cpu_probe metadata (ADVICE r12)
        out = {k: v for k, v in prev.items() if k in _ALL_HEAVY}
    for name in HEAVY:
        try:
            t_small, rows_small = run(spark, name, SRC)
            t_big, rows_big = run(spark, name, DST)
            out[name] = {
                "t_sf01": t_small,
                "t_sf1": t_big,
                "ratio": round(t_big / max(t_small, 1e-9), 2),
                "rows_sf01": rows_small,
                "rows_sf1": rows_big,
                "output_growth": round(rows_big / max(rows_small, 1), 2),
            }
            if name in NOTES:
                out[name]["note"] = NOTES[name]
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"}
        print(name, out[name], file=sys.stderr)
    doc = {
        "scale_factor_ratio": REPLICAS,
        "note": "derived 10x of sf0.1 (key-shifted replicas, fixed time range)",
        "loadavg": list(os.getloadavg()),
        "cpu_probe": __import__("bench")._cpu_probe(),
        "queries": out,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
