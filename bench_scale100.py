#!/usr/bin/env python
"""100x scale-curve check (VERDICT r9 task 6, extended r11): one decade
past the 10x harness for the flagship operators.

The 10x run (bench_scale.py / BENCH_SF1_r09.json) verified the bucketing
arguments at 10x; this derives a 100x replica set of the tables the
flagship ops read (documents, embeddings, events — key-shifted replicas,
fixed time range, same construction as the 10x harness) and runs:

- minhash_lsh            (banded candidate generation)
- embedding_near_dup     (banded self-join + cap window)
- embedding_knn_join IVF (coarse-cell pruned batch retrieval)
- dedup_clusters         (distributed CC forced: driver_cc_bound=0)
- r11 (VERDICT r10 tasks 2+6): the time-series join family — ASOF
  (keyed one-shuffle union-tag window), WINDOW JOIN dynamic bounds
  (bucketed equi-join), SAMPLE BY FILL(linear) — and the
  production-default corpus-relative Jaccard guard rows
  (dedup_jaccard_prod_guard / _prod_staged, MAX_SHINGLE_DF_FRAC=1e-4).
- r12 (VERDICT r11 task 6): the remaining flagship time-series
  operators — HORIZON/markout (explode horizons + keyed ASOF), SPLICE
  (full-outer union window), LATEST ON (max_by per key).

Timing is `.count()` (which also yields the output cardinality for the
output-growth annotations — exact-pair outputs grow ~quadratically in
replication by construction, so time ratios are only meaningful against
output ratios). Emits ONE JSON line and writes BENCH_SF2_r12.json
(SPARK_GRAFT_SF2_OUT to override; rows measured in earlier rounds stay
in BENCH_SF2_r11.json / BENCH_SF2_r10.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from questdb_spark.pipeline import dedup, similarity  # noqa: E402
from questdb_spark.registry import REGISTRY  # noqa: E402
from questdb_spark.session import get_session  # noqa: E402
from questdb_spark.sources.parquet import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF2_DIR", "/tmp/qdb_sf2")
REPLICAS = 100
OFFSET = 10**9

KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # events replicate by shifting BOTH ids: disjoint user populations per
    # replica — the realistic 100x (more users over the same time range),
    # so keyed time-series joins scale in key cardinality, not per-key
    # density.  ts stays the nanos long; load_table converts as usual.
    "events": ["event_id", "user_id"],
}


def build(spark) -> None:
    # per-table doneness (r11 added events to an already-built replica set)
    os.makedirs(DST, exist_ok=True)
    for t, keys in KEYS.items():
        if os.path.exists(os.path.join(DST, f"{t}.parquet", "_SUCCESS")):
            continue
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
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def _knn_join_ivf(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    cents = similarity.ivf_centroids(emb, n_cells=16)
    return similarity.knn_join_ivf(emb, queries, cents, k=5, n_probe=2)


def _jaccard_staged(spark, sf):
    # THE production pipeline ordering at heavy duplication: exact dedup
    # FIRST (md5 groupBy collapses the 100 replicas of every text to one
    # canonical doc), then near-dup Jaccard over canonicals only.  The
    # first 100x attempt ran the exact shingle-join route directly with
    # the production cap (100k occ) and OOMed the 8g heap: per-shingle
    # pair enumeration is O(occ^2), and 100x duplication pushes hot
    # shingles to occ ~ 50k -> billions of structs even chunked.  Staging
    # removes the duplication before the quadratic step — the same reason
    # real corpus pipelines (C4-style) run exact -> fuzzy in that order.
    docs = load_table(spark, sf, "documents")
    canon = docs.dropDuplicates(["text"])
    return dedup.ngram_jaccard_pairs(canon, "doc_id", threshold=0.12)


def _ann_pq(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    cbs = similarity.pq_codebooks(emb)
    qv = [
        int(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select(similarity.quantize(F.col("embedding")).alias("q"))
        .first()["q"]
    ]
    return similarity.pq_adc_topk(similarity.pq_encode(emb, cbs), qv, cbs, k=10)


def _jaccard_prod_guard(spark, sf):
    # THE production-default guard, measured (VERDICT r10 task 2 — the
    # BENCH_SF2_r10 note pointed at a run that did not exist): corpus-
    # relative cap resolve_shingle_guard(n_docs, MAX_SHINGLE_DF_FRAC=1e-4),
    # UNstaged.  At sf0.1 (5000 docs) the cap is 2 — aggressive, but the
    # near-dup replica pairs ride shingles with occ<=2 and survive.  At
    # 100x (500k docs) the cap is 50 while EVERY shingle occurs >=100
    # times (the corpus is 100% wholesale duplication), so all shingles
    # drop and the output is 0 — which is the CORRECT reading: a relative
    # guard recognizes wholesale duplication and refuses to quadratic-join
    # it; the production pipeline removes that duplication with exact
    # dedup first (see _prod_staged).  The absolute production cap (100k
    # occurrences) never fires here and re-runs the unguarded quadratic —
    # that configuration OOMed the 8g heap in r10 and is exactly what the
    # corpus-relative default replaces.
    docs = load_table(spark, sf, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.12,
        max_shingle_df_frac=dedup.MAX_SHINGLE_DF_FRAC,
    )


def _jaccard_prod_staged(spark, sf):
    # production pipeline ordering + production-default relative guard:
    # exact dedup collapses the replicas, then the relative cap resolves
    # against the CANONICAL corpus — the measured non-zero production
    # run.  Since r11 this is the oracle-checked registry query
    # (min-doc_id canonicalization, deterministic across runs).
    return REGISTRY["dedup_jaccard_prod_staged"][0](spark, sf)


def _clusters_distributed(spark, sf):
    # same staging as _jaccard_staged (the un-staged pair generation OOMs
    # at this duplication level); driver_cc_bound=0 forces the distributed
    # log-rounds loop regardless of edge count
    docs = load_table(spark, sf, "documents").dropDuplicates(["text"])
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.12)
    return dedup.dedup_clusters(pairs, driver_cc_bound=0)


CASES = {
    "minhash_lsh": REGISTRY["minhash_lsh"][0],
    # dedup_jaccard_guarded (the registry DEMO cap) is deliberately absent
    # since r11: its corpus-relative demo fraction (0.005) resolves to a
    # cap of 2500 at 100x, above every shingle's occurrence count, so the
    # case degenerates to the unguarded quadratic (OOM).  The guard story
    # at 100x is the two production rows below (prod_guard / prod_staged).
    "dedup_jaccard_staged": _jaccard_staged,
    "embedding_near_dup": REGISTRY["embedding_near_dup"][0],
    "embedding_knn_join_ivf": _knn_join_ivf,
    "embedding_ann_pq": _ann_pq,
    "dedup_clusters_distributed": _clusters_distributed,
    "embedding_kmeans": REGISTRY["embedding_kmeans"][0],
    "incremental_dedup": REGISTRY["incremental_dedup"][0],
    # r11: production-default corpus-relative guard (VERDICT r10 task 2)
    "dedup_jaccard_prod_guard": _jaccard_prod_guard,
    "dedup_jaccard_prod_staged": _jaccard_prod_staged,
    # r11: time-series join family (VERDICT r10 task 6)
    "asof_join_events": REGISTRY["asof_join_events"][0],
    "sql_window_join_dynamic": REGISTRY["sql_window_join_dynamic"][0],
    "sample_by_fill_linear": REGISTRY["sample_by_fill_linear"][0],
    # r12: the remaining flagship time-series ops (VERDICT r11 task 6)
    "horizon_join_events": REGISTRY["horizon_join_events"][0],
    "splice_join_events": REGISTRY["splice_join_events"][0],
    "latest_on_user": REGISTRY["latest_on_user"][0],
    # r12 new pipeline ops
    "retrieval_hybrid_rrf": REGISTRY["retrieval_hybrid_rrf"][0],
    "cluster_balanced_sample": REGISTRY["cluster_balanced_sample"][0],
    "dsir_importance_weights": REGISTRY["dsir_importance_weights"][0],
    # r13: promoted from bench-local twins to oracle-checked registry
    # entries (VERDICT r12 task 2) — the bench now measures the exact
    # library composition the registry exports
    "dedup_keep_best_staged": REGISTRY["dedup_keep_best_staged"][0],
    "dedup_containment_staged": REGISTRY["dedup_containment_staged"][0],
    "corpus_split_leakage": REGISTRY["corpus_split_leakage"][0],
    "embedding_ann_pq_rerank": REGISTRY["embedding_ann_pq_rerank"][0],
    # r13: substring-level verbatim-span dedup (VERDICT r12 task 3)
    "dedup_verbatim_spans": REGISTRY["dedup_verbatim_spans"][0],
    # r13 session 2: trained-classifier family + retrieval serving
    "classifier_nb_train": REGISTRY["classifier_nb_train"][0],
    "classifier_perceptron_train": REGISTRY["classifier_perceptron_train"][0],
    "retrieval_bm25_topk": REGISTRY["retrieval_bm25_topk"][0],
    "retrieval_prf_expand": REGISTRY["retrieval_prf_expand"][0],
    "retrieval_mmr_rerank": REGISTRY["retrieval_mmr_rerank"][0],
    "corpus_perplexity_topk": REGISTRY["corpus_perplexity_topk"][0],
}

NOTES = {
    "minhash_lsh": "banding caps candidate cardinality; output = LSH "
    "candidate pairs, grows with duplicate-group sizes squared within bands",
    "dedup_jaccard_staged": "exact dedup (one md5 groupBy) collapses "
    "replicas BEFORE the quadratic near-dup step — the staged production "
    "pipeline; running the exact shingle-join route directly at this "
    "duplication level OOMs (O(occ^2) per-shingle pair enumeration), which "
    "is the decade's key finding: near-dup never runs on an un-exact-deduped "
    "corpus",
    "embedding_near_dup": "banded self-join; output pair count grows "
    "quadratically in replication (every replica of a near-dup pair pairs "
    "with every other replica)",
    "embedding_knn_join_ivf": "|Q|=4 fixed, k=5 fixed -> output constant; "
    "probes read n_probe/n_cells of the corpus",
    "embedding_ann_pq": "map-only encode + asymmetric-distance scan over "
    "8-byte codes (32x smaller than raw vectors); output constant top-10",
    "incremental_dedup": "ingest gate on a 100x-duplicated store: the new "
    "batch classifies via hash + band SEMI-joins (existence, not pairs), so "
    "candidate blow-up never materializes — output grows with the batch, "
    "not with corpus duplication",
    "embedding_kmeans": "Lloyd's training: iterations and model size are "
    "scale-invariant, each round = one Arrow argmin map pass + one k*dim "
    "aggregate — runtime follows the scan, output constant (k*dim rows)",
    "dedup_clusters_distributed": "driver_cc_bound=0 forces the log-rounds "
    "min-label + path-halving loop over the exact-Jaccard edge set of the "
    "exact-deduped (staged) corpus; also regression-covers the Spark 4.1 "
    "localCheckpoint-over-cached-plan NPE fixed this round (edges now "
    "materialize through the stats-stripping checkpoint, not persist())",
    "dedup_jaccard_prod_guard": "production default measured (the row the "
    "BENCH_SF2_r10 note promised): corpus-relative cap = "
    "max(2, ceil(1e-4 * n_docs)).  100x output 0 is the CORRECT verdict on "
    "a corpus that is 100% wholesale duplication — every shingle occurs "
    ">= 100x vs a cap of 50, so the guard refuses to quadratic-join "
    "boilerplate and completes (the absolute 100k-occurrence cap never "
    "fires and OOMs instead); the production pipeline removes wholesale "
    "duplication with exact dedup FIRST — see dedup_jaccard_prod_staged "
    "for the non-zero production answer on the same data",
    "dedup_jaccard_prod_staged": "exact dedup -> corpus-relative "
    "production guard on the canonical corpus: the measured non-zero "
    "production-default run; output is the canonical near-dup pair set, "
    "invariant to replication by construction",
    "asof_join_events": "keyed ASOF = ONE shuffle (union-tag window over "
    "user_id); 100x = 100x users over the same time range, so per-key "
    "state is constant and output grows with the master side",
    "sql_window_join_dynamic": "dynamic per-row bounds lowered onto a "
    "bucketed equi-join keyed by (user_id, bucket); bucket width = max "
    "window width, so candidate fan-out per master row is bounded and "
    "output grows linearly with replication",
    "sample_by_fill_linear": "one hash-agg shuffle + spine/key grid fill; "
    "grid rows = days x users grow linearly with the 100x user population",
    "horizon_join_events": "markout = explode(horizons) over the master "
    "side + ONE keyed ASOF union-tag window; 100x = 100x users at constant "
    "per-key density, output = masters x horizons grows linearly",
    "splice_join_events": "full-outer time merge = union + one window "
    "pass per key (the ASOF plan shape, both sides emitting); output = "
    "all rows of both sides, linear in replication",
    "latest_on_user": "LATEST ON = one hash agg (max_by struct per key); "
    "output = one row per user, 100x users -> 100x rows, shuffle moves "
    "one struct per key",
    "retrieval_hybrid_rrf": "both candidate cuts are "
    "TakeOrderedAndProject (top-50 each side), fusion joins two 50-row "
    "sets — output constant top-15, runtime follows the two scans",
    "cluster_balanced_sample": "k-means training dominates (one argmin "
    "map pass + one k*dim aggregate per round, see embedding_kmeans); "
    "assignment map-only; the per-cell cap window sorts only within "
    "cells; output constant (cap x cells)",
    "dsir_importance_weights": "two <=1024-row bucket distributions "
    "broadcast over one token explode + one per-doc aggregate; output "
    "grows with the raw-doc count (linear)",
    "dedup_keep_best_staged": "exact dedup first (the production "
    "ordering — unstaged Jaccard on a 100%-duplicated corpus is the "
    "documented OOM case), then keep-longest per canonical cluster; "
    "output invariant to replication",
    "dedup_containment_staged": "containment = common/min(sz) over the "
    "staged canonical corpus — same guarded candidate lineage as the "
    "Jaccard family, output invariant to replication",
    "corpus_split_leakage": "canonicalization (groupBy text, min id) "
    "makes the audit replication-invariant by construction; the split "
    "is a map-side md5 expression, classification two joins against "
    "the (doc, split) projection",
    "embedding_ann_pq_rerank": "stage 1 scans 8-byte codes only; stage "
    "2's exact kernel touches the 50-row shortlist regardless of corpus "
    "size — output constant top-10",
    "dedup_verbatim_spans": "staged: exact dedup first, then positional "
    "12-token fingerprints over the CANONICAL corpus — replication-"
    "invariant by construction (bucketed fingerprint equi-join under the "
    "corpus-relative occurrence cap, never all-pairs; island windows "
    "partition by (pair, diagonal))",
    "classifier_nb_train": "one-pass conditional-count aggregate + 1-row "
    "totals broadcast; model output constant (n_feats+1 rows) — runtime "
    "follows the scan",
    "classifier_perceptron_train": "3 epochs x (map margin over the "
    "persisted feature frame + feature-keyed gradient aggregate); model "
    "rows constant per epoch, output = the 99-row trace at any scale",
    "retrieval_bm25_topk": "1-row corpus-stats aggregate broadcast back + "
    "map scoring + TakeOrderedAndProject; output constant top-20",
    "retrieval_prf_expand": "two corpus scans (BM25 feedback round + "
    "integer re-score) + a 10-doc term explode + 9-term broadcast join; "
    "output constant top-15",
    "retrieval_mmr_rerank": "shortlist TakeOrderedAndProject is the only "
    "corpus-scan stage; pairwise k^2 cosines and the greedy loop are "
    "corpus-size-independent; output constant 5 picks",
    "corpus_perplexity_topk": "two model aggregates + one scoring "
    "join/aggregate; vocab (and so the model) is replication-invariant, "
    "output constant top-20",
}


_ALL_CASES = set(CASES)
_only = os.environ.get("SPARK_GRAFT_SF2_ONLY")
if _only:
    _want = {w.strip() for w in _only.split(",") if w.strip()}
    CASES = {k: v for k, v in CASES.items() if k in _want}


def run(spark, fn, sf_dir: str, reps: int = 2) -> tuple[float, int]:
    best, rows = None, 0
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), rows


def main() -> None:
    spark = get_session("questdb-spark-scale100")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    out = {}
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.environ.get("SPARK_GRAFT_SF2_OUT", "BENCH_SF2_r12.json"),
    )
    if _only and os.path.exists(path):  # subset rerun: merge over previous
        with open(path) as f:
            prev = json.load(f).get("queries", {})
        # drop rows for names no longer in CASES (same ADVICE-r12 fix as
        # bench_scale.py: stale rows must not be re-stamped with fresh
        # host metadata). _ALL_CASES is the pre-filter case list.
        out = {k: v for k, v in prev.items() if k in _ALL_CASES}
    for name, fn in CASES.items():
        try:
            t_small, rows_small = run(spark, fn, SRC)
            t_big, rows_big = run(spark, fn, DST, reps=1)
            out[name] = {
                "t_sf01": t_small,
                "t_100x": t_big,
                "time_ratio": round(t_big / max(t_small, 1e-9), 2),
                "rows_sf01": rows_small,
                "rows_100x": rows_big,
                "output_growth": round(rows_big / max(rows_small, 1), 2),
                "note": NOTES[name],
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"}
        print(name, out[name], file=sys.stderr)
    doc = {
        "scale_factor_ratio": REPLICAS,
        "loadavg_start": list(os.getloadavg()),
        "cpu_probe": __import__("bench")._cpu_probe(),
        "note": "derived 100x of sf0.1 (key-shifted replicas of "
        "documents/embeddings/events, same construction as the 10x "
        "harness)",
        "queries": out,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
