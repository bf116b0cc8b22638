"""Route-equivalence pins for the r14 trainer restructure.

The kmeans/PQ trainers now compute their per-round model-update stats
with mapInArrow per-batch numpy partials over a cached (__id, __q) frame
instead of posexplode -> groupBy, and the perceptron's gradient is a
single-group aggregate of per-slot sums below DENSE_GRAD_MAX_DIM.  Each
replacement must be BIT-identical to the shape it replaced (integer sums
re-associate exactly); these tests pin that on real data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from questdb_spark.pipeline import classify
from questdb_spark.pipeline import similarity as S
from questdb_spark.sources.parquet import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def qframe(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = S.quant_frame(emb, "vec_id", "embedding").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    yield q
    q.unpersist()


def _km_stats_explode(q, cents):
    """The pre-r14 posexplode -> groupBy(cell, pos) update stats, built
    from the same cached frame (reference shape)."""
    # cell argmin in pure Catalyst integer arithmetic (ties -> lowest
    # cell, the _cell_dist_udf convention)
    dists = S._cell_dists(F.col("__q"), cents)
    least = F.least(*dists)
    cell = F.lit(None).cast("int")
    for i in reversed(range(len(cents))):
        cell = F.when(dists[i] == least, F.lit(i)).otherwise(cell)
    return {
        (r["cell"], r["pos"]): (r["s"], r["cnt"])
        for r in (
            q.select(cell.alias("cell"), F.posexplode("__q"))
            .groupBy("cell", "pos")
            .agg(F.sum("col").alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
    }


def test_km_update_stats_matches_explode_form(qframe, spark):
    cents = S.kmeans_train_frame(qframe, 8, 0)  # init only
    got = {
        (r["cell"], r["pos"]): (r["s"], r["cnt"])
        for r in S._km_update_stats(qframe, cents)
    }
    want = _km_stats_explode(qframe, cents)
    assert got == want and got  # non-empty


def test_kmeans_train_frame_matches_public_kmeans_train(qframe, spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    assert S.kmeans_train_frame(qframe, 8, 2) == S.kmeans_train(
        emb, k=8, iters=2
    )


def test_kmeans_report_rows_matches_kmeans_report(qframe, spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = S.kmeans_train_frame(qframe, 8, 2)
    got = sorted(S.kmeans_report_rows(qframe, cents))
    want = sorted(map(tuple, S.kmeans_report(emb, cents).collect()))
    assert got == want


def test_pq_train_frame_matches_explode_form(qframe, spark):
    """One PQ round via _pq_update_stats == the posexplode reference."""
    cbs = S.pq_train_frame(qframe, S.PQ_M, S.PQ_K, 0)  # sampled init
    d_sub = len(cbs[0][0])
    enc = S._pq_encode_udf(cbs)
    vecf = F.transform(F.col("__q"), lambda x: (x / S.QUANT).cast("float"))
    want = {
        (r["sub"], r["code"], r["subpos"]): (r["s"], r["cnt"])
        for r in (
            qframe.select(
                enc(vecf).alias("__c"), F.posexplode("__q")
            )
            .select(
                (F.col("pos") / d_sub).cast("int").alias("sub"),
                F.element_at(
                    F.col("__c"), (F.col("pos") / d_sub).cast("int") + 1
                ).alias("code"),
                (F.col("pos") % d_sub).alias("subpos"),
                F.col("col").alias("q"),
            )
            .groupBy("sub", "code", "subpos")
            .agg(F.sum("q").alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
    }
    got = {
        (r["sub"], r["code"], r["subpos"]): (r["s"], r["cnt"])
        for r in S._pq_update_stats(qframe, cbs)
    }
    assert got == want and got


def test_pq_usage_rows_matches_pq_encode(qframe, spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cbs = S.pq_train_frame(qframe, S.PQ_M, S.PQ_K, 2)
    assert cbs == S.pq_train(emb, iters=2)
    got = S.pq_usage_rows(qframe, cbs)
    want = {
        (r["sub"], r["code"]): r["used"]
        for r in (
            S.pq_encode(emb, cbs)
            .select(F.posexplode("codes").alias("sub", "code"))
            .groupBy("sub", "code")
            .agg(F.count(F.lit(1)).alias("used"))
            .collect()
        )
    }
    assert got == want and got


def test_perceptron_dense_grad_matches_explode_path(spark, monkeypatch):
    docs = load_table(spark, SF_DIR, "documents")
    lab = (
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))
        .cast("long")
    )
    feats = classify.hashed_features(docs, n_feats=classify.N_FEATS, label=lab)
    dense = classify.perceptron_train(
        feats, rounds=3, dim=classify.N_FEATS + 1
    )
    monkeypatch.setattr(classify, "DENSE_GRAD_MAX_DIM", 0)
    explode = classify.perceptron_train(
        feats, rounds=3, dim=classify.N_FEATS + 1
    )
    assert dense == explode
    assert dense[1][0] > 0  # round 1 misclassifies everything — sanity


def test_hashed_features_label_matches_join(spark):
    docs = load_table(spark, SF_DIR, "documents")
    lab = (
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))
        .cast("long")
    )
    with_label = classify.hashed_features(
        docs, n_feats=classify.N_FEATS, label=lab
    )
    joined = classify.hashed_features(docs, n_feats=classify.N_FEATS).join(
        docs.select("doc_id", lab.alias("y")), "doc_id"
    )
    got = sorted(
        (r["doc_id"], tuple(r["x"]), r["y"]) for r in with_label.collect()
    )
    want = sorted(
        (r["doc_id"], tuple(r["x"]), r["y"]) for r in joined.collect()
    )
    assert got == want and got
