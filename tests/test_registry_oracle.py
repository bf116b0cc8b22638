"""Golden tests: every registry query with an oracle must match DuckDB
exactly at the test scale factor (mirrors the driver's t2 gate)."""

from __future__ import annotations

import pytest

from questdb_spark.registry import REGISTRY

from .conftest import SF_DIR, assert_df_matches_oracle

CASES = [(name, fn, sql) for name, (fn, sql) in REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_query_matches_oracle(spark, ddb, name, fn, sql):
    df = fn(spark, SF_DIR)
    assert_df_matches_oracle(df, ddb, sql)


@pytest.mark.parametrize("name,fn,sql", [(n, f, s) for n, (f, s) in REGISTRY.items() if s is None],
                         ids=[n for n, (f, s) in REGISTRY.items() if s is None])
def test_query_without_oracle_runs(spark, name, fn, sql):
    df = fn(spark, SF_DIR)
    assert df.count() >= 0


def test_dedup_clusters_components(spark):
    """Hand-built graph: two components + an isolated pair; labels must be
    the component minimum."""
    from questdb_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (9, 12), (3, 7), (20, 21)], ["doc_a", "doc_b"]
    )
    got = {r["doc"]: r["cluster"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 5: 1, 9: 1, 12: 1, 3: 3, 7: 3, 20: 20, 21: 20}


def test_dedup_clusters_over_bound_falls_back_distributed(spark):
    """An edge set over driver_cc_bound must discard the partial collect and
    take the distributed path — same labels either way (r10: the bound check
    is folded into the collect as limit(bound+1))."""
    from questdb_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (9, 12), (3, 7), (20, 21)], ["doc_a", "doc_b"]
    )
    want = {1: 1, 5: 1, 9: 1, 12: 1, 3: 3, 7: 3, 20: 20, 21: 20}
    for bound in (0, 1):  # 0 skips the collect entirely; 1 collects then discards
        got = {
            r["doc"]: r["cluster"]
            for r in dedup_clusters(pairs, driver_cc_bound=bound).collect()
        }
        assert got == want, (bound, got)
