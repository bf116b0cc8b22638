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
