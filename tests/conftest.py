from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from questdb_spark.session import get_session  # noqa: E402
from questdb_spark.sources.parquet import TPCH_TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("questdb-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for comparison (mirrors an order-insensitive
    value-hash: exact for ints/strings/timestamps, tolerant-ish for floats
    only through repr equality)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def assert_df_matches_oracle(spark_df, ddb, sql, check_exact_floats=True):
    """Compare a Spark DataFrame against DuckDB output: same columns (sorted
    by name), same multiset of rows. Floats must match bit-for-bit — our
    queries are built so they do."""
    sdf = spark_df.toPandas()
    odf = ddb.execute(sql).fetchdf()
    scols = sorted(sdf.columns)
    ocols = sorted(odf.columns)
    assert scols == ocols, f"column mismatch: spark={scols} oracle={ocols}"
    srows = sorted(tuple(_norm(v) for v in row) for row in sdf[scols].itertuples(index=False))
    orows = sorted(tuple(_norm(v) for v in row) for row in odf[ocols].itertuples(index=False))
    assert len(srows) == len(orows), f"row count: spark={len(srows)} oracle={len(orows)}"
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[0]}"
