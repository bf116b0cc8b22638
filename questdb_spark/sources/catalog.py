"""Catalogue + COPY surface.

Reference: table functions ``tables()``, ``table_columns()``,
``table_partitions()`` (``griffin/engine/functions/table/``), pg_catalog
emulation (``functions/catalogue/``), COPY import/export
(``SqlCompilerImpl.java:4172``, ``cutlass/text/ParallelCsvFileImporter``).

Spark mapping: thin DataFrame views over ``spark.catalog`` and the
TimeTable directory layout; COPY = ``spark.read.csv(inferSchema)`` /
``df.write``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tables(spark: SparkSession) -> DataFrame:
    """tables() table function: registered tables/views."""
    rows = [
        (t.name, t.tableType, t.isTemporary)
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(rows, "table_name string, kind string, is_temporary boolean")


TABLE_COLUMNS_SCHEMA = "column_name string, data_type string, nullable boolean"
TABLE_PARTITIONS_SCHEMA = "partition string, n_files int, bytes long"


def table_columns_rows(spark: SparkSession, table: str) -> list[tuple]:
    """table_columns('t') rows: name/type/nullable per column (driver-side
    catalog metadata — the SQL engine renders these as inline VALUES)."""
    return [
        (c.name, c.dataType, c.nullable)
        for c in spark.catalog.listColumns(table)
    ]


def table_columns(spark: SparkSession, table: str) -> DataFrame:
    """table_columns('t'): name/type/nullable per column."""
    return spark.createDataFrame(
        table_columns_rows(spark, table), TABLE_COLUMNS_SCHEMA
    )


def table_partitions_rows(path: str) -> list[tuple]:
    """table_partitions('t') rows: one row per time partition of a
    TimeTable directory with file counts and sizes."""
    parts = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if not (os.path.isdir(full) and "=" in entry):
            continue
        files = [f for f in os.listdir(full) if f.endswith(".parquet")]
        size = sum(os.path.getsize(os.path.join(full, f)) for f in files)
        parts.append((entry.split("=", 1)[1], len(files), size))
    return parts


def table_partitions(spark: SparkSession, path: str) -> DataFrame:
    """table_partitions('t'): one row per time partition of a TimeTable
    directory with file counts and sizes (QuestDB shows partition dirs)."""
    return spark.createDataFrame(
        table_partitions_rows(path), TABLE_PARTITIONS_SCHEMA
    )


def copy_from_csv(
    spark: SparkSession, path: str, header: bool = True, infer: bool = True
) -> DataFrame:
    """COPY t FROM 'file.csv' — parallel CSV import with type inference
    (ParallelCsvFileImporter equivalent; Spark's reader is already
    distributed and schema-inferring)."""
    return spark.read.csv(path, header=header, inferSchema=infer)


def copy_to(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """COPY t TO 'file' [FORMAT PARQUET|CSV]."""
    w = df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        w.option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported COPY format: {fmt}")
