"""TimeTable — the engine's table abstraction.

Reference: a QuestDB table is a time-partitioned columnar store sorted by
its designated timestamp with optional dedup keys
(``cairo/TableWriter.java:164``, ``cairo/PartitionBy.java:46-55``,
``DEDUP UPSERT KEYS`` ``griffin/SqlParser.java:3081``), plus online DDL
(``griffin/engine/ops/AlterOperation.java``) and UPDATE
(``griffin/UpdateOperatorImpl.java``).

Spark mapping: a parquet directory partitioned by `part_date =
date_trunc(unit, ts)`, rows sorted by ts within files. That layout gives
Catalyst partition pruning + row-group min/max pruning on every time
predicate — the interval-scan machinery of the reference for free. Writes
go through append (WAL-style) or upsert-compaction; UPDATE/DELETE are
partition rewrites touching only affected partitions (the O3 merge
discipline).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.intervals import parse_interval_string
from .operators.latest import latest_on

PARTITION_COL = "part_date"
_UNITS = {"hour", "day", "month", "year"}  # PartitionBy.java: HOUR/DAY/MONTH/YEAR


class TimeTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        ts_col: str,
        partition_by: str = "day",
        dedup_keys: Sequence[str] | None = None,
        seq_col: str = "__seq",
    ):
        if partition_by not in _UNITS:
            raise ValueError(f"partition_by must be one of {_UNITS}")
        self.spark = spark
        self.path = path
        self.ts_col = ts_col
        self.partition_by = partition_by
        self.dedup_keys = list(dedup_keys) if dedup_keys else []
        self.seq_col = seq_col

    # -- write path --------------------------------------------------------
    def _with_partition(self, df: DataFrame) -> DataFrame:
        """Partition value for a row. HOUR granularity keeps the hour in the
        value as a 'yyyy-MM-dd-HH' string (PartitionBy.java HOUR) — casting
        to date would silently coarsen hourly partitions to daily, weakening
        pruning and drop_partition. Coarser units stay date-typed."""
        trunc = F.date_trunc(self.partition_by, F.col(self.ts_col))
        if self.partition_by == "hour":
            return df.withColumn(PARTITION_COL, F.date_format(trunc, "yyyy-MM-dd-HH"))
        return df.withColumn(PARTITION_COL, trunc.cast("date"))

    def _part_bound(self, dt):
        """Truncate a python datetime to this table's partition value
        (the literal compared against PARTITION_COL)."""
        from datetime import date

        if self.partition_by == "hour":
            return dt.strftime("%Y-%m-%d-%H")
        if self.partition_by == "day":
            return dt.date()
        if self.partition_by == "month":
            return date(dt.year, dt.month, 1)
        return date(dt.year, 1, 1)

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        """Create/replace the table: partition + sort discipline enforced."""
        (
            self._with_partition(df)
            .repartition(PARTITION_COL)
            .sortWithinPartitions(self.ts_col)
            .write.mode(mode)
            .partitionBy(PARTITION_COL)
            .parquet(self.path)
        )

    def append(self, df: DataFrame, seq: int = 0) -> None:
        """WAL-style append; `seq` orders writes for dedup resolution."""
        base = df
        if self.dedup_keys:
            base = base.withColumn(self.seq_col, F.lit(seq))
            base = latest_on(base, self.seq_col, [*self.dedup_keys, self.ts_col])
        (
            self._with_partition(base)
            .repartition(PARTITION_COL)
            .sortWithinPartitions(self.ts_col)
            .write.mode("append")
            .partitionBy(PARTITION_COL)
            .parquet(self.path)
        )

    # -- read path ---------------------------------------------------------
    def read(self, dedup: bool = True) -> DataFrame:
        df = self.spark.read.parquet(self.path)
        if self.dedup_keys and dedup and self.seq_col in df.columns:
            df = latest_on(df, self.seq_col, [*self.dedup_keys, self.ts_col]).drop(
                self.seq_col
            )
        return df

    def scan_interval(self, interval: str, dedup: bool = True) -> DataFrame:
        """QuestDB interval scan: `'2024-01'`-style strings become partition
        + row-group pruned range reads (IntervalFwdPartitionFrameCursor)."""
        from datetime import timedelta

        lo, hi = parse_interval_string(interval)
        ts = F.col(self.ts_col)
        # Spark can't derive part_date bounds from the ts predicate — add the
        # partition filter explicitly so whole partition dirs are skipped
        # (the ts PushedFilters then prune row groups within survivors).
        # Filter BEFORE dedup: ts is part of the dedup grain, so range-
        # filtering first is semantics-preserving and keeps the pushdown.
        # Bounds are truncated to the PARTITION unit: a partition's value is
        # its period START, so a mid-period `lo` must not exclude the
        # partition containing it; `hi` is exclusive, so bound by hi - 1µs.
        part = F.col(PARTITION_COL)
        lo_p = self._part_bound(lo)
        hi_p = self._part_bound(hi - timedelta(microseconds=1))
        df = self.spark.read.parquet(self.path).filter(
            (part >= F.lit(lo_p))
            & (part <= F.lit(hi_p))
            & (ts >= F.lit(lo.isoformat(sep=" ")).cast("timestamp"))
            & (ts < F.lit(hi.isoformat(sep=" ")).cast("timestamp"))
        )
        if self.dedup_keys and dedup and self.seq_col in df.columns:
            df = latest_on(df, self.seq_col, [*self.dedup_keys, self.ts_col]).drop(
                self.seq_col
            )
        return df

    # -- maintenance (UPDATE / DELETE / compaction) ------------------------
    def update_where(self, predicate: Column, assignments: dict[str, Column]) -> None:
        """UPDATE ... SET ... WHERE ...: rewrite ONLY partitions containing
        matching rows (UpdateOperatorImpl; partition-granular like O3)."""
        df = self.spark.read.parquet(self.path)
        touched = (
            df.filter(predicate).select(PARTITION_COL).distinct().collect()
        )
        parts = [r[PARTITION_COL] for r in touched]
        if not parts:
            return
        sub = df.filter(F.col(PARTITION_COL).isin(parts))
        for name, expr in assignments.items():
            sub = sub.withColumn(name, F.when(predicate, expr).otherwise(F.col(name)))
        self._rewrite_partitions(sub, parts)

    def delete_where(self, predicate: Column) -> None:
        df = self.spark.read.parquet(self.path)
        touched = df.filter(predicate).select(PARTITION_COL).distinct().collect()
        parts = [r[PARTITION_COL] for r in touched]
        if not parts:
            return
        sub = df.filter(F.col(PARTITION_COL).isin(parts)).filter(~predicate)
        self._rewrite_partitions(sub, parts)

    def drop_partition(self, interval: str) -> None:
        """ALTER TABLE DROP PARTITION equivalents: remove partition dirs in
        a time range (no data rewrite)."""
        from datetime import datetime

        lo, hi = parse_interval_string(interval)
        df = self.spark.read.parquet(self.path)

        def start_of(p) -> datetime:
            if isinstance(p, str):  # hour partitions: 'yyyy-MM-dd-HH'
                return datetime.strptime(p, "%Y-%m-%d-%H")
            return datetime(p.year, p.month, p.day)

        parts = [
            r[PARTITION_COL]
            for r in df.select(PARTITION_COL).distinct().collect()
            if lo <= start_of(r[PARTITION_COL]) < hi
        ]
        for p in parts:
            shutil.rmtree(os.path.join(self.path, f"{PARTITION_COL}={p}"), ignore_errors=True)

    def compact(self) -> None:
        """Materialize dedup (ApplyWal2TableJob merge)."""
        if not self.dedup_keys:
            return
        out = self.read(dedup=True).withColumn(self.seq_col, F.lit(-1))
        tmp = self.path.rstrip("/") + ".compact"
        (
            self._with_partition(out)
            .repartition(PARTITION_COL)
            .sortWithinPartitions(self.ts_col)
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(tmp)
        )
        shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def _rewrite_partitions(self, sub: DataFrame, parts: list) -> None:
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            sub.repartition(PARTITION_COL)
            .sortWithinPartitions(self.ts_col)
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(self.path)
        )
