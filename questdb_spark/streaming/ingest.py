"""Streaming ingestion: the WAL-apply path re-expressed as Structured
Streaming.

Reference mapping (SURVEY §2.9):
- WAL + O3 merge (``cairo/wal/ApplyWal2TableJob.java:87``,
  ``cairo/O3PartitionJob.java:72``, ``c/share/ooo.cpp``) → micro-batches +
  time-partitioned parquet, out-of-order rows land in their partition and a
  partition-local sort happens at compaction/read;
- commit lag / o3MaxLag → ``withWatermark`` delay;
- DEDUP UPSERT KEYS (``griffin/SqlParser.java:3081``, ``c/share/dedup.cpp``)
  → last-write-wins resolution on (ts, keys): within a batch via row_number,
  across batches via the read-side `latest` view + partition-rewrite
  compaction (this container has no Delta/ACID table format, so upsert =
  append + dedup-on-read + compaction, which is also the honest 100 TB
  pattern: blind upserts into a sorted store are exactly what QuestDB's
  WAL apply job does asynchronously).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.latest import latest_on


def write_stream_ingest(
    stream: DataFrame,
    path: str,
    ts_col: str,
    dedup_keys: Sequence[str],
    checkpoint: str,
    watermark: str = "10 seconds",
    partition_unit: str = "day",
    seq_col: str = "__seq",
    trigger_available_now: bool = False,
):
    """Start the ingest stream: watermark (o3MaxLag), in-batch dedup
    (last-write-wins by ``seq_col`` — the WAL sequencer order), append to
    time-partitioned parquet."""
    deduped_writer = _batch_upsert(path, ts_col, list(dedup_keys), partition_unit, seq_col)
    w = (
        stream.withWatermark(ts_col, watermark)
        .writeStream.foreachBatch(deduped_writer)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def _batch_upsert(path: str, ts_col: str, keys: list[str], unit: str, seq_col: str):
    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        # monotonic WAL sequence: (batch, row-within-batch). The sub-order is
        # monotonically_increasing_id — per input partition it follows source
        # row order (the WAL-segment order a streaming source delivers), so
        # duplicates WITHIN one micro-batch resolve last-write-wins instead
        # of tying arbitrarily on a constant batch id.
        b = batch.withColumn(
            seq_col,
            F.struct(
                F.lit(batch_id).cast("long").alias("batch"),
                F.monotonically_increasing_id().alias("sub"),
            ),
        )
        # in-batch last-write-wins on (keys, ts): WAL-segment dedup
        b = latest_on(b, seq_col, [*keys, ts_col])
        (
            b.withColumn("part_date", F.date_trunc(unit, F.col(ts_col)).cast("date"))
            .repartition("part_date")
            .sortWithinPartitions(ts_col)
            .write.mode("append")
            .partitionBy("part_date")
            .parquet(path)
        )

    return apply


def read_deduped(
    spark: SparkSession, path: str, ts_col: str, dedup_keys: Sequence[str],
    seq_col: str = "__seq",
) -> DataFrame:
    """Read view with DEDUP UPSERT semantics: latest write per
    (dedup_keys, ts) wins — the cross-batch half of upsert."""
    df = spark.read.parquet(path)
    return latest_on(df, seq_col, [*dedup_keys, ts_col]).drop(seq_col)


def compact(
    spark: SparkSession, path: str, ts_col: str, dedup_keys: Sequence[str],
    seq_col: str = "__seq",
) -> None:
    """Partition rewrite: materialize the dedup view (the ApplyWal2TableJob
    merge, done lazily). Rewrites into a sibling dir then swaps."""
    tmp = path.rstrip("/") + ".compact"
    out = read_deduped(spark, path, ts_col, dedup_keys, seq_col).withColumn(
        seq_col,
        F.struct(
            F.lit(-1).cast("long").alias("batch"), F.lit(-1).cast("long").alias("sub")
        ),
    )
    (
        out.withColumn("part_date", F.date_trunc("day", F.col(ts_col)).cast("date"))
        .repartition("part_date")
        .sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .partitionBy("part_date")
        .parquet(tmp)
    )
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
