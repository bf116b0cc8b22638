"""Incrementally-refreshed materialized views.

Reference: QuestDB mat views are incrementally refreshed SAMPLE BY queries
(``cairo/mv/MatViewRefreshJob.java:77``, ``cairo/mv/
SampleByIntervalIterator.java``): on new WAL transactions, only the time
buckets touched by new rows are recomputed.

Spark mapping: Structured Streaming windowed aggregation with watermark
(late data within the watermark updates its bucket), sunk via foreachBatch
into a parquet result keyed by bucket — each micro-batch overwrites ONLY
the buckets it touched (dynamic partition overwrite = QuestDB's
interval-iterator refresh).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def sample_by_matview(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str,
    interval: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    watermark: str = "10 seconds",
    tz: str | None = None,
    offset: str | None = None,
    trigger_available_now: bool = False,
):
    """Maintain `SELECT bucket, keys, aggs ... SAMPLE BY interval` as a
    continuously-refreshed parquet table.

    ``tz`` / ``offset``: QuestDB ``ALIGN TO CALENDAR TIME ZONE '<tz>'
    [WITH OFFSET 'hh:mm']`` (``TimezoneFloorTimestampSampler``): buckets
    align to LOCAL calendar boundaries. Lowered by shifting the event time
    to wall-clock local time (per-row ``convert_timezone`` — DST-correct,
    unlike a constant shift), windowing on the shifted column, and shifting
    the bucket start back to UTC. ``offset`` is a Spark duration string
    (e.g. ``'30 minutes'``) applied as the window's startTime."""
    keys = list(keys)
    evt = ts_col
    if tz is not None:
        stream = stream.withColumn(
            "__local_ts",
            F.convert_timezone(F.lit("UTC"), F.lit(tz), F.col(ts_col)).cast("timestamp"),
        )
        evt = "__local_ts"
    win = (
        F.window(evt, interval, interval, offset) if offset else F.window(evt, interval)
    )
    start = F.col("__w.start")
    if tz is not None:
        start = F.convert_timezone(
            F.lit(tz), F.lit("UTC"), start.cast("timestamp_ntz")
        ).cast("timestamp")
    bucketed = (
        stream.withWatermark(evt, watermark)
        .groupBy(win.alias("__w"), *keys)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(start.alias("ts_bucket"), *keys, *aggs.keys())
    )

    def refresh(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        new = batch.withColumn("__bucket_part", F.col("ts_bucket").cast("date"))
        # update mode emits only changed (bucket, keys) rows; an overwrite of
        # the touched date partitions must carry the untouched rows too —
        # merge them in (anti-join on the grain) before writing
        try:
            existing = spark.read.parquet(path)
        except Exception:
            existing = None
        if existing is not None:
            touched = new.select("__bucket_part").distinct()
            keep = (
                existing.join(F.broadcast(touched), "__bucket_part", "left_semi")
                .join(new.select("ts_bucket", *keys), ["ts_bucket", *keys], "left_anti")
            )
            new = new.unionByName(keep)
        new.write.mode("overwrite").partitionBy("__bucket_part").parquet(path)

    w = (
        bucketed.writeStream.outputMode("update")
        .foreachBatch(refresh)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_matview(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("__bucket_part")


def latest_on_liveview(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str,
    keys: Sequence[str],
    watermark: str = "1 hour",
    trigger_available_now: bool = False,
):
    """Live view (QuestDB ``cairo/lv/`` checkpointed incremental state):
    continuously maintain LATEST ON ts PARTITION BY keys as a parquet table.

    Stateful streaming max_by per key in update mode; each micro-batch
    merges its changed keys into the result (checkpoint = the live-view
    checkpoint store)."""
    keys = list(keys)
    payload = [c for c in stream.columns if c not in keys]
    latest = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(ts_col)).alias("__row")
        )
        .select(*keys, *[F.col("__row")[c].alias(c) for c in payload])
    )

    def refresh(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        try:
            existing = spark.read.parquet(path)
        except Exception:
            existing = None
        out = batch
        if existing is not None:
            keep = existing.join(batch.select(*keys), keys, "left_anti")
            out = batch.unionByName(keep)
        tmp = path.rstrip("/") + ".lv_tmp"
        out.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(path)

    w = (
        latest.writeStream.outputMode("update")
        .foreachBatch(refresh)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
