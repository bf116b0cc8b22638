"""SAMPLE BY — time-bucketed aggregation with fills.

Reference semantics: QuestDB `SAMPLE BY n{U,T,s,m,h,d,w,M,y}` with
`FILL(none | null | value | prev | linear)`, `ALIGN TO CALENDAR [WITH OFFSET]`,
and `FROM ... TO ...` spine bounds. See
``griffin/engine/groupby/TimestampSamplerFactory.java:153-180`` (units),
``griffin/engine/groupby/SampleByFillNoneRecordCursorFactory.java:49``,
``...FillNullRecordCursorFactory.java:58``, ``...FillPrevRecordCursorFactory.java:41``,
``...FillValueRecordCursorFactory.java:60``,
``SampleByInterpolateRecordCursorFactory.java:67`` (linear),
``SqlParser.java:4284-4366`` (FROM/TO + ALIGN parse).

Spark-first lowering (no custom execution):

1. bucket = epoch-micros floor arithmetic (fixed-width units) or
   ``date_trunc`` (calendar months/years) — stays inside whole-stage codegen;
2. aggregate with an ordinary ``groupBy(bucket, *keys)`` — Catalyst gives the
   partial/final hash aggregation QuestDB hand-rolls in
   ``AsyncGroupByRecordCursorFactory``;
3. fills build a bucket *spine* with ``sequence()`` (one row → explode, so the
   spine is never driver-materialized), cross-join the distinct key set, left
   join the aggregate, then per-fill window math. The spine join shuffles on
   (bucket, keys) — the same keys the aggregation already shuffled on, so AQE
   reuses the layout at scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tsutil import to_micros

# QuestDB sample-by unit → micros (fixed-width units only)
_UNIT_MICROS = {
    "U": 1,
    "T": 1_000,
    "s": 1_000_000,
    "m": 60 * 1_000_000,
    "h": 3600 * 1_000_000,
    "d": 86400 * 1_000_000,
    "w": 7 * 86400 * 1_000_000,
}


def parse_interval(spec: str) -> tuple[int, str]:
    """'15m' -> (15, 'm'); accepts QuestDB unit letters U T s m h d w M y."""
    spec = spec.strip()
    i = 0
    while i < len(spec) and (spec[i].isdigit() or spec[i] == "-"):
        i += 1
    n = int(spec[:i] or "1")
    unit = spec[i:].strip()
    if unit not in (*_UNIT_MICROS, "M", "y"):
        raise ValueError(f"unsupported SAMPLE BY unit: {unit!r}")
    return n, unit


def parse_offset(offset: str) -> int:
    """QuestDB `WITH OFFSET 'hh:mm'` → microseconds."""
    sign = -1 if offset.startswith("-") else 1
    hh, mm = offset.lstrip("+-").split(":")
    return sign * (int(hh) * 3600 + int(mm) * 60) * 1_000_000


def bucket_col(ts: Column, spec: str, offset_us: int = 0, tz: str | None = None) -> Column:
    """Truncate a timestamp to its SAMPLE BY bucket (bucket start).

    ``tz``: QuestDB `ALIGN TO CALENDAR TIME ZONE '<tz>'` — buckets align to
    local-time calendar boundaries (``TimezoneFloorTimestampSampler``); the
    returned bucket start is converted back to the session zone.
    """
    if tz is not None:
        # convert_timezone works on TIMESTAMP_NTZ; the session is pinned to
        # UTC, so NTZ↔LTZ casts preserve the wall clock
        local = F.convert_timezone(
            F.lit("UTC"), F.lit(tz), ts.cast("timestamp_ntz")
        ).cast("timestamp")
        local_bucket = bucket_col(local, spec, offset_us, tz=None)
        return F.convert_timezone(
            F.lit(tz), F.lit("UTC"), local_bucket.cast("timestamp_ntz")
        ).cast("timestamp")
    n, unit = parse_interval(spec)
    if unit == "y":
        if n != 1:
            # n-year buckets: years since epoch floored to multiples of n
            yr = F.year(ts)
            base = (F.floor((yr - 1970) / n) * n + 1970).cast("int")
            return F.to_timestamp(F.concat(base.cast("string"), F.lit("-01-01")))
        return F.date_trunc("year", ts)
    if unit == "M":
        if n != 1:
            months = (F.year(ts) - 1970) * 12 + F.month(ts) - 1
            fl = (F.floor(months / n) * n).cast("int")
            return F.make_timestamp(
                (F.floor(fl / 12) + 1970).cast("int"),
                (fl % 12 + 1).cast("int"),
                F.lit(1), F.lit(0), F.lit(0), F.lit(0),
            )
        return F.date_trunc("month", ts)
    width = n * _UNIT_MICROS[unit]
    us = to_micros(ts) - F.lit(offset_us)
    return F.timestamp_micros((F.floor(us / width) * width + offset_us).cast("long"))


def _spine_step(spec: str) -> str:
    n, unit = parse_interval(spec)
    sql_unit = {
        "U": "MICROSECOND", "T": "MILLISECOND", "s": "SECOND", "m": "MINUTE",
        "h": "HOUR", "d": "DAY", "w": "WEEK", "M": "MONTH", "y": "YEAR",
    }[unit]
    return f"INTERVAL {n} {sql_unit}"


def sample_by(
    df: DataFrame,
    ts_col: str,
    interval: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    fill: str | None = None,
    fill_values: Mapping[str, object] | None = None,
    from_ts: str | None = None,
    to_ts: str | None = None,
    offset_us: int = 0,
    tz: str | None = None,
    bucket_name: str = "ts_bucket",
    align: str = "calendar",
) -> DataFrame:
    """SAMPLE BY lowering. ``fill`` in {None,'none','null','prev','linear','value'}.

    ``aggs`` maps output column name → aggregate Column (already aliased by us).
    With ``fill='value'`` supply ``fill_values[out_name] = constant``.
    ``from_ts``/``to_ts`` are ISO strings bounding the spine (TO is exclusive,
    matching QuestDB's `SAMPLE BY ... FROM x TO y`).

    ``align='first_observation'``: buckets originate at the stream's FIRST
    observed timestamp instead of calendar boundaries — QuestDB
    ``ALIGN TO FIRST OBSERVATION`` (``AbstractNoRecordSampleByCursor.java:233``
    sets the sampler start to the first record's timestamp;
    ``SimpleTimestampSampler.setStart``). The origin is GLOBAL (set once per
    cursor in the reference, not per key). Lowered as one tiny min-aggregate
    broadcast back onto the scan — no collect, no driver round-trip in the
    plan. Incompatible with FROM-TO (``SqlParser.java:4352``) and with
    tz/offset calendar alignment.
    """
    keys = list(keys)
    if align not in ("calendar", "first_observation"):
        raise ValueError(f"unknown align mode: {align!r}")
    if from_ts is not None and to_ts is not None:
        from datetime import datetime

        try:
            lo_dt, hi_dt = datetime.fromisoformat(from_ts), datetime.fromisoformat(to_ts)
        except ValueError:
            lo_dt = hi_dt = None
        if lo_dt is not None and lo_dt > hi_dt:
            # SampleByFillTest.testFillFromGreaterThanToRejected (FROM == TO
            # is a valid zero-length range: TO is exclusive → empty result)
            raise ValueError("TO timestamp must not be earlier than FROM timestamp")
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        # unix_micros needs TIMESTAMP; session tz is UTC so the cast is exact
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if from_ts is not None:
        df = df.filter(F.col(ts_col) >= F.lit(from_ts).cast("timestamp"))
    if to_ts is not None:
        df = df.filter(F.col(ts_col) < F.lit(to_ts).cast("timestamp"))

    if align == "first_observation":
        if from_ts is not None or to_ts is not None:
            raise ValueError("ALIGN TO FIRST OBSERVATION is incompatible with FROM-TO")
        if tz is not None or offset_us:
            raise ValueError("ALIGN TO FIRST OBSERVATION excludes calendar tz/offset")
        n, unit = parse_interval(interval)
        if unit in ("M", "y"):
            raise ValueError("first-observation alignment supports fixed-width units")
        width = n * _UNIT_MICROS[unit]
        origin = df.agg(F.min(ts_col).alias("__origin"))
        df = df.crossJoin(F.broadcast(origin))
        o_us = to_micros(F.col("__origin"))
        b = F.timestamp_micros(
            (
                o_us
                + F.floor((to_micros(F.col(ts_col)) - o_us) / F.lit(width))
                * F.lit(width)
            ).cast("long")
        )
        out = (
            df.withColumn(bucket_name, b)
            .drop("__origin")
            .groupBy(bucket_name, *keys)
            .agg(*[expr.alias(name) for name, expr in aggs.items()])
        )
    else:
        b = bucket_col(F.col(ts_col), interval, offset_us, tz)
        agg_cols = [expr.alias(name) for name, expr in aggs.items()]
        out = df.withColumn(bucket_name, b).groupBy(bucket_name, *keys).agg(*agg_cols)

    if fill in (None, "none"):
        return out

    # --- build the bucket spine ------------------------------------------
    step = _spine_step(interval)
    if from_ts is not None and to_ts is not None:
        bounds = df.sparkSession.range(1).select(
            F.lit(from_ts).cast("timestamp").alias("lo"),
            F.lit(to_ts).cast("timestamp").alias("hi"),
        )
        # TO bound is exclusive: step back one microsecond before bucketing
        bounds = bounds.select(
            bucket_col(F.col("lo"), interval, offset_us, tz).alias("lo"),
            bucket_col(F.expr("hi - INTERVAL 1 MICROSECOND"), interval, offset_us, tz).alias("hi"),
        )
    else:
        bounds = out.agg(
            F.min(bucket_name).alias("lo"), F.max(bucket_name).alias("hi")
        )
    # FROM == TO (exclusive upper bound) flips hi below lo: a zero-length
    # range is valid and yields an EMPTY spine, not an error
    # (SampleByFillTest.testFillFromEqualsToAccepted)
    spine = bounds.select(
        F.explode(
            F.when(F.col("lo") <= F.col("hi"), F.expr(f"sequence(lo, hi, {step})"))
            .otherwise(F.expr("CAST(array() AS array<timestamp>)"))
        ).alias(bucket_name)
    )
    if keys:
        spine = spine.crossJoin(F.broadcast(df.select(*keys).distinct()))

    filled = spine.join(out, [bucket_name, *keys], "left")

    # per-column fill modes: a plain string broadcasts to every aggregate;
    # a mapping assigns modes positionally-resolved by the caller
    # (``FILL(PREV, 0, NULL)`` — SampleByFillTest multi-value lists)
    names = list(aggs.keys())
    modes = dict(fill) if isinstance(fill, Mapping) else {n: fill for n in names}
    bad = set(modes.values()) - {"null", "value", "prev", "linear"}
    if bad:
        raise ValueError(f"unknown fill mode: {sorted(bad)!r}")
    fv = fill_values or {}
    for name in names:
        if modes.get(name) == "value" and name in fv:
            filled = filled.withColumn(name, F.coalesce(F.col(name), F.lit(fv[name])))
    prev_cols = [n for n in names if modes.get(n) == "prev"]
    lin_cols = [n for n in names if modes.get(n) == "linear"]
    if prev_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_name)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for name in prev_cols:
            filled = filled.withColumn(name, F.last(name, ignorenulls=True).over(w))
    if lin_cols:
        wp = (
            Window.partitionBy(*keys)
            .orderBy(bucket_name)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wn = (
            Window.partitionBy(*keys)
            .orderBy(bucket_name)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        bus = to_micros(F.col(bucket_name))
        for name in lin_cols:
            c = F.col(name)
            marked_ts = F.when(c.isNotNull(), bus)
            pv = F.last(c, ignorenulls=True).over(wp)
            pt = F.last(marked_ts, ignorenulls=True).over(wp)
            nv = F.first(c, ignorenulls=True).over(wn)
            nt = F.first(marked_ts, ignorenulls=True).over(wn)
            interp = pv + (nv - pv) * (bus - pt) / (nt - pt)
            filled = filled.withColumn(
                name,
                F.when(c.isNotNull(), c).when(
                    pt.isNotNull() & nt.isNotNull(), interp
                ),  # QuestDB linear fill leaves leading/trailing gaps null
            )
    return filled
