"""ASOF / LT / SPLICE joins — the time-series join family.

Reference semantics (QuestDB):
- ASOF: for each master row, the latest slave row with ``slave.ts <= master.ts``
  (optional equi-keys, optional TOLERANCE interval) —
  ``griffin/engine/join/AsOfJoinFastRecordCursorFactory.java:50``,
  tolerance parse ``griffin/SqlParser.java:5069``.
- LT: strictly ``slave.ts < master.ts`` —
  ``griffin/engine/join/LtJoinRecordCursorFactory.java:55``.
- SPLICE: time-ordered full-outer merge of both sides, each side carrying the
  other's latest values — ``griffin/engine/join/SpliceJoinLightRecordCursorFactory.java:62``.

Spark-first lowering — the union-tag trick (no pandas, no per-key loop):

1. union master and slave rows into one stream, slave payload packed into a
   single STRUCT column (null for master rows);
2. one window pass per key: ``last(slave_struct, ignorenulls=true)`` over
   ``ORDER BY ts, side ROWS UNBOUNDED PRECEDING`` carries the latest slave
   payload forward (the struct packing matters: a NULL field inside a slave
   row must not be skipped — only whole missing rows are);
3. keep master rows, unpack the struct, apply tolerance as a post-filter.

Scale: one shuffle on the join keys, sorted within partitions — exactly the
plan a sort-merge ASOF would want. Skewed keys are handled by AQE; the
keyless case degenerates to a single partition, so for keyless joins we
pre-bucket time into coarse chunks and carry boundary state across chunks
(two-pass, still no driver loop).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SSTRUCT = "__slave_payload"
_SIDE = "__side"  # 0 = slave, 1 = master → slave sorts first on ts ties (ASOF takes equal ts)


def _union_tag(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    slave_ts_out: str,
    strict: bool,
) -> tuple[DataFrame, list[str], list[str]]:
    keys = list(keys)
    mcols = [c for c in master.columns]
    scols = [c for c in slave.columns if c not in keys]

    payload = F.struct(
        F.col(ts_col).alias(slave_ts_out),
        *[F.col(c) for c in scols if c != ts_col],
    )
    s = slave.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(0 if not strict else 0).alias(_SIDE),
        payload.alias(_SSTRUCT),
        *[F.lit(None).cast(master.schema[c].dataType).alias(f"__m_{c}") for c in mcols],
    )
    m = master.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(1 if not strict else -1).alias(_SIDE),
        F.lit(None).cast(s.schema[_SSTRUCT].dataType).alias(_SSTRUCT),
        *[F.col(c).alias(f"__m_{c}") for c in mcols],
    )
    # _SIDE ordering: ASOF (strict=False): slave(0) before master(1) on equal
    # ts → equal-ts slave rows are visible. LT (strict=True): master(-1)
    # before slave(0) → equal-ts slave rows are NOT visible.
    return s.unionByName(m), mcols, [c for c in scols if c != ts_col]


def asof_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str] = (),
    tolerance: str | None = None,
    strict: bool = False,
    slave_ts_out: str = "slave_ts",
    chunk: str | None = None,
) -> DataFrame:
    """ASOF (or LT when ``strict``) join; both inputs share ``ts_col`` name.

    Slave columns other than keys/ts come back under their own names; the
    matched slave timestamp comes back as ``slave_ts_out``. ``tolerance`` is
    a SQL interval string (e.g. ``'1 hour'``): matches older than it are
    nulled out (QuestDB `TOLERANCE`).

    ``chunk`` (keyless joins only): a SQL interval (e.g. ``'1 hour'``) that
    time-slices the stream so the carry window parallelizes — without it a
    keyless ASOF is a single-partition window. Two passes: carry within
    each chunk, then prefix-propagate each chunk's closing slave state to
    the next chunk's rows that precede their first in-chunk slave row.
    """
    unioned, mcols, spayload = _union_tag(master, slave, ts_col, keys, slave_ts_out, strict)
    if chunk is not None and not keys:
        carried = _chunked_carry(unioned, chunk)
    else:
        w = (
            Window.partitionBy(*[F.col(k) for k in keys])
            .orderBy("__ts", _SIDE)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(_SSTRUCT, F.last(_SSTRUCT, ignorenulls=True).over(w))
    out = carried.filter(F.col(_SIDE) != 0)

    matched = F.col(_SSTRUCT)
    if tolerance is not None:
        within = matched[slave_ts_out] >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        matched = F.when(within, matched)

    # a slave payload column sharing a name with a master column would make
    # downstream selects ambiguous — suffix the slave side (QuestDB prefixes
    # with the slave table alias; '<col>_slave' is the aliasless equivalent)
    taken = set(mcols)

    def out_name(c: str) -> str:
        return f"{c}_slave" if c in taken else c

    return out.select(
        *[F.col(f"__m_{c}").alias(c) for c in mcols],
        matched[slave_ts_out].alias(out_name(slave_ts_out)),
        *[matched[c].alias(out_name(c)) for c in spayload],
    )


def _chunked_carry(unioned: DataFrame, chunk: str) -> DataFrame:
    """Parallel carry for keyless streams.

    1. partition the union by coarse time chunk; carry the slave payload
       within each chunk (windows now parallelize across chunks);
    2. aggregate each chunk's LAST slave payload (tiny: one row per chunk),
       prefix-carry it across the chunk sequence with a window over that
       tiny frame, shift by one chunk (state entering the chunk);
    3. broadcast-join the carry-in back and coalesce for rows before their
       chunk's first slave row.
    """
    chunked = unioned.withColumn(
        "__chunk", F.window(F.col("__ts"), chunk)["start"]
    )
    wc = (
        Window.partitionBy("__chunk")
        .orderBy("__ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = chunked.withColumn("__carry", F.last(_SSTRUCT, ignorenulls=True).over(wc))

    # One aggregate yields EVERY chunk plus its closing slave payload
    # (null when the chunk has no slave rows) — the FILTER clause replays
    # the old `filter(notNull) -> groupBy -> left-join(all_chunks
    # distinct)` pair of passes exactly, but as a single exchange over the
    # pre-window frame (r14 session 4, guide §2.4: the window stage used
    # to re-execute under the closing aggregate, and the distinct added a
    # second full pass + exchange).
    closing = chunked.groupBy("__chunk").agg(
        F.expr(
            f"max_by({_SSTRUCT}, struct(__ts, {_SIDE})) "
            f"FILTER (WHERE {_SSTRUCT} IS NOT NULL)"
        ).alias("__closing")
    )
    wprefix = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    carry_in = closing.select(
        "__chunk",
        F.last("__closing", ignorenulls=True).over(wprefix).alias("__carry_in"),
    )
    return (
        within.join(F.broadcast(carry_in), "__chunk", "left")
        .withColumn(_SSTRUCT, F.coalesce(F.col("__carry"), F.col("__carry_in")))
        .drop("__chunk", "__carry", "__carry_in")
    )


def lt_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str] = (),
    tolerance: str | None = None,
    slave_ts_out: str = "slave_ts",
) -> DataFrame:
    """LT JOIN: latest slave row strictly before master ts."""
    return asof_join(master, slave, ts_col, keys, tolerance, strict=True, slave_ts_out=slave_ts_out)


def splice_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """SPLICE JOIN: full-outer time-ordered merge; each output row is a
    timestamp from either side with the latest payload of BOTH sides as of
    that timestamp (``SpliceJoinLightRecordCursorFactory.java:62``).
    """
    keys = list(keys)
    mpay = [c for c in master.columns if c not in keys and c != ts_col]
    spay = [c for c in slave.columns if c not in keys and c != ts_col]

    m = master.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.struct(F.col(ts_col).alias("m_ts"), *[F.col(c) for c in mpay]).alias("__m"),
        F.lit(None).cast(
            f"struct<s_ts:timestamp,{','.join(f'{c}:{slave.schema[c].dataType.simpleString()}' for c in spay)}>"
            if spay else "struct<s_ts:timestamp>"
        ).alias("__s"),
    )
    s = slave.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast(m.schema["__m"].dataType).alias("__m"),
        F.struct(F.col(ts_col).alias("s_ts"), *[F.col(c) for c in spay]).alias("__s"),
    )
    u = m.unionByName(s)
    # RANGE frame: rows from both sides sharing a timestamp see each other
    # (QuestDB splice treats equal timestamps as matched); within a peer
    # group only one row per side exists (inputs deduped per (key, ts)), so
    # last(ignorenulls) is deterministic.
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy("__ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        u.withColumn("__m", F.last("__m", ignorenulls=True).over(w))
        .withColumn("__s", F.last("__s", ignorenulls=True).over(w))
    )
    mset = set(mpay)
    return carried.select(
        *keys,
        F.col("__ts").alias(ts_col),
        F.col("__m")["m_ts"].alias("master_ts"),
        *[F.col("__m")[c].alias(c) for c in mpay],
        F.col("__s")["s_ts"].alias("slave_ts"),
        # slave payload columns colliding with master payload get suffixed
        *[F.col("__s")[c].alias(f"{c}_slave" if c in mset else c) for c in spay],
    )
