"""Custom stateful streaming operators via ``applyInPandasWithState``.

Reference: QuestDB evaluates window/aggregate functions incrementally as
WAL transactions land (``griffin/engine/window/`` over streaming commits;
EMA specifically ``functions/window/EmaDoubleWindowFunctionFactory``).
The Structured-Streaming twin is a keyed stateful operator: per-key state
carries the recurrence across micro-batches, so an unbounded stream gets
the exact same values a batch pass over the full history would produce.

Scale: state is O(1) per key (one double + one timestamp), partitioned by
the grouping key across executors — the standard stateful-streaming
layout. In-batch rows are sorted by event time before the recurrence
advances; cross-batch ordering relies on the source's per-key monotonic
delivery (the ingest path's watermark + sorted WAL apply provides it —
out-of-order rows older than the carried timestamp are surfaced with a
NULL ema rather than silently corrupting the state).

Arrival contract, join twins (ASOF/LT/SPLICE/WINDOW/HORIZON): cross-batch
SLAVE timestamps must arrive non-decreasing per key.  IN-batch disorder
is always fine — every micro-batch is buffered whole and sorted before
merging.  A violating batch (a slave OLDER than the carried newest) is
NOT merged back in time, because bounded O(1) state cannot re-order
emitted history: the ASOF twin treats the late slave as the new
prevailing state (arrival order wins — subsequent masters can diverge
from the batch twin), while the LT twin carries TRUE timestamps and
fails loudly (its merge table stops being time-ordered) instead of
emitting silently-wrong rows.  Both outcomes are pinned by
``test_streaming_join_arrival_contract_violation``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_ema(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float,
    keys: Sequence[str],
    out_col: str = "ema",
) -> DataFrame:
    """Exact per-key EMA (y = α·x + (1-α)·y_prev) over an unbounded
    stream. Emits every input row with its EMA value appended; state =
    (last ema, last event time) per key, carried across micro-batches and
    restarts (checkpointed by the engine)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = list(keys)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields
    ) + f", {out_col} double"
    state_schema = "ema double, last_ts timestamp"

    def advance(key, pdf_iter, state):
        if state.exists:
            ema, last_ts = state.get
        else:
            ema, last_ts = None, None
        # buffer the WHOLE micro-batch before folding (family rule, same
        # as the join twins): when one key's batch spans >1 Arrow chunk,
        # a per-chunk fold advances the recurrence in chunk order rather
        # than timestamp order and flags a chunk-2 row older than
        # chunk-1's tail as late — silently diverging from the batch EMA
        chunks = [c for c in pdf_iter if len(c)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([ts_col], kind="mergesort")
            out = []
            for t, v in zip(pdf[ts_col], pdf[value_col]):
                if last_ts is not None and t < last_ts:
                    out.append(None)  # late beyond carried state: flagged
                    continue
                ema = float(v) if ema is None else alpha * float(v) + (1.0 - alpha) * ema
                last_ts = t
                out.append(ema)
            pdf[out_col] = pd.Series(out, index=pdf.index, dtype="float64")
            state.update((ema, last_ts))
            yield pdf
        else:
            state.update((ema, last_ts))

    return stream.groupBy(*keys).applyInPandasWithState(
        advance, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_asof_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Stream-stream ASOF JOIN: every master row is enriched with the
    latest key-matching slave payload at-or-before its timestamp — the
    streaming twin of ``operators/asof.asof_join`` (QuestDB evaluates ASOF
    incrementally as WAL rows land).

    Lowering: the two streams union with a side tag (slave sorts first on
    timestamp ties, matching the batch operator); per-key state carries
    the prevailing payload across micro-batches. One stateful shuffle on
    the join keys — the same layout the batch union-tag lowering uses, so
    the plan scales identically.

    Arrival contract (module docstring): cross-batch slave timestamps
    non-decreasing per key.  On a violating late slave, arrival order
    wins — the late payload becomes the prevailing state and later
    masters diverge from the batch twin (pinned by
    ``test_streaming_join_arrival_contract_violation``).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = list(keys)
    payload_cols = list(payload_cols)
    mcols = [c for c in master.columns]
    tagged_m = master.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__m_{c}") for c in mcols if c not in keys and c != ts_col],
        *[F.lit(None).cast(slave.schema[c].dataType).alias(f"__s_{c}") for c in payload_cols],
    )
    tagged_s = slave.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(master.schema[c].dataType).alias(f"__m_{c}")
          for c in mcols if c not in keys and c != ts_col],
        *[F.col(c).alias(f"__s_{c}") for c in payload_cols],
    )
    unioned = tagged_m.unionByName(tagged_s)

    out_fields = (
        [f"{k} {master.schema[k].dataType.simpleString()}" for k in keys]
        + [f"{ts_col} {master.schema[ts_col].dataType.simpleString()}"]
        + [f"{c} {master.schema[c].dataType.simpleString()}"
           for c in mcols if c not in keys and c != ts_col]
        + [f"{c} {slave.schema[c].dataType.simpleString()}" for c in payload_cols]
    )
    out_schema = ", ".join(out_fields)
    state_schema = ", ".join(
        f"{c} {slave.schema[c].dataType.simpleString()}" for c in payload_cols
    )

    out_names = [f.split()[0] for f in out_fields]
    mpass = [c for c in mcols if c not in keys and c != ts_col]

    def advance(key, pdf_iter, state):
        # vectorized within each micro-batch: pandas merge_asof (C loop)
        # against the batch's slave rows with the carried payload prepended
        # as a sentinel at -inf — no per-row Python.  The WHOLE batch is
        # buffered before the merge (same rule as streaming_window_join):
        # emitted rows are final in append mode, so a per-chunk merge
        # would let a chunk-1 master emit before a chunk-2 slave with an
        # earlier timestamp is visible.
        carried = list(state.get) if state.exists else [None] * len(payload_cols)
        chunks = list(pdf_iter)
        pdf = pd.concat(chunks, ignore_index=True) if chunks else None
        if pdf is not None and len(pdf):
            slaves = pdf[pdf["__side"] == 0].sort_values("__ts", kind="mergesort")
            masters = pdf[pdf["__side"] == 1].sort_values("__ts", kind="mergesort")
            scols = {f"__s_{c}": [v] for c, v in zip(payload_cols, carried)}
            sentinel = pd.DataFrame({"__ts": [pd.Timestamp.min], **scols})
            stable = pd.concat(
                [sentinel, slaves[["__ts"] + [f"__s_{c}" for c in payload_cols]]],
                ignore_index=True,
            )
            if len(slaves):
                carried = [slaves.iloc[-1][f"__s_{c}"] for c in payload_cols]
            if len(masters):
                merged = pd.merge_asof(
                    masters[["__ts"] + [f"__m_{c}" for c in mpass]],
                    stable, on="__ts", allow_exact_matches=True,
                )
                out = pd.DataFrame({
                    **{k: v for k, v in zip(keys, key)},
                    ts_col: merged["__ts"],
                    **{c: merged[f"__m_{c}"] for c in mpass},
                    **{c: merged[f"__s_{c}"] for c in payload_cols},
                })
                yield out[out_names]
        state.update(tuple(carried))

    return unioned.groupBy(*keys).applyInPandasWithState(
        advance, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_lt_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Stream-stream LT JOIN: every master row is enriched with the
    latest key-matching slave payload STRICTLY BEFORE its timestamp —
    the streaming twin of ``operators/asof.lt_join`` (reference LT JOIN,
    SqlCodeGenerator LT join family), completing the streaming
    time-series join set next to the ASOF and WINDOW JOIN twins.

    Same union-tag + per-key ``merge_asof`` lowering as
    ``streaming_asof_join``, with ``allow_exact_matches=False``.  The
    cross-batch state must carry the last TWO slave rows WITH their true
    timestamps: a master in a later batch that TIES the newest slave's
    timestamp takes the strictly-earlier slave, so a single carried
    payload (the ASOF state) would either wrongly match the tie (-inf
    sentinel) or wrongly null it (single true-ts sentinel).  Arrival
    contract is the family's usual per-key monotonicity on both sides
    (module docstring); because this twin's state carries TRUE
    timestamps, a violating late slave is detected and the query fails
    loudly rather than emitting silently-wrong rows (pinned by
    ``test_streaming_join_arrival_contract_violation``).  State is O(1)
    per key and the plan is ONE stateful shuffle on the join keys."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = list(keys)
    payload_cols = list(payload_cols)
    mcols = [c for c in master.columns]
    tagged_m = master.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__m_{c}") for c in mcols if c not in keys and c != ts_col],
        *[F.lit(None).cast(slave.schema[c].dataType).alias(f"__s_{c}") for c in payload_cols],
    )
    tagged_s = slave.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(master.schema[c].dataType).alias(f"__m_{c}")
          for c in mcols if c not in keys and c != ts_col],
        *[F.col(c).alias(f"__s_{c}") for c in payload_cols],
    )
    unioned = tagged_m.unionByName(tagged_s)

    out_fields = (
        [f"{k} {master.schema[k].dataType.simpleString()}" for k in keys]
        + [f"{ts_col} {master.schema[ts_col].dataType.simpleString()}"]
        + [f"{c} {master.schema[c].dataType.simpleString()}"
           for c in mcols if c not in keys and c != ts_col]
        + [f"{c} {slave.schema[c].dataType.simpleString()}" for c in payload_cols]
    )
    out_schema = ", ".join(out_fields)
    # two carried slave rows, oldest first; NULL ts = slot empty
    state_schema = ", ".join(
        [f"ts{i} timestamp" for i in range(2)]
        + [
            f"p{i}_{j} {slave.schema[c].dataType.simpleString()}"
            for i in range(2)
            for j, c in enumerate(payload_cols)
        ]
    )
    out_names = [f.split()[0] for f in out_fields]
    mpass = [c for c in mcols if c not in keys and c != ts_col]
    np_ = len(payload_cols)

    def advance(key, pdf_iter, state):
        if state.exists:
            st = list(state.get)
            carried = [
                (st[i], st[2 + i * np_ : 2 + (i + 1) * np_])
                for i in range(2)
                if st[i] is not None
            ]
        else:
            carried = []
        # buffer the WHOLE micro-batch first (same rule as
        # streaming_window_join): emitted rows are final in append mode,
        # so merging per Arrow chunk would let a chunk-1 master emit
        # before its chunk-2 slave (earlier ts) is visible
        chunks = list(pdf_iter)
        pdf = pd.concat(chunks, ignore_index=True) if chunks else None
        if pdf is not None and len(pdf):
            slaves = pdf[pdf["__side"] == 0].sort_values("__ts", kind="mergesort")
            masters = pdf[pdf["__side"] == 1].sort_values("__ts", kind="mergesort")
            pcols = ["__ts"] + [f"__s_{c}" for c in payload_cols]
            scols = {
                "__ts": [t for t, _ in carried],
                **{
                    f"__s_{c}": [p[j] for _, p in carried]
                    for j, c in enumerate(payload_cols)
                },
            }
            # coerce the prefix to the batch dtypes: with no carried state
            # the prefix columns come up object-dtype, and merge_asof
            # rejects object vs datetime64 when the batch has masters but
            # no slaves (batch lt_join emits NULL payloads on that input)
            prefix = pd.DataFrame(scols, columns=pcols).astype(
                {c: pdf[c].dtype for c in pcols}
            )
            stable = pd.concat([prefix, slaves[pcols]], ignore_index=True)
            # carry the newest slave row plus the newest row with a
            # STRICTLY smaller timestamp (equal-ts rows collapse to the
            # last one): carrying the last two ROWS loses the
            # strictly-earlier payload when the two newest slaves tie on
            # ts, and a later-batch master tying that ts would get NULL
            # where batch lt_join finds the evicted earlier slave
            tail = slaves[pcols].drop_duplicates("__ts", keep="last").tail(2)
            for _, row in tail.iterrows():
                entry = (row["__ts"], [row[f"__s_{c}"] for c in payload_cols])
                if carried and carried[-1][0] == entry[0]:
                    carried[-1] = entry
                else:
                    carried.append(entry)
            carried = carried[-2:]
            if len(masters):
                merged = pd.merge_asof(
                    masters[["__ts"] + [f"__m_{c}" for c in mpass]],
                    stable, on="__ts", allow_exact_matches=False,
                )
                out = pd.DataFrame({
                    **{k: v for k, v in zip(keys, key)},
                    ts_col: merged["__ts"],
                    **{c: merged[f"__m_{c}"] for c in mpass},
                    **{c: merged[f"__s_{c}"] for c in payload_cols},
                })
                yield out[out_names]
        pad = [(None, [None] * np_)] * (2 - len(carried))
        full = pad + carried
        state.update(
            tuple([t for t, _ in full] + [v for _, p in full for v in p])
        )

    return unioned.groupBy(*keys).applyInPandasWithState(
        advance, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_horizon_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    horizons_seconds: Sequence[float],
) -> DataFrame:
    """Stream-stream HORIZON JOIN (markout): for each master row and each
    horizon offset h, the latest key-matching slave value as of
    ``ts + h`` — the streaming twin of ``operators/window_join.
    horizon_join`` (reference MarkoutHorizon factories), completing the
    streaming family (ASOF / LT / SPLICE / WINDOW / HORIZON).

    A master cannot emit until the slave stream provably passes its
    LARGEST horizon, so state buffers pending masters plus a slave tail
    per key (the window-join look-ahead shape); emission yields one row
    per (master, horizon) like the batch exploded-ASOF form.  The slave
    tail trims to the earliest pending ``ts + min(h)`` KEEPING the one
    prevailing row before that floor (an as-of lookup reaches backward,
    unlike the window join's closed interval).  Whole micro-batches are
    buffered before emit/trim (the family rule); arrival contract: slave
    event time non-decreasing per key, masters no older than
    ``max_slave_ts - max(h)``.  One stateful shuffle on the join keys."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = list(keys)
    h_us = sorted(int(h * 1_000_000) for h in horizons_seconds)
    min_h, max_h = h_us[0], h_us[-1]
    tagged_m = master.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("double").alias("__v"),
    )
    tagged_s = slave.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(value_col).cast("double").alias("__v"),
    )
    unioned = tagged_m.unionByName(tagged_s)

    key_fields = ", ".join(
        f"{k} {master.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, {ts_col} {master.schema[ts_col].dataType.simpleString()}, "
        "horizon_s double, slave_ts timestamp, v double"
    )
    state_schema = (
        "m_ts array<long>, s_ts array<long>, s_v array<double>, max_s long"
    )
    out_names = keys + [ts_col, "horizon_s", "slave_ts", "v"]

    def advance(key, pdf_iter, state):
        if state.exists:
            m_ts, s_ts, s_v, max_s = state.get
            m_ts, s_ts, s_v = list(m_ts), list(s_ts), list(s_v)
        else:
            m_ts, s_ts, s_v, max_s = [], [], [], -(1 << 62)
        for pdf in pdf_iter:  # buffer the whole micro-batch first
            ts_us = pdf["__ts"].astype("int64") // 1000  # ns -> us
            is_s = pdf["__side"].to_numpy() == 0
            m_ts.extend(ts_us[~is_s].tolist())
            s_ts.extend(ts_us[is_s].tolist())
            s_v.extend(pdf["__v"][is_s].astype(float).tolist())
            if is_s.any():
                max_s = max(max_s, int(ts_us[is_s].max()))
        ready = sorted(t for t in m_ts if t + max_h <= max_s)
        m_ts = [t for t in m_ts if t + max_h > max_s]
        if ready:
            order = np.argsort(np.array(s_ts, dtype=np.int64), kind="stable")
            st = np.array(s_ts, dtype=np.int64)[order]
            sv = np.array(s_v, dtype=np.float64)[order]
            rows_ts, rows_h, rows_sts, rows_v = [], [], [], []
            rm = np.array(ready, dtype=np.int64)
            for h in h_us:
                idx = np.searchsorted(st, rm + h, side="right") - 1
                ok = idx >= 0
                rows_ts.extend(rm.tolist())
                rows_h.extend([h / 1_000_000.0] * len(rm))
                rows_sts.extend(
                    [int(st[i]) if o else None for i, o in zip(idx, ok)]
                )
                rows_v.extend(
                    [float(sv[i]) if o else None for i, o in zip(idx, ok)]
                )
            yield pd.DataFrame({
                **{k: v for k, v in zip(keys, key)},
                ts_col: pd.to_datetime(np.array(rows_ts) * 1000),
                "horizon_s": rows_h,
                # int path only: µs*1000 exceeds float64's 53-bit mantissa
                "slave_ts": pd.Series(
                    [pd.NaT if x is None else pd.Timestamp(x * 1000)
                     for x in rows_sts]
                ),
                "v": pd.Series(rows_v, dtype="float64"),
            })[out_names]
        # trim: keep the tail from the earliest still-needed as-of floor,
        # PLUS the single prevailing row before it
        floor_us = (min(m_ts) + min_h) if m_ts else (max_s - max_h + min_h)
        pairs = sorted(zip(s_ts, s_v))
        before = [i for i, (t, _) in enumerate(pairs) if t < floor_us]
        start = before[-1] if before else 0
        kept = pairs[start:]
        s_ts, s_v = [t for t, _ in kept], [v for _, v in kept]
        state.update((m_ts, s_ts, s_v, max_s))

    return unioned.groupBy(*keys).applyInPandasWithState(
        advance, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_splice_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
) -> DataFrame:
    """Stream-stream SPLICE JOIN: full-outer time-ordered merge — every
    row from EITHER side emits with the latest payload of BOTH sides as
    of its timestamp (equal timestamps see each other, the reference's
    ``SpliceJoinLightRecordCursorFactory.java:62`` RANGE semantics) —
    the streaming twin of ``operators/asof.splice_join``.

    Unlike the WINDOW JOIN twin, splice needs NO look-ahead: each output
    row references only the other side's past, so every batch row emits
    immediately and state is just the last row of each side per key
    (O(1)).  The whole micro-batch is buffered, forward-filled in time
    order, and equal-timestamp groups take the group-last fill so ties
    match both directions.  Arrival contract: per-key monotone event
    time on both sides across micro-batches (same family contract).
    One stateful shuffle on the join keys."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = list(keys)
    mpay = [c for c in master.columns if c not in keys and c != ts_col]
    spay = [c for c in slave.columns if c not in keys and c != ts_col]
    mset = set(mpay)

    tagged_m = master.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.col(ts_col).alias("__m_ts"),
        F.lit(None).cast("timestamp").alias("__s_ts"),
        *[F.col(c).alias(f"__m_{c}") for c in mpay],
        *[F.lit(None).cast(slave.schema[c].dataType).alias(f"__s_{c}") for c in spay],
    )
    tagged_s = slave.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast("timestamp").alias("__m_ts"),
        F.col(ts_col).alias("__s_ts"),
        *[F.lit(None).cast(master.schema[c].dataType).alias(f"__m_{c}") for c in mpay],
        *[F.col(c).alias(f"__s_{c}") for c in spay],
    )
    unioned = tagged_m.unionByName(tagged_s)

    out_fields = (
        [f"{k} {master.schema[k].dataType.simpleString()}" for k in keys]
        + [f"{ts_col} {master.schema[ts_col].dataType.simpleString()}"]
        + ["master_ts timestamp"]
        + [f"{c} {master.schema[c].dataType.simpleString()}" for c in mpay]
        + ["slave_ts timestamp"]
        + [
            f"{c}_slave {slave.schema[c].dataType.simpleString()}"
            if c in mset
            else f"{c} {slave.schema[c].dataType.simpleString()}"
            for c in spay
        ]
    )
    out_schema = ", ".join(out_fields)
    out_names = [f.rsplit(" ", 1)[0] for f in out_fields]
    mcols_ = ["__m_ts"] + [f"__m_{c}" for c in mpay]
    scols_ = ["__s_ts"] + [f"__s_{c}" for c in spay]
    state_schema = ", ".join(
        ["m_ts timestamp"]
        + [f"m{i} {master.schema[c].dataType.simpleString()}" for i, c in enumerate(mpay)]
        + ["s_ts timestamp"]
        + [f"s{i} {slave.schema[c].dataType.simpleString()}" for i, c in enumerate(spay)]
    )

    def advance(key, pdf_iter, state):
        nm = len(mpay)
        if state.exists:
            st = list(state.get)
            m_carr, s_carr = st[: 1 + nm], st[1 + nm :]
        else:
            m_carr, s_carr = [None] * (1 + nm), [None] * (1 + len(spay))
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf["__sent"] = 0
            sentinels = []
            for carr, cols in ((m_carr, mcols_), (s_carr, scols_)):
                if carr[0] is not None:
                    row = {c: None for c in pdf.columns}
                    row["__ts"] = carr[0]
                    row["__sent"] = 1
                    for c, v in zip(cols, carr):
                        row[c] = v
                    sentinels.append(row)
            if sentinels:
                pdf = pd.concat(
                    [pd.DataFrame(sentinels, columns=pdf.columns), pdf],
                    ignore_index=True,
                )
            pdf = pdf.sort_values(
                ["__ts", "__sent"], ascending=[True, False], kind="mergesort"
            ).reset_index(drop=True)
            for c in mcols_ + scols_:
                pdf[c] = pdf[c].ffill()
            # equal timestamps are peers: every row in a tie group takes
            # the group's LAST fill, so both sides of a tie see each other
            pdf[mcols_ + scols_] = pdf.groupby("__ts", sort=False)[
                mcols_ + scols_
            ].transform("last")
            out = pdf[pdf["__sent"] == 0]
            if len(out):
                res = pd.DataFrame({
                    **{k: v for k, v in zip(keys, key)},
                    ts_col: out["__ts"],
                    "master_ts": out["__m_ts"],
                    **{c: out[f"__m_{c}"] for c in mpay},
                    "slave_ts": out["__s_ts"],
                    **{
                        (f"{c}_slave" if c in mset else c): out[f"__s_{c}"]
                        for c in spay
                    },
                })
                yield res[out_names]
            tail = pdf.iloc[-1]
            m_carr = [None if pd.isna(tail["__m_ts"]) else tail["__m_ts"]] + [
                None if (v := tail[f"__m_{c}"]) is pd.NA or pd.isna(v) else v
                for c in mpay
            ]
            s_carr = [None if pd.isna(tail["__s_ts"]) else tail["__s_ts"]] + [
                None if (v := tail[f"__s_{c}"]) is pd.NA or pd.isna(v) else v
                for c in spay
            ]
        state.update(tuple(m_carr + s_carr))

    return unioned.groupBy(*keys).applyInPandasWithState(
        advance, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_sessionize(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Streaming twin of ``operators.sessions.sessionize`` on Spark's
    NATIVE session windows: ``session_window(ts, gap)`` merges events
    within the gap and holds sessions open in state until the watermark
    passes session_end + gap — no custom state function needed, which is
    exactly the built-in-first rule this engine follows.

    Boundary note: the native window is half-open ``[start, last+gap)``,
    so an event landing EXACTLY gap after its predecessor opens a new
    session here, while the batch operator's strict-greater flag keeps it
    (a measure-zero divergence on continuous timestamps; documented
    rather than papered over)."""
    gap = f"{int(gap_seconds)} seconds"
    return (
        stream.withWatermark(ts_col, gap)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            key_col,
            "session_start",
            "session_end",
            "n_events",
        )
    )


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``pipeline.dedup.exact_dedup``: emit only the
    FIRST arrival of each content hash — the dedup gate a continuous
    training-data ingest runs in front of the corpus store.

    Built-in-first: Spark's streaming ``dropDuplicates`` keys its state
    store by the hash column, so cross-micro-batch duplicates drop
    without a custom state function.  With ``ts_col`` the watermark
    bounds state to the late-data horizon (the 100 TB shape: state size
    follows the duplicate-arrival window, not corpus cardinality);
    without it, state holds every distinct hash seen — correct, but
    unbounded, so ingest jobs should always pass the event-time column."""
    out = stream.withColumn("__h", F.md5(F.col(text_col).cast("string")))
    if ts_col is not None:
        out = out.withWatermark(ts_col, watermark)
        # duplicates beyond the watermark horizon are admitted again by
        # design (state was evicted) — dropDuplicatesWithinWatermark is
        # the exact contract for that
        return out.dropDuplicatesWithinWatermark(["__h"]).drop("__h")
    return out.dropDuplicates(["__h"]).drop("__h")


def streaming_window_join(
    master: DataFrame,
    slave: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    lo_seconds: float,
    hi_seconds: float,
) -> DataFrame:
    """Stream-stream WINDOW JOIN: each master row aggregates the
    key-matching slave values inside ``[ts+lo, ts+hi]`` — the streaming
    twin of ``operators/window_join.window_join`` (sum/count form).

    A positive ``hi`` means a master row cannot emit until the slave
    stream has provably passed its horizon, so state buffers BOTH pending
    masters and a slave tail per key; a master emits in the first batch
    where some slave timestamp reaches ``ts + hi``.  Arrival contracts
    (both load-bearing): *slave* event time is non-decreasing across
    micro-batches per key (same as ``streaming_asof_join``); a *master*
    arriving in a later batch must satisfy ``ts >= max_slave_ts - hi`` —
    older masters would reach back past the trimmed slave tail (with
    pending masters the tail is kept back to the earliest pending
    horizon, which is strictly more permissive).  In-batch order on both
    sides is genuinely free: the whole micro-batch is buffered before any
    emit/trim decision, so a group spanning multiple Arrow chunks cannot
    lose slave rows to a chunk-local trim.  Masters at the stream tail
    stay pending — exactly the semantics a live look-ahead join must
    have.  The slave buffer trims to the earliest pending horizon, so
    state is bounded by window width x arrival rate, never history.  One
    stateful shuffle on the join keys, like the batch bucketed
    lowering."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = list(keys)
    lo_us = int(lo_seconds * 1_000_000)
    hi_us = int(hi_seconds * 1_000_000)
    tagged_m = master.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("double").alias("__v"),
    )
    tagged_s = slave.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(value_col).cast("double").alias("__v"),
    )
    unioned = tagged_m.unionByName(tagged_s)

    key_fields = ", ".join(
        f"{k} {master.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, {ts_col} {master.schema[ts_col].dataType.simpleString()}, "
        "w_sum double, w_count bigint"
    )
    state_schema = (
        "m_ts array<long>, s_ts array<long>, s_v array<double>, max_s long"
    )
    out_names = keys + [ts_col, "w_sum", "w_count"]

    def advance(key, pdf_iter, state):
        if state.exists:
            m_ts, s_ts, s_v, max_s = state.get
            m_ts, s_ts, s_v = list(m_ts), list(s_ts), list(s_v)
        else:
            m_ts, s_ts, s_v, max_s = [], [], [], -(1 << 62)
        # Buffer EVERY chunk before emitting: one group's micro-batch can
        # span multiple Arrow chunks (>~10k rows), and a per-chunk
        # emit+trim would let chunk-1 slaves advance max_s and trim the
        # tail before a chunk-2 master (earlier ts) registers its
        # horizon — silently undercounting its w_sum/w_count.
        for pdf in pdf_iter:
            ts_us = pdf["__ts"].astype("int64") // 1000  # ns -> us
            is_s = pdf["__side"].to_numpy() == 0
            m_ts.extend(ts_us[~is_s].tolist())
            s_ts.extend(ts_us[is_s].tolist())
            s_v.extend(pdf["__v"][is_s].astype(float).tolist())
            if is_s.any():
                max_s = max(max_s, int(ts_us[is_s].max()))
        emit_mask = [t + hi_us <= max_s for t in m_ts]
        ready = [t for t, e in zip(m_ts, emit_mask) if e]
        m_ts = [t for t, e in zip(m_ts, emit_mask) if not e]
        if ready:
            rm = np.array(ready, dtype=np.int64)[:, None]
            st = np.array(s_ts, dtype=np.int64)[None, :]
            sv = np.array(s_v, dtype=np.float64)[None, :]
            inw = (st >= rm + lo_us) & (st <= rm + hi_us)
            w_sum = np.where(inw, sv, 0.0).sum(axis=1)
            w_cnt = inw.sum(axis=1).astype(np.int64)
            yield pd.DataFrame({
                **{k: v for k, v in zip(keys, key)},
                ts_col: pd.to_datetime(np.array(ready) * 1000),
                "w_sum": w_sum,
                "w_count": w_cnt,
            })[out_names]
        # trim the slave tail to the earliest pending horizon
        floor_us = (min(m_ts) + lo_us) if m_ts else (max_s - hi_us + lo_us)
        kept = [(t, v) for t, v in zip(s_ts, s_v) if t >= floor_us]
        s_ts, s_v = [t for t, _ in kept], [v for _, v in kept]
        state.update((m_ts, s_ts, s_v, max_s))

    return unioned.groupBy(*keys).applyInPandasWithState(
        advance, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_ohlc(
    stream: DataFrame,
    ts_col: str,
    sym_col: str,
    price_col: str,
    bucket: str = "1 hour",
    watermark: str = "0 seconds",
    tie_col: str | None = None,
) -> DataFrame:
    """Live OHLC candles — the streaming twin of the batch
    ``queries_timeseries.ohlc_1h`` SAMPLE BY shape (QuestDB's flagship
    live-dashboard query over continuously-ingested trades): a tumbling
    ``window(ts, bucket)`` aggregation per symbol with open/close taken
    by min_by/max_by over event time, high/low/count alongside.

    Built-in-first: Spark's windowed streaming aggregation carries the
    per-(symbol, bucket) state and the watermark closes candles — no
    custom state function.  Append mode emits each candle exactly once,
    when the watermark passes ``bucket end + watermark`` (the live
    chart's "candle finalized" event); state is one row per open candle
    per symbol, trimmed by the watermark — bounded regardless of stream
    length.  Open/close tie-break inside a bucket is event-time order;
    a same-ts tie is broken by ``tie_col`` when given (pass the
    event-id column for exact parity with the batch twin's
    ``(ts, event_id)`` order — ADVICE r12), else by the price value
    itself (documented rather than hidden)."""
    w = stream.withWatermark(ts_col, watermark)
    tie = F.col(tie_col) if tie_col is not None else F.col(price_col)
    pri = F.struct(F.col(ts_col), tie)
    return (
        w.groupBy(
            F.col(sym_col), F.window(F.col(ts_col), bucket).alias("__w")
        )
        .agg(
            F.min_by(F.col(price_col), pri).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(F.col(price_col), pri).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        )
        .select(
            sym_col,
            F.col("__w.start").alias("bucket"),
            "open", "high", "low", "close", "n_trades",
        )
    )


def streaming_quality_gate(
    stream: DataFrame,
    weights_micro: Sequence[int],
    threshold_micro: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of the trained NB corpus filter
    (``pipeline/classify``): score every arriving document with the
    broadcast model — log-odds = prior + sum over tokens of the token
    bucket's weight, all in exact micro-unit int64 — and pass only rows
    clearing ``threshold_micro``.  The quality gate a continuous
    training-data ingest runs next to the dedup gate.

    ``weights_micro`` is ``classify.nb_weights_micro(model)``: bucket
    weights at 10^6 scale, prior last (so its length fixes n_feats).

    Built-in-first and STATELESS: the whole scorer is a Catalyst
    expression over plan literals (transform -> element_at -> aggregate)
    — no state store, no Python; batch parity is structural because the
    batch route evaluates the identical expression.  At 100 TB scale
    the model rides the plan (1-8 MiB at production n_feats), so every
    executor filters its partitions with zero shuffle."""
    from ..pipeline.classify import bucket_col
    from ..pipeline.text import tokens_col

    n_feats = len(weights_micro) - 1
    wlit = F.array(
        *[F.lit(int(v)).cast("long") for v in weights_micro[:n_feats]]
    )
    score = F.aggregate(
        F.transform(
            tokens_col(F.col(text_col)),
            lambda t: F.element_at(wlit, bucket_col(t, n_feats).cast("int") + 1),
        ),
        F.lit(int(weights_micro[-1])).cast("long"),
        lambda acc, v: acc + v,
    )
    return stream.withColumn("score_micro", score).filter(
        F.col("score_micro") > F.lit(int(threshold_micro))
    )
