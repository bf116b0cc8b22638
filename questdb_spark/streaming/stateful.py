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
        parts = []
        for pdf in pdf_iter:
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
            parts.append(pdf)
        state.update((ema, last_ts))
        yield from parts

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

    def advance(key, pdf_iter, state):
        carried = list(state.get) if state.exists else [None] * len(payload_cols)
        out_parts = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["__ts", "__side"], kind="mergesort")
            rows = []
            for _, r in pdf.iterrows():
                if r["__side"] == 0:
                    carried = [r[f"__s_{c}"] for c in payload_cols]
                else:
                    rows.append(
                        list(key)
                        + [r["__ts"]]
                        + [r[f"__m_{c}"] for c in mcols if c not in keys and c != ts_col]
                        + list(carried)
                    )
            if rows:
                out_parts.append(pd.DataFrame(rows, columns=[f.split()[0] for f in out_fields]))
        state.update(tuple(carried))
        if out_parts:
            yield from out_parts

    return unioned.groupBy(*keys).applyInPandasWithState(
        advance, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
