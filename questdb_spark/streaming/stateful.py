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
