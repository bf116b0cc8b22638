#!/usr/bin/env python
"""Streaming micro-bench: throughput + bounded-state evidence for the five
stateful stream-stream twins (ASOF / LT / SPLICE / WINDOW / HORIZON) plus
the EMA recurrence (VERDICT r11 task 4).

The batch family has BENCH_SF2 scale curves; the streaming twins were
plan-asserted (one stateful shuffle each) and batch-equal but
performance-unmeasured.  This harness measures, per twin:

- **rows/sec**: input rows / wall seconds of an availableNow run over
  N_BATCHES file-source micro-batches at fixed key cardinality (the state
  shuffle, the pandas merge kernels, and the sink all included — the
  honest end-to-end number a capacity plan needs);
- **bounded state**: the state store's row count and on-disk size after
  phase 1 vs after phase 2 (same checkpoint, twice the history).  A twin
  whose state grows with INPUT rather than with keys/pending-tail would
  show phase-2 size ~2x phase-1; the family design (O(1) or
  bounded-tail per key) predicts ~flat.
- **kernel rows/sec** (r13, VERDICT r12 task 5): one 1M-row batch at the
  same key cardinality, fresh state — the micro-batch fixed cost is paid
  once instead of 50x, so this is the merge/window kernel throughput a
  capacity plan sizes executors with.

Writes BENCH_STREAM_r12-style JSON (SPARK_GRAFT_STREAM_OUT) and prints it.
Host-drift stamps (cpu_probe, loadavg) match bench.py so cross-round
comparisons can normalize.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import _cpu_probe, _loadavg  # noqa: E402
from questdb_spark.session import get_session  # noqa: E402
from questdb_spark.streaming.stateful import (  # noqa: E402
    streaming_asof_join,
    streaming_dedup_exact,
    streaming_ema,
    streaming_horizon_join,
    streaming_lt_join,
    streaming_ohlc,
    streaming_sessionize,
    streaming_splice_join,
    streaming_window_join,
)

N_KEYS = int(os.environ.get("SPARK_GRAFT_STREAM_KEYS", "200"))
ROWS_PER_KEY_BATCH = int(os.environ.get("SPARK_GRAFT_STREAM_RPKB", "50"))
N_BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "5"))
# kernel-throughput phase (VERDICT r12 task 5): the 20k-row micro-batches
# above are dominated by Structured Streaming's per-batch fixed cost
# (planning, state-store commit, sink) — the honest END-TO-END number, but
# not the kernel rows/sec a capacity plan sizes executors with.  One
# 1M-row batch (2500 rows/key/side at the SAME key cardinality) amortizes
# the fixed cost away and measures the merge/window kernels themselves.
BIG_ROWS_PER_KEY = int(os.environ.get("SPARK_GRAFT_STREAM_RPKB_BIG", "2500"))


def _write_batches(
    spark, src: str, first_batch: int, n_batches: int,
    rows_per_key: int = ROWS_PER_KEY_BATCH,
) -> int:
    """Tagged micro-batch files: per key, ``rows_per_key`` rows per side
    per batch, event time strictly increasing across batches (the family's
    per-key monotone arrival contract).  Master rows sit 500ms after the
    same-index slave row so every asof/lt lookup does real work."""
    total = 0
    for b in range(first_batch, first_batch + n_batches):
        lo = b * rows_per_key
        rows = (
            spark.range(N_KEYS * rows_per_key)
            .select(
                F.concat(F.lit("k"), (F.col("id") % N_KEYS).cast("string")).alias("k"),
                (F.col("id") / N_KEYS).cast("long").alias("i"),
            )
            .select(
                "k",
                F.timestamp_micros(
                    (F.lit(lo) + F.col("i")) * 1_000_000
                ).alias("base_ts"),
                (F.lit(lo) + F.col("i")).cast("double").alias("v"),
            )
        )
        both = rows.select(
            "k", F.col("base_ts").alias("ts"), F.lit(0).alias("is_m"), "v"
        ).unionByName(
            rows.select(
                "k",
                (F.col("base_ts") + F.expr("INTERVAL 500 MILLISECONDS")).alias("ts"),
                F.lit(1).alias("is_m"),
                F.col("v").alias("v"),
            )
        )
        both.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"b{b:03d}"))
        total += 2 * N_KEYS * rows_per_key
    return total


def _run_phase(spark, build_query, src: str, out: str, ckpt: str):
    """availableNow run; returns (wall_s, last stateOperators entry)."""
    stream = spark.readStream.schema(
        "k string, ts timestamp, is_m int, v double"
    ).option("maxFilesPerTrigger", "1").parquet(src + "/*")
    sink = build_query(stream)
    t0 = time.perf_counter()
    q = (
        sink.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    state = None
    for prog in reversed(q.recentProgress):  # dicts in PySpark
        ops = prog.get("stateOperators") or []
        if ops:
            op = ops[0]
            cm = op.get("customMetrics") or {}
            state = {
                "state_rows": op.get("numRowsTotal"),
                "state_bytes": op.get("memoryUsedBytes")
                or cm.get("stateOnCurrentVersionSizeBytes"),
            }
            break
    return wall, state


TWINS = {
    "ema": lambda s: streaming_ema(
        s.filter("is_m = 1").select("k", "ts", "v"), "ts", "v", 0.3, ["k"]
    ),
    "asof_join": lambda s: streaming_asof_join(
        s.filter("is_m = 1").select("k", "ts", F.col("v").alias("mval")),
        s.filter("is_m = 0").select("k", "ts", F.col("v").alias("quote")),
        "ts", ["k"], ["quote"],
    ),
    "lt_join": lambda s: streaming_lt_join(
        s.filter("is_m = 1").select("k", "ts", F.col("v").alias("mval")),
        s.filter("is_m = 0").select("k", "ts", F.col("v").alias("quote")),
        "ts", ["k"], ["quote"],
    ),
    "splice_join": lambda s: streaming_splice_join(
        s.filter("is_m = 1").select("k", "ts", F.col("v").alias("mval")),
        s.filter("is_m = 0").select("k", "ts", F.col("v").alias("quote")),
        "ts", ["k"],
    ),
    "window_join": lambda s: streaming_window_join(
        s.filter("is_m = 1").select("k", "ts"),
        s.filter("is_m = 0").select("k", "ts", "v"),
        "ts", ["k"], "v", -5, 5,
    ),
    "horizon_join": lambda s: streaming_horizon_join(
        s.filter("is_m = 1").select("k", "ts"),
        s.filter("is_m = 0").select("k", "ts", "v"),
        "ts", ["k"], "v", [1.0, 5.0],
    ),
    # the two built-in-backed stateful ops, for the complete streaming
    # perf story: native session windows (state = open sessions) and the
    # dropDuplicates ingest gate (state = distinct hashes in the
    # watermark horizon; v % 25 forces ~96% duplicates so the gate does
    # real dropping and phase 2 re-sees only phase-1 hashes)
    # 10s-on / 10s-off input (v % 20 < 10) so sessions actually CLOSE —
    # the unfiltered 1s cadence is one never-ending session per key
    # (output 0, state still bounded, but a meaningless throughput row)
    "sessionize": lambda s: streaming_sessionize(
        s.filter("is_m = 1 AND v % 20 < 10").select("k", "ts"), "ts", "k", 10
    ),
    "dedup_gate": lambda s: streaming_dedup_exact(
        s.filter("is_m = 0").select(
            "k", "ts",
            F.concat(F.col("k"), F.lit(":"), (F.col("v") % 25).cast("string"))
            .alias("text"),
        ),
        text_col="text", ts_col="ts",
    ),
    # live candles: built-in windowed agg state (one open candle/key);
    # 1-minute buckets so each phase closes several candles per key
    "ohlc": lambda s: streaming_ohlc(
        s.filter("is_m = 0").select("k", "ts", "v"),
        "ts", "k", "v", bucket="1 minute",
    ),
}


def main() -> None:
    spark = get_session("questdb-spark-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_start = _loadavg()
    probe = _cpu_probe()

    results: dict[str, dict] = {}
    out_path = os.environ.get(
        "SPARK_GRAFT_STREAM_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_STREAM_r13.json"),
    )
    only = os.environ.get("SPARK_GRAFT_STREAM_ONLY")
    todo = TWINS
    if only:
        want = {w.strip() for w in only.split(",") if w.strip()}
        todo = {k: v for k, v in TWINS.items() if k in want}
        if os.path.exists(out_path):  # subset rerun: merge over previous
            with open(out_path) as fh:
                prev = json.load(fh).get("twins", {})
            # drop rows for names no longer in TWINS (ADVICE-r12 fix)
            results = {k: v for k, v in prev.items() if k in TWINS}
    for name, build in todo.items():
        tmp = tempfile.mkdtemp(prefix=f"sbench_{name}_")
        src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ckpt"))
        os.makedirs(src)
        try:
            in1 = _write_batches(spark, src, 0, N_BATCHES)
            wall1, state1 = _run_phase(spark, build, src, out, ckpt)
            out1 = spark.read.parquet(out).count()
            in2 = _write_batches(spark, src, N_BATCHES, N_BATCHES)
            wall2, state2 = _run_phase(spark, build, src, out, ckpt)
            out2 = spark.read.parquet(out).count()
            # kernel-throughput phase: ONE big batch, fresh state — the
            # per-batch fixed cost is paid once over 1M rows instead of
            # once per 20k, so this rows/sec is the kernel number
            bsrc, bout, bckpt = (os.path.join(tmp, d) for d in ("bsrc", "bout", "bckpt"))
            os.makedirs(bsrc)
            in3 = _write_batches(
                spark, bsrc, 0, 1, rows_per_key=BIG_ROWS_PER_KEY
            )
            wall3, _ = _run_phase(spark, build, bsrc, bout, bckpt)
            results[name] = {
                "input_rows_phase1": in1,
                "output_rows_phase1": out1,
                "wall_s_phase1": round(wall1, 2),
                "rows_per_sec_phase1": round(in1 / wall1),
                "input_rows_phase2": in2,
                "output_rows_phase2": out2 - out1,
                "wall_s_phase2": round(wall2, 2),
                "rows_per_sec_phase2": round(in2 / wall2),
                "state_phase1": state1,
                "state_phase2": state2,
                "input_rows_bigbatch": in3,
                "wall_s_bigbatch": round(wall3, 2),
                "rows_per_sec_bigbatch": round(in3 / wall3),
                "n_keys": N_KEYS,
                "n_batches_per_phase": N_BATCHES,
            }
            print(f"{name}: {results[name]}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"{name} FAILED: {exc}", file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    artifact = {
        "n_keys": N_KEYS,
        "rows_per_key_batch": ROWS_PER_KEY_BATCH,
        "n_batches_per_phase": N_BATCHES,
        "big_rows_per_key": BIG_ROWS_PER_KEY,
        "loadavg_start": load_start,
        "cpu_probe": probe,
        "cpu_probe_end": _cpu_probe(),
        "loadavg_end": _loadavg(),
        "twins": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps(artifact, separators=(",", ":")))


if __name__ == "__main__":
    main()
