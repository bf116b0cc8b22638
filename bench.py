#!/usr/bin/env python
"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall seconds.

Each query is executed twice: a warm-up pass at the start amortizes JVM/
codegen warm-up out of the measured number (QuestDB's JMH benchmarks do the
same; BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from questdb_spark.registry import REGISTRY  # noqa: E402
from questdb_spark.session import get_session  # noqa: E402


def _loadavg() -> list[float]:
    """1/5/15-minute load averages — emitted into the artifacts so an
    environmentally-inflated run is self-identifying (r8's driver number
    was 20% high purely from concurrent box load; the ambiguity cost an
    adjudication round)."""
    try:
        return [round(v, 2) for v in os.getloadavg()]
    except OSError:
        return []


def _cpu_probe() -> dict:
    """Single-thread CPU speed probe + steal sample: loadavg alone cannot
    distinguish 'busy box' from 'slow box' (r11 finding: identical code
    measured ~2x over its r10 medians at loadavg 1.3 — the host itself
    was slower, which loadavg_start cannot show).  A fixed 2M-iteration
    python loop gives a wall-ms number comparable across rounds, and one
    second of /proc/stat delta yields the hypervisor steal share."""
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i
    probe_ms = round((time.perf_counter() - t0) * 1000, 1)
    steal_pct = None
    try:
        def _stat():
            with open("/proc/stat") as fh:
                return list(map(int, fh.readline().split()[1:]))
        a = _stat()
        time.sleep(1)
        b = _stat()
        d = [y - x for x, y in zip(a, b)]
        steal_pct = round(d[7] / max(sum(d), 1) * 100, 1) if len(d) > 7 else None
    except OSError:
        pass
    return {"cpu_probe_ms": probe_ms, "steal_pct": steal_pct}


def _wait_quiet_box(limit: float = 2.5, max_wait_s: float = 300.0) -> None:
    """Quiet-box gate (VERDICT r10 task 8): BENCH_r10 started at loadavg
    4.19 and read ~8% slow vs the builder's clean run.  Wait (bounded)
    for the 1-minute load to drop below `limit` before timing anything;
    a box that never quiets still runs — loadavg_start in the artifact
    keeps the run self-identifying either way.  Default tightened 3.0 ->
    2.5 in r12: BENCH_r11 started at exactly 3.0, the old gate boundary
    (VERDICT r11 task 8)."""
    limit = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", limit))
    if limit <= 0:
        return
    deadline = time.monotonic() + max_wait_s
    while time.monotonic() < deadline:
        try:
            if os.getloadavg()[0] < limit:
                return
        except OSError:
            return
        print(
            f"bench: loadavg {os.getloadavg()[0]:.2f} >= {limit} — waiting "
            "for a quiet box",
            file=sys.stderr,
        )
        time.sleep(10)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _wait_quiet_box()
    load_start = _loadavg()
    cpu_probe = _cpu_probe()
    spark = get_session("questdb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, parquet footers, codegen — plus one pandas-UDF query so
    # the Python worker pool (fork + numpy import per core) is paid here,
    # not inside the first measured Arrow-kernel query, and one live-view
    # query so the dialect engine's catalog/warehouse first-use cost is
    # paid here too (VERDICT r12 task 4: the driver's single-shot r12 run
    # absorbed that warmup into sql_live_view_latest — 7.27s vs a 2.0s
    # clean median)
    warm = [
        *list(REGISTRY.items())[:3],
        ("embedding_topk", REGISTRY["embedding_topk"]),
        ("sql_live_view_latest", REGISTRY["sql_live_view_latest"]),
    ]
    for name, (fn, _) in warm:
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    # touch EVERY Python worker with an Arrow UDF, whatever the core count
    # (VERDICT r13 task 7): the embedding_topk warmup above only forks as
    # many workers as its scan has splits, so a reduced-core run (the
    # driver benches SPARK_GRAFT_CPUS=8 too) still paid worker fork +
    # numpy import inside the first measured wide Arrow query.  One tiny
    # pandas-UDF pass with exactly defaultParallelism tasks pre-forks the
    # whole pool here, outside the timed region.
    try:
        import pandas as _pd
        from pyspark.sql.functions import col, pandas_udf

        @pandas_udf("long")
        def _touch(s: _pd.Series) -> _pd.Series:
            import numpy as _np  # the import cost being amortized

            return _pd.Series(_np.asarray(s, dtype="int64"))

        cores = spark.sparkContext.defaultParallelism
        (
            spark.range(0, cores * 4, 1, cores)
            .select(_touch(col("id")))
            .write.format("noop").mode("overwrite").save()
        )
    except Exception:
        pass

    # per-query isolation: one broken query must never zero the round's perf
    # evidence (round 2 lost ALL timings to a single analysis exception) —
    # record null for failures and always emit the JSON line.
    #
    # Each query runs REPEATS times (default 3) and the reported number is
    # the MEDIAN; r5 showed a broad unattributed 1.18x drift on untouched
    # sub-second queries with single-shot timing, which median-of-3 separates
    # into noise vs plan regression.  Min is kept in the detail artifact.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float | None] = {}
    detail: dict[str, dict] = {}
    errors: list[str] = []
    for name, (fn, _) in REGISTRY.items():
        runs: list[float] = []
        err: str | None = None
        for _rep in range(repeats):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001
                err = f"{type(exc).__name__}: {exc}"
                break
        if runs:
            srt = sorted(runs)
            median = srt[len(srt) // 2] if len(srt) % 2 else (srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2
            timings[name] = round(median, 2)
            detail[name] = {
                "median": round(median, 3),
                "min": round(srt[0], 3),
                "max": round(srt[-1], 3),
                "runs": [round(r, 3) for r in runs],
            }
        else:
            timings[name] = None
            detail[name] = {"error": err}
            errors.append(name)
            print(f"bench: {name} FAILED: {err}", file=sys.stderr)

    # round/tag-stamped detail artifact (VERDICT r8 task 8: the bare
    # BENCH_DETAIL.json name meant every rerun clobbered the previous
    # run's record — driver vs builder vs judge artifacts collided)
    load_end = _loadavg()
    cpu_probe_end = _cpu_probe()  # the host's speed drifts mid-run too
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "")
    default_name = f"BENCH_DETAIL_{tag}.json" if tag else "BENCH_DETAIL.json"
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), default_name),
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(
                {
                    "repeats": repeats,
                    "sf_dir": sf_dir,
                    "loadavg_start": load_start,
                    "cpu_probe": cpu_probe,
                    "cpu_probe_end": cpu_probe_end,
                    "loadavg_end": load_end,
                    "queries": detail,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    except OSError as exc:
        print(f"bench: could not write detail file: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t is not None), 2)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # ONE compact line.  The driver keeps only the TAIL of long output
    # (round-1's capture cut the head, losing the headline fields and the
    # first queries), so emit per-query detail FIRST — slowest first, so a
    # truncated head drops only the fastest queries — and the headline
    # metric/value/sf fields LAST where they always survive.
    slowest_first = dict(
        sorted(timings.items(), key=lambda kv: -(kv[1] if kv[1] is not None else 1e9))
    )
    # BENCH_r03's driver artifact kept only ~1.8 KB of TAIL, so the
    # slowest-first head was the part that got cut (VERDICT r3 task 9).
    # Duplicate the slowest 20 in a compact "top20" object placed at the END
    # of the line (just before the headline fields): whatever truncation the
    # driver applies, the tail — top20 + metric/value — always survives.
    top20 = dict(list(slowest_first.items())[:20])
    line = json.dumps(
        {
            "queries": slowest_first,
            "n_queries": len(timings),
            "n_failed": len(errors),
            "top20": top20,
            "loadavg_start": load_start,
            "loadavg_end": load_end,
            "cpu_probe": cpu_probe,
            "cpu_probe_end": cpu_probe_end,
            "metric": "total_query_seconds",
            "unit": "sec",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "value": total,
        },
        separators=(",", ":"),
    )
    # durability twin of the printed line (VERDICT r13 task 2): BENCH_r12's
    # stdout tail was truncated mid-JSON, which nulled the driver's whole
    # round-over-round comparison.  The same bytes land in a file the next
    # round can always parse; the printed contract is unchanged.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"
            ),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError as exc:
        print(f"bench: could not write BENCH_LAST.json: {exc}", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
