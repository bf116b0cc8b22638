"""Operation-sequence fuzz over the mat-view lifecycle (r10) — the same
strategy as test_fuzz_timetable, pointed at CREATE/REFRESH/ALTER
MATERIALIZED VIEW: random base inserts (including O3 rows below the
incremental high-water mark), manual refreshes, SUSPEND/RESUME WAL, and
SET TTL, cross-checked against a pure-Python shadow of the CONTRACT:

    after a refresh, the view equals SAMPLE BY 1h counts over the base
    rows AS OF that refresh, minus TTL eviction against the newest bucket
    date; between refreshes (and while suspended) it serves that stored
    snapshot unchanged.

The contract is path-independent — incremental refresh (with the O3
escalation guard) must land on exactly the same state as a full
recompute — so the shadow never models the incremental machinery, which
is the point: any divergence is an engine bug, not a shadow bug.

Tunables: SPARK_GRAFT_FUZZ_SEEDS (default 3), SPARK_GRAFT_FUZZ_OPS
(default 40 — each op can cost a refresh write).
"""

from __future__ import annotations

import os
import random
from collections import Counter
from datetime import datetime, timedelta

import pytest

from questdb_spark.sqlfront.engine import QdbEngine

SEEDS = int(os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "3"))
OPS = int(os.environ.get("SPARK_GRAFT_FUZZ_OPS", "40"))

BASE = datetime(2024, 1, 1)
DAYS = 5  # ts domain: 5 daily partitions / 120 hourly buckets


def _expected_view(applied: list[datetime], ttl_hours: int) -> Counter:
    """The contract: hourly counts over the applied base snapshot, then
    TTL eviction by date partition against the newest bucket date (the
    newest partition is never evicted)."""
    buckets = Counter(ts.replace(minute=0, second=0, microsecond=0) for ts in applied)
    if not buckets or ttl_hours <= 0:
        return buckets
    dates = sorted({b.date() for b in buckets})
    newest = dates[-1]
    boundary = datetime.combine(newest, datetime.min.time()) - timedelta(
        hours=ttl_hours
    )
    keep = {
        d
        for d in dates
        if d == newest
        or datetime.combine(d, datetime.min.time()) + timedelta(days=1) > boundary
    }
    return Counter({b: n for b, n in buckets.items() if b.date() in keep})


@pytest.mark.parametrize("seed", range(SEEDS))
def test_matview_lifecycle_fuzz(spark, tmp_path, seed):
    rng = random.Random(20_241_000 + seed)
    eng = QdbEngine(spark, warehouse=str(tmp_path / f"wh{seed}"))
    eng.sql("CREATE TABLE fb (v DOUBLE, ts TIMESTAMP) TIMESTAMP(ts) PARTITION BY DAY")

    def rand_ts() -> datetime:
        return BASE + timedelta(
            days=rng.randrange(DAYS),
            hours=rng.randrange(24),
            minutes=rng.randrange(60),
        )

    # seed rows so creation materializes a non-empty view
    first = [rand_ts() for _ in range(5)]
    eng.sql(
        "INSERT INTO fb VALUES "
        + ",".join(f"(1.0,'{t.isoformat()}')" for t in first)
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW fmv WITH BASE fb AS ("
        "SELECT ts, count(*) AS n FROM fb SAMPLE BY 1h)"
    )

    base_rows = list(first)
    applied = list(first)  # snapshot at last refresh
    suspended = False
    ttl_hours = 0

    def check() -> None:
        got = Counter()
        for r in eng.sql("SELECT ts, n FROM fmv").collect():
            got[r.ts] += r.n
        want = _expected_view(applied, ttl_hours)
        assert got == want, (
            f"seed={seed} divergence: extra={dict(got - want)} "
            f"missing={dict(want - got)}"
        )

    for step in range(OPS):
        op = rng.choices(
            ["insert", "insert_o3", "refresh_incr", "refresh_full",
             "suspend", "resume", "set_ttl", "read"],
            weights=[4, 2, 3, 1, 1, 2, 1, 3],
        )[0]
        if op in ("insert", "insert_o3"):
            # insert_o3 biases below the current applied high-water mark
            # to exercise the escalation guard; plain insert is uniform
            ts = rand_ts()
            if op == "insert_o3" and applied:
                hwm = max(applied)
                for _ in range(4):
                    if ts < hwm:
                        break
                    ts = rand_ts()
            eng.sql(f"INSERT INTO fb VALUES (1.0,'{ts.isoformat()}')")
            base_rows.append(ts)
        elif op == "refresh_incr":
            eng.sql("REFRESH MATERIALIZED VIEW fmv INCREMENTAL")
            if not suspended:
                applied = list(base_rows)
        elif op == "refresh_full":
            eng.sql("REFRESH MATERIALIZED VIEW fmv FULL")
            if not suspended:
                applied = list(base_rows)
        elif op == "suspend":
            eng.sql("ALTER MATERIALIZED VIEW fmv SUSPEND WAL")
            suspended = True
        elif op == "resume":
            eng.sql("ALTER MATERIALIZED VIEW fmv RESUME WAL")
            suspended = False
            applied = list(base_rows)  # resume applies the backlog
        elif op == "set_ttl":
            # TTL only ever SHRINKS in this fuzz: engine eviction is
            # destructive (an evicted partition only resurrects on a full
            # recompute), so a monotonically tighter TTL keeps the
            # stateless shadow formula exact — everything the engine ever
            # evicted is also formula-evicted under the current boundary
            choices = [h for h in (240, 96, 48, 24) if ttl_hours == 0 or h <= ttl_hours]
            if not choices:
                continue
            ttl_hours = rng.choice(choices)
            eng.sql(f"ALTER MATERIALIZED VIEW fmv SET TTL {ttl_hours} HOURS")
        else:
            check()
    check()
