"""CREATE/REFRESH/DROP MATERIALIZED VIEW and CREATE LIVE VIEW statements.

Reference: mat views are first-class statements dispatched before query
compilation (``griffin/SqlCompilerImpl.java:3338-3346`` CREATE_MAT_VIEW /
CREATE_LIVE_VIEW arms), defined by a stored SAMPLE BY query over a base
table (``cairo/mv/MatViewDefinition.java:54-84``) and refreshed
incrementally — only the time buckets touched by new base transactions are
recomputed (``cairo/mv/MatViewRefreshJob.java:77``,
``cairo/mv/SampleByIntervalIterator.java``). ``REFRESH MATERIALIZED VIEW
name INCREMENTAL`` is the manual-refresh form
(``MatViewDefinition.REFRESH_TYPE_MANUAL``); LIVE views refresh on read.

Spark-first lowering (batch twin of ``streaming/matview.py``):

- the view body is lowered through the engine's own dialect front-end, so
  everything a SAMPLE BY query supports works in a view;
- storage is date-partitioned parquet under the engine warehouse;
- incremental refresh tracks the base table's high-water mark (max
  designated ts at last refresh — the batch stand-in for WAL txn ranges)
  and recomputes only buckets >= bucket_floor(hwm): the recomputed tail is
  merged with the untouched head rows of the touched date partitions and
  written with dynamic partition overwrite, so refresh I/O is proportional
  to NEW data, not view size — the exact economics of the reference's
  interval iterator. Out-of-order base writes older than the high-water
  mark need ``REFRESH ... FULL`` (the streaming path covers bounded
  lateness via watermarks instead).
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F

from ..operators.sample_by import _UNIT_MICROS, parse_interval

if TYPE_CHECKING:  # pragma: no cover
    from .engine import QdbEngine

_PART = "__mv_part"

_CREATE_RE = re.compile(
    r"^create\s+(materialized|live)\s+view\s+(if\s+not\s+exists\s+)?(\w+)\s*"
    r"(?:with\s+base\s+'?(\w+)'?\s*)?(refresh\b.*?)?as\s*\(",
    re.IGNORECASE | re.DOTALL,
)
_REFRESH_RE = re.compile(
    r"^refresh\s+materialized\s+view\s+(\w+)(?:\s+(full|incremental))?$",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    r"^drop\s+(?:materialized|live)\s+view\s+(?:if\s+exists\s+)?(\w+)$", re.IGNORECASE
)


@dataclass
class MatViewDef:
    name: str
    base: str  # base table name (WITH BASE or the query's FROM table)
    inner_sql: str  # the stored view query text
    base_ts: str  # base table's designated timestamp column
    ts_out: str  # output column carrying the bucket timestamp
    interval: str  # SAMPLE BY interval spec ('1h', '30m', ...); '' non-sampled
    live: bool = False  # LIVE VIEW: incremental refresh on every read
    hwm: datetime | None = None  # base high-water mark at last refresh
    path: str = field(default="")
    # general live views (cairo/lv/): the stored query may be any dialect
    # query, with shape-specific incremental strategies
    shape: str = "sample_by"  # sample_by | latest_on | generic
    frozen_count: int = -1  # base rows below the incremental cutoff
    base_count: int = -1  # total base rows at last refresh
    # refresh scheduling (SqlParser.java:2590-2717, MatViewDefinition
    # REFRESH_TYPE_TIMER/PERIOD): TIMER views refresh when a read arrives
    # at/after next_due (the batch twin of the reference's timer job);
    # PERIOD views bound every refresh at the last COMPLETE period
    refresh_type: str = "immediate"  # immediate | manual | timer
    deferred: bool = False
    timer_every: str = ""  # '1h' interval spec; '' = no timer
    timer_start: datetime | None = None
    timer_tz: str | None = None
    next_due: datetime | None = None
    period_length: str = ""  # '' = no PERIOD clause
    period_tz: str | None = None
    period_delay: str = ""
    # storage schema captured at write time: lets _register skip the
    # parquet footer-inference job on every re-registration
    stored_schema: object = None
    # ALTER MATERIALIZED/LIVE VIEW state (r10 — SqlCompilerImpl.java:2145
    # compileAlterMatView, :2126 compileAlterLiveView):
    wal_suspended: bool = False  # SUSPEND WAL: refreshes park, reads serve stored
    refresh_limit: int = 0  # SET REFRESH LIMIT: hours>0 / months<0 (parse_ttl form)
    ttl_hours_or_months: int = 0  # SET TTL: evict view buckets older than TTL
    symbol_capacities: dict = field(default_factory=dict)  # col -> capacity
    indexed_columns: dict = field(default_factory=dict)  # col -> block size


_EVERY_UNITS = {"m", "h", "d", "w", "y", "M"}  # validateMatViewEveryUnit
_PERIOD_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}  # periodLengthSeconds


def _stride(tok: str, what: str) -> tuple[int, str]:
    m = re.fullmatch(r"(\d+)([a-zA-Z])", tok.strip())
    if not m:
        raise ValueError(f"invalid {what} interval: {tok!r}")
    return int(m.group(1)), m.group(2)


def _parse_refresh(text: str) -> dict:
    """Parse the REFRESH clause of CREATE MATERIALIZED/LIVE VIEW
    (SqlParser.java:2590-2717): IMMEDIATE | MANUAL | INCREMENTAL |
    EVERY <interval> [DEFERRED] [START '<ts>' [TIME ZONE '<tz>']] and the
    optional PERIOD(LENGTH <interval> [TIME ZONE '<tz>'] [DELAY <interval>])
    tail — with the reference's validation surface (unit sets, 24h period
    cap, delay < length, TIMER-only START)."""
    out = {
        "refresh_type": "immediate",
        "deferred": False,
        "timer_every": "",
        "timer_start": None,
        "timer_tz": None,
        "period_length": "",
        "period_tz": None,
        "period_delay": "",
    }
    if not text:
        return out
    toks = re.findall(r"'[^']*'|\(|\)|[^\s()]+", text.strip())
    i = 1  # skip REFRESH
    n = len(toks)

    def peek() -> str:
        return toks[i].lower() if i < n else ""

    if peek() in ("immediate", "incremental"):
        i += 1
    elif peek() == "manual":
        out["refresh_type"] = "manual"
        i += 1
    elif peek() == "every":
        i += 1
        if i >= n:
            raise ValueError("interval expected")
        mult, unit = _stride(toks[i], "EVERY")
        if unit not in _EVERY_UNITS:
            raise ValueError(
                f"unsupported interval unit: {unit}, supported units are "
                "'m', 'h', 'd', 'w', 'y', 'M'"
            )
        out["refresh_type"] = "timer"
        out["timer_every"] = f"{mult}{unit}"
        i += 1
    if peek() == "deferred":
        out["deferred"] = True
        i += 1
    if peek() == "start":
        # START is TIMER-only (the reference's "'as' expected" shape)
        if out["refresh_type"] != "timer":
            raise ValueError("'as' expected")
        i += 1
        lit = toks[i] if i < n else ""
        if not (lit.startswith("'") and lit.endswith("'")):
            raise ValueError("invalid START timestamp value")
        try:
            out["timer_start"] = datetime.fromisoformat(
                lit.strip("'").replace("T", " ").rstrip("Zz")
            ).replace(tzinfo=timezone.utc)
        except ValueError:
            raise ValueError("invalid START timestamp value") from None
        i += 1
        if peek() == "time":
            i += 1
            if peek() != "zone":
                raise ValueError("'zone' expected")
            i += 1
            tz = toks[i] if i < n else ""
            out["timer_tz"] = tz.strip("'")
            i += 1
    if peek() == "period":
        i += 1
        if peek() != "(":
            raise ValueError("'(' expected")
        i += 1
        if peek() == "length":
            i += 1
            mult, unit = _stride(toks[i] if i < n else "", "LENGTH")
            if unit not in _PERIOD_UNITS:
                raise ValueError(
                    f"unsupported length unit: {mult}{unit}, supported "
                    "units are 's', 'm', 'h', 'd'"
                )
            if mult * _PERIOD_UNITS[unit] > 86400:
                raise ValueError(
                    f"maximum supported length interval is 24 hours: {mult}{unit}"
                )
            out["period_length"] = f"{mult}{unit}"
            i += 1
            if peek() == "time":
                i += 1
                if peek() != "zone":
                    raise ValueError("'zone' expected")
                i += 1
                nxt = toks[i] if i < n else ")"
                if nxt == ")" or nxt.lower() == "delay":
                    raise ValueError("TIME ZONE name expected")
                out["period_tz"] = nxt.strip("'")
                i += 1
            if peek() == "delay":
                i += 1
                dmult, dunit = _stride(toks[i] if i < n else "", "DELAY")
                if dunit not in _PERIOD_UNITS:
                    raise ValueError(
                        f"unsupported length unit: {dmult}{dunit}, supported "
                        "units are 's', 'm', 'h', 'd'"
                    )
                lm, lu = _stride(out["period_length"], "LENGTH")
                if dmult * _PERIOD_UNITS[dunit] >= lm * _PERIOD_UNITS[lu]:
                    raise ValueError(
                        "delay cannot be equal to or greater than length"
                    )
                out["period_delay"] = f"{dmult}{dunit}"
                i += 1
        elif peek() == "sample":
            # PERIOD(SAMPLE BY INTERVAL): length = the view's SAMPLE BY
            i += 3  # sample, by, interval
            out["period_length"] = "sample"
        else:
            raise ValueError("'length' or 'sample' expected")
        if peek() != ")":
            raise ValueError("')' expected")
        i += 1
    if i < n:
        # trailing tokens the grammar doesn't place (e.g. DEFERRED after
        # START — the reference orders DEFERRED before START/PERIOD)
        raise ValueError("'as' expected")
    return out


def is_matview_stmt(kind: str, s: str) -> bool:
    low = re.sub(r"\s+", " ", s.strip().lower())
    return (
        (kind == "create" and bool(re.match(r"create (materialized|live) view\b", low)))
        or kind == "refresh"
        or (kind == "alter" and bool(re.match(r"alter (materialized|live) view\b", low)))
        or (kind == "drop" and bool(re.match(r"drop (materialized|live) view\b", low)))
    )


def execute(eng: QdbEngine, kind: str, s: str) -> DataFrame:
    if kind == "create":
        return _create(eng, s)
    if kind == "refresh":
        return _refresh_stmt(eng, s)
    if kind == "alter":
        return _alter(eng, s)
    return _drop(eng, s)


def _status(eng: QdbEngine, op: str, name: str, detail: str = "") -> DataFrame:
    from .ddl import _sql_status_row

    return _sql_status_row(eng.spark, ["op", "view", "detail"], [op, name, detail])


def _create(eng: QdbEngine, s: str) -> DataFrame:
    from .ddl import _balanced_group
    from .parser import parse

    m = _CREATE_RE.match(s)
    if not m:
        raise ValueError(f"cannot parse CREATE VIEW: {s!r}")
    live = m.group(1).lower() == "live"
    if_not_exists, name, with_base = bool(m.group(2)), m.group(3), m.group(4)
    refresh = _parse_refresh(m.group(5) or "")
    if name in eng.matviews:
        if if_not_exists:
            return _status(eng, "create", name, "exists")
        raise ValueError(f"view exists: {name}")
    inner, _rest = _balanced_group(s[m.end() - 1 :])  # trailing PARTITION BY ignored:
    # storage is always date-partitioned parquet (PartitionBy is a native
    # storage detail the parquet layout subsumes).  IN VOLUME on a mat
    # view (SqlCompilerImpl.java:4589) relocates the view's storage like
    # CREATE TABLE's form does, with the same unknown-alias error.
    volume = None
    vm = re.search(r"\bin\s+volume\s+('[^']*'|\w+)", _rest, re.IGNORECASE)
    if vm:
        volume = vm.group(1).strip("'")
        if volume not in eng.volumes:
            raise ValueError(f"volume alias is not allowed [alias={volume}]")
    q = parse(eng._rewrite_intervals(inner))
    base = with_base or q.table
    base_ts = eng.designated_ts.get(base, "ts")
    # output column holding the bucket: the select item that is the bare
    # designated timestamp (the engine's SAMPLE BY lowering buckets it)
    ts_out = next(
        (i.alias or i.expr.strip() for i in q.select_items
         if (i.alias or i.expr.strip()) and i.expr.strip() == base_ts),
        base_ts,
    )
    # general live views (cairo/lv/ — arbitrary checkpointed queries):
    # SAMPLE BY gets bucket-window incremental refresh, LATEST ON a
    # per-key state merge, anything else change-gated recompute
    if q.sample_by is not None:
        shape, interval = "sample_by", q.sample_by.interval
    elif q.latest_on is not None:
        shape, interval = "latest_on", ""
    else:
        if not live:
            raise ValueError(
                "materialized views must be SAMPLE BY queries "
                "(MatViewDefinition: matViewSql is a sampled query); "
                "use CREATE LIVE VIEW for arbitrary queries (cairo/lv/)"
            )
        shape, interval = "generic", ""
    d = MatViewDef(
        name=name, base=base, inner_sql=inner, base_ts=base_ts, ts_out=ts_out,
        interval=interval, live=live, shape=shape,
        path=os.path.join(
            eng.volumes[volume] if volume else eng.warehouse, f"__mv_{name}"
        ),
        **refresh,
    )
    if d.period_length == "sample":
        # PERIOD(SAMPLE BY INTERVAL): length = the view's own SAMPLE BY
        d.period_length = d.interval
    eng.matviews[name] = d
    if _restore_state(eng, d):
        return _status(eng, "create", name, "restored from checkpoint")
    if d.deferred:
        # DEFERRED: no refresh at creation — register the empty schema;
        # the first due read / manual REFRESH populates
        _swap_write(d, _compute(eng, d, None).limit(0))
        _save_state(d)
        _register(eng, d)
    else:
        _refresh(eng, d, full=True)
    if d.refresh_type == "timer":
        d.next_due = _next_tick(d, _now())
        _save_state(d)
    return _status(eng, "create", name, "live" if live else "materialized")


def _refresh_stmt(eng: QdbEngine, s: str) -> DataFrame:
    m = _REFRESH_RE.match(re.sub(r"\s+", " ", s.strip()))
    if not m:
        raise ValueError(f"cannot parse REFRESH: {s!r}")
    name, mode = m.group(1), (m.group(2) or "incremental").lower()
    d = eng.matviews.get(name)
    if d is None:
        raise ValueError(f"no such materialized view: {name}")
    if d.wal_suspended:
        # suspended WAL parks the refresh txn (same economics as the
        # table-level queue): the view keeps serving its stored state
        # until ALTER ... RESUME WAL applies the backlog
        return _status(eng, f"refresh_{mode}", name, "wal suspended; refresh parked")
    n = _refresh(eng, d, full=mode == "full")
    return _status(eng, f"refresh_{mode}", name, f"{n} buckets-window rows")


def _drop(eng: QdbEngine, s: str) -> DataFrame:
    m = _DROP_RE.match(s)
    if not m:
        raise ValueError(f"cannot parse DROP VIEW: {s!r}")
    name = m.group(1)
    d = eng.matviews.pop(name, None)
    if d is None:
        if re.search(r"if\s+exists", s, re.IGNORECASE):
            return _status(eng, "drop", name, "absent")
        raise ValueError(f"no such materialized view: {name}")
    shutil.rmtree(d.path, ignore_errors=True)
    eng.tables.pop(name, None)
    eng.spark.catalog.dropTempView(name)
    return _status(eng, "drop", name)


_ALTER_VIEW_RE = re.compile(
    r"^alter\s+(materialized|live)\s+view\s+(\w+)\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _alter(eng: QdbEngine, s: str) -> DataFrame:
    """ALTER MATERIALIZED VIEW (SqlCompilerImpl.java:2145
    compileAlterMatView) and ALTER LIVE VIEW (:2126 compileAlterLiveView).

    Mat-view forms: SET REFRESH [IMMEDIATE|MANUAL|EVERY <i> [START ..
    [TIME ZONE ..]]] [PERIOD (..)], SET REFRESH LIMIT <n><u>, SET TTL
    <n><u>, ALTER COLUMN <c> SYMBOL CAPACITY <n> | ADD INDEX | DROP
    INDEX, SUSPEND WAL [WITH code, 'msg'], RESUME WAL [FROM TXN n],
    REBASE WAL.  Live views accept only the WAL-control verbs (the
    reference rejects structural ALTERs: a live view's schema is a
    function of its SELECT).

    Spark lowering: scheduling/TTL/limit mutate the MatViewDef and are
    persisted to the state checkpoint; SUSPEND parks refreshes (reads
    serve the stored prefix) and RESUME applies the backlog with one
    catch-up refresh; symbol capacity / index are storage metadata
    recorded for SHOW-parity (parquet has no symbol index — validation
    surface matches the reference's error shapes)."""
    m = _ALTER_VIEW_RE.match(re.sub(r"\s+", " ", s.strip()))
    if not m:
        raise ValueError(f"cannot parse ALTER VIEW: {s!r}")
    kind_word, name, rest = m.group(1).lower(), m.group(2), m.group(3).strip()
    d = eng.matviews.get(name)
    if d is None:
        raise ValueError(
            f"materialized view does not exist: {name}"
            if kind_word == "materialized"
            else f"live view does not exist: {name}"
        )
    if kind_word == "materialized" and d.live:
        raise ValueError("materialized view name expected")
    if kind_word == "live" and not d.live:
        raise ValueError("live view name expected")
    low = rest.lower()

    # WAL-control verbs (shared by both view kinds)
    if low.startswith("suspend wal"):
        if not re.fullmatch(
            r"suspend\s+wal(\s+with\s+\S+\s*,\s*'[^']*')?", low
        ):
            raise ValueError(f"cannot parse SUSPEND WAL: {rest!r}")
        d.wal_suspended = True
        _save_state(d)
        return _status(eng, "alter", name, "wal suspended")
    if low.startswith("resume wal"):
        if not re.fullmatch(
            r"resume\s+wal(?:\s+from\s+(?:txn|transaction)\s+\d+)?", low
        ):
            raise ValueError(f"cannot parse RESUME WAL: {rest!r}")
        d.wal_suspended = False
        # apply the parked backlog: one catch-up refresh brings the view
        # current (the batch analog of replaying queued WAL txns)
        n = _refresh(eng, d, full=False)
        _save_state(d)
        return _status(eng, "alter", name, f"wal resumed; applied {n}")
    if low.startswith("rebase wal"):
        rm = re.fullmatch(r"rebase\s+wal(?:\s+into\s+('[^']*'|\S+))?", low)
        if not rm:
            raise ValueError(f"cannot parse REBASE WAL: {rest!r}")
        tgt = (rm.group(1) or "").strip("'")
        if tgt and ("/" in tgt or "\\" in tgt or ".." in tgt):
            raise ValueError(f"invalid rebase target directory [dir={tgt}]")
        # rebase mints a fresh WAL lineage past a poison txn: the batch
        # analog clears suspension and re-adopts the stored state as the
        # new base point (next refresh recomputes bookkeeping from it)
        d.wal_suspended = False
        d.frozen_count = -1
        _save_state(d)
        return _status(eng, "alter", name, "wal rebased")

    if kind_word == "live":
        raise ValueError("'resume' or 'suspend' expected")

    # --- mat-view-only structural/scheduling forms ---
    if low.startswith("set ttl"):
        tm = re.fullmatch(r"set\s+ttl\s+(\d+)\s*(\w+)", low)
        if not tm:
            raise ValueError(f"cannot parse SET TTL: {rest!r}")
        from .ddl import parse_ttl

        d.ttl_hours_or_months = parse_ttl(int(tm.group(1)), tm.group(2))
        _enforce_view_ttl(eng, d)
        _save_state(d)
        return _status(eng, "alter", name, f"ttl {tm.group(1)} {tm.group(2)}")

    if low.startswith("set refresh limit"):
        lm = re.fullmatch(r"set\s+refresh\s+limit\s+(\d+)\s*(\w+)", low)
        if not lm:
            raise ValueError(f"cannot parse SET REFRESH LIMIT: {rest!r}")
        from .ddl import parse_ttl

        d.refresh_limit = parse_ttl(int(lm.group(1)), lm.group(2))
        _save_state(d)
        return _status(
            eng, "alter", name, f"refresh limit {lm.group(1)} {lm.group(2)}"
        )

    if low.startswith("set refresh"):
        clause = rest[len("set "):]
        parsed = _parse_refresh(clause)
        if parsed["deferred"]:
            # DEFERRED is a CREATE-only token (the reference's SET REFRESH
            # grammar throws unexpectedToken on it)
            raise ValueError("unexpected token [token=deferred]")
        d.refresh_type = parsed["refresh_type"]
        d.timer_every = parsed["timer_every"]
        d.timer_start = parsed["timer_start"]
        d.timer_tz = parsed["timer_tz"]
        d.period_length = parsed["period_length"]
        d.period_tz = parsed["period_tz"]
        d.period_delay = parsed["period_delay"]
        if d.period_length == "sample":
            d.period_length = d.interval
        if d.refresh_type == "timer":
            # reference: timer start defaults to NOW when START is absent
            if d.timer_start is None:
                d.timer_start = _now()
            d.next_due = _next_tick(d, _now())
        else:
            d.next_due = None
        _save_state(d)
        return _status(eng, "alter", name, f"refresh {d.refresh_type}")

    if low.startswith("set "):
        raise ValueError("'ttl' or 'refresh' expected")

    if low.startswith("alter column"):
        cm = re.fullmatch(
            r"alter\s+column\s+(\w+)\s+"
            r"(symbol\s+capacity\s+(\d+)|add\s+index(?:\s+capacity\s+(\d+))?"
            r"|drop\s+index)",
            low,
        )
        if not cm:
            raise ValueError(
                "'symbol capacity', 'add index' or 'drop index' expected"
            )
        col, verb = cm.group(1), cm.group(2)
        view_df = eng.tables.get(name)
        cols = dict(view_df.dtypes) if view_df is not None else {}
        if col not in cols:
            raise ValueError(
                f"column '{col}' does not exist in materialized view '{name}'"
            )
        if verb.startswith("symbol"):
            if cols[col] != "string":
                raise ValueError(
                    f"column '{col}' is of type '{cols[col]}'. "
                    "SYMBOL CAPACITY supports column type 'SYMBOL' only."
                )
            d.symbol_capacities[col] = int(cm.group(3))
            _save_state(d)
            return _status(
                eng, "alter", name, f"symbol capacity {col} {cm.group(3)}"
            )
        if verb.startswith("add"):
            if col in d.indexed_columns:
                raise ValueError(f"column '{col}' already indexed")
            if cols[col] != "string":
                raise ValueError(
                    f"column '{col}' is of type '{cols[col]}'. "
                    "Index supports column type 'SYMBOL' only."
                )
            d.indexed_columns[col] = int(cm.group(4) or 0)
            _save_state(d)
            return _status(eng, "alter", name, f"add index {col}")
        if col not in d.indexed_columns:
            raise ValueError(f"column '{col}' is not indexed")
        d.indexed_columns.pop(col)
        _save_state(d)
        return _status(eng, "alter", name, f"drop index {col}")

    raise ValueError(
        "'alter', 'set', 'resume', 'suspend' or 'rebase' expected"
    )


def _enforce_view_ttl(eng: QdbEngine, d: MatViewDef) -> None:
    """Evict view date-partitions older than TTL from the newest bucket
    (TableWriter.enforceTtl economics on the view's own storage: directory
    removals keyed off partition names, no data rewrite; the newest
    partition is never evicted)."""
    from datetime import timedelta

    ttl = d.ttl_hours_or_months
    if ttl == 0 or not os.path.isdir(d.path):
        return
    parts = sorted(
        p for p in os.listdir(d.path) if p.startswith(f"{_PART}=")
    )
    if len(parts) < 2:
        return
    newest = datetime.strptime(parts[-1].split("=", 1)[1], "%Y-%m-%d")
    if ttl > 0:
        boundary = newest - timedelta(hours=ttl)
    else:
        months = -ttl
        mo = (newest.month - 1 - months) % 12 + 1
        yr = newest.year + (newest.month - 1 - months) // 12
        boundary = newest.replace(year=yr, month=mo)
    evicted = False
    for p in parts[:-1]:
        start = datetime.strptime(p.split("=", 1)[1], "%Y-%m-%d")
        if start + timedelta(days=1) <= boundary:
            shutil.rmtree(os.path.join(d.path, p), ignore_errors=True)
            evicted = True
        else:
            break
    if evicted:
        _register(eng, d)


# ---------------------------------------------------------------------------


def _bucket_floor(dt: datetime, interval: str) -> datetime | None:
    """Python-side bucket floor mirroring operators/sample_by.bucket_col:
    fixed-width units floor on the epoch-micros grid, calendar months /
    years floor on multiples since 1970."""
    n, unit = parse_interval(interval)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    if unit == "M":
        months = (dt.year - 1970) * 12 + dt.month - 1
        fl = months // n * n
        return datetime(1970 + fl // 12, fl % 12 + 1, 1, tzinfo=timezone.utc)
    if unit == "y":
        yr = (dt.year - 1970) // n * n + 1970
        return datetime(yr, 1, 1, tzinfo=timezone.utc)
    width = n * _UNIT_MICROS[unit]
    us = int(dt.timestamp() * 1_000_000)
    return datetime.fromtimestamp((us - us % width) / 1_000_000, tz=timezone.utc)


def _now() -> datetime:
    """Wall clock for timer/period scheduling — module-level so tests can
    monkeypatch a fixed instant."""
    return datetime.now(timezone.utc)


def _tz_offset(tz: str | None, at: datetime):
    from datetime import timedelta
    from zoneinfo import ZoneInfo

    if not tz:
        return timedelta(0)
    try:
        off = at.astimezone(ZoneInfo(tz)).utcoffset()
        return off if off is not None else timedelta(0)
    except Exception:
        # fixed offsets like '+02:00' (Dates.parseOffset)
        m = re.fullmatch(r"([+-])(\d{2}):?(\d{2})", tz)
        if m:
            sign = 1 if m.group(1) == "+" else -1
            return timedelta(minutes=sign * (int(m.group(2)) * 60 + int(m.group(3))))
        raise ValueError(f"invalid timezone: {tz}") from None


def _next_tick(d: MatViewDef, now: datetime) -> datetime:
    """First timer tick strictly after ``now`` on the grid
    start + k*every (MatViewTimerJob equivalent; calendar units step by
    month/year arithmetic)."""
    from datetime import timedelta

    start = d.timer_start or now
    if start.tzinfo is None:
        start = start.replace(tzinfo=timezone.utc)
    mult, unit = int(d.timer_every[:-1]), d.timer_every[-1]
    if now < start:
        return start
    if unit in ("M", "y"):
        months_per = mult * (12 if unit == "y" else 1)
        elapsed = (now.year - start.year) * 12 + (now.month - start.month)
        k = elapsed // months_per + 1
        total = (start.year * 12 + start.month - 1) + k * months_per
        while True:
            try:
                tick = start.replace(year=total // 12, month=total % 12 + 1)
            except ValueError:  # day overflow (e.g. Jan 31 + 1M)
                total += months_per
                continue
            if tick > now:
                return tick
            total += months_per
    width = timedelta(microseconds=mult * _UNIT_MICROS[unit])
    k = int((now - start) / width) + 1
    return start + k * width


def _period_cutoff(d: MatViewDef, now: datetime) -> datetime | None:
    """Upper bound (exclusive, UTC) of the last COMPLETE period: the
    largest local-time boundary B with B + delay <= now_local
    (MatViewRefreshJob period semantics — an in-progress period is never
    served)."""
    from datetime import timedelta

    if not d.period_length:
        return None
    off = _tz_offset(d.period_tz, now)
    local = now + off
    if d.period_delay:
        dm, du = int(d.period_delay[:-1]), d.period_delay[-1]
        local = local - timedelta(microseconds=dm * _UNIT_MICROS[du])
    floored = _bucket_floor(local.replace(tzinfo=timezone.utc), d.period_length)
    return floored - off


def _compute(eng: QdbEngine, d: MatViewDef, since: datetime | None) -> DataFrame:
    """Lower the stored view query, optionally bounded to buckets >= since
    (the predicate lands on the BASE scan — parquet row groups older than
    the cutoff are pruned, which is where the incremental economics come
    from)."""
    from .parser import parse

    q = parse(eng._rewrite_intervals(d.inner_sql))
    if since is not None:
        cond = f"{d.base_ts} >= TIMESTAMP '{since.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
        q.where = f"({q.where}) AND {cond}" if q.where else cond
    if d.period_length:
        # PERIOD views never serve the in-progress period: every refresh
        # (full and incremental alike) is bounded at the last complete
        # local-time period boundary
        cut = _period_cutoff(d, _now())
        if cut is not None:
            cond = (
                f"{d.base_ts} < TIMESTAMP "
                f"'{cut.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
            )
            q.where = f"({q.where}) AND {cond}" if q.where else cond
    return eng._lower(q)


def _refresh(eng: QdbEngine, d: MatViewDef, full: bool) -> int:
    spark = eng.spark
    if d.base in eng._dirty_views:  # stale DDL-table temp view
        eng._flush_dirty_views(d.base)
    base_df = eng.tables.get(d.base) or spark.table(d.base)
    frozen_now = None
    if d.base_ts in base_df.columns:
        # one pass: high-water mark, total rows, AND the frozen-region
        # count for the O3 guard (cutoff is derived from the PREVIOUS
        # hwm, so it is known before the scan)
        aggs = [F.max(d.base_ts).alias("m"), F.count(F.lit(1)).alias("n")]
        prev_cut = _incr_cutoff(d)
        if prev_cut is not None:
            pred = (
                F.col(d.base_ts) < _ts_lit(prev_cut)
                if d.shape == "sample_by"
                else F.col(d.base_ts) <= _ts_lit(prev_cut)
            )
            aggs.append(F.count_if(pred).alias("f"))
        stats = base_df.agg(*aggs).collect()[0]
        new_hwm, n_now = stats["m"], stats["n"]
        if prev_cut is not None:
            frozen_now = stats["f"]
    else:  # generic view over a base without the designated ts column
        new_hwm, n_now = None, base_df.count()

    if d.shape == "generic":
        # no incremental form: change-gated recompute (max-ts + row count
        # catch appends AND out-of-order writes); the checkpoint makes the
        # common no-change read free
        if (
            not full
            and d.base_count >= 0
            and n_now == d.base_count
            and _same_hwm(new_hwm, d.hwm)
        ):
            _register(eng, d)
            return 0
        _swap_write(d, _compute(eng, d, None))
        if new_hwm is not None:
            d.hwm = new_hwm if new_hwm.tzinfo else new_hwm.replace(tzinfo=timezone.utc)
        d.base_count = d.frozen_count = n_now
        _save_state(d)
        _register(eng, d)
        return 1

    cutoff = None if full or d.hwm is None else _incr_cutoff(d)
    o3_escalated = False
    if cutoff is not None and d.frozen_count >= 0 and frozen_now is not None:
        # O3 guard (WalTxnRangeLoader stand-in): rows landed BELOW the
        # incremental cutoff since the last refresh are invisible to a
        # tail recompute — a changed frozen-region count escalates to FULL
        if frozen_now != d.frozen_count:
            cutoff = None
            o3_escalated = True
            if d.refresh_limit and d.shape == "sample_by":
                # SET REFRESH LIMIT (ofSetMatViewRefreshLimit): bound how
                # far back the O3 escalation recomputes — buckets older
                # than hwm - limit keep their stored values instead of a
                # FULL recompute (the point of the limit on huge views)
                lim = _minus_hours_or_months(
                    d.hwm if d.hwm.tzinfo else d.hwm.replace(tzinfo=timezone.utc),
                    d.refresh_limit,
                )
                lim_cut = _bucket_floor(lim, d.interval)
                base_cut = _incr_cutoff(d)
                if lim_cut is not None and base_cut is not None:
                    cutoff = min(base_cut, lim_cut)

    # Fold the post-refresh frozen-region count into the compute/write pass
    # (r10): the NEXT cutoff is already derivable from the stats pass's
    # new_hwm, so an Observation on the base scan counts the frozen rows
    # for free during the write job.  Without this fold the count was its
    # own full base scan — which on the INCREMENTAL path defeats the whole
    # point of incremental refresh at scale (tail-pruned compute followed
    # by an unpruned count).  On the incremental path the observation rides
    # the already-pruned tail scan (filter BELOW the CollectMetrics node,
    # so parquet pushdown is preserved) and counts tail rows >= next
    # cutoff; frozen = n_now - that.
    obs = None
    obs_mode = None  # "full": metric IS frozen; "tail": frozen = n_now - metric
    nxt_new = None
    if d.shape == "sample_by" and new_hwm is not None and d.base in eng.tables:
        hwm_utc = new_hwm if new_hwm.tzinfo else new_hwm.replace(tzinfo=timezone.utc)
        nxt_new = _bucket_floor(hwm_utc, d.interval)

    def _observed_base(pred_col, pre_filter=None):
        from pyspark.sql import Observation

        nonlocal obs
        obs = Observation()
        base = base_df if pre_filter is None else base_df.filter(pre_filter)
        return base.observe(obs, F.count_if(pred_col).alias("frozen_metric"))

    def _compute_with_swap(observed, since):
        """Swap the base for its observed twin only while the PLAN is
        built, under the engine's refresh lock — concurrent refreshes of
        views over the same base (two CREATEs on two threads) must not
        capture each other's Observation, or the loser's obs.get() would
        block forever waiting for an action that never runs.  The write
        action itself happens outside the lock, so only driver-side plan
        building is serialized."""
        if observed is None:
            return _compute(eng, d, since)
        with eng._mv_refresh_lock:
            eng.tables[d.base] = observed
            try:
                return _compute(eng, d, since)
            finally:
                eng.tables[d.base] = base_df

    if not hasattr(eng, "_mv_refresh_lock"):
        import threading

        eng._mv_refresh_lock = threading.Lock()

    changed = 1
    if cutoff is None:
        observed = None
        if nxt_new is not None:
            observed = _observed_base(F.col(d.base_ts) < _ts_lit(nxt_new))
            obs_mode = "full"
        out = _compute_with_swap(observed, None)
        if d.shape == "sample_by":
            # repartition on the storage key: one task per date dir
            # instead of shuffle_partitions × dates tiny files (AQE
            # coalesces small dates; write+commit time is file-bound)
            out = out.withColumn(_PART, F.col(d.ts_out).cast("date"))
            out.repartition(F.col(_PART)).write.partitionBy(_PART).mode(
                "overwrite"
            ).parquet(d.path)
            d.stored_schema = out.schema
        else:
            _swap_write(d, out)
    elif not o3_escalated and new_hwm is not None and d.hwm is not None \
            and _same_hwm(new_hwm, d.hwm) and n_now == d.base_count:
        changed = 0
    elif d.shape == "latest_on":
        # per-key state merge: latest over (stored state ∪ new tail)
        from ..operators.latest import latest_on as _latest

        from .parser import parse as _parse

        q = _parse(eng._rewrite_intervals(d.inner_sql))
        ts_col, keys = q.latest_on
        tail = _compute(eng, d, cutoff)
        state = spark.read.parquet(d.path).select(*tail.columns)
        merged = _latest(state.unionByName(tail), ts_col, keys)
        _swap_write(d, merged.select(*tail.columns))
    else:  # sample_by bucket-window incremental
        observed = None
        # both are _bucket_floor outputs → tz-aware UTC, directly comparable
        if nxt_new is not None and nxt_new >= cutoff:
            # observation rides the tail scan: pre-filter keeps pushdown,
            # and every base row >= nxt_new is >= cutoff (nxt_new >= cutoff
            # checked above — hwm can regress if rows above the cutoff were
            # deleted) so the tail sees all of them
            observed = _observed_base(
                F.col(d.base_ts) >= _ts_lit(nxt_new),
                pre_filter=F.col(d.base_ts) >= _ts_lit(cutoff),
            )
            obs_mode = "tail"
        tail = _compute_with_swap(observed, cutoff).withColumn(
            _PART, F.col(d.ts_out).cast("date")
        )
        existing = spark.read.parquet(d.path)
        # rows of the touched date partitions that precede the recomputed
        # window must ride along in the overwrite (same merge the streaming
        # sink does); untouched date partitions are never rewritten
        carry = existing.filter(F.col(d.ts_out) < _ts_lit(cutoff)).join(
            tail.select(_PART).distinct(), _PART, "left_semi"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged = carry.unionByName(tail)
        merged.repartition(F.col(_PART)).write.partitionBy(_PART).mode(
            "overwrite"
        ).parquet(d.path)
        d.stored_schema = merged.schema
    if new_hwm is not None:
        d.hwm = new_hwm if new_hwm.tzinfo else new_hwm.replace(tzinfo=timezone.utc)
    d.base_count = n_now
    if changed or d.frozen_count < 0:
        if d.shape == "sample_by":
            # frozen region = rows below the NEXT bucket-floor cutoff —
            # read from the write pass's Observation when it ran; the
            # standalone scan remains only as the fallback (base not in
            # eng.tables, or the no-op-refresh/first-population edges)
            if obs_mode == "full":
                d.frozen_count = int(obs.get["frozen_metric"])
            elif obs_mode == "tail":
                d.frozen_count = int(n_now - obs.get["frozen_metric"])
            else:
                nxt = _incr_cutoff(d)
                d.frozen_count = (
                    base_df.filter(F.col(d.base_ts) < _ts_lit(nxt)).count()
                    if nxt is not None
                    else n_now
                )
        else:
            # frozen region = rows <= hwm, which is every row: free
            d.frozen_count = n_now
    _save_state(d)
    _register(eng, d)
    if changed and d.ttl_hours_or_months:
        _enforce_view_ttl(eng, d)
    return changed


def _minus_hours_or_months(dt: datetime, hours_or_months: int) -> datetime:
    """Subtract a parse_ttl-encoded span (hours>0 / months<0) — the same
    arithmetic TableWriter.enforceTtl uses for its boundary."""
    from calendar import monthrange
    from datetime import timedelta

    if hours_or_months > 0:
        return dt - timedelta(hours=hours_or_months)
    months = -hours_or_months
    mo = (dt.month - 1 - months) % 12 + 1
    yr = dt.year + (dt.month - 1 - months) // 12
    return dt.replace(year=yr, month=mo, day=min(dt.day, monthrange(yr, mo)[1]))


def _incr_cutoff(d: MatViewDef) -> datetime | None:
    """Timestamp below which the view's stored state is frozen: the bucket
    floor of the high-water mark for SAMPLE BY shapes, the mark itself
    otherwise."""
    if d.hwm is None:
        return None
    if d.shape == "sample_by":
        return _bucket_floor(d.hwm, d.interval)
    return d.hwm


def _ts_lit(dt: datetime):
    return F.lit(dt.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp")


def _same_hwm(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    a = a.replace(tzinfo=timezone.utc) if a.tzinfo is None else a
    b = b.replace(tzinfo=timezone.utc) if b.tzinfo is None else b
    return a == b


def _swap_write(d: MatViewDef, out: DataFrame) -> None:
    """Overwrite unpartitioned view state via tmp-dir swap (the state may
    be derived from the current files — never read+overwrite in place)."""
    tmp = d.path.rstrip("/") + ".swap"
    out.write.mode("overwrite").parquet(tmp)
    d.stored_schema = out.schema
    state = os.path.join(d.path, _STATE_FILE)
    saved = None
    if os.path.exists(state):
        with open(state) as fh:
            saved = fh.read()
    shutil.rmtree(d.path, ignore_errors=True)
    os.rename(tmp, d.path)
    if saved is not None:
        with open(os.path.join(d.path, _STATE_FILE), "w") as fh:
            fh.write(saved)


_STATE_FILE = "_lv_state.json"  # underscore: invisible to parquet discovery


def _save_state(d: MatViewDef) -> None:
    """Checkpoint (LiveViewCheckpointDataStore equivalent): enough state to
    resume incremental refresh in a NEW session over the same warehouse."""
    import json

    os.makedirs(d.path, exist_ok=True)
    with open(os.path.join(d.path, _STATE_FILE), "w") as fh:
        json.dump(
            {
                "inner_sql": d.inner_sql,
                "shape": d.shape,
                "hwm": d.hwm.isoformat() if d.hwm else None,
                "frozen_count": d.frozen_count,
                "base_count": d.base_count,
                "next_due": d.next_due.isoformat() if d.next_due else None,
                "wal_suspended": d.wal_suspended,
                "refresh_limit": d.refresh_limit,
                "ttl": d.ttl_hours_or_months,
                "symbol_capacities": d.symbol_capacities,
                "indexed_columns": d.indexed_columns,
            },
            fh,
        )


def _restore_state(eng: QdbEngine, d: MatViewDef) -> bool:
    """Adopt a previous session's checkpoint when the stored query text
    matches — the restart path: no recompute, incremental refresh resumes
    from the persisted high-water mark."""
    import json

    f = os.path.join(d.path, _STATE_FILE)
    try:
        with open(f) as fh:
            st = json.load(fh)
    except (OSError, ValueError):
        return False
    if st.get("inner_sql") != d.inner_sql or st.get("shape") != d.shape:
        return False
    d.hwm = datetime.fromisoformat(st["hwm"]) if st.get("hwm") else None
    d.frozen_count = st.get("frozen_count", -1)
    d.base_count = st.get("base_count", -1)
    d.next_due = (
        datetime.fromisoformat(st["next_due"]) if st.get("next_due") else None
    )
    d.wal_suspended = st.get("wal_suspended", False)
    d.refresh_limit = st.get("refresh_limit", 0)
    d.ttl_hours_or_months = st.get("ttl", 0)
    d.symbol_capacities = st.get("symbol_capacities", {}) or {}
    d.indexed_columns = st.get("indexed_columns", {}) or {}
    _register(eng, d)
    return True


def _register(eng: QdbEngine, d: MatViewDef) -> None:
    # explicit schema skips the footer/partition-inference job; restored
    # sessions (no captured schema yet) fall back to inference once
    reader = eng.spark.read
    if d.stored_schema is not None:
        reader = reader.schema(d.stored_schema)
    df = reader.parquet(d.path).drop(_PART)
    eng.register(d.name, df, designated_ts=d.ts_out)


def read_with_live_refresh(eng: QdbEngine, name: str) -> None:
    """Called by the engine's table resolver: a LIVE view incrementally
    refreshes before every read (the batch stand-in for
    REFRESH_TYPE_IMMEDIATE's refresh-on-transaction); a TIMER view
    refreshes only when the read arrives at/after its next-due tick —
    reads before the tick serve the stored (stale) state, exactly the
    reference's timer-job economics re-expressed pull-style."""
    d = eng.matviews.get(name)
    if d is None:
        return
    if d.wal_suspended:
        return  # SUSPEND WAL: reads serve the stored (stale) prefix
    if d.live:
        _refresh(eng, d, full=False)
        return
    if d.refresh_type == "timer" and d.timer_every:
        now = _now()
        if d.next_due is not None and now >= d.next_due:
            _refresh(eng, d, full=False)
            d.next_due = _next_tick(d, now)
            _save_state(d)
