"""QuestDB interval-string predicates: `ts IN '2024-01'`.

Reference: ``griffin/WhereClauseParser.java:77`` + ``griffin/model/
IntervalUtils.java`` — a timestamp prefix string denotes the whole
interval at its granularity (year / month / day / hour / minute / second),
with optional `;duration` extension. Lowering: parse the prefix on the
driver (plan-build time) into [lo, hi) bounds → ordinary BETWEEN
predicates → parquet pushdown / partition pruning for free.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F

_FORMATS = [
    ("%Y", "year"),
    ("%Y-%m", "month"),
    ("%Y-%m-%d", "day"),
    ("%Y-%m-%dT%H", "hour"),
    ("%Y-%m-%dT%H:%M", "minute"),
    ("%Y-%m-%dT%H:%M:%S", "second"),
]

_DUR_RE = re.compile(r"^(.*?);(-?\d+)([smhdwMy])$")


def parse_interval_string(s: str) -> tuple[datetime, datetime]:
    """'2024-01' → [2024-01-01, 2024-02-01). Supports ';<n><unit>' duration
    suffix extending the end (QuestDB `IN '2024-01-15;2d'`)."""
    dur = None
    m = _DUR_RE.match(s)
    if m:
        s, n, unit = m.group(1), int(m.group(2)), m.group(3)
        dur = (n, unit)
    s_norm = s.replace(" ", "T")
    for fmt, gran in _FORMATS:
        try:
            lo = datetime.strptime(s_norm, fmt)
        except ValueError:
            continue
        hi = _advance(lo, gran)
        if dur is not None:
            n, unit = dur
            hi = _add_units(hi, n, unit)
        return lo, hi
    raise ValueError(f"unrecognized interval string: {s!r}")


def _advance(lo: datetime, gran: str) -> datetime:
    if gran == "year":
        return lo.replace(year=lo.year + 1)
    if gran == "month":
        return lo.replace(year=lo.year + (lo.month == 12), month=lo.month % 12 + 1)
    step = {"day": timedelta(days=1), "hour": timedelta(hours=1),
            "minute": timedelta(minutes=1), "second": timedelta(seconds=1)}[gran]
    return lo + step


def _add_units(t: datetime, n: int, unit: str) -> datetime:
    if unit == "y":
        return t.replace(year=t.year + n)
    if unit == "M":
        mo = t.month - 1 + n
        return t.replace(year=t.year + mo // 12, month=mo % 12 + 1)
    return t + {"s": timedelta(seconds=n), "m": timedelta(minutes=n),
                "h": timedelta(hours=n), "d": timedelta(days=n),
                "w": timedelta(weeks=n)}[unit]


# '<base>;<period><unit>;<count>' repetition — base may itself carry a
# ';duration' suffix: '2018-01-10T10:30;30m;2d;2' = the 30-minute range on
# Jan 10 AND the same range shifted +2d, 2 occurrences total
# (IntervalUtils.parseIntervalSuffix case 2, WhereClauseParser.java:464).
_REP_RE = re.compile(r"^(.*?);(\d+)([smhdwMy]);(\d+)$")


def parse_interval_ranges(s: str) -> list[tuple[datetime, datetime]]:
    """Interval string → one or more [lo, hi) ranges (repetition expands to
    `count` period-shifted copies of the base range)."""
    m = _REP_RE.match(s)
    if m is None:
        return [parse_interval_string(s)]
    base, pn, punit, count = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
    if ";" not in base:
        # reference grammar requires the full 4-part date;dur;period;count
        # form (parseIntervalSuffix: 2 semicolons → error)
        raise ValueError(f"invalid interval format: {s!r}")
    if count < 1:
        raise ValueError(f"interval repeat count must be positive: {s!r}")
    lo, hi = parse_interval_string(base)
    return [
        (_add_units(lo, k * pn, punit), _add_units(hi, k * pn, punit))
        for k in range(count)
    ]


def in_interval(ts: Column, interval: str) -> Column:
    """`ts IN '<interval>'` predicate → OR of half-open range comparisons
    (a single range for plain intervals; repetition yields several — all
    constant bounds, so every range still pushes down to the parquet
    scan)."""
    pred = None
    for lo, hi in parse_interval_ranges(interval):
        rng = (ts >= F.lit(lo.isoformat(sep=" ")).cast("timestamp")) & (
            ts < F.lit(hi.isoformat(sep=" ")).cast("timestamp")
        )
        pred = rng if pred is None else (pred | rng)
    return pred
