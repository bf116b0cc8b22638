"""QuestDB-SQL dialect parser: extracts the QuestDB-specific clause
skeleton and leaves everything inside expressions to Spark SQL.

Reference grammar points (``griffin/SqlParser.java``): SAMPLE BY :4284-4366
(FROM/TO, ALIGN TO), LATEST ON :4246, ASOF/LT/SPLICE JOIN + TOLERANCE
:5069, negative LIMIT (``SqlOptimiser`` rewriteNegativeLimit), interval
strings in WHERE (``WhereClauseParser.java:77``).

This is deliberately a *clause-level* parser: select-list items, predicates
and aggregate expressions are opaque strings handed to ``F.expr`` — Spark's
own parser (and Catalyst) does the heavy lifting, matching the engine's
Spark-first design.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class SelectItem:
    expr: str
    alias: str | None

    @property
    def out_name(self) -> str:
        if self.alias:
            return self.alias
        return self.expr.strip()


@dataclass
class JoinSpec:
    kind: str  # 'asof' | 'lt' | 'splice'
    table: str
    alias: str | None
    keys: list[str]
    tolerance: str | None  # SQL interval body, e.g. '2 HOUR'


@dataclass
class SampleBySpec:
    interval: str  # QuestDB spec, e.g. '1h'
    fill: str | None  # none|null|prev|linear|<const>
    from_ts: str | None
    to_ts: str | None
    tz: str | None = None         # ALIGN TO CALENDAR TIME ZONE '<tz>'
    offset: str | None = None     # WITH OFFSET 'hh:mm'


@dataclass
class QdbQuery:
    select_items: list[SelectItem]
    table: str
    table_alias: str | None
    join: JoinSpec | None
    where: str | None
    latest_on: tuple[str, list[str]] | None  # (ts_col, partition keys)
    sample_by: SampleBySpec | None
    group_by: list[str] = field(default_factory=list)
    order_by: str | None = None
    limit: tuple[int, int | None] | None = None  # (lo/hi) or (n, None)


_KEYWORDS_SPLIT = re.compile(
    r"\b(FROM|WHERE|LATEST\s+ON|SAMPLE\s+BY|GROUP\s+BY|ORDER\s+BY|LIMIT|"
    r"ASOF\s+JOIN|LT\s+JOIN|SPLICE\s+JOIN)\b",
    re.IGNORECASE,
)

_TOL_UNIT = {"s": "SECOND", "m": "MINUTE", "h": "HOUR", "d": "DAY"}


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren/quote depth 0."""
    parts, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _parse_item(item: str) -> SelectItem:
    m = re.match(r"^(.*?)\s+[aA][sS]\s+([\w\"]+)$", item.strip(), re.DOTALL)
    if m:
        return SelectItem(m.group(1).strip(), m.group(2).strip('"'))
    return SelectItem(item.strip(), None)


def parse(sql: str) -> QdbQuery:
    """Parse one QuestDB-dialect SELECT into its clause skeleton."""
    s = re.sub(r"\s+", " ", sql.strip()).rstrip(";")
    if not re.match(r"^SELECT\b", s, re.IGNORECASE):
        raise ValueError("only SELECT supported by the dialect front-end")

    # tokenize into clause segments
    body = s[len("SELECT "):]
    pieces = _KEYWORDS_SPLIT.split(body)
    # pieces = [select_list, KW, text, KW, text, ...]
    select_items = [_parse_item(i) for i in split_top_level(pieces[0])]
    clauses: list[tuple[str, str]] = []
    for i in range(1, len(pieces) - 1, 2):
        kw = re.sub(r"\s+", " ", pieces[i].upper())
        clauses.append((kw, pieces[i + 1].strip()))

    table = table_alias = None
    join = None
    where = None
    latest = None
    sample = None
    group_by: list[str] = []
    order_by = None
    limit = None

    for kw, text in clauses:
        if kw == "FROM" and text.lstrip().startswith("'") and sample is not None:
            # SAMPLE BY ... FROM 'lo' TO 'hi' — the spine-bound form, not a
            # table clause (SqlParser.java:4284 rewriteSampleByFromTo)
            mft = re.match(r"^'([^']+)'\s+TO\s+'([^']+)'", text.strip(), re.IGNORECASE)
            if not mft:
                raise ValueError(f"bad SAMPLE BY FROM/TO: {text!r}")
            sample.from_ts, sample.to_ts = mft.group(1), mft.group(2)
        elif kw == "FROM":
            toks = text.split()
            table = toks[0]
            if len(toks) > 1 and toks[1].upper() != "AS":
                table_alias = toks[1]
            elif len(toks) > 2:
                table_alias = toks[2]
        elif kw in ("ASOF JOIN", "LT JOIN", "SPLICE JOIN"):
            join = _parse_join(kw.split()[0].lower(), text)
        elif kw == "WHERE":
            where = text
        elif kw == "LATEST ON":
            m = re.match(r"^(\w+)\s+PARTITION\s+BY\s+(.+)$", text, re.IGNORECASE)
            if not m:
                raise ValueError(f"bad LATEST ON clause: {text!r}")
            latest = (m.group(1), [c.strip() for c in m.group(2).split(",")])
        elif kw == "SAMPLE BY":
            sample = _parse_sample_by(text)
        elif kw == "GROUP BY":
            group_by = [c.strip() for c in split_top_level(text)]
        elif kw == "ORDER BY":
            order_by = text
        elif kw == "LIMIT":
            nums = [int(x.strip()) for x in text.split(",")]
            limit = (nums[0], nums[1] if len(nums) > 1 else None)

    if table is None:
        raise ValueError("no FROM clause")
    return QdbQuery(
        select_items, table, table_alias, join, where, latest, sample,
        group_by, order_by, limit,
    )


def _parse_join(kind: str, text: str) -> JoinSpec:
    tol = None
    m = re.search(r"\bTOLERANCE\s+(\d+)([smhd])\b", text, re.IGNORECASE)
    if m:
        tol = f"{m.group(1)} {_TOL_UNIT[m.group(2).lower()]}"
        text = text[: m.start()] + text[m.end():]
    keys: list[str] = []
    mo = re.search(r"\bON\s*\(?([\w\s,]+?)\)?\s*$", text, re.IGNORECASE)
    if mo:
        keys = [k.strip() for k in mo.group(1).split(",") if k.strip()]
        text = text[: mo.start()]
    toks = text.split()
    table = toks[0]
    alias = None
    if len(toks) > 1:
        alias = toks[2] if toks[1].upper() == "AS" and len(toks) > 2 else toks[1]
    return JoinSpec(kind, table, alias, keys, tol)


def _parse_sample_by(text: str) -> SampleBySpec:
    m = re.match(r"^(\d+\s*[UTsmhdwMy])", text)
    if not m:
        raise ValueError(f"bad SAMPLE BY interval: {text!r}")
    interval = m.group(1).replace(" ", "")
    rest = text[m.end():]
    fill = None
    mf = re.search(r"\bFILL\s*\(\s*([^)]+)\s*\)", rest, re.IGNORECASE)
    if mf:
        fill = mf.group(1).strip().lower()
    from_ts = to_ts = None
    mr = re.search(r"\bFROM\s+'([^']+)'\s+TO\s+'([^']+)'", rest, re.IGNORECASE)
    if mr:
        from_ts, to_ts = mr.group(1), mr.group(2)
    tz = offset = None
    mt = re.search(r"ALIGN\s+TO\s+CALENDAR(?:\s+TIME\s+ZONE\s+'([^']+)')?", rest, re.IGNORECASE)
    if mt:
        tz = mt.group(1)
    mo_ = re.search(r"WITH\s+OFFSET\s+'([^']+)'", rest, re.IGNORECASE)
    if mo_:
        offset = mo_.group(1)
    return SampleBySpec(interval, fill, from_ts, to_ts, tz, offset)
