"""QuestDB-SQL dialect parser: extracts the QuestDB-specific clause
skeleton and leaves everything inside expressions to Spark SQL.

Reference grammar points (``griffin/SqlParser.java``): SAMPLE BY :4284-4366
(FROM/TO, ALIGN TO CALENDAR / FIRST OBSERVATION), LATEST ON :4246,
ASOF/LT/SPLICE JOIN + TOLERANCE :5069, WINDOW JOIN :4754 (RANGE BETWEEN
bounds + PREVAILING), HORIZON JOIN :4895 (RANGE FROM/TO/STEP AS alias),
PIVOT :4260, negative LIMIT (``SqlOptimiser`` rewriteNegativeLimit),
interval strings in WHERE (``WhereClauseParser.java:77``).

This is deliberately a *clause-level* parser: select-list items, predicates
and aggregate expressions are opaque strings handed to ``F.expr`` — Spark's
own parser (and Catalyst) does the heavy lifting, matching the engine's
Spark-first design. Clause keywords are recognized ONLY at paren/quote
depth 0, so subqueries, string literals and ``substring(x FROM 1)`` can't
corrupt the clause skeleton.
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
class WindowJoinSpec:
    table: str
    alias: str | None
    keys: list[str]
    lo: str  # SQL interval string, or 'dyn:<micros expr>' (dynamic bounds)
    hi: str
    include_prevailing: bool
    jfilter: str | None = None  # slave-side join filter (ON (...) AND cond)


@dataclass
class HorizonJoinSpec:
    table: str
    alias: str | None
    keys: list[str]
    frm: str  # SQL interval strings for markout RANGE FROM/TO/STEP
    to: str
    step: str
    range_alias: str  # the `AS h` name exposing h.offset
    offsets: list[str] | None = None  # explicit LIST (0s, 1s, ...) form


@dataclass
class SampleBySpec:
    interval: str  # QuestDB spec, e.g. '1h'
    fill: str | None  # none|null|prev|linear|<const>
    from_ts: str | None
    to_ts: str | None
    tz: str | None = None         # ALIGN TO CALENDAR TIME ZONE '<tz>'
    offset: str | None = None     # WITH OFFSET 'hh:mm'
    align: str = "calendar"       # 'calendar' | 'first_observation'


@dataclass
class SqlJoinSpec:
    """A plain ANSI join inside a dialect query (multi-join FROM clauses)."""
    how: str  # 'inner' | 'left' | 'right' | 'full' | 'cross'
    table: str  # table name or '(subquery)'
    alias: str | None
    on: str | None  # raw ON expression, handed to F.expr


@dataclass
class QdbQuery:
    select_items: list[SelectItem]
    table: str  # table name or '(subquery)'
    table_alias: str | None
    join: JoinSpec | None
    where: str | None
    latest_on: tuple[str | None, list[str]] | None  # (ts | None=designated, keys)
    sample_by: SampleBySpec | None
    group_by: list[str] = field(default_factory=list)
    order_by: str | None = None
    limit: tuple[int, int | None] | None = None  # (lo/hi) or (n, None)
    window_join: WindowJoinSpec | None = None
    horizon_join: HorizonJoinSpec | None = None
    sql_joins: list[SqlJoinSpec] = field(default_factory=list)
    having: str | None = None  # post-aggregate filter (ANSI HAVING)
    # inline designated-ts marker: FROM read_parquet('p') timestamp(col)
    # (ReadParquetFunctionFactory.java:50 + SqlParser timestamp() suffix)
    from_ts_col: str | None = None
    distinct: bool = False  # SELECT DISTINCT


# clause keywords, longest-match-first; recognized at depth 0 only
_CLAUSE_KEYWORDS = [
    "LATEST ON", "LATEST BY", "SAMPLE BY", "GROUP BY", "ORDER BY", "HAVING",
    "ASOF JOIN", "LT JOIN", "SPLICE JOIN", "WINDOW JOIN", "HORIZON JOIN",
    "LEFT OUTER JOIN", "RIGHT OUTER JOIN", "FULL OUTER JOIN",
    "INNER JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN", "CROSS JOIN",
    "JOIN", "FROM", "WHERE", "LIMIT",
]
_KW_RE = re.compile(
    "|".join(r"\b" + kw.replace(" ", r"\s+") + r"\b" for kw in _CLAUSE_KEYWORDS),
    re.IGNORECASE,
)

_QDB_UNIT = {"U": "microsecond", "T": "millisecond", "s": "second",
             "m": "minute", "h": "hour", "d": "day", "w": "week"}
_TOL_UNIT = {"s": "SECOND", "m": "MINUTE", "h": "HOUR", "d": "DAY"}


def mask_literals(s: str) -> str:
    """Copy of ``s`` with the CONTENTS of string literals blanked to spaces
    (the quotes themselves are kept).  Regexes run over the mask can never
    match inside a literal, and every span lines up 1:1 with the original
    text — so a match in the mask can be applied to the original.  This is
    the token-boundary hardening from VERDICT r3 finding 1: keyword and
    aggregate sniffing must not fire on ``'... sum(x) ...'`` literals."""
    out = list(s)
    q: str | None = None
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = None
            else:
                out[i] = " "
        elif ch in "'\"":
            q = ch
    return "".join(out)


def strip_comments(s: str) -> str:
    """Remove ``--`` line comments and ``/* */`` block comments outside
    string literals (``SqlParser`` skips both; sqllogictest queries embed
    them mid-statement)."""
    out: list[str] = []
    i, n = 0, len(s)
    q: str | None = None
    while i < n:
        ch = s[i]
        if q:
            out.append(ch)
            if ch == q:
                q = None
            i += 1
        elif ch in "'\"":
            q = ch
            out.append(ch)
            i += 1
        elif ch == "-" and i + 1 < n and s[i + 1] == "-":
            while i < n and s[i] != "\n":
                i += 1
        elif ch == "/" and i + 1 < n and s[i + 1] == "*":
            j = s.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren/bracket/quote depth 0 (brackets cover
    ARRAY[...] literals and subscripting)."""
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
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
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


def depth0_spans(s: str) -> list[tuple[int, int]]:
    """Maximal [start, end) spans of `s` at paren/quote depth 0."""
    spans, depth, q, start = [], 0, None, 0
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = None
                if depth == 0:
                    start = i + 1  # resume after the literal closes
            continue
        if ch in "'\"":
            if depth == 0 and start < i:
                spans.append((start, i))
            q = ch
        elif ch == "(":
            if depth == 0 and start < i:
                spans.append((start, i))
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                start = i + 1
    if depth == 0 and q is None and start < len(s):
        spans.append((start, len(s)))
    return spans


def _clause_splits(s: str) -> list[tuple[int, int, str]]:
    """(start, end, normalized_keyword) for every depth-0 clause keyword,
    skipping FROM when it belongs to `RANGE FROM` / `SAMPLE BY ... FROM`."""
    out = []
    for lo, hi in depth0_spans(s):
        for m in _KW_RE.finditer(s, lo, hi):
            kw = re.sub(r"\s+", " ", m.group(0).upper())
            if kw == "FROM":
                prev = s[:m.start()].rstrip()
                last_word = prev.split()[-1].upper() if prev.split() else ""
                if last_word == "RANGE":
                    continue  # HORIZON JOIN ... RANGE FROM
            out.append((m.start(), m.end(), kw))
    return out


# prefix-final words that rule out an implicit alias (`expr alias` without
# AS — SqlParser accepts both forms; `sum(x) total` aliases, `a AND b` not)
_NOT_ALIAS_PREV = {
    "AND", "OR", "NOT", "IN", "IS", "LIKE", "ILIKE", "BETWEEN", "THEN",
    "WHEN", "ELSE", "CASE", "DISTINCT", "ALL", "AS", "OVER", "FROM", "BY",
    "ESCAPE", "TO",
}
# words that can't BE an implicit alias (interval-unit tails: `interval 1 day`)
_NOT_ALIAS_NAME = {
    u + s
    for u in ("DAY", "HOUR", "MINUTE", "SECOND", "WEEK", "MONTH", "YEAR",
              "MILLISECOND", "MICROSECOND", "NANOSECOND")
    for s in ("", "S")
} | {"END", "PRECEDING", "FOLLOWING"}


def _balanced(s: str) -> bool:
    depth, q = 0, None
    for ch in s:
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
    return depth == 0 and q is None


def _parse_item(item: str) -> SelectItem:
    item = item.strip()
    m = re.match(r"^(.*\S)\s+[aA][sS]\s+([\w\"]+)$", item, re.DOTALL)
    if m and _balanced(m.group(1)):
        return SelectItem(m.group(1).strip(), m.group(2).strip('"'))
    # implicit alias: trailing bare identifier after a balanced expression
    # whose last word isn't an operator/keyword
    m = re.match(r"^(.*[\w)\]'\"])\s+([A-Za-z_]\w*)$", item, re.DOTALL)
    if m and _balanced(m.group(1)):
        prefix = m.group(1).rstrip()
        last = re.split(r"[\s(,]+", prefix)[-1] if prefix else ""
        if (
            last.upper() not in _NOT_ALIAS_PREV
            and m.group(2).upper() not in _NOT_ALIAS_PREV | _NOT_ALIAS_NAME
            and not re.search(r"[+\-*/%<>=|&^,]$", prefix)
        ):
            # a numeric-ending expression can take a bare alias too
            # (`user_id % 3 grp`, `1 one`); interval-unit tails are
            # excluded by the name stop-list above
            return SelectItem(prefix, m.group(2))
    return SelectItem(item, None)


def _qdb_interval_to_sql(spec: str) -> str:
    """'30s' → '30 second' (for operators that take SQL interval strings)."""
    m = re.match(r"^(-?\d+)\s*([UTsmhdw])$", spec.strip())
    if not m:
        raise ValueError(f"bad interval spec: {spec!r}")
    return f"{m.group(1)} {_QDB_UNIT[m.group(2)]}"


def expand_declare(sql: str) -> str:
    """``DECLARE @a := <expr>[, @b := <expr>] SELECT ...`` → the SELECT with
    every ``@name`` textually bound (``SqlParser.java:3604`` parseDeclare).
    Bindings may reference earlier bindings."""
    s = sql.strip()
    m = re.match(r"^DECLARE\b", s, re.IGNORECASE)
    if not m:
        return sql
    body = s[m.end():]
    msel = re.search(r"\bSELECT\b", body, re.IGNORECASE)
    if not msel:
        raise ValueError("DECLARE without a SELECT")
    decls, query = body[: msel.start()], body[msel.start():]
    bindings: dict[str, str] = {}
    for part in split_top_level(decls):
        dm = re.match(r"^@(\w+)\s*:=\s*(.+)$", part.strip(), re.DOTALL)
        if not dm:
            raise ValueError(f"bad DECLARE binding: {part!r}")
        val = dm.group(2).strip()
        for name, v in bindings.items():  # earlier bindings visible
            val = re.sub(rf"@{name}\b", v, val)
        bindings[dm.group(1)] = val
    for name, v in bindings.items():
        query = re.sub(rf"@{name}\b", v, query)
    return query


def parse(sql: str) -> QdbQuery:
    """Parse one QuestDB-dialect SELECT into its clause skeleton."""
    s = re.sub(r"\s+", " ", strip_comments(expand_declare(sql)).strip()).rstrip("; ")
    if not re.match(r"^SELECT\b", s, re.IGNORECASE):
        raise ValueError("only SELECT supported by the dialect front-end")

    body = s[len("SELECT "):]
    distinct = False
    md = re.match(r"\s*DISTINCT\b", body, re.IGNORECASE)
    if md:
        distinct = True
        body = body[md.end():]
    splits = _clause_splits(body)
    first = splits[0][0] if splits else len(body)
    select_items = [_parse_item(i) for i in split_top_level(body[:first])]
    clauses: list[tuple[str, str]] = []
    for n, (st, en, kw) in enumerate(splits):
        nxt = splits[n + 1][0] if n + 1 < len(splits) else len(body)
        clauses.append((kw, body[en:nxt].strip()))

    table = table_alias = None
    join = None
    window_join = None
    horizon_join = None
    where = None
    latest = None
    sample = None
    group_by: list[str] = []
    order_by = None
    limit = None
    having = None
    sql_joins: list[SqlJoinSpec] = []
    from_ts_col = None

    for kw, text in clauses:
        if kw == "FROM" and text.lstrip().startswith("'") and sample is not None:
            # SAMPLE BY ... FROM 'lo' TO 'hi' — the spine-bound form, not a
            # table clause (SqlParser.java:4284 rewriteSampleByFromTo)
            mft = re.match(r"^'([^']+)'\s+TO\s+'([^']+)'", text.strip(), re.IGNORECASE)
            if not mft:
                raise ValueError(f"bad SAMPLE BY FROM/TO: {text!r}")
            sample.from_ts, sample.to_ts = mft.group(1), mft.group(2)
            # FILL / ALIGN may follow the spine (`sample by 1s from .. to ..
            # fill(0)` — the reference's sqllogictest order); they landed in
            # this clause's text because FILL isn't a clause keyword
            _parse_sample_tail(text.strip()[mft.end():], sample)
        elif kw == "FROM":
            table, table_alias, _rest = _parse_source(text)
            mts = re.match(r"^timestamp\s*\(\s*(\w+)\s*\)", _rest, re.IGNORECASE)
            if mts:
                from_ts_col = mts.group(1)
        elif kw.endswith("JOIN") and kw not in (
            "ASOF JOIN", "LT JOIN", "SPLICE JOIN", "WINDOW JOIN", "HORIZON JOIN"
        ):
            how = kw.split()[0].lower() if kw != "JOIN" else "inner"
            if how == "outer":  # defensive — kw always starts with the type
                how = "full"
            jt, ja, rest = _parse_source(text)
            on = None
            mo_on = re.match(r"^ON\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
            if mo_on:
                on = mo_on.group(1).strip()
            sql_joins.append(SqlJoinSpec(how, jt, ja, on))
        elif kw in ("ASOF JOIN", "LT JOIN", "SPLICE JOIN"):
            join = _parse_join(kw.split()[0].lower(), text)
        elif kw == "WINDOW JOIN":
            window_join = _parse_window_join(text)
        elif kw == "HORIZON JOIN":
            horizon_join = _parse_horizon_join(text)
        elif kw == "WHERE":
            where = text
        elif kw == "LATEST ON":
            m = re.match(r"^(\w+)\s+PARTITION\s+BY\s+(.+)$", text, re.IGNORECASE)
            if not m:
                raise ValueError(f"bad LATEST ON clause: {text!r}")
            latest = (m.group(1), [c.strip() for c in m.group(2).split(",")])
        elif kw == "LATEST BY":
            # legacy v6 shorthand (SqlParser parseLatestBy; still accepted
            # by the reference): partitions by the listed keys over the
            # designated timestamp, which is resolved at lowering time
            latest = (None, [c.strip() for c in split_top_level(text)])
        elif kw == "SAMPLE BY":
            sample = _parse_sample_by(text)
        elif kw == "GROUP BY":
            group_by = [c.strip() for c in split_top_level(text)]
        elif kw == "HAVING":
            having = text
        elif kw == "ORDER BY":
            order_by = text
        elif kw == "LIMIT":
            nums = [int(x.strip()) for x in text.split(",")]
            limit = (nums[0], nums[1] if len(nums) > 1 else None)

    if table is None:
        raise ValueError("no FROM clause")
    return QdbQuery(
        select_items, table, table_alias, join, where, latest, sample,
        group_by, order_by, limit, window_join, horizon_join, sql_joins,
        having=having, from_ts_col=from_ts_col, distinct=distinct,
    )


def _parse_source(text: str) -> tuple[str, str | None, str]:
    """Leading ``<table> [AS] [alias]``, ``(<subquery>) [AS] [alias]``, or a
    table function ``read_parquet('p') [timestamp(col)] [alias]`` →
    (source, alias, rest)."""
    text = text.strip()
    mfn = re.match(r"^(\w+)\s*\(", text)
    if mfn and mfn.group(1).lower() in ("read_parquet", "parquet_scan"):
        inner_start = text.index("(")
        depth, q = 0, None
        for i in range(inner_start, len(text)):
            ch = text[i]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    src = text[: i + 1]
                    _, alias, rest = _split_table_alias("__fn " + text[i + 1 :])
                    return src, alias, rest
        raise ValueError(f"unbalanced parens in table function: {text!r}")
    if text.startswith("("):
        depth, q = 0, None
        for i, ch in enumerate(text):
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    src = text[: i + 1]
                    _, alias, rest = _split_table_alias("__sub " + text[i + 1:])
                    return src, alias, rest
        raise ValueError(f"unbalanced parens in FROM source: {text!r}")
    return _split_table_alias(text)


def _split_table_alias(text: str) -> tuple[str, str | None, str]:
    """Leading `<table> [AS] [alias]` of a join clause → (table, alias, rest)."""
    toks = text.split()
    table = toks[0]
    alias = None
    used = 1
    _KWS = {"ON", "TOLERANCE", "RANGE", "INCLUDE", "EXCLUDE", "WHERE", "ORDER",
            "GROUP", "LIMIT", "SAMPLE", "LATEST"}
    if len(toks) > 1 and toks[1].upper() == "AS" and len(toks) > 2:
        alias, used = toks[2], 3
    elif (
        len(toks) > 1
        and toks[1].upper() not in _KWS
        and re.fullmatch(r"\w+", toks[1])  # `timestamp(col)` is not an alias
    ):
        alias, used = toks[1], 2
    return table, alias, " ".join(toks[used:])


def _parse_on_keys(text: str) -> tuple[list[str], str]:
    keys: list[str] = []
    mo = re.match(r"^ON\s*\(([^)]*)\)\s*", text, re.IGNORECASE) or re.match(
        r"^ON\s+([\w\s,]+?)(?=$|RANGE\b|TOLERANCE\b|INCLUDE\b|EXCLUDE\b)",
        text, re.IGNORECASE,
    )
    if mo:
        raw = mo.group(1)
        # `a.sym = b.sym` equi-key form → the bare key column set
        for part in raw.split(","):
            part = part.strip()
            if not part:
                continue
            me = re.match(r"^(?:\w+\.)?(\w+)\s*=\s*(?:\w+\.)?(\w+)$", part)
            if me:
                if me.group(1) != me.group(2):
                    raise ValueError(f"only equi-keys on same-named columns: {part!r}")
                keys.append(me.group(1))
            else:
                keys.append(part.split(".")[-1])
        text = text[mo.end():]
    return keys, text.strip()


def _parse_join(kind: str, text: str) -> JoinSpec:
    tol = None
    m = re.search(r"\bTOLERANCE\s+(\d+)([smhd])\b", text, re.IGNORECASE)
    if m:
        tol = f"{m.group(1)} {_TOL_UNIT[m.group(2).lower()]}"
        text = text[: m.start()] + text[m.end():]
    table, alias, rest = _split_table_alias(text.strip())
    keys, _ = _parse_on_keys(rest)
    return JoinSpec(kind, table, alias, keys, tol)


_BOUND_RE = re.compile(
    r"RANGE\s+BETWEEN\s+(.+?)\s+(PRECEDING|FOLLOWING)\s+AND\s+(.+?)\s+"
    r"(PRECEDING|FOLLOWING)",
    re.IGNORECASE,
)


_BOUND_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _parse_bound(expr: str, direction: str) -> str:
    """WINDOW JOIN bound → signed interval string, or a ``dyn:``-prefixed
    microseconds expression for DYNAMIC bounds (WindowJoinTest
    testDynamicWindow*): the bound may be any master-side expression,
    optionally followed by a time unit (``lo_bound minutes PRECEDING``,
    ``t.price::long PRECEDING``); without a unit the value is raw
    microseconds (``60_000_000 FOLLOWING``)."""
    e = expr.strip()
    sign = -1 if direction.upper() == "PRECEDING" else 1
    m = re.match(r"^(\d[\d_]*)\s*([A-Za-z]+)?$", e)
    if m:  # constant bound (unitless = microseconds)
        n = int(m.group(1).replace("_", ""))
        unit = (m.group(2) or "microsecond").lower().rstrip("s") or "microsecond"
        if unit not in _BOUND_UNIT_US:
            raise ValueError(f"unsupported WINDOW JOIN bound unit: {expr!r}")
        return f"{sign * n} {unit}"
    if re.match(r"^\d+\.\d+", e):
        raise ValueError(f"WINDOW JOIN bound must be an integer amount: {expr!r}")
    m2 = re.match(
        r"^(.+?)\s+(microseconds?|milliseconds?|seconds?|minutes?|hours?|days?|weeks?)$",
        e, re.IGNORECASE,
    )
    if m2:
        raw, unit = m2.group(1), m2.group(2).lower().rstrip("s")
    else:
        raw, unit = e, "microsecond"
    return f"dyn:({sign}) * CAST(({raw}) AS BIGINT) * {_BOUND_UNIT_US[unit]}"


def _parse_window_join(text: str) -> WindowJoinSpec:
    """``WINDOW JOIN slave [alias] [ON (keys)] RANGE BETWEEN x PRECEDING AND
    y FOLLOWING [INCLUDE|EXCLUDE PREVAILING]`` (SqlParser.java:4754)."""
    table, alias, rest = _split_table_alias(text.strip())
    keys, rest = _parse_on_keys(rest)
    # slave-side join filter: ``ON (keys) AND p.price < 300``
    # (WindowJoinTest testFastJoinWithJoinFilter — the plan's
    # ``join filter:`` line; master conditions belong in WHERE)
    jfilter = None
    fm = re.match(r"^AND\s+(.+?)\s*(?=\bRANGE\b)", rest, re.IGNORECASE | re.DOTALL)
    if fm:
        jfilter = fm.group(1).strip()
        rest = rest[fm.end():]
    m = _BOUND_RE.search(rest)
    if not m:
        # CURRENT ROW forms
        m2 = re.search(
            r"RANGE\s+BETWEEN\s+(.+?)\s+AND\s+(.+)", rest, re.IGNORECASE
        )
        raise ValueError(f"bad WINDOW JOIN RANGE clause: {rest!r}" if not m2 else
                         f"unsupported WINDOW JOIN bounds: {m2.group(0)!r}")
    lo = _parse_bound(m.group(1), m.group(2))
    hi = _parse_bound(m.group(3), m.group(4))
    # reference default is INCLUDE PREVAILING (WindowJoinContext.java:39
    # `includePrevailing = true`); EXCLUDE PREVAILING is the explicit opt-out
    prevailing = not re.search(r"\bEXCLUDE\s+PREVAILING\b", rest, re.IGNORECASE)
    return WindowJoinSpec(table, alias, keys, lo, hi, prevailing, jfilter)


_QDB_UNIT_US = {"U": 1, "T": 1_000, "s": 1_000_000, "m": 60_000_000,
                "h": 3_600_000_000, "d": 86_400_000_000, "w": 604_800_000_000}


def _horizon_offset(spec: str) -> tuple[str, int]:
    """LIST offset → (SQL interval string, micros). A bare integer is raw
    microseconds (HorizonJoinTest `LIST (0) AS h`)."""
    t = spec.strip()
    m = re.match(r"^(-?\d+)\s*([UTsmhdw])$", t)
    if m:
        n, u = int(m.group(1)), m.group(2)
        return f"{n} {_QDB_UNIT[u]}", n * _QDB_UNIT_US[u]
    if re.fullmatch(r"-?\d+", t):
        return f"{int(t)} microsecond", int(t)
    raise ValueError(f"bad HORIZON JOIN LIST offset: {spec!r}")


def _parse_horizon_join(text: str) -> HorizonJoinSpec:
    """``HORIZON JOIN slave [alias] [ON (keys)] RANGE FROM 0s TO 2s STEP 1s
    AS h`` or ``... LIST (0s, 1s, 2s) AS h`` (SqlParser.java:4895,
    HorizonJoinTest.java:123,163)."""
    table, alias, rest = _split_table_alias(text.strip())
    keys, rest = _parse_on_keys(rest)
    lm = re.search(r"LIST\s*\(([^)]*)\)\s+AS\s+(\w+)", rest, re.IGNORECASE)
    if lm:
        parts = [p for p in (x.strip() for x in lm.group(1).split(",")) if p]
        if not parts:
            raise ValueError("HORIZON JOIN LIST must name at least one offset")
        pairs = [_horizon_offset(p) for p in parts]
        if any(b[1] <= a[1] for a, b in zip(pairs, pairs[1:])):
            raise ValueError("LIST offsets must be monotonically increasing")
        return HorizonJoinSpec(
            table, alias, keys, "", "", "", lm.group(2),
            offsets=[p[0] for p in pairs],
        )
    m = re.search(
        r"RANGE\s+FROM\s+(-?\d+\s*[UTsmhdw])\s+TO\s+(-?\d+\s*[UTsmhdw])\s+"
        r"STEP\s+(\d+\s*[UTsmhdw])\s+AS\s+(\w+)",
        rest, re.IGNORECASE,
    )
    if not m:
        raise ValueError(f"bad HORIZON JOIN RANGE clause: {rest!r}")
    return HorizonJoinSpec(
        table, alias, keys,
        _qdb_interval_to_sql(m.group(1)),
        _qdb_interval_to_sql(m.group(2)),
        _qdb_interval_to_sql(m.group(3)),
        m.group(4),
    )


def _parse_sample_tail(rest: str, spec: SampleBySpec) -> None:
    """FILL / FROM-TO / ALIGN / OFFSET modifiers following a SAMPLE BY
    interval (or its FROM/TO spine clause); mutates ``spec``."""
    mf = re.search(r"\bFILL\s*\(\s*([^)]+)\s*\)", rest, re.IGNORECASE)
    if mf:
        spec.fill = mf.group(1).strip().lower()
    mr = re.search(r"\bFROM\s+'([^']+)'\s+TO\s+'([^']+)'", rest, re.IGNORECASE)
    if mr:
        spec.from_ts, spec.to_ts = mr.group(1), mr.group(2)
    if re.search(r"ALIGN\s+TO\s+FIRST\s+OBSERVATION", rest, re.IGNORECASE):
        spec.align = "first_observation"  # SqlParser.java:4284-4366
    mt = re.search(
        r"ALIGN\s+TO\s+CALENDAR(?:\s+TIME\s+ZONE\s+'([^']+)')?", rest, re.IGNORECASE
    )
    if mt:
        spec.tz = mt.group(1)
    mo_ = re.search(r"WITH\s+OFFSET\s+'([^']+)'", rest, re.IGNORECASE)
    if mo_:
        spec.offset = mo_.group(1)


def _parse_sample_by(text: str) -> SampleBySpec:
    m = re.match(r"^(\d+\s*[UTsmhdwMy])\b", text)
    if not m:
        raise ValueError(f"bad SAMPLE BY interval: {text!r}")
    interval = m.group(1).replace(" ", "")
    spec = SampleBySpec(interval, None, None, None)
    _parse_sample_tail(text[m.end():], spec)
    return spec
