"""SQL-dialect completion of the reference's function surface (round 8).

A systematic probe of every SQL name the reference's FunctionFactory
inventory registers (``griffin/engine/functions/**``, getSignature
literals) found ~45 functions that existed only as Python column-API
helpers (``functions/finance.py``, ``functions/arrays.py``, …) or not at
all — a QuestDB user writing plain SQL could not call them. This module
adds the missing names as SQL macros (text expansion over the
literal-masked statement, same mechanics as ``engine._FN_MACROS``).

Reference anchors (file → semantics source):

- groupby/TwapGroupByFunction.java:222 — twap(price, ts): observations
  sorted by ts, each price weighted by duration to the NEXT observation,
  total-duration denominator; all-same-ts degrades to the plain mean.
- groupby/AbstractKurtosis/SkewnessGroupByFunction.java — central-moment
  sums; bare kurtosis()/skewness() are the SAMPLE variants (the factory
  classes extend the *Sample* factories), _pop are population.
- groupby/AbstractWeightedStdDevGroupByFunction.java:52 —
  weighted_stddev == weighted_stddev_rel.
- groupby/WeightedAvgDoubleGroupByFunction / VwapDouble — pairwise
  null/NaN skip, sum(v*w)/sum(w).
- finance/SpreadBpsFunctionFactory.java — spread/mid*10_000.
- finance/LevelTwoPriceFunctionFactory.java — l2price(DDDV): book sweep
  over (size, price) level pairs, NULL when unfilled.
- math/RoundDown/RoundUpDoubleFunctionFactory + std/Numbers.java:2211 —
  trunc-based scaled rounding with the 1e-15 tolerance, sign restored.
- math/IPv4StrNetmaskFunctionFactory.java — netmask('a.b.c.d/p').
- long128/LongsToLong128FunctionFactory.java — to_long128(lo, hi).
- catalogue/CurrentSettingFunctionFactory.java — only
  'server_version_num' resolves (Constants.java:127 "123000"), else ''.
- array/DoubleArrayElemSumFunctionFactory.java ("array_elem_sum(D[]V)",
  N-ary element-wise) and groupby/DoubleArrayElemSumGroupByFunctionFactory
  ("array_elem_sum(D[])", element-wise across group rows) — the macro
  dispatches on arity.
- rnd/RndDecimal/RndDoubleArray/RndInterval/RndSymbolWeighted/
  RndSymbolZipf FunctionFactory.java — generator forms, lowered to the
  same deterministic row-index mix as the rest of the rnd_* family so
  fixtures stay oracle-checkable.
"""

from __future__ import annotations

from ..sources.generators import mix_sql

_BARS = "▁▂▃▄▅▆▇█"
_TOL = "1e-15"


def _mix(tag: int, extra: str = "") -> str:
    """Deterministic per-row draw (same scheme as engine._rnd_sql)."""
    x = f"(x * {2 * tag + 1}{(' + ' + extra) if extra else ''})"
    return mix_sql(x, 0, tag)


def _fin(x: str) -> str:
    """QuestDB finite-observation filter: NULL/NaN skipped."""
    return f"CASE WHEN ({x}) IS NOT NULL AND NOT isnan({x}) THEN CAST(({x}) AS DOUBLE) END"


# -- central-moment aggregates (skewness/kurtosis families) ----------------


def _moment_stats(x: str, upto: int) -> dict[str, str]:
    f = _fin(x)
    out = {"n": f"CAST(count({f}) AS DOUBLE)", "s1": f"sum({f})"}
    for k in range(2, upto + 1):
        out[f"s{k}"] = "sum(" + " * ".join([f"({f})"] * k) + ")"
    return out


def _skew_sql(x: str, samp: bool) -> str:
    m = _moment_stats(x, 3)
    n, s1, s2, s3 = m["n"], m["s1"], m["s2"], m["s3"]
    mu = f"({s1} / {n})"
    m2 = f"({s2} - {s1} * {mu})"  # sum((x-mu)^2)
    m3 = f"({s3} - 3 * {mu} * {s2} + 2 * {n} * {mu} * {mu} * {mu})"
    if samp:
        guard = f"{n} >= 3 AND {m2} > 0"
        coef = f"({n} * sqrt({n} - 1.0) / ({n} - 2.0))"
    else:
        guard = f"{n} >= 1 AND {m2} > 0"
        coef = f"sqrt({n})"
    return f"CASE WHEN {guard} THEN {coef} * {m3} / ({m2} * sqrt({m2})) END"


def _kurt_sql(x: str, samp: bool) -> str:
    m = _moment_stats(x, 4)
    n, s1, s2, s3, s4 = m["n"], m["s1"], m["s2"], m["s3"], m["s4"]
    mu = f"({s1} / {n})"
    m2 = f"({s2} - {s1} * {mu})"
    m4 = (
        f"({s4} - 4 * {mu} * {s3} + 6 * {mu} * {mu} * {s2}"
        f" - 3 * {n} * {mu} * {mu} * {mu} * {mu})"
    )
    g2 = f"({n} * {m4} / ({m2} * {m2}) - 3.0)"
    if samp:
        return (
            f"CASE WHEN {n} >= 4 AND {m2} > 0 THEN "
            f"(({n} - 1) / (({n} - 2) * ({n} - 3))) * (({n} + 1) * {g2} + 6) END"
        )
    return f"CASE WHEN {n} >= 1 AND {m2} > 0 THEN {g2} END"


# -- order-dependent aggregates (fold over collected observations) ---------


def _twap_sql(a: list[str]) -> str:
    """twap(price, ts): sorted-collect fold — observations of one GROUP
    are gathered into an array (the reference buffers them per group
    slot too, TwapGroupByFunction's native entry buffer). Memory is
    O(group size); for groups beyond ~1e6 observations use the column
    API (functions/finance.twap — lead()-based, no collect)."""
    if len(a) != 2:
        raise ValueError("twap(price, ts)")
    p, ts = a[0], a[1]
    # sort_array, not array_sort: the latter is itself a dialect macro
    # (NaN-aware double sort) and would re-expand over this emission
    pairs = (
        f"sort_array(collect_list(CASE WHEN ({p}) IS NOT NULL AND NOT isnan({p})"
        f" AND ({ts}) IS NOT NULL THEN named_struct("
        f"'t', unix_micros(CAST(({ts}) AS TIMESTAMP)), 'p', CAST(({p}) AS DOUBLE)) END))"
    )
    init = (
        "named_struct('pt', CAST(NULL AS BIGINT), 'pp', CAST(0.0 AS DOUBLE), "
        "'ft', CAST(NULL AS BIGINT), 'ws', CAST(0.0 AS DOUBLE), "
        "'sp', CAST(0.0 AS DOUBLE), 'n', CAST(0 AS BIGINT))"
    )
    step = (
        "(acc, e) -> named_struct('pt', e.t, 'pp', e.p, "
        "'ft', coalesce(acc.ft, e.t), "
        "'ws', acc.ws + CASE WHEN acc.pt IS NOT NULL "
        "THEN acc.pp * (e.t - acc.pt) ELSE CAST(0.0 AS DOUBLE) END, "
        "'sp', acc.sp + e.p, 'n', acc.n + 1)"
    )
    fin = (
        "acc -> CASE WHEN acc.n = 0 THEN CAST(NULL AS DOUBLE) "
        "WHEN acc.pt > acc.ft THEN acc.ws / (acc.pt - acc.ft) "
        "ELSE acc.sp / acc.n END"
    )
    return f"aggregate({pairs}, {init}, {step}, {fin})"


def _is_ordered_sql(x: str) -> str:
    vals = f"collect_list(CAST(({x}) AS DOUBLE))"
    return (
        f"aggregate({vals}, "
        "named_struct('ok', true, 'prev', CAST(NULL AS DOUBLE)), "
        "(acc, v) -> named_struct('ok', acc.ok AND (acc.prev IS NULL OR v >= acc.prev), 'prev', v), "
        "acc -> acc.ok)"
    )


def _sparkline_sql(x: str) -> str:
    # min/max via aggregate folds — array_min/array_max are dialect macros
    # (NaN-skipping) and would re-expand over this emission
    v = f"collect_list(CAST(({x}) AS DOUBLE))"
    lo = f"aggregate({v}, CAST('Infinity' AS DOUBLE), (acc, e) -> least(acc, e))"
    hi = f"aggregate({v}, CAST('-Infinity' AS DOUBLE), (acc, e) -> greatest(acc, e))"
    span = f"IF({hi} > {lo}, {hi} - {lo}, CAST(1.0 AS DOUBLE))"
    return (
        f"concat_ws('', transform({v}, e -> substring('{_BARS}', "
        f"least(CAST(floor((e - {lo}) / {span} * 8) AS INT), 7) + 1, 1)))"
    )


# -- finance ----------------------------------------------------------------


def _pairwise_weighted(v: str, w: str) -> tuple[str, str]:
    both = f"({v}) IS NOT NULL AND NOT isnan({v}) AND ({w}) IS NOT NULL AND NOT isnan({w})"
    num = f"sum(CASE WHEN {both} THEN CAST(({v}) AS DOUBLE) * ({w}) END)"
    den = f"sum(CASE WHEN {both} THEN CAST(({w}) AS DOUBLE) END)"
    return num, den


def _vwap_sql(a: list[str]) -> str:
    num, den = _pairwise_weighted(a[0], a[1])
    return f"({num} / nullif({den}, 0.0))"


def _l2price_sql(a: list[str]) -> str:
    """l2price(target, size1, price1[, size2, price2, ...]) — the scalar
    pair form; the array form stays on the column API
    (functions/finance.py l2price)."""
    if len(a) < 3 or len(a) % 2 == 0:
        raise ValueError("l2price(target, size1, price1, ...)")
    target = f"CAST(({a[0]}) AS DOUBLE)"
    sizes = "array(" + ", ".join(f"CAST(({s}) AS DOUBLE)" for s in a[1::2]) + ")"
    prices = "array(" + ", ".join(f"CAST(({p}) AS DOUBLE)" for p in a[2::2]) + ")"
    levels = f"zip_with({sizes}, {prices}, (s, p) -> named_struct('s', s, 'p', p))"
    init = (
        f"named_struct('filled', CAST(0.0 AS DOUBLE), "
        f"'cost', CAST(0.0 AS DOUBLE), 'want', {target})"
    )
    step = (
        "(acc, lvl) -> named_struct("
        "'filled', least(acc.want, acc.filled + lvl.s), "
        "'cost', acc.cost + least(greatest(acc.want - acc.filled, CAST(0.0 AS DOUBLE)), lvl.s) * lvl.p, "
        "'want', acc.want)"
    )
    fin = f"acc -> CASE WHEN acc.filled >= {target} THEN acc.cost / {target} END"
    return f"aggregate({levels}, {init}, {step}, {fin})"


# -- scalar math / string / date -------------------------------------------


def _round_dir_sql(a: list[str], up: bool) -> str:
    if len(a) != 2:
        raise ValueError("round_down(x, scale)" if not up else "round_up(x, scale)")
    x, s = a
    scaled = (
        f"(abs({x}) * pow(10, {s}) + 1 - {_TOL})"
        if up
        else f"((abs({x}) + {_TOL}) * pow(10, {s}))"
    )
    return (
        f"CASE WHEN ({x}) IS NOT NULL THEN "
        f"IF(({x}) < 0, -1.0, 1.0) * floor({scaled}) / pow(10, {s}) END"
    )


def _netmask_sql(s: str) -> str:
    p = f"CAST(try_element_at(split({s}, '/'), 2) AS INT)"
    m = (
        f"CASE WHEN {p} = 0 THEN CAST(0 AS BIGINT) "
        f"WHEN {p} BETWEEN 1 AND 32 THEN "
        f"CAST(4294967296 - CAST(pow(2, 32 - {p}) AS BIGINT) AS BIGINT) END"
    )
    return (
        f"CASE WHEN {m} IS NOT NULL THEN concat_ws('.', "
        f"CAST(({m}) DIV 16777216 % 256 AS STRING), "
        f"CAST(({m}) DIV 65536 % 256 AS STRING), "
        f"CAST(({m}) DIV 256 % 256 AS STRING), "
        f"CAST(({m}) % 256 AS STRING)) END"
    )


def _hex16(x: str) -> str:
    return f"lpad(lower(hex({x})), 16, '0')"


# -- arrays -----------------------------------------------------------------


def _matmul_sql(a: list[str]) -> str:
    if len(a) != 2:
        raise ValueError("matmul(a, b)")
    A, B = a
    bcol = f"transform({B}, brow -> element_at(brow, j))"
    dot = (
        f"aggregate(zip_with(arow, {bcol}, (xx, yy) -> xx * yy), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        f"transform({A}, arow -> "
        f"transform(sequence(1, size(element_at({B}, 1))), j -> {dot}))"
    )


def _transpose_sql(a: list[str]) -> str:
    if len(a) != 1:
        raise ValueError("transpose(a)")
    A = a[0]
    return (
        f"transform(sequence(1, size(element_at({A}, 1))), j -> "
        f"transform({A}, r -> element_at(r, j)))"
    )


def _elem_pair(op: str, x: str, y: str) -> str:
    fx = f"({x}) IS NOT NULL AND NOT isnan({x})"
    fy = f"({y}) IS NOT NULL AND NOT isnan({y})"
    combine = {
        "sum": f"({x}) + ({y})",
        "min": f"least({x}, {y})",
        "max": f"greatest({x}, {y})",
    }[op]
    return (
        f"CASE WHEN {fx} AND {fy} THEN {combine} "
        f"WHEN {fx} THEN ({x}) WHEN {fy} THEN ({y}) "
        f"ELSE CAST('NaN' AS DOUBLE) END"
    )


def _finite_flags(arr: str) -> str:
    return f"transform({arr}, x -> IF(x IS NOT NULL AND NOT isnan(x), 1, 0))"


def _array_elem_sql(a: list[str], op: str) -> str:
    """Dispatch: 1 arg = element-wise aggregate across group rows
    (groupby/DoubleArrayElem*GroupByFunctionFactory), ≥2 args =
    element-wise combine across the argument arrays
    (array/DoubleArrayElem*FunctionFactory). Non-finite elements are
    skipped position-wise; a position with no finite value is NaN."""
    if len(a) == 1:
        arrs = f"collect_list({a[0]})"
        rest = f"slice({arrs}, 2, greatest(size({arrs}) - 1, 0))"
        first = f"try_element_at({arrs}, 1)"

        def fold(kind: str, init: str) -> str:
            return (
                f"aggregate({rest}, {init}, "
                f"(acc, arr) -> zip_with(acc, arr, (x, y) -> {_elem_pair(kind, 'x', 'y')}))"
            )

        if op in ("sum", "min", "max"):
            return fold(op, first)
        fsum = fold("sum", first)
        fcnt = (
            f"aggregate({rest}, {_finite_flags(first)}, "
            f"(acc, arr) -> zip_with(acc, arr, (c, y) -> "
            f"c + IF(y IS NOT NULL AND NOT isnan(y), 1, 0)))"
        )
        return (
            f"zip_with({fsum}, {fcnt}, (s, c) -> "
            f"CASE WHEN c > 0 AND NOT isnan(s) THEN s / c ELSE CAST('NaN' AS DOUBLE) END)"
        )
    # N-ary scalar form: left fold over the argument arrays
    if op == "avg":
        sums = _array_elem_sql(a, "sum")
        acc = _finite_flags(a[0])
        for arr in a[1:]:
            acc = f"zip_with({acc}, {_finite_flags(arr)}, (p, q) -> p + q)"
        return (
            f"zip_with({sums}, {acc}, (s, c) -> "
            f"CASE WHEN c > 0 AND NOT isnan(s) THEN s / c ELSE CAST('NaN' AS DOUBLE) END)"
        )
    expr = a[0]
    for arr in a[1:]:
        expr = f"zip_with({expr}, {arr}, (x, y) -> {_elem_pair(op, 'x', 'y')})"
    return expr


# -- generators -------------------------------------------------------------


def _rnd_decimal_sql(a: list[str], t: int) -> str:
    if len(a) != 3:
        raise ValueError("rnd_decimal(precision, scale, nullRate)")
    p, s, rate = int(a[0]), int(a[1]), int(a[2])
    if not (0 <= s <= p <= 38):
        raise ValueError("invalid precision/scale")
    digits = min(p, 18)
    u = f"(({_mix(t)}) % {10 ** digits})"
    if s == 0:
        expr = f"CAST({u} AS DECIMAL({p}, 0))"
    else:
        expr = (
            f"CAST(concat(CAST({u} DIV {10 ** s} AS STRING), '.', "
            f"lpad(CAST({u} % {10 ** s} AS STRING), {s}, '0')) AS DECIMAL({p}, {s}))"
        )
    if rate > 0:
        return f"CASE WHEN ({_mix(t + 1)}) % {rate} = 0 THEN NULL ELSE {expr} END"
    return expr


def _rnd_double_array_sql(a: list[str], t: int) -> str:
    if not a or not a[0].strip():
        raise ValueError("rnd_double_array(nDims[, nanRate[, maxDimLen | 0, dims...]])")
    ndims = int(a[0])
    if not 1 <= ndims <= 3:
        raise ValueError("macro supports 1..3 dims")
    nan_rate = int(a[1]) if len(a) > 1 else 0
    max_len = int(a[2]) if len(a) > 2 and int(a[2]) > 0 else 16
    fixed = [int(d) for d in a[3:]] if len(a) > 3 and int(a[2]) == 0 else None
    if fixed is not None and len(fixed) != ndims:
        raise ValueError("fixed-dim form needs one length per dim")
    idx_vars = [f"i{d}" for d in range(ndims)]

    def length(d: int) -> str:
        if fixed is not None:
            return str(fixed[d])
        extra = " + ".join(f"{v} * {pr}" for v, pr in zip(idx_vars[:d], (7919, 104729)))
        return f"(({_mix(t + d, extra)}) % {max_len} + 1)"

    extra = " + ".join(f"{v} * {pr}" for v, pr in zip(idx_vars, (7919, 104729, 1299709)))
    elem = f"(({_mix(t + 7, extra)}) % 1000000 / 1000000.0)"
    if nan_rate > 0:
        elem = (
            f"CASE WHEN ({_mix(t + 8, extra)}) % {nan_rate} = 0 "
            f"THEN CAST('NaN' AS DOUBLE) ELSE {elem} END"
        )
    expr = elem
    for d in range(ndims - 1, -1, -1):
        expr = f"transform(sequence(1, {length(d)}), {idx_vars[d]} -> {expr})"
    return expr


def _rnd_interval_sql(a: list[str], t: int) -> str:
    if a and a[0].strip():
        raise ValueError("rnd_interval()")
    base = "to_timestamp('2020-01-01 00:00:00')"
    lo = f"timestamp_micros(unix_micros({base}) + (({_mix(t)}) % 31536000) * 1000000)"
    dur = f"((({_mix(t + 1)}) % 86400) + 1)"
    return (
        f"named_struct('lo', {lo}, "
        f"'hi', timestamp_micros(unix_micros({lo}) + {dur} * 1000000))"
    )


def _rnd_symbol_weighted_sql(a: list[str], t: int) -> str:
    if len(a) < 2 or len(a) % 2 != 0:
        raise ValueError("rnd_symbol_weighted(sym, weight, ...)")
    syms = a[0::2]
    weights = [float(w) for w in a[1::2]]
    if any(w <= 0 for w in weights):
        raise ValueError("weights must be positive")
    return _weighted_pick(syms, weights, t)


def _rnd_symbol_zipf_sql(a: list[str], t: int) -> str:
    if len(a) < 2:
        raise ValueError("rnd_symbol_zipf(sym..., alpha)")
    alpha = float(a[-1])
    syms = a[:-1]
    weights = [1.0 / (i + 1) ** alpha for i in range(len(syms))]
    return _weighted_pick(syms, weights, t)


def _weighted_pick(syms: list[str], weights: list[float], t: int) -> str:
    total = sum(weights)
    u = f"(({_mix(t)}) % 1000000 / 1000000.0 * {total!r})"
    branches = []
    acc = 0.0
    for s, w in zip(syms[:-1], weights[:-1]):
        acc += w
        branches.append(f"WHEN {u} < {acc!r} THEN {s}")
    return "CASE " + " ".join(branches) + f" ELSE {syms[-1]} END"


EXT_FN_MACROS: dict = {
    # aggregates
    "arg_max": lambda a: f"max_by({a[0]}, {a[1]})",
    "arg_min": lambda a: f"min_by({a[0]}, {a[1]})",
    "count_distinct": lambda a: f"count(DISTINCT {a[0]})",
    "first_not_null": lambda a: f"first({a[0]}, true)",
    "last_not_null": lambda a: f"last({a[0]}, true)",
    "vwap": _vwap_sql,
    "weighted_avg": _vwap_sql,  # same pairwise-skip sum(v*w)/sum(w)
    # weighted_stddev (== _rel shorthand) is registered in engine.py next
    # to _wstd, which already backs the _rel/_freq forms
    "skewness": lambda a: _skew_sql(a[0], samp=True),
    "skewness_samp": lambda a: _skew_sql(a[0], samp=True),
    "skewness_pop": lambda a: _skew_sql(a[0], samp=False),
    "kurtosis": lambda a: _kurt_sql(a[0], samp=True),
    "kurtosis_samp": lambda a: _kurt_sql(a[0], samp=True),
    "kurtosis_pop": lambda a: _kurt_sql(a[0], samp=False),
    "isordered": lambda a: _is_ordered_sql(a[0]),
    "twap": _twap_sql,
    "sparkline": lambda a: _sparkline_sql(a[0]),
    "array_elem_sum": lambda a: _array_elem_sql(a, "sum"),
    "array_elem_avg": lambda a: _array_elem_sql(a, "avg"),
    "array_elem_min": lambda a: _array_elem_sql(a, "min"),
    "array_elem_max": lambda a: _array_elem_sql(a, "max"),
    # finance
    "l2price": _l2price_sql,
    "spread_bps": lambda a: (
        f"((({a[1]}) - ({a[0]})) / ((({a[0]}) + ({a[1]})) / 2.0) * 10000.0)"
    ),
    # scalars
    "length_bytes": lambda a: f"octet_length({a[0]})",
    "starts_with": lambda a: f"startswith({a[0]}, {a[1]})",
    "strpos": lambda a: f"locate({a[1]}, {a[0]})",
    "round_down": lambda a: _round_dir_sql(a, up=False),
    "round_up": lambda a: _round_dir_sql(a, up=True),
    "round_half_even": lambda a: f"bround({a[0]}, {a[1]})",
    "week_of_year": lambda a: f"weekofyear({a[0]})",
    "from_base64": lambda a: f"unbase64({a[0]})",
    "netmask": lambda a: _netmask_sql(a[0]),
    "now_ns": lambda a: "(unix_micros(current_timestamp()) * 1000)",
    "systimestamp_ns": lambda a: "(unix_micros(current_timestamp()) * 1000)",
    "to_timestamp_ns": lambda a: (
        f"(unix_micros(to_timestamp({a[0]}, {a[1]})) * 1000)"
        if len(a) > 1
        else f"(unix_micros(CAST({a[0]} AS TIMESTAMP)) * 1000)"
    ),
    "to_str": lambda a: f"date_format({a[0]}, {a[1]})",
    # str/ToCharBinFunctionFactory.java + std/Chars.java:1334 toSink —
    # hex dump of a BINARY value: 16 bytes per line, each line prefixed
    # with the 8-hex-digit byte offset (Numbers.appendHexPadded), every
    # byte as " xx" lowercase; NULL -> NULL, empty -> ''
    "to_char": lambda a: (
        f"(CASE WHEN ({a[0]}) IS NULL THEN NULL "
        f"WHEN octet_length({a[0]}) = 0 THEN '' ELSE "
        f"array_join(transform(sequence(0, (octet_length({a[0]}) - 1) div 16), "
        f"i -> concat(lpad(lower(hex(i * 16)), 8, '0'), "
        f"regexp_replace(substring(lower(hex({a[0]})), i * 32 + 1, 32), "
        f"'(..)', ' $1'))), chr(10)) END)"
    ),
    "to_long128": lambda a: (
        f"concat({_hex16(a[1])}, {_hex16(a[0])})"
        if len(a) == 2
        else (_ for _ in ()).throw(ValueError("to_long128(lo, hi)"))
    ),
    "current_schemas": lambda a: "array('public')",
    "current_setting": lambda a: (
        f"CASE WHEN ({a[0]}) = 'server_version_num' THEN '123000' ELSE '' END"
    ),
    # arrays
    "matmul": _matmul_sql,
    "transpose": _transpose_sql,
    # catalogue runtime constants (catalogue/Constants.java: DB_NAME "qdb",
    # PUBLIC_SCHEMA "public", PG_CATALOG_VERSION_CONSTANT; honest engine
    # suffix replaces the reference's compiler tag)
    "version": lambda a: (
        "'PostgreSQL 12.3, compiled for Apache Spark, 64-bit, QuestDB'"
    ),
    "current_database": lambda a: "'qdb'",
    "current_catalog": lambda a: "'qdb'",
    "current_schema": lambda a: "'public'",
    # CurrentDataIdFunctionFactory: replica data id — 0 on a primary that
    # never ingested a replication snapshot, which is this engine always
    "current_data_id": lambda a: "CAST(0 AS BIGINT)",
    # CurrentUserFunctionFactory: the security principal — the OSS
    # reference's default context is the admin principal
    "current_user": lambda a: "'admin'",
    # array/BuildArrayFunctionFactory.java — array_build(v1, v2, ...)
    "array_build": lambda a: f"array({', '.join(a)})",
    # catalogue/TypeOfFunctionFactory.java — QuestDB ColumnType names from
    # the expression's Spark type (STRING maps the reference's default
    # varchar storage; nested/decimal types print upper-cased as-is)
    "typeof": lambda a: _typeof_sql(a[0]),
}


_TYPEOF_MAP = {
    "boolean": "BOOLEAN",
    "tinyint": "BYTE",
    "smallint": "SHORT",
    "int": "INT",
    "bigint": "LONG",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "STRING",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BINARY",
    "void": "NULL",
}


def _typeof_sql(x: str) -> str:
    # emits the SENTINEL spelling: the expansion itself needs Spark's
    # typeof(), which this macro shadows — the raw name would re-match on
    # the next fixpoint pass and nest another CASE per pass.  The expander
    # restores the sentinel to `typeof` after the loop.
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _TYPEOF_MAP.items()
    )
    return (
        f"(CASE __qdb_typeof__({x}) {whens} "
        f"ELSE upper(__qdb_typeof__({x})) END)"
    )

EXT_RND_MACROS: dict = {
    "rnd_decimal": _rnd_decimal_sql,
    "rnd_double_array": _rnd_double_array_sql,
    "rnd_interval": _rnd_interval_sql,
    "rnd_symbol_weighted": _rnd_symbol_weighted_sql,
    "rnd_symbol_zipf": _rnd_symbol_zipf_sql,
}
