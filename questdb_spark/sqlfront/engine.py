"""QuestDB-dialect SQL engine: lowers parsed queries onto the operator
library, everything else delegated to Spark SQL / Catalyst.

Usage:

    eng = QdbEngine(spark)
    eng.register("events", events_df, designated_ts="ts")
    eng.sql("SELECT ts, event_type, avg(value) FROM events SAMPLE BY 1h")

Lifecyle mirror of the reference (SURVEY §3): parse (our clause parser ≈
``SqlParser``), rewrite (interval strings, negative limit ≈
``SqlOptimiser``), lower to DataFrame operators (≈ ``SqlCodeGenerator``
emitting RecordCursorFactories) — then Catalyst optimizes and executes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, lt_join, splice_join
from ..operators.intervals import parse_interval_string
from ..operators.latest import latest_on
from ..operators.limits import limit_signed
from ..operators.sample_by import sample_by
from .parser import QdbQuery, SelectItem, parse

_AGG_FNS = (
    "sum|avg|count|min|max|first|last|stddev|stddev_samp|stddev_pop|variance|"
    "var_samp|var_pop|corr|covar_pop|covar_samp|count_distinct|approx_count_distinct|"
    "collect_list|collect_set|max_by|min_by|percentile|median|mode|any_value|"
    "bool_and|bool_or|skewness|kurtosis"
)
_AGG_RE = re.compile(rf"\b({_AGG_FNS})\s*\(", re.IGNORECASE)

_IN_INTERVAL_RE = re.compile(r"(\w+(?:\.\w+)?)\s+IN\s+'([^']+)'", re.IGNORECASE)


class QdbEngine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}
        self.designated_ts: dict[str, str] = {}

    def register(self, name: str, df: DataFrame, designated_ts: str | None = None) -> None:
        self.tables[name] = df
        if designated_ts:
            self.designated_ts[name] = designated_ts
        df.createOrReplaceTempView(name)

    # ------------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Execute a QuestDB-dialect query."""
        rewritten = self._rewrite_intervals(query)
        if not self._needs_dialect(rewritten):
            return self.spark.sql(rewritten)
        q = parse(rewritten)
        return self._lower(q)

    def explain(self, query: str, mode: str = "formatted") -> str:
        """EXPLAIN (QuestDB ExplainPlanFactory): the Spark physical plan
        for a dialect query."""
        from ..plans.explain import plan_text

        return plan_text(self.sql(query), mode)

    # ------------------------------------------------------------------
    def _needs_dialect(self, s: str) -> bool:
        return bool(
            re.search(
                r"\b(SAMPLE\s+BY|LATEST\s+ON|ASOF\s+JOIN|LT\s+JOIN|SPLICE\s+JOIN|"
                r"LIMIT\s+-\d+)\b",
                s,
                re.IGNORECASE,
            )
        )

    def _rewrite_intervals(self, s: str) -> str:
        """`ts IN '2024-01'` → half-open range (WhereClauseParser
        equivalent). Non-interval strings (e.g. plain IN lists) pass
        through untouched."""

        def repl(m: re.Match) -> str:
            col, text = m.group(1), m.group(2)
            try:
                lo, hi = parse_interval_string(text)
            except ValueError:
                return m.group(0)
            return (
                f"({col} >= TIMESTAMP '{lo.isoformat(sep=' ')}'"
                f" AND {col} < TIMESTAMP '{hi.isoformat(sep=' ')}')"
            )

        return _IN_INTERVAL_RE.sub(repl, s)

    # ------------------------------------------------------------------
    def _table(self, name: str, alias: str | None) -> DataFrame:
        if name not in self.tables:
            raise ValueError(f"unknown table: {name}")
        df = self.tables[name]
        return df.alias(alias) if alias else df

    def _lower(self, q: QdbQuery) -> DataFrame:
        df = self._table(q.table, q.table_alias)
        ts_col = self.designated_ts.get(q.table, "ts")

        if q.join is not None:
            other = self._table(q.join.table, q.join.alias)
            fn = {"asof": asof_join, "lt": lt_join, "splice": splice_join}[q.join.kind]
            if q.join.kind == "splice":
                df = fn(df, other, ts_col, keys=q.join.keys)
            else:
                df = fn(df, other, ts_col, keys=q.join.keys, tolerance=q.join.tolerance)

        if q.where:
            df = df.filter(F.expr(q.where))

        if q.latest_on is not None:
            lts, keys = q.latest_on
            df = latest_on(df, lts, keys)

        if q.sample_by is not None:
            df = self._lower_sample_by(df, q, ts_col)
        else:
            df = self._project(df, q)

        if q.order_by:
            df = df.orderBy(*[_order_col(o) for o in q.order_by.split(",")])
        if q.limit is not None:
            lo, hi = q.limit
            if hi is not None:
                df = df.offset(lo).limit(hi - lo)
            elif lo < 0:
                order = [ts_col] if ts_col in df.columns else [df.columns[0]]
                df = limit_signed(df, lo, order)
            else:
                df = df.limit(lo)
        return df

    def _project(self, df: DataFrame, q: QdbQuery) -> DataFrame:
        items = q.select_items
        if len(items) == 1 and items[0].expr == "*":
            out = df
        else:
            out = df.select(*[_item_col(i) for i in items])
        if q.group_by:
            aggs = [i for i in q.select_items if _AGG_RE.search(i.expr)]
            keys = [i for i in q.select_items if not _AGG_RE.search(i.expr)]
            out = (
                df.groupBy(*[F.expr(k.expr).alias(k.out_name) for k in keys])
                .agg(*[_item_col(a) for a in aggs])
            )
        return out

    def _lower_sample_by(self, df: DataFrame, q: QdbQuery, ts_col: str) -> DataFrame:
        sb = q.sample_by
        aggs: dict[str, Column] = {}
        keys: list[str] = []
        bucket_name = "ts_bucket"
        for item in q.select_items:
            if _AGG_RE.search(item.expr):
                aggs[item.out_name] = F.expr(item.expr)
            elif item.expr.strip() == ts_col:
                bucket_name = item.alias or ts_col
            else:
                keys.append(item.expr.strip())
        fill = sb.fill
        fill_values = None
        if fill is not None and fill not in ("none", "null", "prev", "linear"):
            try:
                const = float(fill)
            except ValueError:
                raise ValueError(f"unsupported FILL: {fill!r}")
            fill_values = {name: const for name in aggs}
            fill = "value"
        from ..operators.sample_by import parse_offset

        return sample_by(
            df,
            ts_col,
            sb.interval,
            aggs,
            keys=keys,
            fill=fill,
            fill_values=fill_values,
            from_ts=sb.from_ts,
            to_ts=sb.to_ts,
            offset_us=parse_offset(sb.offset) if sb.offset else 0,
            tz=sb.tz,
            bucket_name=bucket_name,
        )


def _item_col(i: SelectItem) -> Column:
    c = F.expr(i.expr)
    return c.alias(i.alias) if i.alias else c


def _order_col(spec: str) -> Column:
    spec = spec.strip()
    if re.search(r"\bDESC$", spec, re.IGNORECASE):
        return F.expr(re.sub(r"\s+DESC$", "", spec, flags=re.IGNORECASE)).desc()
    return F.expr(re.sub(r"\s+ASC$", "", spec, flags=re.IGNORECASE)).asc()
